"""Apportion the 2.06 ms/layer mega-kernel FORWARD (escn-md, P=320,
A_FWD=32) via env-gated ablations (PDB2R_TPU_MEGA_ABLATE — wrong math,
microbench only): noact (drop S2 grid chain), nosilu (keep its matmuls,
drop transcendentals), norot (row slices instead of Wigner FMAs),
nogather (broadcast instead of one-hot MXU gathers). Plus an A_FWD=64
tile point. Crude floor is ~0.6 ms/layer (50 GFLOP MXU + rotation VPU);
the ablations say where the other ~1.4 ms live."""
import dataclasses
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from pdb2reaction_tpu.workflows.common import enable_compile_cache  # noqa: F401
print("devices:", jax.devices())
from pdb2reaction_tpu.mlip.escn import ESCN_CONFIGS, _edge_grid_tables
from pdb2reaction_tpu.mlip import escn_edge_kernel as ek

cfg = dataclasses.replace(ESCN_CONFIGS["escn-md"], edge_kernel="pallas-mega")
P = 320
K = cfg.max_neighbors
E = P * K
M = (cfg.lmax + 1) ** 2
C = cfg.sphere_channels
h = cfg.hidden_channels
Ce = cfg.edge_channels
nl0, nls, U, G = ek._dims(cfg)
nnz = len(ek._rot_nz(cfg.lmax, cfg.mmax)[0])

rng = np.random.default_rng(0)
f32 = jnp.float32
x_t = jnp.asarray(rng.normal(size=(M * C, P)) * 0.3, f32)
srcf = jnp.asarray(rng.integers(0, P, size=E), f32)
es = jnp.asarray(rng.normal(size=(Ce, E)) * 0.3, f32)
Dp = jnp.asarray(rng.normal(size=(nnz, E)) * 0.3, f32)
Dpe = jnp.asarray(rng.normal(size=(nnz, E)) * 0.3, f32)

sc = 0.05
W0 = jnp.asarray(rng.normal(size=(nl0 * 2 * C + Ce, nl0 * h)) * sc, f32)
Wrs = tuple(jnp.asarray(rng.normal(size=(nl * 2 * C, nl * h)) * sc, f32)
            for nl in nls)
Wis = tuple(jnp.asarray(rng.normal(size=(nl * 2 * C, nl * h)) * sc, f32)
            for nl in nls)
b0 = jnp.zeros((nl0 * h,), f32)
brs = tuple(jnp.zeros((nl * h,), f32) for nl in nls)
bis = tuple(jnp.zeros((nl * h,), f32) for nl in nls)
V0 = jnp.asarray(rng.normal(size=(nl0 * h, nl0 * C)) * sc, f32)
Vrs = tuple(jnp.asarray(rng.normal(size=(nl * h, nl * C)) * sc, f32)
            for nl in nls)
Vis = tuple(jnp.asarray(rng.normal(size=(nl * h, nl * C)) * sc, f32)
            for nl in nls)
c0 = jnp.zeros((nl0 * C,), f32)
crs = tuple(jnp.zeros((nl * C,), f32) for nl in nls)
cis = tuple(jnp.zeros((nl * C,), f32) for nl in nls)
weights = (W0, Wrs, Wis, b0, brs, bis, V0, Vrs, Vis, c0, crs, cis)
tg_e, fg_e = _edge_grid_tables(cfg.lmax, cfg.mmax)
tables = (jnp.asarray(tg_e, f32), jnp.asarray(fg_e, f32))

from _marginal import static_marginal


def make_fwd(n):
    @jax.jit
    def run(x0):
        def body(i, x):
            o = ek.fused_edge_mega(cfg, x, srcf, es, Dp, Dpe, weights,
                                   tables)
            return x + 1e-6 * o
        return jax.lax.fori_loop(0, n, body, x0)
    return run


def point(tag, ablate="", a_fwd=None):
    os.environ.pop("PDB2R_TPU_MEGA_ABLATE", None)
    os.environ.pop("PDB2R_TPU_MEGA_A_FWD", None)
    if ablate:
        os.environ["PDB2R_TPU_MEGA_ABLATE"] = ablate
    if a_fwd is not None:
        os.environ["PDB2R_TPU_MEGA_A_FWD"] = str(a_fwd)
    ek._fwd_call_mega.cache_clear()
    try:
        return static_marginal(tag, make_fwd, x_t)
    except Exception as e:
        print(f"  {tag} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return float("nan")


import os as _os

abls = _os.environ.get(
    "PDB2R_TPU_MICRO4_ABLS", "noact,nosilu,norot,nogather").split(",")
base = point("fwd baseline (A=32)")
for abl in [a for a in abls if a]:
    t = point(f"fwd ABLATE={abl}", ablate=abl)
    print(f"  -> {abl} accounts for {base - t:.2f} ms/layer", flush=True)
if _os.environ.get("PDB2R_TPU_MICRO4_A64"):
    t64 = point("fwd A_FWD=64", a_fwd=64)
    print(f"  -> A=64 vs 32: {base - t64:+.2f} ms/layer", flush=True)
for a in _os.environ.get("PDB2R_TPU_MICRO4_ASWEEP", "").split(","):
    if a:
        ta = point(f"fwd A_FWD={a}", a_fwd=int(a))
        print(f"  -> A={a} vs 32: {base - ta:+.2f} ms/layer", flush=True)
