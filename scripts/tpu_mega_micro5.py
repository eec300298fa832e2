"""Apportion the mega-kernel BACKWARD (escn-md, P=320, A_BWD=16) via
env-gated bwd-only ablations (PDB2R_TPU_MEGA_ABLATE_BWD — wrong math,
microbench only; the forward stays unablated so each fwd+bwd marginal
isolates the backward component): noact (drop the grid VJP chain),
nosilu (keep its matmuls, drop transcendentals), norot (row slices for
the three rotation transposes), nogd (skip the gdp/gdpe VPU row-sums),
nogather (drop one-hot gather/scatter matmuls)."""
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


def make_fwdbwd(n):
    @jax.jit
    def run(x0):
        def body(i, x):
            def loss(x):
                o = ek.fused_edge_mega(cfg, x, srcf, es, Dp, Dpe,
                                       weights, tables)
                return jnp.sum(o ** 2)
            g = jax.grad(loss)(x)
            return x + 1e-6 * g
        return jax.lax.fori_loop(0, n, body, x0)
    return run


def point(tag, ablate=""):
    os.environ.pop("PDB2R_TPU_MEGA_ABLATE_BWD", None)
    if ablate:
        os.environ["PDB2R_TPU_MEGA_ABLATE_BWD"] = ablate
    ek._bwd_call_mega.cache_clear()
    try:
        return static_marginal(tag, make_fwdbwd, x_t)
    except Exception as e:
        print(f"  {tag} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return float("nan")


base = point("fwd+bwd baseline (A_BWD=16)")
abls = os.environ.get("PDB2R_TPU_MICRO5_ABLS",
                      "noact,nosilu,norot,nogd,nogather").split(",")
for abl in [a for a in abls if a]:
    t = point(f"bwd ABLATE={abl}", ablate=abl)
    print(f"  -> {abl} accounts for {base - t:.2f} ms/layer of the bwd",
          flush=True)
