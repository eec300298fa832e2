"""Measure the GD16 path (PDB2R_TPU_MEGA_GD16: backward g_Dp/g_Dpe
channel reductions as bf16 multiplies + ones-row MXU matmuls): kernel
fwd and fwd+bwd fori marginals at escn-md scale (P=320), a bwd-tile
probe at A_BWD=32, then full-model energy/force parity + chained
force-call rate of pallas-mega(gd16) vs the XLA edge chain on the
300-atom flagship cluster. ROT16 is deliberately NOT set: measured
2026-08-19, bf16 rotations gave no speedup (fwd 1.62 vs 1.52-1.62
baseline, fwd+bwd 3.94 vs 3.73) and cost parity (rel force deviation
1.2e-2 vs XLA) — the v5e VPU does not run bf16 elementwise faster, so
the added casts only hurt."""
import dataclasses
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ["PDB2R_TPU_MEGA_GD16"] = "1"

import numpy as np
import jax
import jax.numpy as jnp

from pdb2reaction_tpu.workflows.common import enable_compile_cache  # noqa: F401
print("devices:", jax.devices())
from pdb2reaction_tpu.mlip.escn import (ESCN_CONFIGS, _edge_grid_tables,
                                        make_escn_model,
                                        premerge_escn_params)
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


static_marginal("gd16 fwd", make_fwd, x_t, suffix="  (x4 layers)")
static_marginal("gd16 fwd+bwd (A_BWD=16)", make_fwdbwd, x_t,
                suffix="  (x4 layers)")
os.environ["PDB2R_TPU_MEGA_A_BWD"] = "32"
ek._bwd_call_mega.cache_clear()
try:
    static_marginal("gd16 fwd+bwd (A_BWD=32)", make_fwdbwd, x_t,
                    suffix="  (x4 layers)")
except Exception as e:
    print(f"  A_BWD=32 FAILED: {type(e).__name__}: {str(e)[:300]}",
          flush=True)
os.environ.pop("PDB2R_TPU_MEGA_A_BWD", None)
ek._bwd_call_mega.cache_clear()

# ---- full model: parity + chained rate vs the XLA edge chain -----------
from __graft_entry__ import _flagship_system
sys_ = _flagship_system()
coords = jnp.asarray(sys_.coords, jnp.float32)

res = {}
for label, ekname in (("mega-gd16", "pallas-mega"), ("xla", None)):
    c2 = ESCN_CONFIGS["escn-md"]
    if ekname is not None:
        c2 = dataclasses.replace(c2, edge_kernel=ekname)
    fn, params, c2 = make_escn_model(c2, seed=0)
    params = premerge_escn_params(params, c2)

    @jax.jit
    def eforce(params, c):
        e, g = jax.value_and_grad(lambda cc: fn(cc, sys_, params))(c)
        return e, -g

    e, f = eforce(params, coords)
    jax.block_until_ready(f)
    res[label] = (float(e), np.asarray(f))
    print(f"{label}: E={float(e):+.6f}", flush=True)
    if label == "mega-gd16":
        c = coords
        t0 = time.perf_counter()
        for _ in range(10):
            c = c + 1e-6 * f
            e, f = eforce(params, c)
        jax.block_until_ready(f)
        dt = (time.perf_counter() - t0) / 10
        print(f"mega-gd16: {dt*1e3:.1f} ms/force-call chained "
              f"({1/dt:.1f}/s)", flush=True)

de = abs(res["mega-gd16"][0] - res["xla"][0])
df = np.max(np.abs(res["mega-gd16"][1] - res["xla"][1]))
fscale = np.max(np.abs(res["xla"][1]))
print(f"gd16 parity vs XLA: |dE|={de:.3e} Ha, max|dF|={df:.3e} "
      f"(max|F|={fscale:.3e}, rel {df/max(fscale,1e-30):.3e})", flush=True)
