"""Kernel-only microbench of fused_edge_mega at escn-md scale (P=320)
sweeping the BACKWARD tile size in one process: measure fwd (A_FWD=32),
then fwd+bwd at A_BWD=8 (default) and A_BWD=16 (the bf16 grid-space VJP
chain was landed precisely to make A=16 fit the VMEM budget — commit
b7d8107 — but was never measured before the r3 relay outage). The bwd
call builder is lru_cached and reads PDB2R_TPU_MEGA_A_BWD at build time,
so each sweep point clears the cache and re-jits. Static fori trip
counts (see scripts/_marginal.py docstring: traced-n never finished
compiling on the relay)."""
import dataclasses
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from pdb2reaction_tpu.workflows.common import enable_compile_cache  # noqa: F401 (side effect)
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
print(f"P={P} K={K} E={E} M={M} C={C} h={h} U={U} G={G} nnz={nnz}")

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
            def loss(xx):
                return jnp.sum(ek.fused_edge_mega(
                    cfg, xx, srcf, es, Dp, Dpe, weights, tables) ** 2)
            g = jax.grad(loss)(x)
            return x + 1e-9 * g
        return jax.lax.fori_loop(0, n, body, x0)
    return run


t_f = static_marginal("mega fwd (A_FWD=32)", make_fwd, x_t)
print(f"  x4 layers = {4*t_f:.1f} ms", flush=True)

for a_bwd in (8, 16):
    os.environ["PDB2R_TPU_MEGA_A_BWD"] = str(a_bwd)
    ek._bwd_call_mega.cache_clear()
    try:
        t_fb = static_marginal(f"mega fwd+bwd (A_BWD={a_bwd})",
                               make_fwdbwd, x_t)
        print(f"  x4 layers = {4*t_fb:.1f} ms | implied kernel bwd "
              f"{t_fb - t_f:.2f} ms/layer (x4 = {4*(t_fb-t_f):.1f} ms)",
              flush=True)
    except Exception as e:
        print(f"  A_BWD={a_bwd} FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
