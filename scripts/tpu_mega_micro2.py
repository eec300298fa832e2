"""Kernel-only microbench of fused_edge_mega at escn-md scale (P=320)
via fori_loop marginal cost (defeats relay per-dispatch overhead and
memoization — scripts/tpu_mega_micro.py's host chained loop was too
noisy to apportion anything). Honors PDB2R_TPU_MEGA_A_{FWD,BWD}.

Compare against scripts/tpu_escn_fwdbwd.py (full model, 4 layers) to
split the force call into 4x kernel + XLA remainder."""
import dataclasses
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
import os
print(f"P={P} K={K} E={E} M={M} C={C} h={h} U={U} G={G} nnz={nnz} "
      f"A_FWD={os.environ.get('PDB2R_TPU_MEGA_A_FWD', 'def32')} "
      f"A_BWD={os.environ.get('PDB2R_TPU_MEGA_A_BWD', 'def8')}")

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

from _marginal import dyn_marginal


@jax.jit
def run_fwd(n, x0):
    def body(i, x):
        o = ek.fused_edge_mega(cfg, x, srcf, es, Dp, Dpe, weights,
                               tables)
        return x + 1e-6 * o
    return jax.lax.fori_loop(0, n, body, x0)


@jax.jit
def run_fwdbwd(n, x0):
    def body(i, x):
        def loss(xx):
            return jnp.sum(ek.fused_edge_mega(
                cfg, xx, srcf, es, Dp, Dpe, weights, tables) ** 2)
        g = jax.grad(loss)(x)
        return x + 1e-9 * g
    return jax.lax.fori_loop(0, n, body, x0)


def marginal(tag, run):
    return dyn_marginal(tag, run, x_t, suffix="  (x4 layers noted)")


t_f = marginal("mega fwd", run_fwd)
print(f"  x4 layers = {4*t_f:.1f} ms", flush=True)
t_fb = marginal("mega fwd+bwd", run_fwdbwd)
print(f"  x4 layers = {4*t_fb:.1f} ms", flush=True)
print(f"implied kernel bwd: {t_fb - t_f:.2f} ms/layer "
      f"(x4 = {4 * (t_fb - t_f):.1f} ms)", flush=True)
