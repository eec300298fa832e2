"""Microbench of the fused_edge_mega kernel alone at escn-md scale
(P=320): fwd and fwd+bwd, chained. The full model runs this 4x (one per
layer) per force call — compare against scripts/tpu_escn_fwdbwd.py to
see what the non-edge-kernel remainder costs."""
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices())
from pdb2reaction_tpu.mlip.escn import ESCN_CONFIGS
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
tg_e, fg_e = __import__(
    "pdb2reaction_tpu.mlip.escn", fromlist=["x"])._edge_grid_tables(
        cfg.lmax, cfg.mmax)
tables = (jnp.asarray(tg_e, f32), jnp.asarray(fg_e, f32))


@jax.jit
def fwd(x_t, Dp, Dpe):
    return ek.fused_edge_mega(cfg, x_t, srcf, es, Dp, Dpe, weights, tables)


@jax.jit
def fwdbwd(x_t, Dp, Dpe):
    def loss(x_t, Dp, Dpe):
        return jnp.sum(ek.fused_edge_mega(cfg, x_t, srcf, es, Dp, Dpe,
                                          weights, tables) ** 2)
    l, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(x_t, Dp, Dpe)
    return g[0]


def chained(f, label, iters=20):
    o = f(x_t, Dp, Dpe)
    o.block_until_ready()
    a = x_t
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(a, Dp, Dpe)
        a = a + 1e-6 * o[: M * C, :P]
    o.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:24s} {dt*1e3:7.2f} ms/call  (x4 layers = "
          f"{4*dt*1e3:.1f} ms/force-call)", flush=True)


chained(fwd, "mega fwd")
chained(fwdbwd, "mega fwd+bwd")
