"""Apportion the escn-md force-call XLA remainder (everything outside
the 4 fused_edge_mega layers), via fori_loop marginal cost:

  - node S2-FFN kernel (fused_node_ffn), fwd and fwd+bwd, x4 layers
  - geometry chain: coords -> neighbors -> edge_rot_mat -> wigner_full
    -> D_sel -> pack_d -> Dp/Dpe transposes, fwd and VJP
  - invariant edge scalars: gauss basis + embeddings + edge MLP,
    fwd and VJP

Compare: full force call (scripts/tpu_escn_fwdbwd.py) vs 4x mega kernel
(scripts/tpu_mega_micro2.py) vs these parts."""
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from pdb2reaction_tpu.workflows.common import enable_compile_cache  # noqa: F401
print("devices:", jax.devices())
from __graft_entry__ import _flagship_system
from pdb2reaction_tpu.mlip import escn as E
from pdb2reaction_tpu.mlip.escn import (ESCN_CONFIGS, _apply_linear_stack,
                                        _envelope, _gauss_basis,
                                        make_escn_model,
                                        premerge_escn_params)
from pdb2reaction_tpu.mlip.escn_edge_kernel import _rot_nz, pack_d
from pdb2reaction_tpu.mlip.escn_ffn_kernel import fused_node_ffn
from pdb2reaction_tpu.core.neighbors import (dense_neighbors_rows,
                                             neighbor_vectors)
from pdb2reaction_tpu.mlip.so3 import (edge_rot_mat, num_coeffs,
                                       s2_grid_tables, wigner_full)

cfg0 = dataclasses.replace(ESCN_CONFIGS["escn-md"], edge_kernel="pallas-mega")
fn, params0, cfg = make_escn_model(cfg0, seed=0)
sys_ = _flagship_system()
coords0 = jnp.asarray(sys_.coords, jnp.float32)
params = premerge_escn_params(
    params0, cfg) if params0["energy_head"][0]["w"].ndim == 3 else params0
dt = cfg.dtype
P = coords0.shape[0]
C = cfg.sphere_channels
M = num_coeffs(cfg.lmax)
K = cfg.max_neighbors
E_ = P * K
used = jnp.asarray(E._used_indices(cfg.lmax, cfg.mmax))
nnz = len(_rot_nz(cfg.lmax, cfg.mmax)[0])
print(f"P={P} K={K} E={E_} M={M} C={C} nnz={nnz}")

rng = np.random.default_rng(0)
from _marginal import dyn_marginal as marginal


# ---- node S2-FFN kernel ----------------------------------------------------
blk = params["blocks"][0]
tg, fg = s2_grid_tables(cfg.lmax, *cfg.grid)
tg = jnp.asarray(tg, dt)
fg = jnp.asarray(fg, dt)
W1, b1 = blk["ffn"][0]["w"], blk["ffn"][0]["b"]
W2, b2 = blk["ffn"][1]["w"], blk["ffn"][1]["b"]
x0 = jnp.asarray(rng.normal(size=(P, M, C)) * 0.3, dt)


@jax.jit
def run_ffn_fwd(n, x):
    def body(i, x):
        return x + 1e-6 * fused_node_ffn(cfg, x, (W1, b1, W2, b2),
                                         (tg, fg)).astype(dt)
    return jax.lax.fori_loop(0, n, body, x)


@jax.jit
def run_ffn_fwdbwd(n, x):
    def body(i, x):
        g = jax.grad(lambda xx: jnp.sum(fused_node_ffn(
            cfg, xx, (W1, b1, W2, b2), (tg, fg)) ** 2))(x)
        return x + 1e-9 * g
    return jax.lax.fori_loop(0, n, body, x)


t = marginal("ffn fwd", run_ffn_fwd, x0)
print(f"  x4 layers = {4*t:.1f} ms")
t = marginal("ffn fwd+bwd", run_ffn_fwdbwd, x0)
print(f"  x4 layers = {4*t:.1f} ms")


# ---- geometry chain: coords -> packed Wigner rows --------------------------
system = sys_


def geom_chain(coords):
    idx, nbr_mask = dense_neighbors_rows(coords, system.atom_mask,
                                         cfg.cutoff, cfg.max_neighbors,
                                         0, P)
    idx = jax.lax.stop_gradient(idx)
    nbr_mask = jax.lax.stop_gradient(nbr_mask).astype(dt)
    vec, dist = neighbor_vectors(coords, idx, nbr_mask, origin=coords)
    rot = edge_rot_mat(vec.astype(dt) + (1.0 - nbr_mask[..., None]))
    D_sel = wigner_full(rot, cfg.lmax)[..., used, :].astype(dt)
    env = (_envelope(dist.astype(dt), cfg) * nbr_mask)[..., None]
    Dp_pk = pack_d(cfg, D_sel)
    Dpe_pk = Dp_pk * env
    Dp_t = jnp.transpose(Dp_pk, (2, 0, 1)).reshape(nnz, E_)
    Dpe_t = jnp.transpose(Dpe_pk, (2, 0, 1)).reshape(nnz, E_)
    return Dp_t, Dpe_t


ct1 = jnp.asarray(rng.normal(size=(nnz, E_)), jnp.float32)
ct2 = jnp.asarray(rng.normal(size=(nnz, E_)), jnp.float32)


@jax.jit
def run_geom_fwd(n, c):
    def body(i, c):
        a, b = geom_chain(c)
        return c + 1e-9 * jnp.sum(a[0, :3] + b[0, :3])
    return jax.lax.fori_loop(0, n, body, c)


@jax.jit
def run_geom_fwdbwd(n, c):
    def body(i, c):
        def loss(cc):
            a, b = geom_chain(cc)
            return jnp.sum(a * ct1) + jnp.sum(b * ct2)
        return c + 1e-12 * jax.grad(loss)(c)
    return jax.lax.fori_loop(0, n, body, c)


marginal("geom chain fwd (once/call)", run_geom_fwd, coords0)
marginal("geom chain fwd+vjp", run_geom_fwdbwd, coords0)


# ---- invariant edge scalars -------------------------------------------------
idx0, nbr0 = dense_neighbors_rows(coords0, system.atom_mask, cfg.cutoff,
                                  cfg.max_neighbors, 0, P)
z_full = jnp.clip(system.numbers, 0, cfg.max_z)
z = z_full


def edge_scalars(dist):
    gauss = _gauss_basis(dist, cfg)
    esrc = params["source_embedding"][z_full[idx0]]
    etgt = jnp.broadcast_to(params["target_embedding"][z][:, None, :],
                            esrc.shape)
    return _apply_linear_stack(
        params["edge_mlp"], jnp.concatenate([esrc, etgt, gauss], -1))


d0 = jnp.asarray(rng.uniform(0.8, 5.0, size=(P, K)), dt)
ct3 = jnp.asarray(rng.normal(size=(P, K, cfg.edge_channels)), dt)


@jax.jit
def run_es_fwdbwd(n, d):
    def body(i, d):
        g = jax.grad(lambda dd: jnp.sum(edge_scalars(dd) * ct3))(d)
        return d + 1e-12 * g
    return jax.lax.fori_loop(0, n, body, d)


marginal("edge scalars fwd+vjp (once/call)", run_es_fwdbwd, d0)
