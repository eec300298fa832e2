"""Round-3 follow-up breakdown: energy-only marginal, the edge-degree
embedding block, and the MoLE weight merges."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_system
from pdb2reaction_tpu.mlip.escn import (ESCN_CONFIGS, _mole,
                                        make_escn_model)
from pdb2reaction_tpu.mlip.so3 import num_coeffs

print("devices:", jax.devices())
sys_ = _flagship_system()
coords0 = jnp.asarray(sys_.coords, jnp.float32)
import dataclasses
cfg0 = dataclasses.replace(ESCN_CONFIGS["escn-md"],
                           edge_kernel="pallas-mega")
fn, params, cfg = make_escn_model(cfg0, seed=0)
dt = cfg.dtype
P = coords0.shape[0]
C = cfg.sphere_channels
M = num_coeffs(cfg.lmax)
K = cfg.max_neighbors
E = P * K

N1, N2 = 8, 24


def rate(tag, make_loop, arg):
    f1, f2 = make_loop(N1), make_loop(N2)
    for f in (f1, f2):
        jax.block_until_ready(f(arg))
        jax.block_until_ready(f(arg))
    ts = []
    for f, n in ((f1, N1), (f2, N2)):
        t0 = time.perf_counter()
        jax.block_until_ready(f(arg))
        ts.append(time.perf_counter() - t0)
    ms = (ts[1] - ts[0]) / (N2 - N1) * 1e3
    print(f"{tag:44s} {ms:8.2f} ms/iter   (totals {ts[0]*1e3:.1f} / "
          f"{ts[1]*1e3:.1f} ms)")
    return ms


# ---- energy-only marginal -------------------------------------------------
def make_e(n):
    @jax.jit
    def run(p, c):
        def body(i, c):
            e = fn(c, sys_, p)
            return c * (1.0 + 0.0 * e) + 1e-9 * e
        return jax.lax.fori_loop(0, n, body, c)
    return run


def rate2(tag, make_loop):
    f1, f2 = make_loop(N1), make_loop(N2)
    for f in (f1, f2):
        jax.block_until_ready(f(params, coords0))
        jax.block_until_ready(f(params, coords0))
    ts = []
    for f in (f1, f2):
        t0 = time.perf_counter()
        jax.block_until_ready(f(params, coords0))
        ts.append(time.perf_counter() - t0)
    ms = (ts[1] - ts[0]) / (N2 - N1) * 1e3
    print(f"{tag:44s} {ms:8.2f} ms/iter   (totals {ts[0]*1e3:.1f} / "
          f"{ts[1]*1e3:.1f} ms)")
    return ms


rate2("escn_energy fwd only (full model)", make_e)


# ---- deg-embedding block fwd+bwd -----------------------------------------
from pdb2reaction_tpu.mlip.escn import (_envelope, _used_indices,
                                        _apply_linear_stack, _gauss_basis)
from pdb2reaction_tpu.core.neighbors import (dense_neighbors_rows,
                                             neighbor_vectors)
from pdb2reaction_tpu.mlip.so3 import edge_rot_mat, wigner_full

alpha = jnp.ones((cfg.num_experts,), dt) / cfg.num_experts


@jax.jit
def pro(c):
    idx, nbr_mask = dense_neighbors_rows(c, sys_.atom_mask, cfg.cutoff,
                                         cfg.max_neighbors, 0, P)
    nbr_mask = nbr_mask.astype(dt)
    vec, dist = neighbor_vectors(c, idx, nbr_mask, origin=c)
    rot = edge_rot_mat(vec.astype(dt) + (1.0 - nbr_mask[..., None]))
    used = jnp.asarray(_used_indices(cfg.lmax, cfg.mmax))
    D_sel = wigner_full(rot, cfg.lmax)[..., used, :].astype(dt)
    gauss = _gauss_basis(dist.astype(dt), cfg)
    z_full = jnp.clip(sys_.numbers, 0, cfg.max_z)
    esrc = params["source_embedding"][z_full[idx]]
    etgt = jnp.broadcast_to(params["target_embedding"][z_full][:, None, :],
                            esrc.shape)
    edge_scalar = _apply_linear_stack(
        params["edge_mlp"], jnp.concatenate([esrc, etgt, gauss], -1))
    env = (_envelope(dist.astype(dt), cfg) * nbr_mask)[..., None]
    return D_sel, edge_scalar, env


D_sel, edge_scalar, env = pro(coords0)
D_sel = jax.lax.stop_gradient(D_sel)
edge_scalar = jax.lax.stop_gradient(edge_scalar)
env = jax.lax.stop_gradient(env)


def deg_block(D_sel, edge_scalar, env):
    deg = _mole(params["edge_degree_proj"], alpha,
                edge_scalar).reshape(P, cfg.max_neighbors,
                                     cfg.lmax + 1, C)
    deg_back = jnp.einsum("...um,...uc->...mc",
                          D_sel[..., : cfg.lmax + 1, :], deg)
    return jnp.sum(deg_back * env[..., None], axis=1) / cfg.avg_degree


def make_deg_fwd(n):
    @jax.jit
    def run(D):
        def body(i, D):
            o = deg_block(D, edge_scalar, env)
            return D + 1e-9 * jnp.sum(o)
        return jax.lax.fori_loop(0, n, body, D)
    return run


def make_deg_fb(n):
    @jax.jit
    def run(D):
        def body(i, D):
            g = jax.grad(lambda DD: jnp.sum(
                deg_block(DD, edge_scalar, env)))(D)
            return D + 1e-6 * g
        return jax.lax.fori_loop(0, n, body, D)
    return run


rate("deg-embedding block fwd", make_deg_fwd, D_sel)
rate("deg-embedding block fwd+bwd", make_deg_fb, D_sel)


# ---- MoLE weight merges (4 layers of conv1+conv2+ffn+head) ---------------
def merges(a):
    tot = 0.0
    for blk in params["blocks"]:
        for conv in (blk["so2_conv_1"], blk["so2_conv_2"]):
            for k, p in conv.items():
                W = jnp.einsum("e,eio->io", a, p["w"])
                tot += jnp.sum(W * 1e-9)
        for p in blk["ffn"]:
            W = jnp.einsum("e,eio->io", a, p["w"])
            tot += jnp.sum(W * 1e-9)
    return tot


def make_merge(n):
    @jax.jit
    def run(a):
        def body(i, a):
            return a + 1e-12 * merges(a)
        return jax.lax.fori_loop(0, n, body, a)
    return run


rate("MoLE merges (all layers)", make_merge, alpha)
