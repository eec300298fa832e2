"""Component-level timing of the escn-md force call on v5e: prologue
(neighbors + Wigner + edge scalars), the mega edge kernel, the FFN
kernel, and the norms — each standalone with chained inputs."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_system
from pdb2reaction_tpu.mlip.escn import (
    ESCN_CONFIGS, _edge_grid_tables, _envelope, _equi_rms_norm,
    _gauss_basis, _mole, _apply_linear_stack, _used_indices,
    make_escn_model)
from pdb2reaction_tpu.mlip.so3 import (edge_rot_mat, num_coeffs,
                                       s2_grid_tables, wigner_full)
from pdb2reaction_tpu.core.neighbors import (dense_neighbors_rows,
                                             neighbor_vectors)

print("devices:", jax.devices())
sys_ = _flagship_system()
coords0 = jnp.asarray(sys_.coords, jnp.float32)
cfg = ESCN_CONFIGS["escn-md"]
fn, params, cfg = make_escn_model(cfg, seed=0)
dt = cfg.dtype
P = coords0.shape[0]
C = cfg.sphere_channels
M = num_coeffs(cfg.lmax)
K = cfg.max_neighbors
E = P * K


def timeit(tag, f, args, iters=10, chain=None):
    o = f(*args)
    jax.block_until_ready(o)
    # burn-in loop (relay first-program setup)
    for it in range(3):
        args = chain(args, o, it) if chain else args
        o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for it in range(iters):
        args = chain(args, o, it) if chain else args
        o = f(*args)
    jax.block_until_ready(o)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag:44s} {ms:8.2f} ms")
    return ms, o


# ---- 1. prologue ---------------------------------------------------------
@jax.jit
def prologue(p, coords_ang):
    idx, nbr_mask = dense_neighbors_rows(coords_ang, sys_.atom_mask,
                                         cfg.cutoff, cfg.max_neighbors,
                                         0, P)
    idx = jax.lax.stop_gradient(idx)
    nbr_mask = jax.lax.stop_gradient(nbr_mask).astype(dt)
    vec, dist = neighbor_vectors(coords_ang, idx, nbr_mask, origin=coords_ang)
    rot = edge_rot_mat(vec.astype(dt) + (1.0 - nbr_mask[..., None]))
    used = jnp.asarray(_used_indices(cfg.lmax, cfg.mmax))
    D_sel = wigner_full(rot, cfg.lmax)[..., used, :].astype(dt)
    z_full = jnp.clip(sys_.numbers, 0, cfg.max_z)
    gauss = _gauss_basis(dist.astype(dt), cfg)
    esrc = p["source_embedding"][z_full[idx]]
    etgt = jnp.broadcast_to(p["target_embedding"][z_full][:, None, :],
                            esrc.shape)
    edge_scalar = _apply_linear_stack(
        p["edge_mlp"], jnp.concatenate([esrc, etgt, gauss], -1))
    env = (_envelope(dist.astype(dt), cfg) * nbr_mask)[..., None]
    return D_sel, edge_scalar, env, idx


def chain_coords(args, o, it):
    return (args[0], args[1] + 1e-6 * jnp.sum(o[0]) * 0 +
            1e-7 * (it + 1))


ms_pro, pro_out = timeit("prologue (graph+wigner+edge scalars)", prologue,
                         (params, coords0), chain=chain_coords)
D_sel, edge_scalar, env, idx = [jax.lax.stop_gradient(x) for x in pro_out]

# ---- 2. mega edge kernel (one layer), fwd and fwd+bwd --------------------
from pdb2reaction_tpu.mlip.escn_edge_kernel import (fused_edge_mega,
                                                    pack_d, _rot_nz)

blk = params["blocks"][0]
alpha = jnp.ones((cfg.num_experts,), dt) / cfg.num_experts


def mw(p):
    return (jnp.einsum("e,eio->io", alpha, p["w"]),
            jnp.einsum("e,eo->o", alpha, p["b"]))


c1, c2 = blk["so2_conv_1"], blk["so2_conv_2"]
W0, b0 = mw(c1["fc_m0"])
V0, c0 = mw(c2["fc_m0"])
Wrs, Wis, brs, bis = [], [], [], []
Vrs, Vis, crs, cis = [], [], [], []
for mm in range(1, cfg.mmax + 1):
    wr, br = mw(c1[f"fc_m{mm}_r"])
    wi, bi = mw(c1[f"fc_m{mm}_i"])
    Wrs.append(wr), Wis.append(wi)
    brs.append(br - bi), bis.append(br + bi)
    vr, cr = mw(c2[f"fc_m{mm}_r"])
    vi, ci = mw(c2[f"fc_m{mm}_i"])
    Vrs.append(vr), Vis.append(vi)
    crs.append(cr - ci), cis.append(cr + ci)
weights = (W0, tuple(Wrs), tuple(Wis), b0, tuple(brs), tuple(bis),
           V0, tuple(Vrs), tuple(Vis), c0, tuple(crs), tuple(cis))
tg_e, fg_e = _edge_grid_tables(cfg.lmax, cfg.mmax)
tables = (jnp.asarray(tg_e, dt), jnp.asarray(fg_e, dt))

nnz = len(_rot_nz(cfg.lmax, cfg.mmax)[0])
Dp_pk = pack_d(cfg, D_sel)
Dpe_pk = Dp_pk * env
Dp_t = jnp.transpose(Dp_pk, (2, 0, 1)).reshape(nnz, E)
Dpe_t = jnp.transpose(Dpe_pk, (2, 0, 1)).reshape(nnz, E)
es_t = edge_scalar.reshape(E, cfg.edge_channels).T
srcf = idx.reshape(E).astype(jnp.float32)

x0 = jax.random.normal(jax.random.PRNGKey(0), (M * C, P), dt) * 0.1


@jax.jit
def mega_fwd(x_t, es_t, Dp_t, Dpe_t):
    return fused_edge_mega(cfg, x_t, srcf, es_t, Dp_t, Dpe_t, weights,
                           tables)


@jax.jit
def mega_fb(x_t, es_t, Dp_t, Dpe_t):
    def loss(x_t, es_t, Dp_t, Dpe_t):
        return jnp.sum(fused_edge_mega(cfg, x_t, srcf, es_t, Dp_t, Dpe_t,
                                       weights, tables))
    l, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
        x_t, es_t, Dp_t, Dpe_t)
    return g


def chain_x(args, o, it):
    upd = o if not isinstance(o, tuple) else o[0]
    return (args[0] + 1e-6 * upd[:, :args[0].shape[1]]
            if upd.shape == args[0].shape
            else args[0] * (1.0 + 1e-7 * (it + 1)),) + args[1:]


timeit("mega edge kernel fwd (1 layer)", mega_fwd,
       (x0, es_t, Dp_t, Dpe_t), chain=chain_x)
timeit("mega edge kernel fwd+bwd (1 layer)", mega_fb,
       (x0, es_t, Dp_t, Dpe_t), chain=chain_x)

# ---- 3. FFN kernel (one layer) -------------------------------------------
from pdb2reaction_tpu.mlip.escn_ffn_kernel import fused_node_ffn

W1, b1 = mw(blk["ffn"][0])
W2, b2 = mw(blk["ffn"][1])
tgn, fgn = s2_grid_tables(cfg.lmax, *cfg.grid)
ntables = (jnp.asarray(tgn, dt), jnp.asarray(fgn, dt))
xn0 = jax.random.normal(jax.random.PRNGKey(1), (P, M, C), dt) * 0.1


@jax.jit
def ffn_fwd(x):
    return fused_node_ffn(cfg, x, (W1, b1, W2, b2), ntables)


@jax.jit
def ffn_fb(x):
    def loss(x):
        return jnp.sum(fused_node_ffn(cfg, x, (W1, b1, W2, b2), ntables))
    return jax.grad(loss)(x)


def chain_n(args, o, it):
    return (args[0] + 1e-6 * o.astype(args[0].dtype),)


timeit("FFN kernel fwd (1 layer)", ffn_fwd, (xn0,), chain=chain_n)
timeit("FFN kernel fwd+bwd (1 layer)", ffn_fb, (xn0,), chain=chain_n)

# ---- 4. norms ------------------------------------------------------------
gamma = params["blocks"][0]["norm_1"]


@jax.jit
def norm(x):
    return _equi_rms_norm(jnp.transpose(x.reshape(M, C, P), (2, 0, 1)),
                          gamma, cfg)


timeit("equi RMS norm + transpose (1 layer)", norm, (x0,),
       chain=lambda a, o, it: (a[0] * (1.0 + 1e-7),))

# ---- 5. prologue bwd ------------------------------------------------------
@jax.jit
def prologue_fb(p, coords_ang):
    def loss(c):
        D_sel, edge_scalar, env, _ = prologue(p, c)
        return (jnp.sum(D_sel * 1e-3) + jnp.sum(edge_scalar * 1e-3)
                + jnp.sum(env))
    return jax.grad(loss)(coords_ang)


timeit("prologue fwd+bwd", prologue_fb, (params, coords0),
       chain=lambda a, o, it: (a[0], a[1] + 1e-6 * o))
