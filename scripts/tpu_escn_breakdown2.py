"""Device-side component timing: each component runs N chained iterations
inside ONE jitted fori_loop, so relay dispatch overhead is paid once.
Per-iteration cost = (t(N=2k) - t(N=k)) / k."""
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
    _gauss_basis, _apply_linear_stack, _used_indices, make_escn_model)
from pdb2reaction_tpu.mlip.so3 import (edge_rot_mat, num_coeffs,
                                       s2_grid_tables, wigner_full)
from pdb2reaction_tpu.core.neighbors import (dense_neighbors_rows,
                                             neighbor_vectors)

print("devices:", jax.devices())
sys_ = _flagship_system()
coords0 = jnp.asarray(sys_.coords, jnp.float32)
fn, params, cfg = make_escn_model(ESCN_CONFIGS["escn-md"], seed=0)
dt = cfg.dtype
P = coords0.shape[0]
C = cfg.sphere_channels
M = num_coeffs(cfg.lmax)
K = cfg.max_neighbors
E = P * K

N1, N2 = 8, 24


def rate(tag, make_loop, arg):
    """make_loop(n) -> jitted fn running n chained iterations."""
    f1, f2 = make_loop(N1), make_loop(N2)
    for f in (f1, f2):
        jax.block_until_ready(f(arg))          # compile
        jax.block_until_ready(f(arg))          # burn-in
    ts = []
    for f, n in ((f1, N1), (f2, N2)):
        t0 = time.perf_counter()
        jax.block_until_ready(f(arg))
        ts.append(time.perf_counter() - t0)
    ms = (ts[1] - ts[0]) / (N2 - N1) * 1e3
    print(f"{tag:44s} {ms:8.2f} ms/iter   (totals {ts[0]*1e3:.1f} / "
          f"{ts[1]*1e3:.1f} ms)")
    return ms


# ---------- shared prologue pieces ----------------------------------------
def prologue(p, coords_ang):
    idx, nbr_mask = dense_neighbors_rows(coords_ang, sys_.atom_mask,
                                         cfg.cutoff, cfg.max_neighbors,
                                         0, P)
    idx = jax.lax.stop_gradient(idx)
    nbr_mask = jax.lax.stop_gradient(nbr_mask).astype(dt)
    vec, dist = neighbor_vectors(coords_ang, idx, nbr_mask,
                                 origin=coords_ang)
    rot = edge_rot_mat(vec.astype(dt) + (1.0 - nbr_mask[..., None]))
    used = jnp.asarray(_used_indices(cfg.lmax, cfg.mmax))
    D_sel = wigner_full(rot, cfg.lmax)[..., used, :].astype(dt)
    gauss = _gauss_basis(dist.astype(dt), cfg)
    z_full = jnp.clip(sys_.numbers, 0, cfg.max_z)
    esrc = p["source_embedding"][z_full[idx]]
    etgt = jnp.broadcast_to(p["target_embedding"][z_full][:, None, :],
                            esrc.shape)
    edge_scalar = _apply_linear_stack(
        p["edge_mlp"], jnp.concatenate([esrc, etgt, gauss], -1))
    env = (_envelope(dist.astype(dt), cfg) * nbr_mask)[..., None]
    return D_sel, edge_scalar, env, idx


def make_pro_loop(n):
    @jax.jit
    def run(c):
        def body(i, carry):
            c = carry
            D_sel, es, env, idx = prologue(params, c)
            return c + 1e-9 * jnp.sum(D_sel) + 1e-9 * jnp.sum(es)
        return jax.lax.fori_loop(0, n, body, c)
    return run


rate("prologue (graph+wigner+edge scalars)", make_pro_loop, coords0)

# ---------- kernel inputs --------------------------------------------------
from pdb2reaction_tpu.mlip.escn_edge_kernel import (fused_edge_mega,
                                                    pack_d, _rot_nz)
from pdb2reaction_tpu.mlip.escn_ffn_kernel import fused_node_ffn

D_sel, edge_scalar, env, idx = jax.jit(prologue)(params, coords0)
alpha = jnp.ones((cfg.num_experts,), dt) / cfg.num_experts
blk = params["blocks"][0]


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
Dp_t = jnp.transpose(Dp_pk, (2, 0, 1)).reshape(nnz, E)
Dpe_t = jnp.transpose(Dp_pk * env, (2, 0, 1)).reshape(nnz, E)
es_t = edge_scalar.reshape(E, cfg.edge_channels).T
srcf = idx.reshape(E).astype(jnp.float32)
x0 = jax.random.normal(jax.random.PRNGKey(0), (M * C, P), dt) * 0.1


def make_mega_fwd(n):
    @jax.jit
    def run(x):
        def body(i, x):
            o = fused_edge_mega(cfg, x, srcf, es_t, Dp_t, Dpe_t, weights,
                                tables)
            return x + 1e-6 * o.astype(x.dtype)
        return jax.lax.fori_loop(0, n, body, x)
    return run


def make_mega_fb(n):
    @jax.jit
    def run(x):
        def body(i, x):
            g = jax.grad(lambda xx: jnp.sum(fused_edge_mega(
                cfg, xx, srcf, es_t, Dp_t, Dpe_t, weights, tables)))(x)
            return x + 1e-6 * g.astype(x.dtype)
        return jax.lax.fori_loop(0, n, body, x)
    return run


rate("mega edge kernel fwd (1 layer)", make_mega_fwd, x0)
rate("mega edge kernel fwd+bwd (1 layer)", make_mega_fb, x0)

W1, b1 = mw(blk["ffn"][0])
W2, b2 = mw(blk["ffn"][1])
tgn, fgn = s2_grid_tables(cfg.lmax, *cfg.grid)
ntables = (jnp.asarray(tgn, dt), jnp.asarray(fgn, dt))
xn0 = jax.random.normal(jax.random.PRNGKey(1), (P, M, C), dt) * 0.1


def make_ffn_fwd(n):
    @jax.jit
    def run(x):
        def body(i, x):
            return x + 1e-6 * fused_node_ffn(
                cfg, x, (W1, b1, W2, b2), ntables).astype(x.dtype)
        return jax.lax.fori_loop(0, n, body, x)
    return run


def make_ffn_fb(n):
    @jax.jit
    def run(x):
        def body(i, x):
            g = jax.grad(lambda xx: jnp.sum(fused_node_ffn(
                cfg, xx, (W1, b1, W2, b2), ntables)))(x)
            return x + 1e-6 * g.astype(x.dtype)
        return jax.lax.fori_loop(0, n, body, x)
    return run


rate("FFN kernel fwd (1 layer)", make_ffn_fwd, xn0)
rate("FFN kernel fwd+bwd (1 layer)", make_ffn_fb, xn0)

gamma = blk["norm_1"]


def make_norm(n):
    @jax.jit
    def run(x):
        def body(i, x):
            xn = _equi_rms_norm(x, gamma, cfg)
            return x + 1e-6 * xn
        return jax.lax.fori_loop(0, n, body, x)
    return run


rate("equi RMS norm (1 layer, node layout)", make_norm, xn0)


def make_pack(n):
    @jax.jit
    def run(D):
        def body(i, D):
            Dp = pack_d(cfg, D)
            Dp_t = jnp.transpose(Dp, (2, 0, 1)).reshape(nnz, E)
            Dpe_t = jnp.transpose(Dp * env, (2, 0, 1)).reshape(nnz, E)
            return D + 1e-9 * (jnp.sum(Dp_t) + jnp.sum(Dpe_t))
        return jax.lax.fori_loop(0, n, body, D)
    return run


rate("pack_d + transposes (per call)", make_pack, D_sel)


def make_pro_fb(n):
    @jax.jit
    def run(c):
        def body(i, c):
            def loss(cc):
                D_sel, es, env, _ = prologue(params, cc)
                return (jnp.sum(D_sel) * 1e-3 + jnp.sum(es) * 1e-3
                        + jnp.sum(env))
            g = jax.grad(loss)(c)
            return c + 1e-6 * g
        return jax.lax.fori_loop(0, n, body, c)
    return run


rate("prologue fwd+bwd (wigner VJP chain)", make_pro_fb, coords0)
