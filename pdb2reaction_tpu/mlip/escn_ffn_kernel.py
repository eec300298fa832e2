"""Fused node S2-FFN Pallas kernel: to-grid -> MoLE FFN -> from-grid,
per node, entirely in VMEM.

HLO traffic analysis of the escn-md force program (round 3) showed the
per-node point-wise S2 FFN — not the edge chain — carrying most of the
HBM traffic: the [P, G, H] grid activations (f32[320, 460, 256] at
escn-md scale = 151 MB each) are materialized many times across the
to-grid einsum, two MoLE matmuls, SiLU, from-grid einsum, and their
backward, leaving the whole force call HBM-bound at ~889 GB/s effective
(v5e ~819 GB/s peak: speed-of-light on the WRONG byte count). This kernel
keeps the full per-node chain

    grid = tg [G, M] @ x_i [M, C]        (to-grid, full-l basis)
    h    = silu(grid @ W1 + b1)          (merged-MoLE hidden)
    y    = h @ W2 + b2
    out  = fg [M, G] @ y                 (from-grid)

in VMEM for a tile of TP nodes, so the only HBM traffic per layer is the
node features in ([P, M, C]) and the residual out — ~6 MB instead of
~6 GB at escn-md scale. to-grid/from-grid run per node (their contraction
dim is only M); the two FFN matmuls are batched ACROSS the tile as one
[TP*G, C] x [C, H] pair (no batched dot needed, mirroring
escn_edge_kernel's layout rule). Matmuls run in bf16 with f32
accumulation on TPU, f32 in interpret mode (same policy as the edge
kernel).

Backward: ``jax.custom_vjp`` with a mirrored Pallas kernel that
recomputes the cheap grid/hidden intermediates from the saved input
(nothing besides x is saved). Weight cotangents ride an XLA replay that
force-only (coordinate-grad) calls DCE away — identical pattern to
``fused_edge_chain``. Forward-mode AD (Hessian HVPs) does not flow
through a custom_vjp; the calculator keeps the XLA path for Hessian
kernels (mlip/uma.py wires edge_kernel="xla" there, which also disables
this kernel via the "auto" coupling in mlip/escn.py).

Capability match: fairchem UMA's eSCN S2 activation path (SURVEY §2.3
fairchem row); the grid math itself is unchanged from mlip/escn.py's XLA
formulation (same s2_grid_tables, same merged-MoLE weights).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .escn_edge_kernel import _bf, _dot, _full_spec, _interpret, _silu

def _tp():
    """Nodes per grid step. The FFN matmuls are batched ACROSS the tile
    (one [TP*G, C] x [C, H] matmul instead of TP separate [G, C] x [C, H]
    ones — amortizes the MXU weight load and widens the sublane dim), so
    TP directly sets the FFN matmul height. Env-tunable for sweeps
    (PDB2R_TPU_FFN_TP; builders are lru_cached — fresh process per value).

    Default 16: measured on v5e at escn-md scale (P=320, G=460, H=256,
    2026-08-19) the force-call chain (fwd+bwd marginal) runs 0.33 ms/layer
    at TP=16 vs 0.43 at TP=8 vs 0.51 with the original per-node matmuls;
    the fwd-only marginal slightly prefers TP=8 (0.12 vs 0.23) but force
    calls dominate every workflow."""
    import os
    return int(os.environ.get("PDB2R_TPU_FFN_TP", "16"))


def _ffn_fwd_kernel(TP, refs):
    x_ref, w1, b1, w2, b2, tg, fg, out_ref = refs
    G = tg.shape[0]
    # per-node to-grid (contraction dim is only M: batching would need a
    # lane->sublane relayout), then ONE tile-wide FFN matmul pair
    gcat = jnp.concatenate([_dot(tg[:], x_ref[i]) for i in range(TP)],
                           axis=0)                      # [TP*G, C] f32
    h = _silu(_dot(gcat.astype(w1.dtype), w1[:]) + b1[:])
    y = _dot(h.astype(w2.dtype), w2[:]) + b2[:]         # [TP*G, C] f32
    for i in range(TP):
        out_ref[i] = _dot(fg[:], y[i * G:(i + 1) * G, :].astype(fg.dtype)) \
            .astype(out_ref.dtype)


def _ffn_bwd_kernel(TP, refs):
    x_ref, g_ref, w1, b1, w1t, w2t, tg, tgt, fgt, dx_ref = refs
    G = tg.shape[0]
    grid = jnp.concatenate([_dot(tg[:], x_ref[i]) for i in range(TP)],
                           axis=0)                      # [TP*G, C] f32
    pre = _dot(grid.astype(w1.dtype), w1[:]) + b1[:]    # [TP*G, H]
    s = jax.nn.sigmoid(pre)
    dy = jnp.concatenate(
        [_dot(fgt[:], g_ref[i].astype(fgt.dtype)) for i in range(TP)],
        axis=0)                                         # [TP*G, C]
    dh = _dot(dy.astype(w2t.dtype), w2t[:])             # [TP*G, H]
    dpre = dh * (s * (1.0 + pre * (1.0 - s)))           # silu'
    dgrid = _dot(dpre.astype(w1t.dtype), w1t[:])        # [TP*G, C]
    for i in range(TP):
        dx_ref[i] = _dot(
            tgt[:], dgrid[i * G:(i + 1) * G, :].astype(tgt.dtype)) \
            .astype(dx_ref.dtype)


@functools.lru_cache(maxsize=None)
def _ffn_fwd_call(M, C, H, G, P, TP):
    Pp = ((P + TP - 1) // TP) * TP
    bf = _bf()
    in_specs = [
        pl.BlockSpec((TP, M, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),          # x
        _full_spec((C, H)), _full_spec((1, H)),         # W1, b1
        _full_spec((H, C)), _full_spec((1, C)),         # W2, b2
        _full_spec((G, M)), _full_spec((M, G)),         # tg, fg
    ]
    out_shape = jax.ShapeDtypeStruct((Pp, M, C), bf)
    out_specs = pl.BlockSpec((TP, M, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)

    def kernel(*refs):
        _ffn_fwd_kernel(TP, refs)

    return pl.pallas_call(
        kernel, grid=(Pp // TP,), in_specs=in_specs,
        out_shape=out_shape, out_specs=out_specs,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))


@functools.lru_cache(maxsize=None)
def _ffn_bwd_call(M, C, H, G, P, TP):
    Pp = ((P + TP - 1) // TP) * TP
    node_spec = pl.BlockSpec((TP, M, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        node_spec, node_spec,                           # x, g
        _full_spec((C, H)), _full_spec((1, H)),         # W1, b1
        _full_spec((H, C)),                             # W1^T
        _full_spec((C, H)),                             # W2^T
        _full_spec((G, M)), _full_spec((M, G)),         # tg, tg^T
        _full_spec((G, M)),                             # fg^T
    ]
    out_shape = jax.ShapeDtypeStruct((Pp, M, C), jnp.float32)

    def kernel(*refs):
        _ffn_bwd_kernel(TP, refs)

    return pl.pallas_call(
        kernel, grid=(Pp // TP,), in_specs=in_specs,
        out_shape=out_shape, out_specs=node_spec,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))


def _pad_nodes(x, TP):
    P = x.shape[0]
    Pp = ((P + TP - 1) // TP) * TP
    if Pp == P:
        return x
    return jnp.pad(x, [(0, Pp - P)] + [(0, 0)] * (x.ndim - 1))


def ffn_xla(x, weights, tables):
    """XLA reference of the same chain (parity tests + the weight-grad
    replay, which force-only calls DCE away)."""
    W1, b1, W2, b2 = weights
    tg, fg = tables
    grid = jnp.einsum("gm,pmc->pgc", tg.astype(x.dtype), x)
    y = jax.nn.silu(grid @ W1 + b1) @ W2 + b2
    return jnp.einsum("mg,pgc->pmc", fg.astype(x.dtype), y)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_node_ffn(cfg, x, weights, tables):
    """x [P, M, C] node coefficients (M = (lmax+1)^2 full basis);
    weights = merged-MoLE (W1 [C,H], b1 [H], W2 [H,C], b2 [C]) f32;
    tables = (tg [G, M], fg [M, G]). Returns [P, M, C] bf16 (f32 in
    interpret mode)."""
    out, _ = _ffn_fwd_impl(x, weights, tables)
    return out


def _ffn_flat(weights, tables, *, for_bwd):
    W1, b1, W2, b2 = weights
    tg, fg = tables
    bf = _bf()
    if not for_bwd:
        return [W1.astype(bf), b1.astype(jnp.float32)[None, :],
                W2.astype(bf), b2.astype(jnp.float32)[None, :],
                tg.astype(bf), fg.astype(bf)]
    return [W1.astype(bf), b1.astype(jnp.float32)[None, :],
            W1.T.astype(bf), W2.T.astype(bf),
            tg.astype(bf), tg.T.astype(bf), fg.T.astype(bf)]


def _ffn_fwd_impl(x, weights, tables):
    P, M, C = x.shape
    H = weights[0].shape[1]
    G = tables[0].shape[0]
    xp = _pad_nodes(x, _tp()).astype(_bf())
    out = _ffn_fwd_call(M, C, H, G, P, _tp())(
        xp, *_ffn_flat(weights, tables, for_bwd=False))
    return out[:P], xp


def _ffn_vjp_fwd(cfg, x, weights, tables):
    out, xp = _ffn_fwd_impl(x, weights, tables)
    return out, (x, xp, weights, tables)


def _ffn_vjp_bwd(cfg, res, g):
    x, xp, weights, tables = res
    P, M, C = x.shape
    H = weights[0].shape[1]
    G = tables[0].shape[0]
    gp = _pad_nodes(g.astype(jnp.float32), _tp())
    dx = _ffn_bwd_call(M, C, H, G, P, _tp())(
        xp, gp, *_ffn_flat(weights, tables, for_bwd=True))[:P]

    # weight cotangents via XLA replay (DCE'd by force-only calls)
    _, wvjp = jax.vjp(lambda w: ffn_xla(x, w, tables), weights)
    (gw,) = wvjp(g.astype(x.dtype))
    g_tables = (jnp.zeros_like(tables[0]), jnp.zeros_like(tables[1]))
    return (dx.astype(x.dtype), gw, g_tables)


fused_node_ffn.defvjp(_ffn_vjp_fwd, _ffn_vjp_bwd)
