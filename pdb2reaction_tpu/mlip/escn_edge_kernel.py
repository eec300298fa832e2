"""Fused eSCN edge-chain Pallas kernel: SO(2) conv -> separable S2
activation -> SO(2) conv, per edge, entirely in VMEM.

The eSCN message chain is the FLOP and HBM hot spot of the UMA-class
backbone (fairchem ships custom CUDA for exactly this chain — SURVEY.md
§2.3 fairchem row). The XLA path materializes per-edge intermediates in
HBM ([E, U, h] conv hiddens, [E, G, h] activation grids — ~350 MB/layer at
300 atoms) and is HBM-bound. This kernel keeps the whole chain in VMEM,
reading ONE bf16 tensor per edge tile and writing one bf16 tensor.

Layout: FEATURES x EDGES. Every tensor is 2-D with the edge index in the
lane (last) dimension, so every step is a plain 2-D MXU matmul (Mosaic has
no batched dot), every slice is a contiguous row range, and the per-|m|
blocks concatenate along rows:

    pr [U*2C, E]   rows = (u-major, channel-minor) rotated pair features
    es [Ce, E]     invariant edge scalars
    x0cat = rows[0 : nl0*2C] ++ es  --W0t-->  y0 [nl0*h, E]
    xp_m, xn_m row slices           --Wr/Wi-> yp/yn [nl*h, E]
    msg = rows [U, h*E]  --tg--> grid [G, h*E] --silu/fg--> act [U, h*E]
    act row 0 := silu(msg row 0)              (separable-S2 semantics)
    conv2 the same pattern                    -> out [U*C, E] bf16

The caller (mlip/escn.py) produces ``pr`` directly from the Wigner-rotate
einsums in transposed layout (no standalone transpose pass) and folds the
envelope x rotate-back x K-sum into a single contraction on the output.

Matmuls run in bf16 with f32 accumulation (preferred_element_type):
~1e-3 relative precision — below the force-error floor of UMA-class MLIPs
(tens of meV/A) and switchable off via ``ESCNConfig.edge_kernel``.

Backward: ``jax.custom_vjp``. Input cotangents come from a mirrored
Pallas kernel (conv2^T -> act VJP -> conv1^T, recomputing the cheap
activation intermediates from the saved conv-1 output). Weight cotangents
are produced by an XLA replay of the chain — a separate subgraph that
force-only calls (grad w.r.t. coordinates) DCE away entirely; training
pays it knowingly. Forward-mode AD (analytic-Hessian HVPs) does NOT flow
through a custom_vjp — the calculator keeps the XLA path for Hessian
kernels (mlip/uma.py wires this).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dims(cfg):
    nl0 = cfg.lmax + 1
    nls = [cfg.lmax + 1 - m for m in range(1, cfg.mmax + 1)]
    U = nl0 + 2 * sum(nls)
    G = 2 * (cfg.lmax + 1) * (2 * cfg.mmax + 1)
    return nl0, nls, U, G


def _silu(x):
    # x / (1 + exp(-x)) with a dtype-matched constant: jax.nn.sigmoid
    # lowers with an f32 scalar broadcast that Mosaic rejects for bf16
    # vectors ('vector.broadcast' f32 -> vector<...xbf16>)
    return x / (jnp.asarray(1, x.dtype) + jnp.exp(-x))


def _ablate():
    """Comma-separated kernel ablations (PDB2R_TPU_MEGA_ABLATE) for the
    apportionment microbench ONLY (scripts/tpu_mega_micro4.py): 'noact'
    drops the S2 grid-activation chain, 'nosilu' keeps its matmuls but
    drops the transcendentals, 'norot' replaces the block-sparse Wigner
    rotations with row slices, 'nogather' drops all one-hot
    gather/scatter matmuls, 'noxs'/'noxt' drop only the source-gather /
    target-staging halves, 'noscat' drops only the final K-sum scatter.
    All change the math — never set outside a microbench. Builders are
    lru_cached: clear them after changing."""
    import os
    return os.environ.get("PDB2R_TPU_MEGA_ABLATE", "")


def _ablate_bwd():
    """BACKWARD-kernel ablations (PDB2R_TPU_MEGA_ABLATE_BWD), gated by a
    separate env var so a fwd+bwd fori-marginal with only this set
    isolates the backward component directly against an unablated
    forward (scripts/tpu_mega_micro5.py). Values: 'noact' (drop the
    grid VJP chain), 'nosilu' (keep its matmuls, drop transcendentals),
    'norot' (row slices for the three rotation transposes), 'nogd'
    (skip the gdp/gdpe VPU row-sums), 'nogather' (drop one-hot
    gather/scatter matmuls). Wrong math — microbench only."""
    import os
    return os.environ.get("PDB2R_TPU_MEGA_ABLATE_BWD", "")


def _rot16():
    """When set (PDB2R_TPU_MEGA_ROT16=1), the mega kernel's block-sparse
    Wigner rotations multiply-accumulate in bf16 instead of f32.

    MEASURED NEGATIVE (v5e, 2026-08-19, scripts/tpu_rot16.py): no
    speedup (kernel fwd 1.62 vs 1.52-1.62 baseline ms/layer, fwd+bwd
    3.94 vs 3.73) and force parity vs the XLA chain degrades to 1.2e-2
    relative (baseline ~1e-4) — Mosaic's VPU elementwise runs bf16 at
    f32 rate on v5e, so the extra casts only add cost while the
    per-term rounding compounds. Kept env-gated OFF as the recorded
    experiment; do not enable in production."""
    import os
    return os.environ.get("PDB2R_TPU_MEGA_ROT16", "") not in ("", "0")


def _gd16():
    """When set (PDB2R_TPU_MEGA_GD16=1), the backward kernel's g_Dp /
    g_Dpe channel reductions multiply in bf16 and reduce with a
    ones-row MXU matmul (f32 accumulation) instead of f32 VPU
    multiplies + sublane tree reductions.

    MEASURED NEGATIVE (v5e, 2026-08-19, scripts/tpu_gd16.py): fwd+bwd
    3.96 vs 3.73 baseline ms/layer (A_BWD=16; 3.91 at A_BWD=32) and
    |dE| 5.7e-3 Ha vs the XLA chain — 115 one-row matmuls per tile are
    MXU-latency-dominated and lose to the VPU sublane reductions, and
    the bf16 product rounding compounds. Kept env-gated OFF as the
    recorded experiment; do not enable in production."""
    import os
    return os.environ.get("PDB2R_TPU_MEGA_GD16", "") not in ("", "0")


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _rowsum(x):
    """[C, T] -> [1, T] column sums on the MXU (ones-row matmul,
    f32 accumulation)."""
    return _dot(jnp.ones((1, x.shape[0]), x.dtype), x)


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------

def _merge_so2(A, B, s):
    """Merge an SO(2) real/imag weight pair into one block matrix
    [[A, s*B], [-s*B, A]] so the four per-m-order matmuls become ONE
    2x-wider MXU matmul (same FLOPs, fewer+larger ops — measured the
    conv chain at ~50% MXU as four separate dots at escn-md scale).
    s=-1 gives the transposed (fwd-compute) orientation
    [[Wrt, -Wit], [Wit, Wrt]]; s=+1 the fwd orientation used by the
    backward's cotangent path [[Wr, Wi], [-Wi, Wr]]."""
    top = jnp.concatenate([A, s * B], axis=1)
    bot = jnp.concatenate([-s * B, A], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _conv_merged_raw(x_rows, es, Wt, bs, nl0, nls, c_in, h, T):
    """Merged-pair SO(2) conv in RAW row layout: returns [U*h, T] f32
    (u-major, h-minor rows — exactly the matmul output order, NO
    per-part [nl, h*T] relayout). The grid-layout view when needed is
    one reshape: out.reshape(U, h*T) maps (u*h+hi, t) -> (u, hi*T+t).
    Wt = (W0t, W2t list) with the m>0 real/imag pairs pre-merged into
    one [[Wrt,-Wit],[Wit,Wrt]] block per m-order (_merge_so2); bs =
    (b0, b2 list), b2 = concat(br, bi)."""
    W0t, W2t = Wt
    b0, b2s = bs
    x0 = x_rows[0:nl0 * c_in, :]
    if es is not None:
        x0 = jnp.concatenate([x0, es], axis=0)
    parts = [_dot(W0t, x0) + b0]
    off = nl0 * c_in
    for i, nl in enumerate(nls):
        xcat = x_rows[off:off + 2 * nl * c_in, :]
        parts.append(_dot(W2t[i], xcat) + b2s[i])
        off += 2 * nl * c_in
    return jnp.concatenate(parts, axis=0)


def _conv(x_rows, es, Wt, bs, nl0, nls, c_in, h, T):
    """One SO(2) conv on row-sliced input [U*c_in(+Ce via es), T].
    Wt = (W0t, Wrt list, Wit list); bs = (b0, brs, bis) column biases.
    Returns [U, h*T] f32."""
    W0t, Wrt, Wit = Wt
    b0, brs, bis = bs
    x0 = x_rows[0:nl0 * c_in, :]
    if es is not None:
        x0 = jnp.concatenate([x0, es], axis=0)
    parts = [(_dot(W0t, x0) + b0).reshape(nl0, h * T)]
    off = nl0 * c_in
    for i, nl in enumerate(nls):
        xp = x_rows[off:off + nl * c_in, :]
        xn = x_rows[off + nl * c_in:off + 2 * nl * c_in, :]
        yp = _dot(Wrt[i], xp) - _dot(Wit[i], xn) + brs[i]
        yn = _dot(Wit[i], xp) + _dot(Wrt[i], xn) + bis[i]
        parts.append(yp.reshape(nl, h * T))
        parts.append(yn.reshape(nl, h * T))
        off += 2 * nl * c_in
    return jnp.concatenate(parts, axis=0)


def _fwd_kernel(cfg, T, refs):
    nl0, nls, U, G = _dims(cfg)
    h, C = cfg.hidden_channels, cfg.sphere_channels
    it = iter(refs)
    pr = next(it)                       # [U*2C, T] bf16
    es = next(it)                       # [Ce, T] bf16
    W0t = next(it)
    Wrt = [next(it) for _ in nls]
    Wit = [next(it) for _ in nls]
    b0 = next(it)
    brs = [next(it) for _ in nls]
    bis = [next(it) for _ in nls]
    V0t = next(it)
    Vrt = [next(it) for _ in nls]
    Vit = [next(it) for _ in nls]
    c0 = next(it)
    crs = [next(it) for _ in nls]
    cis = [next(it) for _ in nls]
    tg = next(it)                       # [G, U] bf16
    fg = next(it)                       # [U, G] bf16
    out_ref = next(it)                  # [U*C, T] bf16
    msg_ref = next(it)                  # [U, h*T] bf16 (saved for bwd)

    msg = _conv(pr[:], es[:],
                (W0t[:], [w[:] for w in Wrt], [w[:] for w in Wit]),
                (b0[:], [b[:] for b in brs], [b[:] for b in bis]),
                nl0, nls, 2 * C, h, T)
    msg_ref[:] = msg.astype(msg_ref.dtype)

    grid = _dot(tg[:], msg.astype(tg.dtype))    # [G, h*T] f32
    act = _dot(fg[:], _silu(grid).astype(fg.dtype))
    act = jnp.concatenate([_silu(msg[0:1, :]), act[1:, :]], axis=0)

    out = _conv(act.astype(pr.dtype).reshape(U * h, T), None,
                (V0t[:], [w[:] for w in Vrt], [w[:] for w in Vit]),
                (c0[:], [b[:] for b in crs], [b[:] for b in cis]),
                nl0, nls, h, C, T)
    out_ref[:] = out.reshape(U * C, T).astype(out_ref.dtype)


def _bwd_kernel(cfg, T, refs):
    """Input-cotangent tile: conv2^T -> activation VJP -> conv1^T."""
    nl0, nls, U, G = _dims(cfg)
    h, C = cfg.hidden_channels, cfg.sphere_channels
    Ce = cfg.edge_channels
    it = iter(refs)
    msg_s = next(it)                    # [U, h*T] bf16 saved
    g_out = next(it)                    # [U*C, T] f32 cotangent
    W0 = next(it)                       # fwd orientation [d0, nl0*h]
    Wrs = [next(it) for _ in nls]
    Wis = [next(it) for _ in nls]
    V0 = next(it)
    Vrs = [next(it) for _ in nls]
    Vis = [next(it) for _ in nls]
    tg = next(it)                       # [G, U] bf16
    tgT = next(it)                      # [U, G] bf16
    fgT = next(it)                      # [G, U] bf16
    gpr_ref = next(it)                  # [U*2C, T] f32
    ges_ref = next(it)                  # [Ce, T] f32

    msg = msg_s[:]
    grid = _dot(tg[:], msg)
    sig = jax.nn.sigmoid(grid)
    dsilu = sig * (1.0 + grid * (1.0 - sig))

    # conv2 transpose
    g16 = g_out[:].astype(msg.dtype)
    parts = [_dot(V0[:], g16[0:nl0 * C, :]).reshape(nl0, h * T)]
    off = nl0 * C
    for i, nl in enumerate(nls):
        gp = g16[off:off + nl * C, :]
        gn = g16[off + nl * C:off + 2 * nl * C, :]
        parts.append((_dot(Vrs[i][:], gp)
                      + _dot(Vis[i][:], gn)).reshape(nl, h * T))
        parts.append((-_dot(Vis[i][:], gp)
                      + _dot(Vrs[i][:], gn)).reshape(nl, h * T))
        off += 2 * nl * C
    g_act = jnp.concatenate(parts, axis=0)          # [U, h*T] f32

    # activation VJP: out[0] = silu(msg[0]); out[1:] = (fg silu(tg msg))[1:]
    g_back = jnp.concatenate(
        [jnp.zeros((1, h * T), jnp.float32), g_act[1:, :]], axis=0)
    g_grid = _dot(fgT[:], g_back.astype(fgT.dtype)) * dsilu
    g_msg = _dot(tgT[:], g_grid.astype(tgT.dtype))
    m0 = msg[0:1, :].astype(jnp.float32)
    s_sig = jax.nn.sigmoid(m0)
    g_msg = jnp.concatenate(
        [g_msg[0:1, :] + g_act[0:1, :] * s_sig * (1.0 + m0 * (1.0 - s_sig)),
         g_msg[1:, :]], axis=0)

    # conv1 transpose
    gm16 = g_msg.astype(msg.dtype)
    gx0 = _dot(W0[:], gm16[:nl0].reshape(nl0 * h, T))   # [d0, T]
    gpr_parts = [gx0[0:nl0 * 2 * C, :]]
    ges_ref[:] = gx0[nl0 * 2 * C:, :]
    off = nl0
    for i, nl in enumerate(nls):
        gyp = gm16[off:off + nl].reshape(nl * h, T)
        gyn = gm16[off + nl:off + 2 * nl].reshape(nl * h, T)
        gpr_parts.append(_dot(Wrs[i][:], gyp) + _dot(Wis[i][:], gyn))
        gpr_parts.append(-_dot(Wis[i][:], gyp) + _dot(Wrs[i][:], gyn))
        off += 2 * nl
    gpr_ref[:] = jnp.concatenate(gpr_parts, axis=0)


# ---------------------------------------------------------------------------
# XLA reference chain (weight grads + CPU fallback + parity tests)
# ---------------------------------------------------------------------------

def chain_xla(cfg, pr, es, weights, tables):
    """The same math in plain jnp (f32), features-x-edges layout.
    pr [U*2C, E]; es [Ce, E]; returns [U*C, E]."""
    nl0, nls, U, G = _dims(cfg)
    h, C = cfg.hidden_channels, cfg.sphere_channels
    (W0, Wrs, Wis, b0, brs, bis, V0, Vrs, Vis, c0, crs, cis) = weights
    tg, fg = tables
    T = pr.shape[1]
    f32 = jnp.float32

    def dot(a, b):
        return jax.lax.dot_general(a.astype(f32), b.astype(f32),
                                   (((1,), (0,)), ((), ())))

    x0 = jnp.concatenate([pr[:nl0 * 2 * C], es], axis=0)
    parts = [(dot(W0.T, x0) + b0[:, None]).reshape(nl0, h * T)]
    off = nl0 * 2 * C
    for i, nl in enumerate(nls):
        xp = pr[off:off + nl * 2 * C]
        xn = pr[off + nl * 2 * C:off + 2 * nl * 2 * C]
        yp = dot(Wrs[i].T, xp) - dot(Wis[i].T, xn) + brs[i][:, None]
        yn = dot(Wis[i].T, xp) + dot(Wrs[i].T, xn) + bis[i][:, None]
        parts += [yp.reshape(nl, h * T), yn.reshape(nl, h * T)]
        off += 2 * nl * 2 * C
    msg = jnp.concatenate(parts, axis=0)
    grid = dot(tg, msg)
    act = dot(fg, _silu(grid))
    act = jnp.concatenate([_silu(msg[0:1]), act[1:]], axis=0)
    act2 = act.reshape(U * h, T)
    outs = [dot(V0.T, act2[:nl0 * h]) + c0[:, None]]
    off = nl0 * h
    for i, nl in enumerate(nls):
        ap = act2[off:off + nl * h]
        an = act2[off + nl * h:off + 2 * nl * h]
        outs.append(dot(Vrs[i].T, ap) - dot(Vis[i].T, an)
                    + crs[i][:, None])
        outs.append(dot(Vis[i].T, ap) + dot(Vrs[i].T, an)
                    + cis[i][:, None])
        off += 2 * nl * h
    # pin f32 regardless of the x64 promotion mode (the replay's vjp
    # cotangent must match the kernel output dtype)
    return jnp.concatenate(outs, axis=0).astype(jnp.float32)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

_TILE = 128


def _pad_cols(x, T):
    E = x.shape[-1]
    Ep = ((E + T - 1) // T) * T
    if Ep == E:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Ep - E)])


def _col_spec(rows, T):
    return pl.BlockSpec((rows, T), lambda i: (0, i),
                        memory_space=pltpu.VMEM)


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _interpret():
    return jax.default_backend() != "tpu"


def _bf():
    """bf16 on TPU; f32 elsewhere (CPU's dot thunk cannot mix
    bf16 x bf16 -> f32, and interpret-mode tests run on CPU)."""
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def _weight_specs(cfg, transposed):
    nl0, nls, U, G = _dims(cfg)
    h, C, Ce = cfg.hidden_channels, cfg.sphere_channels, cfg.edge_channels
    d0 = nl0 * 2 * C + Ce

    def sh(i, o):
        return (o, i) if transposed else (i, o)

    specs = [_full_spec(sh(d0, nl0 * h))]
    specs += [_full_spec(sh(nl * 2 * C, nl * h)) for nl in nls] * 2
    if transposed:      # biases only travel with the fwd kernel
        specs += [_full_spec((nl0 * h, 1))]
        specs += [_full_spec((nl * h, 1)) for nl in nls] * 2
    specs += [_full_spec(sh(nl0 * h, nl0 * C))]
    specs += [_full_spec(sh(nl * h, nl * C)) for nl in nls] * 2
    if transposed:
        specs += [_full_spec((nl0 * C, 1))]
        specs += [_full_spec((nl * C, 1)) for nl in nls] * 2
    return specs


@functools.lru_cache(maxsize=None)
def _fwd_call(cfg, E):
    nl0, nls, U, G = _dims(cfg)
    h, C, Ce = cfg.hidden_channels, cfg.sphere_channels, cfg.edge_channels
    T = _TILE
    Ep = ((E + T - 1) // T) * T
    in_specs = ([_col_spec(U * 2 * C, T), _col_spec(Ce, T)]
                + _weight_specs(cfg, transposed=True)
                + [_full_spec((G, U)), _full_spec((U, G))])
    out_shape = (jax.ShapeDtypeStruct((U * C, Ep), _bf()),
                 jax.ShapeDtypeStruct((U, h * Ep), _bf()))
    out_specs = (_col_spec(U * C, T),
                 pl.BlockSpec((U, h * T), lambda i: (0, i),
                              memory_space=pltpu.VMEM))

    def kernel(*refs):
        _fwd_kernel(cfg, T, refs)

    return pl.pallas_call(
        kernel, grid=(Ep // T,), in_specs=in_specs, out_shape=out_shape,
        out_specs=out_specs, interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))


@functools.lru_cache(maxsize=None)
def _bwd_call(cfg, E):
    nl0, nls, U, G = _dims(cfg)
    h, C, Ce = cfg.hidden_channels, cfg.sphere_channels, cfg.edge_channels
    T = _TILE
    Ep = ((E + T - 1) // T) * T
    in_specs = ([pl.BlockSpec((U, h * T), lambda i: (0, i),
                              memory_space=pltpu.VMEM),
                 _col_spec(U * C, T)]
                + _weight_specs(cfg, transposed=False)
                + [_full_spec((G, U)), _full_spec((U, G)),
                   _full_spec((G, U))])
    out_shape = (jax.ShapeDtypeStruct((U * 2 * C, Ep), jnp.float32),
                 jax.ShapeDtypeStruct((Ce, Ep), jnp.float32))
    out_specs = (_col_spec(U * 2 * C, T), _col_spec(Ce, T))

    def kernel(*refs):
        _bwd_kernel(cfg, T, refs)

    return pl.pallas_call(
        kernel, grid=(Ep // T,), in_specs=in_specs,
        out_shape=out_shape, out_specs=out_specs,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))


def _flat_weights(weights, transposed, with_bias):
    (W0, Wrs, Wis, b0, brs, bis, V0, Vrs, Vis, c0, crs, cis) = weights
    bf = _bf()

    def w(x):
        return (x.T if transposed else x).astype(bf)

    def col(b):
        return b.astype(jnp.float32)[:, None]

    out = [w(W0)] + [w(x) for x in Wrs] + [w(x) for x in Wis]
    if with_bias:
        out += [col(b0)] + [col(b) for b in brs] + [col(b) for b in bis]
    out += [w(V0)] + [w(x) for x in Vrs] + [w(x) for x in Vis]
    if with_bias:
        out += [col(c0)] + [col(b) for b in crs] + [col(b) for b in cis]
    return out


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_edge_chain(cfg, pr, es, weights, tables):
    """pr [U*2C, E] (u-major rotated pair rows), es [Ce, E]; weights =
    merged per-layer MoLE mats (fwd orientation [in, out], f32); tables =
    (tg [G, U], fg [U, G]). Returns [U*C, E] bf16."""
    out, _ = _fwd_impl(cfg, pr, es, weights, tables)
    return out


def _fwd_impl(cfg, pr, es, weights, tables):
    E = pr.shape[1]
    bf = _bf()
    ins = ([_pad_cols(pr, _TILE).astype(bf),
            _pad_cols(es, _TILE).astype(bf)]
           + _flat_weights(weights, True, True)
           + [tables[0].astype(bf), tables[1].astype(bf)])
    out, msg = _fwd_call(cfg, E)(*ins)
    return out[:, :E], msg


def _vjp_fwd(cfg, pr, es, weights, tables):
    out, msg = _fwd_impl(cfg, pr, es, weights, tables)
    return out, (pr, es, weights, tables, msg)


def _vjp_bwd(cfg, res, g):
    pr, es, weights, tables, msg = res
    E = pr.shape[1]
    bf = _bf()
    ins = ([msg, _pad_cols(g, _TILE).astype(jnp.float32)]
           + _flat_weights(weights, False, False)
           + [tables[0].astype(bf), tables[0].T.astype(bf),
              tables[1].T.astype(bf)])
    gpr, ges = _bwd_call(cfg, E)(*ins)
    gpr = gpr[:, :E]
    ges = ges[:, :E]

    # weight cotangents via XLA replay: an independent subgraph that
    # force-only (coordinate-grad) calls DCE away entirely
    _, wvjp = jax.vjp(lambda w: chain_xla(cfg, pr, es, w, tables), weights)
    (gw,) = wvjp(g.astype(jnp.float32))

    g_tables = (jnp.zeros_like(tables[0]), jnp.zeros_like(tables[1]))
    return (gpr, ges, gw, g_tables)


fused_edge_chain.defvjp(_vjp_fwd, _vjp_bwd)


# ===========================================================================
# v2: rotation-fused kernel ("pallas-full") — the Wigner rotation, edge
# chain, and envelope all run in VMEM. The per-edge rotation is applied as
# block-sparse VPU FMAs: D(R) is block-diagonal per l, so only
# sum_u (2 l_u + 1) of the U x M entries are nonzero (115/475 at
# lmax=4/mmax=2); each nonzero contributes one [C, T] fused multiply-add
# with a per-edge scalar row. This removes the XLA batched-tiny-matmul
# rotations (the dominant glue cost measured after v1: ~15 ms of 25.7).
# ===========================================================================

@functools.lru_cache(maxsize=None)
def _rot_nz(lmax, mmax):
    """Static sparsity of the reduced Wigner selection D_sel [U, M]:
    (u_list, m_list) of nonzero entries in packed-row order, plus the
    per-u and per-m groupings used by the kernels."""
    ls = [l for l in range(lmax + 1)]                 # noqa: E741
    u_l = list(ls)                                    # m0 rows
    for m in range(1, mmax + 1):
        u_l += list(range(m, lmax + 1))               # +m rows
        u_l += list(range(m, lmax + 1))               # -m rows
    u_list, m_list = [], []
    for u, l in enumerate(u_l):                       # noqa: E741
        for mf in range(l * l, (l + 1) ** 2):
            u_list.append(u)
            m_list.append(mf)
    by_u = {}
    by_m = {}
    for j, (u, mf) in enumerate(zip(u_list, m_list)):
        by_u.setdefault(u, []).append(j)
        by_m.setdefault(mf, []).append(j)
    return tuple(u_list), tuple(m_list), \
        tuple(tuple(by_u[u]) for u in sorted(by_u)), \
        tuple(tuple(by_m.get(mf, ())) for mf in range((lmax + 1) ** 2))


def pack_d(cfg, D_sel):
    """[..., U, M] -> packed nonzero rows [..., NZ] (last dim = packed
    index j). Used by the caller to build the Dp/Dpe kernel inputs."""
    u_list, m_list, _, _ = _rot_nz(cfg.lmax, cfg.mmax)
    return D_sel[..., jnp.asarray(u_list), jnp.asarray(m_list)]


def _rotate_rows(Dp, x, idx_groups, C, cast, mul_dtype=jnp.float32):
    """parts[g] = sum_{j in group g} Dp[j] * x[m_j*C:(m_j+1)*C]  — the
    block-sparse rotation. ``idx_groups`` maps output group -> (j, src)
    pairs. ``mul_dtype`` is the multiply-accumulate precision (bf16
    under _rot16 — see its docstring for why that is safe).

    The input is cast to ``mul_dtype`` ONCE up front: each source block
    feeds every coupled output row (~nnz/M ≈ 4.6 at escn-md), so per-term
    casts repeat the same bf16->f32 relayout that many times."""
    xr = x if x.dtype == mul_dtype else x.astype(mul_dtype)
    Dr = Dp if Dp.dtype == mul_dtype else Dp.astype(mul_dtype)
    outs = []
    for pairs in idx_groups:
        acc = None
        for (j, src) in pairs:
            term = Dr[j:j + 1, :] * xr[src * C:(src + 1) * C, :]
            acc = term if acc is None else acc + term
        outs.append(cast(acc))
    return outs


def _fwd_kernel_full(cfg, T, refs):
    nl0, nls, U, G = _dims(cfg)
    M = (cfg.lmax + 1) ** 2
    h, C = cfg.hidden_channels, cfg.sphere_channels
    K = cfg.max_neighbors
    A = T // K
    u_list, m_list, by_u, by_m = _rot_nz(cfg.lmax, cfg.mmax)
    it = iter(refs)
    xs = next(it)                       # [M*C, T] bf16 gathered source
    xt_ref = next(it)                   # [M*C, T] bf16 target features
    es = next(it)                       # [Ce, T] bf16
    Dp = next(it)                       # [NZp, T] bf16 packed rotation
    Dpe = next(it)                      # [NZp, T] bf16 packed rot x env
    W0t = next(it)
    Wrt = [next(it) for _ in nls]
    Wit = [next(it) for _ in nls]
    b0 = next(it)
    brs = [next(it) for _ in nls]
    bis = [next(it) for _ in nls]
    V0t = next(it)
    Vrt = [next(it) for _ in nls]
    Vit = [next(it) for _ in nls]
    c0 = next(it)
    crs = [next(it) for _ in nls]
    cis = [next(it) for _ in nls]
    tg = next(it)
    fg = next(it)
    out_ref = next(it)                  # [M*C, T] bf16 (back-rotated,
    msg_ref = next(it)                  # env-weighted, per edge)

    bf = xs.dtype
    xt = xt_ref[:]                                  # [M*C, T]

    # ---- rotation into the reduced edge frame (VPU, block-sparse) ------
    groups = [[(j, m_list[j]) for j in by_u[u]] for u in range(U)]
    rs = _rotate_rows(Dp[:], xs[:], groups, C, lambda a: a)
    rt = _rotate_rows(Dp[:], xt, groups, C, lambda a: a)
    pr = jnp.concatenate(
        [blk for u in range(U) for blk in (rs[u], rt[u])],
        axis=0).astype(bf)                          # [U*2C, T]

    # ---- conv1 -> S2 act -> conv2 (as v1) -------------------------------
    msg = _conv(pr, es[:],
                (W0t[:], [w[:] for w in Wrt], [w[:] for w in Wit]),
                (b0[:], [b[:] for b in brs], [b[:] for b in bis]),
                nl0, nls, 2 * C, h, T)
    msg_ref[:] = msg.astype(msg_ref.dtype)
    grid = _dot(tg[:], msg.astype(tg.dtype))
    act = _dot(fg[:], _silu(grid).astype(fg.dtype))
    act = jnp.concatenate([_silu(msg[0:1, :]), act[1:, :]], axis=0)
    out = _conv(act.astype(bf).reshape(U * h, T), None,
                (V0t[:], [w[:] for w in Vrt], [w[:] for w in Vit]),
                (c0[:], [b[:] for b in crs], [b[:] for b in cis]),
                nl0, nls, h, C, T).reshape(U * C, T)

    # ---- back-rotation x envelope (VPU, block-sparse transpose) ---------
    out16 = out.astype(bf)
    groups_t = [[(j, u_list[j]) for j in by_m[mf]] for mf in range(M)]
    back = _rotate_rows(Dpe[:], out16, groups_t, C,
                        lambda a: a.astype(bf))
    out_ref[:] = jnp.concatenate(back, axis=0)      # [M*C, T]


def _bwd_kernel_full(cfg, T, refs):
    """Input cotangents for the v2 kernel. Recomputes the rotation and the
    act/conv2 forward from the saved conv-1 output."""
    nl0, nls, U, G = _dims(cfg)
    M = (cfg.lmax + 1) ** 2
    h, C = cfg.hidden_channels, cfg.sphere_channels
    K = cfg.max_neighbors
    A = T // K
    u_list, m_list, by_u, by_m = _rot_nz(cfg.lmax, cfg.mmax)
    it = iter(refs)
    xs = next(it)                       # [M*C, T] bf16
    xt_ref = next(it)                   # [M*C, T] bf16
    Dp = next(it)
    Dpe = next(it)
    msg_s = next(it)                    # [U, h*T] bf16 saved
    g_back = next(it)                   # [M*C, T] f32 incoming cotangent
    W0 = next(it)                       # conv1 fwd orientation
    Wrs = [next(it) for _ in nls]
    Wis = [next(it) for _ in nls]
    V0 = next(it)                       # conv2 fwd orientation
    Vrs = [next(it) for _ in nls]
    Vis = [next(it) for _ in nls]
    V0t = next(it)                      # conv2 transposed (recompute)
    Vrt = [next(it) for _ in nls]
    Vit = [next(it) for _ in nls]
    c0 = next(it)
    crs = [next(it) for _ in nls]
    cis = [next(it) for _ in nls]
    tg = next(it)                       # [G, U]
    fg = next(it)                       # [U, G]
    tgT = next(it)                      # [U, G]
    fgT = next(it)                      # [G, U]
    gxs_ref = next(it)                  # [M*C, T] bf16
    gxt_ref = next(it)                  # [M*C, T] bf16
    ges_ref = next(it)                  # [Ce, T] f32
    gdp_ref = next(it)                  # [NZp, T] f32
    gdpe_ref = next(it)                 # [NZp, T] f32

    bf = xs.dtype
    i = pl.program_id(0)
    NZp = gdp_ref.shape[0]
    nnz = len(u_list)

    msg = msg_s[:]
    # recompute act + conv2 forward (for out, needed by g_Dpe)
    grid = _dot(tg[:], msg)
    sig_g = jax.nn.sigmoid(grid)
    act = _dot(fg[:], _silu(grid).astype(bf))
    # sigmoid must see f32 (Mosaic missing a bf16 logistic lowering)
    act = jnp.concatenate(
        [_silu(msg[0:1, :].astype(jnp.float32)), act[1:, :]], axis=0)
    out = _conv(act.astype(bf).reshape(U * h, T), None,
                (V0t[:], [w[:] for w in Vrt], [w[:] for w in Vit]),
                (c0[:], [b[:] for b in crs], [b[:] for b in cis]),
                nl0, nls, h, C, T).reshape(U * C, T)

    # ---- back-rotation transpose + g_Dpe --------------------------------
    # g_out[u] = sum_{j: u_j=u} Dpe[j] * g_back[m_j]
    groups_o = [[(j, m_list[j]) for j in by_u[u]] for u in range(U)]
    g_out_parts = _rotate_rows(Dpe[:], g_back[:], groups_o, C,
                               lambda a: a)
    g_out = jnp.concatenate(g_out_parts, axis=0)    # [U*C, T] f32
    # g_Dpe[j] = sum_c out[u_j C + c] * g_back[m_j C + c]
    gdpe_rows = []
    for j in range(nnz):
        u, mf = u_list[j], m_list[j]
        prod = out[u * C:(u + 1) * C, :].astype(jnp.float32) \
            * g_back[mf * C:(mf + 1) * C, :]
        gdpe_rows.append(jnp.sum(prod, axis=0, keepdims=True))
    gdpe_rows.append(jnp.zeros((NZp - nnz, T), jnp.float32))
    gdpe_ref[:] = jnp.concatenate(gdpe_rows, axis=0)

    # ---- conv2^T -> act VJP -> conv1^T (as v1) --------------------------
    dsilu = sig_g * (1.0 + grid * (1.0 - sig_g))
    g16 = g_out.astype(bf)
    parts = [_dot(V0[:], g16[0:nl0 * C, :]).reshape(nl0, h * T)]
    off = nl0 * C
    for i2, nl in enumerate(nls):
        gp = g16[off:off + nl * C, :]
        gn = g16[off + nl * C:off + 2 * nl * C, :]
        parts.append((_dot(Vrs[i2][:], gp)
                      + _dot(Vis[i2][:], gn)).reshape(nl, h * T))
        parts.append((-_dot(Vis[i2][:], gp)
                      + _dot(Vrs[i2][:], gn)).reshape(nl, h * T))
        off += 2 * nl * C
    g_act = jnp.concatenate(parts, axis=0)
    g_b = jnp.concatenate(
        [jnp.zeros((1, h * T), jnp.float32), g_act[1:, :]], axis=0)
    g_grid = _dot(fgT[:], g_b.astype(bf)) * dsilu
    g_msg = _dot(tgT[:], g_grid.astype(bf))
    m0 = msg[0:1, :].astype(jnp.float32)
    s_sig = jax.nn.sigmoid(m0)
    g_msg = jnp.concatenate(
        [g_msg[0:1, :] + g_act[0:1, :] * s_sig * (1.0 + m0 * (1.0 - s_sig)),
         g_msg[1:, :]], axis=0)

    gm16 = g_msg.astype(bf)
    gx0 = _dot(W0[:], gm16[:nl0].reshape(nl0 * h, T))   # [d0, T]
    gpr_parts = [gx0[0:nl0 * 2 * C, :]]
    ges_ref[:] = gx0[nl0 * 2 * C:, :]
    off = nl0
    for i2, nl in enumerate(nls):
        gyp = gm16[off:off + nl].reshape(nl * h, T)
        gyn = gm16[off + nl:off + 2 * nl].reshape(nl * h, T)
        gpr_parts.append(_dot(Wrs[i2][:], gyp) + _dot(Wis[i2][:], gyn))
        gpr_parts.append(-_dot(Wis[i2][:], gyp) + _dot(Wrs[i2][:], gyn))
        off += 2 * nl
    g_pr = jnp.concatenate(gpr_parts, axis=0)       # [U*2C, T] f32

    # ---- rotation transpose + g_Dp --------------------------------------
    # rows of g_pr: u-major, [source C | target C]
    # g_xs[m] = sum_{j: m_j=m} Dp[j] * g_pr[u_j source block]
    groups_s = [[(j, u_list[j]) for j in by_m[mf]] for mf in range(M)]

    def src_block(x, u):
        return x[u * 2 * C:u * 2 * C + C, :]

    def tgt_block(x, u):
        return x[u * 2 * C + C:(u + 1) * 2 * C, :]

    gxs_parts, gxt_parts = [], []
    for mf in range(M):
        acc_s = None
        acc_t = None
        for j in by_m[mf]:
            u = u_list[j]
            d = Dp[j:j + 1, :].astype(jnp.float32)
            ts_ = d * src_block(g_pr, u)
            tt_ = d * tgt_block(g_pr, u)
            acc_s = ts_ if acc_s is None else acc_s + ts_
            acc_t = tt_ if acc_t is None else acc_t + tt_
        gxs_parts.append(acc_s.astype(bf))
        gxt_parts.append(acc_t.astype(bf))
    gxs_ref[:] = jnp.concatenate(gxs_parts, axis=0)
    gxt_ref[:] = jnp.concatenate(gxt_parts, axis=0)

    # g_Dp[j] = sum_c xs[m_j]*g_pr_s[u_j] + xt[m_j]*g_pr_t[u_j]
    xt = xt_ref[:]
    gdp_rows = []
    for j in range(nnz):
        u, mf = u_list[j], m_list[j]
        ps = xs[mf * C:(mf + 1) * C, :].astype(jnp.float32) \
            * src_block(g_pr, u)
        pt = xt[mf * C:(mf + 1) * C, :].astype(jnp.float32) \
            * tgt_block(g_pr, u)
        gdp_rows.append(jnp.sum(ps + pt, axis=0, keepdims=True))
    gdp_rows.append(jnp.zeros((NZp - nnz, T), jnp.float32))
    gdp_ref[:] = jnp.concatenate(gdp_rows, axis=0)


def _nzp(cfg):
    u_list, _, _, _ = _rot_nz(cfg.lmax, cfg.mmax)
    n = len(u_list)
    return ((n + 7) // 8) * 8


@functools.lru_cache(maxsize=None)
def _fwd_call_full(cfg, E):
    nl0, nls, U, G = _dims(cfg)
    M = (cfg.lmax + 1) ** 2
    h, C, Ce = cfg.hidden_channels, cfg.sphere_channels, cfg.edge_channels
    T = _TILE
    Ep = ((E + T - 1) // T) * T
    NZp = _nzp(cfg)
    in_specs = ([_col_spec(M * C, T),                # xs
                 _col_spec(M * C, T),                # xt (edge-level)
                 _col_spec(Ce, T),                   # es
                 _col_spec(NZp, T),                  # Dp
                 _col_spec(NZp, T)]                  # Dpe
                + _weight_specs(cfg, transposed=True)
                + [_full_spec((G, U)), _full_spec((U, G))])
    out_shape = (jax.ShapeDtypeStruct((M * C, Ep), _bf()),
                 jax.ShapeDtypeStruct((U, h * Ep), _bf()))
    out_specs = (_col_spec(M * C, T),
                 pl.BlockSpec((U, h * T), lambda i: (0, i),
                              memory_space=pltpu.VMEM))

    def kernel(*refs):
        _fwd_kernel_full(cfg, T, refs)

    return pl.pallas_call(
        kernel, grid=(Ep // T,), in_specs=in_specs, out_shape=out_shape,
        out_specs=out_specs, interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))


def _bwd_weight_flats(cfg, weights):
    """conv1 fwd-orientation, conv2 fwd-orientation, conv2 transposed
    (+ conv2 biases) — what the v2 backward kernel consumes."""
    (W0, Wrs, Wis, b0, brs, bis, V0, Vrs, Vis, c0, crs, cis) = weights
    bf = _bf()

    def col(b):
        return b.astype(jnp.float32)[:, None]

    out = [W0.astype(bf)] + [w.astype(bf) for w in Wrs] \
        + [w.astype(bf) for w in Wis]
    out += [V0.astype(bf)] + [w.astype(bf) for w in Vrs] \
        + [w.astype(bf) for w in Vis]
    out += [V0.T.astype(bf)] + [w.T.astype(bf) for w in Vrs] \
        + [w.T.astype(bf) for w in Vis]
    out += [col(c0)] + [col(b) for b in crs] + [col(b) for b in cis]
    return out


@functools.lru_cache(maxsize=None)
def _bwd_call_full(cfg, E):
    nl0, nls, U, G = _dims(cfg)
    M = (cfg.lmax + 1) ** 2
    h, C, Ce = cfg.hidden_channels, cfg.sphere_channels, cfg.edge_channels
    T = _TILE
    Ep = ((E + T - 1) // T) * T
    NZp = _nzp(cfg)
    d0 = nl0 * 2 * C + Ce

    def sh(i, o):
        return (i, o)

    wspecs = [_full_spec(sh(d0, nl0 * h))]
    wspecs += [_full_spec(sh(nl * 2 * C, nl * h)) for nl in nls] * 2
    wspecs += [_full_spec(sh(nl0 * h, nl0 * C))]
    wspecs += [_full_spec(sh(nl * h, nl * C)) for nl in nls] * 2
    wspecs += [_full_spec((nl0 * C, nl0 * h))]
    wspecs += [_full_spec((nl * C, nl * h)) for nl in nls] * 2
    wspecs += [_full_spec((nl0 * C, 1))]
    wspecs += [_full_spec((nl * C, 1)) for nl in nls] * 2
    in_specs = ([_col_spec(M * C, T),                # xs
                 _col_spec(M * C, T),                # xt (edge-level)
                 _col_spec(NZp, T),                  # Dp
                 _col_spec(NZp, T),                  # Dpe
                 pl.BlockSpec((U, h * T), lambda i: (0, i),
                              memory_space=pltpu.VMEM),   # msg
                 _col_spec(M * C, T)]                # g
                + wspecs
                + [_full_spec((G, U)), _full_spec((U, G)),
                   _full_spec((U, G)), _full_spec((G, U))])
    out_shape = (jax.ShapeDtypeStruct((M * C, Ep), _bf()),
                 jax.ShapeDtypeStruct((M * C, Ep), _bf()),
                 jax.ShapeDtypeStruct((Ce, Ep), jnp.float32),
                 jax.ShapeDtypeStruct((NZp, Ep), jnp.float32),
                 jax.ShapeDtypeStruct((NZp, Ep), jnp.float32))
    out_specs = (_col_spec(M * C, T), _col_spec(M * C, T),
                 _col_spec(Ce, T), _col_spec(NZp, T), _col_spec(NZp, T))

    def kernel(*refs):
        _bwd_kernel_full(cfg, T, refs)

    return pl.pallas_call(
        kernel, grid=(Ep // T,), in_specs=in_specs,
        out_shape=out_shape, out_specs=out_specs,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_edge_block(cfg, xs_t, xt_t, es, Dp, Dpe, weights, tables):
    """Whole per-edge message block in one kernel.

    xs_t [M*C, E]: gathered source node features (transposed rows,
    m-major); xt_t [M*C, E]: target node features repeated per edge
    (``jnp.repeat`` along columns in the caller — its backward is the
    K-sum); es [Ce, E]; Dp / Dpe [nnz, E]: packed nonzero
    Wigner-selection values (Dpe scaled by the cutoff envelope — see
    pack_d); weights as in fused_edge_chain.
    Returns the back-rotated, envelope-weighted per-edge messages
    [M*C, E] (caller K-sums into node updates)."""
    out, _ = _fwd_impl_full(cfg, xs_t, xt_t, es, Dp, Dpe, weights, tables)
    return out


def _pad_rows(x, n):
    if x.shape[0] == n:
        return x
    return jnp.pad(x, ((0, n - x.shape[0]), (0, 0)))


def _fwd_impl_full(cfg, xs_t, xt_t, es, Dp, Dpe, weights, tables):
    E = xs_t.shape[1]
    T = _TILE
    bf = _bf()
    NZp = _nzp(cfg)
    ins = ([_pad_cols(xs_t, T).astype(bf),
            _pad_cols(xt_t, T).astype(bf),
            _pad_cols(es, T).astype(bf),
            _pad_cols(_pad_rows(Dp, NZp), T).astype(bf),
            _pad_cols(_pad_rows(Dpe, NZp), T).astype(bf)]
           + _flat_weights(weights, True, True)
           + [tables[0].astype(bf), tables[1].astype(bf)])
    out, msg = _fwd_call_full(cfg, E)(*ins)
    return out[:, :E], msg


def _vjp_fwd_full(cfg, xs_t, xt_t, es, Dp, Dpe, weights, tables):
    out, msg = _fwd_impl_full(cfg, xs_t, xt_t, es, Dp, Dpe, weights,
                              tables)
    return out, (xs_t, xt_t, es, Dp, Dpe, weights, tables, msg)


def _vjp_bwd_full(cfg, res, g):
    xs_t, xt_t, es, Dp, Dpe, weights, tables, msg = res
    E = xs_t.shape[1]
    T = _TILE
    bf = _bf()
    nl0, nls, U, G = _dims(cfg)
    M = (cfg.lmax + 1) ** 2
    C = cfg.sphere_channels
    tg, fg = tables
    NZp = _nzp(cfg)
    ins = ([_pad_cols(xs_t, T).astype(bf),
            _pad_cols(xt_t, T).astype(bf),
            _pad_cols(_pad_rows(Dp, NZp), T).astype(bf),
            _pad_cols(_pad_rows(Dpe, NZp), T).astype(bf),
            msg, _pad_cols(g, T).astype(jnp.float32)]
           + _bwd_weight_flats(cfg, weights)
           + [tg.astype(bf), fg.astype(bf),
              tg.T.astype(bf), fg.T.astype(bf)])
    gxs, gxt, ges, gdp, gdpe = _bwd_call_full(cfg, E)(*ins)
    gxs = gxs[:, :E].astype(jnp.float32)
    gxn = gxt[:, :E].astype(jnp.float32)
    ges = ges[:, :E]
    nnz = len(_rot_nz(cfg.lmax, cfg.mmax)[0])
    gdp = gdp[:nnz, :E]
    gdpe = gdpe[:nnz, :E]

    # ---- weight cotangents via XLA replay (DCE'd on force-only calls) ---
    u_list, m_list, _, _ = _rot_nz(cfg.lmax, cfg.mmax)
    ui = jnp.asarray(u_list)
    mi = jnp.asarray(m_list)
    Dd = jnp.zeros((U, M, E), jnp.float32).at[ui, mi].set(
        Dp[:nnz].astype(jnp.float32))
    Dde = jnp.zeros((U, M, E), jnp.float32).at[ui, mi].set(
        Dpe[:nnz].astype(jnp.float32))
    xs3 = xs_t.astype(jnp.float32).reshape(M, C, E)
    xt3 = xt_t.astype(jnp.float32).reshape(M, C, E)
    rot_s = jnp.einsum("ume,mce->uce", Dd, xs3)
    rot_t = jnp.einsum("ume,mce->uce", Dd, xt3)
    pr = jnp.concatenate([rot_s, rot_t], axis=1).reshape(U * 2 * C, E)
    g_chain = jnp.einsum("ume,mce->uce", Dde,
                         g.astype(jnp.float32).reshape(M, C, E)) \
        .reshape(U * C, E)
    _, wvjp = jax.vjp(
        lambda w: chain_xla(cfg, pr, es.astype(jnp.float32), w, tables),
        weights)
    (gw,) = wvjp(g_chain)

    g_tables = (jnp.zeros_like(tg), jnp.zeros_like(fg))
    return (gxs, gxn, ges, gdp, gdpe, gw, g_tables)


fused_edge_block.defvjp(_vjp_fwd_full, _vjp_bwd_full)


# ===========================================================================
# v3: node-resident kernel ("pallas-mega") — gather, rotation, conv chain,
# back-rotation, envelope AND the K-sum all inside one kernel, with the
# node-feature array resident in VMEM ([M*C, P] — ~2 MB bf16 at escn-md
# scale). ENTRY-level HLO traffic analysis after v2 showed the remaining
# HBM bytes living entirely in the XLA glue AROUND the edge kernel: the
# per-edge gather/repeat tensors ([M*C, E] ~100 MB), the K-sum read, the
# backward's scatter-add, and forced layout copies at the Pallas custom-
# call boundaries (~10 GB materialized per force call — the program ran at
# 889 GB/s effective, HBM speed-of-light on the wrong byte count). v3
# converts gather and scatter into one-hot MXU matmuls against the
# resident node array, so per layer the kernel reads/writes only the
# [M*C, P] features and the small per-edge scalar rows.
#
# Edge order is target-major ([P, K] flattened), so a tile of T = 8*K
# edges covers exactly A = 8 target atoms: the forward K-sum is a fixed
# [T, A] block matmul and the output tile is written (not accumulated).
# Source gather hits arbitrary atoms — the backward scatters through the
# transposed one-hots into a full [M*C, P] VMEM accumulator revisited
# across grid steps. Source indices travel as f32 (exact for P < 2^24) so
# the custom_vjp can hand back an ordinary zero cotangent.
# ===========================================================================

def _mega_tile(cfg, P, cap=32):
    """Edge-tile size T = A*K. A (target atoms per tile) is the largest
    power of two <= cap dividing P: bigger tiles widen every matmul's lane
    dimension AND let the target-side gathers/K-sum stage through the
    small [*, A] atom block (4x fewer one-hot MXU flops than a direct
    [P, T] one-hot at A=32/P=320). The forward fits A=32 at escn-md
    scale; the backward carries ~3x the live per-edge state (cotangent
    mirrors of both convs + the activation VJP) — with the f32 grid
    chain it capped at A=8 (A=16/32 exceeded the 100 MB kernel VMEM
    budget); the bf16 grid-space VJP chain fits A=16 under the 128 MB
    budget (measured on v5e 2026-08-19: 2.31 vs 2.43 ms/layer at
    escn-md/P=320 — now the default)."""
    A = cap
    while A > 1 and P % A:
        A //= 2
    return A * cfg.max_neighbors


def _mega_cap(cfg, which, default):
    """A-cap for the mega kernel's edge tiles. The default is calibrated
    at escn-md scale (C=h=128, K=32: fwd A=32 fits the VMEM budget, bwd
    A=16 with the bf16 grid chain; round-4f sweep: A_BWD=32 measured
    10.46 ms implied bwd vs 10.66 at A=16 — within noise of the relay
    marginals, kept at 16 to preserve the warm persistent-cache programs) and scaled inversely with the
    per-edge VMEM footprint for other configs — T = A*K and every live tensor is ~T x (C or h) — so e.g.
    escn-uma-s (h=256, K=64) does not default to a guaranteed-OOM tile.
    Env-tunable via PDB2R_TPU_MEGA_A_{FWD,BWD} for sweeps (fresh process
    per value — the call builders are lru_cached)."""
    import os
    env = os.environ.get(f"PDB2R_TPU_MEGA_A_{which}")
    if env is not None:
        return int(env)
    ref = 128 * 128 * 32                    # escn-md C * h * K
    scale = ref / max(cfg.sphere_channels * cfg.hidden_channels
                      * cfg.max_neighbors, 1)
    cap = default
    while cap > 1 and cap > default * scale:
        cap //= 2
    return cap


def _mega_weight_specs(cfg):
    """Transposed-orientation weight specs for the mega FORWARD kernel:
    m>0 real/imag pairs merged into one [[Wrt,-Wit],[Wit,Wrt]] block per
    m-order (_merge_so2), with concat(br, bi) bias columns."""
    nl0, nls, U, G = _dims(cfg)
    h, C, Ce = cfg.hidden_channels, cfg.sphere_channels, cfg.edge_channels
    d0 = nl0 * 2 * C + Ce
    specs = [_full_spec((nl0 * h, d0))]
    specs += [_full_spec((2 * nl * h, 2 * nl * 2 * C)) for nl in nls]
    specs += [_full_spec((nl0 * h, 1))]
    specs += [_full_spec((2 * nl * h, 1)) for nl in nls]
    specs += [_full_spec((nl0 * C, nl0 * h))]
    specs += [_full_spec((2 * nl * C, 2 * nl * h)) for nl in nls]
    specs += [_full_spec((nl0 * C, 1))]
    specs += [_full_spec((2 * nl * C, 1)) for nl in nls]
    return specs


def _mega_flat_weights_t(weights):
    """Transposed-orientation mega forward weight flats with merged m>0
    blocks + bias columns (matches _mega_weight_specs)."""
    (W0, Wrs, Wis, b0, brs, bis, V0, Vrs, Vis, c0, crs, cis) = weights
    bf = _bf()

    def col(b):
        return b.astype(jnp.float32)[:, None]

    out = [W0.T.astype(bf)]
    out += [_merge_so2(Wr.T, Wi.T, -1).astype(bf)
            for Wr, Wi in zip(Wrs, Wis)]
    out += [col(b0)]
    out += [col(jnp.concatenate([br, bi]))
            for br, bi in zip(brs, bis)]
    out += [V0.T.astype(bf)]
    out += [_merge_so2(Vr.T, Vi.T, -1).astype(bf)
            for Vr, Vi in zip(Vrs, Vis)]
    out += [col(c0)]
    out += [col(jnp.concatenate([cr, ci]))
            for cr, ci in zip(crs, cis)]
    return out


def _oh(eq_a, eq_b, dtype):
    return (eq_a == eq_b).astype(dtype)


def _tgt_stage(P, T, A, K, i, dtype):
    """(oh_pa [P, A], oh_at [A, T]) staging one-hots for the tile's
    target atoms: column j of oh_pa picks atom i*A+j; row j of oh_at
    broadcasts it to its K edge columns."""
    rowpa = jax.lax.broadcasted_iota(jnp.int32, (P, A), 0)
    colpa = jax.lax.broadcasted_iota(jnp.int32, (P, A), 1)
    oh_pa = _oh(rowpa, i * A + colpa, dtype)
    rowat = jax.lax.broadcasted_iota(jnp.int32, (A, T), 0)
    colat = jax.lax.broadcasted_iota(jnp.int32, (A, T), 1)
    oh_at = _oh(rowat, colat // K, dtype)
    return oh_pa, oh_at


def _tgt_stage_t(P, T, A, K, i, dtype):
    """(oh_ta [T, A], oh_ap [A, P]) transposed staging one-hots: oh_ta
    K-sums a [*, T] edge tile into its A target-atom columns; oh_ap
    scatters those columns to atoms i*A..i*A+A-1."""
    erow = jax.lax.broadcasted_iota(jnp.int32, (T, A), 0)
    acol = jax.lax.broadcasted_iota(jnp.int32, (T, A), 1)
    oh_ta = _oh(erow // K, acol, dtype)
    rowap = jax.lax.broadcasted_iota(jnp.int32, (A, P), 0)
    colap = jax.lax.broadcasted_iota(jnp.int32, (A, P), 1)
    oh_ap = _oh(i * A + rowap, colap, dtype)
    return oh_ta, oh_ap


def _fwd_kernel_mega(cfg, P, T, refs):
    nl0, nls, U, G = _dims(cfg)
    M = (cfg.lmax + 1) ** 2
    h, C = cfg.hidden_channels, cfg.sphere_channels
    K = cfg.max_neighbors
    A = T // K
    u_list, m_list, by_u, by_m = _rot_nz(cfg.lmax, cfg.mmax)
    it = iter(refs)
    x = next(it)                        # [M*C, P] bf16 resident
    srow = next(it)                     # [1, T] f32 source atom per edge
    es = next(it)
    Dp = next(it)
    Dpe = next(it)
    W0t = next(it)
    W2t = [next(it) for _ in nls]       # merged [[Wrt,-Wit],[Wit,Wrt]]
    b0 = next(it)
    b2s = [next(it) for _ in nls]       # concat(br, bi) columns
    V0t = next(it)
    V2t = [next(it) for _ in nls]
    c0 = next(it)
    c2s = [next(it) for _ in nls]
    tg = next(it)
    fg = next(it)
    out_ref = next(it)                  # [M*C, P] f32 accumulated (lane
                                        # tiling forbids an A-column
                                        # block: A=8 < 128)
    msg_ref = next(it)                  # [U, h*T] bf16 saved for bwd
    outsv_ref = next(it)                # [U*C, T] bf16 saved for bwd
    bf = x.dtype
    i = pl.program_id(0)

    # ---- one-hot gathers (MXU matmuls against the resident array) -------
    # Mosaic iota is integer-only; the f32 index rows cast exactly.
    # Source atoms are arbitrary -> full [P, T] one-hot. Target atoms are
    # the tile's A consecutive atoms -> stage through the [*, A] block:
    # [P, A] pick + [A, T] expand costs ~A/T + P/T of the direct one-hot.
    abl = _ablate()
    if "nogather" in abl:               # microbench ablation (wrong math)
        xs = jnp.broadcast_to(x[:, 0:1], (x.shape[0], T)).astype(bf)
        xt = xs
    else:
        if "noxs" in abl:               # microbench ablation (wrong math)
            xs = jnp.broadcast_to(x[:, 0:1], (x.shape[0], T)).astype(bf)
        else:
            rowpi = jax.lax.broadcasted_iota(jnp.int32, (P, T), 0)
            src_i = jnp.broadcast_to(srow[0:1, :],
                                     (P, T)).astype(jnp.int32)
            oh_src = _oh(rowpi, src_i, bf)
            xs = _dot(x[:], oh_src).astype(bf)      # [M*C, T]
        if "noxt" in abl:               # microbench ablation (wrong math)
            xt = xs
        else:
            oh_pa, oh_at = _tgt_stage(P, T, A, K, i, bf)
            xt = _dot(_dot(x[:], oh_pa).astype(bf), oh_at).astype(bf)

    # ---- rotation -> conv1 -> S2 act -> conv2 -> back-rotation (v2) -----
    groups = [[(j, m_list[j]) for j in by_u[u]] for u in range(U)]
    if "norot" in abl:                  # microbench ablation (wrong math)
        rs = [xs[u * C:(u + 1) * C, :].astype(jnp.float32)
              for u in range(U)]
        rt = [xt[u * C:(u + 1) * C, :].astype(jnp.float32)
              for u in range(U)]
    else:
        rdt = bf if _rot16() else jnp.float32
        rs = _rotate_rows(Dp[:], xs, groups, C, lambda a: a, rdt)
        rt = _rotate_rows(Dp[:], xt, groups, C, lambda a: a, rdt)
    pr = jnp.concatenate(
        [blk for u in range(U) for blk in (rs[u], rt[u])],
        axis=0).astype(bf)
    if "noconv1" in abl:                # microbench ablation (wrong math)
        msg_raw = jnp.broadcast_to(pr[0:U * h, 0:1].astype(jnp.float32),
                                   (U * h, T))
    else:
        msg_raw = _conv_merged_raw(pr, es[:],
                                   (W0t[:], [w[:] for w in W2t]),
                                   (b0[:], [b[:] for b in b2s]),
                                   nl0, nls, 2 * C, h, T)
    # the raw [(u,h)-rows, edge-cols] matmul-output layout IS the
    # tile-size-independent save layout — write it with NO relayout;
    # the grid chain below takes the one [U, h*T] reshape instead
    msg_ref[:] = msg_raw.astype(msg_ref.dtype)
    msg = msg_raw.reshape(U, h * T)
    # grid chain in bf16 (as the backward's VJP chain): the [G, h*T] grid
    # is the largest live tensor in the kernel (26 MB f32 at escn-md
    # A=32) — bf16 halves it, relieving VMEM pressure on the pipeline
    if "noact" in abl:                  # microbench ablation (wrong math)
        act = msg
    elif "nosilu" in abl:               # microbench ablation (wrong math)
        grid16 = _dot(tg[:], msg.astype(tg.dtype)).astype(bf)
        act = _dot(fg[:], grid16.astype(fg.dtype))
    else:
        grid16 = _dot(tg[:], msg.astype(tg.dtype)).astype(bf)
        act = _dot(fg[:], _silu(grid16).astype(fg.dtype))
        act = jnp.concatenate([_silu(msg[0:1, :]), act[1:, :]], axis=0)
    if "noconv2" in abl and h >= C:     # microbench ablation (wrong math)
        out = act.astype(bf).reshape(U * h, T)[0:U * C, :] \
            .astype(jnp.float32)
    else:
        out = _conv_merged_raw(act.astype(bf).reshape(U * h, T), None,
                               (V0t[:], [w[:] for w in V2t]),
                               (c0[:], [b[:] for b in c2s]),
                               nl0, nls, h, C, T)      # [U*C, T] raw
    outsv_ref[:] = out.astype(outsv_ref.dtype)
    groups_t = [[(j, u_list[j]) for j in by_m[mf]] for mf in range(M)]
    if "norot" in abl:                  # microbench ablation (wrong math)
        back = [out[min(mf, U - 1) * C:(min(mf, U - 1) + 1) * C, :]
                .astype(bf) for mf in range(M)]
    else:
        back = _rotate_rows(Dpe[:], out.astype(bf), groups_t, C,
                            lambda a: a.astype(bf),
                            bf if _rot16() else jnp.float32)
    back_cat = jnp.concatenate(back, axis=0)        # [M*C, T] bf16

    # ---- K-sum scatter into the node accumulator (staged via A) ---------
    oh_ta, oh_ap = _tgt_stage_t(P, T, A, K, i, bf)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
    if "noscat" in abl:                 # microbench ablation (wrong math)
        out_ref[:] += jnp.broadcast_to(
            back_cat[:, 0:1].astype(jnp.float32), out_ref.shape)
    else:
        part = _dot(back_cat, oh_ta)                # [M*C, A] f32 K-sum
        out_ref[:] += _dot(part.astype(bf), oh_ap)  # f32 accum


def _bwd_kernel_mega(cfg, P, T, refs):
    """Input cotangents from the SAVED conv-1 output and conv-2 output
    (the fwd kernel writes both): no rotation/conv recompute at all —
    only the cheap grid matmul for the activation derivative. Cuts the
    backward tile from ~9.4 to ~5.8 GFLOP at escn-md scale."""
    nl0, nls, U, G = _dims(cfg)
    M = (cfg.lmax + 1) ** 2
    h, C = cfg.hidden_channels, cfg.sphere_channels
    K = cfg.max_neighbors
    A = T // K
    u_list, m_list, by_u, by_m = _rot_nz(cfg.lmax, cfg.mmax)
    it = iter(refs)
    x = next(it)                        # [M*C, P] bf16 resident
    gnode = next(it)                    # [M*C, P] f32 node cotangent
    srow = next(it)                     # [1, T] f32
    scol = next(it)                     # [T, 1] f32 (same indices, column
    Dp = next(it)                       # layout: no in-kernel transpose)
    Dpe = next(it)
    msg_s = next(it)                    # [U, h*T] bf16 saved conv1 out
    outsv = next(it)                    # [U*C, T] bf16 saved conv2 out
    # fwd-orientation conv weights (cotangent path), m>0 pairs merged
    # into [[Wr, Wi], [-Wi, Wr]] blocks (_merge_so2 s=+1)
    W0 = next(it)
    W2f = [next(it) for _ in nls]
    V0 = next(it)
    V2f = [next(it) for _ in nls]
    tg = next(it)
    tgT = next(it)
    fgT = next(it)
    dx_ref = next(it)                   # [M*C, P] f32 accumulated
    ges_ref = next(it)
    gdp_ref = next(it)
    gdpe_ref = next(it)

    bf = x.dtype
    i = pl.program_id(0)
    NZp = gdp_ref.shape[0]
    nnz = len(u_list)
    Ce = ges_ref.shape[0]

    abl = _ablate_bwd()

    # ---- gathers (target side staged through the A block) ---------------
    if "nogather" in abl:               # microbench ablation (wrong math)
        xs = jnp.broadcast_to(x[:, 0:1], (x.shape[0], T)).astype(bf)
        xt = xs
        g_back = jnp.broadcast_to(gnode[:, 0:1],
                                  (gnode.shape[0], T)).astype(jnp.float32)
    else:
        oh_pa, oh_at = _tgt_stage(P, T, A, K, i, bf)
        if "noxs" in abl:               # microbench ablation (wrong math)
            xs = jnp.broadcast_to(x[:, 0:1], (x.shape[0], T)).astype(bf)
        else:
            rowpi = jax.lax.broadcasted_iota(jnp.int32, (P, T), 0)
            src_i = jnp.broadcast_to(srow[0:1, :],
                                     (P, T)).astype(jnp.int32)
            oh_src = _oh(rowpi, src_i, bf)
            xs = _dot(x[:], oh_src).astype(bf)
        if "noxt" in abl:               # microbench ablation (wrong math)
            xt = xs
            g_back = jnp.broadcast_to(
                gnode[:, 0:1], (gnode.shape[0], T)).astype(jnp.float32)
        else:
            xt = _dot(_dot(x[:], oh_pa).astype(bf), oh_at).astype(bf)
            g_back = _dot(_dot(gnode[:].astype(bf), oh_pa).astype(bf),
                          oh_at)                    # [M*C, T] f32

    # ---- activation state from the saved conv-1 output ------------------
    # (saved as [(u,h), edge] — reshape to this tile's [U, h*T] view)
    # grid-space chain in bf16: these are the largest live tensors in the
    # kernel ([G, h*T]); bf16 halves them so the tile can grow (A=8 -> 16),
    # and the dsilu factor is well-conditioned (|dsilu| <= ~1.1)
    msg = msg_s[:].reshape(U, h * T)
    if "noact" in abl:                  # microbench ablation (wrong math)
        dsilu_16 = None
    elif "nosilu" in abl:               # microbench ablation (wrong math)
        grid = _dot(tg[:], msg)
        dsilu_16 = grid.astype(bf)
    else:
        grid = _dot(tg[:], msg)
        sig_g = jax.nn.sigmoid(grid)
        dsilu_16 = (sig_g * (1.0 + grid * (1.0 - sig_g))).astype(bf)
    out = outsv[:]

    # ---- back-rotation transpose + g_Dpe --------------------------------
    if "norot" in abl:                  # microbench ablation (wrong math)
        g_out = g_back[0:U * C, :]
    else:
        groups_o = [[(j, m_list[j]) for j in by_u[u]] for u in range(U)]
        # g_out only feeds the bf16 conv2^T matmuls (g16) — under rot16
        # rotate a bf16 view of g_back directly
        g_out_parts = _rotate_rows(
            Dpe[:], g_back.astype(bf) if _rot16() else g_back,
            groups_o, C, lambda a: a, bf if _rot16() else jnp.float32)
        g_out = jnp.concatenate(g_out_parts, axis=0)  # [U*C, T]
    if "nogd" in abl:                   # microbench ablation (wrong math)
        gdpe_ref[:] = jnp.zeros_like(gdpe_ref)
    elif _gd16():
        g_back16 = g_back.astype(bf)
        gdpe_rows = []
        for j in range(nnz):
            u, mf = u_list[j], m_list[j]
            prod = out[u * C:(u + 1) * C, :] \
                * g_back16[mf * C:(mf + 1) * C, :]
            gdpe_rows.append(_rowsum(prod))
        gdpe_rows.append(jnp.zeros((NZp - nnz, T), jnp.float32))
        gdpe_ref[:] = jnp.concatenate(gdpe_rows, axis=0)
    else:
        gdpe_rows = []
        for j in range(nnz):
            u, mf = u_list[j], m_list[j]
            prod = out[u * C:(u + 1) * C, :].astype(jnp.float32) \
                * g_back[mf * C:(mf + 1) * C, :]
            gdpe_rows.append(jnp.sum(prod, axis=0, keepdims=True))
        gdpe_rows.append(jnp.zeros((NZp - nnz, T), jnp.float32))
        gdpe_ref[:] = jnp.concatenate(gdpe_rows, axis=0)

    # ---- conv2^T -> act VJP -> conv1^T (merged m>0 blocks; raw rows) ----
    g16 = g_out.astype(bf)
    parts = [_dot(V0[:], g16[0:nl0 * C, :])]
    off = nl0 * C
    for i2, nl in enumerate(nls):
        parts.append(_dot(V2f[i2][:], g16[off:off + 2 * nl * C, :]))
        off += 2 * nl * C
    g_act = jnp.concatenate(parts, axis=0).reshape(U, h * T)
    if "noact" in abl:                  # microbench ablation (wrong math)
        gm16 = g_act.astype(bf)
    else:
        g_b = jnp.concatenate(
            [jnp.zeros((1, h * T), jnp.float32), g_act[1:, :]], axis=0)
        g_grid = _dot(fgT[:], g_b.astype(bf)).astype(bf) * dsilu_16
        g_msg = _dot(tgT[:], g_grid)
        if "nosilu" in abl:             # microbench ablation (wrong math)
            g_msg = jnp.concatenate(
                [g_msg[0:1, :] + g_act[0:1, :], g_msg[1:, :]], axis=0)
        else:
            m0 = msg[0:1, :].astype(jnp.float32)
            s_sig = jax.nn.sigmoid(m0)
            g_msg = jnp.concatenate(
                [g_msg[0:1, :]
                 + g_act[0:1, :] * s_sig * (1.0 + m0 * (1.0 - s_sig)),
                 g_msg[1:, :]], axis=0)
        gm16 = g_msg.astype(bf)
    gm_raw = gm16.reshape(U * h, T)                 # one relayout
    gx0 = _dot(W0[:], gm_raw[0:nl0 * h, :])
    gpr_parts = [gx0[0:nl0 * 2 * C, :]]
    ges_ref[:] = gx0[nl0 * 2 * C:nl0 * 2 * C + Ce, :]
    off = nl0 * h
    for i2, nl in enumerate(nls):
        gy2 = gm_raw[off:off + 2 * nl * h, :]
        gpr_parts.append(_dot(W2f[i2][:], gy2))     # [gxp; gxn] rows
        off += 2 * nl * h
    g_pr = jnp.concatenate(gpr_parts, axis=0)       # [U*2C, T] f32

    # ---- rotation transpose + g_Dp --------------------------------------
    def src_block(v, u):
        return v[u * 2 * C:u * 2 * C + C, :]

    def tgt_block(v, u):
        return v[u * 2 * C + C:(u + 1) * 2 * C, :]

    if "norot" in abl:                  # microbench ablation (wrong math)
        gxs_parts = [src_block(g_pr, min(mf, U - 1)).astype(bf)
                     for mf in range(M)]
        gxt_parts = [tgt_block(g_pr, min(mf, U - 1)).astype(bf)
                     for mf in range(M)]
    else:
        # the accumulated parts are rounded to bf16 for the scatter
        # matmuls regardless — under rot16 do the FMA chain in bf16 on
        # a bf16 view of g_pr (see _rot16)
        rdt = bf if _rot16() else jnp.float32
        g_pr_r = g_pr.astype(bf) if _rot16() else g_pr
        gxs_parts, gxt_parts = [], []
        for mf in range(M):
            acc_s = None
            acc_t = None
            for j in by_m[mf]:
                u = u_list[j]
                d = Dp[j:j + 1, :].astype(rdt)
                ts_ = d * src_block(g_pr_r, u)
                tt_ = d * tgt_block(g_pr_r, u)
                acc_s = ts_ if acc_s is None else acc_s + ts_
                acc_t = tt_ if acc_t is None else acc_t + tt_
            gxs_parts.append(acc_s.astype(bf))
            gxt_parts.append(acc_t.astype(bf))
    gxs_cat = jnp.concatenate(gxs_parts, axis=0)    # [M*C, T] bf16
    gxt_cat = jnp.concatenate(gxt_parts, axis=0)

    if "nogd" in abl:                   # microbench ablation (wrong math)
        gdp_ref[:] = jnp.zeros_like(gdp_ref)
    elif _gd16():
        g_pr16 = g_pr.astype(bf)
        gdp_rows = []
        for j in range(nnz):
            u, mf = u_list[j], m_list[j]
            ps = xs[mf * C:(mf + 1) * C, :] * src_block(g_pr16, u)
            pt = xt[mf * C:(mf + 1) * C, :] * tgt_block(g_pr16, u)
            gdp_rows.append(_rowsum(ps + pt))
        gdp_rows.append(jnp.zeros((NZp - nnz, T), jnp.float32))
        gdp_ref[:] = jnp.concatenate(gdp_rows, axis=0)
    else:
        gdp_rows = []
        for j in range(nnz):
            u, mf = u_list[j], m_list[j]
            ps = xs[mf * C:(mf + 1) * C, :].astype(jnp.float32) \
                * src_block(g_pr, u)
            pt = xt[mf * C:(mf + 1) * C, :].astype(jnp.float32) \
                * tgt_block(g_pr, u)
            gdp_rows.append(jnp.sum(ps + pt, axis=0, keepdims=True))
        gdp_rows.append(jnp.zeros((NZp - nnz, T), jnp.float32))
        gdp_ref[:] = jnp.concatenate(gdp_rows, axis=0)

    # ---- scatter into the node accumulator ------------------------------
    # source side: arbitrary atoms -> full [T, P] transposed one-hot;
    # target side: staged K-sum + A-block scatter
    @pl.when(i == 0)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    if "nogather" in abl or "noscat" in abl:   # microbench only
        dx_ref[:] += jnp.broadcast_to(
            (gxs_cat[:, 0:1] + gxt_cat[:, 0:1]).astype(jnp.float32),
            dx_ref.shape)
    else:
        colpi = jax.lax.broadcasted_iota(jnp.int32, (T, P), 1)  # atom idx
        scol_i = jnp.broadcast_to(scol[:, 0:1], (T, P)).astype(jnp.int32)
        ohT_src = _oh(colpi, scol_i, bf)
        oh_ta, oh_ap = _tgt_stage_t(P, T, A, K, i, bf)
        gxt_a = _dot(gxt_cat, oh_ta)                # [M*C, A] f32
        dx_ref[:] += _dot(gxs_cat, ohT_src) \
            + _dot(gxt_a.astype(bf), oh_ap)


@functools.lru_cache(maxsize=None)
def _fwd_call_mega(cfg, P):
    nl0, nls, U, G = _dims(cfg)
    M = (cfg.lmax + 1) ** 2
    h, C, Ce = cfg.hidden_channels, cfg.sphere_channels, cfg.edge_channels
    K = cfg.max_neighbors
    T = _mega_tile(cfg, P, cap=_mega_cap(cfg, "FWD", 32))
    A = T // K
    E = P * K
    NZp = _nzp(cfg)
    in_specs = ([_full_spec((M * C, P)),             # x (resident)
                 _col_spec(1, T),                    # src (row layout)
                 _col_spec(Ce, T),
                 _col_spec(NZp, T),
                 _col_spec(NZp, T)]
                + _mega_weight_specs(cfg)
                + [_full_spec((G, U)), _full_spec((U, G))])
    Ep = P * K
    # msg is saved [(u,h)-rows, edge-cols] so the backward may run a
    # DIFFERENT tile size (fwd A=32, bwd A=16 — see _mega_tile)
    out_shape = (jax.ShapeDtypeStruct((M * C, P), jnp.float32),
                 jax.ShapeDtypeStruct((U * h, Ep), _bf()),
                 jax.ShapeDtypeStruct((U * C, Ep), _bf()))
    out_specs = (pl.BlockSpec((M * C, P), lambda i: (0, 0),
                              memory_space=pltpu.VMEM),
                 _col_spec(U * h, T),
                 _col_spec(U * C, T))

    def kernel(*refs):
        _fwd_kernel_mega(cfg, P, T, refs)

    vmem_mb = int(__import__("os").environ.get(
        "PDB2R_TPU_MEGA_A_VMEM_MB", 100))
    return pl.pallas_call(
        kernel, grid=(E // T,), in_specs=in_specs, out_shape=out_shape,
        out_specs=out_specs, interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024))


@functools.lru_cache(maxsize=None)
def _bwd_call_mega(cfg, P):
    nl0, nls, U, G = _dims(cfg)
    M = (cfg.lmax + 1) ** 2
    h, C, Ce = cfg.hidden_channels, cfg.sphere_channels, cfg.edge_channels
    K = cfg.max_neighbors
    T = _mega_tile(cfg, P, cap=_mega_cap(cfg, "BWD", 16))
    E = P * K
    NZp = _nzp(cfg)
    d0 = nl0 * 2 * C + Ce
    fwd_wspecs = [_full_spec((d0, nl0 * h))]
    fwd_wspecs += [_full_spec((2 * nl * 2 * C, 2 * nl * h)) for nl in nls]
    fwd_wspecs += [_full_spec((nl0 * h, nl0 * C))]
    fwd_wspecs += [_full_spec((2 * nl * h, 2 * nl * C)) for nl in nls]
    in_specs = ([_full_spec((M * C, P)),             # x
                 _full_spec((M * C, P)),             # g (node cotangent)
                 _col_spec(1, T),                    # src row layout
                 pl.BlockSpec((T, 1), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),  # src col layout
                 _col_spec(NZp, T),
                 _col_spec(NZp, T),
                 _col_spec(U * h, T),                # saved msg (u,h)-rows
                 _col_spec(U * C, T)]                # saved conv2 out
                + fwd_wspecs
                + [_full_spec((G, U)), _full_spec((U, G)),
                   _full_spec((G, U))])
    out_shape = (jax.ShapeDtypeStruct((M * C, P), jnp.float32),
                 jax.ShapeDtypeStruct((Ce, E), jnp.float32),
                 jax.ShapeDtypeStruct((NZp, E), jnp.float32),
                 jax.ShapeDtypeStruct((NZp, E), jnp.float32))
    out_specs = (pl.BlockSpec((M * C, P), lambda i: (0, 0),
                              memory_space=pltpu.VMEM),
                 _col_spec(Ce, T), _col_spec(NZp, T), _col_spec(NZp, T))

    def kernel(*refs):
        _bwd_kernel_mega(cfg, P, T, refs)

    # the bwd tile is VMEM-bound (it carries cotangent mirrors of both
    # convs); give it the full budget Mosaic allows so A=16 fits
    vmem_mb = int(__import__("os").environ.get("PDB2R_TPU_MEGA_A_VMEM_MB", 128))
    return pl.pallas_call(
        kernel, grid=(E // T,), in_specs=in_specs,
        out_shape=out_shape, out_specs=out_specs,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024))


def _mega_fwd_weight_flats(cfg, weights):
    """conv1 + conv2 fwd orientation (no biases) — the cotangent path of
    the mega backward; m>0 real/imag pairs merged into one
    [[Wr, Wi], [-Wi, Wr]] block per m-order (_merge_so2 s=+1)."""
    (W0, Wrs, Wis, b0, brs, bis, V0, Vrs, Vis, c0, crs, cis) = weights
    bf = _bf()
    out = [W0.astype(bf)]
    out += [_merge_so2(Wr, Wi, 1).astype(bf)
            for Wr, Wi in zip(Wrs, Wis)]
    out += [V0.astype(bf)]
    out += [_merge_so2(Vr, Vi, 1).astype(bf)
            for Vr, Vi in zip(Vrs, Vis)]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_edge_mega(cfg, x_t, srcf, es, Dp, Dpe, weights, tables):
    """Node-resident whole-message-layer kernel.

    x_t [M*C, P]: node features (m-major rows, transposed); srcf [E] f32:
    source atom index per edge in target-major ([P, K] flattened) order
    (f32 so the one-hot compare runs on the VPU and the cotangent is an
    ordinary zero — exact for P < 2^24); es [Ce, E]; Dp / Dpe [nnz, E] as
    in fused_edge_block. Requires E == P * K. Returns the K-SUMMED node
    message update [M*C, P] f32 (the caller divides by avg_degree)."""
    out, _ = _fwd_impl_mega(cfg, x_t, srcf, es, Dp, Dpe, weights, tables)
    return out


def _fwd_impl_mega(cfg, x_t, srcf, es, Dp, Dpe, weights, tables):
    P = x_t.shape[1]
    E = srcf.shape[0]
    K = cfg.max_neighbors
    assert E == P * K, (E, P, K)
    NZp = _nzp(cfg)
    bf = _bf()
    ins = ([x_t.astype(bf), srcf.astype(jnp.float32)[None, :],
            es.astype(bf),
            _pad_rows(Dp, NZp).astype(bf),
            _pad_rows(Dpe, NZp).astype(bf)]
           + _mega_flat_weights_t(weights)
           + [tables[0].astype(bf), tables[1].astype(bf)])
    out, msg, outsv = _fwd_call_mega(cfg, P)(*ins)
    return out, (msg, outsv)


def _vjp_fwd_mega(cfg, x_t, srcf, es, Dp, Dpe, weights, tables):
    out, saved = _fwd_impl_mega(cfg, x_t, srcf, es, Dp, Dpe, weights,
                                tables)
    return out, (x_t, srcf, es, Dp, Dpe, weights, tables) + saved


def _vjp_bwd_mega(cfg, res, g):
    x_t, srcf, es, Dp, Dpe, weights, tables, msg, outsv = res
    P = x_t.shape[1]
    K = cfg.max_neighbors
    E = P * K
    nl0, nls, U, G = _dims(cfg)
    M = (cfg.lmax + 1) ** 2
    C = cfg.sphere_channels
    tg, fg = tables
    NZp = _nzp(cfg)
    bf = _bf()
    srcf32 = srcf.astype(jnp.float32)
    ins = ([x_t.astype(bf), g.astype(jnp.float32),
            srcf32[None, :], srcf32[:, None],
            _pad_rows(Dp, NZp).astype(bf),
            _pad_rows(Dpe, NZp).astype(bf),
            msg, outsv]
           + _mega_fwd_weight_flats(cfg, weights)
           + [tg.astype(bf), tg.T.astype(bf), fg.T.astype(bf)])
    gx, ges, gdp, gdpe = _bwd_call_mega(cfg, P)(*ins)
    nnz = len(_rot_nz(cfg.lmax, cfg.mmax)[0])
    gdp = gdp[:nnz]
    gdpe = gdpe[:nnz]

    # ---- weight cotangents via XLA replay (DCE'd on force-only calls) ---
    u_list, m_list, _, _ = _rot_nz(cfg.lmax, cfg.mmax)
    ui = jnp.asarray(u_list)
    mi = jnp.asarray(m_list)
    idx = srcf.astype(jnp.int32)
    xs_t = jnp.take(x_t.astype(jnp.float32), idx, axis=1)
    xt_t = jnp.repeat(x_t.astype(jnp.float32), K, axis=1)
    g_e = jnp.repeat(g.astype(jnp.float32), K, axis=1)
    Dd = jnp.zeros((U, M, E), jnp.float32).at[ui, mi].set(
        Dp.astype(jnp.float32))
    Dde = jnp.zeros((U, M, E), jnp.float32).at[ui, mi].set(
        Dpe.astype(jnp.float32))
    rot_s = jnp.einsum("ume,mce->uce", Dd, xs_t.reshape(M, C, E))
    rot_t = jnp.einsum("ume,mce->uce", Dd, xt_t.reshape(M, C, E))
    pr = jnp.concatenate([rot_s, rot_t], axis=1).reshape(U * 2 * C, E)
    g_chain = jnp.einsum("ume,mce->uce", Dde,
                         g_e.reshape(M, C, E)).reshape(U * C, E)
    _, wvjp = jax.vjp(
        lambda w: chain_xla(cfg, pr, es.astype(jnp.float32), w, tables),
        weights)
    (gw,) = wvjp(g_chain)

    g_tables = (jnp.zeros_like(tg), jnp.zeros_like(fg))
    return (gx, jnp.zeros_like(srcf), ges, gdp, gdpe, gw, g_tables)


fused_edge_mega.defvjp(_vjp_fwd_mega, _vjp_bwd_mega)
