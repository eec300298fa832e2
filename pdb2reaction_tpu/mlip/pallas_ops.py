"""Pallas TPU kernels for the MLIP hot path.

The dense-adjacency formulation (model.py:energy_fn_dense) is built from
one contraction primitive:

    T[i, r, f] = sum_j A[i, j, r] * feats[j, f]
    A[i, j, r] = bessel_r(d_ij) * env(d_ij) * mask_ij      (radial adjacency)

XLA's einsum materializes A in HBM — O(P^2 R) bytes (420 MB at P = 2048),
the memory wall for full-complex systems. This kernel computes the A tile
in VMEM on the fly from coordinates and contracts it immediately on the
MXU, so HBM only ever sees [P,3] coordinates, [P,F] features and the
[P,R,F] result.

The ``div_d`` variant uses A/d, which is exactly what the edge-direction
message stream needs after the split
    u_k = (x_j - x_i)_k / d  =>  A*u_k = (A/d)*x_jk - x_ik*(A/d),
so all three PaiNN streams reduce to this one primitive (model.py).

A custom VJP makes the primitive differentiable: the feats-gradient is the
transposed contraction (A is symmetric in i,j), and the coordinate
gradient contracts dT against feats tile-wise with the analytic radial
derivative — again without materializing anything O(P^2) in HBM.

Status (v5e measurements, 2026-08): numerically verified on hardware
(forward + both gradients match the jnp reference to f32 precision;
includes a workaround for a Mosaic miscompile of K=3 ``jnp.dot``), and
memory is O(P) as designed — but the serial per-tile R-loop of small dots
currently runs ~17x slower than XLA's batched einsum schedule at
P=1024-2048 (1.3 s vs 77 ms per 4-image batch). ``mp_mode="dense"``
therefore stays the default; this kernel is the foundation for the
flop-dense retiling (fuse the R axis into one [TI, TJ*R] x [TJ*R, F]
MXU contraction per tile, bf16 tiles, double-buffered feats DMA) tracked
for the next round.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _radial_tile(di, dj, mi, mj, gi, gj, cutoff, n_radial, div_d):
    """A tile of the radial adjacency: [TI, TJ, R] plus the env channel.

    di/dj: [TI,3]/[TJ,3] coords; mi/mj masks; gi/gj global indices.
    Returns (a_list, d, within): R+1 tiles [TI,TJ] each.
    """
    # NOTE: K=3 jnp.dot miscompiles on the axon Mosaic backend
    # (minimal reproducer: dot d2 err 0.54); expand manually.
    d2 = ((di[:, 0][:, None] - dj[:, 0][None, :]) ** 2
          + (di[:, 1][:, None] - dj[:, 1][None, :]) ** 2
          + (di[:, 2][:, None] - dj[:, 2][None, :]) ** 2)
    d = jnp.sqrt(jnp.maximum(d2, 1e-12))
    not_self = gi[:, None] != gj[None, :]
    within = ((d <= cutoff) & not_self
              & (mi[:, None] > 0) & (mj[None, :] > 0))
    x = jnp.clip(d / cutoff, 0.0, 1.0)
    env = jnp.where(within, 0.5 * (jnp.cos(jnp.pi * x) + 1.0), 0.0)
    d_safe = jnp.where(within, d, 1.0)
    inv_d = 1.0 / d_safe
    scale = env * inv_d * np.sqrt(2.0 / cutoff)
    if div_d:
        scale = scale * inv_d
        env_ch = env * inv_d
    else:
        env_ch = env
    a_list = []
    for r in range(n_radial):
        freq = (r + 1) * np.pi / cutoff
        a_list.append(jnp.sin(freq * d_safe) * scale)
    a_list.append(env_ch)
    return a_list, d_safe, within


def _fwd_kernel(ci_ref, mi_ref, cj_ref, mj_ref, feats_ref, out_ref, *,
                cutoff, n_radial, div_d, ti, tj):
    i_blk = pl.program_id(0)
    j_blk = pl.program_id(2)
    gi = i_blk * ti + jax.lax.broadcasted_iota(jnp.int32, (ti, 1), 0)[:, 0]
    gj = j_blk * tj + jax.lax.broadcasted_iota(jnp.int32, (tj, 1), 0)[:, 0]
    a_list, _, _ = _radial_tile(ci_ref[:], cj_ref[:], mi_ref[:, 0],
                                mj_ref[:, 0], gi, gj, cutoff, n_radial,
                                div_d)

    @pl.when(j_blk == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    feats = feats_ref[:]
    for r, a in enumerate(a_list):
        out_ref[:, r, :] += jnp.dot(a, feats,
                                    preferred_element_type=jnp.float32)


def _pad_to(x, n, axis=0):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def radial_contract_tpu(coords, mask, feats, cutoff, n_radial,
                        div_d=False):
    """T[i,r,f] = sum_j A[i,j,r] feats[j,f]; A from coords on the fly.

    coords [P,3] f32 (Angstrom), mask [P], feats [P,F] f32.
    Returns [P, n_radial+1, F] f32.
    """
    return _radial_contract_impl(coords, mask, feats, cutoff, n_radial,
                                 div_d)


def radial_contract(coords, mask, feats, cutoff, n_radial, div_d=False):
    """Backend dispatch: Pallas kernel on TPU, jnp reference elsewhere."""
    import jax as _jax
    if _jax.default_backend() in ("tpu", "axon"):
        return radial_contract_tpu(coords, mask, feats, cutoff, n_radial,
                                   div_d)
    return radial_contract_reference(coords, mask, feats, cutoff,
                                     n_radial, div_d)


def _radial_contract_impl(coords, mask, feats, cutoff, n_radial, div_d,
                          transpose_ij=False):
    P, F = feats.shape
    TI = min(128, P)
    TJ = min(128, P)
    FT = min(256, F)
    Pp = -(-P // TI) * TI
    Fp = -(-F // FT) * FT
    R1 = n_radial + 1
    c = _pad_to(coords.astype(jnp.float32), Pp)
    m = _pad_to(mask.astype(jnp.float32).reshape(-1, 1), Pp)
    f = _pad_to(_pad_to(feats.astype(jnp.float32), Pp, 0), Fp, 1)

    kern = functools.partial(_fwd_kernel, cutoff=float(cutoff),
                             n_radial=int(n_radial), div_d=bool(div_d),
                             ti=TI, tj=TJ)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Pp, R1, Fp), jnp.float32),
        grid=(Pp // TI, Fp // FT, Pp // TJ),
        in_specs=[
            pl.BlockSpec((TI, 3), lambda i, fb, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, 1), lambda i, fb, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TJ, 3), lambda i, fb, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TJ, 1), lambda i, fb, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TJ, FT), lambda i, fb, j: (j, fb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TI, R1, FT), lambda i, fb, j: (i, 0, fb),
                               memory_space=pltpu.VMEM),
    )(c, m, c, m, f)
    return out[:P, :, :F]


def _grad_coords_kernel(ci_ref, mi_ref, cj_ref, mj_ref, g_ref, feats_ref,
                        out_ref, *, cutoff, n_radial, div_d, ti, tj):
    """dL/dx_i accumulation for one (i, j) tile pair.

    G[i,j] = sum_r dA_r/dd * (sum_f g[i,r,f] feats[j,f]);
    dx_i += sum_j G[i,j] * (x_i - x_j)/d.
    """
    i_blk = pl.program_id(0)
    j_blk = pl.program_id(1)
    gi = i_blk * ti + jax.lax.broadcasted_iota(jnp.int32, (ti, 1), 0)[:, 0]
    gj = j_blk * tj + jax.lax.broadcasted_iota(jnp.int32, (tj, 1), 0)[:, 0]
    ci = ci_ref[:]
    cj = cj_ref[:]
    # NOTE: K=3 jnp.dot miscompiles on the axon Mosaic backend
    # (minimal reproducer: dot d2 err 0.54); expand manually.
    d2 = ((ci[:, 0][:, None] - cj[:, 0][None, :]) ** 2
          + (ci[:, 1][:, None] - cj[:, 1][None, :]) ** 2
          + (ci[:, 2][:, None] - cj[:, 2][None, :]) ** 2)
    d = jnp.sqrt(jnp.maximum(d2, 1e-12))
    not_self = gi[:, None] != gj[None, :]
    within = ((d <= cutoff) & not_self
              & (mi_ref[:, 0][:, None] > 0) & (mj_ref[:, 0][None, :] > 0))
    d_safe = jnp.where(within, d, 1.0)
    inv_d = 1.0 / d_safe
    x = jnp.clip(d / cutoff, 0.0, 1.0)
    env = jnp.where(within, 0.5 * (jnp.cos(jnp.pi * x) + 1.0), 0.0)
    denv = jnp.where(within,
                     -0.5 * jnp.pi / cutoff * jnp.sin(jnp.pi * x), 0.0)
    norm = np.sqrt(2.0 / cutoff)
    p = 2.0 if div_d else 1.0    # extra 1/d power for the div_d variant

    feats = feats_ref[:]
    G = jnp.zeros_like(d)
    for r in range(n_radial):
        freq = (r + 1) * np.pi / cutoff
        s = jnp.sin(freq * d_safe)
        ds_dd = freq * jnp.cos(freq * d_safe)
        # A_r = norm * s * env / d^p
        base = norm * inv_d ** p
        dA = base * (ds_dd * env + s * denv - p * s * env * inv_d)
        Sr = jnp.dot(g_ref[:, r, :], feats.T,
                     preferred_element_type=jnp.float32)
        G += dA * Sr
    # env-only channel: A_R = env / d^(p-1)
    pe = p - 1.0
    base = inv_d ** pe
    dAe = base * (denv - pe * env * inv_d)
    Se = jnp.dot(g_ref[:, n_radial, :], feats.T,
                 preferred_element_type=jnp.float32)
    G += dAe * Se

    unit = (ci[:, None, :] - cj[None, :, :]) * inv_d[:, :, None]
    contrib = jnp.sum(G[:, :, None] * unit, axis=1)      # [TI,3]

    @pl.when(j_blk == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += contrib


def _grad_coords(coords, mask, feats, g, cutoff, n_radial, div_d):
    # F-chunk to keep the [TI, R+1, F] gradient block inside VMEM
    P, F = feats.shape
    FT = 128
    if F > FT:
        out = None
        for f0 in range(0, F, FT):
            part = _grad_coords(coords, mask, feats[:, f0:f0 + FT],
                                g[:, :, f0:f0 + FT], cutoff, n_radial,
                                div_d)
            out = part if out is None else out + part
        return out
    TI = min(128, P)
    TJ = min(128, P)
    Pp = -(-P // TI) * TI
    R1 = n_radial + 1
    c = _pad_to(coords.astype(jnp.float32), Pp)
    m = _pad_to(mask.astype(jnp.float32).reshape(-1, 1), Pp)
    f = _pad_to(feats.astype(jnp.float32), Pp)
    gg = _pad_to(g.astype(jnp.float32), Pp)

    kern = functools.partial(_grad_coords_kernel, cutoff=float(cutoff),
                             n_radial=int(n_radial), div_d=bool(div_d),
                             ti=TI, tj=TJ)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Pp, 3), jnp.float32),
        grid=(Pp // TI, Pp // TJ),
        in_specs=[
            pl.BlockSpec((TI, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TJ, 3), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TJ, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, R1, F), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TJ, F), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TI, 3), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
    )(c, m, c, m, gg, f)
    return out[:P]


def _transpose_kernel(ci_ref, mi_ref, cj_ref, mj_ref, g_ref, out_ref, *,
                      cutoff, n_radial, div_d, ti, tj):
    """dfeats[j,f] = sum_i sum_r A[j,i,r] g[i,r,f]; A symmetric in (i,j).

    Grid (j, i): the j-blocked output accumulates over the inner i axis.
    """
    j_blk = pl.program_id(0)
    i_blk = pl.program_id(1)
    gi = i_blk * ti + jax.lax.broadcasted_iota(jnp.int32, (ti, 1), 0)[:, 0]
    gj = j_blk * tj + jax.lax.broadcasted_iota(jnp.int32, (tj, 1), 0)[:, 0]
    a_list, _, _ = _radial_tile(cj_ref[:], ci_ref[:], mj_ref[:, 0],
                                mi_ref[:, 0], gj, gi, cutoff, n_radial,
                                div_d)

    @pl.when(i_blk == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for r, a in enumerate(a_list):       # a: [TJ, TI]
        out_ref[:] += jnp.dot(a, g_ref[:, r, :],
                              preferred_element_type=jnp.float32)


def _grad_feats(coords, mask, g, cutoff, n_radial, div_d, F):
    FT = 128
    if F > FT:
        parts = [_grad_feats(coords, mask, g[:, :, f0:f0 + FT], cutoff,
                             n_radial, div_d, min(FT, F - f0))
                 for f0 in range(0, F, FT)]
        return jnp.concatenate(parts, axis=1)
    P = coords.shape[0]
    TI = min(128, P)
    TJ = min(128, P)
    Pp = -(-P // TI) * TI
    R1 = n_radial + 1
    c = _pad_to(coords.astype(jnp.float32), Pp)
    m = _pad_to(mask.astype(jnp.float32).reshape(-1, 1), Pp)
    gg = _pad_to(g.astype(jnp.float32), Pp)

    kern = functools.partial(_transpose_kernel, cutoff=float(cutoff),
                             n_radial=int(n_radial), div_d=bool(div_d),
                             ti=TI, tj=TJ)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Pp, F), jnp.float32),
        grid=(Pp // TJ, Pp // TI),
        in_specs=[
            pl.BlockSpec((TI, 3), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TJ, 3), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TJ, 1), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, R1, F), lambda j, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TJ, F), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
    )(c, m, c, m, gg)
    return out[:P]


def _rc_fwd(coords, mask, feats, cutoff, n_radial, div_d):
    T = _radial_contract_impl(coords, mask, feats, cutoff, n_radial, div_d)
    return T, (coords, mask, feats)


def _rc_bwd(cutoff, n_radial, div_d, res, g):
    coords, mask, feats = res
    dfeats = _grad_feats(coords, mask, g, cutoff, n_radial, div_d,
                         feats.shape[1]).astype(feats.dtype)
    # dx_i term (i as receiver) ...
    dci = _grad_coords(coords, mask, feats, g, cutoff, n_radial, div_d)
    # ... and the j-side term: by symmetry of A (and d), the gradient of
    # d_ij w.r.t. x_j is the negative unit vector; swapping roles gives
    # dx_j = -sum_i G[i,j] u[i,j]. Compute with the same kernel on the
    # transposed contraction: swap (g<->feats-role) via the symmetric G:
    # G_T[j,i] = G[i,j], so dx_j = _grad_coords with (g', feats') where
    # the product sum_f g[i,r,f] feats[j,f] must keep i fixed. We obtain
    # it by rerunning with the roles of the two point sets swapped:
    dcj = _grad_coords_swapped(coords, mask, feats, g, cutoff, n_radial,
                               div_d)
    dcoords = (dci + dcj).astype(coords.dtype)
    return dcoords, None, dfeats


def _grad_coords_swapped(coords, mask, feats, g, cutoff, n_radial, div_d):
    """dx_j = -sum_i G[i,j] * (x_i - x_j)/d — the sender-side gradient."""
    P, F = feats.shape
    FT = 128
    if F > FT:
        out = None
        for f0 in range(0, F, FT):
            part = _grad_coords_swapped(coords, mask,
                                        feats[:, f0:f0 + FT],
                                        g[:, :, f0:f0 + FT], cutoff,
                                        n_radial, div_d)
            out = part if out is None else out + part
        return out
    TI = min(128, P)
    TJ = min(128, P)
    Pp = -(-P // TI) * TI
    R1 = n_radial + 1
    c = _pad_to(coords.astype(jnp.float32), Pp)
    m = _pad_to(mask.astype(jnp.float32).reshape(-1, 1), Pp)
    f = _pad_to(feats.astype(jnp.float32), Pp)
    gg = _pad_to(g.astype(jnp.float32), Pp)

    def kern(cj_ref, mj_ref, ci_ref, mi_ref, g_ref, feats_ref, out_ref):
        # grid (j, i): output blocked over j (sender side), accumulate i
        j_blk = pl.program_id(0)
        i_blk = pl.program_id(1)
        gi = i_blk * TI + jax.lax.broadcasted_iota(jnp.int32, (TI, 1), 0)[:, 0]
        gj = j_blk * TJ + jax.lax.broadcasted_iota(jnp.int32, (TJ, 1), 0)[:, 0]
        ci = ci_ref[:]
        cj = cj_ref[:]
        # NOTE: K=3 jnp.dot miscompiles on the axon Mosaic backend
        # (minimal reproducer: dot d2 err 0.54); expand manually.
        d2 = ((ci[:, 0][:, None] - cj[:, 0][None, :]) ** 2
              + (ci[:, 1][:, None] - cj[:, 1][None, :]) ** 2
              + (ci[:, 2][:, None] - cj[:, 2][None, :]) ** 2)
        d = jnp.sqrt(jnp.maximum(d2, 1e-12))
        not_self = gi[:, None] != gj[None, :]
        within = ((d <= cutoff) & not_self
                  & (mi_ref[:, 0][:, None] > 0)
                  & (mj_ref[:, 0][None, :] > 0))
        d_safe = jnp.where(within, d, 1.0)
        inv_d = 1.0 / d_safe
        x = jnp.clip(d / cutoff, 0.0, 1.0)
        env = jnp.where(within, 0.5 * (jnp.cos(jnp.pi * x) + 1.0), 0.0)
        denv = jnp.where(within,
                         -0.5 * jnp.pi / cutoff * jnp.sin(jnp.pi * x), 0.0)
        norm = np.sqrt(2.0 / cutoff)
        p = 2.0 if div_d else 1.0
        feats_t = feats_ref[:]
        G = jnp.zeros_like(d)
        for r in range(n_radial):
            freq = (r + 1) * np.pi / cutoff
            s = jnp.sin(freq * d_safe)
            ds_dd = freq * jnp.cos(freq * d_safe)
            base = norm * inv_d ** p
            dA = base * (ds_dd * env + s * denv - p * s * env * inv_d)
            Sr = jnp.dot(g_ref[:, r, :], feats_t.T,
                         preferred_element_type=jnp.float32)
            G += dA * Sr
        pe = p - 1.0
        base = inv_d ** pe
        dAe = base * (denv - pe * env * inv_d)
        Se = jnp.dot(g_ref[:, n_radial, :], feats_t.T,
                     preferred_element_type=jnp.float32)
        G += dAe * Se
        unit = (ci[:, None, :] - cj[None, :, :]) * inv_d[:, :, None]
        contrib = -jnp.sum(G[:, :, None] * unit, axis=0)   # [TJ,3]

        @pl.when(i_blk == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += contrib

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Pp, 3), jnp.float32),
        grid=(Pp // TJ, Pp // TI),
        in_specs=[
            pl.BlockSpec((TJ, 3), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TJ, 1), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, 3), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, n_radial + 1, F), lambda j, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TJ, F), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TJ, 3), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
    )(c, m, c, m, gg, f)
    return out[:P]


radial_contract_tpu.defvjp(_rc_fwd, _rc_bwd)


def radial_contract_reference(coords, mask, feats, cutoff, n_radial,
                              div_d=False):
    """Pure-jnp reference implementation (testing / CPU fallback)."""
    from .radial import cosine_envelope
    P = coords.shape[0]
    diff = coords[:, None, :] - coords[None, :, :]
    d = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1), 1e-12))
    eye = jnp.eye(P, dtype=bool)
    within = (d <= cutoff) & (~eye) & (mask[:, None] > 0) & (mask[None, :] > 0)
    d_safe = jnp.where(within, d, 1.0)
    env = jnp.where(within, cosine_envelope(d, cutoff), 0.0)
    inv = 1.0 / d_safe
    scale = env * inv * np.sqrt(2.0 / cutoff)
    env_ch = env
    if div_d:
        scale = scale * inv
        env_ch = env * inv
    freqs = jnp.arange(1, n_radial + 1) * (np.pi / cutoff)
    A = jnp.concatenate(
        [jnp.sin(d_safe[..., None] * freqs) * scale[..., None],
         env_ch[..., None]], -1)
    return jnp.einsum("ijr,jf->irf", A, feats)
