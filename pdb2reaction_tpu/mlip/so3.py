"""SO(3) machinery for the eSCN-class backbone: real spherical harmonics,
Wigner rotation matrices, and sphere-grid (S2) transform tables.

Role: the math underneath fairchem-UMA's spherical-channel message passing
(the reference consumes it as a black box through
/root/reference/pdb2reaction/uma_pysis.py:246-250). Everything here is an
original implementation:

- real spherical harmonics in the standard (Condon-Shortley-free) convention,
  flat (l, m) index ``l*(l+1)+m``;
- rotation matrices on the real-SH basis via the Ivanic & Ruedenberg (1996,
  + erratum) recursion — polynomial in the l=1 rotation entries, hence
  differentiable and jit-friendly (no Euler angles, no trig branch cuts);
- the edge-aligned frame: a deterministic proper rotation mapping each edge
  direction onto +y, so SO(2) convolutions mix only +-m pairs (the eSCN
  trick);
- Gauss-Legendre x uniform-phi S2 grid to/from matrices for point-wise
  spherical nonlinearities.

Numpy table builders are framework-neutral (shared with the torch parity
mirror in tests/); the per-edge Wigner construction is traced JAX.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def lm_index(l: int, m: int) -> int:  # noqa: E741
    return l * (l + 1) + m


def num_coeffs(lmax: int) -> int:
    return (lmax + 1) ** 2


# ---------------------------------------------------------------------------
# real spherical harmonics (numpy, for tables and tests)
# ---------------------------------------------------------------------------

def real_sph_harm(lmax: int, xyz: np.ndarray) -> np.ndarray:
    """Evaluate real spherical harmonics Y_lm for unit vectors.

    Convention: Condon-Shortley-free real SH ("Wikipedia real form"), e.g.
    Y_{1,-1} = sqrt(3/4pi) y, Y_{1,0} = sqrt(3/4pi) z, Y_{1,1} = sqrt(3/4pi) x.

    Parameters
    ----------
    xyz : [..., 3] unit vectors.

    Returns
    -------
    [..., (lmax+1)^2] values, flat index l*(l+1)+m.
    """
    from scipy.special import sph_harm_y

    xyz = np.asarray(xyz, dtype=np.float64)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    theta = np.arccos(np.clip(z, -1.0, 1.0))
    phi = np.arctan2(y, x)
    out = np.zeros(xyz.shape[:-1] + (num_coeffs(lmax),), dtype=np.float64)
    for l in range(lmax + 1):  # noqa: E741
        for m in range(0, l + 1):
            ylm = sph_harm_y(l, m, theta, phi)  # includes Condon-Shortley
            if m == 0:
                out[..., lm_index(l, 0)] = ylm.real
            else:
                # (-1)^m cancels the Condon-Shortley phase
                s = (-1.0) ** m * np.sqrt(2.0)
                out[..., lm_index(l, m)] = s * ylm.real
                out[..., lm_index(l, -m)] = s * ylm.imag
    return out


# ---------------------------------------------------------------------------
# Wigner rotation matrices on the real-SH basis (Ivanic-Ruedenberg)
# ---------------------------------------------------------------------------
# The recursion is generic over the array namespace so the identical
# algorithm runs traced in JAX here and (re-expressed) in the torch test
# mirror. Leading batch dimensions broadcast through.

def _ir_uvw(l: int, m: int, mp: int):  # noqa: E741
    """Static scalar coefficients u, v, w of the IR recursion."""
    d = float((l + mp) * (l - mp)) if abs(mp) < l else float(2 * l * (2 * l - 1))
    dm0 = 1.0 if m == 0 else 0.0
    u = np.sqrt((l + m) * (l - m) / d)
    v = 0.5 * np.sqrt((1.0 + dm0) * (l + abs(m) - 1) * (l + abs(m)) / d) \
        * (1.0 - 2.0 * dm0)
    w = -0.5 * np.sqrt((l - abs(m) - 1) * (l - abs(m)) / d) * (1.0 - dm0)
    return u, v, w


def _ir_P(r1, Dprev, i: int, l: int, a: int, b: int):  # noqa: E741
    """Helper P_i(l; a, b): r1 indexed [..., i+1, m'+1] (m in -1..1),
    Dprev indexed [..., a+l-1, b+l-1] (entries of D^{l-1})."""
    lm1 = l - 1

    def R(m, mp):
        return r1[..., m + 1, mp + 1]

    def D(a_, b_):
        return Dprev[..., a_ + lm1, b_ + lm1]

    if abs(b) < l:
        return R(i, 0) * D(a, b)
    if b == l:
        return R(i, 1) * D(a, lm1) - R(i, -1) * D(a, -lm1)
    # b == -l
    return R(i, 1) * D(a, -lm1) + R(i, -1) * D(a, lm1)


def _ir_next(r1, Dprev, l: int, xp):  # noqa: E741
    """D^l from D^{l-1} and the l=1 block r1. ``xp`` = array namespace."""
    rows = []
    for m in range(-l, l + 1):
        u_, v_, w_ = zip(*[_ir_uvw(l, m, mp) for mp in range(-l, l + 1)])
        cols = []
        for k, mp in enumerate(range(-l, l + 1)):
            term = 0.0
            if u_[k] != 0.0:
                term = term + u_[k] * _ir_P(r1, Dprev, 0, l, m, mp)
            if v_[k] != 0.0:
                if m == 0:
                    V = _ir_P(r1, Dprev, 1, l, 1, mp) \
                        + _ir_P(r1, Dprev, -1, l, -1, mp)
                elif m > 0:
                    d1 = 1.0 if m == 1 else 0.0
                    V = _ir_P(r1, Dprev, 1, l, m - 1, mp) * np.sqrt(1.0 + d1) \
                        - _ir_P(r1, Dprev, -1, l, -m + 1, mp) * (1.0 - d1)
                else:
                    d1 = 1.0 if m == -1 else 0.0
                    V = _ir_P(r1, Dprev, 1, l, m + 1, mp) * (1.0 - d1) \
                        + _ir_P(r1, Dprev, -1, l, -m - 1, mp) * np.sqrt(1.0 + d1)
                term = term + v_[k] * V
            if w_[k] != 0.0:
                if m > 0:
                    W = _ir_P(r1, Dprev, 1, l, m + 1, mp) \
                        + _ir_P(r1, Dprev, -1, l, -m - 1, mp)
                else:  # m < 0 (w == 0 at m == 0)
                    W = _ir_P(r1, Dprev, 1, l, m - 1, mp) \
                        - _ir_P(r1, Dprev, -1, l, -m + 1, mp)
                term = term + w_[k] * W
            cols.append(term)
        rows.append(xp.stack(cols, axis=-1))
    return xp.stack(rows, axis=-2)


@lru_cache(maxsize=None)
def _ir_coeff_table(l: int) -> np.ndarray:  # noqa: E741
    """Bilinear coefficient tensor of the IR recursion step l-1 -> l.

    The recursion D^l = F(D^1, D^{l-1}) is BILINEAR in its two inputs, so
    it is fully described by a fixed tensor T with
        D^l[o] = sum_{a,c} T[o, a, c] * D^1flat[a] * D^{l-1}flat[c],
    extracted here by evaluating ``_ir_next`` (numpy) on the one-hot grid.
    Shape [(2l+1)^2, 9, (2l-1)^2].
    """
    n_prev = (2 * l - 1) ** 2
    r1 = np.broadcast_to(np.eye(9).reshape(9, 1, 3, 3),
                         (9, n_prev, 3, 3))
    Dp = np.broadcast_to(
        np.eye(n_prev).reshape(1, n_prev, 2 * l - 1, 2 * l - 1),
        (9, n_prev, 2 * l - 1, 2 * l - 1))
    out = _ir_next(r1, Dp, l, np)               # [9, n_prev, 2l+1, 2l+1]
    return np.ascontiguousarray(
        out.reshape(9, n_prev, (2 * l + 1) ** 2).transpose(2, 0, 1))


def wigner_blocks(rot: jnp.ndarray, lmax: int):
    """Per-l rotation blocks on the real-SH basis.

    Parameters
    ----------
    rot : [..., 3, 3] proper rotation matrices acting on coordinates.

    Returns
    -------
    list of [..., 2l+1, 2l+1] arrays, l = 0..lmax, satisfying
    Y_l(R x) = D_l(R) Y_l(x).

    The l >= 2 blocks use the table-driven form of the Ivanic-Ruedenberg
    recursion: each step is ONE dense [9*(2l-1)^2] x [(2l+1)^2] matmul per
    edge batch (MXU) instead of the unrolled scalar recursion (~4800 HLO
    ops on [P,K] tensors at lmax=4 — a compile-time and VPU-latency wall).
    """
    batch = rot.shape[:-2]
    D0 = jnp.ones(batch + (1, 1), rot.dtype)
    blocks = [D0]
    if lmax == 0:
        return blocks
    # l=1 real SH order is (y, z, x): conjugate R by the (x,y,z)->(y,z,x)
    # coordinate permutation
    perm = jnp.asarray([[0.0, 1.0, 0.0],
                        [0.0, 0.0, 1.0],
                        [1.0, 0.0, 0.0]], rot.dtype)
    D1 = perm @ rot @ perm.T
    blocks.append(D1)
    r9 = D1.reshape(batch + (9,))
    Dprev = r9
    for l in range(2, lmax + 1):  # noqa: E741
        T = jnp.asarray(_ir_coeff_table(l), rot.dtype)
        n_prev = (2 * l - 1) ** 2
        n_out = (2 * l + 1) ** 2
        outer = (r9[..., :, None] * Dprev[..., None, :]).reshape(
            batch + (9 * n_prev,))
        Dl_flat = outer @ T.reshape(n_out, 9 * n_prev).T
        blocks.append(Dl_flat.reshape(batch + (2 * l + 1, 2 * l + 1)))
        Dprev = Dl_flat
    return blocks


def wigner_full(rot: jnp.ndarray, lmax: int) -> jnp.ndarray:
    """Block-diagonal [(lmax+1)^2, (lmax+1)^2] rotation on flat (l,m)."""
    blocks = wigner_blocks(rot, lmax)
    M = num_coeffs(lmax)
    batch = rot.shape[:-2]
    out = jnp.zeros(batch + (M, M), rot.dtype)
    for l, D in enumerate(blocks):  # noqa: E741
        i0 = l * l
        out = out.at[..., i0:i0 + 2 * l + 1, i0:i0 + 2 * l + 1].set(D)
    return out


# ---------------------------------------------------------------------------
# edge-aligned frame
# ---------------------------------------------------------------------------

def edge_rot_mat(vec: jnp.ndarray) -> jnp.ndarray:
    """Deterministic proper rotation R with R @ d_hat = +z for each edge.

    +z because in this real-SH convention (Y_{1,0} proportional to z) the
    polar axis is z: rotations about z act on coefficients as m=0-invariant
    per-|m| 2D rotations, which is exactly the structure the SO(2)
    convolution commutes with. (fairchem aligns edges with y only because
    e3nn's basis puts the polar axis on y.)

    Frame choice: helper axis = the coordinate axis least aligned with the
    edge (piecewise constant, gradient-stopped — the energy is frame-
    invariant so the choice never enters the physics); rows are
    (a, d_hat x a, d_hat) with a = normalize(d_hat x helper).

    vec : [..., 3] (need not be normalized).
    """
    d = vec / jnp.linalg.norm(vec, axis=-1, keepdims=True)
    helper_idx = jnp.argmin(jnp.abs(d), axis=-1)
    helper = jax.nn.one_hot(jax.lax.stop_gradient(helper_idx), 3,
                            dtype=d.dtype)
    a = jnp.cross(d, helper)
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    # rows (a, d x a, d): orthonormal, det = +1, and R @ d = e_z
    return jnp.stack([a, jnp.cross(d, a), d], axis=-2)


# ---------------------------------------------------------------------------
# S2 grid transform tables (numpy; shared with the torch mirror)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def s2_grid_tables(lmax: int, n_theta: int = 0, n_phi: int = 0):
    """(to_grid [G, M], from_grid [M, G]) float64 numpy tables.

    Gauss-Legendre nodes in cos(theta) x uniform phi; the quadrature makes
    from_grid @ to_grid == identity for band-limited (<= lmax) signals.
    """
    if n_theta <= 0:
        n_theta = 2 * (lmax + 1)
    if n_phi <= 0:
        n_phi = 2 * lmax + 3
    ct, wt = np.polynomial.legendre.leggauss(n_theta)
    theta = np.arccos(ct)
    phi = np.arange(n_phi) * (2.0 * np.pi / n_phi)
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    xyz = np.stack([np.sin(tt) * np.cos(pp),
                    np.sin(tt) * np.sin(pp),
                    np.cos(tt)], axis=-1).reshape(-1, 3)
    Y = real_sph_harm(lmax, xyz)                      # [G, M]
    w = (np.repeat(wt, n_phi) * (2.0 * np.pi / n_phi))  # [G]
    to_grid = Y
    from_grid = (Y * w[:, None]).T                    # [M, G]
    return to_grid, from_grid


@lru_cache(maxsize=None)
def s2_grid_tables_midpoint(lmax: int, n_theta: int, n_phi: int):
    """(to_grid [G, M], from_grid [M, G]) on the MIDPOINT theta grid with
    Driscoll-Healy quadrature weights — the e3nn ``s2_grid`` convention
    fairchem's SO3_Grid is built on (theta_j = pi(2j+1)/(2 n_theta),
    uniform phi). Exact for band-limited (<= lmax) signals like the
    Gauss-Legendre tables (verified to 1e-15 in tests); used for the
    per-edge S2 activation so converted fairchem checkpoints see the same
    grid nodes their weights were trained through."""
    j = np.arange(n_theta)
    theta = np.pi * (2 * j + 1) / (2.0 * n_theta)
    b = n_theta // 2
    k = np.arange(b)
    w = np.array([(2.0 / b) * np.sin(t)
                  * np.sum(np.sin((2 * k + 1) * t) / (2 * k + 1))
                  for t in theta])
    phi = np.arange(n_phi) * (2.0 * np.pi / n_phi)
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    xyz = np.stack([np.sin(tt) * np.cos(pp),
                    np.sin(tt) * np.sin(pp),
                    np.cos(tt)], axis=-1).reshape(-1, 3)
    Y = real_sph_harm(lmax, xyz)                      # [G, M]
    wq = np.repeat(w, n_phi) * (2.0 * np.pi / n_phi)  # [G]
    return Y, (Y * wq[:, None]).T
