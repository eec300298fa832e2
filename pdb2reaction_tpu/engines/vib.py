"""Vibrational analysis: mass-weighting, TR projection, PHVA, frequencies.

Capability match: /root/reference/pdb2reaction/freq.py:122-366 —
``_frequencies_cm_and_modes`` semantics:

- full Hessian: mass-weight, project translations+rotations, eigh;
- PHVA (frozen atoms): reduce to the active DOF block, mass-weight with
  active masses, TR-project **in the active subspace** (freq.py:279-284),
  eigh, embed modes back to 3N with zeros on frozen DOFs;
- eigenvalues with |w^2| <= tol are dropped (freq.py:297);
- negative eigenvalues map to negative (imaginary) wavenumbers.

All dense algebra is one jitted device program (vs. the reference's
sequence of in-place GPU ops); mass-weighting uses amu so eigenvalues are
Hartree/(Bohr^2 amu) and convert via ``constants.NU_CM_FACTOR``.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import NU_CM_FACTOR
from .. import elements


class VibResult(NamedTuple):
    freqs_cm: np.ndarray       # [n_modes] signed wavenumbers
    modes_mw: np.ndarray       # [n_modes, 3N] mass-weighted eigenvectors
    modes_cart: np.ndarray     # [n_modes, N, 3] Cartesian displacements (normalized)


def tr_basis(coords_bohr: jnp.ndarray, masses_amu: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal mass-weighted translation+rotation basis [3N, k<=6].

    Built by SVD like the reference (freq.py:122-157): 3 translations and 3
    rotations about the center of mass, orthonormalized; rank-deficient
    (linear molecules) handled by singular-value screening.
    """
    N = coords_bohr.shape[0]
    sqm = jnp.sqrt(masses_amu)
    com = jnp.sum(coords_bohr * masses_amu[:, None], axis=0) / jnp.sum(masses_amu)
    x = coords_bohr - com
    vecs = []
    for k in range(3):
        t = jnp.zeros((N, 3)).at[:, k].set(1.0)
        vecs.append((t * sqm[:, None]).reshape(-1))
    # rotations: r x e_k
    for k in range(3):
        e = jnp.zeros(3).at[k].set(1.0)
        r = jnp.cross(x, jnp.broadcast_to(e, (N, 3)))
        vecs.append((r * sqm[:, None]).reshape(-1))
    B = jnp.stack(vecs, axis=1)                  # [3N, 6]
    U, S, _ = jnp.linalg.svd(B, full_matrices=False)
    keep = S > 1e-8 * jnp.maximum(S[0], 1e-30)
    # zero out the null columns instead of slicing (static shapes)
    return U * keep[None, :]


def _project_out(Hmw: jnp.ndarray, Q: jnp.ndarray) -> jnp.ndarray:
    P = jnp.eye(Hmw.shape[0]) - Q @ Q.T
    Hp = P @ Hmw @ P
    return 0.5 * (Hp + Hp.T)


@jax.jit
def _analyze(H_act, coords_act, masses_act):
    sqm = jnp.sqrt(jnp.repeat(masses_act, 3))
    Hmw = H_act / sqm[:, None] / sqm[None, :]
    Q = tr_basis(coords_act, masses_act)
    Hp = _project_out(Hmw, Q)
    w2, V = jnp.linalg.eigh(Hp)
    return w2, V


def frequencies_and_modes(
    H_au: np.ndarray,                  # (3N,3N) full or (3N_act,3N_act) block
    numbers: Sequence[int],
    coords_bohr: np.ndarray,           # (N,3) full geometry
    freeze_idx: Optional[Sequence[int]] = None,
    tol: float = 1e-6,
) -> VibResult:
    Z = np.asarray(numbers, dtype=int)
    N = Z.size
    masses = elements.masses_of(Z)
    coords = np.asarray(coords_bohr, dtype=np.float64).reshape(N, 3)

    freeze = sorted(set(int(i) for i in (freeze_idx or []) if 0 <= int(i) < N))
    active = [i for i in range(N) if i not in freeze]
    n_act = len(active)
    act_dof = np.repeat(np.isin(np.arange(N), active), 3)

    H = np.asarray(H_au, dtype=np.float64)
    if freeze:
        if H.shape[0] == 3 * N:
            H_act = H[np.ix_(act_dof, act_dof)]
        elif H.shape[0] == 3 * n_act:
            H_act = H
        else:
            raise ValueError(f"Hessian shape {H.shape} matches neither "
                             f"3N={3*N} nor 3N_act={3*n_act}")
        coords_act = coords[active]
        masses_act = masses[active]
    else:
        if H.shape[0] != 3 * N:
            raise ValueError(f"Hessian shape {H.shape} != 3N={3*N}")
        H_act = H
        coords_act = coords
        masses_act = masses

    w2, V = _analyze(jnp.asarray(H_act), jnp.asarray(coords_act),
                     jnp.asarray(masses_act))
    w2 = np.asarray(w2)
    V = np.asarray(V)

    sel = np.abs(w2) > tol
    w2 = w2[sel]
    V = V[:, sel]

    freqs = np.sign(w2) * np.sqrt(np.abs(w2)) * NU_CM_FACTOR

    # embed modes back to 3N
    modes_mw = np.zeros((V.shape[1], 3 * N))
    modes_mw[:, act_dof] = V.T

    # Cartesian displacements: unmass-weight and normalize
    sqm_full = np.sqrt(np.repeat(masses, 3))
    cart = modes_mw / sqm_full[None, :]
    norms = np.linalg.norm(cart, axis=1, keepdims=True)
    cart = cart / np.maximum(norms, 1e-30)
    return VibResult(freqs_cm=freqs, modes_mw=modes_mw,
                     modes_cart=cart.reshape(-1, N, 3))


def free_block_modes(H_au, numbers, freeze_idx):
    """Unprojected mass-weighted free-block eigenpairs — the fallback when
    the active space is too small for TR projection to leave any modes.

    Returns (eigvals in Ha/Bohr^2/amu, modes_mw [k, 3N] embedded)."""
    Z = np.asarray(numbers, dtype=int)
    N = Z.size
    masses = elements.masses_of(Z)
    sqm = np.sqrt(np.repeat(masses, 3))
    act = np.repeat(~np.isin(np.arange(N), list(freeze_idx or [])), 3)
    H = np.asarray(H_au)
    Hb = H[np.ix_(act, act)] if H.shape[0] == 3 * N else H
    Hmw = Hb / sqm[act][:, None] / sqm[act][None, :]
    w, V = np.linalg.eigh(Hmw)
    modes = np.zeros((V.shape[1], 3 * N))
    modes[:, act] = V.T
    return w, modes


def count_imaginary(freqs_cm: np.ndarray, thresh_cm: float = 5.0) -> int:
    """Number of imaginary modes below -thresh (tsopt.py neg_freq_thresh_cm)."""
    return int(np.sum(freqs_cm < -abs(thresh_cm)))


def mode_animation_frames(coords_ang: np.ndarray, mode_cart: np.ndarray,
                          amplitude_ang: float = 0.3,
                          n_frames: int = 20) -> List[np.ndarray]:
    """Displaced geometries along a normal mode for .trj animation
    (freq.py:406-480 behavior)."""
    phases = np.sin(np.linspace(0, 2 * np.pi, n_frames, endpoint=False))
    return [coords_ang + amplitude_ang * p * mode_cart for p in phases]
