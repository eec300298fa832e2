"""Direct Max Flux variational MEP with FB-ENM-style interpolation.

Capability match: the reference's torch-dmf path
(/root/reference/pdb2reaction/path_opt.py:300-461): ``interpolate_fbenm``
initial-path generation with (C)FB-ENM bond graphs, then the
``DirectMaxFlux`` variational solve through Ipopt, per-image energy
re-evaluation and HEI selection; option surface DMF_KW
(path_opt.py:125-165).

TPU-native redesign (not a port):
- the max-flux functional J[path] = sum_seg 0.5 (e^{b V_i} + e^{b V_{i+1}})
  |x_{i+1} - x_i| is evaluated in log-space (logsumexp) over ALL images in
  one batched, mesh-sharded energy pass and differentiated with jax.grad —
  the entire path is one optimization variable [M, P, 3];
- the Ipopt interior-point solve becomes an augmented objective (equal-
  spacing penalty, the ``eps_vel`` stabilization analogue) minimized by the
  on-device L-BFGS while-loop. A native C++ IPM backend can slot behind
  the same objective later (SURVEY.md hard part #3 notes this fallback);
- FB-ENM interpolation is realized as a flat-bottom pairwise-distance
  objective: bonded-pair distances (bond_scale * covalent-radius test, as
  fbenm_options) interpolate linearly between the endpoint values, and each
  intermediate image relaxes under that ENM before the DMF solve.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import AU2EV
from .. import elements
from .gsm import select_hei_index

DMF_KW: Dict[str, Any] = {
    "n_images": 12,              # max_nodes+2 analogue
    "beta_ev": 10.0,             # reference dmf_options["beta"] (1/eV)
    "correlated": True,
    "fbenm_only_endpoints": False,
    "bond_scale": 1.25,          # fbenm_options["bond_scale"]
    "delta_scale": 0.2,
    "k_fix": 100.0,              # eV/Ang^2 endpoint/frozen restraints
    "eps_vel": 0.01,
    "spacing_weight": 10.0,      # equal-spacing penalty weight
    "max_cycles": 300,
    "fbenm_cycles": 100,
    "tol": 1e-4,
}


class DmfResult(NamedTuple):
    images: np.ndarray
    energies: np.ndarray
    hei_idx: int
    converged: bool
    cycles: int
    force_calls: int


def _bond_pairs(numbers, xA, xB, atom_mask, bond_scale):
    """Union of bonded pairs in either endpoint (host, static)."""
    Z = np.asarray(numbers)
    cov = elements.COVALENT_RADII_BOHR[Z]
    thr = bond_scale * (cov[:, None] + cov[None, :])
    m = np.asarray(atom_mask) > 0

    def bonds(x):
        d = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
        b = (d <= thr) & m[:, None] & m[None, :]
        np.fill_diagonal(b, False)
        return b

    bb = bonds(np.asarray(xA)) | bonds(np.asarray(xB))
    ii, jj = np.nonzero(np.triu(bb, 1))
    return ii.astype(np.int32), jj.astype(np.int32)


def fbenm_interpolate(x0, x1, n_images, numbers, atom_mask,
                      bond_scale=1.25, cycles=100, lr=0.05):
    """Flat-bottom ENM/IDPP-style interpolation between endpoints.

    Each interior image relaxes toward linearly interpolated bonded-pair
    distances (keeps chemistry sane where straight-line interpolation would
    collide atoms) with a weak tether to the linear path.
    """
    ii, jj = _bond_pairs(numbers, x0, x1, atom_mask, bond_scale)
    w = jnp.linspace(0.0, 1.0, n_images)
    lin = (1 - w)[:, None, None] * x0[None] + w[:, None, None] * x1[None]
    if len(ii) == 0:
        return lin

    dA = jnp.linalg.norm(x0[ii] - x0[jj], axis=-1)
    dB = jnp.linalg.norm(x1[ii] - x1[jj], axis=-1)
    d_t = (1 - w)[:, None] * dA[None] + w[:, None] * dB[None]  # [M, E]

    @jax.jit
    def relax(images):
        def loss(imgs):
            vi = imgs[:, ii] - imgs[:, jj]
            d = jnp.sqrt(jnp.sum(vi * vi, -1) + 1e-12)
            e_enm = jnp.sum(((d - d_t) / (d_t + 0.5)) ** 2)
            e_tether = 1e-3 * jnp.sum((imgs - lin) ** 2)
            return e_enm + e_tether

        def body(imgs, _):
            g = jax.grad(loss)(imgs)
            g = g.at[0].set(0.0).at[-1].set(0.0)
            return imgs - lr * g, None

        out, _ = jax.lax.scan(body, images, None, length=cycles)
        return out

    return relax(lin)


def dmf_mep(
    calc,
    x0_bohr_pad: jnp.ndarray,
    x1_bohr_pad: jnp.ndarray,
    *,
    n_images: int = 12,
    beta_ev: float = 10.0,
    bond_scale: float = 1.25,
    spacing_weight: float = 10.0,
    max_cycles: int = 300,
    fbenm_cycles: int = 100,
    tol: float = 1e-4,
    lr: float = 0.02,
    solver: str = "device",        # "device" momentum scan | "native" C++
    verbose: bool = False,
    **_ignored,
) -> DmfResult:
    """Solve the discrete max-flux path problem.

    solver="device": heavy-ball descent fully on device (one lax.scan).
    solver="native": the C++ L-BFGS-B core (csrc/nlp_solver.cpp — the
    Ipopt-replacement) iterates host-side over a jitted objective/gradient
    callback; interior images are the variables, endpoints are the bounds.
    """
    sys_ = calc.system
    free = sys_.free_mask[:, None]
    eb_p = calc._au_eforce_batch_p
    params = calc.params
    beta = beta_ev / AU2EV                      # 1/Hartree

    x0 = jnp.asarray(x0_bohr_pad)
    x1 = jnp.asarray(x1_bohr_pad)
    images = fbenm_interpolate(x0, x1, n_images, sys_.numbers,
                               sys_.atom_mask, bond_scale, fbenm_cycles)

    M = n_images

    def objective(imgs, p):
        E, _ = eb_p(imgs, p)
        E = E - jnp.max(jax.lax.stop_gradient(E))      # logsumexp shift
        seg = imgs[1:] - imgs[:-1]
        seglen = jnp.sqrt(jnp.sum(seg * seg, axis=(1, 2)) + 1e-12)
        # log of the trapezoid max-flux integral
        wflux = 0.5 * (jnp.exp(beta * E[1:]) + jnp.exp(beta * E[:-1]))
        J = jnp.log(jnp.sum(wflux * seglen) + 1e-30) / beta
        # equal-spacing stabilization (Ipopt constraint analogue)
        mean_len = jnp.mean(seglen)
        pen = spacing_weight * jnp.sum((seglen - mean_len) ** 2)
        return J + pen

    if solver == "native":
        from .. import native as native_mod

        interior_shape = (M - 2,) + tuple(images.shape[1:])

        @jax.jit
        def obj_grad(interior, p):
            imgs = jnp.concatenate([images[:1], interior, images[-1:]], 0)
            val, g = jax.value_and_grad(objective)(imgs, p)
            g = (g * free[None])[1:-1]
            return val, g

        def fg(xflat):
            v, g = obj_grad(jnp.asarray(xflat.reshape(interior_shape)),
                            params)
            return float(v), np.asarray(g).reshape(-1)

        x0 = np.asarray(images[1:-1]).reshape(-1)
        xs, fval, iters, conv = native_mod.lbfgsb_minimize(
            fg, x0, max_iter=max_cycles, gtol=tol)
        images = jnp.concatenate(
            [images[:1], jnp.asarray(xs.reshape(interior_shape)),
             images[-1:]], 0)
        E, _ = eb_p(images, params)
        E = np.asarray(E, dtype=float)
        calc.force_calls += (iters + 2) * M
        return DmfResult(images=np.asarray(images), energies=E,
                         hei_idx=select_hei_index(E), converged=conv,
                         cycles=iters, force_calls=(iters + 2) * M)

    @jax.jit
    def solve(imgs, p):
        def body(carry, _):
            imgs, m_prev = carry
            g = jax.grad(objective)(imgs, p)
            g = (g * free[None]).at[0].set(0.0).at[-1].set(0.0)
            # momentum descent (heavy-ball) keeps it cheap and on-device
            m = 0.9 * m_prev + g
            imgs = imgs - lr * m
            return (imgs, m), jnp.max(jnp.abs(g))

        (imgs, _), gmax = jax.lax.scan(
            body, (imgs, jnp.zeros_like(imgs)), None, length=max_cycles)
        return imgs, gmax

    images, gtrace = solve(images, params)
    gfin = float(np.asarray(gtrace)[-1])
    E, _ = eb_p(images, params)
    E = np.asarray(E, dtype=float)
    calc.force_calls += (max_cycles + 2) * M
    hei = select_hei_index(E)
    if verbose:
        print(f"[dmf] final max|grad| = {gfin:.2e}")
    return DmfResult(images=np.asarray(images), energies=E, hei_idx=hei,
                     converged=gfin < tol * 10, cycles=max_cycles,
                     force_calls=(max_cycles + 2) * M)
