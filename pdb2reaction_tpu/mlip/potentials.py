"""Cheap analytic potentials implementing the padded ``energy_fn`` protocol.

These are the framework's deterministic test backends (the reference has no
tests at all — SURVEY.md §4 — so orchestration here is validated against
closed-form PES instead of the GNN, per the test strategy in SURVEY.md §4(d)).
All return eV given Angstrom coordinates.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp

from ..core.structure import PaddedSystem
from ..core.neighbors import pairwise_distances
from .. import elements


def _pair_mask(system: PaddedSystem):
    m = system.atom_mask
    P = m.shape[0]
    pair = (m[:, None] * m[None, :]) * (1.0 - jnp.eye(P))
    return pair


def lennard_jones(coords, system: PaddedSystem, epsilon: float = 0.1,
                  sigma: float = 2.5) -> jnp.ndarray:
    """Simple homogeneous LJ fluid; eps in eV, sigma in Angstrom."""
    d = pairwise_distances(coords)
    pair = _pair_mask(system)
    d_safe = jnp.where(pair > 0, d, 1e3)
    sr6 = (sigma / d_safe) ** 6
    e = 4.0 * epsilon * (sr6 * sr6 - sr6)
    return 0.5 * jnp.sum(e * pair)


def morse(coords, system: PaddedSystem, De: float = 4.0, a: float = 2.0,
          re_scale: float = 1.0) -> jnp.ndarray:
    """Pairwise Morse with equilibrium distance from covalent radii sums.

    A chemically-shaped surrogate PES: bonded wells at r_cov_i + r_cov_j, so
    bond formation/breaking, TSs and reaction paths all exist. De in eV,
    a in 1/Angstrom.
    """
    radii = jnp.asarray(elements.COVALENT_RADII_ANG)[system.numbers]
    re = (radii[:, None] + radii[None, :]) * re_scale
    d = pairwise_distances(coords)
    pair = _pair_mask(system)
    d_safe = jnp.where(pair > 0, d, re + 50.0)
    x = jnp.exp(-a * (d_safe - re))
    # pure Morse; the exponential tail is already short-ranged, and a hard
    # cutoff would put force discontinuities in every optimizer test
    e = De * (x * x - 2.0 * x)
    return 0.5 * jnp.sum(e * pair)


def harmonic_wells(coords, system: PaddedSystem, centers, k: float = 5.0):
    """Each atom tethered to a center: E = 0.5 k sum |r - c|^2 (eV, Ang)."""
    d = coords - centers
    return 0.5 * k * jnp.sum(jnp.sum(d * d, axis=-1) * system.atom_mask)


def make_lj(epsilon: float = 0.1, sigma: float = 2.5):
    return partial(lennard_jones, epsilon=epsilon, sigma=sigma)


def make_morse(De: float = 4.0, a: float = 2.0, re_scale: float = 1.0):
    return partial(morse, De=De, a=a, re_scale=re_scale)
