"""Covalent bond-change detection between two geometries.

Capability match: /root/reference/pdb2reaction/bond_changes.py:142-231 —
cutoff ``bond_factor * (r_cov_i + r_cov_j)`` with a margin fraction and a
minimum-distance-change gate; distances in Bohr (pysisyphus covalent radii
are consumed in Bohr there). One jitted device program replaces the torch
``cdist`` pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import elements
from ..constants import BOHR2ANG

Pair = Tuple[int, int]


@dataclass
class BondChangeResult:
    formed_covalent: Set[Pair]
    broken_covalent: Set[Pair]
    distances_1: Optional[np.ndarray] = None
    distances_2: Optional[np.ndarray] = None

    @property
    def any_change(self) -> bool:
        return bool(self.formed_covalent or self.broken_covalent)


@jax.jit
def _bond_masks(R1, R2, cov, bond_factor, margin_fraction, delta_fraction):
    def dists(R):
        d = R[:, None, :] - R[None, :, :]
        return jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1), 1e-24))

    D1, D2 = dists(R1), dists(R2)
    T = bond_factor * (cov[:, None] + cov[None, :])
    eps = margin_fraction * T
    N = R1.shape[0]
    up = jnp.triu(jnp.ones((N, N), dtype=bool), k=1)
    A1 = (D1 <= (T - eps)) & up
    A2 = (D2 <= (T - eps)) & up
    need = (jnp.abs(D2 - D1) >= delta_fraction * T) & up
    formed = (~A1) & A2 & need
    broken = A1 & (~A2) & need
    return formed, broken, D1, D2


def compare_structures(
    numbers: Sequence[int],
    coords1_bohr,
    coords2_bohr,
    *,
    bond_factor: float = 1.20,
    margin_fraction: float = 0.05,
    delta_fraction: float = 0.05,
) -> BondChangeResult:
    Z = np.asarray(numbers, dtype=int)
    cov = elements.covalent_radii_of(Z, unit="bohr")
    R1 = jnp.asarray(np.asarray(coords1_bohr, dtype=np.float64).reshape(-1, 3))
    R2 = jnp.asarray(np.asarray(coords2_bohr, dtype=np.float64).reshape(-1, 3))
    assert R1.shape == R2.shape and R1.shape[0] == Z.size
    formed, broken, D1, D2 = _bond_masks(
        R1, R2, jnp.asarray(cov), bond_factor, margin_fraction, delta_fraction)
    f = set(map(tuple, np.argwhere(np.asarray(formed))))
    b = set(map(tuple, np.argwhere(np.asarray(broken))))
    return BondChangeResult(
        formed_covalent={(int(i), int(j)) for i, j in f},
        broken_covalent={(int(i), int(j)) for i, j in b},
        distances_1=np.asarray(D1), distances_2=np.asarray(D2))


def summarize_changes(numbers: Sequence[int], result: BondChangeResult,
                      one_based: bool = True) -> str:
    """Human-readable formed/broken bond report with Angstrom lengths
    (bond_changes.py:196-231 format)."""
    syms = elements.symbols_from_numbers(np.asarray(numbers, int))

    def tag(i):
        return f"{syms[i]}{i + 1 if one_based else i}"

    lines: List[str] = []
    if result.formed_covalent:
        lines.append("Covalent bonds formed:")
        for i, j in sorted(result.formed_covalent):
            d1 = result.distances_1[i, j] * BOHR2ANG
            d2 = result.distances_2[i, j] * BOHR2ANG
            lines.append(f"  {tag(i)}-{tag(j)}: {d1:.3f} Å → {d2:.3f} Å")
    if result.broken_covalent:
        lines.append("Covalent bonds broken:")
        for i, j in sorted(result.broken_covalent):
            d1 = result.distances_1[i, j] * BOHR2ANG
            d2 = result.distances_2[i, j] * BOHR2ANG
            lines.append(f"  {tag(i)}-{tag(j)}: {d1:.3f} Å → {d2:.3f} Å")
    if not lines:
        lines.append("No covalent bond changes detected.")
    return "\n".join(lines)
