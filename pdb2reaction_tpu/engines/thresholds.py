"""Convergence threshold presets and the convergence test.

Preset values reproduce the reference's comparability contract exactly
(/root/reference/pdb2reaction/opt.py:176-187): forces in Hartree/Bohr, steps
in Bohr. ``baker`` uses the composite rule
max|F| < 3e-4 AND (|dE| < 1e-6 OR max|step| < 3e-4)  (opt.py:187).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax.numpy as jnp


class Thresholds(NamedTuple):
    max_force: float
    rms_force: float
    max_step: float
    rms_step: float
    baker: bool = False
    never: bool = False


PRESETS: Dict[str, Thresholds] = {
    "gau_loose":  Thresholds(2.5e-3, 1.7e-3, 1.0e-2, 6.7e-3),
    "gau":        Thresholds(4.5e-4, 3.0e-4, 1.8e-3, 1.2e-3),
    "gau_tight":  Thresholds(1.5e-5, 1.0e-5, 6.0e-5, 4.0e-5),
    "gau_vtight": Thresholds(2.0e-6, 1.0e-6, 6.0e-6, 4.0e-6),
    "baker":      Thresholds(3.0e-4, jnp.inf, 3.0e-4, jnp.inf, baker=True),
    "never":      Thresholds(0.0, 0.0, 0.0, 0.0, never=True),
}


def get_thresholds(name: str) -> Thresholds:
    if name not in PRESETS:
        raise KeyError(f"Unknown threshold preset {name!r}; "
                       f"choose from {sorted(PRESETS)}")
    return PRESETS[name]


def converged(th: Thresholds, forces, step, dE, n_free_dof):
    """Jit-friendly convergence test over masked flat arrays.

    ``forces``/``step`` must already be zero on frozen/padded DOFs;
    ``n_free_dof`` normalizes the RMS values.
    """
    n = jnp.maximum(n_free_dof, 1)
    max_f = jnp.max(jnp.abs(forces))
    rms_f = jnp.sqrt(jnp.sum(forces * forces) / n)
    max_s = jnp.max(jnp.abs(step))
    rms_s = jnp.sqrt(jnp.sum(step * step) / n)
    if th.never:
        return jnp.array(False)
    if th.baker:
        return (max_f < th.max_force) & (
            (jnp.abs(dE) < 1.0e-6) | (max_s < th.max_step))
    return ((max_f < th.max_force) & (rms_f < th.rms_force)
            & (max_s < th.max_step) & (rms_s < th.rms_step))
