"""Radial basis functions with smooth cutoff envelopes."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def cosine_envelope(d, cutoff):
    """Smooth cutoff: 0.5*(cos(pi d/rc)+1) inside, 0 outside."""
    x = jnp.clip(d / cutoff, 0.0, 1.0)
    return jnp.where(x < 1.0, 0.5 * (jnp.cos(np.pi * x) + 1.0), 0.0)


def bessel_basis(d, cutoff, n: int):
    """Sinc-like spherical Bessel basis (DimeNet): sqrt(2/rc) sin(n pi d/rc)/d."""
    dn = jnp.maximum(d, 1e-8)
    freqs = jnp.arange(1, n + 1, dtype=d.dtype) * (np.pi / cutoff)
    return (np.sqrt(2.0 / cutoff) * jnp.sin(dn[..., None] * freqs)
            / dn[..., None])


def gaussian_basis(d, cutoff, n: int, width_scale: float = 1.0):
    centers = jnp.linspace(0.0, cutoff, n, dtype=d.dtype)
    width = width_scale * cutoff / n
    return jnp.exp(-((d[..., None] - centers) ** 2) / (2.0 * width * width))
