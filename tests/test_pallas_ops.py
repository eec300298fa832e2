"""Radial-contraction primitive + pallas-mode model algebra.

On CPU these run the jnp reference implementation (the Pallas kernel
dispatches by backend); the kernel itself is verified against the same
reference on the real TPU (see mlip/pallas_ops.py docstring + the TPU
drive logs).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdb2reaction_tpu.core.structure import Structure, pad_to
from pdb2reaction_tpu.mlip.model import (CONFIGS, ModelConfig, make_model)
from pdb2reaction_tpu.mlip.pallas_ops import radial_contract_reference


def test_radial_contract_reference_matches_einsum():
    rng = np.random.default_rng(0)
    P, F, R = 24, 8, 4
    coords = jnp.asarray(rng.uniform(0, 8, (P, 3)), jnp.float32)
    mask = jnp.asarray((rng.uniform(size=P) > 0.2).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(P, F)), jnp.float32)
    T = radial_contract_reference(coords, mask, feats, 5.0, R)
    # brute-force
    from pdb2reaction_tpu.mlip.radial import cosine_envelope, bessel_basis
    out = np.zeros((P, R + 1, F))
    c = np.asarray(coords)
    m = np.asarray(mask)
    for i in range(P):
        for j in range(P):
            if i == j or m[i] == 0 or m[j] == 0:
                continue
            d = np.linalg.norm(c[i] - c[j])
            if d > 5.0:
                continue
            env = 0.5 * (np.cos(np.pi * d / 5.0) + 1.0)
            for r in range(R):
                b = np.sqrt(2 / 5.0) * np.sin((r + 1) * np.pi * d / 5.0) / d
                out[i, r] += b * env * np.asarray(feats)[j]
            out[i, R] += env * np.asarray(feats)[j]
    np.testing.assert_allclose(np.asarray(T), out, atol=1e-4)


def test_pallas_mode_matches_dense_mode():
    """mp_mode='pallas' algebra (stream splits, div_d trick) must equal the
    dense einsum formulation exactly."""
    st = Structure.from_symbols(
        ["O", "H", "H", "C", "N"],
        [[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0],
         [1.8, 1.1, 0.4], [-1.2, -0.8, 0.7]])
    sys_ = pad_to(st, n_pad=8)
    cfg_d = dataclasses.replace(CONFIGS["small"], mp_mode="dense",
                                dtype=jnp.float32)
    cfg_p = dataclasses.replace(cfg_d, mp_mode="pallas")
    fn_d, params, _ = make_model(cfg_d, seed=3)
    fn_p, _, _ = make_model(cfg_p, seed=3)
    coords = jnp.asarray(np.asarray(sys_.coords), jnp.float32)
    e_d = float(fn_d(coords, sys_, params))
    e_p = float(fn_p(coords, sys_, params))
    assert e_p == pytest.approx(e_d, rel=1e-4, abs=1e-4)
    g_d = jax.grad(lambda c: fn_d(c, sys_, params))(coords)
    g_p = jax.grad(lambda c: fn_p(c, sys_, params))(coords)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_d),
                               atol=5e-4)
