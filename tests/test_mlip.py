import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdb2reaction_tpu.core.structure import Structure, pad_to
from pdb2reaction_tpu.mlip.model import make_model, CONFIGS
from pdb2reaction_tpu.mlip.calculator import Calculator


@pytest.fixture(scope="module")
def water():
    return Structure.from_symbols(
        ["O", "H", "H"],
        [[0.0, 0.0, 0.0], [0.96, 0.0, 0.0], [-0.24, 0.93, 0.0]])


@pytest.fixture(scope="module")
def model():
    return make_model("small", seed=0)


def _energy(model, st, n_pad=8):
    fn, params, cfg = model
    sys_ = pad_to(st, n_pad=n_pad)
    return float(fn(sys_.coords, sys_, params))


def test_padding_invariance(water, model):
    e8 = _energy(model, water, n_pad=8)
    e16 = _energy(model, water, n_pad=16)
    assert e8 == pytest.approx(e16, abs=1e-5)


def test_translation_invariance(water, model):
    e0 = _energy(model, water)
    st2 = water.copy(coords=water.coords + np.array([5.0, -3.0, 2.0]))
    assert _energy(model, st2) == pytest.approx(e0, abs=1e-5)


def test_rotation_invariance(water, model):
    e0 = _energy(model, water)
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0],
                  [0, 0, 1.0]])
    st2 = water.copy(coords=water.coords @ R.T)
    assert _energy(model, st2) == pytest.approx(e0, abs=1e-4)


def test_permutation_invariance(model):
    st1 = Structure.from_symbols(["O", "H", "H"],
                                 [[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]])
    st2 = Structure.from_symbols(["H", "O", "H"],
                                 [[0.96, 0, 0], [0, 0, 0], [-0.24, 0.93, 0]])
    assert _energy(model, st1) == pytest.approx(_energy(model, st2), abs=1e-5)


def test_forces_match_fd(water, model):
    fn, params, cfg = model
    calc = Calculator(water, fn, params=params)
    x0 = water.coords_bohr.reshape(-1)
    res = calc.get_forces(x0)
    eps = 2e-4
    for k in [0, 4, 8]:
        xp = x0.copy(); xp[k] += eps
        xm = x0.copy(); xm[k] -= eps
        fd = -(calc.get_energy(xp)["energy"]
               - calc.get_energy(xm)["energy"]) / (2 * eps)
        assert res["forces"][k] == pytest.approx(fd, abs=5e-5)


def test_charge_spin_conditioning(water):
    fn0, p0, _ = make_model("small", seed=0, charge=0, spin=1)
    fn1, p1, _ = make_model("small", seed=0, charge=-1, spin=2)
    sys_ = pad_to(water)
    e0 = float(fn0(sys_.coords, sys_, p0))
    e1 = float(fn1(sys_.coords, sys_, p1))
    assert e0 != pytest.approx(e1, abs=1e-8)


def test_smooth_at_cutoff(model):
    """Energy must be continuous as an atom crosses the cutoff sphere."""
    fn, params, cfg = model
    es = []
    for d in [cfg.cutoff - 1e-3, cfg.cutoff - 1e-5, cfg.cutoff + 1e-5]:
        st = Structure.from_symbols(["H", "H"], [[0, 0, 0], [d, 0, 0]])
        sys_ = pad_to(st)
        es.append(float(fn(sys_.coords, sys_, params)))
    assert es[0] == pytest.approx(es[2], abs=1e-4)
    assert es[1] == pytest.approx(es[2], abs=1e-6)


def test_hessian_on_mlip(water, model):
    fn, params, cfg = model
    calc = Calculator(water, fn, params=params,
                      hessian_calc_mode="Analytical")
    H = calc.get_hessian(water.coords_bohr.reshape(-1))["hessian"]
    assert H.shape == (9, 9)
    np.testing.assert_allclose(H, H.T, atol=1e-7)
