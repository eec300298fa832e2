import jax.numpy as jnp
import numpy as np
import pytest

from pdb2reaction_tpu.constants import ANG2BOHR, BOHR2ANG
from pdb2reaction_tpu.core.structure import Structure
from pdb2reaction_tpu.mlip.calculator import Calculator
from pdb2reaction_tpu.mlip import potentials
from pdb2reaction_tpu.engines.lbfgs import lbfgs_minimize


def minimize(st, pot=None, **kw):
    calc = Calculator(st, pot or potentials.make_morse())
    fn = calc.au_energy_force_fn()
    x0 = calc.pad_bohr(st.coords_bohr)
    res = lbfgs_minimize(fn, x0, calc.system.free_mask, **kw)
    return calc, res


def test_h2_bond_length():
    st = Structure.from_symbols(["H", "H"], [[0, 0, 0], [0.9, 0, 0]])
    calc, res = minimize(st, thresh="gau_tight", max_cycles=200)
    assert bool(res.converged)
    x = calc.unpad(res.x) * BOHR2ANG
    d = np.linalg.norm(x[1] - x[0])
    # Morse well minimum at r_cov sum = 0.64 Ang
    assert d == pytest.approx(0.64, abs=1e-4)


def test_water_morse_converges():
    st = Structure.from_symbols(
        ["O", "H", "H"],
        [[0.0, 0.0, 0.0], [1.1, 0.1, 0.0], [-0.3, 1.05, 0.0]])
    calc, res = minimize(st, thresh="gau", max_cycles=500)
    assert bool(res.converged)
    f = np.asarray(res.f)
    assert np.abs(f).max() < 4.5e-4
    assert int(res.cycles) < 500


def test_frozen_atom_fixed():
    st = Structure.from_symbols(["H", "H"], [[0, 0, 0], [1.4, 0, 0]],
                                freeze=[0])
    calc, res = minimize(st, thresh="gau_tight", max_cycles=200)
    x = calc.unpad(res.x) * BOHR2ANG
    np.testing.assert_allclose(x[0], [0, 0, 0], atol=1e-12)
    assert np.linalg.norm(x[1] - x[0]) == pytest.approx(0.64, abs=1e-3)


def test_lj_cluster():
    # 4-atom LJ cluster -> tetrahedron with pair distance ~ 2^(1/6) sigma
    rng = np.random.default_rng(0)
    sigma = 2.5
    coords = rng.normal(scale=0.3, size=(4, 3)) + np.array(
        [[0, 0, 0], [2.6, 0, 0], [1.3, 2.3, 0], [1.3, 0.8, 2.2]])
    st = Structure.from_symbols(["Ar"] * 4, coords)
    calc, res = minimize(st, pot=potentials.make_lj(sigma=sigma),
                         thresh="gau_tight", max_cycles=2000)
    assert bool(res.converged)
    x = calc.unpad(res.x) * BOHR2ANG
    dists = [np.linalg.norm(x[i] - x[j]) for i in range(4) for j in range(i)]
    np.testing.assert_allclose(dists, 2 ** (1 / 6) * sigma, rtol=2e-3)


def test_never_preset_runs_out():
    st = Structure.from_symbols(["H", "H"], [[0, 0, 0], [0.9, 0, 0]])
    calc, res = minimize(st, thresh="never", max_cycles=25)
    assert not bool(res.converged)
    assert int(res.cycles) == 25
