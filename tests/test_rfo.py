import jax.numpy as jnp
import numpy as np
import pytest

from pdb2reaction_tpu.constants import BOHR2ANG
from pdb2reaction_tpu.core.structure import Structure
from pdb2reaction_tpu.mlip.calculator import Calculator
from pdb2reaction_tpu.mlip import potentials
from pdb2reaction_tpu.engines.rfo import rfo_optimize
from pdb2reaction_tpu.engines.bias import (
    make_biased_energy_fn, bias_params)


def setup(st, pot=None, **calc_kw):
    calc = Calculator(st, pot or potentials.make_morse(), **calc_kw)
    fn = calc.au_energy_force_fn()
    x0 = calc.pad_bohr(st.coords_bohr)
    return calc, fn, x0


def test_rfo_minimize_water():
    st = Structure.from_symbols(
        ["O", "H", "H"],
        [[0.0, 0.0, 0.0], [1.1, 0.1, 0.0], [-0.3, 1.05, 0.0]])
    calc, fn, x0 = setup(st)
    H0 = calc.get_hessian(st.coords_bohr.reshape(-1))["hessian"]
    res = rfo_optimize(fn, x0, calc.system.free_mask, calc.n_atoms,
                       hessian0=H0, thresh="gau", max_cycles=200)
    assert res.converged
    f = np.asarray(res.f)
    assert np.abs(f).max() < 4.5e-4
    # RFO should be fast with exact H0
    assert res.cycles < 60


def test_rfo_ts_mode_double_well():
    # 3 collinear H atoms with outer two frozen: middle atom sits in a
    # double-well; TS is the symmetric midpoint.
    L = 2.4  # Ang separation of frozen endpoints (Morse re = 0.64)
    # start near (not at) the barrier, like a HEI guess from a path search
    st = Structure.from_symbols(
        ["H", "H", "H"],
        [[0, 0, 0], [1.05, 0.0, 0.0], [L, 0, 0]],
        freeze=[0, 2])
    calc, fn, x0 = setup(st)
    H0 = calc.get_hessian(st.coords_bohr.reshape(-1))["hessian"]
    res = rfo_optimize(fn, x0, calc.system.free_mask, calc.n_atoms,
                       hessian0=H0, mode="ts", roots=[0], thresh="baker",
                       hessian_update="bofill", max_cycles=300)
    assert res.converged
    x = np.asarray(res.x)[:3] * BOHR2ANG
    # TS at the midpoint
    assert x[1, 0] == pytest.approx(L / 2, abs=1e-3)
    # Hessian at TS has exactly one negative eigenvalue in the free block
    Hts = calc.get_hessian((np.asarray(res.x)[:3] / 1.0).reshape(-1))
    calc2 = Calculator(st, potentials.make_morse(),
                       return_partial_hessian=True)
    Hblk = calc2.get_hessian(np.asarray(res.x)[:3].reshape(-1))["hessian"]
    w = np.linalg.eigvalsh(Hblk)
    assert (w < -1e-6).sum() == 1


def test_biased_calculator_shifts_minimum():
    st = Structure.from_symbols(["H", "H"], [[0, 0, 0], [0.9, 0, 0]])
    target = 1.2  # Ang, away from the 0.64 Morse minimum
    fn_biased = make_biased_energy_fn(potentials.make_morse(), [(0, 1)])
    calc = Calculator(st, fn_biased,
                      params=bias_params([target], 20.0))
    from pdb2reaction_tpu.engines.lbfgs import lbfgs_minimize
    res = lbfgs_minimize(calc.au_energy_force_fn(),
                         calc.pad_bohr(st.coords_bohr),
                         calc.system.free_mask,
                         thresh="gau_tight", max_cycles=300)
    x = calc.unpad(res.x) * BOHR2ANG
    d = np.linalg.norm(x[1] - x[0])
    # restrained minimum lies between the free minimum and the target
    assert 0.64 < d < target
    # stronger k pulls closer to target (no recompilation: params swap)
    calc.params = bias_params([target], 500.0)
    res2 = lbfgs_minimize(calc.au_energy_force_fn(),
                          calc.pad_bohr(st.coords_bohr),
                          calc.system.free_mask,
                          thresh="gau_tight", max_cycles=300)
    x2 = calc.unpad(res2.x) * BOHR2ANG
    d2 = np.linalg.norm(x2[1] - x2[0])
    assert abs(d2 - target) < abs(d - target)


def test_rfo_gdiis_on_device_accelerates():
    """The device GDIIS endgame converges at least as fast as plain RFO on
    a quadratic-ish landscape and reaches the same minimum."""
    st = Structure.from_symbols(
        ["O", "H", "H"],
        [[0.0, 0.0, 0.0], [1.15, 0.12, 0.0], [-0.35, 1.02, 0.05]])
    calc, fn, x0 = setup(st)
    H0 = calc.get_hessian(st.coords_bohr.reshape(-1))["hessian"]
    res_g = rfo_optimize(fn, x0, calc.system.free_mask, calc.n_atoms,
                         hessian0=H0, thresh="gau_tight", max_cycles=400,
                         gdiis=True)
    res_p = rfo_optimize(fn, x0, calc.system.free_mask, calc.n_atoms,
                         hessian0=H0, thresh="gau_tight", max_cycles=400,
                         gdiis=False)
    assert res_g.converged and res_p.converged
    assert res_g.e == pytest.approx(res_p.e, abs=1e-8)
    assert res_g.cycles <= res_p.cycles + 2
