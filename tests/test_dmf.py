import numpy as np
import pytest

from pdb2reaction_tpu.constants import BOHR2ANG, ANG2BOHR, AU2KCALPERMOL
from pdb2reaction_tpu.core.structure import Structure
from pdb2reaction_tpu.mlip.calculator import Calculator
from pdb2reaction_tpu.mlip import potentials
from pdb2reaction_tpu.engines.dmf import dmf_mep, fbenm_interpolate

L = 2.4


def test_fbenm_interpolation_monotone():
    stA = Structure.from_symbols(
        ["H", "H", "H"], [[0, 0, 0], [0.686, 0, 0], [L, 0, 0]],
        freeze=[0, 2])
    calc = Calculator(stA, potentials.make_morse())
    x0 = calc.pad_bohr(stA.coords_bohr)
    xB = np.array([[0, 0, 0], [L - 0.686, 0, 0], [L, 0, 0]]) * ANG2BOHR
    x1 = calc.pad_bohr(xB)
    imgs = np.asarray(fbenm_interpolate(
        x0, x1, 8, calc.system.numbers, calc.system.atom_mask))
    assert imgs.shape[0] == 8
    np.testing.assert_allclose(imgs[0], np.asarray(x0), atol=1e-10)
    np.testing.assert_allclose(imgs[-1], np.asarray(x1), atol=1e-10)
    xs = imgs[:, 1, 0]
    assert np.all(np.diff(xs) > 0)  # middle atom moves monotonically


def test_dmf_double_well_barrier():
    stA = Structure.from_symbols(
        ["H", "H", "H"], [[0, 0, 0], [0.686, 0, 0], [L, 0, 0]],
        freeze=[0, 2])
    calc = Calculator(stA, potentials.make_morse())
    xB = np.array([[0, 0, 0], [L - 0.686, 0, 0], [L, 0, 0]]) * ANG2BOHR
    res = dmf_mep(calc, calc.pad_bohr(stA.coords_bohr), calc.pad_bohr(xB),
                  n_images=10, max_cycles=400)
    E = res.energies
    hei = res.hei_idx
    assert 0 < hei < len(E) - 1
    x_hei = res.images[hei][1, 0] * BOHR2ANG
    assert x_hei == pytest.approx(L / 2, abs=0.12)
    barrier = (E[hei] - E[0]) * AU2KCALPERMOL
    assert barrier == pytest.approx(11.1, abs=1.5)


def test_dmf_path_quality_vs_tight_gsm():
    """The augmented-Lagrangian DMF must match a tightly-converged GSM on
    barrier height, and satisfy the equal-spacing EQUALITY constraints to
    reported feasibility (the Ipopt-constraint semantics, not a soft
    penalty)."""
    from pdb2reaction_tpu.engines.gsm import gsm_mep

    L = 2.4
    stA = Structure.from_symbols(
        ["H", "H", "H"], [[0, 0, 0], [0.686, 0, 0], [L, 0, 0]],
        freeze=[0, 2])
    calc = Calculator(stA, potentials.make_morse())
    xB = np.array([[0, 0, 0], [L - 0.686, 0, 0], [L, 0, 0]]) * ANG2BOHR

    gs = gsm_mep(calc.au_energy_force_batch_fn(),
                 calc.pad_bohr(stA.coords_bohr), calc.pad_bohr(xB),
                 calc.system.free_mask, max_nodes=10, max_cycles=500,
                 conv_perp_rms=1e-5, climb=True,
                 hvp_fn=calc.au_hvp_fn())
    dm = dmf_mep(calc, calc.pad_bohr(stA.coords_bohr), calc.pad_bohr(xB),
                 n_images=12, max_cycles=600)

    e_ts_gsm = gs.energies[gs.hei_idx] - gs.energies[0]
    e_ts_dmf = dm.energies[dm.hei_idx] - dm.energies[0]
    # barrier agreement within 0.5 kcal/mol (~8e-4 Ha)
    assert abs(e_ts_gsm - e_ts_dmf) < 8e-4, (e_ts_gsm, e_ts_dmf)
    # equal-spacing feasibility: max |seglen - mean| under 5% of mean
    seg = dm.images[1:] - dm.images[:-1]
    seglen = np.sqrt((seg ** 2).sum(axis=(1, 2)))
    assert dm.constraint_violation < 0.05 * seglen.mean(), (
        dm.constraint_violation, seglen.mean())
