import numpy as np
import pytest

from pdb2reaction_tpu.constants import ANG2BOHR, NU_CM_FACTOR
from pdb2reaction_tpu.core.structure import Structure
from pdb2reaction_tpu.mlip.calculator import Calculator
from pdb2reaction_tpu.mlip import potentials
from pdb2reaction_tpu.engines.vib import (
    frequencies_and_modes, count_imaginary, tr_basis)
from pdb2reaction_tpu.engines.thermo import thermochemistry
from pdb2reaction_tpu import elements


def test_diatomic_frequency_analytic():
    """H2 in a Morse well: nu = sqrt(k/mu)/(2 pi c), k = 2 De a^2."""
    De, a = 4.0, 2.0
    st = Structure.from_symbols(["H", "H"], [[0, 0, 0], [0.64, 0, 0]])
    calc = Calculator(st, potentials.make_morse(De=De, a=a))
    res = calc.get_hessian(st.coords_bohr.reshape(-1))
    vib = frequencies_and_modes(res["hessian"], st.numbers, st.coords_bohr)
    # one real stretch mode after TR projection (5 TR modes for linear)
    assert len(vib.freqs_cm) == 1
    # analytic: k = 2 De a^2 (eV/Ang^2) -> au; mu = m/2
    from pdb2reaction_tpu.constants import H_EVAA_2_AU
    k_au = 2 * De * a * a * H_EVAA_2_AU
    mu = elements.MASSES[1] / 2
    nu_expected = np.sqrt(k_au / mu) * NU_CM_FACTOR
    assert vib.freqs_cm[0] == pytest.approx(nu_expected, rel=1e-4)


def test_ts_imaginary_modes():
    """Free collinear H3 at the double-well barrier: the reaction coordinate
    (asymmetric-ish stretch of the middle atom) is imaginary."""
    L = 2.4
    st = Structure.from_symbols(
        ["H", "H", "H"], [[0, 0, 0], [L / 2, 0, 0], [L, 0, 0]])
    calc = Calculator(st, potentials.make_morse())
    H = calc.get_hessian(st.coords_bohr.reshape(-1))["hessian"]
    vib = frequencies_and_modes(H, st.numbers, st.coords_bohr)
    assert count_imaginary(vib.freqs_cm) == 2
    # most-imaginary mode: middle atom moving along x against the outers
    imode = vib.modes_cart[np.argmin(vib.freqs_cm)]
    assert abs(imode[1, 0]) > 0.8
    np.testing.assert_allclose(imode[:, 1:], 0.0, atol=1e-6)


def test_phva_single_active_atom_projected_empty():
    """With one active atom, the active-subspace TR projection removes all
    three DOFs — matching the reference's PHVA semantics
    (freq.py:279-284 projects TR computed from active coords/masses)."""
    L = 2.4
    st = Structure.from_symbols(
        ["H", "H", "H"], [[0, 0, 0], [L / 2, 0, 0], [L, 0, 0]],
        freeze=[0, 2])
    calc = Calculator(st, potentials.make_morse())
    H = calc.get_hessian(st.coords_bohr.reshape(-1))["hessian"]
    vib = frequencies_and_modes(H, st.numbers, st.coords_bohr,
                                freeze_idx=[0, 2])
    assert len(vib.freqs_cm) == 0


def test_phva_block_equals_full():
    """Active-block Hessian input gives the same frequencies as the full
    Hessian input (reference case A vs case B, freq.py:224-366)."""
    L = 2.4
    st = Structure.from_symbols(
        ["H", "H", "H"], [[0, 0, 0], [1.0, 0, 0], [L, 0, 0]],
        freeze=[0, 2])
    calc_full = Calculator(st, potentials.make_morse())
    calc_part = Calculator(st, potentials.make_morse(),
                           return_partial_hessian=True)
    x = st.coords_bohr.reshape(-1)
    Hf = calc_full.get_hessian(x)["hessian"]
    Hp = calc_part.get_hessian(x)["hessian"]
    vf = frequencies_and_modes(Hf, st.numbers, st.coords_bohr,
                               freeze_idx=[0, 2])
    vp = frequencies_and_modes(Hp, st.numbers, st.coords_bohr,
                               freeze_idx=[0, 2])
    np.testing.assert_allclose(vf.freqs_cm, vp.freqs_cm, atol=1e-8)


def test_tr_basis_orthonormal():
    import jax.numpy as jnp
    st = Structure.from_symbols(
        ["O", "H", "H"], [[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]])
    Q = np.asarray(tr_basis(jnp.asarray(st.coords_bohr),
                            jnp.asarray(st.masses)))
    G = Q.T @ Q
    # 6 orthonormal columns for a nonlinear molecule
    np.testing.assert_allclose(G, np.eye(6), atol=1e-10)


def test_thermo_water_sanity():
    # water-like: three real frequencies
    freqs = [1600.0, 3650.0, 3750.0]
    st = Structure.from_symbols(
        ["O", "H", "H"], [[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]])
    th = thermochemistry(freqs, st.numbers, st.coords, T=298.15,
                         electronic_energy=-76.4)
    # ZPE = sum(h nu)/2: ~0.0205 au for these modes
    assert th.zpe == pytest.approx(0.0205, abs=5e-4)
    # translational entropy of water at 298 K, 1 atm: 144.8 J/(mol K)
    s_trans_jmolk = th.s_trans * 2625499.6
    assert s_trans_jmolk == pytest.approx(144.8, rel=0.01)
    assert th.gibbs < th.electronic_energy + th.enthalpy_corr
    assert th.n_imag == 0


def test_qrrho_damps_low_freq_entropy():
    st = Structure.from_symbols(
        ["O", "H", "H"], [[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]])
    th_low = thermochemistry([10.0, 3650.0], st.numbers, st.coords)
    th_rrho_only = thermochemistry([10.0, 3650.0], st.numbers, st.coords,
                                   qrrho_nu0=1e-6)
    # QRRHO entropy for the 10 cm^-1 mode must be finite and smaller than
    # the raw RRHO value
    assert th_low.s_vib < th_rrho_only.s_vib
    assert th_low.s_vib > 0
