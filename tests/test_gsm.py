import numpy as np
import pytest

from pdb2reaction_tpu.constants import BOHR2ANG, ANG2BOHR
from pdb2reaction_tpu.core.structure import Structure
from pdb2reaction_tpu.mlip.calculator import Calculator
from pdb2reaction_tpu.mlip import potentials
from pdb2reaction_tpu.engines.gsm import gsm_mep, select_hei_index


def test_select_hei_prefers_internal_maxima():
    assert select_hei_index([0.0, 1.0, 0.5, 2.0, 0.1]) == 3
    # no internal local max -> argmax of interior
    assert select_hei_index([0.0, 1.0, 2.0, 3.0, 4.0]) == 3
    assert select_hei_index([1.0, 0.5]) == 0


def test_gsm_double_well_path():
    """H between two frozen H at L=2.4: MEP from left well to right well;
    the HEI must sit at the symmetric barrier (midpoint)."""
    L = 2.4
    stA = Structure.from_symbols(
        ["H", "H", "H"], [[0, 0, 0], [0.686, 0, 0], [L, 0, 0]],
        freeze=[0, 2])
    xB = np.array([[0, 0, 0], [L - 0.686, 0, 0], [L, 0, 0]])

    calc = Calculator(stA, potentials.make_morse())
    eb = calc.au_energy_force_batch_fn()
    res = gsm_mep(
        eb,
        calc.pad_bohr(stA.coords_bohr),
        calc.pad_bohr(xB * ANG2BOHR),
        calc.system.free_mask,
        max_nodes=8, max_cycles=300, conv_perp_rms=5e-4)
    assert res.converged
    E = res.energies
    hei = res.hei_idx
    assert 0 < hei < len(E) - 1
    x_hei = res.images[hei][:3] * BOHR2ANG
    # barrier at the midpoint
    assert x_hei[1, 0] == pytest.approx(L / 2, abs=0.05)
    # path is continuous and endpoints unchanged
    np.testing.assert_allclose(res.images[0][:3] * BOHR2ANG,
                               stA.coords, atol=1e-10)
    np.testing.assert_allclose(res.images[-1][:3] * BOHR2ANG, xB, atol=1e-10)
    # barrier height matches the PES scan value (~0.0177 Ha)
    barrier = E[hei] - E[0]
    assert barrier == pytest.approx(0.0177, abs=2e-3)


def test_gsm_force_call_accounting():
    L = 2.4
    stA = Structure.from_symbols(
        ["H", "H", "H"], [[0, 0, 0], [0.686, 0, 0], [L, 0, 0]],
        freeze=[0, 2])
    xB = np.array([[0, 0, 0], [L - 0.686, 0, 0], [L, 0, 0]])
    calc = Calculator(stA, potentials.make_morse())
    eb = calc.au_energy_force_batch_fn()
    res = gsm_mep(eb, calc.pad_bohr(stA.coords_bohr),
                  calc.pad_bohr(xB * ANG2BOHR),
                  calc.system.free_mask,
                  max_nodes=4, max_cycles=50, conv_perp_rms=5e-4)
    # growth cycles + device cycles + the device phase's energy seed,
    # all at M=6 images per batched call
    assert res.force_calls == (res.cycles + 1) * 6


def test_lanczos_lowest_mode_matches_exact():
    """Lanczos on the analytic HVP must recover the exact lowest Hessian
    eigenvector (the climb_lanczos tangent, reference path_opt.py:177)."""
    import jax.numpy as jnp
    from pdb2reaction_tpu.core.structure import Structure
    from pdb2reaction_tpu.mlip.calculator import Calculator
    from pdb2reaction_tpu.mlip import potentials
    from pdb2reaction_tpu.engines.gsm import lanczos_lowest_mode

    st = Structure.from_symbols(
        ["H", "H", "H"], [[0, 0, 0], [1.2, 0, 0], [2.4, 0, 0]],
        freeze=[0, 2])
    calc = Calculator(st, potentials.make_morse())
    x = calc.pad_bohr(st.coords_bohr)
    fm_flat = jnp.repeat(jnp.asarray(calc.system.free_mask), 3)
    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.normal(size=x.size))
    d = np.asarray(lanczos_lowest_mode(calc.au_hvp_fn(), x, v0, fm_flat,
                                       iters=10))
    # exact reference: lowest eigenvector of the free-block Hessian
    H = calc.get_hessian(st.coords_bohr.reshape(-1))["hessian"]
    free = calc.free_dof_mask
    Hf = H[np.ix_(free, free)]
    w, V = np.linalg.eigh(Hf)
    exact = np.zeros(3 * calc.n_atoms)
    exact[free] = V[:, 0]
    full = np.zeros(x.size)
    full[: 3 * calc.n_atoms] = exact
    overlap = abs(float(np.dot(d, full)))
    assert overlap > 0.999, overlap
