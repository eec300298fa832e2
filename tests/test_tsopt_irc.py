import numpy as np
import pytest

from pdb2reaction_tpu.constants import BOHR2ANG
from pdb2reaction_tpu.core.structure import Structure
from pdb2reaction_tpu.mlip.calculator import Calculator
from pdb2reaction_tpu.mlip import potentials
from pdb2reaction_tpu.engines.dimer import hessian_dimer
from pdb2reaction_tpu.engines.irc import eulerpc_irc

L = 2.4


def double_well(x1=1.05, freeze=(0, 2)):
    return Structure.from_symbols(
        ["H", "H", "H"], [[0, 0, 0], [x1, 0, 0], [L, 0, 0]],
        freeze=list(freeze))


def test_hessian_dimer_finds_ts():
    st = double_well(1.05)
    calc = Calculator(st, potentials.make_morse())
    res = hessian_dimer(calc, calc.pad_bohr(st.coords_bohr),
                        flatten_max_iter=0)
    assert res.converged
    x = np.asarray(res.x)[:3] * BOHR2ANG
    assert x[1, 0] == pytest.approx(L / 2, abs=2e-3)
    # with only the middle atom active, PHVA+TR projection removes all modes
    # (reference semantics); imaginary count comes from the full analysis in
    # practice - here just check the result fields exist
    assert res.cycles > 0


def test_hessian_dimer_3d_offset_start():
    """Start displaced off-axis: the dimer must still find the collinear TS."""
    st = Structure.from_symbols(
        ["H", "H", "H"], [[0, 0, 0], [1.0, 0.12, -0.08], [L, 0, 0]],
        freeze=[0, 2])
    calc = Calculator(st, potentials.make_morse())
    res = hessian_dimer(calc, calc.pad_bohr(st.coords_bohr),
                        flatten_max_iter=0)
    assert res.converged
    x = np.asarray(res.x)[:3] * BOHR2ANG
    assert x[1, 0] == pytest.approx(L / 2, abs=5e-3)
    assert abs(x[1, 1]) < 2e-3 and abs(x[1, 2]) < 2e-3


def test_irc_connects_minima():
    """IRC from the TS must descend into both wells."""
    st = double_well(L / 2)
    calc = Calculator(st, potentials.make_morse())
    res = eulerpc_irc(calc, calc.pad_bohr(st.coords_bohr),
                      step_length=0.10, max_cycles=80,
                      rms_grad_thresh=5e-4)
    assert res.forward is not None and res.backward is not None
    xf = res.forward.coords[-1][1, 0] * BOHR2ANG
    xb = res.backward.coords[-1][1, 0] * BOHR2ANG
    ends = sorted([xf, xb])
    # wells are near 0.686 and L-0.686 = 1.714
    assert ends[0] == pytest.approx(0.686, abs=0.08)
    assert ends[1] == pytest.approx(L - 0.686, abs=0.08)
    # energies decrease monotonically-ish from the TS
    assert res.forward.energies[-1] < res.ts_energy
    assert res.backward.energies[-1] < res.ts_energy
    assert res.forward.converged and res.backward.converged
