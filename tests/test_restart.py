"""Mid-run restart for long device loops (VERDICT r3 item 6).

The reference dumps ``restart*.yml`` every N cycles (opt.py:211-214) and
``irc_data.h5`` (irc.py:58). Here the loop CARRY is the restart file
(runtime/checkpoint.py save_state/load_state): engines run their device
while_loops in chunks and dump the full NamedTuple state at each host
sync. These tests kill a run mid-loop (simulated by making the dump hook
raise, exactly like SIGKILL between chunks) and verify the rerun resumes
from the last dump — not cycle 0 — and lands on the uninterrupted result.
"""

import numpy as np
import pytest

from pdb2reaction_tpu.constants import BOHR2ANG
from pdb2reaction_tpu.core.structure import Structure
from pdb2reaction_tpu.mlip.calculator import Calculator
from pdb2reaction_tpu.mlip import potentials
from pdb2reaction_tpu.engines.lbfgs import lbfgs_minimize
from pdb2reaction_tpu.engines.dimer import hessian_dimer
from pdb2reaction_tpu.engines.irc import eulerpc_irc
from pdb2reaction_tpu.runtime.checkpoint import CheckpointStore

L = 2.4


def _h3(x1=1.05):
    return Structure.from_symbols(
        ["H", "H", "H"], [[0, 0, 0], [x1, 0, 0], [L, 0, 0]],
        freeze=[0, 2])


class _KillAfter:
    """Wrap CheckpointStore.save to raise after n dumps — a SIGKILL
    between chunks leaves exactly this on-disk state."""

    def __init__(self, store, n):
        self.store, self.left = store, n

    def __getattr__(self, k):
        return getattr(self.store, k)

    def save(self, *a, **kw):
        self.store.save(*a, **kw)
        self.left -= 1
        if self.left <= 0:
            raise KeyboardInterrupt("simulated kill after dump")


def test_lbfgs_restart_resumes_from_dump(tmp_path):
    st = _h3(1.3)
    calc = Calculator(st, potentials.make_morse())
    fn = calc.au_energy_force_fn()
    x0 = calc.pad_bohr(st.coords_bohr)
    fm = calc.system.free_mask
    kw = dict(thresh="gau_vtight", max_cycles=400)

    ref = lbfgs_minimize(fn, x0, fm, **kw)
    assert bool(ref.converged)
    total = int(ref.cycles)
    assert total > 6, "test needs a multi-chunk run"

    every = 3
    store = CheckpointStore(tmp_path / "rst")
    with pytest.raises(KeyboardInterrupt):
        lbfgs_minimize(fn, x0, fm,
                       restart={"store": _KillAfter(store, 1),
                                "name": "opt", "every": every}, **kw)
    # the on-disk dump is mid-run
    rec = store.load("opt")
    assert rec is not None and not rec[0]["done"]
    assert int(rec[1]["cycle"]) == every

    # rerun resumes: the first chunk sync lands at 2*every, not every
    syncs = []
    res = lbfgs_minimize(fn, x0, fm,
                         restart={"store": store, "name": "opt",
                                  "every": every},
                         callback=lambda c, e, f: syncs.append(c), **kw)
    assert syncs[0] == 2 * every, syncs
    assert bool(res.converged)
    assert int(res.cycles) == total
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               atol=1e-8)
    assert store.load("opt")[0]["done"]

    # stale-dump guard: a DIFFERENT x0 must not pick up this dump — 1.1
    # sits left of the barrier (midpoint 1.2) so a fresh run lands in the
    # LEFT well; a broken guard would replay the stored done-state from
    # x1=1.3, which converged to the RIGHT well
    st2 = _h3(1.1)
    res2 = lbfgs_minimize(fn, calc.pad_bohr(st2.coords_bohr), fm,
                          restart={"store": store, "name": "opt",
                                   "every": every}, **kw)
    assert bool(res2.converged)
    x2 = np.asarray(res2.x)[1, 0] * BOHR2ANG
    assert x2 == pytest.approx(0.7046, abs=1e-2)


def test_irc_restart_resumes_branch(tmp_path):
    st = _h3(L / 2)
    kw = dict(step_length=0.10, max_cycles=80, rms_grad_thresh=5e-4,
              backward=False)

    calc = Calculator(st, potentials.make_morse())
    ref = eulerpc_irc(calc, calc.pad_bohr(st.coords_bohr), **kw)
    n_ref = len(ref.forward.coords)

    store = CheckpointStore(tmp_path / "rst")
    calc2 = Calculator(st, potentials.make_morse())
    with pytest.raises(KeyboardInterrupt):
        eulerpc_irc(calc2, calc2.pad_bohr(st.coords_bohr),
                    restart={"store": _KillAfter(store, 2),
                             "name": "irc", "every": 5}, **kw)
    rec = store.load("irc_fwd")
    assert rec is not None and not rec[0]["done"]
    assert int(rec[1]["cycle"]) == 10

    calc3 = Calculator(st, potentials.make_morse())
    saves = []
    orig_save = CheckpointStore.save

    def spy(self, name, meta, arrays=None):
        saves.append(name)
        return orig_save(self, name, meta, arrays)

    CheckpointStore.save = spy
    try:
        res = eulerpc_irc(calc3, calc3.pad_bohr(st.coords_bohr),
                          restart={"store": store, "name": "irc",
                                   "every": 5}, **kw)
    finally:
        CheckpointStore.save = orig_save
    # resumed from cycle 10: needs ceil((n_ref-10)/5) chunks, strictly
    # fewer than a fresh run's ceil(n_ref/5)
    assert len(saves) == -(-(n_ref - 10) // 5)
    assert len(res.forward.coords) == n_ref
    np.testing.assert_allclose(res.forward.coords[-1],
                               ref.forward.coords[-1], atol=1e-8)
    assert store.load("irc_fwd")[0]["done"]


def test_dimer_restart_resumes_pass(tmp_path):
    st = _h3(1.05)
    kw = dict(flatten_max_iter=0)

    calc = Calculator(st, potentials.make_morse())
    ref = hessian_dimer(calc, calc.pad_bohr(st.coords_bohr), **kw)
    assert ref.converged

    store = CheckpointStore(tmp_path / "rst")
    calc2 = Calculator(st, potentials.make_morse())
    with pytest.raises(KeyboardInterrupt):
        # the Hessian memo saves first; kill on the first PASS dump
        hessian_dimer(calc2, calc2.pad_bohr(st.coords_bohr),
                      restart={"store": _KillAfter(store, 2),
                               "name": "ts", "every": 2}, **kw)
    assert store.has("ts_hess000")
    rec = store.load("ts_pass000")
    assert rec is not None

    calc3 = Calculator(st, potentials.make_morse())
    res = hessian_dimer(calc3, calc3.pad_bohr(st.coords_bohr),
                        restart={"store": store, "name": "ts",
                                 "every": 2}, **kw)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               atol=1e-6)
    x = np.asarray(res.x)[:3] * BOHR2ANG
    assert x[1, 0] == pytest.approx(L / 2, abs=2e-3)
    # memoized steps were reused: the resumed run skipped the seed exact
    # Hessian (memo hit) and the pre-kill pass cycles, so its force-call
    # meter is strictly below the uninterrupted run's
    assert calc3.force_calls < calc.force_calls
