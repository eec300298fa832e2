import numpy as np
import pytest

from pdb2reaction_tpu.runtime.profiling import ForceCallMeter, trace
from pdb2reaction_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from pdb2reaction_tpu.workflows.summary import (_freq_warnings,
                                                write_summary_log,
                                                build_energy_diagram)
from pdb2reaction_tpu.workflows.path_search import SegmentReport, \
    segments_summary


class FakeCalc:
    force_calls = 0


def test_force_call_meter():
    calc = FakeCalc()
    meter = ForceCallMeter(calc)
    with meter.phase("gsm"):
        calc.force_calls += 120
    with meter.phase("tsopt"):
        calc.force_calls += 30
    with meter.phase("gsm"):
        calc.force_calls += 10
    assert meter.phases["gsm"]["calls"] == 130
    assert meter.phases["tsopt"]["calls"] == 30
    rep = meter.report()
    assert "gsm" in rep and "TOTAL" in rep and "160" in rep


def test_trace_noop_without_dir():
    with trace(None):
        pass  # must be a clean no-op


def test_mesh_sharding():
    import jax
    from jax.sharding import PartitionSpec
    mesh = make_mesh(data=4, model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    x = np.arange(32.0).reshape(8, 4)
    xs = shard_batch(x, mesh)
    assert xs.sharding.spec == PartitionSpec("data")
    xr = replicate(x, mesh)
    assert xr.sharding.spec == PartitionSpec()


def test_freq_warnings():
    assert any("not be a TS" in w for w in _freq_warnings([10.0, 20.0]))
    assert any("higher-order" in w
               for w in _freq_warnings([-200.0, -100.0, 50.0]))
    assert any("shallow" in w for w in _freq_warnings([-20.0, 100.0]))
    assert _freq_warnings([-300.0, 100.0]) == []


def _segments():
    img = [np.zeros((2, 3)), np.ones((2, 3))]
    return [SegmentReport(images_bohr=img, energies=[-1.0, -0.98, -0.995][:2],
                          hei_idx=1, is_reactive=True,
                          bond_summary="Covalent bonds formed:\n  X",
                          converged=True)]


def test_summary_log_with_freq_block(tmp_path):
    segs = _segments()
    summary = segments_summary(segs)
    log = write_summary_log(tmp_path / "s.log", summary,
                            elapsed="00:01:00",
                            freq_blocks={0: [-312.0, 50.0, 100.0]})
    text = log.read_text()
    assert "reactive" in text
    assert "-312.0" in text
    assert "bonds formed" in text


def test_energy_diagram(tmp_path):
    segs = _segments()
    diag = build_energy_diagram(tmp_path / "d.png", segs)
    png = tmp_path / "d.png"
    assert png.exists() and png.stat().st_size > 1000
    assert diag["labels"] == ["R", "TS1", "P"]


def _seg(e0, e_ts, e_end, *, kind="seg", reactive=True):
    from pdb2reaction_tpu.workflows.path_search import SegmentReport
    img = [np.zeros((2, 3))] * 3
    return SegmentReport(images_bohr=img, energies=[e0, e_ts, e_end],
                         hei_idx=1, is_reactive=reactive, kind=kind,
                         is_kink=(kind == "kink"),
                         bond_summary="X" if reactive else "")


def test_compressed_diagram_reference_semantics():
    """Exact reference compression semantics (path_search.py:2575-2759):
    pre-TS kinks fold into R-side energy; bridge barriers become
    IM{n}_TS diagram-only peaks; in-group deltas make IM{n}_2 joined by
    -|-->; the last TS group goes straight to P."""
    from pdb2reaction_tpu.workflows.summary import compressed_diagram
    from pdb2reaction_tpu.constants import AU2KCALPERMOL

    k = 1.0 / AU2KCALPERMOL  # 1 kcal/mol in au
    segs = [
        _seg(0.0, 0.5 * k, 1.0 * k, kind="kink", reactive=False),  # pre-TS
        _seg(1.0 * k, 11.0 * k, 3.0 * k),                # TS1: b=10, d=+2
        _seg(3.0 * k, 7.0 * k, 2.0 * k, kind="bridge",   # peak b=4, d=-1
             reactive=False),
        _seg(2.0 * k, 14.0 * k, 5.0 * k),                # TS2 (last)
    ]
    d = compressed_diagram(segs)
    assert d["chain"] == "R --> TS1 --> IM1_1 --> IM1_TS -|--> IM1_2 --> TS2 --> P"
    got = dict(zip(d["labels"], d["energies_kcal"]))
    # R folds in the +1 kcal pre-TS kink delta: state energy starts at 1.0
    assert abs(got["R"] - 0.0) < 1e-9
    assert abs(got["TS1"] - (1.0 + 10.0)) < 1e-9
    assert abs(got["IM1_1"] - (1.0 + 2.0)) < 1e-9
    assert abs(got["IM1_TS"] - (3.0 + 4.0)) < 1e-9
    assert abs(got["IM1_2"] - (3.0 - 1.0)) < 1e-9
    assert abs(got["TS2"] - (2.0 + 12.0)) < 1e-9
    assert abs(got["P"] - (2.0 + 3.0)) < 1e-9
    # absolute anchoring: first frame of first bond-change segment
    assert abs(d["energies_au"][0] - 1.0 * k) < 1e-12


def test_compressed_diagram_no_bond_change():
    from pdb2reaction_tpu.workflows.summary import compressed_diagram
    segs = [_seg(0.0, 0.001, 0.002, kind="kink", reactive=False)]
    d = compressed_diagram(segs)
    assert d["labels"] == ["R", "P"]
    assert d["chain"] == "R --> P"
