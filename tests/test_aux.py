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
    out = build_energy_diagram(tmp_path / "d.png", segs)
    assert out.exists() and out.stat().st_size > 1000
