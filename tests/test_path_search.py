from pathlib import Path

import numpy as np
import pytest
from click.testing import CliRunner

from pdb2reaction_tpu.cli import cli
from pdb2reaction_tpu.core import io_xyz

H3A = "3\nreactant\nH 0.0 0.0 0.0\nH 0.686 0.0 0.0\nH 2.4 0.0 0.0\n"
H3B = "3\nproduct\nH 0.0 0.0 0.0\nH 1.714 0.0 0.0\nH 2.4 0.0 0.0\n"
# conformational variant of A (no covalent change): middle H pushed off-axis
H3K = "3\nkink\nH 0.0 0.0 0.0\nH 0.64 0.25 0.0\nH 2.4 0.0 0.0\n"

COMMON = ["-q", "0", "--calc-mode", "morse", "--freeze-atoms", "0,2"]


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return p


def test_path_search_single_step(tmp_path):
    a = _write(tmp_path, "A.xyz", H3A)
    b = _write(tmp_path, "B.xyz", H3B)
    out = tmp_path / "ps"
    res = CliRunner().invoke(cli, ["path-search", "-i", str(a), "-i", str(b),
                                   "--max-nodes", "8",
                                   "--out-dir", str(out)] + COMMON)
    assert res.exit_code == 0, res.output
    assert (out / "mep.trj").exists()
    assert (out / "summary.yaml").exists()
    assert (out / "summary.log").exists()
    assert (out / "energy_diagram.png").exists()
    assert (out / "seg_000_mep" / "hei.xyz").exists()
    log = (out / "summary.log").read_text()
    assert "reactive" in log and "bonds formed" in log
    # stitched MEP is continuous and covers R -> P
    frames = io_xyz.read_xyz_frames(out / "mep.trj")
    assert frames[0].coords[1, 0] == pytest.approx(0.705, abs=0.05)
    assert frames[-1].coords[1, 0] == pytest.approx(1.695, abs=0.05)


def test_path_search_kink(tmp_path):
    a = _write(tmp_path, "A.xyz", H3A)
    k = _write(tmp_path, "K.xyz", H3K)
    out = tmp_path / "ps"
    res = CliRunner().invoke(cli, ["path-search", "-i", str(a), "-i", str(k),
                                   "--out-dir", str(out)] + COMMON)
    assert res.exit_code == 0, res.output
    import yaml
    summary = yaml.safe_load((out / "summary.yaml").read_text())
    # after preopt both conformers relax into the same well -> either a pure
    # kink segment or nothing reactive
    assert all(not s["reactive"] for s in summary["segments"])


def test_stitch_drops_duplicate_boundary_image():
    """_stitch must actually remove the duplicated interface image
    (reference path_search.py:958-1108 interface dedup)."""
    import numpy as np
    from pdb2reaction_tpu.workflows.path_search import (PathSearch,
                                                        SegmentReport)

    c = [np.full((3, 3), float(k)) for k in range(4)]
    seg_a = SegmentReport(images_bohr=[c[0], c[1], c[2]],
                          energies=[0.0, 0.5, 0.1], hei_idx=1,
                          is_reactive=True)
    seg_b = SegmentReport(images_bohr=[c[2], c[3]],
                          energies=[0.1, 0.0], hei_idx=0,
                          is_reactive=True)
    ps = PathSearch.__new__(PathSearch)
    ps.kw = {"rmsd_dedup_thresh": 1e-3, "bridge_rmsd_thresh": 1e9}
    ps.verbose = False
    out = ps._stitch([seg_a, seg_b])
    assert len(out) == 2
    # boundary image dropped from the later segment, hei reindexed
    assert len(out[1].images_bohr) == 1
    assert out[1].energies == [0.0]
    assert out[1].hei_idx == 0
