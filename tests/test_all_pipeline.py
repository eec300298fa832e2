from pathlib import Path

import numpy as np
import pytest
import yaml
from click.testing import CliRunner

from pdb2reaction_tpu.cli import cli

H3A = "3\nreactant\nH 0.0 0.0 0.0\nH 0.686 0.0 0.0\nH 2.4 0.0 0.0\n"
H3B = "3\nproduct\nH 0.0 0.0 0.0\nH 1.714 0.0 0.0\nH 2.4 0.0 0.0\n"


def test_all_pipeline_xyz(tmp_path):
    a = tmp_path / "A.xyz"
    b = tmp_path / "B.xyz"
    a.write_text(H3A)
    b.write_text(H3B)
    out = tmp_path / "all"
    res = CliRunner().invoke(cli, [
        "all", "-i", str(a), "-i", str(b), "-q", "0",
        "--calc-mode", "morse", "--freeze-atoms", "0,2",
        "--max-nodes", "6", "--out-dir", str(out)])
    assert res.exit_code == 0, res.output
    summary = yaml.safe_load((out / "summary.yaml").read_text())
    assert summary["n_segments"] >= 1
    s4 = summary["stage4"]
    assert len(s4) == 1
    assert s4[0]["tsopt"]["converged"]
    # IRC endpoints matched back to the optimized minima
    assert set(s4[0]["irc"]["matches_minima"].values()) == {
        "reactant", "product"}
    # thermochemistry for reactant/product/ts
    assert set(s4[0]["thermo"]) == {"reactant", "product", "ts"}
    assert (out / "energy_diagram_all.png").exists()
    assert (out / "stage4_seg_000" / "ts_final.xyz").exists()
    assert (out / "summary.log").read_text().count("reactive") >= 1


def test_all_default_subcommand_tsopt_only(tmp_path):
    """`pdb2r -i ...` routes to `all` (DefaultGroup); a single input with
    no scan lists enters TSOPT-only mode (reference all.py:2675-3156)."""
    a = tmp_path / "A.xyz"
    a.write_text(H3A)
    out = tmp_path / "out"
    res = CliRunner().invoke(cli, ["-i", str(a), "-q", "0",
                                   "--calc-mode", "morse",
                                   "--freeze-atoms", "0,2",
                                   "--out-dir", str(out)])
    assert res.exit_code == 0, res.output
    summary = yaml.safe_load((out / "summary.yaml").read_text())
    assert "tsopt" in summary
    assert (out / "tsopt" / "final_geometry.xyz").exists()


def test_scan2d_small(tmp_path):
    a = tmp_path / "A.xyz"
    a.write_text(H3A)
    out = tmp_path / "s2"
    res = CliRunner().invoke(cli, [
        "scan2d", "-i", str(a), "-q", "0", "--calc-mode", "morse",
        "--freeze-atoms", "0,2",
        "--scan", "0,1,0.9,0.15", "--scan", "1,2,1.6,0.2",
        "--out-dir", str(out)])
    assert res.exit_code == 0, res.output
    assert (out / "surface.csv").exists()
    assert (out / "surface_2d.png").exists()
    table = np.loadtxt(out / "surface.csv", delimiter=",", skiprows=1)
    assert table.shape[1] == 3
    assert len(table) >= 4
