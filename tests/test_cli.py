"""End-to-end CLI workflow tests on the analytic Morse backend.

Covers the reference's workflow chain (SURVEY.md §3):
opt -> path-opt (GSM) -> tsopt -> irc -> freq, plus scan, all through the
click entry points.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
from click.testing import CliRunner

from pdb2reaction_tpu.cli import cli
from pdb2reaction_tpu.core import io_xyz

H3A = "3\nreactant\nH 0.0 0.0 0.0\nH 0.686 0.0 0.0\nH 2.4 0.0 0.0\n"
H3B = "3\nproduct\nH 0.0 0.0 0.0\nH 1.714 0.0 0.0\nH 2.4 0.0 0.0\n"

COMMON = ["-q", "0", "--calc-mode", "morse", "--freeze-atoms", "0,2"]


@pytest.fixture()
def runner():
    return CliRunner()


@pytest.fixture()
def endpoints(tmp_path):
    a = tmp_path / "A.xyz"
    b = tmp_path / "B.xyz"
    a.write_text(H3A)
    b.write_text(H3B)
    return a, b


def test_cli_opt(runner, endpoints, tmp_path):
    a, _ = endpoints
    out = tmp_path / "opt"
    res = runner.invoke(cli, ["opt", "-i", str(a), "--thresh", "gau_tight",
                              "--out-dir", str(out)] + COMMON)
    assert res.exit_code == 0, res.output
    st = io_xyz.read_xyz(out / "final_geometry.xyz")
    assert np.linalg.norm(st.coords[1] - st.coords[0]) == pytest.approx(
        0.7046, abs=1e-3)


def test_cli_full_chain(runner, endpoints, tmp_path):
    a, b = endpoints
    po = tmp_path / "po"
    res = runner.invoke(cli, ["path-opt", "-i", str(a), "-i", str(b),
                              "--max-nodes", "8", "--out-dir", str(po)]
                        + COMMON)
    assert res.exit_code == 0, res.output
    assert (po / "hei.xyz").exists()
    assert "barrier" in res.output

    ts = tmp_path / "ts"
    res = runner.invoke(cli, ["tsopt", "-i", str(po / "hei.xyz"),
                              "--out-dir", str(ts)] + COMMON)
    assert res.exit_code == 0, res.output
    st = io_xyz.read_xyz(ts / "final_geometry.xyz")
    assert st.coords[1, 0] == pytest.approx(1.2, abs=5e-3)

    irc = tmp_path / "irc"
    res = runner.invoke(cli, ["irc", "-i", str(ts / "final_geometry.xyz"),
                              "--out-dir", str(irc)] + COMMON)
    assert res.exit_code == 0, res.output
    frames = io_xyz.read_xyz_frames(irc / "finished_irc.trj")
    ends = sorted([frames[0].coords[1, 0], frames[-1].coords[1, 0]])
    assert ends[0] == pytest.approx(0.69, abs=0.1)
    assert ends[1] == pytest.approx(1.71, abs=0.1)

    fq = tmp_path / "freq"
    res = runner.invoke(cli, ["freq", "-i", str(ts / "final_geometry.xyz"),
                              "--out-dir", str(fq)] + COMMON)
    assert res.exit_code == 0, res.output
    assert (fq / "thermoanalysis.yaml").exists()


def test_cli_scan_bond_change(runner, endpoints, tmp_path):
    a, _ = endpoints
    out = tmp_path / "scan"
    res = runner.invoke(cli, ["scan", "-i", str(a), "--scan-list",
                              "1,2,0.75", "--out-dir", str(out)] + COMMON)
    assert res.exit_code == 0, res.output
    assert "bonds formed" in res.output
    assert "bonds broken" in res.output
    assert (out / "stage_01.trj").exists()


def test_cli_help_lists_commands(runner):
    res = runner.invoke(cli, ["-h"])
    assert res.exit_code == 0
    for cmd in ("opt", "scan", "path-opt", "tsopt", "freq", "irc"):
        assert cmd in res.output
