"""DFT driver contract tests against a stub SCF backend (VERDICT r2 item 4).

The reference contract being pinned (/root/reference/pdb2reaction/dft.py):
RKS/UKS selection by multiplicity (:549), density-fitting toggle
(:168-177), per-atom flow-style tables ``[index, element, mulliken,
lowdin, iao]`` in result.yaml (:625-671), result.yaml written BEFORE the
exit-3 path on SCF non-convergence (:672-682). With these pinned by a fake
engine, a PySCF-equipped image runs workflows/dft.py unmodified.
"""

import yaml
import pytest

from pdb2reaction_tpu.workflows.dft import (run_dft, ScfResult,
                                            ScfNotConverged)


class StubBackend:
    """Records the driver's request and returns canned populations."""

    def __init__(self, converged=True, e_tot=-76.4, with_pop=True):
        self.converged = converged
        self.e_tot = e_tot
        self.with_pop = with_pop
        self.calls = []

    def kernel(self, struct, **kw):
        self.calls.append(kw)
        n = struct.n_atoms
        s = kw["spin_mult"]
        res = ScfResult(
            e_tot=self.e_tot, converged=self.converged,
            scf_type="RKS" if s == 1 else "UKS",
            engine_label="stub", density_fit=kw["density_fit"])
        if self.with_pop and kw["pop"]:
            res.mulliken = [0.1 * i for i in range(n)]
            res.lowdin = [0.2 * i for i in range(n)]
            res.iao = [0.3 * i for i in range(n)]
            if s > 1:
                res.spin_mulliken = [1.0] * n
                res.spin_lowdin = [1.0] * n
                res.spin_iao = [1.0] * n
        return res


@pytest.fixture()
def water_xyz(tmp_path):
    p = tmp_path / "w.xyz"
    p.write_text("3\n\nO 0 0 0\nH 0.96 0 0\nH -0.24 0.93 0\n")
    return p


def test_rks_selection_and_result_yaml(water_xyz, tmp_path):
    be = StubBackend()
    res = run_dft(water_xyz, charge=0, spin=1, backend=be,
                  out_dir=tmp_path / "dft", verbose=False)
    kw = be.calls[0]
    assert kw["spin_mult"] == 1 and kw["charge"] == 0
    assert kw["density_fit"] is True and kw["func"] == "wb97m-v"
    assert res["scf_type"] == "RKS"
    assert res["energy_au"] == pytest.approx(-76.4)
    assert res["energy_kcal"] == pytest.approx(-76.4 * 627.509474063056)

    doc = yaml.safe_load((tmp_path / "dft" / "result.yaml").read_text())
    assert doc["energy"]["hartree"] == pytest.approx(-76.4)
    assert doc["energy"]["converged"] is True
    assert doc["energy"]["engine"] == "stub"
    rows = doc["charges [index, element, mulliken, lowdin, iao]"]
    assert rows[0] == [0, "O", 0.0, 0.0, 0.0]
    assert rows[1][:2] == [1, "H"]
    assert rows[1][2] == pytest.approx(0.1)
    # RKS: spin table emitted with null cells (reference dft.py:635-638)
    spins = doc["spin_densities [index, element, mulliken, lowdin, iao]"]
    assert spins[0] == [0, "O", None, None, None]
    # flow style: rows are single-line inline lists
    text = (tmp_path / "dft" / "result.yaml").read_text()
    assert "- [0, O, 0.0, 0.0, 0.0]" in text


def test_uks_selection_and_spin_tables(water_xyz, tmp_path):
    be = StubBackend()
    res = run_dft(water_xyz, charge=1, spin=2, backend=be,
                  out_dir=tmp_path / "dft", verbose=False)
    assert be.calls[0]["spin_mult"] == 2
    assert res["scf_type"] == "UKS"
    doc = yaml.safe_load((tmp_path / "dft" / "result.yaml").read_text())
    spins = doc["spin_densities [index, element, mulliken, lowdin, iao]"]
    assert spins[0] == [0, "O", 1.0, 1.0, 1.0]
    assert res["iao_spin"] == [1.0, 1.0, 1.0]


def test_density_fit_toggle_passthrough(water_xyz, tmp_path):
    be = StubBackend()
    run_dft(water_xyz, charge=0, spin=1, density_fit=False, backend=be,
            out_dir=tmp_path / "dft", verbose=False)
    assert be.calls[0]["density_fit"] is False
    doc = yaml.safe_load((tmp_path / "dft" / "result.yaml").read_text())
    assert doc["input"]["density_fit"] is False


def test_nonconvergence_writes_yaml_then_exit3(water_xyz, tmp_path):
    be = StubBackend(converged=False)
    with pytest.raises(ScfNotConverged) as ei:
        run_dft(water_xyz, charge=0, spin=1, backend=be,
                out_dir=tmp_path / "dft", verbose=False)
    assert ei.value.exit_code == 3
    # result.yaml written BEFORE the exit-3 path (reference dft.py:672-682)
    doc = yaml.safe_load((tmp_path / "dft" / "result.yaml").read_text())
    assert doc["energy"]["converged"] is False


def test_missing_populations_leave_null_cells(water_xyz, tmp_path):
    be = StubBackend(with_pop=False)
    run_dft(water_xyz, charge=0, spin=1, backend=be,
            out_dir=tmp_path / "dft", verbose=False)
    doc = yaml.safe_load((tmp_path / "dft" / "result.yaml").read_text())
    rows = doc["charges [index, element, mulliken, lowdin, iao]"]
    assert rows[0] == [0, "O", None, None, None]


def test_population_error_recorded(water_xyz, tmp_path):
    """A population-analysis failure leaves null cells AND records why
    (result.yaml population_error — reference dft.py:436-441), so a null
    row is distinguishable from an intentionally skipped analysis."""
    be = StubBackend(with_pop=False)
    orig = be.kernel

    def kernel(struct, **kw):
        res = orig(struct, **kw)
        res.population_error = "LinAlgError: singular overlap"
        return res

    be.kernel = kernel
    run_dft(water_xyz, charge=0, spin=1, backend=be,
            out_dir=tmp_path / "dft", verbose=False)
    doc = yaml.safe_load((tmp_path / "dft" / "result.yaml").read_text())
    assert doc["population_error"] == "LinAlgError: singular overlap"
    rows = doc["charges [index, element, mulliken, lowdin, iao]"]
    assert rows[0] == [0, "O", None, None, None]


class TestMiniRhfEngine:
    """A REAL SCF through the full driver in this PySCF-less image
    (VERDICT r4 item 9): the built-in RHF/STO-3G engine
    (workflows/minidft.py, hand-coded s-Gaussian integrals) runs
    end-to-end through run_dft — the same code path PySCF takes."""

    def test_h2_physically_correct_through_driver(self, tmp_path):
        p = tmp_path / "h2.xyz"
        p.write_text("2\n\nH 0 0 0\nH 0.74 0 0\n")
        res = run_dft(p, charge=0, spin=1, engine="mini",
                      out_dir=tmp_path / "dft", verbose=False)
        # RHF/STO-3G H2 at 0.74 A: literature -1.1167 Ha
        assert res["energy_au"] == pytest.approx(-1.1168, abs=2e-3)
        assert res["converged"] is True
        assert res["scf_type"] == "RHF"
        assert res["mulliken_charges"] == pytest.approx([0.0, 0.0],
                                                        abs=1e-8)
        doc = yaml.safe_load((tmp_path / "dft" / "result.yaml").read_text())
        assert doc["energy"]["hartree"] == pytest.approx(-1.1168, abs=2e-3)
        assert doc["energy"]["engine"] == "mini-rhf(sto-3g)"
        rows = doc["charges [index, element, mulliken, lowdin, iao]"]
        assert rows[0][:2] == [0, "H"]
        # IAO is genuinely unavailable and says why
        assert "mini-rhf" in doc["population_error"]

    def test_hehplus_charged_species(self, tmp_path):
        p = tmp_path / "heh.xyz"
        p.write_text("2\n\nHe 0 0 0\nH 0.772 0 0\n")
        res = run_dft(p, charge=1, spin=1, engine="mini",
                      out_dir=tmp_path / "dft", verbose=False)
        # RHF/STO-3G HeH+ near equilibrium: ~ -2.841 Ha
        assert res["energy_au"] == pytest.approx(-2.8414, abs=5e-3)
        assert sum(res["mulliken_charges"]) == pytest.approx(1.0, abs=1e-8)
        # He keeps most of the electron density
        assert res["mulliken_charges"][0] < res["mulliken_charges"][1]

    def test_nonconvergence_exit3_through_real_scf(self, tmp_path):
        p = tmp_path / "h2.xyz"
        p.write_text("2\n\nH 0 0 0\nH 0.74 0 0\n")
        with pytest.raises(ScfNotConverged) as ei:
            run_dft(p, charge=0, spin=1, engine="mini", max_cycle=1,
                    conv_tol=1e-14, out_dir=tmp_path / "dft",
                    verbose=False)
        assert ei.value.exit_code == 3
        doc = yaml.safe_load((tmp_path / "dft" / "result.yaml").read_text())
        assert doc["energy"]["converged"] is False

    def test_open_shell_and_heavy_elements_rejected(self, tmp_path):
        p = tmp_path / "w.xyz"
        p.write_text("3\n\nO 0 0 0\nH 0.96 0 0\nH -0.24 0.93 0\n")
        with pytest.raises(ValueError, match="s-block"):
            run_dft(p, charge=0, spin=1, engine="mini",
                    out_dir=tmp_path / "dft", verbose=False)
        h2 = tmp_path / "h2.xyz"
        h2.write_text("2\n\nH 0 0 0\nH 0.74 0 0\n")
        with pytest.raises(ValueError, match="closed-shell"):
            run_dft(h2, charge=0, spin=3, engine="mini",
                    out_dir=tmp_path / "dft", verbose=False)

    def test_cli_mini_engine(self, tmp_path):
        from click.testing import CliRunner
        from pdb2reaction_tpu.cli import cli
        p = tmp_path / "h2.xyz"
        p.write_text("2\n\nH 0 0 0\nH 0.74 0 0\n")
        r = CliRunner().invoke(cli, [
            "dft", "-i", str(p), "-q", "0", "--engine", "mini",
            "--func-basis", "hf/sto-3g",
            "--out-dir", str(tmp_path / "dft")])
        assert r.exit_code == 0, r.output
        doc = yaml.safe_load((tmp_path / "dft" / "result.yaml").read_text())
        assert doc["energy"]["hartree"] == pytest.approx(-1.1168, abs=2e-3)


def test_cli_exit2_without_pyscf(water_xyz):
    """PySCF is absent from this image: the CLI must exit 2 with a clear
    message, never crash (cli.py dft_cmd ImportError mapping)."""
    pytest.importorskip("click")
    try:
        import pyscf  # noqa: F401
        pytest.skip("pyscf present; ImportError path not reachable")
    except ImportError:
        pass
    from click.testing import CliRunner
    from pdb2reaction_tpu.cli import cli
    r = CliRunner().invoke(cli, ["dft", "-i", str(water_xyz), "-q", "0"])
    assert r.exit_code == 2
    assert "PySCF" in (r.output + str(r.stderr_bytes or b""))
