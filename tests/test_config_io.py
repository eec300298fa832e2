import numpy as np
import pytest

from pdb2reaction_tpu.workflows.config import (
    deep_update, apply_yaml_overrides, normalize_choice, parse_bool,
    pretty_block, format_elapsed)
from pdb2reaction_tpu.core.io_gjf import GjfTemplate, read_gjf, write_gjf
from pdb2reaction_tpu.workflows.trj2fig import plot_profile, read_trj_energies
from pdb2reaction_tpu.core import io_xyz
from pdb2reaction_tpu.core.structure import Structure


def test_deep_update_nested():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    deep_update(base, {"a": {"c": 9, "e": 4}})
    assert base == {"a": {"b": 1, "c": 9, "e": 4}, "d": 3}


def test_yaml_override_candidate_paths():
    cfg = {"max_step": 0.3, "thresh": "gau"}
    y = {"opt": {"lbfgs": {"max_step": 0.1}}, "lbfgs": {"thresh": "baker"}}
    apply_yaml_overrides(cfg, y, [("opt", "lbfgs"), ("lbfgs",)])
    assert cfg["max_step"] == 0.1      # from opt.lbfgs
    assert cfg["thresh"] == "baker"    # from lbfgs


def test_normalize_choice_aliases():
    assert normalize_choice("light") == "lbfgs"
    assert normalize_choice("HEAVY") == "rfo"
    with pytest.raises(ValueError):
        normalize_choice("bogus", choices=("lbfgs", "rfo"))


def test_parse_bool_strict():
    assert parse_bool("True") and parse_bool("true") and parse_bool("1")
    assert not parse_bool("False") and not parse_bool("off")
    with pytest.raises(ValueError):
        parse_bool("maybe")


def test_pretty_block_and_elapsed():
    s = pretty_block("opt settings", {"thresh": "gau", "n": 3})
    assert "opt settings" in s and "thresh: gau" in s
    assert format_elapsed(0.0, 3723.5) == "01:02:03.500"


GJF = """%mem=4GB
#p wb97xd/def2svp opt

water opt

0 1
O    0.000000   0.000000   0.000000
H    0.960000   0.000000   0.000000
H   -0.240000   0.930000   0.000000

"""


def test_gjf_roundtrip(tmp_path):
    p = tmp_path / "w.gjf"
    p.write_text(GJF)
    st = read_gjf(p)
    assert st.symbols == ["O", "H", "H"]
    assert st.gjf_charge == 0 and st.gjf_spin == 1
    # template preserved through a coordinate update
    st.coords = st.coords + 0.5
    out = tmp_path / "w2.gjf"
    write_gjf(out, st)
    text = out.read_text()
    assert "%mem=4GB" in text
    assert "#p wb97xd/def2svp opt" in text
    st2 = read_gjf(out)
    np.testing.assert_allclose(st2.coords, st.coords, atol=1e-6)


def test_trj2fig_profile(tmp_path):
    st = Structure.from_symbols(["H", "H"], [[0, 0, 0], [0.7, 0, 0]])
    frames = [st.copy(coords=st.coords + 0.01 * k) for k in range(5)]
    trj = tmp_path / "p.trj"
    io_xyz.write_trj(trj, frames, energies=[-1.0, -0.9, -0.7, -0.85, -0.95])
    es = read_trj_energies(trj)
    assert es == pytest.approx([-1.0, -0.9, -0.7, -0.85, -0.95])
    fig = plot_profile(tmp_path / "p.png", es, csv_path=tmp_path / "p.csv")
    assert fig.exists()
    table = np.loadtxt(tmp_path / "p.csv", delimiter=",", skiprows=1)
    assert table.shape == (5, 3)
    # relative column peaks at image 2
    assert int(np.argmax(table[:, 2])) == 2
