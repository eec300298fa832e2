import numpy as np
import pytest

from pdb2reaction_tpu import constants, elements
from pdb2reaction_tpu.core.structure import Structure, pad_to
from pdb2reaction_tpu.core import io_xyz, io_pdb


def test_constants_roundtrip():
    assert constants.BOHR2ANG * constants.ANG2BOHR == pytest.approx(1.0)
    assert constants.AU2EV == pytest.approx(27.2114, abs=1e-3)
    # force conversion: 1 eV/Ang in Hartree/Bohr
    assert constants.F_EVAA_2_AU == pytest.approx(0.0194469, abs=1e-6)


def test_elements():
    assert elements.z_of("C") == 6
    assert elements.z_of("fe") == 26
    assert elements.z_of("FE") == 26
    assert elements.z_of("D") == 1
    assert elements.symbol_of(8) == "O"
    m = elements.masses_of([1, 6, 8])
    np.testing.assert_allclose(m, [1.00794, 12.0107, 15.9994])
    r = elements.covalent_radii_of([6], unit="ang")
    assert r[0] == pytest.approx(0.75)


def test_structure_pad():
    st = Structure.from_symbols(["O", "H", "H"],
                                [[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]],
                                freeze=[0])
    sys_ = pad_to(st, multiple=8)
    assert sys_.n_pad == 8
    assert float(sys_.atom_mask.sum()) == 3.0
    assert float(sys_.free_mask.sum()) == 2.0
    assert int(sys_.numbers[0]) == 8
    assert float(sys_.masses[3]) == 0.0


def test_xyz_roundtrip(tmp_path):
    st = Structure.from_symbols(["C", "O"], [[0, 0, 0], [1.13, 0, 0]])
    p = tmp_path / "co.xyz"
    io_xyz.write_xyz(p, st, energy=-113.25)
    frames = io_xyz.read_xyz_frames(p)
    assert len(frames) == 1
    np.testing.assert_allclose(frames[0].coords, st.coords, atol=1e-12)
    assert io_xyz.parse_energy_comment(frames[0].comment) == pytest.approx(-113.25)


def test_trj_roundtrip(tmp_path):
    st = Structure.from_symbols(["H", "H"], [[0, 0, 0], [0.74, 0, 0]])
    frames = [st, st.copy(coords=st.coords + 0.1)]
    p = tmp_path / "a.trj"
    io_xyz.write_trj(p, frames, energies=[-1.0, -0.9])
    back = io_xyz.read_xyz_frames(p)
    assert len(back) == 2
    np.testing.assert_allclose(back[1].coords, frames[1].coords)


PDB_TEXT = """\
ATOM      1  N   ALA A   1      11.104   6.134  -6.504  1.00  0.00           N
ATOM      2  CA  ALA A   1      11.639   6.071  -5.147  1.00  0.00           C
ATOM      3  C   ALA A   1      10.722   6.802  -4.199  1.00  0.00           C
HETATM    4 ZN    ZN A  90       1.000   2.000   3.000  1.00  0.00          ZN
HETATM    5  HL  LKH A  99       0.000   0.000   0.000  1.00  0.00           H
END
"""


def test_pdb_parse_write(tmp_path):
    p = tmp_path / "x.pdb"
    p.write_text(PDB_TEXT)
    st = io_pdb.read_pdb(p)
    assert st.n_atoms == 5
    assert st.symbols == ["N", "C", "C", "Zn", "H"]
    assert st.pdb_atoms[0]["resname"] == "ALA"
    assert st.pdb_atoms[3]["record"] == "HETATM"
    assert st.pdb_atoms[4]["resname"] == "LKH"
    out = tmp_path / "y.pdb"
    io_pdb.write_pdb(out, st)
    st2 = io_pdb.read_pdb(out)
    assert st2.symbols == st.symbols
    np.testing.assert_allclose(st2.coords, st.coords, atol=1e-3)


def test_pdb_overlay(tmp_path):
    p = tmp_path / "x.pdb"
    p.write_text(PDB_TEXT)
    st = io_pdb.read_pdb(p)
    new = st.coords + 1.0
    out = tmp_path / "z.pdb"
    io_pdb.overlay_coords_on_template(p, new, out)
    st2 = io_pdb.read_pdb(out)
    np.testing.assert_allclose(st2.coords, new, atol=1e-3)
