import numpy as np
import pytest
from pathlib import Path

from pdb2reaction_tpu.core import io_pdb
from pdb2reaction_tpu.bio.extract import extract_api
from pdb2reaction_tpu.bio.add_elem import (assign_elements, guess_element,
                                           pdb_needs_elem_fix)


def _atom(serial, name, resname, chain, resseq, xyz, record="ATOM",
          element=None):
    return dict(record=record, serial=serial, name=name,
                resname=resname, chain=chain, resseq=resseq,
                element=element or name[0],
                occupancy=1.0, bfactor=0.0,
                x=xyz[0], y=xyz[1], z=xyz[2])


def build_complex_pdb(path):
    """LIG at origin; SER and ASP side chains in contact; GLY far; water
    and ZN nearby."""
    atoms = [
        # SER A 10 — OG within 2.6 A of ligand
        _atom(1, "N", "SER", "A", 10, (1.3, 5.5, 0)),
        _atom(2, "CA", "SER", "A", 10, (0.0, 4.9, 0), element="C"),
        _atom(3, "C", "SER", "A", 10, (-1.2, 5.6, 0)),
        _atom(4, "O", "SER", "A", 10, (-1.3, 6.8, 0)),
        _atom(5, "CB", "SER", "A", 10, (0.0, 3.4, 0), element="C"),
        _atom(6, "OG", "SER", "A", 10, (0.0, 2.0, 0), element="O"),
        # ASP A 11 — OD1 near ligand (separate segment; no peptide bond)
        _atom(7, "N", "ASP", "A", 11, (-1.9, -5.6, 0)),
        _atom(8, "CA", "ASP", "A", 11, (-2.8, -4.5, 0), element="C"),
        _atom(9, "C", "ASP", "A", 11, (-4.2, -4.8, 0)),
        _atom(10, "O", "ASP", "A", 11, (-5.1, -4.0, 0)),
        _atom(11, "CB", "ASP", "A", 11, (-2.0, -3.3, 0), element="C"),
        _atom(12, "CG", "ASP", "A", 11, (-0.6, -3.0, 0), element="C"),
        _atom(13, "OD1", "ASP", "A", 11, (0.0, -2.0, 0), element="O"),
        _atom(14, "OD2", "ASP", "A", 11, (0.2, -3.9, 0), element="O"),
        # GLY A 12 — far away
        _atom(15, "N", "GLY", "A", 12, (20, 20, 20)),
        _atom(16, "CA", "GLY", "A", 12, (21, 20, 20), element="C"),
        _atom(17, "C", "GLY", "A", 12, (22, 20, 20)),
        _atom(18, "O", "GLY", "A", 12, (23, 20, 20)),
        # water near
        _atom(19, "O", "HOH", "A", 50, (2.0, 0.5, 0), record="HETATM"),
        # zinc near
        _atom(20, "ZN", "ZN", "A", 60, (0.0, 0.0, 2.1), record="HETATM",
              element="Zn"),
        # ligand
        _atom(21, "C1", "LIG", "A", 100, (0, 0, 0), record="HETATM",
              element="C"),
        _atom(22, "O1", "LIG", "A", 100, (1.2, 0, 0), record="HETATM",
              element="O"),
    ]
    lines = [io_pdb.format_pdb_line(a, (a["x"], a["y"], a["z"]))
             for a in atoms]
    Path(path).write_text("\n".join(lines + ["END"]) + "\n")


def test_extract_basic(tmp_path):
    pdb = tmp_path / "complex.pdb"
    build_complex_pdb(pdb)
    out = tmp_path / "pocket.pdb"
    res = extract_api([pdb], "LIG", [out], ligand_charge=-1)
    st = io_pdb.read_pdb(out)
    names = [a["name"] for a in st.pdb_atoms]
    resnames = {a["resname"] for a in st.pdb_atoms}
    # ligand intact, SER/ASP side chains kept, GLY excluded
    assert "C1" in names and "O1" in names
    assert "OG" in names and "OD1" in names
    assert "GLY" not in resnames
    assert "ZN" in resnames and "HOH" in resnames
    # backbone removed from amino acids
    ser_names = [a["name"] for a in st.pdb_atoms if a["resname"] == "SER"]
    assert "CA" not in ser_names and "N" not in ser_names
    # two link hydrogens (CB-CA cut on SER and ASP)
    hl = [a for a in st.pdb_atoms if a["resname"] == "LKH"]
    assert len(hl) == 2
    assert all(a["name"] == "HL" for a in hl)
    # link H 1.09 A from its parent CB
    cb_ser = next(a for a in st.pdb_atoms
                  if a["resname"] == "SER" and a["name"] == "CB")
    d = min(np.hypot(np.hypot(a["x"] - cb_ser["x"], a["y"] - cb_ser["y"]),
                     a["z"] - cb_ser["z"]) for a in hl)
    assert d == pytest.approx(1.09, abs=1e-2)
    # charge summary: ASP -1, ZN +2, ligand -1 -> total 0
    cs = res["charge_summary"]
    assert cs["protein_charge"] == -1
    assert cs["ion_charge"] == 2
    assert cs["ligand_charge"] == -1
    assert cs["total_charge"] == 0


def test_extract_by_resid_and_id_modes(tmp_path):
    pdb = tmp_path / "complex.pdb"
    build_complex_pdb(pdb)
    out = tmp_path / "p.pdb"
    res = extract_api([pdb], "A:100", [out])
    st = io_pdb.read_pdb(out)
    assert any(a["resname"] == "LIG" for a in st.pdb_atoms)


def test_extract_multi_model(tmp_path):
    p1 = tmp_path / "c1.pdb"
    p2 = tmp_path / "c2.pdb"
    build_complex_pdb(p1)
    build_complex_pdb(p2)
    out = tmp_path / "multi.pdb"
    res = extract_api([p1, p2], "LIG", [out])
    text = out.read_text()
    assert text.count("MODEL") == 2
    assert text.count("ENDMDL") == 2
    assert len(res["counts"]) == 2
    assert res["counts"][0]["kept_atoms"] == res["counts"][1]["kept_atoms"]


def test_guess_element():
    assert guess_element("OG", "SER") == "O"
    assert guess_element("1HB", "ALA") == "H"
    assert guess_element("ZN", "ZN") == "Zn"
    assert guess_element("FE1", "LIG") == "Fe"
    assert guess_element("SE", "MSE") == "Se"
    assert guess_element("H2", "HOH") == "H"


def test_assign_elements(tmp_path):
    pdb = tmp_path / "x.pdb"
    # strip element columns
    build_complex_pdb(pdb)
    lines = [ln[:76].rstrip() if ln.startswith(("ATOM", "HETATM")) else ln
             for ln in pdb.read_text().splitlines()]
    noelem = tmp_path / "noelem.pdb"
    noelem.write_text("\n".join(lines) + "\n")
    assert pdb_needs_elem_fix(noelem)
    summary = assign_elements(noelem, tmp_path / "fixed.pdb", verbose=False)
    assert summary["fixed"] == 22
    assert not pdb_needs_elem_fix(tmp_path / "fixed.pdb")
    st = io_pdb.read_pdb(tmp_path / "fixed.pdb")
    assert st.symbols.count("Zn") == 1
