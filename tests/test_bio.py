import numpy as np
import pytest

from pdb2reaction_tpu.constants import ANG2BOHR
from pdb2reaction_tpu.core.structure import Structure
from pdb2reaction_tpu.bio.bonds import compare_structures, summarize_changes
from pdb2reaction_tpu.bio.align import (kabsch, align_coords, align_pair,
                                        align_sequence_inplace, rmsd)
from pdb2reaction_tpu.bio import residues


def test_bond_change_detection():
    # C-C bond migrates from atoms (0,1) to (1,2)
    numbers = [6, 6, 6]
    c1 = np.array([[0, 0, 0], [1.54, 0, 0], [5.0, 0, 0]]) * ANG2BOHR
    c2 = np.array([[0, 0, 0], [3.46, 0, 0], [5.0, 0, 0]]) * ANG2BOHR
    res = compare_structures(numbers, c1, c2)
    assert res.broken_covalent == {(0, 1)}
    assert res.formed_covalent == {(1, 2)}
    assert res.any_change
    s = summarize_changes(numbers, res)
    assert "formed" in s and "broken" in s and "C2-C3" in s


def test_bond_change_none():
    numbers = [8, 1]
    c = np.array([[0, 0, 0], [0.96, 0, 0]]) * ANG2BOHR
    res = compare_structures(numbers, c, c + 0.01)
    assert not res.any_change
    assert "No covalent bond changes" in summarize_changes(numbers, res)


def test_kabsch_recovers_rotation():
    rng = np.random.default_rng(1)
    P = rng.normal(size=(10, 3))
    th = 0.8
    R_true = np.array([[np.cos(th), -np.sin(th), 0],
                       [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    Q = P @ R_true + np.array([1.0, -2.0, 0.5])
    R, t = kabsch(P, Q)
    np.testing.assert_allclose(P @ R + t, Q, atol=1e-10)


def test_align_anchor_modes():
    rng = np.random.default_rng(2)
    ref = rng.normal(size=(6, 3))
    # full Kabsch via 3 anchors
    mob = ref @ np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]]) + 5.0
    out = align_coords(mob, ref, [0, 1, 2])
    assert rmsd(out, ref) < 1e-8
    # one anchor: translation only
    mob2 = ref + np.array([3.0, 0, 0])
    out2 = align_coords(mob2, ref, [4])
    np.testing.assert_allclose(out2, ref, atol=1e-10)
    # two anchors: axis aligned
    out3 = align_coords(mob, ref, [0, 5])
    np.testing.assert_allclose(out3[0], ref[0], atol=1e-8)
    np.testing.assert_allclose(out3[5], ref[5], atol=1e-8)


def test_align_sequence_freeze_union():
    rng = np.random.default_rng(3)
    base = rng.normal(size=(5, 3))
    s0 = Structure.from_symbols(["C"] * 5, base, freeze=[0, 1, 2])
    rot = np.array([[0, 0, 1], [1, 0, 0], [0, 1, 0.0]])
    s1 = Structure.from_symbols(["C"] * 5, base @ rot + 2.0, freeze=[0, 1, 2])
    align_sequence_inplace([s0, s1])
    np.testing.assert_allclose(s1.coords[:3], s0.coords[:3], atol=1e-8)


def test_residue_tables():
    assert residues.residue_formal_charge("ASP") == -1
    assert residues.residue_formal_charge("LYS") == 1
    assert residues.residue_formal_charge("HIP") == 1
    assert residues.residue_formal_charge("ZN") == 2
    assert residues.residue_formal_charge("CGLU") == -2
    assert residues.residue_formal_charge("NLYS") == 2
    assert residues.is_water("HOH") and residues.is_water("WAT")
    assert residues.is_amino_acid("SEP")
    assert residues.residue_formal_charge("XYZ") == 0
