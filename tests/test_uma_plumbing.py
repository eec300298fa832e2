"""UMA facade: checkpoint save/load roundtrip and fairchem-converter
plumbing (torch CPU is available in this image for reading .pt files)."""

import numpy as np
import pytest

from pdb2reaction_tpu.core.structure import Structure
from pdb2reaction_tpu.mlip.uma import (make_uma_calculator, save_checkpoint,
                                       load_checkpoint)


@pytest.fixture()
def water():
    return Structure.from_symbols(
        ["O", "H", "H"], [[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]])


def test_uma_calculator_deterministic(water):
    c1 = make_uma_calculator(water, model="small", charge=0, spin=1, seed=7)
    c2 = make_uma_calculator(water, model="small", charge=0, spin=1, seed=7)
    x = water.coords_bohr.reshape(-1)
    e1 = c1.get_energy(x)["energy"]
    e2 = c2.get_energy(x)["energy"]
    assert e1 == pytest.approx(e2, rel=1e-12)
    c3 = make_uma_calculator(water, model="small", charge=0, spin=1, seed=8)
    assert c3.get_energy(x)["energy"] != pytest.approx(e1, abs=1e-10)


def test_checkpoint_roundtrip(water, tmp_path):
    calc = make_uma_calculator(water, model="small", charge=0, spin=1,
                               seed=3)
    x = water.coords_bohr.reshape(-1)
    e_ref = calc.get_energy(x)["energy"]
    ckpt = tmp_path / "ckpt"
    save_checkpoint(ckpt, calc.params)
    calc2 = make_uma_calculator(water, model="small", charge=0, spin=1,
                                seed=99, checkpoint=str(ckpt))
    assert calc2.get_energy(x)["energy"] == pytest.approx(e_ref, rel=1e-10)


def test_convert_inspect_and_mapping(tmp_path):
    import torch
    from pdb2reaction_tpu.mlip.convert import (inspect_checkpoint,
                                               convert_state_dict)
    sd = {
        "module.backbone.sphere_embedding.weight": torch.randn(101, 8),
        "element_references.energy": torch.randn(101),
        "module.backbone.some_escn_block.weight": torch.randn(4, 4),
    }
    pt = tmp_path / "fake_uma.pt"
    torch.save({"state_dict": sd}, pt)
    inv = inspect_checkpoint(pt)
    assert inv["element_references.energy"] == (101,)
    mapped = convert_state_dict(pt, None)
    assert set(mapped) == {"embed_z", "atom_ref"}
    assert mapped["embed_z"].shape == (101, 8)


def test_convert_raises_on_unmappable(tmp_path):
    import torch
    from pdb2reaction_tpu.mlip.convert import convert_state_dict
    pt = tmp_path / "x.pt"
    torch.save({"state_dict": {"unrelated.weight": torch.zeros(2)}}, pt)
    with pytest.raises(ValueError, match="eSCN-MoE backbone"):
        convert_state_dict(pt, None)
