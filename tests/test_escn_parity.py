"""Weight-conversion parity: torch-CPU eSCN-MoE mirror -> convert -> JAX.

This is the round-trip every real fairchem checkpoint takes (SURVEY.md §4(b),
BASELINE.md force-parity bar): initialize the torch mirror (fairchem-style
state-dict names), export the state dict, convert with
``mlip.convert.convert_state_dict``, and demand JAX energies/forces match
torch autograd to <= 1e-6 eV(/atom) on >= 3 fixed structures spanning
charge/spin/task conditioning.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pdb2reaction_tpu.core.structure import Structure, pad_to  # noqa: E402
from pdb2reaction_tpu.mlip.convert import (convert_state_dict,  # noqa: E402
                                           infer_config)
from pdb2reaction_tpu.mlip.escn import ESCNConfig, escn_energy  # noqa: E402

from torch_escn import ESCNTorch  # noqa: E402

CFG = ESCNConfig(lmax=2, mmax=1, sphere_channels=8, hidden_channels=8,
                 edge_channels=8, ffn_hidden=16, num_layers=2,
                 num_experts=2, route_dim=4, num_gauss=8, max_z=20,
                 charge_range=4, spin_range=4, num_tasks=2,
                 max_neighbors=16, dtype=jnp.float64)


def _structures():
    rng = np.random.default_rng(7)
    water = (np.array([8, 1, 1], np.int32),
             np.array([[0.0, 0.0, 0.0], [0.96, 0.0, 0.0],
                       [-0.24, 0.93, 0.0]]), 0, 1, 0)
    organic = (np.array([6, 7, 8, 1, 1, 1, 16, 1], np.int32),
               rng.normal(scale=1.4, size=(8, 3)), 0, 1, 0)
    radical_anion = (np.array([6, 6, 8, 1, 1], np.int32),
                     rng.normal(scale=1.3, size=(5, 3)), -1, 2, 1)
    return [water, organic, radical_anion]


@pytest.fixture(scope="module")
def converted():
    model = ESCNTorch(CFG, seed=3)
    sd = model.state_dict()
    params = convert_state_dict(sd, CFG)
    return model, params


def test_infer_config_roundtrip(converted):
    model, _ = converted
    icfg = infer_config(model.state_dict(), dtype=jnp.float64)
    for field in ("lmax", "mmax", "sphere_channels", "hidden_channels",
                  "edge_channels", "ffn_hidden", "num_layers", "num_experts",
                  "route_dim", "num_gauss", "max_z", "charge_range",
                  "spin_range", "num_tasks"):
        assert getattr(icfg, field) == getattr(CFG, field), field


def test_energy_force_parity(converted):
    model, params = converted
    for zs, coords, q, s, task in _structures():
        st = Structure(zs, coords)
        sysp = pad_to(st, n_pad=st.n_atoms + 3)   # exercise padding masks

        p = dict(params)
        p["charge"] = jnp.asarray(q, jnp.float32)
        p["spin"] = jnp.asarray(s, jnp.float32)
        p["task"] = jnp.asarray(task, jnp.float32)

        cpad = jnp.asarray(sysp.coords, jnp.float64)
        e_j, g_j = jax.value_and_grad(
            lambda c: escn_energy(c, sysp, p, CFG))(cpad)
        f_j = -np.asarray(g_j)[: st.n_atoms]

        e_t, f_t = model.energy_forces(
            torch.as_tensor(zs, dtype=torch.long),
            torch.as_tensor(coords, dtype=torch.float64),
            charge=q, spin=s, task=task)

        de = abs(float(e_j) - float(e_t)) / st.n_atoms
        df = float(np.max(np.abs(f_j - f_t.numpy())))
        assert de < 1e-6, f"energy parity {de} eV/atom (q={q}, s={s})"
        assert df < 1e-6, f"force parity {df} eV/Ang (q={q}, s={s})"


def test_unconsumed_tensor_raises(converted):
    model, _ = converted
    sd = dict(model.state_dict())
    sd["backbone.mystery.weight"] = torch.zeros(3, 3)
    with pytest.raises(ValueError, match="not consumed"):
        convert_state_dict(sd, CFG)


def test_missing_tensor_raises(converted):
    model, _ = converted
    sd = dict(model.state_dict())
    del sd["backbone.blocks.1.so2_conv_1.fc_m0.weight"]
    with pytest.raises(KeyError):
        convert_state_dict(sd, CFG)


def _trees_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _variant_ddp(sd):
    """DDP wrapper: every key prefixed 'module.'."""
    return {f"module.{k}": v for k, v in sd.items()}


def _variant_trainer(sd):
    """Trainer wrapper: 'model.' prefix, doubly wrapped."""
    return {f"module.model.{k}": v for k, v in sd.items()}


def _variant_modulelist_so2(sd):
    """fairchem SO2_Convolution ModuleList spelling: fc_m{m}_r/_i ->
    so2_m_conv.{m-1}.fc_r/fc_i (docs/fairchem_name_map.md)."""
    import re
    out = {}
    for k, v in sd.items():
        k = re.sub(r"\.fc_m(\d+)_r\.",
                   lambda m: f".so2_m_conv.{int(m.group(1)) - 1}.fc_r.", k)
        k = re.sub(r"\.fc_m(\d+)_i\.",
                   lambda m: f".so2_m_conv.{int(m.group(1)) - 1}.fc_i.", k)
        out[k] = v
    return out


def _variant_inner_embedding(sd):
    """Embedding modules carrying an inner .embedding attribute."""
    import re
    return {re.sub(r"(sphere|source|target|charge|spin|task)"
                   r"_embedding\.weight",
                   lambda m: f"{m.group(1)}_embedding.embedding.weight", k): v
            for k, v in sd.items()}


def _variant_no_backbone(sd):
    """State dict exported from the bare backbone (no 'backbone.' ns)."""
    return {k[len("backbone."):] if k.startswith("backbone.") else k: v
            for k, v in sd.items()}


def _variant_container(sd):
    """{'state_dict': ...} checkpoint container."""
    return {"state_dict": dict(sd), "epoch": 3, "optimizer": None}


def _variant_everything(sd):
    return _variant_container(_variant_ddp(
        _variant_modulelist_so2(_variant_inner_embedding(
            _variant_no_backbone(sd)))))


@pytest.mark.parametrize("variant", [
    _variant_ddp, _variant_trainer, _variant_modulelist_so2,
    _variant_inner_embedding, _variant_no_backbone, _variant_container,
    _variant_everything,
])
def test_converter_synonym_layouts(converted, variant):
    """VERDICT r3 item 8 (in-image fallback): every plausible real-fairchem
    key layout — DDP/trainer prefixes, SO2 ModuleList spelling, inner
    .embedding attrs, bare-backbone namespace, state_dict containers, and
    all of them composed — must convert to the IDENTICAL params pytree and
    the identical shape-inferred config as the canonical layout."""
    model, params_ref = converted
    sd = variant(dict(model.state_dict()))
    icfg = infer_config(sd, dtype=jnp.float64)
    assert icfg.lmax == CFG.lmax and icfg.num_layers == CFG.num_layers
    params = convert_state_dict(sd, CFG)
    _trees_equal(params, params_ref)


def test_pt_checkpoint_through_calculator(tmp_path, converted):
    """The user-facing path: --checkpoint model.pt -> make_uma_calculator
    converts the fairchem-style state dict and serves forces matching the
    torch mirror."""
    from pdb2reaction_tpu.core.structure import Structure
    from pdb2reaction_tpu.mlip.uma import make_uma_calculator

    model, _ = converted
    pt = tmp_path / "uma_mirror.pt"
    torch.save({"state_dict": model.state_dict()}, pt)

    zs, coords, q, s, task = _structures()[0]
    st = Structure(zs, coords)
    calc = make_uma_calculator(st, charge=q, spin=s, checkpoint=str(pt))
    res = calc.get_forces(st.coords_bohr.reshape(-1))

    e_t, f_t = model.energy_forces(
        torch.as_tensor(zs, dtype=torch.long),
        torch.as_tensor(coords, dtype=torch.float64),
        charge=q, spin=s, task=0)
    from pdb2reaction_tpu.constants import EV2AU, F_EVAA_2_AU
    assert abs(res["energy"] - float(e_t) * EV2AU) < 1e-6
    np.testing.assert_allclose(
        res["forces"].reshape(-1, 3),
        f_t.numpy() * F_EVAA_2_AU, atol=1e-6)
