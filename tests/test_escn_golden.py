"""Recorded-golden eSCN fixture test (VERDICT r2 item 1 'done' criterion).

The fixture (tests/fixtures/escn_golden.npz, built by
scripts/make_escn_golden.py) carries a fairchem-style NAMED state dict plus
energies/forces produced by an INDEPENDENT executor — tests/numpy_escn.py:
scipy spherical harmonics, least-squares Wigner fits (not the
Ivanic-Ruedenberg recursion), finite-difference forces (no autodiff), no
imports from pdb2reaction_tpu.mlip or torch_escn.py.

This test takes the exact user-facing path a real checkpoint takes
(.pt file -> convert_checkpoint -> shape-inferred config -> JAX energy/
forces) and demands agreement with the independent goldens to the BASELINE
force-parity bar (<= 1e-6 eV/atom energies; forces to the FD golden's own
accuracy)."""

import dataclasses
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

FIXTURE = Path(__file__).parent / "fixtures" / "escn_golden.npz"


@pytest.fixture(scope="module")
def golden():
    return np.load(FIXTURE)


@pytest.fixture(scope="module")
def converted(golden, tmp_path_factory):
    from pdb2reaction_tpu.mlip.convert import convert_checkpoint
    sd = {k[3:]: torch.as_tensor(golden[k]) for k in golden.files
          if k.startswith("sd:")}
    pt = tmp_path_factory.mktemp("ckpt") / "golden.pt"
    torch.save({"state_dict": sd}, pt)
    params, cfg = convert_checkpoint(pt)
    return params, cfg


def test_inferred_config(converted):
    _, cfg = converted
    assert (cfg.lmax, cfg.mmax) == (2, 1)
    assert cfg.sphere_channels == 8 and cfg.num_layers == 2
    assert cfg.num_experts == 2
    # no gate tensors in the fixture -> the fairchem-faithful S2 variant
    assert cfg.edge_act == "s2"


@pytest.mark.parametrize("i", [0, 1, 2])
def test_energy_forces_vs_independent_golden(golden, converted, i):
    from pdb2reaction_tpu.core.structure import Structure, pad_to
    from pdb2reaction_tpu.mlip.escn import escn_energy

    params, cfg = converted
    cfg = dataclasses.replace(cfg, dtype=jnp.float64)
    numbers = golden[f"struct{i}_numbers"]
    coords = golden[f"struct{i}_coords"]
    q, s, t = (int(v) for v in golden[f"struct{i}_cqt"])
    e_ref = float(golden[f"struct{i}_energy"])
    f_ref = golden[f"struct{i}_forces"]

    st = Structure(numbers, coords)
    sysp = pad_to(st, multiple=8)
    p = dict(params)
    p["charge"] = jnp.asarray(q, jnp.float32)
    p["spin"] = jnp.asarray(s, jnp.float32)
    p["task"] = jnp.asarray(t, jnp.float32)

    def efn(c):
        return escn_energy(c, sysp, p, cfg)

    cpad = jnp.asarray(np.concatenate(
        [coords, np.zeros((sysp.n_pad - st.n_atoms, 3))]), jnp.float64)
    e, g = jax.value_and_grad(efn)(cpad)
    n = st.n_atoms
    assert abs(float(e) - e_ref) < 1e-6 * n
    # FD goldens are accurate to ~1e-7 (central differences, eps 1e-4)
    assert np.abs(-np.asarray(g)[:n] - f_ref).max() < 1e-5


def test_synonym_layouts_and_audit(golden, tmp_path):
    """Real-fairchem key spellings (module-list SO2 m-convs, nested
    embedding attributes, trainer prefixes, missing backbone namespace)
    normalize to the canonical map; audit_checkpoint reports ok."""
    import re
    from pdb2reaction_tpu.mlip.convert import (convert_checkpoint,
                                               audit_checkpoint)

    def rename(k):
        k = k[len("backbone."):]                      # drop namespace
        k = re.sub(r"\.fc_m(\d+)_r\.",
                   lambda m: f".so2_m_conv.{int(m.group(1)) - 1}.fc_r.", k)
        k = re.sub(r"\.fc_m(\d+)_i\.",
                   lambda m: f".so2_m_conv.{int(m.group(1)) - 1}.fc_i.", k)
        k = re.sub(r"(sphere|source|target|charge|spin|task)"
                   r"_embedding\.weight",
                   r"\1_embedding.embedding.weight", k)
        return "model." + k                           # trainer wrapper

    sd = {rename(k[3:]): torch.as_tensor(golden[k]) for k in golden.files
          if k.startswith("sd:")}
    pt = tmp_path / "fairchem_spelling.pt"
    torch.save({"state_dict": sd}, pt)

    params, cfg = convert_checkpoint(pt)
    assert (cfg.lmax, cfg.mmax) == (2, 1) and cfg.edge_act == "s2"
    ref = np.asarray(golden["sd:backbone.blocks.0.so2_conv_1.fc_m1_r.weight"])
    got = params["blocks"][0]["so2_conv_1"]["fc_m1_r"]["w"]
    assert np.allclose(got, ref.transpose(0, 2, 1))

    rep = audit_checkpoint(pt)
    assert rep["ok"], (rep["missing"], rep["unmapped"][:5])
    assert not rep["unmapped"]


class TestProductionDimsGolden:
    """Golden parity at the PRODUCTION operating point (VERDICT r4
    item 5): lmax=4/mmax=2, 128 sphere channels, 4 MoLE experts — the
    block structure escn-md/uma-s kernels actually run at, not the
    lmax=2/C=8 toy. The ~16M-param state dict is rebuilt deterministically
    from (MD_CFG, MD_SEED) in scripts/make_escn_golden.py (too large to
    commit); the committed fixture pins an RNG-stream fingerprint plus
    independent-numpy-executor energies/FD-forces."""

    @pytest.fixture(scope="class")
    def md(self):
        import sys
        scripts = Path(__file__).parents[1] / "scripts"
        sys.path.insert(0, str(scripts))
        try:
            from make_escn_golden import MD_CFG, MD_SEED, make_state_dict
        finally:
            sys.path.remove(str(scripts))
        g = np.load(Path(__file__).parent / "fixtures"
                    / "escn_golden_md.npz")
        sd = make_state_dict(MD_CFG, seed=int(g["cfg_seed"]))
        # loud diagnosis if the numpy default_rng stream ever drifts
        fp = np.array([float(np.sum(v)) for _, v in sorted(sd.items())][:8])
        np.testing.assert_allclose(fp, g["sd_fingerprint"], rtol=1e-12,
                                   err_msg="numpy RNG stream drift: "
                                   "regenerate escn_golden_md.npz")
        return g, sd, MD_CFG

    @pytest.fixture(scope="class")
    def md_converted(self, md, tmp_path_factory):
        from pdb2reaction_tpu.mlip.convert import convert_checkpoint
        g, sd, _ = md
        pt = tmp_path_factory.mktemp("ckpt_md") / "golden_md.pt"
        torch.save({"state_dict":
                    {k: torch.as_tensor(v) for k, v in sd.items()}}, pt)
        params, cfg = convert_checkpoint(pt)
        return params, cfg

    def test_inferred_config_at_production_dims(self, md_converted):
        _, cfg = md_converted
        assert (cfg.lmax, cfg.mmax) == (4, 2)
        assert cfg.sphere_channels == 128
        assert cfg.hidden_channels == 64
        assert cfg.num_experts == 4
        assert cfg.edge_act == "s2"

    @pytest.mark.parametrize("i", [0, 1])
    def test_energy_forces_vs_independent_golden_md(self, md, md_converted,
                                                    i):
        from pdb2reaction_tpu.core.structure import Structure, pad_to
        from pdb2reaction_tpu.mlip.escn import escn_energy

        g, _, _ = md
        params, cfg = md_converted
        cfg = dataclasses.replace(cfg, dtype=jnp.float64)
        numbers = g[f"struct{i}_numbers"]
        coords = g[f"struct{i}_coords"]
        q, s, t = (int(v) for v in g[f"struct{i}_cqt"])
        st = Structure(numbers, coords)
        sysp = pad_to(st, multiple=8)
        p = dict(params)
        p["charge"] = jnp.asarray(q, jnp.float32)
        p["spin"] = jnp.asarray(s, jnp.float32)
        p["task"] = jnp.asarray(t, jnp.float32)

        cpad = jnp.asarray(np.concatenate(
            [coords, np.zeros((sysp.n_pad - st.n_atoms, 3))]), jnp.float64)
        e, grad = jax.value_and_grad(
            lambda c: escn_energy(c, sysp, p, cfg))(cpad)
        n = st.n_atoms
        assert abs(float(e) - float(g[f"struct{i}_energy"])) < 1e-6 * n
        assert np.abs(-np.asarray(grad)[:n]
                      - g[f"struct{i}_forces"]).max() < 1e-5

    def test_pallas_mega_on_converted_weights_md(self, md, md_converted):
        """The converted production-dims params through the pallas-mega
        kernel chain (interpret mode on CPU, f32) must match the all-XLA
        f32 path on the SAME params — the exact route a real UMA
        checkpoint takes on TPU (mlip/uma.py make_uma_calculator)."""
        from pdb2reaction_tpu.core.structure import Structure, pad_to
        from pdb2reaction_tpu.mlip.escn import ESCN_FN_FOR

        g, _, _ = md
        params, cfg = md_converted
        numbers = g["struct1_numbers"]
        coords = g["struct1_coords"]
        st = Structure(numbers, coords)
        sysp = pad_to(st, multiple=8)
        # converted torch f64 tensors -> f32 for the f32 kernel chain
        p = jax.tree.map(
            lambda a: (jnp.asarray(a, jnp.float32)
                       if jnp.issubdtype(jnp.asarray(a).dtype,
                                         jnp.floating) else a),
            dict(params))
        p["charge"] = jnp.asarray(-1.0, jnp.float32)
        p["spin"] = jnp.asarray(2.0, jnp.float32)
        p["task"] = jnp.asarray(1.0, jnp.float32)
        cpad = jnp.asarray(np.concatenate(
            [coords, np.zeros((sysp.n_pad - st.n_atoms, 3))]), jnp.float32)

        outs = {}
        for tag, kern in (("xla", "xla"), ("mega", "pallas-mega")):
            fn = ESCN_FN_FOR(dataclasses.replace(cfg, edge_kernel=kern))
            e, grad = jax.value_and_grad(
                lambda c: fn(c, sysp, p))(cpad)
            outs[tag] = (float(e), np.asarray(grad)[:st.n_atoms])
        np.testing.assert_allclose(outs["mega"][0], outs["xla"][0],
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(outs["mega"][1], outs["xla"][1],
                                   rtol=1e-3, atol=2e-5)


def test_audit_reports_unmapped(golden, tmp_path):
    from pdb2reaction_tpu.mlip.convert import audit_checkpoint
    sd = {k[3:]: torch.as_tensor(golden[k]) for k in golden.files
          if k.startswith("sd:")}
    sd["backbone.some_new_fairchem_module.weight"] = torch.zeros(3, 3)
    pt = tmp_path / "drifted.pt"
    torch.save({"state_dict": sd}, pt)
    rep = audit_checkpoint(pt)
    assert not rep["ok"]
    assert "backbone.some_new_fairchem_module.weight" in rep["unmapped"]
