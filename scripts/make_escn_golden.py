"""Generate the independent eSCN golden fixture (VERDICT r2 item 1).

Builds a small fairchem-style NAMED state dict with numpy RNG, runs the
INDEPENDENT numpy re-execution (tests/numpy_escn.py — scipy spherical
harmonics, least-squares Wigner fits, finite-difference forces; no JAX, no
torch autograd, no imports from pdb2reaction_tpu.mlip), and records
energies/forces for structures spanning charge/spin/task conditioning.

Output: tests/fixtures/escn_golden.npz
- ``sd:<name>``: state-dict tensors under their fairchem-style names
- ``struct{i}_numbers`` / ``struct{i}_coords`` / ``struct{i}_cqt``
- ``struct{i}_energy`` / ``struct{i}_forces`` (eV, eV/A; forces by
  central FD, eps 1e-4 A, float64)

Run: PYTHONPATH=.:tests python scripts/make_escn_golden.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
from numpy_escn import NpConfig, NpESCN  # noqa: E402

CFG = NpConfig(lmax=2, mmax=1, sphere_channels=8, hidden_channels=8,
               edge_channels=8, ffn_hidden=16, num_layers=2,
               num_experts=2, route_dim=4, num_gauss=8, cutoff=6.0,
               max_neighbors=16, max_z=20, charge_range=4, spin_range=4,
               num_tasks=2, avg_degree=12.0)

# Production-operating-point fixture (VERDICT r4 item 5): the block
# structure and channel width that escn-md/uma-s actually run at —
# lmax=4/mmax=2, 128 sphere channels, >=4 MoLE experts — so conversion +
# kernel parity is proven where the kernels operate, not just at the
# lmax=2/C=8 toy. Layers/ffn/edge dims are reduced to keep the state
# dict ~16M params: it is NOT stored in the fixture — the test rebuilds
# it deterministically from MD_SEED via make_state_dict (same numpy
# default_rng stream; the committed goldens pin the stream, so an RNG
# drift across numpy versions fails loudly rather than silently).
MD_CFG = NpConfig(lmax=4, mmax=2, sphere_channels=128, hidden_channels=64,
                  edge_channels=32, ffn_hidden=128, num_layers=2,
                  num_experts=4, route_dim=8, num_gauss=16, cutoff=6.0,
                  max_neighbors=16, max_z=20, charge_range=4, spin_range=4,
                  num_tasks=2, avg_degree=12.0)
MD_SEED = 23


def make_state_dict(cfg: NpConfig, seed=11):
    rng = np.random.default_rng(seed)

    def t(*shape, scale=None):
        s = scale if scale is not None else 1.0 / np.sqrt(shape[-1])
        return rng.normal(scale=s, size=shape)

    C, h, Ce = cfg.sphere_channels, cfg.hidden_channels, cfg.edge_channels
    E, rd, G = cfg.num_experts, cfg.route_dim, cfg.num_gauss
    nl0 = cfg.lmax + 1
    sd = {
        "backbone.sphere_embedding.weight": t(cfg.max_z + 1, C, scale=0.5),
        "backbone.source_embedding.weight": t(cfg.max_z + 1, Ce, scale=0.5),
        "backbone.target_embedding.weight": t(cfg.max_z + 1, Ce, scale=0.5),
        "backbone.charge_embedding.weight": t(2 * cfg.charge_range + 1, rd,
                                              scale=0.5),
        "backbone.spin_embedding.weight": t(cfg.spin_range + 1, rd,
                                            scale=0.5),
        "backbone.task_embedding.weight": t(cfg.num_tasks, rd, scale=0.5),
        "backbone.router.0.weight": t(rd, 3 * rd),
        "backbone.router.0.bias": t(rd, scale=0.1),
        "backbone.router.1.weight": t(E, rd),
        "backbone.router.1.bias": t(E, scale=0.1),
        "backbone.edge_mlp.0.weight": t(Ce, 2 * Ce + G),
        "backbone.edge_mlp.0.bias": t(Ce, scale=0.1),
        "backbone.edge_mlp.1.weight": t(Ce, Ce),
        "backbone.edge_mlp.1.bias": t(Ce, scale=0.1),
        "backbone.edge_degree_proj.weight": t(E, nl0 * C, Ce),
        "backbone.edge_degree_proj.bias": t(E, nl0 * C, scale=0.1),
        "backbone.energy_norm.weight": 1.0 + 0.1 * t(nl0, C, scale=1.0),
        "backbone.energy_head.0.weight": t(E, C, C),
        "backbone.energy_head.0.bias": t(E, C, scale=0.1),
        "backbone.energy_head.1.weight": t(E, 1, C),
        "backbone.energy_head.1.bias": t(E, 1, scale=0.1),
        "backbone.atom_ref": t(cfg.max_z + 1, scale=1.0),
    }
    for i in range(cfg.num_layers):
        b = f"backbone.blocks.{i}"
        sd[f"{b}.norm_1.weight"] = 1.0 + 0.1 * t(nl0, C, scale=1.0)
        sd[f"{b}.norm_2.weight"] = 1.0 + 0.1 * t(nl0, C, scale=1.0)
        d0 = nl0 * 2 * C + Ce
        sd[f"{b}.so2_conv_1.fc_m0.weight"] = t(E, nl0 * h, d0)
        sd[f"{b}.so2_conv_1.fc_m0.bias"] = t(E, nl0 * h, scale=0.1)
        for m in range(1, cfg.mmax + 1):
            nl = cfg.lmax + 1 - m
            for ri in ("r", "i"):
                sd[f"{b}.so2_conv_1.fc_m{m}_{ri}.weight"] = \
                    t(E, nl * h, nl * 2 * C)
                sd[f"{b}.so2_conv_1.fc_m{m}_{ri}.bias"] = \
                    t(E, nl * h, scale=0.1)
        sd[f"{b}.so2_conv_2.fc_m0.weight"] = t(E, nl0 * C, nl0 * h)
        sd[f"{b}.so2_conv_2.fc_m0.bias"] = t(E, nl0 * C, scale=0.1)
        for m in range(1, cfg.mmax + 1):
            nl = cfg.lmax + 1 - m
            for ri in ("r", "i"):
                sd[f"{b}.so2_conv_2.fc_m{m}_{ri}.weight"] = \
                    t(E, nl * C, nl * h)
                sd[f"{b}.so2_conv_2.fc_m{m}_{ri}.bias"] = \
                    t(E, nl * C, scale=0.1)
        sd[f"{b}.ffn.w1.weight"] = t(E, cfg.ffn_hidden, C)
        sd[f"{b}.ffn.w1.bias"] = t(E, cfg.ffn_hidden, scale=0.1)
        sd[f"{b}.ffn.w2.weight"] = t(E, C, cfg.ffn_hidden)
        sd[f"{b}.ffn.w2.bias"] = t(E, C, scale=0.1)
    return sd


def structures():
    rng = np.random.default_rng(7)
    # NOTE: coordinates must be GENERIC (no exact zeros/symmetries): the
    # edge-frame gauge rule argmin(|d_hat|) is discontinuous on
    # measure-zero sets, and at SO3_Grid(lmax, mmax) resolution the S2
    # activation is gauge-dependent at the aliasing level — an FD stencil
    # straddling a gauge flip reads that jump as a spurious force
    # (observed 5e-2 on planar water with exact zeros).
    return [
        (np.array([8, 1, 1], np.int32),
         np.array([[0.0, 0.0, 0.0], [0.96, 0.0, 0.0],
                   [-0.24, 0.93, 0.0]])
         + rng.normal(scale=0.05, size=(3, 3)), (0, 1, 0)),
        (np.array([6, 7, 8, 1, 1, 1, 16, 1], np.int32),
         rng.normal(scale=1.4, size=(8, 3)), (0, 1, 0)),
        (np.array([6, 6, 8, 1, 1], np.int32),
         rng.normal(scale=1.3, size=(5, 3)), (-1, 2, 1)),
    ]


def main():
    sd = make_state_dict(CFG)
    model = NpESCN(sd, CFG)
    out = {f"sd:{k}": v for k, v in sd.items()}
    for i, (numbers, coords, (q, s, t)) in enumerate(structures()):
        e = model.energy(numbers, coords, charge=q, spin=s, task=t)
        f = model.forces_fd(numbers, coords, charge=q, spin=s, task=t)
        print(f"struct{i}: n={len(numbers)} q={q} s={s} t={t} "
              f"E={e:.10f} |F|max={np.abs(f).max():.6f}")
        out[f"struct{i}_numbers"] = numbers
        out[f"struct{i}_coords"] = coords
        out[f"struct{i}_cqt"] = np.array([q, s, t])
        out[f"struct{i}_energy"] = np.array(e)
        out[f"struct{i}_forces"] = f
    dest = Path(__file__).resolve().parents[1] / "tests" / "fixtures"
    dest.mkdir(exist_ok=True)
    np.savez_compressed(dest / "escn_golden.npz", **out)
    print(f"wrote {dest / 'escn_golden.npz'}")


def md_structures():
    rng = np.random.default_rng(31)
    # generic coordinates only — see the gauge-flip note in structures()
    return [
        (np.array([8, 1, 1], np.int32),
         np.array([[0.0, 0.0, 0.0], [0.96, 0.0, 0.0],
                   [-0.24, 0.93, 0.0]])
         + rng.normal(scale=0.05, size=(3, 3)), (0, 1, 0)),
        (np.array([6, 7, 8, 1, 1, 16], np.int32),
         rng.normal(scale=1.4, size=(6, 3)), (-1, 2, 1)),
    ]


def main_md():
    """Goldens at the production operating point. The state dict is NOT
    stored (would be ~65 MB compressed): the consumer rebuilds it from
    (MD_CFG, MD_SEED). A fingerprint of the rebuilt dict is stored so an
    RNG-stream drift is diagnosed loudly."""
    sd = make_state_dict(MD_CFG, seed=MD_SEED)
    model = NpESCN(sd, MD_CFG)
    out = {
        "cfg_seed": np.array(MD_SEED),
        "sd_fingerprint": np.array(
            [float(np.sum(v)) for _, v in sorted(sd.items())][:8]),
        "sd_total_sum": np.array(
            sum(float(np.sum(v)) for v in sd.values())),
    }
    for i, (numbers, coords, (q, s, t)) in enumerate(md_structures()):
        e = model.energy(numbers, coords, charge=q, spin=s, task=t)
        f = model.forces_fd(numbers, coords, charge=q, spin=s, task=t)
        print(f"md struct{i}: n={len(numbers)} q={q} s={s} t={t} "
              f"E={e:.10f} |F|max={np.abs(f).max():.6f}")
        out[f"struct{i}_numbers"] = numbers
        out[f"struct{i}_coords"] = coords
        out[f"struct{i}_cqt"] = np.array([q, s, t])
        out[f"struct{i}_energy"] = np.array(e)
        out[f"struct{i}_forces"] = f
    dest = Path(__file__).resolve().parents[1] / "tests" / "fixtures"
    dest.mkdir(exist_ok=True)
    np.savez_compressed(dest / "escn_golden_md.npz", **out)
    print(f"wrote {dest / 'escn_golden_md.npz'}")


if __name__ == "__main__":
    if "--md" in sys.argv:
        main_md()
    else:
        main()
