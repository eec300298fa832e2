import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdb2reaction_tpu.constants import ANG2BOHR, EV2AU, F_EVAA_2_AU, H_EVAA_2_AU
from pdb2reaction_tpu.core.structure import Structure
from pdb2reaction_tpu.core.neighbors import dense_neighbors
from pdb2reaction_tpu.mlip.calculator import Calculator
from pdb2reaction_tpu.mlip import potentials
from pdb2reaction_tpu.parallel.mesh import make_mesh


def h2_structure(d_ang=0.9, freeze=()):
    return Structure.from_symbols(["H", "H"], [[0, 0, 0], [d_ang, 0, 0]],
                                  freeze=list(freeze))


def test_dense_neighbors():
    st = Structure.from_symbols(["H", "H", "H"],
                                [[0, 0, 0], [1, 0, 0], [5, 0, 0]])
    from pdb2reaction_tpu.core.structure import pad_to
    sys_ = pad_to(st, multiple=4)
    idx, mask = dense_neighbors(sys_.coords, sys_.atom_mask, 2.0, 4)
    # atom0 <-> atom1 only
    assert float(mask[0].sum()) == 1.0
    assert int(idx[0, 0]) == 1
    assert float(mask[2].sum()) == 0.0
    assert float(mask[3].sum()) == 0.0  # padding atom


def test_morse_energy_minimum():
    st = h2_structure(2 * 0.32)  # r_e = sum of covalent radii
    calc = Calculator(st, potentials.make_morse(De=4.0, a=2.0))
    res = calc.get_forces(st.coords_bohr.reshape(-1))
    # At the Morse minimum: E = -De (eV) and forces ~ 0
    assert res["energy"] == pytest.approx(-4.0 * EV2AU, rel=1e-6)
    np.testing.assert_allclose(res["forces"], 0.0, atol=1e-8)


def test_forces_match_fd():
    st = h2_structure(0.8)
    calc = Calculator(st, potentials.make_morse())
    x0 = st.coords_bohr.reshape(-1)
    res = calc.get_forces(x0)
    eps = 1e-5
    for k in range(6):
        xp = x0.copy(); xp[k] += eps
        xm = x0.copy(); xm[k] -= eps
        fd = -(calc.get_energy(xp)["energy"] - calc.get_energy(xm)["energy"]) / (2 * eps)
        assert res["forces"][k] == pytest.approx(fd, abs=1e-8)


def test_frozen_forces_zero():
    st = h2_structure(0.8, freeze=[0])
    calc = Calculator(st, potentials.make_morse())
    f = calc.get_forces(st.coords_bohr.reshape(-1))["forces"]
    np.testing.assert_allclose(f[:3], 0.0)
    assert np.abs(f[3:]).max() > 0


def test_analytic_vs_fd_hessian():
    st = h2_structure(0.85)
    calc_a = Calculator(st, potentials.make_morse(), hessian_calc_mode="Analytical")
    calc_f = Calculator(st, potentials.make_morse(), hessian_calc_mode="FiniteDifference")
    x0 = st.coords_bohr.reshape(-1)
    Ha = calc_a.get_hessian(x0)["hessian"]
    Hf = calc_f.get_hessian(x0)["hessian"]
    assert Ha.shape == (6, 6)
    np.testing.assert_allclose(Ha, Hf, atol=1e-5)
    # symmetric
    np.testing.assert_allclose(Ha, Ha.T, atol=1e-10)


def test_partial_hessian_frozen():
    st = h2_structure(0.85, freeze=[0])
    calc = Calculator(st, potentials.make_morse(),
                      return_partial_hessian=True)
    H = calc.get_hessian(st.coords_bohr.reshape(-1))["hessian"]
    assert H.shape == (3, 3)
    calc2 = Calculator(st, potentials.make_morse())
    H2 = calc2.get_hessian(st.coords_bohr.reshape(-1))["hessian"]
    assert H2.shape == (6, 6)
    np.testing.assert_allclose(H2[:3, :], 0.0)   # frozen rows zeroed
    np.testing.assert_allclose(H2[:, :3], 0.0)


def test_batched_forces_sharded():
    st = h2_structure(0.9)
    mesh = make_mesh(data=8)
    calc = Calculator(st, potentials.make_morse(), mesh=mesh)
    B = 16
    base = st.coords_bohr.reshape(-1)
    batch = np.stack([base + 0.01 * k for k in range(B)])
    res = calc.get_forces_batch(batch)
    assert res["energy"].shape == (B,)
    assert res["forces"].shape == (B, 6)
    # consistency with serial path
    single = calc.get_forces(batch[3])
    assert res["energy"][3] == pytest.approx(single["energy"], rel=1e-12)
    np.testing.assert_allclose(res["forces"][3], single["forces"], atol=1e-12)
    assert calc.force_calls == B + 1


def test_tensor_parallel_inference_identical():
    """model=2 tensor-parallel inference must reproduce the replicated
    results exactly (VERDICT #10 'done' criterion) — the single-structure
    scale-out replacing the reference's Ray fan-out (uma_pysis.py:234-242)."""
    from pdb2reaction_tpu.core.structure import Structure
    from pdb2reaction_tpu.mlip.uma import make_uma_calculator

    rng = np.random.default_rng(9)
    zs = np.array([6, 1, 1, 8, 1, 7, 1, 1], np.int32)
    st = Structure(zs, rng.normal(scale=1.3, size=(8, 3)))

    ref = make_uma_calculator(st, model="small", charge=0, spin=1, seed=2)
    base = st.coords_bohr.reshape(-1)
    r0 = ref.get_forces(base)

    mesh = make_mesh(data=4, model=2)
    tp = make_uma_calculator(st, model="small", charge=0, spin=1, seed=2,
                             mesh=mesh)
    tp.shard_params_model()
    r1 = tp.get_forces(base)
    # f32 model params: partitioned reductions reorder float sums, so
    # identity holds to f32 epsilon
    assert r1["energy"] == pytest.approx(r0["energy"], rel=1e-6)
    np.testing.assert_allclose(r1["forces"], r0["forces"], atol=1e-8)
    # batched path through the same sharded params
    batch = np.stack([base, base + 0.01])
    rb = tp.get_forces_batch(batch)
    assert rb["energy"][0] == pytest.approx(r0["energy"], rel=1e-6)


def test_mesh_sharded_analytic_hessian():
    """The analytic-HVP Hessian shards its tangent batch over the mesh
    data axis and matches the single-device result."""
    st = Structure.from_symbols(
        ["O", "H", "H"], [[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]])
    c0 = Calculator(st, potentials.make_morse())
    cm = Calculator(st, potentials.make_morse(), mesh=make_mesh(data=8))
    x0 = st.coords_bohr.reshape(-1)
    H0 = c0.get_hessian(x0)["hessian"]
    H1 = cm.get_hessian(x0)["hessian"]
    np.testing.assert_allclose(H1, H0, rtol=1e-10, atol=1e-12)
