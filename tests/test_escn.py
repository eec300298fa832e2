"""eSCN-MoE backbone: symmetry properties + calculator integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pdb2reaction_tpu.core.structure import Structure, pad_to
from pdb2reaction_tpu.mlip.escn import (ESCN_CONFIGS, ESCNConfig,
                                        make_escn_model)
from pdb2reaction_tpu.mlip.so3 import (edge_rot_mat, real_sph_harm,
                                       s2_grid_tables, wigner_full,
                                       num_coeffs)


def _random_rot(rng):
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def test_wigner_matches_sph_harm():
    rng = np.random.default_rng(0)
    lmax = 3
    Q = _random_rot(rng)
    x = rng.normal(size=(4, 3))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    D = np.asarray(wigner_full(jnp.asarray(Q), lmax))
    assert np.abs(real_sph_harm(lmax, x @ Q.T)
                  - real_sph_harm(lmax, x) @ D.T).max() < 1e-12
    assert np.abs(D @ D.T - np.eye(num_coeffs(lmax))).max() < 1e-12


def test_edge_frame_z_aligned():
    rng = np.random.default_rng(1)
    v = rng.normal(size=(6, 3))
    R = np.asarray(edge_rot_mat(jnp.asarray(v)))
    d = v / np.linalg.norm(v, axis=1, keepdims=True)
    assert np.abs(np.einsum("eij,ej->ei", R, d)
                  - np.array([0.0, 0.0, 1.0])).max() < 1e-12
    assert np.abs(np.linalg.det(R) - 1.0).max() < 1e-12


def test_s2_grid_roundtrip():
    lmax = 4
    tg, fg = s2_grid_tables(lmax)
    rng = np.random.default_rng(2)
    c = rng.normal(size=(num_coeffs(lmax),))
    assert np.abs(fg @ (tg @ c) - c).max() < 1e-12


def test_s2_grid_midpoint_roundtrip():
    """Driscoll-Healy midpoint tables (the fairchem/e3nn grid convention
    used by the per-edge S2 activation) are exact quadratures too — on the
    |m| <= mmax subspace at SO3_Grid(lmax, mmax) resolution."""
    from pdb2reaction_tpu.mlip.so3 import s2_grid_tables_midpoint
    from pdb2reaction_tpu.mlip.escn import _used_indices
    for lmax, mmax in [(2, 1), (4, 2), (2, 2)]:
        tg, fg = s2_grid_tables_midpoint(lmax, 2 * (lmax + 1),
                                         2 * mmax + 1)
        used = _used_indices(lmax, mmax)
        eye = fg[used, :] @ tg[:, used]
        assert np.abs(eye - np.eye(len(used))).max() < 1e-12


def _escn_setup(name, **model_kw):
    rng = np.random.default_rng(3)
    zs = np.array([8, 1, 1, 6, 1, 1], np.int32)
    st = Structure(zs, rng.normal(scale=1.4, size=(6, 3)))
    sysp = pad_to(st, n_pad=10)
    cfg = ESCN_CONFIGS[name]
    import dataclasses
    cfg = dataclasses.replace(cfg, dtype=jnp.float64)
    fn, params, cfg = make_escn_model(cfg, seed=0, **model_kw)
    return st, sysp, fn, params


@pytest.fixture(scope="module")
def escn_setup():
    return _escn_setup("escn-test")


@pytest.mark.parametrize("name,rot_tol", [
    # gate variant: only the oversampled node-FFN grid aliases (~1e-7)
    ("escn-test-gate", 5e-5),
    # s2 variant: the per-edge activation aliases at fairchem's
    # SO3_Grid(lmax, mmax) resolution — inherent to the architecture
    # (fairchem weights are trained through it). Verified to be pure
    # grid aliasing: doubling the grid shrinks the error 200x
    # (2.7e-3 -> 1.2e-5); at this coarse lmax=2/mmax=1 test config with
    # untrained random weights the gradient error reaches ~7e-2.
    ("escn-test", 1e-1),
])
def test_escn_symmetries(name, rot_tol):
    st, sysp, fn, params = _escn_setup(name)
    rng = np.random.default_rng(4)
    c0 = jnp.asarray(sysp.coords, jnp.float64)
    e0, g0 = jax.value_and_grad(lambda c: fn(c, sysp, params))(c0)

    # exact translation invariance
    e_t = fn(c0 + 3.3, sysp, params)
    assert abs(float(e0) - float(e_t)) < 1e-12

    # exact padding invariance (padded-slot coords must not matter)
    cpad = np.array(sysp.coords)
    cpad[st.n_atoms:] += 2.5
    e_p = fn(jnp.asarray(cpad), sysp, params)
    assert abs(float(e0) - float(e_p)) < 1e-12

    Q = _random_rot(rng)
    e_r, g_r = jax.value_and_grad(
        lambda c: fn(c, sysp, params))(jnp.asarray(sysp.coords @ Q.T))
    rot_err = abs(float(e0) - float(e_r))
    assert rot_err < rot_tol
    assert np.abs(np.asarray(g_r) - np.asarray(g0) @ Q.T).max() < rot_tol

    if name == "escn-test":
        # Pin that the (loose) s2 rotation error really is grid aliasing,
        # not an implementation bug: tripling the edge-grid resolution
        # must shrink it dramatically (a broken from-grid row would leave
        # an O(1) violation at any resolution).
        import dataclasses
        from pdb2reaction_tpu.mlip.escn import ESCN_CONFIGS, ESCN_FN_FOR
        cfg3 = dataclasses.replace(ESCN_CONFIGS[name], dtype=jnp.float64,
                                   edge_grid_scale=3)
        _fn3 = ESCN_FN_FOR(cfg3)
        fn3 = jax.jit(lambda c: _fn3(c, sysp, params))
        e0_3 = fn3(c0)
        e_r3 = fn3(jnp.asarray(sysp.coords @ Q.T))
        err3 = abs(float(e0_3) - float(e_r3))
        assert err3 < max(rot_err / 50.0, 1e-10), (rot_err, err3)


def test_escn_through_calculator():
    rng = np.random.default_rng(5)
    zs = np.array([6, 1, 1, 8], np.int32)
    st = Structure(zs, rng.normal(scale=1.2, size=(4, 3)))
    from pdb2reaction_tpu.mlip.uma import make_uma_calculator
    calc = make_uma_calculator(st, model="escn-test", charge=0, spin=1,
                               freeze_atoms=[0])
    c = st.coords_bohr.reshape(-1)
    res = calc.get_forces(c)
    f = res["forces"].reshape(-1, 3)
    assert np.all(f[0] == 0.0)            # frozen atom zeroed
    assert np.any(f[1:] != 0.0)
    assert calc.force_calls == 1
    batch = calc.get_forces_batch(np.stack([c, c]))
    assert np.allclose(batch["energy"][0], res["energy"], atol=1e-12)


@pytest.mark.parametrize("kernel", ["pallas", "pallas-full",
                                    "pallas-mega"])
def test_edge_kernel_pallas_parity(kernel):
    """Fused Pallas edge chains (escn_edge_kernel.py: "pallas" = conv
    chain fused; "pallas-full" = rotations + chain + envelope fused;
    "pallas-mega" = node-resident with one-hot gather/K-sum fused too) vs
    the XLA path: exact in f32 interpret mode (CPU) — energies, forces,
    and the weight-cotangent XLA-replay path (training grads)."""
    import dataclasses
    import jax.tree_util as jtu
    rng = np.random.default_rng(3)
    zs = np.array([8, 1, 1, 6, 1, 1], np.int32)
    st = Structure(zs, rng.normal(scale=1.4, size=(6, 3)))
    sysp = pad_to(st, n_pad=8)
    cfg = ESCN_CONFIGS["escn-test"]
    fn_x, p, _ = make_escn_model(cfg, seed=0)
    fn_p, _, _ = make_escn_model(
        dataclasses.replace(cfg, edge_kernel=kernel), seed=0)
    # perturb params so biases are nonzero (the effective-bias combination
    # for the +-m pairs is part of what this pins)
    k = jax.random.PRNGKey(9)
    leaves, tree = jtu.tree_flatten(p)
    keys = jax.random.split(k, len(leaves))
    p = jtu.tree_unflatten(tree, [
        l + 0.05 * jax.random.normal(kk, l.shape, l.dtype)
        if l.dtype == jnp.float32 else l
        for l, kk in zip(leaves, keys)])
    c = jnp.asarray(sysp.coords, jnp.float32)
    e_x, g_x = jax.value_and_grad(lambda cc: fn_x(cc, sysp, p))(c)
    e_p, g_p = jax.value_and_grad(lambda cc: fn_p(cc, sysp, p))(c)
    assert abs(float(e_x) - float(e_p)) < 1e-5
    assert np.abs(np.asarray(g_x) - np.asarray(g_p)).max() < 1e-5
    ge_x = jax.grad(lambda pp: fn_x(c, sysp, pp))(p)
    ge_p = jax.grad(lambda pp: fn_p(c, sysp, pp))(p)
    m = max(np.abs(np.asarray(a) - np.asarray(b)).max()
            for a, b in zip(jtu.tree_leaves(ge_x), jtu.tree_leaves(ge_p)))
    assert m < 1e-5


def test_node_ffn_kernel_parity():
    """fused_node_ffn (escn_ffn_kernel.py) vs the XLA chain: exact in f32
    interpret mode — values, input cotangents (mirrored Pallas bwd
    kernel), and weight cotangents (XLA replay)."""
    from pdb2reaction_tpu.mlip.escn_ffn_kernel import (ffn_xla,
                                                       fused_node_ffn)
    rng = np.random.default_rng(7)
    P, M, C, H, G = 11, 9, 8, 16, 30       # odd P exercises node padding
    x = jnp.asarray(rng.normal(size=(P, M, C)), jnp.float32)
    W1 = jnp.asarray(rng.normal(size=(C, H)) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(H,)) * 0.1, jnp.float32)
    W2 = jnp.asarray(rng.normal(size=(H, C)) * 0.3, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    tg = jnp.asarray(rng.normal(size=(G, M)), jnp.float32)
    fg = jnp.asarray(rng.normal(size=(M, G)) / G, jnp.float32)
    weights = (W1, b1, W2, b2)
    tables = (tg, fg)
    cfg = ESCN_CONFIGS["escn-test"]

    y_ref = ffn_xla(x, weights, tables)
    y = fused_node_ffn(cfg, x, weights, tables)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)

    ct = jnp.asarray(rng.normal(size=(P, M, C)), jnp.float32)
    gx_ref, gw_ref = jax.grad(
        lambda xx, ww: jnp.sum(ffn_xla(xx, ww, tables) * ct),
        argnums=(0, 1))(x, weights)
    gx, gw = jax.grad(
        lambda xx, ww: jnp.sum(fused_node_ffn(cfg, xx, ww, tables) * ct),
        argnums=(0, 1))(x, weights)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(gw, gw_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_premerge_exact():
    """premerge_escn_params produces numerically identical energies,
    forces, and Hessian-vector products (the merge is linear and fixed
    per system), and the calculator premerges by default."""
    from pdb2reaction_tpu.mlip.escn import premerge_escn_params
    st, sysp, fn, params = _escn_setup("escn-test", charge=-1, spin=2)
    pm = premerge_escn_params(params, ESCN_CONFIGS["escn-test"])
    assert pm["energy_head"][0]["w"].ndim == 2
    assert params["energy_head"][0]["w"].ndim == 3     # input untouched
    c0 = jnp.asarray(sysp.coords, jnp.float64)
    e0, g0 = jax.value_and_grad(lambda c: fn(c, sysp, params))(c0)
    e1, g1 = jax.value_and_grad(lambda c: fn(c, sysp, pm))(c0)
    assert abs(float(e0) - float(e1)) < 1e-12
    assert np.abs(np.asarray(g0) - np.asarray(g1)).max() < 1e-12

    # calculator integration: premerged by default, opt-out honored
    from pdb2reaction_tpu.mlip.uma import make_uma_calculator
    rng = np.random.default_rng(7)
    st2 = Structure(np.array([6, 1, 8], np.int32),
                    rng.normal(scale=1.3, size=(3, 3)))
    calc = make_uma_calculator(st2, model="escn-test", charge=-1, spin=2)
    assert calc.params["energy_head"][0]["w"].ndim == 2
    import os
    os.environ["PDB2R_TPU_NO_PREMERGE"] = "1"
    try:
        calc2 = make_uma_calculator(st2, model="escn-test", charge=-1,
                                    spin=2)
    finally:
        del os.environ["PDB2R_TPU_NO_PREMERGE"]
    assert calc2.params["energy_head"][0]["w"].ndim == 3
    cb = st2.coords_bohr.reshape(-1)
    r1 = calc.get_forces(cb)
    r2 = calc2.get_forces(cb)
    assert abs(r1["energy"] - r2["energy"]) < 1e-12
    assert np.abs(r1["forces"] - r2["forces"]).max() < 1e-12
    h1 = calc.get_hessian(cb)["hessian"]
    h2 = calc2.get_hessian(cb)["hessian"]
    assert np.abs(np.asarray(h1) - np.asarray(h2)).max() < 1e-10


@pytest.mark.parametrize("kernel", ["pallas", "pallas-full",
                                    "pallas-mega"])
def test_edge_kernel_parity_md_shape(kernel):
    """Every fused edge kernel at the PRODUCTION escn-md SHAPE (lmax=4,
    mmax=2 — same (nl0, nls, U, G, nnz) block structure and Wigner tables
    as escn-md, channels shrunk for CPU interpret mode; P=16 so the mega
    forward and backward run DIFFERENT tile sizes, A=16 vs A=8) vs the
    XLA path: values and coordinate gradients. The small escn-test shape
    (lmax=2, mmax=1, P=8) cannot exercise the m=2 conv blocks, the lmax=4
    rotation packing, or mismatched fwd/bwd tiles — a saved-tensor layout
    that baked the forward tile size into its columns passed that test
    while producing 0.33-absolute wrong gradients here."""
    import dataclasses
    import jax.tree_util as jtu
    rng = np.random.default_rng(11)
    zs = rng.choice([1, 6, 7, 8], size=12).astype(np.int32)
    st = Structure(zs, rng.normal(scale=1.6, size=(12, 3)))
    sysp = pad_to(st, n_pad=16)
    cfg = dataclasses.replace(
        ESCN_CONFIGS["escn-md"], sphere_channels=8, hidden_channels=8,
        edge_channels=8, ffn_hidden=16, num_layers=2, num_experts=2,
        route_dim=4, num_gauss=8, max_neighbors=8)
    fn_x, p, _ = make_escn_model(cfg, seed=0)
    fn_p, _, _ = make_escn_model(
        dataclasses.replace(cfg, edge_kernel=kernel), seed=0)
    k = jax.random.PRNGKey(13)
    leaves, tree = jtu.tree_flatten(p)
    keys = jax.random.split(k, len(leaves))
    p = jtu.tree_unflatten(tree, [
        l + 0.05 * jax.random.normal(kk, l.shape, l.dtype)
        if l.dtype == jnp.float32 else l
        for l, kk in zip(leaves, keys)])
    c = jnp.asarray(sysp.coords, jnp.float32)
    e_x, g_x = jax.value_and_grad(lambda cc: fn_x(cc, sysp, p))(c)
    e_p, g_p = jax.value_and_grad(lambda cc: fn_p(cc, sysp, p))(c)
    assert abs(float(e_x) - float(e_p)) < 1e-5
    assert np.abs(np.asarray(g_x) - np.asarray(g_p)).max() < 1e-5


def test_mega_kernel_multi_fwd_tile():
    """pallas-mega with MULTIPLE forward tiles (P=64, A=32 -> 2 fwd
    tiles; bwd A=8 -> 8 tiles): pins the cross-tile node accumulation
    (out_ref += per tile) and the staged A-block one-hots at i > 0.
    Uses the cheap escn-test shape — the md-shape test covers the block
    structure, this one covers the grid dimension."""
    import dataclasses
    rng = np.random.default_rng(21)
    n = 50
    zs = rng.choice([1, 6, 8], size=n).astype(np.int32)
    pts = np.stack(np.meshgrid(*[np.arange(4)] * 3), -1).reshape(-1, 3)
    st = Structure(zs, pts[:n] * 1.7 + rng.normal(scale=0.1, size=(n, 3)))
    sysp = pad_to(st, n_pad=64)
    cfg = ESCN_CONFIGS["escn-test"]
    fn_x, p, _ = make_escn_model(cfg, seed=1)
    fn_p, _, _ = make_escn_model(
        dataclasses.replace(cfg, edge_kernel="pallas-mega"), seed=1)
    c = jnp.asarray(sysp.coords, jnp.float32)
    e_x, g_x = jax.value_and_grad(lambda cc: fn_x(cc, sysp, p))(c)
    e_p, g_p = jax.value_and_grad(lambda cc: fn_p(cc, sysp, p))(c)
    assert abs(float(e_x) - float(e_p)) < 1e-5 * max(1.0, abs(float(e_x)))
    assert np.abs(np.asarray(g_x) - np.asarray(g_p)).max() < 1e-5


def test_escn_hessian_routing_with_pallas_kernel():
    """With a Pallas edge kernel active, the calculator's analytic
    Hessian MUST route through the all-XLA variant (mlip/uma.py builds
    fn_h): the kernels are jax.custom_vjp and have no forward-mode, so a
    mis-routed HVP would raise, and the analytic Hessian must match the
    XLA-kernel calculator's to float tolerance."""
    import dataclasses
    rng = np.random.default_rng(6)
    st = Structure(np.array([6, 1, 8], np.int32),
                   rng.normal(scale=1.3, size=(3, 3)))
    from pdb2reaction_tpu.mlip.uma import make_uma_calculator
    calc_p = make_uma_calculator(st, model="escn-test",
                                 edge_kernel="pallas-mega")
    calc_x = make_uma_calculator(st, model="escn-test")
    cb = st.coords_bohr.reshape(-1)
    Hp = calc_p.get_hessian(cb)["hessian"]
    Hx = calc_x.get_hessian(cb)["hessian"]
    np.testing.assert_allclose(np.asarray(Hp), np.asarray(Hx),
                               rtol=1e-5, atol=1e-7)
    # and the forces still come from the kernel path (parity)
    fp = calc_p.get_forces(cb)["forces"]
    fx = calc_x.get_forces(cb)["forces"]
    np.testing.assert_allclose(fp, fx, rtol=1e-5, atol=1e-7)


def test_mega_tile_caps_scale_with_config():
    """Tile-cap defaults are calibrated at escn-md and must scale down
    for bigger configs (escn-uma-s would OOM kernel VMEM at A=32) while
    leaving escn-md and the small test configs at the calibrated values."""
    from pdb2reaction_tpu.mlip.escn_edge_kernel import _mega_cap
    md = ESCN_CONFIGS["escn-md"]
    uma = ESCN_CONFIGS["escn-uma-s"]
    test = ESCN_CONFIGS["escn-test"]
    assert _mega_cap(md, "FWD", 32) == 32
    assert _mega_cap(md, "BWD", 8) == 8
    assert _mega_cap(uma, "FWD", 32) <= 8     # h=256, K=64: 4x footprint
    assert _mega_cap(uma, "BWD", 8) <= 2
    assert _mega_cap(test, "FWD", 32) == 32   # tiny: never above default


def test_mega_kernel_vmap_batch_parity():
    """jax.vmap of value_and_grad THROUGH the pallas-mega custom_vjp (the
    chunked image-batch path, calculator.py lax.map(batch_size=chunk>1)):
    the batching rule adds a leading grid dimension to both Pallas calls
    with per-image blocks, so every image must reproduce the sequential
    per-image result exactly — energies AND forces."""
    import dataclasses
    rng = np.random.default_rng(5)
    n = 20
    zs = rng.choice([1, 6, 8], size=n).astype(np.int32)
    pts = np.stack(np.meshgrid(*[np.arange(3)] * 3), -1).reshape(-1, 3)
    st = Structure(zs, pts[:n] * 1.7 + rng.normal(scale=0.1, size=(n, 3)))
    sysp = pad_to(st, n_pad=32)
    cfg = dataclasses.replace(ESCN_CONFIGS["escn-test"],
                              edge_kernel="pallas-mega")
    fn, p, _ = make_escn_model(cfg, seed=2)
    c0 = jnp.asarray(sysp.coords, jnp.float32)
    B = 3
    cb = jnp.stack([c0 + 0.02 * jnp.asarray(
        rng.normal(size=c0.shape), jnp.float32) for _ in range(B)])
    vg = jax.value_and_grad(lambda cc: fn(cc, sysp, p))
    e_seq, g_seq = zip(*[vg(cb[i]) for i in range(B)])
    e_v, g_v = jax.jit(jax.vmap(vg))(cb)
    for i in range(B):
        assert abs(float(e_v[i]) - float(e_seq[i])) < 1e-6
        assert np.abs(np.asarray(g_v[i]) - np.asarray(g_seq[i])).max() < 1e-6
