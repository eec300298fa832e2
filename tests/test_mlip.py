import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdb2reaction_tpu.core.structure import Structure, pad_to
from pdb2reaction_tpu.mlip.model import make_model, CONFIGS
from pdb2reaction_tpu.mlip.calculator import Calculator


@pytest.fixture(scope="module")
def water():
    return Structure.from_symbols(
        ["O", "H", "H"],
        [[0.0, 0.0, 0.0], [0.96, 0.0, 0.0], [-0.24, 0.93, 0.0]])


@pytest.fixture(scope="module")
def model():
    return make_model("small", seed=0)


def _energy(model, st, n_pad=8):
    fn, params, cfg = model
    sys_ = pad_to(st, n_pad=n_pad)
    return float(fn(sys_.coords, sys_, params))


def test_padding_invariance(water, model):
    e8 = _energy(model, water, n_pad=8)
    e16 = _energy(model, water, n_pad=16)
    assert e8 == pytest.approx(e16, abs=1e-5)


def test_translation_invariance(water, model):
    e0 = _energy(model, water)
    st2 = water.copy(coords=water.coords + np.array([5.0, -3.0, 2.0]))
    assert _energy(model, st2) == pytest.approx(e0, abs=1e-5)


def test_rotation_invariance(water, model):
    e0 = _energy(model, water)
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0],
                  [0, 0, 1.0]])
    st2 = water.copy(coords=water.coords @ R.T)
    assert _energy(model, st2) == pytest.approx(e0, abs=1e-4)


def test_permutation_invariance(model):
    st1 = Structure.from_symbols(["O", "H", "H"],
                                 [[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]])
    st2 = Structure.from_symbols(["H", "O", "H"],
                                 [[0.96, 0, 0], [0, 0, 0], [-0.24, 0.93, 0]])
    assert _energy(model, st1) == pytest.approx(_energy(model, st2), abs=1e-5)


def test_forces_match_fd(water, model):
    fn, params, cfg = model
    calc = Calculator(water, fn, params=params)
    x0 = water.coords_bohr.reshape(-1)
    res = calc.get_forces(x0)
    eps = 2e-4
    for k in [0, 4, 8]:
        xp = x0.copy(); xp[k] += eps
        xm = x0.copy(); xm[k] -= eps
        fd = -(calc.get_energy(xp)["energy"]
               - calc.get_energy(xm)["energy"]) / (2 * eps)
        assert res["forces"][k] == pytest.approx(fd, abs=5e-5)


def test_charge_spin_conditioning(water):
    fn0, p0, _ = make_model("small", seed=0, charge=0, spin=1)
    fn1, p1, _ = make_model("small", seed=0, charge=-1, spin=2)
    sys_ = pad_to(water)
    e0 = float(fn0(sys_.coords, sys_, p0))
    e1 = float(fn1(sys_.coords, sys_, p1))
    assert e0 != pytest.approx(e1, abs=1e-8)


def test_smooth_at_cutoff(model):
    """Energy must be continuous as an atom crosses the cutoff sphere."""
    fn, params, cfg = model
    es = []
    for d in [cfg.cutoff - 1e-3, cfg.cutoff - 1e-5, cfg.cutoff + 1e-5]:
        st = Structure.from_symbols(["H", "H"], [[0, 0, 0], [d, 0, 0]])
        sys_ = pad_to(st)
        es.append(float(fn(sys_.coords, sys_, params)))
    assert es[0] == pytest.approx(es[2], abs=1e-4)
    assert es[1] == pytest.approx(es[2], abs=1e-6)


def test_hessian_on_mlip(water, model):
    fn, params, cfg = model
    calc = Calculator(water, fn, params=params,
                      hessian_calc_mode="Analytical")
    H = calc.get_hessian(water.coords_bohr.reshape(-1))["hessian"]
    assert H.shape == (9, 9)
    np.testing.assert_allclose(H, H.T, atol=1e-7)


def test_dense_fused_jr_contraction_matches_two_einsum_form():
    """The round-4 dense-path layer fuses each (A then W) double
    contraction into ONE matmul over the joint (j, r) axis
    (model.py layer(), energy_fn_dense docstring). Pin it against the
    original two-einsum formulation, evaluated here explicitly: the
    rewrite only reassociates the (j, r) sum, so under x64 the two
    forms must agree to strict tolerance on energy AND forces."""
    import dataclasses

    from pdb2reaction_tpu.mlip.model import (_apply_mlp, _embed_nodes,
                                             _readout, _update_block,
                                             energy_fn_dense)
    from pdb2reaction_tpu.mlip.radial import bessel_basis, cosine_envelope

    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        cfg = dataclasses.replace(CONFIGS["small"], dtype=jnp.float64)
        fn64, params, _ = make_model(cfg, seed=3)
        rng = np.random.default_rng(0)
        st = Structure.from_symbols(
            ["C", "O", "N", "H", "H", "H", "C"],
            rng.normal(size=(7, 3)) * 1.8)
        sys_ = pad_to(st, n_pad=8)
        coords = jnp.asarray(sys_.coords, jnp.float64)

        def energy_two_einsum(coords_ang):
            # the pre-round-4 formulation, verbatim semantics
            dt = cfg.dtype
            P = coords_ang.shape[0]
            C = cfg.hidden
            atom_mask = sys_.atom_mask.astype(dt)
            x = coords_ang.astype(dt)
            diff = x[:, None, :] - x[None, :, :]
            d = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1), 1e-12))
            eye = jnp.eye(P, dtype=bool)
            pair = (atom_mask[:, None] * atom_mask[None, :]
                    * (1.0 - jnp.eye(P, dtype=dt)))
            within = (d <= cfg.cutoff) & (~eye)
            env = cosine_envelope(d, cfg.cutoff) * pair * within.astype(dt)
            d_safe = jnp.where(within, d, 1.0)
            A = jnp.concatenate(
                [bessel_basis(d_safe, cfg.cutoff, cfg.n_radial)
                 * env[..., None], env[..., None]], -1)
            Ad = A / d_safe[..., None]
            z, s = _embed_nodes(sys_, params, cfg, atom_mask)
            v = jnp.zeros((P, 3, C), dt)
            for lp in params["layers"]:
                W = jnp.concatenate([lp["w_radial"]["w"],
                                     lp["w_radial"]["b"][None, :]], 0)
                W_s, W_vv, W_vs = jnp.split(W, 3, axis=-1)
                phi = _apply_mlp(lp["phi"], s)
                phi_s, phi_vv, phi_vs = jnp.split(phi, 3, axis=-1)
                T_s = jnp.einsum("ijr,jc->irc", A, phi_s)
                ds = jnp.einsum("irc,rc->ic", T_s, W_s)
                phiv = (phi_vv[:, None, :] * v).reshape(P, 3 * C)
                T_v = jnp.einsum("ijr,jm->irm", A, phiv) \
                    .reshape(P, -1, 3, C)
                dv = jnp.einsum("irkc,rc->ikc", T_v, W_vv)
                featsB = jnp.concatenate(
                    [x[:, k:k + 1] * phi_vs for k in range(3)]
                    + [phi_vs], -1)
                Q = jnp.einsum("ijr,jm->irm", Ad, featsB)
                Q1 = Q[..., : 3 * C].reshape(P, -1, 3, C)
                Q2 = Q[..., 3 * C:]
                dv2 = jnp.einsum("irc,rc->ic", Q2, W_vs)[:, None, :] \
                    * x[:, :, None] \
                    - jnp.einsum("irkc,rc->ikc", Q1, W_vs)
                s = s + ds * atom_mask[:, None]
                v = v + (dv + dv2) * atom_mask[:, None, None]
                s, v = _update_block(lp, s, v, atom_mask)
            return _readout(params, s, z, atom_mask, coords_ang.dtype)

        e_ref, f_ref = jax.value_and_grad(energy_two_einsum)(coords)
        e_new, f_new = jax.value_and_grad(
            lambda c: energy_fn_dense(c, sys_, params, cfg))(coords)
        assert abs(float(e_ref) - float(e_new)) < 1e-10
        np.testing.assert_allclose(np.asarray(f_new), np.asarray(f_ref),
                                   atol=1e-10)
    finally:
        jax.config.update("jax_enable_x64", prev_x64)
