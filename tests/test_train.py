import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pdb2reaction_tpu.mlip.model import ModelConfig, init_params
from pdb2reaction_tpu.mlip import train as T
from pdb2reaction_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(hidden=32, n_layers=2, n_radial=6, cutoff=4.0,
                      max_neighbors=8, dtype=jnp.float32)
    params = init_params(jax.random.PRNGKey(0), cfg)
    params["charge"] = jnp.asarray(0.0, jnp.float32)
    params["spin"] = jnp.asarray(1.0, jnp.float32)
    batch = T.random_batch(jax.random.PRNGKey(1), cfg, batch=8,
                           n_atoms=5, n_pad=8)
    return cfg, params, batch


def test_train_step_reduces_loss(setup):
    cfg, params, batch = setup
    optimizer = optax.adam(3e-3)
    opt_state = optimizer.init(params)
    step = jax.jit(T.make_train_step(cfg, optimizer))
    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9
    assert np.isfinite(losses).all()


def test_sharded_train_step_matches_single(setup):
    cfg, params, batch = setup
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    mesh = make_mesh(data=4, model=2)
    jstep, p_sh, o_sh = T.make_sharded_train_step(cfg, optimizer, mesh,
                                                  params, opt_state)
    p2, o2, loss_sh = jstep(p_sh, o_sh, batch)
    step = jax.jit(T.make_train_step(cfg, optimizer))
    p1, o1, loss_1 = step(params, opt_state, batch)
    assert float(loss_sh) == pytest.approx(float(loss_1), rel=1e-4)
    # parameters after one step agree across the shardings
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p1, p2)
    assert max(jax.tree_util.tree_leaves(d)) < 1e-5


def test_escn_expert_parallel_step_matches_single():
    """dp x ep: MoLE expert banks sharded over the 'expert' mesh axis
    (train.escn_param_shardings) — the routing merge einsum contracts the
    sharded axis, so XLA inserts the psum; one step must match the
    unsharded step."""
    from jax.sharding import Mesh
    from pdb2reaction_tpu.mlip.escn import make_escn_model

    fn, params, cfg = make_escn_model("escn-test", seed=0)
    batch = T.random_batch(jax.random.PRNGKey(2), None, batch=4,
                           n_atoms=5, n_pad=8)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                ("data", "expert"))
    jstep, p_sh, o_sh = T.make_escn_sharded_train_step(
        cfg, optimizer, mesh, params, opt_state)
    p2, o2, loss_sh = jstep(p_sh, o_sh, batch)

    step = jax.jit(T.make_escn_train_step(cfg, optimizer))
    p1, o1, loss_1 = step(params, opt_state, batch)

    assert float(loss_sh) == pytest.approx(float(loss_1), rel=1e-4)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p1, p2)
    assert max(jax.tree_util.tree_leaves(d)) < 1e-5
    # the banks really are expert-sharded
    w = p2["blocks"][0]["so2_conv_1"]["fc_m0"]["w"]
    assert "expert" in str(w.sharding.spec)
