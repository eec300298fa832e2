"""MLIP fine-tuning: energy+force matching with dp x tp mesh sharding.

The reference stack has no training (SURVEY.md §2.2) — UMA arrives
pretrained. A TPU-native framework keeps the fine-tune path first-class:
adapting the potential to a specific enzyme active site is how force-field
users close the gap to DFT. This module provides the jitted train step the
driver's ``dryrun_multichip`` exercises:

- batch axis sharded over the mesh "data" axis (data parallel);
- the wide weight matrices sharded over "model" (tensor parallel) —
  feature-dimension sharding of phi/readout matmuls, XLA inserts the
  psum/all-gather collectives;
- loss = we * |dE|^2 / N_atoms + wf * mean |dF|^2  (standard MLIP fit).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.structure import PaddedSystem
from .model import ModelConfig, energy_fn


class TrainBatch(NamedTuple):
    numbers: jnp.ndarray    # [B, Pa] int32
    coords: jnp.ndarray     # [B, Pa, 3] Angstrom
    atom_mask: jnp.ndarray  # [B, Pa]
    energy: jnp.ndarray     # [B] eV
    forces: jnp.ndarray     # [B, Pa, 3] eV/Ang


def _system_of(numbers, coords, atom_mask) -> PaddedSystem:
    return PaddedSystem(numbers=numbers, coords=coords, atom_mask=atom_mask,
                        free_mask=atom_mask, masses=atom_mask)


def batched_loss(params, batch: TrainBatch, cfg: ModelConfig,
                 w_energy: float = 1.0, w_force: float = 10.0):
    def single(numbers, coords, mask, e_ref, f_ref):
        sys_ = _system_of(numbers, coords, mask)
        e, g = jax.value_and_grad(
            lambda c: energy_fn(c, sys_, params, cfg))(coords)
        f = -g * mask[:, None]
        n = jnp.maximum(jnp.sum(mask), 1.0)
        le = ((e - e_ref) / n) ** 2
        lf = jnp.sum((f - f_ref * mask[:, None]) ** 2) / (3.0 * n)
        return le, lf

    le, lf = jax.vmap(single)(batch.numbers, batch.coords, batch.atom_mask,
                              batch.energy, batch.forces)
    return w_energy * jnp.mean(le) + w_force * jnp.mean(lf)


def make_train_step(cfg: ModelConfig, optimizer):
    def train_step(params, opt_state, batch: TrainBatch):
        loss, grads = jax.value_and_grad(batched_loss)(params, batch, cfg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss
    return train_step


def param_shardings(params, mesh: Mesh):
    """Tensor-parallel layout: shard wide feature dims over 'model'."""
    def spec_of(path, leaf):
        # path is a tuple of keys; shard the last (output-feature) axis of
        # 2D weight matrices; replicate biases/embeddings/scalars
        if isinstance(leaf, jnp.ndarray) and leaf.ndim == 2 \
                and leaf.shape[-1] % mesh.shape["model"] == 0 \
                and leaf.shape[-1] >= mesh.shape["model"]:
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_of, params)


def batch_shardings(mesh: Mesh):
    dp = NamedSharding(mesh, P("data"))
    return TrainBatch(numbers=dp, coords=dp, atom_mask=dp,
                      energy=dp, forces=dp)


def make_sharded_train_step(cfg: ModelConfig, optimizer, mesh: Mesh, params,
                            opt_state):
    """jit the train step with explicit dp x tp shardings over ``mesh``."""
    p_sh = param_shardings(params, mesh)
    o_sh = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), opt_state,
        is_leaf=lambda x: isinstance(x, (jnp.ndarray, np.ndarray)))
    b_sh = batch_shardings(mesh)
    step = make_train_step(cfg, optimizer)
    jstep = jax.jit(
        step,
        in_shardings=(p_sh, o_sh, b_sh),
        out_shardings=(p_sh, o_sh, NamedSharding(mesh, P())),
    )
    params = jax.device_put(params, p_sh)
    opt_state = jax.device_put(opt_state, o_sh)
    return jstep, params, opt_state


def random_batch(key, cfg: ModelConfig, batch: int, n_atoms: int,
                 n_pad: int) -> TrainBatch:
    """Synthetic training batch (tests / dryrun)."""
    k1, k2, k3 = jax.random.split(key, 3)
    numbers = jax.random.randint(k1, (batch, n_pad), 1, 9)
    mask = (jnp.arange(n_pad)[None, :] < n_atoms).astype(jnp.float32)
    mask = jnp.broadcast_to(mask, (batch, n_pad))
    numbers = (numbers * mask).astype(jnp.int32)
    coords = jax.random.uniform(k2, (batch, n_pad, 3), jnp.float32,
                                0.0, 4.0) * mask[..., None]
    energy = jax.random.normal(k3, (batch,), jnp.float32)
    forces = jax.random.normal(jax.random.fold_in(k3, 1),
                               (batch, n_pad, 3), jnp.float32) * mask[..., None]
    return TrainBatch(numbers=numbers, coords=coords, atom_mask=mask,
                      energy=energy, forces=forces)


# ---- eSCN fine-tune: expert-parallel (ep) x data-parallel (dp) -------------
# The UMA-class backbone's MoLE banks ([E, in, out] per linear,
# escn.py:_mole_linear) are the natural extra sharding axis the dense
# surrogate does not have: shard every bank's expert dim over a mesh
# "expert" axis and the routing merge (einsum "e,eio->io",
# escn.py:_merged_wb) becomes a psum over that axis which XLA inserts
# automatically. Routing inputs (task/charge/spin) live in params —
# fine-tuning targets one active site, so routing is fixed per run.

def escn_batched_loss(params, batch: TrainBatch, cfg,
                      w_energy: float = 1.0, w_force: float = 10.0):
    from .escn import escn_energy

    def single(numbers, coords, mask, e_ref, f_ref):
        sys_ = _system_of(numbers, coords, mask)
        e, g = jax.value_and_grad(
            lambda c: escn_energy(c, sys_, params, cfg))(coords)
        f = -g * mask[:, None]
        n = jnp.maximum(jnp.sum(mask), 1.0)
        le = ((e - e_ref) / n) ** 2
        lf = jnp.sum((f - f_ref * mask[:, None]) ** 2) / (3.0 * n)
        return le, lf

    le, lf = jax.vmap(single)(batch.numbers, batch.coords, batch.atom_mask,
                              batch.energy, batch.forces)
    return w_energy * jnp.mean(le) + w_force * jnp.mean(lf)


def make_escn_train_step(cfg, optimizer):
    def train_step(params, opt_state, batch: TrainBatch):
        loss, grads = jax.value_and_grad(escn_batched_loss)(
            params, batch, cfg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss
    return train_step


def escn_param_shardings(params, cfg, mesh: Mesh):
    """Expert-parallel layout: MoLE banks sharded over 'expert'.

    A bank is a {"w": [E, in, out], "b": [E, out]} dict (escn.py
    _mole_linear); everything else (embeddings, Wigner-free scalars,
    routing tables) replicates."""
    E = cfg.num_experts
    ep = mesh.shape["expert"]

    def spec_of(path, leaf):
        key = getattr(path[-1], "key", None) if path else None
        if isinstance(leaf, jnp.ndarray) and E % ep == 0:
            if key == "w" and leaf.ndim == 3 and leaf.shape[0] == E:
                return NamedSharding(mesh, P("expert", None, None))
            if key == "b" and leaf.ndim == 2 and leaf.shape[0] == E:
                return NamedSharding(mesh, P("expert", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_of, params)


def make_escn_sharded_train_step(cfg, optimizer, mesh: Mesh, params,
                                 opt_state):
    """jit the eSCN train step with explicit dp x ep shardings."""
    p_sh = escn_param_shardings(params, cfg, mesh)
    o_sh = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), opt_state,
        is_leaf=lambda x: isinstance(x, (jnp.ndarray, np.ndarray)))
    b_sh = batch_shardings(mesh)
    step = make_escn_train_step(cfg, optimizer)
    jstep = jax.jit(
        step,
        in_shardings=(p_sh, o_sh, b_sh),
        out_shardings=(p_sh, o_sh, NamedSharding(mesh, P())),
    )
    params = jax.device_put(params, p_sh)
    opt_state = jax.device_put(opt_state, o_sh)
    return jstep, params, opt_state
