"""Multi-host / multi-slice execution: the DCN story.

Replaces the reference's user-managed Ray cluster over PBS+MPI with NCCL
env tuning (/root/reference/docs/uma_pysis.md:30-155): here a TPU pod or
multi-slice job is joined with ``jax.distributed.initialize`` and a single
hybrid mesh — collectives ride ICI within a slice and DCN across slices,
all inserted by XLA. No cluster bootstrap, no actor pool.

- ``initialize_distributed``: no-arg on TPU pods (auto-detected from the
  runtime); explicit (coordinator, num_processes, process_id) for CPU
  simulation or custom launches.
- ``make_hybrid_mesh``: DCN-outer x ICI-inner device ordering via
  ``mesh_utils.create_hybrid_device_mesh`` so the "data" axis splits
  across slices at the slowest level (image batches shard across DCN,
  tensor-parallel "model" stays inside a slice).

Validated by tests/test_distributed.py: two real processes (Gloo
collectives on CPU), a global mesh spanning both, and a sharded
``get_forces_batch`` matching the single-process result.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Join the distributed runtime (idempotent)."""
    import jax
    try:
        if coordinator_address is None:
            jax.distributed.initialize()       # TPU pod auto-detection
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise


def make_hybrid_mesh(*, model: int = 1, data_per_slice: Optional[int] = None):
    """Mesh over all processes: axes ("data", "model").

    The data axis is ordered DCN-outer (slices/hosts) x ICI-inner so
    shard boundaries between slices coincide with the slow links.
    """
    import jax
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    n_local = len(jax.local_devices())
    n_proc = jax.process_count()
    if data_per_slice is None:
        data_per_slice = n_local // model
    try:
        devices = mesh_utils.create_hybrid_device_mesh(
            (data_per_slice, model), (n_proc, 1))
    except ValueError:
        # no slice metadata (CPU simulation, single-slice jobs): group by
        # process — same DCN-outer ordering, processes play the slices
        devs = sorted(jax.devices(),
                      key=lambda d: (d.process_index, d.id))
        devices = np.array(devs)
    return Mesh(devices.reshape(n_proc * data_per_slice, model),
                ("data", "model"))


def put_global(x, sharding):
    """Host array (identical on every process) -> global sharded array.

    Works in both single- and multi-process regimes.
    """
    import jax
    x = np.asarray(x)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def gather_global(x) -> np.ndarray:
    """Sharded global jax.Array -> full numpy array on every process."""
    import jax
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
