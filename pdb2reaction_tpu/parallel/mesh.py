"""Device mesh + sharding helpers.

The reference's distributed story is a Ray actor pool for parallel UMA
inference (uma_pysis.py:234-242, docs/uma_pysis.md:30-155). The TPU-native
replacement is a single `jax.sharding.Mesh`:

- axis "data"  — images / FD displacements / scan grid points (data parallel)
- axis "model" — tensor-parallel sharding inside the MLIP for very large
  systems (feature-dimension sharding)

Batched force evaluation shards the leading batch axis over "data"; XLA
inserts the collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if data is None:
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    arr = np.array(devs[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def shard_batch(x, mesh: Mesh):
    """Shard the leading (batch/image) axis over the 'data' mesh axis.

    Callers should pad the batch to a multiple of the data-axis size for
    even shards (Calculator does). Works across processes: on a multi-host
    mesh the global array is assembled from the host-replicated input.
    """
    sharding = NamedSharding(mesh, P("data"))
    if any(d.process_index != jax.process_index()
           for d in np.asarray(mesh.devices).ravel()):
        from .distributed import put_global
        return put_global(x, sharding)
    return jax.device_put(x, sharding)


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_params_model(params, mesh: Mesh):
    """Tensor-parallel parameter layout: shard the trailing (feature)
    dimension of every >=2-D weight over the 'model' axis where it divides
    evenly; replicate the rest. GSPMD then partitions the feature dimension
    of the dense contractions and inserts the ICI collectives — the
    single-structure scale-out that replaces the reference's Ray fan-out
    for one big system (uma_pysis.py:234-242). Sharding is layout-only:
    results are identical to the replicated run (test_parallel.py)."""
    import jax.numpy as jnp

    m = mesh.shape.get("model", 1)
    if m <= 1:
        return jax.device_put(params, NamedSharding(mesh, P()))

    def place(x):
        x = jnp.asarray(x)
        if x.ndim >= 2 and x.shape[-1] % m == 0:
            spec = P(*([None] * (x.ndim - 1) + ["model"]))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params)
