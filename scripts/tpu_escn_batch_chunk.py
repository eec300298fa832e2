"""Chunk sweep for the BATCHED eSCN (pallas-mega) force program — the
12-image GSM string shape of the flagship BASELINE metric.

lax.map(batch_size=chunk) vmaps each chunk: the Pallas mega kernel takes
an extra grid dimension (per-image blocks, so the quadratic-in-P one-hot
staging stays per-image) and the XLA remainder (node FFN, geometry chain,
norms) batches into wider matmuls. chunk=1 is the current calculator
default (measured for the surrogate in r2; never measured for eSCN).

RECORDED NEGATIVE (v5e relay, 2026-08-19): the chunk=12 program's
remote compile ran >25 min without finishing (same class as the 35-min
batched-string while_loop compile — vmapping the mega kernel's Pallas
custom calls explodes Mosaic compile time), while the available win is
bounded by the XLA remainder only (~2 ms of the 18.4 ms call: the 12
images already share ONE program dispatch via lax.map, and the kernels
themselves are per-image either way). chunk=1 stays the eSCN default;
the vmap path remains supported + parity-tested for small configs
(tests/test_escn.py::test_mega_kernel_vmap_batch_parity).

Usage: PDB2R_ESCN_CHUNKS=1,4,12 python scripts/tpu_escn_batch_chunk.py
"""
import dataclasses
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from pdb2reaction_tpu.workflows.common import enable_compile_cache  # noqa: F401
print("devices:", jax.devices())
from __graft_entry__ import _flagship_system
from pdb2reaction_tpu.mlip.escn import (ESCN_CONFIGS, make_escn_model,
                                        premerge_escn_params)
from _marginal import static_marginal

B = int(os.environ.get("PDB2R_ESCN_B", "12"))
sys_ = _flagship_system()
coords0 = jnp.asarray(sys_.coords, jnp.float32)
cfg0 = dataclasses.replace(ESCN_CONFIGS["escn-md"], edge_kernel="pallas-mega")
fn, params, cfg = make_escn_model(cfg0, seed=0)
params = premerge_escn_params(params, cfg)

rng = np.random.default_rng(0)
batch = jnp.stack([coords0 + 0.01 * jnp.asarray(
    rng.normal(size=coords0.shape), jnp.float32) for _ in range(B)])

for chunk in [int(c) for c in
              os.environ.get("PDB2R_ESCN_CHUNKS", "12,4,1").split(",")]:

    def eforce(cb, _chunk=chunk):
        def one(c):
            e, g = jax.value_and_grad(lambda cc: fn(cc, sys_, params))(c)
            return e, -g
        return jax.lax.map(one, cb, batch_size=_chunk)

    def make(n, _f=eforce):
        @jax.jit
        def run(b0):
            def body(i, b):
                e, f = _f(b)
                return b + 1e-9 * f
            return jax.lax.fori_loop(0, n, body, b0)
        return run

    ms = static_marginal(f"escn B={B} chunk={chunk}", make, batch,
                         n1=1, n2=4, reps=4)
    print(f"CHUNK={chunk}: {ms / B:.2f} ms/image on-device "
          f"({B * 1000.0 / ms:.1f} calls/s)", flush=True)
