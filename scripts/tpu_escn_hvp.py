"""Does a SINGLE analytic HVP on escn-md at 300 atoms survive on one v5e?

The 904-tangent analytic-Hessian run crashed the TPU worker (see
scripts/tpu_escn_hessian.py header). chunk=1 means that program evaluates
one HVP at a time inside lax.map — so the suspicion is that ONE
fwd-over-rev HVP through the all-XLA eSCN chain already exhausts HBM
(per-edge grid tensors + their jvp tangents). If true, the GSM climbing
Lanczos tangent and dimer curvature probes are broken at production scale
too, and fn_h needs remat_blocks=True (recompute per block instead of
storing the linearization).

Usage: python scripts/tpu_escn_hvp.py [noremat|remat]
"""
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from pdb2reaction_tpu.workflows.common import enable_compile_cache  # noqa: F401
print("devices:", jax.devices())
from __graft_entry__ import _flagship_system
from pdb2reaction_tpu.mlip.escn import (ESCN_CONFIGS, ESCN_FN_FOR,
                                        make_escn_model,
                                        premerge_escn_params)

which = sys.argv[1] if len(sys.argv) > 1 else "noremat"
sys_ = _flagship_system()
cfg0 = dataclasses.replace(ESCN_CONFIGS["escn-md"],
                           remat_blocks=(which == "remat"))
fn, params, cfg = make_escn_model(cfg0, seed=0)
fn = ESCN_FN_FOR(cfg)
params = premerge_escn_params(params, cfg)
coords = jnp.asarray(sys_.coords, jnp.float32)
v = jnp.asarray(np.random.default_rng(0).normal(
    size=coords.shape), jnp.float32)


@jax.jit
def hvp(c, v):
    def grad(cc):
        return jax.grad(lambda x: fn(x, sys_, params))(cc)
    return jax.jvp(grad, (c,), (v,))[1]


t0 = time.perf_counter()
out = jax.block_until_ready(hvp(coords, v))
print(f"HVP[{which}] compile+first {time.perf_counter()-t0:.1f}s "
      f"|Hv|max {float(jnp.abs(out).max()):.3e}", flush=True)
t0 = time.perf_counter()
out = jax.block_until_ready(hvp(coords + 1e-5, v))
print(f"HVP[{which}] warm {time.perf_counter()-t0:.3f}s", flush=True)
