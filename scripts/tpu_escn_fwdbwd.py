"""Forward vs backward split of the escn-md force call (pallas-mega +
premerge), via fori_loop marginal cost (defeats relay per-execution
overhead and memoization)."""
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from pdb2reaction_tpu.workflows.common import enable_compile_cache  # noqa: F401 (side effect)
print("devices:", jax.devices())
from __graft_entry__ import _flagship_system
from pdb2reaction_tpu.mlip.escn import (ESCN_CONFIGS, make_escn_model,
                                        premerge_escn_params)

sys_ = _flagship_system()
coords0 = jnp.asarray(sys_.coords, jnp.float32)
cfg0 = dataclasses.replace(ESCN_CONFIGS["escn-md"],
                           edge_kernel="pallas-mega")
fn, params, cfg = make_escn_model(cfg0, seed=0)
params = premerge_escn_params(params, cfg)

N1, N2 = 6, 18


def marginal(tag, make_loop):
    f1, f2 = make_loop(N1), make_loop(N2)
    for f in (f1, f2):
        jax.block_until_ready(f(params, coords0))
        jax.block_until_ready(f(params, coords0))
    ts = []
    for f in (f1, f2):
        t0 = time.perf_counter()
        jax.block_until_ready(f(params, coords0))
        ts.append(time.perf_counter() - t0)
    ms = (ts[1] - ts[0]) / (N2 - N1) * 1e3
    print(f"{tag:40s} {ms:8.2f} ms/iter", flush=True)
    return ms


def make_e(n):
    @jax.jit
    def run(p, c):
        def body(i, c):
            e = fn(c, sys_, p)
            return c * (1.0 + 0.0 * e) + 1e-9 * e
        return jax.lax.fori_loop(0, n, body, c)
    return run


def make_vg(n):
    @jax.jit
    def run(p, c):
        def body(i, c):
            e, g = jax.value_and_grad(lambda cc: fn(cc, sys_, p))(c)
            return c + 1e-9 * g
        return jax.lax.fori_loop(0, n, body, c)
    return run


t_f = marginal("energy only (fwd)", make_e)
t_vg = marginal("value_and_grad (fwd+bwd)", make_vg)
print(f"implied bwd: {t_vg - t_f:.2f} ms", flush=True)
