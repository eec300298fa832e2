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
cfg_name = sys.argv[1] if len(sys.argv) > 1 else "escn-md"
print("config:", cfg_name)
cfg0 = dataclasses.replace(ESCN_CONFIGS[cfg_name],
                           edge_kernel="pallas-mega")
fn, params, cfg = make_escn_model(cfg0, seed=0)
params = premerge_escn_params(params, cfg)

from _marginal import static_marginal


def make_e(n):
    @jax.jit
    def run(c):
        def body(i, c):
            e = fn(c, sys_, params)
            return c * (1.0 + 0.0 * e) + 1e-9 * e
        return jax.lax.fori_loop(0, n, body, c)
    return run


def make_vg(n):
    @jax.jit
    def run(c):
        def body(i, c):
            e, g = jax.value_and_grad(lambda cc: fn(cc, sys_, params))(c)
            return c + 1e-9 * g
        return jax.lax.fori_loop(0, n, body, c)
    return run


t_f = static_marginal("energy only (fwd)", make_e, coords0)
t_vg = static_marginal("value_and_grad (fwd+bwd)", make_vg, coords0)
print(f"implied bwd: {t_vg - t_f:.2f} ms", flush=True)
