"""How does the escn-md (pallas-mega) force call scale with atom count?

Decides whether flattened image-batching (B images -> one B*N-atom
block-diagonal system) beats the current per-image lax.map batch: if
ms/force-call grows sub-linearly in P, the flattened batch wins; if the
per-tile one-hot staging (gather matrices are [P_pad, E_tile]) makes the
cost super-linear, it doesn't.

Usage: python scripts/tpu_escn_scaling.py [n_atoms ...]   (default 300 600 1200)
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
from pdb2reaction_tpu.mlip.escn import (ESCN_CONFIGS, make_escn_model,
                                        premerge_escn_params)
from _marginal import static_marginal

counts = [int(a) for a in sys.argv[1:]] or [300, 600, 1200]
cfg0 = dataclasses.replace(ESCN_CONFIGS["escn-md"], edge_kernel="pallas-mega")

for n in counts:
    n_pad = -(-n // 32) * 32
    sys_ = _flagship_system(n_atoms=n, n_pad=n_pad)
    coords0 = jnp.asarray(sys_.coords, jnp.float32)
    fn, params, cfg = make_escn_model(cfg0, seed=0)
    params = premerge_escn_params(params, cfg)

    def make_vg(k, fn=fn, sys_=sys_, params=params):
        @jax.jit
        def run(c):
            def body(i, c):
                e, g = jax.value_and_grad(lambda cc: fn(cc, sys_, params))(c)
                return c + 1e-9 * g
            return jax.lax.fori_loop(0, k, body, c)
        return run

    t = static_marginal(f"P={n_pad} value_and_grad", make_vg, coords0)
    print(f"SCALING P={n_pad}: {t:.2f} ms/call = {t / n_pad * 1000:.2f} us/atom",
          flush=True)
