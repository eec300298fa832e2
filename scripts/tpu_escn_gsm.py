"""eSCN (escn-md, pallas-mega + premerge) GSM MEP at 300 atoms on one
v5e: compile time + warm wall-clock. Round-2 measured ~35 min compile
for the batched-string eSCN program through the relay (old XLA edge
path); the mega kernel collapses the per-layer HLO to one custom call —
if the compile is now minutes, bench.py gains an eSCN GSM segment."""
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices())
from __graft_entry__ import _flagship_system
from pdb2reaction_tpu.engines.gsm import gsm_mep
from pdb2reaction_tpu.mlip.escn import (ESCN_CONFIGS, make_escn_model,
                                        premerge_escn_params)

BOHR2ANG = 0.529177210903
EV2AU = 0.03674932217565499

sys_ = _flagship_system()
coords = jnp.asarray(sys_.coords, jnp.float32)
cfg0 = dataclasses.replace(ESCN_CONFIGS["escn-md"],
                           edge_kernel="pallas-mega")
fn, params, cfg = make_escn_model(cfg0, seed=0)
params = premerge_escn_params(params, cfg)


@jax.jit
def eb_fn(coords_b):
    def one(c_bohr):
        e, g = jax.value_and_grad(
            lambda cc: fn(cc * BOHR2ANG, sys_, params))(c_bohr)
        f = -g * BOHR2ANG * EV2AU * sys_.free_mask[:, None]
        return e * EV2AU, f
    return jax.lax.map(one, coords_b, batch_size=1)


rng = np.random.default_rng(1)
disp = rng.normal(scale=0.08, size=np.asarray(coords).shape) \
    .astype(np.float32)
disp *= np.asarray(sys_.free_mask)[:, None]
xA = coords * 1.8897259886
xB = (coords + disp) * 1.8897259886
fm = jnp.asarray(sys_.free_mask)

t0 = time.perf_counter()
gsm_mep(eb_fn, xA, xB, fm, max_nodes=10, max_cycles=2,
        stop_in_when_full=2, conv_perp_rms=2e-2, climb=False)
print(f"compile+first: {time.perf_counter()-t0:.0f} s", flush=True)

t0 = time.perf_counter()
res = gsm_mep(eb_fn, xA, xB, fm, max_nodes=10, max_cycles=200,
              stop_in_when_full=200, conv_perp_rms=2e-2, climb=False)
dt = time.perf_counter() - t0
print(f"warm GSM: {dt:.2f} s, converged={bool(res.converged)}, "
      f"cycles={int(res.cycles)}, force_calls={int(res.force_calls)}, "
      f"perp_rms={float(res.perp_rms):.2e}", flush=True)
