"""Op-level TPU profile of a force-call program via jax.profiler + xplane.

Traces a few CHAINED executions of the selected program (the relay
memoizes identical executions — bench.py docstring), then parses the
written .xplane.pb and prints per-op self-times aggregated over the
device planes. This is the measurement tool behind the round-4d glue
apportionment: the fori-marginal microbenches (scripts/tpu_mega_micro*.py)
isolate the Pallas kernels; this shows everything AROUND them (transposes,
norms, pack_d, residuals, dispatch gaps) with XLA op names.

Usage: python scripts/tpu_xprof.py {smoke|surrogate|surrogate_batch|escn|escn_fwd}

Parsing needs tensorflow.tsl's xplane_pb2 (present in this image); it is
imported in a SUBPROCESS with PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python
(the C++ descriptor pool rejects TF's generated protos here) so the JAX
process never loads tensorflow.
"""
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

LOGDIR = os.environ.get("PDB2R_XPROF_DIR", "/tmp/xprof")

PARSER = r'''
import collections, glob, os, sys
os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
from tensorflow.tsl.profiler.protobuf import xplane_pb2

paths = glob.glob(sys.argv[1] + "/**/*.xplane.pb", recursive=True)
assert paths, "no xplane.pb under " + sys.argv[1]
path = max(paths, key=os.path.getmtime)
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())
print("planes:", [p.name for p in xs.planes])
for plane in xs.planes:
    nm = plane.name
    if not ("TPU" in nm or "/device:" in nm or "Device" in nm):
        continue
    ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
    tot = collections.Counter()
    cnt = collections.Counter()
    span = [None, None]
    for line in plane.lines:
        for ev in line.events:
            name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
            dur = ev.duration_ps / 1e9   # ms
            tot[name] += dur
            cnt[name] += 1
            t0 = ev.offset_ps
            t1 = ev.offset_ps + ev.duration_ps
            span[0] = t0 if span[0] is None else min(span[0], t0)
            span[1] = t1 if span[1] is None else max(span[1], t1)
    if not tot:
        continue
    print(f"== plane: {nm}  lines={len(plane.lines)} "
          f"span={(span[1]-span[0])/1e9:.2f} ms busy={sum(tot.values()):.2f} ms")
    for name, ms in tot.most_common(40):
        print(f"  {ms:9.3f} ms  x{cnt[name]:<5d} {name[:110]}")
'''


def run_parser():
    r = subprocess.run([sys.executable, "-c", PARSER, LOGDIR],
                       capture_output=True, text=True)
    out = (r.stdout or "") + (r.stderr or "")
    for line in out.splitlines():
        if any(s in line for s in ("oneDNN", "cudart", "absl", "I0000",
                                    "WARNING: All log")):
            continue
        print(line)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "smoke"
    import jax
    import jax.numpy as jnp
    import numpy as np
    print("devices:", jax.devices())

    if which == "smoke":
        a = jnp.ones((2048, 2048), jnp.bfloat16)

        @jax.jit
        def f(x):
            return x @ x

        o = f(a)
        jax.block_until_ready(o)
        with jax.profiler.trace(LOGDIR):
            for _ in range(3):
                o = f(o * jnp.asarray(1e-6, o.dtype) + a)
            jax.block_until_ready(o)
        run_parser()
        return

    from __graft_entry__ import _flagship_system
    sys_ = _flagship_system()
    coords = jnp.asarray(sys_.coords, jnp.float32)

    if which.startswith("surrogate"):
        from pdb2reaction_tpu.mlip.model import make_model
        fn, params, cfg = make_model("uma-s-1p1", seed=0)
    else:
        import dataclasses
        from pdb2reaction_tpu.mlip.escn import ESCN_CONFIGS, make_escn_model
        cfg = dataclasses.replace(ESCN_CONFIGS["escn-md"],
                                  edge_kernel="pallas-mega")
        fn, params, cfg = make_escn_model(cfg, seed=0)

    if which == "surrogate_batch":
        B = int(os.environ.get("PDB2R_XPROF_B", "8"))

        @jax.jit
        def target(p, cb):
            def one(c):
                e, g = jax.value_and_grad(lambda cc: fn(cc, sys_, p))(c)
                return e, -g
            return jax.lax.map(one, cb, batch_size=1)

        arg = jnp.asarray(np.asarray(coords)[None]
                          + 0.01 * np.random.default_rng(0)
                          .normal(size=(B,) + coords.shape)
                          .astype(np.float32))
    elif which == "escn_fwd":
        @jax.jit
        def target(p, c):
            return fn(c, sys_, p)

        arg = coords
    else:
        @jax.jit
        def target(p, c):
            e, g = jax.value_and_grad(lambda cc: fn(cc, sys_, p))(c)
            return e, -g

        arg = coords

    o = target(params, arg)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    with jax.profiler.trace(LOGDIR):
        a = arg
        for _ in range(3):
            d = o[1] if isinstance(o, tuple) else o
            if d.shape != a.shape:
                d = jnp.zeros_like(a) + jnp.sum(d) * 1e-12
            a = a + 1e-6 * d
            o = target(params, a)
        jax.block_until_ready(o)
    print(f"traced 3 iters in {(time.perf_counter()-t0)*1e3:.1f} ms")
    run_parser()


if __name__ == "__main__":
    main()
