"""Multi-process (DCN-analog) execution: two real processes, one global
mesh, sharded batched force evaluation matching the single-process result.

This stands in for a multi-slice TPU job (SURVEY.md §5.8): Gloo collectives
between CPU processes play the DCN role; the code path
(jax.distributed.initialize -> hybrid mesh -> global batch -> allgather)
is identical on pods.
"""

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
port = sys.argv[2]
from pdb2reaction_tpu.parallel.distributed import (initialize_distributed,
                                                   make_hybrid_mesh)
initialize_distributed(f"127.0.0.1:{port}", 2, pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 8

import numpy as np
from pdb2reaction_tpu.core.structure import Structure
from pdb2reaction_tpu.mlip.calculator import Calculator
from pdb2reaction_tpu.mlip import potentials

mesh = make_hybrid_mesh(model=1)          # data axis = 8 over 2 processes
st = Structure.from_symbols(["O", "H", "H"],
                            [[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]])
calc = Calculator(st, potentials.make_morse(), mesh=mesh)
base = st.coords_bohr.reshape(-1)
batch = np.stack([base + 0.01 * k for k in range(8)])
res = calc.get_forces_batch(batch)

ref = Calculator(st, potentials.make_morse())   # meshless reference
e_ref = np.array([ref.get_forces(b)["energy"] for b in batch])
err = float(np.abs(res["energy"] - e_ref).max())
assert err < 1e-9, err
print(f"RESULT proc={pid} ok err={err:.2e} "
      f"E0={res['energy'][0]:.10f}")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_forces(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = str(_free_port())
    repo = str(Path(__file__).resolve().parent.parent)
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env={**__import__("os").environ, "PYTHONPATH": repo})
        for pid in (0, 1)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"RESULT proc={pid} ok" in out, out
    # both processes computed identical energies
    e0 = [ln for ln in outs[0].splitlines() if "RESULT" in ln][0]
    e1 = [ln for ln in outs[1].splitlines() if "RESULT" in ln][0]
    assert e0.split("E0=")[1] == e1.split("E0=")[1]
