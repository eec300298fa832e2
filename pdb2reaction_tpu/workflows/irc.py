"""IRC driver (`irc` subcommand).

Capability match: /root/reference/pdb2reaction/irc.py — EulerPC both-branch
integration from a TS, Cartesian coordinates forced (irc.py:345-346),
freeze list forwarded to the calculator (irc.py:349-351), finished/forward/
backward trajectory outputs with PDB companions (irc.py:380-404).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, Optional, Sequence


from ..engines.irc import eulerpc_irc, IRC_KW
from . import common
from .config import format_elapsed


def run_irc(
    input_path,
    *,
    charge: Optional[int] = None,
    spin: Optional[int] = None,
    coord_type: str = "cart",
    freeze_atoms: Sequence = (),
    auto_freeze_links: bool = True,
    calc_mode: str = "uma",
    model: str = "uma-s-1p1",
    out_dir="./result_irc/",
    mesh=None,
    verbose: bool = True,
    dump_restart: int = 0,
    **irc_kw,
) -> Dict[str, Any]:
    t0 = time.time()
    if coord_type != "cart":
        # EulerPC supports Cartesian coordinates only — the reference pins
        # geom_cfg["coord_type"] = "cart" the same way (irc.py:345-346)
        print(f"[irc] coord_type={coord_type!r} ignored: EulerPC runs "
              "Cartesian (reference irc.py:346)")
    struct = common.load_structure(input_path)
    q, s = common.resolve_charge_spin(struct, charge, spin)
    freeze = common.merge_freeze(struct, [common.resolve_atom_spec(f, struct)
                                          for f in freeze_atoms],
                                 auto_freeze_links)
    struct.freeze = freeze
    calc_only = {k: v for k, v in irc_kw.items()
                 if k in ("hessian_calc_mode", "fd_step", "max_neigh",
                          "radius", "seed", "checkpoint")}
    kw = {**IRC_KW, **{k: v for k, v in irc_kw.items() if k in IRC_KW}}
    calc = common.make_calculator(struct, calc_mode=calc_mode, charge=q,
                                  spin=s, freeze_atoms=freeze, model=model,
                                  mesh=mesh, **calc_only)
    if verbose:
        from .config import pretty_block
        print(pretty_block("irc", {**kw, "charge": q, "spin": s,
                                   "calc_mode": calc_mode, "model": model}))
    if dump_restart:
        # mid-run restartability (reference irc_data.h5, irc.py:58 —
        # TPU-first: the branch carry is dumped every N cycles at host
        # syncs; a rerun resumes the interrupted branch from the dump)
        from ..runtime.checkpoint import CheckpointStore
        kw["restart"] = {
            "store": CheckpointStore(Path(out_dir) / "restart"),
            "name": "irc", "every": int(dump_restart)}
    res = eulerpc_irc(calc, calc.pad_bohr(struct.coords_bohr), **kw)

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = []
    # finished = backward-reversed + TS + forward (pysisyphus convention)
    frames = []
    energies = []
    if res.backward:
        frames.extend(reversed(res.backward.coords))
        energies.extend(reversed(res.backward.energies))
    frames.append(res.ts_coords)
    energies.append(res.ts_energy)
    if res.forward:
        frames.extend(res.forward.coords)
        energies.extend(res.forward.energies)
    paths += common.write_trajectory(out, "finished_irc", struct, frames,
                                     energies)
    if res.forward:
        paths += common.write_trajectory(out, "forward_irc", struct,
                                         res.forward.coords,
                                         res.forward.energies)
    if res.backward:
        paths += common.write_trajectory(out, "backward_irc", struct,
                                         res.backward.coords,
                                         res.backward.energies)
    # irc_data dump (reference writes irc_data.h5, irc.py:58; npz here —
    # same content: per-branch coords/energies/gradients + the TS)
    import numpy as np
    data = {"ts_coords": res.ts_coords, "ts_energy": res.ts_energy}
    for name, br in (("forward", res.forward), ("backward", res.backward)):
        if br:
            data[f"{name}_coords"] = np.stack(br.coords)
            data[f"{name}_energies"] = np.asarray(br.energies)
            data[f"{name}_gradients"] = np.stack(br.gradients)
            data[f"{name}_converged"] = np.asarray(br.converged)
    np.savez_compressed(out / "irc_data.npz", **data)
    paths.append(out / "irc_data.npz")
    if verbose:
        nf = len(res.forward.coords) if res.forward else 0
        nb = len(res.backward.coords) if res.backward else 0
        print(f"[irc] forward {nf} steps, backward {nb} steps")
        print(f"[irc] elapsed {format_elapsed(t0)}")
    return {"result": res, "outputs": paths, "structure": struct,
            "calculator": calc, "frames_bohr": frames,
            "energies": energies, "force_calls": calc.force_calls}
