"""Staged 1-D relaxed bond scan (`scan` subcommand).

Capability match: /root/reference/pdb2reaction/scan.py — staged
``(i, j, target)`` lists with PDB selector strings (:227-287), linear step
schedule N = ceil(|d_target - d_0| / h) (:302-325), per-step biased
relaxation with the step cap tied to the scan increment (:624-639),
optional unbiased ``--preopt`` (:655-689) and per-stage ``--endopt``
(:807-817), per-stage covalent bond-change reports (:332-347, 819-830),
stage trajectory outputs (:832-876).

TPU-first: the harmonic restraint targets live in the calculator's dynamic
params, so the whole scan reuses ONE compiled potential — zero
recompilation across scan steps (the reference rebuilds calculator wrappers
host-side).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..constants import BOHR2ANG, ANG2BOHR
from ..engines.lbfgs import lbfgs_minimize
from ..engines.bias import make_biased_energy_fn, bias_params
from ..bio.bonds import compare_structures, summarize_changes
from ..mlip.calculator import Calculator
from . import common
from .config import format_elapsed


def linear_schedule(d0: float, target: float, step: float) -> List[float]:
    """N = ceil(|target-d0|/step) evenly spaced values ending exactly at
    target (scan.py:302-325)."""
    span = target - d0
    n = max(1, int(np.ceil(abs(span) / max(step, 1e-6))))
    return [d0 + span * (k + 1) / n for k in range(n)]


def run_scan(
    input_path,
    scan_stages: Sequence[Sequence[Tuple[Any, Any, float]]],
    *,
    charge: Optional[int] = None,
    spin: Optional[int] = None,
    freeze_atoms: Sequence = (),
    auto_freeze_links: bool = True,
    step_ang: float = 0.10,
    bias_k: float = 10.0,               # eV/Ang^2 (opt.py HarmonicBias k)
    relax_thresh: str = "gau_loose",
    relax_max_cycles: int = 500,
    preopt: bool = False,
    endopt: bool = False,
    endopt_thresh: str = "gau",
    calc_mode: str = "uma",
    model: str = "uma-s-1p1",
    out_dir="./result_scan/",
    mesh=None,
    dump: bool = False,
    verbose: bool = True,
    **calc_kw,
) -> Dict[str, Any]:
    t0 = time.time()
    struct = common.load_structure(input_path)
    q, s = common.resolve_charge_spin(struct, charge, spin)
    freeze = common.merge_freeze(struct, [common.resolve_atom_spec(f, struct)
                                          for f in freeze_atoms],
                                 auto_freeze_links)
    struct.freeze = freeze

    # resolve selector strings per stage
    stages: List[List[Tuple[int, int, float]]] = []
    all_pairs: List[Tuple[int, int]] = []
    for stage in scan_stages:
        resolved = [(common.resolve_atom_spec(i, struct),
                     common.resolve_atom_spec(j, struct), float(t))
                    for (i, j, t) in stage]
        stages.append(resolved)
        for (i, j, _) in resolved:
            if (i, j) not in all_pairs:
                all_pairs.append((i, j))

    base_calc = common.make_calculator(struct, calc_mode=calc_mode,
                                       charge=q, spin=s,
                                       freeze_atoms=freeze, model=model,
                                       mesh=mesh, **calc_kw)
    biased_fn = make_biased_energy_fn(base_calc.energy_fn, all_pairs)
    cur_d = {p: float(np.linalg.norm(struct.coords[p[0]]
                                     - struct.coords[p[1]]))
             for p in all_pairs}
    calc = Calculator(struct, biased_fn,
                      params=bias_params([cur_d[p] for p in all_pairs],
                                         bias_k, base_calc.params),
                      freeze_atoms=freeze, mesh=mesh)
    eff_p = calc.au_energy_force_fn_p()

    def relax(coords_bohr, targets_ang, max_step, thresh, k=bias_k):
        # retarget restraints through dynamic params: the compiled L-BFGS
        # loop is reused across every scan step (no recompilation)
        p = bias_params([targets_ang[pp] for pp in all_pairs], k,
                        base_calc.params)
        calc.params = p
        res = lbfgs_minimize(eff_p, calc.pad_bohr(coords_bohr),
                             calc.system.free_mask, params=calc.pack(p),
                             thresh=thresh,
                             max_cycles=relax_max_cycles, max_step=max_step)
        calc.force_calls += int(res.cycles) + 1
        return calc.unpad(res.x), float(res.e)

    if preopt:
        coords, e, conv, cyc = _unbiased_opt(struct, base_calc,
                                             relax_thresh)
        struct.coords = coords * BOHR2ANG
        if verbose:
            print(f"[scan] preopt: E = {e:.6f} Ha")

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    from ..runtime.checkpoint import CheckpointStore, content_key
    store = CheckpointStore(out / "checkpoint")
    results = []
    coords_bohr = struct.coords_bohr
    step_bohr = step_ang * ANG2BOHR
    if verbose:
        from .config import pretty_block
        print(pretty_block("scan", {
            "stages": len(scan_stages), "step_ang": step_ang,
            "bias_k": bias_k, "relax_thresh": relax_thresh,
            "relax_max_cycles": relax_max_cycles, "preopt": preopt,
            "endopt": endopt, "charge": q, "spin": s,
            "calc_mode": calc_mode, "model": model}))
    stage_reports = []
    paths = []
    for si, stage in enumerate(stages):
        stage_key = f"stage_{si}_" + content_key(
            coords_bohr, extra=str(stage) + str(step_ang) + str(bias_k))
        hit = store.load(stage_key)
        if hit is not None:
            meta, arrays = hit
            coords_bohr = arrays["coords"]
            stage_frames = [arrays["frames"][k]
                            for k in range(arrays["frames"].shape[0])]
            stage_energies = list(meta["energies"])
            cur_d.update({tuple(p): t for p, t in
                          zip(meta["pairs"], meta["targets"])})
            stage_reports.append(meta["report"])
            results.append({"frames_bohr": stage_frames,
                            "energies": stage_energies,
                            "bond_changes": None})
            if verbose:
                print(f"[scan] stage {si + 1} resumed from checkpoint")
            continue
        stage_frames = []
        stage_energies = []
        stage_start_bohr = coords_bohr.copy()
        # schedules per pair within this stage, driven simultaneously
        scheds = {}
        n_steps = 1
        for (i, j, target) in stage:
            d0 = float(np.linalg.norm(coords_bohr[i] - coords_bohr[j])) \
                * BOHR2ANG
            scheds[(i, j)] = linear_schedule(d0, target, step_ang)
            n_steps = max(n_steps, len(scheds[(i, j)]))
        for k in range(n_steps):
            targets = dict(cur_d)
            for p, sched in scheds.items():
                targets[p] = sched[min(k, len(sched) - 1)]
            coords_bohr, e = relax(coords_bohr, targets, step_bohr,
                                   relax_thresh)
            cur_d.update({p: targets[p] for p in scheds})
            stage_frames.append(coords_bohr.copy())
            stage_energies.append(e)
            if verbose:
                tgt = ", ".join(f"{p}:{targets[p]:.3f}" for p in scheds)
                print(f"[scan] stage {si + 1} step {k + 1}/{n_steps}: "
                      f"E = {e:.6f} Ha ({tgt})")
        if endopt:
            coords_opt, e_opt, conv, cyc = _unbiased_opt(
                struct.copy(coords=coords_bohr * BOHR2ANG), base_calc,
                endopt_thresh)
            coords_bohr = coords_opt
            stage_frames.append(coords_bohr.copy())
            stage_energies.append(e_opt)
        # bond-change report vs stage start (scan.py:819-830)
        bc = compare_structures(struct.numbers, stage_start_bohr,
                                coords_bohr)
        report = summarize_changes(struct.numbers, bc)
        stage_reports.append(report)
        store.save(stage_key,
                   {"energies": stage_energies, "report": report,
                    "pairs": [list(p) for p in scheds],
                    "targets": [scheds[p][-1] for p in scheds]},
                   {"coords": coords_bohr,
                    "frames": np.stack(stage_frames)})
        if verbose:
            print(f"[scan] stage {si + 1} bond changes:\n{report}")
        paths += common.write_trajectory(out, f"stage_{si + 1:02d}", struct,
                                         stage_frames, stage_energies)
        results.append({"frames_bohr": stage_frames,
                        "energies": stage_energies,
                        "bond_changes": bc})

    final = common.write_outputs(out, "final_geometry", struct, coords_bohr,
                                 energy=results[-1]["energies"][-1])
    paths += final
    if dump:
        # reference --dump: combined scan.trj (+ scan.pdb mirror) over all
        # stages (scan.py --dump help text)
        all_frames = [f for r in results for f in r["frames_bohr"]]
        all_e = [e for r in results for e in r["energies"]]
        paths += common.write_trajectory(out, "scan", struct, all_frames,
                                         all_e)
    if verbose:
        print(f"[scan] elapsed {format_elapsed(t0)}")
    return {"stages": results, "coords_bohr": coords_bohr,
            "stage_reports": stage_reports, "outputs": paths,
            "structure": struct, "calculator": calc,
            "force_calls": calc.force_calls + base_calc.force_calls}


def _unbiased_opt(struct, calc, thresh):
    from .opt import optimize_structure
    return optimize_structure(struct, calc, opt_mode="lbfgs", thresh=thresh)
