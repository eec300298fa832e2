"""End-to-end pipeline (`all` subcommand, the default command).

Capability match: /root/reference/pdb2reaction/all.py (4474 LoC; SURVEY.md
§3.1): mode selection (:2398), preflight element repair (:2465-2491),
Stage 1 pocket extraction with pocket-charge -> workflow-charge rounding
(:2508-2545, _round_charge_with_note :699), Stage 1b staged scan with
full-PDB -> pocket index remapping (:458-698, :3250), Stage 2 recursive
path search (default) or pairwise path-opt concatenation (:3335-3707),
Stage 3 merged full-system mirrors (:3758-3787), Stage 4 per reactive
segment: tsopt on the HEI (:1505-1622), IRC with endpoint matching
(:1625-1806), endpoint minimization (:1228-1294), freq (:1297-1374), DFT
when available (:1415-1502), and aggregated energy diagrams + summary
(:1070-1226, :4387-4449).

Sub-stages are direct library calls sharing one calculator program — not
the reference's in-process sys.argv swapping (all.py:1358-1367).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, Optional, Sequence

import numpy as np

from ..constants import BOHR2ANG
from ..core import io_pdb, io_xyz
from ..bio import merge as bio_merge
from ..bio.add_elem import assign_elements, pdb_needs_elem_fix
from ..bio.extract import extract_api
from . import common
from .config import format_elapsed
from .opt import optimize_structure
from .path_search import run_path_search, segments_summary
from .summary import (write_summary_log, write_summary_yaml,
                      build_energy_diagram)


def _resolve_override_dir(default: Path, override) -> Path:
    """Per-stage output override (all.py:421-427): absolute overrides are
    taken as-is; relative ones resolve against the default's parent."""
    if override is None:
        return default
    override = Path(override)
    if override.is_absolute():
        return override
    return default.parent / override


def _ts_mode(opt_post_kw) -> str:
    """Map the post-processing optimizer mode to a tsopt mode: the
    reference forwards --opt-mode-post to tsopt, where heavy = RS-I-RFO
    and light = HessianDimer (all.py:2406, tsopt.py modes)."""
    m = str(opt_post_kw.get("opt_mode", "rfo")).lower()
    return "rsirfo" if m in ("rfo", "rsirfo", "heavy") else "dimer"


def round_charge(value: float, verbose=True) -> int:
    """Round the extraction pocket charge to the nearest integer workflow
    charge with a note (all.py:699)."""
    q = int(round(value))
    if verbose and abs(value - q) > 1e-6:
        print(f"[all] NOTE: pocket charge {value} rounded to {q}")
    return q


def run_all(
    input_paths: Sequence,
    *,
    center: Optional[str] = None,
    charge: Optional[int] = None,
    spin: Optional[int] = None,
    ligand_charge=None,
    scan_stages: Optional[Sequence] = None,
    freeze_atoms: Sequence = (),
    auto_freeze_links: bool = True,
    refine_path: bool = True,
    # stage-4 toggles: ONE source of truth with the CLI and the reference
    # (all.py:2090-2111 — tsopt/thermo/dft default False; IRC runs only
    # under tsopt). tests/test_all_pipeline.py pins library==CLI defaults.
    tsopt: bool = False,
    do_irc: bool = True,
    do_freq: bool = False,
    do_dft: bool = False,
    opt_mode: str = "light",     # workflow optimizer mode (all.py:2003-2010)
    thresh: Optional[str] = None,  # workflow threshold preset (all.py:2051)
    max_cycles: int = 300,       # path-search/GSM cycle cap (all.py:1989)
    preopt: bool = True,         # endpoint preopt toggle (all.py:2076-2082)
    calc_mode: str = "uma",
    model: str = "uma-s-1p1",
    mep_mode: str = "gsm",
    out_dir="./result_all/",
    mesh=None,
    verbose: bool = True,
    full_template=None,          # --ref-full-pdb override for merged mirrors
    extract_kw: Optional[Dict[str, Any]] = None,
    search_kw: Optional[Dict[str, Any]] = None,
    gs_kw: Optional[Dict[str, Any]] = None,
    scan_kw: Optional[Dict[str, Any]] = None,
    opt_post_kw: Optional[Dict[str, Any]] = None,
    tsopt_kw: Optional[Dict[str, Any]] = None,
    irc_kw: Optional[Dict[str, Any]] = None,
    freq_kw: Optional[Dict[str, Any]] = None,
    dft_kw: Optional[Dict[str, Any]] = None,
    scan_out_dir=None,           # per-stage output overrides
    tsopt_out_dir=None,          # (reference all.py:2457,2800-2801;
    freq_out_dir=None,           # relative paths resolve against the
    dft_out_dir=None,            # default location's parent)
    **calc_kw,
) -> Dict[str, Any]:
    t0 = time.time()
    scan_kw = dict(scan_kw or {})
    # route YAML-merged search/gs keys out of calc_kw into the nested kw
    # dicts (config.apply_yaml_overrides merges section contents at the
    # top level; same routing pattern as run_opt/run_tsopt)
    from .path_search import SEARCH_KW
    from ..engines.gsm import GS_KW
    search_kw = dict(search_kw or {})
    gs_kw = dict(gs_kw or {})
    for k in list(calc_kw):
        for table, dst in ((SEARCH_KW, search_kw), (GS_KW, gs_kw)):
            if k in table:
                dst[k] = calc_kw.pop(k)
                break
    # post-processing defaults match the reference: --opt-mode-post heavy,
    # --thresh-post baker (all.py:2012-2019, 2058-2065)
    opt_post_kw = {"opt_mode": "rfo", "thresh": "baker",
                   **(opt_post_kw or {})}
    tsopt_kw = dict(tsopt_kw or {})
    irc_kw = dict(irc_kw or {})
    freq_kw = dict(freq_kw or {})
    dft_kw = dict(dft_kw or {})
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    input_paths = [Path(p) for p in input_paths]
    # reference input-mode contract (all.py:2395-2404): >=2 structures in
    # reaction order, OR single structure + --scan-lists, OR single
    # structure + --tsopt True (TSOPT-only mode).
    if len(input_paths) < 2 and not (
            len(input_paths) == 1 and (scan_stages or tsopt)):
        raise ValueError(
            "Provide at least two structures with -i/--input in reaction "
            "order, or use a single structure with --scan-lists, or a "
            "single structure with --tsopt True.")
    is_pdb = all(p.suffix.lower() == ".pdb" for p in input_paths)

    # ---- preflight: element repair (all.py:2465-2491) --------------------
    fixed_inputs = []
    for p in input_paths:
        if p.suffix.lower() == ".pdb" and pdb_needs_elem_fix(p):
            fixed = out / f"elem_fixed_{p.name}"
            assign_elements(p, fixed, verbose=verbose)
            fixed_inputs.append(fixed)
        else:
            fixed_inputs.append(p)

    # ---- Stage 1: extraction (all.py:2508-2545) --------------------------
    charge_summary = None
    if center and is_pdb:
        stage1 = out / "stage1_extract"
        stage1.mkdir(exist_ok=True)
        pockets = [stage1 / f"pocket_{p.stem}.pdb" for p in fixed_inputs]
        res = extract_api(fixed_inputs, center, pockets,
                          ligand_charge=ligand_charge, verbose=verbose,
                          **(extract_kw or {}))
        charge_summary = res["charge_summary"]
        if charge is None:
            charge = round_charge(charge_summary["total_charge"], verbose)
        work_inputs = pockets
        full_templates = fixed_inputs
    else:
        work_inputs = fixed_inputs
        full_templates = None
    if charge is None:
        raise ValueError("Charge is required (give -q or extract a pocket)")
    spin = spin or 1

    if verbose:
        from .config import pretty_block
        print(pretty_block("all", {
            "inputs": [str(p) for p in input_paths], "center": center,
            "charge": charge, "spin": spin, "mep_mode": mep_mode,
            "refine_path": refine_path, "tsopt": tsopt, "irc": do_irc,
            "freq": do_freq, "dft": do_dft, "calc_mode": calc_mode,
            "model": model, "scan_stages": scan_stages,
            "opt_mode": opt_mode, "thresh": thresh,
            "max_cycles": max_cycles, "preopt": preopt,
            "opt_mode_post": opt_post_kw["opt_mode"],
            "thresh_post": opt_post_kw["thresh"]}))
    results: Dict[str, Any] = {"charge": charge, "spin": spin,
                               "charge_summary": charge_summary}

    # ---- Stage 1b: staged scan to generate endpoints (all.py:3250) -------
    if scan_stages and len(work_inputs) == 1:
        from .scan import run_scan
        if full_templates is not None:
            # remap full-structure indices to pocket (all.py:458-698)
            full_atoms = io_pdb.parse_pdb_atoms(full_templates[0])
            pocket_atoms = io_pdb.parse_pdb_atoms(work_inputs[0])
            remapped = []
            for stage in scan_stages:
                remapped.append([
                    tuple(bio_merge.remap_indices([i, j], full_atoms,
                                                  pocket_atoms)) + (t,)
                    for (i, j, t) in stage])
            scan_stages = remapped
        scan_dir = _resolve_override_dir(out / "stage1b_scan",
                                         scan_out_dir)
        scan_res = run_scan(work_inputs[0], scan_stages, charge=charge,
                            spin=spin, calc_mode=calc_mode, model=model,
                            freeze_atoms=freeze_atoms,
                            auto_freeze_links=auto_freeze_links,
                            out_dir=scan_dir, mesh=mesh,
                            verbose=verbose,
                            **{"preopt": True, "endopt": True,
                               **scan_kw, **calc_kw})
        # endpoints: input structure + scan product
        prod = scan_dir / "scan_product.xyz"
        st = scan_res["structure"]
        io_xyz.write_xyz(prod, st.copy(
            coords=scan_res["coords_bohr"] * BOHR2ANG))
        work_inputs = [work_inputs[0], prod]
        results["scan"] = {"stages": len(scan_stages)}

    # ---- TSOPT-only mode: one input, no scan (all.py:2675-3156) ----------
    if len(work_inputs) == 1 and not scan_stages:
        from .tsopt import run_tsopt
        from .irc import run_irc as _run_irc
        from .freq import run_freq as _run_freq
        ts_out = _resolve_override_dir(out / "tsopt", tsopt_out_dir)
        # single-TSOPT mode uses the post-processing optimizer/threshold
        # (reference all.py:2406-2418,3077: opt_mode_post + thresh_post)
        res_ts = run_tsopt(work_inputs[0], charge=charge, spin=spin,
                           freeze_atoms=freeze_atoms,
                           auto_freeze_links=auto_freeze_links,
                           opt_mode=_ts_mode(opt_post_kw),
                           thresh=opt_post_kw["thresh"],
                           max_cycles=int(tsopt_kw.get("max_cycles_total")
                                          or 10000),
                           calc_mode=calc_mode, model=model,
                           out_dir=ts_out, mesh=mesh, verbose=verbose,
                           hessian_dimer_kw=tsopt_kw, **calc_kw)
        results["tsopt"] = {"converged": res_ts["converged"],
                            "energy_au": res_ts["energy"],
                            "n_imag": res_ts["n_imag"]}
        ts_geom = ts_out / "final_geometry.xyz"
        if do_freq and ts_geom.exists():
            _run_freq(ts_geom, charge=charge, spin=spin,
                      freeze_atoms=freeze_atoms,
                      auto_freeze_links=False, calc_mode=calc_mode,
                      model=model,
                      out_dir=_resolve_override_dir(out / "freq",
                                                    freq_out_dir),
                      mesh=mesh, verbose=verbose, **freq_kw)
        if do_irc and ts_geom.exists():
            _run_irc(ts_geom, charge=charge, spin=spin,
                     freeze_atoms=freeze_atoms, auto_freeze_links=False,
                     calc_mode=calc_mode, model=model,
                     out_dir=out / "irc", mesh=mesh, verbose=verbose,
                     **irc_kw)
        write_summary_yaml(out / "summary.yaml", results)
        if verbose:
            print(f"[all] TSOPT-only mode complete; elapsed "
                  f"{format_elapsed(t0)}")
        results["out_dir"] = out
        return results

    if len(work_inputs) < 2:
        raise ValueError("Need >= 2 structures (or --scan-lists) for a path")

    # ---- Stage 2: MEP (all.py:3335-3707) ---------------------------------
    skw2 = dict(search_kw or {})
    skw2["refine_path"] = refine_path
    # forward the workflow-level optimizer knobs (reference all.py:3683-3690
    # appends --max-cycles/--opt-mode/--thresh/--preopt to path_search)
    skw2.setdefault("opt_mode",
                    "rfo" if str(opt_mode).lower() in ("heavy", "rfo")
                    else "lbfgs")
    skw2.setdefault("preopt", bool(preopt))
    if thresh is not None:
        skw2.setdefault("opt_thresh", str(thresh))
    ps = run_path_search(
        work_inputs, stopt_kw={"max_cycles": int(max_cycles)},
        charge=charge, spin=spin, calc_mode=calc_mode,
        model=model, mep_mode=mep_mode, out_dir=out / "stage2_path",
        full_template=(full_template if full_template is not None
                       else (full_templates
                             if full_templates and len(full_templates) > 1
                             else (full_templates[0] if full_templates
                                   else None))),
        freeze_atoms=freeze_atoms, auto_freeze_links=auto_freeze_links,
        mesh=mesh, verbose=verbose, gs_kw=gs_kw,
        search_kw=skw2, **calc_kw)
    segments = ps["segments"]
    calc = ps["calculator"]
    pocket_struct = ps["structures"][0]
    results["path"] = segments_summary(segments)
    from ..runtime.profiling import ForceCallMeter
    meter = ForceCallMeter(calc)

    # ---- Stage 3: mirror merged full-system products (all.py:3758-3787) --
    if full_templates is not None:
        import shutil
        stage3 = out / "stage3_merged"
        stage3.mkdir(exist_ok=True)
        stage2 = out / "stage2_path"
        mirrors = [stage2 / "mep_full.pdb"]
        mirrors += sorted(stage2.glob("seg_*_mep/final_geometries_full.pdb"))
        mirrors += sorted(stage2.glob("seg_*_mep/hei_full.pdb"))
        for src in mirrors:
            if not src.exists():
                continue
            name = (src.name if src.parent == stage2
                    else f"{src.parent.name}_{src.name}")
            shutil.copy2(src, stage3 / name)

    # ---- Stage 4: per reactive segment (all.py:3855+) --------------------
    # skipped entirely unless a stage-4 stage is requested (the reference
    # returns right after stage 3 when not (tsopt or thermo or dft),
    # all.py:3848)
    seg_results = []
    freq_blocks: Dict[int, Any] = {}
    irc_profiles: Dict[int, Any] = {}
    run_stage4 = tsopt or do_freq or do_dft
    for si, seg in enumerate(segments):
        if not run_stage4:
            break
        if not seg.is_reactive:
            continue
        seg_out = out / f"stage4_seg_{si:03d}"
        seg_out.mkdir(exist_ok=True)
        entry: Dict[str, Any] = {"segment": si}
        hei_x = seg.images_bohr[seg.hei_idx]

        ts_x = hei_x
        ts_e = seg.energies[seg.hei_idx]
        if tsopt:
            from .tsopt import run_tsopt
            try:
                meter_ctx = meter.phase(f"tsopt_seg{si}")
                meter_ctx.__enter__()
                hei_path = seg_out / "hei_guess.xyz"
                io_xyz.write_xyz(hei_path, pocket_struct.copy(
                    coords=hei_x * BOHR2ANG), energy=ts_e)
                # reference forwards opt_mode_post/thresh_post to the
                # tsopt sub-CLI per segment (all.py:1536-1556,2406-2418);
                # the shared calculator is reused (path_search.py:141-144)
                tres = run_tsopt(
                    hei_path, charge=charge, spin=spin,
                    opt_mode=_ts_mode(opt_post_kw),
                    thresh=opt_post_kw["thresh"],
                    max_cycles=int(tsopt_kw.get("max_cycles_total")
                                   or 10000),
                    calculator=calc, calc_mode=calc_mode, model=model,
                    out_dir=seg_out / "tsopt", mesh=mesh,
                    verbose=verbose,
                    hessian_dimer_kw={"flatten_max_iter": 10, **tsopt_kw})
                ts_x = tres["coords_bohr"]
                ts_e = float(tres["energy"])
                entry["tsopt"] = {"converged": bool(tres["converged"]),
                                  "energy_au": float(ts_e),
                                  "n_imag": int(tres["n_imag"])}
                common.write_outputs(seg_out, "ts_final", pocket_struct,
                                     ts_x, energy=ts_e)
            except Exception as e:
                print(f"[all] WARNING: tsopt failed on segment {si}: {e}")
                entry["tsopt"] = {"error": str(e)}
            finally:
                meter_ctx.__exit__(None, None, None)

        # endpoint handling: under tsopt the endpoints are RE-MINIMIZED
        # (the reference's IRC/matching flow, all.py:1228-1294); for
        # thermo/dft WITHOUT tsopt the reference takes the MEP endpoints
        # as-is from final_geometries.trj (all.py:4074-4101) — no
        # per-segment RFO runs on a default pipeline.
        minima = []
        for tag, xg in (("reactant", seg.images_bohr[0]),
                        ("product", seg.images_bohr[-1])):
            if tsopt:
                st = pocket_struct.copy(coords=np.asarray(xg) * BOHR2ANG)
                coords, e, conv, _ = optimize_structure(st, calc,
                                                        **opt_post_kw)
                common.write_outputs(seg_out, f"{tag}_opt", pocket_struct,
                                     coords, energy=e)
            else:
                coords = np.asarray(xg)
                e = float(seg.energies[0 if tag == "reactant" else -1])
            minima.append((tag, coords, e))
        entry["endpoints"] = {t: float(e) for t, _, e in minima}

        # IRC from the TS — only under tsopt, like the reference
        # (all.py:3931-3945 runs _irc_and_match inside `if do_tsopt:`);
        # --irc can additionally disable it
        if tsopt and do_irc:
            from ..engines.irc import eulerpc_irc
            try:
                ircres = eulerpc_irc(calc, calc.pad_bohr(ts_x), **irc_kw)
                frames = []
                energies = []
                if ircres.backward:
                    frames += list(reversed(ircres.backward.coords))
                    energies += list(reversed(ircres.backward.energies))
                frames.append(ircres.ts_coords)
                energies.append(ircres.ts_energy)
                if ircres.forward:
                    frames += ircres.forward.coords
                    energies += ircres.forward.energies
                common.write_trajectory(seg_out, "irc", pocket_struct,
                                        frames, energies)
                irc_profiles[si] = list(map(float, energies))
                try:
                    from .trj2fig import plot_profile
                    plot_profile(seg_out / "irc_plot.png", energies,
                                 title=f"IRC segment {si}")
                except Exception as e:
                    print(f"[all] WARNING: IRC plot failed: {e}")
                entry["irc"] = {
                    "endpoints_au": [float(energies[0]),
                                     float(energies[-1])],
                    "matches_minima": _match_irc(
                        frames, minima, pocket_struct, calc),
                }
            except Exception as e:
                print(f"[all] WARNING: IRC failed on segment {si}: {e}")
                entry["irc"] = {"error": str(e)}

        # frequencies + thermo (all.py:1297-1374)
        if do_freq:
            from ..engines.vib import frequencies_and_modes
            from ..engines.thermo import thermochemistry
            try:
                from .freq import write_vib_outputs
                # per-state freq output trees like the reference's
                # stage-4 freq CLI runs (all.py:1297-1374,4139), under
                # the (overridable) per-segment freq root
                freq_base = _resolve_override_dir(seg_out / "freq",
                                                  freq_out_dir)
                gibbs = {}
                for tag, coords, e in (minima
                                       + [("ts", ts_x, ts_e)]):
                    H = calc.get_hessian(np.asarray(coords).reshape(-1)
                                         )["hessian"]
                    vib = frequencies_and_modes(
                        H, pocket_struct.numbers, coords,
                        pocket_struct.freeze)
                    th = thermochemistry(
                        vib.freqs_cm, pocket_struct.numbers,
                        np.asarray(coords) * BOHR2ANG,
                        electronic_energy=float(e), multiplicity=spin,
                        T=freq_kw.get("temperature", 298.15),
                        pressure=freq_kw.get("pressure", 101325.0))
                    write_vib_outputs(
                        freq_base / tag,
                        pocket_struct.copy(
                            coords=np.asarray(coords) * BOHR2ANG),
                        vib, th,
                        max_write_modes=freq_kw.get("max_write_modes",
                                                    10),
                        amplitude_ang=freq_kw.get("amplitude_ang", 0.3),
                        n_frames=freq_kw.get("n_frames", 20),
                        sort_modes=freq_kw.get("sort_modes", "value"))
                    gibbs[tag] = {"G_au": float(th.gibbs),
                                  "ZPE_au": float(th.zpe),
                                  "n_imag": int(th.n_imag)}
                    if tag == "ts":
                        freq_blocks[si] = vib.freqs_cm.tolist()
                entry["thermo"] = gibbs
            except Exception as e:
                print(f"[all] WARNING: freq failed on segment {si}: {e}")
                entry["thermo"] = {"error": str(e)}

        # DFT single points (all.py:1415-1502) — optional
        if do_dft:
            from .dft import run_dft
            try:
                # per-segment DFT root override (all.py:4140): with no
                # override this keeps the seg_out/dft_{tag} layout
                dft_base = _resolve_override_dir(seg_out / "dft",
                                                 dft_out_dir)
                for tag, coords, e in minima + [("ts", ts_x, ts_e)]:
                    p = seg_out / f"{tag}_dft.xyz"
                    io_xyz.write_xyz(p, pocket_struct.copy(
                        coords=np.asarray(coords) * BOHR2ANG))
                    entry.setdefault("dft", {})[tag] = run_dft(
                        p, charge=charge, spin=spin,
                        out_dir=dft_base.parent
                        / f"{dft_base.name}_{tag}",
                        **dft_kw)["energy_au"]
            except ImportError as e:
                entry["dft"] = {"skipped": str(e)}
            except Exception as e:
                entry["dft"] = {"error": str(e)}

        # per-segment refined energy diagram (all.py:1070-1226)
        try:
            from .summary import build_levels_diagram
            build_levels_diagram(
                seg_out / "energy_diagram.png", ["R", "TS", "P"],
                [minima[0][2], ts_e, minima[1][2]],
                title=f"segment {si} (UMA)")
        except Exception as e:
            print(f"[all] WARNING: segment diagram failed: {e}")
        seg_results.append(entry)

    results["segments"] = seg_results
    if seg_results and verbose:
        print("[all] per-phase force-call accounting:")
        print(meter.report())
    results["force_call_phases"] = meter.phases

    # ---- aggregation: diagrams + summary (all.py:4387-4449) --------------
    summary = segments_summary(segments)
    summary["stage4"] = seg_results
    from ..mlip import uma as _uma
    summary["weights"] = (_uma.last_weights_source()
                          or f"analytic:{calc_mode}")
    try:
        diag = build_energy_diagram(out / "energy_diagram_all.png", segments)
        summary["diagram"] = {"labels": diag["labels"],
                              "energies_kcal": [round(float(e), 6)
                                                for e in diag["energies_kcal"]],
                              "chain": diag["chain"]}
        if verbose:
            print(f"[diagram] State label sequence: {diag['chain']}")
    except Exception as e:
        print(f"[all] WARNING: diagram failed: {e}")
    write_summary_yaml(out / "summary.yaml", summary)
    write_summary_log(out / "summary.log", summary,
                      elapsed=format_elapsed(t0),
                      freq_blocks=freq_blocks, tree_root=out)

    # aggregated UMA / Gibbs / DFT / DFT//UMA diagrams over the refined
    # stationary points + merged IRC plot (all.py:1070-1226, 4387-4449)
    def _chain(value_of):
        """Build R -> TS1 -> IM1 -> ... -> P over reactive segments."""
        names, levels = [], []
        for k, entry in enumerate(seg_results):
            vals = value_of(entry)
            if vals is None:
                return None, None
            r, ts, p = vals
            if k == 0:
                names.append("R")
                levels.append(r)
            names.append(f"TS{k + 1}")
            levels.append(ts)
            names.append("P" if k == len(seg_results) - 1 else f"IM{k + 1}")
            levels.append(p)
        return names, levels

    from .summary import build_levels_diagram, build_irc_overview
    diagram_sets = {
        "energy_diagram_refined_all.png": ("UMA (refined)", lambda e: (
            (e["endpoints"]["reactant"], e["tsopt"]["energy_au"],
             e["endpoints"]["product"])
            if "endpoints" in e and isinstance(e.get("tsopt"), dict)
            and "energy_au" in e.get("tsopt", {}) else None)),
        "energy_diagram_gibbs_all.png": ("Gibbs (UMA + QRRHO)", lambda e: (
            (e["thermo"]["reactant"]["G_au"], e["thermo"]["ts"]["G_au"],
             e["thermo"]["product"]["G_au"])
            if isinstance(e.get("thermo"), dict)
            and "reactant" in e.get("thermo", {}) else None)),
        "energy_diagram_dft_all.png": ("DFT//UMA", lambda e: (
            (e["dft"]["reactant"], e["dft"]["ts"], e["dft"]["product"])
            if isinstance(e.get("dft"), dict)
            and "reactant" in e.get("dft", {}) else None)),
    }
    if seg_results:
        for fname, (title, value_of) in diagram_sets.items():
            try:
                names, levels = _chain(value_of)
                if names:
                    build_levels_diagram(out / fname, names, levels,
                                         title=title)
            except Exception as e:
                print(f"[all] WARNING: {fname} failed: {e}")
        # DFT//UMA Gibbs: DFT electronic + UMA thermal correction (G - E)
        try:
            def dft_gibbs(e):
                if not (isinstance(e.get("dft"), dict)
                        and "reactant" in e.get("dft", {})
                        and isinstance(e.get("thermo"), dict)
                        and "reactant" in e.get("thermo", {})):
                    return None
                corr = {t: e["thermo"][t]["G_au"]
                        - {"reactant": e["endpoints"]["reactant"],
                           "ts": e["tsopt"]["energy_au"],
                           "product": e["endpoints"]["product"]}[t]
                        for t in ("reactant", "ts", "product")}
                return (e["dft"]["reactant"] + corr["reactant"],
                        e["dft"]["ts"] + corr["ts"],
                        e["dft"]["product"] + corr["product"])

            names, levels = _chain(dft_gibbs)
            if names:
                build_levels_diagram(
                    out / "energy_diagram_dft_gibbs_all.png", names,
                    levels, title="DFT//UMA + UMA thermal")
        except Exception as e:
            print(f"[all] WARNING: dft-gibbs diagram failed: {e}")
    if irc_profiles:
        try:
            build_irc_overview(out / "irc_all.png", irc_profiles)
        except Exception as e:
            print(f"[all] WARNING: merged IRC plot failed: {e}")

    if verbose:
        print(f"[all] pipeline complete: {len(seg_results)} reactive "
              f"segment(s); elapsed {format_elapsed(t0)}")
    results["out_dir"] = out
    results["force_calls"] = calc.force_calls
    return results


def _match_irc(frames, minima, struct, calc) -> Dict[str, str]:
    """Match IRC endpoints to optimized minima by bond state then RMSD
    (all.py:1625-1806)."""
    from ..bio.bonds import compare_structures
    from ..bio.align import rmsd
    out = {}
    for side, frame in (("backward", frames[0]), ("forward", frames[-1])):
        best = None
        best_r = np.inf
        for tag, coords, _ in minima:
            bc = compare_structures(struct.numbers, frame.reshape(-1, 3),
                                    np.asarray(coords).reshape(-1, 3))
            r = rmsd(frame.reshape(-1, 3), np.asarray(coords))
            if not bc.any_change and r < best_r:
                best, best_r = tag, r
        out[side] = best or "unmatched"
    return out
