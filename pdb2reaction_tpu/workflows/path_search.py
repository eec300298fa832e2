"""Recursive multi-step MEP search (`path-search` subcommand) — flagship.

Capability match: /root/reference/pdb2reaction/path_search.py (2862 LoC):
per adjacent input pair run a GSM/DMF segment, optimize HEI+-1 (or nearest
path minima in refine-mode=minima, :1271-1288), classify the gap:

- no covalent change between the optimized minima -> **kink**: insert up to
  ``kink_max_nodes`` interpolated, individually optimized nodes
  (:1314-1337), no recursion, consecutive-kink abort guard (:1407-1414);
- else run a refinement MEP between the minima (:880-913), then recurse on
  the left/right sides that still show bond changes (:1393-1429) under a
  recursion-depth cap (SEARCH_KW :341-351);
- stitch all segments with RMSD dedup and bridge MEPs for interface gaps
  (:958-1108);

then emit mep.trj, per-segment trajectories, the compressed
R->TS->IM->P energy diagram (:2575-2759) and summary.yaml/summary.log
(:2764-2839).

All segment force evaluations ride the image-parallel batched calculator —
the whole recursion shares ONE compiled potential program.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ..constants import BOHR2ANG, AU2KCALPERMOL
from ..bio.bonds import compare_structures, summarize_changes
from ..bio.align import align_sequence_inplace, rmsd
from . import common
from .opt import optimize_structure
from .path_opt import run_mep_between
from .config import format_elapsed

# Reference option surface (path_search.py SEARCH_KW :341-351, BOND_KW)
SEARCH_KW: Dict[str, Any] = {
    "max_depth": 3,            # recursion depth cap
    "refine_mode": "hei",      # "hei" (HEI+-1) | "minima"
    "kink_max_nodes": 5,
    "rmsd_dedup_thresh": 1e-3,  # Bohr RMSD for stitch dedup
    "bridge_rmsd_thresh": 0.1,  # Bohr RMSD gap needing a bridge MEP
    "max_consecutive_kinks": 2,
    "opt_thresh": "gau",
    "opt_mode": "lbfgs",       # reference all.py --opt-mode (light|heavy)
    "preopt": True,
    "preopt_thresh": "gau_loose",
}

BOND_KW: Dict[str, Any] = {
    "bond_factor": 1.20,
    "margin_fraction": 0.05,
    "delta_fraction": 0.05,
}


@dataclass
class SegmentReport:
    images_bohr: List[np.ndarray]      # [n_img][N,3]
    energies: List[float]
    hei_idx: int
    is_reactive: bool
    is_kink: bool = False
    bond_summary: str = ""
    converged: bool = True
    pair_index: int = 0                # which adjacent-input pair produced it
    # "seg" | "bridge" | "kink" — the reference's segment kinds
    # (path_search.py:2614-2621); only plain reactive "seg"s open TS groups
    # in the compressed diagram, "bridge" barriers become diagram-only peaks
    kind: str = "seg"

    @property
    def barrier_au(self) -> float:
        return float(self.energies[self.hei_idx] - self.energies[0])

    @property
    def delta_e_au(self) -> float:
        return float(self.energies[-1] - self.energies[0])


class PathSearch:
    def __init__(self, calc, numbers, *, mep_mode="gsm", gs_kw=None,
                 stopt_kw=None, dmf_kw=None, search_kw=None, bond_kw=None,
                 verbose=True, store=None):
        self.calc = calc
        self.numbers = np.asarray(numbers, int)
        self.n = calc.n_atoms
        self.mep = dict(mep_mode=mep_mode, gs_kw=gs_kw, stopt_kw=stopt_kw,
                        dmf_kw=dmf_kw)
        self.kw = {**SEARCH_KW, **(search_kw or {})}
        self.bond_kw = {**BOND_KW, **(bond_kw or {})}
        self.verbose = verbose
        self.kink_streak = 0
        self.segments_run = 0
        self.store = store          # CheckpointStore: per-segment MEP memo

    # -- helpers ------------------------------------------------------------
    def _log(self, msg):
        if self.verbose:
            print(f"[path-search] {msg}")

    def _bond_change(self, cA, cB):
        return compare_structures(self.numbers, cA, cB, **self.bond_kw)

    def _optimize(self, coords_bohr, thresh=None):
        st = self.calc.structure.copy(coords=np.asarray(coords_bohr)
                                      * BOHR2ANG)
        coords, e, conv, cyc = optimize_structure(
            st, self.calc, opt_mode=self.kw.get("opt_mode", "lbfgs"),
            thresh=thresh or self.kw["opt_thresh"])
        return np.asarray(coords), float(e)

    def _mep(self, cA_bohr, cB_bohr):
        key = None
        if self.store is not None:
            from ..runtime.checkpoint import content_key
            key = "mep_" + content_key(cA_bohr, cB_bohr,
                                       extra=str(self.mep["mep_mode"]))
            hit = self.store.load(key)
            if hit is not None:
                meta, arrays = hit
                self._log(f"resume: segment {key} restored from checkpoint")
                return ([arrays["images"][k]
                         for k in range(arrays["images"].shape[0])],
                        list(meta["energies"]), int(meta["hei_idx"]),
                        bool(meta["converged"]))
        stA = self.calc.structure.copy(coords=cA_bohr * BOHR2ANG)
        stB = self.calc.structure.copy(coords=cB_bohr * BOHR2ANG)
        self.segments_run += 1
        res = run_mep_between(stA, stB, self.calc, verbose=False,
                              **self.mep)
        images = [img[: self.n] for img in res.images]
        energies = list(map(float, res.energies))
        if self.store is not None and key:
            self.store.save(key, {"energies": energies,
                                  "hei_idx": int(res.hei_idx),
                                  "converged": bool(res.converged)},
                            {"images": np.stack(images)})
        return images, energies, res.hei_idx, res.converged

    def _segment(self, images, energies, hei, conv) -> SegmentReport:
        bc = self._bond_change(images[0], images[-1])
        return SegmentReport(images_bohr=images, energies=energies,
                             hei_idx=hei, is_reactive=bc.any_change,
                             bond_summary=summarize_changes(self.numbers, bc),
                             converged=conv)

    # -- the recursion (reference _build_multistep_path :1134-1472) --------
    def build(self, cA_bohr, cB_bohr, depth: int = 0) -> List[SegmentReport]:
        bc_ab = self._bond_change(cA_bohr, cB_bohr)
        if not bc_ab.any_change:
            # conformational gap -> kink segment of interpolated optimized
            # nodes (:1314-1337)
            self.kink_streak += 1
            if self.kink_streak > self.kw["max_consecutive_kinks"]:
                raise RuntimeError(
                    "Aborting: too many consecutive kink segments — check "
                    "input structures (reference guard :1407-1414)")
            return [self._kink_segment(cA_bohr, cB_bohr)]

        images, energies, hei, conv = self._mep(cA_bohr, cB_bohr)
        self._log(f"depth {depth}: segment HEI {hei}, "
                  f"barrier {(energies[hei] - energies[0]) * AU2KCALPERMOL:.2f}"
                  " kcal/mol")

        # pick flanking geometries (:1271-1288)
        if self.kw["refine_mode"] == "minima":
            left_i = self._nearest_min(energies, hei, -1)
            right_i = self._nearest_min(energies, hei, +1)
        else:
            left_i, right_i = max(hei - 1, 0), min(hei + 1, len(images) - 1)

        left_min, eL = self._optimize(images[left_i])
        right_min, eR = self._optimize(images[right_i])

        bc_lr = self._bond_change(left_min, right_min)
        if not bc_lr.any_change:
            # the reaction collapsed to a kink at this refinement level
            self.kink_streak += 1
            if self.kink_streak > self.kw["max_consecutive_kinks"]:
                raise RuntimeError(
                    "Aborting: too many consecutive kink segments")
            center = [self._kink_segment(left_min, right_min)]
        else:
            self.kink_streak = 0
            imgs, es, h, cv = self._mep(left_min, right_min)
            center = [self._segment(imgs, es, h, cv)]

        out: List[SegmentReport] = []
        # left side (:1393-1429)
        out += self._side(cA_bohr, left_min, depth)
        out += center
        out += self._side(right_min, cB_bohr, depth, reverse=False)
        return self._stitch(out)

    def _side(self, c_from, c_to, depth, reverse=False) -> List[SegmentReport]:
        bc = self._bond_change(c_from, c_to)
        d = rmsd(c_from, c_to)
        if bc.any_change:
            if depth + 1 <= self.kw["max_depth"]:
                return self.build(c_from, c_to, depth + 1)
            self._log(f"depth cap {self.kw['max_depth']} reached; bridging "
                      "reactive gap with a single MEP segment")
            imgs, es, h, cv = self._mep(c_from, c_to)
            return [self._segment(imgs, es, h, cv)]
        if d > self.kw["bridge_rmsd_thresh"]:
            # non-reactive but geometrically distinct -> bridge (:958-1108)
            imgs, es, h, cv = self._mep(c_from, c_to)
            seg = self._segment(imgs, es, h, cv)
            seg.is_kink = True
            seg.kind = "bridge"
            return [seg]
        return []

    def _kink_segment(self, cA, cB) -> SegmentReport:
        nk = self.kw["kink_max_nodes"]
        ws = np.linspace(0.0, 1.0, nk + 2)
        images = []
        energies = []
        for k, w in enumerate(ws):
            c = (1 - w) * cA + w * cB
            if 0 < k < len(ws) - 1:
                c, e = self._optimize(c, thresh=self.kw["preopt_thresh"])
            else:
                e = float(self.calc.get_energy(c.reshape(-1))["energy"])
            images.append(np.asarray(c))
            energies.append(float(e))
        hei = int(np.argmax(energies))
        seg = SegmentReport(images_bohr=images, energies=energies,
                            hei_idx=hei, is_reactive=False, is_kink=True,
                            bond_summary="(kink: no covalent change)",
                            kind="kink")
        self._log("kink segment inserted")
        return seg

    @staticmethod
    def _nearest_min(E, hei, direction):
        i = hei
        E = list(E)
        while 0 < i < len(E) - 1:
            j = i + direction
            if E[j] > E[i]:
                break
            i = j
        return max(0, min(i, len(E) - 1))

    def _stitch(self, segments: List[SegmentReport]) -> List[SegmentReport]:
        """Interface handling between adjacent segments (reference
        _stitch_paths, path_search.py:958-1108):

        - interface RMSD below ``rmsd_dedup_thresh`` -> drop the duplicated
          boundary image from the later segment;
        - interface gap above ``bridge_rmsd_thresh`` -> insert a bridge MEP
          segment (full reactive segment if the interface itself shows a
          covalent change, otherwise a kink-marked bridge)."""
        out: List[SegmentReport] = []
        for seg in segments:
            if out:
                prev_end = out[-1].images_bohr[-1]
                gap = rmsd(prev_end, seg.images_bohr[0])
                if gap < self.kw["rmsd_dedup_thresh"] \
                        and len(seg.images_bohr) > 1:
                    seg = SegmentReport(
                        images_bohr=seg.images_bohr[1:],
                        energies=seg.energies[1:],
                        hei_idx=max(seg.hei_idx - 1, 0),
                        is_reactive=seg.is_reactive, is_kink=seg.is_kink,
                        bond_summary=seg.bond_summary,
                        converged=seg.converged, kind=seg.kind)
                elif gap > self.kw["bridge_rmsd_thresh"]:
                    bc = self._bond_change(prev_end, seg.images_bohr[0])
                    self._log(f"stitch: interface gap RMSD {gap:.4f} Bohr -> "
                              + ("reactive bridge MEP" if bc.any_change
                                 else "bridge MEP"))
                    imgs, es, h, cv = self._mep(prev_end, seg.images_bohr[0])
                    bridge = self._segment(imgs, es, h, cv)
                    bridge.is_kink = not bc.any_change
                    bridge.kind = "bridge"
                    out.append(bridge)
            out.append(seg)
        return out


def run_path_search(
    input_paths: Sequence,
    *,
    charge: Optional[int] = None,
    spin: Optional[int] = None,
    freeze_atoms: Sequence = (),
    auto_freeze_links: bool = True,
    mep_mode: str = "gsm",
    align: bool = True,        # reference --align (path_search.py:2007)
    calc_mode: str = "uma",
    model: str = "uma-s-1p1",
    out_dir="./result_path_search/",
    full_template=None,        # full-system PDB for merged mirrors
    mesh=None,
    verbose: bool = True,
    gs_kw: Optional[Dict[str, Any]] = None,
    stopt_kw: Optional[Dict[str, Any]] = None,
    dmf_kw: Optional[Dict[str, Any]] = None,
    search_kw: Optional[Dict[str, Any]] = None,
    bond_kw: Optional[Dict[str, Any]] = None,
    **calc_kw,
) -> Dict[str, Any]:
    t0 = time.time()
    assert len(input_paths) >= 2, "path-search needs >= 2 structures"
    # YAML section contents arrive merged at the top level
    # (config.apply_yaml_overrides); route recognised engine/search keys
    # to their nested kw dicts instead of dropping them into calc_kw
    # (same pattern as run_opt/run_tsopt; YAML wins over CLI-built dicts)
    from ..engines.gsm import GS_KW, STOPT_KW
    from ..engines.dmf import DMF_KW
    search_kw = dict(search_kw or {})
    gs_kw = dict(gs_kw or {})
    stopt_kw = dict(stopt_kw or {})
    dmf_kw = dict(dmf_kw or {})
    bond_kw = dict(bond_kw or {})
    for k in list(calc_kw):
        for table, dst in ((SEARCH_KW, search_kw), (GS_KW, gs_kw),
                           (STOPT_KW, stopt_kw), (DMF_KW, dmf_kw),
                           (BOND_KW, bond_kw)):
            if k in table:
                dst[k] = calc_kw.pop(k)
                break
    structs = [common.load_structure(p) for p in input_paths]
    q, s = common.resolve_charge_spin(structs[0], charge, spin)
    for st in structs:
        st.freeze = common.merge_freeze(
            st, [common.resolve_atom_spec(f, st) for f in freeze_atoms],
            auto_freeze_links)
    calc = common.make_calculator(structs[0], calc_mode=calc_mode, charge=q,
                                  spin=s, freeze_atoms=structs[0].freeze,
                                  model=model, mesh=mesh, **calc_kw)
    skw = {**SEARCH_KW, **(search_kw or {})}
    if verbose:
        from .config import pretty_block
        print(pretty_block("path-search", {
            "mep_mode": mep_mode, "charge": q, "spin": s,
            "calc_mode": calc_mode, "model": model,
            "search": {k: v for k, v in skw.items()},
            "gs": dict(gs_kw or {}), "bond": dict(bond_kw or {})}))

    # preopt + alignment (:2300-2329)
    if skw["preopt"]:
        for st in structs:
            coords, e, conv, cyc = optimize_structure(
                st, calc, opt_mode=skw.get("opt_mode", "lbfgs"),
                thresh=skw["preopt_thresh"])
            st.coords = coords * BOHR2ANG
    if align:
        align_sequence_inplace(structs)

    from ..runtime.checkpoint import CheckpointStore
    store = CheckpointStore(Path(out_dir) / "checkpoint")
    searcher = PathSearch(calc, structs[0].numbers, mep_mode=mep_mode,
                          gs_kw=gs_kw, stopt_kw=stopt_kw, dmf_kw=dmf_kw,
                          search_kw=search_kw, bond_kw=bond_kw,
                          verbose=verbose, store=store)
    refine_path = skw.get("refine_path", True)
    all_segments: List[SegmentReport] = []
    for pi, (a, b) in enumerate(zip(structs[:-1], structs[1:])):
        searcher.kink_streak = 0
        if refine_path:
            segs = searcher.build(a.coords_bohr, b.coords_bohr, depth=0)
        else:
            # --refine-path False: single MEP per adjacent pair, no
            # recursion (reference all.py:3335-3386 concatenation mode)
            imgs, es, h, cv = searcher._mep(a.coords_bohr, b.coords_bohr)
            segs = [searcher._segment(imgs, es, h, cv)]
        for sg in segs:
            sg.pair_index = pi
        all_segments.extend(segs)

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = []

    # full-system merge machinery (reference path_search.py:1483-1877):
    # pocket trajectories written back into the full protein template(s).
    # Multi-template runs pass one template per input in reaction order
    # (reference --ref-full-pdb, :2022 and _load_structures_and_chain_align
    # :1519-1534): each pair uses ITS OWN pair of templates, with the
    # full-system background linearly blended A->B across the pair's frames
    # (_merge_pair_to_full :1655-1658).
    merge_full = None
    full_struct = None
    if full_template is not None:
        from ..core import io_pdb
        from ..bio import merge as bio_merge
        from ..bio.align import kabsch
        tmpl_paths = ([full_template]
                      if isinstance(full_template, (str, Path))
                      else list(full_template))
        if len(tmpl_paths) not in (1, len(structs)):
            raise ValueError(
                f"--ref-full-pdb needs 1 or {len(structs)} templates "
                f"(one per input), got {len(tmpl_paths)}")
        tmpl_structs = [io_pdb.read_pdb(p) for p in tmpl_paths]
        n0 = tmpl_structs[0].n_atoms
        for ts_ in tmpl_structs[1:]:
            if ts_.n_atoms != n0:
                raise ValueError(
                    "[merge] Atom count mismatch among --ref-full-pdb "
                    f"templates: {n0} vs {ts_.n_atoms}")
        # chain-align every template into the frame of the first
        # (reference :1540-1546)
        tmpl_coords = [tmpl_structs[0].coords.copy()]
        for ts_ in tmpl_structs[1:]:
            R, t = kabsch(ts_.coords, tmpl_coords[-1])
            tmpl_coords.append(ts_.coords @ R + t)
        full_struct = tmpl_structs[0]

        def merge_full(frames_bohr, pair_idx=None):
            # The blend fraction spans THE FRAMES OF THIS CALL — exactly
            # the reference's _merge_pair_to_full (tfrac = k/(M-1) over
            # pair_images, :1652-1656), which is also called per segment
            # and per single HEI frame (:1821-1876): a per-segment merge
            # re-blends 0->1 across that segment alone and a single-frame
            # HEI merge gets the pure A background (tfrac=0). The same
            # frame can therefore carry different backgrounds in
            # mep_full.pdb vs seg_*/hei_full.pdb — reference semantics,
            # kept deliberately.
            nT = len(tmpl_coords)
            if pair_idx is None:
                pair_idx = [0] * len(frames_bohr)
            out_coords = []
            i = 0
            while i < len(frames_bohr):
                j = i
                while (j < len(frames_bohr)
                       and pair_idx[j] == pair_idx[i]):
                    j += 1
                pi = min(int(pair_idx[i]), nT - 2) if nT > 1 else 0
                A = tmpl_coords[pi]
                B = tmpl_coords[pi + 1] if nT > 1 else A
                M = j - i
                for k in range(M):
                    tf = 0.0 if M == 1 else k / (M - 1.0)
                    bg = (1.0 - tf) * A + tf * B
                    out_coords.append(bio_merge.merge_pocket_into_full(
                        full_struct, structs[0],
                        np.asarray(frames_bohr[i + k]) * BOHR2ANG,
                        full_coords_ang=bg).coords)
                i = j
            return out_coords

    mep_frames: List[np.ndarray] = []
    mep_energies: List[float] = []
    mep_pairs: List[int] = []
    from .summary import (write_summary_yaml, write_summary_log,
                          build_energy_diagram)
    for si, seg in enumerate(all_segments):
        seg_dir = out / f"seg_{si:03d}_mep"
        paths += common.write_trajectory(seg_dir, "final_geometries",
                                         structs[0], seg.images_bohr,
                                         seg.energies)
        if seg.is_reactive:
            paths += common.write_outputs(seg_dir, "hei", structs[0],
                                          seg.images_bohr[seg.hei_idx],
                                          energy=seg.energies[seg.hei_idx])
        # segment-level summary.yaml (reference writes run- AND
        # segment-level summaries, path_search.py:2764-2839)
        seg_summary = segments_summary([seg])
        seg_summary["segments"][0]["index"] = si
        seg_summary["pair_index"] = int(seg.pair_index)
        seg_summary["weights"] = calc.weights_source
        paths.append(write_summary_yaml(seg_dir / "summary.yaml",
                                        seg_summary))
        if merge_full is not None:
            # per-segment merged full-system MEP + HEI PDBs (:1801-1876)
            try:
                from ..core import io_pdb
                n_img = len(seg.images_bohr)
                io_pdb.write_pdb_frames(
                    seg_dir / "final_geometries_full.pdb", full_struct,
                    merge_full(seg.images_bohr,
                               [seg.pair_index] * n_img),
                    energies=seg.energies)
                paths.append(seg_dir / "final_geometries_full.pdb")
                if seg.is_reactive:
                    io_pdb.write_pdb_frames(
                        seg_dir / "hei_full.pdb", full_struct,
                        merge_full([seg.images_bohr[seg.hei_idx]],
                                   [seg.pair_index]),
                        energies=[seg.energies[seg.hei_idx]])
                    paths.append(seg_dir / "hei_full.pdb")
            except Exception as e:
                print(f"[path-search] WARNING: full merge of segment {si} "
                      f"failed: {e}")
        start = 1 if (mep_frames and rmsd(mep_frames[-1],
                                          seg.images_bohr[0]) < 1e-3) else 0
        mep_frames.extend(seg.images_bohr[start:])
        mep_energies.extend(seg.energies[start:])
        mep_pairs.extend([seg.pair_index] * (len(seg.images_bohr) - start))

    paths += common.write_trajectory(out, "mep", structs[0], mep_frames,
                                     mep_energies)
    if merge_full is not None:
        try:
            from ..core import io_pdb
            io_pdb.write_pdb_frames(out / "mep_full.pdb", full_struct,
                                    merge_full(mep_frames, mep_pairs),
                                    energies=mep_energies)
            paths.append(out / "mep_full.pdb")
        except Exception as e:
            print(f"[path-search] WARNING: full MEP merge failed: {e}")

    # summary + diagram (:2575-2839)
    summary = segments_summary(all_segments)
    summary["weights"] = calc.weights_source
    try:
        diag = build_energy_diagram(out / "energy_diagram.png",
                                    all_segments)
        summary["diagram"] = {"labels": diag["labels"],
                              "energies_kcal": [round(float(e), 6)
                                                for e in diag["energies_kcal"]],
                              "chain": diag["chain"]}
        paths.append(out / "energy_diagram.png")
        if verbose:
            print(f"[diagram] State label sequence: {diag['chain']}")
    except Exception as e:
        print(f"[path-search] WARNING: diagram failed: {e}")
    paths.append(write_summary_yaml(out / "summary.yaml", summary))
    paths.append(write_summary_log(out / "summary.log", summary,
                                   elapsed=format_elapsed(t0)))
    try:
        from .trj2fig import plot_profile
        paths.append(plot_profile(out / "mep_plot.png", mep_energies))
    except Exception as e:
        print(f"[path-search] WARNING: profile plot failed: {e}")

    if verbose:
        print(f"[path-search] {len(all_segments)} segments "
              f"({sum(1 for s in all_segments if s.is_reactive)} reactive); "
              f"elapsed {format_elapsed(t0)}")
    return {"segments": all_segments, "mep_frames_bohr": mep_frames,
            "mep_energies": mep_energies, "summary": summary,
            "outputs": paths, "structures": structs, "calculator": calc,
            "force_calls": calc.force_calls}


def segments_summary(segments: List[SegmentReport]) -> Dict[str, Any]:
    e0 = segments[0].energies[0] if segments else 0.0
    out = {"n_segments": len(segments), "segments": []}
    for i, s in enumerate(segments):
        out["segments"].append({
            "index": i,
            "pair_index": int(getattr(s, "pair_index", 0)),
            "reactive": bool(s.is_reactive),
            "kink": bool(s.is_kink),
            "kind": getattr(s, "kind", "seg"),
            "barrier_kcal": round(s.barrier_au * AU2KCALPERMOL, 3),
            "delta_e_kcal": round(s.delta_e_au * AU2KCALPERMOL, 3),
            "e_start_au": float(s.energies[0]),
            "e_ts_au": float(s.energies[s.hei_idx]),
            "e_end_au": float(s.energies[-1]),
            "rel_start_kcal": round((s.energies[0] - e0) * AU2KCALPERMOL, 3),
            "bond_changes": s.bond_summary,
            "converged": bool(s.converged),
        })
    return out
