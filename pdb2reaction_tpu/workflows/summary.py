"""Summary writers and energy diagrams.

Capability match: /root/reference/pdb2reaction/summary_log.py (human
``summary.log`` with per-segment barriers, bond-change blocks, TS
imaginary-frequency quality warnings :75-127, energy tables in au +
kcal/mol, directory tree :155) and utils.build_energy_diagram
(utils.py:319-495) / path_search's compressed R->TS1->IM1->...->P diagram
(path_search.py:2575-2759). Figures use matplotlib (plotly isn't in this
image; same artifacts, documented substitution).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np
import yaml

from ..constants import AU2KCALPERMOL


def write_summary_yaml(path, summary: Dict[str, Any]) -> Path:
    path = Path(path)
    path.write_text(yaml.safe_dump(summary, sort_keys=False))
    return path


def _freq_warnings(freqs_cm: Optional[Sequence[float]]) -> List[str]:
    """TS quality diagnostics (summary_log.py:75-127 semantics)."""
    if freqs_cm is None or len(freqs_cm) == 0:
        return []
    freqs = np.asarray(freqs_cm)
    n_imag = int((freqs < -5.0).sum())
    warns = []
    if n_imag == 0:
        warns.append("WARNING: no imaginary mode — structure may not be a TS")
    elif n_imag > 1:
        warns.append(f"WARNING: {n_imag} imaginary modes — higher-order "
                     "saddle; consider tsopt flattening")
    if n_imag >= 1 and abs(float(freqs.min())) < 50.0:
        warns.append("WARNING: |imaginary frequency| < 50 cm-1 — shallow "
                     "TS, barrier may be unreliable")
    return warns


def write_summary_log(path, summary: Dict[str, Any], *,
                      elapsed: str = "", command: str = "",
                      freq_blocks: Optional[Dict[int, Sequence[float]]] = None,
                      tree_root: Optional[Path] = None) -> Path:
    lines: List[str] = []
    bar = "=" * 72
    lines += [bar, "pdb2reaction-tpu summary", bar, ""]
    if command:
        lines += [f"Command: {command}", ""]
    segs = summary.get("segments", [])
    lines.append(f"Segments: {len(segs)} "
                 f"({sum(1 for s in segs if s.get('reactive'))} reactive)")
    lines.append("")
    lines.append(f"{'seg':>4} {'type':>9} {'barrier':>10} {'dE':>10} "
                 f"{'E_TS (au)':>16}")
    lines.append(f"{'':>4} {'':>9} {'kcal/mol':>10} {'kcal/mol':>10} {'':>16}")
    for s in segs:
        typ = "kink" if s.get("kink") else (
            "reactive" if s.get("reactive") else "segment")
        lines.append(f"{s['index']:>4} {typ:>9} {s['barrier_kcal']:>10.2f} "
                     f"{s['delta_e_kcal']:>10.2f} {s['e_ts_au']:>16.8f}")
    lines.append("")
    for s in segs:
        if s.get("bond_changes"):
            lines += [f"--- segment {s['index']} bond changes ---",
                      s["bond_changes"], ""]
        if freq_blocks and s["index"] in freq_blocks:
            freqs = freq_blocks[s["index"]]
            lines.append(f"--- segment {s['index']} TS frequencies ---")
            imag = [f for f in freqs if f < 0]
            lines.append("imaginary: " +
                         (", ".join(f"{f:.1f}" for f in imag) or "none"))
            lines += _freq_warnings(freqs)
            lines.append("")
    if tree_root is not None and Path(tree_root).exists():
        lines += ["--- output tree ---"]
        root = Path(tree_root)
        for p in sorted(root.rglob("*")):
            rel = p.relative_to(root)
            indent = "  " * (len(rel.parts) - 1)
            lines.append(f"{indent}{rel.name}")
        lines.append("")
    if elapsed:
        lines.append(f"Elapsed: {elapsed}")
    path = Path(path)
    path.write_text("\n".join(lines) + "\n")
    return path


def build_levels_diagram(path, names: List[str], levels_au: List[float],
                         *, unit: str = "kcal", title: str = ""):
    """Stationary-point level diagram from explicit (name, energy_au)
    pairs, relative to the first level — the drawing primitive behind the
    UMA/Gibbs/DFT aggregated diagrams (reference all.py:1070-1226)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    conv = AU2KCALPERMOL if unit == "kcal" else 1.0
    e0 = levels_au[0]
    levels = [(e - e0) * conv for e in levels_au]

    fig, ax = plt.subplots(figsize=(1.2 * len(levels) + 2, 4.5))
    w = 0.36
    for i, (lv, nm) in enumerate(zip(levels, names)):
        ax.hlines(lv, i - w, i + w, lw=2.5,
                  color="#C0392B" if nm.startswith("TS") else "#2C3E50")
        ax.annotate(f"{nm}\n{lv:.1f}", (i, lv), textcoords="offset points",
                    xytext=(0, 6), ha="center", fontsize=9)
        if i:
            ax.plot([i - 1 + w, i - w], [levels[i - 1], lv], ls="--",
                    lw=1, color="#7F8C8D")
    ax.set_ylabel(f"dE ({'kcal/mol' if unit == 'kcal' else 'au'})")
    if title:
        ax.set_title(title)
    ax.set_xticks([])
    ax.spines[["top", "right", "bottom"]].set_visible(False)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return Path(path)


def _seg_kind(seg) -> str:
    k = getattr(seg, "kind", None)
    if k:
        return k
    return "kink" if getattr(seg, "is_kink", False) else "seg"


def compressed_diagram(segments) -> Dict[str, Any]:
    """Compressed stationary-point diagram built purely from segment-level
    dE / dE-barrier accumulation (reference path_search.py:2575-2759):

    - only plain bond-change segments (kind ``seg``, covalent change) open
      a ``TS{n}`` group: TS level = running state energy + segment barrier,
      first intermediate = running + segment dE;
    - non-bond-change segments BEFORE the first TS group fold their dE
      into the running reactant-side energy;
    - ``bridge`` segments inside a group with barrier > 1e-3 kcal/mol add
      diagram-only peaks ``IM{n}_TS`` (then ``IM{n}_TS_2``, ...) —
      bridge segments skip tsopt/thermo/DFT so the peak exists only here;
    - any non-bond-change dE inside a group accumulates into a second
      intermediate ``IM{n}_2`` joined with the ``-|-->`` chain token
      (:2714-2721);
    - the LAST TS group goes straight to ``P`` (no intermediates,
      :2702-2703); P's level is the RUNNING accumulated energy
      (:2717-2719) — the last-bond-change-frame absolute energy is used
      only in the no-TS-group R→P branch (:2693-2695);
    - absolute (au) energies anchor at the first frame of the first
      bond-change segment (:2594-2605, :2722-2723).

    Note a bridge segment never opens a TS group even when a covalent
    change slipped into it — the reference's ``_is_bond_change_seg``
    requires ``kind == "seg"`` too (:2614-2620); a reactive bridge shows
    up only as a diagram-only ``IM{n}_TS`` peak, by design.

    Returns ``{"labels", "energies_kcal", "energies_au", "chain"}``.
    """
    def _is_bc(s):
        return _seg_kind(s) == "seg" and s.is_reactive

    bc_segs = [s for s in segments if _is_bc(s)]
    E0_au = float((bc_segs[0] if bc_segs else segments[0]).energies[0])

    ts_groups: List[Dict[str, Any]] = []
    cur: Optional[Dict[str, Any]] = None
    E = 0.0  # running state energy rel. R, kcal/mol
    for s in segments:
        b = float(s.barrier_au) * AU2KCALPERMOL
        d = float(s.delta_e_au) * AU2KCALPERMOL
        if _is_bc(s):
            cur = {"ts": E + (b if np.isfinite(b) else 0.0),
                   "im1": E + (d if np.isfinite(d) else 0.0),
                   "extra": False, "idx": len(ts_groups) + 1, "peaks": []}
            ts_groups.append(cur)
            E = cur["im1"]
            cur["tail"] = E
        else:
            if cur is None:
                if np.isfinite(d):
                    E += d
                continue
            if _seg_kind(s) == "bridge" and np.isfinite(b) and b > 1.0e-3:
                suffix = "" if not cur["peaks"] else f"_{len(cur['peaks']) + 1}"
                cur["peaks"].append({"label": f"IM{cur['idx']}_TS{suffix}",
                                     "energy": E + b})
            if np.isfinite(d):
                E += d
                cur["tail"] = E
                cur["extra"] = True

    if not ts_groups:
        labels = ["R", "P"]
        EP_au = float(segments[-1].energies[-1])
        ek = [0.0, (EP_au - E0_au) * AU2KCALPERMOL]
        chain = ["R", "-->", "P"]
    else:
        labels, ek, chain = ["R"], [0.0], ["R"]
        for i, g in enumerate(ts_groups, start=1):
            labels.append(f"TS{i}")
            ek.append(float(g["ts"]))
            chain += ["-->", f"TS{i}"]
            if i == len(ts_groups):
                continue
            labels.append(f"IM{i}_1")
            ek.append(float(g["im1"]))
            chain += ["-->", f"IM{i}_1"]
            for p in g["peaks"]:
                labels.append(p["label"])
                ek.append(float(p["energy"]))
                chain += ["-->", p["label"]]
            if g["extra"]:
                labels.append(f"IM{i}_2")
                ek.append(float(g["tail"]))
                chain += ["-|-->", f"IM{i}_2"]
        labels.append("P")
        ek.append(E)
        chain += ["-->", "P"]

    return {"labels": labels,
            "energies_kcal": ek,
            "energies_au": [E0_au + e / AU2KCALPERMOL for e in ek],
            "chain": " ".join(chain)}


def build_energy_diagram(path, segments, *, unit: str = "kcal",
                         labels: Optional[List[str]] = None):
    """Compressed stationary-point diagram R -> TS1 -> IM1_1 -> ... -> P
    (path_search.py:2575-2759); see :func:`compressed_diagram` for the
    level semantics."""
    diag = compressed_diagram(segments)
    names = list(diag["labels"])
    if labels:
        names = labels[: len(names)] + names[len(labels):]
    build_levels_diagram(path, names, diag["energies_au"], unit=unit)
    return diag


def build_irc_overview(path, seg_profiles: Dict[int, List[float]],
                       *, unit: str = "kcal"):
    """Merged IRC plot: every segment's finished-IRC energy profile on one
    axes (reference all.py:4387-4449)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    conv = AU2KCALPERMOL if unit == "kcal" else 1.0
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for si, energies in sorted(seg_profiles.items()):
        if not energies:
            continue
        e = [(x - energies[0]) * conv for x in energies]
        ax.plot(range(len(e)), e, "-o", ms=3, label=f"segment {si}")
    ax.set_xlabel("IRC frame")
    ax.set_ylabel(f"dE ({'kcal/mol' if unit == 'kcal' else 'au'})")
    ax.legend()
    ax.spines[["top", "right"]].set_visible(False)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return Path(path)
