"""Energy-profile figures from trajectories (`trj2fig` subcommand).

Capability match: /root/reference/pdb2reaction/trj2fig.py — dE/E profile
from XYZ-comment energies (:86-109) or recomputed with the calculator
(:112-131), reference-frame selection (:137-177), figure + CSV export
(:224-307), and the programmatic ``run_trj2fig`` hook used by
path_search/all (:346). Matplotlib replaces plotly/kaleido (not in image).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ..constants import AU2KCALPERMOL
from ..core import io_xyz
from . import common


def read_trj_energies(trj_path) -> List[Optional[float]]:
    frames = io_xyz.read_xyz_frames(trj_path)
    return [io_xyz.parse_energy_comment(f.comment) for f in frames]


def plot_profile(out_path, energies_au: Sequence[float], *,
                 reference: str = "first", unit: str = "kcal",
                 title: str = "", csv_path=None,
                 reverse_x: bool = False) -> Path:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    E = np.asarray([e for e in energies_au if e is not None], dtype=float)
    if reference == "min":
        e0 = E.min()
    elif reference == "last":
        e0 = E[-1]
    elif reference == "none":
        e0 = 0.0
    else:
        e0 = E[0]
    conv = AU2KCALPERMOL if unit == "kcal" else 1.0
    rel = (E - e0) * conv

    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(np.arange(len(rel)), rel, "o-", ms=4, color="#2C3E50")
    hei = int(np.argmax(rel))
    ax.plot([hei], [rel[hei]], "o", ms=7, color="#C0392B")
    ax.annotate(f"{rel[hei]:.1f}", (hei, rel[hei]),
                textcoords="offset points", xytext=(0, 8), ha="center")
    ax.set_xlabel("image")
    ax.set_ylabel(f"dE ({'kcal/mol' if unit == 'kcal' else 'au'})")
    if title:
        ax.set_title(title)
    ax.spines[["top", "right"]].set_visible(False)
    if reverse_x:       # reference --reverse-x: last frame on the left
        ax.invert_xaxis()
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    if csv_path:
        np.savetxt(csv_path, np.column_stack([np.arange(len(E)), E, rel]),
                   delimiter=",", header="image,energy_au,rel_" + unit,
                   comments="")
    # interactive HTML companion like the reference's plotly export
    # (trj2fig.py:224-307) — emitted when plotly is importable
    try:
        import plotly.graph_objects as go
        pfig = go.Figure(go.Scatter(x=list(range(len(rel))), y=list(rel),
                                    mode="lines+markers"))
        pfig.update_layout(xaxis_title="image",
                           yaxis_title=f"dE ({unit})", title=title)
        pfig.write_html(Path(out_path).with_suffix(".html"))
    except ImportError:
        pass
    return Path(out_path)


def run_trj2fig(
    trj_path,
    *,
    out_path=None,
    reference: str = "first",
    unit: str = "kcal",
    recompute: bool = False,
    charge: Optional[int] = None,
    spin: Optional[int] = None,
    calc_mode: str = "uma",
    model: str = "uma-s-1p1",
    csv: bool = True,
    reverse_x: bool = False,
    extra_outputs: Optional[Sequence] = None,
    **calc_kw,
) -> Dict[str, Any]:
    trj_path = Path(trj_path)
    energies = read_trj_energies(trj_path)
    if recompute or any(e is None for e in energies):
        frames = io_xyz.read_xyz_frames(trj_path)
        q, s = common.resolve_charge_spin(frames[0], charge, spin)
        calc = common.make_calculator(frames[0], calc_mode=calc_mode,
                                      charge=q, spin=s, model=model,
                                      **calc_kw)
        eb = calc.au_energy_force_batch_fn()
        import jax.numpy as jnp
        batch = np.stack([np.pad(f.coords_bohr,
                                 ((0, calc.n_pad - f.n_atoms), (0, 0)))
                          for f in frames])
        E, _ = eb(jnp.asarray(batch))
        energies = [float(e) for e in np.asarray(E)]
    # reference -o accepts multiple outputs; the suffix selects the format
    # (trj2fig.py -o help). Dispatch each: matplotlib formats, .csv, .html.
    requested = [Path(out_path)] if out_path else []
    requested += [Path(o) for o in (extra_outputs or [])]
    if not requested:
        requested = [trj_path.with_suffix(".png")]
    figure = None
    csv_path = None
    for path in requested:
        suf = path.suffix.lower()
        if suf == ".csv":
            E = np.asarray([e for e in energies if e is not None])
            np.savetxt(path, np.column_stack([np.arange(len(E)), E]),
                       delimiter=",", header="image,energy_au",
                       comments="")
            csv_path = csv_path or path
        elif suf == ".html":
            _write_html_profile(path, energies, reference=reference,
                                unit=unit, title=trj_path.name,
                                reverse_x=reverse_x)
            figure = figure or path
        else:
            auto_csv = path.with_suffix(".csv") if csv and figure is None \
                else None
            plot_profile(path, energies, reference=reference, unit=unit,
                         title=trj_path.name, csv_path=auto_csv,
                         reverse_x=reverse_x)
            if auto_csv is not None:
                csv_path = csv_path or auto_csv
            figure = figure or path
    return {"energies": energies, "figure": figure, "csv": csv_path,
            "extras": requested[1:]}


def _write_html_profile(path, energies_au, *, reference, unit, title,
                        reverse_x):
    """Interactive HTML output: plotly when importable, else a
    self-contained page embedding the matplotlib PNG (base64)."""
    try:
        import plotly.graph_objects as go
        E = np.asarray([e for e in energies_au if e is not None])
        e0 = {"min": E.min(), "last": E[-1],
              "none": 0.0}.get(reference, E[0])
        conv = AU2KCALPERMOL if unit == "kcal" else 1.0
        rel = (E - e0) * conv
        fig = go.Figure(go.Scatter(x=list(range(len(rel))), y=list(rel),
                                   mode="lines+markers"))
        fig.update_layout(xaxis_title="image",
                          yaxis_title=f"dE ({unit})", title=title)
        if reverse_x:
            fig.update_xaxes(autorange="reversed")
        fig.write_html(path)
        return path
    except ImportError:
        pass
    import base64
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".png") as tmp:
        plot_profile(tmp.name, energies_au, reference=reference, unit=unit,
                     title=title, reverse_x=reverse_x)
        b64 = base64.b64encode(open(tmp.name, "rb").read()).decode()
    Path(path).write_text(
        f"<html><body><h3>{title}</h3>"
        f'<img src="data:image/png;base64,{b64}"/></body></html>')
    return Path(path)
