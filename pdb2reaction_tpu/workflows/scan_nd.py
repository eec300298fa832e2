"""2-D / 3-D relaxed grid scans (`scan2d`, `scan3d` subcommands).

Capability match: /root/reference/pdb2reaction/scan2d.py (docstring :1-100)
and scan3d.py (:1-95): distance-grid scans with biased relaxation at every
grid point, warm starts from the nearest previously converged grid point,
unbiased energies recorded on the grid, surface.csv export, heatmap /
contour (2D) and isosurface-style (3D) figures, plus a plot-only mode from
an existing surface.csv. RBF smoothing of the plotted surface follows the
reference (scipy.interpolate.RBFInterpolator).

TPU-first: all grid relaxations reuse ONE compiled L-BFGS program — the
restraint targets are dynamic params (zero recompilation across the grid).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..constants import BOHR2ANG
from ..engines.lbfgs import lbfgs_minimize
from ..engines.bias import make_biased_energy_fn, bias_params
from ..mlip.calculator import Calculator
from . import common
from .config import format_elapsed


def grid_values(d0: float, spec: Dict[str, Any]) -> np.ndarray:
    """Axis values from {'start','end','step'} or {'values': [...]};
    start defaults to the current distance (reference semantics)."""
    if "values" in spec:
        return np.asarray(spec["values"], dtype=float)
    start = float(spec.get("start", d0))
    end = float(spec["end"])
    step = abs(float(spec.get("step", 0.1))) or 0.1
    delta = abs(end - start)
    if delta < 1e-12:
        return np.array([start], dtype=float)
    # ceil, not round: 'step' is a MAXIMUM step size — the actual grid
    # step must never exceed it (reference scan2d.py:295-303
    # _values_from_bounds; ADVICE r4)
    import math
    n = int(math.ceil(delta / step))
    return np.linspace(start, end, n + 1)


def run_scan_nd(
    input_path,
    axes: Sequence[Dict[str, Any]],   # [{'pair':(i,j), 'end':..,'step':..}]
    *,
    charge: Optional[int] = None,
    spin: Optional[int] = None,
    freeze_atoms: Sequence = (),
    auto_freeze_links: bool = True,
    bias_k: float = 10.0,
    relax_thresh: str = "gau_loose",
    relax_mode: str = "lbfgs",   # reference --opt-mode (light|heavy)
    relax_max_cycles: int = 300,
    preopt: bool = False,        # unbiased preopt (reference default True)
    calc_mode: str = "uma",
    model: str = "uma-s-1p1",
    out_dir=None,
    mesh=None,
    verbose: bool = True,
    plot_only: Optional[str] = None,
    baseline: str = "min",       # "min" | "first" (reference scan2d/3d)
    zmin: Optional[float] = None,
    zmax: Optional[float] = None,
    **calc_kw,
) -> Dict[str, Any]:
    t0 = time.time()
    ndim = len(axes)
    assert ndim in (2, 3), "run_scan_nd supports 2 or 3 axes"
    out = Path(out_dir or f"./result_scan{ndim}d/")
    out.mkdir(parents=True, exist_ok=True)

    if plot_only:
        table = np.loadtxt(plot_only, delimiter=",", skiprows=1)
        fig = _plot_surface(out, table, ndim, baseline, zmin, zmax)
        return {"surface": table, "outputs": [fig]}

    struct = common.load_structure(input_path)
    q, s = common.resolve_charge_spin(struct, charge, spin)
    freeze = common.merge_freeze(struct, [common.resolve_atom_spec(f, struct)
                                          for f in freeze_atoms],
                                 auto_freeze_links)
    struct.freeze = freeze

    pairs = []
    for ax in axes:
        i, j = ax["pair"]
        pairs.append((common.resolve_atom_spec(i, struct),
                      common.resolve_atom_spec(j, struct)))

    base_calc = common.make_calculator(struct, calc_mode=calc_mode,
                                       charge=q, spin=s,
                                       freeze_atoms=freeze, model=model,
                                       mesh=mesh, **calc_kw)
    biased_fn = make_biased_energy_fn(base_calc.energy_fn, pairs)
    d0 = [float(np.linalg.norm(struct.coords[p[0]] - struct.coords[p[1]]))
          for p in pairs]
    calc = Calculator(struct, biased_fn,
                      params=bias_params(d0, bias_k, base_calc.params),
                      freeze_atoms=freeze, mesh=mesh)
    eff_p = calc.au_energy_force_fn_p()

    values = [grid_values(d0[k], axes[k]) for k in range(ndim)]
    shape = tuple(len(v) for v in values)
    energies = np.full(shape, np.nan)
    coords_store: Dict[Tuple[int, ...], np.ndarray] = {}
    x_init = np.asarray(struct.coords_bohr)

    def relax(coords_bohr, targets, ks):
        """Biased relaxation; axes with k = 0 are unconstrained."""
        p = bias_params(list(targets), list(ks), base_calc.params)
        if relax_mode == "rfo":
            # reference --opt-mode heavy: trust-region RFO seeded with the
            # biased analytic Hessian (scan2d.py optimizer factory :329)
            from ..engines.rfo import rfo_optimize
            old_p = calc.params
            calc.params = p
            try:
                H0 = calc.get_hessian(
                    np.asarray(coords_bohr).reshape(-1))["hessian"]
            finally:
                calc.params = old_p
            res = rfo_optimize(eff_p, calc.pad_bohr(coords_bohr),
                               calc.system.free_mask, calc.n_atoms,
                               params=calc.pack(p), hessian0=H0,
                               thresh=relax_thresh,
                               max_cycles=relax_max_cycles)
        else:
            res = lbfgs_minimize(eff_p, calc.pad_bohr(coords_bohr),
                                 calc.system.free_mask,
                                 params=calc.pack(p),
                                 thresh=relax_thresh,
                                 max_cycles=relax_max_cycles, max_step=0.1)
        calc.force_calls += int(res.cycles) + 1
        return calc.unpad(res.x)

    if preopt:
        # unbiased pre-optimization of the input (reference scan2d/3d
        # --preopt, default True there)
        from .opt import optimize_structure
        coords, e0, conv0, _ = optimize_structure(
            struct, base_calc, opt_mode=relax_mode, thresh=relax_thresh,
            max_cycles=relax_max_cycles)
        x_init = np.asarray(coords)
        struct.coords = x_init * BOHR2ANG
        d0 = [float(np.linalg.norm(struct.coords[p[0]]
                                   - struct.coords[p[1]]))
              for p in pairs]
        values = [grid_values(d0[k], axes[k]) for k in range(ndim)]
        shape = tuple(len(v) for v in values)
        energies = np.full(shape, np.nan)
        if verbose:
            print(f"[scan{ndim}d] preopt: E = {e0:.6f} Ha "
                  f"({'conv' if conv0 else 'max cycles'})")

    # Reference nesting (scan2d.py:1-100, scan3d.py:1-95): when an OUTER
    # axis advances, the structure is first relaxed with only the axes up
    # to that level biased (inner distances free), then the inner sweep
    # runs with all levels up to it biased — warm-started from the
    # previous point at the same level.
    rows = []

    def sweep(level: int, idx_prefix: Tuple[int, ...],
              fixed_targets: List[float], start: np.ndarray):
        coords_here = start
        for ii, val in enumerate(values[level]):
            targets = fixed_targets + [val]
            full_t = targets + [0.0] * (ndim - level - 1)
            ks = [bias_k] * (level + 1) + [0.0] * (ndim - level - 1)
            coords_here = relax(coords_here, full_t, ks)
            idx = idx_prefix + (ii,)
            if level == ndim - 1:
                coords_store[idx] = coords_here
                # unbiased energy at the relaxed point (scan2d.py:357)
                e = float(base_calc.get_energy(
                    coords_here.reshape(-1))["energy"])
                energies[idx] = e
                rows.append(list(targets) + [e])
                if verbose:
                    print(f"[scan{ndim}d] {idx}: d = "
                          + ", ".join(f"{t:.3f}" for t in targets)
                          + f" -> E = {e:.6f} Ha")
            else:
                sweep(level + 1, idx, targets, coords_here)

    sweep(0, (), [], x_init)

    header = ",".join(f"d{k + 1}_ang" for k in range(ndim)) + ",energy_au"
    table = np.asarray(rows)
    csv = out / "surface.csv"
    np.savetxt(csv, table, delimiter=",", header=header, comments="")
    fig = _plot_surface(out, table, ndim, baseline, zmin, zmax)
    if verbose:
        print(f"[scan{ndim}d] elapsed {format_elapsed(t0)}")
    return {"values": values, "energies": energies, "surface": table,
            "outputs": [csv, fig], "structure": struct,
            "calculator": calc,
            "force_calls": calc.force_calls + base_calc.force_calls}


def _plot_surface(out: Path, table: np.ndarray, ndim: int,
                  baseline: str = "min", zmin=None, zmax=None) -> Path:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from ..constants import AU2KCALPERMOL

    ref = (table[0, ndim] if baseline == "first"
           else np.nanmin(table[:, ndim]))
    E = (table[:, ndim] - ref) * AU2KCALPERMOL
    vmin = zmin if zmin is not None else float(np.nanmin(E))
    vmax = zmax if zmax is not None else float(np.nanmax(E))
    levels = np.linspace(vmin, max(vmax, vmin + 1e-9), 24)
    if ndim == 2:
        fig, ax = plt.subplots(figsize=(6, 5))
        x, y = table[:, 0], table[:, 1]
        try:
            from scipy.interpolate import RBFInterpolator
            xi = np.linspace(x.min(), x.max(), 80)
            yi = np.linspace(y.min(), y.max(), 80)
            XX, YY = np.meshgrid(xi, yi)
            Z = RBFInterpolator(np.column_stack([x, y]), E)(
                np.column_stack([XX.ravel(), YY.ravel()])).reshape(XX.shape)
            Z = np.clip(Z, vmin, vmax)
            pc = ax.contourf(XX, YY, Z, levels=levels, cmap="viridis")
            ax.contour(XX, YY, Z, levels=levels[::2], colors="w",
                       linewidths=0.4)
        except Exception:
            pc = ax.tricontourf(x, y, np.clip(E, vmin, vmax),
                                levels=levels, cmap="viridis")
        ax.plot(x, y, "k.", ms=2)
        fig.colorbar(pc, label="dE (kcal/mol)")
        ax.set_xlabel("d1 (Å)")
        ax.set_ylabel("d2 (Å)")
        path = out / "surface_2d.png"
    else:
        fig = plt.figure(figsize=(7, 6))
        ax = fig.add_subplot(projection="3d")
        sc = ax.scatter(table[:, 0], table[:, 1], table[:, 2], c=E,
                        cmap="viridis", s=30, vmin=vmin, vmax=vmax)
        fig.colorbar(sc, label="dE (kcal/mol)", shrink=0.7)
        ax.set_xlabel("d1 (Å)")
        ax.set_ylabel("d2 (Å)")
        ax.set_zlabel("d3 (Å)")
        path = out / "surface_3d.png"
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
    _maybe_plotly_html(out, table, ndim, baseline, zmin, zmax)
    return path


def _maybe_plotly_html(out: Path, table: np.ndarray, ndim: int,
                       baseline: str = "min", zmin=None, zmax=None):
    """Interactive HTML surface/isosurface like the reference (scan2d.py
    heatmap/3D HTML, scan3d.py isosurface HTML) — emitted when plotly is
    importable (absent from this image; the PNG path always runs)."""
    try:
        import plotly.graph_objects as go
    except ImportError:
        return None
    from ..constants import AU2KCALPERMOL
    ref = (table[0, ndim] if baseline == "first"
           else np.nanmin(table[:, ndim]))
    E = (table[:, ndim] - ref) * AU2KCALPERMOL
    vmin = zmin if zmin is not None else float(np.nanmin(E))
    vmax = zmax if zmax is not None else float(np.nanmax(E))
    if ndim == 2:
        fig = go.Figure(data=go.Mesh3d(
            x=table[:, 0], y=table[:, 1], z=E, intensity=E,
            cmin=vmin, cmax=vmax, colorscale="Viridis"))
        path = out / "surface_2d.html"
    else:
        fig = go.Figure(data=go.Isosurface(
            x=table[:, 0], y=table[:, 1], z=table[:, 2], value=E,
            isomin=vmin, isomax=vmax,
            surface_count=6, colorscale="Viridis", opacity=0.5))
        path = out / "surface_3d.html"
    fig.write_html(path)
    return path
