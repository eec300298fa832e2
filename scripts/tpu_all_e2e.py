"""End-to-end `all` wall-clock on an enzyme-like R/P PDB pair — the one
SURVEY §6 benchmark config not covered by bench.py ("`all` on an enzyme
R/P pair ... must be scripted and measured").

Generates a synthetic active site — a 25-atom macrocyclic ligand (LIG)
ringed by SER/ASN side chains whose tip oxygens/nitrogens sit 2.3 Å from
the nearest ligand atom (inside the extraction contact radius 2.6 Å,
reference extract.py defaults) plus a shell of waters — writes an R/P
pair differing by one broken ligand C–O bond, and drives the FULL
pipeline through workflows.allflow.run_all: element preflight, Stage-1
pocket extraction + charge rounding, Stage-2 recursive path search
(GSM), Stage-3 merged mirrors, Stage-4 tsopt/IRC/endpoint-opt/freq, and
the aggregated diagrams/summary (reference all.py §3.1 call stack).

The potential is the UMA-class surrogate (uma-s-1p1, untrained weights —
no checkpoint exists in-image), so the measured quantity is pipeline
wall-clock and per-phase force-call accounting at the reference's
operating shape, not chemistry. Stage caps keep unconverged phases
bounded. Run on the TPU:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_all_e2e.py \
        [--model uma-s-1p1] [--calc-mode uma|morse] [--n-res 48] [--out DIR]

Prints ONE JSON line: total wall-clock, per-phase {calls, seconds},
pocket size, and per-segment convergence flags.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _atom(serial, name, resname, chain, resseq, xyz, record="ATOM",
          element=None):
    return dict(record=record, serial=serial, name=name, resname=resname,
                chain=chain, resseq=resseq, element=element or name[0],
                occupancy=1.0, bfactor=0.0, x=xyz[0], y=xyz[1], z=xyz[2])


def _fib_sphere(n):
    """Fibonacci sphere directions — evenly spaced residue placements."""
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5 ** 0.5) * i
    return np.stack([np.sin(phi) * np.cos(theta),
                     np.sin(phi) * np.sin(theta), np.cos(phi)], -1)


def build_enzyme_pdb(path, *, n_res=48, n_wat=12, stretch=None, seed=0):
    """Synthetic active site around a macrocyclic ligand.

    Ligand: two staggered 12-C rings (r=4.2 Å, z=±0.7) + a C1–O1 pair on
    ring 1 — ``stretch`` displaces O1 radially (product = broken bond).
    Residues: alternating SER/ASN; tip heavy atom 2.3 Å outward from the
    nearest ligand atom, side chain + backbone marching radially outward
    so extraction keeps {CB, OG} / {CB, CG, OD1, ND2} + a link H.
    """
    rng = np.random.default_rng(seed)
    atoms = []
    serial = [0]

    def add(name, resname, chain, resseq, xyz, record="ATOM", element=None):
        serial[0] += 1
        atoms.append(_atom(serial[0], name, resname, chain, resseq,
                           tuple(xyz), record=record, element=element))

    # ---- ligand: 24-C macrocycle + central core + reactive C1-O1 ---------
    lig_xyz = []
    for k in range(12):
        a = 2 * np.pi * k / 12
        lig_xyz.append((4.2 * np.cos(a), 4.2 * np.sin(a), 0.7))
    for k in range(12):
        a = 2 * np.pi * (k + 0.5) / 12
        lig_xyz.append((4.2 * np.cos(a), 4.2 * np.sin(a), -0.7))
    # central core (fills the macrocycle hole so every outward ray from
    # the origin grazes the ligand — residue placement ray-marches the
    # 2.3 Å offset surface below)
    for xyz in ((0.0, 0.0, 0.0), (1.5, 0, 0), (-1.5, 0, 0), (0, 1.5, 0),
                (0, -1.5, 0), (0, 0, 1.4), (0, 0, -1.4),
                (2.85, 0, 0.7), (-2.85, 0, -0.7), (0, 2.85, -0.7),
                (0, -2.85, 0.7)):
        lig_xyz.append(xyz)
    lig_xyz = np.asarray(lig_xyz)
    c1 = lig_xyz[0]
    u1 = np.array([1.0, 0.0, 0.0])
    o1 = c1 + (stretch if stretch else 1.30) * u1
    resseq = 500
    for i, xyz in enumerate(lig_xyz):
        add(f"C{i + 2}", "LIG", "A", resseq, xyz, record="HETATM",
            element="C")
    add("O1", "LIG", "A", resseq, o1, record="HETATM", element="O")

    # residue/water placement always sees BOTH O1 endpoints (bonded at
    # 1.30 Å and broken at 2.40 Å): placements stay identical between the
    # R and P builds (extraction requires matching atom counts/order
    # across models, extract.py:554-564) and nothing sits on the
    # dissociation path
    lig_all = np.vstack([lig_xyz, (c1 + 1.30 * u1)[None],
                         (c1 + 2.40 * u1)[None]])

    def surface_tip(u, offset):
        """Largest t with min-dist(t*u, ligand) < offset, interpolated to
        the root — the point on the ligand's offset surface along ray u."""
        ts = np.arange(0.0, 14.0, 0.05)
        pts = ts[:, None] * u[None]
        dmin = np.linalg.norm(pts[:, None] - lig_all[None], axis=-1).min(1)
        inside = np.nonzero(dmin < offset)[0]
        k = inside[-1] if inside.size else 0
        return ts[min(k + 1, len(ts) - 1)] * u

    # ---- residues on the 2.3 Å offset surface ------------------------------
    dirs = _fib_sphere(n_res + n_wat)
    wat_dirs, res_dirs = dirs[:n_wat], dirs[n_wat:]
    tips = []                      # placed tips: de-conflict concave spots

    def clashes(pt, lim=2.2):
        return any(np.linalg.norm(pt - t) < lim for t in tips)

    for ri, u in enumerate(res_dirs):
        tip = surface_tip(u, 2.3)
        if clashes(tip):           # rays converge in concave surface
            continue               # regions; drop rather than overlap
        tips.append(tip)
        # stable branch perpendiculars; neighbors get near-parallel
        # branches, which keeps inter-residue contacts at vdW range
        p = np.cross(u, [0.0, 0.0, 1.0])
        if np.linalg.norm(p) < 0.3:
            p = np.cross(u, [1.0, 0.0, 0.0])
        p /= np.linalg.norm(p)
        jitter = rng.normal(scale=0.03, size=3)
        resseq = 10 + ri
        if ri % 2 == 0:   # SER: OG(tip) - CB - CA - backbone
            add("OG", "SER", "A", resseq, tip + jitter, element="O")
            cb = tip + 1.43 * u
            ca = cb + 1.54 * u
            add("CB", "SER", "A", resseq, cb, element="C")
            add("CA", "SER", "A", resseq, ca, element="C")
            add("N", "SER", "A", resseq, ca + 1.46 * (0.8 * u + 0.6 * p),
                element="N")
            c = ca + 1.52 * (0.8 * u - 0.6 * p)
            add("C", "SER", "A", resseq, c, element="C")
            add("O", "SER", "A", resseq, c + 1.23 * u, element="O")
        else:             # ASN: OD1(tip) - CG(+ND2) - CB - CA - backbone
            add("OD1", "ASN", "A", resseq, tip + jitter, element="O")
            cg = tip + 1.25 * u
            add("CG", "ASN", "A", resseq, cg, element="C")
            add("ND2", "ASN", "A", resseq, cg + 1.33 * (0.87 * u + 0.5 * p),
                element="N")
            cb = cg + 1.52 * (0.87 * u - 0.5 * p)
            ca = cb + 1.54 * u
            add("CB", "ASN", "A", resseq, cb, element="C")
            add("CA", "ASN", "A", resseq, ca, element="C")
            add("N", "ASN", "A", resseq, ca + 1.46 * (0.8 * u + 0.6 * p),
                element="N")
            c = ca + 1.52 * (0.8 * u - 0.6 * p)
            add("C", "ASN", "A", resseq, c, element="C")
            add("O", "ASN", "A", resseq, c + 1.23 * u, element="O")

    # ---- waters on a slightly wider offset shell ---------------------------
    for wi, u in enumerate(wat_dirs):
        w = surface_tip(u, 2.45)
        if clashes(w):
            continue
        tips.append(w)
        add("O", "HOH", "A", 800 + wi,
            w + rng.normal(scale=0.05, size=3),
            record="HETATM", element="O")

    from pdb2reaction_tpu.core import io_pdb
    lines = [io_pdb.format_pdb_line(a, (a["x"], a["y"], a["z"]))
             for a in atoms]
    Path(path).write_text("\n".join(lines + ["END"]) + "\n")
    return len(atoms)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="uma-s-1p1")
    ap.add_argument("--calc-mode", default="uma")
    ap.add_argument("--n-res", type=int, default=48)
    ap.add_argument("--max-nodes", type=int, default=10)
    ap.add_argument("--tsopt-max-cycles", type=int, default=300)
    ap.add_argument("--no-freq", action="store_true")
    ap.add_argument("--max-kinks", type=int, default=None,
                    help="Override path-search max_consecutive_kinks "
                         "(reference default 2). An UNTRAINED surrogate's "
                         "random PES makes every segment a kink, tripping "
                         "the abort guard — raise this to measure the full "
                         "pipeline wall-clock at MLIP shapes anyway.")
    ap.add_argument("--out", default="/tmp/all_e2e")
    args = ap.parse_args()

    import pdb2reaction_tpu.workflows.common  # noqa: F401  (compile cache)
    import jax
    print("devices:", jax.devices())

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    r_pdb, p_pdb = out / "R.pdb", out / "P.pdb"
    n_full = build_enzyme_pdb(r_pdb, n_res=args.n_res)
    build_enzyme_pdb(p_pdb, n_res=args.n_res, stretch=2.40)

    from pdb2reaction_tpu.workflows.allflow import run_all

    t0 = time.perf_counter()
    try:
        search_kw = ({"max_consecutive_kinks": args.max_kinks}
                     if args.max_kinks is not None else None)
        res = run_all(
            [r_pdb, p_pdb], center="LIG", ligand_charge=0,
            calc_mode=args.calc_mode, model=args.model,
            out_dir=out / "result_all",
            gs_kw={"max_nodes": args.max_nodes},
            search_kw=search_kw,
            # stage-4 toggles now default False (reference parity) — this
            # benchmark measures the FULL pipeline, so turn them on
            tsopt=True,
            tsopt_kw={"max_cycles_total": args.tsopt_max_cycles},
            do_freq=not args.no_freq,
        )
    except Exception as e:
        # always emit parseable JSON (bench.py resilience contract) — an
        # untrained surrogate's random PES legitimately trips the
        # consecutive-kink abort (path_search.py, reference
        # path_search.py:1407-1414)
        print(json.dumps({
            "metric": "all_e2e_wallclock_s", "value": None,
            "model": args.model, "calc_mode": args.calc_mode,
            "error": f"{type(e).__name__}: {e}"[:300],
            "elapsed_s": round(time.perf_counter() - t0, 1)}))
        return
    wall = time.perf_counter() - t0

    segs = res.get("segments", res.get("segment_results", []))
    seg_flags = []
    if isinstance(segs, list):
        for s in segs:
            if not isinstance(s, dict):
                continue
            flag = {k: s.get(k) for k in
                    ("segment", "converged", "barrier_au", "error")
                    if k in s}
            ts = s.get("tsopt")
            if isinstance(ts, dict):
                flag["tsopt_converged"] = ts.get("converged")
                flag["n_imag"] = ts.get("n_imag")
            seg_flags.append(flag)
    pocket = None
    try:
        from pdb2reaction_tpu.core import io_pdb
        pock = sorted((out / "result_all" / "stage1_extract")
                      .glob("pocket_*.pdb"))
        if pock:
            pocket = io_pdb.read_pdb(pock[0]).n_atoms
    except Exception:
        pass

    print(json.dumps({
        "metric": "all_e2e_wallclock_s", "value": round(wall, 1),
        "model": args.model, "calc_mode": args.calc_mode,
        "full_system_atoms": n_full, "pocket_atoms": pocket,
        "force_call_phases": res.get("force_call_phases"),
        "segments": seg_flags,
    }))


if __name__ == "__main__":
    main()
