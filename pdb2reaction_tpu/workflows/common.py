"""Shared workflow plumbing: input prep, freeze links, calculators, outputs.

Capability match (by reference behavior):
- input preparation for .pdb/.xyz/.trj/.gjf with charge/spin resolution
  (utils.py:745-888, ``prepare_input_structure`` /
  ``resolve_charge_spin_or_raise``)
- link-H parent auto-freeze from LKH/HL records (utils.py:995-1222,
  ``detect_freeze_links``): for each HL atom, the nearest non-LKH atom is
  frozen; merged into every driver's freeze list (e.g. opt.py:668-676)
- atom selector strings like 'TYR 285 CA' resolved against PDB metadata
  (utils.py:1057-1159)
- output mirroring: every XYZ/TRJ product gets a PDB companion when the
  input was a PDB, behind a global toggle (utils.py:891-989)
"""

from __future__ import annotations

import os
from pathlib import Path

import jax

# Honor JAX_PLATFORMS even when a site plugin (axon) force-registered a
# platform list before we were imported.
_env_platforms = os.environ.get("JAX_PLATFORMS")
if _env_platforms and jax.config.jax_platforms != _env_platforms:
    try:
        jax.config.update("jax_platforms", _env_platforms)
    except Exception:
        pass


def _resolved_platform() -> str:
    """Best-effort platform name WITHOUT initializing a backend.

    ``jax.config.jax_platforms`` is None unless JAX_PLATFORMS was set, and
    ``jax.default_backend()`` would eagerly claim the TPU (expensive on
    axon; wrong for host-only subcommands like ``extract``). Instead check
    the registered backend factories: an accelerator plugin registers its
    factory at import time, so "no accelerator factory" == CPU host."""
    cfg = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS")
    if cfg:
        return cfg.split(",")[0].strip().lower()
    try:
        from jax._src import xla_bridge as _xb
        factories = set(getattr(_xb, "_backend_factories", {}))
    except Exception:
        factories = set()
    for p in ("axon", "tpu", "cuda", "rocm", "gpu"):
        if p in factories:
            return p
    return "cpu"


PLATFORM = _resolved_platform()

# Precision policy: on CPU, optimizer math runs in float64 (host-side
# reference contract; vtight thresholds). On the TPU path x64 stays OFF —
# measured on v5e: with the global x64 flag enabled, XLA stages ~8 live
# broadcast copies of the per-layer message tensors even for all-f32
# programs (40 GB HLO temps at 12 images / 300 atoms, 60x slowdown when it
# fits); with the flag off the identical program runs in ~100 ms. The MLIP
# is float32 regardless (as is the reference's UMA); Hartree/Bohr
# conversions happen in float64 on the host either way.
if PLATFORM == "cpu" or os.environ.get("PDB2R_TPU_X64") == "1":
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: workflows re-jit identical programs across
# processes (CLI invocations); caching makes repeat runs start instantly.
# Disable with PDB2R_TPU_NO_CACHE=1; choose the dir with PDB2R_TPU_CACHE.
# (The round-2 hang on the axon remote-compile platform is gone —
# re-verified round 3: cross-process probe compile 1.65 s -> 1.02 s with
# the cache dir set.) This is the ONE cache-setup path — the CLI calls it
# too (cli.py), so the env knobs behave identically however the package
# is entered.
def _host_fingerprint() -> str:
    """Partition key for the persistent cache: XLA:CPU AOT executables
    bake the compile host's CPU feature set, and loading one on a host
    with different features warns "could lead to execution errors such
    as SIGILL" — observed here as a HANG inside
    compilation_cache.get_executable_and_time when a VM migration
    changed the visible flags. jax's cache key does not cover CPU
    features, so the directory does."""
    import hashlib
    import platform
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    h = hashlib.sha256(f"{platform.machine()}|{feats}".encode())
    return h.hexdigest()[:12]


def enable_compile_cache():
    if os.environ.get("PDB2R_TPU_NO_CACHE"):
        return
    try:
        base = os.environ.get(
            "PDB2R_TPU_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "pdb2r_jax"))
        cache_dir = os.path.join(base, _host_fingerprint())
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # the cache is an optimization; never block on it


enable_compile_cache()
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from ..core.structure import Structure
from ..core import io_pdb, io_xyz
from ..bio.residues import LINK_H_NAME, LINK_H_RESNAME
from ..mlip.calculator import Calculator
from ..mlip import potentials
from ..mlip.uma import make_uma_calculator

_CONVERT_ENABLED = True


def set_convert_enabled(flag: bool) -> None:
    global _CONVERT_ENABLED
    _CONVERT_ENABLED = bool(flag)


def convert_enabled() -> bool:
    return _CONVERT_ENABLED


_DEFAULT_REF_PDB = None
_DEFAULT_LIGAND_CHARGE = None


def set_default_ligand_charge(value) -> None:
    """Process-wide --ligand-charge (set by the CLI wrapper): a total
    charge or RES:q mapping used to derive the workflow charge from a
    full-structure residue charge summary when -q is absent (reference
    utils.py:820-888)."""
    global _DEFAULT_LIGAND_CHARGE
    _DEFAULT_LIGAND_CHARGE = value


def get_default_ligand_charge():
    return _DEFAULT_LIGAND_CHARGE


def set_default_ref_pdb(path) -> None:
    """Process-wide --ref-pdb template (set by the CLI): a PDB whose
    topology/metadata is attached to XYZ/GJF inputs so PDB conversion and
    selector strings work (reference utils.py:772-779 validation)."""
    global _DEFAULT_REF_PDB
    _DEFAULT_REF_PDB = path


def load_structure(path, ref_pdb=None) -> Structure:
    p = Path(path)
    suf = p.suffix.lower()
    if suf == ".pdb":
        st = io_pdb.read_pdb(p)
        st.input_suffix = suf
        return st
    if suf in (".xyz", ".trj"):
        st = io_xyz.read_xyz(p)
    elif suf == ".gjf" or suf == ".com":
        from ..core.io_gjf import read_gjf
        st = read_gjf(p)
    else:
        raise ValueError(f"Unsupported structure format: {p}")
    st.input_suffix = suf
    rp = ref_pdb or _DEFAULT_REF_PDB
    if rp:
        tmpl = io_pdb.read_pdb(rp)
        if tmpl.n_atoms != st.n_atoms:
            raise ValueError(
                f"--ref-pdb {rp} has {tmpl.n_atoms} atoms but the input "
                f"has {st.n_atoms} (reference utils.py:772-779 check)")
        st.pdb_atoms = tmpl.pdb_atoms
        st.source_path = Path(rp)
    return st


def detect_freeze_links(pdb_path) -> List[int]:
    """Indices (0-based, into the non-LKH atom sequence) of the parent atom
    of every HL link hydrogen (reference utils.py:1186-1210)."""
    atoms = io_pdb.parse_pdb_atoms(pdb_path)
    others, lkhs = [], []
    for a in atoms:
        if a["resname"] == LINK_H_RESNAME and a["name"] == LINK_H_NAME:
            lkhs.append(a)
        else:
            others.append(a)
    if not lkhs:
        return []
    oxyz = np.array([[a["x"], a["y"], a["z"]] for a in others]) \
        if others else np.zeros((0, 3))
    out = []
    for h in lkhs:
        if len(others) == 0:
            out.append(-1)
            continue
        d2 = ((oxyz - np.array([h["x"], h["y"], h["z"]])) ** 2).sum(1)
        out.append(int(np.argmin(d2)))
    return out


def merge_freeze(struct: Structure, extra: Sequence[int],
                 auto_freeze_links: bool = True) -> List[int]:
    """Union of explicit freeze indices and detected link parents."""
    freeze = set(int(i) for i in extra)
    if auto_freeze_links and struct.source_path \
            and str(struct.source_path).lower().endswith(".pdb"):
        freeze.update(i for i in detect_freeze_links(struct.source_path)
                      if i >= 0)
    return sorted(freeze)


def resolve_atom_spec(spec: Union[int, str], struct: Structure) -> int:
    """Resolve an atom selector: integer index or 'RESNAME RESSEQ ATOMNAME'
    string like 'TYR 285 CA' (utils.py:1057-1159)."""
    if isinstance(spec, (int, np.integer)):
        return int(spec)
    s = str(spec).strip()
    if s.lstrip("+-").isdigit():
        return int(s)
    parts = s.split()
    if len(parts) != 3 or struct.pdb_atoms is None:
        raise ValueError(f"Cannot resolve atom spec {spec!r} "
                         "(need 'RESNAME RESSEQ NAME' and PDB input)")
    resname, resseq, name = parts[0].upper(), int(parts[1]), parts[2].upper()
    hits = [i for i, a in enumerate(struct.pdb_atoms)
            if a["resname"].upper() == resname and a["resseq"] == resseq
            and a["name"].upper() == name]
    if len(hits) != 1:
        raise ValueError(f"Atom spec {spec!r} matched {len(hits)} atoms")
    return hits[0]


def resolve_charge_spin(struct: Structure, charge: Optional[int],
                        spin: Optional[int],
                        ligand_charge=None) -> Tuple[int, int]:
    """CLI charge/spin win; else .gjf template values; else a total charge
    derived from --ligand-charge + residue charge tables (PDB inputs only,
    reference utils.py:820-888); else raise for charge (reference requires
    explicit charge, utils.py:809-888) with spin defaulting to 1."""
    q = charge
    s = spin
    if q is None and getattr(struct, "gjf_charge", None) is not None:
        q = struct.gjf_charge
    if s is None and getattr(struct, "gjf_spin", None) is not None:
        s = struct.gjf_spin
    lc = ligand_charge if ligand_charge is not None \
        else _DEFAULT_LIGAND_CHARGE
    if lc is not None:
        src = getattr(struct, "source_path", None)
        # the ORIGINAL input must be a PDB: source_path is rebound to the
        # --ref-pdb template for xyz/gjf inputs (load_structure), so an
        # xyz + --ref-pdb combination must still be rejected here
        # (reference utils.py:869-875; ADVICE r4)
        in_suf = getattr(struct, "input_suffix", None)
        is_pdb = (in_suf == ".pdb") if in_suf \
            else bool(src and str(src).lower().endswith(".pdb"))
        if not (src and is_pdb):
            raise ValueError(
                "--ligand-charge is only supported for PDB inputs; it "
                "cannot be used with .xyz or .gjf files "
                "(reference utils.py:869-875)")
        if q is None:
            from ..bio.extract import Model, compute_charge_summary
            model = Model.from_pdb(src)
            summary = compute_charge_summary(
                model, set(model.res_order), set(), lc)
            total = float(summary["total_charge"])
            q = int(round(total))
            print(f"[charge] full-complex summary from --ligand-charge: "
                  f"protein {summary['protein_charge']:+g}, ligand "
                  f"{summary['ligand_charge']:+g}, ions "
                  f"{summary['ion_charge']:+g} -> total {total:+g} "
                  f"(using {q:+d})")
    if q is None:
        raise ValueError("Charge (-q/--charge) is required for this input")
    return int(q), int(s if s is not None else 1)


def make_calculator(struct: Structure, *, calc_mode: str = "uma",
                    charge: int = 0, spin: int = 1,
                    freeze_atoms: Sequence[int] = (),
                    model: str = "uma-s-1p1",
                    mesh=None, **calc_kw) -> Calculator:
    """Calculator factory. ``calc_mode`` selects the UMA-class MLIP or an
    analytic test potential (morse/lj) — the latter run every workflow
    end-to-end without pretrained weights (SURVEY.md §4(d) fake-calculator
    strategy the reference lacks)."""
    mode = (calc_mode or "uma").lower()
    if mode == "uma":
        return make_uma_calculator(struct, model=model, charge=charge,
                                   spin=spin, freeze_atoms=freeze_atoms,
                                   mesh=mesh, **calc_kw)
    if mode == "morse":
        return Calculator(struct, potentials.make_morse(),
                          freeze_atoms=freeze_atoms, mesh=mesh,
                          **{k: v for k, v in calc_kw.items()
                             if k in ("hessian_calc_mode", "fd_step",
                                      "return_partial_hessian",
                                      "hessian_double", "pad_multiple")})
    if mode == "lj":
        return Calculator(struct, potentials.make_lj(),
                          freeze_atoms=freeze_atoms, mesh=mesh,
                          **{k: v for k, v in calc_kw.items()
                             if k in ("hessian_calc_mode", "fd_step",
                                      "return_partial_hessian",
                                      "hessian_double", "pad_multiple")})
    raise ValueError(f"Unknown calc mode {calc_mode!r}")


def write_outputs(out_dir: Path, name: str, struct: Structure,
                  coords_bohr: np.ndarray, energy: Optional[float] = None,
                  source_pdb: Optional[Path] = None) -> List[Path]:
    """Write final_geometry.xyz (+ .pdb companion if input was PDB, + .gjf
    companion if input was GJF, conversion enabled) — the reference's
    convert_xyz_like_outputs mirroring contract (utils.py:950-989: PDB for
    .pdb inputs; GJF for .xyz outputs when the input carried a Gaussian
    template, charge/spin/route preserved from the template)."""
    from ..constants import BOHR2ANG
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    coords_ang = np.asarray(coords_bohr).reshape(-1, 3) * BOHR2ANG
    st = struct.copy(coords=coords_ang)
    paths = []
    xyz = out_dir / f"{name}.xyz"
    io_xyz.write_xyz(xyz, st, energy=energy)
    paths.append(xyz)
    src = source_pdb or struct.source_path
    if convert_enabled() and src and str(src).lower().endswith(".pdb"):
        pdb = out_dir / f"{name}.pdb"
        try:
            io_pdb.overlay_coords_on_template(src, coords_ang, pdb)
            paths.append(pdb)
        except Exception as e:
            print(f"[convert] WARNING: PDB conversion failed: {e}")
    tmpl = getattr(struct, "gjf_template", None)
    if convert_enabled() and tmpl is not None \
            and getattr(struct, "is_gjf", False):
        gjf = out_dir / f"{name}.gjf"
        try:
            if len(tmpl.symbols) != len(coords_ang):
                raise ValueError(
                    f"atom count mismatch: template {len(tmpl.symbols)}, "
                    f"output {len(coords_ang)}")
            gjf.write_text(tmpl.render(coords_ang))
            paths.append(gjf)
        except Exception as e:
            print(f"[convert] WARNING: GJF conversion failed: {e}")
    return paths


def write_trajectory(out_dir: Path, name: str, struct: Structure,
                     frames_bohr: Sequence[np.ndarray],
                     energies: Optional[Sequence[float]] = None,
                     source_pdb: Optional[Path] = None) -> List[Path]:
    from ..constants import BOHR2ANG
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    frames = [struct.copy(coords=np.asarray(c).reshape(-1, 3) * BOHR2ANG)
              for c in frames_bohr]
    trj = out_dir / f"{name}.trj"
    io_xyz.write_trj(trj, frames, energies=energies)
    paths = [trj]
    src = source_pdb or struct.source_path
    if convert_enabled() and src and str(src).lower().endswith(".pdb"):
        pdb = out_dir / f"{name}.pdb"
        try:
            io_pdb.write_pdb_frames(
                pdb, load_structure(src),
                [np.asarray(c).reshape(-1, 3) * BOHR2ANG for c in frames_bohr],
                energies=energies)
            paths.append(pdb)
        except Exception as e:
            print(f"[convert] WARNING: PDB trajectory conversion failed: {e}")
    return paths
