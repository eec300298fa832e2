"""Command-line interface.

Capability match: /root/reference/pdb2reaction/cli.py — a Click group whose
DEFAULT subcommand is ``all`` (cli.py:5-41), registering the per-task
drivers. Boolean flags take explicit True|False (README.md:35). Common
options mirror the reference surface (-i, -q/--charge, -s/--spin,
--freeze-atoms, --thresh, --args-yaml, --workers, ...) plus TPU-specific
extras (--calc-mode exposes the analytic test potentials; --model picks
the MLIP config).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path
from typing import Any, Dict, List, Tuple

import click

from .workflows.config import (load_yaml_dict, apply_yaml_overrides, parse_bool,
                               normalize_choice)


def _enable_compile_cache():
    """Persistent XLA compilation cache: the per-program compiles dominate
    cold `all` runs (~30-120 s each through the axon relay — VERDICT r2
    item 9). Single implementation in workflows/common.py (importing it
    also installs the cache at module load); env knobs: PDB2R_TPU_NO_CACHE
    to opt out, PDB2R_TPU_CACHE to pick the directory."""
    try:
        from .workflows.common import enable_compile_cache
        enable_compile_cache()
    except Exception:
        pass  # cache is an optimization; never block the CLI on it


class DefaultGroup(click.Group):
    """Click group that forwards unknown leading args to a default command
    (reference cli.py:5-17 DefaultGroup behavior)."""

    default_cmd = "all"

    def resolve_command(self, ctx, args):
        try:
            return super().resolve_command(ctx, args)
        except click.UsageError:
            cmd = self.get_command(ctx, self.default_cmd)
            if cmd is None:
                raise
            return self.default_cmd, cmd, args

    def parse_args(self, ctx, args):
        if args and args[0].startswith("-") and args[0] not in (
                "-h", "--help", "--version"):
            args = [self.default_cmd] + args
        return super().parse_args(ctx, args)


BOOL = click.Choice(["True", "False", "true", "false"],
                    case_sensitive=False)


def _bool_cb(ctx, param, value):
    return None if value is None else parse_bool(value)


def common_options(f):
    opts = [
        click.option("-q", "--charge", type=int, default=None,
                     help="Total charge of the ML region."),
        click.option("-s", "--spin", type=int, default=None,
                     help="Spin multiplicity (2S+1)."),
        click.option("-m", "--mult", "--multiplicity", "multiplicity",
                     type=int, default=None,
                     help="Alias for --spin (reference flag name --mult)."),
        click.option("--freeze-atoms", "freeze_atoms", default="",
                     help="Comma-separated indices or 'RES SEQ NAME' specs."),
        click.option("--auto-freeze-links", type=BOOL, default="True",
                     callback=_bool_cb, help="Auto-freeze link-H parents."),
        click.option("--freeze-links", type=BOOL, default=None,
                     callback=_bool_cb,
                     help="Alias for --auto-freeze-links (reference name)."),
        click.option("--ref-pdb", type=click.Path(path_type=Path,
                                                  exists=True,
                                                  dir_okay=False),
                     default=None,
                     help="Reference PDB topology when the input is "
                          "XYZ/GJF (keeps input coordinates)."),
        click.option("--dump", type=BOOL, default="False", callback=_bool_cb,
                     help="Write optimizer/scan trajectories. Device-"
                          "resident loops expose host-sync snapshots, not "
                          "every cycle."),
        click.option("--calc-mode", default="uma",
                     type=click.Choice(["uma", "morse", "lj"]),
                     help="Potential backend (analytic modes for testing)."),
        click.option("--model", default="uma-s-1p1",
                     help="MLIP checkpoint/config name."),
        click.option("--hessian-calc-mode", default="Analytical",
                     type=click.Choice(["Analytical", "FiniteDifference"]),
                     help="Hessian evaluation mode."),
        click.option("--workers", type=int, default=1,
                     help="Mesh data-axis size for batched force sharding."),
        click.option("--workers-per-node", type=int, default=1,
                     help="Accepted for reference compatibility; the TPU "
                          "runtime fixes per-host device counts (the Ray "
                          "workers_per_node knob has no analogue)."),
        click.option("--spatial", type=int, default=1,
                     help="Atom-axis shards per structure (spatial "
                          "partitioning of one big system over devices)."),
        click.option("--ligand-charge", default=None,
                     help="Total charge or per-resname mapping (e.g. "
                          "GPP:-3,SAM:1) used to derive the workflow "
                          "charge when -q is absent (PDB inputs only; "
                          "reference utils.py:820-888)."),
        click.option("--args-yaml", type=click.Path(path_type=Path),
                     default=None, help="YAML overriding any defaults."),
        click.option("--out-dir", type=click.Path(path_type=Path),
                     default=None, help="Output directory."),
        click.option("--convert-files", type=BOOL, default="True",
                     callback=_bool_cb,
                     help="Mirror XYZ outputs as PDB/GJF."),
        click.option("--profile", "profile_dir", default=None,
                     type=click.Path(path_type=Path),
                     help="Capture a jax.profiler trace into DIR."),
    ]
    for o in reversed(opts):
        f = o(f)

    import functools

    @functools.wraps(f)
    def wrapper(*args, **kw):
        profile_dir = kw.pop("profile_dir", None)
        # process-wide defaults are SET EVERY invocation (clearing stale
        # values from a prior in-process CLI call, e.g. under `all` or in
        # tests)
        from .mlip.uma import set_default_spatial
        set_default_spatial(kw.pop("spatial", 1) or 1)
        from .workflows.common import set_default_ref_pdb, \
            set_default_ligand_charge
        set_default_ref_pdb(kw.pop("ref_pdb", None))
        set_default_ligand_charge(kw.pop("ligand_charge", None))
        # reference-name aliases fold into the canonical options
        mult = kw.pop("multiplicity", None)
        if kw.get("spin") is None and mult is not None:
            kw["spin"] = mult
        fl = kw.pop("freeze_links", None)
        if fl is not None:
            kw["auto_freeze_links"] = fl
        kw.pop("workers_per_node", None)
        from .runtime.profiling import trace
        try:
            with trace(profile_dir):
                return f(*args, **kw)
        finally:
            # never leak the template into later in-process library calls
            set_default_ref_pdb(None)
            set_default_ligand_charge(None)
            set_default_spatial(1)

    return wrapper


def parse_freeze(spec: str) -> List:
    if not spec:
        return []
    out: List = []
    for tok in spec.split(","):
        tok = tok.strip()
        if not tok:
            continue
        out.append(int(tok) if tok.lstrip("+-").isdigit() else tok)
    return out


def make_mesh_or_none(workers: int):
    """--workers N -> device mesh (the reference's Ray fan-out analogue).

    PDB2R_TPU_DISTRIBUTED=1 additionally joins a multi-host job
    (jax.distributed; auto-detected coordinator on TPU pods, or
    PDB2R_TPU_COORDINATOR=host:port / PDB2R_TPU_NUM_PROCS /
    PDB2R_TPU_PROC_ID for explicit launches) and builds a DCN-aware
    hybrid mesh over every process."""
    import os
    if os.environ.get("PDB2R_TPU_DISTRIBUTED") == "1":
        from .parallel.distributed import (initialize_distributed,
                                           make_hybrid_mesh)
        coord = os.environ.get("PDB2R_TPU_COORDINATOR")
        if coord:
            initialize_distributed(
                coord, int(os.environ["PDB2R_TPU_NUM_PROCS"]),
                int(os.environ["PDB2R_TPU_PROC_ID"]))
        else:
            initialize_distributed()
        return make_hybrid_mesh()
    if workers and workers > 1:
        import jax
        from .parallel.mesh import make_mesh
        n = len(jax.devices())
        return make_mesh(data=min(workers, n))
    return None


def yaml_overrides(args_yaml, cfg: Dict[str, Any],
                   candidates) -> Dict[str, Any]:
    if args_yaml:
        y = load_yaml_dict(args_yaml)
        apply_yaml_overrides(cfg, y, candidates)
    return cfg


@click.group(cls=DefaultGroup,
             context_settings={"help_option_names": ["-h", "--help"]})
@click.version_option("0.1.0", prog_name="pdb2reaction-tpu")
def cli():
    """pdb2reaction-tpu: TPU-native enzymatic reaction-path toolkit."""
    _enable_compile_cache()


@cli.command("opt", help="Single-structure geometry optimization.")
@click.option("-i", "--input", "input_path", required=True,
              type=click.Path(path_type=Path, exists=True, dir_okay=False))
@click.option("--opt-mode", default="light",
              help="light|lbfgs or heavy|rfo.")
@click.option("--coord-type", default="cart",
              type=click.Choice(["cart", "dlc"]),
              help="Optimization coordinates (reference opt.py:43).")
@click.option("--thresh", default="gau")
@click.option("--max-cycles", type=int, default=10000)
@click.option("--dist-freeze", default="",
              help="Pairs i,j;k,l restrained at current distances.")
@click.option("--bias-k", type=float, default=10.0,
              help="Harmonic restraint strength k [eV/Ang^2] for "
                   "--dist-freeze (reference opt.py:524-529).")
@click.option("--one-based", type=BOOL, default="True", callback=_bool_cb,
              help="Interpret integer atom indices as 1-based "
                   "(reference default).")
@click.option("--dump-restart", type=int, default=0,
              help="Dump the optimizer carry every N cycles for mid-run "
                   "restart (reference opt.py:211-214); 0 disables.")
@common_options
def opt_cmd(input_path, opt_mode, coord_type, thresh, max_cycles,
            dist_freeze, bias_k, one_based, dump_restart, **kw):
    from .workflows.opt import run_opt
    cfg = dict(opt_mode=normalize_choice(opt_mode), coord_type=coord_type,
               thresh=thresh, max_cycles=max_cycles, dump=kw.pop("dump"),
               bias_k=bias_k, dump_restart=dump_restart)
    yaml_overrides(kw.pop("args_yaml"), cfg, [("opt",), ("lbfgs",), ("rfo",)])
    df = _parse_pairs(dist_freeze, one_based)
    res = run_opt(
        input_path, charge=kw["charge"], spin=kw["spin"],
        freeze_atoms=parse_freeze(kw["freeze_atoms"]),
        auto_freeze_links=kw["auto_freeze_links"],
        calc_mode=kw["calc_mode"], model=kw["model"],
        hessian_calc_mode=kw["hessian_calc_mode"],
        dist_freeze=df or None,
        out_dir=kw["out_dir"] or "./result_opt/",
        mesh=make_mesh_or_none(kw["workers"]),
        convert_files=kw["convert_files"], **cfg)
    sys.exit(0 if res["converged"] else 3)


def _idx(tok: str, one_based: bool):
    """Integer atom index token, shifted when indices are 1-based
    (reference default: scan/opt indices are 1-based, scan.py --one-based).
    Selector strings pass through unchanged."""
    if tok.lstrip("+-").isdigit():
        v = int(tok)
        if one_based and v < 1:
            raise click.UsageError(
                f"Atom index {v} with 1-based numbering (the default; "
                "pass --one-based False for 0-based indices)")
        return v - (1 if one_based else 0)
    return tok


def _split_func_basis(spec: str):
    if "/" not in spec:
        raise click.UsageError(
            f"--func-basis expects 'FUNC/BASIS', got {spec!r}")
    return spec.split("/", 1)


def _parse_pairs(spec: str, one_based: bool = False) -> List[Tuple]:
    out = []
    for grp in (spec or "").split(";"):
        grp = grp.strip()
        if not grp:
            continue
        toks = [t.strip() for t in grp.split(",")]
        out.append((_idx(toks[0], one_based), _idx(toks[1], one_based)))
    return out


def _parse_scan_stages(specs: Tuple[str, ...],
                       one_based: bool = False) -> List[List[Tuple]]:
    """Each spec is 'i,j,target[;k,l,target...]' — one stage per option."""
    stages = []
    for spec in specs:
        stage = []
        for grp in spec.split(";"):
            grp = grp.strip()
            if not grp:
                continue
            toks = [t.strip() for t in grp.split(",")]
            stage.append((_idx(toks[0], one_based), _idx(toks[1], one_based),
                          float(toks[2])))
        if stage:
            stages.append(stage)
    return stages


@cli.command("scan", help="Staged 1-D relaxed bond scan.")
@click.option("-i", "--input", "input_path", required=True,
              type=click.Path(path_type=Path, exists=True, dir_okay=False))
@click.option("--scan-list", "scan_lists", multiple=True, required=True,
              help="Stage spec 'i,j,target[;k,l,target]' (repeatable).")
@click.option("--step", "--max-step-size", "step_ang", type=float,
              default=0.10,
              help="Max change in any scanned bond length per step [Ang] "
                   "(reference --max-step-size).")
@click.option("--bias-k", type=float, default=10.0)
@click.option("--preopt", type=BOOL, default="True", callback=_bool_cb,
              help="Unbiased preoptimization before the scan "
                   "(reference scan.py:470 default True).")
@click.option("--endopt", type=BOOL, default="True", callback=_bool_cb,
              help="Unbiased optimization of each stage result "
                   "(reference scan.py:472 default True).")
@click.option("--relax-max-cycles", type=int, default=500,
              help="Max relaxation cycles per scan step.")
@click.option("--one-based", type=BOOL, default="True", callback=_bool_cb,
              help="Interpret (i,j) scan indices as 1-based "
                   "(reference default).")
@common_options
def scan_cmd(input_path, scan_lists, step_ang, bias_k, preopt, endopt,
             relax_max_cycles, one_based, **kw):
    from .workflows.scan import run_scan
    stages = _parse_scan_stages(scan_lists, one_based)
    cfg: Dict[str, Any] = dict(step_ang=step_ang, bias_k=bias_k,
                               preopt=preopt, endopt=endopt,
                               relax_max_cycles=relax_max_cycles,
                               dump=kw.pop("dump"))
    yaml_overrides(kw.pop("args_yaml"), cfg, [("scan",), ("bias",)])
    run_scan(input_path, stages, charge=kw["charge"], spin=kw["spin"],
             freeze_atoms=parse_freeze(kw["freeze_atoms"]),
             auto_freeze_links=kw["auto_freeze_links"],
             calc_mode=kw["calc_mode"], model=kw["model"],
             out_dir=kw["out_dir"] or "./result_scan/",
             mesh=make_mesh_or_none(kw["workers"]), **cfg)


@cli.command("path-opt", help="Two-endpoint MEP search (GSM or DMF).")
@click.option("-i", "--input", "input_paths", multiple=True, required=True,
              type=click.Path(path_type=Path, exists=True, dir_okay=False))
@click.option("--mep-mode", default="gsm", type=click.Choice(["gsm", "dmf"]))
@click.option("--max-nodes", type=int, default=10)
@click.option("--max-cycles", type=int, default=300,
              help="String-optimizer cycle cap (reference path_opt.py).")
@click.option("--opt-mode", default="light",
              type=click.Choice(["light", "heavy", "lbfgs", "rfo"],
                                case_sensitive=False),
              help="Endpoint preoptimization mode (reference --opt-mode).")
@click.option("--thresh", default=None,
              help="Convergence preset for the string optimizer and "
                   "endpoint preopt (reference path_opt.py --thresh).")
@click.option("--preopt", type=BOOL, default="False", callback=_bool_cb,
              help="Preoptimize each endpoint before alignment + GSM "
                   "(reference path_opt.py:648-654 default False).")
@click.option("--preopt-max-cycles", type=int, default=10000)
@click.option("--align", type=BOOL, default="True", callback=_bool_cb)
@click.option("--climb", type=BOOL, default="True", callback=_bool_cb,
              help="Enable the GSM climbing image.")
@click.option("--fix-ends", type=BOOL, default="False", callback=_bool_cb,
              help="Keep endpoint images fixed during GSM "
                   "(reference --fix-ends default False overriding "
                   "GS_KW fix_first/fix_last, path_opt.py:662-668,735).")
@click.option("--gsm-loop", default="auto",
              type=click.Choice(["auto", "device", "host"]),
              help="GSM loop driver: device while_loops, a host-driven\n                   macro-cycle loop (compiles only the batched force\n                   call — right for giant backbones), or auto (the\n                   calculator's preference).")
@common_options
def path_opt_cmd(input_paths, mep_mode, max_nodes, max_cycles, opt_mode,
                 thresh, preopt, preopt_max_cycles, align, climb,
                 fix_ends, gsm_loop, **kw):
    from .workflows.path_opt import run_path_opt
    cfg: Dict[str, Any] = dict(
        mep_mode=mep_mode, preopt=preopt, align=align,
        preopt_mode=normalize_choice(opt_mode), thresh=thresh,
        preopt_max_cycles=preopt_max_cycles,
        stopt_kw={"max_cycles": max_cycles},
        gs_kw={"max_nodes": max_nodes, "climb": climb,
               "fix_ends": fix_ends, "loop": gsm_loop})
    yaml_overrides(kw.pop("args_yaml"), cfg, [("gs",), ("sopt",), ("dmf",)])
    cfg.setdefault("hessian_calc_mode", kw["hessian_calc_mode"])
    run_path_opt(list(input_paths), charge=kw["charge"], spin=kw["spin"],
                 freeze_atoms=parse_freeze(kw["freeze_atoms"]),
                 auto_freeze_links=kw["auto_freeze_links"],
                 calc_mode=kw["calc_mode"], model=kw["model"],
                 out_dir=kw["out_dir"] or "./result_path_opt/",
                 mesh=make_mesh_or_none(kw["workers"]), **cfg)


@cli.command("tsopt", help="Transition-state optimization (Dimer/RS-I-RFO).")
@click.option("-i", "--input", "input_path", required=True,
              type=click.Path(path_type=Path, exists=True, dir_okay=False))
@click.option("--opt-mode", default="light", help="light|dimer or heavy|rsirfo.")
@click.option("--coord-type", default="cart",
              type=click.Choice(["cart", "dlc"]),
              help="Geometry coordinates for the rsirfo mode (reference "
                   "geom.coord_type, tsopt.py:669; dimer runs cart).")
@click.option("--thresh", default="baker")
@click.option("--max-cycles", type=int, default=10000)
@click.option("--flatten-imag-mode", type=BOOL, default="False",
              callback=_bool_cb,
              help="Enable the extra-imaginary-mode flatten loop "
                   "(light mode; False forces flatten_max_iter=0).")
@click.option("--dump-restart", type=int, default=0,
              help="Dump dimer-pass carries every N cycles for mid-run "
                   "restart; 0 disables.")
@common_options
def tsopt_cmd(input_path, opt_mode, coord_type, thresh, max_cycles,
              flatten_imag_mode, dump_restart, **kw):
    from .workflows.tsopt import run_tsopt
    cfg: Dict[str, Any] = dict(
        opt_mode=opt_mode, coord_type=coord_type, thresh=thresh,
        max_cycles=max_cycles, dump_restart=dump_restart,
        hessian_dimer_kw={"flatten_max_iter":
                          10 if flatten_imag_mode else 0})
    yaml_overrides(kw.pop("args_yaml"), cfg,
                   [("tsopt",), ("hessian_dimer",), ("rsirfo",)])
    # YAML wins over the CLI flag (documented precedence); setdefault
    # avoids a duplicate-kwarg collision with **cfg
    cfg.setdefault("hessian_calc_mode", kw["hessian_calc_mode"])
    res = run_tsopt(input_path, charge=kw["charge"], spin=kw["spin"],
                    freeze_atoms=parse_freeze(kw["freeze_atoms"]),
                    auto_freeze_links=kw["auto_freeze_links"],
                    calc_mode=kw["calc_mode"], model=kw["model"],
                    out_dir=kw["out_dir"] or "./result_tsopt/",
                    mesh=make_mesh_or_none(kw["workers"]), **cfg)
    sys.exit(0 if res["converged"] else 3)


@cli.command("freq", help="Vibrational analysis + thermochemistry.")
@click.option("-i", "--input", "input_path", required=True,
              type=click.Path(path_type=Path, exists=True, dir_okay=False))
@click.option("-T", "--temperature", type=float, default=298.15)
@click.option("--pressure", type=float, default=101325.0)
@click.option("--max-write-modes", "--max-write", "max_write_modes",
              type=int, default=10,
              help="How many modes to export (after --sort ordering).")
@click.option("--amplitude-ang", type=float, default=0.8,
              help="Mode-animation amplitude [Ang].")
@click.option("--n-frames", type=int, default=20,
              help="Frames per mode animation.")
@click.option("--sort", "sort_modes", default="value",
              type=click.Choice(["value", "abs"]),
              help="Export order: by value (cm^-1) or absolute value.")
@common_options
def freq_cmd(input_path, temperature, pressure, max_write_modes,
             amplitude_ang, n_frames, sort_modes, **kw):
    from .workflows.freq import run_freq
    cfg: Dict[str, Any] = dict(temperature=temperature, pressure=pressure,
                               max_write_modes=max_write_modes,
                               amplitude_ang=amplitude_ang,
                               n_frames=n_frames, sort_modes=sort_modes)
    yaml_overrides(kw.pop("args_yaml"), cfg, [("freq",)])
    run_freq(input_path, charge=kw["charge"], spin=kw["spin"],
             freeze_atoms=parse_freeze(kw["freeze_atoms"]),
             auto_freeze_links=kw["auto_freeze_links"],
             calc_mode=kw["calc_mode"], model=kw["model"],
             hessian_calc_mode=kw["hessian_calc_mode"],
             out_dir=kw["out_dir"] or "./result_freq/",
             mesh=make_mesh_or_none(kw["workers"]), **cfg)


@cli.command("irc", help="Intrinsic reaction coordinate (EulerPC).")
@click.option("-i", "--input", "input_path", required=True,
              type=click.Path(path_type=Path, exists=True, dir_okay=False))
@click.option("--step-length", "--step-size", "step_length", type=float,
              default=0.10,
              help="Step length in mass-weighted coordinates "
                   "(reference --step-size).")
@click.option("--max-cycles", type=int, default=125)
@click.option("--root", type=int, default=0,
              help="Imaginary-mode index for the initial displacement.")
@click.option("--forward", type=BOOL, default="True", callback=_bool_cb)
@click.option("--backward", type=BOOL, default="True", callback=_bool_cb)
@click.option("--hessian-recalc", type=int, default=None,
              help="Recompute the exact Hessian every N cycles inside the "
                   "branch loop (reference irc.py:119-146); default "
                   "Bofill-only updates from the TS Hessian.")
@click.option("--dump-restart", type=int, default=0,
              help="Dump the branch carry every N cycles for mid-run "
                   "restart (reference irc_data.h5); 0 disables.")
@common_options
def irc_cmd(input_path, step_length, max_cycles, root, forward, backward,
            hessian_recalc, dump_restart, **kw):
    from .workflows.irc import run_irc
    cfg: Dict[str, Any] = dict(step_length=step_length,
                               max_cycles=max_cycles, root=root,
                               forward=forward, backward=backward,
                               hessian_recalc=hessian_recalc,
                               dump_restart=dump_restart)
    yaml_overrides(kw.pop("args_yaml"), cfg, [("irc",)])
    cfg.setdefault("hessian_calc_mode", kw["hessian_calc_mode"])
    run_irc(input_path, charge=kw["charge"], spin=kw["spin"],
            freeze_atoms=parse_freeze(kw["freeze_atoms"]),
            auto_freeze_links=kw["auto_freeze_links"],
            calc_mode=kw["calc_mode"], model=kw["model"],
            out_dir=kw["out_dir"] or "./result_irc/",
            mesh=make_mesh_or_none(kw["workers"]), **cfg)


@cli.command("path-search",
             help="Recursive multi-step MEP search between structures.")
@click.option("-i", "--input", "input_paths", multiple=True, required=True,
              type=click.Path(path_type=Path, exists=True, dir_okay=False))
@click.option("--mep-mode", default="gsm", type=click.Choice(["gsm", "dmf"]))
@click.option("--max-depth", type=int, default=3)
@click.option("--refine-mode", default="hei",
              type=click.Choice(["hei", "minima"]))
@click.option("--kink-max-nodes", type=int, default=5)
@click.option("--max-nodes", type=int, default=10)
@click.option("--max-cycles", type=int, default=300,
              help="String-optimizer cycle cap per segment.")
@click.option("--opt-mode", default="light",
              type=click.Choice(["light", "heavy", "lbfgs", "rfo"],
                                case_sensitive=False),
              help="Single-structure optimizer for preopt/HEI "
                   "refinements (reference --opt-mode).")
@click.option("--thresh", default=None,
              help="Convergence preset for in-search optimizations.")
@click.option("--preopt", type=BOOL, default="True", callback=_bool_cb,
              help="Initial single-structure optimization of the inputs "
                   "(reference path_search.py:1999-2005).")
@click.option("--align", type=BOOL, default="True", callback=_bool_cb,
              help="Align all inputs to the first input after preopt "
                   "(reference path_search.py:2007-2015).")
@click.option("--climb", type=BOOL, default="True", callback=_bool_cb)
@click.option("--ref-full-pdb", default=None, multiple=True,
              type=click.Path(path_type=Path, exists=True, dir_okay=False),
              help="Full-system PDB template(s) for merged MEP/HEI "
                   "mirrors; repeat once per input (reaction order) for "
                   "per-pair template backgrounds "
                   "(reference path_search.py:2022).")
@click.option("--gsm-loop", default="auto",
              type=click.Choice(["auto", "device", "host"]),
              help="GSM loop driver (see path-opt).")
@common_options
def path_search_cmd(input_paths, mep_mode, max_depth, refine_mode,
                    kink_max_nodes, max_nodes, max_cycles, opt_mode,
                    thresh, preopt, climb, ref_full_pdb, align,
                    gsm_loop, **kw):
    from .workflows.path_search import run_path_search
    if isinstance(ref_full_pdb, tuple):
        ref_full_pdb = (list(ref_full_pdb) if len(ref_full_pdb) > 1
                        else (ref_full_pdb[0] if ref_full_pdb else None))
    skw = {"max_depth": max_depth, "refine_mode": refine_mode,
           "kink_max_nodes": kink_max_nodes,
           "opt_mode": normalize_choice(opt_mode), "preopt": preopt}
    if thresh is not None:
        skw["opt_thresh"] = thresh
    cfg: Dict[str, Any] = dict(
        mep_mode=mep_mode,
        full_template=ref_full_pdb,
        align=align,
        stopt_kw={"max_cycles": max_cycles},
        gs_kw={"max_nodes": max_nodes, "climb": climb,
               "loop": gsm_loop},
        search_kw=skw)
    yaml_overrides(kw.pop("args_yaml"), cfg, [("search",), ("gs",), ("bond",)])
    cfg.setdefault("hessian_calc_mode", kw["hessian_calc_mode"])
    run_path_search(list(input_paths), charge=kw["charge"], spin=kw["spin"],
                    freeze_atoms=parse_freeze(kw["freeze_atoms"]),
                    auto_freeze_links=kw["auto_freeze_links"],
                    calc_mode=kw["calc_mode"], model=kw["model"],
                    out_dir=kw["out_dir"] or "./result_path_search/",
                    mesh=make_mesh_or_none(kw["workers"]), **cfg)


@cli.command("trj2fig", help="Energy profile figure from a trajectory.")
@click.option("-i", "--input", "trj_path", required=True,
              type=click.Path(path_type=Path, exists=True, dir_okay=False))
@click.option("-o", "--out", "outs", multiple=True,
              help="Output file(s) [.png/.svg/.pdf/.html/.csv]; "
                   "repeatable (reference -o).")
@click.option("--reference", default="first",
              type=click.Choice(["first", "min", "last", "none"]))
@click.option("--unit", default="kcal", type=click.Choice(["kcal", "au"]))
@click.option("--recompute", type=BOOL, default="False", callback=_bool_cb)
@click.option("--reverse-x", type=BOOL, default="False", callback=_bool_cb,
              help="Reverse the x-axis (last frame on the left).")
@common_options
def trj2fig_cmd(trj_path, outs, reference, unit, recompute, reverse_x, **kw):
    from .workflows.trj2fig import run_trj2fig
    out_path = None
    if outs:
        out_path = Path(outs[0])
    elif kw["out_dir"]:
        out_path = Path(kw["out_dir"]) / "profile.png"
    res = run_trj2fig(trj_path, reference=reference, unit=unit,
                      recompute=recompute, charge=kw["charge"],
                      spin=kw["spin"], calc_mode=kw["calc_mode"],
                      model=kw["model"], reverse_x=reverse_x,
                      out_path=out_path, extra_outputs=list(outs[1:]))
    click.echo(f"[trj2fig] wrote {res['figure']}")


@cli.command("extract", help="Extract the active-site pocket around a "
                             "substrate.")
@click.option("-i", "--input", "inputs", multiple=True, required=True,
              type=click.Path(path_type=Path, exists=True, dir_okay=False))
@click.option("-c", "--center", required=True,
              help="Substrate: PDB path, residue IDs, or residue names.")
@click.option("-o", "--output", "outputs", multiple=True,
              type=click.Path(path_type=Path))
@click.option("--radius", type=float, default=2.6)
@click.option("--radius-het2het", type=float, default=0.0)
@click.option("--include-h2o", type=BOOL, default="True", callback=_bool_cb)
@click.option("--exclude-backbone", type=BOOL, default="True",
              callback=_bool_cb)
@click.option("--add-linkh", "add_link_h", type=BOOL, default="True",
              callback=_bool_cb)
@click.option("--selected-resn", default="",
              help="Force-include residue IDs (comma separated).")
@click.option("--ligand-charge", default=None,
              help="Total number or 'RES:Q,RES2:Q2' mapping.")
@click.option("--verbose", type=BOOL, default="True", callback=_bool_cb)
def extract_cmd(inputs, center, outputs, radius, radius_het2het,
                include_h2o, exclude_backbone, add_link_h, selected_resn,
                ligand_charge, verbose):
    from .workflows.common import jax  # ensure config side effects
    from .bio.extract import extract_api
    res = extract_api(
        list(inputs), center, list(outputs) or None,
        radius=radius, radius_het2het=radius_het2het,
        include_h2o=include_h2o, exclude_backbone=exclude_backbone,
        add_link_h=add_link_h,
        selected_resn=[t for t in selected_resn.split(",") if t.strip()]
        or None,
        ligand_charge=ligand_charge, verbose=verbose)
    click.echo(f"[extract] wrote {res['outputs']}")
    click.echo(f"[extract] charge summary: {res['charge_summary']}")


@cli.command("add-elem-info", help="Fill/repair PDB element columns 77-78.")
@click.option("-i", "--input", "input_path", required=True,
              type=click.Path(path_type=Path, exists=True, dir_okay=False))
@click.option("-o", "--output", "--out", "output_path", default=None,
              type=click.Path(path_type=Path))
@click.option("--overwrite", type=BOOL, default="False", callback=_bool_cb,
              help="Write back to the input file (reference flag).")
@click.option("--verbose", type=BOOL, default="True", callback=_bool_cb)
def add_elem_cmd(input_path, output_path, overwrite, verbose):
    from .bio.add_elem import assign_elements
    if overwrite and output_path is None:
        output_path = input_path
    assign_elements(input_path, output_path, verbose=verbose)


@cli.command("align-freeze-atoms",
             help="Kabsch-align structures on their freeze-atom union.")
@click.option("-i", "--input", "inputs", multiple=True, required=True,
              type=click.Path(path_type=Path, exists=True, dir_okay=False))
@click.option("-o", "--out-dir", "out_dir", default="./result_align/",
              type=click.Path(path_type=Path))
@click.option("--freeze-atoms", default="")
@click.option("--relax", type=BOOL, default="False", callback=_bool_cb,
              help="Relax between drag-refine steps with the calculator "
                   "(reference align_freeze_atoms.py:390-517 LBFGS hooks).")
@click.option("-q", "--charge", type=int, default=None)
@click.option("-s", "--spin", type=int, default=None)
@click.option("--calc-mode", default="uma",
              type=click.Choice(["uma", "morse", "lj"]))
@click.option("--model", default="uma-s-1p1")
@click.option("--relax-max-cycles", type=int, default=200)
def align_cmd(inputs, out_dir, freeze_atoms, relax, charge, spin,
              calc_mode, model, relax_max_cycles):
    from .workflows import common
    from .bio.align import align_sequence_inplace
    from .core import io_xyz, io_pdb
    structs = [common.load_structure(p) for p in inputs]
    for st in structs:
        st.freeze = common.merge_freeze(st, parse_freeze(freeze_atoms), True)

    relax_fn = None
    if relax:
        from .constants import BOHR2ANG
        from .workflows.opt import optimize_structure
        q, s = common.resolve_charge_spin(structs[0], charge, spin)

        def relax_fn(st, pinned_idx):
            import numpy as np
            st2 = st.copy()
            st2.freeze = sorted(set(st.freeze) | set(pinned_idx))
            calc = common.make_calculator(
                st2, calc_mode=calc_mode, charge=q, spin=s,
                freeze_atoms=st2.freeze, model=model)
            coords_bohr, _, _, _ = optimize_structure(
                st2, calc, opt_mode="lbfgs", thresh="gau_loose",
                max_cycles=relax_max_cycles)
            return np.asarray(coords_bohr) * BOHR2ANG

    align_sequence_inplace(structs, relax_fn=relax_fn)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for p, st in zip(inputs, structs):
        dst = out / Path(p).name
        if str(p).lower().endswith(".pdb"):
            io_pdb.write_pdb(dst, st)
        else:
            io_xyz.write_xyz(dst, st)
        click.echo(f"[align] wrote {dst}")


@cli.command("all", help="End-to-end pipeline: extract -> [scan] -> path "
                         "search -> tsopt -> irc -> freq [-> dft].")
@click.option("-i", "--input", "input_paths", multiple=True, required=True,
              type=click.Path(path_type=Path, exists=True, dir_okay=False))
@click.option("-c", "--center", default=None,
              help="Substrate spec for pocket extraction (PDB inputs).")
# --ligand-charge comes from common_options (process-wide default)
# stage-1 extraction passthroughs (reference all.py:1870-1915)
@click.option("-r", "--radius", type=float, default=2.6,
              help="Extraction inclusion cutoff [Ang] around the substrate.")
@click.option("--radius-het2het", type=float, default=0.0,
              help="Independent hetero-hetero cutoff [Ang] for non-C/H.")
@click.option("--include-H2O", "--include-h2o", "include_h2o", type=BOOL,
              default="True", callback=_bool_cb,
              help="Include waters (HOH/WAT/TIP3/SOL) in the pocket.")
@click.option("--exclude-backbone", type=BOOL, default="True",
              callback=_bool_cb)
@click.option("--add-linkH", "--add-linkh", "add_link_h", type=BOOL,
              default="True", callback=_bool_cb,
              help="Add link hydrogens for severed bonds in pockets.")
@click.option("--selected_resn", "--selected-resn", "selected_resn",
              default="", help="Force-include residue IDs (comma sep).")
@click.option("--scan-lists", "scan_lists", multiple=True,
              help="Stage spec 'i,j,target[;k,l,target]' (repeatable).")
@click.option("--mep-mode", default="gsm", type=click.Choice(["gsm", "dmf"]))
@click.option("--refine-path", type=BOOL, default="True", callback=_bool_cb)
@click.option("--tsopt", "do_tsopt", type=BOOL, default="False",
              callback=_bool_cb,
              help="TS optimization + IRC per reactive segment "
                   "(reference all.py:2090-2100; default False).")
@click.option("--irc", "do_irc", type=BOOL, default="True",
              callback=_bool_cb,
              help="Run IRC when --tsopt True (the reference gates IRC "
                   "under --tsopt; this toggle can disable just the IRC).")
@click.option("--thermo", "--freq", "do_freq", type=BOOL, default="False",
              callback=_bool_cb,
              help="Run freq on (R, TS, P) per reactive segment and build "
                   "Gibbs diagrams (reference --thermo, all.py:2101-2111; "
                   "default False; --freq is an accepted alias).")
@click.option("--dft", "do_dft", type=BOOL, default="False",
              callback=_bool_cb)
@click.option("--max-nodes", type=int, default=10)
@click.option("--climb", type=BOOL, default="True", callback=_bool_cb)
@click.option("--gsm-loop", default="auto",
              type=click.Choice(["auto", "device", "host"]),
              help="GSM loop driver (see path-opt).")
@click.option("--one-based", type=BOOL, default="True", callback=_bool_cb,
              help="Interpret --scan-lists indices as 1-based.")
@click.option("--scan-one-based", type=BOOL, default=None,
              callback=_bool_cb, help="Override --one-based for the scan.")
@click.option("--ref-full-pdb", default=None,
              type=click.Path(path_type=Path, exists=True, dir_okay=False),
              help="Full-system PDB template for merged mirrors.")
@click.option("--opt-mode", default="light",
              type=click.Choice(["light", "heavy", "lbfgs", "rfo"],
                                case_sensitive=False),
              help="Workflow optimizer mode for preopt/path-search "
                   "optimizations (reference all.py:2003-2010).")
@click.option("--thresh", default=None,
              help="Workflow convergence preset forwarded to the "
                   "scan/path stages (reference all.py:2051-2057).")
@click.option("--max-cycles", type=int, default=300,
              help="Path-search/GSM optimizer cycle cap "
                   "(reference all.py:1989-1997).")
@click.option("--preopt", type=BOOL, default="True", callback=_bool_cb,
              help="Initial single-structure optimization of the pocket "
                   "inputs (reference all.py:2076-2082).")
@click.option("--verbose", type=BOOL, default="True", callback=_bool_cb)
@click.option("--opt-mode-post", default="heavy",
              type=click.Choice(["light", "heavy", "lbfgs", "rfo"],
                                case_sensitive=False),
              help="Optimizer for stage-4 TSOPT + endpoint minimization "
                   "(reference default heavy = RS-I-RFO, all.py:2012-2019).")
@click.option("--thresh-post", default="baker",
              help="Threshold preset for stage-4 TSOPT + endpoint "
                   "minimization (reference default baker, all.py:2058).")
@click.option("--tsopt-max-cycles", type=int, default=10000)
@click.option("--flatten-imag-mode", type=BOOL, default="False",
              callback=_bool_cb,
              help="Enable the extra-imaginary-mode flatten loop in tsopt.")
# None = keep the scan subcommand's own defaults (reference all.py only
# forwards these when explicitly set, :3218-3238)
@click.option("--scan-bias-k", type=float, default=None)
@click.option("--scan-preopt", type=BOOL, default=None, callback=_bool_cb)
@click.option("--scan-endopt", type=BOOL, default=None, callback=_bool_cb)
@click.option("--scan-max-step-size", type=float, default=None)
@click.option("--scan-relax-max-cycles", type=int, default=None)
@click.option("--freq-temperature", type=float, default=298.15)
@click.option("--freq-pressure", type=float, default=101325.0)
# per-stage freq overrides (reference all.py freq passthroughs; None =
# keep the freq subcommand defaults)
@click.option("--freq-max-write", type=int, default=None,
              help="Override freq --max-write for stage-4/TSOPT-only freq.")
@click.option("--freq-amplitude-ang", type=float, default=None,
              help="Override freq --amplitude-ang [Ang].")
@click.option("--freq-n-frames", type=int, default=None,
              help="Override freq --n-frames.")
@click.option("--freq-sort", type=click.Choice(["value", "abs"],
                                               case_sensitive=False),
              default=None, help="Override freq mode sorting.")
@click.option("--dft-func-basis", default=None,
              help="'FUNC/BASIS' for stage-4 DFT single points.")
@click.option("--dft-max-cycle", type=int, default=100)
@click.option("--dft-conv-tol", type=float, default=1e-9)
@click.option("--dft-grid-level", type=int, default=3)
@click.option("--dft-engine", type=click.Choice(["gpu", "cpu", "auto",
                                                 "mini"],
                                                case_sensitive=False),
              default="gpu",
              help="SCF engine policy (the gpu->cpu fallback collapses "
                   "to the CPU PySCF seam on this host; 'mini' = built-in "
                   "RHF/STO-3G engine for PySCF-less hosts).")
# per-stage output-directory overrides (reference all.py:2457,2800-2801;
# relative paths resolve against the default location's parent)
@click.option("--scan-out-dir", type=click.Path(path_type=Path,
                                                file_okay=False),
              default=None)
@click.option("--tsopt-out-dir", type=click.Path(path_type=Path,
                                                 file_okay=False),
              default=None)
@click.option("--freq-out-dir", type=click.Path(path_type=Path,
                                                file_okay=False),
              default=None)
@click.option("--dft-out-dir", type=click.Path(path_type=Path,
                                               file_okay=False),
              default=None)
@common_options
def all_cmd(input_paths, center, scan_lists, mep_mode,
            refine_path, do_tsopt, do_irc, do_freq, do_dft, max_nodes,
            climb, gsm_loop, one_based, scan_one_based, ref_full_pdb,
            opt_mode, thresh, max_cycles, preopt, verbose, opt_mode_post,
            thresh_post, tsopt_max_cycles, flatten_imag_mode, scan_bias_k,
            scan_preopt, scan_endopt, scan_max_step_size,
            scan_relax_max_cycles, freq_temperature, freq_pressure,
            freq_max_write, freq_amplitude_ang, freq_n_frames, freq_sort,
            dft_func_basis, dft_max_cycle, dft_conv_tol, dft_grid_level,
            dft_engine, radius, radius_het2het, include_h2o,
            exclude_backbone, add_link_h, selected_resn,
            scan_out_dir, tsopt_out_dir, freq_out_dir, dft_out_dir,
            **kw):
    from .workflows.allflow import run_all
    from .workflows.common import get_default_ligand_charge, \
        set_default_ligand_charge
    ligand_charge = get_default_ligand_charge()
    # `all` consumes --ligand-charge at extraction and forwards explicit
    # -q to every sub-stage (reference all.py:2508-2545); clear the
    # process default so nested stages never see it (their intermediates
    # are .xyz files, where --ligand-charge is invalid)
    set_default_ligand_charge(None)
    scan_ob = one_based if scan_one_based is None else scan_one_based
    dft_kw: Dict[str, Any] = dict(max_cycle=dft_max_cycle,
                                  conv_tol=dft_conv_tol,
                                  grid_level=dft_grid_level,
                                  engine=normalize_choice(dft_engine))
    if dft_func_basis:
        dft_kw["func"], dft_kw["basis"] = _split_func_basis(dft_func_basis)
    freq_kw: Dict[str, Any] = dict(temperature=freq_temperature,
                                   pressure=freq_pressure)
    for key, val in (("max_write_modes", freq_max_write),
                     ("amplitude_ang", freq_amplitude_ang),
                     ("n_frames", freq_n_frames),
                     ("sort_modes", normalize_choice(freq_sort)
                      if freq_sort else None)):
        if val is not None:
            freq_kw[key] = val
    cfg: Dict[str, Any] = dict(
        center=center, ligand_charge=ligand_charge,
        scan_stages=_parse_scan_stages(scan_lists, scan_ob) or None,
        mep_mode=mep_mode, refine_path=refine_path, tsopt=do_tsopt,
        do_irc=do_irc, do_freq=do_freq, do_dft=do_dft,
        opt_mode=normalize_choice(opt_mode), thresh=thresh,
        max_cycles=max_cycles, preopt=preopt, verbose=verbose,
        full_template=ref_full_pdb,
        extract_kw=dict(
            radius=radius, radius_het2het=radius_het2het,
            include_h2o=include_h2o, exclude_backbone=exclude_backbone,
            add_link_h=add_link_h,
            selected_resn=[t for t in selected_resn.split(",")
                           if t.strip()] or None),
        gs_kw={"max_nodes": max_nodes, "climb": climb,
               "loop": gsm_loop},
        scan_kw={k: v for k, v in
                 dict(bias_k=scan_bias_k, preopt=scan_preopt,
                      endopt=scan_endopt, step_ang=scan_max_step_size,
                      relax_max_cycles=scan_relax_max_cycles).items()
                 if v is not None},
        opt_post_kw=dict(opt_mode=normalize_choice(opt_mode_post),
                         thresh=thresh_post),
        tsopt_kw=dict(max_cycles_total=tsopt_max_cycles,
                      flatten_max_iter=10 if flatten_imag_mode else 0),
        freq_kw=freq_kw,
        dft_kw=dft_kw,
        scan_out_dir=scan_out_dir, tsopt_out_dir=tsopt_out_dir,
        freq_out_dir=freq_out_dir, dft_out_dir=dft_out_dir)
    yaml_overrides(kw.pop("args_yaml"), cfg, [("all",), ("search",)])
    cfg.setdefault("hessian_calc_mode", kw["hessian_calc_mode"])
    run_all(list(input_paths), charge=kw["charge"], spin=kw["spin"],
            calc_mode=kw["calc_mode"], model=kw["model"],
            freeze_atoms=parse_freeze(kw["freeze_atoms"]),
            auto_freeze_links=kw["auto_freeze_links"],
            out_dir=kw["out_dir"] or "./result_all/",
            mesh=make_mesh_or_none(kw["workers"]), **cfg)


def _scan_axes(specs, one_based: bool = False):
    axes = []
    for spec in specs:
        toks = [t.strip() for t in spec.split(",")]
        i = _idx(toks[0], one_based)
        j = _idx(toks[1], one_based)
        ax = {"pair": (i, j), "end": float(toks[2])}
        if len(toks) > 3:
            ax["step"] = float(toks[3])
        if len(toks) > 4:
            ax["start"] = float(toks[4])
        axes.append(ax)
    return axes


def _scan_nd_options(f):
    opts = [
        click.option("--scan-list", "scan_list_raw", default=None,
                     help="Python-like list of quadruples "
                          "'[(i,j,low,high),...]' (reference scan2d/3d "
                          "--scan-list); alternative to --scan."),
        click.option("--max-step-size", type=float, default=0.20,
                     help="Maximum grid step in each distance [Ang] "
                          "(reference default 0.20); used for axes "
                          "without an explicit step."),
        click.option("--opt-mode", default="light",
                     type=click.Choice(["light", "heavy", "lbfgs", "rfo"],
                                       case_sensitive=False),
                     help="Grid relaxation mode (reference --opt-mode)."),
        click.option("--thresh", default="baker",
                     help="Relaxation convergence preset "
                          "(reference scan2d/3d default baker)."),
        click.option("--preopt", type=BOOL, default="True",
                     callback=_bool_cb,
                     help="Unbiased pre-optimization before the scan "
                          "(reference default True)."),
        click.option("--plot-only", default=None,
                     type=click.Path(path_type=Path, exists=True)),
        click.option("--bias-k", type=float, default=100.0,
                     help="Harmonic well strength k [eV/Ang^2] "
                          "(reference scan2d.py:437-441 default 100)."),
        click.option("--relax-max-cycles", type=int, default=10000,
                     help="Max optimizer cycles per grid relaxation "
                          "(reference default 10000)."),
        click.option("--one-based", type=BOOL, default="True",
                     callback=_bool_cb,
                     help="Interpret (i,j) axis indices as 1-based."),
        click.option("--baseline", default="min",
                     type=click.Choice(["min", "first"]),
                     help="Zero point of the plotted surface."),
        click.option("--zmin", type=float, default=None,
                     help="Lower color-scale bound [kcal/mol]."),
        click.option("--zmax", type=float, default=None,
                     help="Upper color-scale bound [kcal/mol]."),
    ]
    for o in reversed(opts):
        f = o(f)
    return f


def _parse_scan_list(raw, one_based, step):
    """Reference --scan-list: '[(i,j,low,high),...]' quadruples
    (scan2d.py:415-420); low -> high swept at <= step [Ang]."""
    import ast
    quads = ast.literal_eval(str(raw))
    axes = []
    for q in quads:
        i, j, low, high = q
        i = _idx(str(int(i)), one_based)
        j = _idx(str(int(j)), one_based)
        axes.append({"pair": (i, j), "start": float(low),
                     "end": float(high), "step": float(step)})
    return axes


def _run_scan_nd_cmd(input_path, scans, scan_list_raw, ndim, plot_only,
                     bias_k, max_step_size, opt_mode, thresh, preopt,
                     relax_max_cycles, one_based, baseline, zmin, zmax, kw):
    from .workflows.scan_nd import run_scan_nd
    if scan_list_raw:
        axes = _parse_scan_list(scan_list_raw, one_based, max_step_size)
    else:
        if not scans and not plot_only:
            raise click.UsageError(
                f"scan{ndim}d needs --scan axes or --scan-list")
        axes = _scan_axes(scans, one_based)
        for ax in axes:
            ax.setdefault("step", max_step_size)
    assert plot_only or len(axes) == ndim, \
        f"scan{ndim}d needs exactly {ndim} axes"
    run_scan_nd(input_path, axes, charge=kw["charge"], spin=kw["spin"],
                freeze_atoms=parse_freeze(kw["freeze_atoms"]),
                auto_freeze_links=kw["auto_freeze_links"],
                calc_mode=kw["calc_mode"], model=kw["model"],
                out_dir=kw["out_dir"], plot_only=plot_only,
                bias_k=bias_k, relax_max_cycles=relax_max_cycles,
                relax_mode=normalize_choice(opt_mode),
                relax_thresh=thresh, preopt=preopt,
                baseline=baseline, zmin=zmin, zmax=zmax,
                mesh=make_mesh_or_none(kw["workers"]))


@cli.command("scan2d", help="2-D relaxed distance-grid scan.")
@click.option("-i", "--input", "input_path", required=True,
              type=click.Path(path_type=Path, exists=True, dir_okay=False))
@click.option("--scan", "scans", multiple=True,
              help="Axis 'i,j,end[,step[,start]]' (exactly 2).")
@_scan_nd_options
@common_options
def scan2d_cmd(input_path, scans, scan_list_raw, max_step_size, opt_mode,
               thresh, preopt, plot_only, bias_k, relax_max_cycles,
               one_based, baseline, zmin, zmax, **kw):
    _run_scan_nd_cmd(input_path, scans, scan_list_raw, 2, plot_only,
                     bias_k, max_step_size, opt_mode, thresh, preopt,
                     relax_max_cycles, one_based, baseline, zmin, zmax, kw)


@cli.command("scan3d", help="3-D relaxed distance-grid scan.")
@click.option("-i", "--input", "input_path", required=True,
              type=click.Path(path_type=Path, exists=True, dir_okay=False))
@click.option("--scan", "scans", multiple=True,
              help="Axis 'i,j,end[,step[,start]]' (exactly 3).")
@click.option("--csv", "csv_path", default=None,
              type=click.Path(path_type=Path, exists=True),
              help="Existing surface.csv to re-plot (alias of --plot-only).")
@_scan_nd_options
@common_options
def scan3d_cmd(input_path, scans, scan_list_raw, max_step_size, opt_mode,
               thresh, preopt, csv_path, plot_only, bias_k,
               relax_max_cycles, one_based, baseline, zmin, zmax, **kw):
    _run_scan_nd_cmd(input_path, scans, scan_list_raw, 3,
                     plot_only or csv_path, bias_k, max_step_size,
                     opt_mode, thresh, preopt, relax_max_cycles,
                     one_based, baseline, zmin, zmax, kw)


@cli.command("dft", help="DFT single point (CPU PySCF backend).")
@click.option("-i", "--input", "input_path", required=True,
              type=click.Path(path_type=Path, exists=True, dir_okay=False))
@click.option("--func", default="wb97m-v")
@click.option("--basis", default="def2-svp")
@click.option("--func-basis", default=None,
              help="Combined 'FUNC/BASIS' spec (reference flag); "
                   "overrides --func/--basis.")
@click.option("--max-cycle", type=int, default=100,
              help="Maximum SCF iterations.")
@click.option("--conv-tol", type=float, default=1e-9,
              help="SCF convergence tolerance (Eh).")
@click.option("--grid-level", type=int, default=3,
              help="Numerical integration grid level (PySCF grids.level).")
@click.option("--engine", default="cpu",
              type=click.Choice(["gpu", "cpu", "auto", "mini"],
                                case_sensitive=False),
              help="gpu/auto fall back to CPU PySCF (no TPU DFT engine; "
                   "the reference's gpu4pyscf path is CUDA-only). "
                   "'mini' = built-in RHF/STO-3G engine (s-block only; "
                   "runs a real SCF on PySCF-less hosts).")
@common_options
def dft_cmd(input_path, func, basis, func_basis, max_cycle, conv_tol,
            grid_level, engine, **kw):
    from .workflows.dft import run_dft, ScfNotConverged
    if func_basis:
        func, basis = _split_func_basis(func_basis)
    if engine.lower() in ("gpu", "auto"):
        click.echo("[dft] NOTE: no CUDA in the TPU image; using CPU PySCF "
                   "(the reference's own fallback, dft.py:588-592)")
    try:
        run_dft(input_path, charge=kw["charge"], spin=kw["spin"],
                func=func, basis=basis, max_cycle=max_cycle,
                conv_tol=conv_tol, grid_level=grid_level, engine=engine,
                out_dir=kw["out_dir"] or "./result_dft/")
    except ScfNotConverged as e:
        click.echo(f"[dft] ERROR: {e}", err=True)
        sys.exit(3)
    except ImportError as e:
        click.echo(f"[dft] ERROR: {e}", err=True)
        sys.exit(2)


def main():
    cli()


if __name__ == "__main__":
    main()
