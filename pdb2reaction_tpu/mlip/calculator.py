"""Calculator: the unit-converting, freeze-aware facade over a potential.

Behavioral contract mirrors the reference wrapper
(/root/reference/pdb2reaction/uma_pysis.py:689-780):

- ``get_energy(coords_bohr)``  -> {"energy": Hartree}
- ``get_forces(coords_bohr)``  -> {"energy", "forces"} forces flat 3N in
  Hartree/Bohr, frozen DOFs zeroed
- ``get_hessian(coords_bohr)`` -> {... , "hessian"} (3N,3N) Hartree/Bohr^2
  (or active block if ``return_partial_hessian``), frozen columns zeroed

TPU-first differences:
- the potential is a pure jittable function
  ``energy_fn(coords_ang[P,3], system, params) -> eV`` over a padded system;
  forces are ``jax.grad``; the *analytic* Hessian is the default (batched
  forward-over-reverse), with batched central-difference FD as the
  alternative (eps = 1e-3 Ang like uma_pysis.py:601) — where the reference
  loops 6*N_active serial force calls (uma_pysis.py:652-675), we evaluate all
  displacements in ONE vmapped, mesh-sharded pass.
- ``params`` is a dynamic pytree (MLIP weights, bias-restraint targets, ...)
  traced through jit, so e.g. scan drivers update restraint targets every
  step with zero recompilation.
- batched image evaluation (``get_forces_batch``) for string/path methods:
  vmap over the image axis, sharded across the device mesh.
"""

from __future__ import annotations

import inspect
import os
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import BOHR2ANG, EV2AU, F_EVAA_2_AU, H_EVAA_2_AU
from ..core.structure import Structure, pad_to
from ..parallel.mesh import shard_batch

# Reference calculator option surface (uma_pysis.py:138-165), minus torch/Ray
# device plumbing which has no TPU analogue.
CALC_KW: Dict[str, Any] = {
    "charge": 0,
    "spin": 1,                      # multiplicity
    "model": "uma-s-1p1",           # checkpoint name (mlip registry)
    "task_name": "omol",
    "device": "auto",               # kept for CLI compatibility; ignored (XLA picks)
    "max_neigh": None,              # override neighbor cap
    "radius": None,                 # override cutoff (Angstrom)
    "freeze_atoms": [],
    "hessian_calc_mode": "auto",    # Analytical for dense backbones (exact,
    #   batched HVPs, sharded over the mesh); FiniteDifference for
    #   Pallas-kernel eSCN (custom_vjp has no forward mode, so analytic
    #   HVPs route through the all-XLA variant — measured v5e 2026-08-19
    #   at 300 atoms: the 904-tangent HVP program crashes the TPU worker
    #   (per-edge grid tensors of the fwd-over-rev XLA chain exhaust
    #   HBM), while batched FD through the mega kernel takes 34.8 s warm.
    #   FD is also the reference's own default (uma_pysis.py:160).
    "hessian_double": True,
    "return_partial_hessian": False,
    "fd_step": 1.0e-3,              # Angstrom, FD displacement (reference eps)
    "workers": 1,                   # mapped to mesh data axis, not Ray
    "workers_per_node": 1,
    "spatial": 1,                   # atom-axis shards (spatial partitioning)
}


_SENTINEL = object()

_NORM_CACHE: Dict[Any, Callable] = {}


def _normalize_energy_fn(energy_fn: Callable) -> Callable:
    """Accept both (coords, system) and (coords, system, params) signatures.

    A function opts into dynamic params by naming its third positional
    parameter ``params`` (or setting ``takes_params = True`` on itself).
    Wrappers are cached so repeated Calculators over the same function
    share one identity (and therefore one set of compiled programs).
    """
    if getattr(energy_fn, "takes_params", False):
        return energy_fn
    try:
        names = list(inspect.signature(energy_fn).parameters)
    except (TypeError, ValueError):
        names = []
    if len(names) >= 3 and names[2] == "params":
        return energy_fn
    try:
        hit = _NORM_CACHE.get(energy_fn)
    except TypeError:
        hit = None
    if hit is None:
        def hit(coords, system, params, _f=energy_fn):
            return _f(coords, system)
        try:
            _NORM_CACHE[energy_fn] = hit
        except TypeError:
            pass
    return hit


# ---------------------------------------------------------------------------
# module-level compiled kernels, shared across ALL calculators with the
# same energy function: the padded system is a pytree ARGUMENT, not a
# closure constant, so two calculators over different structures (same
# padded size) reuse one XLA program — the axon remote-compile cost
# (~minutes per program at 300 atoms) is paid once per (function, shape)
# instead of once per Calculator instance.
# ---------------------------------------------------------------------------

_KERNELS: Dict[Any, Dict[str, Callable]] = {}


def _shard_mapped(body, mesh, n_in: int, batch_arg: int = 0):
    """Wrap a batched kernel in shard_map over the mesh 'data' axis: the
    leading batch axis splits across devices, each device runs its local
    images SEQUENTIALLY (lax.map below — measured 2.6x faster than vmap on
    v5e at 300 atoms: the dense path's [P,P,R] temps make vmap memory-bound
    while the sequential schedule stays compute-bound). Without shard_map,
    GSPMD cannot parallelize a lax.map over a sharded axis and would
    reshard + serialize."""
    try:
        from jax import shard_map  # type: ignore
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    in_specs = tuple(P("data") if i == batch_arg else P()
                     for i in range(n_in))
    # check_vma=False: Pallas custom_vjp kernels in the body build
    # ShapeDtypeStruct out_shapes without vma annotations, which the
    # varying-mesh-axis checker rejects; the body is a pure per-image map
    # with no collectives over 'data', so the check adds nothing here.
    try:
        return shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=P("data"), check_vma=False)
    except TypeError:   # older jax: no check_vma kwarg
        return shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=P("data"))


def _get_kernels(efn: Callable, chunk: int, mesh=None,
                 efn_h: Callable = None) -> Dict[str, Callable]:
    """``mesh`` (data axis > 1, model axis == 1) makes the batched kernels
    shard_map over 'data'. Tensor-parallel calculators (model > 1) keep the
    plain jit kernels: their params are feature-sharded and GSPMD places
    the collectives.

    ``efn_h`` overrides the energy function for the forward-over-reverse
    (HVP / analytic-Hessian) kernels: energy functions built on custom_vjp
    Pallas paths (escn edge_kernel="pallas") support reverse-mode only, so
    their calculators pass the XLA-path variant here."""
    if mesh is not None and (mesh.shape.get("data", 1) < 2
                             or mesh.shape.get("model", 1) > 1):
        mesh = None
    if efn_h is None:
        efn_h = efn
    key = (efn, chunk, mesh, efn_h)
    hit = _KERNELS.get(key)
    if hit is not None:
        return hit

    def _eforce(coords_pad, system, params):
        e, g = jax.value_and_grad(efn)(coords_pad, system, params)
        # zero forces on frozen + padding atoms (uma_pysis.py:700-706)
        return e, -g * system.free_mask[:, None]

    @jax.jit
    def energy(coords_pad, system, params):
        return efn(coords_pad, system, params)

    eforce = jax.jit(_eforce)

    def _eforce_map(coords_batch, system, params):
        return jax.lax.map(lambda c: _eforce(c, system, params),
                           coords_batch, batch_size=chunk)

    eforce_batch = jax.jit(_shard_mapped(_eforce_map, mesh, 3)
                           if mesh is not None else _eforce_map)

    # analytic Hessian = batched HVPs (forward-over-reverse), chunked:
    # jax.hessian would materialize all 3P tangent columns at once —
    # 28 GB of per-column message temps at 300 atoms on v5e. On a mesh the
    # tangent batch shards over 'data' (the displacement-parallel axis,
    # SURVEY §2.2 item 4).
    def _hvp_map(coords_pad, tangents, system, params):
        def hvp(v):
            return jax.jvp(
                lambda c: jax.grad(efn_h)(c, system, params),
                (coords_pad,), (v.astype(coords_pad.dtype),))[1]
        return jax.lax.map(hvp, tangents, batch_size=chunk)

    hvp_batch = jax.jit(_shard_mapped(_hvp_map, mesh, 4, batch_arg=1)
                        if mesh is not None else _hvp_map)

    def _fd_map(coords_batch, system, params):
        return jax.lax.map(lambda c: -jax.grad(efn)(c, system, params),
                           coords_batch, batch_size=chunk)

    fd_forces_batch = jax.jit(_shard_mapped(_fd_map, mesh, 3)
                              if mesh is not None else _fd_map)

    def _au_eforce(coords_bohr_pad, packed):
        system, params = packed
        coords_ang = coords_bohr_pad * BOHR2ANG
        e_ev, g_ev = jax.value_and_grad(efn)(coords_ang, system, params)
        f_au = -g_ev * F_EVAA_2_AU * system.free_mask[:, None]
        return e_ev * EV2AU, f_au

    au_eforce_p = jax.jit(_au_eforce)

    # Batched images run through lax.map with a bounded chunk instead of
    # a full vmap: XLA stages ~8 live copies of the per-layer [B,P,P,R]
    # temps under vmap, which OOMs v5e HBM at 300 atoms x 12 images
    # (40.7 GB observed). At 300 atoms ONE image already saturates the
    # chip, so the fully sequential schedule (chunk=1, the default) is
    # also the FASTEST: 630 vs 244 calls/s for vmap on v5e (memory-bound
    # vs compute-bound). Across a mesh, shard_map splits the batch over
    # 'data' and each device runs its local images sequentially.
    def _au_batch_map(coords_batch, packed):
        return jax.lax.map(lambda c: _au_eforce(c, packed),
                           coords_batch, batch_size=chunk)

    au_eforce_batch_p = jax.jit(_shard_mapped(_au_batch_map, mesh, 2)
                                if mesh is not None else _au_batch_map)

    # Hessian-vector product in Bohr coordinate space (direction-exact;
    # used by the GSM Lanczos climbing tangent — analytic HVPs replace
    # the reference's finite-difference Lanczos force probes)
    @jax.jit
    def au_hvp_p(coords_bohr_pad, v_pad, packed):
        system, params = packed
        coords_ang = coords_bohr_pad * BOHR2ANG

        def grad(c):
            return jax.grad(efn_h)(c, system, params)

        hv = jax.jvp(grad, (coords_ang,),
                     (v_pad.astype(coords_ang.dtype),))[1]
        return hv * system.free_mask[:, None]

    hit = {"energy": energy, "eforce": eforce,
           "eforce_batch": eforce_batch, "hvp_batch": hvp_batch,
           "fd_forces_batch": fd_forces_batch,
           "au_eforce_p": au_eforce_p,
           "au_eforce_batch_p": au_eforce_batch_p,
           "au_hvp_p": au_hvp_p}
    _KERNELS[key] = hit
    return hit


class Calculator:
    """Freeze-aware, unit-converting calculator over a padded potential."""

    def __init__(
        self,
        structure: Structure,
        energy_fn: Callable,
        *,
        params: Any = None,
        freeze_atoms=None,
        hessian_calc_mode: str = "Analytical",
        return_partial_hessian: bool = False,
        hessian_double: bool = True,
        fd_step: float = 1.0e-3,
        pad_multiple: int = 8,
        mesh=None,
        weights_source: str = "analytic",
        energy_fn_hessian: Callable = None,
        batch_chunk: int = None,
    ):
        if freeze_atoms is not None:
            structure = structure.copy()
            structure.freeze = sorted(set(int(i) for i in freeze_atoms))
        self.structure = structure
        self.system = pad_to(structure, multiple=pad_multiple)
        self.n_atoms = structure.n_atoms
        self.n_pad = self.system.n_pad
        self.energy_fn = _normalize_energy_fn(energy_fn)
        self.energy_fn_hessian = (
            _normalize_energy_fn(energy_fn_hessian)
            if energy_fn_hessian is not None else None)
        self.params = params
        if hessian_calc_mode == "auto":
            hessian_calc_mode = "Analytical"   # dense paths: HVPs are cheap
        self.hessian_calc_mode = hessian_calc_mode or "FiniteDifference"
        self.return_partial_hessian = return_partial_hessian
        self.hessian_double = hessian_double
        self.fd_step = float(fd_step)
        self.mesh = mesh
        # provenance tag for summary.yaml ("which weights produced this"):
        # surrogate-seeded(...) / checkpoint:... / converted:... / analytic
        self.weights_source = str(weights_source)
        self.force_calls = 0          # bench contract: count every force eval
        self.energy_calls = 0
        # Preferred GSM loop driver for workflows' gs_kw loop="auto"
        # (workflows/path_opt.py): device while_loops for dense
        # backbones; eSCN calculators override to "host" because the
        # batched-string while_loop program takes ~35 min of remote
        # compile at 300 atoms (mlip/uma.py, engines/gsm.py).
        self.gsm_loop_default = "device"
        # lax.map vectorization width for the batched kernels (image
        # batches, FD displacements, HVP tangents). None -> env override
        # or 1. The right value is backbone-dependent: dense surrogates
        # OOM/lose under vmap (see _get_kernels note), Pallas-kernel eSCN
        # never materializes per-edge tensors so moderate chunks batch
        # the XLA remainder for free (make_uma_calculator sets it).
        self.batch_chunk = batch_chunk
        self._build()

    # -- compiled kernels ---------------------------------------------------
    def _build(self):
        chunk = (int(self.batch_chunk) if self.batch_chunk
                 else int(os.environ.get("PDB2R_TPU_BATCH_CHUNK", "1")))
        k = _get_kernels(self.energy_fn, chunk, self.mesh,
                         efn_h=self.energy_fn_hessian)
        self._energy_j = k["energy"]
        self._eforce_j = k["eforce"]
        self._eforce_batch_j = k["eforce_batch"]
        self._hvp_batch_j = k["hvp_batch"]
        self._fd_forces_batch_j = k["fd_forces_batch"]
        self._au_eforce_p = k["au_eforce_p"]
        self._au_eforce_batch_p = k["au_eforce_batch_p"]
        self._au_hvp_p = k["au_hvp_p"]

    def pack(self, params=_SENTINEL):
        """(system, params) pytree for the packed-signature au kernels —
        what engines thread through their device loops alongside
        ``au_energy_force_fn_p()``."""
        return (self.system,
                self.params if params is _SENTINEL else params)

    # -- helpers ------------------------------------------------------------
    def _to_pad_ang(self, coords_bohr) -> jnp.ndarray:
        c = np.asarray(coords_bohr, dtype=np.float64).reshape(-1, 3) * BOHR2ANG
        assert c.shape[0] == self.n_atoms, (c.shape, self.n_atoms)
        out = np.zeros((self.n_pad, 3), dtype=np.float64)
        out[: self.n_atoms] = c
        return jnp.asarray(out)

    @property
    def free_dof_mask(self) -> np.ndarray:
        """[3N] bool over real atoms: movable DOFs."""
        m = np.asarray(self.system.free_mask)[: self.n_atoms] > 0
        return np.repeat(m, 3)

    # -- public API (pysisyphus-style, Bohr/Hartree) ------------------------
    def get_energy(self, coords_bohr) -> Dict[str, Any]:
        c = self._to_pad_ang(coords_bohr)
        e_ev = self._energy_j(c, self.system, self.params)
        self.energy_calls += 1
        return {"energy": float(e_ev) * EV2AU}

    def get_forces(self, coords_bohr) -> Dict[str, Any]:
        c = self._to_pad_ang(coords_bohr)
        e_ev, f_evA = self._eforce_j(c, self.system, self.params)
        self.force_calls += 1
        f = np.asarray(f_evA, dtype=np.float64)[: self.n_atoms] * F_EVAA_2_AU
        return {"energy": float(e_ev) * EV2AU, "forces": f.reshape(-1)}

    def _mesh_batch_multiple(self) -> int:
        if self.mesh is None:
            return 1
        return int(self.mesh.shape.get("data", 1))

    def get_forces_batch(self, coords_bohr_batch) -> Dict[str, Any]:
        """Evaluate B images in one sharded pass: [B,3N] or [B,N,3] Bohr."""
        cb = np.asarray(coords_bohr_batch, dtype=np.float64).reshape(
            len(coords_bohr_batch), -1, 3) * BOHR2ANG
        B = cb.shape[0]
        # pad the batch to a multiple of the data axis for even shards
        mult = self._mesh_batch_multiple()
        Bp = ((B + mult - 1) // mult) * mult
        batch = np.zeros((Bp, self.n_pad, 3), dtype=np.float64)
        batch[:B, : self.n_atoms] = cb
        if Bp > B:
            batch[B:] = batch[B - 1]
        jb = jnp.asarray(batch)
        if self.mesh is not None:
            jb = shard_batch(jb, self.mesh)
        e_ev, f_evA = self._eforce_batch_j(jb, self.system, self.params)
        self.force_calls += B
        if jax.process_count() > 1:
            # multi-host mesh: assemble the full result on every process
            from ..parallel.distributed import gather_global
            e_ev = gather_global(e_ev)
            f_evA = gather_global(f_evA)
        e = np.asarray(e_ev, dtype=np.float64)[:B] * EV2AU
        f = (np.asarray(f_evA, dtype=np.float64)[:B, : self.n_atoms]
             * F_EVAA_2_AU).reshape(B, -1)
        return {"energy": e, "forces": f}

    def get_hessian(self, coords_bohr) -> Dict[str, Any]:
        mode = self.hessian_calc_mode
        if not mode or mode not in ("Analytical", "FiniteDifference"):
            mode = "FiniteDifference"
        if mode == "Analytical":
            H_au = self._analytic_hessian(coords_bohr)
        else:
            H_au = self._fd_hessian(coords_bohr)
        res = self.get_forces(coords_bohr)
        free = self.free_dof_mask
        if self.return_partial_hessian:
            H_au = H_au[np.ix_(free, free)]
        else:
            Hm = np.zeros_like(H_au)
            Hm[np.ix_(free, free)] = H_au[np.ix_(free, free)]
            H_au = Hm
        dtype = np.float64 if self.hessian_double else np.float32
        res["hessian"] = H_au.astype(dtype)
        return res

    def _stream_chunks(self, kernel, full, env_name, default_chunk):
        """Run ``kernel`` over ``full`` [B, P, 3] in fixed-size host-side
        chunks and stack the results (VERDICT r4 items 3/4).

        One-shot full-batch programs failed at flagship scale two ways:
        the 904-tangent analytic-HVP program exhausted v5e HBM, and the
        1808-displacement batched-FD program took ~18 min of remote
        compile. Streaming fixed [C, P, 3] chunks bounds live memory to
        one chunk's temps AND compiles exactly ONE moderate program that
        every chunk (and every later Hessian call at this system size)
        reuses. The chunk size is padded to the mesh data-axis multiple so
        sharded calculators keep even shards; the tail chunk is padded by
        repeating its last row and trimmed after."""
        B = full.shape[0]
        mult = self._mesh_batch_multiple()
        C = int(os.environ.get(env_name, str(default_chunk)))
        C = max(((C + mult - 1) // mult) * mult, mult)
        Bp = ((B + mult - 1) // mult) * mult
        C = min(C, Bp)
        gather = None
        if jax.process_count() > 1:
            from ..parallel.distributed import gather_global
            gather = gather_global
        outs = []
        for lo in range(0, B, C):
            chunk = full[lo:lo + C]
            if chunk.shape[0] < C:
                chunk = np.concatenate(
                    [chunk, np.tile(chunk[-1:], (C - chunk.shape[0], 1, 1))])
            jb = jnp.asarray(chunk)
            if self.mesh is not None:
                jb = shard_batch(jb, self.mesh)
            out = kernel(jb)
            if gather is not None:
                out = gather(out)
            outs.append(np.asarray(out, dtype=np.float64))
        return np.concatenate(outs)[:B]

    def _analytic_hessian(self, coords_bohr) -> np.ndarray:
        c = self._to_pad_ang(coords_bohr)
        n3 = self.n_atoms * 3
        # unit tangents for every real-atom DOF, streamed as fixed-size
        # HVP chunks (forward-over-reverse); see _stream_chunks
        eye = np.zeros((n3, self.n_pad, 3), dtype=np.float32)
        flat = eye.reshape(n3, -1)
        atom = np.arange(n3) // 3
        comp = np.arange(n3) % 3
        flat[np.arange(n3), atom * 3 + comp] = 1.0
        rows = self._stream_chunks(
            lambda jt: self._hvp_batch_j(c, jt, self.system, self.params),
            eye, "PDB2R_TPU_HVP_CHUNK", 64)
        H = rows[:, : self.n_atoms].reshape(n3, n3)
        H = 0.5 * (H + H.T)
        return H * H_EVAA_2_AU

    def _fd_hessian(self, coords_bohr) -> np.ndarray:
        """Batched central differences: ALL 2*N_free_dof displacements as
        device-batched force calls (vs. the reference's serial loop,
        uma_pysis.py:652-675), streamed in fixed-size chunks."""
        c0 = np.asarray(self._to_pad_ang(coords_bohr))
        eps = self.fd_step
        free = self.free_dof_mask
        n3 = self.n_atoms * 3
        dof_ids = np.nonzero(free)[0]
        B = dof_ids.size
        batch = np.tile(c0[None], (2 * B, 1, 1))
        flat = batch.reshape(2 * B, -1)
        atom = dof_ids // 3
        comp = dof_ids % 3
        pad_flat = atom * 3 + comp
        flat[np.arange(B), pad_flat] += eps
        flat[B + np.arange(B), pad_flat] -= eps
        batch = flat.reshape(2 * B, self.n_pad, 3)
        f = self._stream_chunks(
            lambda jb: self._fd_forces_batch_j(jb, self.system, self.params),
            batch, "PDB2R_TPU_FD_CHUNK", 64)
        self.force_calls += 2 * B
        f = f[:, : self.n_atoms].reshape(2 * B, n3)
        fp, fm = f[:B], f[B:]
        H = np.zeros((n3, n3), dtype=np.float64)
        # column k of Hessian = -(F(x+e_k) - F(x-e_k)) / (2 eps)   [eV/Ang^2]
        H[:, dof_ids] = (-(fp - fm) / (2.0 * eps)).T
        H = 0.5 * (H + H.T)
        return H * H_EVAA_2_AU

    # -- Angstrom-side conveniences used by engines -------------------------
    def energy_ev(self, coords_ang_pad: jnp.ndarray) -> jnp.ndarray:
        return self._energy_j(coords_ang_pad, self.system, self.params)

    def au_energy_force_fn(self):
        """Pure closure for jit engines: coords_bohr_pad [P,3] ->
        (E Hartree, F Hartree/Bohr [P,3], frozen+padding zeroed).

        This is the function optimizers call INSIDE their lax.while_loop —
        the whole optimization runs on device with no host round-trip per
        step (unlike the reference's per-cycle host<->GPU boundary,
        SURVEY.md §3.2). Captures ``self.params`` at closure-build time;
        rebuild after changing params, or use ``au_energy_force_fn_p`` to
        thread the packed (system, params) explicitly."""
        fn_p = self.au_energy_force_fn_p()
        packed = self.pack()
        return lambda coords_bohr_pad: fn_p(coords_bohr_pad, packed)

    def au_energy_force_fn_p(self):
        """Like ``au_energy_force_fn`` but with (coords, packed) signature
        where ``packed = calc.pack()`` (or ``calc.pack(other_params)``).
        MODULE-LEVEL identity shared by every calculator over the same
        energy function — engine compile caches keyed on it are shared
        across calculators and structures."""
        return self._au_eforce_p

    def au_hvp_fn_p(self):
        """(coords_bohr_pad [P,3], v_pad [P,3], packed) -> H v (direction-
        exact Hessian-vector product, frozen/padding rows zeroed).
        Module-level shared identity."""
        return self._au_hvp_p

    def au_hvp_fn(self):
        """Bound HVP closure (coords_pad, v_pad) -> H v; cached per
        (calculator, params) so engines can key compile caches on it."""
        cached = getattr(self, "_hvp_closure", None)
        if cached is not None and cached[0] is self.params:
            return cached[1]
        hvp_p = self._au_hvp_p
        packed = self.pack()

        def fn(coords_pad, v_pad):
            return hvp_p(coords_pad, v_pad, packed)

        self._hvp_closure = (self.params, fn)
        return fn

    def au_energy_force_batch_fn(self):
        """Batched closure: [B,P,3] Bohr -> (E [B] Ha, F [B,P,3] au).

        One sharded pass over the mesh 'data' axis — the image-parallel
        force evaluation GSM/NEB/DMF/FD-Hessian loops feed (the reference
        evaluates string images serially, SURVEY.md §2.2 items 2-4)."""
        # stable closure per (calculator, params): string engines key their
        # compile caches on this identity, so rebuilding it per call would
        # force a re-trace of every macro-step program
        cached = getattr(self, "_batch_closure", None)
        if cached is not None and cached[0] is self.params:
            return cached[1]
        batched_p = self._au_eforce_batch_p
        packed = self.pack()
        if self.mesh is not None:
            mesh = self.mesh

            def fn(coords_batch):
                return batched_p(shard_batch(coords_batch, mesh), packed)
        else:
            def fn(coords_batch):
                return batched_p(coords_batch, packed)
        self._batch_closure = (self.params, fn)
        return fn

    def shard_params_model(self):
        """Reshard ``self.params`` for tensor-parallel inference over the
        mesh 'model' axis (feature-dimension sharding; identical results,
        collectives inserted by GSPMD). No-op without a mesh."""
        if self.mesh is None:
            return self
        from ..parallel.mesh import shard_params_model
        self.params = shard_params_model(self.params, self.mesh)
        self._batch_closure = None
        self._hvp_closure = None
        return self

    def pad_bohr(self, coords_bohr) -> jnp.ndarray:
        """Host helper: [N,3]/[3N] Bohr -> padded [P,3] Bohr."""
        c = np.asarray(coords_bohr, dtype=np.float64).reshape(-1, 3)
        out = np.zeros((self.n_pad, 3), dtype=np.float64)
        out[: self.n_atoms] = c
        return jnp.asarray(out)

    def unpad(self, coords_pad) -> np.ndarray:
        return np.asarray(coords_pad, dtype=np.float64)[: self.n_atoms]
