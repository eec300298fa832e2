"""First-class checkpoint/resume for long-running workflows.

The reference has only partial, file-based restartability (SURVEY.md §5.4:
optimizer ``restart*.yml`` dumps are never surfaced, ``all.py`` is not
resumable). Here every expensive stage can snapshot its state and resume:

- array state is stored as ``.npz``; metadata (configs, indices, hashes) as
  JSON next to it;
- stages are keyed by a content hash of their inputs, so a resumed run
  re-validates that it is continuing the *same* computation (the reference
  guards a Hessian cache the same way with exact coordinate comparison,
  tsopt.py:690-731);
- used by scan (per-stage), path-search (per-segment memo) and GSM
  (periodic image dumps).
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np


def content_key(*arrays, extra: str = "") -> str:
    h = hashlib.sha256()
    for a in arrays:
        a = np.asarray(a, dtype=np.float64)
        # shape/dtype header + separator per array: same bytes under a
        # different shape, or a different split across varargs, must not
        # collide to the same key (the resume guard depends on it)
        h.update(f"|{a.shape}:{a.dtype}|".encode())
        h.update(np.ascontiguousarray(a))
    h.update(extra.encode())
    return h.hexdigest()[:16]


def save_state(store: "CheckpointStore", name: str, state,
               meta: Optional[Dict[str, Any]] = None) -> None:
    """Snapshot a NamedTuple-of-arrays engine state (LBFGSState,
    _DimerState, _IrcState, ...) — the TPU-first analogue of the
    reference's ``dump_restart`` YAML / ``irc_data.h5``
    (/root/reference/pdb2reaction/opt.py:211-214, irc.py:58): the loop
    carry IS the restart file."""
    arrays = {f: np.asarray(getattr(state, f)) for f in state._fields}
    store.save(name, {**(meta or {}), "_fields": list(state._fields)},
               arrays)


def load_state(store: "CheckpointStore", name: str, cls,
               expect_key: Optional[str] = None):
    """Load a state saved by :func:`save_state`. Returns (meta, state) or
    None — also None when ``expect_key`` mismatches the stored content key
    (resuming a DIFFERENT computation must never pick up a stale dump;
    same guard as the reference's exact-coordinate Hessian cache,
    tsopt.py:690-731)."""
    import jax.numpy as jnp
    rec = store.load(name)
    if rec is None:
        return None
    meta, arrays = rec
    if expect_key is not None and meta.get("key") != expect_key:
        return None
    if set(meta.get("_fields", [])) != set(cls._fields):
        return None
    state = cls(**{f: jnp.asarray(arrays[f]) for f in cls._fields})
    return meta, state


class CheckpointStore:
    def __init__(self, directory):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)

    def _paths(self, name: str):
        return self.dir / f"{name}.json", self.dir / f"{name}.npz"

    def save(self, name: str, meta: Dict[str, Any],
             arrays: Optional[Dict[str, np.ndarray]] = None) -> None:
        jp, ap = self._paths(name)
        if arrays:
            np.savez_compressed(ap, **{k: np.asarray(v)
                                       for k, v in arrays.items()})
        jp.write_text(json.dumps(meta, default=float))

    def load(self, name: str):
        """Returns (meta, arrays) or None."""
        jp, ap = self._paths(name)
        if not jp.exists():
            return None
        meta = json.loads(jp.read_text())
        arrays = {}
        if ap.exists():
            with np.load(ap) as z:
                arrays = {k: z[k] for k in z.files}
        return meta, arrays

    def has(self, name: str) -> bool:
        return self._paths(name)[0].exists()

    def delete(self, name: str) -> None:
        for p in self._paths(name):
            p.unlink(missing_ok=True)
