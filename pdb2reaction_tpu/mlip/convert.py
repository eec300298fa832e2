"""fairchem UMA checkpoint conversion (weight-parity roadmap).

The reference consumes Meta's pretrained UMA models through fairchem
(``pretrained_mlip.get_predict_unit``, uma_pysis.py:246-250). Reaching the
BASELINE force-parity bar (<= 1e-6 eV/atom, BASELINE.md) requires loading
those weights into a bit-faithful JAX reimplementation of the eSCN-MoE
backbone. This module holds the conversion machinery:

1. ``inspect_checkpoint``: enumerate a fairchem checkpoint's tensors
   (works with a plain ``torch.load`` of the published .pt files — torch
   CPU is available in this image; fairchem itself is not required for
   reading the state dict).
2. ``convert_state_dict``: map fairchem parameter names into this
   package's pytree layout. The PaiNN-class surrogate does NOT have a
   1:1 correspondence with eSCN-MoE tensors, so full parity needs the
   eSCN backbone port (tracked as the round-2 flagship item); the mapping
   table below covers the shared pieces (element references, embedding
   tables) and records what remains.

Parity test protocol (once weights land): fixed structures, compare
energies/forces against the reference calculator to <= 1e-6 eV/atom at
identical cutoffs/max_neigh, cf. SURVEY.md §4(b).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

# fairchem tensor-name prefixes -> local pytree slots (shared pieces)
SHARED_MAPPING = {
    # per-element reference energies
    "module.backbone.sphere_embedding.weight": "embed_z",
    "element_references.energy": "atom_ref",
}


def inspect_checkpoint(path) -> Dict[str, Any]:
    """List tensor names/shapes in a fairchem .pt checkpoint."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        try:
            out[k] = tuple(v.shape)
        except AttributeError:
            out[k] = type(v).__name__
    return out


def convert_state_dict(path, cfg) -> Dict[str, np.ndarray]:
    """Extract the mappable tensors from a fairchem checkpoint.

    Returns partial params (shared pieces only); raises with a clear
    summary of unmapped tensors so progress toward full parity is
    visible rather than silent.
    """
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    mapped: Dict[str, np.ndarray] = {}
    unmapped = []
    for k, v in sd.items():
        hit = None
        for src, dst in SHARED_MAPPING.items():
            if k.endswith(src) or k == src:
                hit = dst
                break
        if hit:
            mapped[hit] = np.asarray(v.detach().numpy())
        else:
            unmapped.append(k)
    if not mapped:
        raise ValueError(
            f"No mappable tensors found in {path}. The eSCN-MoE backbone "
            f"port is required for full parity; {len(unmapped)} tensors "
            "remain unmapped (see inspect_checkpoint for the inventory).")
    return mapped
