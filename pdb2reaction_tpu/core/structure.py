"""Structure containers.

Two representations:

- :class:`Structure` — host-side, numpy, variable length, carries chemistry
  metadata (charge/spin/freeze lists/PDB records). The analogue of the
  reference's pysisyphus ``Geometry`` (see /root/reference/pdb2reaction/opt.py:134,
  uma_pysis.py:131-136) but as a plain data holder: all math lives in pure
  functions.

- :class:`PaddedSystem` — device-side, fixed-shape padded arrays registered as
  a JAX pytree. Freeze atoms become a per-atom ``free_mask`` instead of index
  lists so every engine is jit-stable. This is the TPU-first replacement for
  the reference's index-list freeze protocol (uma_pysis.py:554-592).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import ANG2BOHR, BOHR2ANG
from .. import elements


@dataclass
class Structure:
    """A molecular structure in Angstrom with chemistry metadata."""

    numbers: np.ndarray                 # [N] int
    coords: np.ndarray                  # [N, 3] float64, Angstrom
    charge: int = 0
    spin: int = 1                       # multiplicity (2S+1), reference convention
    freeze: List[int] = field(default_factory=list)   # 0-based frozen atom indices
    comment: str = ""
    # Optional per-atom PDB metadata dicts (record/name/resname/chain/resseq/...)
    pdb_atoms: Optional[List[Dict[str, Any]]] = None
    source_path: Optional[str] = None
    # suffix of the ORIGINAL input file (".pdb"/".xyz"/".gjf"/...).
    # source_path is rebound to the --ref-pdb template when one is
    # attached (workflows/common.py load_structure), so PDB-only checks
    # like --ligand-charge must consult this instead (reference
    # utils.py:869-875 rejects --ligand-charge for xyz/gjf inputs even
    # when a template PDB is supplied).
    input_suffix: Optional[str] = None

    def __post_init__(self):
        self.numbers = np.asarray(self.numbers, dtype=np.int32)
        self.coords = np.asarray(self.coords, dtype=np.float64).reshape(-1, 3)
        assert self.numbers.shape[0] == self.coords.shape[0]

    @classmethod
    def from_symbols(cls, symbols: Sequence[str], coords, **kw) -> "Structure":
        return cls(elements.numbers_from_symbols(symbols), np.asarray(coords), **kw)

    @property
    def n_atoms(self) -> int:
        return int(self.numbers.shape[0])

    @property
    def symbols(self) -> List[str]:
        return elements.symbols_from_numbers(self.numbers)

    @property
    def masses(self) -> np.ndarray:
        return elements.masses_of(self.numbers)

    @property
    def coords_bohr(self) -> np.ndarray:
        return self.coords * ANG2BOHR

    def set_coords_bohr(self, coords_bohr) -> None:
        self.coords = np.asarray(coords_bohr, dtype=np.float64).reshape(-1, 3) * BOHR2ANG

    @property
    def free_mask(self) -> np.ndarray:
        m = np.ones(self.n_atoms, dtype=bool)
        if self.freeze:
            m[np.asarray(self.freeze, dtype=int)] = False
        return m

    def copy(self, coords=None) -> "Structure":
        new = dataclasses.replace(
            self,
            numbers=self.numbers.copy(),
            coords=(np.asarray(coords, dtype=np.float64).reshape(-1, 3).copy()
                    if coords is not None else self.coords.copy()),
            freeze=list(self.freeze),
            pdb_atoms=[dict(a) for a in self.pdb_atoms] if self.pdb_atoms else None,
        )
        # GJF provenance rides as ad-hoc attrs (set by io_gjf.read_gjf);
        # dataclasses.replace drops them — carry them so .gjf companion
        # mirroring (workflows/common.py write_outputs) survives copies
        for attr in ("gjf_template", "gjf_charge", "gjf_spin", "is_gjf"):
            if hasattr(self, attr):
                setattr(new, attr, getattr(self, attr))
        return new

    def rmsd(self, other: "Structure") -> float:
        d = self.coords - other.coords
        return float(np.sqrt((d * d).sum(axis=1).mean()))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PaddedSystem:
    """Fixed-shape device representation of one structure (Angstrom).

    ``atom_mask`` marks real atoms among the padding; ``free_mask`` marks
    movable (non-frozen) real atoms. Both are float32 {0,1} so they can be
    multiplied straight into forces and reductions.
    """

    numbers: jnp.ndarray    # [P] int32, 0 = padding
    coords: jnp.ndarray     # [P, 3]
    atom_mask: jnp.ndarray  # [P] float32
    free_mask: jnp.ndarray  # [P] float32
    masses: jnp.ndarray     # [P] float64/float32, 0 for padding

    @property
    def n_pad(self) -> int:
        return self.numbers.shape[0]


def pad_to(struct: Structure, n_pad: Optional[int] = None,
           multiple: int = 8) -> PaddedSystem:
    """Pad a Structure to a fixed size (next multiple of ``multiple``)."""
    n = struct.n_atoms
    if n_pad is None:
        n_pad = -(-n // multiple) * multiple
    assert n_pad >= n
    numbers = np.zeros(n_pad, dtype=np.int32)
    numbers[:n] = struct.numbers
    coords = np.zeros((n_pad, 3), dtype=np.float64)
    coords[:n] = struct.coords
    atom_mask = np.zeros(n_pad, dtype=np.float32)
    atom_mask[:n] = 1.0
    free_mask = np.zeros(n_pad, dtype=np.float32)
    free_mask[:n] = struct.free_mask.astype(np.float32)
    masses = np.zeros(n_pad, dtype=np.float64)
    masses[:n] = struct.masses
    return PaddedSystem(
        numbers=jnp.asarray(numbers),
        coords=jnp.asarray(coords),
        atom_mask=jnp.asarray(atom_mask),
        free_mask=jnp.asarray(free_mask),
        masses=jnp.asarray(masses),
    )
