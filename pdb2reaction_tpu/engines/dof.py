"""Free-DOF gather/scatter helpers.

Engines that carry dense Hessians (RFO, dimer, IRC, vib) work in a compact
free-DOF vector space of static size; these helpers map between the padded
[P,3] device layout and the compact [Df] space. The freeze list is static
per run, so the index maps are host numpy.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class DofMap:
    def __init__(self, free_mask_pad: np.ndarray, n_atoms: int):
        free = np.asarray(free_mask_pad) > 0
        self.n_pad = free.shape[0]
        self.n_atoms = n_atoms
        dof_free = np.repeat(free, 3)
        self.free_idx = np.nonzero(dof_free)[0]          # into padded flat
        self.n_free = int(self.free_idx.size)
        real = np.zeros(self.n_pad, dtype=bool)
        real[:n_atoms] = True
        self.real_idx = np.nonzero(np.repeat(real, 3))[0]
        # map: free dof position among *real* (3N) dofs, for Hessian compaction
        free_real = dof_free[: 3 * n_atoms]
        self.free_in_real = np.nonzero(free_real)[0]

    def gather(self, x_pad3):
        return jnp.reshape(x_pad3, (-1,))[jnp.asarray(self.free_idx)]

    def scatter(self, x_free, base_pad3):
        flat = jnp.reshape(base_pad3, (-1,))
        flat = flat.at[jnp.asarray(self.free_idx)].set(x_free)
        return flat.reshape(-1, 3)

    def compact_hessian(self, H_3N: np.ndarray) -> np.ndarray:
        """Full (3N,3N) real-atom Hessian -> (Df,Df) free block."""
        return H_3N[np.ix_(self.free_in_real, self.free_in_real)]

    def expand_vector(self, v_free: np.ndarray) -> np.ndarray:
        """[Df] -> [3N] real-atom flat with zeros on frozen DOFs."""
        out = np.zeros(3 * self.n_atoms)
        out[self.free_in_real] = np.asarray(v_free)
        return out
