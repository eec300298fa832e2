"""pdb2reaction_tpu — TPU-native enzymatic reaction-path framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
t-0hmura/pdb2reaction: PDB -> active-site extraction -> MEP search (GSM/DMF)
-> TS refinement (Dimer / RS-P-RFO) -> IRC -> vibrational analysis /
thermochemistry -> DFT single points, with an equivariant MLIP evaluated as
batched, mesh-sharded XLA programs.
"""

__version__ = "0.1.0"

from . import constants, elements
