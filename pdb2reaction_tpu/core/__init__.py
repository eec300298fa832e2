from .structure import Structure, PaddedSystem, pad_to
from . import io_xyz, io_pdb
