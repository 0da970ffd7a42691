"""SevenNet-TPU: TPU-native E(3)-equivariant interatomic potentials.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of SevenNet
(hexagonrose/SevenNet_exp): training, ASE-style calculation, and
domain-decomposed molecular dynamics of NequIP-family GNN potentials,
designed for TPU meshes (pjit/shard_map + ICI collectives) instead of
CUDA/MPI.
"""

__version__ = '0.1.0'

from . import _keys  # noqa: F401
