"""SevenNet-TPU: TPU-native E(3)-equivariant interatomic potentials.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of SevenNet
(hexagonrose/SevenNet_exp): training, ASE-style calculation, and
domain-decomposed molecular dynamics of NequIP-family GNN potentials,
designed for TPU meshes (pjit/shard_map + ICI collectives) instead of
CUDA/MPI.
"""

__version__ = '0.1.0'

import os as _os

import jax as _jax

# fp32 matmuls by default: TPU MXU matmuls run bfloat16-input passes
# unless told otherwise, and that is NOT precision noise for a trained
# potential -- measured on the NaCl flagship checkpoint, bf16 linears
# inflate force RMSE vs ground truth 35x (0.056 vs 0.0016 eV/A; the
# reference torch/e3nn stack is fp32 throughout, and BASELINE.md's
# contract is forces within 1e-4 of it). Set
# SEVENNET_MATMUL_PRECISION=default to opt back out.
# NOTE: this mutates process-global JAX config -- other JAX code in the
# same process inherits fp32 matmuls (documented in README "Precision").
_VALID_PRECISIONS = ('default', 'float32', 'highest', 'bfloat16',
                     'tensorfloat32', 'bfloat16_3x')
_prec = _os.environ.get('SEVENNET_MATMUL_PRECISION', 'float32')
if _prec not in _VALID_PRECISIONS:
    import warnings as _warnings
    _warnings.warn(
        f'SEVENNET_MATMUL_PRECISION={_prec!r} is not one of '
        f'{_VALID_PRECISIONS}; falling back to float32')
    _prec = 'float32'
if _prec != 'default':
    _jax.config.update('jax_default_matmul_precision', _prec)

from . import _keys  # noqa: F401
