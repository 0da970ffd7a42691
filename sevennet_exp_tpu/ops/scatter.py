"""Segment/scatter reductions (reference sevenn/nn/convolution.py:16-25).

On TPU, `jax.ops.segment_sum` lowers to sorted-scatter XLA HLO; indices are
static-shape int32. Padded rows must carry a valid index (pointing at a
dummy slot) with zero payload.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_sum(src: jnp.ndarray, index: jnp.ndarray, num_segments: int):
    """sum src rows into `num_segments` buckets by index (first axis)."""
    return jax.ops.segment_sum(src, index, num_segments=num_segments)
