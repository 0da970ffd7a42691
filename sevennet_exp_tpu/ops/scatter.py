"""Segment/scatter reductions (reference sevenn/nn/convolution.py:16-25).

On TPU, scatter-add is the slow op of the message-passing loop: the XLA
emitter serializes on duplicate indices. Two structural facts of the MD
edge lists let us sidestep it:

  - edge lists are built sorted by destination (and pads point at the
    last atom), so the forward aggregation can pass
    ``indices_are_sorted`` (measured ~5x faster on v5e);
  - MD lists are symmetric ((i, j) present iff (j, i) is), so the
    *backward* scatter-by-source equals a gather by the reverse-edge
    permutation followed by a sorted scatter-by-destination
    (``gather_rev``) -- the unsorted scatter disappears entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_sum(src: jnp.ndarray, index: jnp.ndarray, num_segments: int,
                sorted: bool = False):
    """sum src rows into `num_segments` buckets by index (first axis)."""
    return jax.ops.segment_sum(
        src, index, num_segments=num_segments, indices_are_sorted=sorted
    )


def gather_rev(x: jnp.ndarray, src: jnp.ndarray, rev: jnp.ndarray,
               dst: jnp.ndarray) -> jnp.ndarray:
    """x[src] with a sorted-scatter backward.

    Contract: the edge list is symmetric, sorted by ``dst``, and
    ``rev[e]`` is the index of edge (dst[e], src[e]). Then

        dx[v] = sum_{e: src[e]=v} g[e] = sum_{e: dst[e]=v} g[rev[e]]

    i.e. the transpose of the gather is a gather-by-rev plus a
    *sorted* segment sum over dst.
    """
    n = x.shape[0]

    @jax.custom_vjp
    def g(x):
        return x[src]

    def g_fwd(x):
        return x[src], None

    def g_bwd(_, ct):
        return (scatter_sum(ct[rev], dst, n, sorted=True),)

    g.defvjp(g_fwd, g_bwd)
    return g(x)


def reverse_permutation(edge_idx: jnp.ndarray) -> jnp.ndarray:
    """rev[e] = index of the reverse edge (dst[e], src[e]).

    Requires a symmetric list; pad edges must be self-edges (i, i) so
    they map among themselves. Sorting the list by (src, dst) and by
    (dst, src) pairs the e-th entries as mutual reverses (stable sort +
    identical key multisets).
    """
    dst, src = edge_idx[0], edge_idx[1]
    a = jnp.lexsort((dst, src))   # primary key src, secondary dst
    b = jnp.lexsort((src, dst))   # primary key dst, secondary src
    return jnp.zeros_like(a).at[a].set(b)
