"""Segment/scatter reductions (reference sevenn/nn/convolution.py:16-25).

On TPU, scatter-add is the slow op of the message-passing loop: the XLA
emitter serializes on duplicate indices (measured ~0.8-1.0 ms per
(30k, 500)-row scatter on v5e vs ~0.2 ms for the equivalent gather).
Three structural facts of the MD edge lists remove it entirely:

  - MD edge lists can be laid out as a dense per-atom neighbor grid:
    row ``i*D + k`` holds atom i's k-th incident edge (pads carry zero
    payload via the edge mask). Aggregation-by-destination is then a
    static ``reshape(N, D, F).sum(1)`` -- a regular reduction, no
    scatter op at all (``dense_d`` argument);
  - lists are built sorted by destination, so when a true scatter is
    unavoidable it can at least pass ``indices_are_sorted``;
  - MD lists are symmetric ((i, j) present iff (j, i) is), so a
    scatter-by-source equals a gather by the reverse-edge permutation
    followed by an aggregation-by-destination (``gather_rev``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def scatter_sum(src: jnp.ndarray, index: jnp.ndarray, num_segments: int,
                sorted: bool = False, dense_d: Optional[int] = None):
    """sum src rows into `num_segments` buckets by index (first axis).

    dense_d: the rows follow the dense neighbor-grid contract -- row
    ``i*dense_d + k`` belongs to segment i (index is ignored), rows
    beyond ``num_segments*dense_d`` are alignment pads. The reduction
    compiles to a reshape + sum: no scatter in the program.
    """
    if dense_d is not None:
        body = src[:num_segments * dense_d]
        return body.reshape(
            (num_segments, dense_d) + src.shape[1:]
        ).sum(axis=1)
    return jax.ops.segment_sum(
        src, index, num_segments=num_segments, indices_are_sorted=sorted
    )


def gather_rev(x: jnp.ndarray, src: jnp.ndarray, rev: jnp.ndarray,
               dst: jnp.ndarray, dense_d: Optional[int] = None
               ) -> jnp.ndarray:
    """x[src] with a scatter-free backward.

    Contract: the edge list is symmetric, sorted by ``dst``, and
    ``rev[e]`` is the index of edge (dst[e], src[e]). Then

        dx[v] = sum_{e: src[e]=v} g[e] = sum_{e: dst[e]=v} g[rev[e]]

    i.e. the transpose of the gather is a gather-by-rev plus an
    aggregation over dst (dense reshape-reduction when ``dense_d`` is
    given, else a sorted segment sum).
    """
    n = x.shape[0]

    @jax.custom_vjp
    def g(x):
        return x[src]

    def g_fwd(x):
        return x[src], None

    def g_bwd(_, ct):
        return (scatter_sum(ct[rev], dst, n, sorted=True,
                            dense_d=dense_d),)

    g.defvjp(g_fwd, g_bwd)
    return g(x)


def gather_pair(pos: jnp.ndarray, edge_idx: jnp.ndarray,
                rev: jnp.ndarray, dense_d: Optional[int] = None):
    """(pos[dst], pos[src]) with scatter-free backwards.

    The VJP of the dst-gather aggregates cotangents by destination; the
    VJP of the src-gather rides the reverse-edge permutation (symmetric
    list) onto the same destination aggregation. This removes the two
    force scatter-adds from the MD step (cf. model.py force assembly).
    """
    n = pos.shape[0]
    dst, src = edge_idx[0], edge_idx[1]

    @jax.custom_vjp
    def g(pos):
        return pos[dst], pos[src]

    def g_fwd(pos):
        return g(pos), None

    def g_bwd(_, cts):
        ct_i, ct_j = cts
        d = scatter_sum(ct_i, dst, n, sorted=True, dense_d=dense_d)
        d = d + scatter_sum(ct_j[rev], dst, n, sorted=True,
                            dense_d=dense_d)
        return (d,)

    g.defvjp(g_fwd, g_bwd)
    return g(pos)


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


def half_pair_indices(rev: jnp.ndarray):
    """Static-shape half list over a symmetric edge list.

    Contract (md/engine.py::_compact_nl): real edges pair (e, rev[e])
    with rev[e] != e; pad rows are self-edges and rev FIXED POINTS, so
    exactly n_real/2 <= E/2 rows satisfy e < rev[e]. Returns

      half (E//2,) int32 -- representative edge index per pair; unused
          tail entries hold the sentinel E (count is data-dependent,
          capacity is static).
      pair (E,) int32 -- position of each edge's representative in the
          half list. Pad rows keep pair = 0, which is harmless: their
          mask/scale is 0, so whatever weight row they read multiplies
          to zero in both the forward and the backward.
    """
    e_cap = rev.shape[0]
    iota = jnp.arange(e_cap, dtype=rev.dtype)
    (half,) = jnp.nonzero(iota < rev, size=e_cap // 2,
                          fill_value=e_cap)
    half = half.astype(jnp.int32)
    p = jnp.arange(e_cap // 2, dtype=jnp.int32)
    hs = jnp.minimum(half, e_cap - 1)
    revhalf = jnp.where(half < e_cap, rev[hs].astype(jnp.int32), e_cap)
    pair = jnp.zeros(e_cap, jnp.int32).at[half].set(p, mode='drop')
    pair = pair.at[revhalf].set(p, mode='drop')
    return half, pair


def half_gather(rows: jnp.ndarray, half: jnp.ndarray,
                pair: jnp.ndarray) -> jnp.ndarray:
    """(E, W) per-edge rows -> (E//2, W) representative rows via the
    half index, with a scatter-free backward: a plain gather would VJP
    into a scatter-add over the (E, W) input on every force backward
    (the exact pattern gather_rev/pair_spread exist to avoid). Here
    the cotangent of edge e is its pair's cotangent iff e IS the
    representative (half[pair[e]] == e), else zero -- a pure
    gather + mask."""
    e_cap = pair.shape[0]

    @jax.custom_vjp
    def g(r):
        return r[jnp.minimum(half, e_cap - 1)]

    def g_fwd(r):
        return g(r), None

    def g_bwd(_, ct):
        iota = jnp.arange(e_cap, dtype=half.dtype)
        is_rep = jnp.minimum(half, e_cap - 1)[pair] == iota
        d = jnp.where(is_rep[:, None], ct[pair], 0.0)
        return (d,)

    g.defvjp(g_fwd, g_bwd)
    return g(rows)


def pair_spread(w_half: jnp.ndarray, pair: jnp.ndarray,
                half: jnp.ndarray, rev: jnp.ndarray) -> jnp.ndarray:
    """(E//2, W) per-pair rows -> (E, W) per-edge rows via the pair
    index, with a scatter-free backward: each half row's cotangent is
    the sum of its two directed edges' cotangents, both plain gathers
    (the half-MLP sibling of gather_rev)."""
    e_cap = pair.shape[0]

    @jax.custom_vjp
    def g(wh):
        return wh[pair]

    def g_fwd(wh):
        return wh[pair], None

    def g_bwd(_, ct):
        hs = jnp.minimum(half, e_cap - 1)
        d = ct[hs] + ct[rev[hs]]
        d = jnp.where((half < e_cap)[:, None], d, 0.0)
        return (d,)

    g.defvjp(g_fwd, g_bwd)
    return g(w_half)


def pack_cols(cols, g: int) -> jnp.ndarray:
    """W 1-D (E,) columns -> one (E/g, W*g) array, feature-major groups
    (column w occupies lanes [w*g, (w+1)*g); row r covers edges
    [r*g, (r+1)*g)). Both reshapes are free (row-major), so no narrow
    lane-padded (E, W) intermediate ever materializes -- the whole
    point: the TPU tiler pads an (E, W) array's lane dim W -> 128
    (14-128x memory at 100k atoms)."""
    return jnp.concatenate([c.reshape(-1, g) for c in cols], axis=1)


def unpack_cols(block: jnp.ndarray, g: int, w: int) -> jnp.ndarray:
    """(rows/g, w*g) packed block -> (rows, w) dense 2-D (transposed
    back for kernel consumption; do this on CHUNK-sized blocks only)."""
    rows = block.shape[0] * g
    return jnp.stack(
        [block[:, i * g:(i + 1) * g].reshape(rows) for i in range(w)],
        axis=1,
    )


def gather_col(x: jnp.ndarray, src: jnp.ndarray, rev: jnp.ndarray,
               dst: jnp.ndarray, dense_d: Optional[int] = None):
    """1-D pairwise gather (x[dst], x[src]) with scatter-free backward
    (the component-wise sibling of gather_pair; 1-D arrays dodge the
    (E, 3) lane padding)."""
    n = x.shape[0]

    @jax.custom_vjp
    def g(x):
        return x[dst], x[src]

    def g_fwd(x):
        return g(x), None

    def g_bwd(_, cts):
        ct_i, ct_j = cts
        d = scatter_sum(ct_i, dst, n, sorted=True, dense_d=dense_d)
        d = d + scatter_sum(ct_j[rev], dst, n, sorted=True,
                            dense_d=dense_d)
        return (d,)

    g.defvjp(g_fwd, g_bwd)
    return g(x)
