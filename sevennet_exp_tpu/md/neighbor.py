"""On-device neighbor lists with static capacities (jit-friendly).

Replaces the reference's per-step host-side neighbor rebuild
(sevenn/train/dataload.py + LAMMPS lists in pair_e3gnn.cpp:157-195) with
XLA-compiled construction: fixed edge capacity, overflow flag instead of
dynamic growth -- the host bumps capacity and recompiles only on overflow.

Two builders:
  - dense: O(N^2) minimum-image; simple and fast up to a few thousand atoms
  - cell list: O(N) binning for large systems

Both require box >= 2*rcut in each direction (minimum-image convention);
the host-side list (data/neighborlist.py) handles arbitrary small cells for
single-point calls.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class NeighborState(NamedTuple):
    edge_idx: jnp.ndarray   # (2, E) int32; [0]=center i, [1]=neighbor j
    valid: jnp.ndarray      # (E,) bool
    overflow: jnp.ndarray   # () bool — Verlet build capacity overflow
    ref_pos: jnp.ndarray    # (N, 3) positions at build time
    rev: jnp.ndarray = None  # (E,) reverse-edge permutation over the
    #   DENSE GRID rows (set by engine._compact_nl; its presence is the
    #   structural "this is a dense-grid list" discriminator in
    #   engine._energy_fn — never set it on a raw build list)
    overflow_deg: jnp.ndarray = None  # () bool — dense-grid degree
    #                                   overflow (set by _compact_nl)
    overflow_bin: jnp.ndarray = None  # () bool — cell-list bin overflow
    #   (an atom's rank in its bin exceeded cell_cap; grow cell_cap /
    #    re-grid, NOT e_cap — e.g. NPT compression raising density)
    build_rev: jnp.ndarray = None  # (E,) reverse-edge permutation over
    #   the BUILD edge list (set once per Verlet build by
    #   engine._build_nl; _compact_nl derives the grid-level rev from
    #   it with O(E) gathers instead of per-cadence lexsorts)


def mic_displacements(pos_i, pos_j, cell, inv_cell):
    """Minimum-image pos_j - pos_i for a (possibly triclinic) cell."""
    d = pos_j - pos_i
    frac = d @ inv_cell
    frac = frac - jnp.round(frac)
    return frac @ cell


@partial(jax.jit, static_argnames=('e_cap',))
def dense_neighbor_list(pos, cell, cutoff, e_cap: int) -> NeighborState:
    n = pos.shape[0]
    inv_cell = jnp.linalg.inv(cell)
    d = mic_displacements(pos[:, None, :], pos[None, :, :], cell, inv_cell)
    d2 = jnp.sum(d * d, axis=-1)
    mask = (d2 < cutoff * cutoff) & ~jnp.eye(n, dtype=bool)
    flat = mask.reshape(-1)
    count = jnp.sum(flat)
    (idx,) = jnp.nonzero(flat, size=e_cap, fill_value=0)
    i = (idx // n).astype(jnp.int32)
    j = (idx % n).astype(jnp.int32)
    # pad rows repeat flat index 0; they must never count as edges even
    # when edge 0 exists (flat[0] True), so gate on the true edge count
    valid = flat[idx] & (jnp.arange(e_cap) < count)
    # invalid rows point at the last atom: keeps dst ascending so the
    # message scatter can use indices_are_sorted (payloads are masked)
    i = jnp.where(valid, i, n - 1)
    j = jnp.where(valid, j, n - 1)
    return NeighborState(
        edge_idx=jnp.stack([i, j]),
        valid=valid,
        overflow=count > e_cap,
        ref_pos=pos,
        overflow_bin=jnp.zeros((), bool),
    )


@partial(jax.jit, static_argnames=('e_cap', 'grid', 'cell_cap'))
def cell_list_neighbor_list(
    pos, cell, cutoff, e_cap: int, grid, cell_cap: int
) -> NeighborState:
    """O(N) binned neighbor list on a fractional grid.

    grid: static (nx, ny, nz) with nx >= 3 and cell-width >= cutoff along
    each (fractional) axis; cell_cap: max atoms per bin.
    """
    n = pos.shape[0]
    nx, ny, nz = grid
    nbins = nx * ny * nz
    inv_cell = jnp.linalg.inv(cell)
    frac = (pos @ inv_cell) % 1.0
    # constant-shift distances below require positions INSIDE the
    # primary cell (MD integrators don't wrap; a rattled/drifted atom
    # outside the box would be off by a full box length) -- bin and
    # measure on the wrapped image; only indices leave this function
    pos = frac @ cell
    gx = jnp.clip((frac[:, 0] * nx).astype(jnp.int32), 0, nx - 1)
    gy = jnp.clip((frac[:, 1] * ny).astype(jnp.int32), 0, ny - 1)
    gz = jnp.clip((frac[:, 2] * nz).astype(jnp.int32), 0, nz - 1)
    bin_id = (gx * ny + gy) * nz + gz

    # bucket atoms into bins (stable order by atom index)
    order = jnp.argsort(bin_id)
    sorted_bins = bin_id[order]
    # position within bin
    rank = jnp.arange(n) - jnp.searchsorted(sorted_bins, sorted_bins, side='left')
    bins = jnp.full((nbins, cell_cap), n, dtype=jnp.int32)  # n = sentinel
    bin_overflow = jnp.any(rank >= cell_cap)
    rank_c = jnp.clip(rank, 0, cell_cap - 1)
    bins = bins.at[sorted_bins, rank_c].set(order.astype(jnp.int32))
    counts = jax.ops.segment_sum(jnp.ones(n, jnp.int32), bin_id, nbins)

    # candidate positions, bin-table form. Two TPU-specific choices:
    #  - positions are gathered as per-BIN table rows (three (nbins,
    #    cap) component planes), then indexed per atom with ROW gathers
    #    of whole bins -- three per-element (N, 27*cap) scalar gathers
    #    measured 22.5 ms at 1k atoms vs 4.3 ms for row-structured ones
    #  - no per-pair minimum-image round(): bins are >= cutoff wide, so
    #    every candidate's minimum image is exactly the image reached by
    #    its bin's wrap -- a lattice shift CONSTANT per (atom, offset),
    #    computed from the unwrapped bin coordinate
    pos_pad = jnp.concatenate([pos, jnp.zeros((1, 3), pos.dtype)])
    xb = [pos_pad[:, a][bins] for a in range(3)]   # (nbins, cap) planes
    arange_n = jnp.arange(n, dtype=jnp.int32)
    ok_parts, cand_parts = [], []
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                rx, ry, rz = gx + ox, gy + oy, gz + oz
                cb = ((rx % nx) * ny + ry % ny) * nz + rz % nz
                # floor-div wrap in {-1, 0, 1}: which periodic image of
                # the neighbor bin this offset reaches
                wx, wy, wz = rx // nx, ry // ny, rz // nz
                shift = [
                    (wx * cell[0, a] + wy * cell[1, a] + wz * cell[2, a]
                     )[:, None]
                    for a in range(3)
                ]
                cand_o = bins[cb]                       # (N, cap) rows
                d2_o = 0.0
                for a in range(3):
                    da = xb[a][cb] + shift[a] - pos[:, a][:, None]
                    d2_o = d2_o + da * da
                ok_o = (cand_o < n) & (d2_o < cutoff * cutoff)
                ok_o = ok_o & (cand_o != arange_n[:, None])
                ok_parts.append(ok_o)
                cand_parts.append(cand_o)
    ok = jnp.concatenate(ok_parts, axis=1)            # (N, 27*cap)
    cand = jnp.concatenate(cand_parts, axis=1)

    flat = ok.reshape(-1)
    count = jnp.sum(flat)
    (idx,) = jnp.nonzero(flat, size=e_cap, fill_value=0)
    i = (idx // (27 * cell_cap)).astype(jnp.int32)
    j = cand.reshape(-1)[idx].astype(jnp.int32)
    # pad rows repeat flat index 0; flat[0] (atom 0's first diagonal-bin
    # candidate) is True whenever that candidate lies within the cutoff,
    # which would double-count edge 0 -- gate on the true edge count
    valid = flat[idx] & (jnp.arange(e_cap) < count)
    # invalid rows point at the last atom: keeps dst ascending so the
    # message scatter can use indices_are_sorted (payloads are masked)
    i = jnp.where(valid, i, n - 1)
    j = jnp.where(valid, j, n - 1)
    return NeighborState(
        edge_idx=jnp.stack([i, j]),
        valid=valid,
        overflow=count > e_cap,
        ref_pos=pos,
        overflow_bin=bin_overflow,
    )


def choose_grid(cell: np.ndarray, cutoff: float):
    """Static grid dims: bins at least `cutoff` wide along each axis
    (measured as plane-to-plane distance)."""
    cell = np.asarray(cell, dtype=np.float64)
    vol = abs(np.linalg.det(cell))
    dims = []
    for i in range(3):
        j, k = (i + 1) % 3, (i + 2) % 3
        width = vol / np.linalg.norm(np.cross(cell[j], cell[k]))
        dims.append(max(1, int(width / cutoff)))
    return tuple(min(d, 64) for d in dims)


def needs_rebuild(nl: NeighborState, pos, cell, inv_cell, skin: float):
    """True when an atom moved more than skin/2 since the last build."""
    d = mic_displacements(nl.ref_pos, pos, cell, inv_cell)
    return jnp.max(jnp.sum(d * d, axis=-1)) > (0.5 * skin) ** 2
