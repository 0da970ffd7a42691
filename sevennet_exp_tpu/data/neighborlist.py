"""Host-side neighbor list (numpy/scipy), replaces matscipy/ASE usage.

Reference behavior (sevenn/train/dataload.py:32-88): full directed list of
pairs with distance < cutoff, periodic images included, zero-shift self
pairs excluded. Non-periodic directions are treated as open (no images).

Algorithm: replicate atoms over the integer shifts whose image cell can be
within `cutoff` of the home cell (bounded via reciprocal-plane distances),
then one cKDTree ball query. O(N log N), adequate for dataset builds and
ASE-style calculator calls; the MD engine uses an on-device cell list
instead (sevennet_exp_tpu/md/neighbor.py).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy.spatial import cKDTree


def _n_repeats(cell: np.ndarray, pbc, cutoff: float) -> np.ndarray:
    """Images needed per axis: ceil(cutoff / plane distance)."""
    n = np.zeros(3, dtype=np.int64)
    vol = abs(np.linalg.det(cell))
    if vol < 1e-12:
        # degenerate cell: only meaningful for fully open boundaries
        assert not any(pbc), 'periodic system with singular cell'
        return n
    for i in range(3):
        if not pbc[i]:
            continue
        j, k = (i + 1) % 3, (i + 2) % 3
        area = np.linalg.norm(np.cross(cell[j], cell[k]))
        d = vol / area
        n[i] = int(np.ceil(cutoff / d))
    return n


def neighbor_list(
    pos: np.ndarray,
    cell: np.ndarray,
    pbc,
    cutoff: float,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Directed neighbor pairs within cutoff.

    Returns (edge_i, edge_j, edge_vec, shift):
      edge_i: (E,) center atom index
      edge_j: (E,) neighbor atom index
      edge_vec: (E, 3) = pos[j] + shift @ cell - pos[i]
      shift: (E, 3) integer cell shifts of the neighbor image
    """
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    cell = np.ascontiguousarray(cell, dtype=np.float64)
    N = len(pos)
    if N == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros((0, 3)), np.zeros((0, 3)))

    pbc = [bool(b) for b in np.atleast_1d(pbc).tolist()] if np.ndim(pbc) else [bool(pbc)] * 3
    if len(pbc) == 1:
        pbc = pbc * 3

    # native C++ cell-list builder (runtime/neighbor.cpp) when available
    from .native import native_neighbor_list
    res = native_neighbor_list(pos, cell, pbc, cutoff)
    if res is not None:
        return res

    if any(pbc):
        # wrap positions into the home cell along periodic axes for robust
        # image counting (keeps results identical: vectors recomputed below)
        frac = pos @ np.linalg.inv(cell)
        wrap = np.where(pbc, np.floor(frac), 0.0)
        base_shift = -wrap.astype(np.int64)
        pos_wrapped = (frac + base_shift) @ cell
    else:
        base_shift = np.zeros((N, 3), dtype=np.int64)
        pos_wrapped = pos

    reps = _n_repeats(cell, pbc, cutoff) if any(pbc) else np.zeros(3, np.int64)
    rng = [np.arange(-reps[i], reps[i] + 1) for i in range(3)]
    shifts = np.array(np.meshgrid(*rng, indexing='ij')).reshape(3, -1).T  # (S,3)

    images = (pos_wrapped[None, :, :]
              + (shifts @ cell)[:, None, :]).reshape(-1, 3)  # (S*N, 3)
    tree = cKDTree(images)
    hits = tree.query_ball_point(pos_wrapped, cutoff)

    ei, ej, es = [], [], []
    for i, lst in enumerate(hits):
        for h in lst:
            s_idx, j = divmod(h, N)
            s = shifts[s_idx]
            if j == i and not s.any():
                continue
            ei.append(i)
            ej.append(j)
            es.append(s)
    edge_i = np.asarray(ei, dtype=np.int64)
    edge_j = np.asarray(ej, dtype=np.int64)
    shift = (np.asarray(es, dtype=np.int64).reshape(-1, 3)
             + base_shift[edge_j] - base_shift[edge_i])
    edge_vec = pos[edge_j] + shift @ cell - pos[edge_i]
    # strict < cutoff (matscipy convention); prune boundary hits
    keep = np.einsum('ij,ij->i', edge_vec, edge_vec) < cutoff * cutoff
    return edge_i[keep], edge_j[keep], edge_vec[keep], shift[keep]
