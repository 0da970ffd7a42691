"""Spatial domain decomposition for multi-chip MD (host-side bookkeeping).

Replaces the reference's LAMMPS brick decomposition + comm_brick index
maps (pair_e3gnn_parallel.cpp:684-730, comm_brick.cpp:1057-1125): the box
is split into slabs along one axis, each device owns the atoms of its
slab plus fixed-capacity ghost slots filled from the two ring neighbors.
All index maps are rebuilt on host at the rebuild cadence; between
rebuilds the jitted step only moves positions/features through
`lax.ppermute` (see parallel/md.py), with autodiff providing the reverse
(gradient-accumulating) exchange that the reference implements manually
(pair_e3gnn_parallel.cpp:401-438).

Static capacities (atoms/ghosts/edges per device) replace dynamic MPI
message sizes; over-capacity raises and the driver rebuilds with larger
caps (the reference's `comm_size` metadata analog, deploy.py:121-131).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

from ..data.graph import Atoms


@dataclass
class DomainSpec:
    """Per-device arrays; leading axis = device."""
    n_dev: int
    axis: int                   # decomposition axis (0..2)
    cell: np.ndarray            # (3, 3) global cell
    cap_loc: int
    cap_ghost: int              # per side
    # ownership
    owner_perm: np.ndarray      # (n_atoms,) original index of packed atoms
    pos: np.ndarray             # (n_dev, cap_loc, 3)
    z: np.ndarray               # (n_dev, cap_loc) atomic numbers (0 pad)
    loc_mask: np.ndarray        # (n_dev, cap_loc)
    n_loc: np.ndarray           # (n_dev,)
    # halo exchange: send my rows send_idx[d, side] to neighbor on `side`
    # (side 0 = to left/lower neighbor, side 1 = to right/upper)
    send_idx: np.ndarray        # (n_dev, 2, cap_ghost) indices into local rows
    send_mask: np.ndarray       # (n_dev, 2, cap_ghost)
    ghost_shift: np.ndarray     # (n_dev, 2, cap_ghost, 3) cartesian shifts
    # neighbor graph over [local | ghost_from_right | ghost_from_left]
    edge_idx: np.ndarray        # (n_dev, 2, cap_edge) [0]=center local row
    edge_mask: np.ndarray       # (n_dev, cap_edge)
    cap_edge: int = 0

    @property
    def cap_all(self) -> int:
        return self.cap_loc + 2 * self.cap_ghost


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def decompose(
    atoms: Atoms,
    n_dev: int,
    cutoff: float,
    axis: int = 0,
    cap_margin: float = 1.25,
    caps: Tuple[int, int, int] = None,
) -> DomainSpec:
    """Slab decomposition along `axis` (fractional coordinate)."""
    cell = np.asarray(atoms.cell, dtype=np.float64)
    pos = np.asarray(atoms.pos, dtype=np.float64)
    z = np.asarray(atoms.atomic_numbers)
    n = len(atoms)
    inv = np.linalg.inv(cell)
    frac = pos @ inv
    frac_wrapped = frac % 1.0
    pos_w = frac_wrapped @ cell

    # slab width must cover the cutoff for 1-ring halo validity
    vol = abs(np.linalg.det(cell))
    j, k = (axis + 1) % 3, (axis + 2) % 3
    width = vol / np.linalg.norm(np.cross(cell[j], cell[k]))
    if width / n_dev < cutoff:
        raise ValueError(
            f'slab width {width / n_dev:.2f} < cutoff {cutoff}: '
            f'use fewer devices or a bigger box'
        )

    dev_of = np.minimum(
        (frac_wrapped[:, axis] * n_dev).astype(np.int64), n_dev - 1
    )
    counts = np.bincount(dev_of, minlength=n_dev)

    if caps is not None:
        # previous caps are a HINT: keep them while they still fit (the
        # jitted chunk stays shape-stable), regrow any that migration
        # outgrew (long runs must survive rebinning; cf. the serial
        # engine's overflow regrowth, md/engine.py _run_dispatch)
        cap_loc, cap_ghost, cap_edge = caps
        if counts.max() > cap_loc:
            cap_loc = _round_up(int(counts.max() * cap_margin) + 8, 8)
    else:
        cap_loc = _round_up(int(counts.max() * cap_margin) + 8, 8)
        cap_ghost = cap_edge = 0  # sized below

    spec_pos = np.zeros((n_dev, cap_loc, 3))
    spec_z = np.zeros((n_dev, cap_loc), dtype=np.int64)
    loc_mask = np.zeros((n_dev, cap_loc), dtype=np.float32)
    n_loc = np.zeros(n_dev, dtype=np.int64)
    owner_perm = np.zeros(n, dtype=np.int64)
    local_row = np.zeros(n, dtype=np.int64)

    off = 0
    for d in range(n_dev):
        sel = np.nonzero(dev_of == d)[0]
        m = len(sel)
        if m > cap_loc:
            raise ValueError('cap_loc overflow')
        spec_pos[d, :m] = pos_w[sel]
        spec_z[d, :m] = z[sel]
        loc_mask[d, :m] = 1.0
        n_loc[d] = m
        owner_perm[off:off + m] = sel
        local_row[sel] = np.arange(m)
        off += m

    # halo: send atoms near faces; ghost arrival layout on receiver:
    # [local | from_right_neighbor(d+1 sends side 0) | from_left(d-1 side 1)]
    frac_cut = cutoff / width * n_dev
    gcounts = [0]
    for d in range(n_dev):
        u = frac_wrapped[dev_of == d, axis] * n_dev - d  # [0,1)
        gcounts.append(int((u < frac_cut).sum()))
        gcounts.append(int((u > 1 - frac_cut).sum()))
    if max(gcounts) > cap_ghost:  # initial sizing or migration regrowth
        cap_ghost = _round_up(int(max(gcounts) * cap_margin) + 8, 8)
    send_idx = np.zeros((n_dev, 2, cap_ghost), dtype=np.int64)
    send_mask = np.zeros((n_dev, 2, cap_ghost), dtype=np.float32)
    ghost_shift = np.zeros((n_dev, 2, cap_ghost, 3))
    for d in range(n_dev):
        sel = np.nonzero(dev_of == d)[0]
        u = frac_wrapped[sel, axis] * n_dev - d
        for side, cond in ((0, u < frac_cut), (1, u > 1 - frac_cut)):
            snd = np.nonzero(cond)[0]
            send_idx[d, side, :len(snd)] = local_row[sel[snd]]
            send_mask[d, side, :len(snd)] = 1.0
            # crossing the global boundary? receiver is d-1 (side 0) or d+1
            recv = (d - 1) % n_dev if side == 0 else (d + 1) % n_dev
            shift = np.zeros(3)
            if side == 0 and d == 0:
                shift = cell[axis]          # wraps: appears above receiver
            if side == 1 and d == n_dev - 1:
                shift = -cell[axis]
            ghost_shift[d, side, :len(snd)] = shift
    # NOTE ghost_shift semantics: added by the RECEIVER to arriving
    # positions; stored at the sender's slot order (ppermute keeps order).

    # edge lists per device: centers = local atoms; neighbors = local+ghost
    cap_all = cap_loc + 2 * cap_ghost
    all_edges = []
    max_e = 0
    from ..data.neighborlist import neighbor_list as host_nl
    for d in range(n_dev):
        # assemble this device's view: local + ghosts with shifts applied
        view = np.zeros((cap_all, 3))
        valid = np.zeros(cap_all, dtype=bool)
        m = int(n_loc[d])
        view[:m] = spec_pos[d, :m]
        valid[:m] = True
        right = (d + 1) % n_dev
        left = (d - 1) % n_dev
        # ghosts from right neighbor (their side-0 sends)
        for slot, (src, side) in enumerate(((right, 0), (left, 1))):
            base = cap_loc + slot * cap_ghost
            cnt = int(send_mask[src, side].sum())
            rows = send_idx[src, side, :cnt]
            view[base:base + cnt] = (
                spec_pos[src, rows] + ghost_shift[src, side, :cnt]
            )
            valid[base:base + cnt] = True
        # neighbor pairs (open boundaries: shifts already folded in; the
        # orthogonal directions still need images)
        # ghosts already carry the slab-axis images: suppress periodic
        # images along the decomposition axis (they would duplicate the
        # ghost copies), keep them along the orthogonal directions
        pbc_eff = [True, True, True]
        if n_dev > 1:
            pbc_eff[axis] = False
        vi = np.nonzero(valid)[0]
        ei, ej, evec, _ = host_nl(
            view[vi], cell, pbc_eff, cutoff
        )
        gi, gj = vi[ei], vi[ej]
        keep = gi < cap_loc  # centers must be local
        gi, gj = gi[keep], gj[keep]
        all_edges.append((gi, gj))
        max_e = max(max_e, len(gi))

    if max_e > cap_edge:  # initial sizing or migration regrowth
        # 256-aligned so the fused pallas conv path stays eligible
        cap_edge = _round_up(int(max_e * cap_margin) + 32, 256)
    edge_idx = np.zeros((n_dev, 2, cap_edge), dtype=np.int32)
    edge_mask = np.zeros((n_dev, cap_edge), dtype=np.float32)
    for d, (gi, gj) in enumerate(all_edges):
        e = len(gi)
        edge_idx[d, 0, :e] = gi
        edge_idx[d, 1, :e] = gj
        # padded edges point at the last (masked) slot
        edge_idx[d, :, e:] = cap_all - 1
        edge_mask[d, :e] = 1.0

    return DomainSpec(
        n_dev=n_dev, axis=axis, cell=cell,
        cap_loc=cap_loc, cap_ghost=cap_ghost, cap_edge=cap_edge,
        owner_perm=owner_perm, pos=spec_pos, z=spec_z,
        loc_mask=loc_mask, n_loc=n_loc,
        send_idx=send_idx, send_mask=send_mask, ghost_shift=ghost_shift,
        edge_idx=edge_idx, edge_mask=edge_mask,
    )
