"""2-D pencil decomposition for multi-chip MD (host-side bookkeeping).

Lifts the 1-D slab ring's ``width / n_dev >= cutoff`` ceiling
(domain.py:83-87) the way LAMMPS' comm_brick does with staged swaps
(comm_brick.cpp: 2 swaps per dimension, corner ghosts ride the later
phase): the box is split into (Pa x Pb) pencils over two axes; ghosts
are exchanged in TWO phases -- phase A along axis ``a`` from local
rows, phase B along axis ``b`` from [local | phase-A ghosts] rows, so
corner regions arrive without any explicit diagonal communication.

Row layout per device: [local | gA_lo | gA_hi | gB_lo | gB_hi] where
the B-phase send indices address the first cap_loc + 2*cap_ga rows.
On-device refresh = two ppermute pairs over a ('dda','ddb') mesh
(parallel/md2d.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

from ..data.graph import Atoms


@dataclass
class DomainSpec2D:
    """Per-device arrays; leading axis = device (d = ia * Pb + ib)."""
    mesh: Tuple[int, int]       # (Pa, Pb)
    axes: Tuple[int, int]       # decomposition axes
    cell: np.ndarray
    cap_loc: int
    cap_ga: int                 # phase-A ghosts per side
    cap_gb: int                 # phase-B ghosts per side
    owner_perm: np.ndarray      # (n_atoms,)
    pos: np.ndarray             # (D, cap_loc, 3)
    z: np.ndarray               # (D, cap_loc)
    loc_mask: np.ndarray        # (D, cap_loc)
    n_loc: np.ndarray           # (D,)
    # phase A: indices into local rows [0, cap_loc)
    send_idx_a: np.ndarray      # (D, 2, cap_ga)
    send_mask_a: np.ndarray     # (D, 2, cap_ga)
    shift_a: np.ndarray         # (D, 2, cap_ga, 3)
    # phase B: indices into [local | gA] rows [0, cap_loc + 2*cap_ga)
    send_idx_b: np.ndarray      # (D, 2, cap_gb)
    send_mask_b: np.ndarray     # (D, 2, cap_gb)
    shift_b: np.ndarray         # (D, 2, cap_gb, 3)
    # edges over [local | gA_lo | gA_hi | gB_lo | gB_hi]
    edge_idx: np.ndarray        # (D, 2, cap_edge); [0] = local center
    edge_mask: np.ndarray       # (D, cap_edge)
    cap_edge: int = 0

    @property
    def cap_a_all(self) -> int:
        return self.cap_loc + 2 * self.cap_ga

    @property
    def cap_all(self) -> int:
        return self.cap_loc + 2 * self.cap_ga + 2 * self.cap_gb


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _plane_width(cell, axis):
    vol = abs(np.linalg.det(cell))
    j, k = (axis + 1) % 3, (axis + 2) % 3
    return vol / np.linalg.norm(np.cross(cell[j], cell[k]))


def decompose_2d(
    atoms: Atoms,
    mesh: Tuple[int, int],
    cutoff: float,
    axes: Tuple[int, int] = (0, 1),
    cap_margin: float = 1.25,
    caps: Tuple[int, int, int, int] = None,
) -> DomainSpec2D:
    """Pencil decomposition over ``axes`` with a (Pa, Pb) device grid."""
    Pa, Pb = mesh
    ax_a, ax_b = axes
    assert ax_a != ax_b
    cell = np.asarray(atoms.cell, dtype=np.float64)
    pos = np.asarray(atoms.pos, dtype=np.float64)
    z = np.asarray(atoms.atomic_numbers)
    n = len(atoms)
    D = Pa * Pb
    inv = np.linalg.inv(cell)
    frac = (pos @ inv) % 1.0
    pos_w = frac @ cell

    for P, ax in ((Pa, ax_a), (Pb, ax_b)):
        width = _plane_width(cell, ax)
        if P > 1 and width / P < cutoff:
            raise ValueError(
                f'pencil width {width / P:.2f} along axis {ax} < '
                f'cutoff {cutoff}: use fewer devices along that axis'
            )

    ia = np.minimum((frac[:, ax_a] * Pa).astype(np.int64), Pa - 1)
    ib = np.minimum((frac[:, ax_b] * Pb).astype(np.int64), Pb - 1)
    dev_of = ia * Pb + ib
    counts = np.bincount(dev_of, minlength=D)

    if caps is not None:
        cap_loc, cap_ga, cap_gb, cap_edge = caps
        if counts.max() > cap_loc:
            cap_loc = _round_up(int(counts.max() * cap_margin) + 8, 8)
    else:
        cap_loc = _round_up(int(counts.max() * cap_margin) + 8, 8)
        cap_ga = cap_gb = cap_edge = 0

    spec_pos = np.zeros((D, cap_loc, 3))
    spec_z = np.zeros((D, cap_loc), dtype=np.int64)
    loc_mask = np.zeros((D, cap_loc), dtype=np.float32)
    n_loc = np.zeros(D, dtype=np.int64)
    owner_perm = np.zeros(n, dtype=np.int64)
    local_row = np.zeros(n, dtype=np.int64)
    # per-device original atom index of each local row (for u lookups)
    loc_atom = np.full((D, cap_loc), -1, dtype=np.int64)

    off = 0
    for d in range(D):
        sel = np.nonzero(dev_of == d)[0]
        m = len(sel)
        assert m <= cap_loc
        spec_pos[d, :m] = pos_w[sel]
        spec_z[d, :m] = z[sel]
        loc_mask[d, :m] = 1.0
        n_loc[d] = m
        owner_perm[off:off + m] = sel
        local_row[sel] = np.arange(m)
        loc_atom[d, :m] = sel
        off += m

    wa = _plane_width(cell, ax_a)
    wb = _plane_width(cell, ax_b)
    frac_cut_a = cutoff / wa * Pa
    frac_cut_b = cutoff / wb * Pb

    # ---- phase A (axis a): sends from local rows --------------------
    a_sends = [[None, None] for _ in range(D)]
    for d in range(D):
        m = int(n_loc[d])
        atoms_d = loc_atom[d, :m]
        da = int(d // Pb)
        u = frac[atoms_d, ax_a] * Pa - da
        for side, cond in ((0, u < frac_cut_a), (1, u > 1 - frac_cut_a)):
            a_sends[d][side] = np.nonzero(cond)[0]
    need_ga = max(
        [1] + [len(a_sends[d][s]) for d in range(D) for s in (0, 1)]
    )
    if need_ga > cap_ga:
        cap_ga = _round_up(int(need_ga * cap_margin) + 8, 8)

    send_idx_a = np.zeros((D, 2, cap_ga), dtype=np.int64)
    send_mask_a = np.zeros((D, 2, cap_ga), dtype=np.float32)
    shift_a = np.zeros((D, 2, cap_ga, 3))
    for d in range(D):
        da = int(d // Pb)
        for side in (0, 1):
            snd = a_sends[d][side]
            send_idx_a[d, side, :len(snd)] = snd
            send_mask_a[d, side, :len(snd)] = 1.0
            shift = np.zeros(3)
            if side == 0 and da == 0:
                shift = cell[ax_a]
            if side == 1 and da == Pa - 1:
                shift = -cell[ax_a]
            shift_a[d, side, :len(snd)] = shift

    # host-side simulation of the phase-A arrival (positions + source
    # atom ids + their axis-b fractional coordinate)
    cap_a_all = cap_loc + 2 * cap_ga
    view_a = np.zeros((D, cap_a_all, 3))
    viewa_atom = np.full((D, cap_a_all), -1, dtype=np.int64)
    for d in range(D):
        m = int(n_loc[d])
        view_a[d, :m] = spec_pos[d, :m]
        viewa_atom[d, :m] = loc_atom[d, :m]
        da, db = int(d // Pb), int(d % Pb)
        # gA_lo slots receive the (da+1) device's side-0 sends;
        # gA_hi slots receive the (da-1) device's side-1 sends
        for slot, (src_da, side) in enumerate(
            (((da + 1) % Pa, 0), ((da - 1) % Pa, 1))
        ):
            src = src_da * Pb + db
            base = cap_loc + slot * cap_ga
            snd = a_sends[src][side]
            rows = send_idx_a[src, side, :len(snd)]
            view_a[d, base:base + len(snd)] = (
                spec_pos[src, rows] + shift_a[src, side, :len(snd)]
            )
            viewa_atom[d, base:base + len(snd)] = loc_atom[src, rows]

    # ---- phase B (axis b): sends from [local | gA] rows -------------
    b_sends = [[None, None] for _ in range(D)]
    for d in range(D):
        db = int(d % Pb)
        rows = np.nonzero(viewa_atom[d] >= 0)[0]
        u = frac[viewa_atom[d, rows], ax_b] * Pb - db
        for side, cond in ((0, u < frac_cut_b), (1, u > 1 - frac_cut_b)):
            b_sends[d][side] = rows[np.nonzero(cond)[0]]
    need_gb = max(
        [1] + [len(b_sends[d][s]) for d in range(D) for s in (0, 1)]
    )
    if need_gb > cap_gb:
        cap_gb = _round_up(int(need_gb * cap_margin) + 8, 8)

    send_idx_b = np.zeros((D, 2, cap_gb), dtype=np.int64)
    send_mask_b = np.zeros((D, 2, cap_gb), dtype=np.float32)
    shift_b = np.zeros((D, 2, cap_gb, 3))
    for d in range(D):
        db = int(d % Pb)
        for side in (0, 1):
            snd = b_sends[d][side]
            send_idx_b[d, side, :len(snd)] = snd
            send_mask_b[d, side, :len(snd)] = 1.0
            shift = np.zeros(3)
            if side == 0 and db == 0:
                shift = cell[ax_b]
            if side == 1 and db == Pb - 1:
                shift = -cell[ax_b]
            shift_b[d, side, :len(snd)] = shift

    # full per-device view after both phases
    cap_all = cap_a_all + 2 * cap_gb
    view = np.zeros((D, cap_all, 3))
    valid = np.zeros((D, cap_all), dtype=bool)
    for d in range(D):
        view[d, :cap_a_all] = view_a[d]
        valid[d, :cap_a_all] = viewa_atom[d] >= 0
        da, db = int(d // Pb), int(d % Pb)
        for slot, (src_db, side) in enumerate(
            (((db + 1) % Pb, 0), ((db - 1) % Pb, 1))
        ):
            src = da * Pb + src_db
            base = cap_a_all + slot * cap_gb
            snd = b_sends[src][side]
            rows = send_idx_b[src, side, :len(snd)]
            view[d, base:base + len(snd)] = (
                view_a[src, rows] + shift_b[src, side, :len(snd)]
            )
            valid[d, base:base + len(snd)] = True

    # edges: centers local; periodic images suppressed along BOTH
    # decomposed axes (ghosts carry them), kept along the third
    from ..data.neighborlist import neighbor_list as host_nl
    pbc_eff = [True, True, True]
    if Pa > 1:
        pbc_eff[ax_a] = False
    if Pb > 1:
        pbc_eff[ax_b] = False
    all_edges = []
    max_e = 0
    for d in range(D):
        vi = np.nonzero(valid[d])[0]
        ei, ej, _, _ = host_nl(view[d, vi], cell, pbc_eff, cutoff)
        gi, gj = vi[ei], vi[ej]
        keep = gi < cap_loc
        gi, gj = gi[keep], gj[keep]
        all_edges.append((gi, gj))
        max_e = max(max_e, len(gi))

    if max_e > cap_edge:
        cap_edge = _round_up(int(max_e * cap_margin) + 32, 256)
    edge_idx = np.zeros((D, 2, cap_edge), dtype=np.int32)
    edge_mask = np.zeros((D, cap_edge), dtype=np.float32)
    for d, (gi, gj) in enumerate(all_edges):
        e = len(gi)
        edge_idx[d, 0, :e] = gi
        edge_idx[d, 1, :e] = gj
        edge_idx[d, :, e:] = cap_all - 1
        edge_mask[d, :e] = 1.0

    return DomainSpec2D(
        mesh=mesh, axes=axes, cell=cell,
        cap_loc=cap_loc, cap_ga=cap_ga, cap_gb=cap_gb,
        cap_edge=cap_edge,
        owner_perm=owner_perm, pos=spec_pos, z=spec_z,
        loc_mask=loc_mask, n_loc=n_loc,
        send_idx_a=send_idx_a, send_mask_a=send_mask_a, shift_a=shift_a,
        send_idx_b=send_idx_b, send_mask_b=send_mask_b, shift_b=shift_b,
        edge_idx=edge_idx, edge_mask=edge_mask,
    )
