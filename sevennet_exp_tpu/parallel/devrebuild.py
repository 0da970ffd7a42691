"""Device-resident migration + neighbor rebuild for the brick engine.

The multi-chip analog of LAMMPS' reneighboring triad — pbc() wrap,
comm exchange() (atom migration), comm borders() (ghost selection) and
neighbor list build (comm_brick.cpp, pair_e3gnn_parallel.cpp uses them
implicitly every rebuild) — executed entirely INSIDE the jitted chunk:

  1. wrap positions into the box,
  2. per decomposed mesh axis, migrate atoms whose home brick changed
     to the adjacent device via lax.ppermute (positions, velocities,
     forces, atomic numbers, and global atom ids ride one payload;
     staged per-axis passes resolve corner moves with no diagonal
     messages — between rebuilds atoms move far less than a brick),
  3. rebuild the per-phase halo send selections from the new
     positions (boundary-zone tests in brick-fractional coordinates),
  4. rebuild the per-shard symmetric dense neighbor grid (EDGE_REV +
     EDGE_DENSE_D, parallel/brick.py layout) with a mixed-boundary
     cell list: open bins along decomposed axes (ghost copies carry
     the images), minimum-image along non-decomposed axes.

run(n) therefore never gathers global arrays to the host
(VERDICT r2 #3); static capacities carry device-side overflow flags,
and the engine falls back to one host decompose_brick() only when a
capacity genuinely overflows (mdbrick._rebuild).

All index bookkeeping uses the same contracts as the host builder
(brick.py) so the jitted step programs are shared.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class RebuildGeom(NamedTuple):
    """Static (host-computed) geometry for the device rebuild."""
    mesh: Tuple[int, ...]      # (P0[, P1[, P2]])
    axes: Tuple[int, ...]
    fc: Tuple[float, ...]      # per-phase cutoff in brick-fraction units
    # mixed cell list over the view, per cartesian axis 0..2:
    nb: Tuple[int, int, int]       # bin count
    open_axis: Tuple[bool, bool, bool]  # open (decomposed) vs periodic
    lo: Tuple[float, float, float]      # region lower bound (brick frac
    #                                     for open axes, 0 for periodic)
    w: Tuple[float, float, float]       # bin width in region units
    cell_cap: int
    cap_loc: int
    cap_g: Tuple[int, ...]
    deg_cap: int
    rows: int


def make_geom(spec, cell: np.ndarray, cutoff: float,
              cell_cap_margin: float = 2.5) -> RebuildGeom:
    """Derive the static rebuild geometry from a host BrickSpec."""
    from .brick import _plane_width
    mesh, axes = spec.mesh, spec.axes
    fc = []
    for P, ax in zip(mesh, axes):
        width = _plane_width(cell, ax)
        fc.append(cutoff / width * P)
    # mixed cell list: per cartesian axis, open iff decomposed with P>1
    nb = [1, 1, 1]
    open_axis = [False, False, False]
    lo = [0.0, 0.0, 0.0]
    w = [1.0, 1.0, 1.0]
    ax_to_phase = {ax: k for k, ax in enumerate(axes)}
    for c in range(3):
        width = _plane_width(cell, c)
        if c in ax_to_phase and mesh[ax_to_phase[c]] > 1:
            k = ax_to_phase[c]
            open_axis[c] = True
            f = fc[k]
            extent = 1.0 + 2.0 * f
            nb[c] = max(1, int(extent / f))
            lo[c] = -f
            w[c] = extent / nb[c]
        else:
            # periodic: wrap stencil needs >= 3 bins (2 double-counts)
            fr = cutoff / width
            n = int(1.0 / fr) if fr < 1.0 else 1
            nb[c] = n if n >= 3 else 1
            lo[c] = 0.0
            w[c] = 1.0 / nb[c]
    # per-bin capacity from density over the bin volume
    n_atoms = int(spec.loc_mask.sum())
    vol = abs(np.linalg.det(cell))
    bin_vol = vol
    for c in range(3):
        span = w[c] / mesh[ax_to_phase[c]] if open_axis[c] else w[c]
        bin_vol *= span
    cell_cap = int(np.ceil(
        n_atoms / vol * bin_vol * cell_cap_margin + 8))
    return RebuildGeom(
        mesh=tuple(mesh), axes=tuple(axes), fc=tuple(fc),
        nb=tuple(nb), open_axis=tuple(open_axis), lo=tuple(lo),
        w=tuple(w), cell_cap=cell_cap,
        cap_loc=spec.cap_loc, cap_g=tuple(spec.cap_g),
        deg_cap=spec.deg_cap, rows=spec.rows,
    )


def _pack_front(mask, *arrays):
    """Stable-pack rows with mask True to the front; returns
    (packed arrays, packed mask, count)."""
    n = mask.shape[0]
    order = jnp.argsort(~mask, stable=True)
    cnt = jnp.sum(mask.astype(jnp.int32))
    out = []
    for a in arrays:
        out.append(a[order])
    return out, mask[order], cnt


def _select_pack(mask, cap, *arrays):
    """Pack the rows where mask is True into `cap` static slots.
    Returns (packed arrays, slot mask, overflow)."""
    n = mask.shape[0]
    (idx,) = jnp.nonzero(mask, size=cap, fill_value=n)
    cnt = jnp.sum(mask.astype(jnp.int32))
    slot_ok = jnp.arange(cap) < cnt
    out = []
    for a in arrays:
        pad = jnp.zeros((1,) + a.shape[1:], a.dtype)
        ap = jnp.concatenate([a, pad], axis=0)
        out.append(
            jnp.where(
                slot_ok.reshape((cap,) + (1,) * (a.ndim - 1)),
                ap[idx], 0,
            )
        )
    return out, slot_ok, cnt > cap


class ViewState(NamedTuple):
    """Per-shard state after a device rebuild (local rows only)."""
    pos: jnp.ndarray       # (cap_loc, 3) wrapped
    vel: jnp.ndarray
    forces: jnp.ndarray
    z: jnp.ndarray         # (cap_loc,) int32
    ids: jnp.ndarray       # (cap_loc,) int32 global atom ids (-1 pad)
    loc_mask: jnp.ndarray  # (cap_loc,) float
    send_idx: tuple        # K x (2, cap_g[k]) int32
    send_mask: tuple       # K x (2, cap_g[k]) float
    shift: tuple           # K x (2, cap_g[k], 3) float
    edge_idx: jnp.ndarray  # (2, rows) int32 dense grid
    edge_mask: jnp.ndarray
    edge_rev: jnp.ndarray
    overflow: jnp.ndarray  # () bool — ANY capacity overflow (psum'd)


def make_device_rebuild(geom: RebuildGeom, cell: np.ndarray,
                        cutoff: float, axis_names):
    """Returns rebuild(pos, vel, forces, z, ids, loc_mask) -> ViewState,
    to be called INSIDE shard_map over the brick mesh."""
    from .brick import _round_up  # noqa: F401 (doc parity)

    mesh, axes, K = geom.mesh, geom.axes, len(geom.mesh)
    cell_j = jnp.asarray(cell, jnp.float32)
    inv_j = jnp.asarray(np.linalg.inv(cell), jnp.float32)
    cap_loc = geom.cap_loc
    cap_all = cap_loc + 2 * int(np.sum(geom.cap_g))
    D = geom.deg_cap
    rows = geom.rows

    def my_index(k):
        return jax.lax.axis_index(axis_names[k])

    def rebuild(pos, vel, forces, z, ids, loc_mask):
        valid = loc_mask > 0
        overflow = jnp.zeros((), bool)

        # -- 1. wrap into the box (LAMMPS pbc()) ----------------------
        f = (pos @ inv_j) % 1.0
        pos = f @ cell_j

        # -- 2. migrate per decomposed axis (LAMMPS exchange()) -------
        for k in range(K):
            P, ax = mesh[k], axes[k]
            if P == 1:
                continue
            m = my_index(k)
            f = (pos @ inv_j) % 1.0
            u = f[:, ax] * P - m
            # centered wrap: u in [-0.5, P-0.5) => delta in {-1, 0, +1}
            shifted = ((u + 0.5) % P) - 0.5
            delta = jnp.clip(jnp.floor(shifted), -1, 1).astype(jnp.int32)
            delta = jnp.where(valid, delta, 0)
            # |delta| >= 2 (an atom crossed more than one brick since
            # the last rebuild) cannot be migrated by adjacent swaps:
            # flag it. Pad rows sit at u = -m and must not trip this.
            overflow = overflow | jnp.any(
                valid & (jnp.abs(
                    shifted - jnp.clip(shifted, -1.0, 2.0)) > 0)
            )
            payload = (pos, vel, forces,
                       z.astype(jnp.float32)[:, None],
                       ids.astype(jnp.float32)[:, None])
            recv = []
            for side, d_val in ((0, -1), (1, +1)):
                sel = delta == d_val
                packed, slot_ok, ovf = _select_pack(
                    sel, geom.cap_g[k], *payload
                )
                overflow = overflow | ovf
                perm = [(i, (i + d_val) % P) for i in range(P)]
                sent = [
                    jax.lax.ppermute(a, axis_names[k], perm)
                    for a in packed
                ]
                sent_ok = jax.lax.ppermute(
                    slot_ok, axis_names[k], perm
                )
                recv.append((sent, sent_ok))
            # remove migrated rows, pack, append arrivals
            keep = valid & (delta == 0)
            arrs, keep_p, cnt = _pack_front(
                keep, pos, vel, forces, z, ids
            )
            pos, vel, forces, z, ids = arrs
            n_here = cnt
            for sent, sent_ok in recv:
                cg = geom.cap_g[k]
                rows_to = n_here + jnp.cumsum(
                    sent_ok.astype(jnp.int32)) - 1
                rows_to = jnp.where(sent_ok, rows_to, cap_loc)
                pos = pos.at[rows_to].set(sent[0], mode='drop')
                vel = vel.at[rows_to].set(sent[1], mode='drop')
                forces = forces.at[rows_to].set(sent[2], mode='drop')
                z = z.at[rows_to].set(
                    sent[3][:, 0].astype(z.dtype), mode='drop')
                ids = ids.at[rows_to].set(
                    sent[4][:, 0].astype(ids.dtype), mode='drop')
                n_arr = jnp.sum(sent_ok.astype(jnp.int32))
                overflow = overflow | (n_here + n_arr > cap_loc)
                n_here = jnp.minimum(n_here + n_arr, cap_loc)
            valid = jnp.arange(cap_loc) < n_here
        loc_mask = valid.astype(loc_mask.dtype)

        # -- 3. halo send selections (LAMMPS borders()) ---------------
        # staged: phase k selects from everything accumulated so far
        view_pos = pos
        view_valid = valid
        send_idx, send_mask, shifts = [], [], []
        for k in range(K):
            P, ax = mesh[k], axes[k]
            m = my_index(k)
            fv = view_pos @ inv_j
            if P > 1:
                # ghosts from earlier phases carry explicit shifts, so
                # fv may sit slightly outside [0,1) along THIS axis
                # only for wrapped copies; the boundary test runs in
                # brick units relative to my own index
                u = (fv[:, ax] % 1.0) * P - m
                u = ((u + 0.5) % P) - 0.5  # wrap into [-0.5, P-0.5)
            else:
                u = (fv[:, ax] % 1.0) * P - m
            fc = geom.fc[k]
            if P == 1:
                # undecomposed axis: MIC covers it (see brick.py) —
                # no self-image ghosts
                lo_sel = jnp.zeros_like(view_valid)
                hi_sel = jnp.zeros_like(view_valid)
            else:
                lo_sel = view_valid & (u < fc)
                hi_sel = view_valid & (u > 1.0 - fc)
            n_view = view_pos.shape[0]
            cg = geom.cap_g[k]
            (il,) = jnp.nonzero(lo_sel, size=cg, fill_value=n_view)
            (ih,) = jnp.nonzero(hi_sel, size=cg, fill_value=n_view)
            cl = jnp.sum(lo_sel.astype(jnp.int32))
            ch = jnp.sum(hi_sel.astype(jnp.int32))
            overflow = overflow | (cl > cg) | (ch > cg)
            ml = (jnp.arange(cg) < cl).astype(pos.dtype)
            mh = (jnp.arange(cg) < ch).astype(pos.dtype)
            si = jnp.stack([
                jnp.minimum(il, n_view - 1).astype(jnp.int32),
                jnp.minimum(ih, n_view - 1).astype(jnp.int32),
            ])
            sm = jnp.stack([ml, mh])
            # boundary-crossing shifts (receiver-local image):
            # side 0 wraps when my index is 0, side 1 when P-1
            s0 = cell_j[ax] * (m == 0).astype(pos.dtype)
            s1 = -cell_j[ax] * (m == P - 1).astype(pos.dtype)
            sh = jnp.stack([
                jnp.broadcast_to(s0, (cg, 3)),
                jnp.broadcast_to(s1, (cg, 3)),
            ])
            send_idx.append(si)
            send_mask.append(sm)
            shifts.append(sh)

            # simulate arrival to extend the view for the next phase
            send0 = (view_pos[si[0]] + sh[0]) * sm[0][:, None]
            send1 = (view_pos[si[1]] + sh[1]) * sm[1][:, None]
            from_hi = jax.lax.ppermute(
                jnp.concatenate([send0, ml[:, None]], 1),
                axis_names[k],
                [(i, (i - 1) % P) for i in range(P)],
            )
            from_lo = jax.lax.ppermute(
                jnp.concatenate([send1, mh[:, None]], 1),
                axis_names[k],
                [(i, (i + 1) % P) for i in range(P)],
            )
            view_pos = jnp.concatenate(
                [view_pos, from_hi[:, :3], from_lo[:, :3]], axis=0
            )
            view_valid = jnp.concatenate([
                view_valid, from_hi[:, 3] > 0, from_lo[:, 3] > 0,
            ])

        # -- 4. mixed-boundary cell list over the view ----------------
        nv = view_pos.shape[0]  # == cap_all
        fv = view_pos @ inv_j   # NOT wrapped: open axes need the shift
        bins_axis = []
        stencils = []
        for c in range(3):
            nb = geom.nb[c]
            if geom.open_axis[c]:
                k = {ax: i for i, ax in enumerate(axes)}[c]
                m = my_index(k)
                u = fv[:, c] * mesh[k] - m
                # wrapped ghost copies sit at u ~ -fc or ~ 1 + fc via
                # their explicit shifts; u is already receiver-local
                b = jnp.floor((u - geom.lo[c]) / geom.w[c])
                b = jnp.clip(b, 0, nb - 1).astype(jnp.int32)
                offs = (-1, 0, 1) if nb >= 2 else (0,)
                stencils.append(('open', offs))
            else:
                fw = fv[:, c] % 1.0
                b = jnp.clip((fw * nb).astype(jnp.int32), 0, nb - 1)
                offs = (-1, 0, 1) if nb >= 3 else (0,)
                stencils.append(('wrap', offs))
            bins_axis.append(b)
        nbx, nby, nbz = geom.nb
        bin_id = (bins_axis[0] * nby + bins_axis[1]) * nbz + bins_axis[2]
        bin_id = jnp.where(view_valid, bin_id, nbx * nby * nbz)
        nbins = nbx * nby * nbz

        order = jnp.argsort(bin_id)
        sorted_bins = bin_id[order]
        rank = jnp.arange(nv) - jnp.searchsorted(
            sorted_bins, sorted_bins, side='left')
        ccap = geom.cell_cap
        overflow = overflow | jnp.any(
            (rank >= ccap) & (sorted_bins < nbins))
        bins = jnp.full((nbins + 1, ccap), nv, dtype=jnp.int32)
        bins = bins.at[
            sorted_bins, jnp.clip(rank, 0, ccap - 1)
        ].set(order.astype(jnp.int32), mode='drop')

        # candidate stencil (python offsets: static unroll)
        offs = []
        for ox in stencils[0][1]:
            for oy in stencils[1][1]:
                for oz in stencils[2][1]:
                    offs.append((ox, oy, oz))
        S = len(offs)

        def nb_bin(b, c, o):
            nb = geom.nb[c]
            if o == 0:
                return b
            if geom.open_axis[c]:
                t = b + o
                oob = (t < 0) | (t >= nb)
                return jnp.where(oob, -1, t)
            return (b + o) % nb

        # candidate positions come from per-BIN component planes indexed
        # with whole-bin ROW gathers per stencil offset — per-element
        # (nv, S*ccap) scalar gathers were the dominant builder cost on
        # TPU (measured 22.5 ms vs 4.3 ms row-structured at 1k atoms in
        # the serial builder, md/neighbor.py). MIC math stays per-pair:
        # unlike the serial builder, view positions are a mixed
        # local/ghost frame that is not wrapped to a primary cell.
        pos_pad = jnp.concatenate(
            [view_pos, jnp.zeros((1, 3), view_pos.dtype)])
        xb = [pos_pad[:, c][bins] for c in range(3)]  # (nbins+1, ccap)
        valid_pad = jnp.concatenate(
            [view_valid, jnp.zeros(1, bool)])
        arange_nv = jnp.arange(nv, dtype=jnp.int32)
        ok_parts, cand_parts = [], []
        for (ox, oy, oz) in offs:
            bx = nb_bin(bins_axis[0], 0, ox)
            by = nb_bin(bins_axis[1], 1, oy)
            bz = nb_bin(bins_axis[2], 2, oz)
            oob = (bx < 0) | (by < 0) | (bz < 0)
            cb = (bx * nby + by) * nbz + bz
            cb = jnp.where(oob | ~view_valid, nbins, cb)
            cand_o = bins[cb]                         # (nv, ccap)
            d_c = [xb[c][cb] - view_pos[:, c][:, None] for c in range(3)]
            # minimum image along periodic (non-open) axes only
            g_c = [sum(d_c[b2] * inv_j[b2, a2] for b2 in range(3))
                   for a2 in range(3)]
            g_c = [
                (g - jnp.round(g)) if not geom.open_axis[a2] else g
                for a2, g in enumerate(g_c)
            ]
            w_c = [sum(g_c[b2] * cell_j[b2, a2] for b2 in range(3))
                   for a2 in range(3)]
            d2 = w_c[0] ** 2 + w_c[1] ** 2 + w_c[2] ** 2
            ok_o = (cand_o < nv) & (d2 < cutoff * cutoff)
            ok_o = ok_o & (cand_o != arange_nv[:, None])
            ok_o = ok_o & view_valid[:, None]
            # invalid view rows all land in the dump bin (row nbins),
            # which out-of-range stencil reads also return — mask any
            # candidate that is not a valid view atom
            ok_o = ok_o & valid_pad[jnp.minimum(cand_o, nv)]
            ok_parts.append(ok_o)
            cand_parts.append(cand_o)
        ok = jnp.concatenate(ok_parts, axis=1)        # (nv, S*ccap)
        cand = jnp.concatenate(cand_parts, axis=1)

        # -- 5. dense grid layout (brick.py contract, on device) ------
        flat = ok.reshape(-1)
        count = jnp.sum(flat)
        e_cap = rows
        (idx,) = jnp.nonzero(flat, size=e_cap, fill_value=0)
        gi = (idx // (S * ccap)).astype(jnp.int32)
        gj = cand.reshape(-1)[idx].astype(jnp.int32)
        evalid = flat[idx] & (jnp.arange(e_cap) < count)
        overflow = overflow | (count > e_cap)
        gi = jnp.where(evalid, gi, nv - 1)
        gj = jnp.where(evalid, gj, nv - 1)
        # rank within dst segment (gi ascending from the row-major flat)
        ckeep = jnp.cumsum(evalid)
        starts = jnp.searchsorted(gi, jnp.arange(nv))
        pref = jnp.where(starts > 0, ckeep[jnp.maximum(starts - 1, 0)], 0)
        seg_rank = (ckeep - 1) - pref[gi]
        ok_row = evalid & (seg_rank < D)
        overflow = overflow | jnp.any(evalid & (seg_rank >= D))
        grow = jnp.where(ok_row, gi * D + seg_rank, rows)
        base = jnp.minimum(
            jnp.arange(rows, dtype=jnp.int32) // D, nv - 1)
        src = base.at[grow].set(gj, mode='drop')
        emask = jnp.zeros(rows, bool).at[grow].set(True, mode='drop')
        edge_idx = jnp.stack([base, src])
        from ..ops.scatter import reverse_permutation
        rev = reverse_permutation(edge_idx)

        # global overflow consensus
        for k in range(K):
            overflow = jax.lax.pmax(
                overflow.astype(jnp.int32), axis_names[k])
        overflow = overflow > 0

        return ViewState(
            pos=pos, vel=vel, forces=forces, z=z, ids=ids,
            loc_mask=loc_mask,
            send_idx=tuple(send_idx), send_mask=tuple(send_mask),
            shift=tuple(shifts),
            edge_idx=edge_idx, edge_mask=emask.astype(pos.dtype),
            edge_rev=rev, overflow=overflow,
        )

    return rebuild
