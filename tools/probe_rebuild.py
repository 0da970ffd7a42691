"""Decompose the 100k neighbor-rebuild cost (VERDICT r2 #1): time the
cell-list build, the grid compaction, and the candidate ops a direct
cell-list->grid builder would use (masked mega-scatter, rank cumsum,
reverse-rank gather). Decides whether to keep the Verlet intermediate.

Run on the real chip: python tools/probe_rebuild.py [n_atoms]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=5, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from sevennet_exp_tpu.util import enable_compile_cache
    enable_compile_cache()

    from sevennet_exp_tpu.data.graph import Atoms
    from sevennet_exp_tpu.md.engine import MolecularDynamics
    from sevennet_exp_tpu.md.neighbor import cell_list_neighbor_list
    from sevennet_exp_tpu.model.build import build_e3_equivariant_model
    from sevennet_exp_tpu.presets import sevennet_0_config

    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    a = 5.63
    reps = max(2, round((n_target / 8) ** (1 / 3)))
    rng = np.random.default_rng(0)
    base = np.array([
        [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],
        [0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5], [0.5, 0.5, 0.5],
    ])
    zs = [11, 11, 11, 11, 17, 17, 17, 17]
    fracs, zlist = [], []
    for i in range(reps):
        for j in range(reps):
            for k in range(reps):
                for b, z in zip(base, zs):
                    fracs.append((b + [i, j, k]) / reps)
                    zlist.append(z)
    cell = np.eye(3) * a * reps
    pos = np.array(fracs) @ cell + rng.normal(scale=0.02,
                                              size=(len(fracs), 3))
    atoms = Atoms(atomic_numbers=np.array(zlist), pos=pos, cell=cell,
                  pbc=np.array([True] * 3))
    n = len(atoms)
    print(f'n_atoms={n}')

    config = sevennet_0_config(species=['Na', 'Cl'])
    model = build_e3_equivariant_model(config)
    params, _ = model.init(jax.random.PRNGKey(0))
    md = MolecularDynamics(model, params, atoms, dt_fs=2.0,
                           temperature_K=300.0, ensemble='nvt',
                           rebuild_every=20, seed=0)
    print(f'e_cap={md.e_cap} deg_cap={md.deg_cap} grid={md.grid} '
          f'cell_cap={md.cell_cap}')
    pos_j = md.state.pos

    build = jax.jit(lambda p: md._build_nl(p))
    t = timeit(build, pos_j)
    print(f'cell-list build (Verlet): {t:8.1f} ms')

    nl = build(pos_j)
    compact = jax.jit(lambda nl, p: md._compact_nl(nl, p))
    t = timeit(compact, nl, pos_j)
    print(f'grid compaction:          {t:8.1f} ms')

    # ---- candidate ops of a direct builder --------------------------
    nx, ny, nz = md.grid
    cap = md.cell_cap
    C = 27 * cap
    D = md.deg_cap
    rows = md.e_cap_model

    @jax.jit
    def direct_parts(p):
        inv_cell = jnp.linalg.inv(md.cell)
        frac = (p @ inv_cell) % 1.0
        gx = jnp.clip((frac[:, 0] * nx).astype(jnp.int32), 0, nx - 1)
        gy = jnp.clip((frac[:, 1] * ny).astype(jnp.int32), 0, ny - 1)
        gz = jnp.clip((frac[:, 2] * nz).astype(jnp.int32), 0, nz - 1)
        bin_id = (gx * ny + gy) * nz + gz
        order = jnp.argsort(bin_id)
        sorted_bins = bin_id[order]
        rank_in_bin = jnp.zeros(n, jnp.int32).at[order].set(
            (jnp.arange(n) - jnp.searchsorted(
                sorted_bins, sorted_bins, side='left')).astype(jnp.int32)
        )
        bins = jnp.full((nx * ny * nz, cap), n, dtype=jnp.int32)
        bins = bins.at[bin_id, jnp.clip(rank_in_bin, 0, cap - 1)].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        offs = jnp.array(
            [(aa, bb, cc) for aa in (-1, 0, 1) for bb in (-1, 0, 1)
             for cc in (-1, 0, 1)], dtype=jnp.int32)
        cand_bx = (gx[:, None] + offs[None, :, 0]) % nx
        cand_by = (gy[:, None] + offs[None, :, 1]) % ny
        cand_bz = (gz[:, None] + offs[None, :, 2]) % nz
        cand_bin = (cand_bx * ny + cand_by) * nz + cand_bz
        cand = bins[cand_bin].reshape(n, C)
        pos_pad = jnp.concatenate([p, jnp.zeros((1, 3), p.dtype)])
        d_c = [pos_pad[:, axis][cand] - p[:, axis][:, None]
               for axis in range(3)]
        f_c = [sum(d_c[b2] * inv_cell[b2, a2] for b2 in range(3))
               for a2 in range(3)]
        f_c = [f - jnp.round(f) for f in f_c]
        w_c = [sum(f_c[b2] * md.cell[b2, a2] for b2 in range(3))
               for a2 in range(3)]
        d2 = w_c[0] ** 2 + w_c[1] ** 2 + w_c[2] ** 2
        rc = (md.cutoff + md.md_buffer)
        ok = (cand < n) & (d2 < rc * rc)
        ok = ok & (cand != jnp.arange(n, dtype=jnp.int32)[:, None])
        # rank within row
        rank = jnp.cumsum(ok.astype(jnp.int32), axis=1) - 1
        # reverse slot: negated stencil offset + own in-bin rank
        slot_o = jnp.arange(C, dtype=jnp.int32) // cap
        rev_slot = (26 - slot_o) * cap  # + rank_in_bin[i]
        s_rev = rev_slot[None, :] + rank_in_bin[:, None]
        k_rev = rank[cand.clip(0, n - 1), s_rev.clip(0, C - 1)]
        ok2 = ok & (rank < D) & (k_rev < D)
        row = jnp.where(ok2, jnp.arange(n, dtype=jnp.int32)[:, None] * D
                        + rank, rows)
        base_row = jnp.minimum(
            jnp.arange(rows, dtype=jnp.int32) // D, n - 1)
        src = base_row.at[row.reshape(-1)].set(
            cand.reshape(-1), mode='drop')
        rev = (jnp.arange(rows, dtype=jnp.int32)).at[
            row.reshape(-1)
        ].set((cand * D + k_rev).reshape(-1), mode='drop')
        valid = jnp.zeros(rows, bool).at[row.reshape(-1)].set(
            True, mode='drop')
        return src, rev, valid

    t = timeit(direct_parts, pos_j)
    print(f'direct grid build (all):  {t:8.1f} ms')

    src, rev, valid = [np.asarray(x) for x in direct_parts(pos_j)]
    # correctness vs the compact path
    nlc = compact(nl, pos_j)
    src_ref = np.asarray(nlc.edge_idx[1])
    val_ref = np.asarray(nlc.valid)
    print('valid agree:', bool((valid == val_ref).all()),
          int(valid.sum()), int(val_ref.sum()))
    # same multiset of neighbors per atom (order may differ)
    agree = True
    for i in rng.integers(0, n, size=200):
        s1 = np.sort(src[i * D:(i + 1) * D][valid[i * D:(i + 1) * D]])
        s2 = np.sort(src_ref[i * D:(i + 1) * D][val_ref[i * D:(i + 1) * D]])
        if not np.array_equal(s1, s2):
            agree = False
            print('mismatch at atom', i, s1, s2)
            break
    print('neighbor multisets agree (200 samples):', agree)
    # rev is an involution and maps (dst,src)->(src,dst)
    e = np.nonzero(valid)[0]
    ok_inv = (rev[rev[e]] == e).all()
    dst = np.minimum(np.arange(rows) // D, n - 1)
    ok_pair = (dst[rev[e]] == src[e]).all() and (src[rev[e]] == dst[e]).all()
    print('rev involution:', bool(ok_inv), 'rev pairs:', bool(ok_pair))


if __name__ == '__main__':
    main()
