"""Dump the brick engine's halo-exchange accounting WITHOUT stepping.

Construction of BrickMolecularDynamics is host-side (decompose_brick is
numpy; _push_state is plain device transfers), so the per-phase ghost
capacities, send counts, and payload volumes — the analog of the
reference's SEVENN_PRINT_INFO per-rank comm dumps
(pair_e3gnn_parallel.cpp:87-93,441-455,807-815) — are available for any
system size in seconds, even on the single-core dev rig where actually
*stepping* the flagship at 97k would take hours per compile.

Also prints the v5e ICI wire-time projection for the constructed
decomposition (same model as tools/bench_parallel.py): per-phase
ppermute payloads at 45 GB/s/direction effective per-link bandwidth,
phases serialized (staged swap pattern).

Usage: python tools/comm_stats_dump.py [n_atoms] [mesh e.g. 2,2,2]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    if os.environ.get('JAX_PLATFORMS') == 'cpu':
        jax.config.update('jax_platforms', 'cpu')

    from sevennet_exp_tpu.checkpoint import SevenNetCheckpoint
    from sevennet_exp_tpu.data.graph import Atoms
    from sevennet_exp_tpu.parallel.mdbrick import BrickMolecularDynamics

    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    mesh = (tuple(int(v) for v in sys.argv[2].split(','))
            if len(sys.argv) > 2 else (2, 2, 2))

    a = 5.63
    reps = max(4, round((n_target / 8) ** (1 / 3)))
    base = np.array([
        [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],
        [0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5], [0.5, 0.5, 0.5],
    ])
    zs = [11] * 4 + [17] * 4
    fr, zl = [], []
    for i in range(reps):
        for j in range(reps):
            for k in range(reps):
                for b, z in zip(base, zs):
                    fr.append((b + [i, j, k]) / reps)
                    zl.append(z)
    cell = np.eye(3) * a * reps
    pos = (np.array(fr) @ cell
           + np.random.default_rng(0).normal(scale=0.02,
                                             size=(len(fr), 3)))
    at = Atoms(atomic_numbers=np.array(zl), pos=pos, cell=cell,
               pbc=np.array([True] * 3))

    cp = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'trained_nacl',
        'checkpoint_best.pth.sevennet')
    model, params = SevenNetCheckpoint(cp).build_model()

    brick = BrickMolecularDynamics(
        model, params, at, mesh_shape=mesh, ensemble='nvt',
        temperature_K=300.0, rebuild_every=20, seed=0,
    )
    stats = brick.comm_stats()

    # v5e ICI projection (same model/constants as bench_parallel.py)
    ici_bw = 45e9
    itemsize = 4
    widths = stats['layer_widths']
    t_wire = 0.0
    for cg in stats['cap_g']:
        t_wire += 2 * cg * 3 * itemsize / ici_bw
        for w in widths:
            t_wire += 2 * (2 * cg * w * itemsize) / ici_bw
    out = dict(
        n_atoms=len(at),
        chunk_rows=int(brick.conv_chunk_rows),
        projected_ici_ms_per_force_call_v5e=t_wire * 1e3,
        **stats,
    )
    print(json.dumps(out))


if __name__ == '__main__':
    main()
