"""Stage-by-stage compile timing of the 100k MD programs (finds which
program stalls the TPU AOT compiler). Usage:
  python tools/compile_probe_100k.py [n_atoms] [stage ...]
stages: build | compact | rev | ef   (default: build compact rev)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    # persistent compile cache: the 100k-atom programs take minutes to
    # compile; cache hits make repeat runs (and the driver bench) cheap
    from sevennet_exp_tpu.util import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from sevennet_exp_tpu.data.graph import Atoms
    from sevennet_exp_tpu.md.engine import MolecularDynamics
    from sevennet_exp_tpu.model.build import build_e3_equivariant_model
    from sevennet_exp_tpu.presets import sevennet_0_config

    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    stages = sys.argv[2:] or ['build', 'compact', 'rev']
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
    config = sevennet_0_config(species=['Na', 'Cl'])
    model = build_e3_equivariant_model(config)
    params, _ = model.init(jax.random.PRNGKey(0))
    md = MolecularDynamics(model, params, atoms, dt_fs=2.0,
                           temperature_K=300.0, ensemble='nvt',
                           rebuild_every=20, seed=0)
    print(f'n={md.n} e_cap={md.e_cap} e_model={md.e_cap_model} '
          f'deg={md.deg_cap} chunk_rows={md.conv_chunk_rows}',
          flush=True)
    pos_j = md.state.pos

    def timed(name, fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        print(f'{name}: {time.perf_counter() - t0:.1f} s '
              f'(compile+run)', flush=True)
        return out

    nl = None
    if 'build' in stages:
        nl = timed('build', jax.jit(md._build_nl), pos_j)
    if 'compact' in stages:
        if nl is None:
            nl = jax.jit(md._build_nl)(pos_j)
        from sevennet_exp_tpu.md.engine import NeighborState

        def compact_norev(nl, pos):
            out = md._compact_nl(nl, pos)
            return out._replace(rev=None)
        nl2 = timed('compact(no rev)', jax.jit(compact_norev), nl, pos_j)
    if 'rev' in stages:
        if nl is None:
            nl = jax.jit(md._build_nl)(pos_j)
        from sevennet_exp_tpu.ops.scatter import reverse_permutation
        timed('rev(lexsorts)', jax.jit(reverse_permutation), nl.edge_idx)
    if 'ef' in stages:
        full = jax.jit(lambda p: md._compact_nl(md._build_nl(p), p))
        nl3 = timed('build+compact', full, pos_j)
        timed('ef', jax.jit(md._ef_fn), pos_j, nl3)


if __name__ == '__main__':
    main()
