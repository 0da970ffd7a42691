"""Per-phase timing breakdown for the 7net-0 MD step (VERDICT r1 item 2c).

Prints ms for: neighbor build+compact, energy forward only, energy+force
(fwd+bwd), full NVT step, and the bench-equivalent chunk step. Run on the
real chip:  python tools/profile_md.py [n_atoms]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20, warmup=3):
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

    # persistent compile cache: the 100k-atom programs take minutes to
    # compile; cache hits make repeat runs (and the driver bench) cheap
    from sevennet_exp_tpu.util import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from sevennet_exp_tpu.data.graph import Atoms
    from sevennet_exp_tpu.md.engine import MolecularDynamics
    from sevennet_exp_tpu.model.build import build_e3_equivariant_model
    from sevennet_exp_tpu.presets import sevennet_0_config

    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
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
    pos = np.array(fracs) @ cell + rng.normal(scale=0.02, size=(len(fracs), 3))
    atoms = Atoms(atomic_numbers=np.array(zlist), pos=pos, cell=cell,
                  pbc=np.array([True] * 3))
    print(f'n_atoms={len(atoms)}')

    config = sevennet_0_config(species=['Na', 'Cl'])
    model = build_e3_equivariant_model(config)
    params, _ = model.init(jax.random.PRNGKey(0))

    md = MolecularDynamics(model, params, atoms, dt_fs=2.0,
                           temperature_K=300.0, ensemble='nvt',
                           rebuild_every=20, seed=0)
    print(f'e_cap={md.e_cap} e_cap_model={md.e_cap_model}')

    pos_j = md.state.pos

    build = jax.jit(lambda p: md._compact_nl(md._build_nl(p), p))
    nl = build(pos_j)
    t_build = timeit(build, pos_j)
    print(f'neighbor build+compact: {t_build:.2f} ms')

    e_only = jax.jit(lambda p, nl: md._energy_fn(p, nl))
    t_fwd = timeit(e_only, pos_j, nl)
    print(f'energy forward only:    {t_fwd:.2f} ms')

    ef = jax.jit(md._ef_fn)
    t_ef = timeit(ef, pos_j, nl)
    print(f'energy+forces (f+b):    {t_ef:.2f} ms  (bwd ~ {t_ef - t_fwd:.2f})')

    step = md._make_step()
    sstep = jax.jit(lambda s, nl: step(s, nl))
    t_step = timeit(sstep, md.state, nl)
    print(f'one NVT step:           {t_step:.2f} ms')

    # sustained: through run() so the dispatch policy (chunked scans
    # vs step-wise for watchdog-bound systems) matches production
    k = md.rebuild_every
    n_meas = max(k, min(200, md.max_outer_per_dispatch * k))
    md.run(n_meas)  # warm the run-path jits
    jax.block_until_ready(md.state.pos)
    t0 = time.perf_counter()
    md.run(n_meas)
    jax.block_until_ready(md.state.pos)
    t_chunk = (time.perf_counter() - t0) * 1e3
    per_step = t_chunk / n_meas
    print(f'run({n_meas} steps):   {t_chunk:.1f} ms -> '
          f'{per_step:.2f} ms/step')
    ns_day = (1.0 / (per_step / 1e3)) * 2.0 * 1e-6 * 86400
    print(f'=> {ns_day:.2f} ns/day at dt=2fs')


if __name__ == '__main__':
    main()
