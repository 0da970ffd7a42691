"""Replicate bench.py's 100k parity probe (the ersatz 1k instance built
from the 100k lattice's first 1000 sites) and A/B the fused-kernel CG
modes against the XLA path on the current backend.

Run: python tools/probe_parity100k.py [n_target]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from sevennet_exp_tpu.util import enable_compile_cache
    enable_compile_cache()

    from sevennet_exp_tpu.data.graph import Atoms
    from sevennet_exp_tpu.md.engine import MolecularDynamics
    from sevennet_exp_tpu.model.build import build_e3_equivariant_model
    from sevennet_exp_tpu.ops import pallas_conv, pallas_tp
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
    pos = np.array(fracs) @ cell
    pos += rng.normal(scale=0.02, size=pos.shape)

    config = sevennet_0_config(species=['Na', 'Cl'])
    config['shift'] = 0.0
    config['scale'] = 0.01
    model = build_e3_equivariant_model(config)
    params, _ = model.init(jax.random.PRNGKey(0))

    md_p = MolecularDynamics(
        model, params, Atoms(
            atomic_numbers=np.array(zlist[:1000]),
            pos=pos[:1000] % (a * 5), cell=np.eye(3) * a * 5,
            pbc=np.array([True] * 3)),
        dt_fs=2.0, temperature_K=30.0, ensemble='nvt',
    )
    verlet = md_p._ensure_verlet()
    nlg = jax.jit(md_p._compact_nl)(verlet, md_p.state.pos)
    print('e_cap', md_p.e_cap, 'deg_cap', md_p.deg_cap,
          'chunk', md_p.conv_chunk_rows)

    pallas_tp.enable(False)
    e0, f0 = jax.jit(md_p._ef_fn)(md_p.state.pos, nlg)
    f0 = np.asarray(f0)
    print(f'xla:  E={float(e0):.6f}  max|F|={np.abs(f0).max():.4f}')

    pallas_tp.enable(True)
    for mode in ('cmshared', 'terms'):
        pallas_conv.set_cg_mode(mode)
        md_p._sw_key = None  # drop any cached fns
        e1, f1 = jax.jit(md_p._ef_fn)(md_p.state.pos, nlg)
        f1 = np.asarray(f1)
        print(f'{mode:10s}: dE={abs(float(e1) - float(e0)):.3e}  '
              f'max|dF|={np.abs(f1 - f0).max():.3e}')


if __name__ == '__main__':
    main()
