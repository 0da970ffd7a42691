"""Domain-decomposed MD throughput harness.

Runs the same NaCl system through the serial engine and the brick
engine over an N-device mesh and reports steps/s for each plus the
parallel efficiency. On this dev rig it runs on virtual CPU devices
(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8),
where the absolute numbers mean little but the comm/compute structure
(SEVENNET_PRINT_COMM=1) and correctness hold; on a real TPU pod slice
the SAME script produces the multi-chip ns/day numbers (the north-star
configuration is ~100k atoms on v5e-8).

Usage: python tools/bench_parallel.py [n_atoms] [mesh e.g. 2,2,2]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    # the axon TPU plugin rewrites jax_platforms at import time; honor
    # an explicit JAX_PLATFORMS=cpu request (cf. tests/conftest.py)
    if os.environ.get('JAX_PLATFORMS') == 'cpu':
        jax.config.update('jax_platforms', 'cpu')

    from sevennet_exp_tpu.util import enable_compile_cache
    enable_compile_cache()

    from sevennet_exp_tpu.checkpoint import SevenNetCheckpoint
    from sevennet_exp_tpu.data.graph import Atoms
    from sevennet_exp_tpu.md.engine import MolecularDynamics
    from sevennet_exp_tpu.parallel.mdbrick import BrickMolecularDynamics

    # NOTE on the dev rig (virtual CPU devices) the flagship model
    # compiles for MINUTES per engine at >=4k atoms; 1k is the largest
    # size that turns around quickly. Pod runs use the real sizes.
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    mesh = (tuple(int(v) for v in sys.argv[2].split(','))
            if len(sys.argv) > 2 else (2, 2, 2))
    n_dev = int(np.prod(mesh))
    assert len(jax.devices()) >= n_dev, (
        f'need {n_dev} devices, have {len(jax.devices())}'
    )

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
    print(f'{len(at)} atoms, mesh {mesh} ({n_dev} devices), '
          f'backend {jax.default_backend()}')

    cp = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'trained_nacl',
        'checkpoint_best.pth.sevennet')
    if '--tiny' in sys.argv:
        # rig-smoke mode: the flagship's 8-device CPU compile is so
        # slow that XLA's 40 s collective rendezvous can time out
        # under compile contention; the tiny config exercises the
        # same engine/comm structure in seconds
        import jax.numpy as jnp

        from sevennet_exp_tpu.model.build import (
            build_e3_equivariant_model,
        )
        from sevennet_exp_tpu.presets import sevennet_0_config
        cfg = sevennet_0_config(species=['Na', 'Cl'])
        cfg['irreps_manual'] = ['8x0e', '8x0e+4x1e', '8x0e+4x1e',
                                '8x0e']
        cfg['num_convolution_layer'] = 3
        cfg['lmax'] = 1
        cfg['shift'], cfg['scale'] = 0.0, 0.01
        model = build_e3_equivariant_model(cfg)
        params, _ = model.init(jax.random.PRNGKey(0))
    elif os.path.exists(cp):
        model, params = SevenNetCheckpoint(cp).build_model()
    else:
        from sevennet_exp_tpu.model.build import (
            build_e3_equivariant_model,
        )
        from sevennet_exp_tpu.presets import sevennet_0_config
        cfg = sevennet_0_config(species=['Na', 'Cl'])
        cfg['shift'], cfg['scale'] = 0.0, 0.01
        model = build_e3_equivariant_model(cfg)
        params, _ = model.init(jax.random.PRNGKey(0))

    n_steps = 40

    def run(md, label):
        pos_ref = lambda: getattr(md, 'state', md).pos
        md.run(n_steps)                      # compile + settle caps
        jax.block_until_ready(pos_ref())
        t0 = time.perf_counter()
        md.run(n_steps)
        jax.block_until_ready(pos_ref())
        dt = (time.perf_counter() - t0) / n_steps
        ns_day = 2.0 * 1e-6 * 86400.0 / dt
        print(f'{label:22s}: {dt * 1e3:9.2f} ms/step '
              f'({ns_day:8.3f} ns/day)')
        return dt

    serial = MolecularDynamics(
        model, params, at, dt_fs=2.0, temperature_K=300.0,
        ensemble='nvt', rebuild_every=20, seed=0,
    )
    t_s = run(serial, 'serial (1 device)')

    brick = BrickMolecularDynamics(
        model, params, at, mesh_shape=mesh, ensemble='nvt',
        temperature_K=300.0, rebuild_every=20, seed=0,
    )
    t_p = run(brick, f'brick {mesh}')
    print(f'parallel efficiency  : {t_s / (t_p * n_dev) * 100:5.1f}% '
          f'(speedup {t_s / t_p:.2f}x on {n_dev} devices)')

    # ---- halo-volume accounting + v5e-8 ICI budget projection --------
    import json
    stats = brick.comm_stats()
    # v5e: each chip has 4 ICI links; a 3-D brick mesh uses one
    # bidirectional link pair per mesh axis. Effective per-link
    # bandwidth ~45 GB/s/direction (v5e ICI per the public TPU
    # scaling-book numbers: 1600 Gbps aggregate across 4 links);
    # halo phases along different axes serialize (staged swap
    # pattern), so the wire time is the SUM over phases.
    ici_bw = 45e9
    widths = stats['layer_widths']
    itemsize = 4
    # per phase: fwd feature refresh per layer + the bwd replay; both
    # move (2, cap_g, width); positions move (2, cap_g, 3) once
    t_wire = 0.0
    for cg in stats['cap_g']:
        t_wire += 2 * cg * 3 * itemsize / ici_bw
        for w in widths:
            t_wire += 2 * (2 * cg * w * itemsize) / ici_bw
    proj = dict(
        metric='brick_md_halo_accounting',
        n_atoms=len(at),
        mesh=stats['mesh'],
        ms_per_step_serial=t_s * 1e3,
        ms_per_step_brick=t_p * 1e3,
        parallel_efficiency=t_s / (t_p * n_dev),
        halo_MB_per_force_call_per_device=(
            stats['bytes_force_call'] / 1e6),
        cap_g=stats['cap_g'],
        layer_widths=widths,
        projected_ici_ms_per_step_v5e=t_wire * 1e3,
        backend=jax.default_backend(),
    )
    print(json.dumps(proj))


if __name__ == '__main__':
    main()
