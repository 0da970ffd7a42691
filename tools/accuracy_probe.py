"""Force-accuracy probe against the ANALYTIC classical ground truth.

Builds the bench 1k NaCl instance, computes exact E/F of the classical
potential the trained_nacl checkpoint was fitted to
(tools/gen_nacl_classical.py), and reports each execution path's force
RMSE/max against it. This is the harness that exposed the 35x accuracy
loss of TPU's default bf16 matmuls (BENCH_NOTES.md round 3) -- unlike
path-vs-path parity, it catches errors common to both paths.

Run on any backend:  python tools/accuracy_probe.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    from sevennet_exp_tpu.util import enable_compile_cache
    enable_compile_cache()

    import gen_nacl_classical as gc
    from sevennet_exp_tpu.checkpoint import SevenNetCheckpoint
    from sevennet_exp_tpu.data.graph import Atoms
    from sevennet_exp_tpu.md.engine import MolecularDynamics
    from sevennet_exp_tpu.ops import pallas_tp

    a, reps = 5.63, 5
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
           + np.random.default_rng(1).normal(scale=0.02,
                                             size=(len(fr), 3)))
    at = Atoms(atomic_numbers=np.array(zl), pos=pos, cell=cell,
               pbc=np.array([True] * 3))
    e_t, f_t, _ = gc.labels(at, 1.0)

    cp = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'trained_nacl',
        'checkpoint_best.pth.sevennet')
    model, params = SevenNetCheckpoint(cp).build_model()
    md = MolecularDynamics(model, params, at, dt_fs=2.0,
                           temperature_K=300.0, ensemble='nvt')
    nlg = jax.jit(md._compact_nl)(md._ensure_verlet(), md.state.pos)

    print(f'classical truth: E={e_t:.4f}  max|F|={np.abs(f_t).max():.4f}')
    for name, flag in (('xla', False), ('pallas', True)):
        pallas_tp.enable(flag)
        f = np.asarray(jax.jit(md._ef_fn)(md.state.pos, nlg)[1])
        d = f - f_t
        print(f'{name:8s}: F-RMSE={np.sqrt((d ** 2).mean()):.5f}  '
              f'max|dF|={np.abs(d).max():.5f}')
    pallas_tp.enable(False)


if __name__ == '__main__':
    main()
