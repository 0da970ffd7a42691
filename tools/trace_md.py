"""Capture a jax.profiler device trace of the MD force call and print the
top ops by total self-duration. Usage: python tools/trace_md.py [n_atoms].

Parses the XSpace protobuf written under /tmp/sevennet_trace using
tensorboard_plugin_profile's bundled proto definitions.
"""

import glob
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(n_target=1000, trace_dir='/tmp/sevennet_trace'):
    import jax
    import jax.numpy as jnp

    from sevennet_exp_tpu.data.graph import Atoms
    from sevennet_exp_tpu.md.engine import MolecularDynamics
    from sevennet_exp_tpu.model.build import build_e3_equivariant_model
    from sevennet_exp_tpu.presets import sevennet_0_config

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

    config = sevennet_0_config(species=['Na', 'Cl'])
    model = build_e3_equivariant_model(config)
    params, _ = model.init(jax.random.PRNGKey(0))
    md = MolecularDynamics(model, params, atoms, dt_fs=2.0,
                           temperature_K=300.0, ensemble='nvt',
                           rebuild_every=20, seed=0)
    pos_j = md.state.pos
    build = jax.jit(lambda p: md._compact_nl(md._build_nl(p), p))
    nl = build(pos_j)
    ef = jax.jit(md._ef_fn)
    out = ef(pos_j, nl)
    jax.block_until_ready(out)

    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = ef(pos_j, nl)
        jax.block_until_ready(out)
    print('trace captured to', trace_dir)


def analyze(trace_dir='/tmp/sevennet_trace', top=45):
    import gzip
    import json

    paths = glob.glob(os.path.join(
        trace_dir, 'plugins/profile/*/*.trace.json.gz'))
    if not paths:
        print('no trace.json.gz found under', trace_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, 'rt') as f:
        trace = json.load(f)
    events = trace.get('traceEvents', [])
    # pid/tid -> track name
    track = {}
    for ev in events:
        if ev.get('ph') == 'M' and ev.get('name') == 'process_name':
            track[ev['pid']] = ev['args'].get('name', str(ev['pid']))
    dur = defaultdict(float)
    cnt = defaultdict(int)
    for ev in events:
        if ev.get('ph') != 'X':
            continue
        pname = track.get(ev['pid'], str(ev['pid']))
        if 'TPU' not in pname and 'tpu' not in pname:
            continue
        name = ev.get('name', '?')
        dur[(pname, name)] += ev.get('dur', 0) / 1e3  # us -> ms
        cnt[(pname, name)] += 1
    by_track = defaultdict(float)
    for (pname, name), d in dur.items():
        by_track[pname] += d
    for pname, total in sorted(by_track.items(), key=lambda kv: -kv[1]):
        print(f'== track {pname}: total {total:.2f} ms')
    items = sorted(dur.items(), key=lambda kv: -kv[1])[:top]
    for (pname, name), d in items:
        print(f'  {d:9.3f} ms x{cnt[(pname, name)]:4d}  {name[:120]}')


if __name__ == '__main__':
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    if len(sys.argv) > 2 and sys.argv[2] == 'analyze':
        analyze()
    else:
        capture(n)
        analyze()
