"""Dump the compiled HLO of the MD force program and print the body of
the named fusions (to attribute trace time to actual ops).

Usage: python tools/hlo_fusions.py [n_atoms] [fusion-name ...]
With no fusion names, prints a one-line summary (op histogram) of every
fusion computation, largest first by instruction count.
"""

import os
import re
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from sevennet_exp_tpu.data.graph import Atoms
    from sevennet_exp_tpu.md.engine import MolecularDynamics
    from sevennet_exp_tpu.model.build import build_e3_equivariant_model
    from sevennet_exp_tpu.presets import sevennet_0_config

    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    names = sys.argv[2:]
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
    txt = jax.jit(md._ef_fn).lower(pos_j, nl).compile().as_text()
    with open('/tmp/ef_hlo.txt', 'w') as f:
        f.write(txt)
    print(f'HLO written to /tmp/ef_hlo.txt ({len(txt)} chars)')

    # split into computations
    comps = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r'%?([\w.\-]+)\s*(\([^)]*\).*)?\{\s*$', line.strip())
        if line.startswith('ENTRY') or (m and '{' in line
                                        and not line.startswith(' ')):
            cur = line.strip().split()[0].lstrip('%')
            comps[cur] = []
        elif cur is not None:
            comps[cur].append(line)

    if names:
        for nm in names:
            for key in comps:
                if nm in key:
                    print(f'===== {key} =====')
                    print('\n'.join(comps[key][:120]))
                    break
        return

    # find the entry's fusion instructions and their called computations
    entry = None
    for k in comps:
        if 'main' in k or 'ENTRY' in k:
            entry = k
    rows = []
    for key, lines in comps.items():
        ops = Counter()
        for ln in lines:
            m = re.match(r'\s*%?[\w.\-]+\s*=\s*\S+\s+(\w+)', ln)
            if m:
                ops[m.group(1)] += 1
        # biggest shapes in the computation
        shapes = re.findall(r'f32\[([\d,]+)\]', '\n'.join(lines))
        big = sorted(
            (np.prod([int(x) for x in s.split(',')]) for s in shapes),
            reverse=True,
        )[:1]
        rows.append((sum(ops.values()), key, ops.most_common(6),
                     big[0] if big else 0))
    rows.sort(reverse=True)
    for cnt, key, common, big in rows[:40]:
        print(f'{key:45s} n_ops={cnt:4d} max_elems={big:>12,} {common}')


if __name__ == '__main__':
    main()
