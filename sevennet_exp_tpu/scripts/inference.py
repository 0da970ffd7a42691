"""Batch inference -> errors.txt / info.csv / per_graph.csv / per_atom.csv
(reference sevenn/scripts/inference.py:16-220). Stress in kbar
(x1602.1766208)."""

from __future__ import annotations

import csv
import os
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from .. import _keys as KEY
from .._const import KBAR_COEFF
from ..checkpoint import SevenNetCheckpoint
from ..data.dataset import expand_dataset_paths, read_structure_file
from ..data.graph import atoms_to_graph
from ..data.loader import GraphLoader


def _run_model(model, params, graphs, batch_size: int, modal=None):
    loader = GraphLoader(graphs, batch_size=batch_size)
    fn = model.jitted()
    results = []
    for batch in loader:
        if modal is not None:
            batch[KEY.MODAL_TYPE] = np.full(
                batch[KEY.NUM_ATOMS].shape, modal, dtype=np.int32
            )
        out = fn(params, {k: jnp.asarray(v) for k, v in batch.items()})
        n_graphs = int(batch[KEY.GRAPH_MASK].sum())
        node_off = 0
        e = np.asarray(out[KEY.PRED_TOTAL_ENERGY])
        f = np.asarray(out[KEY.PRED_FORCE])
        s = np.asarray(out[KEY.PRED_STRESS])
        ae = np.asarray(out[KEY.ATOMIC_ENERGY])
        for gi in range(n_graphs):
            n = int(batch[KEY.NUM_ATOMS][gi])
            results.append({
                'n_atoms': n,
                'pred_energy': float(e[gi]),
                'pred_forces': f[node_off:node_off + n].copy(),
                'pred_stress': s[gi].copy(),
                'atomic_energy': ae[node_off:node_off + n, 0].copy(),
                'z': batch[KEY.ATOMIC_NUMBERS][node_off:node_off + n].copy(),
                'pos': batch[KEY.POS][node_off:node_off + n].copy(),
                'ref_energy': float(batch[KEY.ENERGY][gi])
                if KEY.ENERGY in batch else np.nan,
                'ref_forces': np.asarray(
                    batch[KEY.FORCE][node_off:node_off + n]
                ) if KEY.FORCE in batch else np.full((n, 3), np.nan),
                'ref_stress': np.asarray(batch[KEY.STRESS][gi])
                if KEY.STRESS in batch else np.full(6, np.nan),
            })
            node_off += n
    return results


def write_inference_csv(results: List[dict], out_dir: str,
                        infos: Optional[List[dict]] = None):
    os.makedirs(out_dir, exist_ok=True)
    sfx = ['xx', 'yy', 'zz', 'xy', 'yz', 'zx']
    with open(os.path.join(out_dir, 'per_graph.csv'), 'w', newline='') as f:
        w = None
        for r in results:
            row = {
                KEY.NUM_ATOMS: r['n_atoms'],
                KEY.ENERGY: r['ref_energy'],
                KEY.PRED_TOTAL_ENERGY: r['pred_energy'],
            }
            for i, x in enumerate(sfx):
                row[f'{KEY.STRESS}_{x}'] = r['ref_stress'][i] * KBAR_COEFF
            for i, x in enumerate(sfx):
                row[f'{KEY.PRED_STRESS}_{x}'] = (
                    r['pred_stress'][i] * KBAR_COEFF
                )
            if w is None:
                w = csv.DictWriter(f, fieldnames=row.keys())
                w.writeheader()
            w.writerow(row)
    with open(os.path.join(out_dir, 'per_atom.csv'), 'w', newline='') as f:
        w = None
        for si, r in enumerate(results):
            for ai in range(r['n_atoms']):
                row = {
                    'stct_id': si, 'atom_id': ai,
                    KEY.ATOMIC_NUMBERS: int(r['z'][ai]),
                    KEY.ATOMIC_ENERGY: r['atomic_energy'][ai],
                }
                for d, x in enumerate('xyz'):
                    row[f'{KEY.POS}_{x}'] = r['pos'][ai][d]
                for d, x in enumerate('xyz'):
                    row[f'{KEY.FORCE}_{x}'] = r['ref_forces'][ai][d]
                for d, x in enumerate('xyz'):
                    row[f'{KEY.PRED_FORCE}_{x}'] = r['pred_forces'][ai][d]
                if w is None:
                    w = csv.DictWriter(f, fieldnames=row.keys())
                    w.writeheader()
                w.writerow(row)
    if infos:
        with open(os.path.join(out_dir, 'info.csv'), 'w', newline='') as f:
            keys = sorted({k for i in infos for k in i})
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            for i in infos:
                w.writerow(i)


def _errors_txt(results: List[dict], out_dir: str):
    e_res, f_res, s_res = [], [], []
    for r in results:
        if not np.isnan(r['ref_energy']):
            e_res.append(
                (r['pred_energy'] - r['ref_energy']) / r['n_atoms']
            )
        ok = ~np.isnan(r['ref_forces']).any(axis=1)
        f_res.extend((r['pred_forces'][ok] - r['ref_forces'][ok]).reshape(-1))
        if not np.isnan(r['ref_stress']).any():
            s_res.extend(
                (r['pred_stress'] - r['ref_stress']) * KBAR_COEFF
            )
    lines = []
    for name, arr, unit in (
        ('Energy', np.array(e_res), 'eV/atom'),
        ('Force', np.array(f_res), 'eV/A'),
        ('Stress', np.array(s_res), 'kbar'),
    ):
        if arr.size:
            lines.append(
                f'{name} MAE: {np.abs(arr).mean():.6f} {unit}'
            )
            lines.append(
                f'{name} RMSE: {np.sqrt((arr ** 2).mean()):.6f} {unit}'
            )
    with open(os.path.join(out_dir, 'errors.txt'), 'w') as f:
        f.write('\n'.join(lines) + '\n')


def inference(
    checkpoint: str,
    targets: List[str],
    output_dir: str = 'sevenn_infer_result',
    batch_size: int = 4,
    modal: Optional[str] = None,
    **kwargs,
):
    """Reference scripts/inference.py:119-220."""
    cp = SevenNetCheckpoint(checkpoint)
    model, params = cp.build_model()
    graphs, infos = [], []
    for path in expand_dataset_paths(list(targets)):
        for at in read_structure_file(path):
            graphs.append(
                atoms_to_graph(at, model.cutoff, allow_unlabeled=True)
            )
            info = dict(at.info or {})
            info['file'] = os.path.abspath(path)
            infos.append(info)
    modal_idx = model.modal_map.get(modal) if modal else None
    results = _run_model(model, params, graphs, batch_size, modal_idx)
    write_inference_csv(results, output_dir, infos)
    _errors_txt(results, output_dir)
    return results
