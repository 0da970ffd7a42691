"""Training tests (reference tests/unit_tests/test_train.py analog):
loss decreases over steps, metrics record, NaN-label masking, and the
data-parallel shard_map step on the 8-device CPU mesh (the reference's
DDP has no automated test; we test DP == single-device)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

import sevennet_exp_tpu._keys as KEY
from sevennet_exp_tpu.data.graph import atoms_to_graph, collate_graphs
from sevennet_exp_tpu.model.build import build_e3_equivariant_model
from sevennet_exp_tpu.train.error_recorder import ErrorRecorder
from sevennet_exp_tpu.train.trainer import Trainer

from samples import rattled_rocksalt, tiny_model_config

CFG_OVER = {'cutoff': 3.5, 'channel': 4, 'lmax': 1,
            'num_convolution_layer': 2}


def _labeled_graphs(model, params, n=4):
    """Teacher-labeled structures (self-consistent learnable target)."""
    graphs = []
    for s in range(n):
        at = rattled_rocksalt(reps=1, a=5.2, rattle=0.08, seed=s)
        g0 = {**atoms_to_graph_like(at, model.cutoff)}
        graphs.append(g0)
    # label with teacher outputs
    out_graphs = []
    for g in graphs:
        b = collate_graphs([g], n_edge=512)
        out = model.jitted()(params, {k: jnp.asarray(v) for k, v in b.items()})
        n_at = int(g[KEY.NUM_ATOMS])
        g[KEY.ENERGY] = float(np.asarray(out[KEY.PRED_TOTAL_ENERGY])[0])
        g[KEY.FORCE] = np.asarray(out[KEY.PRED_FORCE])[:n_at]
        g[KEY.STRESS] = np.asarray(out[KEY.PRED_STRESS])[:1]
        g[KEY.PER_ATOM_ENERGY] = g[KEY.ENERGY] / n_at
        out_graphs.append(g)
    return out_graphs


def atoms_to_graph_like(at, cutoff):
    at.energy = 0.0
    at.forces = np.zeros((len(at), 3))
    at.stress = np.zeros(6)
    return atoms_to_graph(at, cutoff)


def _setup():
    config = tiny_model_config(CFG_OVER)
    config.update({
        'loss': 'mse', 'optimizer': 'adam', 'optim_param': {'lr': 0.005},
        'scheduler': 'exponentiallr', 'scheduler_param': {'gamma': 0.99},
        'force_loss_weight': 0.5, 'stress_loss_weight': 1e-4,
        'is_train_stress': True,
        'error_record': [['Energy', 'RMSE'], ['Force', 'RMSE'],
                         ['Stress', 'RMSE'], ['Energy', 'MAE'],
                         ['TotalLoss', 'None']],
    })
    model = build_e3_equivariant_model(config)
    t_params, _ = model.init(jax.random.PRNGKey(7))   # teacher
    s_params, s_mask = model.init(jax.random.PRNGKey(8))  # student
    graphs = _labeled_graphs(model, t_params, n=4)
    return config, model, s_params, s_mask, graphs


def test_loss_decreases_and_metrics():
    config, model, params, mask, graphs = _setup()
    trainer = Trainer(model, params, mask, config)
    batch = collate_graphs(graphs, n_node=16, n_edge=1024, n_graph=5)

    losses = []
    for epoch in range(12):
        rec = ErrorRecorder.from_config(config)
        trainer.run_one_epoch([batch], is_train=True, error_recorder=rec)
        vals = rec.epoch_forward()
        losses.append(vals['TotalLoss'])
        trainer.scheduler_step()
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses
    assert 'Energy_RMSE' in vals and np.isfinite(vals['Energy_RMSE'])
    assert trainer.get_lr() < 0.005  # scheduler acted


def test_nan_label_masking():
    config, model, params, mask, graphs = _setup()
    # strip stress labels -> NaN; loss must stay finite
    for g in graphs:
        g[KEY.STRESS] = np.full((1, 6), np.nan)
    trainer = Trainer(model, params, mask, config)
    batch = collate_graphs(graphs, n_node=16, n_edge=1024, n_graph=5)
    rec = ErrorRecorder.from_config(config)
    trainer.run_one_epoch([batch], is_train=True, error_recorder=rec)
    vals = rec.epoch_forward()
    assert np.isfinite(vals['TotalLoss'])
    assert np.isnan(vals['Stress_RMSE'])  # nothing labeled


def test_dp_matches_single_device():
    config, model, params, mask, graphs = _setup()
    n_dev = len(jax.devices())
    assert n_dev == 8

    # one batch per device (same caps); replicate 4 graphs over 8 shards
    shard_batches = [
        collate_graphs([graphs[i % len(graphs)]], n_node=8, n_edge=512)
        for i in range(n_dev)
    ]
    stacked = {
        k: np.stack([b[k] for b in shard_batches])
        for k in shard_batches[0]
    }

    mesh = Mesh(np.array(jax.devices()), ('dp',))
    tr_dp = Trainer(model, params, mask, config, mesh=mesh)
    p_dp, o_dp, stats = tr_dp._train_step_dp(
        tr_dp.params, tr_dp.opt_state,
        {k: jnp.asarray(v) for k, v in stacked.items()},
    )

    # single-device equivalent: mean of per-shard grads == grad of mean loss
    tr_1 = Trainer(model, params, mask, config)
    import jax as _jax

    def loss_mean(p):
        tot = 0.0
        for b in shard_batches:
            l, _ = tr_1._loss_fn(p, {k: jnp.asarray(v) for k, v in b.items()})
            tot = tot + l
        return tot / n_dev

    g_ref = _jax.grad(loss_mean)(params)
    updates, _ = tr_1.tx.update(
        _jax.tree_util.tree_map(
            lambda g, m: g if m else jnp.zeros_like(g), g_ref, mask
        ),
        tr_1.opt_state, params,
    )
    p_ref = _jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    flat_dp = jax.tree_util.tree_leaves(p_dp)
    flat_ref = jax.tree_util.tree_leaves(p_ref)
    for a, b in zip(flat_dp, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5
        )


def test_combined_metric():
    """CombinedError analog (reference error_recorder.py:261-288): a
    weighted sum of other metrics, derived at read time with no batch
    statistics of its own."""
    import jax.numpy as jnp

    from sevennet_exp_tpu.train.error_recorder import (
        MetricSpec, batch_metric_stats,
    )

    specs = [
        MetricSpec('Energy', 'RMSE', 'Energy_RMSE'),
        MetricSpec('Force', 'RMSE', 'Force_RMSE'),
        MetricSpec('', 'None', 'Weighted',
                   combine=(('Energy_RMSE', 1.0), ('Force_RMSE', 0.1))),
    ]
    rec = ErrorRecorder(specs)
    import sevennet_exp_tpu._keys as KEY
    data = {
        KEY.PRED_TOTAL_ENERGY: jnp.array([1.0]),
        KEY.ENERGY: jnp.array([0.0]),
        KEY.NUM_ATOMS: jnp.array([2]),
        KEY.GRAPH_MASK: jnp.array([1.0]),
        KEY.PRED_FORCE: jnp.array([[2.0, 0.0, 0.0], [0.0, 0.0, 0.0]]),
        KEY.FORCE: jnp.zeros((2, 3)),
        KEY.NODE_MASK: jnp.array([1.0, 1.0]),
    }
    stats = batch_metric_stats(specs, data)
    assert 'Weighted' not in stats  # no stats of its own
    rec.update(stats)
    e = rec.get('Energy_RMSE')
    f = rec.get('Force_RMSE')
    np.testing.assert_allclose(rec.get('Weighted'), e + 0.1 * f,
                               rtol=1e-12)


def test_loader_shard_stripes():
    """Multi-host data contract (parallel/distributed.py): shards use
    identical capacities/permutation and stripe the batches."""
    from sevennet_exp_tpu.data.loader import GraphLoader

    config, model, params, mask, graphs = _setup()
    graphs = graphs * 3  # 12 graphs -> 6 batches of 2
    full = GraphLoader(graphs, batch_size=2, shuffle=True, seed=7)
    s0 = GraphLoader(graphs, batch_size=2, shuffle=True, seed=7,
                     shard=(0, 2))
    s1 = GraphLoader(graphs, batch_size=2, shuffle=True, seed=7,
                     shard=(1, 2))
    assert (s0.n_node, s0.n_edge) == (full.n_node, full.n_edge)
    b_full = list(full)
    b0, b1 = list(s0), list(s1)
    assert len(b0) + len(b1) == len(b_full) == 6
    assert len(s0) == len(b0) and len(s1) == len(b1)
    # stripes partition the full sequence (same seed -> same perm)
    for i, b in enumerate(b_full):
        src = b0[i // 2] if i % 2 == 0 else b1[i // 2]
        np.testing.assert_array_equal(b[KEY.ATOMIC_NUMBERS],
                                      src[KEY.ATOMIC_NUMBERS])


def test_dp_epoch_loop():
    """run_one_epoch with a 'dp' mesh groups device-count batches into
    one shard_map step; metrics land in the recorder."""
    config, model, params, mask, graphs = _setup()
    n_dev = len(jax.devices())
    batches = [
        collate_graphs([graphs[i % len(graphs)]], n_node=8, n_edge=512)
        for i in range(2 * n_dev + 3)  # two full groups + dropped tail
    ]
    mesh = Mesh(np.array(jax.devices()), ('dp',))
    tr = Trainer(model, params, mask, config, mesh=mesh)
    rec = ErrorRecorder.from_config(config)
    tr.run_one_epoch(batches, is_train=True, error_recorder=rec)
    vals = rec.epoch_forward()
    assert np.isfinite(vals['TotalLoss'])


def test_distributed_detect_env(monkeypatch):
    """Launch-environment detection (the torchrun/OMPI env analog,
    reference main/sevenn.py:59-76)."""
    from sevennet_exp_tpu.parallel import distributed as dist

    for var in ('JAX_COORDINATOR_ADDRESS', 'TPU_WORKER_HOSTNAMES',
                'MEGASCALE_COORDINATOR_ADDRESS', 'SLURM_JOB_NUM_NODES',
                'OMPI_COMM_WORLD_SIZE'):
        monkeypatch.delenv(var, raising=False)
    assert dist.detect_launch_env() is None
    assert dist.maybe_initialize() is False  # single-process no-op

    monkeypatch.setenv('SLURM_JOB_NUM_NODES', '1')
    assert dist.detect_launch_env() is None
    monkeypatch.setenv('SLURM_JOB_NUM_NODES', '4')
    assert dist.detect_launch_env() == 'slurm'
    monkeypatch.setenv('OMPI_COMM_WORLD_SIZE', '2')
    monkeypatch.delenv('SLURM_JOB_NUM_NODES')
    assert dist.detect_launch_env() == 'ompi'
    monkeypatch.setenv('JAX_COORDINATOR_ADDRESS', 'h0:1234')
    assert dist.detect_launch_env() == 'explicit'
