"""Trainer: jitted train/eval steps, optional data-parallel shard_map.

Replaces the reference Trainer (sevenn/train/trainer.py:20-230): instead of
DDP-wrapped modules and implicit gradient all-reduce, the whole
forward+loss+grad+update is one XLA program; under data parallelism the
batch carries a leading device axis, shard_map shards it over the 'dp'
mesh axis and gradients/metrics are pmean/psum-reduced over ICI.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import _keys as KEY
from ..model.model import SevenNetModel
from .error_recorder import ErrorRecorder, MetricSpec, batch_metric_stats
from .loss import loss_functions_from_config, total_loss
from .optim import Scheduler, optim_dict


def _masked_grads(grads, mask):
    if mask is None:
        return grads
    return jax.tree_util.tree_map(
        lambda g, m: g if m else jnp.zeros_like(g), grads, mask
    )


def set_lr(opt_state, lr: float):
    try:
        opt_state.hyperparams['learning_rate'] = jnp.asarray(
            lr, dtype=jnp.float32
        )
    except AttributeError:
        pass
    return opt_state


class Trainer:
    """from_config mirrors reference trainer.py:82-104."""

    def __init__(
        self,
        model: SevenNetModel,
        params,
        trainable_mask=None,
        config: Optional[Dict[str, Any]] = None,
        mesh: Optional[Mesh] = None,
    ):
        config = config or {}
        self.model = model
        self.params = params
        self.trainable_mask = trainable_mask
        self.config = config
        self.criterion, self.loss_specs = loss_functions_from_config(config)

        lr = float(config.get(KEY.OPTIM_PARAM, {}).get('lr', 0.01))
        optim_name = config.get(KEY.OPTIMIZER, 'adam').lower()
        optim_args = {
            k: v for k, v in config.get(KEY.OPTIM_PARAM, {}).items()
            if k != 'lr'
        }
        self.tx = optim_dict[optim_name](lr, **optim_args)
        self.opt_state = self.tx.init(params)
        self.scheduler = Scheduler(
            config.get(KEY.SCHEDULER, 'constant'), lr,
            **config.get(KEY.SCHEDULER_PARAM, {}),
        )
        self.mesh = mesh
        self.metrics: List[MetricSpec] = ErrorRecorder.from_config(
            config
        ).metrics

    @staticmethod
    def from_config(model, params, trainable_mask, config,
                    mesh: Optional[Mesh] = None) -> 'Trainer':
        return Trainer(model, params, trainable_mask, config, mesh)

    # -- pure step functions -------------------------------------------
    def _loss_fn(self, params, batch):
        from ..ops import pallas_tp
        with pallas_tp.disabled():  # 2nd-order grads need the XLA path
            out = self.model.apply(params, batch)
        tot, parts = total_loss(self.criterion, self.loss_specs, out)
        stats = batch_metric_stats(self.metrics, out, tot)
        return tot, stats

    @functools.cached_property
    def _train_step(self):
        def step(params, opt_state, batch):
            (loss, stats), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True
            )(params, batch)
            grads = _masked_grads(grads, self.trainable_mask)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(
                lambda p, u: p + u.astype(p.dtype), params, updates
            )
            return params, opt_state, stats

        return jax.jit(step, donate_argnums=(0, 1))

    @functools.cached_property
    def _eval_step(self):
        def step(params, batch):
            _, stats = self._loss_fn(params, batch)
            return stats

        return jax.jit(step)

    @functools.cached_property
    def _train_step_dp(self):
        """Data-parallel step: batch has leading 'dp' device axis."""
        assert self.mesh is not None
        mesh = self.mesh
        from jax import shard_map

        def step(params, opt_state, batch):
            def shard_fn(params, opt_state, batch):
                batch = jax.tree_util.tree_map(
                    lambda x: x.reshape(x.shape[1:]) if x.shape[0] == 1
                    else x.squeeze(0), batch
                )
                (loss, stats), grads = jax.value_and_grad(
                    self._loss_fn, has_aux=True
                )(params, batch)
                grads = jax.lax.pmean(grads, 'dp')
                stats = jax.tree_util.tree_map(
                    lambda s: jax.lax.psum(s, 'dp'), stats
                )
                grads = _masked_grads(grads, self.trainable_mask)
                updates, opt_state = self.tx.update(
                    grads, opt_state, params
                )
                params = jax.tree_util.tree_map(
                    lambda p, u: p + u.astype(p.dtype), params, updates
                )
                return params, opt_state, stats

            return shard_map(
                shard_fn, mesh=mesh,
                in_specs=(P(), P(), P('dp')),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )(params, opt_state, batch)

        return jax.jit(step)

    # -- epoch loop ----------------------------------------------------
    def run_one_epoch(
        self,
        loader: Iterable,
        is_train: bool = False,
        error_recorder: Optional[ErrorRecorder] = None,
    ):
        """loader yields padded numpy batch dicts (static capacities).

        With a 'dp' mesh, training groups LOCAL_DEVICES consecutive
        batches into one leading-device-axis stack for the shard_map
        step (gradients pmean'd over the whole mesh — across hosts too
        when jax.distributed is initialized; parallel/distributed.py).
        A trailing group smaller than the device count is dropped, as
        every device must hold a shard (LAMMPS/NCCL-style strict DP).
        """
        if is_train and self.mesh is not None:
            import numpy as _np
            n_local = len(jax.local_devices())
            group = []
            for batch in loader:
                group.append(batch)
                if len(group) < n_local:
                    continue
                local = {k: _np.stack([b[k] for b in group])
                         for k in group[0]}
                if jax.process_count() > 1:
                    # multi-host: assemble the global leading-device
                    # axis from each process's local stripe
                    sh = NamedSharding(self.mesh, P('dp'))
                    stacked = {
                        k: jax.make_array_from_process_local_data(
                            sh, v)
                        for k, v in local.items()
                    }
                else:
                    stacked = {k: jnp.asarray(v)
                               for k, v in local.items()}
                group = []
                self.params, self.opt_state, stats = self._train_step_dp(
                    self.params, self.opt_state, stacked
                )
                if error_recorder is not None:
                    error_recorder.update(stats)
            return
        for batch in loader:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if is_train:
                self.params, self.opt_state, stats = self._train_step(
                    self.params, self.opt_state, batch
                )
            else:
                stats = self._eval_step(self.params, batch)
            if error_recorder is not None:
                error_recorder.update(stats)

    def scheduler_step(self, metric: Optional[float] = None):
        lr = self.scheduler.step(metric)
        self.opt_state = set_lr(self.opt_state, lr)

    def get_lr(self) -> float:
        return self.scheduler.lr

    def get_checkpoint_pieces(self) -> Tuple[Any, Any]:
        return self.params, {
            'opt_state': jax.tree_util.tree_map(
                np.asarray, self.opt_state
            ),
            'scheduler': self.scheduler.state_dict(),
        }
