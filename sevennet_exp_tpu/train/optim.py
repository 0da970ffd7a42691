"""Optimizer & LR-scheduler registries (reference sevenn/train/optim.py)
backed by optax, with torch-scheduler-semantics epoch stepping.

The learning rate is a host-controlled hyperparameter injected through
optax.inject_hyperparams; schedulers are pure-python epoch -> lr maps
mirroring torch.optim.lr_scheduler behavior so existing configs work.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional

import optax


def _adam(lr, **kw):
    kw.setdefault('eps', 1e-8)
    betas = kw.pop('betas', (0.9, 0.999))
    return optax.inject_hyperparams(optax.adam)(
        learning_rate=lr, b1=betas[0], b2=betas[1], eps=kw['eps']
    )


def _adamw(lr, **kw):
    betas = kw.pop('betas', (0.9, 0.999))
    wd = kw.pop('weight_decay', 0.01)
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr, b1=betas[0], b2=betas[1],
        weight_decay=wd, eps=kw.get('eps', 1e-8),
    )


def _sgd(lr, **kw):
    return optax.inject_hyperparams(optax.sgd)(
        learning_rate=lr, momentum=kw.get('momentum', 0.0),
        nesterov=kw.get('nesterov', False),
    )


def _adagrad(lr, **kw):
    return optax.inject_hyperparams(optax.adagrad)(learning_rate=lr)


def _radam(lr, **kw):
    betas = kw.pop('betas', (0.9, 0.999))
    return optax.inject_hyperparams(optax.radam)(
        learning_rate=lr, b1=betas[0], b2=betas[1],
    )


optim_dict: Dict[str, Callable] = {
    'sgd': _sgd,
    'adagrad': _adagrad,
    'adam': _adam,
    'adamw': _adamw,
    'radam': _radam,
}


class Scheduler:
    """torch.optim.lr_scheduler-compatible epoch->lr (host side)."""

    def __init__(self, name: str, base_lr: float, **kw):
        self.name = (name or 'constant').lower()
        self.base_lr = base_lr
        self.kw = kw
        self.epoch = 0
        self.lr = base_lr
        # ReduceLROnPlateau state
        self._best: Optional[float] = None
        self._bad = 0

    def step(self, metric: Optional[float] = None) -> float:
        self.epoch += 1
        n, kw = self.name, self.kw
        if n == 'constant':
            pass
        elif n == 'exponentiallr':
            self.lr = self.base_lr * kw.get('gamma', 0.99) ** self.epoch
        elif n == 'steplr':
            step = kw.get('step_size', 30)
            self.lr = self.base_lr * kw.get('gamma', 0.1) ** (self.epoch // step)
        elif n == 'multisteplr':
            ms = sorted(kw.get('milestones', []))
            k = sum(1 for m in ms if m <= self.epoch)
            self.lr = self.base_lr * kw.get('gamma', 0.1) ** k
        elif n == 'cosineannealinglr':
            tmax = kw.get('T_max', 100)
            eta_min = kw.get('eta_min', 0.0)
            self.lr = eta_min + (self.base_lr - eta_min) * (
                1 + math.cos(math.pi * self.epoch / tmax)
            ) / 2
        elif n == 'linearlr':
            s = kw.get('start_factor', 1.0 / 3)
            e = kw.get('end_factor', 1.0)
            total = kw.get('total_iters', 5)
            t = min(self.epoch, total)
            self.lr = self.base_lr * (s + (e - s) * t / total)
        elif n == 'reducelronplateau':
            assert metric is not None, 'plateau scheduler needs a metric'
            mode = kw.get('mode', 'min')
            better = (
                self._best is None
                or (mode == 'min' and metric < self._best - kw.get('threshold', 1e-4))
                or (mode == 'max' and metric > self._best + kw.get('threshold', 1e-4))
            )
            if better:
                self._best = metric
                self._bad = 0
            else:
                self._bad += 1
                if self._bad > kw.get('patience', 10):
                    self.lr = max(
                        self.lr * kw.get('factor', 0.1),
                        kw.get('min_lr', 0.0),
                    )
                    self._bad = 0
        else:
            raise ValueError(f'unknown scheduler {n}')
        return self.lr

    def state_dict(self) -> Dict[str, Any]:
        return {
            'name': self.name, 'base_lr': self.base_lr, 'kw': self.kw,
            'epoch': self.epoch, 'lr': self.lr,
            'best': self._best, 'bad': self._bad,
        }

    def load_state_dict(self, d: Dict[str, Any]):
        self.epoch = d['epoch']
        self.lr = d['lr']
        self._best = d.get('best')
        self._bad = d.get('bad', 0)


scheduler_names = [
    'steplr', 'multisteplr', 'exponentiallr', 'cosineannealinglr',
    'reducelronplateau', 'linearlr', 'constant',
]
