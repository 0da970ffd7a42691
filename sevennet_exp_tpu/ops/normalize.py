"""Activation normalization constants (e3nn `normalize2mom`).

e3nn rescales every activation f so that E[f(z)^2] = 1 for z ~ N(0,1),
estimated with 1e6 samples from a CPU torch generator seeded with 0
(e3nn/math/_normalize_activation.py). The constants below were computed
with exactly that recipe (torch 2.x, float64) and are hard-coded so the
runtime stays torch-free. They enter every radial MLP and gate activation
(reference sevenn/_const.py:34-48 activation registry), so they are part
of the checkpoint numerical contract.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

# E[f(z)^2]^(-1/2), z ~ N(0,1), e3nn seed-0 1e6-sample estimate
NORMALIZE2MOM_CST = {
    'silu': 1.6791767923989418,
    'tanh': 1.5937334472592695,
    'relu': 1.4163393446331365,
    'abs': 1.001110600838467,
    'sigmoid': 1.8467055342154763,
    'elu': 1.2467863885570512,
    'ssp': 1.878204668541552,
}

_LN2 = math.log(2.0)


def _ssp(x):
    # ShiftedSoftPlus, reference sevenn/nn/activation.py:6-8
    return jax.nn.softplus(x) - _LN2


RAW_ACTIVATION = {
    'silu': jax.nn.silu,
    'tanh': jnp.tanh,
    'relu': jax.nn.relu,
    'abs': jnp.abs,
    'sigmoid': jax.nn.sigmoid,
    'elu': jax.nn.elu,
    'ssp': _ssp,
}


def normalized_activation(name: str) -> Callable:
    """f(x) * cst with cst = E[f(z)^2]^(-1/2) (e3nn normalize2mom)."""
    f = RAW_ACTIVATION[name]
    cst = NORMALIZE2MOM_CST[name]
    return lambda x: f(x) * cst
