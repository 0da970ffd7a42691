"""Fused Pallas TP kernel == XLA reference (value + gradients), interpret
mode on CPU — mirrors the reference's e3nn<->cuEquivariance equivalence
suite (tests/unit_tests/test_cueq.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sevennet_exp_tpu.irreps import Irreps
from sevennet_exp_tpu.ops import pallas_tp
from sevennet_exp_tpu.ops.tensor_product import UVUTensorProductSpec


@pytest.fixture(autouse=True)
def interpret_mode():
    pallas_tp.set_interpret(True)
    yield
    pallas_tp.set_interpret(False)


def _spec():
    irreps_x = Irreps('8x0e+8x1e+8x2e')
    irreps_filter = Irreps.spherical_harmonics(2, 1)
    keep = Irreps('1x0e+1x1e+1x2e')
    return UVUTensorProductSpec(irreps_x, irreps_filter, keep)


def test_fused_matches_xla_forward_and_grads():
    spec = _spec()
    E = 256
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    xg = jax.random.normal(k1, (E, spec.irreps_in1.dim), jnp.float32)
    sh = jax.random.normal(k2, (E, spec.irreps_in2.dim), jnp.float32)
    w = jax.random.normal(k3, (E, spec.weight_numel), jnp.float32)

    ref = spec.apply(xg, sh, w)
    fused = pallas_tp.make_fused_tp(spec, block_e=128)(xg, sh, w)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=1e-5)

    # gradients through a scalar objective
    def obj_ref(xg, sh, w):
        return jnp.sum(spec.apply(xg, sh, w) ** 2)

    def obj_fused(xg, sh, w):
        return jnp.sum(pallas_tp.make_fused_tp(spec, 128)(xg, sh, w) ** 2)

    g_ref = jax.grad(obj_ref, argnums=(0, 1, 2))(xg, sh, w)
    g_fused = jax.grad(obj_fused, argnums=(0, 1, 2))(xg, sh, w)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
