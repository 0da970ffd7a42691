"""Chained-timing micro-bench of the fused conv kernel (fwd and vjp).

Usage: python tools/bench_kernel.py [dot_mode] [fwd_block] [bwd_block]
Chained: iteration t+1's xg depends on iteration t's output, defeating
the remote backend's identical-dispatch result caching.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if len(sys.argv) > 2:
    os.environ['SEVENNET_CONV_FWD_BLOCK'] = sys.argv[2]
if len(sys.argv) > 3:
    os.environ['SEVENNET_CONV_BWD_BLOCK'] = sys.argv[3]


def main():
    import jax
    import jax.numpy as jnp

    from sevennet_exp_tpu.util import enable_compile_cache
    enable_compile_cache()

    from sevennet_exp_tpu.model.build import build_e3_equivariant_model
    from sevennet_exp_tpu.model.layers import IrrepsConvolution
    from sevennet_exp_tpu.ops import pallas_conv, pallas_tp
    from sevennet_exp_tpu.presets import sevennet_0_config

    pallas_tp.enable(True)
    if len(sys.argv) > 1:
        pallas_conv.set_dot_mode(sys.argv[1])

    E = 44032
    config = sevennet_0_config(species=['Na', 'Cl'])
    model = build_e3_equivariant_model(config)
    params, _ = model.init(jax.random.PRNGKey(0))
    convs = [(n, l) for n, l in model.layers
             if isinstance(l, IrrepsConvolution)]
    name, conv = convs[2]

    key = jax.random.PRNGKey(1)
    d1 = conv.tp.irreps_in1.dim
    f = conv.tp.irreps_in2.dim
    r = conv.weight_nn.hs[0]
    xg = jax.random.normal(key, (E, d1), jnp.float32)
    sh = jax.random.normal(key, (E, f), jnp.float32)
    emb = jax.random.normal(key, (E, r), jnp.float32)
    ms = jnp.ones((E, 1), jnp.float32)
    p = params[name]
    mlp_ws = tuple(p['weight_nn'][f'w{i}'] for i in range(3))
    si2_ws = tuple(p['si2'][f'w{n}'] for n in range(len(conv.si2.paths)))

    fused, _ = pallas_conv.make_fused_conv(conv.tp, conv.weight_nn, conv.si2)

    @jax.jit
    def fwd_step(xg):
        y = fused(xg, sh, emb, ms, mlp_ws, si2_ws)
        return xg + 1e-30 * jnp.sum(y[:, :1])

    @jax.jit
    def vjp_step(xg):
        def loss(xg):
            return jnp.sum(fused(xg, sh, emb, ms, mlp_ws, si2_ws)[:, :1])
        return xg + 1e-30 * jax.grad(loss)(xg)

    # slope timing: one jit dispatch on the tunneled backend costs
    # ~1.6 ms wall (tools/timing.py), which used to drown the kernel
    from timing import slope_time
    for label, fn in [('fwd', fwd_step), ('fwd+bwd', vjp_step)]:
        dt = slope_time(fn, xg) * 1e3
        print(f'{label:8s}: {dt:7.3f} ms  ({dt / E * 1e6:6.2f} ns/row  '
              f'mode={pallas_conv._DOT_MODE} '
              f'fb={os.environ.get("SEVENNET_CONV_FWD_BLOCK", "-")} '
              f'bb={os.environ.get("SEVENNET_CONV_BWD_BLOCK", "-")})')


if __name__ == '__main__':
    main()
