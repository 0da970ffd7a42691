"""Micro-profile of one fused conv layer at bench-like sizes.

Times: fused kernel fwd, fused kernel fwd+bwd (vjp), gather, scatter,
and prints the TP plan shape statistics for 7net-0's mid layer.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20, warmup=3):
    """Chained timing: the first arg is perturbed by a scalar derived
    from the previous output so successive dispatches are data-dependent
    (defeats any result caching / overlap in the remote backend)."""
    import jax
    import jax.numpy as jnp

    def chained(eps, *a):
        out = fn(a[0] + eps, *a[1:])
        leaf = jax.tree_util.tree_leaves(out)[0]
        # 1e-30 scale: keeps a real data dependency (not constant-folded)
        # while perturbing the next iteration negligibly
        return out, jnp.sum(leaf[:1]) * 1e-30

    cf = jax.jit(chained)
    eps = jnp.zeros((), args[0].dtype)
    for _ in range(warmup):
        out, eps = cf(eps, *args)
    jax.block_until_ready(eps)
    t0 = time.perf_counter()
    for _ in range(n):
        out, eps = cf(eps, *args)
    jax.block_until_ready(eps)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from sevennet_exp_tpu.model.build import build_e3_equivariant_model
    from sevennet_exp_tpu.model.layers import IrrepsConvolution
    from sevennet_exp_tpu.ops import pallas_conv, pallas_tp
    from sevennet_exp_tpu.presets import sevennet_0_config

    pallas_tp.enable(True)

    E = int(sys.argv[1]) if len(sys.argv) > 1 else 44032
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    config = sevennet_0_config(species=['Na', 'Cl'])
    model = build_e3_equivariant_model(config)
    params, _ = model.init(jax.random.PRNGKey(0))

    convs = [(n, l) for n, l in model.layers
             if isinstance(l, IrrepsConvolution)]
    name, conv = convs[2]  # mid layer
    print(f'layer={name} d1={conv.tp.irreps_in1.dim} '
          f'd2={conv.tp.irreps_in2.dim} w_numel={conv.tp.weight_numel}')

    plan, w_numel = pallas_conv._tp_plan(conv.tp)
    per_k, d_out = pallas_conv._si2_plan(conv.tp, conv.si2)
    n_fma = sum(len(p['nz']) for p in plan)
    vpu_flops = sum(len(p['nz']) * p['mul'] * 3 for p in plan)
    mxu_flops = 0
    for p in plan:
        if p['k'] in per_k:
            info = per_k[p['k']]
            mxu_flops += p['dim3'] * p['mul'] * info['mo'] * 2
    print(f'instructions={len(plan)} nz_total={n_fma} d_out={d_out}')
    print(f'per-edge VPU flops ~{vpu_flops}, MXU flops ~{mxu_flops}')
    print(f'at E={E}: VPU {vpu_flops*E/1e9:.2f} GF, MXU {mxu_flops*E/1e9:.2f} GF')

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

    fwd = jax.jit(lambda *a: fused(*a))
    t = timeit(fwd, xg, sh, emb, ms, mlp_ws, si2_ws)
    print(f'fused fwd:        {t:.2f} ms')

    def loss(*a):
        return jnp.sum(fused(*a) ** 2)
    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    t = timeit(grad, xg, sh, emb, ms, mlp_ws, si2_ws)
    print(f'fused fwd+bwd:    {t:.2f} ms')

    # gather / scatter costs
    x = jax.random.normal(key, (N, d1), jnp.float32)
    idx = jax.random.randint(key, (E,), 0, N)
    gather = jax.jit(lambda x, i: x[i])
    t = timeit(gather, x, idx)
    print(f'gather (E,{d1}):   {t:.2f} ms')

    y = jax.random.normal(key, (E, d_out), jnp.float32)
    idx_sorted = jnp.sort(idx)
    from sevennet_exp_tpu.ops.scatter import scatter_sum
    scat = jax.jit(lambda y, i: scatter_sum(y, i, N))
    t = timeit(scat, y, idx_sorted)
    print(f'scatter (E,{d_out}) sorted: {t:.2f} ms')
    t = timeit(scat, y, idx)
    print(f'scatter (E,{d_out}) random: {t:.2f} ms')

    # XLA path for comparison
    pallas_tp.enable(False)
    def xla_conv(xg, sh, emb, ms):
        w = conv.weight_nn.apply(p['weight_nn'], emb) * ms
        msg = conv.tp.apply(xg, sh, w)
        return conv.si2.apply(p['si2'], msg, skip_bias=True)
    xf = jax.jit(xla_conv)
    t = timeit(xf, xg, sh, emb, ms)
    print(f'XLA conv fwd:     {t:.2f} ms')
    xg_ = jax.jit(jax.grad(lambda *a: jnp.sum(xla_conv(*a) ** 2),
                           argnums=(0, 1, 2)))
    t = timeit(xg_, xg, sh, emb, ms)
    print(f'XLA conv f+b:     {t:.2f} ms')


if __name__ == '__main__':
    main()
