"""Micro-bench of CG-contraction formulations inside a pallas kernel.

The fused conv kernel's VPU cost is dominated by (B, mul)-sliced
elementwise CG terms that use mul/128 of each vector register. This
compares, for one representative instruction (l1=l2=l3=2, mul=32):

  a) per-term slices (current kernel formulation)
  b) 3-D reshape: X as (B, dim1, mul), S as (B, dim1, dim3)
  c) full-width: one (B, dim1*mul) multiply per p with an S row built
     by an in-kernel MXU tiling matmul

Usage: python tools/bench_cg.py [E]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sevennet_exp_tpu.ops.wigner import wigner_3j

    E = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    B = 256
    mul, l1, l2, l3 = 32, 2, 2, 2
    d1, d2, d3 = 2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1
    w3j = np.asarray(wigner_3j(l1, l2, l3))
    nz = [(m, n, p, float(w3j[m, n, p]))
          for m in range(d1) for n in range(d2) for p in range(d3)
          if abs(w3j[m, n, p]) > 1e-12]
    print(f'instruction ({l1},{l2},{l3}) mul={mul}: {len(nz)} nz terms, '
          f'dim1*dim3={d1 * d3}')

    W = mul * d1

    def kern_a(x_ref, y_ref, c_ref, t_ref, o_ref):
        cache = {}
        acc = [None] * d3
        for (m, n, p, c) in nz:
            if (m, n) not in cache:
                cache[(m, n)] = (
                    x_ref[:, m * mul:(m + 1) * mul]
                    * y_ref[:, n:n + 1]
                )
            t = cache[(m, n)] * c
            acc[p] = t if acc[p] is None else acc[p] + t
        for p in range(d3):
            o_ref[:, p * mul:(p + 1) * mul] = acc[p]

    # C (d2, d1*d3), S = y @ C
    C = np.zeros((d2, d1 * d3), np.float32)
    for (m, n, p, c) in nz:
        C[n, m * d3 + p] = c
    Cj = jnp.asarray(C)
    # tile matrix: T[(m,p), (p, m*mul+j)] = 1
    T = np.zeros((d1 * d3, d3 * W), np.float32)
    for m in range(d1):
        for p in range(d3):
            T[m * d3 + p, p * W + m * mul:p * W + (m + 1) * mul] = 1.0
    Tj = jnp.asarray(T)

    def kern_c(x_ref, y_ref, c_ref, t_ref, o_ref):
        S = jax.lax.dot_general(
            y_ref[...], c_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        St = jax.lax.dot_general(
            S, t_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, d3*W): p-th window is the tiled S row
        x = x_ref[...]
        for p in range(d3):
            prod = x * St[:, p * W:(p + 1) * W]
            acc = prod[:, 0:mul]
            for m in range(1, d1):
                acc = acc + prod[:, m * mul:(m + 1) * mul]
            o_ref[:, p * mul:(p + 1) * mul] = acc

    def kern_b(x_ref, y_ref, c_ref, t_ref, o_ref):
        S = jax.lax.dot_general(
            y_ref[...], c_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(B, d1, d3)
        x3 = x_ref[...].reshape(B, d1, mul)
        for p in range(d3):
            acc = jnp.sum(x3 * S[:, :, p:p + 1], axis=1)
            o_ref[:, p * mul:(p + 1) * mul] = acc

    def call(kern):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((E, d3 * mul), jnp.float32),
            grid=(E // B,),
            in_specs=[
                pl.BlockSpec((B, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, d2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(Cj.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(Tj.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, d3 * mul), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (E, W), jnp.float32)
    y = jax.random.normal(key, (E, d2), jnp.float32)

    ref = None
    for name, kern in (('a:per-term', kern_a), ('b:3d-reshape', kern_b),
                       ('c:full-width', kern_c)):
        try:
            f = jax.jit(lambda x, y, k=kern: call(k)(x, y, Cj, Tj))
            out = f(x, y)
            jax.block_until_ready(out)
            if ref is None:
                ref = np.asarray(out)
            else:
                err = np.abs(np.asarray(out) - ref).max()
                assert err < 1e-4, (name, err)
            # chained timing to defeat dispatch caching
            t0 = time.perf_counter()
            o = x
            for _ in range(20):
                o = f(o[:, :W] * 0.999 + x * 0.001, y)
            jax.block_until_ready(o)
            dt = (time.perf_counter() - t0) / 20 * 1e3
            print(f'{name:14s} {dt:7.3f} ms')
        except Exception as e:  # noqa: BLE001
            print(f'{name:14s} FAILED: {str(e)[:200]}')


if __name__ == '__main__':
    main()
