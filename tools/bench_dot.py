"""Small-matmul cost law on the MXU (Mosaic, v5e).

Times dotT((K, M), (K, N)) inside a pallas kernel over a grid, for the
CG-operator shapes the fused conv kernel cares about, in fp32 vs bf16
inputs. The decision data for whether CG contractions can ride the MXU:
if cost is quantized to full (128, 128) tiles, K=27/M=20 pays the same
as K=M=128 and the design must amortize or batch; the bf16:fp32 ratio
shows how many passes the fp32 path burns.

Usage: python tools/bench_dot.py
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

    from sevennet_exp_tpu.util import enable_compile_cache
    enable_compile_cache()

    G = 128  # grid steps

    def bench(K, M, N, dtype):
        def kernel(c_ref, z_ref, o_ref):
            c = c_ref[...]
            z = z_ref[0]
            if dtype == 'bf16':
                c = c.astype(jnp.bfloat16)
                z = z.astype(jnp.bfloat16)
            o = jax.lax.dot_general(
                c, z, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0] = o

        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((G, M, N), jnp.float32),
            grid=(G,),
            in_specs=[
                pl.BlockSpec((K, M), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, N), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, M, N), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        C = jax.random.normal(jax.random.PRNGKey(0), (K, M), jnp.float32)
        Z = jax.random.normal(jax.random.PRNGKey(1), (G, K, N), jnp.float32)

        @jax.jit
        def step(Z):
            y = call(C, Z)
            return Z + 1e-30 * y[:1, :1, :1], y

        z = Z
        try:
            for _ in range(3):
                z, y = step(z)
            jax.block_until_ready(z)
        except Exception as e:
            print(f'K={K:4d} M={M:4d} N={N:6d} {dtype}: FAILED '
                  f'{type(e).__name__}: {str(e)[:160]}')
            return
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            z, y = step(z)
        jax.block_until_ready(z)
        dt = (time.perf_counter() - t0) / n
        per_call = dt / G
        macs = K * M * N
        eff = macs / per_call / 1e12
        print(f'K={K:4d} M={M:4d} N={N:6d} {dtype}: {per_call * 1e6:8.2f} '
              f'us/dot  {eff:7.2f} Tmac/s')

    shapes = [
        (27, 20, 16384),   # i1=1 CG fwd
        (45, 22, 8192),    # i1=2 CG fwd
        (20, 27, 16384),   # i1=1 CG bwd (transpose)
        (128, 128, 16384), # full tile, same N
        (32, 32, 16384),
        (64, 64, 16384),
        (27, 20, 32768),   # N scaling
        (27, 20, 65536),
        (8, 128, 16384),   # K tiny, M full
        (128, 8, 16384),   # K full, M tiny
    ]
    for K, M, N in shapes:
        for dtype in ('fp32', 'bf16'):
            bench(K, M, N, dtype)


if __name__ == '__main__':
    main()
