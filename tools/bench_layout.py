"""Layout microbenchmark: edge-major vs feature-major elementwise CG
work on the real chip.

Hypothesis (BENCH_NOTES round 2): the fused conv kernels are VPU-bound
on (B, mul)-sliced products with mul=32 -> 25% lane use; a transposed
(mul, B) layout packs the same work into 4x fewer vregs. This toy
isolates exactly that: R repeated multiply-accumulate passes over a
(B, W)-sliced vs (W, B)-sliced operand set inside one pallas kernel,
timed over many grid blocks.

Run on the TPU: python tools/bench_layout.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

B = 256          # edge rows per block
MUL = 32         # channel width of the sliced ops (the 7net-0 l=2 mul)
NSLICE = 16      # number of distinct (B, MUL) slices = d1 / MUL
R = 24           # repeated passes (amplifies the elementwise cost)
GRID = 128       # blocks per launch


def rowmajor_kernel(x_ref, y_ref, o_ref):
    # (B, MUL)-sliced products: 25%-lane vregs at MUL=32
    x = x_ref[...]
    y = y_ref[...]
    acc = jnp.zeros((B, MUL), jnp.float32)
    for r in range(R):
        for s in range(NSLICE):
            acc = acc + x[:, s * MUL:(s + 1) * MUL] * y[:, s * MUL:(s + 1) * MUL]
    o_ref[...] = acc


def colmajor_kernel(x_ref, y_ref, o_ref):
    # (MUL, B)-sliced products: full-lane vregs
    x = x_ref[...]
    y = y_ref[...]
    acc = jnp.zeros((MUL, B), jnp.float32)
    for r in range(R):
        for s in range(NSLICE):
            acc = acc + x[s * MUL:(s + 1) * MUL, :] * y[s * MUL:(s + 1) * MUL, :]
    o_ref[...] = acc


def transpose_kernel(x_ref, y_ref, o_ref):
    # edge-major input, ONE in-kernel transpose, then full-lane work
    x = x_ref[...].T
    y = y_ref[...].T
    acc = jnp.zeros((MUL, B), jnp.float32)
    for r in range(R):
        for s in range(NSLICE):
            acc = acc + x[s * MUL:(s + 1) * MUL, :] * y[s * MUL:(s + 1) * MUL, :]
    o_ref[...] = acc.T


def build(kernel, xshape, oshape, xs_block, os_block):
    f = pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=[pl.BlockSpec(xs_block, lambda i: (i, 0))] * 2,
        out_specs=pl.BlockSpec(os_block, lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
        interpret=bool(os.environ.get('BENCH_LAYOUT_INTERPRET')),
    )
    return jax.jit(f)


def timeit(f, args, n=50):
    f(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args)
    o.block_until_ready()
    return (time.perf_counter() - t0) / n * 1e3


def main():
    D = MUL * NSLICE
    rng = np.random.default_rng(0)
    x_rm = jnp.asarray(rng.normal(size=(GRID * B, D)), jnp.float32)
    y_rm = jnp.asarray(rng.normal(size=(GRID * B, D)), jnp.float32)
    x_cm = jnp.asarray(np.asarray(x_rm).T.reshape(GRID * D, B))  # blocked T
    y_cm = jnp.asarray(np.asarray(y_rm).T.reshape(GRID * D, B))

    f_rm = build(rowmajor_kernel, (GRID * B, D), (GRID * B, MUL),
                 (B, D), (B, MUL))
    f_cm = build(colmajor_kernel, (GRID * D, B), (GRID * MUL, B),
                 (D, B), (MUL, B))
    f_tr = build(transpose_kernel, (GRID * B, D), (GRID * B, MUL),
                 (B, D), (B, MUL))

    t_rm = timeit(f_rm, (x_rm, y_rm))
    t_cm = timeit(f_cm, (x_cm, y_cm))
    t_tr = timeit(f_tr, (x_rm, y_rm))
    ops = GRID * B * D * R  # MACs per launch
    print(f'rowmajor  (B,{MUL}) slices : {t_rm:8.3f} ms  '
          f'{ops / t_rm / 1e9:7.1f} GMAC/s')
    print(f'colmajor  ({MUL},B) slices : {t_cm:8.3f} ms  '
          f'{ops / t_cm / 1e9:7.1f} GMAC/s')
    print(f'transpose-in-kernel        : {t_tr:8.3f} ms  '
          f'{ops / t_tr / 1e9:7.1f} GMAC/s')


if __name__ == '__main__':
    main()
