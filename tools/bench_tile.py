"""Probe: which lane-tiling construct does Mosaic compile/run best?

Builds T (B, d1*mul) from S (B, d1) with T[:, m*mul+j] = S[:, m], by
  a) repeat     jnp.repeat(S, mul, axis=1)
  b) bcast+cat  concat([broadcast_to(S[:, m:m+1], (B, mul)) ...])
  c) mxu        S @ ones-block matrix (d1, d1*mul)
then multiplies with X and group-sums back to (B, mul) -- the shape of
the lane-packed CG inner loop. Compares against the unpacked per-slice
formulation (d) doing the same math.

Usage: python tools/bench_tile.py [E]
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

    E = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    B, mul, d1 = 256, 32, 5
    W = mul * d1
    reps = 8  # emulate several instructions' worth of work

    Tm = np.zeros((d1, W), np.float32)
    for m in range(d1):
        Tm[m, m * mul:(m + 1) * mul] = 1.0
    Tmj = jnp.asarray(Tm)

    def groupsum(prod):
        acc = prod[:, 0:mul]
        for m in range(1, d1):
            acc = acc + prod[:, m * mul:(m + 1) * mul]
        return acc

    def kern_a(x_ref, s_ref, t_ref, o_ref):
        x = x_ref[...]
        acc = None
        for r in range(reps):
            st = jnp.repeat(s_ref[...] * (1.0 + r), mul, axis=1)
            g = groupsum(x * st)
            acc = g if acc is None else acc + g
        o_ref[...] = acc

    def kern_b(x_ref, s_ref, t_ref, o_ref):
        x = x_ref[...]
        s = s_ref[...]
        acc = None
        for r in range(reps):
            st = jnp.concatenate([
                jnp.broadcast_to(s[:, m:m + 1] * (1.0 + r), (B, mul))
                for m in range(d1)
            ], axis=1)
            g = groupsum(x * st)
            acc = g if acc is None else acc + g
        o_ref[...] = acc

    def kern_c(x_ref, s_ref, t_ref, o_ref):
        x = x_ref[...]
        s = s_ref[...]
        acc = None
        for r in range(reps):
            st = jax.lax.dot_general(
                s * (1.0 + r), t_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            g = groupsum(x * st)
            acc = g if acc is None else acc + g
        o_ref[...] = acc

    def kern_d(x_ref, s_ref, t_ref, o_ref):
        # unpacked baseline: per-slice multiplies (current kernel style)
        acc = None
        for r in range(reps):
            g = None
            for m in range(d1):
                t = (x_ref[:, m * mul:(m + 1) * mul]
                     * (s_ref[:, m:m + 1] * (1.0 + r)))
                g = t if g is None else g + t
            acc = g if acc is None else acc + g
        o_ref[...] = acc

    def call(kern):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((E, mul), jnp.float32),
            grid=(E // B,),
            in_specs=[
                pl.BlockSpec((B, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, d1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d1, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, mul), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (E, W), jnp.float32)
    s = jax.random.normal(key, (E, d1), jnp.float32)

    ref = None
    for name, kern in (('d:per-slice', kern_d), ('a:repeat', kern_a),
                       ('b:bcast+cat', kern_b), ('c:mxu-tile', kern_c)):
        try:
            f = jax.jit(lambda x, s, k=kern: call(k)(x, s, Tmj))
            out = f(x, s)
            jax.block_until_ready(out)
            if ref is None:
                ref = np.asarray(out)
            else:
                err = np.abs(np.asarray(out) - ref).max()
                assert err < 1e-3, (name, err)
            t0 = time.perf_counter()
            o = None
            for i in range(30):
                o = f(x * (1.0 + 1e-6 * i), s)
            jax.block_until_ready(o)
            dt = (time.perf_counter() - t0) / 30 * 1e3
            print(f'{name:14s} {dt:7.3f} ms', flush=True)
        except Exception as e:  # noqa: BLE001
            print(f'{name:14s} FAILED: {str(e)[:160]}', flush=True)


if __name__ == '__main__':
    main()
