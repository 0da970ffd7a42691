"""Slope timing for tunneled TPU backends.

A single jit dispatch on the dev relay costs ~1.6 ms wall regardless of
the program (measured 2026-08-18, mid-layer conv shapes; the round-3
probe_dispatch number of ~0.1 ms only holds for small-arg programs).
Any per-op microbench that times one op per dispatch therefore reports
op_cost + 1.6 ms. `slope_time` removes the additive term by timing the
SAME op K1 and K2 times inside one jitted lax.scan and returning the
slope (t_K2 - t_K1) / (K2 - K1).

The op must be expressible as state -> state (chained, so XLA cannot
dedup iterations). Usage:

    per_call = slope_time(lambda c: op(c), init_state)
"""

import time

import jax
import jax.numpy as jnp


def slope_time(step_fn, init, k1=1, k2=10, n=20, warmup=3):
    """Median-free slope estimate of one `step_fn` application.

    step_fn: state -> state (jit-traceable, chained).
    Returns seconds per application.
    """

    def make(K):
        @jax.jit
        def run(c):
            def body(c, _):
                return step_fn(c), None
            c, _ = jax.lax.scan(body, c, None, length=K)
            return c
        return run

    def timed(fn, c):
        for _ in range(warmup):
            c2 = fn(c)
        jax.block_until_ready(c2)
        t0 = time.perf_counter()
        for _ in range(n):
            c2 = fn(c2)
        jax.block_until_ready(c2)
        return (time.perf_counter() - t0) / n

    t1 = timed(make(k1), init)
    t2 = timed(make(k2), init)
    return (t2 - t1) / (k2 - k1)


def dispatch_overhead(step_fn, init, k1=1, k2=10, n=20):
    """Returns (per_call_s, overhead_s): slope and the 1-call residual."""

    def make(K):
        @jax.jit
        def run(c):
            def body(c, _):
                return step_fn(c), None
            c, _ = jax.lax.scan(body, c, None, length=K)
            return c
        return run

    def timed(fn, c):
        for _ in range(3):
            c2 = fn(c)
        jax.block_until_ready(c2)
        t0 = time.perf_counter()
        for _ in range(n):
            c2 = fn(c2)
        jax.block_until_ready(c2)
        return (time.perf_counter() - t0) / n

    t1 = timed(make(k1), init)
    t2 = timed(make(k2), init)
    per = (t2 - t1) / (k2 - k1)
    return per, t1 - per * k1
