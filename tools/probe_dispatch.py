"""Probe per-dispatch overhead on the current backend (VERDICT r2 #1).

Measures wall time of a trivially-cheap jitted fn vs number and size of
device-resident args, async-pipelined vs blocking per call. If overhead
scales with arg bytes, the relay is re-serializing resident buffers per
dispatch; if flat, it's fixed round-trip latency and the fix is fewer,
larger dispatches.

Run: python tools/probe_dispatch.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print('backend:', jax.default_backend(), dev)

    def probe(n_args, mb_per_arg, n_calls=30, block_each=False):
        rows = int(mb_per_arg * 1e6 / 4)
        args = [jnp.zeros(max(rows, 1), jnp.float32) for _ in range(n_args)]
        x = jnp.zeros((), jnp.float32)

        @jax.jit
        def f(x, *args):
            return x + 1.0

        out = f(x, *args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n_calls):
            out = f(out, *args)
            if block_each:
                jax.block_until_ready(out)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n_calls * 1e3
        mode = 'block' if block_each else 'async'
        print(f'  {n_args:2d} args x {mb_per_arg:6.1f} MB  {mode}: '
              f'{dt:8.3f} ms/call')
        return dt

    print('dispatch overhead vs resident arg size:')
    for block in (False, True):
        probe(1, 0.001, block_each=block)
        probe(8, 0.001, block_each=block)
        probe(8, 10.0, block_each=block)
        probe(8, 40.0, block_each=block)
        probe(16, 40.0, block_each=block)

    # donation: does donating big args change per-call cost?
    rows = int(40e6 / 4)
    big = jnp.zeros(rows, jnp.float32)

    @jax.jit
    def g(x, big):
        return x + 1.0, big

    x = jnp.zeros((), jnp.float32)
    out = g(x, big)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(30):
        x, big = g(x, big)
    jax.block_until_ready(x)
    print(f'passthrough 40MB out+in:   {(time.perf_counter()-t0)/30*1e3:8.3f} ms/call')

    # host->device and device->host raw bandwidth
    h = np.zeros(rows, np.float32)
    t0 = time.perf_counter()
    for _ in range(5):
        d = jax.device_put(h)
        jax.block_until_ready(d)
    put = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(d)
    get = (time.perf_counter() - t0) / 5
    print(f'device_put 40MB: {put*1e3:.1f} ms ({40/put:.0f} MB/s); '
          f'fetch 40MB: {get*1e3:.1f} ms ({40/get:.0f} MB/s)')


if __name__ == '__main__':
    main()
