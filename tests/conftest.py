"""Test config: run on 8 virtual CPU devices (multi-chip sharding oracle).

Mirrors the reference's single-host multi-rank test strategy
(tests/lammps_tests/test_lammps.py runs mpirun -np {1..4}); here the
'ranks' are XLA host-platform devices.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

import jax  # noqa: E402

# the axon TPU plugin rewrites jax_platforms at import time; force cpu-only
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)
