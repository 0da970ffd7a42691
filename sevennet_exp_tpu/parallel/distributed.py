"""Multi-host (multi-process) bootstrap for DCN-scale training.

The TPU-native analog of the reference's launcher-environment handling
(sevenn/main/sevenn.py:59-76: torchrun WORLD_SIZE/LOCAL_RANK or OpenMPI
OMPI_COMM_WORLD_* env -> dist.init_process_group): when a recognized
multi-process launch environment is present, `jax.distributed.
initialize()` wires every process to the coordinator, after which
`jax.devices()` returns the GLOBAL device list — the existing DP mesh
construction (scripts/train.py: Mesh over jax.devices() on 'dp') then
spans hosts with no further changes, and XLA routes the pmean/psum
gradient reductions over ICI within a slice and DCN across slices.

Launch environments recognized (mirrors jax.distributed auto-detect):
  - Cloud TPU pods / multi-slice (TPU_WORKER_HOSTNAMES or
    MEGASCALE_COORDINATOR_ADDRESS set by the TPU runtime)
  - SLURM (SLURM_JOB_NUM_NODES > 1)
  - OpenMPI mpirun (OMPI_COMM_WORLD_SIZE > 1)
  - explicit JAX_COORDINATOR_ADDRESS (+ JAX_NUM_PROCESSES,
    JAX_PROCESS_ID)

Single-process runs are a silent no-op, so every entry point can call
this unconditionally.

Per-process data sharding contract: with IS_DDP, each process loads the
full dataset and strides its loader by (process_index, process_count)
(GraphLoader `shard` argument) — each host feeds only its local
devices' rows of the per-device-stacked batch, the jnp.asarray of a
globally-sharded batch placing local shards on local devices.
"""

from __future__ import annotations

import os
from typing import Optional


def detect_launch_env() -> Optional[str]:
    """Name of the recognized multi-process launch environment, or
    None for a plain single-process run."""
    if os.environ.get('JAX_COORDINATOR_ADDRESS'):
        return 'explicit'
    if (os.environ.get('TPU_WORKER_HOSTNAMES')
            and ',' in os.environ.get('TPU_WORKER_HOSTNAMES', '')):
        return 'tpu_pod'
    if os.environ.get('MEGASCALE_COORDINATOR_ADDRESS'):
        return 'tpu_multislice'
    try:
        if int(os.environ.get('SLURM_JOB_NUM_NODES', '1')) > 1:
            return 'slurm'
    except ValueError:
        pass
    try:
        if int(os.environ.get('OMPI_COMM_WORLD_SIZE', '1')) > 1:
            return 'ompi'
    except ValueError:
        pass
    return None


def maybe_initialize(log=None) -> bool:
    """Call jax.distributed.initialize() iff a multi-process launch
    environment is detected and the runtime is not yet initialized.
    Returns True when running multi-process (after initialization)."""
    import jax

    env = detect_launch_env()
    if env is None:
        return False
    from jax._src import distributed as _dist
    if _dist.global_state.client is not None:  # already initialized
        return jax.process_count() > 1
    kwargs = {}
    if env == 'explicit':
        kwargs = dict(
            coordinator_address=os.environ['JAX_COORDINATOR_ADDRESS'],
        )
        if os.environ.get('JAX_NUM_PROCESSES'):
            kwargs['num_processes'] = int(os.environ['JAX_NUM_PROCESSES'])
        if os.environ.get('JAX_PROCESS_ID'):
            kwargs['process_id'] = int(os.environ['JAX_PROCESS_ID'])
    # tpu_pod / tpu_multislice / slurm / ompi: jax auto-detects
    jax.distributed.initialize(**kwargs)
    if log is not None:
        log.format_k_v(
            'distributed runtime',
            f'{env}: process {jax.process_index()}/'
            f'{jax.process_count()}, '
            f'{jax.local_device_count()} local / '
            f'{jax.device_count()} global devices',
            write=True,
        )
    return jax.process_count() > 1
