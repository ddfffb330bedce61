"""Multi-host runtime initialization.

The reference scales across GPUs with torch DDP + NCCL, rendezvousing via
environment variables (reference train.py:28-36 `setup(rank, world_size)`
with MASTER_ADDR/MASTER_PORT, launched from train.py:174-186).  The TPU
analog is `jax.distributed.initialize`: each host process joins a
coordinator, after which `jax.devices()` spans every host and the same
`Mesh`/`shard_map` programs (train step, keyframe-sharded BA) run globally
with XLA collectives riding ICI/DCN — no NCCL translation.

Rendezvous env vars (same spirit as the reference's MASTER_ADDR):

    DROID_COORDINATOR   host:port of process 0   (e.g. "10.0.0.1:8476")
    DROID_NUM_PROCESSES world size
    DROID_PROCESS_ID    this process's rank

On TPU pods these are usually auto-detected by JAX; initialize() with no
explicit args is then correct.  Safe to call more than once.
"""
import os

_initialized = False


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Join (or start) the multi-host runtime.  Returns (process_id, n_processes).

    No-ops gracefully when neither args nor env vars request a multi-process
    run, so single-host sessions need no changes.
    """
    global _initialized
    import jax

    coordinator = coordinator or os.environ.get("DROID_COORDINATOR")
    num_processes = num_processes if num_processes is not None else (
        int(os.environ["DROID_NUM_PROCESSES"]) if "DROID_NUM_PROCESSES" in os.environ else None
    )
    process_id = process_id if process_id is not None else (
        int(os.environ["DROID_PROCESS_ID"]) if "DROID_PROCESS_ID" in os.environ else None
    )

    if not _initialized and (coordinator or num_processes):
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
    return jax.process_index(), jax.process_count()


def is_distributed():
    import jax

    return jax.process_count() > 1
