"""Data-parallel (+ fsdp) training over a device mesh.

Replaces the reference's DDP/NCCL/mp.spawn training (train.py:28-36,174-186):
the batch is sharded over the mesh's ``dp`` axis, parameters and optimizer
state are sharded over ``fsdp`` (largest divisible axis, else replicated),
and XLA inserts the gradient psums / parameter all-gathers.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def _fsdp_spec(shape, n):
    """Shard the largest axis divisible by n; replicate otherwise."""
    best = None
    for i, d in enumerate(shape):
        if d % n == 0 and d >= n and (best is None or d > shape[best]):
            best = i
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = "fsdp"
    return P(*spec)


def shard_params_fsdp(params, mesh):
    """device_put a param pytree with per-array fsdp shardings."""
    if "fsdp" not in mesh.axis_names:
        sh = NamedSharding(mesh, P())
        return jax.device_put(params, sh)
    n = mesh.shape["fsdp"]

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, _fsdp_spec(jnp.shape(x), n)))

    return jax.tree_util.tree_map(put, params)


def shard_batch(batch, mesh):
    """Shard the leading (batch) axis over dp."""
    sh = NamedSharding(mesh, P("dp"))

    def put(x):
        return jax.device_put(x, sh)

    return {k: put(v) for k, v in batch.items()}


def make_parallel_train_step(cfg, ii, jj, mesh, num_steps=None, donate=True,
                             dtype=None, remat=False, scan=False):
    """Returns (jitted step, prepare) where prepare shards params/opt/batch.

    step(params, opt_state, batch) -> (params, opt_state, metrics); inputs
    must be device_put with the shardings from prepare (committed arrays
    drive jit's sharding propagation).  dtype/remat/scan pass through to
    make_train_step (bf16 + remat + scan is the reference-scale on-chip
    configuration, PROFILE.md).
    """
    from ..train.step import make_train_step

    step = make_train_step(cfg, ii, jj, num_steps=num_steps, dtype=dtype,
                           remat=remat, scan=scan)
    jstep = jax.jit(step, donate_argnums=(0, 1) if donate else ())

    def prepare(params, opt_state, batch):
        params = shard_params_fsdp(params, mesh)
        opt_state = jax.tree_util.tree_map(
            lambda x: shard_params_fsdp(x, mesh)
            if hasattr(x, "shape") and np.ndim(x) > 0
            else x,
            opt_state,
        )
        batch = shard_batch(batch, mesh)
        return params, opt_state, batch

    return jstep, prepare
