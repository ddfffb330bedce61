"""Device-mesh parallelism.

The reference's parallelism inventory (SURVEY.md §2.7) mapped TPU-native:
- DDP/NCCL training        -> pjit data parallel (+ fsdp param sharding)
  over a jax.sharding.Mesh with XLA collectives
- CUDA intra-op kernels    -> vmapped XLA/Pallas ops over the edge dim
- shared-CUDA-memory IPC   -> explicitly sharded arrays + host snapshots
- (new) map parallelism    -> keyframe/edge-sharded distributed BA: each
  device owns a contiguous range of depth buckets and all edges sourced
  there; depth Schur blocks stay local, the 6Px6P pose system is
  psum-reduced and solved replicated.
"""
from .mesh import make_mesh
from .dist_ba import dist_ba_solve, partition_edges, resolve_exchange
from .distributed import init_distributed, is_distributed
from .train_parallel import make_parallel_train_step, shard_params_fsdp

__all__ = [k for k in dir() if not k.startswith("_")]
