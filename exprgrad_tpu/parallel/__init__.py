"""Multi-chip execution over a jax device mesh.

The reference is strictly single-device (SURVEY.md §2.5/§5.8 — no
distributed layer of any kind); this package goes beyond parity the
TPU-native way: shard the executor's functional program over a
``jax.sharding.Mesh`` and let XLA's SPMD partitioner insert the ICI
collectives (psum for gradient reduction under data parallelism,
all-gather/reduce-scatter around sharded matmuls under tensor parallelism).
"""

from .attention import sequence_parallel_attention
from .mesh import ShardedExecutor, make_mesh, sharded_fit

__all__ = [
    "ShardedExecutor",
    "make_mesh",
    "sequence_parallel_attention",
    "sharded_fit",
]
