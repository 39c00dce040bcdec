"""Multi-chip execution over a jax device mesh.

The reference is strictly single-device (SURVEY.md §2.5/§5.8 — no
distributed layer of any kind); this package goes beyond parity the
TPU-native way: shard the executor's functional program over a
``jax.sharding.Mesh`` and let XLA's SPMD partitioner insert the ICI
collectives (psum for gradient reduction under data parallelism,
all-gather/reduce-scatter around sharded matmuls under tensor parallelism).
"""

from .attention import sequence_parallel_attention
from .checkpoint import SaveHandle, load_sharded, save_sharded
from .mesh import ShardedExecutor, make_mesh, sharded_fit
from .moe import MoEParams, init_moe, moe_layer, shard_moe_params
from .pipeline import (
    pipeline_apply,
    pipeline_from_model,
    shard_pipeline_params,
    stack_stage_params,
)

__all__ = [
    "MoEParams",
    "SaveHandle",
    "ShardedExecutor",
    "load_sharded",
    "save_sharded",
    "init_moe",
    "make_mesh",
    "moe_layer",
    "pipeline_apply",
    "pipeline_from_model",
    "sequence_parallel_attention",
    "shard_moe_params",
    "shard_pipeline_params",
    "stack_stage_params",
    "sharded_fit",
]
