"""Pipeline parallelism: GPipe-style microbatched execution over a mesh.

Completes the parallel story (dp/tp/sp/ep/pp — the reference is strictly
single-device): a chain of P shape-preserving stages lives one-per-device
along a mesh axis, M microbatches stream through with activations handed
to the next stage via ``ppermute`` each step.  The whole schedule is one
``lax.scan`` of M+P-1 steps inside ``shard_map`` — static shapes, no host
round-trips, and the bubble is the textbook (P-1)/(M+P-1).

Differentiable by construction: ``jax.grad`` through scan + ppermute gives
the reverse pipeline schedule automatically (ppermute's transpose is the
inverse rotation), so no custom VJP is needed.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_pipeline_params(params, mesh: Mesh, axis: str = "stage"):
    """Place stage-stacked parameters (every leaf has a leading dim of
    n_stages) with that dim sharded over ``mesh[axis]``."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, params)


def pipeline_apply(
    params,
    xs: jax.Array,
    mesh: Mesh,
    stage_fn: Callable,
    axis: str = "stage",
) -> jax.Array:
    """Run ``xs`` [M, batch, ...] through P chained stages.

    ``params``: pytree whose leaves are stacked per stage (leading dim =
    number of devices on ``axis``); ``stage_fn(stage_params, h) -> h`` must
    preserve h's shape (classic homogeneous pipeline, e.g. transformer
    blocks).  Returns [M, batch, ...] — microbatch m passed through all P
    stages in order.
    """
    n_stages = mesh.shape[axis]
    m_micro = xs.shape[0]

    def body(local_params, xs_rep):
        rank = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        stage_params = jax.tree_util.tree_map(lambda x: x[0], local_params)

        h0 = jnp.zeros(xs_rep.shape[1:], xs_rep.dtype)
        out0 = jnp.zeros_like(xs_rep)

        def step(carry, s):
            h_prev, outputs = carry
            # activations computed last step move to the next stage
            h_in = jax.lax.ppermute(h_prev, axis, perm)
            # stage r at step s works on microbatch s - r
            mb = jnp.clip(s - rank, 0, m_micro - 1)
            x_s = jax.lax.dynamic_index_in_dim(xs_rep, mb, 0, False)
            inp = jnp.where(rank == 0, x_s, h_in)
            active = (s >= rank) & (s - rank < m_micro)
            h_new = jnp.where(active, stage_fn(stage_params, inp), h_prev * 0)
            # the last stage emits microbatch s - (P-1)
            out_idx = jnp.clip(s - (n_stages - 1), 0, m_micro - 1)
            emit = (rank == n_stages - 1) & (s >= n_stages - 1)
            cur = jax.lax.dynamic_index_in_dim(outputs, out_idx, 0, False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(emit, h_new, cur), out_idx, 0
            )
            return (h_new, outputs), None

        steps = jnp.arange(m_micro + n_stages - 1, dtype=jnp.int32)
        (_, outputs), _ = jax.lax.scan(step, (h0, out0), steps)
        # only the last stage holds real outputs; replicate via psum
        return jax.lax.psum(
            jnp.where(rank == n_stages - 1, outputs, jnp.zeros_like(outputs)),
            axis,
        )

    param_specs = jax.tree_util.tree_map(
        lambda x: P(axis, *([None] * (x.ndim - 1))), params
    )
    mapped = shard_map(
        body,
        mesh=mesh,
        in_specs=(param_specs, P()),
        out_specs=P(),
        check_vma=False,
    )
    return mapped(params, xs)
