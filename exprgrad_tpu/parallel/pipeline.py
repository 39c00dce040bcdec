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


# ---------------------------------------------------------------------------
# compiled-model pipeline: stages run a COMPILED DSL program
# ---------------------------------------------------------------------------

def stack_stage_params(models) -> dict:
    """Stack the parameters of P compiled models (one per stage, same
    program) along a new leading stage dim: ``{tid: [P, ...]}`` — the
    params pytree :func:`pipeline_from_model` expects.  Pass P references
    to ONE model to start all stages from shared weights."""
    first = models[0]
    return {
        tid: jnp.stack([jnp.asarray(np.asarray(m.params[tid]))
                        for m in models])
        for tid in first.program.params
    }


def pipeline_from_model(
    model,
    target_name: str,
    micro_shape,
    mesh: Mesh,
    axis: str = "stage",
    input_name: str | None = None,
):
    """Pipeline-parallel execution of a COMPILED DSL program.

    ``model`` is a compiled shape-preserving block (one input, output of
    the same shape — e.g. a transformer block written in the kernel DSL);
    each of the P devices on ``mesh[axis]`` runs the block's compiled
    executor as one pipeline stage with its own parameter values.

    Returns ``(apply, param_template)`` where
    ``apply(stage_params, xs[M, *micro_shape]) -> [M, *micro_shape]``
    streams M microbatches through the P stages (GPipe schedule,
    differentiable — ``jax.grad`` through it yields the reverse
    pipeline), and ``param_template`` is ``{tid: [P, ...]}`` holding the
    model's own parameters replicated per stage (a ready-to-train or
    ready-to-load pytree; see :func:`stack_stage_params`).

    The stage program must be deterministic (no ``rand()``/dropout: the
    per-stage executor is traced once with a fixed seed) and cache-free
    (compile the forward block, not a training target).
    """
    from ..backend.executor import JaxExecutor
    from ..errors import ModelRuntimeError
    from ..passes import infer_shapes

    program = model.program
    if target_name not in program.targets:
        raise ModelRuntimeError(
            f"{target_name!r} is not a target of the model"
        )
    if program.caches:
        raise ModelRuntimeError(
            "pipeline stages must be cache-free forward programs "
            "(compile the block itself, not a training target)"
        )
    if input_name is None:
        if len(program.inputs) != 1:
            raise ModelRuntimeError(
                f"stage program has inputs {sorted(program.inputs)}; pass "
                "input_name to pick the streamed activation"
            )
        input_name = next(iter(program.inputs))
    in_tid = program.inputs[input_name]
    out_tid = program.targets[target_name].output
    shapes = infer_shapes(
        program, target_name, [(in_tid, list(micro_shape))]
    )
    if list(shapes[out_tid]) != list(micro_shape):
        raise ModelRuntimeError(
            f"stage output shape {shapes[out_tid]} != input shape "
            f"{list(micro_shape)}; pipelines chain shape-preserving stages"
        )
    executor = JaxExecutor(
        program, target_name, shapes, precision=model.precision,
        schedule_mode=getattr(model, "schedule_mode", "auto"),
    )

    def stage_fn(stage_params: dict, h):
        tensors = dict(stage_params)
        tensors[in_tid] = h.reshape(shapes[in_tid])
        return executor.run_fn(tensors, 0, 0)[out_tid].reshape(h.shape)

    n_stages = mesh.shape[axis]
    template = {
        tid: jnp.broadcast_to(
            jnp.asarray(np.asarray(model.params[tid]))[None],
            (n_stages, *np.shape(model.params[tid])),
        )
        for tid in program.params
    }

    def apply(stage_params: dict, xs):
        return pipeline_apply(stage_params, xs, mesh, stage_fn, axis=axis)

    return apply, template
