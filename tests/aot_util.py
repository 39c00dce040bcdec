"""AOT TPU (Mosaic) lowering helper shared by the chip-less
verification tests (test_mosaic_aot.py) and the fuzzers.

``lower_tpu`` compiles a DSL target's executor and lowers it for the
TPU platform on this CPU-only host: the real Mosaic kernels are built
and VERIFIED (interpret mode is forced off via the
``mosaic_check.REAL_LOWERING`` hook), under chip dtype conditions
(x64 off).  A failure is a program the real chip would reject."""

import numpy as np

import exprgrad_tpu.ops.mosaic_check as mosaic_check


def lower_tpu(graphs, target: str, arg_shapes: dict):
    """Compile + AOT-lower one target for TPU; returns the executor."""
    import jax

    from exprgrad_tpu import compile
    from exprgrad_tpu.backend.executor import JaxExecutor
    from exprgrad_tpu.passes import infer_shapes

    old_real = mosaic_check.REAL_LOWERING
    old_x64 = jax.config.jax_enable_x64
    mosaic_check.REAL_LOWERING = True
    jax.config.update("jax_enable_x64", False)
    try:
        model = compile(graphs, backend="jax", schedule_mode="force")
        program = model.program
        pairs = [
            (program.inputs[name], list(shape))
            for name, shape in arg_shapes.items()
        ]
        shapes = infer_shapes(program, target, pairs)
        ex = JaxExecutor(program, target, shapes, schedule_mode="force")
        dt = np.dtype(program.scalar_type.value)
        donated = {
            tid: jax.ShapeDtypeStruct(tuple(shapes[tid]), dt)
            for tid in ex.donated_tids
        }
        kept = {
            tid: jax.ShapeDtypeStruct(tuple(shapes[tid]), dt)
            for tid in ex.kept_tids
        }
        ex._fn_split.trace(donated, kept, 0, 0).lower(
            lowering_platforms=("tpu",)
        )
        return ex
    finally:
        mosaic_check.REAL_LOWERING = old_real
        jax.config.update("jax_enable_x64", old_x64)
