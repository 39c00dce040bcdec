"""AOT TPU (Mosaic) lowering helper shared by the chip-less
verification tests (test_mosaic_aot.py) and the fuzzers.

``lower_tpu`` compiles a DSL target's executor and lowers it for the
TPU platform on this CPU-only host: the real Mosaic kernels are built
and VERIFIED (interpret mode is forced off via the
``mosaic_check.REAL_LOWERING`` hook), under chip dtype conditions
(x64 off).  A failure is a program the real chip would reject."""

import numpy as np

import exprgrad_tpu.ops.mosaic_check as mosaic_check


def lower_tpu(graphs, target: str, arg_shapes: dict,
              full_compile: bool = False):
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
        if full_compile:
            _topology_compile(ex._fn_split, donated, kept)
        return ex
    finally:
        mosaic_check.REAL_LOWERING = old_real
        jax.config.update("jax_enable_x64", old_x64)


_TOPOLOGY = None


def _topology_compile(fn, donated, kept):
    """Run the FULL XLA:TPU + Mosaic backend via a deviceless v5e
    topology — no chip required.  Strictly deeper than ``.lower()``
    verification: late Mosaic passes (vector-layout inference, register
    allocation) run here — the class of rejection the lowering-only net
    cannot see.  Returns the compiled executable (cost/memory analysis
    available)."""
    import jax
    import numpy as _np
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    global _TOPOLOGY
    if _TOPOLOGY is None:
        _TOPOLOGY = topologies.get_topology_desc(
            platform="tpu", topology_name="v5e:2x2"
        )
    mesh = Mesh(_np.array(_TOPOLOGY.devices[:1]), ("d",))
    sh = NamedSharding(mesh, PartitionSpec())
    jf = jax.jit(fn, in_shardings=sh, out_shardings=sh)
    return jf.trace(donated, kept, 0, 0).lower().compile()


def compile_tpu(graphs, target: str, arg_shapes: dict):
    """``lower_tpu`` + the full deviceless TPU backend compile."""
    return lower_tpu(graphs, target, arg_shapes, full_compile=True)


def full_compile_fn(f, *args):
    """Deviceless v5e backend compile of a plain jittable fn (extern
    kernels: flash attention, paged decode) — the full-strength analog
    of ``lower_fn``-style checks."""
    import jax

    old_real = mosaic_check.REAL_LOWERING
    old_x64 = jax.config.jax_enable_x64
    mosaic_check.REAL_LOWERING = True
    jax.config.update("jax_enable_x64", False)
    try:
        return _topology_compile_fn(f, args)
    finally:
        mosaic_check.REAL_LOWERING = old_real
        jax.config.update("jax_enable_x64", old_x64)


def _topology_compile_fn(f, args):
    import jax
    import numpy as _np
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    global _TOPOLOGY
    if _TOPOLOGY is None:
        _TOPOLOGY = topologies.get_topology_desc(
            platform="tpu", topology_name="v5e:2x2"
        )
    mesh = Mesh(_np.array(_TOPOLOGY.devices[:1]), ("d",))
    sh = NamedSharding(mesh, PartitionSpec())
    jf = jax.jit(f, in_shardings=sh, out_shardings=sh)
    return jf.trace(*args).lower().compile()
