"""Matmul benchmark: XLA einsum path vs schedule-driven Pallas variants.

The reference compares its CPU JIT against a naive GPU kernel and a 16x16
shared-memory-tiled GPU kernel (benchmarks/matmul/matmul_gpu.nim); here the
comparison is the XLA dot (already MXU-tiled) against the Pallas emitter at
several block-size schedules — the tuning surface the schedule DSL exposes.

Usage: python benchmarks/matmul.py [N] [chain]
"""

import sys
import time

import numpy as np


def _fetch(x) -> float:
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32)))


def build_matmul(schedule=None, dtype="float32", precision="default"):
    from exprgrad_tpu import Fun, compile, input, iters

    y, x, it = iters("y", "x", "it")
    c = Fun("c")
    c[y, x] = input("a")[y, it] * input("b")[it, x]
    if schedule:
        c.schedule(**schedule)
    return compile(c.target("c"), dtype=dtype, precision=precision)


def time_variant(model, n: int, chain: int) -> float:
    import jax

    from exprgrad_tpu.backend.executor import JaxExecutor
    from exprgrad_tpu.passes import infer_shapes

    program = model.program
    a_id, b_id = program.inputs["a"], program.inputs["b"]
    out_id = program.targets["c"].output
    shapes = infer_shapes(program, "c", [(a_id, [n, n]), (b_id, [n, n])])
    executor = JaxExecutor(program, "c", shapes, precision=model.precision)
    rng = np.random.default_rng(0)
    scale = 1.0 / np.sqrt(n)
    dtype = np.dtype(program.scalar_type.value)
    a = jax.device_put((rng.normal(size=(n, n)) * scale).astype(dtype))
    b = jax.device_put((rng.normal(size=(n, n)) * scale).astype(dtype))

    def step(lhs):
        return executor._fn({a_id: lhs, b_id: b}, 0, 0)[out_id]

    _fetch(step(a))
    t = time.perf_counter()
    cur = a
    for _ in range(chain):
        cur = step(cur)
    _fetch(cur)
    return (time.perf_counter() - t) / chain


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    chain = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    flops = 2 * n**3

    variants = [
        ("xla-einsum f32(default)", None, "float32", "default"),
        ("xla-einsum bf16", None, "bfloat16", "default"),
        (
            "pallas 256x256x512",
            {"tile": {"y": 256, "x": 256, "it": 512},
             "parallel": ["y", "x"], "cache": []},
            "float32",
            "default",
        ),
        (
            "pallas 512x512x512",
            {"tile": {"y": 512, "x": 512, "it": 512},
             "parallel": ["y", "x"], "cache": []},
            "float32",
            "default",
        ),
        (
            "pallas 512x1024x512",
            {"tile": {"y": 512, "x": 1024, "it": 512},
             "parallel": ["y", "x"], "cache": []},
            "float32",
            "default",
        ),
    ]
    print(f"matmul {n}x{n}x{n}, chain={chain}")
    for name, schedule, dtype, precision in variants:
        try:
            model = build_matmul(schedule, dtype, precision)
            per = time_variant(model, n, chain)
            stats = model  # noqa: F841
            print(f"  {name:26s} {per*1e3:8.3f} ms   {flops/per/1e12:7.1f} TFLOP/s")
        except Exception as err:
            print(f"  {name:26s} failed: {err}")


if __name__ == "__main__":
    main()
