"""conv2 benchmark sweep (reference benchmarks/conv2/conv2.nim).

Measures the compiler-generated convolution kernels (forward + both derived
gradients) across problem sizes.  The forward/grad kernels lower through the
conv pattern matcher onto the MXU convolution op.

Usage: python benchmarks/conv2.py
"""

import time

import numpy as np


def _fetch(x) -> float:
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32)))


def bench_case(batch, size, cin, cout, k, chain=20):
    import jax

    from exprgrad_tpu import Fun, compile, input, iters, sq
    from exprgrad_tpu.backend.executor import JaxExecutor
    from exprgrad_tpu.layers import conv2
    from exprgrad_tpu.passes import infer_shapes

    x = input("images")
    f = input("filters")
    out = conv2(x, f)
    it = iters("it")
    loss = Fun()
    loss[0] = sq(out.raw[it])
    bw = loss.target("loss").backwards()
    graph = [out.target("out"), bw.grad(x).target("dx"), bw.grad(f).target("df")]
    model = compile(graph, precision="default")
    program = model.program
    img_id, flt_id = program.inputs["images"], program.inputs["filters"]
    shapes_in = [(img_id, [batch, size, size, cin]), (flt_id, [cout, k, k, cin])]
    rng = np.random.default_rng(0)
    images = jax.device_put(
        (rng.normal(size=(batch, size, size, cin)) * 0.1).astype(np.float32)
    )
    filters = jax.device_put(
        (rng.normal(size=(cout, k, k, cin)) * 0.1).astype(np.float32)
    )
    inputs = {img_id: images, flt_id: filters}

    out_hw = size - k + 1
    fwd_flops = 2 * batch * out_hw * out_hw * cout * k * k * cin
    results = {}
    for target, flops in (("out", fwd_flops), ("dx", fwd_flops), ("df", fwd_flops)):
        shapes = infer_shapes(program, target, shapes_in)
        executor = JaxExecutor(program, target, shapes, precision="default")
        out_id = program.targets[target].output
        _fetch(executor._fn(inputs, 0, 0)[out_id])
        t = time.perf_counter()
        last = None
        for _ in range(chain):
            last = executor._fn(inputs, 0, 0)[out_id]
        _fetch(last)
        per = (time.perf_counter() - t) / chain
        results[target] = (per, flops / per / 1e9)
    return results


def main() -> None:
    cases = [
        (32, 64, 8, 8, 3),
        (32, 128, 16, 32, 3),
        (16, 128, 32, 64, 3),
        (8, 224, 3, 64, 5),
    ]
    for batch, size, cin, cout, k in cases:
        print(f"conv2 b{batch} {size}x{size}x{cin} -> {cout} (k={k}):")
        try:
            results = bench_case(batch, size, cin, cout, k)
            for target, (per, gflops) in results.items():
                print(f"  {target:4s} {per*1e3:8.3f} ms  {gflops:9.1f} GFLOP/s")
        except Exception as err:
            print(f"  failed: {err}")


if __name__ == "__main__":
    main()
