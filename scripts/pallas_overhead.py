"""Root-cause the scheduled-Pallas matmul gap on the real chip.

VERDICT r3 #1: every headline perf number comes from the einsum path;
the schedule-driven Pallas emitter measured 0.2-2 TFLOP/s in round 1 vs
142 for XLA dot, and whether that is per-launch overhead or kernel-body
throughput was never split.  This experiment answers it:

(a) LAUNCH vs BODY: one jitted program chaining N data-dependent
    pallas_matmul calls, N in {1, 2, 4, 8, 16}; the slope of T(N) is the
    true per-kernel time with dispatch/RTT amortized, the intercept is
    dispatch.  Same protocol for jnp.dot on the same operands.
(b) BLOCK SHAPES: the 4096^3 f32 rate across (bm, bn, bk) variants.
(c) DTYPE: bf16 operands through the same kernel (MXU-native passes).
(d) THROUGH THE COMPILER: the scheduled DSL kernel (schedule_mode=force)
    chained through the executor, vs (a)'s direct rate — isolates any
    executor overhead from the kernel itself.

Writes everything into BENCH_DETAILS.json under
``pallas_overhead_experiment`` incrementally (tunnel windows are short).

Run: ``python scripts/pallas_overhead.py``

``EG_DRY=1`` executes the whole body on CPU (pinned before backend init)
with shrunk shapes; artifacts go to /tmp, not BENCH_DETAILS.json.
"""

import json
import os
import signal
import sys
import time

# run as `python scripts/<name>.py` from anywhere: put the repo
# root on sys.path WITHOUT touching PYTHONPATH — prefixing
# PYTHONPATH=. REPLACED /root/.axon_site, so the axon TPU plugin
# (registered by that dir's sitecustomize.py) never loaded and
# every chip attempt died at backend init while the tunnel was
# actually healthy (r5 review finding; the driver's bare
# `python bench.py` succeeded in ALL FOUR rounds)
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

DRY = os.environ.get("EG_DRY") == "1"


def _bail(_sig, _frm):
    print("TIMEOUT", flush=True)
    sys.exit(1)


RESULTS: dict = {}


def flush() -> None:
    path = ("/tmp/BENCH_DETAILS_DRY.json" if DRY else
            os.path.join(os.path.dirname(__file__), "..",
                         "BENCH_DETAILS.json"))
    try:
        with open(path) as f:
            details = json.load(f)
    except (OSError, ValueError):
        details = {}
    details["pallas_overhead_experiment"] = RESULTS
    with open(path, "w") as f:
        json.dump(details, f, indent=1)


def main() -> None:
    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(420)

    import jax

    if DRY:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    signal.alarm(3300)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not on_tpu:
        print("WARNING: not on TPU; numbers are meaningless", flush=True)

    from exprgrad_tpu.ops.matmul import pallas_matmul

    rng = np.random.default_rng(0)

    def chain_time(fn, x, n, reps=3):
        def chained(x):
            cur = x
            for _ in range(n):
                cur = fn(cur)
            return cur

        jitted = jax.jit(chained)
        _ = float(jnp.sum(jitted(x)))  # compile+warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(jnp.sum(jitted(x)))
            best = min(best, time.perf_counter() - t0)
        return best

    # (a) launch-vs-body split at 2048^3 f32
    size = 256 if DRY else 2048
    a = jnp.asarray(
        (rng.normal(size=(size, size)) / np.sqrt(size)).astype(np.float32)
    )
    flops = 2.0 * size**3
    ns = [1, 2, 4] if DRY else [1, 2, 4, 8, 16]
    split = {}
    for name, fn in (
        ("pallas512", lambda x: pallas_matmul(x, x, 512, 512, 512)),
        ("xla_dot", lambda x: jnp.dot(
            x, x, preferred_element_type=jnp.float32)),
    ):
        times = {n: chain_time(fn, a, n) for n in ns}
        # least-squares slope/intercept over (n, T)
        xs = np.array(ns, dtype=np.float64)
        ys = np.array([times[n] for n in ns])
        slope, intercept = np.polyfit(xs, ys, 1)
        split[name] = {
            "times_s": {str(n): round(times[n], 5) for n in ns},
            "per_call_s": round(float(slope), 6),
            "dispatch_intercept_s": round(float(intercept), 5),
            "body_tflops": round(flops / slope / 1e12, 2),
        }
        print(f"{name}: slope {slope * 1e3:.3f} ms/call -> "
              f"{flops / slope / 1e12:.1f} TFLOP/s, intercept "
              f"{intercept * 1e3:.1f} ms", flush=True)
        RESULTS["launch_vs_body_2048"] = split
        flush()
    if "pallas512" in split and "xla_dot" in split:
        RESULTS["per_launch_overhead_us"] = round(
            (split["pallas512"]["per_call_s"]
             - split["xla_dot"]["per_call_s"]) * 1e6, 1)
        flush()

    # (b) block-shape variants at 4096^3 (chained 6x)
    size = 512 if DRY else 4096
    a4 = jnp.asarray(
        (rng.normal(size=(size, size)) / np.sqrt(size)).astype(np.float32)
    )
    flops4 = 2.0 * size**3
    blocks = [
        (512, 512, 512),
        (256, 256, 512),
        (512, 512, 1024),
        (512, 1024, 512),
        (1024, 512, 512),
        (256, 512, 2048),
        (128, 128, 512),
    ]
    table = {}
    for bm, bn, bk in blocks:
        try:
            t = chain_time(
                lambda x: pallas_matmul(x, x, bm, bn, bk), a4, 6, reps=2
            ) / 6
            table[f"{bm}x{bn}x{bk}"] = round(flops4 / t / 1e12, 2)
            print(f"blocks {bm}x{bn}x{bk}: "
                  f"{flops4 / t / 1e12:.1f} TFLOP/s", flush=True)
        except Exception as err:
            table[f"{bm}x{bn}x{bk}"] = f"error: {err}"[:200]
            print(f"blocks {bm}x{bn}x{bk}: ERROR {err}", flush=True)
        RESULTS["block_shape_tflops_4096_f32"] = table
        flush()
    t_xla4 = chain_time(
        lambda x: jnp.dot(x, x, preferred_element_type=jnp.float32),
        a4, 6, reps=2,
    ) / 6
    RESULTS["xla_dot_tflops_4096_f32"] = round(flops4 / t_xla4 / 1e12, 2)
    print(f"xla 4096: {flops4 / t_xla4 / 1e12:.1f} TFLOP/s", flush=True)
    flush()

    # (c) bf16 operands through the best block shape
    a16 = a4.astype(jnp.bfloat16)
    try:
        t = chain_time(
            lambda x: pallas_matmul(
                x, x, 512, 512, 512, out_dtype=jnp.bfloat16
            ),
            a16, 6, reps=2,
        ) / 6
        RESULTS["pallas_bf16_tflops_4096"] = round(flops4 / t / 1e12, 2)
        print(f"pallas bf16 4096: {flops4 / t / 1e12:.1f} TFLOP/s",
              flush=True)
    except Exception as err:
        RESULTS["pallas_bf16_tflops_4096"] = f"error: {err}"[:200]
    flush()

    # (d) the scheduled DSL kernel through the compiled executor
    from exprgrad_tpu import Fun, compile, input as eg_input, iters
    from exprgrad_tpu.backend.executor import JaxExecutor
    from exprgrad_tpu.passes import infer_shapes

    n = 512 if DRY else 4096
    y, x_, it = iters("y", "x", "it")
    c = Fun("c")
    c[y, x_] = eg_input("a")[y, it] * eg_input("b")[it, x_]
    c.schedule(tile={"y": 512, "x": 512, "it": 512}, parallel=["y", "x"])
    model = compile(c.target("c"), schedule_mode="force",
                    precision="default")
    program = model.program
    a_id, b_id = program.inputs["a"], program.inputs["b"]
    out_id = program.targets["c"].output
    shapes = infer_shapes(program, "c", [(a_id, [n, n]), (b_id, [n, n])])
    # schedule_mode must reach the EXECUTOR too: without it the cost
    # model declines the schedule and this section silently measures the
    # einsum path while labeling it "scheduled DSL" (caught by the
    # EG_DRY run — stats said {'einsum': 1, 'schedule-fallback': 1})
    executor = JaxExecutor(program, "c", shapes, precision="default",
                           schedule_mode="force")
    bmat = jnp.asarray(
        (rng.normal(size=(n, n)) / np.sqrt(n)).astype(np.float32)
    )

    def step(lhs):
        return executor._fn({a_id: lhs, b_id: bmat}, 0, 0)[out_id]

    t = chain_time(step, a4, 6, reps=2) / 6
    RESULTS["scheduled_dsl_tflops_4096_f32"] = round(
        2.0 * n**3 / t / 1e12, 2
    )
    assert executor.stats.get("pallas") == 1, executor.stats
    RESULTS["scheduled_dsl_stats"] = dict(executor.stats)
    print(f"scheduled DSL 4096: {2.0 * n**3 / t / 1e12:.1f} TFLOP/s "
          f"(stats {executor.stats})", flush=True)
    flush()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
