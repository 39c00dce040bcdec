"""Pallas matmul block-shape sweep at 4096^3 f32 (kernel-body rates).

The r5 body-rate calibration put the 512^3-blocked Pallas matmul at
~78 TFLOP/s vs XLA dot's ~150 — an arithmetic-intensity gap, not an MXU
one: 512^3 blocks stream 2MB of operands per 268 MFLOP grid step
(AI = 128 FLOP/B where the v5e roofline needs ~240), so the pipeline is
DMA-bound at ~55%.  Larger output tiles raise AI quadratically in the
block edge: 1024x1024x256 has AI = 268 FLOP/B with a 12MB VMEM
footprint.  This sweeps the candidates through bench._chain_timer
(in-jit fori difference quotient, operands passed as arguments), then
re-times the top config through the SCHEDULED DSL executor to confirm
the user-schedule path realizes the same rate.

Writes ``pallas_matmul_block_sweep`` into BENCH_DETAILS.json.
Run bare (no PYTHONPATH prefix): ``python scripts/matmul_blocks.py``.
``EG_DRY=1`` runs the whole body on CPU with shrunk shapes.
"""

import json
import os
import signal
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

DRY = os.environ.get("EG_DRY") == "1"
RESULTS: dict = {}


def _bail(_sig, _frm):
    print("TIMEOUT" + (" (partial flushed)" if RESULTS else ""), flush=True)
    if RESULTS:
        RESULTS["timeout_partial"] = True
        flush()
        sys.exit(0)
    sys.exit(1)


def flush() -> None:
    path = ("/tmp/BENCH_DETAILS_DRY.json" if DRY else
            os.path.join(REPO_ROOT, "BENCH_DETAILS.json"))
    try:
        with open(path) as f:
            details = json.load(f)
    except (OSError, ValueError):
        details = {}
    details["pallas_matmul_block_sweep"] = RESULTS
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
    signal.alarm(3000)

    import bench as _bench
    from exprgrad_tpu.ops.matmul import pallas_matmul

    n = 256 if DRY else 4096
    iters = 2 if DRY else 32
    rng = np.random.default_rng(0)
    scale = 1.0 / np.sqrt(n)
    a = jnp.asarray((rng.normal(size=(n, n)) * scale).astype(np.float32))
    b = jnp.asarray((rng.normal(size=(n, n)) * scale).astype(np.float32))
    flops = 2.0 * n**3

    def rate(step):
        t = _bench._chain_timer(step, a, iters, operands=(b,))
        ts = sorted(t() for _ in range(5))
        return flops / ts[len(ts) // 2] / 1e12

    xla_t = rate(lambda x, y: jnp.dot(
        x, y, preferred_element_type=jnp.float32))
    RESULTS["xla_dot_tflops"] = round(xla_t, 2)
    print(f"xla dot: {xla_t:.1f} TFLOP/s", flush=True)
    flush()

    configs = [
        (512, 512, 512),      # current default (AI=128 FLOP/B)
        (512, 512, 1024),
        (1024, 512, 512),
        (512, 1024, 512),
        (1024, 1024, 128),
        (1024, 1024, 256),    # AI=268: first config above the roofline AI
        (2048, 512, 256),
        (512, 2048, 256),
    ]
    sweep = {}
    RESULTS["pallas_tflops"] = sweep
    for bm, bn, bk in configs[:2] if DRY else configs:
        # pallas_matmul clamps blocks to the problem size internally
        key = f"{bm}x{bn}x{bk}"
        try:
            t = rate(lambda x, y, bm=bm, bn=bn, bk=bk: pallas_matmul(
                x, y, block_m=bm, block_n=bn, block_k=bk))
            sweep[key] = round(t, 2)
            print(f"pallas {key}: {t:.1f} TFLOP/s "
                  f"({t / xla_t:.2f}x xla)", flush=True)
        except Exception as err:
            sweep[key] = f"error: {err}"[:160]
            print(f"pallas {key} ERROR: {err}", flush=True)
        flush()

    # the scheduled DSL path at the best config: the user-schedule
    # surface must realize the same kernel-body rate
    best = max(
        (kv for kv in sweep.items() if isinstance(kv[1], float)),
        key=lambda kv: kv[1], default=None)
    if best is None:
        print("no pallas config succeeded", flush=True)
        return
    bm, bn, bk = map(int, best[0].split("x"))
    from exprgrad_tpu import Fun, compile, input, iters as dsl_iters
    from exprgrad_tpu.backend.executor import JaxExecutor
    from exprgrad_tpu.passes import infer_shapes

    y, x_, it = dsl_iters("y", "x", "it")
    c = Fun("c")
    c[y, x_] = input("a")[y, it] * input("b")[it, x_]
    c.schedule(tile={"y": min(bm, n), "x": min(bn, n), "it": min(bk, n)},
               parallel=["y", "x"])
    model = compile(c.target("c"), schedule_mode="force",
                    precision="default")
    program = model.program
    a_id, b_id = program.inputs["a"], program.inputs["b"]
    out_id = program.targets["c"].output
    shapes = infer_shapes(program, "c", [(a_id, [n, n]), (b_id, [n, n])])
    ex = JaxExecutor(program, "c", shapes, precision="default",
                     schedule_mode="force")
    t = rate(lambda x, y2: ex._fn({a_id: x, b_id: y2}, 0, 0)[out_id])
    assert ex.stats.get("pallas") == 1, ex.stats
    RESULTS["scheduled_dsl_best"] = {
        "config": best[0], "tflops": round(t, 2),
        "vs_xla": round(t / xla_t, 3),
    }
    print(f"scheduled DSL {best[0]}: {t:.1f} TFLOP/s "
          f"({t / xla_t:.2f}x xla)", flush=True)
    flush()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
