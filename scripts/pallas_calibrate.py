"""Calibrate the schedule-routing cost model on the real chip.

Measures, through the COMPILED EXECUTOR (the same path user models take):
  * XLA dot vs scheduled Pallas matmul across shapes,
  * XLA fused elementwise/reduction vs Pallas map-reduce kernels,
  * per-pallas_call launch overhead (tiny-kernel time),
and writes the fitted constants to
``exprgrad_tpu/backend/pallas_calibration.json`` (loaded by policy.py) plus
a human-readable table into ``BENCH_DETAILS.json`` under
``pallas_vs_xla_table`` — the measured basis for schedule_mode="auto".

Run on TPU hardware: ``python scripts/pallas_calibrate.py``
(one TPU client at a time; see CLAUDE.md).  Timing uses chained
data-dependent dispatches with a device->host fence to amortize the
tunnel's ~25ms round trip.

``EG_DRY=1`` executes the whole body on CPU (pinned before backend init)
with shrunk shapes: flow proof only — constants are not written off-TPU.
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


def _time_chain(fn, x, iters=None):
    """Median-of-3 time for ``iters`` chained data-dependent applications."""
    import jax.numpy as jnp

    if iters is None:
        iters = 2 if DRY else 8

    def chain(x):
        for _ in range(iters):
            x = fn(x)
        return x

    import jax

    chained = jax.jit(chain)
    _ = float(jnp.sum(chained(x)))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(chained(x)))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main() -> None:
    signal.signal(signal.SIGALRM, _bail)
    # short fuse over backend init (a hung axon registration must not
    # hold the one-client slot; CLAUDE.md), then the full sweep budget
    signal.alarm(420)

    import jax

    if DRY:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    signal.alarm(3000)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not on_tpu:
        print("WARNING: not on TPU; constants will not be written")

    from exprgrad_tpu.ops.matmul import pallas_matmul

    rng = np.random.default_rng(0)
    table = []
    constants = {}

    def flush():
        """Write whatever is measured SO FAR (tunnel windows are short;
        a partial calibration beats none — policy.py merges over its
        defaults key-by-key)."""
        if not on_tpu or not constants:
            return
        path = os.path.join(
            os.path.dirname(__file__), "..", "exprgrad_tpu", "backend",
            "pallas_calibration.json",
        )
        with open(path, "w") as f:
            json.dump(constants, f, indent=1)
        details_path = os.path.join(
            os.path.dirname(__file__), "..", "BENCH_DETAILS.json"
        )
        try:
            with open(details_path) as f:
                details = json.load(f)
        except (OSError, ValueError):
            details = {}
        details["pallas_vs_xla_table"] = table
        with open(details_path, "w") as f:
            json.dump(details, f, indent=1)
        print("flushed calibration artifacts", flush=True)

    # --- contraction: XLA dot vs Pallas tiled matmul -------------------
    mm_rates = {"xla": [], "pallas": []}
    for size in (128, 256) if DRY else (1024, 2048, 4096):
        a = jnp.asarray(rng.normal(size=(size, size)).astype(np.float32))
        flops = 2.0 * size**3

        t_xla = _time_chain(
            lambda x: jnp.dot(
                x, x, preferred_element_type=jnp.float32
            ),
            a,
        )
        blk = min(512, size)
        t_pl = _time_chain(
            lambda x: pallas_matmul(
                x, x, block_m=blk, block_n=blk, block_k=blk
            ),
            a,
        )
        row = {
            "kernel": f"matmul {size}^3 f32",
            "xla_tflops": flops / t_xla / 1e12,
            "pallas_tflops": flops / t_pl / 1e12,
        }
        mm_rates["xla"].append(row["xla_tflops"])
        mm_rates["pallas"].append(row["pallas_tflops"])
        table.append(row)
        print(row, flush=True)
        constants["xla_matmul_tflops"] = float(np.median(mm_rates["xla"]))
        constants["pallas_matmul_tflops"] = float(
            np.median(mm_rates["pallas"])
        )
        flush()

    # --- launch overhead: tiny pallas kernel vs tiny XLA op -------------
    tiny = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
    t_tiny_pl = _time_chain(
        lambda x: pallas_matmul(x, x, block_m=256, block_n=256, block_k=256),
        tiny,
    )
    t_tiny_xla = _time_chain(
        lambda x: jnp.dot(x, x, preferred_element_type=jnp.float32), tiny
    )
    launch_us = max(0.0, (t_tiny_pl - t_tiny_xla) * 1e6)
    table.append(
        {
            "kernel": "matmul 256^3 (launch overhead probe)",
            "xla_us": t_tiny_xla * 1e6,
            "pallas_us": t_tiny_pl * 1e6,
            "launch_overhead_us": launch_us,
        }
    )
    print(table[-1], flush=True)
    constants["pallas_launch_us"] = float(launch_us)
    flush()

    # --- attention rates, both sides (drive policy.attention) -----------
    # measured END-TO-END at one shape: policy.attention compares these
    # directly (composing the XLA side from matmul+elementwise constants
    # mispredicts it — see the r4 bench: XLA 7.2 vs flash 6.8 TFLOP/s)
    from exprgrad_tpu.ops.attention import flash_attention

    ab, ah, asq, ad = (2, 2, 256, 128) if DRY else (8, 4, 1024, 128)
    qa = jnp.asarray(
        rng.normal(size=(ab, ah, asq, ad)).astype(np.float32) * 0.1
    )

    def xla_attn(q):
        s_ = jnp.einsum("bhqd,bhkd->bhqk", q, qa,
                        preferred_element_type=jnp.float32) * (ad ** -0.5)
        import jax.lax as lax
        rows = lax.broadcasted_iota(jnp.int32, s_.shape[-2:], 0)
        cols = lax.broadcasted_iota(jnp.int32, s_.shape[-2:], 1)
        s_ = jnp.where(rows >= cols, s_, -1e30)
        import jax.nn
        p = jax.nn.softmax(s_, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), qa,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    t_fl = _time_chain(
        lambda x: flash_attention(x, qa, qa, causal=True), qa
    )
    t_xa = _time_chain(xla_attn, qa)
    fl_flops = 4.0 * ab * ah * asq * asq * ad * 0.5  # causal
    constants["flash_attention_tflops"] = float(fl_flops / t_fl / 1e12)
    constants["xla_attention_tflops"] = float(fl_flops / t_xa / 1e12)
    table.append({
        "kernel": f"attention b{ab} h{ah} s{asq} d{ad} causal",
        "flash_tflops": constants["flash_attention_tflops"],
        "xla_tflops": constants["xla_attention_tflops"],
    })
    print(table[-1], flush=True)
    flush()

    # --- map/reduce family through the compiler -------------------------
    from exprgrad_tpu import Fun, compile, input as eg_input, iters, exp

    def softmax_model(mode):
        # row tile 32 (the bench_softmax_fused schedule): at 4096^2 a
        # 256-row tile blows the rowchain planner's VMEM budget and the
        # user tile is respected over shrinking, so the fusion DECLINES
        # to 3 map/reduce kernels — the first on-chip run failed the
        # rowchain assert exactly this way (the 512^2 dry run hid it)
        inp = eg_input("inp")
        y, x = iters("y", "x")
        mx = Fun("mx")
        mx.maximize[y] = inp[y, x]
        mx.schedule(tile={"y": 32})
        y, x = iters("y", "x")
        sums = Fun("sums")
        sums[y] = exp(inp[y, x] - mx[y])
        sums.schedule(tile={"y": 32})
        y, x = iters("y", "x")
        out = Fun("out")
        out[y, x] = exp(inp[y, x] - mx[y]) / sums[y]
        out.schedule(tile={"y": 32})
        return compile(out.target("out"), backend="jax",
                       schedule_mode=mode, precision="default")

    shp = 512 if DRY else 4096
    v = rng.normal(size=(shp, shp)).astype(np.float32)
    # under force the 3 scheduled kernels now fuse into ONE row-chain
    # kernel (PallasRowChain) — this measures pallas_rowchain_gbps; the
    # ignore run gives xla_elementwise_gbps (per-kernel XLA lowering)
    times = {}
    for mode in ("ignore", "force"):
        model = softmax_model(mode)
        model.call("out", {"inp": v})  # compile + stats
        if mode == "force":
            ex = next(iter(model._executors.values()))
            assert ex.stats.get("pallas-rowchain") == 1, ex.stats
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                out = model.call("out", {"inp": v})
            _ = float(np.asarray(out).ravel()[0])
            best = min(best, (time.perf_counter() - t0) / 4)
        times[mode] = best
        print(f"softmax 4096x4096 mode={mode}: {best * 1e3:.2f} ms",
              flush=True)
    xla_bytes = v.nbytes * 4  # 3 kernels: ~2 reads + out + write
    fused_bytes = v.nbytes * 2  # one read + one write
    table.append(
        {
            "kernel": "softmax 4096x4096 (3 kernels vs fused row chain)",
            "xla_ms": times["ignore"] * 1e3,
            "fused_ms": times["force"] * 1e3,
            "xla_gbps": xla_bytes / times["ignore"] / 1e9,
            "fused_gbps": fused_bytes / times["force"] / 1e9,
            "fused_speedup": times["ignore"] / times["force"],
        }
    )
    constants["xla_elementwise_gbps"] = float(
        xla_bytes / times["ignore"] / 1e9
    )
    constants["pallas_rowchain_gbps"] = float(
        fused_bytes / times["force"] / 1e9
    )
    print(table[-1], flush=True)
    flush()

    # single (non-chaining) scheduled map/reduce kernel: a row reduction
    # whose output is the target — nothing to fuse with
    def rowsum_model(mode):
        inp = eg_input("inp")
        y, x = iters("y", "x")
        out = Fun("out")
        out[y] = exp(inp[y, x] * 0.25)
        out.schedule(tile={"y": 256})
        return compile(out.target("out"), backend="jax",
                       schedule_mode=mode, precision="default")

    times = {}
    for mode in ("ignore", "force"):
        model = rowsum_model(mode)
        model.call("out", {"inp": v})
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                out = model.call("out", {"inp": v})
            _ = float(np.asarray(out).ravel()[0])
            best = min(best, (time.perf_counter() - t0) / 4)
        times[mode] = best
        if mode == "force":
            ex = next(iter(model._executors.values()))
            assert ex.stats.get("pallas-mapreduce") == 1, ex.stats
        print(f"rowsum 4096x4096 mode={mode}: {best * 1e3:.2f} ms",
              flush=True)
    bytes_moved = v.nbytes  # one read dominates
    table.append(
        {
            "kernel": "exp-rowsum 4096x4096 (single scheduled kernel)",
            "xla_ms": times["ignore"] * 1e3,
            "pallas_ms": times["force"] * 1e3,
            "pallas_gbps": bytes_moved / times["force"] / 1e9,
        }
    )
    constants["pallas_elementwise_gbps"] = float(
        bytes_moved / times["force"] / 1e9
    )
    print("constants:", constants, flush=True)
    flush()
    if on_tpu:
        print("wrote exprgrad_tpu/backend/pallas_calibration.json",
              flush=True)


if __name__ == "__main__":
    main()
