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


def _time_chain(fn, x, iters=None, operands=()):
    """Median-of-5 per-iteration BODY seconds for ``fn`` via
    bench._chain_timer: a lax.fori_loop chain inside one jit, timed as
    the long-vs-short difference quotient with jitter-driven chain
    auto-scaling.  The r5 overhead experiment measured ~2.6 ms per
    chained *dispatch* through this tunnel, so the original harness
    (one jit of 8 unrolled steps, divided by 8) still carried ~3
    ms/iter of RTT + dispatch — every constant it produced was the
    tunnel, not the kernel.  Routing decides kernels that run INSIDE
    one compiled program, so body rates are the constants policy.py
    needs.  MEDIAN, not min: the difference of two fetches carries
    ~±3ms of symmetric jitter, and min-of-diffs is biased fast (the
    first body-rate run read 722 TFLOP/s at 1024^3 — 3.7x the v5e
    roofline — off exactly that bias)."""
    import bench as _bench

    if DRY:
        iters = 2
    elif iters is None:
        iters = 16
    timed = _bench._chain_timer(fn, x, iters, operands=operands)
    diffs = sorted(timed() for _ in range(5))
    return diffs[len(diffs) // 2]


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
        # iters x body must DWARF the ~±3ms fetch jitter (target
        # >=30ms of signal): bodies are ~15us / ~120us / ~1ms
        its = {1024: 2048, 2048: 256, 4096: 32}.get(size, 32)

        t_xla = _time_chain(
            lambda x: jnp.dot(
                x, x, preferred_element_type=jnp.float32
            ),
            a, iters=its,
        )
        blk = min(512, size)
        t_pl = _time_chain(
            lambda x: pallas_matmul(
                x, x, block_m=blk, block_n=blk, block_k=blk
            ),
            a, iters=its,
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
        # constants from the LARGEST measured size: routing matters for
        # big kernels (small ones are decided by pallas_launch_us), and
        # small-shape rows carry the most jitter
        constants["xla_matmul_tflops"] = float(mm_rates["xla"][-1])
        constants["pallas_matmul_tflops"] = float(mm_rates["pallas"][-1])
        flush()

    # --- launch overhead: tiny pallas kernel vs tiny XLA op -------------
    tiny = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
    # tiny bodies are ~2us: iters=4096 puts the launch-delta signal
    # (~4096 x launch_us) far above fetch jitter
    t_tiny_pl = _time_chain(
        lambda x: pallas_matmul(x, x, block_m=256, block_n=256, block_k=256),
        tiny, iters=4096,
    )
    t_tiny_xla = _time_chain(
        lambda x: jnp.dot(x, x, preferred_element_type=jnp.float32), tiny,
        iters=4096,
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

    def xla_attn(q, qa):
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
        lambda x, kv: flash_attention(x, kv, kv, causal=True), qa,
        iters=64, operands=(qa,),
    )
    t_xa = _time_chain(xla_attn, qa, iters=64, operands=(qa,))
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
    # Timed through the EXECUTOR with device-resident operands and a
    # scalar fence (bench.py's proven harnesses): the first on-chip run
    # timed model.call, whose numpy conversion transfers the full 67MB
    # input AND output over the tunnel every call — the measured
    # "bandwidth" (0.06 GB/s) was the link, not the kernel.
    import bench as _bench

    # 8192^2 (268MB): BOTH sides HBM-bound.  At 4096^2 the in-jit fori
    # carry (67MB) stays VMEM-resident for the pure-XLA body, which
    # read 1421 GB/s — 1.7x the HBM roofline, i.e. a VMEM-fed rate the
    # policy must NOT use for HBM-regime routing (custom calls always
    # round-trip HBM).
    sshp = 512 if DRY else 8192
    f_gbps, x_gbps, _samples = _bench.bench_softmax_fused(
        r=sshp, c=sshp, chain=2 if DRY else 48, reps=5)
    table.append(
        {
            "kernel": "softmax 8192x8192 (3 kernels vs fused row chain)",
            "xla_gbps": x_gbps,
            "fused_gbps": f_gbps,
            "fused_speedup": f_gbps / x_gbps,
        }
    )
    constants["xla_elementwise_gbps"] = float(x_gbps)
    constants["pallas_rowchain_gbps"] = float(f_gbps)
    print(table[-1], flush=True)
    flush()

    # single (non-chaining) scheduled map/reduce kernel: a row map
    # whose output is the target — nothing to fuse with.  Executor-
    # direct, chained via a tiny data-dependent correction (the
    # bench_scatter_add pattern); bytes = the one input read.
    from exprgrad_tpu import Fun, input as eg_input, iters, exp
    from exprgrad_tpu import compile as eg_compile
    from exprgrad_tpu.backend.executor import JaxExecutor
    from exprgrad_tpu.passes import infer_shapes

    shp = 512 if DRY else 8192  # HBM-bound (see softmax note above)
    y, x_ = iters("y", "x")
    out = Fun("out")
    out[y] = exp(eg_input("inp")[y, x_] * 0.25)
    out.schedule(tile={"y": 256})
    rmodel = eg_compile(out.target("out"), schedule_mode="force",
                        precision="default")
    rprog = rmodel.program
    in_id = rprog.inputs["inp"]
    out_id = rprog.targets["out"].output
    rshapes = infer_shapes(rprog, "out", [(in_id, [shp, shp])])
    rex = JaxExecutor(rprog, "out", rshapes, precision="default",
                      schedule_mode="force")
    vj = jnp.asarray(
        rng.normal(size=(shp, shp)).astype(np.float32))

    def rstep(t):
        return rex._fn({in_id: t}, 0, 0)[out_id]

    _ = float(jnp.sum(rstep(vj)))  # compile + warm; asserts routing
    assert rex.stats.get("pallas-mapreduce") == 1, rex.stats
    timed = _bench._chain_timer(
        lambda cur: cur + rstep(cur)[:, None] * 1e-30, vj,
        2 if DRY else 256)
    ts = sorted(timed() for _ in range(5))
    best = ts[len(ts) // 2]
    bytes_moved = vj.nbytes  # one read dominates
    table.append(
        {
            "kernel": "exp-rowmap 8192x8192 (single scheduled kernel)",
            "pallas_ms": best * 1e3,
            "pallas_gbps": bytes_moved / best / 1e9,
        }
    )
    constants["pallas_elementwise_gbps"] = float(
        bytes_moved / best / 1e9
    )
    print("constants:", constants, flush=True)
    flush()
    if on_tpu:
        print("wrote exprgrad_tpu/backend/pallas_calibration.json",
              flush=True)


if __name__ == "__main__":
    main()
