"""TPU benchmark driver.

Headline (printed as ONE json line): GFLOP/s of the compiler-generated
8192^3 matmul kernel — the reference's headline benchmark
(benchmarks/matmul/matmul_gpu.nim) rebuilt through the DSL -> IR -> XLA/MXU
pipeline.  Measured in f32 (DEFAULT matmul precision = bf16 passes with f32
accumulation) and in bf16, the TPU-native dtype; the faster one is the
headline, both go to BENCH_DETAILS.json.  ``vs_baseline`` is throughput
relative to the BASELINE.md target of 60% of the v5e MXU roofline
(197 TFLOP/s bf16-multiply/f32-accumulate).

Measurement notes: the TPU here sits behind a network tunnel with ~25ms
round-trip latency and unreliable block_until_ready, so kernels are timed
by chaining D data-dependent dispatches and fencing on one device->host
scalar fetch.  The persistent compilation cache must stay OFF (it hangs
this platform).  Details for all benchmarks go to BENCH_DETAILS.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# EG_DRY=1: execute the ENTIRE bench (every entry + all of main()'s
# report-building glue) on CPU with tiny shapes — flow proof only, so
# the driver's one real-chip run cannot die on a Python-level bug in
# code that never executed (this round's reworked entries had not).
# Artifacts go to /tmp; the headline line still prints.
DRY = os.environ.get("EG_DRY") == "1"


def _fetch(x) -> float:
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32)))


def _chain_timer(make_next, x0, chain, short=None, min_signal_s=0.03,
                 operands=()):
    """Build a ``timed() -> seconds-per-iteration`` closure that chains
    ``make_next`` INSIDE one jit (lax.fori_loop) and reports the
    long-minus-short difference quotient.

    ``operands``: device arrays the step needs beyond the loop carry.
    Pass them HERE, not via closure — jit embeds closed-over arrays as
    HLO literals and this tunnel ships the serialized module to a
    remote compile endpoint: a closed-over 256MB matmul operand 413'd
    it outright, and 134MB attention closures shipped for minutes per
    config.  ``make_next`` is called as ``make_next(cur, *operands)``.

    Chained *separate* dispatches cannot resolve kernel bodies through
    this tunnel: the overhead experiment measured ~2.6 ms per chained
    dispatch (BENCH_DETAILS pallas_overhead_experiment), so e.g. einsum
    at 4096^3 read 39 TFLOP/s regardless of chain length.  One jit pays
    dispatch + RTT once per call, and the (short+chain)-vs-short
    difference cancels them exactly, so both sides of every ratio
    resolve their true body rate."""
    import jax
    import jax.numpy as jnp

    short = short or max(1, chain // 8)
    # dynamic trip count: ONE compile serves both lengths (tunnel
    # compiles are 25s-5min; the sweep scripts time dozens of configs)
    f = jax.jit(lambda x, n, *ops: jax.lax.fori_loop(
        0, n, lambda i, c: make_next(c, *ops), x))
    n_s = jnp.asarray(short, jnp.int32)
    n_l = jnp.asarray(short + chain, jnp.int32)
    _fetch(f(x0, n_s, *operands))  # compile + warm
    _fetch(f(x0, n_l, *operands))

    def timed():
        t0 = time.perf_counter()
        _fetch(f(x0, n_s, *operands))
        t1 = time.perf_counter()
        _fetch(f(x0, n_l, *operands))
        t2 = time.perf_counter()
        return max((t2 - t1) - (t1 - t0), 1e-7) / chain

    # auto-scale: fast bodies (big-block kernels) can leave the
    # long-minus-short signal under the ~±3ms fetch jitter, where the
    # quotient reads pure noise (a 100 TFLOP/s attention config rode a
    # 1.7ms signal).  The trip count is dynamic, so growing the chain
    # costs no recompile; a garbage-low pilot just lands on the cap,
    # which only costs ~min_signal of extra device time per rep.
    pilot = timed()
    if pilot * chain < min_signal_s:
        chain = min(65536, int(min_signal_s / max(pilot, 1e-6)) + 1)
        n_l = jnp.asarray(short + chain, jnp.int32)
        _fetch(f(x0, n_l, *operands))  # warm the new length
    return timed


def _spread(samples: list) -> dict:
    """min/median/max summary for repeated measurements — the r->r drift
    classifier (VERDICT r3 #9: headline entries carry spread so tunnel
    noise is distinguishable from regressions)."""
    s = sorted(samples)
    return {
        "min": round(s[0], 2),
        "median": round(s[len(s) // 2], 2),
        "max": round(s[-1], 2),
        "samples": [round(v, 2) for v in s],
    }


def bench_matmul(n: int = 8192, dtype: str = "float32",
                 precision: str = "default", chain: int = 30):
    """Time the DSL-compiled matmul kernel on device."""
    import jax
    import ml_dtypes  # noqa: F401  (registers bfloat16 with numpy)

    from exprgrad_tpu import Fun, compile, input, iters as dsl_iters
    from exprgrad_tpu.backend.executor import JaxExecutor
    from exprgrad_tpu.passes import infer_shapes

    y, x, it = dsl_iters("y", "x", "it")
    c = Fun("c")
    c[y, x] = input("a")[y, it] * input("b")[it, x]
    model = compile(c.target("c"), dtype=dtype, precision=precision)
    program = model.program
    a_id, b_id = program.inputs["a"], program.inputs["b"]
    out_id = program.targets["c"].output
    shapes = infer_shapes(program, "c", [(a_id, [n, n]), (b_id, [n, n])])
    executor = JaxExecutor(program, "c", shapes, precision=precision)

    rng = np.random.default_rng(0)
    scale = 1.0 / np.sqrt(n)
    a = jax.device_put((rng.normal(size=(n, n)) * scale).astype(dtype))
    b = jax.device_put((rng.normal(size=(n, n)) * scale).astype(dtype))

    def step(lhs, rhs):
        return executor._fn({a_id: lhs, b_id: rhs}, 0, 0)[out_id]

    # in-jit fori chain + difference quotient (_chain_timer): 30
    # chained *dispatches* each paid ~2.6ms of tunnel floor on top of a
    # ~7ms body at 8192^3 — the r4 headline (164 TFLOP/s) understated
    # the kernel body by that additive.  b rides as an operand: closed
    # over, its 256MB literal 413'd the remote compile endpoint
    timed = _chain_timer(step, a, chain, operands=(b,))
    rates = []
    elapsed = []
    for _ in range(3):
        dt = timed()
        elapsed.append(dt)
        rates.append(2 * n**3 / dt / 1e9)
    rates_sorted = sorted(rates)
    med = rates_sorted[len(rates_sorted) // 2]
    return med, sorted(elapsed)[len(elapsed) // 2], rates


def bench_matmul_scheduled(n: int = 4096, chain: int = 32, reps: int = 3):
    """The schedule-driven Pallas matmul vs the einsum path at the SAME
    size through the compiled executor (VERDICT r3 #1's done criterion:
    scheduled within 2x of einsum, or the measured gap on record).

    Methodology (r5): the chain is a lax.fori_loop INSIDE one jit and
    the sample is the long-minus-short difference quotient.  Chaining
    separate dispatches (the r4 harness) cannot resolve the kernel body
    here: the overhead experiment measured ~2.6 ms per chained dispatch
    through this tunnel, so at 4096^3 einsum read 39 TFLOP/s however
    long the chain (VERDICT r4 weak #2).  In-jit chaining pays dispatch
    + RTT once per call, and the (short+chain)-vs-short difference
    cancels them exactly — both paths resolve their true body rate.
    Values grow ~2x per unscaled matmul power-step, so keep
    short+chain <= ~60 for f32 range.

    Returns (pallas_gflops, einsum_gflops, pallas_samples)."""
    import jax

    from exprgrad_tpu import Fun, compile, input, iters as dsl_iters
    from exprgrad_tpu.backend.executor import JaxExecutor
    from exprgrad_tpu.passes import infer_shapes

    rng = np.random.default_rng(0)
    scale = 1.0 / np.sqrt(n)
    a = jax.device_put((rng.normal(size=(n, n)) * scale).astype(np.float32))
    b = jax.device_put((rng.normal(size=(n, n)) * scale).astype(np.float32))

    def build(schedule: bool):
        y, x, it = dsl_iters("y", "x", "it")
        c = Fun("c")
        c[y, x] = input("a")[y, it] * input("b")[it, x]
        if schedule:
            t = min(512, n)
            c.schedule(tile={"y": t, "x": t, "it": t},
                       parallel=["y", "x"])
        model = compile(c.target("c"),
                        schedule_mode="force" if schedule else "ignore",
                        precision="default")
        program = model.program
        a_id, b_id = program.inputs["a"], program.inputs["b"]
        out_id = program.targets["c"].output
        shapes = infer_shapes(program, "c",
                              [(a_id, [n, n]), (b_id, [n, n])])
        ex = JaxExecutor(program, "c", shapes, precision="default",
                         schedule_mode="force" if schedule else "ignore")
        return (lambda lhs, rhs: ex._fn({a_id: lhs, b_id: rhs}, 0, 0)
                [out_id]), ex

    def rate(step):
        timed = _chain_timer(step, a, chain, operands=(b,))
        return [2 * n**3 / timed() / 1e9 for _ in range(reps)]

    step_pl, ex_pl = build(True)
    pl_samples = rate(step_pl)
    assert ex_pl.stats.get("pallas") == 1, ex_pl.stats
    step_xla, _ = build(False)
    xla_samples = rate(step_xla)
    med = lambda s: sorted(s)[len(s) // 2]
    return med(pl_samples), med(xla_samples), pl_samples


def bench_scatter_add(n: int = 16384, v: int = 2048, d: int = 512,
                      chain: int = 8, reps: int = 3):
    """Embedding-gradient scatter-add (demb[tok[i], d] += g[i, d]):
    the scheduled Pallas kernel (one-hot MXU contraction, whole-resident
    table rows) vs the SAME program on the XLA scatter path.  Scatter is
    the classic TPU weak spot the one-hot-matmul trick exists for.

    Returns (pallas_ms, xla_ms, pallas_samples)."""
    import jax

    from exprgrad_tpu import (
        Fun, compile, input, iters as dsl_iters, to_index,
    )
    from exprgrad_tpu.backend.executor import JaxExecutor
    from exprgrad_tpu.passes import infer_shapes

    rng = np.random.default_rng(0)
    toks = jax.device_put(
        rng.integers(0, v, size=(n,)).astype(np.float32))
    vals = jax.device_put(
        (rng.normal(size=(n, d)) / np.sqrt(d)).astype(np.float32))

    def build(schedule: bool):
        i, x = dsl_iters("i", "x")
        tok, g = input("tok"), input("g")
        out = Fun("demb")
        out[to_index(tok[i]), x] = g[i, x]
        out.with_shape([v, d])
        if schedule:
            out.schedule(tile={"i": min(512, n), "x": min(256, d)})
        model = compile(out.target("demb"),
                        schedule_mode="force" if schedule else "ignore",
                        precision="default")
        program = model.program
        t_id, g_id = program.inputs["tok"], program.inputs["g"]
        out_id = program.targets["demb"].output
        shapes = infer_shapes(program, "demb",
                              [(t_id, [n]), (g_id, [n, d])])
        ex = JaxExecutor(program, "demb", shapes, precision="default",
                         schedule_mode="force" if schedule else "ignore")
        return lambda gv: ex._fn({t_id: toks, g_id: gv}, 0, 0)[out_id], ex

    def rate(step):
        # data-dependent perturbation keeps the in-jit chain honest
        timed = _chain_timer(
            lambda cur: cur + step(cur)[:1, :1] * 1e-30, vals, chain)
        return [timed() * 1e3 for _ in range(reps)]

    step_pl, ex_pl = build(True)
    pl_samples = rate(step_pl)
    assert ex_pl.stats.get("pallas-mapreduce") == 1, ex_pl.stats
    step_xla, _ = build(False)
    xla_samples = rate(step_xla)
    med = lambda s: sorted(s)[len(s) // 2]
    return med(pl_samples), med(xla_samples), pl_samples


def bench_softmax_fused(r: int = 8192, c: int = 8192, chain: int = 24,
                        reps: int = 3):
    """The fused row-chain softmax (PallasRowChain: one kernel, VMEM-
    resident row max/sums, ONE HBM read of the input) vs the same
    3-kernel DSL program on the XLA path.  Row ops are bandwidth-bound,
    so this is where a scheduled custom kernel beats XLA's fusion
    (which re-reads the input per reduction pass).

    Returns (fused_gbps, xla_gbps, fused_samples)."""
    import jax

    from exprgrad_tpu import Fun, compile, exp, input
    from exprgrad_tpu import iters as dsl_iters
    from exprgrad_tpu.backend.executor import JaxExecutor
    from exprgrad_tpu.passes import infer_shapes

    rng = np.random.default_rng(0)
    v = jax.device_put(rng.normal(size=(r, c)).astype(np.float32))

    def build(schedule: bool):
        inp = input("inp")
        y, x = dsl_iters("y", "x")
        mx = Fun("mx")
        mx.maximize[y] = inp[y, x]
        y, x = dsl_iters("y", "x")
        sums = Fun("sums")
        sums[y] = exp(inp[y, x] - mx[y])
        y, x = dsl_iters("y", "x")
        out = Fun("out")
        out[y, x] = exp(inp[y, x] - mx[y]) / sums[y]
        if schedule:
            for f in (mx, sums, out):
                f.schedule(tile={"y": 32})
        model = compile(out.target("out"),
                        schedule_mode="force" if schedule else "ignore",
                        precision="default")
        program = model.program
        in_id = program.inputs["inp"]
        out_id = program.targets["out"].output
        shapes = infer_shapes(program, "out", [(in_id, [r, c])])
        ex = JaxExecutor(program, "out", shapes, precision="default",
                         schedule_mode="force" if schedule else "ignore")
        return lambda t: ex._fn({in_id: t}, 0, 0)[out_id], ex

    bytes_per = 2 * r * c * 4  # ideal: one f32 read + one f32 write

    def rate(step):
        # data-dependent: softmax of softmax
        timed = _chain_timer(step, v, chain)
        samples = [bytes_per / timed() / 1e9 for _ in range(reps)]
        return samples

    step_f, ex_f = build(True)
    fused_samples = rate(step_f)
    assert ex_f.stats.get("pallas-rowchain") == 1, ex_f.stats
    step_x, _ = build(False)
    xla_samples = rate(step_x)
    med = lambda s: sorted(s)[len(s) // 2]
    return med(fused_samples), med(xla_samples), fused_samples


def bench_conv2(batch=32, size=64, cin=128, cout=128, k=3,
                dtype="float32", chains=(20, 120), reps=7):
    """Compute-bound conv characterization (honest MFU).

    Each measurement is ONE dispatch running a data-dependent feedback
    chain of convolutions (conv -> pad back to input size -> conv ...) so
    per-conv cost cannot hide behind parallel scheduling, and the timing
    is taken as the DIFFERENCE between a long and a short chain — the
    ~25ms tunnel round-trip and dispatch overheads cancel exactly.  The
    same two-length protocol runs the compiler's lowering and a raw
    ``lax.conv_general_dilated`` loop, so the "zero compiler overhead"
    claim is a measured number, not an assertion.

    Returns (gflops, seconds_per_conv, raw_gflops).
    """
    import functools

    import jax
    import jax.numpy as jnp

    from exprgrad_tpu import compile, input
    from exprgrad_tpu.backend.executor import JaxExecutor
    from exprgrad_tpu.layers import conv2
    from exprgrad_tpu.passes import infer_shapes

    net = conv2(input("images"), input("filters")).target("out")
    model = compile(net, dtype=dtype, precision="default")
    program = model.program
    img_id = program.inputs["images"]
    flt_id = program.inputs["filters"]
    out_id = program.targets["out"].output
    shapes = infer_shapes(
        program,
        "out",
        [(img_id, [batch, size, size, cin]), (flt_id, [cout, k, k, cin])],
    )
    executor = JaxExecutor(program, "out", shapes, precision="default")
    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.normal(size=(batch, size, size, cin)).astype(dtype)
    )
    # unit-variance-preserving filters keep the chained values bounded
    filters = jax.device_put(
        (rng.normal(size=(cout, k, k, cin)) / np.sqrt(k * k * cin)).astype(
            dtype
        )
    )
    pad = k - 1

    def chain_compiled(images, filters, n):
        def body(imgs, _):
            out = executor.run_fn(
                {img_id: imgs, flt_id: filters}, 0, 0
            )[out_id]
            nxt = jnp.pad(out, ((0, 0), (0, pad), (0, pad), (0, 0)))
            return nxt.astype(imgs.dtype), None

        final, _ = jax.lax.scan(body, images, None, length=n)
        return jnp.sum(final.astype(jnp.float32))

    def chain_raw(images, filters, n):
        flt = jnp.transpose(filters, (1, 2, 3, 0))  # HWIO

        def body(imgs, _):
            out = jax.lax.conv_general_dilated(
                imgs, flt, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            nxt = jnp.pad(out, ((0, 0), (0, pad), (0, pad), (0, 0)))
            return nxt.astype(imgs.dtype), None

        final, _ = jax.lax.scan(body, images, None, length=n)
        return jnp.sum(final.astype(jnp.float32))

    def make_pair(fn):
        short = jax.jit(functools.partial(fn, n=chains[0]))
        long = jax.jit(functools.partial(fn, n=chains[1]))
        float(short(images, filters))  # compile + warmup
        float(long(images, filters))
        return short, long

    def timed(f):
        t = time.perf_counter()
        float(f(images, filters))
        return time.perf_counter() - t

    # interleave compiled/raw reps round-robin so slow tunnel drift hits
    # both paths equally — the r2->r3 "compiler overhead" swing (-15.9%
    # -> +6.8% on identical code) was exactly this drift
    cl_s, cl_l = make_pair(chain_compiled)
    raw_s, raw_l = make_pair(chain_raw)
    times: dict[str, list] = {"cs": [], "cl": [], "rs": [], "rl": []}
    for _ in range(reps):
        times["cs"].append(timed(cl_s))
        times["rs"].append(timed(raw_s))
        times["cl"].append(timed(cl_l))
        times["rl"].append(timed(raw_l))

    span = chains[1] - chains[0]

    def per_step(short_key, long_key):
        diff = min(times[long_key]) - min(times[short_key])
        if diff <= 0:  # timing noise swamped the difference (tiny shapes)
            return min(times[long_key]) / chains[1], []
        # spread samples subtract min(short), NOT the paired short rep:
        # pairing let one anomalously slow short rep manufacture a tiny
        # difference and an above-roofline rate (r4: conv2_bf16 "raw"
        # sample at 306 TFLOP/s > the 197 roofline).  Against min(short),
        # a slow long rep reads as a LOW rate — noise can only deflate.
        s_min = min(times[short_key])
        samples = [
            (l - s_min) / span for l in times[long_key] if l > s_min
        ]
        return diff / span, samples

    per_conv, conv_samples = per_step("cs", "cl")
    per_conv_raw, raw_samples = per_step("rs", "rl")
    out_hw = size - k + 1
    flops = 2 * batch * out_hw * out_hw * cout * k * k * cin
    spread = {
        "compiled_gflops": _spread(
            [flops / t / 1e9 for t in conv_samples] or [flops / per_conv / 1e9]
        ),
        "raw_gflops": _spread(
            [flops / t / 1e9 for t in raw_samples]
            or [flops / per_conv_raw / 1e9]
        ),
    }
    return flops / per_conv / 1e9, per_conv, flops / per_conv_raw / 1e9, spread


def bench_attention(b=8, h=4, s=2048, d=128, causal=True, chain=10):
    """Fused flash attention (Pallas) vs plain-XLA attention, forward.

    The measured shape->rate table that decides the attention impl
    routing (backend/policy.py attention()).  Chained data-dependent
    dispatches; flops = 4*b*h*s^2*d (two s x s x d contractions), halved
    for the causal mask's skipped tiles.
    """
    import functools

    import jax
    import jax.numpy as jnp

    from exprgrad_tpu.ops.attention import flash_attention

    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.normal(size=(b, h, s, d)).astype(np.float32) * 0.1
    )
    q, k, v = mk(), mk(), mk()

    def xla_attn(q, k, v):
        s_ = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (1.0 / np.sqrt(d))
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, s_.shape[-2:], 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, s_.shape[-2:], 1)
            s_ = jnp.where(rows >= cols, s_, -1e30)
        p = jax.nn.softmax(s_, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    flash = functools.partial(flash_attention, causal=causal)

    flops = 4 * b * h * s * s * d * (0.5 if causal else 1.0)
    # in-jit fori chains + difference quotient (_chain_timer): the
    # ~2.6ms dispatch floor previously rode inside BOTH rates and
    # biased the ratio toward 1.0; interleaved reps: drift hits both
    # impls equally
    tf = _chain_timer(lambda cur, kk, vv: flash(cur, kk, vv), q, chain,
                      operands=(k, v))
    tx = _chain_timer(lambda cur, kk, vv: xla_attn(cur, kk, vv), q, chain,
                      operands=(k, v))
    fl, xl = [], []
    for _ in range(3):
        fl.append(tf())
        xl.append(tx())
    spread = {
        "flash_gflops": _spread([flops / t / 1e9 for t in fl]),
        "xla_gflops": _spread([flops / t / 1e9 for t in xl]),
    }
    # median, not min: the difference quotient carries symmetric fetch
    # jitter, and min-of-diffs is biased fast (above-roofline readings)
    med = lambda ts: sorted(ts)[len(ts) // 2]
    return flops / med(fl) / 1e9, flops / med(xl) / 1e9, spread


def bench_serving(vocab=2048, dim=512, heads=4, hidden=2048, blocks=2,
                  batch=8, prompt_len=128, n_lo=8, n_new=128, reps=3,
                  cache_dtype=None, weight_dtype=None):
    """FlashLMServer decode throughput: generated tokens per second for a
    batch of prompts through the scanned KV-cache loop (weights random —
    throughput is weight-agnostic).

    The per-decode-step cost is the two-length difference quotient
    ``(T(n_new) - T(n_lo)) / (n_new - n_lo)``: both runs pay the same
    prefill, dispatch, and tunnel round-trip, so those cancel exactly
    (round 2's prefill-subtraction clamp reported 0.0 under timing noise
    — a broken number; this difference spans (n_new - n_lo) steps so the
    noise is divided down instead).  Returns
    (tokens_per_s, step_ms_or_None, t_lo, t_hi)."""
    import jax
    import jax.numpy as jnp

    from exprgrad_tpu import compile as eg_compile
    from exprgrad_tpu.models import FlashLMServer, flash_transformer

    model = eg_compile(
        flash_transformer(vocab=vocab, dim=dim, heads=heads, hidden=hidden,
                          blocks=blocks, max_seq=prompt_len + n_new),
        seed=0, precision="default",
    )
    dtype = (
        jnp.bfloat16 if cache_dtype is None else jnp.dtype(cache_dtype)
    )
    server = FlashLMServer(model, cache_dtype=dtype,
                           weight_dtype=weight_dtype)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, vocab, (batch, prompt_len)).astype(np.float32)

    def timed(k):
        _fetch(server.generate(prompt, n_new=k))   # compile + warmup
        best = float("inf")
        for _ in range(reps):
            t = time.perf_counter()
            _fetch(server.generate(prompt, n_new=k))
            best = min(best, time.perf_counter() - t)
        return best

    t_hi = timed(n_new)
    t_lo = timed(n_lo)
    diff = t_hi - t_lo
    step_ms = diff / (n_new - n_lo) * 1e3 if diff > 0 else None
    toks = batch * n_new
    return toks / t_hi, step_ms, t_lo, t_hi


def bench_continuous_batching(vocab=2048, dim=512, heads=4, hidden=2048,
                              blocks=2, slots=8, capacity=320, chunk=32,
                              n_requests=12):
    """Continuous batching under a staggered request mix: paged KV pool
    at HALF the dense reservation, multi-step scheduling (``chunk``
    decode steps per dispatch), varied prompt lengths and budgets.

    Returns (tokens_per_s, requests_per_s, generated_tokens, stats).
    Aligned-batch ceiling for the same model is ``serving_decode``."""
    import jax.numpy as jnp  # noqa: F401

    from exprgrad_tpu import compile as eg_compile
    from exprgrad_tpu.models import (
        ContinuousBatcher, FlashLMServer, flash_transformer,
    )

    model = eg_compile(
        flash_transformer(vocab=vocab, dim=dim, heads=heads, hidden=hidden,
                          blocks=blocks, max_seq=capacity),
        seed=0, precision="default",
    )
    server = FlashLMServer(model)
    rng = np.random.default_rng(0)
    sizes = rng.integers(48, 160, n_requests)
    budgets = rng.integers(32, 96, n_requests)

    def drive():
        b = ContinuousBatcher(
            server, slots=slots, capacity=capacity, paged=True,
            page_size=32,
            pool_pages=slots * (capacity // 32) // 2,
            decode_chunk=chunk,
            prompt_buckets=(192,),
        )
        # stagger: half up front, the rest trickle in while decoding
        for i in range(n_requests // 2):
            b.submit(rng.integers(0, vocab, sizes[i]).astype(np.float32),
                     int(budgets[i]))
        out = {}
        i = n_requests // 2
        while len(out) < n_requests:
            if i < n_requests:
                b.submit(rng.integers(0, vocab, sizes[i]).astype(
                    np.float32), int(budgets[i]))
                i += 1
            for rid, toks in b.step():
                out[rid] = toks
        return out, b.stats

    drive()  # compile + warmup every bucket/chunk program
    t = time.perf_counter()
    out, stats = drive()
    dt = time.perf_counter() - t
    generated = sum(len(v) for v in out.values())
    return generated / dt, n_requests / dt, generated, stats


def bench_batching_steady(vocab=2048, dim=512, heads=4, hidden=2048,
                          blocks=2, slots=8, capacity=None, prompt_len=64,
                          budget=1024,
                          configs=((1, 0), (8, 0), (32, 0), (32, 4),
                                   (128, 0), (128, 1))):
    """Steady-state continuous-batching overhead (VERDICT r3 #8, r4 #6):
    every slot saturated, queue empty, NO admissions inside the timed
    window — the per-decode-step cost is pure scheduler + dispatch
    overhead over the solo aligned-batch ceiling (``serving_decode``'s
    ms_per_decode_step).  Swept over ``decode_chunk`` to justify the
    default.

    r4 found the per-dispatch cost CONSTANT (~27.5ms) across chunk
    sizes — i.e. one host round trip per dispatch (the scheduler must
    read the chunk's tokens back for stop detection / page allocation),
    not scheduler compute.  So the sweep now (a) extends to chunk=128,
    which amortizes the round trip toward the solo ceiling, (b)
    decomposes the dispatch cost: a raw device->host round-trip probe
    is measured on the same connection and reported alongside, so the
    floor is attributed per component (rtt / device steps / host
    scheduling remainder), and (c) sweeps ``pipeline=`` — pipelined
    chunk dispatches chained device-side so the token readbacks of
    consecutive chunks overlap instead of serializing one round trip
    per dispatch.

    ``configs`` are (decode_chunk, pipeline) pairs; pipeline variants
    reuse the chunk's compiled program (no extra compile).  Returns
    ({"chunk[+pipeN]": (tokens_per_s, ms_per_step, ms_per_dispatch)},
    rtt_probe_ms)."""
    import jax
    import jax.numpy as jnp

    from exprgrad_tpu import compile as eg_compile
    from exprgrad_tpu.models import (
        ContinuousBatcher, FlashLMServer, flash_transformer,
    )

    # resolve BEFORE the compile: max_seq=None crashed the whole section
    # (caught by the EG_DRY run — the default invocation passes no
    # capacity, so the driver's real-chip bench would have lost it too)
    capacity = capacity or prompt_len + budget
    model = eg_compile(
        flash_transformer(vocab=vocab, dim=dim, heads=heads, hidden=hidden,
                          blocks=blocks, max_seq=capacity),
        seed=0, precision="default",
    )
    server = FlashLMServer(model)
    rng = np.random.default_rng(0)

    # raw round-trip probe: upload a few small arrays (the dispatch's
    # host scalars) + fetch a tiny result — the per-dispatch floor that
    # is connection latency, not batcher work
    tiny = jax.jit(lambda a, b: (a + b)[:4])
    _ = np.asarray(tiny(np.zeros(8, np.float32), np.ones(8, np.float32)))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(
            tiny(np.zeros(8, np.float32), np.ones(8, np.float32))
        )
        rtts.append(time.perf_counter() - t0)
    rtt_ms = sorted(rtts)[len(rtts) // 2] * 1e3

    out = {}
    for chunk, pipeline in configs:
        b = ContinuousBatcher(
            server, slots=slots, capacity=capacity, paged=True,
            page_size=32, pool_pages=slots * (-(-capacity // 32)),
            decode_chunk=chunk, pipeline=pipeline,
        )
        for _ in range(slots):
            b.submit(
                rng.integers(0, vocab, prompt_len).astype(np.float32),
                budget,
            )
        b.step()  # admissions + prefill + first dispatch (compiles)
        b.step()  # settle: every program compiled, all slots decoding
        for _ in range(pipeline):
            b.step()  # fill the pipe before the timed window
        # timed window: long enough to see overlap, short enough that no
        # budget exhausts inside it OR inside the speculative in-flight
        # chunks issued during it (admission emitted 1 token; settle +
        # fill spent (1 + pipeline) chunks; the pipe keeps up to
        # `pipeline` extra chunks issued beyond the drained frontier)
        window = min(max(2 + pipeline, 64 // chunk),
                     (budget - 1) // chunk - 1 - 2 * pipeline)
        if window <= 0:  # config infeasible at this budget: skip, don't
            continue     # divide by zero steps below
        steps0 = b.stats["decode_steps"]
        d0 = b.stats["dispatches"]
        t = time.perf_counter()
        for _ in range(window):
            b.step()
        dt = time.perf_counter() - t
        # sized as above, no request finishes in the window and the pipe
        # depth is constant across it, so issued == drained and
        # slots*steps equals the tokens actually emitted
        steady = bool(b.active.all())
        steps = b.stats["decode_steps"] - steps0
        dispatches = max(1, b.stats["dispatches"] - d0)
        toks = slots * steps
        key = f"{chunk}+pipe{pipeline}" if pipeline else str(chunk)
        out[key] = (toks / dt, dt / steps * 1e3,
                    dt / dispatches * 1e3, steady)
    return out, rtt_ms


def bench_speculative(vocab=2048, dim=512, heads=4, hidden=2048,
                      blocks=2, prompt_len=64, n_new=128, k=4, reps=3):
    """Speculative decoding wall time vs plain greedy (batch 1).

    Draft = 1-block dim/4 model (random weights: acceptance is the
    worst case, so the measured speedup is a floor; trained drafts
    accept more).  Output is exact either way.  Returns
    (plain_tok_s, spec_tok_s, target_steps)."""
    import jax.numpy as jnp  # noqa: F401

    from exprgrad_tpu import compile as eg_compile
    from exprgrad_tpu.models import FlashLMServer, flash_transformer

    target = FlashLMServer(eg_compile(
        flash_transformer(vocab=vocab, dim=dim, heads=heads, hidden=hidden,
                          blocks=blocks, max_seq=prompt_len + n_new + k),
        seed=0, precision="default",
    ))
    draft = FlashLMServer(eg_compile(
        flash_transformer(vocab=vocab, dim=dim // 4, heads=heads,
                          hidden=hidden // 4,
                          max_seq=prompt_len + n_new + k),
        seed=1, precision="default",
    ))
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, vocab, (1, prompt_len)).astype(np.float32)

    def timed(fn):
        fn()
        best = float("inf")
        for _ in range(reps):
            t = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t)
        return best

    t_plain = timed(lambda: _fetch(target.generate(prompt, n_new=n_new)))
    steps_holder = {}

    def spec():
        out, steps = target.generate_speculative(draft, prompt,
                                                 n_new=n_new, k=k)
        steps_holder["steps"] = int(steps)
        _fetch(out)

    t_spec = timed(spec)
    return n_new / t_plain, n_new / t_spec, steps_holder["steps"]


def bench_speculative_trained(prompt_len=64, n_new=128, ks=(4, 12),
                              reps=3):
    """Speculative decoding with the committed TRAINED draft
    (benchmarks/spec_pair, produced by scripts/train_spec_pair.py): both
    models learned the same deterministic successor task, so greedy
    agreement ~1 and acceptance approaches the ceiling — the measured
    BEST case, alongside bench_speculative's random-draft worst-case
    floor.

    Sweeps ``k`` and measures the per-step COST SPLIT (VERDICT r4 #4):
    at this scale every model pass is op-latency-bound, so the dim64
    draft step costs a large fraction of the dim256 target step and k=4
    cannot win even at perfect acceptance (round = 4*c_draft + c_verify
    for <=4 tokens); a larger k amortizes the verify against the same
    near-1 acceptance.  c_draft is measured directly (draft plain
    generate); c_verify is implied (round cost - k*c_draft).

    Returns (plain_tok_s, {k: (spec_tok_s, verify_steps, accepted)},
    split_dict)."""
    import jax.numpy as jnp  # noqa: F401

    from exprgrad_tpu import compile as eg_compile
    from exprgrad_tpu.io import import_params_npz
    from exprgrad_tpu.models import FlashLMServer, flash_transformer

    # MUST match scripts/train_spec_pair.py TARGET_CFG/DRAFT_CFG (same
    # program => same tensor ids for the npz import); do not import that
    # module here — it pins jax to CPU at import time.
    vocab, max_seq = 256, 256
    target_model = eg_compile(
        flash_transformer(vocab=vocab, dim=256, heads=4, hidden=1024,
                          blocks=2, max_seq=max_seq, eta=0.01),
        seed=0, precision="default",
    )
    draft_model = eg_compile(
        flash_transformer(vocab=vocab, dim=64, heads=4, hidden=256,
                          blocks=1, max_seq=max_seq, eta=0.01),
        seed=1, precision="default",
    )
    here = os.path.dirname(os.path.abspath(__file__))
    import_params_npz(
        target_model, os.path.join(here, "benchmarks/spec_pair/target.npz")
    )
    import_params_npz(
        draft_model, os.path.join(here, "benchmarks/spec_pair/draft.npz")
    )
    target = FlashLMServer(target_model)
    draft = FlashLMServer(draft_model)

    # prompt follows the training task's successor chain (fixed seed 7,
    # scripts/train_spec_pair.py make_perm) so generation is on-task
    perm = np.random.default_rng(7).permutation(vocab)
    chain_toks = np.empty(prompt_len, np.int64)
    chain_toks[0] = 3
    for t in range(1, prompt_len):
        chain_toks[t] = perm[chain_toks[t - 1]]
    prompt = chain_toks[None, :].astype(np.float32)

    def timed(fn):
        fn()
        best = float("inf")
        for _ in range(reps):
            t = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t)
        return best

    t_plain = timed(lambda: _fetch(target.generate(prompt, n_new=n_new)))
    t_draft = timed(lambda: _fetch(draft.generate(prompt, n_new=n_new)))
    per_k = {}
    split = {
        "plain_step_ms": round(t_plain / n_new * 1e3, 4),
        "draft_step_ms": round(t_draft / n_new * 1e3, 4),
        "draft_cost_ratio": round(t_draft / t_plain, 3),
    }
    for k in ks:
        holder = {}

        def spec():
            out, steps = target.generate_speculative(draft, prompt,
                                                     n_new=n_new, k=k)
            holder["steps"] = int(steps)
            _fetch(out)

        t_spec = timed(spec)
        steps = holder["steps"]
        accepted = (n_new - steps) / max(1, steps)  # extra per round
        per_k[k] = (n_new / t_spec, steps, accepted)
        # implied verify cost: round = k*c_draft + c_verify + overhead
        round_ms = t_spec / max(1, steps) * 1e3
        split[f"k{k}_round_ms"] = round(round_ms, 4)
        split[f"k{k}_verify_ms_implied"] = round(
            round_ms - k * t_draft / n_new * 1e3, 4
        )
    # break-even draft cost at perfect acceptance: k*c_d + c_v < k*c_p
    cv = split.get(f"k{ks[0]}_verify_ms_implied", 0.0)
    cp = split["plain_step_ms"]
    split["breakeven_draft_cost_ratio_at_k"] = {
        k: round(max(0.0, (k * cp - cv) / (k * cp)), 3) for k in ks
    }
    return n_new / t_plain, per_k, split


def bench_speculative_lookup(prompt_len=64, n_new=128, ks=(4, 8, 16),
                             reps=3):
    """Prompt-lookup speculative decoding (generate_lookup): DRAFT-FREE
    proposals from the token history, verified k-wide — the speculation
    variant whose per-round cost is ONE verify step, no draft model.

    Uses the committed trained target (benchmarks/spec_pair): its task
    is a permutation-successor chain, and the fixed permutation (seed 7)
    has an 11-cycle — a prompt walking that cycle makes the greedy
    continuation periodic, the regime lookup serves (repetitive /
    templated / retrieval-copy text).  Acceptance ~1, so the measured
    speedup isolates verify-vs-decode cost, the quantity the draft-model
    variant could never win at serving scale (speculative_decoding_trained cost_split:
    the dim64 draft step costs a large fraction of a target step).

    Returns (plain_tok_s, {k: (tok_s, verify_steps)})."""
    from exprgrad_tpu import compile as eg_compile
    from exprgrad_tpu.io import import_params_npz
    from exprgrad_tpu.models import FlashLMServer, flash_transformer

    vocab, max_seq = 256, 256
    target_model = eg_compile(
        flash_transformer(vocab=vocab, dim=256, heads=4, hidden=1024,
                          blocks=2, max_seq=max_seq, eta=0.01),
        seed=0, precision="default",
    )
    here = os.path.dirname(os.path.abspath(__file__))
    import_params_npz(
        target_model, os.path.join(here, "benchmarks/spec_pair/target.npz")
    )
    target = FlashLMServer(target_model)

    # walk the permutation's 11-cycle (token 26; scripts/train_spec_pair
    # make_perm seed 7): the prompt holds ~6 periods, generation
    # continues the cycle, lookup matches every round
    perm = np.random.default_rng(7).permutation(vocab)
    chain_toks = np.empty(prompt_len, np.int64)
    chain_toks[0] = 26
    for t in range(1, prompt_len):
        chain_toks[t] = perm[chain_toks[t - 1]]
    prompt = chain_toks[None, :].astype(np.float32)

    def timed(fn):
        fn()
        best = float("inf")
        for _ in range(reps):
            t = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t)
        return best

    t_plain = timed(lambda: _fetch(target.generate(prompt, n_new=n_new)))
    per_k = {}
    for k in ks:
        holder = {}

        def spec():
            out, steps = target.generate_lookup(prompt, n_new=n_new, k=k)
            holder["steps"] = int(steps)
            _fetch(out)

        t_spec = timed(spec)
        per_k[k] = (n_new / t_spec, holder["steps"])
    return n_new / t_plain, per_k


def bench_lookup_batched(prompt_len=48, n_new=64, spec_k=8, slots=4,
                         reps=3):
    """Prompt-lookup speculation in the CONTINUOUS BATCHER: 4 cyclic-
    task prompts served with lookup=True vs the same batcher decoding
    one token per dispatch — the dispatch-amortization a draft-free
    verify round buys at serving time (each accepted token skips one
    host round trip, the measured per-dispatch floor of
    continuous_batching_steady).

    Uses the committed trained target (benchmarks/spec_pair) on its
    permutation-cycle regime so acceptance is the repetitive-text
    case, matching the solo speculative_lookup entry.

    Returns (plain_tok_s, lookup_tok_s, plain_stats, lookup_stats)."""
    from exprgrad_tpu import compile as eg_compile
    from exprgrad_tpu.io import import_params_npz
    from exprgrad_tpu.models import (
        ContinuousBatcher, FlashLMServer, flash_transformer,
    )

    vocab, max_seq = 256, 256
    target_model = eg_compile(
        flash_transformer(vocab=vocab, dim=256, heads=4, hidden=1024,
                          blocks=2, max_seq=max_seq, eta=0.01),
        seed=0, precision="default",
    )
    here = os.path.dirname(os.path.abspath(__file__))
    import_params_npz(
        target_model, os.path.join(here, "benchmarks/spec_pair/target.npz")
    )
    server = FlashLMServer(target_model)

    perm = np.random.default_rng(7).permutation(vocab)
    def cyc(start):
        t = np.empty(prompt_len, np.int64)
        t[0] = start
        for i in range(1, prompt_len):
            t[i] = perm[t[i - 1]]
        return t.astype(np.float32)
    prompts = [cyc(s) for s in (26, 100, 7, 55)]
    capacity = prompt_len + n_new + spec_k

    def drive(kw):
        b = ContinuousBatcher(server, slots=slots, capacity=capacity,
                              **kw)
        rids = [b.submit(p, n_new) for p in prompts]
        done = b.run()
        return sum(len(done[r]) for r in rids), b.stats

    def timed(kw):
        drive(kw)  # compile + warmup
        best, stats = float("inf"), None
        for _ in range(reps):
            t0 = time.perf_counter()
            toks, stats = drive(kw)
            dt = time.perf_counter() - t0
            if dt < best:
                best = dt
        return toks / best, stats

    plain_tok_s, plain_stats = timed({})
    lk_tok_s, lk_stats = timed(dict(lookup=True, spec_k=spec_k))
    return plain_tok_s, lk_tok_s, plain_stats, lk_stats


def bench_seq2seq_serving(vocab=512, dim=256, heads=4, hidden=512,
                          batch=8, src_len=64, n_new=64, reps=3,
                          measure_greedy=None):
    """Encoder-decoder serving: Seq2SeqServer (encode once + KV cache +
    precomputed cross K/V) vs greedy_decode (exact O(t^2) re-forward).

    ``measure_greedy`` defaults to False on the tunnel platform:
    greedy_decode re-traces at EVERY growing tgt width (n_new separate
    XLA compiles — minutes each through the tunnel, which would blow the
    bench watchdog), so the O(t^2) comparison is a CPU-measured number
    (61x at this config) and only the server is timed on-chip.

    Returns (served_tokens_per_s, greedy_tokens_per_s_or_None,
    speedup_or_None)."""
    import jax
    import jax.numpy as jnp  # noqa: F401

    from exprgrad_tpu import compile as eg_compile
    from exprgrad_tpu.models import Seq2SeqServer, greedy_decode, \
        tiny_seq2seq

    if measure_greedy is None:
        measure_greedy = jax.default_backend() not in ("axon",)

    model = eg_compile(
        tiny_seq2seq(vocab=vocab, dim=dim, heads=heads, hidden=hidden,
                     max_src=src_len, max_tgt=n_new + 1),
        seed=0, precision="default",
    )
    rng = np.random.default_rng(0)
    src = rng.integers(0, vocab, (batch, src_len)).astype(np.float32)
    server = Seq2SeqServer(model)

    def timed(fn, reps=reps):
        fn()  # compile + warmup
        best = float("inf")
        for _ in range(reps):
            t = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t)
        return best

    t_served = timed(lambda: _fetch(server.generate(src, n_new=n_new)))
    toks = batch * n_new
    if not measure_greedy:
        return toks / t_served, None, None
    t_greedy = timed(
        lambda: np.sum(greedy_decode(model, src, n_new=n_new)), reps=1
    )
    return toks / t_served, toks / t_greedy, t_greedy / t_served


def bench_window_attention(b=8, h=4, s=4096, d=128, window=512, chain=10):
    """Sliding-window vs full-causal flash attention wall time.

    Out-of-band tiles are skipped entirely by the kernels, so the
    windowed step should approach (useful band) / (causal triangle) of
    the causal time — the O(S*W) long-context claim, measured.  Returns
    (t_window_s, t_causal_s, speedup).
    """
    import functools

    import jax

    from exprgrad_tpu.ops.attention import flash_attention

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.normal(size=(b, h, s, d)).astype(np.float32) * 0.1
    )
    q, k, v = mk(), mk(), mk()

    def timed(fn):
        # in-jit fori chain + difference quotient: the dispatch floor
        # inflated t_win relatively more (its body is ~4x smaller), so
        # it understated the windowed speedup (VERDICT r4 weak #9)
        t = _chain_timer(lambda cur, kk, vv: fn(cur, kk, vv), q, chain,
                         operands=(k, v))
        ts = sorted(t() for _ in range(3))
        return ts[1]  # median: min-of-diffs is biased fast

    t_win = timed(functools.partial(flash_attention, causal=True,
                                    window=window))
    t_causal = timed(functools.partial(flash_attention, causal=True))
    return t_win, t_causal, t_causal / t_win


def bench_paged_attention(b=8, hkv=8, group=1, d=128, page=128,
                          pages_per_row=16, chain=128, head_mode=None):
    """Paged decode attention, gather path vs Pallas kernel, isolated
    from the rest of the serving step (impl-attributable).

    Every row attends one fresh query against ``pages_per_row * page``
    resident cache tokens (bf16 pool).  The gather path materializes a
    dense view (the resident cache crosses HBM twice); the kernel reads
    pages in place.

    Harness honesty (r5): the chain is a ``fori_loop`` whose carry
    includes the POOL, and every step writes one fresh token's K/V into
    it — exactly what real decode does.  Without the loop-carried write
    XLA hoists/CSEs ``gather_view(pool, table)`` out of the chain and
    the "gather path" is measured gathering ONCE for the whole chain, a
    regime no serving step ever sees.  ``chain=128`` in a fori_loop
    compiles once and shrinks the tunnel-RTT floor per step to
    ~rtt/128 (~0.2ms), so the numbers resolve the kernel body.

    Returns (t_gather_s, t_flash_s, cache_gb, ratio) — per step;
    cache_gb is the resident K+V read per step.
    """
    from benchmarks.paged_harness import paged_setup, time_paged_step
    from exprgrad_tpu.ops.decode import decode_attention
    from exprgrad_tpu.ops.paged import gather_view
    from exprgrad_tpu.ops.paged_attention import paged_decode_attention

    pool, table, key_pos, q_pos, q0, resident = paged_setup(
        b=b, hkv=hkv, group=group, d=d, page=page,
        pages_per_row=pages_per_row)

    def timed(step):
        return time_paged_step(step, q0, pool, hkv=hkv, page=page,
                               chain=chain, reps=2)

    t_gather = timed(lambda q, pk, pv: decode_attention(
        q, gather_view(pool._replace(k=pk, v=pv), table),
        key_pos=key_pos, q_pos=q_pos))
    t_flash = timed(lambda q, pk, pv: paged_decode_attention(
        q, pool._replace(k=pk, v=pv), table, key_pos, q_pos,
        head_mode=head_mode))  # interpret auto: real on TPU
    cache_gb = 2 * b * hkv * resident * d * 2 / 1e9  # K+V bf16
    return t_gather, t_flash, cache_gb, t_gather / t_flash


def bench_transformer_step(vocab=2048, dim=512, heads=4, hidden=2048,
                           blocks=2, batch=8, seq=512, chain=4):
    """Full flash_transformer training step (fwd + symbolic bwd + adam)
    through the compiled executor: tokens/s with the extern fused
    attention.  head_dim = dim/heads = 128 (full lane width)."""
    import jax

    from exprgrad_tpu import compile as eg_compile, one_hot
    from exprgrad_tpu.backend.executor import JaxExecutor
    from exprgrad_tpu.models import flash_transformer
    from exprgrad_tpu.passes import infer_shapes

    model = eg_compile(
        flash_transformer(vocab=vocab, dim=dim, heads=heads, hidden=hidden,
                          blocks=blocks, max_seq=seq),
        seed=0, precision="default",
    )
    program = model.program
    tok_id = program.inputs["tokens"]
    lab_id = program.inputs["labels"]
    shapes = infer_shapes(
        program, "train",
        [(tok_id, [batch, seq]), (lab_id, [batch, seq, vocab])],
    )
    executor = JaxExecutor(program, "train", shapes, precision="default")

    rng = np.random.default_rng(0)
    toks = jax.device_put(
        rng.integers(0, vocab, (batch, seq)).astype(np.float32)
    )
    labels = jax.device_put(
        one_hot(rng.integers(0, vocab, batch * seq), vocab)
        .reshape(batch, seq, vocab)
    )
    state = {
        tid: jax.device_put(np.asarray(v))
        for tid, v in {**model.params, **model.caches}.items()
    }

    def step(state, epoch, tk, lb):
        out = executor.run_fn(
            {**state, tok_id: tk, lab_id: lb}, epoch, 0
        )
        return {tid: out[tid] for tid in state if tid in out}

    import jax.numpy as jnp

    # in-jit fori chain + difference quotient (see _chain_timer): the
    # epoch rides as the loop index, so every step stays step-exact;
    # toks/labels ride as arguments (closed over, jit would embed them
    # as HLO literals shipped on every remote compile)
    f = jax.jit(lambda st, n, tk, lb: jax.lax.fori_loop(
        0, n, lambda i, cur: step(cur, 2 + i, tk, lb), st))
    n_s = jnp.asarray(1, jnp.int32)
    n_l = jnp.asarray(1 + chain, jnp.int32)
    fence = lambda st: _fetch(next(iter(st.values())))
    fence(f(state, n_s, toks, labels))  # compile + warm
    fence(f(state, n_l, toks, labels))
    t0 = time.perf_counter()
    fence(f(state, n_s, toks, labels))
    t1 = time.perf_counter()
    fence(f(state, n_l, toks, labels))
    t2 = time.perf_counter()
    per_step = max((t2 - t1) - (t1 - t0), 1e-7) / chain
    tokens_per_s = batch * seq / per_step
    # attribution: which attention impl actually traced (VERDICT r2 #3 —
    # a tokens/s number must not silently mean XLA attention)
    impls = {k: v for k, v in executor.stats.items() if "attention" in k}
    return per_step, tokens_per_s, impls


def bench_mnist_epoch(n_samples=8192, batch=256):
    """Fashion-MNIST training epoch (fwd + derived bwd + adam) with the
    dataset device-resident, as one compiled lax.scan program per epoch."""
    import jax
    import jax.numpy as jnp

    from exprgrad_tpu import compile, one_hot
    from exprgrad_tpu.models import fashion_mnist_cnn
    from exprgrad_tpu.passes import infer_shapes

    model = compile(fashion_mnist_cnn(), seed=0, precision="default")
    program = model.program
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n_samples, 28, 28)).astype(np.float32)
    y = one_hot(rng.integers(0, 10, n_samples), 10)
    n_batches = n_samples // batch

    x_id, y_id = program.inputs["x"], program.inputs["y"]
    shapes = infer_shapes(
        program, "fit", [(x_id, [batch, 28, 28]), (y_id, [batch, 10])]
    )
    executor = model._executor("fit", shapes)
    batches = {
        x_id: jax.device_put(x.reshape(n_batches, batch, 28, 28)),
        y_id: jax.device_put(y.reshape(n_batches, batch, 10)),
    }
    seeds = np.arange(n_batches, dtype=np.int64)

    def run():
        tensors = dict(model.params)
        tensors.update(model.caches)
        result = executor.run_epoch(tensors, batches, model.epoch, seeds)
        for tid in model.params:
            if tid in result:
                model.params[tid] = result[tid]
        for tid in model.caches:
            if tid in result:
                model.caches[tid] = result[tid]
        return float(
            sum(jnp.sum(jnp.asarray(p)) for p in model.params.values())
        )

    run()  # compile + warmup
    t = time.perf_counter()
    run()
    epoch_time = time.perf_counter() - t
    return epoch_time, n_samples / epoch_time


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


_RESULT: dict = {}
_DETAILS: dict = {}


def _flush_details() -> None:
    """Write BENCH_DETAILS.json incrementally: a watchdog exit mid-sweep
    must still leave every completed section's numbers on disk.

    MERGE over the existing file — calibrate/flash_sweep/matmul_blocks
    write their sections into the same artifact, and a blind overwrite
    here destroyed a full sweep's results once."""
    import json as _json

    path = "/tmp/BENCH_DETAILS_DRY.json" if DRY else "BENCH_DETAILS.json"
    try:
        with open(path) as f:
            details = _json.load(f)
    except (OSError, ValueError):
        details = {}
    details.update(_DETAILS)
    try:
        with open(path, "w") as f:
            _json.dump(details, f, indent=2)
    except OSError:
        pass


def _watchdog(seconds: int = 2700) -> None:
    """The TPU tunnel can wedge indefinitely (see CLAUDE.md); make sure the
    driver always gets a result line or a clean failure."""
    import json as _json
    import os
    import signal

    def on_alarm(_sig, _frame):
        _flush_details()
        if _RESULT:
            print(_json.dumps(_RESULT), flush=True)
            os._exit(0)
        print("bench: watchdog timeout before any measurement",
              file=sys.stderr, flush=True)
        os._exit(1)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def main() -> None:
    # short fuse over backend init: a hung axon registration must die in
    # minutes (CLAUDE.md — kill a hung initializing client promptly);
    # the full sweep budget is armed once devices are live
    _watchdog(420)
    try:
        import jax

        if DRY:
            jax.config.update("jax_platforms", "cpu")
        _log(f"bench: devices {jax.devices()}")
        _watchdog()
    except RuntimeError as err:
        _log(
            "bench: TPU backend unavailable (the axon tunnel sometimes dies "
            f"and is unrecoverable from this side, see CLAUDE.md): {err}"
        )
        # surface the last good on-chip measurement for context — clearly
        # marked as carried over, NOT a fresh number
        import glob

        here = os.path.dirname(os.path.abspath(__file__))
        priors = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
        for prior in reversed(priors):
            try:
                with open(prior) as f:
                    last = json.load(f).get("parsed")
            except Exception:
                continue
            if last:
                _log(
                    "bench: last good on-chip measurement "
                    f"({os.path.basename(prior)}): {json.dumps(last)} -- "
                    "tunnel was down for this round's bench window"
                )
                break
        sys.exit(1)
    details = _DETAILS
    roofline0 = 197e12
    _log("bench: matmul 8192^3 f32 ...")

    mm_gflops, mm_t, mm_samples = bench_matmul(
        **(dict(n=256, chain=2) if DRY else {}))
    _log(f"bench: matmul f32 {mm_gflops:.0f} GFLOP/s (median of 3)")
    _RESULT.update(
        metric="matmul8192_f32_gflops",
        value=round(mm_gflops, 1),
        unit="GFLOP/s",
        vs_baseline=round(mm_gflops / (0.6 * roofline0 / 1e9), 3),
    )
    details["matmul8192_f32_default"] = {
        "gflops": round(mm_gflops, 1), "seconds_per_matmul": mm_t,
        "spread": _spread(mm_samples),
    }

    # the TPU-native dtype: bf16 operands, f32 accumulation on the MXU
    best_gflops, best_name = mm_gflops, "matmul8192_f32_gflops"
    _flush_details()
    _log("bench: matmul 8192^3 bf16 ...")
    try:
        bf_gflops, bf_t, bf_samples = bench_matmul(
            dtype="bfloat16", **(dict(n=256, chain=2) if DRY else {}))
        _log(f"bench: matmul bf16 {bf_gflops:.0f} GFLOP/s (median of 3)")
        details["matmul8192_bf16"] = {
            "gflops": round(bf_gflops, 1), "seconds_per_matmul": bf_t,
            "spread": _spread(bf_samples),
        }
        if bf_gflops > best_gflops:
            best_gflops, best_name = bf_gflops, "matmul8192_bf16_gflops"
            _RESULT.update(
                metric=best_name,
                value=round(bf_gflops, 1),
                vs_baseline=round(bf_gflops / (0.6 * roofline0 / 1e9), 3),
            )
    except Exception as err:
        details["matmul_bf16_error"] = str(err)
    mm_gflops = best_gflops

    _flush_details()
    _log("bench: scheduled Pallas matmul vs einsum (4096^3) ...")
    try:
        pl_g, xla_g, pl_samples = bench_matmul_scheduled(
            **(dict(n=256, chain=2, reps=2) if DRY else {}))
        details["matmul4096_scheduled_pallas"] = {
            "pallas_gflops": round(pl_g, 1),
            "einsum_gflops": round(xla_g, 1),
            "ratio_vs_einsum": round(pl_g / xla_g, 3),
            "spread": _spread(pl_samples),
            "config": "DSL matmul, schedule tile 512^3 via "
                      "schedule_mode=force vs the same program on the "
                      "einsum path; chained dispatches, median of 3",
        }
        _log(f"bench: scheduled pallas {pl_g:.0f} vs einsum {xla_g:.0f} "
             f"GFLOP/s ({pl_g / xla_g:.2f}x)")
    except Exception as err:
        details["matmul_scheduled_error"] = str(err)

    _flush_details()
    _log("bench: embedding scatter-add Pallas vs XLA scatter ...")
    try:
        sc_ms, sx_ms, sc_samples = bench_scatter_add(
            **(dict(n=512, v=128, d=128, chain=2, reps=2) if DRY else {}))
        details["embedding_scatter_add"] = {
            "pallas_ms": round(sc_ms, 3),
            "xla_scatter_ms": round(sx_ms, 3),
            "speedup_vs_xla": round(sx_ms / sc_ms, 3),
            "spread": _spread(sc_samples),
            "config": "demb[tok[i],d] += g[i,d], n=16384 v=2048 d=512; "
                      "scheduled Pallas one-hot MXU contraction (tile "
                      "i=512 d=256) vs the same program on the XLA "
                      "scatter path; chained dispatches, median of 3",
        }
        _log(f"bench: scatter-add pallas {sc_ms:.2f}ms vs XLA "
             f"{sx_ms:.2f}ms ({sx_ms / sc_ms:.2f}x)")
    except Exception as err:
        details["scatter_add_error"] = str(err)

    _flush_details()
    _log("bench: fused row-chain softmax vs XLA (8192x8192) ...")
    try:
        f_g, x_g, f_samples = bench_softmax_fused(
            **(dict(r=512, c=512, chain=2, reps=2) if DRY else {}))
        details["softmax8192_rowchain_fused"] = {
            "fused_gbps": round(f_g, 1),
            "xla_gbps": round(x_g, 1),
            "ratio_vs_xla": round(f_g / x_g, 3),
            "spread": _spread(f_samples),
            "config": "3-kernel DSL softmax fused into ONE Pallas kernel "
                      "(row tile 32, VMEM-resident max/sums, one HBM "
                      "read) vs the same program on the XLA path; GB/s = "
                      "ideal 2 passes / time; chained dispatches, "
                      "median of 3",
        }
        _log(f"bench: fused softmax {f_g:.0f} vs XLA {x_g:.0f} GB/s "
             f"({f_g / x_g:.2f}x)")
    except Exception as err:
        details["softmax_fused_error"] = str(err)

    _flush_details()
    _log("bench: conv2 ...")
    try:
        conv_gflops, conv_t, raw_gflops, conv_spread = bench_conv2(
            **(dict(batch=2, size=16, cin=32, cout=32, chains=(2, 6),
                    reps=2) if DRY else {}))
        details["conv2_b32_64x64x128_k3x128"] = {
            "gflops": round(conv_gflops, 1),
            "seconds_per_conv": conv_t,
            "mfu_vs_197tflops": round(conv_gflops * 1e9 / roofline0, 4),
            "raw_lax_conv_gflops": round(raw_gflops, 1),
            "compiler_overhead_pct": round(
                (raw_gflops / conv_gflops - 1.0) * 100, 2
            ),
            "spread": conv_spread,
            "methodology": "per-conv time = (T(chain=50) - T(chain=10)) / "
                           "40 of a data-dependent conv->pad->conv feedback "
                           "chain in ONE dispatch; tunnel RTT and dispatch "
                           "overhead cancel in the difference; compiled and "
                           "raw reps interleaved round-robin (7 each) so "
                           "slow drift hits both paths equally — the r2->r3 "
                           "overhead swing (-15.9% -> +6.8% on identical "
                           "code) was drift, not a lowering change",
        }
        _log(
            f"bench: conv2 {conv_gflops:.0f} GFLOP/s compiled vs "
            f"{raw_gflops:.0f} raw lax.conv "
            f"({conv_gflops * 100 / roofline0 * 1e9:.1f}% MFU)"
        )
    except Exception as err:  # keep the headline robust
        details["conv2_error"] = str(err)

    _flush_details()
    _log("bench: conv2 bf16 ...")
    try:
        cg16, ct16, rg16, sp16 = bench_conv2(
            dtype="bfloat16", **(dict(batch=2, size=16, cin=32, cout=32,
                                      chains=(2, 6), reps=2)
                                 if DRY else dict(reps=5)))
        details["conv2_bf16"] = {
            "gflops": round(cg16, 1),
            "mfu_vs_197tflops": round(cg16 * 1e9 / roofline0, 4),
            "raw_lax_conv_gflops": round(rg16, 1),
            "spread": sp16,
            "note": "same workload as conv2_b32... but bf16 operands "
                    "(f32 accumulation) — the MXU-native dtype",
        }
        _log(f"bench: conv2 bf16 {cg16:.0f} GFLOP/s "
             f"({cg16 * 100 / roofline0 * 1e9:.1f}% MFU)")
    except Exception as err:
        details["conv2_bf16_error"] = str(err)

    _flush_details()
    _log("bench: attention flash vs xla ...")
    try:
        fl_gflops, xl_gflops, attn_spread = bench_attention(
            **(dict(b=1, h=2, s=256, chain=2) if DRY else {}))
        details["attention_b8_h4_s2048_d128_causal"] = {
            "flash_gflops": round(fl_gflops, 1),
            "xla_gflops": round(xl_gflops, 1),
            "spread": attn_spread,
            "note": "forward; the measured basis for the attention impl "
                    "routing (policy.attention)",
        }
        _log(
            f"bench: attention flash {fl_gflops:.0f} vs xla "
            f"{xl_gflops:.0f} GFLOP/s"
        )
    except Exception as err:
        details["attention_error"] = str(err)

    _SRV_DRY = (dict(vocab=128, dim=64, heads=2, hidden=128, blocks=1,
                     batch=2, prompt_len=16, n_lo=2, n_new=8, reps=1)
                if DRY else {})
    _flush_details()
    _log("bench: KV-cache serving throughput ...")
    try:
        tok_s, step_ms, t_lo, t_hi = bench_serving(**_SRV_DRY)
        details["serving_decode"] = {
            "config": "vocab2048 dim512 h4 ffn2048 blocks2 batch8 "
                      "prompt128 n_new128 bf16-cache",
            "tokens_per_s": round(tok_s, 1),
            "ms_per_decode_step": (
                round(step_ms, 3) if step_ms is not None else None
            ),
            "t_8_steps_s": round(t_lo, 4),
            "t_128_steps_s": round(t_hi, 4),
            "impl": "kv-cache incremental decode (ops/decode.py, XLA "
                    "one-position attention inside the scan)",
            "methodology": "tokens/s is end-to-end over the 128-step run "
                           "(prefill included); ms_per_decode_step = "
                           "(T(128) - T(8)) / 120, min of 3 reps each — "
                           "prefill/dispatch/RTT cancel in the difference "
                           "(null when the difference is negative under "
                           "noise)",
        }
        _log(f"bench: serving {tok_s:.0f} tokens/s ("
             + (f"{step_ms:.3f}ms/step" if step_ms is not None
                else "step time below noise")
             + " batch-8)")
    except Exception as err:
        details["serving_error"] = str(err)

    _flush_details()
    _log("bench: continuous batching steady state (chunk sweep) ...")
    try:
        steady, rtt_ms = bench_batching_steady(
            **(dict(vocab=128, dim=64, heads=2, hidden=128, blocks=1,
                    slots=2, prompt_len=16, budget=64,
                    configs=((1, 0), (4, 1))) if DRY else {}))
        solo_ms = details.get("serving_decode", {}).get(
            "ms_per_decode_step"
        )
        entry = {
            "config": "vocab2048 dim512 blocks2 slots8 prompt64 "
                      "budget1024; all slots saturated, no admissions "
                      "in the timed window (pure decode dispatches); "
                      "+pipeN = pipelined device-chained dispatches",
            "per_chunk": {
                str(c): {
                    "tokens_per_s": round(tps, 1),
                    "ms_per_decode_step": round(ms, 4),
                    "ms_per_dispatch": round(md, 4),
                    "overhead_ms_vs_solo": (
                        round(ms - solo_ms, 4)
                        if solo_ms is not None else None
                    ),
                    "dispatch_minus_rtt_ms": round(md - rtt_ms, 4),
                    "steady_window": ok,
                }
                for c, (tps, ms, md, ok) in steady.items()
            },
            "solo_batch8_ms_per_step": solo_ms,
            "rtt_probe_ms": round(rtt_ms, 4),
            "note": "per-dispatch cost decomposition: rtt_probe_ms is a "
                    "raw upload+fetch round trip on the same "
                    "connection; dispatch_minus_rtt_ms = device chunk "
                    "work + host scheduling remainder.  The scheduler "
                    "fetches the chunk's tokens every dispatch (stop "
                    "detection / page allocation), so ONE round trip "
                    "per dispatch is the structural floor — sizing "
                    "decode_chunk >= rtt/step amortizes it",
        }
        details["continuous_batching_steady"] = entry
        _log("bench: steady batching " + ", ".join(
            f"chunk{c}={tps:.0f} tok/s ({ms:.3f}ms/step)"
            for c, (tps, ms, _md, _ok) in steady.items())
            + f"; rtt probe {rtt_ms:.1f}ms")
    except Exception as err:
        details["continuous_batching_steady_error"] = str(err)

    _flush_details()
    _log("bench: paged decode attention gather vs kernel ...")
    try:
        t_g, t_f, cache_gb, ratio = bench_paged_attention(
            **(dict(b=2, hkv=2, d=64, page=16, pages_per_row=2, chain=4)
               if DRY else {}))
        details["paged_attention_decode"] = {
            "config": "b8 hkv8 d128 page128 x16 pages/row (2048 resident "
                      "tokens/row, bf16 pool); fori_loop chain=128 with "
                      "loop-carried per-step cache writes (real decode: "
                      "the gather cannot be hoisted out of the chain)",
            "gather_ms": round(t_g * 1e3, 3),
            "flash_ms": round(t_f * 1e3, 3),
            "gather_gbps": round(2 * cache_gb / t_g, 1),
            "flash_gbps": round(cache_gb / t_f, 1),
            "speedup": round(ratio, 2),
            "impl": "gather = gather_view + XLA decode_attention (cache "
                    "crosses HBM twice per step); flash = ops.paged_"
                    "decode_attention Pallas kernel (pages read in place "
                    "once; head_mode default)",
        }
        _log(f"bench: paged decode gather {t_g * 1e3:.2f}ms vs kernel "
             f"{t_f * 1e3:.2f}ms ({ratio:.2f}x)")
    except Exception as err:
        details["paged_attention_error"] = str(err)

    _flush_details()
    _log("bench: sliding-window vs causal attention ...")
    try:
        t_win, t_causal, speedup = bench_window_attention(
            **(dict(b=1, h=2, s=512, d=64, window=128, chain=2)
               if DRY else {}))
        from exprgrad_tpu.ops.attention import flash_tile_counts

        tiles = flash_tile_counts(4096, 4096, 128, 128, causal=True,
                                  window=512)
        details["window_attention_s4096_w512"] = {
            "window_ms": round(t_win * 1e3, 2),
            "causal_ms": round(t_causal * 1e3, 2),
            "speedup": round(speedup, 2),
            "tile_counts": tiles,
            "bound_attained": round(speedup / tiles["tile_bound"], 3),
            "note": "tile-skip O(S*W) vs O(S^2/2); tile_bound is the "
                    "visited-tile ratio (the schedule-level ceiling); "
                    "dead counts say the residual below it is per-step/"
                    "per-row overhead, not dead tiles",
        }
        _log(f"bench: window {t_win * 1e3:.1f}ms vs causal "
             f"{t_causal * 1e3:.1f}ms ({speedup:.2f}x)")
    except Exception as err:
        details["window_attention_error"] = str(err)

    _flush_details()
    _log("bench: prompt-lookup speculative decoding ...")
    try:
        pl_tok, per_k = bench_speculative_lookup(
            **(dict(n_new=32, ks=(4,), reps=1) if DRY else {}))
        best_k, (lk_tok, lk_steps) = max(
            per_k.items(), key=lambda kv: kv[1][0])
        details["speculative_lookup"] = {
            "config": "trained target vocab256 dim256 blocks2 "
                      "(benchmarks/spec_pair); prompt walks the task "
                      "permutation's 11-cycle (periodic continuation — "
                      "the regime lookup serves); batch1 prompt64 "
                      "n_new128, DRAFT-FREE history-match proposals",
            "plain_tokens_per_s": round(pl_tok, 1),
            "per_k": {
                str(k): {
                    "tokens_per_s": round(tok, 1),
                    "target_verify_steps": steps,
                    "speedup": round(tok / pl_tok, 2),
                }
                for k, (tok, steps) in per_k.items()
            },
            "best_k": best_k,
            "speedup": round(lk_tok / pl_tok, 2),
            "impl": "generate_lookup: propose k tokens after the most "
                    "recent earlier occurrence of the last-ngram, ONE "
                    "k-wide verify per round, zero draft cost; output "
                    "exact greedy",
        }
        _log(f"bench: lookup speculative {lk_tok:.0f} vs plain "
             f"{pl_tok:.0f} tokens/s (best k={best_k}, {lk_steps} verify "
             f"steps for 128 tokens, {lk_tok / pl_tok:.2f}x)")
    except Exception as err:
        details["speculative_lookup_error"] = str(err)

    _flush_details()
    _log("bench: prompt-lookup continuous batching ...")
    try:
        pb_tok, lb_tok, pb_st, lb_st = bench_lookup_batched(
            **(dict(prompt_len=24, n_new=16, spec_k=4, slots=2, reps=1)
               if DRY else {}))
        details["speculative_lookup_batched"] = {
            "config": "trained target (benchmarks/spec_pair), 4 cyclic "
                      "prompts, slots4; ContinuousBatcher lookup=True "
                      "spec_k=8 vs the same batcher one-token-per-"
                      "dispatch",
            "plain_tokens_per_s": round(pb_tok, 1),
            "lookup_tokens_per_s": round(lb_tok, 1),
            "speedup": round(lb_tok / pb_tok, 2),
            "plain_dispatches": pb_st["dispatches"],
            "lookup_dispatches": lb_st["dispatches"],
            "tokens_per_round": round(
                lb_st["spec_emitted"] / max(1, lb_st["spec_rounds"]), 2),
            "impl": "host-side ngram proposals into one spec_k+1-wide "
                    "verify dispatch per round; exact greedy streams "
                    "(models/batcher.py lookup=)",
        }
        _log(f"bench: lookup batching {lb_tok:.0f} vs plain "
             f"{pb_tok:.0f} tokens/s ({lb_tok / pb_tok:.2f}x, "
             f"{lb_st['dispatches']} vs {pb_st['dispatches']} "
             f"dispatches)")
    except Exception as err:
        details["speculative_lookup_batched_error"] = str(err)

    _flush_details()
    _log("bench: speculative decoding (trained draft) ...")
    try:
        pl_tok, per_k, split = bench_speculative_trained(
            **(dict(n_new=32, ks=(4,), reps=1) if DRY else {}))
        best_k, (sp_tok, vsteps2, acc) = max(
            per_k.items(), key=lambda kv: kv[1][0]
        )
        details["speculative_decoding_trained"] = {
            "config": "target vocab256 dim256 blocks2; draft dim64 "
                      "1-block; both TRAINED on the deterministic "
                      "successor task (benchmarks/spec_pair; greedy "
                      "agreement ~1.0) — best-case acceptance, the floor "
                      "entry above keeps the random-draft worst case; "
                      "batch1 prompt64 n_new128, k swept",
            "plain_tokens_per_s": round(pl_tok, 1),
            "per_k": {
                str(k): {
                    "speculative_tokens_per_s": round(tok, 1),
                    "target_verify_steps": steps,
                    "accepted_per_round": round(a, 2),
                    "speedup": round(tok / pl_tok, 2),
                }
                for k, (tok, steps, a) in per_k.items()
            },
            "best_k": best_k,
            "speculative_tokens_per_s": round(sp_tok, 1),
            "target_verify_steps": vsteps2,
            "accepted_per_round": round(acc, 2),
            "speedup": round(sp_tok / pl_tok, 2),
            "cost_split": split,
        }
        _log(f"bench: trained speculative {sp_tok:.0f} vs plain "
             f"{pl_tok:.0f} tokens/s (best k={best_k}, {vsteps2} verify "
             f"steps, {acc:.2f} accepted/round, {sp_tok / pl_tok:.2f}x; "
             f"draft step {split['draft_cost_ratio']:.2f}x plain)")
    except Exception as err:
        details["speculative_trained_error"] = str(err)

    _flush_details()
    _log("bench: flash_transformer train step ...")
    try:
        step_s, tok_s, impls = bench_transformer_step(
            **(dict(vocab=128, dim=64, heads=2, hidden=128, blocks=1,
                    batch=2, seq=32, chain=2) if DRY else {}))
        details["flash_transformer_train_step"] = {
            "config": "vocab2048 dim512 h4 ffn2048 blocks2 batch8 seq512",
            "seconds_per_step": round(step_s, 4),
            "tokens_per_s": round(tok_s, 1),
            "attention_impl": impls,
        }
        _log(f"bench: transformer step {step_s * 1e3:.1f}ms, "
             f"{tok_s:.0f} tokens/s, attn {impls}")
    except Exception as err:
        details["transformer_error"] = str(err)

    _flush_details()
    _log("bench: speculative decoding ...")
    try:
        plain_tok, spec_tok, vsteps = bench_speculative(
            **(dict(vocab=128, dim=64, heads=2, hidden=128, blocks=1,
                    prompt_len=8, n_new=16, reps=1) if DRY else {}))
        details["speculative_decoding"] = {
            "config": "target vocab2048 dim512 blocks2; draft dim128 "
                      "1-block (random weights: worst-case acceptance); "
                      "batch1 prompt64 n_new128 k4",
            "plain_tokens_per_s": round(plain_tok, 1),
            "speculative_tokens_per_s": round(spec_tok, 1),
            "target_verify_steps": vsteps,
            "speedup": round(spec_tok / plain_tok, 2),
            "impl": "generate_speculative: k-wide cached verify steps, "
                    "exact greedy output",
        }
        _log(f"bench: speculative {spec_tok:.0f} vs plain {plain_tok:.0f} "
             f"tokens/s ({vsteps} verify steps for 128 tokens)")
    except Exception as err:
        details["speculative_error"] = str(err)

    _flush_details()
    _log("bench: int8 KV-cache serving ...")
    try:
        tok8, step8, _, _ = bench_serving(cache_dtype="int8", **_SRV_DRY)
        details["serving_decode_int8"] = {
            "config": "same as serving_decode but int8 KV cache "
                      "(per-slot symmetric quantization)",
            "tokens_per_s": round(tok8, 1),
            "ms_per_decode_step": (
                round(step8, 3) if step8 is not None else None
            ),
            "impl": "int8 codes + f32 scales, dequantized in decode "
                    "attention (~3x less cache HBM than f32)",
        }
        _log(f"bench: int8 serving {tok8:.0f} tokens/s")
    except Exception as err:
        details["serving_int8_error"] = str(err)

    _flush_details()
    _log("bench: fully-quantized serving (int8 weights + int8 cache) ...")
    try:
        tokw, stepw, _, _ = bench_serving(cache_dtype="int8",
                                          weight_dtype="int8", **_SRV_DRY)
        details["serving_decode_w8a16_int8cache"] = {
            "config": "same as serving_decode but int8 weight-only "
                      "quantization (W8A16, per-output-channel scales) "
                      "AND int8 KV cache",
            "tokens_per_s": round(tokw, 1),
            "ms_per_decode_step": (
                round(stepw, 3) if stepw is not None else None
            ),
            "impl": "models/_quant.py codes*scale fused into the dots; "
                    "weight HBM 1/4 of f32 — decode is weight-bandwidth-"
                    "bound, so bytes read per step drop ~4x",
        }
        _log(f"bench: w8a16 serving {tokw:.0f} tokens/s")
    except Exception as err:
        details["serving_w8a16_error"] = str(err)

    _flush_details()
    _log("bench: seq2seq serving vs greedy_decode ...")
    try:
        s2s_tok, greedy_tok, s2s_speedup = bench_seq2seq_serving(
            **(dict(vocab=128, dim=64, heads=2, hidden=128, batch=2,
                    src_len=16, n_new=8, reps=1, measure_greedy=False)
               if DRY else {}))
        details["seq2seq_serving"] = {
            "config": "vocab512 dim256 h4 ffn512 batch8 src64 n_new64",
            "served_tokens_per_s": round(s2s_tok, 1),
            "greedy_decode_tokens_per_s": (
                round(greedy_tok, 1) if greedy_tok is not None else None
            ),
            "speedup": (
                round(s2s_speedup, 2) if s2s_speedup is not None else
                "not measured on-chip (greedy_decode re-traces per tgt "
                "width: n_new XLA compiles through the tunnel); CPU "
                "measurement: 61x"
            ),
            "impl": "Seq2SeqServer: encode once + KV-cache self-attention "
                    "+ precomputed cross K/V (one scanned program) vs the "
                    "exact O(t^2) per-token re-forward",
        }
        _log(f"bench: seq2seq served {s2s_tok:.0f} tokens/s"
             + (f" vs greedy {greedy_tok:.0f} ({s2s_speedup:.1f}x)"
                if greedy_tok is not None else " (greedy comparison: CPU)"))
    except Exception as err:
        details["seq2seq_serving_error"] = str(err)

    _flush_details()
    _log("bench: continuous batching (paged + chunked) ...")
    try:
        cb_tok, cb_req, cb_gen, cb_stats = bench_continuous_batching(
            **(dict(vocab=128, dim=64, heads=2, hidden=128, blocks=1,
                    slots=2, n_requests=4) if DRY else {}))
        details["continuous_batching"] = {
            "config": "vocab2048 dim512 blocks2 slots8 cap320 page32 "
                      "pool=dense/2 chunk32; 12 staggered requests, "
                      "prompts 48-160, budgets 32-96",
            "tokens_per_s": round(cb_tok, 1),
            "requests_per_s": round(cb_req, 2),
            "generated_tokens": cb_gen,
            "scheduler": cb_stats,
            "impl": "ContinuousBatcher(paged=True, decode_chunk=32): "
                    "page-pool KV at half the dense reservation, "
                    "multi-step scan dispatches; greedy == solo",
            "note": "aligned-batch ceiling for this model is "
                    "serving_decode",
        }
        _log(f"bench: continuous batching {cb_tok:.0f} tokens/s, "
             f"{cb_req:.2f} req/s ({cb_stats})")
    except Exception as err:
        details["continuous_batching_error"] = str(err)

    _flush_details()
    _log("bench: mnist epoch ...")
    try:
        epoch_time, samples_per_s = bench_mnist_epoch(
            **(dict(n_samples=512, batch=128) if DRY else {}))
        details["fashion_mnist_epoch_8192"] = {
            "seconds": round(epoch_time, 3),
            "samples_per_s": round(samples_per_s, 1),
        }
    except Exception as err:
        details["mnist_error"] = str(err)


    roofline = 197e12  # v5e MXU, bf16 multiply / f32 accumulate
    target_gflops = 0.6 * roofline / 1e9  # BASELINE.md north star
    details["roofline_gflops"] = roofline / 1e9
    details["mxu_utilization"] = round(mm_gflops * 1e9 / roofline, 4)

    _flush_details()

    print(
        json.dumps(
            {
                "metric": best_name,
                "value": round(mm_gflops, 1),
                "unit": "GFLOP/s",
                "vs_baseline": round(mm_gflops / target_gflops, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
