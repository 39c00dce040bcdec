"""On-chip validation sweep (run on real TPU hardware; one process at a
time, no persistent compile cache — see CLAUDE.md).

Validates the kernels that CPU interpret mode cannot performance-qualify:
flash-attention forward+backward vs the plain-XLA VJP oracle (causal and
not), and the fused matmul+epilogue.  Exits non-zero on any mismatch or
on watchdog timeout (the tunnel can wedge).

Usage:  python scripts/tpu_validate.py

``EG_DRY=1`` runs the ENTIRE script body on CPU (pinned before backend
init so a tunnel-recovery window is never stolen): interpret-mode
kernels, shrunk shapes, ~minutes.  Numerics are still asserted — the
point is proving the script itself executes end to end, so the first
real chip window is spent measuring, not debugging a NameError at line
400 (every on-chip attempt this round died at backend init, so the
newest sections had never run).
"""

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


def main() -> None:
    signal.signal(signal.SIGALRM, _bail)
    # short fuse over backend init: a hung axon registration must die in
    # minutes, not hold the one-client slot for the full sweep timeout
    # (CLAUDE.md: kill a hung initializing client promptly)
    signal.alarm(420)

    import jax

    if DRY:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    signal.alarm(4400)  # ~20 on-chip compiles at tunnel-variable latency

    def mm_check(got, exact, xla_ref, what, tol=2e-4, mult=4.0):
        """Matmul-family closeness with an on-chip noise floor: DEFAULT-
        precision f32 dots ride the MXU as bf16 passes (CLAUDE.md), so a
        Pallas kernel that matches XLA's own quality still sits ~1e-3
        from an exact-f32 numpy oracle.  Gate against max(tol, mult x
        the XLA-default-vs-exact floor); on CPU (EG_DRY) default ==
        exact, so the floor collapses and the tight tol applies."""
        got, exact = np.asarray(got), np.asarray(exact)
        scale = np.max(np.abs(exact)) + 1e-9
        rel = np.max(np.abs(got - exact)) / scale
        floor = np.max(np.abs(np.asarray(xla_ref) - exact)) / scale
        print(f"  {what}: rel {rel:.2e} (XLA-default floor {floor:.2e})",
              flush=True)
        assert rel < max(tol, mult * floor), (what, rel, floor)
    # interpret=None resolves to interpret-mode off-TPU; on chip the
    # explicit False keeps "accidentally interpreted" impossible
    INTERP = None if DRY else False

    from exprgrad_tpu.ops.attention import flash_attention, xla_attention_vjp

    rng = np.random.default_rng(0)
    b, h, sq, skv, d = 2, 4, 1024, 1024, 128
    if DRY:  # interpret-mode grids are python loops: shrink the seqs
        sq = skv = 256
    mk = lambda s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    q, k, v = mk((b, h, sq, d)), mk((b, h, skv, d)), mk((b, h, skv, d))
    g = mk((b, h, sq, d))

    for causal in (False, True):
        def fwd(q, k, v):
            return flash_attention(q, k, v, causal=causal, interpret=INTERP)

        t0 = time.time()
        out, vjp_fn = jax.vjp(fwd, q, k, v)
        got = vjp_fn(g)
        _ = [float(jnp.sum(x)) for x in got]  # fence (tunnel-safe)
        print(f"attn bwd causal={causal}: {time.time()-t0:.1f}s", flush=True)
        want = xla_attention_vjp(q, k, v, g, causal=causal)
        # noise floor: the SAME oracle at HIGHEST matmul precision.  On
        # chip, default-precision f32 einsums ride the MXU as bf16
        # passes, so two differently-ordered implementations disagree
        # at the bf16-rounding level (~1e-3 at s=1024 d=128) — measure
        # that floor rather than hard-coding the CPU-exact 2e-4 that
        # only interpret mode (true f32 everywhere) can meet.
        with jax.default_matmul_precision("highest"):
            exact = xla_attention_vjp(q, k, v, g, causal=causal)
        for name, a, bb, ee in zip("dq dk dv".split(), got, want, exact):
            a, bb, ee = np.asarray(a), np.asarray(bb), np.asarray(ee)
            scale = np.max(np.abs(ee)) + 1e-9
            rel = np.max(np.abs(a - ee)) / scale
            floor = np.max(np.abs(bb - ee)) / scale
            print(f"  {name}: max rel err {rel:.2e} "
                  f"(XLA-default floor {floor:.2e})", flush=True)
            assert rel < max(2e-4, 4.0 * floor), (causal, name, rel, floor)
    print("ATTENTION BACKWARD OK", flush=True)

    # GQA on-chip
    q4 = q
    k1, v1 = k[:, :1], v[:, :1]
    out = flash_attention(q4, k1, v1, causal=True, interpret=INTERP)
    ref = flash_attention(
        q4, jnp.repeat(k1, h, 1), jnp.repeat(v1, h, 1), causal=True,
        interpret=INTERP,
    )
    rel = float(jnp.max(jnp.abs(out - ref)))
    print("MQA max abs dev vs repeated heads:", rel, flush=True)
    assert rel < 2e-5
    print("GQA OK", flush=True)

    # sliding-window on-chip: fwd+bwd vs the XLA oracle with the same
    # band mask, and the tile-skip wall-time effect (window << S)
    W = 256

    def wfwd(q, k, v):
        return flash_attention(q, k, v, causal=True, window=W,
                               interpret=INTERP)

    t0 = time.time()
    out, vjp_fn = jax.vjp(wfwd, q, k, v)
    got = vjp_fn(g)
    _ = [float(jnp.sum(x)) for x in got]
    print(f"window={W} bwd: {time.time()-t0:.1f}s", flush=True)
    want = xla_attention_vjp(q, k, v, g, causal=True, window=W)
    with jax.default_matmul_precision("highest"):  # same floor as above
        exact = xla_attention_vjp(q, k, v, g, causal=True, window=W)
    for name, a, bb, ee in zip("dq dk dv".split(), got, want, exact):
        a, bb, ee = np.asarray(a), np.asarray(bb), np.asarray(ee)
        scale = np.max(np.abs(ee)) + 1e-9
        rel = np.max(np.abs(a - ee)) / scale
        floor = np.max(np.abs(bb - ee)) / scale
        print(f"  {name}: max rel err {rel:.2e} "
              f"(XLA-default floor {floor:.2e})", flush=True)
        assert rel < max(2e-4, 4.0 * floor), (name, rel, floor)
    print("WINDOW ATTENTION OK", flush=True)

    # fused matmul epilogue
    from exprgrad_tpu import Fun, compile, input, iters, maximum

    y, x, it = iters("y", "x", "it")
    a_in, b_in, bias = input("a"), input("b"), input("bias")
    c = Fun("c")
    c[y, x] = a_in[y, it] * b_in[it, x]
    c.schedule(tile={"y": 256, "x": 256, "it": 512}, parallel=["y", "x"])
    y2, x2 = iters("y2", "x2")
    dd = Fun("d")
    dd[y2, x2] = maximum(c[y2, x2] + bias[x2], 0.0)
    model = compile(dd.target("d"), backend="jax", schedule_mode="force")
    m, kk, n = (512, 512, 512) if DRY else (1024, 2048, 1024)
    args = {
        "a": rng.normal(size=(m, kk)).astype(np.float32),
        "b": rng.normal(size=(kk, n)).astype(np.float32),
        "bias": rng.normal(size=(n,)).astype(np.float32),
    }
    t0 = time.time()
    out = np.asarray(model.call("d", args))
    print(f"fused matmul: {time.time()-t0:.1f}s", flush=True)
    want = np.maximum(args["a"] @ args["b"] + args["bias"], 0.0)
    xla_ref = jnp.maximum(
        jnp.dot(jnp.asarray(args["a"]), jnp.asarray(args["b"]))
        + jnp.asarray(args["bias"]), 0.0)
    stats = model.lowering_stats("d")
    print("stats:", stats, flush=True)
    assert stats.get("pallas-fused") == 1, stats
    mm_check(out, want, xla_ref, "fused epilogue")
    print("FUSED EPILOGUE OK", flush=True)

    # fused CHAIN: matmul + bias writer + raw leaky-relu + residual in ONE
    # Pallas kernel (round-2 epilogue-chain fusion) vs numpy
    from exprgrad_tpu import select

    y, x, it = iters("y", "x", "it")
    a2, b2 = input("a2"), input("b2")
    bias2, res2 = input("bias2"), input("res2")
    cc = Fun("cc")
    cc[y, x] = a2[y, it] * b2[it, x]
    cc.schedule(tile={"y": 256, "x": 256, "it": 512}, parallel=["y", "x"])
    y2, x2 = iters("y2", "x2")
    cc[y2, x2] = bias2[x2]
    i2 = iters("i2")
    rr = Fun("rr")
    rr.raw[i2] = select(cc.raw[i2] >= 0.0, cc.raw[i2], 0.1 * cc.raw[i2])
    rr.copy_shape(cc)
    y3, x3 = iters("y3", "x3")
    ee = Fun("ee")
    ee[y3, x3] = rr[y3, x3] + res2[y3, x3]
    chain_model = compile(ee.target("ee"), backend="jax",
                          schedule_mode="force")
    m2_, k2_, n2_ = (512, 512, 512) if DRY else (1024, 1024, 1024)
    cargs = {
        "a2": rng.normal(size=(m2_, k2_)).astype(np.float32),
        "b2": rng.normal(size=(k2_, n2_)).astype(np.float32),
        "bias2": rng.normal(size=(n2_,)).astype(np.float32),
        "res2": rng.normal(size=(m2_, n2_)).astype(np.float32),
    }
    t0 = time.time()
    got = np.asarray(chain_model.call("ee", cargs))
    print(f"fused chain: {time.time()-t0:.1f}s", flush=True)
    hmat = cargs["a2"] @ cargs["b2"] + cargs["bias2"]
    want = np.where(hmat >= 0, hmat, 0.1 * hmat) + cargs["res2"]
    hdev = jnp.dot(jnp.asarray(cargs["a2"]), jnp.asarray(cargs["b2"])) \
        + jnp.asarray(cargs["bias2"])
    xla_ref = jnp.where(hdev >= 0, hdev, 0.1 * hdev) \
        + jnp.asarray(cargs["res2"])
    cstats = chain_model.lowering_stats("ee")
    print("chain stats:", cstats, flush=True)
    assert cstats.get("pallas-fused") == 1, cstats
    mm_check(got, want, xla_ref, "fused chain")
    print("FUSED CHAIN OK", flush=True)

    # windowed/strided Pallas family on-chip: scheduled maxpool (strided
    # window reads) and upsample (grouped i//k reads) through the
    # map/reduce emitter
    from exprgrad_tpu import iters as _iters

    i_, y_, x_, c_ = _iters("i", "y", "x", "c")
    imgs_in = input("imgs")
    pool = Fun("pool")
    pool[i_, y_, x_, c_] = maximum(
        maximum(imgs_in[i_, y_ * 2, x_ * 2, c_],
                imgs_in[i_, y_ * 2 + 1, x_ * 2, c_]),
        maximum(imgs_in[i_, y_ * 2, x_ * 2 + 1, c_],
                imgs_in[i_, y_ * 2 + 1, x_ * 2 + 1, c_]),
    )
    pool.schedule(tile={"y": 16})
    pm = compile(pool.target("pool"), backend="jax", schedule_mode="force")
    pv = rng.normal(size=(4, 64, 64, 128)).astype(np.float32)
    t0 = time.time()
    got = np.asarray(pm.call("pool", {"imgs": pv}))
    print(f"scheduled maxpool: {time.time()-t0:.1f}s", flush=True)
    want = pv.reshape(4, 32, 2, 32, 2, 128).max(axis=(2, 4))
    assert np.array_equal(got, want)
    pstats = pm.lowering_stats("pool")
    print("pool stats:", pstats, flush=True)
    assert pstats.get("pallas-mapreduce") == 1, pstats

    upi = input("upimgs")
    i_, y_, x_, c_ = _iters("i", "y", "x", "c")
    up = Fun("up")
    up[i_, y_, x_, c_] = upi[i_, y_ // 2, x_ // 2, c_]
    up.with_shape([upi.shape[0], upi.shape[1] * 2, upi.shape[2] * 2,
                   upi.shape[3]])
    up.schedule(tile={"y": 16})
    um = compile(up.target("up"), backend="jax", schedule_mode="force")
    uv = rng.normal(size=(4, 32, 32, 128)).astype(np.float32)
    t0 = time.time()
    got = np.asarray(um.call("up", {"upimgs": uv}))
    print(f"scheduled upsample: {time.time()-t0:.1f}s", flush=True)
    assert np.array_equal(got, np.repeat(np.repeat(uv, 2, 1), 2, 2))
    ustats = um.lowering_stats("up")
    assert ustats.get("pallas-mapreduce") == 1, ustats
    print("WINDOWED/STRIDED PALLAS FAMILY OK", flush=True)

    # masked ragged tiles + iterator masks on REAL Mosaic (interpret
    # mode cannot catch chip-side layout rejections): a non-dividing-
    # tile matmul (padded blocks, sliced output), a ragged lane-axis
    # reduction (identity-masked padding), and a causal iterator mask
    # (broadcasted_iota blocks) — round-4 emitter features
    from exprgrad_tpu import exp

    y_, x_, it_ = _iters("y", "x", "it")
    rc = Fun("rc")
    av_in, bv_in = input("ra"), input("rb")
    rc[y_, x_] = av_in[y_, it_] * bv_in[it_, x_]
    rc.schedule(tile={"y": 16, "x": 48, "it": 100}, parallel=["y", "x"])
    rm = compile(rc.target("rc"), backend="jax", schedule_mode="force")
    rav = rng.normal(size=(37, 211)).astype(np.float32)
    rbv = rng.normal(size=(211, 93)).astype(np.float32)
    t0 = time.time()
    got = np.asarray(rm.call("rc", {"ra": rav, "rb": rbv}))
    print(f"masked ragged matmul: {time.time()-t0:.1f}s", flush=True)
    mm_check(got, rav @ rbv,
             jnp.dot(jnp.asarray(rav), jnp.asarray(rbv)),
             "masked ragged matmul", tol=2e-4)
    assert rm.lowering_stats("rc").get("pallas") == 1

    y_, x_ = _iters("y", "x")
    rr = Fun("rr")
    rin = input("rin")
    rr[y_] = exp(rin[y_, x_])
    rr.schedule(tile={"x": 100})  # 200 -> 128-blocks, padded to 256
    rrm = compile(rr.target("rr"), backend="jax", schedule_mode="force")
    rv = rng.normal(size=(16, 200)).astype(np.float32)
    got = np.asarray(rrm.call("rr", {"rin": rv}))
    np.testing.assert_allclose(got, np.exp(rv).sum(axis=1), rtol=1e-5)
    assert rrm.lowering_stats("rr").get("pallas-mapreduce") == 1

    from exprgrad_tpu import select as _select

    q_, k_ = _iters("q", "k")
    cm = Fun("cm")
    cin = input("cin")
    cm[q_, k_] = _select(k_ <= q_, cin[q_, k_], 0.0)
    cm.schedule(tile={"q": 64})
    cmm = compile(cm.target("cm"), backend="jax", schedule_mode="force")
    cv = rng.normal(size=(256, 128)).astype(np.float32)
    got = np.asarray(cmm.call("cm", {"cin": cv}))
    want = np.where(np.arange(128)[None, :] <= np.arange(256)[:, None],
                    cv, 0.0)
    np.testing.assert_allclose(got, want)
    assert cmm.lowering_stats("cm").get("pallas-mapreduce") == 1
    # shifted-stencil reads (blur family): lane-axis contiguous shift is
    # the Mosaic-risky case (unaligned lane slice of a VMEM block)
    from exprgrad_tpu import irange as _irange

    bimg = input("bimg")
    blur = Fun("blur")
    y_ = _iters("y")
    x_ = _irange("x", 0, bimg.shape[1] - 2)
    blur[y_, x_] = (bimg[y_, x_] + bimg[y_, x_ + 1]
                    + bimg[y_, x_ + 2]) * (1.0 / 3.0)
    blur.schedule(tile={"y": 16})
    bm = compile(blur.target("blur"), backend="jax", schedule_mode="force")
    bv = rng.normal(size=(64, 514)).astype(np.float32)
    t0 = time.time()
    got = np.asarray(bm.call("blur", {"bimg": bv}))
    print(f"scheduled blur (lane shift): {time.time()-t0:.1f}s", flush=True)
    want = (bv[:, :512] + bv[:, 1:513] + bv[:, 2:514]) / 3.0
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert bm.lowering_stats("blur").get("pallas-mapreduce") == 1

    # dynamic (triangular) loop bounds: hull iteration + in-kernel
    # identity masks; and a permuted write (transpose kernel) — the
    # round-4 generality widenings, proven on real Mosaic
    ta = input("ta")
    ty_ = _iters("ty")
    tx_ = _irange("tx", 0, ty_ + 1)
    tri = Fun("tri")
    tri[ty_] = ta[ty_, tx_]
    tri.schedule(tile={"ty": 32})
    tm = compile(tri.target("tri"), backend="jax", schedule_mode="force")
    tv = rng.normal(size=(256, 256)).astype(np.float32)
    t0 = time.time()
    got = np.asarray(tm.call("tri", {"ta": tv}))
    print(f"scheduled triangular sum: {time.time()-t0:.1f}s", flush=True)
    np.testing.assert_allclose(got, np.tril(tv).sum(axis=1), rtol=1e-4,
                               atol=1e-4)
    assert tm.lowering_stats("tri").get("pallas-mapreduce") == 1

    pa = input("pa")
    py_, px_ = _iters("py", "px")
    per = Fun("per")
    per[px_, py_] = pa[py_, px_] * 2.0
    per.schedule(tile={"py": 32})
    pm_ = compile(per.target("per"), backend="jax", schedule_mode="force")
    pv = rng.normal(size=(64, 128)).astype(np.float32)
    got = np.asarray(pm_.call("per", {"pa": pv}))
    np.testing.assert_allclose(got, 2.0 * pv.T, rtol=1e-6)
    assert pm_.lowering_stats("per").get("pallas-mapreduce") == 1

    # fused row-chain softmax (3 kernels -> ONE Pallas kernel with
    # VMEM-resident row max/sums) on real Mosaic
    sin_ = input("sin")
    sy, sx = _iters("sy", "sx")
    smx = Fun("smx")
    smx.maximize[sy] = sin_[sy, sx]
    smx.schedule(tile={"sy": 32})
    sy, sx = _iters("sy", "sx")
    ssum = Fun("ssum")
    ssum[sy] = exp(sin_[sy, sx] - smx[sy])
    ssum.schedule(tile={"sy": 32})
    sy, sx = _iters("sy", "sx")
    sout = Fun("sout")
    sout[sy, sx] = exp(sin_[sy, sx] - smx[sy]) / ssum[sy]
    sout.schedule(tile={"sy": 32})
    sm_ = compile(sout.target("sout"), backend="jax",
                  schedule_mode="force")
    sv = (rng.normal(size=(256, 512)) * 8).astype(np.float32)
    t0 = time.time()
    got = np.asarray(sm_.call("sout", {"sin": sv}))
    print(f"fused row-chain softmax: {time.time()-t0:.1f}s", flush=True)
    es = np.exp(sv - sv.max(axis=1, keepdims=True))
    np.testing.assert_allclose(got, es / es.sum(axis=1, keepdims=True),
                               rtol=1e-5, atol=1e-6)
    assert sm_.lowering_stats("sout").get("pallas-rowchain") == 1

    # data-dependent gather + scatter-add (one-hot MXU contractions)
    # on real Mosaic — the round-4 computed-index family
    from exprgrad_tpu import to_index as _to_index

    gn, gt, gd = _iters("gn", "gt", "gd")
    gtok, gtab = input("gtok"), input("gtab")
    glk = Fun("glk")
    glk[gn, gt, gd] = gtab[_to_index(gtok[gn, gt]), gd]
    glk.with_shape([gtok.shape[0], gtok.shape[1], gtab.shape[1]])
    glk.schedule(tile={"gn": 4, "gt": 16})
    gm = compile(glk.target("glk"), backend="jax", schedule_mode="force")
    gtokv = rng.integers(0, 512, size=(8, 128)).astype(np.float32)
    gtabv = rng.normal(size=(512, 256)).astype(np.float32)
    t0 = time.time()
    got = np.asarray(gm.call("glk", {"gtok": gtokv, "gtab": gtabv}))
    print(f"scheduled gather lookup: {time.time()-t0:.1f}s", flush=True)
    np.testing.assert_allclose(got, gtabv[gtokv.astype(int)], rtol=1e-5,
                               atol=1e-5)
    assert gm.lowering_stats("glk").get("pallas-mapreduce") == 1

    si_, sd_ = _iters("si", "sd")
    stok, sval = input("stok"), input("sval")
    sct = Fun("sct")
    sct[_to_index(stok[si_]), sd_] = sval[si_, sd_]
    sct.with_shape([512, 256])
    sct.schedule(tile={"si": 64})
    scm = compile(sct.target("sct"), backend="jax", schedule_mode="force")
    stokv = rng.integers(0, 512, size=(1024,)).astype(np.float32)
    svalv = rng.normal(size=(1024, 256)).astype(np.float32)
    t0 = time.time()
    got = np.asarray(scm.call("sct", {"stok": stokv, "sval": svalv}))
    print(f"scheduled scatter-add: {time.time()-t0:.1f}s", flush=True)
    want = np.zeros((512, 256), np.float32)
    np.add.at(want, stokv.astype(int), svalv)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert scm.lowering_stats("sct").get("pallas-mapreduce") == 1
    print("MASKED/ITERATOR PALLAS OK", flush=True)

    # pure-iterator computed indices (this session's widening): the
    # compare-reduce gather (trailing-V iota select — NO reshapes, built
    # precisely because the one-hot reshape trips infer-vector-layout
    # "unsupported shape cast" outside the rest==[lane] class on real
    # hardware) and the pure-iterator scatter-add
    ci_, cj_ = _iters("ci", "cj")
    cx_in, ca_in = input("cx"), input("ca")
    cg = Fun("cg")
    cg[ci_, cj_] = cx_in[ci_, cj_] + ca_in[(ci_ * cj_) % 96]
    cg.with_shape([cx_in.shape[0], cx_in.shape[1]])
    cg.schedule(tile={"ci": 8})
    cgm = compile(cg.target("cg"), backend="jax", schedule_mode="force")
    cxv = rng.normal(size=(16, 128)).astype(np.float32)
    cav = rng.normal(size=(96,)).astype(np.float32)
    t0 = time.time()
    got = np.asarray(cgm.call("cg", {"cx": cxv, "ca": cav}))
    print(f"cmpred pure-iterator gather: {time.time()-t0:.1f}s",
          flush=True)
    cidx = (np.arange(16)[:, None] * np.arange(128)[None, :]) % 96
    np.testing.assert_allclose(got, cxv + cav[cidx], rtol=1e-5, atol=1e-5)
    assert cgm.lowering_stats("cg").get("pallas-mapreduce") == 1

    # lane-axis grouped read (upsample x // 2) through cmpred
    uy_, ux_ = _iters("uy", "ux")
    uin = input("uin")
    up = Fun("up")
    up[uy_, ux_] = uin[uy_, ux_ // 2]
    up.with_shape([uin.shape[0], uin.shape[1] * 2])
    up.schedule(tile={"uy": 8})
    upm = compile(up.target("up"), backend="jax", schedule_mode="force")
    uv = rng.normal(size=(16, 64)).astype(np.float32)
    got = np.asarray(upm.call("up", {"uin": uv}))
    np.testing.assert_allclose(got, np.repeat(uv, 2, axis=1), rtol=1e-6)
    assert upm.lowering_stats("up").get("pallas-mapreduce") == 1

    # multi-iterator affine read over a dynamic hull (suffix sums:
    # out[x] = sum_dx a[x + dx], dx < n - x) — cmpred + hull masks
    sa_in = input("sa")
    sx_ = _irange("sx", 0, sa_in.shape[0])
    sdx_ = _irange("sdx", 0, sa_in.shape[0] - sx_)
    suf = Fun("suf")
    suf[sx_] = sa_in[sx_ + sdx_]
    suf.with_shape([sa_in.shape[0]])
    suf.schedule(tile={"sx": 32})
    sufm = compile(suf.target("suf"), backend="jax",
                   schedule_mode="force")
    sav = rng.normal(size=(256,)).astype(np.float32)
    t0 = time.time()
    got = np.asarray(sufm.call("suf", {"sa": sav}))
    print(f"cmpred dynamic-hull suffix sum: {time.time()-t0:.1f}s",
          flush=True)
    want = np.array([sav[i:].sum() for i in range(256)], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert sufm.lowering_stats("suf").get("pallas-mapreduce") == 1

    # pure-iterator scatter-add (out[(i*j) % V] += x[i, j]) — the
    # transposed one-hot with an empty directly-written axis set
    pi_, pj_ = _iters("pi", "pj")
    px_in = input("px")
    psc = Fun("psc")
    psc[(pi_ * pj_) % 48] = px_in[pi_, pj_]
    psc.with_shape([48])
    psc.schedule(tile={"pj": 64})
    pscm = compile(psc.target("psc"), backend="jax",
                   schedule_mode="force")
    pxv = rng.normal(size=(16, 128)).astype(np.float32)
    got = np.asarray(pscm.call("psc", {"px": pxv}))
    want = np.zeros(48, np.float32)
    pidx = (np.arange(16)[:, None] * np.arange(128)[None, :]) % 48
    np.add.at(want, pidx.reshape(-1), pxv.reshape(-1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert pscm.lowering_stats("psc").get("pallas-mapreduce") == 1
    print("COMPUTED-INDEX (CMPRED) PALLAS OK", flush=True)

    # compare-reduce SCATTER classes (this session): self-referencing
    # written axis, non-lane out axis, and a flat-folded two-dim
    # computed write — all layout-safe by construction, proven on-chip
    wi_, wj_ = _iters("wi", "wj")
    wv_in = input("wv")
    wsc = Fun("wsc")
    wsc[wi_, (wi_ + wj_) % 96] = wv_in[wi_, wj_]
    wsc.with_shape([16, 96])
    wsc.schedule(tile={"wi": 8})
    wscm = compile(wsc.target("wsc"), backend="jax",
                   schedule_mode="force")
    wvv = rng.normal(size=(16, 128)).astype(np.float32)
    t0 = time.time()
    got = np.asarray(wscm.call("wsc", {"wv": wvv}))
    print(f"cmpred self-ref scatter: {time.time()-t0:.1f}s", flush=True)
    want = np.zeros((16, 96), np.float32)
    for i in range(16):
        np.add.at(want[i], (i + np.arange(128)) % 96, wvv[i])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert wscm.lowering_stats("wsc").get("pallas-mapreduce") == 1

    mi_, mj_ = _iters("mi", "mj")
    mx_in = input("mx")
    msc = Fun("msc")
    msc[(2 * mi_) % 16, (mj_ * mj_) % 24] = mx_in[mi_, mj_]
    msc.with_shape([16, 24])
    msc.schedule(tile={"mi": 8})
    mscm = compile(msc.target("msc"), backend="jax",
                   schedule_mode="force")
    mxv = rng.normal(size=(16, 128)).astype(np.float32)
    got = np.asarray(mscm.call("msc", {"mx": mxv}))
    want = np.zeros((16, 24), np.float32)
    for i in range(16):
        for j in range(128):
            want[(2 * i) % 16, (j * j) % 24] += mxv[i, j]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert mscm.lowering_stats("msc").get("pallas-mapreduce") == 1
    print("CMPRED SCATTER CLASSES OK", flush=True)



    # flash_transformer: one real train step on-chip (extern fused
    # attention through the symbolic backward), finite + loss sane
    from exprgrad_tpu.models import flash_transformer

    ft = compile(
        flash_transformer(vocab=64, dim=256, heads=2, hidden=512,
                          max_seq=128),
        seed=0, precision="default",
    )
    toks = rng.integers(0, 64, (4, 128)).astype(np.float32)
    labels = np.eye(64, dtype=np.float32)[
        rng.integers(0, 64, (4, 128))
    ]
    targs = {"tokens": toks, "labels": labels}
    t0 = time.time()
    l0 = float(ft.call("loss", targs)[0])
    ft.epoch += 1
    ft.apply("train", targs)
    l1 = float(ft.call("loss", targs)[0])
    print(f"flash_transformer on-chip: {time.time()-t0:.1f}s, "
          f"loss {l0:.4f} -> {l1:.4f}", flush=True)
    assert np.isfinite(l0) and np.isfinite(l1) and l1 < l0
    print("FLASH TRANSFORMER TRAIN STEP OK", flush=True)

    # async input pipeline on-chip: a Prefetcher-placed (device-resident)
    # batch feeds the SAME compiled executor — no re-trace, no host bounce
    from exprgrad_tpu.io import Batches, Prefetcher

    pre_batch = next(iter(Prefetcher(
        Batches(targs, 4, shuffle=False), depth=1,
        dtype=np.dtype(ft.program.scalar_type.value))))
    ft.epoch += 1
    ft.apply("train", pre_batch)
    l2 = float(ft.call("loss", targs)[0])
    assert np.isfinite(l2) and l2 < l0
    print("PREFETCHED DEVICE-RESIDENT STEP OK", flush=True)

    # remat memory effect on the TPU compiler (informational: the CPU
    # pipeline CSEs recomputes away — jax.checkpoint included — so this
    # can only be observed here)
    from exprgrad_tpu.passes import infer_shapes

    for flag in () if DRY else (False, True):  # CPU memory_analysis
        # CSEs the recompute away — chip-only observation
        mr = compile(
            flash_transformer(vocab=64, dim=256, heads=2, hidden=1024,
                              blocks=2, max_seq=128, remat=flag),
            seed=0, precision="default",
        )
        prog = mr.program
        shp = infer_shapes(
            prog, "train",
            [(prog.inputs["tokens"], [8, 128]),
             (prog.inputs["labels"], [8, 128, 64])],
        )
        ex = mr._executor("train", shp)
        spec = {
            tid: jax.ShapeDtypeStruct(tuple(shp[tid]), np.float32)
            for tid in ex.input_tids
        }
        ma = jax.jit(ex.run_fn).lower(spec, 0, 0).compile().memory_analysis()
        print(f"remat={flag}: temp={ma.temp_size_in_bytes/2**20:.2f}MiB",
              flush=True)

    # serving scheduler on-chip: paged pool + pinned prefix + chunked
    # decode/prefill, greedy bit-equal to solo serving on real hardware
    from exprgrad_tpu.models import ContinuousBatcher, FlashLMServer

    srv = FlashLMServer(ft)
    sys_p = rng.integers(0, 64, 16).astype(np.float32)
    prompts = [np.concatenate([sys_p, rng.integers(0, 64, n).astype(
        np.float32)]) for n in (9, 21)] + [
        rng.integers(0, 64, 6).astype(np.float32)]
    budgets = [10, 6, 8]
    t0 = time.time()
    solo = [np.asarray(srv.generate(p[None], n_new=mn))[0]
            for p, mn in zip(prompts, budgets)]
    cb = ContinuousBatcher(srv, slots=2, capacity=128, paged=True,
                           page_size=16, decode_chunk=4, prefill_chunk=16)
    cb.register_prefix(sys_p)
    rids = [cb.submit(p, mn) for p, mn in zip(prompts, budgets)]
    done = cb.run()
    for rid, ref in zip(rids, solo):
        assert np.array_equal(done[rid], ref.astype(np.int64)), rid
    assert cb.stats["free_pages"] == cb.stats["pool_pages"] - 1
    print(f"continuous batching on-chip: {time.time()-t0:.1f}s, "
          f"{cb.stats}", flush=True)
    print("SERVING SCHEDULER OK", flush=True)

    # paged-attention Pallas kernel on-chip: (a) raw kernel vs the XLA
    # gather oracle (the Mosaic-lowering proof interpret mode cannot
    # give), (b) the flash-attention batcher stays token-equal to solo
    from exprgrad_tpu.ops import paged_decode_attention
    from exprgrad_tpu.ops.decode import decode_attention
    from exprgrad_tpu.ops.paged import gather_view, init_pool

    pool = init_pool(16, 2, 128, 128)
    pool = pool._replace(
        k=jnp.asarray(rng.normal(size=pool.k.shape), pool.k.dtype),
        v=jnp.asarray(rng.normal(size=pool.v.shape), pool.v.dtype),
    )
    ptab = jnp.asarray([[3, 7, 11, -1], [1, 5, 9, 13]], jnp.int32)
    kp = np.full((2, 512), -1, np.int32)
    kp[0, :300] = np.arange(300)
    kp[1, :512] = np.arange(512)
    qp = jnp.asarray([[299], [511]], jnp.int32)
    qq = jnp.asarray(rng.normal(size=(2, 4, 1, 128)), jnp.float32)
    t0 = time.time()
    got = paged_decode_attention(qq, pool, ptab, jnp.asarray(kp), qp,
                                 interpret=INTERP)
    got = np.asarray(got)
    print(f"paged kernel: {time.time()-t0:.1f}s", flush=True)
    want = np.asarray(decode_attention(
        qq, gather_view(pool, jnp.maximum(ptab, 0)),
        key_pos=jnp.asarray(kp), q_pos=qp))
    rel = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    print("paged kernel max rel err:", rel, flush=True)
    # on-chip the two paths differ at ~1e-3 relative: the XLA einsum
    # runs default-precision (bf16 MXU passes) while the Pallas dot
    # accumulates f32, and the pool itself is bf16 — exact agreement is
    # a CPU/interpret property (tests pin it at 2e-5 there)
    assert rel < 5e-3, rel

    t0 = time.time()
    cbf = ContinuousBatcher(srv, slots=2, capacity=128, paged=True,
                            page_size=16, decode_chunk=4,
                            attention="flash")
    rids = [cbf.submit(p, mn) for p, mn in zip(prompts, budgets)]
    done = cbf.run()
    # exact greedy equality vs the dense path is proven on CPU where
    # both attentions track the oracle to 1e-7; on-chip the ~1e-3
    # bf16-pass divergence can flip near-tie argmaxes, so assert shape
    # sanity + a high match fraction instead of bit equality
    match = total = 0
    for rid, ref in zip(rids, solo):
        toks = np.asarray(done[rid])
        assert toks.shape == ref.shape, (rid, toks.shape, ref.shape)
        assert ((toks >= 0) & (toks < 64)).all(), rid
        match += int((toks == ref.astype(np.int64)).sum())
        total += toks.size
    frac = match / max(total, 1)
    print(f"flash-attention batcher on-chip: {time.time()-t0:.1f}s, "
          f"token match vs dense solo {frac:.2f}", flush=True)
    assert frac >= 0.5, frac
    print("PAGED ATTENTION KERNEL OK", flush=True)
    print("ALL ON-CHIP VALIDATIONS PASSED", flush=True)


if __name__ == "__main__":
    main()
