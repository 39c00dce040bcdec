"""Generalized schedule-driven Pallas emitter (PallasMapReduce) + the
cost-model routing policy.

The reference compiles ANY scheduled kernel body through its GPU codegen
(clgen.nim:249-257, tileLoops/cacheTensors passes.nim:2043-2323); here the
map/reduce family lowers to Pallas under ``schedule_mode="force"`` (checked
numerically against the interp oracle, interpret mode on CPU), while the
default ``auto`` mode routes through the measured cost model and reports
every fallback with a ScheduleWarning — schedules are never silently
ignored.
"""

import warnings

import numpy as np
import pytest

from exprgrad_tpu import (
    Fun,
    ScheduleWarning,
    compile,
    exp,
    input,
    iters,
    maximum,
    select,
    sq,
    sqrt,
)


def _stats(model):
    ex = next(iter(model._executors.values()))
    return ex.stats


def _softmax_graph(tile=None, share_cache=()):
    inp = input("inp")
    y, x = iters("y", "x")
    row_max = Fun("mx")
    row_max.maximize[y] = inp[y, x]
    row_max.schedule(tile=tile, share_cache=share_cache)
    y, x = iters("y", "x")
    sums = Fun("sums")
    sums[y] = exp(inp[y, x] - row_max[y])
    sums.schedule(tile=tile, share_cache=share_cache)
    y, x = iters("y", "x")
    out = Fun("out")
    out[y, x] = exp(inp[y, x] - row_max[y]) / sums[y]
    out.schedule(tile=tile, share_cache=share_cache)
    return out.target("out")


def _softmax_ref(v):
    e = np.exp(v - v.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def test_scheduled_softmax_lowers_to_pallas():
    """The three softmax kernels (max-reduce, sum-reduce, elementwise)
    fuse into ONE Pallas row-chain kernel (VMEM-resident row max/sums;
    one HBM read of the input) and match numpy."""
    rng = np.random.default_rng(0)
    v = (rng.normal(size=(64, 256)) * 10).astype(np.float32)
    graph = _softmax_graph(tile={"y": 32})
    model = compile(graph, backend="jax", schedule_mode="force")
    out = model.call("out", {"inp": v})
    np.testing.assert_allclose(out, _softmax_ref(v), rtol=1e-5, atol=1e-6)
    stats = _stats(model)
    assert stats.get("pallas-rowchain") == 1, stats


def test_scheduled_softmax_matches_oracle():
    rng = np.random.default_rng(1)
    v = (rng.normal(size=(32, 256)) * 5).astype(np.float32)
    # lane-dim tiles must be 128-aligned (Mosaic); 64 would be declined
    graph = _softmax_graph(tile={"y": 16, "x": 128})
    mj = compile(graph, backend="jax", schedule_mode="force")
    a = mj.call("out", {"inp": v})
    b = compile(graph, backend="interp").call("out", {"inp": v})
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    assert _stats(mj).get("pallas-rowchain") == 1


def test_scheduled_layer_norm_shape():
    """layer_norm-shaped kernels (mean, var, normalize) through Pallas."""
    dim = 128
    inv_d = 1.0 / dim
    inp = input("inp")
    gamma, beta = input("gamma"), input("beta")

    n = Fun("mean")
    y, x = iters("y", "x")
    n[y] = inp[y, x] * inv_d
    n.schedule(tile={"y": 16})

    v = Fun("var")
    y, x = iters("y", "x")
    v[y] = sq(inp[y, x] - n[y]) * inv_d
    v.schedule(tile={"y": 16})

    out = Fun("out")
    y, x = iters("y", "x")
    out[y, x] = (inp[y, x] - n[y]) / sqrt(v[y] + 1e-5) * gamma[x] + beta[x]
    out.schedule(tile={"y": 16})

    rng = np.random.default_rng(2)
    args = {
        "inp": rng.normal(size=(64, dim)).astype(np.float32),
        "gamma": rng.normal(size=(dim,)).astype(np.float32),
        "beta": rng.normal(size=(dim,)).astype(np.float32),
    }
    graph = out.target("out")
    model = compile(graph, backend="jax", schedule_mode="force")
    got = model.call("out", args)
    xm = args["inp"] - args["inp"].mean(axis=1, keepdims=True)
    var = (xm**2).mean(axis=1, keepdims=True)
    want = xm / np.sqrt(var + 1e-5) * args["gamma"] + args["beta"]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # mean -> var -> normalize fuses into one row-chain kernel
    assert _stats(model).get("pallas-rowchain") == 1


def test_gridded_reduction_axis():
    """A tiled reduction axis runs over the grid with a VMEM accumulator."""
    inp = input("inp")
    sums = Fun("sums")
    y, x = iters("y", "x")
    sums[y] = inp[y, x] * 2.0
    sums.schedule(tile={"y": 32, "x": 128})  # x is the reduction axis
    rng = np.random.default_rng(3)
    v = rng.normal(size=(64, 512)).astype(np.float32)
    model = compile(sums.target("sums"), backend="jax", schedule_mode="force")
    out = model.call("sums", {"inp": v})
    # gridded accumulation reorders the f32 sum: allow absolute slack
    np.testing.assert_allclose(out, (v * 2).sum(axis=1), rtol=1e-5, atol=1e-4)
    assert _stats(model).get("pallas-mapreduce") == 1


def test_gridded_max_reduction():
    inp = input("inp")
    mx = Fun("mx")
    y, x = iters("y", "x")
    mx.maximize[y] = inp[y, x]
    mx.schedule(tile={"x": 128})
    rng = np.random.default_rng(4)
    v = rng.normal(size=(32, 512)).astype(np.float32)
    model = compile(mx.target("mx"), backend="jax", schedule_mode="force")
    out = model.call("mx", {"inp": v})
    np.testing.assert_allclose(out, v.max(axis=1), rtol=1e-6)
    assert _stats(model).get("pallas-mapreduce") == 1


def test_rank1_elementwise():
    """Rank-1 kernels embed a leading dummy axis (lane dim = the loop)."""
    inp = input("inp")
    out = Fun("out")
    x = iters("x")
    out[x] = exp(inp[x]) + 1.0
    out.schedule(tile={"x": 128})
    v = np.linspace(-1, 1, 256).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"inp": v})
    np.testing.assert_allclose(got, np.exp(v) + 1, rtol=1e-6)
    assert _stats(model).get("pallas-mapreduce") == 1


def test_broadcast_write():
    """Output axes not covered by any read broadcast the value."""
    inp = input("inp")
    out = Fun("out")
    y, x = iters("y", "x")
    out[y, x] = inp[y] * 3.0
    out.with_shape([inp.shape[0], 64])
    out.schedule(tile={"y": 16})
    v = np.arange(32).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"inp": v})
    np.testing.assert_allclose(got, np.tile((v * 3)[:, None], (1, 64)))
    assert _stats(model).get("pallas-mapreduce") == 1


def test_share_cache_keeps_axis_resident():
    """share_cache on the reduction axis forces the whole extent into each
    block (no reduction gridding even when tiled)."""
    inp = input("inp")
    sums = Fun("sums")
    y, x = iters("y", "x")
    sums[y] = exp(inp[y, x])
    sums.schedule(tile={"y": 16}, share_cache=["x"])
    rng = np.random.default_rng(5)
    v = rng.normal(size=(32, 256)).astype(np.float32)
    model = compile(sums.target("sums"), backend="jax", schedule_mode="force")
    out = model.call("sums", {"inp": v})
    np.testing.assert_allclose(out, np.exp(v).sum(axis=1), rtol=1e-5)
    assert _stats(model).get("pallas-mapreduce") == 1


def test_auto_mode_falls_back_with_warning():
    """Default auto mode: the uncalibrated cost model prefers XLA, the
    schedule falls back WITH a ScheduleWarning and a stats entry, and the
    result is still correct."""
    inp = input("inp")
    out = Fun("out")
    x = iters("x")
    out[x] = exp(inp[x])
    out.schedule(tile={"x": 64})
    v = np.linspace(-1, 1, 256).astype(np.float32)
    model = compile(out.target("out"), backend="jax")
    with pytest.warns(ScheduleWarning, match="not routed to Pallas"):
        got = model.call("out", {"inp": v})
    np.testing.assert_allclose(got, np.exp(v), rtol=1e-6)
    stats = _stats(model)
    assert stats.get("pallas-mapreduce") is None
    assert stats.get("schedule-fallback") == 1


def test_ignore_mode_is_silent():
    inp = input("inp")
    out = Fun("out")
    x = iters("x")
    out[x] = exp(inp[x])
    out.schedule(tile={"x": 64})
    v = np.linspace(-1, 1, 128).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="ignore")
    with warnings.catch_warnings():
        warnings.simplefilter("error", ScheduleWarning)
        got = model.call("out", {"inp": v})
    np.testing.assert_allclose(got, np.exp(v), rtol=1e-6)
    assert _stats(model).get("schedule-fallback") is None


def test_diagonal_band_read_via_cmpred_gather():
    """A read dim mixing two iterators (inp[y + x, x] — a diagonal band,
    self-referencing the read's own iterator axis) lowers through the
    compare-reduce gather.  (This used to be the canonical unmappable
    example; the computed-index family absorbed it.)"""
    inp = input("inp")
    out = Fun("out")
    y, x = iters("y", "x")
    out[y, x] = inp[y + x, x]
    out.with_shape([inp.shape[1], inp.shape[1]])
    out.schedule(tile={"y": 16})
    rng = np.random.default_rng(6)
    v = rng.normal(size=(128, 64)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"inp": v})
    exp = np.stack(
        [v[yy + np.arange(64), np.arange(64)] for yy in range(64)]
    )
    np.testing.assert_allclose(got, exp, rtol=1e-6)
    assert _stats(model).get("pallas-mapreduce") == 1, _stats(model)


def test_unsupported_schedule_warns_in_force_mode():
    """A scheduled kernel the emitters cannot map (a grouped dim combined
    with a computed dim in ONE read) warns and falls back — never
    silently dropped."""
    inp = input("inp")
    out = Fun("out")
    y, x = iters("y", "x")
    out[y, x] = inp[y + x, x // 2]  # computed dim + grouped dim
    out.with_shape([inp.shape[1] * 2, inp.shape[1] * 2])
    out.schedule(tile={"y": 16})
    rng = np.random.default_rng(6)
    v = rng.normal(size=(128, 32)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    with pytest.warns(ScheduleWarning, match="unsupported kernel shape"):
        got = model.call("out", {"inp": v})
    want = v[np.arange(64)[:, None] + np.arange(64)[None, :],
             (np.arange(64) // 2)[None, :].repeat(64, 0)]
    np.testing.assert_allclose(got, want)


def test_contraction_shape_stays_on_mxu_paths():
    """A scheduled row-dot (pure product sharing the reduction axis) is NOT
    taken by the map/reduce emitter; it lands on the einsum path (MXU)."""
    a, b = input("a"), input("b")
    out = Fun("out")
    y, x = iters("y", "x")
    out[y] = a[y, x] * b[y, x]
    out.schedule(tile={"y": 16})
    rng = np.random.default_rng(7)
    av = rng.normal(size=(32, 64)).astype(np.float32)
    bv = rng.normal(size=(32, 64)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    with pytest.warns(ScheduleWarning, match="contraction"):
        got = model.call("out", {"a": av, "b": bv})
    np.testing.assert_allclose(got, (av * bv).sum(axis=1), rtol=1e-5)
    stats = _stats(model)
    assert stats.get("einsum") == 1
    assert stats.get("pallas-mapreduce") is None


def test_scheduled_maxpool_lowers_to_pallas():
    """Strided window reads (s*i + c): a scheduled 2x2 maxpool honors its
    schedule through the Pallas emitter (VERDICT r2 missing #1; the
    reference compiles any scheduled body, clgen.nim:249-257)."""
    imgs = input("imgs")
    i, y, x, c = iters("i", "y", "x", "c")
    out = Fun("out")
    out[i, y, x, c] = maximum(
        maximum(imgs[i, y * 2, x * 2, c], imgs[i, y * 2 + 1, x * 2, c]),
        maximum(imgs[i, y * 2, x * 2 + 1, c],
                imgs[i, y * 2 + 1, x * 2 + 1, c]),
    )
    out.schedule(tile={"y": 8})
    rng = np.random.default_rng(10)
    v = rng.normal(size=(2, 16, 16, 128)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"imgs": v})
    want = v.reshape(2, 8, 2, 8, 2, 128).max(axis=(2, 4))
    np.testing.assert_allclose(got, want)
    assert _stats(model).get("pallas-mapreduce") == 1
    oracle = compile(out.target("out"), backend="interp").call(
        "out", {"imgs": v}
    )
    np.testing.assert_allclose(got, oracle)


def test_scheduled_avgpool_strided_sum():
    imgs = input("imgs")
    i, y, x, c = iters("i", "y", "x", "c")
    out = Fun("out")
    out[i, y, x, c] = (
        imgs[i, y * 2, x * 2, c] + imgs[i, y * 2 + 1, x * 2, c]
        + imgs[i, y * 2, x * 2 + 1, c] + imgs[i, y * 2 + 1, x * 2 + 1, c]
    ) / 4.0
    out.schedule(tile={"i": 1})
    rng = np.random.default_rng(11)
    v = rng.normal(size=(2, 8, 8, 128)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"imgs": v})
    want = v.reshape(2, 4, 2, 4, 2, 128).mean(axis=(2, 4))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert _stats(model).get("pallas-mapreduce") == 1


def test_scheduled_upsample_div_read():
    """Grouped reads (i // k): scheduled 2x upsampling repeats the input
    block in VMEM."""
    imgs = input("imgs")
    i, y, x, c = iters("i", "y", "x", "c")
    up = Fun("up")
    up[i, y, x, c] = imgs[i, y // 2, x // 2, c]
    up.with_shape([imgs.shape[0], imgs.shape[1] * 2, imgs.shape[2] * 2,
                   imgs.shape[3]])
    up.schedule(tile={"y": 8})
    rng = np.random.default_rng(12)
    v = rng.normal(size=(2, 8, 8, 128)).astype(np.float32)
    model = compile(up.target("up"), backend="jax", schedule_mode="force")
    got = model.call("up", {"imgs": v})
    want = np.repeat(np.repeat(v, 2, axis=1), 2, axis=2)
    np.testing.assert_allclose(got, want)
    assert _stats(model).get("pallas-mapreduce") == 1


def test_scheduled_pool_gradient_shape():
    """The maxpool-gradient kernel shape: a select(==) routing between a
    full-range read and two grouped (i // 2) reads."""
    imgs, pooled, gout = input("imgs"), input("pooled"), input("gout")
    i, y, x, c = iters("i", "y", "x", "c")
    gin = Fun("gin")
    gin[i, y, x, c] = select(
        imgs[i, y, x, c] == pooled[i, y // 2, x // 2, c],
        gout[i, y // 2, x // 2, c],
        0.0,
    )
    gin.schedule(tile={"y": 8})
    rng = np.random.default_rng(13)
    v = rng.normal(size=(1, 16, 16, 128)).astype(np.float32)
    p = v.reshape(1, 8, 2, 8, 2, 128).max(axis=(2, 4))
    g = rng.normal(size=p.shape).astype(np.float32)
    model = compile(gin.target("gin"), backend="jax", schedule_mode="force")
    got = model.call("gin", {"imgs": v, "pooled": p, "gout": g})
    sel = v == np.repeat(np.repeat(p, 2, 1), 2, 2)
    want = np.where(sel, np.repeat(np.repeat(g, 2, 1), 2, 2), 0.0)
    np.testing.assert_allclose(got, want)
    assert _stats(model).get("pallas-mapreduce") == 1


def test_transformed_lane_read_via_cmpred_gather():
    """A grouped read on the LANE axis (inp[y, x // 2]) — Mosaic rejects
    strided/repeat slices there, but the layout-safe compare-reduce
    gather (trailing-V iota select, no reshapes) lowers it to Pallas."""
    inp = input("inp")
    out = Fun("out")
    y, x = iters("y", "x")
    out[y, x] = inp[y, x // 2]
    out.with_shape([inp.shape[0], inp.shape[1] * 2])
    out.schedule(tile={"y": 8})
    rng = np.random.default_rng(14)
    v = rng.normal(size=(16, 64)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"inp": v})
    np.testing.assert_allclose(got, np.repeat(v, 2, axis=1))
    assert _stats(model).get("pallas-mapreduce") == 1, _stats(model)


def test_shifted_read_declines():
    """A plain shift (i + 1) crosses block boundaries — declined, correct
    via XLA."""
    inp = input("inp")
    out = Fun("out")
    y, x = iters("y", "x")
    out[y, x] = inp[y + 1, x]
    out.with_shape([inp.shape[0] - 1, inp.shape[1]])
    out.schedule(tile={"y": 8})
    rng = np.random.default_rng(15)
    v = rng.normal(size=(17, 128)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    with pytest.warns(ScheduleWarning):
        got = model.call("out", {"inp": v})
    np.testing.assert_allclose(got, v[1:])
    assert _stats(model).get("pallas-mapreduce") is None


def test_misaligned_lane_tile_rounds_to_mosaic_alignment():
    """A user tile that would produce a Mosaic-illegal partial block on
    the lane dim (not 128-aligned) is rounded up to the alignment and
    still lowers through Pallas (instead of shipping a kernel the chip
    rejects — the round-2 failure mode — or declining outright)."""
    inp = input("inp")
    out = Fun("out")
    y, x = iters("y", "x")
    out[y, x] = exp(inp[y, x])
    out.schedule(tile={"x": 64})  # partial 64 over 256 lanes: rounds to 128
    v = np.linspace(-1, 1, 32 * 256).reshape(32, 256).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"inp": v})
    np.testing.assert_allclose(got, np.exp(v), rtol=1e-6)
    assert _stats(model).get("pallas-mapreduce") == 1


def test_partial_read_reduction():
    """Reduction where one read covers the reduced axis and another does
    not (the softmax-sums shape) — broadcasting inside the block."""
    a, b = input("a"), input("b")
    out = Fun("out")
    y, x = iters("y", "x")
    out[y] = exp(a[y, x]) + b[y]
    out.schedule(tile={"y": 8})
    rng = np.random.default_rng(8)
    av = rng.normal(size=(16, 32)).astype(np.float32)
    bv = rng.normal(size=(16,)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"a": av, "b": bv})
    want = (np.exp(av) + bv[:, None]).sum(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert _stats(model).get("pallas-mapreduce") == 1


# ---------------------------------------------------------------------------
# iterator-referencing expressions (broadcasted_iota blocks) + masked
# ragged tiles (padded blocks with identity-guarded reductions)
# ---------------------------------------------------------------------------


def test_scheduled_causal_mask_kernel():
    """An index-dependent mask (select on loop iterators) lowers through
    Pallas: the iterators materialize as broadcasted_iota blocks offset by
    the grid position."""
    inp = input("inp")
    out = Fun("out")
    y, x = iters("y", "x")
    out[y, x] = select(x <= y, inp[y, x], 0.0)
    out.schedule(tile={"y": 64})
    rng = np.random.default_rng(21)
    v = rng.normal(size=(256, 128)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"inp": v})
    rows = np.arange(256)[:, None]
    cols = np.arange(128)[None, :]
    np.testing.assert_allclose(got, np.where(cols <= rows, v, 0.0))
    assert _stats(model).get("pallas-mapreduce") == 1


def test_scheduled_banded_reduction_with_iterators():
    """Iterator masks combined with an in-kernel reduction: a causal row
    sum out[y] += select(x <= y, a[y, x], 0)."""
    a = input("a")
    out = Fun("out")
    y, x = iters("y", "x")
    out[y] = select(x <= y, a[y, x], 0.0)
    out.schedule(tile={"y": 32})
    rng = np.random.default_rng(22)
    av = rng.normal(size=(128, 128)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"a": av})
    want = np.tril(av).sum(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert _stats(model).get("pallas-mapreduce") == 1


def test_masked_ragged_output_tile():
    """A user tile that does not divide the output extent pads the blocks
    and slices the result (no decline, no fallback)."""
    inp = input("inp")
    out = Fun("out")
    y, x = iters("y", "x")
    out[y, x] = exp(inp[y, x])
    out.schedule(tile={"y": 48})  # 100 % 48 != 0 -> masked/padded
    v = np.linspace(-1, 1, 100 * 128).reshape(100, 128).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"inp": v})
    np.testing.assert_allclose(got, np.exp(v), rtol=1e-6)
    assert _stats(model).get("pallas-mapreduce") == 1


def test_masked_ragged_reduction_identity_add():
    """A padded reduction axis masks the pad positions to the additive
    identity — exp(0)=1 from zero padding must NOT leak into the sums."""
    a = input("a")
    out = Fun("out")
    y, x = iters("y", "x")
    out[y] = exp(a[y, x])
    out.schedule(tile={"x": 100})  # lane axis: rounds to 128, pads 200->256
    rng = np.random.default_rng(23)
    av = rng.normal(size=(16, 200)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"a": av})
    np.testing.assert_allclose(got, np.exp(av).sum(axis=1), rtol=1e-5)
    assert _stats(model).get("pallas-mapreduce") == 1


def test_masked_ragged_reduction_identity_max():
    """Max-mode masked reduction: zero padding would corrupt an all-
    negative row; the pad positions must read as -inf."""
    a = input("a")
    mx = Fun("mx")
    y, x = iters("y", "x")
    mx.maximize[y] = a[y, x]
    mx.schedule(tile={"x": 96})  # 200 % 96 != 0 on the lane axis
    rng = np.random.default_rng(24)
    av = (-1.0 - np.abs(rng.normal(size=(16, 200)))).astype(np.float32)
    model = compile(mx.target("mx"), backend="jax", schedule_mode="force")
    got = model.call("mx", {"a": av})
    np.testing.assert_allclose(got, av.max(axis=1), rtol=1e-6)
    assert _stats(model).get("pallas-mapreduce") == 1


def test_shifted_stencil_blur_kernel():
    """The reference's blur family: reads at shifted indices (x + c)
    under an explicitly bounded iterator (test_model.py blur kernels).
    The shifted axis stays whole-in-block and the kernel takes static
    slices (clgen emits any computed body, clgen.nim:249-257)."""
    from exprgrad_tpu import irange

    img = input("img")
    out = Fun("out")
    y = iters("y")
    x = irange("x", 0, img.shape[1] - 2)
    out[y, x] = (img[y, x] + img[y, x + 1] + img[y, x + 2]) * (1.0 / 3.0)
    out.schedule(tile={"y": 16})
    rng = np.random.default_rng(31)
    v = rng.normal(size=(64, 130)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"img": v})
    want = (v[:, :128] + v[:, 1:129] + v[:, 2:130]) / 3.0
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert _stats(model).get("pallas-mapreduce") == 1


def test_shifted_stencil_sublane_axis():
    """Shifted reads on a non-lane axis (y + c), with the shifted axis
    whole and the lane axis tiled."""
    from exprgrad_tpu import irange

    img = input("img")
    out = Fun("out")
    y = irange("y", 0, img.shape[0] - 1)
    x = iters("x")
    out[y, x] = img[y, x] - img[y + 1, x]
    out.schedule(tile={"x": 128})
    rng = np.random.default_rng(32)
    v = rng.normal(size=(33, 256)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"img": v})
    np.testing.assert_allclose(got, v[:32] - v[1:33], rtol=1e-6)
    assert _stats(model).get("pallas-mapreduce") == 1


def test_shifted_stencil_reduction():
    """Shift + reduce: a 1-D correlation out[y] += a[y, x] * k-ish shifted
    read combination (the shifted axis is the reduction)."""
    from exprgrad_tpu import irange

    a = input("a")
    out = Fun("out")
    y = iters("y")
    x = irange("x", 0, a.shape[1] - 1)
    out[y] = a[y, x] * a[y, x + 1]
    out.schedule(tile={"y": 8})
    rng = np.random.default_rng(33)
    v = rng.normal(size=(16, 129)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"a": v})
    want = (v[:, :128] * v[:, 1:129]).sum(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert _stats(model).get("pallas-mapreduce") == 1


def test_shifted_tile_on_shifted_axis_declines():
    """Tiling the shifted axis is impossible (overlapping windows);
    the schedule falls back with the reason."""
    from exprgrad_tpu import irange

    img = input("img")
    out = Fun("out")
    y = irange("y", 0, img.shape[0] - 1)
    x = iters("x")
    out[y, x] = img[y, x] + img[y + 1, x]
    out.schedule(tile={"y": 8, "x": 128})
    rng = np.random.default_rng(34)
    v = rng.normal(size=(32, 128)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    with pytest.warns(ScheduleWarning, match="shifted-slice"):
        got = model.call("out", {"img": v})
    np.testing.assert_allclose(got, v[:31] + v[1:32], rtol=1e-6)


def test_scheduled_scalar_loss_kernel():
    """The loss family: loss[0] = expr reduces every loop axis into a
    size-1 output — scheduled, it lowers as an all-reduce Pallas kernel."""
    a, b = input("a"), input("b")
    loss = Fun("loss")
    y, x = iters("y", "x")
    loss[0] = sq(a[y, x] - b[y, x])
    loss.schedule(tile={"y": 16})
    rng = np.random.default_rng(41)
    av = rng.normal(size=(64, 128)).astype(np.float32)
    bv = rng.normal(size=(64, 128)).astype(np.float32)
    model = compile(loss.target("loss"), backend="jax",
                    schedule_mode="force")
    got = model.call("loss", {"a": av, "b": bv})
    np.testing.assert_allclose(
        got, [((av - bv) ** 2).sum()], rtol=1e-5
    )
    assert _stats(model).get("pallas-mapreduce") == 1


def test_scheduled_scalar_max_kernel():
    """Global max into a size-1 output through the masked identity."""
    a = input("a")
    mx = Fun("mx")
    y, x = iters("y", "x")
    mx.maximize[0] = a[y, x]
    mx.schedule(tile={"x": 100})  # ragged lane tile too
    rng = np.random.default_rng(42)
    av = (-1 - np.abs(rng.normal(size=(16, 200)))).astype(np.float32)
    model = compile(mx.target("mx"), backend="jax", schedule_mode="force")
    got = model.call("mx", {"a": av})
    np.testing.assert_allclose(got, [av.max()], rtol=1e-6)
    assert _stats(model).get("pallas-mapreduce") == 1


# ---------------------------------------------------------------------------
# permuted reads/writes + dynamic (triangular) loop bounds
# ---------------------------------------------------------------------------


def test_scheduled_permuted_read():
    """A read whose axes are a permutation of loop order is transposed
    into loop order outside the kernel instead of declining."""
    a, b = input("a"), input("b")
    out = Fun("out")
    y, x = iters("y", "x")
    out[y, x] = a[y, x] + b[x, y]
    out.schedule(tile={"y": 32})
    rng = np.random.default_rng(51)
    av = rng.normal(size=(64, 128)).astype(np.float32)
    bv = rng.normal(size=(128, 64)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"a": av, "b": bv})
    np.testing.assert_allclose(got, av + bv.T, rtol=1e-6)
    assert _stats(model).get("pallas-mapreduce") == 1


def test_scheduled_permuted_read_reduction():
    """Permuted read feeding an in-kernel reduction."""
    a, b = input("a"), input("b")
    out = Fun("out")
    y, x = iters("y", "x")
    out[y] = exp(a[y, x]) + b[x, y]
    out.schedule(tile={"y": 16})
    rng = np.random.default_rng(52)
    av = rng.normal(size=(32, 128)).astype(np.float32)
    bv = rng.normal(size=(128, 32)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"a": av, "b": bv})
    np.testing.assert_allclose(
        got, (np.exp(av) + bv.T).sum(axis=1), rtol=1e-5
    )
    assert _stats(model).get("pallas-mapreduce") == 1


def test_scheduled_transpose_kernel():
    """Write dims out of loop order: a scheduled transpose kernel (the
    kernel computes in loop order; the result is permuted back)."""
    a = input("a")
    out = Fun("out")
    y, x = iters("y", "x")
    out[x, y] = a[y, x] * 2.0
    out.schedule(tile={"y": 32})
    rng = np.random.default_rng(53)
    av = rng.normal(size=(64, 128)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"a": av})
    np.testing.assert_allclose(got, 2.0 * av.T, rtol=1e-6)
    assert _stats(model).get("pallas-mapreduce") == 1


def test_scheduled_triangular_sum_pallas():
    """Dynamic (iterator-dependent) loop bounds lower through Pallas:
    the kernel iterates the static hull and masks points outside the true
    per-point [start, stop) with the accumulation identity (reference
    bounds guards, passes.nim:2402-2569)."""
    from exprgrad_tpu import irange

    a = input("a")
    y = iters("y")
    x = irange("x", 0, y + 1)
    out = Fun("out")
    out[y] = a[y, x]
    out.schedule(tile={"y": 32})
    rng = np.random.default_rng(54)
    av = rng.normal(size=(128, 128)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"a": av})
    np.testing.assert_allclose(got, np.tril(av).sum(axis=1), rtol=1e-5,
                               atol=1e-5)
    assert _stats(model).get("pallas-mapreduce") == 1


def test_scheduled_triangular_max_pallas():
    """Dynamic bound with a max reduction: masked positions take the max
    identity (-inf), so padded/hull points never win."""
    from exprgrad_tpu import irange

    a = input("a")
    y = iters("y")
    x = irange("x", 0, y + 1)
    out = Fun("out")
    out.maximize[y] = a[y, x]
    out.schedule(tile={"y": 16})
    rng = np.random.default_rng(55)
    av = rng.normal(size=(64, 64)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"a": av})
    want = np.array([av[i, : i + 1].max() for i in range(64)])
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert _stats(model).get("pallas-mapreduce") == 1


def test_scheduled_dynamic_contraction_pallas():
    """A contraction under dynamic bounds cannot take the MXU einsum path
    (static rectangular iteration only) — the emitter keeps it and masks:
    out[y] += a[y, x] * b[x] over x <= y."""
    from exprgrad_tpu import irange

    a, b = input("a"), input("b")
    y = iters("y")
    x = irange("x", 0, y + 1)
    out = Fun("out")
    out[y] = a[y, x] * b[x]
    out.schedule(tile={"y": 32})
    rng = np.random.default_rng(56)
    av = rng.normal(size=(128, 128)).astype(np.float32)
    bv = rng.normal(size=(128,)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"a": av, "b": bv})
    np.testing.assert_allclose(got, np.tril(av) @ bv, rtol=1e-4, atol=1e-4)
    assert _stats(model).get("pallas-mapreduce") == 1


def test_scheduled_dynamic_bound_with_shape_term():
    """A dynamic stop mixing a shape query with an iterator
    (x < n - y): the static part folds, the iterator part masks."""
    from exprgrad_tpu import irange

    a = input("a")
    y = irange("y", 0, a.shape[0])
    x = irange("x", 0, a.shape[1] - y)
    out = Fun("out")
    out[y] = a[y, x]
    out.schedule(tile={"y": 16})
    rng = np.random.default_rng(57)
    av = rng.normal(size=(64, 64)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"a": av})
    want = np.array([av[i, : 64 - i].sum() for i in range(64)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert _stats(model).get("pallas-mapreduce") == 1


def test_scheduled_dynamic_oob_hull_via_cmpred_gather():
    """A dynamic kernel whose hull reads out of range (a[x + dx]): the
    compare-reduce gather evaluates the multi-iterator index in-kernel
    (hull positions past the extent match no iota value and contribute
    the identity), so it stays on Pallas with the right numbers."""
    from exprgrad_tpu import irange

    a = input("a")
    x = irange("x", 0, a.shape[0])
    dx = irange("dx", 0, a.shape[0] - x)
    out = Fun("out")
    out[x] = a[x + dx]
    out.with_shape([a.shape[0]])
    out.schedule(tile={"x": 8})
    rng = np.random.default_rng(58)
    av = rng.normal(size=(32,)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"a": av})
    want = np.array([av[i:].sum() for i in range(32)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert _stats(model).get("pallas-mapreduce") == 1, _stats(model)


def test_scheduled_shape_query_in_expression():
    """Static setup instructions (shape queries in the expression —
    dsl.nim:109-133) fold to scalar constants inside the kernel: the
    mean family out[y] = a[y, x] / n."""
    from exprgrad_tpu import to_scalar

    a = input("a")
    out = Fun("out")
    y, x = iters("y", "x")
    out[y] = a[y, x] / to_scalar(a.shape[1])
    out.schedule(tile={"y": 16})
    rng = np.random.default_rng(59)
    av = rng.normal(size=(64, 128)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"a": av})
    np.testing.assert_allclose(got, av.mean(axis=1), rtol=1e-5, atol=1e-6)
    assert _stats(model).get("pallas-mapreduce") == 1


def test_scheduled_shape_arith_in_expression():
    """Arithmetic over shape queries in setup (1/sqrt(n) scaling)."""
    from exprgrad_tpu import sqrt, to_scalar

    a = input("a")
    out = Fun("out")
    y, x = iters("y", "x")
    out[y, x] = a[y, x] / sqrt(to_scalar(a.shape[0] * a.shape[1]))
    out.schedule(tile={"y": 32})
    rng = np.random.default_rng(60)
    av = rng.normal(size=(64, 128)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"a": av})
    np.testing.assert_allclose(
        got, av / np.sqrt(64.0 * 128.0), rtol=1e-5, atol=1e-7
    )
    assert _stats(model).get("pallas-mapreduce") == 1


def test_scheduled_epoch_kernel_stays_dynamic():
    """epoch() is per-call dynamic — the scheduled kernel takes it as a
    (1, 1) int32 operand (never a baked constant), so the Pallas route
    tracks the stepped epoch exactly."""
    from exprgrad_tpu import epoch, param, to_scalar

    w = param([16, 128], name="w")
    out = Fun("out")
    y, x = iters("y", "x")
    out[y, x] = w[y, x] * to_scalar(epoch())
    out.schedule(tile={"y": 8})
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    model.epoch = 3
    a = np.asarray(model.call("out", {}))
    model.epoch = 5
    b = np.asarray(model.call("out", {}))
    assert _stats(model).get("pallas-mapreduce") == 1, _stats(model)
    m = np.abs(a) > 1e-8
    np.testing.assert_allclose(b[m] / a[m], 5.0 / 3.0, rtol=1e-5)


def test_scheduled_raw_activation_kernel():
    """Flat `.raw[it]` kernels (the activation family, dnn.nim:26-43)
    lower as 1-D Pallas map kernels over the flattened view."""
    inp = input("inp")
    out = Fun("out")
    it = iters("it")
    out.raw[it] = select(inp.raw[it] >= 0.0, inp.raw[it], 0.0)
    out.schedule(tile={"it": 256})
    rng = np.random.default_rng(61)
    v = rng.normal(size=(64, 100)).astype(np.float32)  # ragged flat 6400
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = model.call("out", {"inp": v})
    np.testing.assert_allclose(got, np.maximum(v, 0.0))
    assert _stats(model).get("pallas-mapreduce") == 1


def test_scheduled_raw_matches_oracle():
    """Raw flat kernel with mixed expression vs the interp oracle."""
    a, b = input("a"), input("b")
    out = Fun("out")
    it = iters("it")
    out.raw[it] = exp(a.raw[it] * 0.3) + b.raw[it]
    out.schedule(tile={"it": 128})
    rng = np.random.default_rng(62)
    av = rng.normal(size=(8, 16, 32)).astype(np.float32)
    bv = rng.normal(size=(8, 16, 32)).astype(np.float32)
    graph = out.target("out")
    mj = compile(graph, backend="jax", schedule_mode="force")
    got = np.asarray(mj.call("out", {"a": av, "b": bv}))
    want = np.asarray(
        compile(graph, backend="interp").call("out", {"a": av, "b": bv})
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(got, np.exp(av * 0.3) + bv, rtol=2e-5,
                               atol=1e-5)
    assert _stats(mj).get("pallas-mapreduce") == 1
