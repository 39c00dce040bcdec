"""Map/reduce row-chain fusion (backend/pallasgen.py PallasRowChain).

The reference's softmax is a multi-kernel program (dnn.nim:90: row max,
exp-sum, normalize); its GPU codegen stages each kernel through shared
memory (passes.nim:2173-2323).  Here consecutive scheduled map/reduce
kernels over the same loop nest fuse into ONE Pallas kernel: the row
block is read once into VMEM, intermediates (row max, row sums) live in
registers, and only the final result is written back — the
bandwidth-halving schedule-driven win on a TPU.

Fusion is only legal when intermediates are written once and read
exclusively inside the chain: training targets (whose backward kernels
read the forward intermediates) must fall back to per-kernel lowering
with identical numbers.
"""

import warnings

import numpy as np
import pytest

from exprgrad_tpu import (
    Fun,
    compile,
    exp,
    input,
    iters,
    sq,
    sqrt,
)


def _stats(model):
    ex = next(iter(model._executors.values()))
    return ex.stats


def _softmax_graph(tile):
    inp = input("inp")
    y, x = iters("y", "x")
    mx = Fun("mx")
    mx.maximize[y] = inp[y, x]
    mx.schedule(tile=tile)
    y, x = iters("y", "x")
    sums = Fun("sums")
    sums[y] = exp(inp[y, x] - mx[y])
    sums.schedule(tile=tile)
    y, x = iters("y", "x")
    out = Fun("out")
    out[y, x] = exp(inp[y, x] - mx[y]) / sums[y]
    out.schedule(tile=tile)
    return out.target("out")


def _softmax_ref(v):
    e = np.exp(v - v.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def test_softmax_chain_fuses():
    rng = np.random.default_rng(0)
    v = (rng.normal(size=(128, 256)) * 8).astype(np.float32)
    model = compile(_softmax_graph({"y": 32}), backend="jax",
                    schedule_mode="force")
    got = model.call("out", {"inp": v})
    np.testing.assert_allclose(got, _softmax_ref(v), rtol=1e-5, atol=1e-6)
    stats = _stats(model)
    assert stats.get("pallas-rowchain") == 1, stats
    assert "pallas-mapreduce" not in stats, stats


def test_softmax_chain_matches_oracle_ragged_rows():
    """A non-dividing row tile pads the row blocks; padded rows slice
    off the fused output."""
    rng = np.random.default_rng(1)
    v = (rng.normal(size=(100, 256)) * 5).astype(np.float32)
    graph = _softmax_graph({"y": 48})  # 100 % 48 != 0
    mj = compile(graph, backend="jax", schedule_mode="force")
    got = np.asarray(mj.call("out", {"inp": v}))
    want = np.asarray(
        compile(graph, backend="interp").call("out", {"inp": v})
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert _stats(mj).get("pallas-rowchain") == 1


def test_rms_norm_chain_fuses():
    """Two-kernel rms_norm chain (sum-of-squares -> normalize)."""
    a = input("a")
    ss = Fun("ss")
    y, x = iters("y", "x")
    ss[y] = sq(a[y, x]) * (1.0 / 128.0)
    ss.schedule(tile={"y": 16})
    out = Fun("out")
    y, x = iters("y", "x")
    out[y, x] = a[y, x] / sqrt(ss[y] + 1e-6)
    out.schedule(tile={"y": 16})
    rng = np.random.default_rng(2)
    av = rng.normal(size=(64, 128)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = np.asarray(model.call("out", {"a": av}))
    rms = np.sqrt((av**2).mean(axis=1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(got, av / rms, rtol=1e-4, atol=1e-5)
    assert _stats(model).get("pallas-rowchain") == 1


def test_escaping_intermediate_materializes():
    """An intermediate read outside the chain STILL fuses — it comes out
    of the same kernel as an extra pallas output (the training-target
    case: gradient kernels read the forward max/sums)."""
    inp = input("inp")
    y, x = iters("y", "x")
    mx = Fun("mx")
    mx.maximize[y] = inp[y, x]
    mx.schedule(tile={"y": 16})
    y, x = iters("y", "x")
    sums = Fun("sums")
    sums[y] = exp(inp[y, x] - mx[y])
    sums.schedule(tile={"y": 16})
    esc = Fun("esc")
    y2 = iters("y2")
    esc[y2] = mx[y2] * 2.0  # second consumer of mx outside the chain
    y, x = iters("y", "x")
    out = Fun("out")
    out[y, x] = (exp(inp[y, x] - mx[y]) / sums[y]) + 0.001 * esc[y]
    out.schedule(tile={"y": 16})
    graph = out.target("out")
    rng = np.random.default_rng(3)
    v = rng.normal(size=(32, 128)).astype(np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        model = compile(graph, backend="jax", schedule_mode="force")
        got = np.asarray(model.call("out", {"inp": v}))
    want = _softmax_ref(v) + 0.002 * v.max(axis=1, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    stats = _stats(model)
    assert stats.get("pallas-rowchain") == 1, stats


def test_training_softmax_fuses_with_escaping_outputs():
    """A backwards target reads the forward intermediates from the
    gradient kernels: the forward chain still fuses (max/sums escape as
    extra outputs) and the gradient matches the oracle exactly."""
    from exprgrad_tpu import param

    w = param([32, 128], name="w")
    y, x = iters("y", "x")
    mx = Fun("mx")
    mx.maximize[y] = w[y, x]
    mx.schedule(tile={"y": 16})
    y, x = iters("y", "x")
    sums = Fun("sums")
    sums[y] = exp(w[y, x] - mx[y])
    sums.schedule(tile=None)
    y, x = iters("y", "x")
    sm = Fun("sm")
    sm[y, x] = exp(w[y, x] - mx[y]) / sums[y]
    it = iters("it")
    loss = Fun("loss")
    loss[0] = sq(sm.raw[it])
    graph = loss.target("loss").backwards().grad(w).target("dw")
    mj = compile(graph, backend="jax", schedule_mode="force")
    mi = compile(graph, backend="interp")
    wv = np.random.default_rng(4).normal(size=(32, 128)).astype(np.float32)
    mj.params[next(iter(mj.params))] = wv
    mi.params[next(iter(mi.params))] = wv
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        gj = np.asarray(mj.call("dw", {}))
    gi = np.asarray(mi.call("dw", {}))
    np.testing.assert_allclose(gj, gi, rtol=2e-4, atol=2e-5)
    assert _stats(mj).get("pallas-rowchain", 0) >= 1, _stats(mj)


def test_chain_shares_input_operand():
    """The chained kernels all read the same input tensor — the fused
    kernel stages it once (one operand slot), and a whole-row sweep
    (no tiles, grid of 1) still fuses."""
    inp = input("inp")
    y, x = iters("y", "x")
    mx = Fun("mx")
    mx.maximize[y] = inp[y, x]
    mx.schedule(parallel=["y"])
    y, x = iters("y", "x")
    out = Fun("out")
    out[y, x] = inp[y, x] - mx[y]
    out.schedule(parallel=["y"])
    rng = np.random.default_rng(5)
    v = rng.normal(size=(64, 128)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = np.asarray(model.call("out", {"inp": v}))
    np.testing.assert_allclose(got, v - v.max(axis=1, keepdims=True))
    stats = _stats(model)
    assert stats.get("pallas-rowchain") == 1, stats
    ex = next(iter(model._executors.values()))
    chain = next(iter(ex.row_fused.values()))
    assert len(chain.operands_meta) == 1, chain.operands_meta


def test_two_writer_intermediate_declines():
    """An intermediate accumulated by TWO kernels cannot fold into the
    chain (its value is not complete at the member's slot) — per-kernel
    lowering with the right numbers."""
    inp = input("inp")
    y, x = iters("y", "x")
    ss = Fun("ss")
    ss[y] = sq(inp[y, x])
    ss.schedule(tile={"y": 16})
    y2 = iters("y2")
    ss[y2] = 1e-6  # second writer: accumulate the epsilon in-place
    y, x = iters("y", "x")
    out = Fun("out")
    out[y, x] = inp[y, x] / sqrt(ss[y])
    out.schedule(tile={"y": 16})
    rng = np.random.default_rng(6)
    v = rng.normal(size=(32, 128)).astype(np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        model = compile(out.target("out"), backend="jax",
                        schedule_mode="force")
        got = np.asarray(model.call("out", {"inp": v}))
    want = v / np.sqrt((v**2).sum(axis=1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    stats = _stats(model)
    assert "pallas-rowchain" not in stats, stats


def test_layer_softmax_row_tile_fuses():
    """The stock layers.softmax with row_tile= fuses its three kernels
    into one Pallas row-chain kernel."""
    from exprgrad_tpu.layers import softmax as softmax_layer

    inp = input("inp")
    out = softmax_layer(inp, row_tile=32)
    rng = np.random.default_rng(7)
    v = (rng.normal(size=(64, 256)) * 6).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = np.asarray(model.call("out", {"inp": v}))
    np.testing.assert_allclose(got, _softmax_ref(v), rtol=1e-5, atol=1e-6)
    assert _stats(model).get("pallas-rowchain") == 1


def test_layer_rms_norm_row_tile_fuses_rank3():
    """rms_norm(row_tile=) over rank-3 activations: the tile lands on
    the innermost leading dim and the two kernels fuse."""
    from exprgrad_tpu.layers import rms_norm

    inp = input("inp")
    out = rms_norm(inp, 128, rank=3, row_tile=16)
    rng = np.random.default_rng(8)
    v = rng.normal(size=(4, 64, 128)).astype(np.float32)
    graph = out.target("out")
    mj = compile(graph, backend="jax", schedule_mode="force")
    got = np.asarray(mj.call("out", {"inp": v}))
    gamma = np.asarray(mj.params[next(iter(mj.params))])
    ms = (v**2).mean(axis=-1, keepdims=True)
    np.testing.assert_allclose(got, v / np.sqrt(ms + 1e-5) * gamma,
                               rtol=1e-4, atol=1e-5)
    assert _stats(mj).get("pallas-rowchain") == 1


def test_rowchain_policy_auto_routes_on_bandwidth():
    """The auto-mode cost model credits the fused chain ONE pass over the
    operands vs n_members passes for per-kernel XLA: a large calibrated
    chain routes to Pallas, a tiny one falls back (launch-bound)."""
    from exprgrad_tpu.backend.policy import SchedulePolicy

    pol = SchedulePolicy("auto")
    pol.constants = dict(pol.constants)
    pol.constants.update(
        xla_elementwise_gbps=600.0, pallas_rowchain_gbps=600.0,
        pallas_launch_us=1000.0, calibrated=True,
    )
    gb = 2**30
    assert pol.rowchain(gb, gb, 3).use_pallas
    assert not pol.rowchain(1024, 1024, 3).use_pallas


def test_permuted_ingroup_read_declines():
    """Review regression: a TRANSPOSED read of an in-group intermediate
    would receive the un-transposed VMEM value — the chain must decline
    and the per-kernel path must produce the right numbers."""
    inp = input("inp")
    y, x = iters("y", "x")
    t = Fun("t")
    t[y, x] = inp[y, x] * 2.0
    t.schedule(tile={"y": 16})
    y, x = iters("y", "x")
    out = Fun("out")
    out[y, x] = t[x, y] + inp[y, x]  # transposed in-group read
    out.schedule(tile={"y": 16})
    rng = np.random.default_rng(9)
    v = rng.normal(size=(64, 64)).astype(np.float32)
    model = compile(out.target("out"), backend="jax", schedule_mode="force")
    got = np.asarray(model.call("out", {"inp": v}))
    np.testing.assert_allclose(got, (2.0 * v).T + v, rtol=1e-6)
    assert "pallas-rowchain" not in _stats(model), _stats(model)


def test_static_fold_div_by_zero_falls_back():
    """Review regression: a statically-foldable division by zero must
    not crash compilation — the value takes the runtime (IEEE) path."""
    from exprgrad_tpu import to_scalar

    inp = input("inp")
    y, x = iters("y", "x")
    out = Fun("out")
    out[y, x] = inp[y, x] * (
        to_scalar(1) / to_scalar(inp.shape[1] - inp.shape[1])
    )
    out.schedule(tile={"y": 16})
    v = np.ones((32, 128), dtype=np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        model = compile(out.target("out"), backend="jax",
                        schedule_mode="force")
        got = np.asarray(model.call("out", {"inp": v}))
    assert np.all(np.isinf(got)), got[:2, :2]


def test_row_tile_rank1_raises():
    """Review regression: row_tile on a rank-1 input has no row dim —
    an explicit error, never a silently dropped schedule."""
    from exprgrad_tpu import ParserError
    from exprgrad_tpu.layers import softmax as softmax_layer

    inp = input("inp")
    with pytest.raises(ParserError, match="row_tile"):
        softmax_layer(inp, rank=1, row_tile=32)


def test_causal_softmax_chain_fuses():
    """Softmax with index arithmetic — the causal-masked max/sum/
    normalize chain (select(k <= q, ...) members) fuses into ONE Pallas
    row-chain kernel with iota mask blocks (VERDICT r3 example case)."""
    from exprgrad_tpu import select

    inp = input("inp")
    q, k = iters("q", "k")
    mx = Fun("mx")
    mx.maximize[q] = select(k <= q, inp[q, k], -1e30)
    mx.schedule(tile={"q": 32})
    q, k = iters("q", "k")
    sm = Fun("sm")
    sm[q] = select(k <= q, exp(inp[q, k] - mx[q]), 0.0)
    sm.schedule(tile={"q": 32})
    q, k = iters("q", "k")
    out = Fun("out")
    out[q, k] = select(k <= q, exp(inp[q, k] - mx[q]) / sm[q], 0.0)
    out.schedule(tile={"q": 32})

    m = compile(out.target("out"), backend="jax", schedule_mode="force")
    rng = np.random.default_rng(7)
    v = (rng.normal(size=(128, 128)) * 4).astype(np.float32)
    got = np.asarray(m.call("out", {"inp": v}))
    mask = np.arange(128)[None, :] <= np.arange(128)[:, None]
    e = np.where(
        mask,
        np.exp(v - np.where(mask, v, -1e30).max(1, keepdims=True)),
        0.0,
    )
    want = e / e.sum(1, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert _stats(m).get("pallas-rowchain") == 1, _stats(m)
