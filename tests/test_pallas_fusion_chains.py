"""Epilogue CHAIN fusion: bias writers + multi-step elementwise consumer
chains + transposed stores fold into one Pallas matmul kernel.

Extends test_pallas_fusion.py's single-consumer cases: dense-style
multi-writer outputs (matmul kernel + bias kernel on the same tensor),
raw relu-style steps, residual adds, and ``c[x, y]`` stores.  Interpret
mode on CPU; numerics against numpy and the interp oracle.
"""

import numpy as np

from exprgrad_tpu import Fun, compile, input, iters, maximum, select
from exprgrad_tpu.layers import dense, relu


def _stats(model):
    ex = next(iter(model._executors.values()))
    return ex.stats


def _data(seed, m=64, k=128, n=128, extras=()):
    rng = np.random.default_rng(seed)
    out = {
        "a": rng.normal(size=(m, k)).astype(np.float32),
        "b": rng.normal(size=(k, n)).astype(np.float32),
    }
    for name, shape in extras:
        out[name] = rng.normal(size=shape).astype(np.float32)
    return out


def test_bias_writer_plus_relu_chain_fuses():
    """dense-style pattern: matmul kernel + bias kernel accumulating into
    the SAME tensor, then a raw relu consumer — all in one Pallas kernel."""
    y, x, it = iters("y", "x", "it")
    a, b, bias = input("a"), input("b"), input("bias")
    c = Fun("c")
    c[y, x] = a[y, it] * b[it, x]
    c.schedule(tile={"y": 64, "x": 128, "it": 128}, parallel=["y", "x"])
    y2, x2 = iters("y2", "x2")
    c[y2, x2] = bias[x2]  # second writer (the dense bias kernel shape)
    i = iters("i")
    r = Fun("r")
    r.raw[i] = select(c.raw[i] >= 0.0, c.raw[i], 0.0)
    r.copy_shape(c)
    graph = r.target("r")

    args = _data(0, extras=[("bias", (128,))])
    model = compile(graph, backend="jax", schedule_mode="force")
    out = model.call("r", args)
    want = np.maximum(args["a"] @ args["b"] + args["bias"], 0.0)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)
    stats = _stats(model)
    assert stats.get("pallas-fused") == 1
    assert sum(stats.values()) == 1  # bias + relu kernels folded away


def test_three_step_chain_with_residual():
    """matmul -> +bias -> leaky-relu -> +residual: four kernels, one
    Pallas call, intermediates never materialize."""
    y, x, it = iters("y", "x", "it")
    a, b, bias, res = input("a"), input("b"), input("bias"), input("res")
    c = Fun("c")
    c[y, x] = a[y, it] * b[it, x]
    c.schedule(tile={"y": 64, "x": 128, "it": 128}, parallel=["y", "x"])
    y2, x2 = iters("y2", "x2")
    d = Fun("d")
    d[y2, x2] = c[y2, x2] + bias[x2]
    i = iters("i")
    r = Fun("r")
    r.raw[i] = select(d.raw[i] >= 0.0, d.raw[i], 0.1 * d.raw[i])
    r.copy_shape(d)
    y3, x3 = iters("y3", "x3")
    e = Fun("e")
    e[y3, x3] = r[y3, x3] + res[y3, x3]
    graph = e.target("e")

    args = _data(1, extras=[("bias", (128,)), ("res", (64, 128))])
    model = compile(graph, backend="jax", schedule_mode="force")
    out = model.call("e", args)
    h = args["a"] @ args["b"] + args["bias"]
    want = np.where(h >= 0, h, 0.1 * h) + args["res"]
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)
    stats = _stats(model)
    assert stats.get("pallas-fused") == 1
    assert sum(stats.values()) == 1


def test_dense_layer_schedule_kernel0_fuses_bias_and_relu():
    """The library dense layer: schedule(kernel=0) targets the matmul;
    the bias kernel and a downstream relu fold into it."""
    v = input("v")
    h = dense(v, 128, 128).schedule(
        tile={"y": 64, "x": 128, "it": 128}, parallel=["y", "x"], kernel=0
    )
    out_fun = relu(h)
    graph = out_fun.target("out")
    rng = np.random.default_rng(2)
    args = {"v": rng.normal(size=(64, 128)).astype(np.float32)}

    mj = compile(graph, backend="jax", schedule_mode="force", seed=5)
    mi = compile(graph, backend="interp", seed=5)
    np.testing.assert_allclose(
        mj.call("out", args), mi.call("out", args), rtol=1e-4, atol=1e-5
    )
    stats = _stats(mj)
    assert stats.get("pallas-fused") == 1
    assert sum(stats.values()) == 1


def test_transposed_store_plain():
    """c[x, y] += a[y, k] * b[k, x]: the Pallas kernel stores the
    transposed product (no XLA transpose afterwards)."""
    y, x, it = iters("y", "x", "it")
    a, b = input("a"), input("b")
    c = Fun("c")
    c[x, y] = a[y, it] * b[it, x]
    c.schedule(tile={"y": 64, "x": 128, "it": 128}, parallel=["y", "x"])
    graph = c.target("c")
    args = _data(3)
    model = compile(graph, backend="jax", schedule_mode="force")
    out = model.call("c", args)
    np.testing.assert_allclose(
        out, (args["a"] @ args["b"]).T, rtol=1e-5, atol=1e-5
    )
    assert _stats(model).get("pallas") == 1


def test_transposed_store_with_epilogue_fuses():
    """Transposed store + consumer in the [n, m] frame: fused; "row"
    operands are length-m vectors in the transposed frame."""
    y, x, it = iters("y", "x", "it")
    a, b, rowm = input("a"), input("b"), input("rowm")
    c = Fun("c")
    c[x, y] = a[y, it] * b[it, x]
    c.schedule(tile={"y": 64, "x": 128, "it": 128}, parallel=["y", "x"])
    p, q = iters("p", "q")
    d = Fun("d")
    d[p, q] = maximum(c[p, q] + rowm[q], 0.0)
    graph = d.target("d")
    args = _data(4, extras=[("rowm", (64,))])  # length-m vector
    model = compile(graph, backend="jax", schedule_mode="force")
    out = model.call("d", args)
    want = np.maximum((args["a"] @ args["b"]).T + args["rowm"], 0.0)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)
    stats = _stats(model)
    assert stats.get("pallas-fused") == 1
    assert sum(stats.values()) == 1


def test_chain_stops_at_reused_intermediate():
    """matmul -> relu -> (z reads r twice): r is multi-read, so the chain
    folds only the relu step and r materializes."""
    y, x, it = iters("y", "x", "it")
    a, b = input("a"), input("b")
    c = Fun("c")
    c[y, x] = a[y, it] * b[it, x]
    c.schedule(tile={"y": 64, "x": 128, "it": 128}, parallel=["y", "x"])
    y2, x2 = iters("y2", "x2")
    r = Fun("r")
    r[y2, x2] = maximum(c[y2, x2], 0.0)
    y3, x3 = iters("y3", "x3")
    z = Fun("z")
    z[y3, x3] = r[y3, x3] * r[y3, x3]
    y4, x4 = iters("y4", "x4")
    w = Fun("w")
    w[y4, x4] = z[y4, x4] + r[y4, x4]
    graph = w.target("w")
    args = _data(5)
    model = compile(graph, backend="jax", schedule_mode="force")
    out = model.call("w", args)
    rm = np.maximum(args["a"] @ args["b"], 0.0)
    np.testing.assert_allclose(out, rm * rm + rm, rtol=1e-5, atol=1e-5)
    stats = _stats(model)
    assert stats.get("pallas-fused") == 1  # matmul+relu fused, lands in r


def test_no_fusion_when_extra_operand_written_after_matmul():
    """An epilogue operand produced by a kernel that flattens BETWEEN the
    matmul and the consumer must block the fold (the fused kernel would
    read it before it is written).  Regression: this fused silently and
    produced garbage."""
    y, x, it = iters("y", "x", "it")
    a, b, d = input("a"), input("b"), input("d")
    c = Fun("c")
    c[y, x] = a[y, it] * b[it, x]
    c.schedule(tile={"y": 64, "x": 128, "it": 128}, parallel=["y", "x"])
    x2, j = iters("x2", "j")
    s = Fun("s")
    s[x2] = d[x2, j]  # independent branch, flattens after the matmul
    y3, x3 = iters("y3", "x3")
    out = Fun("out")
    out[y3, x3] = c[y3, x3] * s[x3]
    graph = out.target("out")

    rng = np.random.default_rng(7)
    args = {
        "a": rng.normal(size=(64, 128)).astype(np.float32),
        "b": rng.normal(size=(128, 128)).astype(np.float32),
        "d": rng.normal(size=(128, 4)).astype(np.float32),
    }
    model = compile(graph, backend="jax", schedule_mode="force")
    got = model.call("out", args)
    want = (args["a"] @ args["b"]) * args["d"].sum(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert _stats(model).get("pallas-fused") is None
    assert _stats(model).get("pallas") == 1  # matmul alone still routed


def test_matmul_decline_reason_reports_real_cause():
    """A scheduled matmul the emitter declines (transposed operand
    layout) must warn with the matmul emitter's reason, not map-reduce's
    'it is a contraction'.  (Indivisible tiles no longer decline — they
    lower through the masked/padded Pallas path.)"""
    import pytest as _pytest

    from exprgrad_tpu import ScheduleWarning

    y, x, it = iters("y", "x", "it")
    a, b = input("a"), input("b")
    c = Fun("c")
    c[y, x] = a[it, y] * b[it, x]  # A transposed: einsum path handles it
    c.schedule(tile={"y": 16, "x": 16, "it": 16})
    graph = c.target("c")
    rng = np.random.default_rng(8)
    args = {
        "a": rng.normal(size=(64, 32)).astype(np.float32),
        "b": rng.normal(size=(64, 48)).astype(np.float32),
    }
    model = compile(graph, backend="jax", schedule_mode="force")
    with _pytest.warns(ScheduleWarning, match="transposed"):
        got = model.call("c", args)
    np.testing.assert_allclose(
        got, args["a"].T @ args["b"], rtol=1e-4, atol=1e-4
    )


def test_matmul_indivisible_tile_fuses_masked():
    """Ragged-shape dense+bias+relu still fuses into ONE padded Pallas
    kernel (epilogue chain over masked blocks)."""
    y, x, it = iters("y", "x", "it")
    a, b, bias = input("a"), input("b"), input("bias")
    mm = Fun("mm")
    mm[y, x] = a[y, it] * b[it, x]
    mm.schedule(tile={"y": 16, "x": 128, "it": 128}, parallel=["y", "x"])
    y2, x2 = iters("y2", "x2")
    biased = Fun("biased")
    biased[y2, x2] = mm[y2, x2] + bias[x2]
    y3, x3 = iters("y3", "x3")
    out = Fun("out")
    out[y3, x3] = maximum(biased[y3, x3], 0.0)
    graph = out.target("out")
    rng = np.random.default_rng(9)
    args = {
        "a": rng.normal(size=(30, 70)).astype(np.float32),
        "b": rng.normal(size=(70, 50)).astype(np.float32),
        "bias": rng.normal(size=(50,)).astype(np.float32),
    }
    model = compile(graph, backend="jax", schedule_mode="force")
    got = model.call("out", args)
    want = np.maximum(args["a"] @ args["b"] + args["bias"], 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert _stats(model).get("pallas-fused") == 1
