"""Matmul + elementwise-epilogue fusion into one Pallas kernel.

The reference's GPU backend leans on fusing dense+bias+activation into the
matmul kernel (dnn.nim:20-35 is the motivating layer); here the scheduled
Pallas matmul folds its sole elementwise consumer into the flush step: the
product matrix never round-trips HBM.  Interpret mode on CPU, numerics
checked against the unfused interp oracle.
"""

import numpy as np
import pytest

from exprgrad_tpu import Fun, compile, input, iters, maximum, exp, select


def _stats(model):
    ex = next(iter(model._executors.values()))
    return ex.stats


def _dense_relu_graph(schedule: bool):
    y, x, it = iters("y", "x", "it")
    a, b = input("a"), input("b")
    bias = input("bias")
    c = Fun("c")
    c[y, x] = a[y, it] * b[it, x]
    if schedule:
        c.schedule(tile={"y": 64, "x": 128, "it": 128}, parallel=["y", "x"])
    y2, x2 = iters("y2", "x2")
    d = Fun("d")
    d[y2, x2] = maximum(c[y2, x2] + bias[x2], 0.0)
    return d.target("d")


def _data(seed=0, m=128, k=256, n=256):
    rng = np.random.default_rng(seed)
    return {
        "a": rng.normal(size=(m, k)).astype(np.float32),
        "bias": rng.normal(size=(n,)).astype(np.float32),
        "b": rng.normal(size=(k, n)).astype(np.float32),
    }


def test_dense_bias_relu_fuses():
    args = _data()
    graph = _dense_relu_graph(schedule=True)
    model = compile(graph, backend="jax", schedule_mode="force")
    out = model.call("d", args)
    expected = np.maximum(args["a"] @ args["b"] + args["bias"], 0.0)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)
    stats = _stats(model)
    assert stats.get("pallas-fused") == 1
    # the consumer kernel was folded away: nothing else ran
    assert sum(stats.values()) == 1


def test_unscheduled_does_not_fuse():
    args = _data(1)
    model = compile(_dense_relu_graph(schedule=False), backend="jax")
    out = model.call("d", args)
    expected = np.maximum(args["a"] @ args["b"] + args["bias"], 0.0)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)
    assert _stats(model).get("pallas-fused") is None


def test_fused_matches_oracle():
    args = _data(2)
    graph = _dense_relu_graph(schedule=True)
    mj = compile(graph, backend="jax", schedule_mode="force")
    a = mj.call("d", args)
    b = compile(graph, backend="interp").call("d", args)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    assert _stats(mj).get("pallas-fused") == 1


def test_float64_models_skip_pallas():
    """f64 accumulation must stay exact: the f32-accumulator Pallas path
    refuses f64 models and the einsum path matches the oracle bit-for-bit."""
    args = {k: v.astype(np.float64) for k, v in _data(2).items()}
    graph = _dense_relu_graph(schedule=True)
    mj = compile(graph, dtype="float64", backend="jax", schedule_mode="force")
    a = mj.call("d", args)
    b = compile(graph, dtype="float64", backend="interp").call("d", args)
    np.testing.assert_allclose(a, b, rtol=1e-12)
    stats = _stats(mj)
    assert stats.get("pallas-fused") is None and stats.get("pallas") is None


def test_col_broadcast_and_residual():
    """Epilogue reading a column vector and a same-shape residual."""
    y, x, it = iters("y", "x", "it")
    a, b = input("a"), input("b")
    col = input("col")
    res = input("res")
    c = Fun("c")
    c[y, x] = a[y, it] * b[it, x]
    c.schedule(tile={"y": 64, "x": 128, "it": 128}, parallel=["y", "x"])
    y2, x2 = iters("y2", "x2")
    d = Fun("d")
    d[y2, x2] = exp((c[y2, x2] - col[y2]) * 0.01) + res[y2, x2]
    graph = d.target("d")

    rng = np.random.default_rng(3)
    m, k, n = 128, 128, 256
    args = {
        "a": rng.normal(size=(m, k)).astype(np.float32),
        "b": rng.normal(size=(k, n)).astype(np.float32),
        "col": rng.normal(size=(m,)).astype(np.float32),
        "res": rng.normal(size=(m, n)).astype(np.float32),
    }
    model = compile(graph, backend="jax", schedule_mode="force")
    out = model.call("d", args)
    expected = (
        np.exp((args["a"] @ args["b"] - args["col"][:, None]) * 0.01)
        + args["res"]
    )
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)
    assert _stats(model).get("pallas-fused") == 1


def test_no_fusion_when_intermediate_is_reused():
    """c read by TWO consumers -> c must materialize; no fusion."""
    y, x, it = iters("y", "x", "it")
    a, b = input("a"), input("b")
    c = Fun("c")
    c[y, x] = a[y, it] * b[it, x]
    c.schedule(tile={"y": 64, "x": 128, "it": 128}, parallel=["y", "x"])
    y2, x2 = iters("y2", "x2")
    d = Fun("d")
    d[y2, x2] = maximum(c[y2, x2], 0.0)
    y3, x3 = iters("y3", "x3")
    e = Fun("e")
    e[y3, x3] = d[y3, x3] + c[y3, x3]
    graph = e.target("e")
    args = _data(4, m=128, k=128, n=256)
    del args["bias"]
    model = compile(graph, backend="jax", schedule_mode="force")
    out = model.call("e", args)
    cm = args["a"] @ args["b"]
    np.testing.assert_allclose(
        out, np.maximum(cm, 0.0) + cm, rtol=1e-5, atol=1e-5
    )
    stats = _stats(model)
    assert stats.get("pallas-fused") is None
    assert stats.get("pallas") == 1  # the scheduled matmul itself still ran


def test_no_fusion_when_output_is_intermediate():
    """The matmul result itself is the target output -> no fusion."""
    y, x, it = iters("y", "x", "it")
    a, b = input("a"), input("b")
    c = Fun("c")
    c[y, x] = a[y, it] * b[it, x]
    c.schedule(tile={"y": 64, "x": 128, "it": 128}, parallel=["y", "x"])
    graph = c.target("c")
    args = _data(5, m=128, k=128, n=256)
    del args["bias"]
    model = compile(graph, backend="jax", schedule_mode="force")
    out = model.call("c", args)
    np.testing.assert_allclose(out, args["a"] @ args["b"], rtol=1e-5)
    assert _stats(model).get("pallas-fused") is None


def test_fusion_in_training_graph_is_blocked_by_gradient_reads():
    """Gradient kernels read the forward intermediate -> no fusion in the
    training target, and training still agrees with the oracle."""
    from exprgrad_tpu import sq

    y, x, it = iters("y", "x", "it")
    a = input("a")
    b = input("b")
    c = Fun("c")
    c[y, x] = a[y, it] * b[it, x]
    c.schedule(tile={"y": 64, "x": 64, "it": 64}, parallel=["y", "x"])
    y2, x2 = iters("y2", "x2")
    d = Fun("d")
    d[y2, x2] = maximum(c[y2, x2], 0.0)
    i = iters("i")
    loss = Fun()
    loss[0] = sq(d.raw[i])
    graph = loss.target("loss").backwards().grad(a).target("da")

    rng = np.random.default_rng(6)
    args = {
        "a": rng.normal(size=(64, 64)).astype(np.float64),
        "b": rng.normal(size=(64, 64)).astype(np.float64),
    }
    gj = compile(graph, dtype="float64", backend="jax").call("da", args)
    gi = compile(graph, dtype="float64", backend="interp").call("da", args)
    np.testing.assert_allclose(gj, gi, rtol=1e-10)


def test_select_epilogue_fuses():
    """select/comparison ops are fusable epilogue expressions."""
    y, x, it = iters("y", "x", "it")
    a, b = input("a"), input("b")
    c = Fun("c")
    c[y, x] = a[y, it] * b[it, x]
    c.schedule(tile={"y": 64, "x": 128, "it": 128}, parallel=["y", "x"])
    y2, x2 = iters("y2", "x2")
    d = Fun("d")
    d[y2, x2] = select(c[y2, x2] < 0.0, c[y2, x2] * 0.1, c[y2, x2])
    graph = d.target("d")
    args = _data(7, m=64, k=128, n=128)
    del args["bias"]
    model = compile(graph, backend="jax", schedule_mode="force")
    out = model.call("d", args)
    cm = args["a"] @ args["b"]
    np.testing.assert_allclose(
        out, np.where(cm < 0, cm * 0.1, cm), rtol=1e-5, atol=1e-5
    )
    assert _stats(model).get("pallas-fused") == 1
