"""Extern-op seam + fused attention layer (layers/attention.py).

Validates the whole-op custom-grad bridge: extern forward/backward kernels
(ir.Extern) spliced through the symbolic autodiff, evaluated by the numpy
oracle and the XLA backend, for both the plain-XLA and the Pallas flash
implementations (interpret mode on CPU).
"""

import os
import numpy as np
import pytest

from exprgrad_tpu import (
    Fun,
    GradientError,
    ShapeError,
    compile,
    extern,
    input,
    iters,
    to_scalar,
)
from exprgrad_tpu.fun import make_opt
from exprgrad_tpu.layers import (
    fused_attention,
    gradient_descent,
    multi_head_attention,
)


def _rand(rng, *shape):
    return rng.normal(size=shape).astype(np.float32)


@pytest.mark.parametrize("impl", ["xla", "flash"])
@pytest.mark.parametrize("causal", [False, True])
def test_fused_attention_forward_oracle(impl, causal):
    q, k, v = input("q"), input("k"), input("v")
    att = fused_attention(q, k, v, causal=causal, impl=impl)
    mj = compile(att.target("out"), backend="jax")
    mi = compile(att.target("out"), backend="interp")
    rng = np.random.default_rng(0)
    args = {n: _rand(rng, 2, 2, 8, 4) for n in "qkv"}
    got = mj.call("out", args)
    want = mi.call("out", args)
    assert np.max(np.abs(got - want)) < 1e-5
    assert mj.lowering_stats("out").get("extern:attention") == 1


def test_fused_attention_gqa_forward():
    """K/V with fewer heads (grouped-query attention) broadcast per group."""
    q, k, v = input("q"), input("k"), input("v")
    att = fused_attention(q, k, v, causal=True, impl="xla")
    mj = compile(att.target("out"), backend="jax")
    mi = compile(att.target("out"), backend="interp")
    rng = np.random.default_rng(1)
    args = {
        "q": _rand(rng, 2, 4, 8, 4),
        "k": _rand(rng, 2, 2, 8, 4),
        "v": _rand(rng, 2, 2, 8, 4),
    }
    assert np.max(np.abs(mj.call("out", args) - mi.call("out", args))) < 1e-5


def _mha_model(impl, dim=8, heads=2, kv_heads=None):
    x = input("x")
    y = multi_head_attention(
        x, dim=dim, heads=heads, causal=True, kv_heads=kv_heads, impl=impl
    )
    labels = input("labels")
    n, t, d = iters("n", "t", "d")
    diff = Fun("diff")
    diff[n, t, d] = y[n, t, d] - labels[n, t, d]
    it = iters("it")
    loss = Fun("loss")
    loss[0] = diff.raw[it] * diff.raw[it] / to_scalar(labels.size)
    train = (
        loss.target("loss")
        .backwards()
        .optimize(make_opt(gradient_descent, rate=0.1))
        .target("train")
    )
    return [train, y.target("predict")]


@pytest.mark.parametrize("impl", ["xla", "flash"])
def test_mha_training_matches_oracle(impl):
    """3 gradient-descent steps through the extern backward kernels: the
    XLA backend and the numpy oracle stay bit-close on every parameter."""
    graphs = _mha_model(impl)
    mj = compile(graphs, backend="jax", seed=7)
    mi = compile(graphs, backend="interp", seed=7)
    rng = np.random.default_rng(2)
    args = {"x": _rand(rng, 2, 8, 8), "labels": _rand(rng, 2, 8, 8)}
    for _ in range(3):
        lj = mj.call("loss", args)[0]
        li = mi.call("loss", args)[0]
        assert abs(float(lj) - float(li)) < 1e-5
        mj.apply("train", args)
        mi.apply("train", args)
    for tid in mj.params:
        assert np.max(np.abs(np.asarray(mj.params[tid]) - mi.params[tid])) < 1e-6
    stats = mj.lowering_stats("train")
    assert stats.get("extern:attention_grad") == 3  # dq, dk, dv kernels
    # the loss decreased (it actually trains)
    assert float(mj.call("loss", args)[0]) < float(lj)


def test_mha_gqa_training_matches_oracle():
    graphs = _mha_model("xla", dim=8, heads=4, kv_heads=2)
    mj = compile(graphs, backend="jax", seed=3)
    mi = compile(graphs, backend="interp", seed=3)
    rng = np.random.default_rng(4)
    args = {"x": _rand(rng, 2, 8, 8), "labels": _rand(rng, 2, 8, 8)}
    mj.apply("train", args)
    mi.apply("train", args)
    for tid in mj.params:
        assert np.max(np.abs(np.asarray(mj.params[tid]) - mi.params[tid])) < 1e-6


def test_extern_serialize_roundtrip(tmp_path):
    """Checkpoints with extern kernels (attrs + multi-output) reload and
    keep training identically."""
    from exprgrad_tpu.io.serialize import load_model, save_model

    graphs = _mha_model("xla")
    m1 = compile(graphs, backend="jax", seed=11)
    rng = np.random.default_rng(5)
    args = {"x": _rand(rng, 2, 8, 8), "labels": _rand(rng, 2, 8, 8)}
    m1.apply("train", args)
    path = os.path.join(tmp_path, "mha.egt")
    save_model(m1, path)
    m2 = load_model(path, backend="jax")
    m1.apply("train", args)
    m2.apply("train", args)
    assert abs(float(m1.call("loss", args)[0]) - float(m2.call("loss", args)[0])) < 1e-6


def test_extern_without_grad_on_loss_path_raises():
    q, k, v = input("q"), input("k"), input("v")
    att = extern("attention", [q, k, v], outs=2,
                 attrs={"causal": False, "scale": 0.0, "impl": "xla"})[0]
    att.copy_shape(q)
    it = iters("it")
    loss = Fun("loss")
    loss[0] = att.raw[it]
    with pytest.raises(GradientError, match="attention"):
        compile(loss.target("loss").backwards().target("train"))


def test_extern_requires_shape_annotation():
    q, k, v = input("q"), input("k"), input("v")
    att = extern("attention", [q, k, v], outs=2,
                 attrs={"causal": False, "scale": 0.0, "impl": "xla"})[0]
    with pytest.raises(ShapeError, match="requires a shape"):
        compile(att.target("out"))


def test_extern_lse_dropped_from_forward_target():
    """The saved-logsumexp output is only needed by the backward kernels;
    a forward-only target dead-kernel-eliminates it."""
    q, k, v = input("q"), input("k"), input("v")
    att = fused_attention(q, k, v, impl="xla")
    m = compile(att.target("out"), backend="jax")
    ir_text = m.emit_ir("out")
    assert "extern attention[0/2]" in ir_text
    assert "attention[1/2]" not in ir_text  # lse kernel eliminated


def test_extern_ir_print_roundtrip_stability():
    graphs = _mha_model("xla")
    m = compile(graphs, backend="interp")
    text = m.emit_ir("train")
    assert "extern attention[0/2]" in text
    assert "extern attention_grad[0/3]" in text
    assert "causal=True" in text


def _cross_model(impl, dim=8, heads=2, ctx_dim=12):
    from exprgrad_tpu.layers import multi_head_cross_attention

    x = input("x")
    ctx = input("ctx")
    y = multi_head_cross_attention(
        x, ctx, dim=dim, heads=heads, context_dim=ctx_dim, impl=impl
    )
    labels = input("labels")
    n, t, d = iters("n", "t", "d")
    diff = Fun("diff")
    diff[n, t, d] = y[n, t, d] - labels[n, t, d]
    it = iters("it")
    loss = Fun("loss")
    loss[0] = diff.raw[it] * diff.raw[it] / to_scalar(labels.size)
    train = (
        loss.target("loss")
        .backwards()
        .optimize(make_opt(gradient_descent, rate=0.1))
        .target("train")
    )
    return [train, y.target("predict")]


@pytest.mark.parametrize("impl", ["xla", "flash"])
def test_cross_attention_training_matches_oracle(impl):
    """Cross-attention (queries from x, K/V from a different-width,
    different-length context): jax backend and numpy oracle agree over
    3 training steps; t != s exercises the sq != skv kernel path."""
    graphs = _cross_model(impl)
    mj = compile(graphs, backend="jax", seed=9)
    mi = compile(graphs, backend="interp", seed=9)
    rng = np.random.default_rng(3)
    args = {
        "x": _rand(rng, 2, 8, 8),        # t = 8
        "ctx": _rand(rng, 2, 16, 12),    # s = 16, context_dim = 12
        "labels": _rand(rng, 2, 8, 8),
    }
    first = float(mj.call("loss", args)[0])
    for _ in range(3):
        assert abs(float(mj.call("loss", args)[0])
                   - float(mi.call("loss", args)[0])) < 1e-5
        mj.apply("train", args)
        mi.apply("train", args)
    for tid in mj.params:
        assert np.max(np.abs(np.asarray(mj.params[tid])
                             - mi.params[tid])) < 1e-6
    assert float(mj.call("loss", args)[0]) < first


def test_cross_attention_attends_to_context():
    """Changing the context changes the output (it is not self-attention
    in disguise)."""
    graphs = _cross_model("xla")
    m = compile(graphs, backend="jax", seed=9)
    rng = np.random.default_rng(4)
    x = _rand(rng, 1, 4, 8)
    c1 = _rand(rng, 1, 6, 12)
    c2 = _rand(rng, 1, 6, 12)
    y1 = np.asarray(m.call("predict", {"x": x, "ctx": c1}))
    y2 = np.asarray(m.call("predict", {"x": x, "ctx": c2}))
    assert np.max(np.abs(y1 - y2)) > 1e-4
