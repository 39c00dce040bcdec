"""Rematerialization (Fun.remat): recompute marked activations in the
backward pass instead of keeping them alive — the symbolic-autodiff
analog of jax.checkpoint."""

import numpy as np

from exprgrad_tpu import Fun, compile, input, iters, select, sq, to_scalar
from exprgrad_tpu.fun import make_opt
from exprgrad_tpu.layers import gradient_descent


def _mlp(remat: bool):
    """x -> h = relu(x@w1) -> y = h@w2 -> mse loss; h optionally remat."""
    from exprgrad_tpu import param

    x = input("x")
    w1 = param([16, 32], name="w1")
    w2 = param([32, 8], name="w2")
    y_, j, it = iters("y", "j", "it")
    h = Fun("h")
    h[y_, j] = x[y_, it] * w1[it, j]
    i = iters("i")
    hr = Fun("hr")
    hr.raw[i] = select(h.raw[i] >= 0.0, h.raw[i], 0.0)
    hr.copy_shape(h)
    if remat:
        h.remat()
        hr.remat()
    y_, k, j = iters("y", "k", "j")
    out = Fun("out")
    out[y_, k] = hr[y_, j] * w2[j, k]
    labels = input("labels")
    it = iters("it")
    loss = Fun("loss")
    loss[0] = sq(out.raw[it] - labels.raw[it]) / to_scalar(labels.size)
    return (
        loss.target("loss")
        .backwards()
        .optimize(make_opt(gradient_descent, rate=0.05))
        .target("train")
    )


def _train(graph, backend, steps=3):
    model = compile(graph, backend=backend, seed=3)
    rng = np.random.default_rng(0)
    args = {
        "x": rng.normal(size=(8, 16)).astype(np.float32),
        "labels": rng.normal(size=(8, 8)).astype(np.float32),
    }
    for _ in range(steps):
        model.apply("train", args)
    return model, args


def test_remat_numerics_identical():
    """remat must not change a single parameter value (both backends)."""
    m_plain, _ = _train(_mlp(remat=False), "jax")
    m_remat, _ = _train(_mlp(remat=True), "jax")
    m_oracle, _ = _train(_mlp(remat=True), "interp")
    for tid in m_plain.params:
        np.testing.assert_allclose(
            np.asarray(m_remat.params[tid]), np.asarray(m_plain.params[tid]),
            rtol=1e-6, atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(m_remat.params[tid]), m_oracle.params[tid],
            rtol=1e-5, atol=1e-6,
        )


def test_remat_emits_recompute_kernels():
    model, _ = _train(_mlp(remat=True), "jax", steps=1)
    text = model.emit_ir("train")
    assert "remat" in text
    assert "'h.remat'" in text or "h.remat" in text
    stats = model.lowering_stats("train")
    assert stats.get("remat", 0) >= 2  # h and hr recomputed


def test_remat_fences_against_cse():
    """The recompute kernels' operands are optimization-barrier'd: the
    HLO contains opt-barrier calls (without them XLA would CSE the
    recompute against the forward and keep the activation alive)."""
    import os
    import tempfile

    model, args = _train(_mlp(remat=True), "jax", steps=1)
    path = os.path.join(tempfile.mkdtemp(), "train.hlo")
    model.save_hlo(path, "train",
                   {"x": [8, 16], "labels": [8, 8]}, optimized=False)
    text = open(path).read()
    assert "optimization_barrier" in text or "opt-barrier" in text


def test_remat_forward_only_target_unchanged():
    """Forward targets never recompute (remat only affects backward)."""
    from exprgrad_tpu import param

    x = input("x")
    w = param([8, 8], name="w")
    y_, j, it = iters("y", "j", "it")
    h = Fun("h")
    h[y_, j] = x[y_, it] * w[it, j]
    h.remat()
    model = compile(h.target("out"), backend="jax", seed=0)
    rng = np.random.default_rng(1)
    out = model.call("out", {"x": rng.normal(size=(4, 8)).astype(np.float32)})
    assert out.shape == (4, 8)
    assert model.lowering_stats("out").get("remat") is None


def test_flash_transformer_remat_matches_plain():
    from exprgrad_tpu.models import flash_transformer

    rng = np.random.default_rng(2)
    toks = rng.integers(0, 5, (2, 8)).astype(np.float32)
    labels = np.eye(5, dtype=np.float32)[rng.integers(0, 5, (2, 8))]
    args = {"tokens": toks, "labels": labels}

    results = {}
    for flag in (False, True):
        model = compile(
            flash_transformer(vocab=5, dim=8, heads=2, remat=flag),
            backend="jax", seed=9,
        )
        for _ in range(2):
            model.epoch += 1
            model.apply("train", args)
        results[flag] = {
            tid: np.asarray(v) for tid, v in model.params.items()
        }
        if flag:
            assert model.lowering_stats("train").get("remat", 0) > 0
    for tid in results[False]:
        np.testing.assert_allclose(
            results[True][tid], results[False][tid], rtol=1e-5, atol=1e-6
        )


def test_scheduled_remat_matmul_not_fused_keeps_fence():
    """A scheduled remat-marked matmul chain: the recompute kernels must
    NOT take the epilogue-fusion path (which has no CSE fence) — they go
    through the fenced lowering and stats count them."""
    import warnings

    from exprgrad_tpu import param

    x = input("x")
    w1 = param([128, 128], name="w1")
    w2 = param([128, 8], name="w2")
    y_, j, it = iters("y", "j", "it")
    h = Fun("h")
    h[y_, j] = x[y_, it] * w1[it, j]
    h.schedule(tile={"y": 64, "x": 128, "it": 128}, parallel=["y", "j"])
    i = iters("i")
    hr = Fun("hr")
    hr.raw[i] = select(h.raw[i] >= 0.0, h.raw[i], 0.0)
    hr.copy_shape(h)
    h.remat()
    hr.remat()
    y_, k, j = iters("y", "k", "j")
    out = Fun("out")
    out[y_, k] = hr[y_, j] * w2[j, k]
    labels = input("labels")
    it = iters("it")
    loss = Fun("loss")
    loss[0] = sq(out.raw[it] - labels.raw[it]) / to_scalar(labels.size)
    graph = (
        loss.target("loss")
        .backwards()
        .optimize(make_opt(gradient_descent, rate=0.01))
        .target("train")
    )
    rng = np.random.default_rng(4)
    args = {
        "x": rng.normal(size=(64, 128)).astype(np.float32),
        "labels": rng.normal(size=(64, 8)).astype(np.float32),
    }
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        mj = compile(graph, backend="jax", schedule_mode="force", seed=2)
        mi = compile(graph, backend="interp", seed=2)
        mj.apply("train", args)
        mi.apply("train", args)
    stats = mj.lowering_stats("train")
    assert stats.get("remat", 0) >= 2  # both recompute kernels fenced
    for tid in mj.params:
        np.testing.assert_allclose(
            np.asarray(mj.params[tid]), mi.params[tid], rtol=1e-4, atol=1e-5
        )
