"""Introspection/serving API tests: emit_ir, save_hlo, executable, stats."""

import numpy as np

from exprgrad_tpu import Fun, Tensor, compile, input, iters
from exprgrad_tpu.models import xor_mlp


def _matmul_model():
    y, x, it = iters("y", "x", "it")
    c = Fun("c")
    c[y, x] = input("a")[y, it] * input("b")[it, x]
    return compile(c.target("c"), backend="jax")


def test_emit_ir():
    model = _matmul_model()
    text = model.emit_ir()
    assert "target 'c'" in text
    assert "write:" in text


def test_emit_ir_per_target():
    model = compile(xor_mlp(), backend="jax")
    full = model.emit_ir()
    only_predict = model.emit_ir("predict")
    assert "target 'predict'" in only_predict
    assert "target 'train'" not in only_predict
    assert "target 'train'" in full
    assert len(only_predict) < len(full)
    import pytest
    from exprgrad_tpu.errors import ModelRuntimeError

    with pytest.raises(ModelRuntimeError):
        model.emit_ir("nope")


def test_save_hlo(tmp_path):
    model = _matmul_model()
    path = tmp_path / "c.hlo"
    model.save_hlo(str(path), "c", {"a": [4, 8], "b": [8, 16]})
    text = path.read_text()
    assert "HloModule" in text or "hlo" in text.lower()
    assert "dot" in text  # the matmul hit the MXU contraction op


def test_executable():
    model = _matmul_model()
    fn = model.executable("c", {"a": [2, 3], "b": [3, 2]})
    a = Tensor.new([2, 3], [1, 2, 3, 4, 5, 6])
    b = Tensor.new([3, 2], [1, 2, 3, 4, 5, 6])
    out = np.asarray(fn({"a": a, "b": b}))
    np.testing.assert_allclose(out, a @ b)


def test_lowering_stats():
    model = _matmul_model()
    a = Tensor.new([2, 3], [1, 2, 3, 4, 5, 6])
    b = Tensor.new([3, 2], [1, 2, 3, 4, 5, 6])
    model.call("c", {"a": a, "b": b})
    stats = model.lowering_stats("c")
    assert stats.get("einsum") == 1


def test_xor_train_stats():
    model = compile(xor_mlp(), backend="jax", seed=0)
    x = Tensor.new([4, 2], [0, 0, 0, 1, 1, 0, 1, 1])
    y = Tensor.new([4, 1], [0, 1, 1, 0])
    model.apply("train", {"x": x, "y": y})
    stats = model.lowering_stats("train")
    # the dense fwd+bwd kernels all become MXU contractions
    assert stats.get("einsum", 0) >= 6


def test_export_compiled_roundtrip(tmp_path):
    """AOT serving artifact: weights embedded, loads without the model."""
    from exprgrad_tpu import load_compiled

    model = compile(xor_mlp(), backend="jax")
    x = np.array([[0, 0], [0, 1], [1, 0], [1, 1]], dtype=np.float32)
    want = np.asarray(model.call("predict", {"x": x}))

    path = tmp_path / "xor.egc"
    data = model.export_compiled("predict", {"x": [4, 2]}, path=str(path))
    assert path.read_bytes() == data

    fn = load_compiled(str(path))
    got = np.asarray(fn({"x": x}))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # bytes input works too, and the artifact is weight-self-contained:
    # mutate the live model's params, the artifact must not change
    fn2 = load_compiled(data)
    for tid in model.params:
        model.params[tid] = model.params[tid] * 0.0
    got2 = np.asarray(fn2({"x": x}))
    np.testing.assert_allclose(got2, want, rtol=1e-6)


def test_export_compiled_trained_model(tmp_path):
    """Export after training captures the trained weights."""
    from exprgrad_tpu import load_compiled

    model = compile(xor_mlp(), backend="jax")
    x = np.array([[0, 0], [0, 1], [1, 0], [1, 1]], dtype=np.float32)
    yv = np.array([[0], [1], [1], [0]], dtype=np.float32)
    for _ in range(200):
        model.apply("train", {"x": x, "y": yv})
    want = np.asarray(model.call("predict", {"x": x}))
    data = model.export_compiled("predict", {"x": [4, 2]})
    got = np.asarray(load_compiled(data)({"x": x}))
    # artifact output == live trained model output (convergence itself is
    # covered by test_talks/test_model at full step counts)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_model_summary():
    from exprgrad_tpu import compile
    from exprgrad_tpu.models import xor_mlp

    model = compile(xor_mlp(), backend="interp", seed=0)
    text = model.summary()
    assert "parameters" in text and "targets:" in text
    # dense(2,4)+bias + dense(4,1)+bias = 8+4+4+1 = 17 elements
    assert "17 elements" in text, text
    assert "train" in text and "predict" in text
