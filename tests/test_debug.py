"""debug_scalar / debug_index builtins (reference debugScalar/debugIndex,
model.nim:96-100): identity ops that print when the kernel executes."""

import numpy as np

from exprgrad_tpu import (
    Fun, compile, debug_index, debug_scalar, input, iters, sq, to_scalar,
)


def test_debug_scalar_interp(capsys):
    y, x = iters("y", "x")
    out = Fun()
    out[y] = debug_scalar(input("a")[y, x] * 2.0, "doubled")
    model = compile(out.target("out"), dtype="float64", backend="interp")
    a = np.array([[1.0, 2.0], [3.0, 4.0]])
    got = model.call("out", {"a": a})
    np.testing.assert_allclose(got, 2 * a.sum(axis=1))
    captured = capsys.readouterr().out
    assert "doubled:" in captured
    assert "2." in captured


def test_debug_index_interp(capsys):
    x = iters("x")
    out = Fun()
    out[x] = to_scalar(debug_index(x * 2, "idx"))
    out.with_shape([3])
    model = compile(out.target("out"), dtype="float64", backend="interp")
    got = model.call("out", {})
    np.testing.assert_allclose(got, [0.0, 2.0, 4.0])
    assert "idx:" in capsys.readouterr().out


def test_debug_scalar_jax_backend():
    """jax lowering: value passes through unchanged (print goes through
    jax.debug.print; correctness of the value is what we assert)."""
    y, x = iters("y", "x")
    out = Fun()
    out[y] = debug_scalar(input("a")[y, x], "v") * 3.0
    model = compile(out.target("out"), dtype="float64", backend="jax")
    rng = np.random.default_rng(0)
    a = rng.normal(size=(3, 4))
    np.testing.assert_allclose(
        model.call("out", {"a": a}), 3 * a.sum(axis=1), rtol=1e-12
    )


def test_debug_scalar_gradient():
    """Gradient flows through the identity."""
    a_in = input("a")
    it = iters("it")
    loss = Fun()
    loss[0] = sq(debug_scalar(a_in.raw[it], "fwd"))
    graph = loss.target("loss").backwards().grad(a_in).target("da")
    for backend in ("interp", "jax"):
        model = compile(graph, dtype="float64", backend=backend)
        a = np.array([1.0, -2.0, 3.0])
        np.testing.assert_allclose(model.call("da", {"a": a}), 2 * a)


def test_debug_survives_serialization(tmp_path):
    from exprgrad_tpu.io.serialize import load_model, save_model

    y, x = iters("y", "x")
    out = Fun()
    out[y] = debug_scalar(input("a")[y, x], "tag")
    model = compile(out.target("out"), dtype="float64", backend="interp")
    path = tmp_path / "m.bin"
    save_model(model, str(path))
    loaded = load_model(str(path), backend="interp")
    a = np.array([[1.0, 2.0]])
    np.testing.assert_allclose(loaded.call("out", {"a": a}), [3.0])
    assert "tag" in loaded.emit_ir() or "debug" in loaded.emit_ir()
