"""Backend lowering-path tests: which pattern each kernel shape hits, and
numeric agreement with the oracle for the trickier forms."""

import numpy as np
import pytest

from exprgrad_tpu import Fun, Tensor, compile, input, iters, sq


def _stats(model, target):
    return model.lowering_stats(target)


def _oracle_check(graph_fn, args, target, dtype="float32", **kw):
    mj = compile(graph_fn(), backend="jax", dtype=dtype, **kw)
    mi = compile(graph_fn(), backend="interp", dtype=dtype, **kw)
    a = mj.call(target, args)
    b = mi.call(target, args)
    np.testing.assert_allclose(
        np.asarray(a, np.float64), np.asarray(b, np.float64),
        rtol=5e-3 if dtype == "bfloat16" else 2e-4,
        atol=1e-5 if dtype != "bfloat16" else 5e-2,
    )
    return mj, a


def test_strided_conv_hits_conv_path():
    """images[n, 2y+dy, 2x+dx, c] * flt[f,dy,dx,c] -> strided convolution."""
    rng = np.random.default_rng(0)
    images = rng.normal(size=(2, 9, 11, 3)).astype(np.float32)
    filters = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)

    def graph():
        n, y, x, f, dy, dx, c = iters("n", "y", "x", "f", "dy", "dx", "c")
        out = Fun()
        out[n, y, x, f] = (
            input("images")[n, 2 * y + dy, 2 * x + dx, c]
            * input("filters")[f, dy, dx, c]
        )
        return out.target("out")

    mj, out = _oracle_check(
        graph, {"images": images, "filters": filters}, "out"
    )
    assert out.shape == (2, 4, 5, 4)
    assert _stats(mj, "out").get("conv") == 1


def test_batch_matmul_einsum():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(3, 4, 5)).astype(np.float32)
    b = rng.normal(size=(3, 5, 6)).astype(np.float32)

    def graph():
        n, y, x, it = iters("n", "y", "x", "it")
        out = Fun()
        out[n, y, x] = input("a")[n, y, it] * input("b")[n, it, x]
        return out.target("out")

    mj, out = _oracle_check(graph, {"a": a, "b": b}, "out")
    np.testing.assert_allclose(out, a @ b, rtol=1e-5)
    assert _stats(mj, "out").get("einsum") == 1


def test_three_way_contraction_einsum():
    """Scalar triple contraction: sum_yk,kx a[y,k] b[k,x] c[y,x]."""
    rng = np.random.default_rng(2)
    a = rng.normal(size=(4, 5)).astype(np.float32)
    b = rng.normal(size=(5, 6)).astype(np.float32)
    c = rng.normal(size=(4, 6)).astype(np.float32)

    y, k, x = iters("y", "k", "x")
    out = Fun()
    out[0] = (input("a")[y, k] * input("b")[k, x]) * input("c")[y, x]
    model = compile(out.target("s"), backend="jax")
    got = model.call("s", {"a": a, "b": b, "c": c})
    expected = np.einsum("yk,kx,yx->", a, b, c)
    np.testing.assert_allclose(got, [expected], rtol=1e-4)


def test_bfloat16_model():
    """bf16 end-to-end: dense forward on both backends."""
    import ml_dtypes  # noqa: F401  (registers bfloat16 with numpy)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(8, 16)).astype(np.float32)
    w = rng.normal(size=(16, 4)).astype(np.float32)

    def graph():
        y, j, it = iters("y", "j", "it")
        out = Fun()
        out[y, j] = input("x")[y, it] * input("w")[it, j]
        return out.target("out")

    mj, out = _oracle_check(graph, {"x": x, "w": w}, "out", dtype="bfloat16")
    assert str(out.dtype) == "bfloat16"


def test_diagonal_read_general_path():
    """a[i, i] (repeated iterator) falls to the gather path, still correct."""
    rng = np.random.default_rng(4)
    a = rng.normal(size=(5, 5)).astype(np.float32)

    def graph():
        i = iters("i")
        out = Fun()
        out[i] = input("a")[i, i]
        return out.target("diag")

    mj, out = _oracle_check(graph, {"a": a}, "diag")
    np.testing.assert_allclose(out, np.diag(a), rtol=1e-6)


def test_reverse_read():
    """a[n-1-i]: negative-coefficient index via shape query."""
    a = np.arange(6, dtype=np.float32)

    def graph():
        i = iters("i")
        inp = input("a")
        out = Fun()
        out[i] = inp[inp.shape[0] - 1 - i]
        out.with_shape([inp.shape[0]])
        return out.target("rev")

    mj, out = _oracle_check(graph, {"a": a}, "rev")
    np.testing.assert_allclose(out, a[::-1])


def test_wrap_index():
    """Circular shift via wrap()."""
    from exprgrad_tpu import wrap

    a = np.arange(5, dtype=np.float32)

    def graph():
        i = iters("i")
        inp = input("a")
        out = Fun()
        out[i] = inp[wrap(i + 2, inp.shape[0])]
        out.copy_shape(inp)
        return out.target("roll")

    mj, out = _oracle_check(graph, {"a": a}, "roll")
    np.testing.assert_allclose(out, np.roll(a, -2))


def test_dilated_conv_hits_conv_path():
    """images[n, y+2*dy, c] * flt[f,dy,c] -> dilated convolution."""
    rng = np.random.default_rng(5)
    images = rng.normal(size=(2, 11, 3)).astype(np.float32)
    filters = rng.normal(size=(4, 3, 3)).astype(np.float32)

    def graph():
        n, y, f, dy, c = iters("n", "y", "f", "dy", "c")
        out = Fun()
        out[n, y, f] = (
            input("images")[n, y + 2 * dy, c] * input("filters")[f, dy, c]
        )
        return out.target("out")

    mj, out = _oracle_check(graph, {"images": images, "filters": filters}, "out")
    assert out.shape == (2, 7, 4)
    assert _stats(mj, "out").get("conv") == 1


def test_embedding_lookup():
    """Data-dependent indexing: emb[to_index(tokens[i]), d]."""
    from exprgrad_tpu import to_index

    tokens = np.array([2.0, 0.0, 1.0, 2.0], dtype=np.float32)
    emb = np.arange(12, dtype=np.float32).reshape(3, 4)

    def graph():
        i, d = iters("i", "d")
        tok = input("tokens")
        table = input("emb")
        out = Fun()
        out[i, d] = table[to_index(tok[i]), d]
        out.with_shape([tok.shape[0], table.shape[1]])
        return out.target("embed")

    mj, out = _oracle_check(graph, {"tokens": tokens, "emb": emb}, "embed")
    np.testing.assert_allclose(out, emb[tokens.astype(int)])


def test_embedding_gradient_scatter():
    """d(emb lookup)/d(emb): scatter-add into the embedding rows."""
    from exprgrad_tpu import to_index

    tokens = np.array([2.0, 0.0, 2.0], dtype=np.float32)
    emb = np.arange(8, dtype=np.float32).reshape(4, 2)

    def graph():
        i, d = iters("i", "d")
        tok = input("tokens")
        table = input("emb")
        out = Fun()
        out[i, d] = table[to_index(tok[i]), d]
        out.with_shape([tok.shape[0], table.shape[1]])
        it = iters("it")
        loss = Fun()
        loss[0] = sq(out.raw[it])
        return loss.target("loss").backwards().grad(table).target("demb")

    mj, got = _oracle_check(graph, {"tokens": tokens, "emb": emb}, "demb")
    expected = np.zeros_like(emb)
    for i, t in enumerate(tokens.astype(int)):
        expected[t] += 2 * emb[t]
    np.testing.assert_allclose(got, expected, rtol=1e-5)
