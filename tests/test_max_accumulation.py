"""Max-accumulation kernels (language extension): out.maximize[...] = expr.

True max-reductions with subgradient autodiff — beyond the reference, whose
only reduction is ``+=`` (maxpool needs a hand-written custom gradient
there; here the compiler derives the argmax-gated gradient itself).
"""

import numpy as np
import pytest

from exprgrad_tpu import Fun, compile, exp, input, iters, sq
from exprgrad_tpu.errors import ValidationError

BACKENDS = ["interp", "jax"]


@pytest.fixture(params=BACKENDS)
def backend(request):
    return request.param


def test_row_max(backend):
    y, x = iters("y", "x")
    m = Fun()
    m.maximize[y] = input("a")[y, x]
    model = compile(m.target("m"), backend=backend)
    rng = np.random.default_rng(0)
    a = rng.normal(size=(5, 7)).astype(np.float32)
    np.testing.assert_allclose(model.call("m", {"a": a}), a.max(axis=1))


def test_global_max(backend):
    x = iters("x")
    m = Fun()
    m.maximize[0] = input("a").raw[x]
    m.with_shape([1])
    model = compile(m.target("m"), backend=backend)
    a = np.array([3.0, -1.0, 7.5, 2.0], dtype=np.float32)
    np.testing.assert_allclose(model.call("m", {"a": a}), [7.5])


def test_max_gradient(backend):
    """d(sum of sq(rowmax)) / d(a): 2*max flows to argmax positions only."""
    a_in = input("a")
    y, x = iters("y", "x")
    m = Fun()
    m.maximize[y] = a_in[y, x]
    it = iters("it")
    loss = Fun()
    loss[0] = sq(m.raw[it])
    graph = loss.target("loss").backwards().grad(a_in).target("da")
    model = compile(graph, dtype="float64", backend=backend)
    rng = np.random.default_rng(1)
    a = rng.normal(size=(4, 6))
    got = model.call("da", {"a": a})
    expected = np.zeros_like(a)
    rows = np.arange(4)
    cols = a.argmax(axis=1)
    expected[rows, cols] = 2 * a[rows, cols]
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_maxpool_via_maximize(backend):
    """2x2 maxpool expressed with maximize — no custom gradient needed."""
    from exprgrad_tpu import irange

    images = input("images")
    n, y, x, c = iters("n", "y", "x", "c")
    dy = irange("dy", 0, 2)
    dx = irange("dx", 0, 2)
    pool = Fun()
    pool.maximize[n, y, x, c] = images[n, 2 * y + dy, 2 * x + dx, c]
    pool.with_shape([
        images.shape[0], images.shape[1] // 2, images.shape[2] // 2,
        images.shape[3],
    ])
    it = iters("it")
    loss = Fun()
    loss[0] = sq(pool.raw[it])
    graph = [
        pool.target("pool"),
        loss.target("loss").backwards().grad(images).target("dimg"),
    ]
    model = compile(graph, dtype="float64", backend=backend)
    rng = np.random.default_rng(2)
    imgs = rng.normal(size=(2, 6, 6, 3))
    # NOTE: dy/dx range over the filter extent 2 because shape inference
    # solves 2*y_max + dy_max = H-1; pooled output is 3x3 windows of 2x2
    out = model.call("pool", {"images": imgs})
    expected = imgs.reshape(2, 3, 2, 3, 2, 3).max(axis=(2, 4))
    np.testing.assert_allclose(out, expected)
    # gradient: 2*max at each window's argmax
    dimg = model.call("dimg", {"images": imgs})
    assert dimg.shape == imgs.shape
    np.testing.assert_allclose(dimg.sum(), (2 * expected).sum(), rtol=1e-9)
    assert (dimg != 0).sum() == expected.size  # one argmax per window


def test_true_stable_softmax(backend):
    """Exact max-shifted softmax, expressible only with max-accumulation."""
    inp = input("x")
    y, x = iters("y", "x")
    m = Fun()
    m.maximize[y] = inp[y, x]
    y, x = iters("y", "x")
    s = Fun()
    s[y] = exp(inp[y, x] - m[y])
    y, x = iters("y", "x")
    out = Fun()
    out[y, x] = exp(inp[y, x] - m[y]) / s[y]
    model = compile(out.target("softmax"), backend=backend)
    rng = np.random.default_rng(3)
    # huge logits: naive softmax would overflow
    xv = (rng.normal(size=(4, 9)) * 60).astype(np.float32)
    got = model.call("softmax", {"x": xv})
    e = np.exp(xv.astype(np.float64) - xv.max(axis=1, keepdims=True))
    expected = e / e.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-7)
    assert np.isfinite(got).all()


def test_mixed_accumulation_rejected(backend):
    y, x = iters("y", "x")
    m = Fun()
    m.maximize[y] = input("a")[y, x]
    y, x = iters("y", "x")
    m[y] = input("a")[y, x]  # add-write to the same tensor
    with pytest.raises(ValidationError):
        compile(m.target("m"), backend=backend)


def test_row_min(backend):
    y, x = iters("y", "x")
    m = Fun()
    m.minimize[y] = input("a")[y, x]
    model = compile(m.target("m"), backend=backend)
    rng = np.random.default_rng(10)
    a = rng.normal(size=(5, 7)).astype(np.float32)
    np.testing.assert_allclose(model.call("m", {"a": a}), a.min(axis=1))


def test_min_gradient(backend):
    """d(sum of sq(rowmin))/da: 2*min flows to argmin positions only."""
    a_in = input("a")
    y, x = iters("y", "x")
    m = Fun()
    m.minimize[y] = a_in[y, x]
    it = iters("it")
    loss = Fun()
    loss[0] = sq(m.raw[it])
    graph = loss.target("loss").backwards().grad(a_in).target("da")
    model = compile(graph, dtype="float64", backend=backend)
    rng = np.random.default_rng(11)
    a = rng.normal(size=(4, 6))
    got = model.call("da", {"a": a})
    expected = np.zeros_like(a)
    rows = np.arange(4)
    cols = a.argmin(axis=1)
    expected[rows, cols] = 2 * a[rows, cols]
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_minpool_scatter_path(backend):
    """min scatter path: grouped write via i // 2."""
    from exprgrad_tpu import irange

    a = input("a")
    x = iters("x")
    pool = Fun()
    pool.minimize[x // 2] = a[x]
    pool.with_shape([a.shape[0] // 2])
    model = compile(pool.target("p"), dtype="float64", backend=backend)
    v = np.array([4.0, 1.0, 7.0, 3.0, -2.0, 9.0])
    np.testing.assert_allclose(
        model.call("p", {"a": v}), v.reshape(3, 2).min(-1)
    )


def test_min_max_mixed_rejected(backend):
    y, x = iters("y", "x")
    m = Fun()
    m.maximize[y] = input("a")[y, x]
    y, x = iters("y", "x")
    m.minimize[y] = input("a")[y, x]
    with pytest.raises(ValidationError):
        compile(m.target("m"), backend=backend)


def test_triangular_running_min(backend):
    """min accumulation composes with dynamic bounds (+inf identity mask)."""
    from exprgrad_tpu import irange

    a = input("a")
    y = iters("y")
    x = irange("x", 0, y + 1)
    m = Fun()
    m.minimize[y] = a[y, x]
    model = compile(m.target("m"), dtype="float64", backend=backend)
    rng = np.random.default_rng(12)
    av = rng.normal(size=(6, 6))
    masked = np.where(
        np.arange(6)[None, :] <= np.arange(6)[:, None], av, np.inf
    )
    np.testing.assert_allclose(model.call("m", {"a": av}), masked.min(axis=1))
