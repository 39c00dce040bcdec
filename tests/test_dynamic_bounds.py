"""Iterator-dependent loop bounds (triangular loops).

The reference allows arbitrary expressions in loop bounds
(``(x in a..<b)``, parser.nim:615-633), including other iterators.  The
TPU lowering iterates the static interval hull of such a loop and masks
grid points outside the true per-point ``[start, stop)`` — the
XLA-idiomatic masked-compute form (static shapes, no dynamic control
flow), the same shape causal attention takes.
"""

import numpy as np
import pytest

from exprgrad_tpu import Fun, compile, input, irange, iters, sq

BACKENDS = ["interp", "jax"]


@pytest.fixture(params=BACKENDS)
def backend(request):
    return request.param


def test_triangular_sum(backend):
    """out[y] = sum_{x <= y} a[y, x] — a causal row reduction."""
    a = input("a")
    y = iters("y")
    x = irange("x", 0, y + 1)
    out = Fun()
    out[y] = a[y, x]
    model = compile(out.target("out"), dtype="float64", backend=backend)
    rng = np.random.default_rng(0)
    av = rng.normal(size=(6, 6))
    expected = np.cumsum(av, axis=1)[np.arange(6), np.arange(6)]
    np.testing.assert_allclose(model.call("out", {"a": av}), expected)


def test_triangular_count(backend):
    """Constant contribution under a dynamic bound: out[y] counts y+1."""
    a = input("a")
    y = iters("y")
    x = irange("x", 0, y + 1)
    out = Fun()
    out[y] = a[y, x] * 0.0 + 1.0
    model = compile(out.target("out"), dtype="float64", backend=backend)
    av = np.zeros((5, 5))
    np.testing.assert_allclose(
        model.call("out", {"a": av}), np.arange(1.0, 6.0)
    )


def test_suffix_sums_with_oob_hull(backend):
    """out[x] = sum_{dx < n-x} a[x+dx]: the hull reads past the end of
    ``a`` — masked points must not contribute (and must not crash)."""
    a = input("a")
    x = irange("x", 0, a.shape[0])
    n = a.shape[0]
    dx = irange("dx", 0, n - x)
    out = Fun()
    out[x] = a[x + dx]
    out.with_shape([a.shape[0]])
    model = compile(out.target("out"), dtype="float64", backend=backend)
    av = np.arange(1.0, 8.0)
    expected = np.cumsum(av[::-1])[::-1]
    np.testing.assert_allclose(model.call("out", {"a": av}), expected)


def test_dynamic_start(backend):
    """Strict upper triangle: out[y] = sum_{x > y} a[y, x]."""
    a = input("a")
    y = iters("y")
    x = irange("x", y + 1, a.shape[1])
    out = Fun()
    out[y] = a[y, x]
    out.with_shape([a.shape[0]])
    model = compile(out.target("out"), dtype="float64", backend=backend)
    rng = np.random.default_rng(1)
    av = rng.normal(size=(4, 7))
    expected = np.triu(av, k=1).sum(axis=1)
    np.testing.assert_allclose(model.call("out", {"a": av}), expected)


def test_gradient_through_dynamic_bounds(backend):
    """loss = sum_y sq(tri[y]) -> d/da[y,x] = 2*tri[y] for x <= y else 0."""
    a = input("a")
    y = iters("y")
    x = irange("x", 0, y + 1)
    tri = Fun()
    tri[y] = a[y, x]
    it = iters("it")
    loss = Fun()
    loss[0] = sq(tri.raw[it])
    graph = loss.target("loss").backwards().grad(a).target("da")
    model = compile(graph, dtype="float64", backend=backend)
    rng = np.random.default_rng(2)
    av = rng.normal(size=(5, 5))
    tri_v = np.cumsum(av, axis=1)[np.arange(5), np.arange(5)]
    expected = np.where(
        np.arange(5)[None, :] <= np.arange(5)[:, None],
        2 * tri_v[:, None],
        0.0,
    )
    np.testing.assert_allclose(model.call("da", {"a": av}), expected)


def test_triangular_running_max(backend):
    """Dynamic bounds compose with max accumulation (causal running max)."""
    a = input("a")
    y = iters("y")
    x = irange("x", 0, y + 1)
    m = Fun()
    m.maximize[y] = a[y, x]
    model = compile(m.target("m"), dtype="float64", backend=backend)
    rng = np.random.default_rng(3)
    av = rng.normal(size=(6, 6))
    masked = np.where(
        np.arange(6)[None, :] <= np.arange(6)[:, None], av, -np.inf
    )
    np.testing.assert_allclose(model.call("m", {"a": av}), masked.max(axis=1))


def test_causal_attention_scores(backend):
    """Triangular contraction: scores[y] = sum_{x<=y} q[y,d]*k[x,d] ... the
    inner d loop stays static while x is dynamic (mixed nest)."""
    q_in, k_in = input("q"), input("k")
    y, d = iters("y", "d")
    x = irange("x", 0, y + 1)
    s = Fun()
    s[y] = q_in[y, d] * k_in[x, d]
    model = compile(s.target("s"), dtype="float64", backend=backend)
    rng = np.random.default_rng(4)
    qv = rng.normal(size=(5, 3))
    kv = rng.normal(size=(5, 3))
    full = qv @ kv.T
    causal = np.where(
        np.arange(5)[None, :] <= np.arange(5)[:, None], full, 0.0
    )
    np.testing.assert_allclose(
        model.call("s", {"q": qv, "k": kv}), causal.sum(axis=1)
    )
