"""README/talk snippet tests (ported from reference tests/test_talks.nim):
small idiomatic programs including multi-target models."""

import numpy as np
import pytest

from exprgrad_tpu import (
    Fun,
    ShapeError,
    Tensor,
    compile,
    input,
    iters,
    select,
)

BACKENDS = ["interp", "jax"]


@pytest.fixture(params=BACKENDS)
def backend(request):
    return request.param


def test_matmul(backend):
    def matmul(a, b):
        y, x, it = iters("y", "x", "it")
        out = Fun()
        out[y, x] = a[y, it] * b[it, x]
        return out

    model = compile(
        matmul(input("a"), input("b")).target("multiply"), backend=backend
    )
    a = Tensor.new([2, 2], [1, 2, 3, 4])
    b = Tensor.new([2, 3], [1, 2, 3, 4, 5, 6])
    np.testing.assert_allclose(
        model.call("multiply", {"a": a, "b": b}), a @ b
    )


def test_transpose(backend):
    def transpose(matrix):
        y, x = iters("y", "x")
        out = Fun()
        out[y, x] = matrix[x, y]
        return out

    model = compile(
        transpose(input("matrix")).target("transpose"), backend=backend
    )
    matrix = Tensor.rand([4, 5], rng=np.random.default_rng(0))
    np.testing.assert_allclose(
        model.call("transpose", {"matrix": matrix}), matrix.T
    )


def test_increment(backend):
    it = iters("it")
    out = Fun()
    out.raw[it] = input("input").raw[it] + 1.0
    model = compile(out.target("increment"), backend=backend)
    tensor = Tensor.new([1, 2, 3], [1, 2, 3, 4, 5, 6])
    np.testing.assert_allclose(
        model.call("increment", {"input": tensor}), tensor + 1
    )


def test_sum_positive(backend):
    it = iters("it")
    inp = input("input")
    out = Fun()
    out[0] = select(inp.raw[it] > 0.0, inp.raw[it], 0.0)
    model = compile(out.target("sumPositive"), backend=backend)
    tensor = Tensor.new([2, 3], [1, -2, -3, 4, 5, -6])
    np.testing.assert_allclose(
        model.call("sumPositive", {"input": tensor}), [10.0]
    )


def test_ones(backend):
    it = iters("it")
    ones = Fun()
    ones.raw[it] = 1.0
    with pytest.raises(ShapeError):
        compile(ones.target("ones"), backend=backend)

    it = iters("it")
    ones = Fun()
    ones.raw[it] = 1.0
    ones.with_shape([2, 3])
    model = compile(ones.target("ones"), backend=backend)
    np.testing.assert_allclose(model.call("ones"), np.ones([2, 3]))


def test_multiple_kernels(backend):
    def linear(inp, weights, biases):
        y, x, it = iters("y", "x", "it")
        out = Fun()
        out[y, x] = inp[y, it] * weights[it, x]
        y, x = iters("y", "x")
        out[y, x] = biases[x]
        return out

    graph = linear(input("input"), input("weights"), input("biases"))
    model = compile(graph.target("predict"), backend=backend)
    out = model.call(
        "predict",
        {
            "input": Tensor.new([5, 2], [0, 0, 1, 0, 0, 1, 1, 1, 1, 2]),
            "weights": Tensor.new([2, 1], [2, 3]),
            "biases": Tensor.new([1], [1]),
        },
    )
    np.testing.assert_allclose(out, [[1], [3], [4], [6], [9]])


def test_multiply_and_square(backend):
    a, b = input("a"), input("b")
    y, x, it = iters("y", "x", "it")
    c = Fun()
    c[y, x] = a[y, it] * b[it, x]
    it = iters("it")
    d = Fun()
    d.raw[it] = c.raw[it] * c.raw[it]

    model = compile(
        [c.target("multiply"), d.target("multiplyAndSquare")], backend=backend
    )
    args = {
        "a": Tensor.new([2, 2], [1, 2, 3, 4]),
        "b": Tensor.new([2, 1], [1, 2]),
    }
    np.testing.assert_allclose(model.call("multiply", args), [[5], [11]])
    np.testing.assert_allclose(
        model.call("multiplyAndSquare", args), [[25], [121]]
    )
