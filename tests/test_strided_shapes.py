"""Floor-bound shape solving for strided reads whose loop bound is pinned
elsewhere (passes/shapes.py solve_floor).

The exact solver demands every read's max index reach size-1 exactly
(reference passes.nim:1252); ``out[i] = base[i] + t[2*i]`` with ``t`` of
length 2L was therefore rejected even though reading the even rows is
perfectly well-defined.  These tests pin the relaxation: strided reads may
stop up to stride-1 short of the end, unit-stride reads keep exact-cover
semantics, and disagreeing floor bounds still error.
"""

import numpy as np
import pytest

from exprgrad_tpu import Fun, ShapeError, Tensor, compile, input, iters


@pytest.fixture(params=["interp", "jax"])
def backend(request):
    return request.param


def test_strided_read_pinned_by_unit_read(backend):
    """out[i] = base[i] + t[2*i]: t of size 2L reads its even elements."""
    i = iters("i")
    base = input("base")
    t = input("t")
    out = Fun()
    out[i] = base[i] + t[2 * i]
    model = compile(out.target("o"), backend=backend)
    b = np.arange(4, dtype=np.float32)
    tt = np.arange(8, dtype=np.float32) * 10
    np.testing.assert_allclose(
        np.asarray(model.call("o", {"base": b, "t": tt})), b + tt[::2]
    )


def test_strided_read_exact_size_still_works(backend):
    """t of size 2L-1 (the exact-cover case) is unchanged."""
    i = iters("i")
    base = input("base")
    t = input("t")
    out = Fun()
    out[i] = base[i] + t[2 * i]
    model = compile(out.target("o"), backend=backend)
    b = np.arange(4, dtype=np.float32)
    tt = np.arange(7, dtype=np.float32) * 10
    np.testing.assert_allclose(
        np.asarray(model.call("o", {"base": b, "t": tt})), b + tt[::2]
    )


def test_strided_read_with_offset(backend):
    """out[i] = t[2*i + 1] + base[i]: odd elements, floor slack on t."""
    i = iters("i")
    base = input("base")
    t = input("t")
    out = Fun()
    out[i] = t[2 * i + 1] + base[i]
    model = compile(out.target("o"), backend=backend)
    b = np.arange(4, dtype=np.float32)
    tt = np.arange(8, dtype=np.float32) * 10
    np.testing.assert_allclose(
        np.asarray(model.call("o", {"base": b, "t": tt})), tt[1::2] + b
    )


def test_unit_stride_mismatch_still_errors(backend):
    """Plain elementwise size mismatch must NOT be relaxed."""
    i = iters("i")
    out = Fun()
    out[i] = input("a")[i] + input("b")[i]
    model = compile(out.target("o"), backend=backend)
    with pytest.raises(ShapeError):
        model.call(
            "o",
            {
                "a": Tensor.new([5], 1.0),
                "b": Tensor.new([7], 2.0),
            },
        )


def test_disagreeing_floor_bounds_error(backend):
    """Two strided reads whose floor bounds disagree are a real conflict."""
    i = iters("i")
    out = Fun()
    out[i] = input("a")[2 * i] + input("b")[2 * i]
    model = compile(out.target("o"), backend=backend)
    with pytest.raises(ShapeError):
        model.call(
            "o",
            {
                "a": Tensor.new([8], 1.0),
                "b": Tensor.new([12], 2.0),
            },
        )


def test_agreeing_floor_bounds(backend):
    """Two strided reads with the SAME floor bound are fine: sizes 8 and 7
    both give i <= 3 under stride 2."""
    i = iters("i")
    out = Fun()
    out[i] = input("a")[2 * i] + input("b")[2 * i]
    model = compile(out.target("o"), backend=backend)
    a = np.arange(8, dtype=np.float32)
    b = np.arange(7, dtype=np.float32) * 10
    np.testing.assert_allclose(
        np.asarray(model.call("o", {"a": a, "b": b})), a[::2] + b[::2]
    )


def test_strided_read_gradient(backend):
    """Gradients scatter back into the strided read: grad_t has t's shape
    (ShapeCopy), odd slots untouched."""
    from exprgrad_tpu import param

    i = iters("i")
    t = param([8], (0.5, 0.5), name="t")
    out = Fun()
    out[i] = input("base")[i] * t[2 * i]
    loss = Fun()
    loss.raw[0] = out[i]
    model = compile(
        loss.target("loss").backwards().grad(t).target("g"),
        backend=backend,
    )
    b = np.arange(4, dtype=np.float32) + 1.0
    g = np.asarray(model.call("g", {"base": b}))
    expected = np.zeros(8, np.float32)
    expected[::2] = b
    np.testing.assert_allclose(g, expected)


def test_2d_strided_read(backend):
    """Strided read on one axis of a rank-2 tensor, unit on the other."""
    y, x = iters("y", "x")
    img = input("img")
    base = input("base")
    out = Fun()
    out[y, x] = img[2 * y, x] + base[y, x]
    model = compile(out.target("o"), backend=backend)
    im = np.arange(24, dtype=np.float32).reshape(6, 4)
    b = np.ones((3, 4), np.float32)
    np.testing.assert_allclose(
        np.asarray(model.call("o", {"img": im, "base": b})), im[::2] + b
    )
