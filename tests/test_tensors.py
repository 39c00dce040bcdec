"""Host tensor utility tests (ported from reference tests/test_tensors.nim)."""

import numpy as np

from exprgrad_tpu import (
    Tensor,
    concat_first,
    one_hot,
    remap,
    select_random_samples,
    select_samples,
    shuffle_xy,
    view_first,
)


def test_new():
    t = Tensor.new([2, 3], [1, 2, 3, 4, 5, 6])
    assert t.shape == (2, 3)
    assert t[1, 2] == 6
    filled = Tensor.new([2, 2], 3.5)
    np.testing.assert_allclose(filled, np.full((2, 2), 3.5))


def test_rand():
    t = Tensor.rand([100], -2.0, 3.0, rng=np.random.default_rng(0))
    assert t.min() >= -2.0 and t.max() <= 3.0


def test_linspace():
    np.testing.assert_allclose(Tensor.linspace(0, 1, 5), [0, 0.25, 0.5, 0.75, 1])


def test_one_hot():
    out = one_hot(np.array([0, 2, 1]), 3)
    np.testing.assert_allclose(out, [[1, 0, 0], [0, 0, 1], [0, 1, 0]])


def test_remap():
    out = remap(np.array([0.0, 255.0]), 0, 255, 0.1, 0.9)
    np.testing.assert_allclose(out, [0.1, 0.9], rtol=1e-6)


def test_view_first():
    t = Tensor.new([4, 2], [1, 2, 3, 4, 5, 6, 7, 8])
    v = view_first(t, 1, 2)
    np.testing.assert_allclose(v, [[3, 4], [5, 6]])
    assert v.base is not None  # zero-copy view, not a copy


def test_select_samples():
    t = Tensor.new([3, 2], [1, 2, 3, 4, 5, 6])
    np.testing.assert_allclose(select_samples(t, [2, 0]), [[5, 6], [1, 2]])
    r = select_random_samples(t, 5, rng=np.random.default_rng(0))
    assert r.shape == (5, 2)


def test_shuffle_xy():
    x = np.arange(10).reshape(10, 1)
    y = np.arange(10).reshape(10, 1) * 2
    sx, sy = shuffle_xy(x, y, rng=np.random.default_rng(0))
    np.testing.assert_allclose(sx * 2, sy)
    assert sorted(sx.ravel().tolist()) == list(range(10))


def test_concat_first():
    a = Tensor.new([1, 2], [1, 2])
    b = Tensor.new([2, 2], [3, 4, 5, 6])
    np.testing.assert_allclose(concat_first(a, b), [[1, 2], [3, 4], [5, 6]])
