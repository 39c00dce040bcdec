"""Nim-style truncated integer div/mod semantics with NEGATIVE operands.

The reference's `div`/`mod` truncate toward zero (passes.nim:1367 relies on
this when folding index arithmetic); numpy/jax floor.  Both backends and the
compile-time folds must agree on truncation — a floored `-7 // 2 == -4`
would silently skew index arithmetic.  Regression test for the round-1
advisor finding (interp/jaxeval adjusted the floored quotient on the
*remainder* sign, which never differs from the divisor's).
"""

import numpy as np
import pytest

from exprgrad_tpu import Fun, compile, input, iters, to_scalar

BACKENDS = ["interp", "jax"]


def _trunc_div_ref(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _trunc_mod_ref(a: int, b: int) -> int:
    return a - _trunc_div_ref(a, b) * b


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("divisor", [3, -3])
def test_negative_dividend_div(backend, divisor):
    n = 16
    x = iters("x")
    res = Fun()
    res[x] = to_scalar((x - 7) // divisor)
    res.with_shape([n])
    model = compile(res.target("q"), backend=backend)
    got = np.asarray(model.call("q", {}))
    want = [_trunc_div_ref(i - 7, divisor) for i in range(n)]
    np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("divisor", [3, -3])
def test_negative_dividend_mod(backend, divisor):
    n = 16
    x = iters("x")
    res = Fun()
    res[x] = to_scalar((x - 7) % divisor)
    res.with_shape([n])
    model = compile(res.target("r"), backend=backend)
    got = np.asarray(model.call("r", {}))
    want = [_trunc_mod_ref(i - 7, divisor) for i in range(n)]
    np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("backend", BACKENDS)
def test_div_identity_holds(backend):
    """a == (a div b)*b + (a mod b) must hold pointwise for mixed signs."""
    n = 21
    x = iters("x")
    res = Fun()
    d = x - 10
    res[x] = to_scalar((d // 4) * 4 + (d % 4))
    res.with_shape([n])
    model = compile(res.target("id"), backend=backend)
    got = np.asarray(model.call("id", {}))
    np.testing.assert_allclose(got, np.arange(n) - 10)


@pytest.mark.parametrize("backend", BACKENDS)
def test_negative_div_in_read_index(backend):
    """Truncated division used as a read index: values land where Nim's
    `div` puts them, including sign-flipped offsets folded at compile time."""
    x = iters("x")
    res = Fun()
    inp = input("inp")
    # (x + 8) // 2 - 4 == x // 2 for even grids only under FLOORED division
    # when x >= 0; with truncation both agree for x >= 0 — this guards the
    # compile-time fold against runtime disagreement.
    res[x] = inp[(x + 8) // 2 - 4]
    res.with_shape([inp.shape[0] * 2])
    model = compile(res.target("up"), backend=backend)
    a = np.arange(5).astype(np.float32)
    got = np.asarray(model.call("up", {"inp": a}))
    np.testing.assert_allclose(got, np.repeat(a, 2))
