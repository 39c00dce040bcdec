"""Differential fuzzing for the language extensions: max-accumulation
kernels and iterator-dependent (triangular) loop bounds.

Same strategy as test_fuzz.py (SURVEY.md §4 numeric-oracle testing, scaled
up): random kernels, jax backend vs numpy oracle in float64, plus
finite-difference validation of the derived gradients.
"""

import numpy as np
import pytest

from exprgrad_tpu import Fun, compile, input, irange, iters
from exprgrad_tpu import exp, sin, sq, sqrt
from exprgrad_tpu.expr import Scalar, as_scalar


def _random_expr(rng, reads, smooth_depth=0):
    def expr(depth: int) -> Scalar:
        choice = rng.integers(0, 8 if depth < 3 else 3)
        if choice < 2:
            return reads[int(rng.integers(0, len(reads)))]
        if choice < 3:
            return as_scalar(float(rng.uniform(0.3, 2.0)))
        a, b = expr(depth + 1), expr(depth + 1)
        op = rng.integers(0, 7)
        if op == 0:
            return a + b
        if op == 1:
            return a - b
        if op in (2, 3):
            return a * b
        if op == 4:
            return a / (b * b + 1.0)
        if op == 5:
            return exp(a * 0.3)
        return sin(a) + sqrt(b * b + 0.5)

    value = expr(0)
    for r in reads:
        value = value + 0.001 * r
    return value


def _random_max_kernel(rng, mode="max"):
    """Random kernel writing with max/min accumulation (full write coverage
    so no output element is left at the identity)."""
    n_loops = int(rng.integers(1, 4))
    sizes = [int(rng.integers(2, 6)) for _ in range(n_loops)]
    loop_vars = [irange(f"i{k}", 0, sizes[k]) for k in range(n_loops)]

    arrays = {}
    reads = []
    for t in range(int(rng.integers(1, 3))):
        dims, dim_sizes = [], []
        for _ in range(int(rng.integers(1, 3))):
            k = int(rng.integers(0, n_loops))
            form = rng.integers(0, 3)
            if form == 0:
                dims.append(loop_vars[k])
                dim_sizes.append(sizes[k])
            elif form == 1:
                off = int(rng.integers(1, 3))
                dims.append(loop_vars[k] + off)
                dim_sizes.append(sizes[k] + off)
            else:
                dims.append(loop_vars[k] // 2)
                dim_sizes.append((sizes[k] - 1) // 2 + 1)
        name = f"t{t}"
        arrays[name] = rng.uniform(0.2, 1.5, size=dim_sizes)
        reads.append(input(name)[tuple(dims)])

    value = _random_expr(rng, reads)

    # write a random subset of the loops, plain iterators only: every
    # output element receives at least one contribution
    write_count = int(rng.integers(0, n_loops + 1))
    write_axes = list(rng.permutation(n_loops)[:write_count])
    out = Fun()
    acc = out.maximize if mode == "max" else out.minimize
    if write_axes:
        acc[tuple(loop_vars[k] for k in write_axes)] = value
        out.with_shape([sizes[k] for k in write_axes])
    else:
        acc[0] = value
        out.with_shape([1])
    return out, arrays


def _random_triangular_kernel(rng):
    """Random kernel with one iterator-dependent loop bound."""
    s0 = int(rng.integers(3, 7))
    y = irange("y", 0, s0)
    kind = int(rng.integers(0, 3))
    if kind == 0:
        x = irange("x", 0, y + 1)      # lower triangle (inclusive)
    elif kind == 1:
        x = irange("x", y, s0)          # upper triangle (inclusive)
    else:
        x = irange("x", 0, s0 - y)      # anti-triangle
    # an extra static loop mixed into the nest
    s2 = int(rng.integers(2, 5))
    z = irange("z", 0, s2)

    arrays = {}
    reads = []
    specs = [
        ((y, x), (s0, s0)),
        ((x,), (s0,)),
        ((y, z), (s0, s2)),
        ((x, z), (s0, s2)),
    ]
    n_reads = int(rng.integers(1, 4))
    picks = rng.permutation(len(specs))[:n_reads]
    for t, p in enumerate(picks):
        dims, shape = specs[int(p)]
        name = f"t{t}"
        arrays[name] = rng.uniform(0.2, 1.5, size=shape)
        reads.append(input(name)[dims])

    value = _random_expr(rng, reads)
    out = Fun()
    if rng.integers(0, 2):
        out[y] = value
        out.with_shape([s0])
    else:
        out[y, z] = value
        out.with_shape([s0, s2])
    return out, arrays


def _fd_check(graph, arrays, rtol_fd=3e-4):
    """Gradients: jax vs oracle exactly, both vs finite differences."""
    it = iters("it")
    loss = Fun()
    loss[0] = sq(graph.raw[it])
    bw = loss.target("loss").backwards()
    wrt = sorted(arrays)[0]
    targets = [bw.grad(input(wrt)).target("grad")]
    ga = compile(targets, dtype="float64", backend="jax").call("grad", arrays)
    gb = compile(targets, dtype="float64", backend="interp").call(
        "grad", arrays
    )
    np.testing.assert_allclose(ga, gb, rtol=1e-9, atol=1e-11)

    loss_model = compile(loss.target("loss2"), dtype="float64",
                         backend="interp")

    def loss_at(x):
        args = dict(arrays)
        args[wrt] = x
        return float(loss_model.call("loss2", args)[0])

    x0 = arrays[wrt]
    fd = np.zeros_like(x0).reshape(-1)
    h = 1e-6
    for idx in range(x0.size):
        xp, xm = x0.copy().reshape(-1), x0.copy().reshape(-1)
        xp[idx] += h
        xm[idx] -= h
        fd[idx] = (loss_at(xp.reshape(x0.shape))
                   - loss_at(xm.reshape(x0.shape))) / (2 * h)
    np.testing.assert_allclose(ga, fd.reshape(x0.shape), rtol=rtol_fd,
                               atol=1e-6)


@pytest.mark.parametrize("mode", ["max", "min"])
@pytest.mark.parametrize("seed", range(15))
def test_fuzz_max_forward(seed, mode):
    rng = np.random.default_rng(2000 + seed)
    graph, arrays = _random_max_kernel(rng, mode)
    target = graph.target("out")
    a = compile(target, dtype="float64", backend="jax").call("out", arrays)
    b = compile(target, dtype="float64", backend="interp").call("out", arrays)
    np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12)
    assert np.isfinite(a).all()


@pytest.mark.parametrize("mode", ["max", "min"])
@pytest.mark.parametrize("seed", range(8))
def test_fuzz_max_gradients(seed, mode):
    rng = np.random.default_rng(3000 + seed)
    graph, arrays = _random_max_kernel(rng, mode)
    _fd_check(graph, arrays)


@pytest.mark.parametrize("seed", range(15))
def test_fuzz_triangular_forward(seed):
    rng = np.random.default_rng(4000 + seed)
    graph, arrays = _random_triangular_kernel(rng)
    target = graph.target("out")
    a = compile(target, dtype="float64", backend="jax").call("out", arrays)
    b = compile(target, dtype="float64", backend="interp").call("out", arrays)
    np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_triangular_gradients(seed):
    rng = np.random.default_rng(5000 + seed)
    graph, arrays = _random_triangular_kernel(rng)
    _fd_check(graph, arrays)
