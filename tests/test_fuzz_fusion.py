"""Differential fuzz for epilogue-chain fusion.

Random elementwise consumer chains behind a scheduled matmul, executed
with schedule_mode="force" (fusion active) and "ignore" (pure XLA paths):
the outputs must agree.  This guards the planner's legality rules —
add-writer absorption, chain hops, raw steps, broadcast operands,
transposed stores — against silent-wrong-results regressions.
"""

import numpy as np
import pytest

from exprgrad_tpu import Fun, compile, exp, input, iters, maximum, select

M, K, N = 64, 128, 128


def _build_chain(rng, m=M, k=K, n=N):
    """Random scheduled matmul + 0-3 elementwise follow-up kernels."""
    y, x, it = iters("y", "x", "it")
    a, b = input("a"), input("b")
    inputs = {"a": (m, k), "b": (k, n)}
    c = Fun("c")
    transposed = rng.random() < 0.3
    if transposed:
        c[x, y] = a[y, it] * b[it, x]
        rows, cols = n, m
    else:
        c[y, x] = a[y, it] * b[it, x]
        rows, cols = m, n
    c.schedule(tile={"y": 32, "x": 128, "it": 128}, parallel=["y", "x"])

    # optionally a second accumulating writer (bias-style)
    if rng.random() < 0.5:
        name = f"w{len(inputs)}"
        inputs[name] = (cols,)
        w = input(name)
        p, q = iters("p", "q")
        c[p, q] = w[q]

    cur = c
    n_steps = rng.integers(0, 4)
    for step in range(n_steps):
        kind = rng.choice(["relu_raw", "affine", "residual", "exp"])
        nxt = Fun(f"s{step}")
        if kind == "relu_raw":
            i = iters("i")
            nxt.raw[i] = select(cur.raw[i] >= 0.0, cur.raw[i],
                                0.1 * cur.raw[i])
            nxt.copy_shape(cur)
        elif kind == "affine":
            name = f"w{len(inputs)}"
            pat = rng.choice(["row", "col", "full"])
            shape = {
                "row": (cols,), "col": (rows,), "full": (rows, cols)
            }[pat]
            inputs[name] = shape
            w = input(name)
            p, q = iters("p", "q")
            rd = {"row": w[q], "col": w[p], "full": w[p, q]}[pat]
            nxt[p, q] = cur[p, q] * 0.5 + rd
        elif kind == "residual":
            name = f"w{len(inputs)}"
            inputs[name] = (rows, cols)
            w = input(name)
            p, q = iters("p", "q")
            nxt[p, q] = cur[p, q] + w[p, q]
        else:  # exp (bounded)
            p, q = iters("p", "q")
            nxt[p, q] = exp(maximum(-30.0, cur[p, q] * 0.01))
        cur = nxt
    return cur.target("out"), inputs


@pytest.mark.parametrize("seed", range(30))
def test_fusion_chain_fuzz(seed):
    rng = np.random.default_rng(seed)
    graph, inputs = _build_chain(rng)
    args = {
        name: rng.normal(size=shape).astype(np.float32) * 0.5
        for name, shape in inputs.items()
    }
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        forced = compile(graph, backend="jax", schedule_mode="force")
        plain = compile(graph, backend="jax", schedule_mode="ignore")
        got = forced.call("out", args)
        want = plain.call("out", args)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("seed", range(20))
def test_fusion_chain_fuzz_ragged(seed):
    """Same chains over NON-tile-aligned problem shapes: the fused
    kernel runs on padded blocks (masked matmul path) and must agree
    with the pure-XLA lowering bit-for-tolerance."""
    rng = np.random.default_rng(9000 + seed)
    m = int(rng.choice([30, 57, 100]))
    k = int(rng.choice([50, 130, 200]))
    n = int(rng.choice([70, 93, 150]))
    graph, inputs = _build_chain(rng, m, k, n)
    args = {
        name: rng.normal(size=shape).astype(np.float32) * 0.5
        for name, shape in inputs.items()
    }
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        forced = compile(graph, backend="jax", schedule_mode="force")
        plain = compile(graph, backend="jax", schedule_mode="ignore")
        got = forced.call("out", args)
        want = plain.call("out", args)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
