"""Schedule-driven Pallas emitter tests (interpret mode on CPU).

The reference's analog is the golden-IR GPU test suite that checks the
tiled/cached OpenCL lowering without a GPU (tests/test_gpu.nim); here the
Pallas kernel executes in interpreter mode and is checked numerically.
"""

import numpy as np

from exprgrad_tpu import Fun, Tensor, compile, input, iters


def _matmul_graph(schedule=None):
    y, x, it = iters("y", "x", "it")
    c = Fun("c")
    a, b = input("a"), input("b")
    c[y, x] = a[y, it] * b[it, x]
    if schedule:
        c.schedule(**schedule)
    return c.target("c"), a, b


def test_pallas_matmul_matches_einsum():
    rng = np.random.default_rng(0)
    av = rng.normal(size=(64, 128)).astype(np.float32)
    bv = rng.normal(size=(128, 256)).astype(np.float32)

    graph, a, b = _matmul_graph()
    plain = compile(graph, backend="jax")
    expected = plain.call("c", {"a": av, "b": bv})

    graph, a, b = _matmul_graph(
        {"tile": {"y": 32, "x": 128, "it": 128}, "parallel": ["y", "x"],
         "cache": []}
    )
    scheduled = compile(graph, backend="jax", schedule_mode="force")
    out = scheduled.call("c", {"a": av, "b": bv})
    np.testing.assert_allclose(out, expected, rtol=1e-5)

    # the scheduled model must actually use the pallas path
    ex = next(iter(scheduled._executors.values()))
    assert ex.stats.get("pallas") == 1


def test_pallas_masked_indivisible():
    """Non-divisible tile sizes run through Pallas with padded blocks and
    masked bounds (the reference's bounds-guard behavior on non-divisible
    shapes, test_gpu.nim:252-266) — oracle parity on the 30x70x50 case."""
    rng = np.random.default_rng(1)
    av = rng.normal(size=(30, 50)).astype(np.float32)
    bv = rng.normal(size=(50, 70)).astype(np.float32)
    graph, a, b = _matmul_graph({"tile": {"y": 16}, "parallel": ["y"]})
    model = compile(graph, backend="jax", schedule_mode="force")
    out = model.call("c", {"a": av, "b": bv})
    np.testing.assert_allclose(out, av @ bv, rtol=1e-4)
    ex = next(iter(model._executors.values()))
    assert ex.stats.get("pallas") == 1


def test_pallas_masked_indivisible_all_dims():
    """Ragged tiles on every dim at once (tile does not divide m, n or k)."""
    rng = np.random.default_rng(11)
    av = rng.normal(size=(37, 211)).astype(np.float32)
    bv = rng.normal(size=(211, 93)).astype(np.float32)
    graph, a, b = _matmul_graph(
        {"tile": {"y": 16, "x": 48, "it": 100}, "parallel": ["y", "x"]}
    )
    model = compile(graph, backend="jax", schedule_mode="force")
    out = model.call("c", {"a": av, "b": bv})
    np.testing.assert_allclose(out, av @ bv, rtol=1e-4, atol=1e-4)
    ex = next(iter(model._executors.values()))
    assert ex.stats.get("pallas") == 1


def test_schedule_survives_cache_tensor_hint():
    rng = np.random.default_rng(2)
    av = rng.normal(size=(32, 128)).astype(np.float32)
    bv = rng.normal(size=(128, 128)).astype(np.float32)
    y, x, it = iters("y", "x", "it")
    c = Fun("c")
    a, b = input("a"), input("b")
    c[y, x] = a[y, it] * b[it, x]
    c.schedule(cache=[a, b])  # stage operands through VMEM
    model = compile(c.target("c"), backend="jax", schedule_mode="force")
    out = model.call("c", {"a": av, "b": bv})
    np.testing.assert_allclose(out, av @ bv, rtol=1e-4)
    ex = next(iter(model._executors.values()))
    assert ex.stats.get("pallas") == 1


def test_ops_pallas_matmul_grad():
    import jax
    import jax.numpy as jnp

    from exprgrad_tpu.ops import pallas_matmul

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(128, 256)).astype(np.float32))

    out = pallas_matmul(a, b, block_m=64, block_n=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(a @ b), rtol=1e-4)

    def loss(a, b):
        return jnp.sum(
            pallas_matmul(a, b, block_m=64, block_n=128, block_k=128) ** 2
        )

    ga, gb = jax.grad(loss, argnums=(0, 1))(a, b)
    c = a @ b
    np.testing.assert_allclose(np.asarray(ga), np.asarray(2 * c @ b.T), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(2 * a.T @ c), rtol=1e-3)
