"""Per-compile-scope schedules (Fun.schedule(scope=...)): the TPU analog
of the reference's cpu:/threads:/gpu: schedule sub-blocks.  These tests
run on CPU, so scope "cpu" is the active one."""

import numpy as np
import pytest

from exprgrad_tpu import Fun, ParserError, compile, input, iters


def _graph(**sched_calls):
    y, x, it = iters("y", "x", "it")
    a, b = input("a"), input("b")
    c = Fun("c")
    c[y, x] = a[y, it] * b[it, x]
    for scope, tile in sched_calls.items():
        c.schedule(tile=tile, scope=scope if scope != "unscoped" else "")
    return c.target("c")


def _run(graph, **kw):
    rng = np.random.default_rng(0)
    args = {
        "a": rng.normal(size=(64, 128)).astype(np.float32),
        "b": rng.normal(size=(128, 128)).astype(np.float32),
    }
    model = compile(graph, backend="jax", **kw)
    out = model.call("c", args)
    np.testing.assert_allclose(out, args["a"] @ args["b"], rtol=1e-5)
    ex = next(iter(model._executors.values()))
    return ex.stats


def test_tpu_scoped_schedule_inactive_on_cpu():
    """A tpu-scoped schedule must not apply (or warn) on a CPU compile."""
    stats = _run(_graph(tpu={"y": 64, "x": 128, "it": 128}),
                 schedule_mode="force")
    assert stats.get("pallas") is None
    assert stats.get("schedule-fallback") is None
    assert stats.get("einsum") == 1


def test_cpu_scoped_schedule_active_on_cpu():
    stats = _run(_graph(cpu={"y": 64, "x": 128, "it": 128}),
                 schedule_mode="force")
    assert stats.get("pallas") == 1


def test_exact_scope_beats_unscoped():
    """cpu scope tiles divide; the unscoped spec's tiles would NOT divide
    the extents — proving the cpu spec won the resolution."""
    graph = _graph(
        unscoped={"y": 48, "x": 100, "it": 100},  # would fall back
        cpu={"y": 64, "x": 128, "it": 128},
    )
    stats = _run(graph, schedule_mode="force")
    assert stats.get("pallas") == 1
    assert stats.get("schedule-fallback") is None


def test_unscoped_applies_everywhere():
    stats = _run(_graph(unscoped={"y": 64, "x": 128, "it": 128}),
                 schedule_mode="force")
    assert stats.get("pallas") == 1


def test_invalid_scope_rejected():
    y, x, it = iters("y", "x", "it")
    a, b = input("a"), input("b")
    c = Fun("c")
    c[y, x] = a[y, it] * b[it, x]
    with pytest.raises(ParserError, match="scope"):
        c.schedule(tile={"y": 64}, scope="gpu")
