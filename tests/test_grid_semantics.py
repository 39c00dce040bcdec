"""Static guard: every pallas_call the package constructs must pass a
dimension_semantics tuple whose length equals the grid rank.

Mosaic rejects a mismatch on real hardware (ValueError at lowering),
but interpret mode IGNORES compiler_params entirely — so the whole CPU
suite stays green while the chip path is broken (this happened: the
head-chunked paged-decode rewrite shrank the tuple to 2 for a 3-D
grid).  This test intercepts pallas_call across representative kernel
constructions and checks the invariant.
"""

import numpy as np
import pytest


@pytest.fixture
def captured_calls(monkeypatch):
    from jax.experimental import pallas as pl

    calls = []
    real = pl.pallas_call

    def spy(kernel, **kwargs):
        grid = kwargs.get("grid")
        grid_spec = kwargs.get("grid_spec")
        if grid is None and grid_spec is not None:
            grid = getattr(grid_spec, "grid", None)
        params = kwargs.get("compiler_params")
        sem = getattr(params, "dimension_semantics", None) if params else None
        calls.append((kernel.__name__ if hasattr(kernel, "__name__")
                      else str(kernel), grid, sem))
        return real(kernel, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", spy)
    # the modules under test import pallas as pl themselves; patch the
    # attribute they resolve at call time
    import exprgrad_tpu.ops.attention as attn
    import exprgrad_tpu.ops.matmul as mm
    import exprgrad_tpu.ops.paged_attention as pa
    import exprgrad_tpu.backend.pallasgen as pg

    for mod in (attn, mm, pa, pg):
        if hasattr(mod, "pl"):
            monkeypatch.setattr(mod.pl, "pallas_call", spy, raising=False)
    return calls


def _check(calls):
    assert calls, "no pallas_call captured — the spy is not wired"
    for name, grid, sem in calls:
        if sem is None or grid is None:
            continue
        assert len(tuple(grid)) == len(tuple(sem)), (
            f"{name}: grid rank {len(tuple(grid))} != dimension_semantics "
            f"length {len(tuple(sem))} — Mosaic rejects this on hardware"
        )


def test_attention_grids_match_semantics(captured_calls):
    import jax
    import jax.numpy as jnp

    from exprgrad_tpu.ops.attention import flash_attention

    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.normal(size=(1, 2, 256, 64)) * 0.1,
                             jnp.float32)
    q, k, v = mk(), mk(), mk()
    g = mk()
    for kwargs in (dict(causal=True), dict(causal=False),
                   dict(causal=True, window=64)):
        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v, block_q=64,
                                           block_k=64, **kwargs) * g)

        jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    _check(captured_calls)


def test_paged_decode_grid_matches_semantics(captured_calls):
    import jax.numpy as jnp

    from exprgrad_tpu.ops.paged import init_pool
    from exprgrad_tpu.ops.paged_attention import paged_decode_attention

    rng = np.random.default_rng(1)
    b, hkv, page, d, P = 2, 4, 16, 64, 3
    pool = init_pool(b * P + 1, hkv, page, d, dtype=jnp.float32)
    pool = pool._replace(
        k=jnp.asarray(rng.normal(size=pool.k.shape), jnp.float32),
        v=jnp.asarray(rng.normal(size=pool.v.shape), jnp.float32),
    )
    table = jnp.asarray(
        1 + np.arange(b * P, dtype=np.int32).reshape(b, P))
    key_pos = jnp.asarray(np.broadcast_to(
        np.arange(P * page, dtype=np.int32), (b, P * page)))
    q_pos = jnp.full((b, 1), P * page - 1, jnp.int32)
    q = jnp.asarray(rng.normal(size=(b, hkv, 1, d)), jnp.float32)
    paged_decode_attention(q, pool, table, key_pos, q_pos)
    _check(captured_calls)


def test_scheduled_kernels_grid_matches_semantics(captured_calls):
    from exprgrad_tpu import Fun, compile, exp, input, iters

    inp = input("inp")
    out = Fun("out")
    y, x = iters("y", "x")
    out[y] = exp(inp[y, x])
    out.schedule(tile={"y": 8, "x": 128})
    model = compile(out.target("out"), backend="jax",
                    schedule_mode="force")
    v = np.random.default_rng(2).normal(size=(16, 256)).astype(np.float32)
    model.call("out", {"inp": v})
    _check(captured_calls)
