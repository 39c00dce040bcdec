"""Pallas paged-attention decode kernel (ops/paged_attention.py).

Oracle: ``decode_attention(q, gather_view(pool, table), key_pos=,
q_pos=)`` — the XLA paged path.  The kernel must agree numerically on
random pools/tables (garbage in unallocated pages, dead slots, GQA,
windows, int8 scales) and, through the ContinuousBatcher integration
(``attention='flash'``), keep greedy serving token-equal to solo
generation.  Interpret mode on CPU; Mosaic block legality is enforced
statically by ops.mosaic_check at trace time.
"""

import numpy as np
import pytest

import exprgrad_tpu as eg
from exprgrad_tpu.errors import ModelRuntimeError
from exprgrad_tpu.models import (
    ContinuousBatcher,
    FlashLMServer,
    flash_transformer,
)
from exprgrad_tpu.ops import paged
from exprgrad_tpu.ops.decode import decode_attention
from exprgrad_tpu.ops.paged_attention import paged_decode_attention


def _random_case(rng, b, hkv, t, d, P, page, n_pages, dtype):
    import jax.numpy as jnp

    pool = paged.init_pool(n_pages, hkv, page, d, dtype=dtype)
    pool = pool._replace(
        k=jnp.asarray(rng.normal(size=pool.k.shape), pool.k.dtype),
        v=jnp.asarray(rng.normal(size=pool.v.shape), pool.v.dtype),
    )
    if pool.k_scale is not None:
        pool = pool._replace(
            k_scale=jnp.asarray(
                rng.uniform(0.5, 1.5, pool.k_scale.shape), jnp.float32),
            v_scale=jnp.asarray(
                rng.uniform(0.5, 1.5, pool.v_scale.shape), jnp.float32),
        )
    lens = rng.integers(t, P * page, size=b)
    table = np.full((b, P), -1, np.int32)
    used = set()
    for i in range(b):
        for p in range(int(np.ceil(lens[i] / page))):
            while True:
                pid = int(rng.integers(0, n_pages))
                if pid not in used:
                    used.add(pid)
                    break
            table[i, p] = pid
    key_pos = np.full((b, P * page), -1, np.int32)
    for i in range(b):
        key_pos[i, : lens[i]] = np.arange(lens[i])
    q_pos = (lens - 1)[:, None] - np.arange(t)[::-1][None, :]
    return pool, table, key_pos, q_pos.astype(np.int32), lens


@pytest.mark.parametrize("head_mode", ["batched", "unroll"])
@pytest.mark.parametrize(
    "b,h,hkv,t,d,P,page,dtype,window",
    [
        (2, 4, 4, 1, 128, 4, 64, "float32", None),   # plain MHA decode
        (2, 4, 2, 1, 128, 4, 64, "float32", None),   # GQA
        (2, 8, 1, 1, 64, 3, 32, "float32", None),    # MQA, small d
        (2, 4, 2, 3, 64, 4, 64, "float32", None),    # t > 1 (spec round)
        (2, 4, 4, 1, 128, 4, 64, "float32", 40),     # sliding window
        (1, 4, 2, 2, 128, 3, 128, "int8", None),     # int8 pool + scales
        (2, 2, 2, 2, 32, 4, 16, "bfloat16", 24),     # bf16 pages, window
    ],
)
def test_matches_gather_oracle(b, h, hkv, t, d, P, page, dtype, window,
                               head_mode):
    import jax.numpy as jnp

    rng = np.random.default_rng(hash((b, h, t, d, P, page)) % 2**31)
    pool, table, key_pos, q_pos, _ = _random_case(
        rng, b, hkv, t, d, P, page, n_pages=4 * P, dtype=jnp.dtype(dtype))
    q = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)

    view = paged.gather_view(pool, jnp.asarray(np.maximum(table, 0)))
    want = decode_attention(q, view, window=window,
                            key_pos=jnp.asarray(key_pos),
                            q_pos=jnp.asarray(q_pos))
    got = paged_decode_attention(q, pool, jnp.asarray(table),
                                 jnp.asarray(key_pos),
                                 jnp.asarray(q_pos), window=window,
                                 head_mode=head_mode)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-5, rtol=2e-5)


def test_h_block_override_matches_default():
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    pool, table, key_pos, q_pos, _ = _random_case(
        rng, 2, 4, 1, 64, 4, 32, n_pages=16, dtype=jnp.float32)
    q = jnp.asarray(rng.normal(size=(2, 4, 1, 64)), jnp.float32)
    base = paged_decode_attention(q, pool, jnp.asarray(table),
                                  jnp.asarray(key_pos), jnp.asarray(q_pos))
    for hb, mode in [(1, "unroll"), (2, "batched"), (4, "unroll")]:
        got = paged_decode_attention(
            q, pool, jnp.asarray(table), jnp.asarray(key_pos),
            jnp.asarray(q_pos), h_block=hb, head_mode=mode)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   atol=2e-5, rtol=2e-5)
    with pytest.raises(ValueError, match="h_block"):
        paged_decode_attention(q, pool, jnp.asarray(table),
                               jnp.asarray(key_pos), jnp.asarray(q_pos),
                               h_block=3)


def test_mosaic_legality_at_serving_shapes():
    """The BlockSpecs the serving shapes construct pass the static
    Mosaic check at trace time (no device, no execution)."""
    import jax
    import jax.numpy as jnp

    for hkv, page, d, t in [(4, 16, 64, 1), (2, 8, 128, 5), (1, 128, 32, 1)]:
        pool = paged.init_pool(8, hkv, page, d)
        b, P = 4, 4

        def f(q, k, v, tbl, kp, qp):
            return paged_decode_attention(
                q, pool._replace(k=k, v=v), tbl, kp, qp, window=16)

        jax.eval_shape(
            f,
            jnp.zeros((b, 2 * hkv, t, d)),
            pool.k, pool.v,
            jnp.zeros((b, P), jnp.int32),
            jnp.zeros((b, P * page), jnp.int32),
            jnp.zeros((b, t), jnp.int32),
        )


def test_rejects_bad_shapes():
    import jax.numpy as jnp

    pool = paged.init_pool(4, 2, 12, 64)  # page 12: not a sublane multiple
    q = jnp.zeros((1, 2, 1, 64))
    tbl = jnp.zeros((1, 2), jnp.int32)
    kp = jnp.zeros((1, 24), jnp.int32)
    qp = jnp.zeros((1, 1), jnp.int32)
    with pytest.raises(ValueError, match="multiple of 8"):
        paged_decode_attention(q, pool, tbl, kp, qp)
    pool8 = paged.init_pool(4, 2, 8, 64)
    with pytest.raises(ValueError, match="key_pos"):
        paged_decode_attention(q, pool8, tbl, kp[:, :8], qp)
    with pytest.raises(ValueError, match="not a multiple"):
        paged_decode_attention(jnp.zeros((1, 3, 1, 64)), pool8, tbl,
                               jnp.zeros((1, 16), jnp.int32), qp)


# -- serving integration ---------------------------------------------


def _trained_model(window=None, rope=False, vocab=32, seed=0):
    model = eg.compile(
        flash_transformer(vocab=vocab, dim=16, heads=2, max_seq=64,
                          window=window, rope=rope),
        backend="jax", seed=seed,
    )
    rng = np.random.default_rng(seed)
    toks = rng.integers(0, vocab, (4, 16)).astype(np.float32)
    labels = eg.one_hot(rng.integers(0, vocab, 64), vocab).reshape(
        4, 16, vocab)
    for _ in range(3):
        model.epoch += 1
        model.apply("train", {"tokens": toks, "labels": labels})
    return model


def _solo(server, prompts, max_new):
    return [np.asarray(server.generate(p[None, :], n_new=mn))[0]
            for p, mn in zip(prompts, max_new)]


def test_flash_batcher_matches_solo():
    """attention='flash' greedy outputs stay token-equal to solo dense
    serving through slot reuse and page recycling."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(21)
    prompts = [rng.integers(0, 32, n).astype(np.float32)
               for n in (5, 9, 3, 13)]
    max_new = [6, 4, 8, 5]
    solo = _solo(srv, prompts, max_new)
    b = ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                          page_size=8, attention="flash")
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))
    assert b.stats["free_pages"] == b.stats["pool_pages"]


def test_flash_batcher_int8_window_rope():
    """The kernel path composes with int8 pools, sliding windows and
    rotary positions exactly like the gather path."""
    import jax.numpy as jnp

    srv = FlashLMServer(_trained_model(window=8, rope=True),
                        cache_dtype=jnp.int8)
    rng = np.random.default_rng(22)
    prompts = [rng.integers(0, 32, n).astype(np.float32) for n in (11, 6)]
    max_new = [5, 7]
    solo = _solo(srv, prompts, max_new)
    b = ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                          page_size=8, attention="flash")
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))


def test_flash_batcher_decode_chunk():
    """Multi-step scheduling (lax.scan over decode steps) traces the
    kernel once per chunk program and stays token-exact."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(23)
    prompts = [rng.integers(0, 32, n).astype(np.float32) for n in (7, 4)]
    max_new = [9, 6]
    solo = _solo(srv, prompts, max_new)
    b = ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                          page_size=8, decode_chunk=4, attention="flash")
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))


def test_flash_batcher_speculative():
    """The spec round's k+1-wide verify goes through the kernel's t>1
    path; greedy speculative streams stay exact."""
    target = FlashLMServer(_trained_model(seed=0))
    draft = FlashLMServer(_trained_model(seed=7))
    rng = np.random.default_rng(24)
    prompts = [rng.integers(0, 32, n).astype(np.float32) for n in (6, 9)]
    max_new = [7, 5]
    solo = _solo(target, prompts, max_new)
    b = ContinuousBatcher(target, slots=2, capacity=64, paged=True,
                          page_size=8, draft=draft, spec_k=3,
                          attention="flash")
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))


def test_flash_option_validation():
    srv = FlashLMServer(_trained_model())
    with pytest.raises(ModelRuntimeError, match="paged"):
        ContinuousBatcher(srv, slots=2, capacity=64, attention="flash")
    with pytest.raises(ModelRuntimeError, match="multiple of 8"):
        ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                          page_size=4, attention="flash")
    with pytest.raises(ModelRuntimeError, match="attention"):
        ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                          page_size=8, attention="bogus")
