"""Continuous batching (models/batcher.py): iteration-level scheduling
over FlashLMServer with per-row cache cursors.

Oracle: greedy outputs must be BIT-EQUAL to serving each prompt alone
with server.generate — through slot reuse, staggered submission,
prompt-width buckets, int8 caches, and sliding windows.
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


def _prompts(rng, sizes, vocab=32):
    return [rng.integers(0, vocab, n).astype(np.float32) for n in sizes]


def _solo(server, prompts, max_new):
    return [np.asarray(server.generate(p[None, :], n_new=mn))[0]
            for p, mn in zip(prompts, max_new)]


def test_greedy_equals_solo_with_slot_reuse():
    """More requests than slots: outputs stay bit-equal to solo serving
    while slots are reused across requests."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(1)
    prompts = _prompts(rng, (5, 9, 3, 12, 7))
    max_new = [6, 4, 8, 3, 5]
    solo = _solo(srv, prompts, max_new)

    b = ContinuousBatcher(srv, slots=2, capacity=64)
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    assert len(done) == len(rids)
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))
    # batching actually batched: all five requests in far fewer decode
    # iterations than serving them one after another would take
    assert b.stats["decode_steps"] < sum(max_new)


def test_staggered_submission_mid_flight():
    """Requests submitted while others decode still match solo outputs —
    admission into freed slots cannot perturb resident sequences."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(2)
    prompts = _prompts(rng, (4, 11, 6))
    max_new = [10, 5, 7]
    solo = _solo(srv, prompts, max_new)

    b = ContinuousBatcher(srv, slots=2, capacity=64)
    r0 = b.submit(prompts[0], max_new[0])
    out = {}
    for _ in range(3):
        for rid, toks in b.step():
            out[rid] = toks
    r1 = b.submit(prompts[1], max_new[1])
    for _ in range(2):
        for rid, toks in b.step():
            out[rid] = toks
    r2 = b.submit(prompts[2], max_new[2])
    out.update(b.run())
    for rid, ref in zip((r0, r1, r2), solo):
        np.testing.assert_array_equal(out[rid], ref.astype(np.int64))


def test_stop_token_frees_slot_early():
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(3)
    prompts = _prompts(rng, (5, 7))
    # discover each prompt's greedy stream, pick a token from it as stop
    ref = _solo(srv, prompts, [12, 12])
    stop = int(ref[0][2])  # appears at index 2 of request 0's stream
    b = ContinuousBatcher(srv, slots=2, capacity=64, stop_token=stop)
    rids = [b.submit(p, 12) for p in prompts]
    done = b.run()
    got0 = done[rids[0]]
    # truncated at (and including) the stop token
    assert got0[-1] == stop
    assert len(got0) <= 12
    np.testing.assert_array_equal(
        got0, ref[0][:len(got0)].astype(np.int64))
    # request 1: identical stream up to ITS stop/stream end
    got1 = done[rids[1]]
    np.testing.assert_array_equal(
        got1, ref[1][:len(got1)].astype(np.int64))


def test_int8_cache_parity():
    """Per-row int8 quantization (append_at) matches the solo int8 path
    bit for bit under greedy decoding."""
    import jax.numpy as jnp

    srv = FlashLMServer(_trained_model(), cache_dtype=jnp.int8)
    rng = np.random.default_rng(4)
    prompts = _prompts(rng, (6, 10))
    max_new = [5, 5]
    solo = _solo(srv, prompts, max_new)
    b = ContinuousBatcher(srv, slots=2, capacity=64)
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))


def test_window_and_rope_parity():
    """Sliding-window + rotary models serve identically through the
    batcher (positions ride q_pos/key_pos, not slot indices)."""
    srv = FlashLMServer(_trained_model(window=8, rope=True))
    rng = np.random.default_rng(5)
    prompts = _prompts(rng, (14, 4))
    max_new = [6, 9]
    solo = _solo(srv, prompts, max_new)
    b = ContinuousBatcher(srv, slots=2, capacity=64)
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))


def test_sampled_decoding_is_well_formed():
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(6)
    prompts = _prompts(rng, (5, 8, 3))
    b = ContinuousBatcher(srv, slots=2, capacity=64, temperature=0.8,
                          top_k=8, top_p=0.9, seed=7)
    rids = [b.submit(p, 6) for p in prompts]
    done = b.run()
    for rid in rids:
        toks = done[rid]
        assert toks.shape == (6,)
        assert toks.min() >= 0 and toks.max() < 32


def test_submit_validation():
    srv = FlashLMServer(_trained_model())
    b = ContinuousBatcher(srv, slots=2, capacity=32)
    with pytest.raises(ModelRuntimeError, match="empty"):
        b.submit([], 4)
    with pytest.raises(ModelRuntimeError, match="max_new"):
        b.submit([1.0], 0)
    with pytest.raises(ModelRuntimeError, match="capacity"):
        b.submit(np.zeros(20), 20)  # 20 + 20 - 1 > 32


def test_append_at_matches_per_row_appends():
    """ops.decode.append_at == appending to each row's own cache."""
    import jax.numpy as jnp

    from exprgrad_tpu.ops.decode import append, append_at, init_cache

    rng = np.random.default_rng(8)
    b, hkv, cap, d, t = 3, 2, 16, 4, 2
    for dtype in (jnp.bfloat16, jnp.int8):
        big = init_cache(b, hkv, cap, d, dtype=dtype)
        k_new = jnp.asarray(rng.standard_normal((b, hkv, t, d)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((b, hkv, t, d)), jnp.float32)
        starts = jnp.asarray([0, 5, 9], jnp.int32)
        got = append_at(big, k_new, v_new, starts)
        for row in range(b):
            solo = init_cache(1, hkv, cap, d, dtype=dtype)
            # position the row's own cursor, then append
            solo = solo._replace(length=starts[row])
            solo = append(solo, k_new[row:row + 1], v_new[row:row + 1])
            np.testing.assert_array_equal(
                np.asarray(got.k[row]), np.asarray(solo.k[0]))
            np.testing.assert_array_equal(
                np.asarray(got.v[row]), np.asarray(solo.v[0]))
            if dtype == jnp.int8:
                np.testing.assert_array_equal(
                    np.asarray(got.k_scale[row]),
                    np.asarray(solo.k_scale[0]))


# --- paged KV cache -------------------------------------------------------

def test_paged_matches_solo_and_recycles_pages():
    """Paged attention (shared page pool + page tables): greedy outputs
    bit-equal to solo serving; every page returns to the free list."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(9)
    prompts = _prompts(rng, (5, 9, 3, 13))
    max_new = [6, 4, 8, 5]
    solo = _solo(srv, prompts, max_new)
    b = ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                          page_size=4)
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))
    assert b.stats["free_pages"] == b.stats["pool_pages"]


def test_paged_preemption_recompute_is_exact():
    """A pool too small for both residents forces recompute preemption;
    the victim's regenerated stream is identical (greedy determinism)."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(10)
    prompts = _prompts(rng, (9, 8))
    max_new = [8, 8]
    solo = _solo(srv, prompts, max_new)
    # each request needs ceil((9+8-1)/4) = 4 pages; pool of 5 cannot
    # hold both fully -> preemption must fire
    b = ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                          page_size=4, pool_pages=5)
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    assert b.stats["preemptions"] > 0
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))


def test_paged_int8_window_rope():
    """Paged pools compose with int8 quantization and window+rope
    models (scales ride the pages; positions ride q_pos/key_pos)."""
    import jax.numpy as jnp

    srv = FlashLMServer(_trained_model(window=8, rope=True),
                        cache_dtype=jnp.int8)
    rng = np.random.default_rng(11)
    prompts = _prompts(rng, (11, 6))
    max_new = [5, 7]
    solo = _solo(srv, prompts, max_new)
    b = ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                          page_size=8)
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))


def test_paged_submit_rejects_oversized_request():
    srv = FlashLMServer(_trained_model())
    b = ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                          page_size=4, pool_pages=3)
    with pytest.raises(ModelRuntimeError, match="pool"):
        b.submit(np.zeros(10), 10)  # needs ceil(19/4)=5 > 3 pages


# --- prefix caching -------------------------------------------------------

def test_prefix_caching_matches_solo():
    """Registered prefixes: matching prompts reuse pinned K/V pages and
    still emit solo-identical greedy streams; non-matching prompts are
    untouched; release returns the pinned pages."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(12)
    system = rng.integers(0, 32, 19).astype(np.float32)
    withpre = [np.concatenate([system, p])
               for p in _prompts(rng, (5, 9))]
    plain = _prompts(rng, (6,))
    prompts = withpre + plain
    max_new = [6, 4, 7]
    solo = _solo(srv, prompts, max_new)

    b = ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                          page_size=8)
    cached = b.register_prefix(system)
    assert cached == 16  # page-aligned down from 19
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))
    assert b.stats["prefix_hits"] == 2
    assert b.stats["free_pages"] == b.stats["pool_pages"] - cached // 8
    b.release_prefix(system)
    assert b.stats["free_pages"] == b.stats["pool_pages"]


def test_prefix_with_preemption_recompute():
    """A preempted prefix-sharing request re-matches the prefix on
    readmission and still reproduces the solo stream."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(13)
    system = rng.integers(0, 32, 16).astype(np.float32)
    prompts = [np.concatenate([system, p])
               for p in _prompts(rng, (6, 5))]
    max_new = [8, 8]
    solo = _solo(srv, prompts, max_new)
    # own-page demand: ceil((22+8-1-16)/4) = 4 pages each; prefix 4
    # pages; pool 4 + 6 makes the second resident preempt the first
    b = ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                          page_size=4, pool_pages=10)
    b.register_prefix(system)
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))
    assert b.stats["prefix_hits"] >= 2  # re-matched after any preempt


def test_prefix_int8_pool():
    import jax.numpy as jnp

    srv = FlashLMServer(_trained_model(), cache_dtype=jnp.int8)
    rng = np.random.default_rng(14)
    system = rng.integers(0, 32, 16).astype(np.float32)
    prompts = [np.concatenate([system, p]) for p in _prompts(rng, (4, 7))]
    max_new = [5, 5]
    solo = _solo(srv, prompts, max_new)
    b = ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                          page_size=8)
    b.register_prefix(system)
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))
    assert b.stats["prefix_hits"] == 2


def test_prefix_validation():
    srv = FlashLMServer(_trained_model())
    dense = ContinuousBatcher(srv, slots=2, capacity=64)
    with pytest.raises(ModelRuntimeError, match="paged"):
        dense.register_prefix(np.zeros(16))
    b = ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                          page_size=8)
    with pytest.raises(ModelRuntimeError, match="page"):
        b.register_prefix(np.zeros(5))   # shorter than one page
    with pytest.raises(ModelRuntimeError, match="not registered"):
        b.release_prefix(np.zeros(16))
    # releasing while a matching request is resident fails
    rng = np.random.default_rng(15)
    system = rng.integers(0, 32, 8).astype(np.float32)
    b.register_prefix(system)
    b.submit(np.concatenate([system, np.asarray([1.0, 2.0])]), 12)
    b.step()  # admit (request stays resident, budget not exhausted)
    with pytest.raises(ModelRuntimeError, match="in use"):
        b.release_prefix(system)
    b.run()
    b.release_prefix(system)  # fine once drained


# --- multi-step scheduling (decode_chunk) --------------------------------

@pytest.mark.parametrize("paged", [False, True])
def test_chunked_decode_matches_solo(paged):
    """decode_chunk scans N steps per dispatch (multi-step scheduling):
    same greedy streams, ~N-fold fewer dispatches."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(16)
    prompts = _prompts(rng, (5, 9, 3, 12))
    max_new = [6, 4, 8, 5]
    solo = _solo(srv, prompts, max_new)
    kw = dict(paged=True, page_size=4) if paged else {}
    b = ContinuousBatcher(srv, slots=2, capacity=64, decode_chunk=4, **kw)
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))
    assert b.stats["dispatches"] * 4 == b.stats["decode_steps"]
    if paged:
        assert b.stats["free_pages"] == b.stats["pool_pages"]


def test_chunked_with_prefix_and_tight_pool():
    """Chunked decode composes with prefix caching and preemption."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(17)
    system = rng.integers(0, 32, 16).astype(np.float32)
    prompts = [np.concatenate([system, p]) for p in _prompts(rng, (6, 5))]
    max_new = [8, 8]
    solo = _solo(srv, prompts, max_new)
    b = ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                          page_size=4, pool_pages=10, decode_chunk=3)
    b.register_prefix(system)
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))


def test_chunked_stop_token():
    """Stop tokens fire mid-chunk: surplus chunk tokens are discarded
    and the slot frees for the queue."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(18)
    prompts = _prompts(rng, (5, 7, 4))
    ref = _solo(srv, prompts, [12, 12, 12])
    stop = int(ref[0][2])
    b = ContinuousBatcher(srv, slots=2, capacity=64, stop_token=stop,
                          decode_chunk=5)
    rids = [b.submit(p, 12) for p in prompts]
    done = b.run()
    for rid, r in zip(rids, ref):
        got = done[rid]
        if stop in r[:len(got)].astype(np.int64):
            assert got[-1] == stop
        np.testing.assert_array_equal(got, r[:len(got)].astype(np.int64))


# --- pipelined chunked decode (pipeline=) ---------------------------------

@pytest.mark.parametrize("paged", [False, True])
def test_pipelined_decode_matches_solo(paged):
    """pipeline=2 keeps extra chunk dispatches in flight chained on the
    chunk program's device-side (tok, pos); greedy streams stay
    bit-equal through slot reuse and the quarantined releases."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(26)
    prompts = _prompts(rng, (5, 9, 3, 12, 6))
    max_new = [6, 14, 8, 5, 11]
    solo = _solo(srv, prompts, max_new)
    kw = dict(paged=True, page_size=4) if paged else {}
    b = ContinuousBatcher(srv, slots=2, capacity=64, decode_chunk=4,
                          pipeline=2, **kw)
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))
    if paged:
        assert b.stats["free_pages"] == b.stats["pool_pages"]


def test_pipelined_stop_token_mid_chunk():
    """A stop token firing while later chunks are in flight: surplus
    tokens (including whole speculative chunks) are discarded, the slot
    releases only after the pipe drains, and the queue refills it."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(27)
    prompts = _prompts(rng, (5, 7, 4, 8))
    ref = _solo(srv, prompts, [12, 12, 12, 12])
    stop = int(ref[0][2])
    b = ContinuousBatcher(srv, slots=2, capacity=64, stop_token=stop,
                          decode_chunk=3, pipeline=3, paged=True,
                          page_size=4)
    rids = [b.submit(p, 12) for p in prompts]
    done = b.run()
    for rid, r in zip(rids, ref):
        got = done[rid]
        if stop in r[:len(got)].astype(np.int64):
            assert got[-1] == stop
        np.testing.assert_array_equal(got, r[:len(got)].astype(np.int64))
    assert b.stats["free_pages"] == b.stats["pool_pages"]


def test_pipelined_tight_pool_falls_back():
    """When the page pool cannot cover a speculative chunk span without
    preempting, issuing stops and the sequential path (which may
    preempt) takes over — streams stay exact."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(28)
    prompts = _prompts(rng, (6, 5, 7))
    max_new = [10, 9, 8]
    solo = _solo(srv, prompts, max_new)
    b = ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                          page_size=4, pool_pages=9, decode_chunk=4,
                          pipeline=2)
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))
    assert b.stats["free_pages"] == b.stats["pool_pages"]


def test_pipelined_cancel_mid_flight():
    """cancel() of a resident slot with dispatches in flight drains the
    pipe first (no in-flight writer may touch freed pages); surviving
    requests still match solo."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(29)
    prompts = _prompts(rng, (5, 8))
    solo = _solo(srv, prompts, [20, 20])
    b = ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                          page_size=4, decode_chunk=4, pipeline=2)
    r0 = b.submit(prompts[0], 20)
    r1 = b.submit(prompts[1], 20)
    out = {}
    for _ in range(2):
        for rid, toks in b.step():
            out[rid] = toks
    assert b._pipe  # dispatches actually in flight
    assert b.cancel(r0)
    out.update(b.run())
    assert r0 not in out
    np.testing.assert_array_equal(out[r1], solo[1].astype(np.int64))
    assert b.stats["free_pages"] == b.stats["pool_pages"]


def test_pipelined_admission_waits_for_drain():
    """A submission arriving mid-pipeline drains before admission: the
    newly admitted request still matches solo exactly."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(30)
    prompts = _prompts(rng, (4, 6, 9))
    max_new = [8, 18, 7]
    solo = _solo(srv, prompts, max_new)
    b = ContinuousBatcher(srv, slots=2, capacity=64, decode_chunk=3,
                          pipeline=2)
    r0 = b.submit(prompts[0], max_new[0])
    r1 = b.submit(prompts[1], max_new[1])
    out = {}
    for _ in range(2):
        for rid, toks in b.step():
            out[rid] = toks
    r2 = b.submit(prompts[2], max_new[2])
    out.update(b.run())
    for rid, ref in zip((r0, r1, r2), solo):
        np.testing.assert_array_equal(out[rid], ref.astype(np.int64))


def test_pipeline_validation():
    srv = FlashLMServer(_trained_model())
    with pytest.raises(ModelRuntimeError, match="pipeline"):
        ContinuousBatcher(srv, pipeline=-1, decode_chunk=4)
    with pytest.raises(ModelRuntimeError, match="decode_chunk"):
        ContinuousBatcher(srv, pipeline=2)


# --- chunked prefill + scheduler-policy regressions ----------------------

def test_tight_pool_no_admission_thrash():
    """Regression: admission must WAIT for pages, not steal them from
    decoders (livelock), and repeated preemption must not duplicate
    absorbed output tokens into the continuation prompt (footprint
    inflation).  Two 4-page requests on a 5-page pool used to thrash to
    an 'exhausted' error; they must now finish with solo streams."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(10)
    prompts = _prompts(rng, (9, 8))
    solo = _solo(srv, prompts, [8, 8])
    b = ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                          page_size=4, pool_pages=5)
    rids = [b.submit(p, 8) for p in prompts]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))
    assert b.stats["free_pages"] == b.stats["pool_pages"]


@pytest.mark.parametrize("chunk", [8, 16])
def test_chunked_prefill_matches_solo(chunk):
    """prefill_chunk splits long-prompt admission into page-aligned
    chunk dispatches interleaved with decode steps; streams unchanged."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(19)
    prompts = _prompts(rng, (37, 6, 23))
    max_new = [5, 9, 7]
    solo = _solo(srv, prompts, max_new)
    b = ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                          page_size=4, prefill_chunk=chunk)
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))
    assert b.stats["free_pages"] == b.stats["pool_pages"]


def test_chunked_prefill_with_prefix_and_decode_chunk():
    """The full scheduler: pinned prefix + chunked prefill of the rest
    + multi-step decode, on a tight pool."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(20)
    system = rng.integers(0, 32, 16).astype(np.float32)
    prompts = [np.concatenate([system, p])
               for p in _prompts(rng, (21, 9))]
    max_new = [6, 8]
    solo = _solo(srv, prompts, max_new)
    b = ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                          page_size=4, prefill_chunk=8, decode_chunk=3,
                          pool_pages=12)
    b.register_prefix(system)
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))


def test_prefill_chunk_validation():
    srv = FlashLMServer(_trained_model())
    with pytest.raises(ModelRuntimeError, match="paged"):
        ContinuousBatcher(srv, slots=2, capacity=64, prefill_chunk=8)
    with pytest.raises(ModelRuntimeError, match="multiple"):
        ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                          page_size=4, prefill_chunk=6)


# --- review-pass regressions ---------------------------------------------

def test_rope_models_validate_max_seq():
    """Rope models (no pos table) must get the same length validation
    solo generate enforces."""
    srv = FlashLMServer(_trained_model(rope=True))
    with pytest.raises(ModelRuntimeError, match="max_seq"):
        ContinuousBatcher(srv, slots=2, capacity=srv.max_seq + 1)
    b = ContinuousBatcher(srv, slots=2, capacity=64)
    with pytest.raises(ModelRuntimeError, match="capacity|max_seq"):
        b.submit(np.zeros(40), 40)  # 40 + 40 - 1 > 64


def test_oversized_user_bucket_is_clamped():
    """A bucket wider than the cache must clamp, not crash admission."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(21)
    p = rng.integers(0, 32, 5).astype(np.float32)
    ref = np.asarray(srv.generate(p[None], n_new=4))[0]
    b = ContinuousBatcher(srv, slots=2, capacity=64,
                          prompt_buckets=(100,))
    rid = b.submit(p, 4)
    np.testing.assert_array_equal(b.run()[rid], ref.astype(np.int64))
    with pytest.raises(ModelRuntimeError, match="bucket"):
        ContinuousBatcher(srv, slots=2, capacity=64, prompt_buckets=(0,))


def test_release_prefix_requires_paged():
    srv = FlashLMServer(_trained_model())
    b = ContinuousBatcher(srv, slots=2, capacity=64)
    with pytest.raises(ModelRuntimeError, match="paged"):
        b.release_prefix(np.zeros(16))


def test_pinned_pages_count_against_feasibility():
    """A prefix pin shrinks the pool for NON-matching requests; matching
    requests still fit because their reuse is counted."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(22)
    system = rng.integers(0, 32, 16).astype(np.float32)
    b = ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                          page_size=4, pool_pages=10)
    b.register_prefix(system)   # pins 4 pages -> 6 unpinned
    # non-matching: needs ceil((20+10-1)/4) = 8 own pages > 6 -> reject
    with pytest.raises(ModelRuntimeError, match="unpinned"):
        b.submit(rng.integers(0, 32, 20).astype(np.float32), 10)
    # matching: needs 8 - 4 shared = 4 own pages -> accepted and correct
    p = np.concatenate([system, rng.integers(0, 32, 4).astype(np.float32)])
    ref = np.asarray(srv.generate(p[None], n_new=10))[0]
    rid = b.submit(p, 10)
    np.testing.assert_array_equal(b.run()[rid], ref.astype(np.int64))
    # registering a prefix that would strand a queued request is refused
    rid2 = b.submit(p, 10)
    big = rng.integers(0, 32, 24).astype(np.float32)
    with pytest.raises(ModelRuntimeError, match="unpinned pages"):
        b.register_prefix(big)  # +6 pages would leave 0 unpinned
    b.run()


def test_jit_closures_do_not_pin_the_batcher():
    """Jitted scheduler programs live in the server's shared JitCache;
    they must not capture the batcher (its KV pools would leak)."""
    import gc
    import weakref

    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(23)
    for attention in ("gather", "flash"):
        b = ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                              page_size=8, decode_chunk=2,
                              prefill_chunk=8, attention=attention)
        rid = b.submit(rng.integers(0, 32, 20).astype(np.float32), 5)
        b.run()
        ref = weakref.ref(b)
        del b
        gc.collect()
        assert ref() is None, (
            f"a jitted closure still references the batcher ({attention})")


# --- metrics + mesh composition ------------------------------------------

def test_request_metrics():
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(24)
    prompts = _prompts(rng, (5, 9))
    b = ContinuousBatcher(srv, slots=2, capacity=64)
    rids = [b.submit(p, 6) for p in prompts]
    b.run()
    m = b.request_metrics()
    assert sorted(r["rid"] for r in m) == sorted(rids)
    for r in m:
        assert r["generated_tokens"] == 6
        assert r["prompt_tokens"] in (5, 9)
        assert 0 < r["ttft_s"] <= r["latency_s"]
        assert r["preemptions"] == 0
    assert b.request_metrics(reset=True) and not b.request_metrics()


def test_batcher_over_tensor_parallel_mesh():
    """The scheduler composes with mesh tensor-parallel serving: a
    sharded server under the batcher still emits solo streams."""
    from exprgrad_tpu.parallel import make_mesh

    model = _trained_model()
    solo = FlashLMServer(model)
    tp = FlashLMServer(model, mesh=make_mesh(8, model=2))
    rng = np.random.default_rng(25)
    prompts = _prompts(rng, (5, 9, 3))
    max_new = [6, 4, 8]
    refs = _solo(solo, prompts, max_new)
    b = ContinuousBatcher(tp, slots=2, capacity=64, paged=True,
                          page_size=8, decode_chunk=2)
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    for rid, ref in zip(rids, refs):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))


def test_cancel():
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(26)
    prompts = _prompts(rng, (5, 9, 3))
    ref2 = np.asarray(srv.generate(prompts[2][None], n_new=8))[0]
    b = ContinuousBatcher(srv, slots=1, capacity=64, paged=True,
                          page_size=8)
    r0 = b.submit(prompts[0], 6)
    r1 = b.submit(prompts[1], 40)
    r2 = b.submit(prompts[2], 8)
    b.step()                      # r0 resident
    assert b.cancel(r0)           # cancel the RESIDENT request
    assert b.cancel(r1)           # cancel a QUEUED request
    assert not b.cancel(12345)    # unknown id
    done = b.run()                # only r2 remains and completes
    assert set(done) == {r2}
    np.testing.assert_array_equal(done[r2], ref2.astype(np.int64))
    assert b.stats["free_pages"] == b.stats["pool_pages"]
    assert not b.cancel(r2)       # finished: nothing to cancel


# --- speculative continuous batching -------------------------------------

def _draft_server(vocab=32, seed=0):
    model = eg.compile(
        flash_transformer(vocab=vocab, dim=16, heads=2, max_seq=64),
        backend="jax", seed=seed,
    )
    rng = np.random.default_rng(seed)
    toks = rng.integers(0, vocab, (4, 16)).astype(np.float32)
    labels = eg.one_hot(rng.integers(0, vocab, 64), vocab).reshape(
        4, 16, vocab)
    for _ in range(3):
        model.epoch += 1
        model.apply("train", {"tokens": toks, "labels": labels})
    return FlashLMServer(model)


@pytest.mark.parametrize("paged", [False, True])
def test_speculative_batching_exact(paged):
    """Draft proposes, target verifies, per-row acceptance — every
    stream bit-equal to solo target greedy, through slot reuse."""
    target = FlashLMServer(_trained_model())
    draft = _draft_server(seed=0)  # same data: correlated but imperfect
    rng = np.random.default_rng(27)
    prompts = _prompts(rng, (5, 9, 3, 12))
    max_new = [8, 5, 10, 6]
    solo = _solo(target, prompts, max_new)
    kw = dict(paged=True, page_size=8) if paged else {}
    b = ContinuousBatcher(target, slots=2, capacity=64, draft=draft,
                          spec_k=3, **kw)
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))
    assert b.stats["spec_rounds"] == b.stats["dispatches"]
    if paged:
        assert b.stats["free_pages"] == b.stats["pool_pages"]


def test_speculative_perfect_draft_accepts_everything():
    """Draft == target: every proposal accepted, so each round emits
    spec_k+1 tokens (pins the all-accepted draft-cache-hole fix)."""
    target = FlashLMServer(_trained_model())
    rng = np.random.default_rng(28)
    prompts = _prompts(rng, (6, 9))
    max_new = [9, 9]
    solo = _solo(target, prompts, max_new)
    b = ContinuousBatcher(target, slots=2, capacity=64, draft=target,
                          spec_k=2)
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))
    # 8 post-admission tokens per request at 3/round -> 3 rounds each,
    # run concurrently: exactly ceil(8/3) = 3 rounds total
    assert b.stats["spec_rounds"] == 3
    assert b.stats["spec_emitted"] == 16


def test_speculative_with_prefix_and_stop():
    target = FlashLMServer(_trained_model())
    draft = _draft_server(seed=0)
    rng = np.random.default_rng(29)
    system = rng.integers(0, 32, 16).astype(np.float32)
    prompts = [np.concatenate([system, p]) for p in _prompts(rng, (6, 4))]
    ref = _solo(target, prompts, [12, 12])
    stop = int(ref[0][3])
    b = ContinuousBatcher(target, slots=2, capacity=64, draft=draft,
                          spec_k=4, paged=True, page_size=8,
                          stop_token=stop)
    b.register_prefix(system)
    rids = [b.submit(p, 12) for p in prompts]
    done = b.run()
    for rid, r in zip(rids, ref):
        got = done[rid]
        np.testing.assert_array_equal(got, r[:len(got)].astype(np.int64))
        r64 = r.astype(np.int64)
        if stop in r64:
            assert got[-1] == stop and len(got) == list(r64).index(stop) + 1


def test_speculative_validation():
    target = FlashLMServer(_trained_model())
    draft = _draft_server(seed=0)
    with pytest.raises(ModelRuntimeError, match="top_k|rejection"):
        ContinuousBatcher(target, slots=2, capacity=64, draft=draft,
                          temperature=0.5, top_k=4)
    with pytest.raises(ModelRuntimeError, match="decode_chunk"):
        ContinuousBatcher(target, slots=2, capacity=64, draft=draft,
                          decode_chunk=4)
    other = _draft_server(vocab=16, seed=1)
    with pytest.raises(ModelRuntimeError, match="vocab"):
        ContinuousBatcher(target, slots=2, capacity=64, draft=other)
    b = ContinuousBatcher(target, slots=2, capacity=64, draft=draft,
                          spec_k=4)
    with pytest.raises(ModelRuntimeError, match="capacity"):
        b.submit(np.zeros(30), 32)  # 30+32-1+4 > 64


def test_token_streaming():
    """drain_tokens() delivers every token in emission order; the
    concatenation per request equals the final result."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(30)
    prompts = _prompts(rng, (5, 9, 3))
    b = ContinuousBatcher(srv, slots=2, capacity=64, stream_tokens=True,
                          paged=True, page_size=8)
    rids = [b.submit(p, 7) for p in prompts]
    streamed = {rid: [] for rid in rids}
    done = {}
    while len(done) < 3:
        for rid, toks in b.step():
            done[rid] = toks
        for rid, tok in b.drain_tokens():
            streamed[rid].append(tok)
    for rid in rids:
        np.testing.assert_array_equal(
            np.asarray(streamed[rid], np.int64), done[rid])
    assert not b.drain_tokens()
    plain = ContinuousBatcher(srv, slots=2, capacity=64)
    with pytest.raises(ModelRuntimeError, match="stream"):
        plain.drain_tokens()


def test_spec_margin_counts_in_paged_feasibility():
    """Regression: the paged own-pages bound must include the spec_k
    write margin, and the draft's max_seq must cover capacity."""
    target = FlashLMServer(_trained_model())
    draft = _draft_server(seed=0)
    b = ContinuousBatcher(target, slots=2, capacity=64, paged=True,
                          page_size=16, pool_pages=2, draft=draft,
                          spec_k=4)
    # need = 20 + 13 - 1 + 4 = 36 rows -> 3 pages > 2-page pool
    with pytest.raises(ModelRuntimeError, match="unpinned"):
        b.submit(np.zeros(20), 13)
    # draft with smaller max_seq than capacity must be rejected
    short = eg.compile(
        flash_transformer(vocab=32, dim=16, heads=2, max_seq=32),
        backend="jax", seed=2,
    )
    with pytest.raises(ModelRuntimeError, match="DRAFT"):
        ContinuousBatcher(target, slots=2, capacity=64,
                          draft=FlashLMServer(short), spec_k=4)


def test_window_page_eviction_bounds_cache_memory():
    """Sliding-window models release pages behind the attention band:
    resident pages per slot stay O(window) while streams remain solo-
    identical — including under speculative decoding."""
    srv = FlashLMServer(_trained_model(window=8))
    rng = np.random.default_rng(31)
    prompts = _prompts(rng, (20, 6))
    max_new = [30, 40]
    solo = _solo(srv, prompts, max_new)
    b = ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                          page_size=4)
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    peak = 0
    done = {}
    while len(done) < 2:
        for rid, toks in b.step():
            done[rid] = toks
        peak = max(peak, max(
            sum(1 for p in b.slot_pages[s] if p) for s in range(2)))
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))
    assert b.stats["window_evicted"] > 0
    # band of 8 tokens = 2 pages, +1 boundary, +1 write-ahead
    assert peak <= 4, peak
    assert b.stats["free_pages"] == b.stats["pool_pages"]

    # speculative rounds evict identically
    draft = _draft_server(seed=0)
    b2 = ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                           page_size=4, draft=draft, spec_k=3)
    rids2 = [b2.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done2 = b2.run()
    for rid, ref in zip(rids2, solo):
        np.testing.assert_array_equal(done2[rid], ref.astype(np.int64))
    assert b2.stats["window_evicted"] > 0
    assert b2.stats["free_pages"] == b2.stats["pool_pages"]


def test_window_continuation_survives_tight_pool():
    """Regression: a preempted window-model request's continuation
    prompt grows past the original prompt; admission must not burst
    past the windowed feasibility bound (window models admit in
    band-sized chunks with between-chunk eviction).  Long budgets on a
    pool far below the dense footprint must finish with solo streams."""
    srv = FlashLMServer(_trained_model(window=8))
    rng = np.random.default_rng(32)
    prompts = _prompts(rng, (6, 9))
    max_new = [40, 35]
    solo = _solo(srv, prompts, max_new)
    # dense footprint would be ceil(45/4)+ceil(43/4) = 23 pages
    b = ContinuousBatcher(srv, slots=2, capacity=64, paged=True,
                          page_size=4, pool_pages=9)
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))
    assert b.stats["window_evicted"] > 0
    assert b.stats["free_pages"] == b.stats["pool_pages"]


def test_sampled_speculative_distribution_matches_plain():
    """Sampled spec rounds implement the exact rejection scheme: over
    many seeds, the batcher's first-two-token distribution must match
    plain temperature sampling on the target (solo _spec.py guarantee,
    batched)."""
    target = FlashLMServer(_trained_model(vocab=8))
    draft = _draft_server(vocab=8, seed=1)
    rng = np.random.default_rng(33)
    prompt = rng.integers(0, 8, 5).astype(np.float32)
    n_seeds, temp = 400, 1.0

    def freqs(gen):
        counts = {}
        for s in range(n_seeds):
            pair = tuple(gen(s))
            counts[pair] = counts.get(pair, 0) + 1
        return {k: v / n_seeds for k, v in counts.items()}

    plain = freqs(lambda s: np.asarray(
        target.generate(prompt[None], n_new=2, temperature=temp,
                        seed=s))[0].astype(int))

    def spec(s):
        b = ContinuousBatcher(target, slots=1, capacity=64, draft=draft,
                              spec_k=2, temperature=temp, seed=s)
        rid = b.submit(prompt, 2)
        return b.run()[rid][:2]

    specf = freqs(spec)
    keys = set(plain) | set(specf)
    l1 = sum(abs(plain.get(k, 0.0) - specf.get(k, 0.0)) for k in keys)
    # L1 distance between two 400-sample empiricals of the SAME
    # distribution concentrates around ~0.4 here (64 outcomes); a wrong
    # scheme (e.g. skipping the correction sample) lands far above
    assert l1 < 0.7, (l1, sorted(plain.items())[:5],
                      sorted(specf.items())[:5])


def test_per_request_sampling_params():
    """One compiled program serves a MIX of per-request sampling
    configs: a greedy row, a top_k=1 row (== greedy), and sampled rows
    with their own temperature/top_p — all concurrent."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(34)
    prompts = _prompts(rng, (5, 7, 9, 4))
    refs = _solo(srv, prompts[:2], [6, 6])
    b = ContinuousBatcher(srv, slots=4, capacity=64, paged=True,
                          page_size=8, seed=3)
    r_greedy = b.submit(prompts[0], 6)                      # default greedy
    r_k1 = b.submit(prompts[1], 6, temperature=0.9, top_k=1)  # == greedy
    r_hot = b.submit(prompts[2], 6, temperature=1.2, top_p=0.9)
    r_warm = b.submit(prompts[3], 6, temperature=0.6, top_k=5)
    done = b.run()
    np.testing.assert_array_equal(done[r_greedy],
                                  refs[0].astype(np.int64))
    np.testing.assert_array_equal(done[r_k1], refs[1].astype(np.int64))
    for rid in (r_hot, r_warm):
        toks = done[rid]
        assert toks.shape == (6,)
        assert toks.min() >= 0 and toks.max() < 32
    # the jit cache gained no per-config entries: same fns serve all
    n_entries = len(srv._jit_cache)
    b2 = ContinuousBatcher(srv, slots=4, capacity=64, paged=True,
                           page_size=8, seed=4, temperature=0.7,
                           top_k=3)
    b2.submit(prompts[0], 4)
    b2.run()
    assert len(srv._jit_cache) == n_entries, "per-config retrace"
    # determinism per seed with per-request sampling
    def run_once(seed):
        bb = ContinuousBatcher(srv, slots=1, capacity=64, seed=seed)
        rid = bb.submit(prompts[2], 5, temperature=1.0, top_p=0.8)
        return tuple(bb.run()[rid])
    assert run_once(9) == run_once(9)
    # spec mode rejects per-request overrides
    draft = _draft_server(seed=0)
    bs = ContinuousBatcher(srv, slots=2, capacity=64, draft=draft)
    with pytest.raises(ModelRuntimeError, match="per-request"):
        bs.submit(prompts[0], 4, temperature=0.5)


def test_per_request_stop_seq():
    """Per-request multi-token stop sequences finish a request the step
    its emitted tail matches; other requests are untouched; validation
    rejects bad sequences."""
    srv = FlashLMServer(_trained_model())
    rng = np.random.default_rng(9)
    prompts = _prompts(rng, (5, 7, 4))
    ref = _solo(srv, prompts, [12, 12, 12])
    seq = [int(ref[0][2]), int(ref[0][3])]  # tail-matches at step 3

    b = ContinuousBatcher(srv, slots=2, capacity=64)
    rids = [
        b.submit(prompts[0], 12, stop_seq=seq),
        b.submit(prompts[1], 12),  # no stop: full stream
        b.submit(prompts[2], 12, stop_seq=[31, 31, 31]),  # never fires
    ]
    done = b.run()
    got0 = done[rids[0]]
    assert len(got0) == 4 and list(got0[-2:]) == seq
    np.testing.assert_array_equal(got0, ref[0][:4].astype(np.int64))
    np.testing.assert_array_equal(done[rids[1]], ref[1].astype(np.int64))
    np.testing.assert_array_equal(done[rids[2]], ref[2].astype(np.int64))

    with pytest.raises(ModelRuntimeError, match="stop_seq"):
        b.submit(prompts[0], 4, stop_seq=[])
    with pytest.raises(ModelRuntimeError, match="stop_seq"):
        b.submit(prompts[0], 4, stop_seq=[0, 32])


@pytest.mark.parametrize("paged", [False, True])
def test_lookup_batching_exact(paged):
    """Prompt-lookup speculative batching (draft-FREE): host-side ngram
    proposals, one k-wide verify dispatch per round — every stream
    bit-equal to solo target greedy, through slot reuse."""
    target = FlashLMServer(_trained_model())
    rng = np.random.default_rng(57)
    prompts = _prompts(rng, (5, 9, 3, 12))
    max_new = [8, 5, 10, 6]
    solo = _solo(target, prompts, max_new)
    kw = dict(paged=True, page_size=8) if paged else {}
    b = ContinuousBatcher(target, slots=2, capacity=64, lookup=True,
                          spec_k=3, **kw)
    rids = [b.submit(p, mn) for p, mn in zip(prompts, max_new)]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))
    assert b.stats["spec_rounds"] == b.stats["dispatches"]
    if paged:
        assert b.stats["free_pages"] == b.stats["pool_pages"]


def test_lookup_accepts_on_periodic_continuation():
    """Greedy continuations that re-enter already-seen patterns must be
    accepted multi-token.  An UNTRAINED model's greedy output collapses
    into short cycles (deterministic given the seed), the regime lookup
    serves — pinned: 30 tokens in <= 20 rounds (measured 14, ~2.1 per
    round) where one-token-per-round would be 30."""
    model = eg.compile(
        flash_transformer(vocab=32, dim=16, heads=2, max_seq=96),
        backend="jax", seed=0,
    )
    target = FlashLMServer(model)
    rng = np.random.default_rng(58)
    prompts = _prompts(rng, (8, 5))
    solo = _solo(target, prompts, [16, 16])
    b = ContinuousBatcher(target, slots=2, capacity=96, lookup=True,
                          spec_k=4)
    rids = [b.submit(p, 16) for p in prompts]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))
    assert b.stats["spec_emitted"] == 30
    assert b.stats["spec_rounds"] <= 20, b.stats


def test_lookup_stop_sequence_and_preemption_history():
    """Multi-token stop sequences fire mid-round, and a preempted
    request's continuation (prompt absorbs emitted tokens) must not
    double-count history in the proposals (exactness pins it)."""
    target = FlashLMServer(_trained_model())
    rng = np.random.default_rng(59)
    prompts = _prompts(rng, (6, 4, 9))
    ref = _solo(target, prompts, [12, 12, 12])
    stop_seq = [int(t) for t in ref[0][3:5]]
    # tight pool: admission of later requests preempts by RECOMPUTE
    b = ContinuousBatcher(target, slots=2, capacity=64, lookup=True,
                          spec_k=4, paged=True, page_size=8,
                          pool_pages=12)
    rids = [b.submit(p, 12, stop_seq=stop_seq) for p in prompts]
    done = b.run()
    for rid, r in zip(rids, ref):
        got = done[rid]
        r64 = r.astype(np.int64)
        np.testing.assert_array_equal(got, r64[:len(got)])
    assert b.stats["free_pages"] == b.stats["pool_pages"]


def test_lookup_validation():
    target = FlashLMServer(_trained_model())
    draft = _draft_server(seed=0)
    with pytest.raises(ModelRuntimeError, match="mutually exclusive"):
        ContinuousBatcher(target, slots=2, capacity=64, lookup=True,
                          draft=draft)
    with pytest.raises(ModelRuntimeError, match="greedy"):
        ContinuousBatcher(target, slots=2, capacity=64, lookup=True,
                          temperature=0.5)
    with pytest.raises(ModelRuntimeError, match="decode_chunk"):
        ContinuousBatcher(target, slots=2, capacity=64, lookup=True,
                          decode_chunk=4)
    with pytest.raises(ModelRuntimeError, match="speculation"):
        ContinuousBatcher(target, slots=2, capacity=64, lookup=True,
                          pipeline=1)
    with pytest.raises(ModelRuntimeError, match="lookup_ngram"):
        ContinuousBatcher(target, slots=2, capacity=64, lookup=True,
                          lookup_ngram=0)
    b = ContinuousBatcher(target, slots=2, capacity=64, lookup=True)
    with pytest.raises(ModelRuntimeError, match="overrides"):
        b.submit(np.zeros(4, np.float32), 4, temperature=0.7)
    # spec_k margin counts against capacity exactly like draft mode
    with pytest.raises(ModelRuntimeError, match="spec_k"):
        b.submit(np.zeros(60, np.float32), 4)
