"""Continuous batching for encoder-decoder serving (Seq2SeqBatcher)."""

import numpy as np
import pytest

import exprgrad_tpu as eg
from exprgrad_tpu.errors import ModelRuntimeError
from exprgrad_tpu.models import Seq2SeqBatcher, Seq2SeqServer, tiny_seq2seq

VOCAB = 8


@pytest.fixture(scope="module")
def server():
    model = eg.compile(
        tiny_seq2seq(vocab=VOCAB, dim=16, max_src=16, max_tgt=16),
        backend="jax", seed=1,
    )
    # brief training so logits aren't degenerate
    rng = np.random.default_rng(1)
    src = rng.integers(0, VOCAB, (8, 8)).astype(np.float32)
    tgt = np.concatenate(
        [np.zeros((8, 1)), src[:, :-1]], axis=1).astype(np.float32)
    labels = eg.one_hot(src.astype(int).reshape(-1), VOCAB).reshape(
        8, 8, VOCAB)
    for _ in range(3):
        model.epoch += 1
        model.apply("train", {"src": src, "tgt": tgt, "labels": labels})
    return Seq2SeqServer(model)


def _solo(server, srcs, max_new):
    return [np.asarray(server.generate(
        s[None, :], n_new=mn, lengths=[s.size]))[0]
        for s, mn in zip(srcs, max_new)]


def test_greedy_equals_solo_with_slot_reuse(server):
    rng = np.random.default_rng(2)
    srcs = [rng.integers(0, VOCAB, n).astype(np.float32)
            for n in (6, 11, 4, 9)]
    max_new = [7, 5, 9, 6]
    solo = _solo(server, srcs, max_new)
    b = Seq2SeqBatcher(server, slots=2, max_src=16, capacity=16)
    rids = [b.submit(s, mn) for s, mn in zip(srcs, max_new)]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))
    assert b.stats["decode_steps"] < sum(max_new)


def test_stop_token_and_streaming(server):
    rng = np.random.default_rng(3)
    srcs = [rng.integers(0, VOCAB, n).astype(np.float32) for n in (6, 9)]
    ref = _solo(server, srcs, [10, 10])
    stop = int(ref[0][2])
    b = Seq2SeqBatcher(server, slots=2, max_src=16, capacity=16,
                       stop_token=stop, stream_tokens=True)
    rids = [b.submit(s, 10) for s in srcs]
    streamed = {rid: [] for rid in rids}
    done = {}
    while len(done) < 2:
        for rid, toks in b.step():
            done[rid] = toks
        for rid, tok in b.drain_tokens():
            streamed[rid].append(tok)
    for rid, r in zip(rids, ref):
        got = done[rid]
        np.testing.assert_array_equal(got, r[:len(got)].astype(np.int64))
        np.testing.assert_array_equal(
            np.asarray(streamed[rid], np.int64), got)
    m = b.request_metrics()
    assert len(m) == 2 and all(r["ttft_s"] > 0 for r in m)


def test_per_request_sampling(server):
    rng = np.random.default_rng(4)
    srcs = [rng.integers(0, VOCAB, n).astype(np.float32) for n in (5, 8, 6)]
    refs = _solo(server, srcs[:2], [6, 6])
    b = Seq2SeqBatcher(server, slots=3, max_src=16, capacity=16, seed=5)
    r0 = b.submit(srcs[0], 6)                            # greedy default
    r1 = b.submit(srcs[1], 6, temperature=0.8, top_k=1)  # == greedy
    r2 = b.submit(srcs[2], 6, temperature=1.1, top_p=0.9)
    done = b.run()
    np.testing.assert_array_equal(done[r0], refs[0].astype(np.int64))
    np.testing.assert_array_equal(done[r1], refs[1].astype(np.int64))
    assert done[r2].shape == (6,)
    assert done[r2].min() >= 0 and done[r2].max() < VOCAB
    n = len(server._jit_cache)
    b2 = Seq2SeqBatcher(server, slots=3, max_src=16, capacity=16,
                        temperature=0.5, top_k=3, seed=6)
    b2.submit(srcs[0], 4)
    b2.run()
    assert len(server._jit_cache) == n, "config retrace"


def test_validation_and_cancel(server):
    b = Seq2SeqBatcher(server, slots=2, max_src=16, capacity=16)
    with pytest.raises(ModelRuntimeError, match="empty"):
        b.submit([], 4)
    with pytest.raises(ModelRuntimeError, match="max_src"):
        b.submit(np.zeros(40), 4)
    with pytest.raises(ModelRuntimeError, match="capacity"):
        b.submit(np.zeros(4), 100)
    with pytest.raises(ModelRuntimeError, match="max_src"):
        Seq2SeqBatcher(server, slots=2, max_src=999)
    rng = np.random.default_rng(5)
    src = rng.integers(0, VOCAB, 6).astype(np.float32)
    r0 = b.submit(src, 12)
    r1 = b.submit(src, 5)
    b.step()
    assert b.cancel(r0)
    done = b.run()
    assert set(done) == {r1}


def test_per_request_stop_seq(server):
    """Multi-token stop sequences finish an encoder-decoder request the
    step its emitted tail matches the sequence."""
    rng = np.random.default_rng(7)
    srcs = [rng.integers(0, VOCAB, n).astype(np.float32) for n in (6, 9)]
    ref = _solo(server, srcs, [10, 10])
    seq = [int(ref[0][1]), int(ref[0][2])]

    b = Seq2SeqBatcher(server, slots=2, max_src=16, capacity=16)
    rids = [b.submit(srcs[0], 10, stop_seq=seq), b.submit(srcs[1], 10)]
    done = b.run()
    got0 = done[rids[0]]
    assert len(got0) == 3 and list(got0[-2:]) == seq
    np.testing.assert_array_equal(got0, ref[0][:3].astype(np.int64))
    np.testing.assert_array_equal(done[rids[1]], ref[1].astype(np.int64))
    with pytest.raises(ModelRuntimeError, match="stop_seq"):
        b.submit(srcs[0], 4, stop_seq=[VOCAB])


def test_lookup_greedy_equals_solo(server):
    """Draft-free prompt-lookup speculation: proposals from SOURCE +
    generation history, verified spec_k+1-wide in one dispatch — every
    greedy stream bit-equal to solo serving through slot reuse.  The
    fixture model was trained to copy its source, so generation quotes
    the source and lookup accepts multi-token."""
    rng = np.random.default_rng(11)
    srcs = [rng.integers(0, VOCAB, n).astype(np.float32)
            for n in (6, 11, 4, 9)]
    max_new = [7, 5, 9, 6]
    solo = _solo(server, srcs, max_new)
    b = Seq2SeqBatcher(server, slots=2, max_src=16, capacity=16,
                       lookup=True, spec_k=4)
    rids = [b.submit(s, mn) for s, mn in zip(srcs, max_new)]
    done = b.run()
    for rid, ref in zip(rids, solo):
        np.testing.assert_array_equal(done[rid], ref.astype(np.int64))
    st = b.stats
    assert st["spec_rounds"] == st["dispatches"]
    # the copy model accepts: strictly fewer rounds than tokens
    assert st["spec_rounds"] < st["spec_emitted"], st


def test_lookup_stop_token_mid_round(server):
    rng = np.random.default_rng(12)
    srcs = [rng.integers(0, VOCAB, n).astype(np.float32) for n in (6, 9)]
    ref = _solo(server, srcs, [10, 10])
    stop = int(ref[0][2])
    b = Seq2SeqBatcher(server, slots=2, max_src=16, capacity=16,
                       stop_token=stop, lookup=True, spec_k=4)
    rids = [b.submit(s, 10) for s in srcs]
    done = b.run()
    for rid, r in zip(rids, ref):
        got = done[rid]
        r64 = r.astype(np.int64)
        np.testing.assert_array_equal(got, r64[:len(got)])
        if stop in r64:
            assert got[-1] == stop
            assert len(got) == list(r64).index(stop) + 1


def test_lookup_validation(server):
    with pytest.raises(ModelRuntimeError, match="greedy"):
        Seq2SeqBatcher(server, slots=2, capacity=16, lookup=True,
                       temperature=0.5)
    with pytest.raises(ModelRuntimeError, match="lookup_ngram"):
        Seq2SeqBatcher(server, slots=2, capacity=16, lookup=True,
                       lookup_ngram=0)
    b = Seq2SeqBatcher(server, slots=2, capacity=16, lookup=True,
                       spec_k=4)
    with pytest.raises(ModelRuntimeError, match="spec_k"):
        b.submit(np.zeros(4, np.float32), 14)  # 14 + 4 > 16
    with pytest.raises(ModelRuntimeError, match="overrides"):
        b.submit(np.zeros(4, np.float32), 4, temperature=0.3)
