"""Encoder-decoder KV-cache serving (Seq2SeqServer).

Parity contract: prefill probabilities match the compiled model's
"predict" target, and greedy generation matches ``greedy_decode``
token for token — while decoding with per-token cost independent of the
generated length (encode-once + cached self-attention + precomputed
cross K/V), vs greedy_decode's O(t²) full re-forward.
"""

import numpy as np
import pytest

import jax

from exprgrad_tpu import compile
from exprgrad_tpu.errors import ModelRuntimeError
from exprgrad_tpu.models import (
    Seq2SeqServer,
    flash_transformer,
    greedy_decode,
    tiny_seq2seq,
)


@pytest.fixture(scope="module")
def model():
    return compile(tiny_seq2seq(), seed=0)


@pytest.fixture(scope="module")
def trained():
    """A model trained on sequence reversal (non-degenerate weights)."""
    rng = np.random.default_rng(0)
    m = compile(tiny_seq2seq(eta=0.02), seed=1)
    src = rng.integers(1, 8, (32, 6)).astype(np.float32)
    rev = src[:, ::-1]
    tgt = np.concatenate(
        [np.zeros((32, 1), np.float32), rev[:, :-1]], axis=1
    )
    labels = np.eye(8, dtype=np.float32)[rev.astype(int)]
    for _ in range(300):
        m.epoch += 1
        m.apply("train", {"src": src, "tgt": tgt, "labels": labels})
    return m


def test_prefill_matches_predict_target(model):
    rng = np.random.default_rng(1)
    src = rng.integers(0, 8, (3, 8)).astype(np.float32)
    tgt = rng.integers(0, 8, (3, 5)).astype(np.float32)
    probs = np.asarray(model.call("predict", {"src": src, "tgt": tgt}))
    server = Seq2SeqServer(model)
    enc = server.encode(src)
    logits, _ = server.prefill(tgt, enc, server.init_caches(3, capacity=8))
    got = np.asarray(jax.nn.softmax(logits, axis=-1))
    np.testing.assert_allclose(got, probs, atol=1e-5)


def test_greedy_generation_matches_greedy_decode(model):
    rng = np.random.default_rng(2)
    src = rng.integers(0, 8, (4, 8)).astype(np.float32)
    want = greedy_decode(model, src, n_new=7)
    got = np.asarray(Seq2SeqServer(model).generate(src, n_new=7))
    np.testing.assert_array_equal(got, want)


def test_trained_model_serves_reversal(trained):
    """The served trained model still solves the task (weights are real,
    not init noise) and matches greedy_decode."""
    rng = np.random.default_rng(3)
    # memorized training batch prefix (seen data: tests the serving path
    # with real weights, not generalization)
    src = np.asarray(
        np.random.default_rng(0).integers(1, 8, (32, 6)), np.float32
    )[:8]
    server = Seq2SeqServer(trained)
    got = np.asarray(server.generate(src, n_new=6))
    want = greedy_decode(trained, src, n_new=6)
    np.testing.assert_array_equal(got, want)
    # the task itself: output is the reversed source
    acc = (got == src[:, ::-1].astype(np.int64)).mean()
    assert acc > 0.9, acc


def test_incremental_decode_is_stepwise(trained):
    """decode() one token at a time reproduces a whole-prefix prefill."""
    rng = np.random.default_rng(4)
    src = rng.integers(1, 8, (2, 6)).astype(np.float32)
    server = Seq2SeqServer(trained)
    enc = server.encode(src)
    tgt = rng.integers(0, 8, (2, 5)).astype(np.float32)

    full_logits, _ = server.prefill(
        tgt, enc, server.init_caches(2, capacity=8)
    )
    caches = server.init_caches(2, capacity=8)
    steps = []
    for i in range(5):
        logits, caches = server._step(tgt[:, i:i + 1], enc, caches)
        steps.append(np.asarray(logits)[:, 0])
    np.testing.assert_allclose(
        np.stack(steps, axis=1), np.asarray(full_logits), atol=1e-5
    )


def test_sampling_temperature_runs(model):
    rng = np.random.default_rng(5)
    src = rng.integers(0, 8, (2, 8)).astype(np.float32)
    server = Seq2SeqServer(model)
    a = np.asarray(server.generate(src, n_new=5, temperature=1.0, seed=1))
    b = np.asarray(server.generate(src, n_new=5, temperature=1.0, seed=1))
    np.testing.assert_array_equal(a, b)  # same seed -> deterministic
    assert a.shape == (2, 5)
    assert (a >= 0).all() and (a < 8).all()


def test_sampling_top_k_top_p(model):
    """Shared-picker filters: top-k=1 sampling must equal greedy; top-p
    draws stay deterministic per seed and in-vocab."""
    rng = np.random.default_rng(6)
    src = rng.integers(0, 8, (2, 8)).astype(np.float32)
    server = Seq2SeqServer(model)
    greedy = np.asarray(server.generate(src, n_new=5))
    k1 = np.asarray(server.generate(src, n_new=5, temperature=0.7,
                                    top_k=1, seed=3))
    np.testing.assert_array_equal(k1, greedy)
    a = np.asarray(server.generate(src, n_new=5, temperature=1.0,
                                   top_p=0.9, seed=4))
    b = np.asarray(server.generate(src, n_new=5, temperature=1.0,
                                   top_p=0.9, seed=4))
    np.testing.assert_array_equal(a, b)
    assert (a >= 0).all() and (a < 8).all()
    from exprgrad_tpu.errors import ModelRuntimeError
    import pytest as _pytest
    with _pytest.raises(ModelRuntimeError, match="top_p"):
        server.generate(src, n_new=3, temperature=1.0, top_p=1.5)


def test_rejects_wrong_model_family():
    m = compile(flash_transformer(vocab=8, dim=16, heads=2, hidden=32,
                                  max_seq=16), seed=0)
    # flash_transformer fails either on duplicate unprefixed names or on
    # missing prefixed ones — both carry the family hint
    with pytest.raises(ModelRuntimeError, match="Seq2SeqServer serves"):
        Seq2SeqServer(m)


def test_bounds_validation(model):
    server = Seq2SeqServer(model)
    src = np.zeros((1, 8), np.float32)
    with pytest.raises(ModelRuntimeError, match="max_tgt"):
        server.generate(src, n_new=64)
    with pytest.raises(ModelRuntimeError, match="max_src"):
        server.generate(np.zeros((1, 64), np.float32), n_new=4)


def test_compile_cache_no_retrace(model):
    server = Seq2SeqServer(model)
    src = np.zeros((2, 8), np.float32)
    server.generate(src, n_new=4)
    n = len(server._jit_cache)
    server.generate(src, n_new=4)
    assert len(server._jit_cache) == n  # same config: no new entry
    server.generate(src, n_new=5)
    assert len(server._jit_cache) == n + 1


def test_score_matches_predict_nll(trained):
    """score() equals the NLL computed from the predict target's probs."""
    rng = np.random.default_rng(6)
    src = rng.integers(1, 8, (3, 6)).astype(np.float32)
    tgt_ids = rng.integers(0, 8, (3, 6))
    server = Seq2SeqServer(trained)
    nll, mean_nll = server.score(src, tgt_ids)
    # oracle: teacher-forced probs from the compiled model
    prefix = np.concatenate(
        [np.zeros((3, 1)), tgt_ids[:, :-1]], axis=1
    ).astype(np.float32)
    probs = np.asarray(trained.call("predict", {"src": src, "tgt": prefix}))
    want = -np.log(
        np.take_along_axis(probs, tgt_ids[:, :, None], axis=-1)[..., 0]
    ).sum(-1)
    np.testing.assert_allclose(np.asarray(nll), want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mean_nll) * 6, np.asarray(nll),
                               rtol=1e-6)


def test_stop_token_freezes(trained):
    rng = np.random.default_rng(7)
    src = rng.integers(1, 8, (4, 6)).astype(np.float32)
    server = Seq2SeqServer(trained)
    plain = np.asarray(server.generate(src, n_new=6))
    stop = int(plain[0, 2])  # force an early stop on row 0
    out = np.asarray(server.generate(src, n_new=6, stop_token=stop))
    for row in range(4):
        hits = np.where(out[row] == stop)[0]
        if len(hits):
            first = hits[0]
            assert (out[row, first:] == stop).all()


def test_generate_bos_in_compile_key(model):
    """Different bos values must not share a compiled program (bos is
    baked into the traced closure — review finding)."""
    src = np.asarray(
        np.random.default_rng(8).integers(1, 8, (2, 8)), np.float32
    )
    server = Seq2SeqServer(model)
    a = np.asarray(server.generate(src, n_new=5, bos=0))
    b = np.asarray(server.generate(src, n_new=5, bos=3))
    c = np.asarray(server.generate(src, n_new=5, bos=0))
    np.testing.assert_array_equal(a, c)
    assert not np.array_equal(a, b)  # different bos: different decode


def test_ragged_sources_match_solo(trained):
    """Right-padded ragged sources with lengths decode exactly like each
    source served alone at its true length (encoder + cross attention
    mask the pad positions)."""
    rng = np.random.default_rng(9)
    lens = [6, 4, 2]
    width = 6
    server = Seq2SeqServer(trained)
    src = np.zeros((3, width), np.float32)
    rows = []
    for i, L in enumerate(lens):
        row = rng.integers(1, 8, L)
        src[i, :L] = row
        rows.append(row.astype(np.float32))
    got = np.asarray(server.generate(src, n_new=6, lengths=lens))
    for i, row in enumerate(rows):
        solo = np.asarray(server.generate(row[None, :], n_new=6))[0]
        np.testing.assert_array_equal(got[i], solo)


def test_beam1_matches_greedy(trained):
    rng = np.random.default_rng(10)
    src = rng.integers(1, 8, (3, 6)).astype(np.float32)
    server = Seq2SeqServer(trained)
    toks, scores = server.generate_beam(src, n_new=6, beams=1)
    greedy = np.asarray(server.generate(src, n_new=6))
    np.testing.assert_array_equal(np.asarray(toks)[:, 0], greedy)
    assert np.all(np.asarray(scores) <= 0)


def test_beam_scores_sorted_and_exact(trained):
    """Beam scores are sorted best-first and each equals the sequence's
    true cumulative log-probability under teacher forcing."""
    rng = np.random.default_rng(11)
    src = rng.integers(1, 8, (2, 6)).astype(np.float32)
    server = Seq2SeqServer(trained)
    toks, scores = server.generate_beam(src, n_new=4, beams=3)
    toks, scores = np.asarray(toks), np.asarray(scores)
    assert (np.diff(scores, axis=1) <= 1e-6).all()
    for b_i in range(2):
        for beam in range(3):
            nll, _ = server.score(src[b_i:b_i + 1], toks[b_i, beam][None])
            np.testing.assert_allclose(
                scores[b_i, beam], -float(np.asarray(nll)[0]),
                rtol=1e-4, atol=1e-4,
            )


def test_beam_on_ragged_sources(trained):
    rng = np.random.default_rng(12)
    lens = [6, 3]
    src = np.zeros((2, 6), np.float32)
    rows = []
    for i, L in enumerate(lens):
        row = rng.integers(1, 8, L).astype(np.float32)
        src[i, :L] = row
        rows.append(row)
    server = Seq2SeqServer(trained)
    toks, scores = server.generate_beam(src, n_new=5, beams=2,
                                        lengths=lens)
    for i, row in enumerate(rows):
        solo_t, solo_s = server.generate_beam(row[None, :], n_new=5,
                                              beams=2)
        np.testing.assert_array_equal(np.asarray(toks)[i],
                                      np.asarray(solo_t)[0])
        np.testing.assert_allclose(np.asarray(scores)[i],
                                   np.asarray(solo_s)[0], atol=1e-5)


def test_multiblock_seq2seq_serves():
    """2 encoder + 2 decoder blocks: block discovery by name prefix,
    per-block cross K/V and self caches; greedy == greedy_decode."""
    rng = np.random.default_rng(13)
    m = compile(tiny_seq2seq(enc_blocks=2, dec_blocks=2), seed=0)
    server = Seq2SeqServer(m)
    assert len(server.enc) == 2 and len(server.dec) == 2
    src = rng.integers(1, 8, (2, 6)).astype(np.float32)
    got = np.asarray(server.generate(src, n_new=5))
    want = greedy_decode(m, src, n_new=5)
    np.testing.assert_array_equal(got, want)
    toks, scores = server.generate_beam(src, n_new=4, beams=2)
    assert np.asarray(toks).shape == (2, 2, 4)
    np.testing.assert_array_equal(np.asarray(toks)[:, 0],
                                  np.asarray(got)[:, :4])


def test_beam_validates_lengths(model):
    src = np.zeros((2, 6), np.float32)
    with pytest.raises(ModelRuntimeError, match="lengths"):
        model_server = Seq2SeqServer(model)
        model_server.generate_beam(src, n_new=4, beams=2, lengths=[10, 3])
    with pytest.raises(ModelRuntimeError, match="n_new"):
        Seq2SeqServer(model).generate_beam(src, n_new=0, beams=2)


def test_seq2seq_int8_cache(trained):
    """The quantized KV cache works under the encoder-decoder server
    (cache_dtype plumbs into ops.decode): greedy matches f32-cached."""
    import jax.numpy as jnp

    f32 = Seq2SeqServer(trained)
    q8 = Seq2SeqServer(trained, cache_dtype=jnp.int8)
    src = np.asarray(
        np.random.default_rng(0).integers(1, 8, (4, 6)), np.float32
    )
    a = np.asarray(f32.generate(src, n_new=6))
    b = np.asarray(q8.generate(src, n_new=6))
    np.testing.assert_array_equal(a, b)


def test_seq2seq_speculative_matches_greedy(trained):
    """Encoder-decoder speculative decoding == plain greedy for any
    draft (here: a random-weight draft and self-draft)."""
    src = np.asarray(
        np.random.default_rng(0).integers(1, 8, (1, 6)), np.float32
    )
    target = Seq2SeqServer(trained)
    want = np.asarray(target.generate(src, n_new=6))
    draft = Seq2SeqServer(compile(tiny_seq2seq(), seed=9))
    for k in (1, 3):
        got, steps = target.generate_speculative(draft, src, n_new=6, k=k)
        np.testing.assert_array_equal(np.asarray(got), want)
    got, steps = target.generate_speculative(target, src, n_new=6, k=3)
    np.testing.assert_array_equal(np.asarray(got), want)
    assert int(steps) <= 3  # self-draft: full acceptance


def test_weight_only_int8_quantization(trained):
    """W8A16 seq2seq serving: int8 per-output-channel weights, logits
    tracking full precision and greedy generation identical on the
    trained (confident) model."""
    import jax.numpy as jnp

    from exprgrad_tpu.models._quant import QuantW

    full = Seq2SeqServer(trained)
    quant = Seq2SeqServer(trained, weight_dtype=jnp.int8)

    n_q = sum(
        isinstance(v, QuantW)
        for blk in quant.enc + quant.dec
        for v in blk.values()
    )
    assert n_q == 6 * len(quant.enc) + 10 * len(quant.dec)
    assert isinstance(quant.p["head.weights"], QuantW)
    assert quant.p["head.weights"].codes.dtype == jnp.int8

    rng = np.random.default_rng(5)
    src = rng.integers(1, 8, (4, 6)).astype(np.float32)
    out_f = np.asarray(full.generate(src, n_new=6))
    out_q = np.asarray(quant.generate(src, n_new=6))
    assert (out_f == out_q).all()

    with pytest.raises(ModelRuntimeError):
        Seq2SeqServer(trained, weight_dtype=jnp.float16)


def test_mesh_tensor_parallel_seq2seq_serving(trained):
    """Encoder-decoder serving on a (data x model) mesh: greedy, beam,
    and score match the single-device server; composes with int8
    weights."""
    import jax
    import jax.numpy as jnp

    from exprgrad_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, model=2)
    solo = Seq2SeqServer(trained)
    tp = Seq2SeqServer(trained, mesh=mesh, weight_dtype=jnp.int8)
    ref = Seq2SeqServer(trained, weight_dtype=jnp.int8)

    blk = tp.dec[0]
    assert blk["self.wq"].codes.sharding.shard_shape(
        blk["self.wq"].codes.shape
    )[0] == blk["self.wq"].codes.shape[0] // 2

    rng = np.random.default_rng(9)
    src = rng.integers(1, 8, (4, 6)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(tp.generate(src, n_new=6)),
        np.asarray(ref.generate(src, n_new=6)),
    )
    np.testing.assert_array_equal(
        np.asarray(solo.generate(src, n_new=6)),
        np.asarray(ref.generate(src, n_new=6)),
    )
    b_tp, s_tp = tp.generate_beam(src[:2], n_new=5, beams=3)
    b_ref, s_ref = ref.generate_beam(src[:2], n_new=5, beams=3)
    np.testing.assert_array_equal(np.asarray(b_tp), np.asarray(b_ref))
    np.testing.assert_allclose(np.asarray(s_tp), np.asarray(s_ref),
                               rtol=1e-4, atol=1e-5)
