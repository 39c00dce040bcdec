"""FlashLMServer: KV-cache serving of trained flash_transformer models.

Parity contract: the server's jax forward must reproduce the compiled
DSL program exactly — prefill logits match the "predict" target, and
greedy KV-cache generation matches greedy decoding through the model.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from exprgrad_tpu import ModelRuntimeError, compile
from exprgrad_tpu.models import flash_transformer
from exprgrad_tpu.models.serve import FlashLMServer

VOCAB = 6


def _trained_model(heads=2, kv_heads=None, steps=30):
    model = compile(
        flash_transformer(vocab=VOCAB, dim=16, heads=heads,
                          kv_heads=kv_heads, eta=0.01),
        backend="jax", seed=0,
    )
    rng = np.random.default_rng(0)
    phase = rng.integers(0, VOCAB, 16)
    toks = ((phase[:, None] + np.arange(8)[None, :]) % VOCAB).astype(
        np.float32
    )
    labels = np.eye(VOCAB, dtype=np.float32)[
        ((toks + 1) % VOCAB).astype(int)
    ]
    for _ in range(steps):
        model.epoch += 1
        model.apply("train", {"tokens": toks, "labels": labels})
    return model


@pytest.mark.parametrize("kv_heads", [None, 1])
def test_prefill_matches_predict(kv_heads):
    model = _trained_model(heads=2, kv_heads=kv_heads, steps=5)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    rng = np.random.default_rng(1)
    toks = rng.integers(0, VOCAB, (3, 8)).astype(np.float32)

    logits, _ = server.prefill(toks, server.init_caches(3))
    probs = np.asarray(jnp.asarray(
        jnp.exp(logits - jnp.max(logits, -1, keepdims=True))
    ))
    probs = probs / probs.sum(-1, keepdims=True)
    want = np.asarray(model.call("predict", {"tokens": toks}))
    np.testing.assert_allclose(probs, want, rtol=1e-4, atol=1e-5)


def test_incremental_decode_matches_prefill():
    """Token-by-token decoding reproduces the all-at-once prefill."""
    model = _trained_model(steps=5)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    rng = np.random.default_rng(2)
    toks = rng.integers(0, VOCAB, (2, 8)).astype(np.float32)

    full_logits, _ = server.prefill(toks, server.init_caches(2))
    caches = server.init_caches(2)
    steps = []
    for t in range(8):
        logits, caches = server.decode(toks[:, t:t + 1], caches)
        steps.append(np.asarray(logits[:, 0]))
    np.testing.assert_allclose(
        np.stack(steps, axis=1), np.asarray(full_logits),
        rtol=1e-4, atol=1e-5,
    )


def test_generate_matches_sliding_window_greedy():
    model = _trained_model(steps=30)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    prompt = np.asarray([[2.0, 3.0, 4.0]], np.float32)

    got = np.asarray(server.generate(prompt, n_new=9))[0].astype(int)

    toks = list(prompt[0].astype(int))
    for _ in range(9):
        window = np.asarray(toks, np.float32)[None, :]
        probs = np.asarray(model.call("predict", {"tokens": window}))
        toks.append(int(probs[0, -1].argmax()))
    assert list(got) == toks[3:]
    # and the trained model actually learned the +1 cycle
    assert list(got)[:4] == [(prompt[0, 0].astype(int) + i) % VOCAB
                             for i in range(3, 7)]


def test_server_rejects_foreign_models():
    from exprgrad_tpu.models import tiny_mixer

    pred, loss, train = tiny_mixer()
    model = compile([pred, loss, train], backend="interp", seed=0)
    with pytest.raises(ModelRuntimeError, match="flash_transformer"):
        FlashLMServer(model)


def test_generate_rejects_overflow():
    """Static capacity/max_seq overflows raise instead of silently
    clamping cache appends and position gathers (code-review finding)."""
    model = _trained_model(steps=1)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    prompt = np.asarray([[1.0, 2.0, 3.0]], np.float32)

    with pytest.raises(ModelRuntimeError, match="capacity"):
        server.generate(prompt, n_new=4, capacity=5)  # need 6 slots
    with pytest.raises(ModelRuntimeError, match="max_seq"):
        server.generate(prompt, n_new=63)  # need position 64 of 64
    with pytest.raises(ModelRuntimeError, match="n_new"):
        server.generate(prompt, n_new=0)
    # exact fit is legal: positions 0..5, 6 cache rows
    out = np.asarray(server.generate(prompt, n_new=4, capacity=6))
    assert out.shape == (1, 4)


def test_generate_single_token():
    """n_new=1 takes the scan-length-0 path (prefill only, no decode)."""
    model = _trained_model(steps=30)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    prompt = np.asarray([[2.0, 3.0, 4.0]], np.float32)
    one = np.asarray(server.generate(prompt, n_new=1))[0]
    many = np.asarray(server.generate(prompt, n_new=5))[0]
    assert one.shape == (1,) and one[0] == many[0]


def test_server_rejects_blockless_model():
    model = compile(
        flash_transformer(vocab=VOCAB, dim=8, blocks=0), backend="interp",
        seed=0,
    )
    with pytest.raises(ModelRuntimeError, match="blocks"):
        FlashLMServer(model)


def test_generate_ragged_matches_solo():
    """Right-padded ragged batch: each sequence's generation is identical
    to serving that prompt alone (pad K/V position-masked, true
    positions throughout)."""
    model = _trained_model(steps=30)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    prompts = [[2.0, 3.0, 4.0], [1.0, 2.0, 3.0, 4.0, 5.0], [0.0, 1.0]]
    lengths = [len(p) for p in prompts]
    t_max = max(lengths)
    padded = np.zeros((len(prompts), t_max), np.float32)
    for i, p in enumerate(prompts):
        padded[i, :len(p)] = p

    got = np.asarray(server.generate(padded, n_new=6, lengths=lengths,
                                     capacity=t_max + 6))
    for i, p in enumerate(prompts):
        solo = np.asarray(server.generate(
            np.asarray([p], np.float32), n_new=6, capacity=len(p) + 6,
        ))[0]
        np.testing.assert_array_equal(got[i], solo, err_msg=f"seq {i}")


def test_generate_ragged_windowed():
    """Ragged batch through a sliding-window model: per-sequence windows
    follow true positions."""
    from tests.test_window_attention import _train_windowed

    model, _ = _train_windowed(window=4)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    prompts = [[2.0, 3.0, 4.0, 5.0, 0.0, 1.0], [5.0, 0.0]]
    lengths = [6, 2]
    padded = np.zeros((2, 6), np.float32)
    for i, p in enumerate(prompts):
        padded[i, :len(p)] = p
    got = np.asarray(server.generate(padded, n_new=5, lengths=lengths,
                                     capacity=11))
    for i, p in enumerate(prompts):
        solo = np.asarray(server.generate(
            np.asarray([p], np.float32), n_new=5, capacity=len(p) + 5,
        ))[0]
        np.testing.assert_array_equal(got[i], solo, err_msg=f"seq {i}")


def test_generate_ragged_validation():
    model = _trained_model(steps=1)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    padded = np.zeros((2, 4), np.float32)
    with pytest.raises(ModelRuntimeError, match="lengths"):
        server.generate(padded, n_new=2, lengths=[3])  # wrong shape
    with pytest.raises(ModelRuntimeError, match="lengths"):
        server.generate(padded, n_new=2, lengths=[3, 5])  # > width
    with pytest.raises(ModelRuntimeError, match="max_seq"):
        server.generate(padded, n_new=62, lengths=[4, 2])


def test_generate_stop_token_freezes_rows():
    """Once a sequence emits the stop token every later output is the
    stop token, and other rows keep decoding exactly as without it."""
    model = _trained_model(steps=30)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    prompt = np.asarray([[2.0, 3.0, 4.0], [0.0, 1.0, 2.0]], np.float32)
    free = np.asarray(server.generate(prompt, n_new=8))
    # the trained +1-cycle model emits 5 then 0 then 1... for row 0;
    # pick the second generated token of row 0 as the stop
    stop = int(free[0, 1])
    got = np.asarray(server.generate(prompt, n_new=8, stop_token=stop))
    hit = list(free[0]).index(stop)
    np.testing.assert_array_equal(got[0, :hit + 1], free[0, :hit + 1])
    assert (got[0, hit:] == stop).all()
    # row 1 hits the same value at its own (different) step
    hit1 = list(free[1]).index(stop)
    np.testing.assert_array_equal(got[1, :hit1 + 1], free[1, :hit1 + 1])
    assert (got[1, hit1:] == stop).all()


def test_score_matches_predict_nll():
    """score() equals the mean NLL computed from the compiled predict
    target's probabilities, including the ragged case."""
    model = _trained_model(steps=30)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    rng = np.random.default_rng(5)
    toks = rng.integers(0, VOCAB, (3, 8)).astype(np.float32)

    got = np.asarray(server.score(toks))
    probs = np.asarray(model.call("predict", {"tokens": toks}))
    ids = toks.astype(int)
    want = np.stack([
        -np.mean([np.log(probs[b, i, ids[b, i + 1]] + 0.0)
                  for i in range(7)])
        for b in range(3)
    ])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # ragged: scoring a padded batch equals scoring each prefix alone
    lengths = [8, 5, 3]
    ragged = np.asarray(server.score(toks, lengths=lengths))
    for b, ln in enumerate(lengths):
        solo = np.asarray(server.score(toks[b:b + 1, :ln]))[0]
        np.testing.assert_allclose(ragged[b], solo, rtol=1e-4, atol=1e-5)


def _path_logprob(model, prompt, seq):
    """Cumulative log-prob of generated ``seq`` after ``prompt`` via the
    compiled predict target (teacher forcing), stopping at the first
    stop-token repetition boundary the caller trims."""
    toks = list(prompt)
    lp = 0.0
    for tok in seq:
        window = np.asarray(toks, np.float32)[None, :]
        probs = np.asarray(model.call("predict", {"tokens": window}))
        lp += float(np.log(probs[0, -1, int(tok)]))
        toks.append(float(tok))
    return lp


def test_beam_search_top_beam_and_scores():
    """Top beam matches greedy on a sharply-trained model; every
    returned score equals the recomputed path log-prob; scores sorted."""
    model = _trained_model(steps=30)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    prompt = [2.0, 3.0, 4.0]
    seqs, scores = server.generate_beam(
        np.asarray([prompt], np.float32), n_new=5, beams=3,
    )
    seqs = np.asarray(seqs)[0].astype(int)
    scores = np.asarray(scores)[0]
    greedy = np.asarray(server.generate(
        np.asarray([prompt], np.float32), n_new=5))[0].astype(int)
    np.testing.assert_array_equal(seqs[0], greedy)
    assert (np.diff(scores) <= 1e-6).all()
    for b in range(3):
        want = _path_logprob(model, prompt, seqs[b])
        np.testing.assert_allclose(scores[b], want, rtol=1e-3, atol=1e-4)


def test_beam_search_batch_and_stop():
    model = _trained_model(steps=30)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    prompts = np.asarray([[2.0, 3.0, 4.0], [0.0, 1.0, 2.0]], np.float32)
    seqs, scores = server.generate_beam(prompts, n_new=6, beams=2)
    assert np.asarray(seqs).shape == (2, 2, 6)
    for b in range(2):
        greedy = np.asarray(server.generate(prompts[b:b + 1], n_new=6))[0]
        np.testing.assert_array_equal(
            np.asarray(seqs)[b, 0].astype(int), greedy.astype(int)
        )

    # stop token: beams freeze; frozen tail is all stop and the score
    # equals the truncated path's log-prob
    free = np.asarray(server.generate(prompts[:1], n_new=6))[0]
    stop = int(free[1])
    seqs, scores = server.generate_beam(prompts[:1], n_new=6, beams=2,
                                        stop_token=stop)
    s0 = np.asarray(seqs)[0, 0].astype(int)
    hit = list(s0).index(stop)
    assert (s0[hit:] == stop).all()
    want = _path_logprob(model, list(prompts[0]), s0[:hit + 1])
    np.testing.assert_allclose(np.asarray(scores)[0, 0], want,
                               rtol=1e-3, atol=1e-4)


def test_beam_search_finds_exhaustive_best():
    """On a lightly-trained (flatter) model, beam 0 must equal the best
    of ALL vocab^2 two-token continuations by recomputed log-prob — a
    regression guard against pruning bugs that keep scores
    self-consistent but drop the true best path."""
    import itertools

    model = _trained_model(steps=8)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    prompt = [2.0, 3.0]
    seqs, scores = server.generate_beam(
        np.asarray([prompt], np.float32), n_new=2, beams=4,
    )
    best = max(itertools.product(range(VOCAB), repeat=2),
               key=lambda s: _path_logprob(model, prompt, s))
    assert list(np.asarray(seqs)[0, 0].astype(int)) == list(best)
    np.testing.assert_allclose(
        np.asarray(scores)[0, 0], _path_logprob(model, prompt, best),
        rtol=1e-3, atol=1e-4,
    )


def test_serving_entry_points_do_not_retrace():
    """Repeated same-config calls reuse ONE compiled callable per entry
    point (XLA compiles are expensive on the target platform)."""
    model = _trained_model(steps=1)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    p = np.asarray([[1.0, 2.0, 3.0]], np.float32)
    for _ in range(2):
        server.generate(p, n_new=2)
        server.generate(p, n_new=2, lengths=[3])
        server.generate_beam(p, n_new=2, beams=2)
        server.score(p)
    assert len(server._jit_cache) == 4
    keys = {k[0] for k in server._jit_cache}
    assert keys == {"gen", "gen_ragged", "beam", "score"}


def test_beam_search_on_windowed_model():
    """Beam search composes with sliding-window serving (the discovered
    window masks decode attention inside the beam loop)."""
    from tests.test_window_attention import _train_windowed

    model, _ = _train_windowed(window=4)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    assert server.window == 4
    prompt = np.asarray([[2.0, 3.0, 4.0]], np.float32)
    seqs, scores = server.generate_beam(prompt, n_new=5, beams=2)
    greedy = np.asarray(server.generate(prompt, n_new=5))[0].astype(int)
    np.testing.assert_array_equal(
        np.asarray(seqs)[0, 0].astype(int), greedy
    )
    assert (np.diff(np.asarray(scores)[0]) <= 1e-6).all()


def test_ragged_sampling_batch_deterministic():
    """Sampled ragged decoding is reproducible for the same padded batch
    and seed (the documented contract; solo-equality is greedy-only)."""
    model = _trained_model(steps=5)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    padded = np.zeros((2, 4), np.float32)
    padded[0, :3] = [2, 3, 4]
    padded[1, :4] = [0, 1, 2, 3]
    a = np.asarray(server.generate(padded, n_new=5, lengths=[3, 4],
                                   temperature=0.9, seed=11))
    b = np.asarray(server.generate(padded, n_new=5, lengths=[3, 4],
                                   temperature=0.9, seed=11))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(server.generate(padded, n_new=5, lengths=[3, 4],
                                   temperature=0.9, seed=12))
    assert not np.array_equal(a, c)  # seed actually matters


def test_beam_search_validation():
    model = _trained_model(steps=1)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    p = np.asarray([[1.0, 2.0]], np.float32)
    with pytest.raises(ModelRuntimeError, match="beams"):
        server.generate_beam(p, n_new=2, beams=0)
    with pytest.raises(ModelRuntimeError, match="beams"):
        server.generate_beam(p, n_new=2, beams=VOCAB + 1)
    with pytest.raises(ModelRuntimeError, match="max_seq"):
        server.generate_beam(p, n_new=64, beams=2)


def test_generate_sampling_modes():
    """temperature/top_k sampling: valid tokens, seed-reproducible, and
    temperature->0 recovers greedy."""
    model = _trained_model(steps=30)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    prompt = np.asarray([[0.0, 1.0, 2.0]], np.float32)

    greedy = np.asarray(server.generate(prompt, n_new=6))
    s1 = np.asarray(server.generate(prompt, n_new=6, temperature=0.8,
                                    top_k=3, seed=7))
    s2 = np.asarray(server.generate(prompt, n_new=6, temperature=0.8,
                                    top_k=3, seed=7))
    assert np.array_equal(s1, s2)  # seeded sampling is reproducible
    assert ((s1 >= 0) & (s1 < VOCAB)).all()
    cold = np.asarray(server.generate(prompt, n_new=6, temperature=1e-4,
                                      seed=3))
    assert np.array_equal(cold, greedy)  # near-zero temp == greedy


@pytest.fixture(scope="module")
def bucket_model():
    return _trained_model()


def test_prompt_buckets_no_retrace_and_bit_equal(bucket_model):
    """Prompt-width bucketing: several widths share one traced program
    (the ragged path with true lengths), greedy output bit-equal to the
    unbucketed call."""
    server = FlashLMServer(bucket_model)
    rng = np.random.default_rng(17)
    prompts = {
        w: rng.integers(0, VOCAB, (2, w)).astype(np.float32)
        for w in (5, 9, 13)
    }
    exact = {w: np.asarray(server.generate(p, n_new=4))
             for w, p in prompts.items()}

    bucketed = FlashLMServer(bucket_model)
    bucketed.set_prompt_buckets([16])
    outs = {w: np.asarray(bucketed.generate(p, n_new=4))
            for w, p in prompts.items()}
    for w in prompts:
        np.testing.assert_array_equal(outs[w], exact[w])
    # all three widths hit ONE jitted entry with ONE traced shape
    assert len(bucketed._jit_cache) == 1
    fn = next(iter(bucketed._jit_cache.values()))
    assert fn._cache_size() == 1


def test_prompt_buckets_respect_capacity(bucket_model):
    """The bucket width is clamped so width + n_new - 1 still fits the
    cache capacity (no silent clamped-append corruption)."""
    server = FlashLMServer(bucket_model)
    server.set_prompt_buckets([1024])
    p = np.zeros((1, 5), np.float32)
    out = np.asarray(server.generate(p, n_new=4))
    want = np.asarray(FlashLMServer(bucket_model).generate(p, n_new=4))
    np.testing.assert_array_equal(out, want)


def test_speculative_matches_greedy_exactly(bucket_model):
    """Greedy speculative decoding == plain greedy for any draft (the
    draft only changes the number of target steps)."""
    target = FlashLMServer(bucket_model)
    draft = FlashLMServer(
        compile(flash_transformer(vocab=VOCAB, dim=16, heads=2), seed=9)
    )
    prompt = np.asarray([[1, 2, 3, 4, 0]], np.float32)
    want = np.asarray(target.generate(prompt, n_new=16))
    for k in (1, 3, 5):
        got, steps = target.generate_speculative(draft, prompt,
                                                 n_new=16, k=k)
        np.testing.assert_array_equal(np.asarray(got), want)
        assert 1 <= int(steps) <= 16


def test_speculative_self_draft_compresses_steps(bucket_model):
    """With the target as its own draft every proposal is accepted:
    ~n_new/k verify steps instead of n_new."""
    target = FlashLMServer(bucket_model)
    prompt = np.asarray([[2, 4, 1]], np.float32)
    want = np.asarray(target.generate(prompt, n_new=12))
    got, steps = target.generate_speculative(target, prompt, n_new=12,
                                             k=4)
    np.testing.assert_array_equal(np.asarray(got), want)
    assert int(steps) <= 4  # ceil(11 / 4) rounds after the first token


def test_speculative_windowed_target():
    m = compile(
        flash_transformer(vocab=VOCAB, dim=16, heads=2, max_seq=64,
                          window=8),
        seed=3,
    )
    target = FlashLMServer(m)
    prompt = np.asarray([[1, 5, 2, 3]], np.float32)
    want = np.asarray(target.generate(prompt, n_new=14))
    got, _ = target.generate_speculative(target, prompt, n_new=14, k=3)
    np.testing.assert_array_equal(np.asarray(got), want)


def _cyclic_trained(vocab=32, period=6, dim=32, max_seq=128, seed=0,
                    steps=60):
    """A tiny LM trained on a fixed cyclic-successor task: generations
    repeat with the cycle's period, the regime prompt lookup serves."""
    rng = np.random.default_rng(seed)
    cyc = rng.permutation(vocab)[:period]
    succ = {int(cyc[i]): int(cyc[(i + 1) % period]) for i in range(period)}
    m = compile(
        flash_transformer(vocab=vocab, dim=dim, heads=2, max_seq=max_seq),
        backend="jax", seed=seed)
    seq, batch = 24, 8
    for _ in range(steps):
        starts = rng.integers(0, period, batch)
        toks = np.empty((batch, seq + 1), np.int64)
        toks[:, 0] = cyc[starts]
        for t in range(seq):
            toks[:, t + 1] = [succ[int(x)] for x in toks[:, t]]
        m.epoch += 1
        m.apply("train", {
            "tokens": toks[:, :seq].astype(np.float32),
            "labels": np.eye(vocab, dtype=np.float32)[toks[:, 1:]],
        })
    prompt = np.empty(18, np.int64)
    prompt[0] = cyc[0]
    for t in range(1, 18):
        prompt[t] = succ[int(prompt[t - 1])]
    return FlashLMServer(m), prompt[None].astype(np.float32)


def test_lookup_exact_and_compresses_steps():
    """Prompt-lookup speculation is exact greedy for any (k, ngram) and
    compresses verify steps on repetitive continuations."""
    srv, prompt = _cyclic_trained()
    want = np.asarray(srv.generate(prompt, n_new=40))
    for k, ng in [(4, 2), (8, 2), (8, 1), (3, 3)]:
        got, steps = srv.generate_lookup(prompt, n_new=40, k=k, ngram=ng)
        np.testing.assert_array_equal(np.asarray(got), want)
        assert int(steps) <= (40 + k - 1) // k + 3, (k, ng, int(steps))


def test_lookup_exact_on_nonrepetitive_prompt(bucket_model):
    """On arbitrary prompts lookup still returns the exact greedy
    sequence — misses only cost steps, never correctness."""
    srv = FlashLMServer(bucket_model)
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, VOCAB, 9)[None].astype(np.float32)
    want = np.asarray(srv.generate(prompt, n_new=17))
    got, steps = srv.generate_lookup(prompt, n_new=17, k=4)
    np.testing.assert_array_equal(np.asarray(got), want)
    assert 1 <= int(steps) <= 17


def test_lookup_validations(bucket_model):
    from exprgrad_tpu.errors import ModelRuntimeError

    srv = FlashLMServer(bucket_model)
    prompt = np.zeros((1, 4), np.float32)
    with pytest.raises(ModelRuntimeError, match="ngram"):
        srv.generate_lookup(prompt, n_new=4, ngram=0)
    with pytest.raises(ModelRuntimeError, match="ngram"):
        srv.generate_lookup(prompt, n_new=4, ngram=6)
    with pytest.raises(ModelRuntimeError, match="one sequence"):
        srv.generate_lookup(np.zeros((2, 4), np.float32), n_new=4)
    with pytest.raises(ModelRuntimeError, match="max_seq"):
        srv.generate_lookup(prompt, n_new=10_000)


def test_speculative_break_even_warning(bucket_model):
    """break_even= warns when the measured acceptance rate (tokens per
    verify round) falls below it, and stays silent above it."""
    import warnings

    target = FlashLMServer(bucket_model)
    prompt = np.asarray([[2, 4, 1]], np.float32)
    # self-draft accepts everything: rate = n_new / steps is maximal
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        got, steps = target.generate_speculative(
            target, prompt, n_new=12, k=4, break_even=1.5)
    rate = 12.0 / int(steps)
    assert rate > 1.5
    with pytest.warns(RuntimeWarning, match="break-even"):
        target.generate_speculative(
            target, prompt, n_new=12, k=4, break_even=rate + 1.0)


def test_speculative_validations(bucket_model):
    from exprgrad_tpu.errors import ModelRuntimeError

    target = FlashLMServer(bucket_model)
    with pytest.raises(ModelRuntimeError, match="one sequence"):
        target.generate_speculative(
            target, np.zeros((2, 4), np.float32), n_new=4
        )
    small_vocab = FlashLMServer(
        compile(flash_transformer(vocab=4, dim=16, heads=2), seed=0)
    )
    with pytest.raises(ModelRuntimeError, match="vocab"):
        target.generate_speculative(
            small_vocab, np.zeros((1, 4), np.float32), n_new=4
        )


def test_top_p_sampling(bucket_model):
    """Nucleus sampling: tokens only come from the smallest prefix of
    the sorted distribution whose mass reaches top_p; deterministic for
    a given seed; top_p=tiny degenerates to greedy."""
    server = FlashLMServer(bucket_model)
    prompt = np.asarray([[1, 2, 3, 0]], np.float32)
    a = np.asarray(server.generate(prompt, n_new=8, temperature=1.0,
                                   top_p=0.9, seed=5))
    b = np.asarray(server.generate(prompt, n_new=8, temperature=1.0,
                                   top_p=0.9, seed=5))
    np.testing.assert_array_equal(a, b)
    # a vanishing nucleus keeps only the argmax -> equals greedy
    tiny = np.asarray(server.generate(prompt, n_new=8, temperature=1.0,
                                      top_p=1e-9, seed=5))
    greedy = np.asarray(server.generate(prompt, n_new=8))
    np.testing.assert_array_equal(tiny, greedy)
    from exprgrad_tpu.errors import ModelRuntimeError
    with pytest.raises(ModelRuntimeError, match="top_p"):
        server.generate(prompt, n_new=4, temperature=1.0, top_p=1.5)


def test_top_p_actually_samples_inside_nucleus(bucket_model):
    """Regression: the nucleus cutoff must be the SMALLEST kept logit —
    with a multi-token nucleus, sampling must produce more than one
    distinct token across seeds (the broken max-cutoff degenerated to
    greedy) while excluded tokens never appear."""
    server = FlashLMServer(bucket_model)
    prompt = np.asarray([[1, 2, 3, 0]], np.float32)
    # flat-ish sampling distribution via high temperature; nucleus 0.8
    probs = None
    model_probs = np.asarray(
        bucket_model.call("predict", {"tokens": prompt})
    )[0, -1]
    t = 3.0
    p_t = np.exp(np.log(np.maximum(model_probs, 1e-30)) / t)
    p_t /= p_t.sum()
    order = np.argsort(-p_t)
    cum = np.cumsum(p_t[order])
    nucleus = set(order[: int(np.searchsorted(cum, 0.8)) + 1].tolist())
    assert len(nucleus) >= 2, "pick a flatter config for this test"
    seen = set()
    for seed in range(40):
        tok = int(np.asarray(server.generate(
            prompt, n_new=1, temperature=t, top_p=0.8, seed=seed
        ))[0, 0])
        seen.add(tok)
    assert seen <= nucleus, (seen, nucleus)
    assert len(seen) >= 2, "top_p degenerated to greedy"


def test_speculative_sampling_preserves_target_distribution():
    """temperature>0 speculative decoding is the exact rejection-sampling
    scheme: over many seeds the (t1, t2) joint matches p(t1)p(t2|t1) of
    the TARGET (untrained = spread distribution, disagreeing draft —
    the rejection/residual path fires constantly).  Deterministic: fixed
    seed list -> fixed counts."""
    m = compile(flash_transformer(vocab=VOCAB, dim=16, heads=2,
                                  max_seq=32), seed=0)
    target = FlashLMServer(m)
    draft = FlashLMServer(compile(
        flash_transformer(vocab=VOCAB, dim=8, heads=2, max_seq=32),
        seed=3,
    ))
    prompt = np.asarray([[1, 2, 3, 4]], np.float32)
    pr = np.asarray(m.call("predict", {"tokens": prompt}))[0, -1]
    p1 = pr / pr.sum()
    exp_joint = np.zeros((VOCAB, VOCAB))
    for t1 in range(VOCAB):
        ext = np.concatenate([prompt, [[t1]]], axis=1).astype(np.float32)
        p2 = np.asarray(m.call("predict", {"tokens": ext}))[0, -1]
        exp_joint[t1] = p1[t1] * (p2 / p2.sum())
    N = 250
    emp = np.zeros((VOCAB, VOCAB))
    for s in range(N):
        out, _ = target.generate_speculative(
            draft, prompt, n_new=2, k=2, temperature=1.0, seed=s
        )
        emp[int(np.asarray(out)[0, 0]), int(np.asarray(out)[0, 1])] += 1
    emp /= N
    # per-cell multinomial 3-sigma at p<=0.25, N=250 is ~0.08
    assert np.abs(emp - exp_joint).max() < 0.09


def test_speculative_sampled_deterministic_per_seed(bucket_model):
    target = FlashLMServer(bucket_model)
    prompt = np.asarray([[1, 2, 3]], np.float32)
    a, _ = target.generate_speculative(target, prompt, n_new=6, k=3,
                                       temperature=0.9, seed=11)
    b, _ = target.generate_speculative(target, prompt, n_new=6, k=3,
                                       temperature=0.9, seed=11)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_weight_only_int8_quantization():
    """W8A16 serving: per-output-channel int8 weights stay within the
    exact scale/2 dequantization bound, the quantized server's logits
    track full precision, and a trained model's greedy generation
    matches the full-precision server."""
    from exprgrad_tpu.models._quant import QuantW, dequantize

    model = _trained_model()
    full = FlashLMServer(model)
    quant = FlashLMServer(model, weight_dtype=jnp.int8)

    # storage really is int8, with the elementwise error bound holding
    n_quant = 0
    for blk_f, blk_q in zip(full.blocks, quant.blocks):
        for wf, wq in zip(blk_f, blk_q):
            if isinstance(wq, QuantW):
                n_quant += 1
                assert wq.codes.dtype == jnp.int8
                err = np.abs(np.asarray(wf) - np.asarray(dequantize(wq)))
                bound = np.broadcast_to(
                    np.asarray(wq.scale) * 0.5 + 1e-7, err.shape
                )
                assert (err <= bound).all()
    assert n_quant == 6 * len(full.blocks)
    assert isinstance(quant.w_head, QuantW)

    rng = np.random.default_rng(3)
    prompt = rng.integers(0, VOCAB, (4, 8)).astype(np.float32)
    lf, _ = full.prefill(jnp.asarray(prompt), full.init_caches(4))
    lq, _ = quant.prefill(jnp.asarray(prompt), quant.init_caches(4))
    rel = float(
        np.linalg.norm(np.asarray(lq) - np.asarray(lf))
        / np.linalg.norm(np.asarray(lf))
    )
    assert rel < 0.05, f"quantized logits drifted {rel:.3f} relative"

    out_f = np.asarray(full.generate(prompt, n_new=12))
    out_q = np.asarray(quant.generate(prompt, n_new=12))
    # trained model -> confident logits -> greedy path is robust to the
    # <1% per-matmul quantization noise
    assert (out_f == out_q).all()


def test_weight_dtype_validation():
    with pytest.raises(ModelRuntimeError):
        FlashLMServer(_trained_model(), weight_dtype=jnp.float16)


def test_mesh_tensor_parallel_serving():
    """Serving on a (data x model) mesh: head-sharded attention, column/
    row-sharded FFN, vocab-sharded LM head, dp batches — greedy output
    identical to the single-device server (trained model)."""
    import jax

    from exprgrad_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model = _trained_model()
    mesh = make_mesh(8, model=2)
    solo = FlashLMServer(model)
    tp = FlashLMServer(model, mesh=mesh)

    # the big matrices really are distributed
    blk = tp.blocks[0]
    assert blk.wq.sharding.shard_shape(blk.wq.shape)[0] == blk.wq.shape[0] // 2
    assert blk.w1.sharding.shard_shape(blk.w1.shape)[1] == blk.w1.shape[1] // 2
    caches = tp.init_caches(4)
    assert caches[0].k.sharding.shard_shape(caches[0].k.shape)[0] == 1

    rng = np.random.default_rng(11)
    prompt = rng.integers(0, VOCAB, (4, 8)).astype(np.float32)
    out_solo = np.asarray(solo.generate(prompt, n_new=12))
    out_tp = np.asarray(tp.generate(prompt, n_new=12))
    assert (out_solo == out_tp).all()

    nll_solo = np.asarray(solo.score(prompt))
    nll_tp = np.asarray(tp.score(prompt))
    np.testing.assert_allclose(nll_tp, nll_solo, rtol=1e-5, atol=1e-6)

    # composes with weight quantization (sharded int8 codes + scales)
    q_solo = FlashLMServer(model, weight_dtype=jnp.int8)
    q_tp = FlashLMServer(model, weight_dtype=jnp.int8, mesh=mesh)
    assert (np.asarray(q_solo.generate(prompt, n_new=12))
            == np.asarray(q_tp.generate(prompt, n_new=12))).all()


def _trained_rope_model(steps=30, **kw):
    model = compile(
        flash_transformer(vocab=VOCAB, dim=16, heads=2, eta=0.01,
                          rope=True, **kw),
        backend="jax", seed=0,
    )
    rng = np.random.default_rng(0)
    phase = rng.integers(0, VOCAB, 16)
    toks = ((phase[:, None] + np.arange(8)[None, :]) % VOCAB).astype(
        np.float32
    )
    labels = np.eye(VOCAB, dtype=np.float32)[
        ((toks + 1) % VOCAB).astype(int)
    ]
    for _ in range(steps):
        model.epoch += 1
        model.apply("train", {"tokens": toks, "labels": labels})
    return model


def test_rope_prefill_matches_predict():
    """Rotary model: the server reproduces the DSL program's rotation
    exactly (prefill from an empty cache = absolute positions 0..t)."""
    import jax

    model = _trained_rope_model(steps=5)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    assert server.pos is None and server.rope_base == 10000.0
    assert server.max_seq == 64  # rope_max_seq metadata
    rng = np.random.default_rng(1)
    toks = rng.integers(0, VOCAB, (3, 8)).astype(np.float32)
    probs = np.asarray(model.call("predict", {"tokens": toks}))
    logits, _ = server.prefill(toks, server.init_caches(3))
    got = np.asarray(jax.nn.softmax(logits, axis=-1))
    np.testing.assert_allclose(got, probs, atol=1e-5)


def test_rope_incremental_decode_matches_prefill():
    """Decode steps rotate by ABSOLUTE cache position — wrong offsets
    would diverge from the all-at-once prefill immediately."""
    model = _trained_rope_model(steps=5)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    rng = np.random.default_rng(2)
    toks = rng.integers(0, VOCAB, (2, 8)).astype(np.float32)
    full_logits, _ = server.prefill(toks, server.init_caches(2))
    caches = server.init_caches(2)
    steps = []
    for t in range(8):
        logits, caches = server.decode(toks[:, t:t + 1], caches)
        steps.append(np.asarray(logits[:, 0]))
    np.testing.assert_allclose(
        np.stack(steps, axis=1), np.asarray(full_logits),
        rtol=1e-4, atol=1e-5,
    )


def test_rope_generate_matches_model_greedy_and_learns():
    model = _trained_rope_model(steps=30)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    prompt = np.asarray([[2.0, 3.0, 4.0]], np.float32)
    got = np.asarray(server.generate(prompt, n_new=9))[0].astype(int)
    toks = list(prompt[0].astype(int))
    for _ in range(9):
        window = np.asarray(toks, np.float32)[None, :]
        probs = np.asarray(model.call("predict", {"tokens": window}))
        toks.append(int(probs[0, -1].argmax()))
    assert list(got) == toks[3:]
    assert list(got)[:4] == [(2 + i) % VOCAB for i in range(3, 7)]


def test_rope_ragged_matches_solo():
    """Ragged rope batches rotate by TRUE per-sequence positions."""
    model = _trained_rope_model(steps=10)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    rng = np.random.default_rng(4)
    width, lens = 8, [8, 5]
    prompt = np.zeros((2, width), np.float32)
    for i, ln in enumerate(lens):
        prompt[i, :ln] = rng.integers(0, VOCAB, ln)
    batch_out = np.asarray(server.generate(prompt, n_new=6, lengths=lens))
    for i, ln in enumerate(lens):
        solo = np.asarray(
            server.generate(prompt[i : i + 1, :ln], n_new=6)
        )
        np.testing.assert_array_equal(batch_out[i], solo[0])


def test_rope_composes_with_tied_and_quantized():
    model = _trained_rope_model(steps=30, tie_embeddings=True)
    full = FlashLMServer(model)
    quant = FlashLMServer(model, weight_dtype=jnp.int8)
    prompt = np.asarray([[1.0, 2.0, 3.0]], np.float32)
    a = np.asarray(full.generate(prompt, n_new=8))
    b = np.asarray(quant.generate(prompt, n_new=8))
    np.testing.assert_array_equal(a, b)


def test_mesh_serving_rope_swiglu():
    """Regression: mesh sharding with a rotary (pos-free) SwiGLU model
    (shard_weights used to crash on the missing pos table / None FFN
    biases)."""
    import jax

    from exprgrad_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model = compile(
        flash_transformer(vocab=VOCAB, dim=16, heads=2, hidden=16,
                          rope=True, ffn="swiglu"), seed=0
    )
    solo = FlashLMServer(model)
    tp = FlashLMServer(model, mesh=make_mesh(8, model=2))
    prompt = np.asarray([[1.0, 2.0, 3.0]], np.float32)
    np.testing.assert_array_equal(
        np.asarray(tp.generate(prompt, n_new=8)),
        np.asarray(solo.generate(prompt, n_new=8)),
    )


def test_generate_stop_seq_freezes_rows():
    """A multi-token stop sequence freezes a row the step its rolling
    window of emitted tokens matches; later outputs carry the final
    sequence token; non-matching rows decode untouched."""
    model = _trained_model(steps=30)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    prompt = np.asarray([[2.0, 3.0, 4.0], [0.0, 1.0, 2.0]], np.float32)
    free = np.asarray(server.generate(prompt, n_new=8))
    seq = [int(free[0, 1]), int(free[0, 2])]

    got = np.asarray(server.generate(prompt, n_new=8, stop_seq=seq))
    np.testing.assert_array_equal(got[0, :3], free[0, :3])
    assert (got[0, 2:] == seq[-1]).all()
    # the +1-cycle model emits the same pair in row 1 at its own offset
    fr = list(free[1].astype(int))
    hit = next(i for i in range(1, 8)
               if fr[i - 1] == seq[0] and fr[i] == seq[1])
    np.testing.assert_array_equal(got[1, :hit + 1], free[1, :hit + 1])
    assert (got[1, hit:] == seq[-1]).all()

    # a sequence that never appears leaves decoding untouched
    noseq = np.asarray(server.generate(prompt, n_new=8,
                                       stop_seq=[seq[0], seq[0]]))
    never = ~np.asarray([
        any(fr2[i - 1] == seq[0] and fr2[i] == seq[0]
            for i in range(1, 8))
        for fr2 in [list(free[0].astype(int)), list(free[1].astype(int))]
    ])
    for row in np.nonzero(never)[0]:
        np.testing.assert_array_equal(noseq[row], free[row])

    # a single-token sequence behaves exactly like stop_token
    stop = int(free[0, 1])
    a = np.asarray(server.generate(prompt, n_new=8, stop_seq=[stop]))
    b = np.asarray(server.generate(prompt, n_new=8, stop_token=stop))
    np.testing.assert_array_equal(a, b)


def test_generate_stop_seq_ragged_and_validation():
    model = _trained_model(steps=30)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    prompt = np.asarray([[2.0, 3.0, 4.0], [0.0, 1.0, 0.0]], np.float32)
    free = np.asarray(server.generate(prompt, n_new=6, lengths=[3, 2]))
    seq = [int(free[0, 1]), int(free[0, 2])]
    got = np.asarray(
        server.generate(prompt, n_new=6, lengths=[3, 2], stop_seq=seq)
    )
    np.testing.assert_array_equal(got[0, :3], free[0, :3])
    assert (got[0, 2:] == seq[-1]).all()

    with pytest.raises(ModelRuntimeError, match="mutually exclusive"):
        server.generate(prompt, n_new=2, stop_token=1, stop_seq=[1, 2])
    with pytest.raises(ModelRuntimeError, match="stop_seq"):
        server.generate(prompt, n_new=2, stop_seq=[])
    with pytest.raises(ModelRuntimeError, match="stop_seq"):
        server.generate(prompt, n_new=2, stop_seq=[0, VOCAB])
