"""Tiny-transformer tests: the DSL expressing a modern architecture."""

import numpy as np
import pytest

from exprgrad_tpu import compile, one_hot
from exprgrad_tpu.models.transformer import tiny_transformer

VOCAB, SEQ, BATCH = 6, 8, 16


def _cyclic_batch(rng):
    """Sequences of a cyclic +1 pattern with random phase; labels = next."""
    phase = rng.integers(0, VOCAB, BATCH)
    pos = np.arange(SEQ)
    toks = (phase[:, None] + pos[None, :]) % VOCAB
    labels = (toks + 1) % VOCAB
    return toks.astype(np.float32), one_hot(labels, VOCAB).reshape(
        BATCH, SEQ, VOCAB
    )


def test_transformer_compiles_and_predict_shapes():
    model = compile(tiny_transformer(vocab=VOCAB), backend="jax", seed=0)
    rng = np.random.default_rng(0)
    toks, labels = _cyclic_batch(rng)
    probs = model.call("predict", {"tokens": toks})
    assert probs.shape == (BATCH, SEQ, VOCAB)
    np.testing.assert_allclose(probs.sum(-1), np.ones((BATCH, SEQ)), rtol=1e-5)


def test_transformer_learns_cyclic_pattern():
    model = compile(
        tiny_transformer(vocab=VOCAB, eta=0.005), backend="jax", seed=1
    )
    rng = np.random.default_rng(1)
    toks, labels = _cyclic_batch(rng)
    first = float(model.call("loss", {"tokens": toks, "labels": labels})[0])
    for step in range(400):
        model.epoch += 1
        model.apply("train", {"tokens": toks, "labels": labels})
    last = float(model.call("loss", {"tokens": toks, "labels": labels})[0])
    assert last < first * 0.2, (first, last)
    # accuracy on the deterministic pattern (ignore the phase-ambiguous t=0)
    pred = model.call("predict", {"tokens": toks}).argmax(-1)
    want = labels.argmax(-1)
    acc = (pred[:, 1:] == want[:, 1:]).mean()
    assert acc > 0.9, acc


def test_transformer_matches_oracle():
    model_j = compile(tiny_transformer(vocab=VOCAB), backend="jax", seed=2)
    model_i = compile(tiny_transformer(vocab=VOCAB), backend="interp", seed=2)
    for tid in model_i.params:
        model_i.params[tid] = np.array(model_j.params[tid])
    rng = np.random.default_rng(2)
    toks, labels = _cyclic_batch(rng)
    a = model_j.call("loss", {"tokens": toks, "labels": labels})
    b = model_i.call("loss", {"tokens": toks, "labels": labels})
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
