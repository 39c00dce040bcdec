"""RecurrentServer (models/rnn_serve.py): stateful O(hidden) decoding.

Oracle: greedy continuation via the compiled model's "predict" target,
recomputed from scratch each step (the recurrence is deterministic, so
carrying state must reproduce it token for token)."""

import numpy as np
import pytest

from exprgrad_tpu import compile
from exprgrad_tpu.errors import ModelRuntimeError
from exprgrad_tpu.models import RecurrentServer, tiny_recurrent_lm


def _trained(cell="lstm", layers=1, vocab=12, seed=0):
    m = compile(tiny_recurrent_lm(vocab=vocab, dim=10, hidden=14,
                                  cell=cell, layers=layers, eta=0.02),
                backend="jax", seed=seed)
    rng = np.random.default_rng(seed)
    toks = rng.integers(0, vocab, (4, 9)).astype(np.float32)
    labels = np.eye(vocab, dtype=np.float32)[
        rng.integers(0, vocab, (4, 9))]
    for _ in range(5):
        m.epoch += 1
        m.apply("train", {"tokens": toks, "labels": labels})
    return m


def _greedy_oracle(model, prompt, n_new):
    toks = [list(map(int, row)) for row in prompt]
    for _ in range(n_new):
        window = np.asarray(toks, np.float32)
        probs = np.asarray(model.call("predict", {"tokens": window}))
        for r in range(len(toks)):
            toks[r].append(int(probs[r, -1].argmax()))
    return np.asarray([row[prompt.shape[1]:] for row in toks])


@pytest.mark.parametrize("cell,layers", [("lstm", 1), ("gru", 2),
                                         ("rnn", 1)])
def test_greedy_matches_predict_target(cell, layers):
    model = _trained(cell=cell, layers=layers)
    srv = RecurrentServer(model)
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, 12, (3, 5))
    want = _greedy_oracle(model, prompt, 7)
    got = np.asarray(srv.generate(prompt, n_new=7))
    np.testing.assert_array_equal(got, want)


def test_sampling_is_well_formed():
    srv = RecurrentServer(_trained())
    out = np.asarray(srv.generate(np.zeros((2, 3), np.int32), n_new=6,
                                  temperature=0.8, seed=4))
    assert out.shape == (2, 6)
    assert ((out >= 0) & (out < 12)).all()
    # different seeds explore different continuations (overwhelmingly)
    out2 = np.asarray(srv.generate(np.zeros((2, 3), np.int32), n_new=6,
                                   temperature=0.8, seed=5))
    assert out.shape == out2.shape


def test_rejects_non_recurrent_model():
    from exprgrad_tpu.models import tiny_transformer

    m = compile(tiny_transformer(vocab=6, dim=8), backend="jax", seed=0)
    with pytest.raises(ModelRuntimeError, match="tiny_recurrent_lm"):
        RecurrentServer(m)


def test_validates_inputs():
    srv = RecurrentServer(_trained())
    with pytest.raises(ModelRuntimeError, match="n_new"):
        srv.generate(np.zeros((1, 2), np.int32), n_new=0)
    with pytest.raises(ModelRuntimeError, match="prompt"):
        srv.generate(np.zeros((3,), np.int32), n_new=2)
