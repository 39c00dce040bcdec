"""Encoder-decoder model family: the sequence-reversal task requires
cross-attention (output position i must read source position s-1-i), so
training to high accuracy proves the whole encoder/decoder/cross seam."""

import numpy as np

from exprgrad_tpu import compile, one_hot
from exprgrad_tpu.models import tiny_seq2seq

VOCAB = 8


def _batch(rng, n=32, s=6):
    src = rng.integers(1, VOCAB, (n, s))
    out = src[:, ::-1]
    tgt = np.concatenate([np.zeros((n, 1), int), out[:, :-1]], 1)
    return (src.astype(np.float32), tgt.astype(np.float32),
            one_hot(out, VOCAB).reshape(n, s, VOCAB))


def test_seq2seq_learns_reversal():
    model = compile(tiny_seq2seq(vocab=VOCAB, dim=16, heads=2, eta=0.02),
                    backend="jax", seed=0)
    rng = np.random.default_rng(0)
    src, tgt, labels = _batch(rng)
    first = float(model.call("loss", {"src": src, "tgt": tgt,
                                      "labels": labels})[0])
    for _ in range(300):
        model.epoch += 1
        src, tgt, labels = _batch(rng)
        model.apply("train", {"src": src, "tgt": tgt, "labels": labels})
    # held-out sequences
    src, tgt, labels = _batch(rng, n=8)
    last = float(model.call("loss", {"src": src, "tgt": tgt,
                                     "labels": labels})[0])
    pred = np.asarray(model.call("predict",
                                 {"src": src, "tgt": tgt})).argmax(-1)
    acc = (pred == src[:, ::-1].astype(int)).mean()
    assert last < first * 0.1
    assert acc > 0.9, acc


def test_seq2seq_interp_parity():
    """jax backend and numpy oracle agree through encoder, decoder,
    cross-attention externs, and two training steps."""
    net = tiny_seq2seq(vocab=VOCAB, dim=16, heads=2, eta=0.02)
    mj = compile(net, backend="jax", seed=3)
    net2 = tiny_seq2seq(vocab=VOCAB, dim=16, heads=2, eta=0.02)
    mi = compile(net2, backend="interp", seed=3)
    for tid in mj.params:
        mi.params[tid] = np.asarray(mj.params[tid]).copy()
    rng = np.random.default_rng(1)
    src, tgt, labels = _batch(rng, n=4)
    args = {"src": src, "tgt": tgt, "labels": labels}
    for _ in range(2):
        lj = float(mj.call("loss", args)[0])
        li = float(mi.call("loss", args)[0])
        assert abs(lj - li) < 1e-4, (lj, li)
        mj.epoch += 1
        mi.epoch += 1
        mj.apply("train", args)
        mi.apply("train", args)
    pj = np.asarray(mj.call("predict", {"src": src, "tgt": tgt}))
    pi = np.asarray(mi.call("predict", {"src": src, "tgt": tgt}))
    np.testing.assert_allclose(pj, pi, rtol=1e-4, atol=1e-5)


def test_greedy_decode_reverses_free_running():
    """FREE-RUNNING generation (no teacher forcing): greedy_decode feeds
    its own outputs back and still reverses held-out sequences."""
    from exprgrad_tpu.models import greedy_decode

    model = compile(tiny_seq2seq(vocab=VOCAB, dim=16, heads=2, eta=0.02),
                    backend="jax", seed=0)
    rng = np.random.default_rng(0)
    for _ in range(300):
        model.epoch += 1
        src, tgt, labels = _batch(rng)
        model.apply("train", {"src": src, "tgt": tgt, "labels": labels})
    src, _, _ = _batch(rng, n=4)
    out = greedy_decode(model, src, n_new=6)
    acc = (out == src[:, ::-1].astype(int)).mean()
    assert acc > 0.9, (acc, out)
