"""Recurrent family (layers.lstm/gru/rnn_tanh, ops/recurrent.py,
models.tiny_recurrent_lm).

The recurrence is a lax.scan extern with a registered BPTT backward;
the numpy oracle runs explicit loops with a HAND-DERIVED backward, so
backend-vs-oracle training parity validates the BPTT math against
jax.vjp, and finite differences validate both against the loss itself.
"""

import numpy as np
import pytest

from exprgrad_tpu import Fun, compile, input, iters, to_scalar
from exprgrad_tpu.fun import make_opt
from exprgrad_tpu.layers import adam, gradient_descent, gru, lstm, rnn_tanh
from exprgrad_tpu.models import tiny_recurrent_lm

CELLS = {"lstm": lstm, "gru": gru, "rnn_tanh": rnn_tanh}
DIM, H = 6, 10


def _train_graph(cell_fn, opt=None):
    x = input("x")
    t = input("t")
    y = cell_fn(x, DIM, H)
    i, j, k = iters("i", "j", "k")
    loss = Fun("loss")
    loss[0] = (y[i, j, k] - t[i, j, k]) ** 2 / to_scalar(
        x.shape[0] * x.shape[1])
    return (
        loss.target("loss")
        .backwards()
        .optimize(opt or make_opt(adam, eta=0.02))
        .target("train")
    )


def _args(rng, n=2, T=7):
    return {"x": rng.normal(size=(n, T, DIM)).astype(np.float32),
            "t": rng.normal(size=(n, T, H)).astype(np.float32)}


@pytest.mark.parametrize("cell", sorted(CELLS))
def test_forward_matches_oracle(cell):
    rng = np.random.default_rng(1)
    g = _train_graph(CELLS[cell])
    args = _args(rng)
    a = np.asarray(compile(g, backend="jax", seed=4).call("loss", args))
    b = np.asarray(compile(g, backend="interp", seed=4).call("loss", args))
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.parametrize("cell", sorted(CELLS))
def test_bptt_parity_between_backends(cell):
    """Hand-derived numpy BPTT == jax.vjp of the scan, step for step
    through three adam updates."""
    rng = np.random.default_rng(2)
    g = _train_graph(CELLS[cell])
    mj = compile(g, backend="jax", seed=5)
    mi = compile(g, backend="interp", seed=5)
    args = _args(rng)
    for _ in range(3):
        mj.epoch += 1
        mi.epoch += 1
        mj.apply("train", args)
        mi.apply("train", args)
    for tid in mj.params:
        np.testing.assert_allclose(
            np.asarray(mj.params[tid]), np.asarray(mi.params[tid]),
            atol=5e-6)


@pytest.mark.parametrize("cell", ["lstm", "gru"])
def test_recurrent_gradient_matches_finite_differences(cell):
    """The wh gradient (the purely-recurrent path BPTT must thread
    through time) matches central finite differences of the loss."""
    def build():
        return compile(
            _train_graph(CELLS[cell],
                         opt=make_opt(gradient_descent, rate=1.0)),
            backend="interp", seed=7)

    rng = np.random.default_rng(3)
    args = _args(rng, n=2, T=5)
    model = build()
    wh_tid = next(t for t in model.program.params
                  if model.program.tensors[t].name.endswith(".wh"))
    before = np.asarray(model.params[wh_tid]).copy()
    model.epoch += 1
    model.apply("train", args)
    grad = before - np.asarray(model.params[wh_tid])

    eps = 1e-3
    for (i, j) in [(0, 0), (3, 7), (H - 1, 2)]:
        vals = []
        for sign in (+1, -1):
            m2 = build()
            p = np.asarray(m2.params[wh_tid]).copy()
            p[i, j] += sign * eps
            m2.params[wh_tid] = p
            vals.append(float(m2.call("loss", args)[0]))
        fd = (vals[0] - vals[1]) / (2 * eps)
        assert abs(fd - grad[i, j]) < 5e-3 * max(1.0, abs(fd)), (
            f"{cell} wh[{i},{j}]: fd {fd} vs autodiff {grad[i, j]}")


def test_lstm_lm_learns_cycle():
    """tiny_recurrent_lm memorizes a deterministic token cycle — the
    task needs state (token alone does not determine the successor)."""
    vocab = 6
    seq = np.array([0, 1, 2, 0, 3, 4, 0, 5, 1, 0, 1, 2, 0, 3, 4, 0],
                   np.float32)
    toks = seq[None, :-1]
    labels = np.eye(vocab, dtype=np.float32)[seq[1:].astype(int)][None]
    m = compile(tiny_recurrent_lm(vocab=vocab, dim=12, hidden=24,
                                  eta=0.02),
                backend="jax", seed=1)
    args = {"tokens": toks, "labels": labels}
    l0 = float(np.asarray(m.call("loss", args))[0])
    for _ in range(150):
        m.epoch += 1
        m.apply("train", args)
    l1 = float(np.asarray(m.call("loss", args))[0])
    assert np.isfinite(l1) and l1 < l0 * 0.25, (l0, l1)
    pred = np.asarray(m.call("predict", args)).argmax(-1)[0]
    # positions following the repeated '0' are history-dependent: a
    # memoryless map cannot get them all right
    acc = float((pred[4:] == seq[5:].astype(int)).mean())
    assert acc > 0.8, acc


def test_stacked_gru_lm_backends_agree():
    m_args = dict(vocab=5, dim=8, hidden=12, cell="gru", layers=2)
    rng = np.random.default_rng(6)
    toks = rng.integers(0, 5, (2, 6)).astype(np.float32)
    labels = np.eye(5, dtype=np.float32)[rng.integers(0, 5, (2, 6))]
    args = {"tokens": toks, "labels": labels}
    mj = compile(tiny_recurrent_lm(**m_args), backend="jax", seed=2)
    mi = compile(tiny_recurrent_lm(**m_args), backend="interp", seed=2)
    np.testing.assert_allclose(
        np.asarray(mj.call("predict", args)),
        np.asarray(mi.call("predict", args)), atol=1e-5)
    mj.epoch += 1
    mi.epoch += 1
    mj.apply("train", args)
    mi.apply("train", args)
    for tid in mj.params:
        np.testing.assert_allclose(
            np.asarray(mj.params[tid]), np.asarray(mi.params[tid]),
            atol=5e-6)


def test_validation():
    with pytest.raises(ValueError, match="cell"):
        tiny_recurrent_lm(cell="bogus")
    with pytest.raises(ValueError, match="layers"):
        tiny_recurrent_lm(layers=0)
    with pytest.raises(ValueError, match="hidden"):
        lstm(input("x"), 4, 0)


@pytest.mark.parametrize("seed", range(6))
def test_recurrent_fuzz_shapes(seed):
    """Random (batch, T, in, hidden, cell, stacking): forward + one
    train step agree across backends — the shape-generalization net for
    the scan externs and their BPTT."""
    rng = np.random.default_rng(900 + seed)
    n = int(rng.integers(1, 4))
    T = int(rng.integers(1, 9))
    din = int(rng.integers(1, 9))
    hid = int(rng.integers(1, 12))
    cell = str(rng.choice(sorted(CELLS)))

    x = input("x")
    t = input("t")
    y = CELLS[cell](x, din, hid)
    if rng.integers(0, 2):
        y = CELLS[cell](y, hid, hid, prefix="l2.")
    i, j, k = iters("i", "j", "k")
    loss = Fun("loss")
    loss[0] = (y[i, j, k] - t[i, j, k]) ** 2
    g = (loss.target("loss").backwards()
         .optimize(make_opt(adam, eta=0.03)).target("train"))
    args = {"x": rng.normal(size=(n, T, din)).astype(np.float32),
            "t": rng.normal(size=(n, T, hid)).astype(np.float32)}
    mj = compile(g, backend="jax", seed=seed)
    mi = compile(g, backend="interp", seed=seed)
    np.testing.assert_allclose(
        np.asarray(mj.call("loss", args)),
        np.asarray(mi.call("loss", args)), atol=1e-5, rtol=1e-5)
    mj.epoch += 1
    mi.epoch += 1
    mj.apply("train", args)
    mi.apply("train", args)
    for tid in mj.params:
        np.testing.assert_allclose(
            np.asarray(mj.params[tid]), np.asarray(mi.params[tid]),
            atol=1e-5, err_msg=f"seed={seed} cell={cell} "
            f"n={n} T={T} din={din} hid={hid}")
