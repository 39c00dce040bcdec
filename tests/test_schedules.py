"""LR schedules as epoch() expressions: the compiled update magnitude
must equal the numpy schedule exactly.

Probe model: loss = sum(w)  =>  dL/dw = 1, so a gradient_descent step
with a scheduled rate moves every weight by exactly -lr(epoch).
"""

import math

import numpy as np
import pytest

from exprgrad_tpu import Fun, compile, input, iters, make_opt, param
from exprgrad_tpu.layers import (
    adam,
    cosine_decay,
    exponential_decay,
    gradient_descent,
    step_decay,
    warmup,
    warmup_cosine,
)


def _lr_probe(opt):
    """Returns lr(epoch) as realized by the compiled training program."""
    x = input("x")
    it = iters("it")
    w = param([2], init_range=(0.5, 0.5), name="w")
    loss = Fun()
    loss[0] = w.raw[it] * x.raw[it]
    net = loss.target("loss").backprop(opt).target("train")
    model = compile(net, dtype="float64", backend="jax")
    wid = next(iter(model.params))

    def lr_at(e):
        model.epoch = e
        before = np.asarray(model.params[wid]).copy()
        model.apply("train", {"x": np.ones(2)})
        after = np.asarray(model.params[wid])
        return float((before - after)[0])

    return lr_at


EPOCHS = [0, 1, 2, 5, 9, 10, 11, 25, 49, 50, 51, 80]


@pytest.mark.parametrize("build,ref", [
    (lambda: step_decay(0.1, 0.5, 10),
     lambda e: 0.1 * 0.5 ** (e // 10)),
    (lambda: exponential_decay(0.1, 0.95),
     lambda e: 0.1 * 0.95 ** e),
    (lambda: cosine_decay(0.1, 50, floor=0.01),
     lambda e: 0.01 + 0.09 * 0.5 * (1 + math.cos(math.pi * min(e, 50) / 50))),
    (lambda: warmup_cosine(0.1, 5, 50),
     lambda e: (0.1 * 0.5 * (1 + math.cos(math.pi * min(e, 50) / 50)))
     * (e / 5 if e < 5 else 1.0)),
    (lambda: warmup(0.2, 10),
     lambda e: 0.2 * (e / 10 if e < 10 else 1.0)),
])
def test_schedule_matches_numpy(build, ref):
    lr_at = _lr_probe(make_opt(gradient_descent, rate=build()))
    for e in EPOCHS:
        np.testing.assert_allclose(lr_at(e), ref(e), rtol=1e-12,
                                   err_msg=f"epoch {e}")


def test_adam_accepts_scheduled_eta():
    """eta as an expression flows through adam's -eta * m_hat math."""
    from exprgrad_tpu import Tensor
    from exprgrad_tpu.models import xor_mlp

    opt = make_opt(adam, eta=warmup_cosine(0.1, warmup_steps=3, total=300))
    model = compile(xor_mlp(opt=opt), backend="jax", seed=0)
    x = Tensor.new([4, 2], [0, 0, 0, 1, 1, 0, 1, 1])
    y = Tensor.new([4, 1], [0.0, 1, 1, 0])
    for _ in range(300):
        model.epoch += 1
        model.apply("train", {"x": x, "y": y})
    pred = np.asarray(model.call("predict", {"x": x})).reshape(-1)
    assert np.abs(pred - np.asarray([0, 1, 1, 0])).max() < 0.2


def test_schedules_agree_across_backends():
    """The schedule expression folds/evaluates identically in the interp
    oracle and the jax backend."""
    mk = lambda: make_opt(gradient_descent,
                          rate=warmup_cosine(0.1, 4, 40, floor=0.005))
    for e in (0, 2, 4, 20, 40, 60):
        ja = _lr_probe(mk())(e)
        io_ = _lr_probe_interp(mk())(e)
        np.testing.assert_allclose(ja, io_, rtol=1e-12)


def _lr_probe_interp(opt):
    x = input("x")
    it = iters("it")
    w = param([2], init_range=(0.5, 0.5), name="w")
    loss = Fun()
    loss[0] = w.raw[it] * x.raw[it]
    net = loss.target("loss").backprop(opt).target("train")
    model = compile(net, dtype="float64", backend="interp")
    wid = next(iter(model.params))

    def lr_at(e):
        model.epoch = e
        before = np.asarray(model.params[wid]).copy()
        model.apply("train", {"x": np.ones(2)})
        after = np.asarray(model.params[wid])
        return float((before - after)[0])

    return lr_at
