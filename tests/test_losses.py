"""New losses (huber, l1_loss, smoothed_cross_entropy): forward values
match numpy, and symbolic gradients match finite differences / closed
forms on both backends."""

import numpy as np
import pytest

from exprgrad_tpu import Fun, compile, input, iters, make_opt, param, sq
from exprgrad_tpu.layers import (
    gradient_descent,
    huber,
    l1_loss,
    smoothed_cross_entropy,
)


def _loss_and_grad(loss_layer, shape, backend, **kw):
    """Model: loss(w, x) with param w; returns (loss(w0), dL/dw, w0)."""
    x = input("x")
    w = param(list(shape), init_range=(-0.8, 0.8), name="w")
    net = loss_layer(w, x, **kw).target("loss").backwards().grad(w).target(
        "dw"
    )
    model = compile(net, dtype="float64", backend=backend)
    w0 = np.asarray(model.params[next(iter(model.params))]).copy()
    xv = np.linspace(-1.5, 1.5, int(np.prod(shape))).reshape(shape)
    lv = float(np.asarray(model.call("loss", {"x": xv}))[0])
    gv = np.asarray(model.call("dw", {"x": xv}))
    return lv, gv, w0, xv


@pytest.mark.parametrize("backend", ["interp", "jax"])
def test_huber_matches_numpy(backend):
    delta = 0.7
    lv, gv, w, x = _loss_and_grad(huber, (8,), backend, delta=delta)
    d = w - x
    want = np.where(np.abs(d) < delta, 0.5 * d * d,
                    delta * (np.abs(d) - 0.5 * delta)).sum() / 8
    np.testing.assert_allclose(lv, want, rtol=1e-12)
    gwant = np.where(np.abs(d) < delta, d, delta * np.sign(d)) / 8
    np.testing.assert_allclose(gv, gwant, rtol=1e-12)


@pytest.mark.parametrize("backend", ["interp", "jax"])
def test_l1_matches_numpy(backend):
    lv, gv, w, x = _loss_and_grad(l1_loss, (8,), backend)
    np.testing.assert_allclose(lv, np.abs(w - x).sum() / 8, rtol=1e-12)
    np.testing.assert_allclose(gv, np.sign(w - x) / 8, rtol=1e-12)


@pytest.mark.parametrize("backend", ["interp", "jax"])
def test_smoothed_cross_entropy_matches_numpy(backend):
    alpha, K = 0.1, 4

    def layer(w, x):
        return smoothed_cross_entropy(w, x, classes=K, alpha=alpha)

    lv, gv, w, x = _loss_and_grad(layer, (3, K), backend)
    # x plays the labels role here; w the predicted probabilities
    # (signed init values clamp at 1e-12, same as the kernel)
    p = np.maximum(w, 1e-12)
    t = (1 - alpha) * x + alpha / K
    want = -(t * np.log(p)).sum() / 3
    np.testing.assert_allclose(lv, want, rtol=1e-10)
    gwant = np.where(w > 1e-12, -t / p, 0.0) / 3
    np.testing.assert_allclose(gv, gwant, rtol=1e-10)


def test_huber_trains_regression():
    """End to end: huber regression converges under sgd despite an
    outlier target (where mse would chase it harder)."""
    x = input("x")
    it = iters("it")
    w = param([6], init_range=(0.0, 0.0), name="w")
    net = huber(w, x, delta=0.5).target("loss").backprop(
        make_opt(gradient_descent, rate=0.5)
    ).target("train")
    model = compile(net, dtype="float64", backend="jax")
    target = np.asarray([0.1, -0.2, 0.3, 0.0, 5.0, -0.1])  # one outlier
    for _ in range(200):
        model.epoch += 1
        model.apply("train", {"x": target})
    wv = np.asarray(model.params[next(iter(model.params))])
    np.testing.assert_allclose(wv, target, atol=0.05)
