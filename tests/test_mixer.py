"""MLP-Mixer model tests: a second modern architecture in the DSL."""

import numpy as np
import pytest

from exprgrad_tpu import compile, one_hot
from exprgrad_tpu.models import tiny_mixer

TOKENS, DIM, CLASSES, BATCH = 9, 16, 4, 32


def _task(rng, n=BATCH):
    """Class = index of the quadrant-summed strongest token group."""
    x = rng.normal(size=(n, TOKENS, DIM)).astype(np.float32)
    boost = rng.integers(0, CLASSES, n)
    for i, c in enumerate(boost):
        x[i, c * 2:(c * 2) + 2, :] += 2.0
    return x, one_hot(boost, CLASSES)


def test_mixer_shapes_and_probabilities():
    model = compile(tiny_mixer(), backend="jax", seed=0)
    rng = np.random.default_rng(0)
    x, labels = _task(rng)
    probs = model.call("predict", {"x": x})
    assert probs.shape == (BATCH, CLASSES)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_mixer_learns():
    model = compile(tiny_mixer(eta=0.01), backend="jax", seed=1)
    rng = np.random.default_rng(1)
    x, labels = _task(rng)
    first = float(model.call("loss", {"x": x, "labels": labels})[0])
    for _ in range(150):
        model.epoch += 1
        model.apply("train", {"x": x, "labels": labels})
    last = float(model.call("loss", {"x": x, "labels": labels})[0])
    assert last < first * 0.3, (first, last)
    acc = (
        model.call("predict", {"x": x}).argmax(-1) == labels.argmax(-1)
    ).mean()
    assert acc > 0.9, acc


def test_mixer_matches_oracle():
    mj = compile(tiny_mixer(), dtype="float64", backend="jax", seed=2)
    mi = compile(tiny_mixer(), dtype="float64", backend="interp", seed=2)
    mi.params = {k: np.asarray(v) for k, v in mj.params.items()}
    mi.caches = {k: np.asarray(v) for k, v in mj.caches.items()}
    rng = np.random.default_rng(2)
    x, labels = _task(rng, n=8)
    a = mj.call("predict", {"x": x.astype(np.float64)})
    b = mi.call("predict", {"x": x.astype(np.float64)})
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-12)


def test_mixer_lowering_is_mxu_friendly():
    """The mixer's matmuls must all hit the einsum (MXU) path; no scatter."""
    model = compile(tiny_mixer(), backend="jax", seed=3)
    rng = np.random.default_rng(3)
    x, labels = _task(rng)
    model.apply("train", {"x": x, "labels": labels})
    stats = model.lowering_stats("train")
    assert stats.get("einsum", 0) >= 10
    assert stats.get("general-scatter") is None
