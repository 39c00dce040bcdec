"""Depthwise-separable CNN (MobileNet-style) model tests."""

import numpy as np

from exprgrad_tpu import compile, one_hot
from exprgrad_tpu.models import mobile_cnn


def _task(rng, n=32):
    """Class 0: vertical stripes; class 1: horizontal stripes."""
    x = rng.normal(size=(n, 28, 28)).astype(np.float32) * 0.2
    labels = rng.integers(0, 2, n)
    for i, c in enumerate(labels):
        if c == 0:
            x[i, :, ::4] += 2.0
        else:
            x[i, ::4, :] += 2.0
    return x, one_hot(labels, 10)


def test_mobile_cnn_trains_and_is_scatter_free():
    model = compile(mobile_cnn(eta=0.01), seed=0)
    rng = np.random.default_rng(0)
    x, y = _task(rng)
    first = float(model.call("loss", {"x": x, "y": y})[0])
    for _ in range(60):
        model.epoch += 1
        model.apply("fit", {"x": x, "y": y})
    last = float(model.call("loss", {"x": x, "y": y})[0])
    assert last < first * 0.5, (first, last)
    acc = (model.call("predict", {"x": x}).argmax(-1) == y.argmax(-1)).mean()
    assert acc > 0.9, acc
    stats = model.lowering_stats("fit")
    # depthwise stages lower as grouped convs; nothing scatters
    assert stats.get("conv", 0) >= 10
    assert stats.get("general-scatter") is None, stats


def test_mobile_cnn_matches_oracle():
    mj = compile(mobile_cnn(), dtype="float64", seed=1)
    mi = compile(mobile_cnn(), dtype="float64", seed=1, backend="interp")
    mi.params = {k: np.asarray(v) for k, v in mj.params.items()}
    mi.caches = {k: np.asarray(v) for k, v in mj.caches.items()}
    rng = np.random.default_rng(1)
    x, y = _task(rng, n=4)
    args = {"x": x.astype(np.float64), "y": y.astype(np.float64)}
    np.testing.assert_allclose(
        mj.call("loss", args), mi.call("loss", args), rtol=1e-9
    )


def test_mobile_fit_hlo_is_gather_and_scatter_free(tmp_path):
    """The ENTIRE training program (fwd + derived bwd + adam) compiles
    with zero gather and zero scatter HLO ops — every read/write lowers
    to convs, dots, slices, repeats and elementwise fusions."""
    model = compile(mobile_cnn(), seed=0)
    path = tmp_path / "fit.hlo"
    model.save_hlo(str(path), "fit", {"x": [8, 28, 28], "y": [8, 10]})
    text = path.read_text()
    assert text.count("gather(") == 0
    assert text.count("scatter(") == 0
    assert text.count("convolution(") >= 10
