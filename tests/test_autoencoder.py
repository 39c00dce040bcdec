"""Conv-autoencoder training: pooling/upsampling round trip with derived
gradients (upsample grad = scatter-free window sum)."""

import numpy as np

from exprgrad_tpu import compile
from exprgrad_tpu.models import conv_autoencoder


def _data(rng, n=16, size=16):
    x = rng.normal(0, 0.1, (n, size, size)).astype(np.float32)
    for i in range(n):
        c = rng.integers(4, size - 4)
        x[i, c - 3 : c + 3, c - 3 : c + 3] += 0.8
    return np.clip(x, 0, 1)


def test_autoencoder_trains():
    rng = np.random.default_rng(0)
    x = _data(rng)
    model = compile(conv_autoencoder(size=16, eta=0.01), backend="jax", seed=0)
    first = float(model.call("loss", {"x": x})[0])
    for _ in range(60):
        model.epoch += 1
        model.apply("train", {"x": x})
    last = float(model.call("loss", {"x": x})[0])
    assert last < first * 0.7, (first, last)

    stats = model.lowering_stats("train")
    assert "general-scatter" not in stats, stats
    # the decoder/encoder convs and their grads hit the conv path
    assert stats.get("conv", 0) >= 4, stats

    encoded = model.call("encode", {"x": x})
    assert encoded.shape == (16, 7, 7, 8)
    decoded = model.call("decode", {"x": x})
    assert decoded.shape == (16, 12, 12, 1)


def test_autoencoder_matches_oracle():
    rng = np.random.default_rng(1)
    x = _data(rng, n=4)
    mj = compile(conv_autoencoder(size=16), dtype="float64", backend="jax",
                 seed=2)
    mi = compile(conv_autoencoder(size=16), dtype="float64", backend="interp",
                 seed=2)
    for tid in mi.params:
        mi.params[tid] = np.array(mj.params[tid])
    a = mj.call("loss", {"x": x})
    b = mi.call("loss", {"x": x})
    np.testing.assert_allclose(a, b, rtol=1e-10)
