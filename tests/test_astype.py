"""Model.astype: post-training precision casting for serving."""

import numpy as np
import pytest

from exprgrad_tpu import Tensor, compile
from exprgrad_tpu.models import xor_mlp


def _trained():
    model = compile(xor_mlp(rate=0.5), backend="jax", seed=0)
    x = Tensor.new([4, 2], [0, 0, 0, 1, 1, 0, 1, 1])
    y = Tensor.new([4, 1], [0.0, 1, 1, 0])
    for _ in range(300):
        model.epoch += 1
        model.apply("train", {"x": x, "y": y})
    return model, x


def test_astype_bfloat16_serves_close_to_f32():
    model, x = _trained()
    f32 = np.asarray(model.call("predict", {"x": x}), np.float32)
    bf16 = model.astype("bfloat16")
    out = np.asarray(bf16.call("predict", {"x": x}), np.float32)
    assert str(np.asarray(
        bf16.params[next(iter(bf16.params))]).dtype) == "bfloat16"
    np.testing.assert_allclose(out, f32, atol=0.05)
    # original untouched
    assert np.asarray(model.params[next(iter(model.params))]).dtype == \
        np.float32


def test_astype_carries_epoch_and_caches():
    from exprgrad_tpu import make_opt
    from exprgrad_tpu.layers import adam

    model = compile(xor_mlp(opt=make_opt(adam, eta=0.05)), backend="jax",
                    seed=0)
    x = Tensor.new([4, 2], [0, 0, 0, 1, 1, 0, 1, 1])
    y = Tensor.new([4, 1], [0.0, 1, 1, 0])
    for _ in range(20):
        model.epoch += 1
        model.apply("train", {"x": x, "y": y})
    cast = model.astype("bfloat16")
    assert cast.epoch == model.epoch
    assert set(cast.caches) == set(model.caches)
    for tid in model.caches:
        assert str(np.asarray(cast.caches[tid]).dtype) == "bfloat16"


def test_astype_preserves_rng_stream():
    """The cast model inherits the original's rand()/dropout stream (no
    fresh unseeded rng) and skips the throwaway re-init."""
    model, _ = _trained()
    before = model._rng.bit_generator.state
    cast = model.astype("bfloat16")
    assert cast._rng.bit_generator.state == before
    # params are exactly the casts of the originals, not re-draws
    for tid in model.params:
        np.testing.assert_array_equal(
            np.asarray(cast.params[tid]),
            np.asarray(model.params[tid]).astype(
                np.asarray(cast.params[tid]).dtype),
        )


def test_astype_roundtrip_float32():
    model, x = _trained()
    back = model.astype("bfloat16").astype("float32")
    a = np.asarray(back.call("predict", {"x": x}), np.float32)
    b = np.asarray(model.call("predict", {"x": x}), np.float32)
    np.testing.assert_allclose(a, b, atol=0.05)


def test_astype_bf16_checkpoint_roundtrip(tmp_path):
    """bfloat16 tensors serialize by dtype NAME (their .str is raw void
    '<V2', which would reload as typeless bytes)."""
    from exprgrad_tpu.io import load_model, save_model

    model, x = _trained()
    bf16 = model.astype("bfloat16")
    want = np.asarray(bf16.call("predict", {"x": x}), np.float32)
    path = str(tmp_path / "bf16.egt")
    save_model(bf16, path)
    re = load_model(path, backend="jax")
    assert str(np.asarray(re.params[next(iter(re.params))]).dtype) == \
        "bfloat16"
    got = np.asarray(re.call("predict", {"x": x}), np.float32)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_astype_flash_server_bf16():
    """FlashLMServer consumes a bf16-cast flash_transformer."""
    from exprgrad_tpu import one_hot
    from exprgrad_tpu.models import FlashLMServer, flash_transformer

    model = compile(flash_transformer(vocab=6, dim=16, heads=2, eta=0.01),
                    seed=1, backend="jax")
    rng = np.random.default_rng(0)
    toks = ((rng.integers(0, 6, 16)[:, None] + np.arange(8)[None, :]) % 6
            ).astype(np.float32)
    labels = one_hot(((toks + 1) % 6).astype(int), 6).reshape(16, 8, 6)
    for _ in range(150):
        model.epoch += 1
        model.apply("train", {"tokens": toks, "labels": labels})

    server = FlashLMServer(model.astype("bfloat16"))
    out = np.asarray(server.generate(
        np.asarray([[2.0, 3.0, 4.0]], np.float32), n_new=6))[0].astype(int)
    want = [(2 + i) % 6 for i in range(3, 9)]
    assert list(out) == want, (out, want)
