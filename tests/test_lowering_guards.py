"""Per-model lowering-path regression guards.

Each flagship model's training step must keep its measured lowering
profile: contractions on the einsum (MXU) path, elementwise/reduction
work on direct/structured paths, and NO gather/scatter lowerings beyond
the known data-dependent ones (embedding-table gradients).  A backend
change that silently degrades a model to gather/scatter fails here.

(The CNN models have equivalent guards in test_mobile.py and
test_train_oracle.py; test_flash_transformer.py guards the extern
attention routing.)
"""

import numpy as np

from exprgrad_tpu import compile, one_hot
from exprgrad_tpu.models import mnist_gan, tiny_mixer, tiny_transformer


def _assert_clean(stats, allow_scatter=0):
    assert stats.get("einsum", 0) > 0, stats
    assert stats.get("general-scatter", 0) <= allow_scatter, stats
    assert "general-gather" not in stats, stats
    assert "general-unknown" not in stats, stats


def test_tiny_transformer_lowering_profile():
    model = compile(tiny_transformer(vocab=6, dim=16), backend="jax", seed=0)
    rng = np.random.default_rng(0)
    toks = rng.integers(0, 6, (4, 8)).astype(np.float32)
    labels = np.eye(6, dtype=np.float32)[rng.integers(0, 6, (4, 8))]
    model.epoch += 1
    model.apply("train", {"tokens": toks, "labels": labels})
    stats = model.lowering_stats("train")
    # the single scatter is the embedding-table gradient (data-dependent
    # write indices); everything else must stay scatter-free
    _assert_clean(stats, allow_scatter=1)


def test_mixer_lowering_profile():
    pred, loss, train = tiny_mixer()
    model = compile([pred, loss, train], backend="jax", seed=0)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 9, 16)).astype(np.float32)
    y = one_hot(rng.integers(0, 4, 8), 4)
    model.epoch += 1
    model.apply("train", {"x": x, "labels": y})
    _assert_clean(model.lowering_stats("train"))


def test_gan_lowering_profile():
    model = compile(mnist_gan(image_size=64, latent=8), backend="jax", seed=0)
    rng = np.random.default_rng(2)
    samples = rng.normal(size=(8, 64)).astype(np.float32)
    labels = np.ones((8, 1), np.float32)
    model.epoch += 1
    model.apply("fit.discr", {"samples": samples, "labels": labels})
    model.apply("fit.gen", {"seed": rng.normal(size=(8, 8)).astype(np.float32)})
    for target in ("fit.discr", "fit.gen"):
        _assert_clean(model.lowering_stats(target))


def test_seq2seq_lowering_profile():
    """Encoder-decoder train step: MXU einsums + extern attention, with
    only the two embedding-table gradient scatters (src + tgt)."""
    from exprgrad_tpu.models import tiny_seq2seq

    model = compile(tiny_seq2seq(vocab=6, dim=16, heads=2), backend="jax",
                    seed=0)
    rng = np.random.default_rng(2)
    src = rng.integers(1, 6, (4, 6)).astype(np.float32)
    tgt = rng.integers(0, 6, (4, 6)).astype(np.float32)
    labels = np.eye(6, dtype=np.float32)[rng.integers(0, 6, (4, 6))]
    model.epoch += 1
    model.apply("train", {"src": src, "tgt": tgt, "labels": labels})
    stats = model.lowering_stats("train")
    _assert_clean(stats, allow_scatter=2)
    # 3 attention sites (enc self, dec self, cross): each contributes
    # out + lse forward kernels and dq/dk/dv backward kernels
    assert stats.get("extern:attention") == 6, stats
    assert stats.get("extern:attention_grad") == 9, stats
