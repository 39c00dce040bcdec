"""GAN machinery tests: cond target routing, disjoint optimizer updates,
random tensors, multi-target models (reference examples/gan/gan.nim)."""

import numpy as np

from exprgrad_tpu import Tensor, compile
from exprgrad_tpu.models import mnist_gan


def test_gan_targets_and_updates():
    image_size, latent = 16, 4
    model = compile(
        mnist_gan(latent=latent, image_size=image_size), backend="jax", seed=0
    )
    assert set(model.program.targets) == {
        "gen", "discr", "fit.gen", "loss.gen", "fit.discr", "loss.discr"
    }

    seed_in = Tensor.rand([6, latent], rng=np.random.default_rng(0))
    fake = model.call("gen", {"seed": seed_in})
    assert fake.shape == (6, image_size)
    assert fake.min() >= 0 and fake.max() <= 1  # sigmoid output

    samples = Tensor.rand([6, image_size], rng=np.random.default_rng(1))
    labels = Tensor.new([6, 1], 0.0)
    scores = model.call("discr", {"samples": samples})
    assert scores.shape == (6, 1)

    params_before = {k: np.array(v) for k, v in model.params.items()}
    # discriminator step must not move generator params
    model.apply("fit.discr", {"samples": samples, "labels": labels})
    gen_params = 6  # 3 dense layers x (weights, bias)
    moved = [
        k
        for k, v in model.params.items()
        if not np.allclose(np.array(v), params_before[k])
    ]
    assert len(moved) == 6  # exactly the discriminator's 3 dense layers
    # generator step must not move discriminator params
    params_before = {k: np.array(v) for k, v in model.params.items()}
    model.apply("fit.gen", {"seed": seed_in})
    moved_gen = [
        k
        for k, v in model.params.items()
        if not np.allclose(np.array(v), params_before[k])
    ]
    assert len(moved_gen) == 6
    assert not set(moved) & set(moved_gen)


def test_gan_losses_move():
    image_size, latent = 16, 4
    model = compile(
        mnist_gan(latent=latent, image_size=image_size, rate=0.5),
        backend="jax",
        seed=0,
    )
    rng = np.random.default_rng(0)
    gen_losses = []
    for _ in range(10):
        seed_in = Tensor.rand([8, latent], rng=rng)
        gen_losses.append(float(model.call("loss.gen", {"seed": seed_in})[0]))
        model.apply("fit.gen", {"seed": seed_in})
    # generator learns to fool the (fixed) discriminator
    assert gen_losses[-1] < gen_losses[0]
