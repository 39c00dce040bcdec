"""GAN training with per-target graph routing (reference examples/gan).

Runs on fashion-MNIST IDX files under ``data/`` if present, else on a
synthetic dataset.  Periodically writes a generated sample image.
"""

import os

import numpy as np

from exprgrad_tpu import Tensor, compile, concat_first, remap, select_random_samples
from exprgrad_tpu.io import load_idx, save_ppm
from exprgrad_tpu.models import mnist_gan

LATENT = 32
IMAGE_SIZE = 28 * 28


def load_dataset():
    path = "data/train-images-idx3-ubyte"
    if os.path.exists(path):
        x = load_idx(path).reshape(-1, IMAGE_SIZE).astype(np.float32)
        return remap(x, 0, 255, 0.1, 0.9)
    print("no dataset under data/, using synthetic data")
    rng = np.random.default_rng(0)
    x = rng.normal(0.5, 0.2, (4096, IMAGE_SIZE)).astype(np.float32)
    return np.clip(x, 0.1, 0.9)


def main(steps: int = 200) -> None:
    train_x = load_dataset()
    model = compile(mnist_gan(latent=LATENT, image_size=IMAGE_SIZE), seed=0)
    rng = np.random.default_rng(0)

    for step in range(steps):
        model.epoch += 1
        # discriminator: half generated, half real
        count = 32
        seed = Tensor.rand([count, LATENT], rng=rng)
        generated = model.call("gen", {"seed": seed})
        samples = concat_first(
            generated, select_random_samples(train_x, count, rng=rng)
        )
        labels = concat_first(
            Tensor.new([count, 1], 1.0), Tensor.new([count, 1], 0.0)
        )
        model.apply("fit.discr", {"samples": samples, "labels": labels})

        # generator
        seed = Tensor.rand([64, LATENT], rng=rng)
        model.apply("fit.gen", {"seed": seed})

        if step % 20 == 0:
            d_loss = model.call(
                "loss.discr", {"samples": samples, "labels": labels}
            )
            g_loss = model.call("loss.gen", {"seed": seed})
            print(
                f"step {step}  discr {float(d_loss[0]):.4f} "
                f"gen {float(g_loss[0]):.4f}"
            )
            sample = model.call(
                "gen", {"seed": Tensor.rand([1, LATENT], rng=rng)}
            )
            image = (sample.reshape(28, 28) * 255).clip(0, 255).astype(np.uint8)
            save_ppm(image, "sample.ppm")


if __name__ == "__main__":
    main()
