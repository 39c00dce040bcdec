"""Variational autoencoder on a 2-D two-moons distribution.

Encoder posterior, reparameterization, and the analytic-KL ELBO are all
DSL kernels (models/vae.py); encode/decode run as separate compiled
targets off the same parameter graph.
"""

import numpy as np

from exprgrad_tpu import compile
from exprgrad_tpu.models import tiny_vae, vae_sample, vae_train_batch

STEPS = 2500


def two_moons(rng, n):
    half = n // 2
    ang = rng.uniform(0, np.pi, half)
    top = np.stack([np.cos(ang), np.sin(ang)], 1)
    bot = np.stack([1 - np.cos(ang), -np.sin(ang) + 0.4], 1)
    pts = np.concatenate([top, bot])[: n]
    return pts + 0.05 * rng.standard_normal((n, 2))


def main() -> None:
    model = compile(tiny_vae(data_dim=2, latent=2, hidden=48, beta=0.2),
                    backend="jax", seed=0)
    rng = np.random.default_rng(0)
    for step in range(STEPS):
        model.epoch += 1
        batch = vae_train_batch(two_moons(rng, 256), 2, rng)
        model.apply("train", batch)
        if step % 500 == 0:
            loss = float(np.asarray(model.call("loss", batch))[0])
            print(f"step {step:5d}  elbo loss {loss:.4f}")

    x = two_moons(rng, 256).astype(np.float32)
    z = np.asarray(model.call("encode", {"x": x}))
    xhat = np.asarray(model.call("decode", {"z": z}))
    print("reconstruction mse:", round(float(np.mean((xhat - x) ** 2)), 5))
    samples = vae_sample(model, 400, latent=2, seed=1)
    print("sample mean:", samples.mean(0).round(3).tolist(),
          " data mean:", x.mean(0).round(3).tolist())


if __name__ == "__main__":
    main()
