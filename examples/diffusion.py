"""Denoising diffusion on a 2-D two-moons-style distribution.

The denoiser, its sinusoidal time embedding, and the forward-noising
step are all DSL kernels (models/diffusion.py); the compiler derives
the training program symbolically.  Host-side ancestral sampling then
drives the compiled "predict" target.
"""

import numpy as np

from exprgrad_tpu import compile
from exprgrad_tpu.models import (
    ddpm_sample,
    ddpm_schedule,
    diffusion_train_batch,
    tiny_diffusion,
)

STEPS = 2500


def two_moons(rng, n):
    """Two interleaved half-circles."""
    half = n // 2
    ang = rng.uniform(0, np.pi, half)
    top = np.stack([np.cos(ang), np.sin(ang)], 1)
    bot = np.stack([1 - np.cos(ang), -np.sin(ang) + 0.4], 1)
    pts = np.concatenate([top, bot])[: n]
    return pts + 0.05 * rng.standard_normal((n, 2))


def main() -> None:
    model = compile(tiny_diffusion(data_dim=2, hidden=64, emb=8),
                    backend="jax", seed=0)
    _, _, abar = ddpm_schedule(50)
    rng = np.random.default_rng(0)
    for step in range(STEPS):
        model.epoch += 1
        batch = diffusion_train_batch(two_moons(rng, 256), abar, rng)
        model.apply("train", batch)
        if step % 500 == 0:
            loss = float(np.asarray(model.call("loss", batch))[0])
            print(f"step {step:5d}  loss {loss:.3f}")

    samples = ddpm_sample(model, 500, steps=50, seed=1)
    data = two_moons(rng, 500)
    print("sample mean :", samples.mean(0).round(3).tolist(),
          " data mean :", data.mean(0).round(3).tolist())
    print("sample std  :", samples.std(0).round(3).tolist(),
          " data std  :", data.std(0).round(3).tolist())


if __name__ == "__main__":
    main()
