"""VAE family (models/vae.py): reparameterized training, analytic KL,
and the encode/decode entry points."""

import numpy as np

from exprgrad_tpu import compile
from exprgrad_tpu.models import tiny_vae, vae_sample, vae_train_batch


def _two_modes(rng, n):
    m = rng.integers(0, 2, n) * 2 - 1
    return (np.stack([1.5 * m, np.zeros(n)], 1)
            + 0.08 * rng.standard_normal((n, 2)))


def test_interp_jax_parity():
    rng = np.random.default_rng(0)
    batch = vae_train_batch(_two_modes(rng, 8), 2, rng)
    vals = {}
    for backend in ("interp", "jax"):
        model = compile(tiny_vae(data_dim=2, latent=2, hidden=8),
                        backend=backend, seed=0)
        model.epoch = 1
        model.apply("train", batch)
        vals[backend] = float(np.asarray(model.call("loss", batch))[0])
    assert abs(vals["interp"] - vals["jax"]) < 1e-5


def test_vae_learns_two_modes():
    """ELBO drops, posterior-mean reconstruction is tight, and prior
    samples cover both modes with data-like spread (vanilla-VAE samples
    interpolate between discrete modes, so mode purity is not the
    gate — reconstruction and coverage are)."""
    model = compile(tiny_vae(data_dim=2, latent=2, hidden=48, beta=0.2),
                    backend="jax", seed=0)
    rng = np.random.default_rng(0)
    b0 = vae_train_batch(_two_modes(rng, 256), 2, rng)
    l0 = float(np.asarray(model.call("loss", b0))[0])
    for _ in range(2000):
        model.epoch += 1
        model.apply("train", vae_train_batch(_two_modes(rng, 256), 2, rng))
    l1 = float(np.asarray(model.call("loss", b0))[0])
    assert l1 < 0.5 * l0

    x = _two_modes(rng, 128).astype(np.float32)
    z = np.asarray(model.call("encode", {"x": x}))
    xhat = np.asarray(model.call("decode", {"z": z}))
    assert float(np.mean((xhat - x) ** 2)) < 0.05

    samples = vae_sample(model, 400, latent=2, seed=3)
    xs = samples[:, 0]
    assert 1.0 < xs.std() < 2.2            # data spread ~1.5
    assert 0.2 < float(np.mean(xs < 0)) < 0.8  # both modes populated
