"""GPipe-style pipeline parallelism over a virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from exprgrad_tpu.parallel.pipeline import (
    pipeline_apply, shard_pipeline_params,
)

D = 16


def _stage_fn(p, h):
    w, b = p
    return jax.nn.gelu(h @ w + b)


def _setup(stages, micro, batch=4, seed=0):
    rng = np.random.default_rng(seed)
    params = (
        jnp.asarray(rng.normal(size=(stages, D, D)).astype(np.float32) * 0.3),
        jnp.asarray(rng.normal(size=(stages, D)).astype(np.float32) * 0.1),
    )
    xs = jnp.asarray(rng.normal(size=(micro, batch, D)).astype(np.float32))
    return params, xs


def _sequential(params, xs):
    w, b = params
    h = xs
    for s in range(w.shape[0]):
        h = jax.nn.gelu(h @ w[s] + b[s])
    return h


@pytest.mark.parametrize("stages,micro", [(4, 8), (8, 4), (2, 3)])
def test_pipeline_matches_sequential(stages, micro):
    mesh = Mesh(np.array(jax.devices()[:stages]).reshape(stages), ("stage",))
    params, xs = _setup(stages, micro)
    got = pipeline_apply(params, xs, mesh, _stage_fn)
    want = _sequential(params, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_pipeline_sharded_params():
    stages = 4
    mesh = Mesh(np.array(jax.devices()[:stages]).reshape(stages), ("stage",))
    params, xs = _setup(stages, micro=6, seed=1)
    sharded = shard_pipeline_params(params, mesh)
    assert sharded[0].sharding.spec[0] == "stage"
    got = pipeline_apply(sharded, xs, mesh, _stage_fn)
    want = _sequential(params, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_pipeline_gradients_match_sequential():
    """The reverse pipeline schedule falls out of jax.grad through
    scan+ppermute; gradients must equal the sequential model's."""
    stages, micro = 4, 4
    mesh = Mesh(np.array(jax.devices()[:stages]).reshape(stages), ("stage",))
    params, xs = _setup(stages, micro, seed=2)

    def loss_pp(params):
        return jnp.sum(pipeline_apply(params, xs, mesh, _stage_fn) ** 2)

    def loss_seq(params):
        return jnp.sum(_sequential(params, xs) ** 2)

    got = jax.grad(loss_pp)(params)
    want = jax.grad(loss_seq)(params)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)
