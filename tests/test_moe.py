"""Expert-parallel MoE layer on an 8-device mesh vs single-device math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from exprgrad_tpu.parallel.moe import (
    init_moe, moe_layer, shard_moe_params,
)

D, H, E, N = 16, 32, 8, 64


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    params = init_moe(rng, D, H, E)
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    return params, x


def _reference(x, params, capacity, top_k=1):
    """Per-token python reference of top-k routing with capacity."""
    xf = np.asarray(x, np.float64)
    logits = xf @ np.asarray(params.router, np.float64)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    counts = {e: 0 for e in range(E)}
    y = np.zeros_like(xf)
    for i in range(len(xf)):
        order = np.argsort(-probs[i])[:top_k]
        if top_k == 1:
            weights = {int(order[0]): probs[i, order[0]]}
        else:
            tot = probs[i, order].sum()
            weights = {int(e): probs[i, e] / tot for e in order}
        for e, w in weights.items():
            if counts[e] >= capacity:
                continue  # this assignment dropped
            counts[e] += 1
            w1 = np.asarray(params.w1[e], np.float64)
            w2 = np.asarray(params.w2[e], np.float64)
            b1 = np.asarray(params.b1[e], np.float64)
            b2 = np.asarray(params.b2[e], np.float64)
            h = np.maximum(xf[i] @ w1 + b1, 0.0)
            y[i] += (h @ w2 + b2) * w
    return y


def test_moe_matches_per_token_reference():
    params, x = _setup()
    capacity = int(np.ceil(N / E * 1.25))
    y, aux = moe_layer(x, params)
    want = _reference(x, params, capacity)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-5)
    assert float(aux) > 0


def test_moe_capacity_drops_tokens():
    """A tiny capacity forces drops; dropped tokens output zero."""
    params, x = _setup(seed=1)
    y, _ = moe_layer(x, params, capacity_factor=0.25)
    capacity = int(np.ceil(N / E * 0.25))
    want = _reference(x, params, capacity)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-5)
    dropped = np.all(want == 0.0, axis=-1)
    assert dropped.any()  # the test is vacuous otherwise


def test_moe_top2_matches_per_token_reference():
    """Mixtral-style top-2 routing: each token combines its two best
    experts with renormalized gates."""
    params, x = _setup(seed=4)
    capacity = int(np.ceil(2 * N / E * 1.25))
    y, aux = moe_layer(x, params, top_k=2)
    want = _reference(x, params, capacity, top_k=2)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-5)
    assert float(aux) > 0


def test_moe_top2_capacity_drops_assignments():
    """Tight capacity at top-2: individual assignments drop (a token can
    keep one expert and lose the other)."""
    params, x = _setup(seed=5)
    y, _ = moe_layer(x, params, capacity_factor=0.25, top_k=2)
    capacity = int(np.ceil(2 * N / E * 0.25))
    want = _reference(x, params, capacity, top_k=2)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-5)


def test_moe_top2_gradients_and_mesh():
    params, x = _setup(seed=6)

    def loss(params, x):
        y, aux = moe_layer(x, params, top_k=2)
        return jnp.sum(y ** 2) + 0.01 * aux

    grads = jax.grad(loss)(params, x)
    assert float(jnp.abs(grads.router).sum()) > 0
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("expert",))
    sharded = shard_moe_params(params, mesh, axis="expert")
    y_single, _ = jax.jit(lambda x, p: moe_layer(x, p, top_k=2))(x, params)
    y_mesh, _ = jax.jit(lambda x, p: moe_layer(x, p, top_k=2))(x, sharded)
    np.testing.assert_allclose(np.asarray(y_mesh), np.asarray(y_single),
                               rtol=1e-5, atol=1e-6)


def test_moe_top_k_validation():
    params, x = _setup(seed=7)
    with pytest.raises(ValueError, match="top_k"):
        moe_layer(x, params, top_k=0)
    with pytest.raises(ValueError, match="top_k"):
        moe_layer(x, params, top_k=E + 1)


def test_moe_expert_parallel_mesh():
    """Expert weights sharded over an 8-device axis: same numbers, and the
    parameters actually live sharded."""
    params, x = _setup(seed=2)
    y_single, aux_single = jax.jit(moe_layer)(x, params)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("expert",))
    sharded = shard_moe_params(params, mesh, axis="expert")
    assert sharded.w1.sharding.spec == P("expert", None, None)

    y_mesh, aux_mesh = jax.jit(moe_layer)(x, sharded)
    np.testing.assert_allclose(np.asarray(y_mesh), np.asarray(y_single),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(aux_mesh), float(aux_single), rtol=1e-6)


def test_moe_gradients_flow_to_router_and_experts():
    params, x = _setup(seed=3)

    def loss(params, x):
        y, aux = moe_layer(x, params)
        return jnp.sum(y ** 2) + 0.01 * aux

    grads = jax.grad(loss)(params, x)
    assert float(jnp.abs(grads.router).sum()) > 0
    assert float(jnp.abs(grads.w1).sum()) > 0
    assert float(jnp.abs(grads.w2).sum()) > 0
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
