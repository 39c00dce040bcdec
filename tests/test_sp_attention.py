"""Sequence-parallel attention over an 8-device mesh (virtual CPU devices;
conftest forces 8).  Ring and all-gather implementations must match the
single-device flash kernel exactly in global coordinates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from exprgrad_tpu.ops.attention import flash_attention
from exprgrad_tpu.parallel.attention import sequence_parallel_attention


def _mesh():
    return Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))


def _qkv(b=1, h=2, S=512, d=32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    return mk((b, h, S, d)), mk((b, h, S, d)), mk((b, h, S, d))


@pytest.mark.parametrize("impl", ["gather", "ring"])
@pytest.mark.parametrize("causal", [False, True])
def test_sp_attention_matches_single_device(impl, causal):
    mesh = _mesh()
    q, k, v = _qkv()
    ref = flash_attention(q, k, v, causal=causal)
    out = sequence_parallel_attention(
        q, k, v, mesh, causal=causal, impl=impl
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6
    )


def test_sp_attention_sharded_inputs_stay_sharded():
    """Inputs placed with a sequence sharding run without resharding and
    the output carries the same sharding."""
    mesh = _mesh()
    q, k, v = _qkv(seed=1)
    spec = P(None, None, "data", None)
    sharding = NamedSharding(mesh, spec)
    qs, ks, vs = (jax.device_put(x, sharding) for x in (q, k, v))
    out = sequence_parallel_attention(qs, ks, vs, mesh, causal=True,
                                      impl="ring")
    assert out.sharding.spec == spec
    ref = flash_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("impl", ["gather", "ring"])
def test_sp_attention_window(impl):
    """Sliding-window attention across shard boundaries: the global-
    coordinate band mask must agree with the single-device kernel even
    when the band straddles chunk edges (window=96 vs 64-wide chunks),
    forward and backward."""
    mesh = _mesh()
    q, k, v = _qkv(seed=4)  # S=512 over 8 devices -> 64-wide chunks
    ref = flash_attention(q, k, v, causal=True, window=96)
    out = sequence_parallel_attention(q, k, v, mesh, causal=True,
                                      impl=impl, window=96)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)

    rng = np.random.default_rng(5)
    g = jnp.asarray(rng.normal(size=q.shape).astype(np.float32))
    got = jax.grad(lambda *a: jnp.sum(sequence_parallel_attention(
        *a, mesh, causal=True, impl=impl, window=96) * g),
        argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(lambda *a: jnp.sum(flash_attention(
        *a, causal=True, window=96) * g), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_ring_permute_issued_before_compute():
    """Double buffering guard: in the traced program, the first
    collective-permute (next KV chunk going on the wire) precedes the
    first dot_general (the step-0 flash kernel), so XLA's latency-hiding
    scheduler is free to overlap them on real ICI."""
    mesh = _mesh()
    q, k, v = _qkv(S=128, d=16)

    def f(q, k, v):
        return sequence_parallel_attention(q, k, v, mesh, causal=True,
                                           impl="ring")

    text = jax.jit(f).lower(q, k, v).as_text()
    first_permute = text.find("collective_permute")
    first_dot = text.find("dot_general")
    assert first_permute != -1 and first_dot != -1
    assert first_permute < first_dot, (first_permute, first_dot)
    # 8-device ring: size-1 rotations of k and of v, no extras
    assert text.count("collective_permute") == 2 * 7


def test_sp_attention_rejects_unknown_impl():
    mesh = _mesh()
    q, k, v = _qkv(S=64)
    with pytest.raises(ValueError):
        sequence_parallel_attention(q, k, v, mesh, impl="nope")


@pytest.mark.parametrize("impl", ["gather", "ring"])
@pytest.mark.parametrize("causal", [False, True])
def test_sp_attention_gradients(impl, causal):
    """Ring backward (rotating gradient accumulators) and gather backward
    (reduce-scattered dk/dv) vs autodiff through the single-device kernel."""
    mesh = _mesh()
    q, k, v = _qkv(seed=2)
    rng = np.random.default_rng(3)
    g = jnp.asarray(rng.normal(size=q.shape).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal) * g)

    def loss_sp(q, k, v):
        return jnp.sum(
            sequence_parallel_attention(q, k, v, mesh, causal=causal,
                                        impl=impl) * g
        )

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
