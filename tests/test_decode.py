"""KV-cache incremental decoding vs full-sequence flash attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exprgrad_tpu.ops.attention import flash_attention
from exprgrad_tpu.ops.decode import KVCache, append, decode_attention, init_cache


def _seq(b=2, h=4, S=256, d=32, seed=0, hkv=None):
    rng = np.random.default_rng(seed)
    mk = lambda s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    hkv = hkv or h
    return mk((b, h, S, d)), mk((b, hkv, S, d)), mk((b, hkv, S, d))


@pytest.mark.parametrize("hkv", [4, 2, 1])
def test_incremental_decode_matches_full_causal(hkv):
    """Token-by-token decoding through the cache reproduces the causal
    full-sequence attention rows exactly."""
    b, h, S, d = 2, 4, 64, 32
    q, k, v = _seq(b, h, S, d, seed=1, hkv=hkv)
    group = h // hkv
    full = flash_attention(
        q, jnp.repeat(k, group, axis=1), jnp.repeat(v, group, axis=1),
        causal=True, block_q=32, block_k=32,
    )

    cache = init_cache(b, hkv, capacity=S, head_dim=d, dtype=jnp.float32)
    outs = []
    for tok in range(S):
        cache = append(cache, k[:, :, tok:tok + 1], v[:, :, tok:tok + 1])
        outs.append(decode_attention(q[:, :, tok:tok + 1], cache))
    got = jnp.concatenate(outs, axis=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=2e-4, atol=2e-5)


def test_chunked_prefill_then_decode():
    """Multi-token append (prefill) then single-token steps."""
    b, h, S, d = 1, 2, 96, 16
    q, k, v = _seq(b, h, S, d, seed=2)
    full = flash_attention(q, k, v, causal=True, block_q=32, block_k=32)

    prefill = 64
    cache = init_cache(b, h, capacity=S, head_dim=d, dtype=jnp.float32)
    cache = append(cache, k[:, :, :prefill], v[:, :, :prefill])
    out_prefill = decode_attention(q[:, :, :prefill], cache)
    np.testing.assert_allclose(
        np.asarray(out_prefill), np.asarray(full[:, :, :prefill]),
        rtol=2e-4, atol=2e-5,
    )
    outs = [out_prefill]
    for tok in range(prefill, S):
        cache = append(cache, k[:, :, tok:tok + 1], v[:, :, tok:tok + 1])
        outs.append(decode_attention(q[:, :, tok:tok + 1], cache))
    got = jnp.concatenate(outs, axis=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=2e-4, atol=2e-5)


def test_decode_loop_under_scan():
    """The whole generation loop compiles as one jitted lax.scan program
    (static shapes, donated cache)."""
    b, h, S, d = 1, 2, 32, 16
    q, k, v = _seq(b, h, S, d, seed=3)

    @jax.jit
    def generate(cache, qs, ks, vs):
        def step(cache, xs):
            qt, kt, vt = xs
            cache = append(cache, kt[:, :, None, :], vt[:, :, None, :])
            out = decode_attention(qt[:, :, None, :], cache)
            return cache, out[:, :, 0]

        xs = (qs.transpose(2, 0, 1, 3), ks.transpose(2, 0, 1, 3),
              vs.transpose(2, 0, 1, 3))
        cache, outs = jax.lax.scan(step, cache, xs)
        return cache, outs.transpose(1, 2, 0, 3)

    cache = init_cache(b, h, capacity=S, head_dim=d, dtype=jnp.float32)
    _, got = generate(cache, q, k, v)
    full = flash_attention(q, k, v, causal=True, block_q=32, block_k=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=2e-4, atol=2e-5)


def test_decode_rejects_bad_heads():
    cache = init_cache(1, 3, 16, 8, jnp.float32)
    q = jnp.zeros((1, 4, 1, 8), jnp.float32)
    with pytest.raises(ValueError):
        decode_attention(q, cache)
