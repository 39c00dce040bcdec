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


def test_int8_quantized_cache_close_to_f32():
    """init_cache(dtype=int8): symmetric per-slot quantization; decode
    attention dequantizes on the fly and stays close to the f32 cache."""
    import jax.numpy as jnp

    from exprgrad_tpu.ops.decode import append, decode_attention, init_cache

    rng = np.random.default_rng(0)
    b, h, cap, d = 2, 2, 32, 16
    kq = init_cache(b, h, cap, d, dtype=jnp.int8)
    kf = init_cache(b, h, cap, d, dtype=jnp.float32)
    assert kq.k.dtype == jnp.int8 and kq.k_scale is not None
    for t in (8, 1, 3):
        knew = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
        vnew = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
        kq = append(kq, knew, vnew)
        kf = append(kf, knew, vnew)
    q = jnp.asarray(rng.normal(size=(b, h, 1, d)).astype(np.float32))
    outq = np.asarray(decode_attention(q, kq))
    outf = np.asarray(decode_attention(q, kf))
    assert np.max(np.abs(outq - outf)) < 0.05, np.max(np.abs(outq - outf))
    # memory claim: int8 codes + f32 scales < half the f32 cache bytes
    bytes_q = kq.k.nbytes + kq.k_scale.nbytes
    bytes_f = kf.k.nbytes
    assert bytes_q < 0.6 * bytes_f


def test_int8_cache_serving_greedy_agreement():
    """An int8-cached server's greedy decode agrees with the f32-cached
    one on a trained model (per-slot quantization noise is far below the
    logit margins)."""
    import jax.numpy as jnp

    from exprgrad_tpu import compile
    from exprgrad_tpu.models import FlashLMServer, flash_transformer

    rng = np.random.default_rng(1)
    m = compile(flash_transformer(vocab=8, dim=16, heads=2, max_seq=32,
                                  eta=0.05), seed=0)
    phase = rng.integers(0, 8, 16)
    toks = ((phase[:, None] + np.arange(8)[None, :]) % 8).astype(np.float32)
    labels = np.eye(8, dtype=np.float32)[((toks + 1) % 8).astype(int)]
    for _ in range(30):
        m.epoch += 1
        m.apply("train", {"tokens": toks, "labels": labels})
    f32 = FlashLMServer(m, cache_dtype=jnp.float32)
    q8 = FlashLMServer(m, cache_dtype=jnp.int8)
    prompt = toks[:2, :4]
    a = np.asarray(f32.generate(prompt, n_new=12))
    b = np.asarray(q8.generate(prompt, n_new=12))
    np.testing.assert_array_equal(a, b)
