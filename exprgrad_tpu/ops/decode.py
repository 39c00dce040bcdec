"""KV-cache incremental decoding (serving path).

Autoregressive generation attends a few fresh query tokens against a long
cached KV prefix.  That step is HBM-bandwidth-bound (the whole cache is
read once per step, the matmuls are thin), so the right TPU shape is:
static-size cache + masked compute — `lax.dynamic_update_slice` appends,
one fused einsum chain per step, no dynamic shapes anywhere, everything
jittable inside a `lax.scan` generation loop.

The cache is a functional value (append returns a new cache), matching
the framework's executor discipline: donate the buffers and XLA updates
them in place.  GQA/MQA layouts (fewer KV heads) are supported, matching
ops.attention.flash_attention.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

_NEG_INF = -1e30


class KVCache(NamedTuple):
    """Static-capacity key/value cache.  ``length`` is the number of valid
    positions (traced int32 scalar).

    With an INT8 cache (``init_cache(dtype=jnp.int8)``) ``k_scale`` /
    ``v_scale`` hold one f32 dequantization scale per (batch, kv-head,
    slot) — symmetric per-row max/127 quantization, halving cache HBM vs
    bf16 at the cost of per-slot rounding (decode attention dequantizes
    on the fly).  None for float caches."""

    k: jax.Array        # [b, hkv, capacity, d]
    v: jax.Array        # [b, hkv, capacity, d]
    length: jax.Array   # int32 scalar
    k_scale: Optional[jax.Array] = None  # [b, hkv, capacity] f32
    v_scale: Optional[jax.Array] = None  # [b, hkv, capacity] f32


def init_cache(batch: int, kv_heads: int, capacity: int, head_dim: int,
               dtype=jnp.bfloat16) -> KVCache:
    shape = (batch, kv_heads, capacity, head_dim)
    quantized = jnp.issubdtype(jnp.dtype(dtype), jnp.integer)
    # k_scale/v_scale must be DISTINCT buffers: serving paths donate the
    # cache pytree, and aliased buffers break donation
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        length=jnp.int32(0),
        k_scale=jnp.ones(shape[:3], jnp.float32) if quantized else None,
        v_scale=jnp.ones(shape[:3], jnp.float32) if quantized else None,
    )


def _quantize(x: jax.Array):
    """Symmetric per-(b, h, slot) int8 quantization: (int8 codes, f32
    scales)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.where(amax > 0.0, amax / 127.0, 1.0)
    codes = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return codes, scale


def append(cache: KVCache, k_new: jax.Array, v_new: jax.Array) -> KVCache:
    """Write ``t`` new positions at ``cache.length``; returns the new cache.
    The caller must not exceed capacity (static check impossible: length is
    traced; excess positions would wrap via clamping)."""
    zero = jnp.zeros((), cache.length.dtype)  # match index dtypes under x64
    start = (zero, zero, cache.length, zero)
    if cache.k_scale is not None:
        kq, ks = _quantize(k_new)
        vq, vs = _quantize(v_new)
        s3 = (zero, zero, cache.length)
        return cache._replace(
            k=jax.lax.dynamic_update_slice(cache.k, kq, start),
            v=jax.lax.dynamic_update_slice(cache.v, vq, start),
            k_scale=jax.lax.dynamic_update_slice(cache.k_scale, ks, s3),
            v_scale=jax.lax.dynamic_update_slice(cache.v_scale, vs, s3),
            length=cache.length + jnp.int32(k_new.shape[2]),
        )
    return cache._replace(
        k=jax.lax.dynamic_update_slice(cache.k, k_new.astype(cache.k.dtype),
                                       start),
        v=jax.lax.dynamic_update_slice(cache.v, v_new.astype(cache.v.dtype),
                                       start),
        length=cache.length + jnp.int32(k_new.shape[2]),
    )


def append_at(cache: KVCache, k_new: jax.Array, v_new: jax.Array,
              row_starts: jax.Array) -> KVCache:
    """Write ``t`` new positions PER ROW at per-row slot offsets
    ``row_starts`` [b] — the continuous-batching primitive: every batch
    row owns an independent fill cursor, so sequences at different depths
    share one cache array.  ``cache.length`` (the batch-global cursor) is
    meaningless under per-row cursors and is left unchanged; callers
    track per-row lengths and pass ``key_pos``/``q_pos`` to
    :func:`decode_attention` (which ignores ``length`` on that path)."""
    starts = row_starts.astype(jnp.int32)
    zero = jnp.int32(0)

    def put(buf, new, st):  # [hkv, cap, d] <- [hkv, t, d] at slot st
        return jax.lax.dynamic_update_slice(buf, new, (zero, st, zero))

    def put_scale(buf, new, st):  # [hkv, cap] <- [hkv, t]
        return jax.lax.dynamic_update_slice(buf, new, (zero, st))

    if cache.k_scale is not None:
        kq, ks = _quantize(k_new)
        vq, vs = _quantize(v_new)
        return cache._replace(
            k=jax.vmap(put)(cache.k, kq, starts),
            v=jax.vmap(put)(cache.v, vq, starts),
            k_scale=jax.vmap(put_scale)(cache.k_scale, ks, starts),
            v_scale=jax.vmap(put_scale)(cache.v_scale, vs, starts),
        )
    return cache._replace(
        k=jax.vmap(put)(cache.k, k_new.astype(cache.k.dtype), starts),
        v=jax.vmap(put)(cache.v, v_new.astype(cache.v.dtype), starts),
    )


def decode_attention(q: jax.Array, cache: KVCache,
                     sm_scale: Optional[float] = None,
                     window: Optional[int] = None,
                     key_pos: Optional[jax.Array] = None,
                     q_pos: Optional[jax.Array] = None) -> jax.Array:
    """Attend ``q`` [b, h, t, d] (the t newest tokens, already appended to
    the cache) against the cache.  Causal within the fresh tokens: query i
    sits at global position ``length - t + i`` and sees positions
    ``<= that`` — restricted to the last ``window`` positions when given
    (serving sliding-window models).  Returns [b, h, t, d] in q's dtype.

    For RAGGED batches (right-padded prompts of different lengths) pass
    TRUE positions explicitly: ``key_pos`` [b, capacity] gives each cache
    slot's position with ``-1`` marking invalid/pad slots; ``q_pos``
    [b, t] gives the fresh tokens' positions.  The mask then follows
    positions, not slot indices, so pad K/V never attend and the window
    band is exact per sequence."""
    b, h, t, d = q.shape
    hkv = cache.k.shape[1]
    capacity = cache.k.shape[2]
    group = h // hkv
    if h % hkv:
        raise ValueError(f"query heads ({h}) not a multiple of kv ({hkv})")
    if (key_pos is None) != (q_pos is None):
        raise ValueError("key_pos and q_pos must be given together")
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(d))

    qg = q.reshape(b, hkv, group * t, d).astype(jnp.float32)
    kf = cache.k.astype(jnp.float32)
    vf = cache.v.astype(jnp.float32)
    if cache.k_scale is not None:  # int8 cache: dequantize on the fly
        kf = kf * cache.k_scale[..., None]
        vf = vf * cache.v_scale[..., None]
    s = jnp.einsum("bgqd,bgsd->bgqs", qg, kf,
                   preferred_element_type=jnp.float32) * sm_scale
    s = s.reshape(b, h, t, capacity)

    if key_pos is None:
        pos = cache.length - t + jnp.arange(t, dtype=jnp.int32)   # [t]
        kp = jnp.arange(capacity, dtype=jnp.int32)                # [cap]
        mask = kp[None, :] <= pos[:, None]                        # [t, cap]
        if window is not None:
            mask = jnp.logical_and(
                mask, kp[None, :] > pos[:, None] - jnp.int32(window)
            )
        mask = mask[None, None]                                   # [1,1,t,c]
    else:
        kp = key_pos.astype(jnp.int32)[:, None, :]                # [b,1,cap]
        qp = q_pos.astype(jnp.int32)[:, :, None]                  # [b,t,1]
        mask = jnp.logical_and(kp >= 0, kp <= qp)                 # [b,t,cap]
        if window is not None:
            mask = jnp.logical_and(mask, kp > qp - jnp.int32(window))
        mask = mask[:, None]                                      # [b,1,t,c]
    s = jnp.where(mask, s, _NEG_INF)

    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum(
        "bgqs,bgsd->bgqd",
        p.reshape(b, hkv, group * t, capacity),
        vf,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, h, t, d).astype(q.dtype)
