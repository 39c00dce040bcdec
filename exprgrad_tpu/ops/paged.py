"""Paged KV cache: a shared page pool + per-request page tables.

Dense per-slot caches reserve ``slots * capacity`` rows whether or not a
request ever grows that long.  Paged attention (Kwon et al., "Efficient
Memory Management for Large Language Model Serving with PagedAttention",
SOSP 2023 — the vLLM idea) carves the cache into fixed-size PAGES that
requests borrow on demand, so cache HBM is sized for the TOKENS ACTUALLY
RESIDENT, not the worst case per slot.

TPU-native shape of the idea:

* the pool is one static array ``[n_pages, hkv, page, d]`` per layer —
  no dynamic allocation on device, ever;
* a decode step writes each row's fresh K/V at ``(page_id[b], off[b])``
  — one batched scatter (``.at[...].set``) with host-chosen indices;
* attention GATHERS each row's pages into a dense ``[b, hkv, P*page,
  d]`` view and reuses the position-masked ``decode_attention`` kernel
  unchanged (garbage in never-written / stale pages is masked by
  ``key_pos``, so freed pages are recycled by overwriting — no zeroing);
* page allocation, free lists, and preemption live on the host
  (``models.batcher.ContinuousBatcher(paged=...)``), which only ever
  hands the device dense batched work.

int8 pools carry per-(page, head, slot) dequantization scales exactly
like ``ops.decode.KVCache``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .decode import KVCache, _quantize


class PagedKVPool(NamedTuple):
    """Page pool for one layer.  ``k``/``v``: [n_pages, hkv, page, d];
    scales (int8 pools): [n_pages, hkv, page] f32."""

    k: jax.Array
    v: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @property
    def page_size(self) -> int:
        return self.k.shape[2]

    @property
    def n_pages(self) -> int:
        return self.k.shape[0]


def init_pool(n_pages: int, kv_heads: int, page_size: int, head_dim: int,
              dtype=jnp.bfloat16) -> PagedKVPool:
    shape = (n_pages, kv_heads, page_size, head_dim)
    quantized = jnp.issubdtype(jnp.dtype(dtype), jnp.integer)
    return PagedKVPool(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        k_scale=jnp.ones(shape[:3], jnp.float32) if quantized else None,
        v_scale=jnp.ones(shape[:3], jnp.float32) if quantized else None,
    )


def write_token(pool: PagedKVPool, k_new: jax.Array, v_new: jax.Array,
                page_ids: jax.Array, offsets: jax.Array) -> PagedKVPool:
    """Write ``t`` fresh positions per batch row: ``k_new``/``v_new``
    [b, hkv, t, d] land at ``(page_ids[b, t], offsets[b, t])`` ([b]
    accepted for t = 1 — the plain decode step).  Rows must own distinct
    pages (the host scheduler guarantees it) and a row's t coordinates
    are distinct positions, so the batched scatter has no write
    conflicts."""
    hkv = pool.k.shape[1]
    t = k_new.shape[2]
    pid = page_ids.astype(jnp.int32).reshape(-1, t)[:, None, :]  # [b,1,t]
    off = offsets.astype(jnp.int32).reshape(-1, t)[:, None, :]   # [b,1,t]
    head = jnp.arange(hkv, dtype=jnp.int32)[None, :, None]       # [1,hkv,1]
    kn = k_new                                                   # [b,hkv,t,d]
    vn = v_new
    if pool.k_scale is not None:
        kq, ks = _quantize(kn)
        vq, vs = _quantize(vn)
        return pool._replace(
            k=pool.k.at[pid, head, off].set(kq),
            v=pool.v.at[pid, head, off].set(vq),
            k_scale=pool.k_scale.at[pid, head, off].set(ks),
            v_scale=pool.v_scale.at[pid, head, off].set(vs),
        )
    return pool._replace(
        k=pool.k.at[pid, head, off].set(kn.astype(pool.k.dtype)),
        v=pool.v.at[pid, head, off].set(vn.astype(pool.v.dtype)),
    )


def write_prefill(pool: PagedKVPool, cache: KVCache, page_ids: jax.Array,
                  src_offset: int = 0) -> PagedKVPool:
    """Copy a batch-1 dense prefill cache into ``P = len(page_ids)``
    pool pages, starting at dense row ``src_offset`` (page-aligned;
    prefix-cached admissions copy only the suffix region).  P is static
    (bucketed prompt widths); each copy is one dynamic_update_slice at a
    traced page id.  Dense-cache quantization (``ops.decode.append``)
    and pool quantization agree bit for bit, so a paged prefill equals a
    dense prefill exactly."""
    pg = pool.page_size
    zero = jnp.int32(0)
    k, v = pool.k, pool.v
    ks, vs = pool.k_scale, pool.v_scale
    n = int(page_ids.shape[0])
    for p in range(n):
        pid = page_ids[p].astype(jnp.int32)
        sl = slice(src_offset + p * pg, src_offset + (p + 1) * pg)
        k = jax.lax.dynamic_update_slice(
            k, cache.k[0, :, sl][None].astype(k.dtype),
            (pid, zero, zero, zero),
        )
        v = jax.lax.dynamic_update_slice(
            v, cache.v[0, :, sl][None].astype(v.dtype),
            (pid, zero, zero, zero),
        )
        if ks is not None:
            ks = jax.lax.dynamic_update_slice(
                ks, cache.k_scale[0, :, sl][None], (pid, zero, zero))
            vs = jax.lax.dynamic_update_slice(
                vs, cache.v_scale[0, :, sl][None], (pid, zero, zero))
    return pool._replace(k=k, v=v, k_scale=ks, v_scale=vs)


def write_prefill_at(pool: PagedKVPool, cache: KVCache, page_ids: jax.Array,
                     src_offset) -> PagedKVPool:
    """Like :func:`write_prefill` but the dense source offset is a
    TRACED (page-aligned) scalar — one compiled program serves every
    prefix depth (prefix-cached admission tails, chunked prefill)."""
    pg = pool.page_size
    hkv, d = pool.k.shape[1], pool.k.shape[3]
    zero = jnp.int32(0)
    off = jnp.asarray(src_offset, jnp.int32)
    k, v = pool.k, pool.v
    ks, vs = pool.k_scale, pool.v_scale
    n = int(page_ids.shape[0])
    for p in range(n):
        pid = page_ids[p].astype(jnp.int32)
        at = off + jnp.int32(p * pg)
        src_k = jax.lax.dynamic_slice(
            cache.k, (zero, zero, at, zero), (1, hkv, pg, d))
        src_v = jax.lax.dynamic_slice(
            cache.v, (zero, zero, at, zero), (1, hkv, pg, d))
        k = jax.lax.dynamic_update_slice(
            k, src_k.astype(k.dtype), (pid, zero, zero, zero))
        v = jax.lax.dynamic_update_slice(
            v, src_v.astype(v.dtype), (pid, zero, zero, zero))
        if ks is not None:
            ks = jax.lax.dynamic_update_slice(
                ks, jax.lax.dynamic_slice(
                    cache.k_scale, (zero, zero, at), (1, hkv, pg)),
                (pid, zero, zero))
            vs = jax.lax.dynamic_update_slice(
                vs, jax.lax.dynamic_slice(
                    cache.v_scale, (zero, zero, at), (1, hkv, pg)),
                (pid, zero, zero))
    return pool._replace(k=k, v=v, k_scale=ks, v_scale=vs)


def gather_rows(pool: PagedKVPool, page_ids: jax.Array):
    """Dense batch-1 rows of the given pages: ``(k, v, k_scale,
    v_scale)`` with k/v ``[1, hkv, P*page, d]`` — the prefix half of a
    prefix-cached admission's scratch cache."""
    pt = page_ids.astype(jnp.int32)
    P = pt.shape[0]
    hkv, pg, d = pool.k.shape[1], pool.k.shape[2], pool.k.shape[3]

    def dense(buf):
        return buf[pt].transpose(1, 0, 2, 3).reshape(1, hkv, P * pg, d)

    def dense_scale(buf):
        return buf[pt].transpose(1, 0, 2).reshape(1, hkv, P * pg)

    return (
        dense(pool.k),
        dense(pool.v),
        None if pool.k_scale is None else dense_scale(pool.k_scale),
        None if pool.v_scale is None else dense_scale(pool.v_scale),
    )


def gather_view(pool: PagedKVPool, page_table: jax.Array) -> KVCache:
    """Materialize each row's pages as a dense position-ordered cache
    view [b, hkv, P*page, d] for ``decode_attention``.  ``page_table``
    [b, P] holds pool page ids (unallocated entries may be anything —
    their rows are masked by ``key_pos``).  ``length`` is meaningless on
    the paged path (callers always pass explicit positions)."""
    pt = page_table.astype(jnp.int32)
    b, P = pt.shape
    hkv, pg, d = pool.k.shape[1], pool.k.shape[2], pool.k.shape[3]

    def dense(buf):
        g = buf[pt]                                  # [b, P, hkv, pg, d]
        return g.transpose(0, 2, 1, 3, 4).reshape(b, hkv, P * pg, d)

    def dense_scale(buf):
        g = buf[pt]                                  # [b, P, hkv, pg]
        return g.transpose(0, 2, 1, 3).reshape(b, hkv, P * pg)

    return KVCache(
        k=dense(pool.k),
        v=dense(pool.v),
        length=jnp.int32(0),
        k_scale=None if pool.k_scale is None else dense_scale(pool.k_scale),
        v_scale=None if pool.v_scale is None else dense_scale(pool.v_scale),
    )
