"""Sequence-parallel flash attention over a device mesh.

Long-context attention where the sequence dimension is sharded across
devices (the reference has nothing distributed, SURVEY.md §5.7/§5.8; this
is the TPU-native long-context answer).  Two implementations, both built
on the offset-aware Pallas flash kernel (ops.attention), which computes
causal masks in *global* sequence coordinates:

* ``impl="gather"`` — all-gather K/V over ICI, one kernel call per device
  against the full KV.  Simplest; KV memory O(S) per device.
* ``impl="ring"`` — ring attention: KV chunks rotate around the mesh axis
  via ``ppermute`` while each device folds one chunk per step into its
  online-softmax running state (merging locally-normalized outputs via
  their logsumexps).  KV memory O(S/P) per device.  The loop is double
  buffered: each step's ppermute of the NEXT chunk is issued before the
  current flash kernel, so on real ICI the async collective-permute
  rides underneath the compute (tested structurally; the overlap itself
  is only observable on multi-chip hardware).

Both implementations are differentiable (``jax.custom_vjp``): the ring
backward re-rotates KV chunks with their gradient accumulators traveling
along (one final permute delivers each chunk's dk/dv to its owner); the
gather backward re-gathers KV, computes full-width partials with the
offset-aware Pallas backward kernels, and reduce-scatters dk/dv.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.attention import (
    flash_attention_backward,
    flash_attention_forward,
)


def _merge(state, out_i, lse_i):
    """Fold one chunk's locally-normalized attention into the running
    (max, unnormalized sum, weight) online-softmax state."""
    m_run, u_run, w_run = state
    m_new = jnp.maximum(m_run, lse_i)
    # guard exp(-inf - -inf): fully-masked rows contribute nothing
    def scale(x, m):
        return jnp.where(jnp.isneginf(x), 0.0, jnp.exp(x - m))

    alpha = scale(m_run, m_new)                       # rescale old state
    beta = scale(lse_i, m_new)                        # weight of new chunk
    u_new = u_run * alpha[..., None] + out_i.astype(jnp.float32) * beta[..., None]
    w_new = w_run * alpha + beta
    return m_new, u_new, w_new


def _finish(state, dtype):
    _, u, w = state
    w = jnp.where(w == 0.0, 1.0, w)
    return (u / w[..., None]).astype(dtype)


def _lse3(lse, b, h, cq):
    return lse.reshape(b, h, cq)


def _global_lse(state):
    """Global logsumexp per row from the merged (max, sum, weight) state,
    in the flat [b*h, cq] layout the backward kernels consume."""
    m, _, w = state
    lse = jnp.where(w == 0.0, -jnp.inf, m + jnp.log(jnp.maximum(w, 1e-38)))
    b, h, cq = lse.shape
    return lse.reshape(b * h, cq)


def _gather_forward(q, k, v, *, axis_name, sm_scale, causal, block_q,
                    block_k, interpret, window=None):
    rank = jax.lax.axis_index(axis_name).astype(jnp.int32)
    chunk_q = q.shape[2]
    kf = jax.lax.all_gather(k, axis_name, axis=2, tiled=True)
    vf = jax.lax.all_gather(v, axis_name, axis=2, tiled=True)
    offs = jnp.stack([rank * jnp.int32(chunk_q), jnp.int32(0)])
    out, lse = flash_attention_forward(
        q, kf, vf, sm_scale, causal, block_q, block_k, interpret,
        offsets=offs, window=window,
    )
    return out, lse, kf, vf, offs


def _make_gather(axis_name, sm_scale, causal, block_q, block_k, interpret,
                 window=None):
    kw = dict(axis_name=axis_name, sm_scale=sm_scale, causal=causal,
              block_q=block_q, block_k=block_k, interpret=interpret,
              window=window)

    @jax.custom_vjp
    def gather(q, k, v):
        return _gather_forward(q, k, v, **kw)[0]

    def fwd(q, k, v):
        out, lse, _, _, _ = _gather_forward(q, k, v, **kw)
        return out, (q, k, v, out, lse)

    def bwd(res, g):
        q, k, v, out, lse = res
        # re-gather KV (cheaper than saving the gathered copies as
        # residuals: recompute-over-memory, the flash trade)
        _, _, kf, vf, offs = _gather_forward(q, k, v, **kw)
        dq, dk_full, dv_full = flash_attention_backward(
            q, kf, vf, out, lse, g, sm_scale, causal, block_q, block_k,
            interpret, offsets=offs, window=window,
        )
        # each device holds the full-KV partials from its q chunk;
        # sum across devices and keep the local chunk: reduce-scatter
        dk = jax.lax.psum_scatter(
            dk_full, axis_name, scatter_dimension=2, tiled=True
        )
        dv = jax.lax.psum_scatter(
            dv_full, axis_name, scatter_dimension=2, tiled=True
        )
        return dq, dk.astype(k.dtype), dv.astype(v.dtype)

    gather.defvjp(fwd, bwd)
    return gather


def _ring_forward(q, k, v, *, axis_name, sm_scale, causal, block_q,
                  block_k, interpret, window=None):
    rank = jax.lax.axis_index(axis_name)
    size = jax.lax.axis_size(axis_name)
    b, h, cq, d = q.shape
    ck = k.shape[2]
    perm = [(i, (i + 1) % size) for i in range(size)]

    state = (
        jnp.full((b, h, cq), -jnp.inf, jnp.float32),
        jnp.zeros((b, h, cq, d), jnp.float32),
        jnp.zeros((b, h, cq), jnp.float32),
    )
    rank32 = rank.astype(jnp.int32)
    for t in range(size):
        # Double buffering: the step-t+1 chunks go on the wire BEFORE the
        # step-t kernel is issued.  The permute reads only the resident
        # chunk, so nothing forces it after the kernel; issuing it first
        # in program order lets XLA's latency-hiding scheduler run the
        # async collective-permute on ICI underneath the flash kernel.
        if t != size - 1:
            k_next = jax.lax.ppermute(k, axis_name, perm)
            v_next = jax.lax.ppermute(v, axis_name, perm)
        # chunk held at step t (int32 regardless of the x64 flag)
        src = jax.lax.rem(rank32 - jnp.int32(t) + jnp.int32(size),
                          jnp.int32(size))
        offs = jnp.stack(
            [rank32 * jnp.int32(cq), src * jnp.int32(ck)]
        ).astype(jnp.int32)
        out_i, lse_i = flash_attention_forward(
            q, k, v, sm_scale, causal, block_q, block_k, interpret,
            offsets=offs, window=window,
        )
        state = _merge(state, out_i, _lse3(lse_i, b, h, cq))
        if t != size - 1:
            k, v = k_next, v_next
    return _finish(state, q.dtype), _global_lse(state)


def _make_ring(axis_name, sm_scale, causal, block_q, block_k, interpret,
               window=None):
    kw = dict(axis_name=axis_name, sm_scale=sm_scale, causal=causal,
              block_q=block_q, block_k=block_k, interpret=interpret,
              window=window)

    @jax.custom_vjp
    def ring(q, k, v):
        return _ring_forward(q, k, v, **kw)[0]

    def fwd(q, k, v):
        out, lse = _ring_forward(q, k, v, **kw)
        return out, (q, k, v, out, lse)

    def bwd(res, g):
        q, k, v, out, lse = res
        rank = jax.lax.axis_index(axis_name).astype(jnp.int32)
        size = jax.lax.axis_size(axis_name)
        cq, ck = q.shape[2], k.shape[2]
        perm = [(i, (i + 1) % size) for i in range(size)]

        dq = jnp.zeros(q.shape, jnp.float32)
        # dk/dv accumulators travel around the ring WITH their kv chunk
        dk = jnp.zeros(k.shape, jnp.float32)
        dv = jnp.zeros(v.shape, jnp.float32)
        for t in range(size):
            # k/v for step t+1 go on the wire before the step-t kernels
            # (double buffering, as in the forward).  dk/dv cannot be
            # prefetched the same way -- each accumulator must absorb the
            # local partial before traveling -- but their permute only
            # gates the NEXT accumulation, not the next kernel, so it
            # still overlaps with step t+1's backward kernels.
            if t != size - 1:
                k_next = jax.lax.ppermute(k, axis_name, perm)
                v_next = jax.lax.ppermute(v, axis_name, perm)
            src = jax.lax.rem(rank - jnp.int32(t) + jnp.int32(size),
                              jnp.int32(size))
            offs = jnp.stack(
                [rank * jnp.int32(cq), src * jnp.int32(ck)]
            ).astype(jnp.int32)
            dq_p, dk_p, dv_p = flash_attention_backward(
                q, k, v, out, lse, g, sm_scale, causal, block_q, block_k,
                interpret, offsets=offs, window=window,
            )
            dq = dq + dq_p.astype(jnp.float32)
            dk = dk + dk_p.astype(jnp.float32)
            dv = dv + dv_p.astype(jnp.float32)
            if t != size - 1:
                k, v = k_next, v_next
                dk = jax.lax.ppermute(dk, axis_name, perm)
                dv = jax.lax.ppermute(dv, axis_name, perm)
        # chunk c sits on device (c - 1) mod P after the last step; one
        # final rotation delivers each gradient chunk to its owner
        dk = jax.lax.ppermute(dk, axis_name, perm)
        dv = jax.lax.ppermute(dv, axis_name, perm)
        return dq.astype(q.dtype), dk.astype(q.dtype), dv.astype(q.dtype)

    ring.defvjp(fwd, bwd)
    return ring


def sequence_parallel_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "data",
    sm_scale: Optional[float] = None,
    causal: bool = False,
    impl: str = "ring",
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
    window: Optional[int] = None,
) -> jax.Array:
    """softmax(q k^T) v with the sequence dim sharded over ``mesh[axis]``.

    Shapes: q/k/v [b, h, S, d] (S divisible by the axis size).  Returns
    [b, h, S, d] with the same sharding.  ``impl``: "ring" (KV rotates via
    ppermute, O(S/P) memory) or "gather" (all-gather KV).  ``window``
    (with ``causal=True``) is sliding-window attention in GLOBAL
    coordinates — the offset-aware kernels mask and tile-skip across
    shard boundaries exactly as on one device.
    """
    if impl not in ("ring", "gather"):
        raise ValueError(f"unknown impl {impl!r}")
    make = _make_ring if impl == "ring" else _make_gather
    body = make(axis, sm_scale, causal, block_q, block_k, interpret,
                window=window)
    spec = P(None, None, axis, None)
    mapped = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return mapped(q, k, v)
