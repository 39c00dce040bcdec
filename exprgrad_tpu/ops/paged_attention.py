"""Pallas paged-attention decode kernel: attend against KV *pages* in
place, page table prefetched, no dense gather materialization.

The XLA paged decode path (``ops.paged.gather_view`` +
``ops.decode.decode_attention``) first copies every live page into a
dense ``[b, hkv, P*page, d]`` array in HBM and then reads that copy —
the whole resident cache crosses HBM twice per step, and decode is
HBM-bandwidth-bound.  This kernel is the TPU-native shape of
PagedAttention (Kwon et al., SOSP 2023): the grid walks ``(batch row,
head chunk, page slot)``, a scalar-prefetched page table drives the
BlockSpec index map, and Mosaic's pipeline DMAs each KV page HBM→VMEM
exactly once — ALL kv heads of the page in one block per grid step
(chunked only when VMEM forces it) — straight into the flash-style
online-softmax accumulation.  Pages never touch HBM a second time, and
never-written / recycled pages are masked by true positions exactly
like the gather path (reference for the serving discipline this slots
into: ``exprgrad/model.nim:392-406`` — the runtime keeps device state
hot and the per-step dispatch thin).

Semantics are bit-compatible with ``decode_attention(q,
gather_view(pool, page_table), key_pos=..., q_pos=...)`` up to float
reassociation: same position masking contract (``key_pos`` slots of
``-1`` never attend; window band by true positions), same GQA/MQA
grouping, f32 softmax accumulation.

Mosaic layout notes (all checked statically by ``mosaic_check``):

* KV blocks ``(1, h_block, page, d)`` over ``[n_pages, hkv, page, d]``
  — the last two dims are full, always legal; the leading block index
  comes from the prefetched page table (clamped at 0 for unallocated
  ``-1`` entries, whose compute is skipped).
* ``key_pos`` rides as ``[b, P, page, 1]`` so its ``(1, 1, page, 1)``
  block keeps the last two dims legal (page multiple of 8, trailing 1
  full) — the same trick as the flash kernel's lse layout.
* query positions ride as a precomputed ``[b, 1, gt_pad, 1]`` vector
  operand (one VMEM load per grid step) instead of ``gt_pad`` unrolled
  scalar-prefetch reads + a stack EVERY grid step.
* int8 pools: per-slot scales ride as ``[n_pages, hkv, page, 1]``
  blocks selected by the same page-table index map; dequantization is
  fused into the score/value matmuls in VMEM.
* ``head_mode="batched"`` computes all ``h_block`` kv heads in ONE
  batched ``dot_general`` pair and one vectorized online-softmax
  update; ``"unroll"`` is the per-head static unroll (the r3/r4
  on-chip-validated shape).  Both lower through the full deviceless
  XLA:TPU pipeline; the chip sweep (scripts/flash_sweep.py) picks the
  default.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mosaic_check import check_specs
from .paged import PagedKVPool

_NEG_INF = -1e30

# chip-sweep-adjustable default (scripts/flash_sweep.py paged section):
# "unroll" is the on-chip-validated r3/r4 shape and STAYS the default
# until the sweep measures "batched" faster on the real chip (this
# platform's history: lowering-clean kernels have been rejected or slow
# on the live chip — defaults follow measurements, not compiles).
# r5 on-chip sweep (BENCH_DETAILS paged_decode_sweep, loop-carried-pool
# harness): "batched" beats "unroll" at every h_block (1.341 vs 1.553 ms
# best-vs-best at the bench shape); both modes pass the deviceless full
# v5e pipeline at that shape.  The gather path remains the serving
# default — the kernel is still 0.42x gather there (docs/serving.md).
DEFAULT_HEAD_MODE = "batched"


def _kernel(tbl_ref, q_ref, qp_ref, k_ref, v_ref, kp_ref, o_ref,
            m_s, l_s, acc_s, *, sm_scale: float, hkv: int,
            num_pages: int, window: Optional[int], quant: bool,
            head_mode: str, ks_ref=None, vs_ref=None):
    b_idx = pl.program_id(0)
    p_idx = pl.program_id(2)

    @pl.when(p_idx == 0)
    def _init():
        m_s[...] = jnp.full(m_s.shape, -jnp.inf, jnp.float32)
        l_s[...] = jnp.zeros(l_s.shape, jnp.float32)
        acc_s[...] = jnp.zeros(acc_s.shape, jnp.float32)

    # unallocated page table entries (-1) carry no live slots; skip the
    # matmuls entirely (the DMA already fetched clamped page 0, cheap).
    @pl.when(tbl_ref[b_idx, p_idx] >= 0)
    def _run():
        # position mask, shared by every kv head: key slot positions
        # from key_pos (-1 = dead), query rows at their true positions
        # (precomputed host-side; padded rows reuse r % t, their output
        # is sliced off).
        kp = kp_ref[0, 0, :, 0]              # [page] int32
        qp2 = qp_ref[0, 0]                   # [gt_pad, 1] int32
        kp2 = kp[None, :]                    # [1, page]
        keep = jnp.logical_and(kp2 >= 0, kp2 <= qp2)
        if window is not None:
            keep = jnp.logical_and(keep, kp2 > qp2 - jnp.int32(window))

        # all kv heads of the page arrive in ONE block/DMA per grid step
        # (the per-(head, page) grid spent ~8x more grid steps on ~8x
        # smaller DMAs and was per-step-overhead-bound: 0.56x the gather
        # path at the r3 bench).
        if head_mode == "batched":
            q = q_ref[0]                          # [hb, gt_pad, d] f32
            k = k_ref[0].astype(jnp.float32)      # [hb, page, d]
            v = v_ref[0].astype(jnp.float32)
            if quant:
                k = k * ks_ref[0]                 # [hb, page, 1] bcast
                v = v * vs_ref[0]
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                     # [hb, gt_pad, page]
            if sm_scale != 1.0:
                s = s * sm_scale
            s = jnp.where(keep[None], s, _NEG_INF)

            m_prev = m_s[...]                     # [hb, gt_pad, 128]
            l_prev = l_s[...]
            m_curr = jnp.max(s, axis=2, keepdims=True)  # [hb, gt_pad, 1]
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[..., :1])      # [hb, gt_pad, page]
            l_next = (alpha * l_prev
                      + jnp.sum(p, axis=2, keepdims=True))
            m_s[...] = m_next
            l_s[...] = l_next
            acc_s[...] = acc_s[...] * alpha[..., :1] + jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            return

        for hi in range(hkv):  # static unroll
            q = q_ref[0, hi]                      # [gt_pad, d] f32
            k = k_ref[0, hi].astype(jnp.float32)  # [page, d]
            v = v_ref[0, hi].astype(jnp.float32)
            if quant:
                k = k * ks_ref[0, hi]             # [page, 1] broadcast
                v = v * vs_ref[0, hi]

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [gt_pad, page]
            if sm_scale != 1.0:
                s = s * sm_scale
            s = jnp.where(keep, s, _NEG_INF)

            m_prev = m_s[hi]                     # [gt_pad, 128]
            l_prev = l_s[hi]
            m_curr = jnp.max(s, axis=1, keepdims=True)   # [gt_pad, 1]
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :1])               # [gt_pad, page]
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

            m_s[hi] = m_next
            l_s[hi] = l_next
            acc_s[hi] = acc_s[hi] * alpha[:, :1] + jax.lax.dot(
                p, v, preferred_element_type=jnp.float32
            )

    @pl.when(p_idx == num_pages - 1)
    def _store():
        for hi in range(hkv):
            l = l_s[hi][:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, hi] = (acc_s[hi] * l_inv).astype(o_ref.dtype)


def paged_decode_attention(
    q: jax.Array,
    pool: PagedKVPool,
    page_table: jax.Array,
    key_pos: jax.Array,
    q_pos: jax.Array,
    *,
    sm_scale: Optional[float] = None,
    window: Optional[int] = None,
    interpret: Optional[bool] = None,
    head_mode: Optional[str] = None,
    h_block: Optional[int] = None,
) -> jax.Array:
    """Attend ``q`` [b, h, t, d] against each row's pages in place.

    ``page_table`` [b, P] holds pool page ids (``-1`` = unallocated);
    ``key_pos`` [b, P*page] gives each virtual cache slot's true
    position with ``-1`` marking dead slots; ``q_pos`` [b, t] the fresh
    tokens' positions.  Masking contract identical to
    ``ops.decode.decode_attention(..., key_pos=, q_pos=)``; returns
    [b, h, t, d] in q's dtype.

    ``head_mode`` "batched" (one batched dot pair + vectorized softmax
    update over the head chunk) or "unroll" (per-head static unroll);
    ``h_block`` overrides the kv-head chunk per grid step (default: as
    many as fit VMEM).  Both exist for the on-chip sweep.
    """
    b, h, t, d = q.shape
    n_pages, hkv, page, dk = pool.k.shape
    bt, P = page_table.shape
    if dk != d:
        raise ValueError(f"head_dim mismatch: q {d} vs pool {dk}")
    if h % hkv:
        raise ValueError(f"query heads ({h}) not a multiple of kv ({hkv})")
    if bt != b:
        raise ValueError(f"page_table batch {bt} != q batch {b}")
    if key_pos.shape != (b, P * page):
        raise ValueError(
            f"key_pos shape {key_pos.shape} != {(b, P * page)}")
    if q_pos.shape != (b, t):
        raise ValueError(f"q_pos shape {q_pos.shape} != {(b, t)}")
    if page % 8:
        raise ValueError(f"page size {page} must be a multiple of 8")
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(d))
    if interpret is None:
        from .mosaic_check import pallas_interpret

        interpret = pallas_interpret()
    if head_mode is None:
        head_mode = DEFAULT_HEAD_MODE
    if head_mode not in ("batched", "unroll"):
        raise ValueError(f"head_mode must be batched|unroll: {head_mode}")

    group = h // hkv
    gt = group * t
    gt_pad = max(8, ((gt + 7) // 8) * 8)
    quant = pool.k_scale is not None

    qg = q.reshape(b, hkv, gt, d).astype(jnp.float32)
    if gt_pad != gt:  # align query rows to the f32 sublane tile
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gt_pad - gt), (0, 0)))
    kp4 = key_pos.astype(jnp.int32).reshape(b, P, page, 1)
    tbl = page_table.astype(jnp.int32)
    # query-row true positions, precomputed once: row r <-> (group
    # g = r // t, token tt = r % t) at q_pos[b, tt]; padded rows reuse
    # r % t (their output is sliced off)
    rows = np.arange(gt_pad) % t
    qp4 = q_pos.astype(jnp.int32)[:, rows].reshape(b, 1, gt_pad, 1)

    # grid over (batch row, head chunk, page slot): a CHUNK of kv heads
    # rides in one (1, h_block, page, d) block — one big DMA per grid
    # step, instead of hkv x more grid steps on hkv x smaller blocks
    # (per-step overhead dominated that shape: 0.56x the gather path at
    # the r3 bench).  h_block shrinks from hkv only when the double-
    # buffered blocks would blow VMEM (or the sweep overrides it).
    item = pool.k.dtype.itemsize

    def vmem_bytes(hb: int) -> int:
        kv = 2 * 2 * hb * page * d * item          # k+v double-buffered
        if quant:
            kv += 2 * 2 * 2 * hb * page * 4
        qb = 2 * hb * gt_pad * d * 4 * 2           # q block + out block
        scratch = hb * gt_pad * (128 + 128 + d) * 4
        return kv + qb + scratch

    if h_block is None:
        h_block = hkv
        while h_block > 1 and (vmem_bytes(h_block) > 12 * 2**20
                               or hkv % h_block):
            h_block //= 2
    elif h_block < 1 or hkv % h_block:
        raise ValueError(
            f"h_block {h_block} must divide kv heads ({hkv})")
    grid = (b, hkv // h_block, P)

    def q_map(bi, hc, pi, *_):
        return (bi, hc, 0, 0)

    def kv_map(bi, hc, pi, tbl_ref):
        return (jnp.maximum(tbl_ref[bi, pi], 0), hc, 0, 0)

    def kp_map(bi, hc, pi, *_):
        return (bi, pi, 0, 0)

    def qp_map(bi, hc, pi, *_):
        return (bi, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, h_block, gt_pad, d), q_map),
        pl.BlockSpec((1, 1, gt_pad, 1), qp_map),
        pl.BlockSpec((1, h_block, page, d), kv_map),
        pl.BlockSpec((1, h_block, page, d), kv_map),
        pl.BlockSpec((1, 1, page, 1), kp_map),
    ]
    shapes = [qg.shape, qp4.shape, pool.k.shape, pool.v.shape, kp4.shape]
    operands = [qg, qp4, pool.k, pool.v, kp4]
    if quant:
        ks4 = pool.k_scale.reshape(n_pages, hkv, page, 1)
        vs4 = pool.v_scale.reshape(n_pages, hkv, page, 1)
        in_specs += [
            pl.BlockSpec((1, h_block, page, 1), kv_map),
            pl.BlockSpec((1, h_block, page, 1), kv_map),
        ]
        shapes += [ks4.shape, vs4.shape]
        operands += [ks4, vs4]

    out_specs = pl.BlockSpec((1, h_block, gt_pad, d), q_map)
    out_shape = jax.ShapeDtypeStruct((b, hkv, gt_pad, d), q.dtype)
    scratch_shapes = [
        pltpu.VMEM((h_block, gt_pad, 128), jnp.float32),
        pltpu.VMEM((h_block, gt_pad, 128), jnp.float32),
        pltpu.VMEM((h_block, gt_pad, d), jnp.float32),
    ]
    check_specs(in_specs, shapes, kernel="paged_decode")
    check_specs([out_specs], [out_shape.shape],
                kernel="paged_decode", kind="output")

    static = dict(sm_scale=float(sm_scale), hkv=h_block, num_pages=P,
                  window=window, quant=quant, head_mode=head_mode)
    if quant:
        def kernel(tbl_ref, q_ref, qp_ref, k_ref, v_ref, kp_ref,
                   ks_ref, vs_ref, o_ref, m_s, l_s, acc_s):
            _kernel(tbl_ref, q_ref, qp_ref, k_ref, v_ref, kp_ref,
                    o_ref, m_s, l_s, acc_s, ks_ref=ks_ref, vs_ref=vs_ref,
                    **static)
    else:
        kernel = functools.partial(_kernel, **static)

    resident = b * P * page  # virtual slots walked per head
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * hkv * gt * resident * d,
            bytes_accessed=(2 * hkv * resident * d) * pool.k.dtype.itemsize
            + 2 * b * h * t * d * 4,
            transcendentals=hkv * gt * resident,
        ),
        interpret=interpret,
    )(tbl, *operands)
    return out[:, :, :gt].reshape(b, h, t, d).astype(q.dtype)
