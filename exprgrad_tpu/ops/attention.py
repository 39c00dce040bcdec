"""Flash attention for TPU (Pallas forward + Pallas backward kernels).

Beyond-reference op (the reference tops out at conv/dense, SURVEY.md §5.7):
fused attention kernels in the style of jax's official Pallas TPU kernels.
The (seq, seq) score matrix is never materialized in HBM, forward or
backward:

* **forward**: the KV sequence is the innermost ("arbitrary") grid
  dimension; the kernel maintains the online-softmax running statistics
  (m: row max, l: row sum, acc: output) in VMEM scratch across KV tiles,
  rescaling previous contributions as new tiles arrive, and emits the
  per-row logsumexp for the backward pass.
* **backward**: two kernels recompute attention weights blockwise from the
  saved logsumexp (no m/l re-reduction needed).  The dq kernel iterates KV
  tiles innermost with a VMEM dq accumulator; the dk/dv kernel iterates Q
  tiles innermost with VMEM dk/dv accumulators.  ``delta = rowsum(dO * O)``
  is a cheap fused XLA elementwise pass.

Q/batch/head grid dimensions are "parallel" (megacore-friendly); causal
masks skip tiles entirely on the wrong side of the diagonal.
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

_NEG_INF = -1e30


def _tile_live(q_idx, kv_idx, *, block_q, block_k, causal, window, offs_ref):
    """Predicate: does this (q tile, kv tile) intersect the attention
    band at all?  Causal skips tiles above the diagonal; a sliding
    window additionally skips tiles entirely to the left of the band
    (compute drops from O(S^2) to O(S*W)).  With runtime offsets
    (sharded sequences) the skip becomes a traced predicate — pl.when
    handles both."""
    live = True
    q_lo = q_idx * block_q
    q_hi = q_lo + block_q - 1
    k_lo = kv_idx * block_k
    k_hi = k_lo + block_k - 1
    if offs_ref is not None:
        q_lo, q_hi = q_lo + offs_ref[0], q_hi + offs_ref[0]
        k_lo, k_hi = k_lo + offs_ref[1], k_hi + offs_ref[1]
    if causal:
        live = q_hi >= k_lo
    if window is not None:
        # rows attend to cols in (row - window, row]
        live = jnp.logical_and(live, k_hi > q_lo - window)
    return live


def _tile_needs_mask(q_idx, kv_idx, *, block_q, block_k, causal, window,
                     offs_ref):
    """Traced predicate: can ANY element of this tile be masked?

    Interior tiles of the causal triangle / sliding-window band are
    fully live, yet `_mask_scores` would still build two iota planes,
    compare, and select — pure VPU work comparable to the exp itself at
    128-wide blocks.  The kernels trace a mask-free body for tiles where
    this predicate is false (94% of causal-triangle steps, ~60% of
    banded window steps at the bench shapes).  Returns the Python bool
    False when no mask exists statically."""
    if not causal and window is None:
        return False
    q_lo = q_idx * block_q
    q_hi = q_lo + block_q - 1
    k_lo = kv_idx * block_k
    k_hi = k_lo + block_k - 1
    if offs_ref is not None:
        q_lo, q_hi = q_lo + offs_ref[0], q_hi + offs_ref[0]
        k_lo, k_hi = k_lo + offs_ref[1], k_hi + offs_ref[1]
    needs = False
    if causal:
        # a masked element (col > row) exists iff the tile's max col
        # exceeds its min row
        needs = k_hi > q_lo
    if window is not None:
        # a window-cut element (col <= row - window) exists iff the
        # tile's min col reaches back past the max row's window
        needs = jnp.logical_or(needs, k_lo <= q_hi - window)
    return needs


def _masked_dispatch(should_run, needs_mask, run_body):
    """Invoke ``run_body(mask: bool)`` under ``pl.when(should_run)``,
    splitting into a masked and a mask-free branch when ``needs_mask``
    is a traced predicate (exactly one branch executes per step)."""
    if needs_mask is False:
        pl.when(should_run)(lambda: run_body(False))
        return
    pl.when(jnp.logical_and(should_run, needs_mask))(
        lambda: run_body(True))
    pl.when(jnp.logical_and(should_run, jnp.logical_not(needs_mask)))(
        lambda: run_body(False))


def _mask_scores(s, q_idx, kv_idx, *, block_q, block_k, causal, window,
                 offs_ref):
    """Apply the causal / sliding-window mask in GLOBAL coordinates."""
    if not causal and window is None:
        return s
    rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    rows = q_idx * block_q + rows
    cols = kv_idx * block_k + cols
    if offs_ref is not None:
        rows = rows + offs_ref[0]
        cols = cols + offs_ref[1]
    keep = rows >= cols if causal else (rows == rows)
    if window is not None:
        keep = jnp.logical_and(keep, cols > rows - window)
    return jnp.where(keep, s, _NEG_INF)


def _kv_band(num_q: int, num_kv: int, block_q: int, block_k: int,
             window: int) -> int:
    """Widest per-q-tile band of live kv tiles for a causal window: the
    banded grid extent.  Shrinking the GRID to the band (rather than
    predicating with pl.when alone) is what makes windowed attention
    O(S*W): a pl.when-skipped tile still pays its grid step and its
    block DMA, which is why tile-skipping alone stalled at 1.31x of the
    ~4x ideal at S=4096 W=512."""
    width = 1
    for i in range(num_q):
        q_lo = i * block_q
        q_hi = q_lo + block_q - 1
        j_min = max(0, (q_lo - window + 1) // block_k)
        j_max = min(num_kv - 1, q_hi // block_k)
        width = max(width, j_max - j_min + 1)
    return width


def _q_band(num_q: int, num_kv: int, block_q: int, block_k: int,
            window: int) -> int:
    """Widest per-kv-tile band of live q tiles (the dkv kernel's grid)."""
    width = 1
    for j in range(num_kv):
        k_lo = j * block_k
        k_hi = k_lo + block_k - 1
        i_min = k_lo // block_q
        i_max = min(num_q - 1, (k_hi + window - 1) // block_q)
        width = max(width, i_max - i_min + 1)
    return width


def flash_tile_counts(sq: int, skv: int, block_q: int = 128,
                      block_k: int = 128, causal: bool = True,
                      window=None) -> dict:
    """Static visited-vs-live tile accounting for the flash kernels.

    For each kernel (fwd / dq / dkv) reports, per (batch*head) slice:
      - ``visited``: grid steps the kernel actually executes (the causal
        triangle enumeration or the windowed banded grid — matches the
        grids built in `_forward`/`_backward` exactly),
      - ``live``: tiles with at least one unmasked score (the ideal
        minimum a tile-skipping schedule could visit),
      - ``dead``: visited - live (band-clamp overshoot at the edges).
    Plus ``full``: the naive rectangular grid, and (when windowed)
    ``causal_visited``: what the plain-causal kernel visits at the same
    blocks — ``causal_visited / visited`` is the tile-level upper bound
    on the windowed-vs-causal speedup the chip can show; any measured
    shortfall below that bound is per-step/per-row overhead, not dead
    tiles.  Pure host arithmetic (no device), so benches and tests can
    assert the schedule quality chip-lessly.
    """
    num_q, num_kv = sq // block_q, skv // block_k

    def live_tiles(win):
        n = 0
        for i in range(num_q):
            q_lo, q_hi = i * block_q, i * block_q + block_q - 1
            for j in range(num_kv):
                k_lo, k_hi = j * block_k, j * block_k + block_k - 1
                if causal and k_lo > q_hi:
                    continue
                if win is not None and k_hi <= q_lo - win:
                    continue
                n += 1
        return n

    if window is not None and not causal:
        raise ValueError("window requires causal=True")  # mirror _resolve
    live = live_tiles(window)
    full = num_q * num_kv
    # mirror the kernels' grid selection EXACTLY (offsets=None modeled):
    # banding needs sq == skv (_forward/_backward: `banded = window is
    # not None and offsets is None and sq == skv`); the triangle
    # enumeration additionally needs num_q > 1.
    banded = window is not None and sq == skv
    tri = causal and window is None and sq == skv and num_q > 1
    if banded:
        fwd_visited = num_q * _kv_band(num_q, num_kv, block_q, block_k,
                                       window)
        dkv_visited = num_kv * _q_band(num_q, num_kv, block_q, block_k,
                                       window)
        # what the same kernel visits WITHOUT the window: the causal
        # triangle when it applies, else the full grid
        causal_visited = (
            len(_tri_schedule(num_q, num_kv, block_q, block_k, "q")[0])
            if num_q > 1 else full
        )
    elif tri:
        fwd_visited = len(_tri_schedule(num_q, num_kv, block_q, block_k,
                                        "q")[0])
        dkv_visited = len(_tri_schedule(num_q, num_kv, block_q, block_k,
                                        "kv")[0])
        causal_visited = fwd_visited
    else:
        # rectangular grid (sq != skv, or windowed-with-offsets shapes):
        # the kernels visit every tile; pl.when skips the dead compute
        # but not the grid step, so visited == full — and the no-window
        # baseline visits full too (tri needs sq == skv)
        fwd_visited = dkv_visited = full
        causal_visited = full
    out = {
        "fwd": {"visited": fwd_visited, "live": live,
                "dead": fwd_visited - live},
        "dq": {"visited": fwd_visited, "live": live,
               "dead": fwd_visited - live},
        "dkv": {"visited": dkv_visited, "live": live,
                "dead": dkv_visited - live},
        "full": full,
    }
    if window is not None:
        out["causal_visited"] = causal_visited
        out["tile_bound"] = round(causal_visited / fwd_visited, 3)
    return out


def _banded_kv_idx(q_idx, jpos, *, block_q, block_k, window):
    """Absolute kv tile index for banded grids (kernel-side mirror of
    the banded index maps)."""
    j_min = jnp.maximum(0, (q_idx * block_q - window + 1) // block_k)
    return j_min + jpos


def _banded_q_idx(kv_idx, ipos, *, block_q, block_k):
    return (kv_idx * block_k) // block_q + ipos


def _tri_schedule(num_q: int, num_kv: int, block_q: int, block_k: int,
                  major: str):
    """Enumerate the LIVE causal tiles as one flat grid dimension.

    A rectangular (q, kv) grid visits the dead upper triangle too —
    pl.when skips its compute but still pays ~half the grid steps and
    block DMAs.  Here the live (q_idx, kv_idx) pairs are precomputed and
    ride as scalar-prefetch arrays driving the BlockSpec index maps (the
    same mechanism as the paged-attention page table), so dead tiles are
    never visited at all.

    ``major="q"`` orders kv-innermost per q tile (fwd/dq accumulate over
    kv); ``major="kv"`` orders q-innermost per kv tile (dkv).  Returns
    (q_of, kv_of, first, last) int32 arrays over the flat tile index.
    """
    import numpy as np

    q_of, kv_of, first, last = [], [], [], []
    if major == "q":
        for i in range(num_q):
            j_max = min(num_kv - 1, (i * block_q + block_q - 1) // block_k)
            for j in range(j_max + 1):
                q_of.append(i)
                kv_of.append(j)
                first.append(1 if j == 0 else 0)
                last.append(1 if j == j_max else 0)
    else:
        for j in range(num_kv):
            i_min = (j * block_k) // block_q
            for i in range(i_min, num_q):
                q_of.append(i)
                kv_of.append(j)
                first.append(1 if i == i_min else 0)
                last.append(1 if i == num_q - 1 else 0)
    return (
        np.asarray(q_of, np.int32),
        np.asarray(kv_of, np.int32),
        np.asarray(first, np.int32),
        np.asarray(last, np.int32),
    )


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, m_scratch, l_scratch, acc_scratch,
    *, sm_scale: float, causal: bool, block_q: int, block_k: int,
    window=None, offs_ref=None, banded: bool = False, tri_refs=None,
):
    if tri_refs is not None:
        # causal triangle enumeration: the flat grid walks only live
        # tiles; the prefetched arrays give each step's coordinates
        tpos = pl.program_id(1)
        q_idx = tri_refs[0][tpos]
        kv_idx = tri_refs[1][tpos]
        is_first = tri_refs[2][tpos] == 1
        is_last = tri_refs[3][tpos] == 1
    else:
        jpos = pl.program_id(2)
        q_idx = pl.program_id(1)
        if banded:
            kv_idx = _banded_kv_idx(q_idx, jpos, block_q=block_q,
                                    block_k=block_k, window=window)
        else:
            kv_idx = jpos
        is_first = jpos == 0
        is_last = jpos == pl.num_programs(2) - 1

    @pl.when(is_first)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    should_run = _tile_live(q_idx, kv_idx, block_q=block_q, block_k=block_k,
                            causal=causal, window=window, offs_ref=offs_ref)
    needs_mask = _tile_needs_mask(q_idx, kv_idx, block_q=block_q,
                                  block_k=block_k, causal=causal,
                                  window=window, offs_ref=offs_ref)

    def _run(mask):
        q = q_ref[0]  # [block_q, d]
        k = k_ref[0]  # [block_k, d]
        v = v_ref[0]  # [block_k, d]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [block_q, block_k]
        if sm_scale != 1.0:
            s = s * sm_scale
        if mask:
            s = _mask_scores(s, q_idx, kv_idx, block_q=block_q,
                             block_k=block_k, causal=causal, window=window,
                             offs_ref=offs_ref)

        m_prev = m_scratch[...]          # [block_q, 128]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)          # [block_q, 1]
        m_next = jnp.maximum(m_prev, m_curr)                # broadcast
        alpha = jnp.exp(m_prev - m_next)                    # [block_q, 128]
        p = jnp.exp(s - m_next[:, :1])                      # [block_q, block_k]
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        m_scratch[...] = m_next
        l_scratch[...] = l_next

        acc_scratch[...] = acc_scratch[...] * alpha[:, :1]
        acc_scratch[...] += jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    _masked_dispatch(should_run, needs_mask, _run)

    @pl.when(is_last)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)
        # lse is carried as [bh, sq, 1] so its (1, block_q, 1) block
        # satisfies Mosaic's (8, 128)-divisible-or-full rule on the last
        # two dims, and (block_q, 1) matches the scratch row orientation.
        m = m_scratch[...][:, :1]
        lsum = l_scratch[...][:, :1]
        lse_ref[0] = m + jnp.log(jnp.where(lsum == 0.0, 1.0, lsum))


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scratch,
    *, sm_scale: float, causal: bool, block_q: int, block_k: int,
    window=None, offs_ref=None, banded: bool = False, tri_refs=None,
):
    if tri_refs is not None:
        tpos = pl.program_id(1)
        q_idx = tri_refs[0][tpos]
        kv_idx = tri_refs[1][tpos]
        is_first = tri_refs[2][tpos] == 1
        is_last = tri_refs[3][tpos] == 1
    else:
        q_idx = pl.program_id(1)
        jpos = pl.program_id(2)
        if banded:
            kv_idx = _banded_kv_idx(q_idx, jpos, block_q=block_q,
                                    block_k=block_k, window=window)
        else:
            kv_idx = jpos
        is_first = jpos == 0
        is_last = jpos == pl.num_programs(2) - 1

    @pl.when(is_first)
    def _init():
        dq_scratch[...] = jnp.zeros(dq_scratch.shape, jnp.float32)

    should_run = _tile_live(q_idx, kv_idx, block_q=block_q, block_k=block_k,
                            causal=causal, window=window, offs_ref=offs_ref)
    needs_mask = _tile_needs_mask(q_idx, kv_idx, block_q=block_q,
                                  block_k=block_k, causal=causal,
                                  window=window, offs_ref=offs_ref)

    def _run(mask):
        q = q_ref[0]                     # [block_q, d]
        k = k_ref[0]                     # [block_k, d]
        v = v_ref[0]                     # [block_k, d]
        do = do_ref[0]                   # [block_q, d]
        lse = lse_ref[0]                 # [block_q, 1]
        delta = delta_ref[0]             # [block_q, 1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if sm_scale != 1.0:
            s = s * sm_scale
        if mask:
            s = _mask_scores(s, q_idx, kv_idx, block_q=block_q,
                             block_k=block_k, causal=causal, window=window,
                             offs_ref=offs_ref)

        p = jnp.exp(s - lse)             # [block_q, block_k]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                # [block_q, block_k]
        ds = p * (dp - delta)
        if sm_scale != 1.0:
            ds = ds * sm_scale
        dq_scratch[...] += jax.lax.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        )

    _masked_dispatch(should_run, needs_mask, _run)

    @pl.when(is_last)
    def _store():
        dq_ref[0] = dq_scratch[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_scratch, dv_scratch,
    *, sm_scale: float, causal: bool, block_q: int, block_k: int,
    num_q_blocks: int, window=None, offs_ref=None, banded: bool = False,
    tri_refs=None,
):
    if tri_refs is not None:
        tpos = pl.program_id(1)
        q_idx = tri_refs[0][tpos]
        kv_idx = tri_refs[1][tpos]
        is_first = tri_refs[2][tpos] == 1
        is_last = tri_refs[3][tpos] == 1
    else:
        kv_idx = pl.program_id(1)
        ipos = pl.program_id(2)
        if banded:
            q_idx = _banded_q_idx(kv_idx, ipos, block_q=block_q,
                                  block_k=block_k)
        else:
            q_idx = ipos
        is_first = ipos == 0
        is_last = ipos == pl.num_programs(2) - 1

    @pl.when(is_first)
    def _init():
        dk_scratch[...] = jnp.zeros(dk_scratch.shape, jnp.float32)
        dv_scratch[...] = jnp.zeros(dv_scratch.shape, jnp.float32)

    should_run = _tile_live(q_idx, kv_idx, block_q=block_q, block_k=block_k,
                            causal=causal, window=window, offs_ref=offs_ref)
    if banded:
        # band overshoot past the last q tile is causally LIVE (q > k) but
        # the clamped index map would re-fetch a duplicate block — bound it
        # (the fwd/dq kv overshoot needs no bound: kv_idx > q_hi//block_k
        # is causally dead, and q_hi//block_k <= num_kv-1 when sq == skv)
        should_run = jnp.logical_and(should_run, q_idx < num_q_blocks)
    needs_mask = _tile_needs_mask(q_idx, kv_idx, block_q=block_q,
                                  block_k=block_k, causal=causal,
                                  window=window, offs_ref=offs_ref)

    def _run(mask):
        q = q_ref[0]                     # [block_q, d]
        k = k_ref[0]                     # [block_k, d]
        v = v_ref[0]                     # [block_k, d]
        do = do_ref[0]                   # [block_q, d]
        lse = lse_ref[0]                 # [block_q, 1]
        delta = delta_ref[0]             # [block_q, 1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if sm_scale != 1.0:
            s = s * sm_scale
        if mask:
            s = _mask_scores(s, q_idx, kv_idx, block_q=block_q,
                             block_k=block_k, causal=causal, window=window,
                             offs_ref=offs_ref)

        p = jnp.exp(s - lse)             # [block_q, block_k]
        # dv += p^T @ do
        dv_scratch[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        if sm_scale != 1.0:
            ds = ds * sm_scale
        # dk += ds^T @ q
        dk_scratch[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    _masked_dispatch(should_run, needs_mask, _run)

    @pl.when(is_last)
    def _store():
        dk_ref[0] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[...].astype(dv_ref.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8)
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sm_scale: Optional[float] = None,
    causal: bool = False,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
    window: Optional[int] = None,
) -> jax.Array:
    """softmax(q @ k^T * sm_scale) @ v, fused.

    Shapes: q [b, h, sq, d], k/v [b, hkv, skv, d] -> [b, h, sq, d] where
    hkv divides h (grouped-query / multi-query attention: each KV head
    serves h/hkv consecutive query heads).  Sequence lengths must divide
    the block sizes (pad upstream otherwise).

    ``window`` (requires ``causal=True``) restricts each query position r
    to keys in ``(r - window, r]`` — sliding-window attention.  Tiles
    entirely outside the band are skipped, so compute scales O(S*W)
    instead of O(S^2).
    """
    out, _ = _forward(q, k, v, sm_scale, causal, block_q, block_k, interpret,
                      window=window)
    return out


def _kv_group(q, k, v) -> int:
    """Query heads per KV head (grouped-query attention; 1 = standard)."""
    h, hkv = q.shape[1], k.shape[1]
    if v.shape[1] != hkv:
        raise ValueError(f"k has {hkv} heads but v has {v.shape[1]}")
    if h % hkv:
        raise ValueError(
            f"query heads ({h}) must be a multiple of kv heads ({hkv})"
        )
    return h // hkv


def _pick_block(s: int, target: int) -> int:
    """Largest sweep-ranked candidate <= ``target`` that divides ``s``;
    falls back to the legacy min(128, s) so non-dividing sequence
    lengths fail with exactly the old fixed-default error."""
    for cand in (target, 256, 128):
        c = min(cand, s)
        if s % c == 0:
            return c
    return min(128, s)


def _resolve(q, k, v, sm_scale, block_q, block_k, interpret, causal=True,
             window=None):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(d))
    if block_q is None or block_k is None:
        # measured defaults — r5 on-chip block sweep (BENCH_DETAILS
        # flash_block_sweep, jitter-safe rerun): dense/causal fwd body
        # rates at b8 h4 s2048 d128 were 13.3 TFLOP/s at the old fixed
        # 128x128 vs 52.1 at 512x512 (XLA: 14.7 — flash is 3.5x XLA at
        # the bench shape with these blocks; fwd+bwd 2.57ms vs XLA's
        # 11.06ms).  Windowed kernels: big tiles beat band granularity
        # too when the window is wide (s4096 w512: 0.61ms at 512x512 vs
        # 1.66ms at 128x128, 96% of the 512-tile banding bound); narrow
        # windows keep 128x128 — a 512-wide kv tile would be mostly
        # masked waste below w=256.
        if window is not None:
            tq, tk = (512, 512) if window >= 256 else (128, 128)
        else:
            tq, tk = (512, 512)
        if block_q is None:
            block_q = _pick_block(sq, tq)
        if block_k is None:
            block_k = _pick_block(skv, tk)
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    if sq % block_q or skv % block_k:
        raise ValueError(
            f"sequence lengths ({sq},{skv}) must be divisible by block "
            f"sizes ({block_q},{block_k})"
        )
    if window is not None:
        if not causal:
            raise ValueError("window requires causal=True")
        if window < 1:
            raise ValueError(f"window must be >= 1 (got {window})")
    if interpret is None:
        from .mosaic_check import pallas_interpret

        interpret = pallas_interpret()
    return float(sm_scale), block_q, block_k, bool(interpret)


def _forward(q, k, v, sm_scale, causal, block_q, block_k, interpret,
             offsets=None, window=None):
    """Returns (out [b,h,sq,d], lse [b*h, sq]).

    ``offsets`` (optional int32 array [q_offset, k_offset]) gives the
    global sequence positions of the local q/k chunks — the causal mask
    is computed in global coordinates, which is what sequence-parallel
    shards need (offsets are runtime values: scalar-prefetch operands).
    """
    b, h, sq, d = q.shape
    skv = k.shape[2]
    group = _kv_group(q, k, v)
    sm_scale, block_q, block_k, interpret = _resolve(
        q, k, v, sm_scale, block_q, block_k, interpret, causal, window
    )
    num_kv = skv // block_k
    num_q = sq // block_q
    # banded grid: with a sliding window (and no runtime offsets, which
    # would make the band data-dependent) the kv grid dim shrinks to the
    # widest live band — dead tiles are never visited, not just skipped.
    # Plain causal uses the triangle enumeration instead (scalar-prefetch
    # arrays drive the index maps over live tiles only).
    tri = (causal and window is None and offsets is None and sq == skv
           and num_q > 1)
    banded = window is not None and offsets is None and sq == skv
    if banded:
        kv_extent = _kv_band(num_q, num_kv, block_q, block_k, window)

        def kv_block(bh, i, j, *_):
            j_min = jnp.maximum(0, (i * block_q - window + 1) // block_k)
            return (bh // group, jnp.minimum(j_min + j, num_kv - 1), 0)
    else:
        kv_extent = num_kv

        def kv_block(bh, i, j, *_):
            return (bh // group, j, 0)

    grid = (b * h, num_q, kv_extent)

    static = dict(
        sm_scale=sm_scale,
        causal=causal,
        block_q=block_q,
        block_k=block_k,
        window=window,
        banded=banded,
    )
    qf = q.reshape(b * h, sq, d)
    kf = k.reshape(b * (h // group), skv, d)
    vf = v.reshape(b * (h // group), skv, d)
    # *_ swallows the scalar-prefetch ref passed to index maps when the
    # offsets path uses PrefetchScalarGridSpec.  KV blocks broadcast over
    # each group of `group` consecutive query heads (GQA/MQA).
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, i, j, *_: (bh, i, 0)),
        pl.BlockSpec((1, block_k, d), kv_block),
        pl.BlockSpec((1, block_k, d), kv_block),
    ]
    out_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, i, j, *_: (bh, i, 0)),
        # lse rides as [bh, sq, 1]: block (1, block_q, 1) keeps the last
        # two dims Mosaic-legal ((block_q % 8 == 0 or full), trailing dim
        # full) where a (1, block_q) row block over [bh, sq] does not.
        pl.BlockSpec((1, block_q, 1), lambda bh, i, j, *_: (bh, i, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        jax.ShapeDtypeStruct((b * h, sq, 1), jnp.float32),
    ]
    scratch_shapes = [
        pltpu.VMEM((block_q, 128), jnp.float32),
        pltpu.VMEM((block_q, 128), jnp.float32),
        pltpu.VMEM((block_q, d), jnp.float32),
    ]
    check_specs(in_specs, [qf.shape, kf.shape, vf.shape],
                kernel="flash_fwd")
    check_specs(out_specs, [s.shape for s in out_shape],
                kernel="flash_fwd", kind="output")
    params = dict(
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * (kv_extent * block_k) * d,
            bytes_accessed=(2 * b * h * sq * d + 2 * b * h * skv * d)
            * q.dtype.itemsize,
            transcendentals=b * h * sq * (kv_extent * block_k),
        ),
        interpret=interpret,
    )
    if tri:
        q_of, kv_of, first, last = _tri_schedule(
            num_q, num_kv, block_q, block_k, "q"
        )
        n_live = len(q_of)

        def q_map(bh, t, qof, kvof, fr, ls):
            return (bh, qof[t], 0)

        def kv_map(bh, t, qof, kvof, fr, ls):
            return (bh // group, kvof[t], 0)

        tri_in_specs = [
            pl.BlockSpec((1, block_q, d), q_map),
            pl.BlockSpec((1, block_k, d), kv_map),
            pl.BlockSpec((1, block_k, d), kv_map),
        ]
        tri_out_specs = [
            pl.BlockSpec((1, block_q, d), q_map),
            pl.BlockSpec((1, block_q, 1), q_map),
        ]

        def kernel(qof, kvof, fr, ls, q_ref, k_ref, v_ref, o_ref,
                   lse_ref, m_s, l_s, acc_s):
            _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_s, l_s,
                        acc_s, tri_refs=(qof, kvof, fr, ls), **static)

        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        )
        params["cost_estimate"] = pl.CostEstimate(
            flops=4 * b * h * n_live * block_q * block_k * d,
            bytes_accessed=(2 * b * h * sq * d + 2 * b * h * skv * d)
            * q.dtype.itemsize,
            transcendentals=b * h * n_live * block_q * block_k,
        )
        out, lse = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=(b * h, n_live),
                in_specs=tri_in_specs,
                out_specs=tri_out_specs,
                scratch_shapes=scratch_shapes,
            ),
            out_shape=out_shape,
            **params,
        )(jnp.asarray(q_of), jnp.asarray(kv_of), jnp.asarray(first),
          jnp.asarray(last), qf, kf, vf)
    elif offsets is None:
        kernel = functools.partial(_fwd_kernel, **static)
        out, lse = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            **params,
        )(qf, kf, vf)
    else:
        def kernel(offs_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                   m_s, l_s, acc_s):
            _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                        m_s, l_s, acc_s, offs_ref=offs_ref, **static)

        out, lse = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch_shapes,
            ),
            out_shape=out_shape,
            **params,
        )(jnp.asarray(offsets, jnp.int32), qf, kf, vf)
    return out.reshape(b, h, sq, d), lse[..., 0]


def flash_attention_forward(q, k, v, sm_scale=None, causal=False,
                            block_q=None, block_k=None, interpret=None,
                            offsets=None, window=None):
    """Forward-only entry returning ``(out, lse)`` with optional global
    sequence offsets — the building block for sequence-parallel attention
    (exprgrad_tpu.parallel.attention)."""
    return _forward(q, k, v, sm_scale, causal, block_q, block_k, interpret,
                    offsets, window=window)


def _backward(q, k, v, out, lse, g, sm_scale, causal, block_q, block_k,
              interpret, offsets=None, window=None):
    """dq/dk/dv from saved (out, lse).  With ``offsets`` the causal mask
    uses global coordinates, making this the per-(q chunk, kv chunk)
    partial-gradient building block for ring attention."""
    b, h, sq, d = q.shape
    skv = k.shape[2]
    group = _kv_group(q, k, v)
    sm_scale, block_q, block_k, interpret = _resolve(
        q, k, v, sm_scale, block_q, block_k, interpret, causal, window
    )
    num_q = sq // block_q
    num_kv = skv // block_k

    qf = q.reshape(b * h, sq, d)
    kf = k.reshape(b * (h // group), skv, d)
    vf = v.reshape(b * (h // group), skv, d)
    dof = g.reshape(b * h, sq, d)
    # delta[r] = sum_d dO[r,d] * O[r,d]  (one fused elementwise+reduce pass)
    # Both lse and delta ride as [b*h, sq, 1] so their (1, block_q, 1)
    # blocks satisfy Mosaic's last-two-dims rule (see _forward).
    delta = jnp.sum(
        dof.astype(jnp.float32) * out.reshape(b * h, sq, d).astype(jnp.float32),
        axis=-1, keepdims=True,
    )  # [b*h, sq, 1]
    lse = lse.reshape(b * h, sq, 1)

    def call(kernel_fn, static, grid, in_specs, out_specs, out_shape,
             scratch_shapes, cost, operands, tri_arrays=None):
        outs = out_shape if isinstance(out_shape, (list, tuple)) else [out_shape]
        ospecs = out_specs if isinstance(out_specs, (list, tuple)) else [out_specs]
        check_specs(in_specs, [o.shape for o in operands],
                    kernel=kernel_fn.__name__)
        check_specs(ospecs, [o.shape for o in outs],
                    kernel=kernel_fn.__name__, kind="output")
        params = dict(
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",) * (len(grid) - 1)
                + ("arbitrary",),
            ),
            cost_estimate=cost,
            interpret=interpret,
        )
        if tri_arrays is not None:
            def tri_wrapped(qof, kvof, fr, ls, *refs):
                kernel_fn(*refs, tri_refs=(qof, kvof, fr, ls), **static)

            return pl.pallas_call(
                tri_wrapped,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=4,
                    grid=grid,
                    in_specs=in_specs,
                    out_specs=out_specs,
                    scratch_shapes=scratch_shapes,
                ),
                out_shape=out_shape,
                **params,
            )(*[jnp.asarray(a) for a in tri_arrays], *operands)
        if offsets is None:
            return pl.pallas_call(
                functools.partial(kernel_fn, **static),
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shape,
                scratch_shapes=scratch_shapes,
                **params,
            )(*operands)

        def wrapped(offs_ref, *refs):
            kernel_fn(*refs, offs_ref=offs_ref, **static)

        return pl.pallas_call(
            wrapped,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch_shapes,
            ),
            out_shape=out_shape,
            **params,
        )(jnp.asarray(offsets, jnp.int32), *operands)

    q_spec = pl.BlockSpec((1, block_q, d), lambda bh, i, j, *_: (bh, i, 0))
    row_spec = pl.BlockSpec((1, block_q, 1), lambda bh, i, j, *_: (bh, i, 0))

    # triangle enumeration (see _forward): plain causal walks only the
    # live tiles via scalar-prefetched coordinate arrays
    tri = (causal and window is None and offsets is None and sq == skv
           and num_q > 1)
    if tri:
        def q_map_t(bh, tt, qof, kvof, fr, ls):
            return (bh, qof[tt], 0)

        def kv_map_t(bh, tt, qof, kvof, fr, ls):
            return (bh // group, kvof[tt], 0)

        def kvout_map_t(bh, tt, qof, kvof, fr, ls):
            return (bh, kvof[tt], 0)

        q_spec_t = pl.BlockSpec((1, block_q, d), q_map_t)
        row_spec_t = pl.BlockSpec((1, block_q, 1), q_map_t)
        kv_read_t = pl.BlockSpec((1, block_k, d), kv_map_t)
        base_static = dict(
            sm_scale=sm_scale,
            causal=causal,
            block_q=block_q,
            block_k=block_k,
            window=window,
        )
        tq = _tri_schedule(num_q, num_kv, block_q, block_k, "q")
        dq = call(
            _bwd_dq_kernel,
            base_static,
            (b * h, len(tq[0])),
            [q_spec_t, kv_read_t, kv_read_t, q_spec_t, row_spec_t,
             row_spec_t],
            q_spec_t,
            jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
            [pltpu.VMEM((block_q, d), jnp.float32)],
            pl.CostEstimate(
                flops=5 * b * h * len(tq[0]) * block_q * block_k * d,
                bytes_accessed=(2 * b * h * sq * d + 2 * b * h * skv * d)
                * q.dtype.itemsize,
                transcendentals=b * h * len(tq[0]) * block_q * block_k,
            ),
            (qf, kf, vf, dof, lse, delta),
            tri_arrays=tq,
        )
        tkv = _tri_schedule(num_q, num_kv, block_q, block_k, "kv")
        kv_out_t = pl.BlockSpec((1, block_k, d), kvout_map_t)
        dk, dv = call(
            _bwd_dkv_kernel,
            dict(num_q_blocks=num_q, **base_static),
            (b * h, len(tkv[0])),
            [q_spec_t, kv_read_t, kv_read_t, q_spec_t, row_spec_t,
             row_spec_t],
            [kv_out_t, kv_out_t],
            [
                jax.ShapeDtypeStruct((b * h, skv, d), k.dtype),
                jax.ShapeDtypeStruct((b * h, skv, d), v.dtype),
            ],
            [
                pltpu.VMEM((block_k, d), jnp.float32),
                pltpu.VMEM((block_k, d), jnp.float32),
            ],
            pl.CostEstimate(
                flops=5 * b * h * len(tkv[0]) * block_q * block_k * d,
                bytes_accessed=(2 * b * h * sq * d + 3 * b * h * skv * d)
                * q.dtype.itemsize,
                transcendentals=b * h * len(tkv[0]) * block_q * block_k,
            ),
            (qf, kf, vf, dof, lse, delta),
            tri_arrays=tkv,
        )
        if group > 1:
            dk = dk.reshape(b, h // group, group, skv, d).sum(axis=2)
            dv = dv.reshape(b, h // group, group, skv, d).sum(axis=2)
        return (
            dq.reshape(q.shape),
            dk.reshape(k.shape).astype(k.dtype),
            dv.reshape(v.shape).astype(v.dtype),
        )

    # banded grids (see _forward): dq walks the live kv band per q tile,
    # dkv the live q band per kv tile — dead tiles are never visited
    banded = window is not None and offsets is None and sq == skv
    if banded:
        kv_extent = _kv_band(num_q, num_kv, block_q, block_k, window)
        q_extent = _q_band(num_q, num_kv, block_q, block_k, window)

        def kv_block_dq(bh, i, j, *_):
            j_min = jnp.maximum(0, (i * block_q - window + 1) // block_k)
            return (bh // group, jnp.minimum(j_min + j, num_kv - 1), 0)

        def qrow_dkv(bh, j, i, *_):
            i_min = (j * block_k) // block_q
            return (bh, jnp.minimum(i_min + i, num_q - 1), 0)
    else:
        kv_extent, q_extent = num_kv, num_q

        def kv_block_dq(bh, i, j, *_):
            return (bh // group, j, 0)

        def qrow_dkv(bh, j, i, *_):
            return (bh, i, 0)

    dq = call(
        _bwd_dq_kernel,
        dict(
            sm_scale=sm_scale,
            causal=causal,
            block_q=block_q,
            block_k=block_k,
            window=window,
            banded=banded,
        ),
        (b * h, num_q, kv_extent),
        [
            q_spec,
            pl.BlockSpec((1, block_k, d), kv_block_dq),
            pl.BlockSpec((1, block_k, d), kv_block_dq),
            q_spec,
            row_spec,
            row_spec,
        ],
        q_spec,
        jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        [pltpu.VMEM((block_q, d), jnp.float32)],
        pl.CostEstimate(
            flops=5 * b * h * sq * skv * d,
            bytes_accessed=(2 * b * h * sq * d + 2 * b * h * skv * d)
            * q.dtype.itemsize,
            transcendentals=b * h * sq * skv,
        ),
        (qf, kf, vf, dof, lse, delta),
    )

    # dk/dv: one pass per KV tile with Q innermost.  Under GQA the kernel
    # reads the shared KV block (bh // group) but writes PER-QUERY-HEAD
    # partials (each grid bh owns its own output block — no write races);
    # the group reduction happens in XLA afterwards.
    kv_read_spec = pl.BlockSpec(
        (1, block_k, d), lambda bh, j, i, *_: (bh // group, j, 0)
    )
    kv_spec = pl.BlockSpec((1, block_k, d), lambda bh, j, i, *_: (bh, j, 0))
    qrow_spec = pl.BlockSpec((1, block_q, d), qrow_dkv)
    row_spec2 = pl.BlockSpec(
        (1, block_q, 1),
        (lambda bh, j, i, *_: (bh, i, 0)) if not banded else
        (lambda bh, j, i, *_: (
            bh,
            jnp.minimum((j * block_k) // block_q + i, num_q - 1),
            0,
        )),
    )
    dk, dv = call(
        _bwd_dkv_kernel,
        dict(
            sm_scale=sm_scale,
            causal=causal,
            block_q=block_q,
            block_k=block_k,
            num_q_blocks=num_q,
            window=window,
            banded=banded,
        ),
        (b * h, num_kv, q_extent),
        [
            qrow_spec,
            kv_read_spec,
            kv_read_spec,
            qrow_spec,
            row_spec2,
            row_spec2,
        ],
        [kv_spec, kv_spec],
        [
            jax.ShapeDtypeStruct((b * h, skv, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, skv, d), v.dtype),
        ],
        [
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        pl.CostEstimate(
            flops=5 * b * h * sq * skv * d,
            bytes_accessed=(2 * b * h * sq * d + 3 * b * h * skv * d)
            * q.dtype.itemsize,
            transcendentals=b * h * sq * skv,
        ),
        (qf, kf, vf, dof, lse, delta),
    )

    if group > 1:
        dk = dk.reshape(b, h // group, group, skv, d).sum(axis=2)
        dv = dv.reshape(b, h // group, group, skv, d).sum(axis=2)
    return (
        dq.reshape(q.shape),
        dk.reshape(k.shape).astype(k.dtype),
        dv.reshape(v.shape).astype(v.dtype),
    )


def flash_attention_backward(q, k, v, out, lse, g, sm_scale=None,
                             causal=False, block_q=None, block_k=None,
                             interpret=None, offsets=None, window=None):
    """Public backward entry: gradients from saved ``(out, lse)`` with
    optional global offsets (the ring-attention partial building block)."""
    return _backward(q, k, v, out, lse, g, sm_scale, causal, block_q,
                     block_k, interpret, offsets, window=window)


def _reference_weights(q, k, sm_scale, causal, window=None):
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * sm_scale
    if causal or window is not None:
        sq, skv = s.shape[-2], s.shape[-1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 1)
        keep = rows >= cols if causal else (rows == rows)
        if window is not None:
            keep = keep & (cols > rows - window)
        s = jnp.where(keep, s, _NEG_INF)
    return jax.nn.softmax(s, axis=-1)


def _fwd_rule(q, k, v, sm_scale, causal, block_q, block_k, interpret,
              window):
    out, lse = _forward(q, k, v, sm_scale, causal, block_q, block_k,
                        interpret, window=window)
    return out, (q, k, v, out, lse)


def _bwd_rule(sm_scale, causal, block_q, block_k, interpret, window,
              residuals, g):
    q, k, v, out, lse = residuals
    return _backward(q, k, v, out, lse, g, sm_scale, causal, block_q,
                     block_k, interpret, window=window)


def xla_attention_vjp(q, k, v, g, sm_scale=None, causal=False, window=None):
    """Plain-XLA attention backward (materializes the weight matrix).

    Kept as an independent oracle for testing the Pallas backward kernels.
    """
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(q.shape[-1]))
    p = _reference_weights(q, k, sm_scale, causal, window)   # [b,h,sq,skv] f32
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g32, v.astype(jnp.float32))
    row = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - row) * sm_scale
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32))
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention.defvjp(_fwd_rule, _bwd_rule)
