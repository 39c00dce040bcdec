"""Continuous batching for FlashLMServer: slot-based request scheduling.

A production serving loop never sees aligned batches — requests arrive
at different times with different prompt lengths and generation budgets.
Static batching (``server.generate``) holds the whole batch until its
slowest member finishes; CONTINUOUS batching admits a new request into a
slot the moment one frees up, so the TPU decodes a full batch every step
regardless of request timing (Yu et al., "Orca: A Distributed Serving
System for Transformer-Based Generative Models", OSDI 2022 — the
iteration-level scheduling idea).

The TPU-native shape of the idea:

* ONE jitted decode step for the whole slot batch, every iteration —
  static shapes, no recompiles as requests come and go.  Per-row cache
  cursors (``ops.decode.append_at``) let each slot sit at its own depth
  in the shared KV cache; validity is position-masked per row exactly
  like the ragged path (``key_pos``/``q_pos``).
* Admission = one jitted prefill per PROMPT-WIDTH BUCKET on a batch-1
  scratch cache, whose rows are then written into the slot's region of
  the big cache (bit-identical K/V: same bf16/int8 rounding as solo).
* All scheduling state (queues, per-slot lengths, budgets) is tiny host
  numpy — the device only ever sees dense batched work.

Greedy outputs are BIT-EQUAL to serving each prompt alone with
``server.generate`` (same kernels, same masking, same rounding);
sampling draws batch-shaped noise so individual draws differ from a
solo call, exactly as documented for ragged ``generate``.

The reference framework has no serving runtime (its models stop at
``call``, model.nim:392-406); this module extends the serving stack the
rebuild added on top of reference parity.
"""

from __future__ import annotations

from collections import deque
from typing import Optional, Sequence

import numpy as np

from ..errors import ModelRuntimeError
from ._sample import check_top_p, make_picker, make_row_picker


class _Request:
    __slots__ = ("rid", "tokens", "max_new", "out", "consumed", "absorbed",
                 "submitted", "first_token_at", "finished_at", "preempted",
                 "temp", "top_k", "top_p", "stop_seq")

    def __init__(self, rid, tokens, max_new):
        import time

        self.rid = rid
        self.tokens = tokens
        self.max_new = max_new
        self.out: list[int] = []
        self.consumed = 0   # prompt tokens already in cache (admission)
        self.absorbed = 0   # out tokens already folded into the prompt
                            # by a recompute preemption
        self.submitted = time.perf_counter()
        self.first_token_at: float | None = None
        self.finished_at: float | None = None
        self.preempted = 0
        self.temp = 0.0      # per-request sampling params (submit())
        self.top_k = 0
        self.top_p = 1.0
        self.stop_seq: tuple | None = None  # per-request stop sequence


def _host_key(jax, seed):
    """An RNG key pinned to the host CPU device.

    The batcher splits its key EAGERLY once per dispatch (_split); with
    the key resident on the accelerator that eager op is a device round
    trip — through this platform's network tunnel, ~25 ms *per decode
    step*, dwarfing the step itself.  Threefry is deterministic across
    backends, so splitting on host CPU preserves the exact stream; the
    subkey rides into the compiled program with the other host args."""
    key = jax.random.PRNGKey(seed)
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return key
    return jax.device_put(key, cpu)


def _check_stop_seq(stop_seq, vocab):
    """Validate a per-request stop sequence (token ids in [0, vocab))."""
    if stop_seq is None:
        return None
    seq = tuple(int(t) for t in stop_seq)
    if not seq or any(t < 0 or t >= vocab for t in seq):
        raise ModelRuntimeError(
            f"stop_seq must be non-empty token ids in [0, {vocab}); "
            f"got {list(seq)}"
        )
    return seq


def _greedy_accept(jnp, logits, props, pick_k):
    """Greedy verify: the target's argmax over the ``pick_k + 1``
    verified positions, plus how many leading proposals it agrees with
    (cumprod of positional matches) — ONE definition behind the draft
    round's greedy branch and both batchers' lookup rounds."""
    pr = props.astype(jnp.int32)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    match = pr == greedy[:, :pick_k]
    accept = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
    return greedy, accept


def _lookup_propose(hist: np.ndarray, k: int, ngram: int) -> np.ndarray:
    """Prompt-lookup proposals over an int64 token history: the ``k``
    tokens that followed the most recent earlier occurrence of the last
    ``ngram`` tokens — the numpy mirror of
    ``FlashLMServer.generate_lookup``'s in-graph ``propose`` (serve.py).
    No match falls back to repeating the last token, exactly like the
    solo variant's ``found=False`` branch."""
    pos = hist.size
    last = hist[-1]
    # windows may start at 0..pos-ngram-1: they must end strictly before
    # the query ngram DOES (only the self-match is excluded — overlap
    # with the query is allowed), mirroring serve.py's starts mask
    if pos - 1 < ngram:
        return np.full(k, last, np.int64)
    from numpy.lib.stride_tricks import sliding_window_view

    wins = sliding_window_view(hist[:pos - 1], ngram)
    match = np.all(wins == hist[pos - ngram:pos][None, :], axis=1)
    starts = np.nonzero(match)[0]
    if not starts.size:
        return np.full(k, last, np.int64)
    best = int(starts[-1])
    prop_idx = np.minimum(best + ngram + np.arange(k), pos - 1)
    return hist[prop_idx]


def _stop_seq_hit(req) -> bool:
    """True when the request's emitted tail equals its stop sequence.
    Host-side (the scheduler finishes requests outside the compiled
    step), so per-request sequences of any length share one program."""
    seq = req.stop_seq
    return (seq is not None and len(req.out) >= len(seq)
            and tuple(req.out[-len(seq):]) == seq)


def _scratch_caches(pools, page_table_row, pre_len, extra):
    """Batch-1 scratch dense caches whose front is the slot's pages
    gathered in position order, cursor at the TRACED ``pre_len`` — the
    shared mechanism of prefix-cached admission and chunked prefill.
    ``extra`` spare rows follow the gathered region (the worst case
    needs them when ``pre_len`` reaches the table's virtual capacity).
    Module-level on purpose: it is called inside jitted closures, which
    must not capture the batcher (its KV pools would be pinned in the
    server's shared JitCache)."""
    import jax.numpy as jnp

    from ..ops.decode import KVCache
    from ..ops.paged import gather_rows

    minis = []
    for pool in pools:
        kp, vp, kps, vps = gather_rows(pool, page_table_row)
        pad = jnp.zeros(
            (1, kp.shape[1], extra, kp.shape[3]), pool.k.dtype)
        minis.append(KVCache(
            k=jnp.concatenate([kp, pad], axis=2),
            v=jnp.concatenate([vp, pad], axis=2),
            length=pre_len.astype(jnp.int32),
            k_scale=None if kps is None else jnp.concatenate(
                [kps, jnp.ones((1, kp.shape[1], extra),
                               jnp.float32)], axis=2),
            v_scale=None if vps is None else jnp.concatenate(
                [vps, jnp.ones((1, kp.shape[1], extra),
                               jnp.float32)], axis=2),
        ))
    return minis


def _cursor_key_pos(n, pos, extra=0):
    """Per-row slot validity for cursor-based caches: [b, n] of the slot
    index where ``slot <= pos + extra``, else -1 (the decode_attention
    masking convention).  One definition for every decode/verify path."""
    import jax.numpy as jnp

    ids = jnp.arange(n, dtype=jnp.int32)
    return jnp.where(ids[None, :] <= pos[:, None] + extra,
                     ids[None, :], jnp.int32(-1))


def _pick_first(pick, logits, length, key, temp, top_k, top_p):
    """First token of a batch-1 prefill: per-request-parameterized pick
    from the logits row at (length - 1) (shared by plain and
    prefix-cached admission)."""
    import jax.numpy as jnp

    idx = jnp.reshape(length - 1, (1, 1, 1)).astype(jnp.int32)
    return pick(
        jnp.take_along_axis(logits, idx, axis=1)[:, 0], key,
        jnp.reshape(temp, (1,)), jnp.reshape(top_k, (1,)),
        jnp.reshape(top_p, (1,)),
    )[0]


def _make_paged_io(attention: str, page_table, wpid, woff):
    """Cache-IO object for the paged decode paths: ``append`` writes
    fresh K/V at host/trace-chosen (page, offset) coordinates;
    attention either gathers a dense view (``attention='gather'``, the
    XLA path) or attends against the pages IN PLACE through the Pallas
    paged-attention kernel (``attention='flash'`` — ops.paged_attention;
    the resident cache crosses HBM once per step instead of twice).

    Module-level on purpose: the returned class is captured by jitted
    scheduler programs living in the server's shared JitCache, which
    must never pin the batcher itself (its KV pools would leak — see
    test_jit_closures_do_not_pin_the_batcher)."""
    from ..ops.paged import gather_view, write_token

    class _IO:
        @staticmethod
        def append(pool, k, v):
            return write_token(pool, k, v, wpid, woff)

        @staticmethod
        def view(pool):
            return gather_view(pool, page_table)

    if attention == "flash":
        from ..ops.paged_attention import paged_decode_attention

        def attend(q, pool, sm_scale, window, key_pos, q_pos):
            return paged_decode_attention(
                q, pool, page_table, key_pos, q_pos,
                sm_scale=sm_scale, window=window)

        _IO.attend = staticmethod(attend)
    return _IO


def _write_slot_rows(jax, caches, minis, slot):
    """Copy a batch-1 scratch cache's rows into row ``slot`` of the big
    dense caches (shared by target and draft admission)."""
    import jax.numpy as jnp

    zero = jnp.int32(0)
    out = []
    for big, m in zip(caches, minis):
        big = big._replace(
            k=jax.lax.dynamic_update_slice(
                big.k, m.k, (slot, zero, zero, zero)),
            v=jax.lax.dynamic_update_slice(
                big.v, m.v, (slot, zero, zero, zero)),
        )
        if big.k_scale is not None:
            big = big._replace(
                k_scale=jax.lax.dynamic_update_slice(
                    big.k_scale, m.k_scale, (slot, zero, zero)),
                v_scale=jax.lax.dynamic_update_slice(
                    big.v_scale, m.v_scale, (slot, zero, zero)),
            )
        out.append(big)
    return out


class ContinuousBatcher:
    """Iteration-level scheduler over a :class:`FlashLMServer`.

    ``slots`` is the decode batch width (the TPU works on all slots every
    step); ``capacity`` bounds ``prompt_len + max_new - 1`` per request.
    ``prompt_buckets`` quantizes admission prefill widths so a stream of
    varied prompts compiles a handful of prefill programs, not one per
    length (default: powers of two up to ``capacity``).

    >>> b = ContinuousBatcher(server, slots=4, capacity=128)
    >>> rid = b.submit([3, 1, 4], max_new=16)
    >>> done = b.run()            # {rid: np.ndarray of 16 tokens}

    ``submit`` may be called at any time — including between ``step()``
    calls while other requests are mid-flight; that interleaving is the
    point of the design.
    """

    def __init__(
        self,
        server,
        slots: int = 8,
        capacity: Optional[int] = None,
        temperature: float = 0.0,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        stop_token: Optional[int] = None,
        seed: int = 0,
        prompt_buckets: Optional[Sequence[int]] = None,
        paged: bool = False,
        page_size: int = 16,
        pool_pages: Optional[int] = None,
        decode_chunk: int = 1,
        prefill_chunk: Optional[int] = None,
        draft=None,
        spec_k: int = 4,
        lookup: bool = False,
        lookup_ngram: int = 2,
        stream_tokens: bool = False,
        attention: str = "gather",
        pipeline: int = 0,
    ):
        import jax

        check_top_p(top_p)
        if attention not in ("gather", "flash"):
            raise ModelRuntimeError(
                f"attention must be 'gather' (dense view + XLA decode "
                f"attention) or 'flash' (Pallas paged-attention kernel); "
                f"got {attention!r}")
        if attention == "flash":
            if not paged:
                raise ModelRuntimeError(
                    "attention='flash' is the paged-attention kernel; it "
                    "requires ContinuousBatcher(paged=True)")
            if int(page_size) % 8:
                raise ModelRuntimeError(
                    f"attention='flash' needs page_size to be a multiple "
                    f"of 8 (Mosaic sublane tile); got {page_size}")
        self.attention = attention
        if draft is not None:
            # speculative continuous batching: greedy (exact streams) or
            # temperature sampling (exact rejection scheme, solo
            # distributions); the spec round IS the multi-step mechanism
            if top_k is not None or top_p is not None:
                raise ModelRuntimeError(
                    "speculative batching supports greedy or plain "
                    "temperature sampling; top_k/top_p filters are not "
                    "part of the rejection scheme")
            if decode_chunk != 1:
                raise ModelRuntimeError(
                    "draft= and decode_chunk are mutually exclusive "
                    "(the spec round already amortizes dispatches)")
            if draft.vocab != server.vocab:
                raise ModelRuntimeError(
                    f"draft vocab {draft.vocab} != target vocab "
                    f"{server.vocab}")
        if spec_k < 1:  # stored unconditionally: validate unconditionally
            raise ModelRuntimeError(f"spec_k must be >= 1 (got {spec_k})")
        if lookup:
            # prompt-lookup speculative batching (draft-FREE): per-slot
            # proposals come from a host-side ngram match over the
            # slot's prompt + emitted history (the host already holds it
            # for stop detection — zero extra device state), verified
            # k-wide in one dispatch.  Output is exact greedy, so
            # sampling settings are rejected like the draft path's
            # top-k/p are.
            if draft is not None:
                raise ModelRuntimeError(
                    "lookup=True and draft= are mutually exclusive "
                    "(lookup IS the draft-free speculation variant)")
            if temperature != 0.0 or top_k is not None or top_p is not None:
                raise ModelRuntimeError(
                    "lookup speculation is exact-greedy only; it has no "
                    "proposal distribution for the rejection scheme "
                    "(use draft= for sampled speculation)")
            if decode_chunk != 1:
                raise ModelRuntimeError(
                    "lookup=True and decode_chunk are mutually exclusive "
                    "(the verify round already amortizes dispatches)")
            if lookup_ngram < 1:
                raise ModelRuntimeError(
                    f"lookup_ngram must be >= 1 (got {lookup_ngram})")
        self.draft = draft
        self.lookup = bool(lookup)
        self.lookup_ngram = int(lookup_ngram)
        self._spec = draft is not None or self.lookup
        self.spec_k = int(spec_k)
        if decode_chunk < 1:
            raise ModelRuntimeError(
                f"decode_chunk must be >= 1 (got {decode_chunk})")
        self.decode_chunk = int(decode_chunk)
        if pipeline < 0:
            raise ModelRuntimeError(
                f"pipeline must be >= 0 (got {pipeline})")
        if pipeline and (draft is not None or lookup):
            raise ModelRuntimeError(
                "pipeline= and speculation are mutually exclusive (the spec "
                "round's acceptance is data-dependent per dispatch)")
        if pipeline and decode_chunk < 2:
            raise ModelRuntimeError(
                "pipeline= requires decode_chunk >= 2 (pipelining "
                "amortizes the per-dispatch round trip over chunks)")
        # pipelined chunked decode: keep `pipeline` extra chunk
        # dispatches in flight, chained DEVICE-side on the chunk
        # program's returned (tok, pos) — the host never reads tokens
        # back before issuing the next dispatch, so the per-dispatch
        # host round trip overlaps across the pipe. Greedy streams are
        # bit-equal to pipeline=0 (rows are independent; post-stop
        # garbage is fenced/discarded). Stop detection lags up to
        # `pipeline` chunks: a stopped row wastes at most that much
        # device work, and its slot is released only once the pipe
        # drains (in-flight dispatches still write its quarantined
        # pages).
        self.pipeline = int(pipeline)
        self._pipe: deque = deque()
        self._pending_release: list = []
        self._deferred_finished: list = []
        self._pipe_draining = False
        self._dev_tok = None
        self._dev_pos = None
        self._shadow_pos = None
        if prefill_chunk is not None:
            if not paged:
                raise ModelRuntimeError(
                    "prefill_chunk requires ContinuousBatcher(paged=True)")
            if prefill_chunk < 1 or prefill_chunk % int(page_size):
                raise ModelRuntimeError(
                    f"prefill_chunk must be a positive multiple of "
                    f"page_size {page_size} (got {prefill_chunk})"
                )
        self.prefill_chunk = (
            None if prefill_chunk is None else int(prefill_chunk))
        self._jax = jax
        self.server = server
        self.slots = int(slots)
        self.capacity = int(capacity or server.max_seq)
        if self.capacity > server.max_seq:
            raise ModelRuntimeError(
                f"capacity {self.capacity} exceeds the model's max_seq "
                f"{server.max_seq} position embeddings"
            )
        if draft is not None and self.capacity > draft.max_seq:
            # the spec round feeds the draft the same positions; silent
            # clamping would just collapse acceptance to zero
            raise ModelRuntimeError(
                f"capacity {self.capacity} exceeds the DRAFT model's "
                f"max_seq {draft.max_seq}"
            )
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p
        self.stop_token = stop_token
        from ..utils.buckets import normalize_buckets

        self.prompt_buckets = normalize_buckets(
            "pow2" if prompt_buckets is None else prompt_buckets,
            "prompt bucket",
        )

        self._pick = make_picker(server.vocab, temperature, top_k, top_p)
        self._row_pick = make_row_picker(server.vocab)
        # per-slot sampling params (per-request values land here at
        # reservation; traced into ONE compiled program for any mix)
        self.req_temp = np.zeros(self.slots, np.float32)
        self.req_topk = np.full(self.slots, server.vocab, np.int32)
        self.req_topp = np.ones(self.slots, np.float32)
        self._key = _host_key(jax, seed)
        self.paged = bool(paged)
        if self.paged:
            # vLLM-style paged KV cache: a shared page pool + per-slot
            # page tables; ``pool_pages`` usable pages (default: the
            # dense equivalent) + one reserved trash page (id 0) that
            # inactive rows scribble on.  Pages allocate on demand and
            # pool exhaustion preempts by RECOMPUTE (requeue the victim
            # with its generated prefix — greedy output is unchanged).
            from ..ops.paged import init_pool

            self.page_size = int(page_size)
            if self.page_size < 1:
                raise ModelRuntimeError("page_size must be >= 1")
            self.pages_per_slot = -(-self.capacity // self.page_size)
            usable = (pool_pages if pool_pages is not None
                      else self.slots * self.pages_per_slot)
            if usable < 1:
                raise ModelRuntimeError("pool_pages must be >= 1")
            self.pool_pages = int(usable)
            self.caches = [
                init_pool(self.pool_pages + 1, server.kv_heads,
                          self.page_size, server.head_dim,
                          dtype=server.cache_dtype)
                for _ in server.blocks
            ]
            self.free_pages = list(range(1, self.pool_pages + 1))
            self.slot_pages: list[list[int]] = [[] for _ in range(slots)]
            self.page_table = np.zeros(
                (self.slots, self.pages_per_slot), np.int32)
            self._preempts = 0
            self._window_evicted = 0
            self._evict_cursor = np.zeros(self.slots, np.int64)
            # prefix cache: registered (tokens, pinned pages) entries
            # whose K/V pages are SHARED read-only by matching prompts
            self._prefixes: list[tuple[np.ndarray, list[int]]] = []
            self._slot_pinned = np.zeros(self.slots, np.int64)
            self._prefix_hits = 0
        else:
            self.caches = server.init_caches(self.slots, self.capacity)
        self.pos = np.zeros(self.slots, np.int32)     # cached tokens/slot
        self.last = np.zeros(self.slots, np.float32)  # next token to feed
        self.active = np.zeros(self.slots, bool)
        self._req: list[Optional[_Request]] = [None] * self.slots
        self.queue: deque[_Request] = deque()
        self._next_rid = 0
        self._steps = 0
        self._dispatches = 0
        # bounded: a long-running server must not leak one record per
        # request (drain with request_metrics(reset=True) to keep all)
        self._metrics: deque = deque(maxlen=4096)
        self.stream_tokens = bool(stream_tokens)
        self._stream: list[tuple] = []
        if self.draft is not None:
            # the draft's KV state is always a DENSE per-slot cache
            # (small model: its cache HBM is minor even when the target
            # pages); per-row cursors mirror the target's positions
            self.draft_caches = self.draft.init_caches(
                self.slots, self.capacity)
        if self._spec:
            self._spec_emitted = 0
            self._spec_rounds = 0

    # -- jitted pieces -------------------------------------------------
    def _split(self):
        # both arrays live on host CPU (_host_key) — no tunnel traffic;
        # the subkey returns as numpy so it enters the compiled program
        # like any other host argument
        self._key, sub = self._jax.random.split(self._key)
        return np.asarray(sub)

    def _admit_fn(self, width: int):
        """Prefill a [1, width] padded prompt on a scratch cache, pick the
        first token, and write the K/V region into the slot's rows."""
        jax, srv = self._jax, self.server
        pick = self._row_pick
        import jax.numpy as jnp

        def build():
            def run(prompt, length, slot, caches, key, temp, tk, tp):
                mini = srv.init_caches(1, width)
                lens = length[None]
                pos_ids, key_pos = srv._ragged_positions(lens, width, width)
                x = srv._embed_at(prompt, pos_ids)
                logits, mini = srv._step(x, mini, 0, key_pos=key_pos,
                                         q_pos=pos_ids)
                first = _pick_first(pick, logits, length, key, temp, tk, tp)
                return first, _write_slot_rows(jax, caches, mini, slot)

            return run

        return self.server._jit_cache.get(
            ("cb_admit", width, self.slots, self.capacity),
            build, donate_argnums=(3,),
        )

    def _decode_fn(self):
        """One decode step for every slot: feed each slot's pending token
        at its own position, write K/V at its own cursor, pick the next."""
        jax, srv = self._jax, self.server
        pick = self._row_pick
        capacity = self.capacity
        import jax.numpy as jnp

        def build():
            def run(tok, pos, caches, key, temp, tk, tp):
                key_pos = _cursor_key_pos(capacity, pos)
                x = srv._embed_at(tok[:, None], pos[:, None])
                logits, caches = srv._step(
                    x, caches, 0, key_pos=key_pos, q_pos=pos[:, None],
                    row_starts=pos,
                )
                nxt = pick(logits[:, -1], key, temp, tk, tp)
                return nxt, caches

            return run

        return self.server._jit_cache.get(
            ("cb_decode", self.slots, self.capacity),
            build, donate_argnums=(2,),
        )

    def _decode_paged_fn(self):
        """One paged decode step for every slot: gather each row's pages
        into a dense attention view, write fresh K/V at host-chosen
        (page, offset) coordinates."""
        jax, srv = self._jax, self.server
        pick = self._row_pick
        import jax.numpy as jnp

        virtual = self.pages_per_slot * self.page_size
        attention = self.attention

        def build():
            def run(tok, pos, pools, page_table, wpid, woff, key,
                    temp, tk, tp):
                key_pos = _cursor_key_pos(virtual, pos)
                x = srv._embed_at(tok[:, None], pos[:, None])
                logits, pools = srv._step(
                    x, pools, 0, key_pos=key_pos, q_pos=pos[:, None],
                    cache_io=_make_paged_io(attention, page_table, wpid,
                                            woff),
                )
                nxt = pick(logits[:, -1], key, temp, tk, tp)
                return nxt, pools

            return run

        return self.server._jit_cache.get(
            ("cb_decode_paged", self.slots, self.pages_per_slot,
             self.pool_pages, self.page_size, self.attention),
            build, donate_argnums=(2,),
        )

    def _decode_chunk_fn(self, chunk: int):
        """``chunk`` decode steps in ONE dispatch (a lax.scan): the
        multi-step scheduling move — host round-trip and dispatch
        overhead amortize over the chunk, which is what makes a
        host-driven scheduler viable on a TPU (or through a high-RTT
        tunnel).  Rows advance only while below their per-row
        ``stop_at`` budget; spent rows park (paged: write to the trash
        page; dense: overwrite their own stale row, position-masked
        either way)."""
        jax, srv = self._jax, self.server
        pick = self._row_pick
        paged = self.paged
        import jax.numpy as jnp

        pg = getattr(self, "page_size", 0) if self.paged else 0
        attention = self.attention
        if self.paged:
            virtual = self.pages_per_slot * self.page_size
        else:
            virtual = self.capacity

        def build():
            def run(tok, pos, stop_at, caches, page_table, key,
                    temp, tk, tp):
                def body(carry, sub):
                    tok, pos, caches = carry
                    alive = pos < stop_at
                    key_pos = _cursor_key_pos(virtual, pos)
                    x = srv._embed_at(tok[:, None], pos[:, None])
                    if paged:
                        wpid = jnp.take_along_axis(
                            page_table, (pos // pg)[:, None].astype(
                                jnp.int32), axis=1)[:, 0]
                        wpid = jnp.where(alive, wpid, jnp.int32(0))
                        woff = (pos % pg).astype(jnp.int32)
                        logits, caches = srv._step(
                            x, caches, 0, key_pos=key_pos,
                            q_pos=pos[:, None],
                            cache_io=_make_paged_io(
                                attention, page_table, wpid, woff),
                        )
                    else:
                        logits, caches = srv._step(
                            x, caches, 0, key_pos=key_pos,
                            q_pos=pos[:, None], row_starts=pos,
                        )
                    nxt = pick(logits[:, -1], sub, temp, tk, tp).astype(
                        tok.dtype)
                    tok = jnp.where(alive, nxt, tok)
                    pos = pos + alive.astype(pos.dtype)
                    return (tok, pos, caches), nxt

                keys = jax.random.split(key, chunk)
                (tok, pos, caches), toks = jax.lax.scan(
                    body, (tok, pos, caches), keys)
                # final (tok, pos) ride out so a pipelined scheduler can
                # chain the next dispatch device-side without reading
                # the chunk's tokens back first
                return toks, tok, pos, caches  # toks [chunk, slots]

            return run

        return self.server._jit_cache.get(
            ("cb_chunk", chunk, self.paged, self.slots,
             self.pages_per_slot if self.paged else self.capacity,
             self.pool_pages if self.paged else 0, pg, self.attention),
            build, donate_argnums=(3,),
        )

    def _draft_admit_fn(self, width: int):
        """Prefill the DRAFT model's dense per-slot cache for a freshly
        admitted prompt (no token is picked — the target's admission
        already did)."""
        jax, draft = self._jax, self.draft
        import jax.numpy as jnp

        def build():
            def run(prompt, length, slot, caches):
                mini = draft.init_caches(1, width)
                lens = length[None]
                pos_ids, key_pos = draft._ragged_positions(
                    lens, width, width)
                x = draft._embed_at(prompt, pos_ids)
                _, mini = draft._step(x, mini, 0, key_pos=key_pos,
                                      q_pos=pos_ids)
                return _write_slot_rows(jax, caches, mini, slot)

            return run

        return self.server._jit_cache.get(
            ("cb_draft_admit", width, self.slots, self.capacity,
             id(self.draft)),
            build, donate_argnums=(3,),
        )

    def _spec_round_fn(self):
        """One speculative round for the whole slot batch, ONE dispatch:
        the draft proposes ``spec_k`` tokens per row (scan; greedy, or
        sampled at the batcher's temperature), the target verifies all
        ``spec_k + 1`` positions in a single forward, and per-row
        acceptance counts come back — greedy matching, or the exact
        rejection scheme whose output distribution equals plain target
        sampling.  No cache rewind
        anywhere: rejected rows' K/V are position-masked and then
        OVERWRITTEN by the next round's writes (slot index == position).
        The draft also runs one extra write-only step so its cache has no
        hole when every proposal is accepted."""
        jax, srv, draft = self._jax, self.server, self.draft
        pick_k = self.spec_k
        paged = self.paged
        capacity = self.capacity
        virtual = (self.pages_per_slot * self.page_size if paged
                   else capacity)
        import jax.numpy as jnp

        attention = self.attention
        temperature = float(self.temperature)
        sampled = temperature > 0.0

        def build():
            def run(tok, pos, tcaches, dcaches, page_table, wpid, woff,
                    key):
                kd, ka, kr, kb = jax.random.split(key, 4)

                def dbody(carry, dk):
                    dt, dpos, dc = carry
                    key_pos = _cursor_key_pos(capacity, dpos)
                    x = draft._embed_at(dt[:, None], dpos[:, None])
                    logits, dc = draft._step(
                        x, dc, 0, key_pos=key_pos, q_pos=dpos[:, None],
                        row_starts=dpos,
                    )
                    row = logits[:, -1].astype(jnp.float32)
                    if sampled:
                        row = row / temperature
                        nxt = jax.random.categorical(dk, row, axis=-1)
                        q = jax.nn.softmax(row, axis=-1)
                    else:
                        nxt = jnp.argmax(row, axis=-1)
                        q = jnp.zeros((row.shape[0], 1), jnp.float32)
                    return (nxt.astype(dt.dtype), dpos + 1, dc), (
                        nxt.astype(dt.dtype), q)

                # k proposals + one write-only step (fills the draft
                # cache row the all-accepted case needs next round)
                (_, _, dcaches), (outs, qs) = jax.lax.scan(
                    dbody, (tok, pos, dcaches),
                    jax.random.split(kd, pick_k + 1))
                props = jnp.swapaxes(outs[:pick_k], 0, 1)  # [b, k]
                qs = jnp.swapaxes(qs[:pick_k], 0, 1)       # [b, k, V?]

                seq = jnp.concatenate([tok[:, None], props], axis=1)
                qp = pos[:, None] + jnp.arange(
                    pick_k + 1, dtype=jnp.int32)[None, :]
                key_pos = _cursor_key_pos(virtual, pos, extra=pick_k)
                x = srv._embed_at(seq, qp)
                if paged:
                    logits, tcaches = srv._step(
                        x, tcaches, 0, key_pos=key_pos, q_pos=qp,
                        cache_io=_make_paged_io(attention, page_table,
                                                wpid, woff),
                    )
                else:
                    logits, tcaches = srv._step(
                        x, tcaches, 0, key_pos=key_pos, q_pos=qp,
                        row_starts=pos,
                    )
                if not sampled:
                    greedy, accept = _greedy_accept(
                        jnp, logits, props, pick_k)
                    return greedy, accept, tcaches, dcaches
                pr = props.astype(jnp.int32)

                # exact rejection scheme (the solo _spec.py math, per
                # row): accept proposal i while u_i < p_t(d_i)/p_d(d_i);
                # first rejection samples the correction from
                # normalize(relu(p_t - p_d)); full acceptance samples
                # the bonus from position k's target distribution
                b_rows = jnp.arange(pr.shape[0])
                p = jax.nn.softmax(
                    logits.astype(jnp.float32) / temperature, axis=-1
                )                                    # [b, k+1, V]
                pt_d = p[b_rows[:, None],
                         jnp.arange(pick_k)[None, :], pr]      # [b, k]
                qd_d = qs[b_rows[:, None],
                          jnp.arange(pick_k)[None, :], pr]
                ratio = pt_d / jnp.maximum(qd_d, 1e-30)
                acc = (jax.random.uniform(ka, ratio.shape)
                       < ratio).astype(jnp.int32)
                a = jnp.sum(jnp.cumprod(acc, axis=1), axis=1)  # 0..k
                rej = jnp.minimum(a, pick_k - 1)
                resid = jnp.maximum(p[b_rows, rej] - qs[b_rows, rej], 0.0)
                rs = jnp.sum(resid, axis=1, keepdims=True)
                resid = jnp.where(rs > 1e-30, resid / rs, p[b_rows, rej])
                corr = jax.random.categorical(
                    kr, jnp.log(jnp.maximum(resid, 1e-38)), axis=-1)
                bonus = jax.random.categorical(
                    kb, jnp.log(jnp.maximum(p[:, pick_k], 1e-38)),
                    axis=-1)
                final = jnp.where(a == pick_k, bonus, corr).astype(
                    jnp.int32)
                emit = jnp.concatenate(
                    [pr, jnp.zeros((pr.shape[0], 1), jnp.int32)], axis=1)
                emit = emit.at[b_rows, a].set(final)
                return emit, a, tcaches, dcaches

            return run

        return self.server._jit_cache.get(
            ("cb_spec_round", pick_k, paged, self.slots, self.capacity,
             self.pages_per_slot if paged else 0, temperature,
             id(self.draft), self.attention),
            build, donate_argnums=(2, 3),
        )

    def _lookup_props(self, slot) -> np.ndarray:
        """Host-side prompt-lookup proposals for one slot: the ``spec_k``
        tokens that followed the most recent earlier occurrence of the
        last ``lookup_ngram`` tokens anywhere in prompt + generation so
        far — the numpy mirror of ``FlashLMServer.generate_lookup``'s
        in-graph ``propose`` (serve.py), running on the history the
        scheduler already tracks for stop detection.  No match (or an
        inactive slot) falls back to repeating the last token, exactly
        like the solo variant's ``found=False`` branch."""
        k, ngram = self.spec_k, self.lookup_ngram
        req = self._req[slot]
        if req is None or not self.active[slot]:
            return np.zeros(k, np.int64)
        # preemption folds out[:absorbed] into the continuation prompt
        # (req.tokens), so only the unabsorbed tail may be appended here
        hist = np.concatenate([req.tokens.astype(np.int64),
                               np.asarray(req.out[req.absorbed:],
                                          np.int64)])
        return _lookup_propose(hist, k, ngram)

    def _lookup_round_fn(self):
        """One draft-free verify round for the whole slot batch, ONE
        dispatch: host-computed lookup proposals ride in as data, the
        target verifies all ``spec_k + 1`` positions in a single
        forward, and per-row greedy acceptance counts come back.  Same
        no-rewind contract as ``_spec_round_fn``'s greedy branch (the
        proposals only change how many steps the exact greedy stream
        takes, never its tokens)."""
        jax, srv = self._jax, self.server
        pick_k = self.spec_k
        paged = self.paged
        capacity = self.capacity
        virtual = (self.pages_per_slot * self.page_size if paged
                   else capacity)
        import jax.numpy as jnp

        attention = self.attention

        def build():
            def run(tok, pos, tcaches, props, page_table, wpid, woff):
                seq = jnp.concatenate(
                    [tok[:, None], props.astype(tok.dtype)], axis=1)
                qp = pos[:, None] + jnp.arange(
                    pick_k + 1, dtype=jnp.int32)[None, :]
                key_pos = _cursor_key_pos(virtual, pos, extra=pick_k)
                x = srv._embed_at(seq, qp)
                if paged:
                    logits, tcaches = srv._step(
                        x, tcaches, 0, key_pos=key_pos, q_pos=qp,
                        cache_io=_make_paged_io(attention, page_table,
                                                wpid, woff),
                    )
                else:
                    logits, tcaches = srv._step(
                        x, tcaches, 0, key_pos=key_pos, q_pos=qp,
                        row_starts=pos,
                    )
                greedy, accept = _greedy_accept(jnp, logits, props,
                                                pick_k)
                return greedy, accept, tcaches

            return run

        return self.server._jit_cache.get(
            ("cb_lookup_round", pick_k, paged, self.slots, self.capacity,
             self.pages_per_slot if paged else 0, self.attention),
            build, donate_argnums=(2,),
        )

    def _register_prefix_fn(self, length: int, n_pages: int):
        """Prefill ``length`` tokens (batch-1, full width) and pin their
        K/V into ``n_pages`` pool pages."""
        srv = self.server
        pg = self.page_size

        from ..ops.paged import write_prefill

        def build():
            def run(prompt, page_ids, pools):
                mini = srv.init_caches(1, n_pages * pg)
                _, mini = srv.prefill(prompt, mini)
                return [write_prefill(pool, m, page_ids)
                        for pool, m in zip(pools, mini)]

            return run

        return self.server._jit_cache.get(
            ("cb_prefix_reg", length, n_pages, self.pool_pages,
             self.page_size),
            build, donate_argnums=(2,),
        )

    def _admit_prefix_fn(self, width_s: int, n_own: int):
        """Prefix-cached admission TAIL: gather the slot's pages so far
        (pinned prefix + any chunk-prefilled pages) as the front of a
        scratch cache, prefill the remaining suffix against it at a
        TRACED offset, pick the first token, and copy the suffix's pages
        out.  One compile per (suffix bucket, page count) — independent
        of the prefix length."""
        jax, srv = self._jax, self.server
        pick = self._row_pick
        import jax.numpy as jnp

        from ..ops.paged import write_prefill_at

        pg = self.page_size
        cap_s = -(-width_s // pg) * pg
        virtual = self.pages_per_slot * pg

        def build():
            def run(suffix, s_len, pre_len, page_table_row, own_pages,
                    pools, key, temp, tk, tp):
                minis = _scratch_caches(
                    pools, page_table_row, pre_len, cap_s)
                total = pre_len + s_len
                pos_ids = (pre_len + jnp.minimum(
                    jnp.arange(width_s, dtype=jnp.int32), s_len - 1
                ))[None]
                slot = jnp.arange(virtual + cap_s, dtype=jnp.int32)
                key_pos = jnp.where(slot < total, slot, jnp.int32(-1))[None]
                x = srv._embed_at(suffix, pos_ids)
                logits, minis = srv._step(x, minis, 0, key_pos=key_pos,
                                          q_pos=pos_ids)
                first = _pick_first(pick, logits, s_len, key, temp, tk,
                                    tp)
                pools = [
                    write_prefill_at(pool, m, own_pages, pre_len)
                    for pool, m in zip(pools, minis)
                ]
                return first, pools

            return run

        return self.server._jit_cache.get(
            ("cb_admit_prefix", width_s, n_own, self.pages_per_slot,
             self.pool_pages, self.page_size),
            build, donate_argnums=(5,),
        )

    def _prefill_chunk_fn(self, chunk: int):
        """One page-aligned prompt chunk: append ``chunk`` tokens' K/V
        at the slot's TRACED depth and write them into freshly allocated
        pages.  No token is picked — the final (ragged) tail goes
        through :meth:`_admit_prefix_fn`."""
        jax, srv = self._jax, self.server
        import jax.numpy as jnp

        from ..ops.paged import write_prefill_at

        pg = self.page_size
        virtual = self.pages_per_slot * pg

        def build():
            def run(tokens, pre_len, page_table_row, new_pages, pools):
                minis = _scratch_caches(
                    pools, page_table_row, pre_len, chunk)
                pos_ids = (pre_len + jnp.arange(chunk, dtype=jnp.int32))[None]
                slot = jnp.arange(virtual + chunk, dtype=jnp.int32)
                key_pos = jnp.where(slot < pre_len + chunk, slot,
                                    jnp.int32(-1))[None]
                x = srv._embed_at(tokens, pos_ids)
                _, minis = srv._step(x, minis, 0, key_pos=key_pos,
                                     q_pos=pos_ids)
                return [
                    write_prefill_at(pool, m, new_pages, pre_len)
                    for pool, m in zip(pools, minis)
                ]

            return run

        return self.server._jit_cache.get(
            ("cb_prefill_chunk", chunk, self.pages_per_slot,
             self.pool_pages, self.page_size),
            build, donate_argnums=(4,),
        )

    # -- paged bookkeeping ---------------------------------------------
    def _admit_chunk(self):
        """Admission chunk size: the user's prefill_chunk, or — for
        window models, which rely on between-chunk eviction to bound
        their prefill burst — an implicit band-sized chunk."""
        if self.prefill_chunk:
            return self.prefill_chunk
        window = self.server.window
        if window is None:
            return None
        return -(-int(window) // self.page_size) * self.page_size             + self.page_size

    def _pages_for(self, n_rows: int) -> int:
        return -(-n_rows // self.page_size)

    def _free_slot_pages(self, slot) -> None:
        self._evict_cursor[slot] = 0
        pinned = int(self._slot_pinned[slot])
        # 0 entries are window-evicted placeholders, already in the pool
        self.free_pages.extend(
            p for p in self.slot_pages[slot][pinned:] if p)
        self.slot_pages[slot] = []
        self._slot_pinned[slot] = 0
        self.page_table[slot, :] = 0

    def _match_prefix(self, tokens: np.ndarray):
        """Longest registered prefix usable for this prompt (>= 1 token
        must remain as suffix): (aligned length, pinned page ids)."""
        pg = self.page_size
        best_len, best_pages = 0, None
        limit = (tokens.size - 1) // pg * pg
        for arr, pages in self._prefixes:
            use = min(arr.size, limit)
            if use <= best_len or use < pg:
                continue
            if np.array_equal(tokens[:use], arr[:use]):
                best_len, best_pages = use, pages[:use // pg]
        return best_len, best_pages

    def _preempt_one(self, protect: int) -> bool:
        """Evict a resident slot (other than ``protect``) and requeue it
        FRONT as a recompute continuation; free its pages.  Mid-prefill
        slots go first (least invested, by consumed tokens), then the
        active slot with the fewest generated tokens.  Greedy decoding
        makes the recompute emit the same stream."""
        pre = [s for s in range(self.slots)
               if s != protect and not self.active[s]
               and self._req[s] is not None]
        if pre:
            victim = min(pre, key=lambda s: self._req[s].consumed)
            req = self._req[victim]
            req.consumed = 0
            req.preempted += 1
            self.queue.appendleft(req)
            self._req[victim] = None
            self._free_slot_pages(victim)
            self._preempts += 1
            return True
        victims = [s for s in range(self.slots)
                   if self.active[s] and s != protect]
        if not victims:
            return False
        victim = min(victims, key=lambda s: len(self._req[s].out))
        req = self._req[victim]
        # fold only the not-yet-absorbed output into the continuation
        # prompt: the total footprint stays prompt+max_new-1 across any
        # number of preemptions
        req.tokens = np.concatenate(
            [req.tokens, np.asarray(req.out[req.absorbed:], np.float32)])
        req.absorbed = len(req.out)
        req.consumed = 0
        req.preempted += 1
        self.queue.appendleft(req)
        self.active[victim] = False
        self._req[victim] = None
        self._free_slot_pages(victim)
        self._preempts += 1
        return True

    def _ensure_page(self, slot) -> bool:
        """Allocate pages until ``slot`` owns the page its next write
        lands in; preempt others if the pool is dry."""
        return self._ensure_pages_upto(slot, int(self.pos[slot]))

    def _ensure_pages_upto(self, slot, upto: int) -> bool:
        page_idx = upto // self.page_size
        self._alloc_pages(slot, page_idx + 1 - len(self.slot_pages[slot]))
        return True

    def _alloc_pages(self, slot, n: int) -> None:
        """Append ``n`` fresh pages to the slot's table, preempting
        other residents if the pool is dry."""
        for _ in range(max(0, n)):
            while not self.free_pages:
                if not self._preempt_one(protect=slot):
                    raise ModelRuntimeError(
                        "page pool exhausted with a single resident "
                        "request; this cannot happen when submit()'s "
                        "feasibility check passed"
                    )
            pid = self.free_pages.pop()
            self.slot_pages[slot].append(pid)
            self.page_table[slot, len(self.slot_pages[slot]) - 1] = pid

    def _pinned_total(self) -> int:
        return sum(len(p) for _, p in self._prefixes) if self.paged else 0

    def _own_pages_needed(self, tokens: np.ndarray, remaining: int) -> int:
        """Worst-case pages a request must ALLOCATE itself: full
        footprint (speculative rounds write ``spec_k`` rows past the fed
        position, so that margin counts) minus the pages the currently
        registered prefixes cover (matching can only improve by later
        registrations, and release_prefix re-validates, so this bound
        holds at admission)."""
        margin = max(self.spec_k if self._spec else 0,
                     self.decode_chunk)
        need = tokens.size + remaining - 1
        if self._spec:
            need += self.spec_k
        _, pages = self._match_prefix(tokens)
        shared = len(pages) if pages else 0
        full = self._pages_for(need) - shared
        window = self.server.window
        if window is None:
            return full
        # window models evict pages behind the attention band — during
        # admission too (between prefill chunks) — so the worst-case
        # SIMULTANEOUS residency is the band plus the biggest
        # between-eviction write run: one admission chunk, a decode
        # chunk, or a speculative round.  This holds for ANY prompt
        # length, including preemption-grown continuation prompts.
        burst = max(margin, self._admit_chunk() or 0)
        steady = self._pages_for(int(window) + burst + 1) + 2
        return min(full, steady)

    # -- public API ----------------------------------------------------
    def register_prefix(self, tokens) -> int:
        """Pin a shared prompt prefix (system prompt) into pool pages:
        every later ``submit`` whose prompt starts with it reuses the
        pinned K/V pages read-only — no recomputation, no per-request
        copies.  Only whole pages are shared; returns the page-aligned
        length actually cached.  Paged mode only."""
        if not self.paged:
            raise ModelRuntimeError(
                "prefix caching requires ContinuousBatcher(paged=True)")
        tokens = np.asarray(tokens, np.float32).reshape(-1)
        aligned = tokens.size // self.page_size * self.page_size
        if aligned < self.page_size:
            raise ModelRuntimeError(
                f"prefix must span at least one page "
                f"({self.page_size} tokens; got {tokens.size})"
            )
        if self.server.pos is not None and aligned > self.server.max_seq:
            raise ModelRuntimeError(
                f"prefix length {aligned} exceeds max_seq "
                f"{self.server.max_seq}"
            )
        tokens = tokens[:aligned]
        for arr, pages in self._prefixes:
            if arr.size == aligned and np.array_equal(arr, tokens):
                return aligned  # already registered
        n = aligned // self.page_size
        if len(self.free_pages) < n:
            raise ModelRuntimeError(
                f"prefix needs {n} pages but only {len(self.free_pages)} "
                "are free"
            )
        # pinning must not strand any admitted request: every resident
        # or queued request must still fit in the shrunken unpinned pool
        # (its own match, if any, is counted — the new prefix only helps)
        avail = self.pool_pages - self._pinned_total() - n
        for req in list(self.queue) + [r for r in self._req if r]:
            own = self._own_pages_needed(
                req.tokens, req.max_new - len(req.out))
            if own > avail:
                raise ModelRuntimeError(
                    f"pinning this prefix ({n} pages) would leave only "
                    f"{avail} unpinned pages — too few for an admitted "
                    f"request needing {own}"
                )
        pages = [self.free_pages.pop() for _ in range(n)]
        self.caches = self._register_prefix_fn(aligned, n)(
            tokens[None, :], np.asarray(pages, np.int32), self.caches
        )
        self._prefixes.append((tokens, pages))
        return aligned

    def release_prefix(self, tokens) -> None:
        """Unpin a registered prefix and return its pages to the pool.
        Raises while any resident request still shares the pages."""
        if not self.paged:
            raise ModelRuntimeError(
                "prefix caching requires ContinuousBatcher(paged=True)")
        tokens = np.asarray(tokens, np.float32).reshape(-1)
        aligned = tokens.size // self.page_size * self.page_size
        for i, (arr, pages) in enumerate(self._prefixes):
            if arr.size != aligned or not np.array_equal(
                    arr, tokens[:aligned]):
                continue
            held = set(pages)
            for slot in range(self.slots):
                if self._req[slot] is not None and held & set(
                        self.slot_pages[slot][:int(self._slot_pinned[slot])]):
                    raise ModelRuntimeError(
                        "prefix is in use by a resident request")
            # queued (incl. preempted-continuation) requests may have
            # been accepted counting on this prefix's pages
            del self._prefixes[i]
            avail = self.pool_pages - self._pinned_total()
            for req in self.queue:
                own = self._own_pages_needed(
                    req.tokens, req.max_new - len(req.out))
                if own > avail:
                    self._prefixes.insert(i, (arr, pages))
                    raise ModelRuntimeError(
                        "a queued request depends on this prefix's "
                        "pages; drain it before releasing"
                    )
            self.free_pages.extend(pages)
            return
        raise ModelRuntimeError("prefix is not registered")

    def submit(self, prompt, max_new: int, rid=None,
               temperature=None, top_k=None, top_p=None, stop_seq=None):
        """Queue a request; returns its id.  Admission happens inside
        ``step()`` when a slot frees up.

        ``stop_seq`` (a list of token ids) finishes THIS request once
        its emitted tail equals the sequence — matched host-side by the
        scheduler, so sequences of any length and content share the
        compiled programs.  Composes with the batcher-level
        ``stop_token`` (whichever fires first).

        ``temperature``/``top_k``/``top_p`` override the batcher-level
        sampling settings FOR THIS REQUEST — per-request values are
        traced, so a greedy request, a nucleus-sampled request, and a
        top-k request share the same compiled programs.  (Speculative
        mode keeps batcher-level settings: the rejection scheme is
        specialized on the round's temperature.)"""
        if (self._spec
                and (temperature is not None or top_k is not None
                     or top_p is not None)):
            raise ModelRuntimeError(
                "per-request sampling overrides are not available in "
                "speculative mode (the rejection scheme is built for "
                "the batcher-level temperature; lookup is exact-greedy)")
        check_top_p(top_p)
        tokens = np.asarray(prompt, np.float32).reshape(-1)
        if tokens.size < 1:
            raise ModelRuntimeError("empty prompt")
        if max_new < 1:
            raise ModelRuntimeError(f"max_new must be >= 1 (got {max_new})")
        need = tokens.size + max_new - 1
        margin = ""
        if self._spec:
            # a verify round writes spec_k rows beyond the fed position
            need += self.spec_k
            margin = f" + spec_k {self.spec_k}"
        if need > self.capacity:
            raise ModelRuntimeError(
                f"prompt_len + max_new - 1{margin} = {need} exceeds "
                f"cache capacity {self.capacity}"
            )
        if need > self.server.max_seq:
            raise ModelRuntimeError(
                f"prompt_len + max_new - 1 = {need} exceeds the model's "
                f"max_seq {self.server.max_seq} position embeddings"
            )
        if self.paged:
            avail = self.pool_pages - self._pinned_total()
            own = self._own_pages_needed(tokens, int(max_new))
            if own > avail:
                raise ModelRuntimeError(
                    f"request needs {own} pages beyond any pinned-prefix "
                    f"reuse but only {avail} are unpinned "
                    f"({self.pool_pages} pool minus {self._pinned_total()} "
                    "pinned); even preempting every other request could "
                    "not fit it"
                )
        if rid is None:
            rid = self._next_rid
        self._next_rid = max(self._next_rid, rid if isinstance(rid, int)
                             else self._next_rid) + 1
        req = _Request(rid, tokens, int(max_new))
        req.stop_seq = _check_stop_seq(stop_seq, self.server.vocab)
        req.temp = float(self.temperature if temperature is None
                         else temperature)
        tk = top_k if top_k is not None else self.top_k
        if tk is not None and tk < 1:
            raise ModelRuntimeError(f"top_k must be >= 1 (got {tk})")
        req.top_k = int(self.server.vocab if tk is None else tk)
        tp = top_p if top_p is not None else self.top_p
        req.top_p = float(1.0 if tp is None else tp)
        self.queue.append(req)
        return rid

    def _bucket(self, width: int) -> int:
        from ..utils.buckets import bucket_for

        # bucket widths never exceed the cache (a user bucket list may)
        return min(bucket_for(self.prompt_buckets, width), self.capacity)

    def _admit_draft(self, slot) -> None:
        """Prefill the draft's cache row for a just-activated slot."""
        req = self._req[slot]
        width = self._bucket(req.tokens.size)
        prompt = np.zeros((1, width), np.float32)
        prompt[0, :req.tokens.size] = req.tokens
        self.draft_caches = self._draft_admit_fn(width)(
            prompt, np.int32(req.tokens.size), np.int32(slot),
            self.draft_caches,
        )

    def _progress_admission(self, slot, allow_preempt: bool = False):
        """One admission unit for a reserved paged slot: a page-aligned
        prompt chunk (``prefill_chunk``), or the final ragged tail which
        prefills against everything cached so far and picks the first
        token.  Returns a finished (rid, tokens) pair when the first
        token already completes the request, else None (including when
        the unit must WAIT for free pages)."""
        req = self._req[slot]
        size = req.tokens.size
        chunk = self._admit_chunk()
        if chunk and size - req.consumed - 1 >= chunk:
            if (len(self.free_pages) < chunk // self.page_size
                    and not allow_preempt):
                return None  # wait for decoders to free pages
            self._alloc_pages(slot, chunk // self.page_size)
            new_pages = self.slot_pages[slot][-(chunk // self.page_size):]
            self.caches = self._prefill_chunk_fn(chunk)(
                req.tokens[None, req.consumed:req.consumed + chunk],
                np.int32(req.consumed),
                self.page_table[slot].copy(),
                np.asarray(new_pages, np.int32),
                self.caches,
            )
            req.consumed += chunk
            # window models evict behind the band between chunks, which
            # is what keeps the prefill burst at O(window + chunk) and
            # the windowed feasibility bound honest for ANY prompt
            # length (preemption-grown continuations included)
            self._evict_window_pages(slot, frontier=req.consumed)
            return None  # next chunk (or the tail) next step
        # final tail: 1..bucket tokens
        s = size - req.consumed
        width_s = self._bucket(s)
        n_own = self._pages_for(s)
        if len(self.free_pages) < n_own and not allow_preempt:
            return None  # wait for decoders to free pages
        self._alloc_pages(slot, n_own)
        own = self.slot_pages[slot][-n_own:]
        suffix = np.zeros((1, width_s), np.float32)
        suffix[0, :s] = req.tokens[req.consumed:]
        first, self.caches = self._admit_prefix_fn(width_s, n_own)(
            suffix,
            np.int32(s),
            np.int32(req.consumed),
            self.page_table[slot].copy(),
            np.asarray(own, np.int32),
            self.caches,
            self._split(),
            np.float32(req.temp),
            np.int32(req.top_k),
            np.float32(req.top_p),
        )
        self.active[slot] = True
        self.pos[slot] = size
        self.last[slot] = float(first)
        self._evict_window_pages(slot)
        if self.draft is not None:
            self._admit_draft(slot)
        if self._emit(slot, int(first)):
            return self._finish(slot)
        return None

    def _finish(self, slot) -> tuple:
        import time

        req = self._req[slot]
        req.finished_at = time.perf_counter()
        self._metrics.append({
            "rid": req.rid,
            "prompt_tokens": int(req.tokens.size) - req.absorbed,
            "generated_tokens": len(req.out),
            "ttft_s": req.first_token_at - req.submitted,
            "latency_s": req.finished_at - req.submitted,
            "preemptions": req.preempted,
        })
        self.active[slot] = False
        if self._pipe_draining and self._pipe:
            # in-flight pipelined dispatches still write this slot's
            # pages (their page-table snapshots predate the finish):
            # quarantine the slot until the pipe drains, then release
            self._pending_release.append(slot)
        else:
            self._req[slot] = None
            if self.paged:
                self._free_slot_pages(slot)
        return (req.rid, np.asarray(req.out, np.int64))

    def _evict_window_pages(self, slot, frontier=None) -> None:
        """Sliding-window models never attend positions at or below
        ``frontier - window`` (``frontier`` defaults to the slot's
        cursor; mid-admission it is the tokens-consumed count), so pages
        wholly outside the band are returned to the pool (table entries
        become the trash page; the stale rows were window-masked
        already).  Cache memory per slot becomes O(window) instead of
        O(sequence length) — the long-context payoff of paging.  Pinned
        prefix pages are shared and stay.  ``_evict_cursor`` remembers
        the first possibly-live index so repeated calls are O(newly
        evictable), not O(pages_per_slot) (single-core host)."""
        window = self.server.window
        if window is None:
            return
        if frontier is None:
            frontier = int(self.pos[slot])
        keep_from = int(frontier) - int(window) + 1
        pages = self.slot_pages[slot]
        idx = max(int(self._evict_cursor[slot]),
                  int(self._slot_pinned[slot]))
        while idx < len(pages) and (idx + 1) * self.page_size <= keep_from:
            pid = pages[idx]
            if pid:
                self.free_pages.append(pid)
                pages[idx] = 0
                self.page_table[slot, idx] = 0
                self._window_evicted += 1
            idx += 1
        self._evict_cursor[slot] = idx

    def _apply_tokens(self, slot, tokens, finished) -> int:
        """Advance a slot through emitted tokens (pos/last bookkeeping),
        finishing on budget or stop; returns how many were applied —
        the one harvest loop behind the single-step, chunked, and
        speculative decode paths."""
        applied = 0
        for tok in tokens:
            tok = int(tok)
            self.pos[slot] += 1
            self.last[slot] = float(tok)
            applied += 1
            if self._emit(slot, tok):
                finished.append(self._finish(slot))
                break
        else:
            if self.paged and applied:
                self._evict_window_pages(slot)
        return applied

    def _emit(self, slot, token: int) -> bool:
        """Record one generated token; True when the request is done."""
        import time

        req = self._req[slot]
        if req.first_token_at is None:
            req.first_token_at = time.perf_counter()
        req.out.append(token)
        if self.stream_tokens:
            self._stream.append((req.rid, token))
        if _stop_seq_hit(req):
            return True
        if self.stop_token is not None and token == self.stop_token:
            return True
        return len(req.out) >= req.max_new

    def _can_pipeline(self) -> bool:
        """Speculative chunk dispatches may only be issued in steady
        state: every resident slot decoding, nothing queued, nothing
        quarantined — admissions and preemptions require a drained
        pipe (they re-chain host-authoritative state)."""
        return (not self.queue and not self._pending_release
                and bool(self.active.any())
                and all(self.active[s] or self._req[s] is None
                        for s in range(self.slots)))

    def _chunk_fence(self, start, chunk: int):
        """Per-active-row absolute budget fence for a chunk dispatch
        whose rows start at ``start``, plus each row's last written
        position inside the chunk span.  ``pos`` and ``len(out)``
        advance in lockstep, so the fence is identical for every
        in-flight chunk of one request — the pipelined path's
        bit-equality to the sequential path rides on both computing it
        HERE."""
        stop_at = start.copy()
        upto = {}
        for slot in range(self.slots):
            if self.active[slot]:
                rem = (self._req[slot].max_new - len(self._req[slot].out))
                stop_at[slot] = self.pos[slot] + rem
                upto[slot] = int(min(int(start[slot]) + chunk,
                                     int(stop_at[slot]))) - 1
        return stop_at, upto

    def _issue_chunk(self, chunk: int) -> bool:
        """Issue one chunk dispatch chained on the previous dispatch's
        device-side (tok, pos) — uploads only, no readback.  Returns
        False (without issuing) when every active row is already fully
        fenced by in-flight chunks (nothing left to produce), or when
        the page pool could not cover the chunk span without preempting;
        the caller falls back to the sequential path, which is allowed
        to preempt."""
        start = (self._shadow_pos if self._pipe else self.pos
                 ).astype(np.int32).copy()
        stop_at, upto = self._chunk_fence(start, chunk)
        if not any(int(stop_at[s]) > int(start[s])
                   for s in range(self.slots) if self.active[s]):
            return False  # all budget already covered in flight
        if self.paged:
            needed = 0
            for slot, u in upto.items():
                needed += max(
                    0, u // self.page_size + 1 - len(self.slot_pages[slot]))
            if needed > len(self.free_pages):
                return False
            for slot, u in upto.items():
                self._ensure_pages_upto(slot, u)
            pt = self.page_table.copy()
        else:
            pt = np.zeros((self.slots, 1), np.int32)
        if self._pipe:
            tok_in, pos_in = self._dev_tok, self._dev_pos
        else:
            tok_in, pos_in = self.last.copy(), self.pos.copy()
        self._steps += chunk
        self._dispatches += 1
        toks, tok, pos, self.caches = self._decode_chunk_fn(chunk)(
            tok_in, pos_in, stop_at, self.caches, pt, self._split(),
            self.req_temp.copy(), self.req_topk.copy(),
            self.req_topp.copy(),
        )
        try:
            toks.copy_to_host_async()  # start the transfer early; the
            # drain's np.asarray is the reliable fence either way
        except Exception:
            pass
        self._dev_tok, self._dev_pos = tok, pos
        # exact kernel semantics: pos += 1 while pos < stop_at
        self._shadow_pos = np.minimum(
            start + chunk, np.maximum(start, stop_at)).astype(np.int32)
        self._pipe.append(
            {"toks": toks, "start": start, "stop_at": stop_at,
             "active": self.active.copy()})
        return True

    def _pipelined_chunk_step(self, finished, issue: bool = True):
        """Fill the pipe to ``1 + pipeline`` in-flight chunk dispatches,
        then drain the OLDEST one (harvest its tokens: stop detection,
        budget, metrics).  Returns ``finished``, or None when there is
        nothing in flight and steady state does not hold — the caller
        falls through to the sequential paths (admission, preemption,
        single dispatch)."""
        chunk = self.decode_chunk
        while (issue and self._can_pipeline()
               and len(self._pipe) < 1 + self.pipeline):
            if not self._issue_chunk(chunk):
                break
        if not self._pipe:
            return None
        entry = self._pipe.popleft()
        toks = np.asarray(entry["toks"])
        self._pipe_draining = True
        try:
            for slot in range(self.slots):
                if not (entry["active"][slot] and self.active[slot]):
                    continue
                taken = min(chunk, int(entry["stop_at"][slot])
                            - int(entry["start"][slot]))
                self._apply_tokens(slot, toks[:taken, slot], finished)
        finally:
            self._pipe_draining = False
        if not self.active.any():
            # nothing in flight is needed anymore (every row finished or
            # cancelled): flush the speculative remainder NOW so the
            # quarantined slots release without further step() calls.
            # The np.asarray readback fences each dispatch — its writes
            # to the quarantined pages are complete before reuse.
            while self._pipe:
                np.asarray(self._pipe.popleft()["toks"])
        if not self._pipe:
            for slot in self._pending_release:
                self._req[slot] = None
                if self.paged:
                    self._free_slot_pages(slot)
            self._pending_release.clear()
            self._dev_tok = self._dev_pos = self._shadow_pos = None
        return finished

    def step(self):
        """One scheduler iteration: admit queued requests into free
        slots (prefill + first token each), then run ONE batched decode
        step for every active slot.  Returns the list of
        ``(request_id, tokens)`` pairs that completed this iteration."""
        finished = []
        if self._deferred_finished:
            finished.extend(self._deferred_finished)
            self._deferred_finished.clear()

        # 0) with chunk dispatches in flight and steady state broken (a
        # new submission arrived, or a slot finished and is quarantined)
        # drain the pipe BEFORE admissions run: in-flight dispatches are
        # chained on device-side state that admission would invalidate
        if self._pipe and not self._can_pipeline():
            self._pipelined_chunk_step(finished)
            return finished

        # 1) reserve free slots for queued requests
        for slot in range(self.slots):
            if not self.queue:
                break
            if self.active[slot] or self._req[slot] is not None:
                continue
            req = self.queue.popleft()
            self._req[slot] = req
            self.req_temp[slot] = req.temp
            self.req_topk[slot] = req.top_k
            self.req_topp[slot] = req.top_p
            if self.paged:
                pre_len, pre_pages = self._match_prefix(req.tokens)
                req.consumed = pre_len
                if pre_len:
                    self._prefix_hits += 1
                pages = list(pre_pages or [])
                self.slot_pages[slot] = pages
                self._slot_pinned[slot] = len(pages)
                self.page_table[slot, :] = 0
                self.page_table[slot, :len(pages)] = pages
            else:
                width = self._bucket(req.tokens.size)
                prompt = np.zeros((1, width), np.float32)
                prompt[0, :req.tokens.size] = req.tokens
                first, self.caches = self._admit_fn(width)(
                    prompt,
                    np.int32(req.tokens.size),
                    np.int32(slot),
                    self.caches,
                    self._split(),
                    np.float32(req.temp),
                    np.int32(req.top_k),
                    np.float32(req.top_p),
                )
                self.active[slot] = True
                self.pos[slot] = req.tokens.size
                self.last[slot] = float(first)
                if self.draft is not None:
                    self._admit_draft(slot)
                if self._emit(slot, int(first)):
                    finished.append(self._finish(slot))

        # 1b) progress paged admissions one unit each (a prompt chunk,
        # or the final tail which picks the first token).  Admission
        # WAITS for free pages rather than stealing from decoders —
        # except that when nothing is active at all, the first reserved
        # slot may preempt other reserved slots so the system always
        # makes progress.
        if self.paged:
            privileged = None
            if not self.active.any():
                for slot in range(self.slots):
                    if self._req[slot] is not None:
                        privileged = slot
                        break
            for slot in range(self.slots):
                if self._req[slot] is None or self.active[slot]:
                    continue
                done = self._progress_admission(
                    slot, allow_preempt=(slot == privileged))
                if done is not None:
                    finished.append(done)

        # 2) speculative round: the draft (or the host-side lookup
        # match) proposes, the target verifies, per-row acceptance
        # advances each slot by 1..spec_k+1 tokens
        if self.active.any() and self._spec:
            k = self.spec_k
            if self.paged:
                for slot in range(self.slots):
                    if self.active[slot]:
                        self._ensure_pages_upto(
                            slot, int(self.pos[slot]) + k)
                wpid = np.zeros((self.slots, k + 1), np.int32)
                woff = np.zeros((self.slots, k + 1), np.int32)
                for slot in range(self.slots):
                    if self.active[slot]:
                        for i in range(k + 1):
                            p = int(self.pos[slot]) + i
                            wpid[slot, i] = self.slot_pages[slot][
                                p // self.page_size]
                            woff[slot, i] = p % self.page_size
                pt = self.page_table.copy()
            else:
                pt = np.zeros((self.slots, 1), np.int32)
                wpid = np.zeros((self.slots, k + 1), np.int32)
                woff = np.zeros((self.slots, k + 1), np.int32)
            self._dispatches += 1
            self._spec_rounds += 1
            if self.draft is not None:
                greedy, accept, self.caches, self.draft_caches = (
                    self._spec_round_fn()(
                        self.last.copy(), self.pos.copy(), self.caches,
                        self.draft_caches, pt, wpid, woff, self._split(),
                    )
                )
            else:
                props = np.stack([self._lookup_props(s)
                                  for s in range(self.slots)])
                greedy, accept, self.caches = self._lookup_round_fn()(
                    self.last.copy(), self.pos.copy(), self.caches,
                    props.astype(np.float32), pt, wpid, woff,
                )
            greedy = np.asarray(greedy)
            accept = np.asarray(accept)
            for slot in range(self.slots):
                if not self.active[slot]:
                    continue
                take = int(accept[slot]) + 1
                self._steps += take
                self._spec_emitted += self._apply_tokens(
                    slot, greedy[slot, :take], finished)
            return finished

        # 2a') pipelined chunked decode: keep `pipeline` extra chunk
        # dispatches in flight (device-chained), drain the oldest
        if (self.pipeline and self.draft is None and self.decode_chunk > 1
                and self.active.any()):
            res = self._pipelined_chunk_step(finished)
            if res is not None:
                return res

        # 2b) chunked decode for the whole slot batch
        if self.active.any() and self.decode_chunk > 1:
            chunk = self.decode_chunk
            # per-row budget fences; pages for every step of the chunk
            if self.paged:
                _, upto = self._chunk_fence(self.pos.copy(), chunk)
                for slot, u in upto.items():
                    if self.active[slot]:  # ensure may preempt mid-loop
                        self._ensure_pages_upto(slot, u)
            # recompute AFTER the page ensure: preemption may have parked
            # rows, whose fence must stay pos (no advance) so the kernel
            # never writes their freed pages
            stop_at, _ = self._chunk_fence(self.pos.copy(), chunk)
            pt = (self.page_table.copy() if self.paged
                  else np.zeros((self.slots, 1), np.int32))
            self._steps += chunk
            self._dispatches += 1
            toks, _tok, _pos, self.caches = self._decode_chunk_fn(chunk)(
                self.last.copy(), self.pos.copy(), stop_at,
                self.caches, pt, self._split(),
                self.req_temp.copy(), self.req_topk.copy(),
                self.req_topp.copy(),
            )
            toks = np.asarray(toks)
            for slot in range(self.slots):
                if not self.active[slot]:
                    continue
                taken = min(chunk, int(stop_at[slot]) - int(self.pos[slot]))
                self._apply_tokens(slot, toks[:taken, slot], finished)
            return finished

        # single-step decode
        if self.active.any():
            self._steps += 1
            self._dispatches += 1
            if self.paged:
                for slot in range(self.slots):
                    if self.active[slot]:
                        self._ensure_page(slot)
                wpid = np.zeros(self.slots, np.int32)  # 0 = trash page
                woff = np.zeros(self.slots, np.int32)
                for slot in range(self.slots):
                    if self.active[slot]:
                        p = int(self.pos[slot])
                        wpid[slot] = self.slot_pages[slot][
                            p // self.page_size]
                        woff[slot] = p % self.page_size
                nxt, self.caches = self._decode_paged_fn()(
                    self.last.copy(), self.pos.copy(), self.caches,
                    self.page_table.copy(), wpid, woff, self._split(),
                    self.req_temp.copy(), self.req_topk.copy(),
                    self.req_topp.copy(),
                )
            else:
                nxt, self.caches = self._decode_fn()(
                    self.last.copy(), self.pos.copy(), self.caches,
                    self._split(),
                    self.req_temp.copy(), self.req_topk.copy(),
                    self.req_topp.copy(),
                )
            nxt = np.asarray(nxt)
            for slot in range(self.slots):
                if self.active[slot]:
                    self._apply_tokens(slot, nxt[slot:slot + 1], finished)
        return finished

    def run(self) -> dict:
        """Drive ``step()`` until every queued and active request is
        done; returns ``{request_id: np.ndarray of generated tokens}``."""
        out = {}
        while (self.queue or self.active.any()
               or any(r is not None for r in self._req)
               or self._deferred_finished or self._pipe):
            for rid, toks in self.step():
                out[rid] = toks
        return out

    def cancel(self, rid) -> bool:
        """Abort a request (client disconnect): drop it from the queue,
        or free its slot/pages immediately if resident.  Returns whether
        anything was cancelled; already-finished requests return False.
        Cancelled requests produce no result and no metrics record."""
        for i, req in enumerate(self.queue):
            if req.rid == rid:
                del self.queue[i]
                return True
        for slot in range(self.slots):
            req = self._req[slot]
            if req is not None and req.rid == rid:
                if self._pipe:
                    # in-flight chunk dispatches still write this slot's
                    # pages: drain the pipe first (requests that finish
                    # during the forced drain surface on the next step())
                    while self._pipe:
                        self._pipelined_chunk_step(
                            self._deferred_finished, issue=False)
                    if self._req[slot] is None or self._req[slot].rid != rid:
                        return False  # finished during the drain
                self.active[slot] = False
                self._req[slot] = None
                if self.paged:
                    self._free_slot_pages(slot)
                return True
        return False

    def drain_tokens(self) -> list:
        """Tokens emitted since the last drain, in emission order, as
        ``(request_id, token_id)`` pairs — the hook for streaming
        responses to clients token by token (SSE-style) instead of
        waiting for completion.  Requires ``stream_tokens=True`` (off by
        default so an undrained buffer cannot grow unbounded)."""
        if not self.stream_tokens:
            raise ModelRuntimeError(
                "token streaming is off; construct with "
                "ContinuousBatcher(..., stream_tokens=True)")
        out = self._stream
        self._stream = []
        return out

    def request_metrics(self, reset: bool = False) -> list:
        """Per-finished-request records, in completion order: request
        id, prompt/generated token counts, time to first token
        (``ttft_s``: submit -> first emitted token), total ``latency_s``,
        and how often the request was preempted.  The raw material for
        serving SLO dashboards; ``reset=True`` drains the list."""
        out = list(self._metrics)
        if reset:
            self._metrics.clear()
        return out  # bounded FIFO: at most the newest 4096 records

    @property
    def stats(self) -> dict:
        """Scheduler counters: decode iterations run and occupancy now."""
        out = {
            "decode_steps": self._steps,
            "dispatches": self._dispatches,
            "active": int(self.active.sum()),
            "queued": len(self.queue),
        }
        if self._spec:
            out["spec_rounds"] = self._spec_rounds
            out["spec_emitted"] = self._spec_emitted
        if self.paged:
            out["free_pages"] = len(self.free_pages)
            out["pool_pages"] = self.pool_pages
            out["preemptions"] = self._preempts
            out["window_evicted"] = self._window_evicted
            out["prefixes"] = len(self._prefixes)
            out["prefix_hits"] = self._prefix_hits
        return out


class Seq2SeqBatcher:
    """Continuous batching for encoder-decoder serving
    (:class:`Seq2SeqServer`) — the scheduler's seq2seq sibling.

    Each request ENCODES once at admission (ragged to the shared
    ``max_src`` width; pad positions masked by the server's existing
    kv_mask machinery) and its encoder memory + precomputed cross K/V
    land in per-slot arrays; decoding then runs ONE jitted step for the
    whole slot batch with per-row cursors on the decoder self-attention
    caches (``ops.decode.append_at`` + position masking), exactly the
    decoder-only batcher's mechanism.  Greedy streams are bit-equal to
    ``Seq2SeqServer.generate`` on the ragged path; sampling knobs are
    per request and TRACED (shared compiled programs).
    """

    def __init__(self, server, slots: int = 8, max_src=None,
                 capacity=None, temperature: float = 0.0, top_k=None,
                 top_p=None, stop_token=None, bos: int = 0, seed: int = 0,
                 stream_tokens: bool = False, lookup: bool = False,
                 spec_k: int = 4, lookup_ngram: int = 2):
        import jax
        import jax.numpy as jnp

        check_top_p(top_p)
        if lookup:
            # draft-free prompt-lookup speculation for encoder-decoder
            # serving: proposals match the last emitted ngram against
            # SOURCE + generation — the grounded-generation copy regime
            # (translation/summarization quoting the source) is exactly
            # where lookup accepts.  Exact greedy only.
            if temperature != 0.0 or top_k is not None or top_p is not None:
                raise ModelRuntimeError(
                    "lookup speculation is exact-greedy only (no "
                    "proposal distribution for a rejection scheme)")
            if lookup_ngram < 1:
                raise ModelRuntimeError(
                    f"lookup_ngram must be >= 1 (got {lookup_ngram})")
        if spec_k < 1:  # stored unconditionally: validate unconditionally
            raise ModelRuntimeError(f"spec_k must be >= 1 (got {spec_k})")
        self.lookup = bool(lookup)
        self.spec_k = int(spec_k)
        self.lookup_ngram = int(lookup_ngram)
        self._jax = jax
        self.server = server
        self.slots = int(slots)
        self.max_src = int(max_src or server.max_src)
        if self.max_src > server.max_src:
            raise ModelRuntimeError(
                f"max_src {self.max_src} exceeds the model's "
                f"{server.max_src} source positions")
        self.capacity = int(capacity or server.max_tgt)
        if self.capacity > server.max_tgt:
            raise ModelRuntimeError(
                f"capacity {self.capacity} exceeds the model's max_tgt "
                f"{server.max_tgt} target positions")
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p
        self.stop_token = stop_token
        self.bos = int(bos)
        self.stream_tokens = bool(stream_tokens)
        self._stream: list[tuple] = []
        self._row_pick = make_row_picker(server.vocab)
        self._key = _host_key(jax, seed)

        n_dec = len(server.dec)
        h, hd, dim = server.heads, server.head_dim, server.dim
        self.enc_mem = jnp.zeros((self.slots, self.max_src, dim),
                                 jnp.float32)
        self.enc_ck = [jnp.zeros((self.slots, h, self.max_src, hd),
                                 jnp.float32) for _ in range(n_dec)]
        self.enc_cv = [jnp.zeros((self.slots, h, self.max_src, hd),
                                 jnp.float32) for _ in range(n_dec)]
        self.enc_mask = jnp.zeros((self.slots, self.max_src), bool)
        self.caches = server.init_caches(self.slots, self.capacity)

        self.pos = np.zeros(self.slots, np.int32)
        self.last = np.full(self.slots, float(bos), np.float32)
        self.active = np.zeros(self.slots, bool)
        self.req_temp = np.zeros(self.slots, np.float32)
        self.req_topk = np.full(self.slots, server.vocab, np.int32)
        self.req_topp = np.ones(self.slots, np.float32)
        self._req: list = [None] * self.slots
        self.queue: deque = deque()
        self._next_rid = 0
        self._steps = 0
        self._dispatches = 0
        self._spec_rounds = 0
        self._spec_emitted = 0
        self._metrics: deque = deque(maxlen=4096)

    def _split(self):
        # both arrays live on host CPU (_host_key) — no tunnel traffic;
        # the subkey returns as numpy so it enters the compiled program
        # like any other host argument
        self._key, sub = self._jax.random.split(self._key)
        return np.asarray(sub)

    # -- jitted pieces -------------------------------------------------
    def _admit_fn(self):
        """Encode a batch-1 padded source and write its memory, cross
        K/V, and validity mask into the slot's rows."""
        jax, srv = self._jax, self.server
        import jax.numpy as jnp

        def build():
            def run(src, length, slot, mem, cks, cvs, masks):
                enc = srv.encode(src, lengths=length[None])
                zero = jnp.int32(0)
                mem = jax.lax.dynamic_update_slice(
                    mem, enc.memory.astype(mem.dtype), (slot, zero, zero))
                cks = [jax.lax.dynamic_update_slice(
                    big, one.astype(big.dtype), (slot, zero, zero, zero))
                    for big, one in zip(cks, enc.ck)]
                cvs = [jax.lax.dynamic_update_slice(
                    big, one.astype(big.dtype), (slot, zero, zero, zero))
                    for big, one in zip(cvs, enc.cv)]
                masks = jax.lax.dynamic_update_slice(
                    masks, enc.kv_mask, (slot, zero))
                return mem, cks, cvs, masks

            return run

        return self.server._jit_cache.get(
            ("s2s_cb_admit", self.slots, self.max_src),
            build, donate_argnums=(3, 4, 5, 6),
        )

    def _decode_fn(self):
        """One decode step for every slot: per-row cursor positions on
        the decoder self-caches, cross-attention against the slot's
        encoder state, per-request sampling."""
        jax, srv = self._jax, self.server
        pick = self._row_pick
        capacity = self.capacity
        import jax.numpy as jnp

        from .seq2seq_serve import _Enc

        def build():
            def run(tok, pos, mem, cks, cvs, masks, caches, key,
                    temp, tk, tp):
                enc = _Enc(mem, tuple(cks), tuple(cvs), masks)
                key_pos = _cursor_key_pos(capacity, pos)
                logits, caches = srv._step(
                    tok[:, None].astype(jnp.int32), enc, caches,
                    q_pos=pos[:, None], key_pos=key_pos, row_starts=pos,
                )
                nxt = pick(logits[:, -1], key, temp, tk, tp)
                return nxt, caches

            return run

        return self.server._jit_cache.get(
            ("s2s_cb_decode", self.slots, self.max_src, self.capacity),
            build, donate_argnums=(6,),
        )

    def _lookup_props(self, slot) -> np.ndarray:
        """Lookup proposals over SOURCE + generation: the encoder-decoder
        variant matches the last emitted ngram against the source too,
        so copy-heavy outputs (translation quoting names, summaries
        lifting spans) propose straight from the source text."""
        req = self._req[slot]
        if req is None or not self.active[slot]:
            return np.zeros(self.spec_k, np.int64)
        hist = np.concatenate([req.tokens.astype(np.int64),
                               np.asarray(req.out, np.int64)])
        return _lookup_propose(hist, self.spec_k, self.lookup_ngram)

    def _lookup_round_fn(self):
        """Draft-free verify round for the whole slot batch: host
        lookup proposals ride in as data, the decoder verifies all
        ``spec_k + 1`` positions in ONE forward (per-row cursors +
        position masking — rejected rows' K/V are overwritten by the
        next round's writes, no rewind), greedy acceptance counts come
        back.  The encoder state is read-only throughout."""
        jax, srv = self._jax, self.server
        pick_k = self.spec_k
        capacity = self.capacity
        import jax.numpy as jnp

        from .seq2seq_serve import _Enc

        def build():
            def run(tok, pos, mem, cks, cvs, masks, caches, props):
                enc = _Enc(mem, tuple(cks), tuple(cvs), masks)
                seq = jnp.concatenate(
                    [tok[:, None], props.astype(tok.dtype)],
                    axis=1).astype(jnp.int32)
                qp = pos[:, None] + jnp.arange(
                    pick_k + 1, dtype=jnp.int32)[None, :]
                key_pos = _cursor_key_pos(capacity, pos, extra=pick_k)
                logits, caches = srv._step(
                    seq, enc, caches, q_pos=qp, key_pos=key_pos,
                    row_starts=pos,
                )
                greedy, accept = _greedy_accept(jnp, logits, props,
                                                pick_k)
                return greedy, accept, caches

            return run

        return self.server._jit_cache.get(
            ("s2s_cb_lookup", pick_k, self.slots, self.max_src,
             self.capacity),
            build, donate_argnums=(6,),
        )

    # -- public API ----------------------------------------------------
    def submit(self, src, max_new: int, rid=None, temperature=None,
               top_k=None, top_p=None, stop_seq=None):
        """Queue a source sequence; per-request sampling overrides and
        ``stop_seq`` as on :class:`ContinuousBatcher`."""
        check_top_p(top_p)
        tokens = np.asarray(src, np.float32).reshape(-1)
        if tokens.size < 1:
            raise ModelRuntimeError("empty source")
        if tokens.size > self.max_src:
            raise ModelRuntimeError(
                f"source length {tokens.size} exceeds max_src "
                f"{self.max_src}")
        if max_new < 1:
            raise ModelRuntimeError(f"max_new must be >= 1 (got {max_new})")
        margin = self.spec_k if self.lookup else 0
        if max_new + margin > self.capacity:
            extra = f" + spec_k {margin}" if margin else ""
            raise ModelRuntimeError(
                f"max_new {max_new}{extra} exceeds target capacity "
                f"{self.capacity}")
        if self.lookup and (temperature is not None or top_k is not None
                            or top_p is not None):
            raise ModelRuntimeError(
                "per-request sampling overrides are not available in "
                "lookup mode (exact greedy only)")
        if rid is None:
            rid = self._next_rid
        self._next_rid = max(self._next_rid, rid if isinstance(rid, int)
                             else self._next_rid) + 1
        req = _Request(rid, tokens, int(max_new))
        req.stop_seq = _check_stop_seq(stop_seq, self.server.vocab)
        req.temp = float(self.temperature if temperature is None
                         else temperature)
        tk = top_k if top_k is not None else self.top_k
        if tk is not None and tk < 1:
            raise ModelRuntimeError(f"top_k must be >= 1 (got {tk})")
        req.top_k = int(self.server.vocab if tk is None else tk)
        tp = top_p if top_p is not None else self.top_p
        req.top_p = float(1.0 if tp is None else tp)
        self.queue.append(req)
        return rid

    def cancel(self, rid) -> bool:
        for i, req in enumerate(self.queue):
            if req.rid == rid:
                del self.queue[i]
                return True
        for slot in range(self.slots):
            req = self._req[slot]
            if req is not None and req.rid == rid:
                self.active[slot] = False
                self._req[slot] = None
                return True
        return False

    def _emit(self, slot, token: int) -> bool:
        import time

        req = self._req[slot]
        if req.first_token_at is None:
            req.first_token_at = time.perf_counter()
        req.out.append(token)
        if self.stream_tokens:
            self._stream.append((req.rid, token))
        if _stop_seq_hit(req):
            return True
        if self.stop_token is not None and token == self.stop_token:
            return True
        return len(req.out) >= req.max_new

    def _advance(self, slot, tokens, finished) -> int:
        """Advance a slot through emitted tokens (pos/last bookkeeping,
        finish on budget/stop); returns how many were applied — the
        seq2seq mirror of ContinuousBatcher._apply_tokens, shared by
        the plain and lookup decode paths."""
        applied = 0
        for tok in tokens:
            tok = int(tok)
            self.pos[slot] += 1
            self.last[slot] = float(tok)
            applied += 1
            if self._emit(slot, tok):
                finished.append(self._finish(slot))
                break
        return applied

    def _finish(self, slot):
        import time

        req = self._req[slot]
        req.finished_at = time.perf_counter()
        self._metrics.append({
            "rid": req.rid,
            "prompt_tokens": int(req.tokens.size),
            "generated_tokens": len(req.out),
            "ttft_s": req.first_token_at - req.submitted,
            "latency_s": req.finished_at - req.submitted,
            "preemptions": 0,
        })
        self.active[slot] = False
        self._req[slot] = None
        return (req.rid, np.asarray(req.out, np.int64))

    def step(self):
        """One scheduler iteration: encode-admit queued requests into
        free slots, then one batched decode step; returns completed
        ``(rid, tokens)`` pairs."""
        finished = []
        for slot in range(self.slots):
            if not self.queue:
                break
            if self.active[slot]:
                continue
            req = self.queue.popleft()
            src = np.zeros((1, self.max_src), np.float32)
            src[0, :req.tokens.size] = req.tokens
            (self.enc_mem, self.enc_ck, self.enc_cv,
             self.enc_mask) = self._admit_fn()(
                src, np.int32(req.tokens.size), np.int32(slot),
                self.enc_mem, self.enc_ck, self.enc_cv, self.enc_mask,
            )
            self._req[slot] = req
            self.active[slot] = True
            self.pos[slot] = 0
            self.last[slot] = float(self.bos)
            self.req_temp[slot] = req.temp
            self.req_topk[slot] = req.top_k
            self.req_topp[slot] = req.top_p

        if self.active.any() and self.lookup:
            props = np.stack([self._lookup_props(s)
                              for s in range(self.slots)])
            self._dispatches += 1
            self._spec_rounds += 1
            greedy, accept, self.caches = self._lookup_round_fn()(
                self.last.copy(), self.pos.copy(), self.enc_mem,
                self.enc_ck, self.enc_cv, self.enc_mask, self.caches,
                props.astype(np.float32),
            )
            greedy = np.asarray(greedy)
            accept = np.asarray(accept)
            for slot in range(self.slots):
                if not self.active[slot]:
                    continue
                take = int(accept[slot]) + 1
                self._steps += take
                self._spec_emitted += self._advance(
                    slot, greedy[slot, :take], finished)
            return finished

        if self.active.any():
            self._steps += 1
            self._dispatches += 1
            nxt, self.caches = self._decode_fn()(
                self.last.copy(), self.pos.copy(), self.enc_mem,
                self.enc_ck, self.enc_cv, self.enc_mask, self.caches,
                self._split(),
                self.req_temp.copy(), self.req_topk.copy(),
                self.req_topp.copy(),
            )
            nxt = np.asarray(nxt)
            for slot in range(self.slots):
                if not self.active[slot]:
                    continue
                self._advance(slot, [int(nxt[slot])], finished)
        return finished

    def run(self) -> dict:
        out = {}
        while self.queue or self.active.any():
            for rid, toks in self.step():
                out[rid] = toks
        return out

    def drain_tokens(self) -> list:
        if not self.stream_tokens:
            raise ModelRuntimeError(
                "token streaming is off; construct with "
                "Seq2SeqBatcher(..., stream_tokens=True)")
        out = self._stream
        self._stream = []
        return out

    def request_metrics(self, reset: bool = False) -> list:
        out = list(self._metrics)
        if reset:
            self._metrics.clear()
        return out

    @property
    def stats(self) -> dict:
        out = {
            "decode_steps": self._steps,
            "dispatches": self._dispatches,
            "active": int(self.active.sum()),
            "queued": len(self.queue),
        }
        if self.lookup:
            out["spec_rounds"] = self._spec_rounds
            out["spec_emitted"] = self._spec_emitted
        return out
