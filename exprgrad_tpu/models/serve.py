"""KV-cache serving for trained flash_transformer models.

Train in the DSL (symbolic autodiff, one-jit training programs), serve
with O(1)-per-token decoding: this bridge pulls the trained parameters
out of a compiled :func:`flash_transformer` model and drives the
static-capacity KV cache (ops/decode.py) with a jax forward that
reproduces the DSL program's math exactly — prefill appends the whole
prompt once, each generated token then costs one thin fused step instead
of re-running the full O(seq²) predict target per token (the
examples/flash_lm.py sliding-window approach).

The whole generation loop jits as one ``lax.scan`` program.  Parity with
the compiled model is tested (tests/test_serve.py): prefill logits match
the "predict" target and greedy generation matches sliding-window greedy
decoding token for token.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from ..errors import ModelRuntimeError


class _Block(NamedTuple):
    attn_g: object  # rms gamma before attention
    wq: object      # [h, dim, hd]
    wk: object      # [hkv, dim, hd]
    wv: object      # [hkv, dim, hd]
    wo: object      # [h, hd, dim]
    ffn_g: object   # rms gamma before the FFN
    w1: object      # [dim, hidden]  (swiglu: the gate matrix ffn.wg)
    b1: object      # [hidden]       (swiglu: None — no FFN biases)
    w2: object      # [hidden, dim]  (swiglu: the down matrix ffn.wd)
    b2: object      # [dim]          (swiglu: None)
    w3: object = None  # [dim, hidden] swiglu up matrix ffn.wu


class FlashLMServer:
    """Incremental decoder over a trained flash_transformer's weights.

    ``model`` is the compiled Model; parameters are matched by their
    (name, shape) sequence — embed, pos, then per block
    [rms.g, wq, wk, wv, wo, rms.g, weights, bias, weights, bias], then
    the head [rms.g, weights, bias] — and validated; a mismatch raises
    instead of serving garbage.
    """

    def __init__(self, model, cache_dtype=None, eps: float = 1e-5,
                 weight_dtype=None, mesh=None):
        import jax.numpy as jnp

        self._jnp = jnp
        self.eps = eps
        self.cache_dtype = cache_dtype or jnp.bfloat16
        self.weight_dtype = weight_dtype
        self.mesh = mesh

        from ._quant import QuantW

        if any(isinstance(v, QuantW) for v in model.params.values()):
            raise ModelRuntimeError(
                "model weights were already quantized by "
                "Model.quantize_weights (executor-level serving); build "
                "the server from the full-precision model and pass "
                "weight_dtype=jnp.int8 instead"
            )
        seq = [
            (model.program.tensors[tid].name,
             jnp.asarray(np.asarray(model.params[tid])))
            for tid in model.program.params
        ]

        def take(expected: str):
            if not seq or seq[0][0] != expected:
                got = seq[0][0] if seq else "<end>"
                raise ModelRuntimeError(
                    f"unexpected parameter {got!r} (wanted {expected!r}); "
                    "FlashLMServer serves models built by flash_transformer"
                )
            return seq.pop(0)[1]

        self.embed = take("embed")      # [vocab, dim]
        if seq and seq[0][0] == "pos":
            self.pos = take("pos")      # [max_seq, dim]
        else:
            self.pos = None             # rotary model (rope=True)
        self.vocab, self.dim = self.embed.shape

        self.blocks: list[_Block] = []
        while len(seq) > 3:
            head = dict(
                attn_g=take("rms.g"),
                wq=take("wq"), wk=take("wk"), wv=take("wv"), wo=take("wo"),
                ffn_g=take("rms.g"),
            )
            if seq and seq[0][0] == "ffn.wg":  # gated SwiGLU block
                head.update(
                    w1=take("ffn.wg"), b1=None,
                    w3=take("ffn.wu"),
                    w2=take("ffn.wd"), b2=None,
                )
            else:
                head.update(
                    w1=take("weights"), b1=take("bias"),
                    w2=take("weights"), b2=take("bias"),
                )
            self.blocks.append(_Block(**head))
        self.final_g = take("rms.g")
        if seq and seq[0][0] == "weights":
            self.w_head = take("weights")
        else:
            # tie_embeddings=True: the LM head IS the embedding table
            # (logits = h @ embed.T); serve the transpose directly
            self.w_head = jnp.transpose(self.embed)
        self.b_head = take("bias")
        if seq:
            raise ModelRuntimeError(
                f"{len(seq)} unconsumed parameters; not a flash_transformer"
            )
        if not self.blocks:
            raise ModelRuntimeError(
                "model has no transformer blocks (flash_transformer with "
                "blocks >= 1 is required for KV-cache serving)"
            )
        # sliding-window models must be served with the same mask: read
        # the window off the program's attention extern attrs
        windows = {
            int(kern.extern.attrs.get("window", 0))
            for target in model.program.targets.values()
            for kern in target.kernels
            if kern.extern is not None and kern.extern.name == "attention"
        }
        # 0 = full causal; mixing it with windowed blocks (or mixing two
        # window sizes) cannot be served with one decode mask
        if len(windows) > 1:
            raise ModelRuntimeError(
                "blocks disagree on attention window "
                f"({sorted(windows)}, 0 = full causal); KV-cache serving "
                "needs one uniform window"
            )
        w = windows.pop() if windows else 0
        self.window = w if w > 0 else None
        # rotary metadata travels the same way (layers.attention rope)
        ropes = {
            (float(kern.extern.attrs.get("rope", 0.0)),
             int(kern.extern.attrs.get("rope_max_seq", 0)))
            for target in model.program.targets.values()
            for kern in target.kernels
            if kern.extern is not None and kern.extern.name == "attention"
        }
        if len(ropes) > 1:
            raise ModelRuntimeError(
                f"blocks disagree on rope config ({sorted(ropes)}); "
                "KV-cache serving needs one uniform rotation"
            )
        rb, rms = ropes.pop() if ropes else (0.0, 0)
        self.rope_base = rb if rb > 0 else None
        if self.pos is not None:
            self.max_seq = self.pos.shape[0]
        elif self.rope_base is not None:
            self.max_seq = rms
        else:
            raise ModelRuntimeError(
                "model has neither a position table nor rope metadata; "
                "cannot bound the serving context"
            )
        # compiled entry points, keyed by static config (shapes are
        # handled by jax.jit's own cache INSIDE each entry): repeated
        # serving calls must not re-trace -- XLA compiles are expensive
        # on the target platform
        from ..utils.buckets import JitCache

        self._jit_cache = JitCache()
        self.prompt_buckets = None  # see set_prompt_buckets
        blk = self.blocks[0]
        self.heads, _, self.head_dim = blk.wq.shape
        self.kv_heads = blk.wk.shape[0]
        self.scale = 1.0 / float(np.sqrt(self.head_dim))

        if weight_dtype is not None:
            from ..quant import check_weight_dtype
            from ._quant import quantize_weight as q

            check_weight_dtype(weight_dtype)

            # contraction axes per matrix (see the einsums in _step);
            # embeddings/positions/biases/gammas stay full precision
            self.blocks = [
                blk._replace(
                    wq=q(blk.wq, 1), wk=q(blk.wk, 1), wv=q(blk.wv, 1),
                    wo=q(blk.wo, (0, 1)),
                    w1=q(blk.w1, 0), w2=q(blk.w2, 0),
                    w3=None if blk.w3 is None else q(blk.w3, 0),
                )
                for blk in self.blocks
            ]
            self.w_head = q(self.w_head, 0)

        if mesh is not None:
            self._shard_weights()

    # -- multi-device serving (tensor-parallel weights, dp batches) ------
    def _place(self, w, *axis_names):
        """See models/_mesh.place (shared with Seq2SeqServer)."""
        from ._mesh import place

        return place(self.mesh, w, axis_names)

    def _shard_weights(self) -> None:
        """Megatron-style tensor parallelism over the mesh's ``model``
        axis: attention shards by head, the FFN by hidden column/row
        (XLA inserts the psum the row-sharded second matmul implies),
        the LM head by vocab column.  Embeddings, norms, and the small
        biases stay replicated.  Batches shard over ``data``."""
        p = self._place
        self.embed = p(self.embed, None, None)
        if self.pos is not None:  # rotary models carry no pos table
            self.pos = p(self.pos, None, None)
        self.blocks = [
            blk._replace(
                attn_g=p(blk.attn_g, None),
                wq=p(blk.wq, "model", None, None),
                wk=p(blk.wk, "model", None, None),
                wv=p(blk.wv, "model", None, None),
                wo=p(blk.wo, "model", None, None),
                ffn_g=p(blk.ffn_g, None),
                w1=p(blk.w1, None, "model"),
                b1=None if blk.b1 is None else p(blk.b1, "model"),
                w2=p(blk.w2, "model", None),
                b2=None if blk.b2 is None else p(blk.b2, None),
                w3=None if blk.w3 is None else p(blk.w3, None, "model"),
            )
            for blk in self.blocks
        ]
        self.final_g = p(self.final_g, None)
        self.w_head = p(self.w_head, None, "model")
        self.b_head = p(self.b_head, "model")

    def _tokens(self, x):
        """Entry placement for token batches: shard the batch over the
        ``data`` axis when serving on a mesh."""
        x = self._jnp.asarray(x)
        if self.mesh is not None and x.ndim >= 1:
            return self._place(x, "data", *([None] * (x.ndim - 1)))
        return x

    # -- forward pieces (must mirror models/transformer.py exactly) -----
    def _rms(self, x, gamma):
        jnp = self._jnp
        ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        return x / jnp.sqrt(ms + self.eps) * gamma

    def _step(self, x, caches, pos_offset, key_pos=None, q_pos=None,
              row_starts=None, cache_io=None):
        """One forward pass of ``t`` fresh tokens (already embedded) with
        their K/V appended to the caches.  Returns (logits, caches).
        ``key_pos``/``q_pos`` activate ragged-batch position masking
        (see ops.decode.decode_attention).  ``row_starts`` [b] writes the
        fresh K/V at PER-ROW slot offsets instead of the batch-global
        cursor (continuous batching).  ``cache_io`` overrides cache
        storage entirely: an object with ``append(cache, k, v) -> cache``
        and ``view(cache) -> KVCache`` (paged attention gathers a dense
        view per block; dense caches are their own view)."""
        from ..ops.decode import append, append_at, decode_attention
        from ._quant import dequantize as dq

        jnp = self._jnp
        new_caches = []
        for blk, cache in zip(self.blocks, caches):
            rn = self._rms(x, blk.attn_g)
            q = jnp.einsum("ntc,hcd->nhtd", rn, dq(blk.wq))
            k = jnp.einsum("ntc,hcd->nhtd", rn, dq(blk.wk))
            v = jnp.einsum("ntc,hcd->nhtd", rn, dq(blk.wv))
            if self.rope_base is not None:
                if q_pos is not None:   # ragged: true per-seq positions
                    rot_pos = q_pos
                else:
                    rot_pos = pos_offset + jnp.arange(
                        x.shape[1], dtype=jnp.int32
                    )
                q = self._rope_rotate(q, rot_pos)
                k = self._rope_rotate(k, rot_pos)
            att = None
            if cache_io is not None:
                cache = cache_io.append(cache, k, v)
                if hasattr(cache_io, "attend"):
                    # paged flash path: attend against the pages in
                    # place (ops.paged_attention) — no dense gather
                    att = cache_io.attend(q, cache, self.scale,
                                          self.window, key_pos, q_pos)
                else:
                    view = cache_io.view(cache)
            elif row_starts is None:
                cache = view = append(cache, k, v)
            else:
                cache = view = append_at(cache, k, v, row_starts)
            if att is None:
                att = decode_attention(q, view, sm_scale=self.scale,
                                       window=self.window,
                                       key_pos=key_pos, q_pos=q_pos)
            x = x + jnp.einsum("nhtd,hde->nte", att, dq(blk.wo))
            rn2 = self._rms(x, blk.ffn_g)
            if blk.w3 is not None:  # swiglu: silu(gate) * up, no biases
                g = rn2 @ dq(blk.w1)
                h = g / (1.0 + jnp.exp(-g)) * (rn2 @ dq(blk.w3))
                x = x + h @ dq(blk.w2)
            else:
                h = jnp.maximum(rn2 @ dq(blk.w1) + blk.b1, 0.0)
                x = x + h @ dq(blk.w2) + blk.b2
            new_caches.append(cache)
        logits = self._rms(x, self.final_g) @ dq(self.w_head) + self.b_head
        return logits, new_caches

    def _embed_tokens(self, tokens, pos_offset):
        jnp = self._jnp
        ids = tokens.astype(jnp.int32)
        if self.pos is None:  # rotary: positions live in the attention
            return self.embed[ids]
        t = ids.shape[1]
        pos_ids = pos_offset + jnp.arange(t, dtype=jnp.int32)
        return self.embed[ids] + self.pos[pos_ids][None, :, :]

    def _embed_at(self, tokens, pos_ids):
        """Embed with explicit per-sequence positions [batch, t]."""
        jnp = self._jnp
        if self.pos is None:
            return self.embed[tokens.astype(jnp.int32)]
        return self.embed[tokens.astype(jnp.int32)] + self.pos[
            pos_ids.astype(jnp.int32)
        ]

    def _rope_rotate(self, x, positions):
        """Rotate ``x`` [b, h, t, hd] by absolute ``positions`` ([t] or
        [b, t]) — mirrors layers.attention.rope exactly (rotate-half)."""
        jnp = self._jnp
        hd = x.shape[-1]
        half = hd // 2
        inv = jnp.exp(
            jnp.arange(half, dtype=jnp.float32)
            * (-2.0 * float(np.log(self.rope_base)) / hd)
        )
        ang = positions.astype(jnp.float32)[..., None] * inv
        if ang.ndim == 2:          # [t, half] -> broadcast over batch
            ang = ang[None]
        ang = ang[:, None]         # [b?, 1, t, half]
        c, s = jnp.cos(ang), jnp.sin(ang)
        x1, x2 = x[..., :half], x[..., half:]
        return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1)

    def _ragged_positions(self, lens, width, capacity):
        """(pos_ids [b, width], key_pos [b, capacity]) for a right-padded
        batch: true positions with pad queries clamped and pad/unwritten
        cache slots marked -1 (shared by scoring and ragged decoding)."""
        jnp = self._jnp
        slot = jnp.arange(capacity, dtype=jnp.int32)
        pos_ids = jnp.minimum(
            jnp.arange(width, dtype=jnp.int32)[None, :], lens[:, None] - 1
        )
        key_pos = jnp.where(
            (slot[None, :] < lens[:, None]) & (slot[None, :] < width),
            slot[None, :], jnp.int32(-1),
        )
        return pos_ids, key_pos

    def _jitted(self, key, build):
        """jit-compile ``build()`` once per static config ``key``
        (bounded FIFO — utils.buckets.JitCache)."""
        return self._jit_cache.get(key, build)

    # -- public API ------------------------------------------------------
    def init_caches(self, batch: int, capacity: Optional[int] = None):
        from ..ops.decode import init_cache

        capacity = capacity or self.max_seq
        caches = [
            init_cache(batch, self.kv_heads, capacity, self.head_dim,
                       dtype=self.cache_dtype)
            for _ in self.blocks
        ]
        if self.mesh is not None:
            # batch over data, kv heads over model (dropped per-dim when
            # not divisible); scales are [b, hkv, cap]
            caches = [
                c._replace(
                    k=self._place(c.k, "data", "model", None, None),
                    v=self._place(c.v, "data", "model", None, None),
                    k_scale=(None if c.k_scale is None else
                             self._place(c.k_scale, "data", "model", None)),
                    v_scale=(None if c.v_scale is None else
                             self._place(c.v_scale, "data", "model", None)),
                )
                for c in caches
            ]
        return caches

    def prefill(self, tokens, caches):
        """Run the whole prompt ([batch, t] float ids) through the model,
        filling the caches; returns (logits [batch, t, vocab], caches)."""
        jnp = self._jnp
        tokens = self._tokens(tokens)
        x = self._embed_tokens(tokens, caches[0].length)
        return self._step(x, caches, caches[0].length)

    def decode(self, token, caches):
        """One token per sequence ([batch, 1]); O(cache) per step."""
        return self.prefill(token, caches)

    def generate_speculative(
        self,
        draft: "FlashLMServer",
        prompt,
        n_new: int,
        k: int = 4,
        capacity: Optional[int] = None,
        temperature: float = 0.0,
        seed: int = 0,
        break_even: Optional[float] = None,
    ):
        """Speculative decoding: a small ``draft`` server proposes ``k``
        tokens per round, this (target) model verifies them in ONE
        ``k``-wide cached step.

        ``temperature <= 0`` (default) is GREEDY acceptance: the output
        equals this model's greedy sequence (``generate(prompt,
        n_new)``) for ANY draft — the draft only changes how many target
        steps it takes.  ``temperature > 0`` is the exact
        rejection-sampling scheme (Leviathan et al.): proposal ``d_j``
        is accepted with probability ``min(1, p_j(d_j) / q_j(d_j))`` and
        the first rejection resamples from the normalized residual
        ``max(p - q, 0)`` — the OUTPUT DISTRIBUTION equals plain
        temperature sampling from the target, again for any draft (a
        better draft only raises the acceptance rate).

        Caveat: the verify step is k-wide while plain decode is 1-wide,
        so XLA may reduce in a different order; greedy tokens whose top-2
        logits tie within float noise (~1e-6 relative) could resolve
        differently.  Whole loop is one jitted ``lax.while_loop``; both
        KV caches rewind their ``length`` on rejection (stale slots are
        masked by position and overwritten by later appends).  Returns
        ``(tokens [1, n_new], target_steps)``.

        Single sequence only (per-row acceptance lengths would make the
        batch ragged); draft and target must share the vocabulary.

        ``break_even`` (tokens per verify round) warns when the measured
        acceptance cannot pay for the draft: speculation only wins when
        ``n_new / target_steps > 1 + k * t_draft / t_plain``.  The
        measured split at the bench scale lives in ``BENCH_DETAILS.json
        speculative_decoding_trained`` cost_split (a latency-bound small draft costs a large
        fraction of a target step, so small ``k`` cannot win even at
        full acceptance — raise ``k`` or shrink the draft).
        """
        import jax

        from ._spec import check_spec_args, speculative_loop

        jnp = self._jnp
        prompt = self._tokens(prompt)
        batch, t = prompt.shape
        check_spec_args(batch, self.vocab, draft.vocab, k, n_new,
                        ModelRuntimeError)
        # rows for rejected proposals are appended before the rewind, so
        # the high-water mark overshoots by up to k
        need = t + n_new - 1 + k
        if need > self.max_seq or need > draft.max_seq:
            raise ModelRuntimeError(
                f"prompt_len + n_new - 1 + k = {need} exceeds max_seq "
                f"(target {self.max_seq}, draft {draft.max_seq})"
            )
        capacity = capacity or need
        if need > capacity:
            raise ModelRuntimeError(
                f"{need} cache rows needed, capacity {capacity}"
            )
        sampled = temperature > 0.0
        T = float(temperature) if sampled else 1.0

        def build():
          def run(prompt, key0):
            tc = self.init_caches(1, capacity)
            dc = draft.init_caches(1, capacity)
            logits_t, tc = self.prefill(prompt, tc)
            _, dc = draft.prefill(prompt, dc)
            if sampled:
                key0, sub = jax.random.split(key0)
                first = jax.random.categorical(
                    sub, logits_t[:, -1].astype(jnp.float32) / T, axis=-1
                ).astype(jnp.int32)
            else:
                first = jnp.argmax(
                    logits_t[:, -1], axis=-1
                ).astype(jnp.int32)
            return speculative_loop(
                draft_step=lambda toks, st: draft.decode(toks, st),
                target_step=lambda toks, st: self.prefill(toks, st),
                rewind=lambda st, ln: [c._replace(length=ln) for c in st],
                length_of=lambda st: st[0].length,
                dstate=dc, tstate=tc, first=first,
                n_new=n_new, k=k, temperature=temperature, key0=key0,
            )

          return run

        key = ("spec", t, n_new, k, capacity, draft, sampled,
               float(temperature))
        toks, steps = self._jitted(key, build)(
            prompt, jax.random.PRNGKey(seed))
        if break_even is not None:
            import warnings

            rate = float(n_new) / max(1, int(steps))
            if rate < float(break_even):
                warnings.warn(
                    f"speculative acceptance {rate:.2f} tokens/round is "
                    f"below the break-even {float(break_even):.2f}: this "
                    f"draft costs more than it saves here (plain "
                    f"generate() would be faster)", RuntimeWarning,
                    stacklevel=2)
        return toks, steps

    def generate_lookup(
        self,
        prompt,
        n_new: int,
        k: int = 8,
        ngram: int = 2,
        capacity: Optional[int] = None,
    ):
        """Prompt-lookup speculative decoding (draft-FREE): each round
        proposes the ``k`` tokens that followed the most recent earlier
        occurrence of the last ``ngram`` emitted tokens anywhere in
        prompt + generation so far, and this model verifies them in ONE
        ``k``-wide cached step — the same exact verify/accept/rewind
        round as ``generate_speculative`` with the draft model's cost
        replaced by a vectorized history match (a few VPU ops).

        Output is ALWAYS this model's exact greedy sequence; the lookup
        only changes how many target steps it takes.  On repetitive or
        structured continuations (code, templated text, retrieval
        copies) acceptance approaches 1 and the speedup approaches
        ``tokens-per-round / (verify_cost / decode_cost)`` — with NO
        draft to pay for, unlike ``generate_speculative`` whose small
        draft is itself latency-bound at serving scale
        (``BENCH_DETAILS.json speculative_k_sweep``).  On
        non-repetitive text the proposals miss, every round emits >= 1
        token, and the cost floor is one verify step per token.

        Returns ``(tokens [1, n_new], target_steps)``.
        """
        import jax

        from ._spec import check_spec_args, speculative_loop

        jnp = self._jnp
        prompt = self._tokens(prompt)
        batch, t = prompt.shape
        check_spec_args(batch, self.vocab, self.vocab, k, n_new,
                        ModelRuntimeError)
        if ngram < 1:
            raise ModelRuntimeError(f"ngram must be >= 1 (got {ngram})")
        if t + 1 < ngram:
            raise ModelRuntimeError(
                f"ngram {ngram} exceeds prompt_len + 1 = {t + 1}")
        need = t + n_new - 1 + k
        if need > self.max_seq:
            raise ModelRuntimeError(
                f"prompt_len + n_new - 1 + k = {need} exceeds max_seq "
                f"({self.max_seq})"
            )
        capacity = capacity or need
        if need > capacity:
            raise ModelRuntimeError(
                f"{need} cache rows needed, capacity {capacity}"
            )

        def build():
          def run(prompt, key0):
            tc = self.init_caches(1, capacity)
            logits_t, tc = self.prefill(prompt, tc)
            first = jnp.argmax(logits_t[:, -1], axis=-1).astype(jnp.int32)
            prompt_i32 = prompt[0].astype(jnp.int32)      # [t]
            L = t + n_new + k                              # hist length

            def propose(out, count, cur, _key):
                # known tokens: hist[:t + count] (prompt + emitted)
                hist = jnp.concatenate([prompt_i32, out])  # [L]
                pos = t + count
                lastg = jax.lax.dynamic_slice(
                    hist, (pos - ngram,), (ngram,))        # [ngram]
                starts = jnp.arange(L, dtype=jnp.int32)
                win_idx = jnp.minimum(
                    starts[:, None] + jnp.arange(ngram)[None, :], L - 1)
                wins = hist[win_idx]                       # [L, ngram]
                match = jnp.all(wins == lastg[None, :], axis=1)
                # window must END strictly before the query ngram does
                match = jnp.logical_and(match, starts < pos - ngram)
                best = jnp.max(jnp.where(match, starts, -1))
                found = best >= 0
                prop_idx = jnp.minimum(
                    best + ngram + jnp.arange(k, dtype=jnp.int32),
                    pos - 1)
                return jnp.where(
                    found, hist[prop_idx],
                    jnp.broadcast_to(cur[0], (k,))).astype(jnp.int32)

            return speculative_loop(
                draft_step=None,
                target_step=lambda toks, st: self.prefill(toks, st),
                rewind=lambda st, ln: [c._replace(length=ln) for c in st],
                length_of=lambda st: st[0].length,
                dstate=None, tstate=tc, first=first,
                n_new=n_new, k=k, temperature=0.0, key0=key0,
                propose_fn=propose,
            )

          return run

        key = ("lookup", t, n_new, k, ngram, capacity)
        return self._jitted(key, build)(prompt, jax.random.PRNGKey(0))

    def generate_beam(
        self,
        prompt,
        n_new: int,
        beams: int = 4,
        capacity: Optional[int] = None,
        stop_token: Optional[int] = None,
    ):
        """Beam-search continuation of ``prompt`` ([batch, t] float ids).

        Returns ``(tokens [batch, beams, n_new], scores [batch, beams])``
        with beams sorted best-first; ``scores`` are cumulative token
        log-probabilities.  The whole loop is one jitted ``lax.scan``:
        each step expands every live beam over the vocabulary, keeps the
        top ``beams`` of ``beams * vocab`` candidates, and REORDERS the
        KV caches by gathering parent rows (batch-major
        ``[batch*beams, ...]`` layout).  ``stop_token`` finishes a beam:
        it stops accumulating score and pads with the stop token.
        Uniform prompts only (use ``generate(lengths=...)`` for ragged
        greedy/sampled decoding).
        """
        import jax

        jnp = self._jnp
        prompt = self._tokens(prompt)
        batch, t = prompt.shape
        capacity = capacity or self.max_seq
        if not 1 <= beams <= self.vocab:
            raise ModelRuntimeError(
                f"beams must be in [1, vocab={self.vocab}] (got {beams})"
            )
        if n_new < 1:
            raise ModelRuntimeError(f"n_new must be >= 1 (got {n_new})")
        need = t + n_new - 1
        if need > self.max_seq:
            raise ModelRuntimeError(
                f"prompt_len + n_new - 1 = {need} exceeds max_seq "
                f"{self.max_seq}"
            )
        if need > capacity:
            raise ModelRuntimeError(
                f"prompt_len + n_new - 1 = {need} exceeds capacity "
                f"{capacity}"
            )
        V = self.vocab

        def build():
          def run(prompt):
            batch = prompt.shape[0]
            # prefill once at batch, then replicate rows per beam
            caches = self.init_caches(batch, capacity)
            logits, caches = self.prefill(prompt, caches)
            logp0 = jax.nn.log_softmax(
                logits[:, -1].astype(jnp.float32), axis=-1
            )                                              # [batch, V]
            caches = replicate_caches(caches, beams)

            def step(tokens, caches):
                return self.decode(tokens.astype(prompt.dtype), caches)

            return beam_search_loop(step, caches, logp0, n_new, beams,
                                    V, stop_token)

          return run

        from ._beam import beam_search_loop, replicate_caches  # noqa: F811

        key = ("beam", n_new, beams, capacity, stop_token)
        return self._jitted(key, build)(prompt)

    def score(self, tokens, lengths=None):
        """Per-sequence mean negative log-likelihood of ``tokens``
        ([batch, t] float ids; optional per-sequence ``lengths`` for
        right-padded ragged batches).  Returns [batch] float32 — the
        teacher-forced NLL of tokens[1:] given tokens[:-1]; ``exp`` of it
        is perplexity.  One prefill pass, no generation loop."""
        import jax

        jnp = self._jnp
        tokens = self._tokens(tokens)
        batch, t = tokens.shape
        if t < 2:
            raise ModelRuntimeError("score needs sequences of >= 2 tokens")
        if t > self.max_seq:
            raise ModelRuntimeError(
                f"sequence length {t} exceeds max_seq {self.max_seq}"
            )
        if lengths is None:
            lens = jnp.full((batch,), t, jnp.int32)
        else:
            lengths = np.asarray(lengths, np.int64)
            if lengths.shape != (batch,) or lengths.min() < 2 \
                    or lengths.max() > t:
                raise ModelRuntimeError(
                    f"lengths must be [batch] ints in [2, {t}]"
                )
            lens = jnp.asarray(lengths, jnp.int32)

        def build():
          def run(tokens, lens):
            import jax

            batch, t = tokens.shape
            caches = self.init_caches(batch, t)
            pos_ids, key_pos = self._ragged_positions(lens, t, t)
            x = self._embed_at(tokens, pos_ids)
            logits, _ = self._step(x, caches, 0, key_pos=key_pos,
                                   q_pos=pos_ids)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nxt = tokens.astype(jnp.int32)[:, 1:]           # targets
            tok_lp = jnp.take_along_axis(
                logp[:, :-1], nxt[:, :, None], axis=-1
            )[..., 0]                                        # [b, t-1]
            valid = jnp.arange(1, t, dtype=jnp.int32)[None, :] < \
                lens[:, None]
            n = jnp.maximum(jnp.sum(valid, axis=1), 1)
            return -jnp.sum(jnp.where(valid, tok_lp, 0.0), axis=1) / n

          return run

        return self._jitted(("score",), build)(tokens, lens)

    def set_prompt_buckets(self, buckets) -> None:
        """Bucket prompt WIDTHS so ``generate`` does not re-trace per
        prompt length (each new width is otherwise a fresh XLA compile —
        minutes through this platform's tunnel).

        ``buckets``: sorted widths (e.g. ``[32, 128, 512]``) or
        ``"pow2"``.  Prompts pad right to the bucket width and decode
        through the RAGGED path with their true lengths — pad K/V slots
        are position-masked out of attention, so greedy results stay
        bit-equal to the unbucketed call (the ragged-batch exactness
        contract, tests/test_serve.py).
        """
        from ..utils.buckets import normalize_buckets

        self.prompt_buckets = normalize_buckets(buckets, "prompt bucket")

    def _prompt_bucket(self, width: int) -> int:
        from ..utils.buckets import bucket_for

        return bucket_for(self.prompt_buckets, width)

    def generate(
        self,
        prompt,
        n_new: int,
        capacity: Optional[int] = None,
        temperature: float = 0.0,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        seed: int = 0,
        lengths=None,
        stop_token: Optional[int] = None,
        stop_seq=None,
    ):
        """Continue ``prompt`` ([batch, t] float ids) by ``n_new`` tokens.

        ``temperature <= 0`` decodes greedily; otherwise tokens sample
        from ``softmax(logits / temperature)``, restricted to the
        ``top_k`` most likely tokens and/or the smallest nucleus whose
        probability mass reaches ``top_p`` when given (both filters
        compose: top_k first, then top_p over the survivors).  The per-token loop is
        ONE jitted ``lax.scan``.

        ``lengths`` ([batch] ints) serves a RAGGED batch: prompts are
        right-padded to a common width and each sequence decodes from its
        own length — pad K/V are position-masked out of attention and
        every sequence uses its true positions.  GREEDY results are
        bit-equal to serving each prompt alone; sampled decoding
        (``temperature > 0``) is exact over the same distributions but
        draws batch-shaped noise, so individual samples differ from a
        solo call with the same seed.

        ``stop_token`` freezes a sequence once it emits that token: all
        its later outputs are the stop token itself (the scan still runs
        the fixed ``n_new`` steps — static shapes — finished rows just
        carry the stop token forward).

        ``stop_seq`` (a list of token ids) generalizes that to a
        MULTI-TOKEN stop sequence: a rolling window of the last
        ``len(stop_seq)`` emitted tokens rides the scan carry, and a row
        freezes the step its window equals the sequence (later outputs
        carry the sequence's final token forward).  Only generated
        tokens count — a stop sequence straddling the prompt/generation
        boundary does not fire, matching the usual serving-API contract.
        Mutually exclusive with ``stop_token``.
        """
        import jax

        jnp = self._jnp
        prompt = self._tokens(prompt)
        batch = prompt.shape[0]
        capacity = capacity or self.max_seq
        if n_new < 1:
            raise ModelRuntimeError(f"n_new must be >= 1 (got {n_new})")
        if self.prompt_buckets is not None:
            width = int(prompt.shape[1])
            target = min(self._prompt_bucket(width),
                         max(capacity - n_new + 1, width))
            if target > width:
                if lengths is None:
                    lengths = np.full((batch,), width, np.int64)
                prompt = jnp.pad(prompt, ((0, 0), (0, target - width)))
        # The last decode feeds token index t+n_new-2, so positions
        # 0..t+n_new-2 are embedded and t+n_new-1 K/V rows are cached.
        # All of these are static here; overflowing either corrupts the
        # output silently (clamped gathers / clamped cache appends).
        t_max = int(prompt.shape[1])
        if lengths is not None:
            lengths = np.asarray(lengths, np.int64)
            if lengths.shape != (batch,):
                raise ModelRuntimeError(
                    f"lengths must have shape ({batch},), got "
                    f"{lengths.shape}"
                )
            if lengths.min() < 1 or lengths.max() > t_max:
                raise ModelRuntimeError(
                    f"lengths must lie in [1, prompt width {t_max}]"
                )
            need = int(lengths.max()) + n_new - 1
            cache_need = t_max + n_new - 1
        else:
            need = cache_need = t_max + n_new - 1
        if need > self.max_seq:
            raise ModelRuntimeError(
                f"prompt_len + n_new - 1 = {need} exceeds the model's "
                f"max_seq {self.max_seq} position embeddings"
            )
        if cache_need > capacity:
            raise ModelRuntimeError(
                f"prompt_width + n_new - 1 = {cache_need} exceeds KV-cache "
                f"capacity {capacity}; pass capacity>={cache_need}"
            )
        caches = self.init_caches(batch, capacity)

        from ._sample import check_top_p, make_picker

        check_top_p(top_p)
        pick = make_picker(self.vocab, temperature, top_k, top_p)

        if stop_seq is not None:
            if stop_token is not None:
                raise ModelRuntimeError(
                    "stop_token and stop_seq are mutually exclusive"
                )
            stop_seq = [int(s) for s in stop_seq]
            if not stop_seq or any(
                s < 0 or s >= self.vocab for s in stop_seq
            ):
                raise ModelRuntimeError(
                    f"stop_seq must be non-empty token ids in [0, "
                    f"{self.vocab}); got {stop_seq}"
                )
        seq_len = len(stop_seq) if stop_seq is not None else 0

        def init_stop(shape, dtype):
            """done flags, plus the rolling emitted-token window when a
            multi-token stop sequence is armed (-1 never matches)."""
            done = jnp.zeros(shape, bool)
            if not seq_len:
                return done
            return done, jnp.full(shape + (seq_len,), -1.0, dtype)

        def freeze(nxt, state):
            """Carry the stop token forward on finished rows."""
            if seq_len:
                done, recent = state
                want = jnp.asarray(stop_seq, nxt.dtype)
                nxt = jnp.where(done, want[-1], nxt)
                recent = jnp.concatenate(
                    [recent[:, 1:], nxt[:, None]], axis=1
                )
                done = jnp.logical_or(done, (recent == want).all(-1))
                return nxt, (done, recent)
            if stop_token is None:
                return nxt, state
            stop = jnp.asarray(stop_token, nxt.dtype)
            nxt = jnp.where(state, stop, nxt)
            return nxt, jnp.logical_or(state, nxt == stop)

        if lengths is None:
          def build():
            def run(prompt, caches, key):
                logits, caches = self.prefill(prompt, caches)
                key, sub = jax.random.split(key)
                first = pick(logits[:, -1], sub).astype(prompt.dtype)
                first, done = freeze(
                    first, init_stop(first.shape, first.dtype)
                )

                def body(carry, _):
                    tok, caches, key, done = carry
                    logits, caches = self.decode(tok[:, None], caches)
                    key, sub = jax.random.split(key)
                    nxt = pick(logits[:, -1], sub).astype(tok.dtype)
                    nxt, done = freeze(nxt, done)
                    return (nxt, caches, key, done), nxt

                # n_new-1 decode steps: the carried token is already the
                # i-th output, so collecting `nxt` avoids a final decode
                # whose result would be discarded.
                (_, _, _, _), rest = jax.lax.scan(
                    body, (first, caches, key, done), None, length=n_new - 1
                )
                toks = jnp.concatenate([first[None], rest], axis=0)
                return jnp.swapaxes(toks, 0, 1)  # [batch, n_new]

            return run

          key = ("gen", n_new, stop_token,
                 tuple(stop_seq) if seq_len else None, temperature,
                 top_k, top_p)
          return self._jitted(key, build)(
              prompt, caches, jax.random.PRNGKey(seed)
          )

        lens = jnp.asarray(lengths, jnp.int32)

        def build_ragged():
          def run_ragged(prompt, caches, key, lens):
            t = prompt.shape[1]
            cap = caches[0].k.shape[2]
            # prefill: true positions; pad rows clamp (their outputs and
            # K/V are masked/ignored by position)
            pos_ids, key_pos = self._ragged_positions(lens, t, cap)
            x = self._embed_at(prompt, pos_ids)
            logits, caches = self._step(x, caches, 0, key_pos=key_pos,
                                        q_pos=pos_ids)
            key, sub = jax.random.split(key)
            last = jnp.take_along_axis(
                logits, (lens[:, None, None] - 1).astype(jnp.int32), axis=1
            )[:, 0]
            first = pick(last, sub).astype(prompt.dtype)
            first, done = freeze(first, init_stop(first.shape, first.dtype))

            def body(carry, _):
                tok, caches, key, key_pos, cur, done = carry
                # the fresh K/V land at slot cache.length: mark the slot
                # with the token's true position before attending
                write_at = caches[0].length
                key_pos = jax.lax.dynamic_update_slice(
                    key_pos, cur[:, None], (jnp.int32(0), write_at)
                )
                x = self._embed_at(tok[:, None], cur[:, None])
                logits, caches = self._step(x, caches, 0, key_pos=key_pos,
                                            q_pos=cur[:, None])
                key, sub = jax.random.split(key)
                nxt = pick(logits[:, 0], sub).astype(tok.dtype)
                nxt, done = freeze(nxt, done)
                return (nxt, caches, key, key_pos, cur + 1, done), nxt

            (_, _, _, _, _, _), rest = jax.lax.scan(
                body, (first, caches, key, key_pos, lens, done), None,
                length=n_new - 1,
            )
            toks = jnp.concatenate([first[None], rest], axis=0)
            return jnp.swapaxes(toks, 0, 1)  # [batch, n_new]

          return run_ragged

        key = ("gen_ragged", n_new, stop_token,
               tuple(stop_seq) if seq_len else None, temperature, top_k,
               top_p)
        return self._jitted(key, build_ragged)(
            prompt, caches, jax.random.PRNGKey(seed), lens
        )
