"""KV-cache serving for trained encoder-decoder (seq2seq) models.

``greedy_decode`` (models/seq2seq.py) re-runs the full teacher-forced
forward per generated token — exact but O(t²) total.  This server is the
encoder-decoder analog of FlashLMServer: per-token decode cost is
independent of the generated length.

* **encode once**: the full bidirectional encoder runs a single time per
  request; the cross-attention K/V projections of the encoder memory are
  precomputed once (they depend only on the encoder output — each decode
  step reuses them for free).
* **decoder self-attention** streams through a static-capacity KV cache
  (ops/decode.py), exactly like decoder-only serving.
* the whole generation loop jits as one ``lax.scan`` program, cached per
  static config (XLA compiles are expensive on this platform).

Parameters are extracted from the compiled model BY NAME — every
parameter of :func:`tiny_seq2seq` carries a unique per-block prefixed
name ("enc0.att.wq", "dec1.cross.wk", ...) because the DSL graph
interleaves encoder and decoder registration order (the encoder
subgraph only registers when cross-attention first references it).
Any (enc_blocks, dec_blocks) depth is served.

Parity is tested (tests/test_seq2seq_serve.py): prefill logits match the
"predict" target and greedy generation matches ``greedy_decode`` token
for token.  The reference has no serving runtime at all; this follows
the repo's own FlashLMServer contract (models/serve.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from ..errors import ModelRuntimeError
from ._quant import dequantize as _dq


class _Enc(NamedTuple):
    """Per-request encoder state: memory + precomputed cross K/V per
    decoder block (and the source-position validity mask for ragged
    batches, or None)."""

    memory: object    # [b, s, dim]
    ck: tuple         # per decoder block: [b, h, s, hd]
    cv: tuple         # per decoder block: [b, h, s, hd]
    kv_mask: object = None  # [b, s] bool, True = real source position


class Seq2SeqServer:
    """Incremental decoder over a trained :func:`tiny_seq2seq`'s weights
    (any encoder/decoder depth — blocks discovered by name prefix)."""

    _TOP = ["src.embed", "src.pos", "tgt.embed", "tgt.pos",
            "head.rms.g", "head.weights", "head.bias"]
    _ENC_KEYS = ["att.rms.g", "att.wq", "att.wk", "att.wv", "att.wo",
                 "ffn.rms.g", "ffn1.weights", "ffn1.bias",
                 "ffn2.weights", "ffn2.bias"]
    _DEC_KEYS = ["self.rms.g", "self.wq", "self.wk", "self.wv", "self.wo",
                 "cross.rms.g", "cross.wq", "cross.wk", "cross.wv",
                 "cross.wo",
                 "ffn.rms.g", "ffn1.weights", "ffn1.bias",
                 "ffn2.weights", "ffn2.bias"]

    def __init__(self, model, cache_dtype=None, eps: float = 1e-5,
                 weight_dtype=None, mesh=None):
        import jax.numpy as jnp

        self._jnp = jnp
        self.eps = eps
        self.cache_dtype = cache_dtype or jnp.float32
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
        by_name: dict = {}
        for tid in model.program.params:
            name = model.program.tensors[tid].name
            if name in by_name:
                raise ModelRuntimeError(
                    f"duplicate parameter name {name!r}; Seq2SeqServer "
                    "serves tiny_seq2seq models (unique prefixed names)"
                )
            by_name[name] = jnp.asarray(np.asarray(model.params[tid]))

        def block_list(prefix_fmt: str, keys) -> list:
            blocks = []
            b = 0
            while f"{prefix_fmt.format(b)}{keys[0]}" in by_name:
                pre = prefix_fmt.format(b)
                missing = [k for k in keys if pre + k not in by_name]
                if missing:
                    raise ModelRuntimeError(
                        f"block {pre!r} is missing {missing[:3]}; "
                        "Seq2SeqServer serves models built by tiny_seq2seq"
                    )
                blocks.append({k: by_name.pop(pre + k) for k in keys})
                b += 1
            return blocks

        missing_top = [n for n in self._TOP if n not in by_name]
        if missing_top:
            raise ModelRuntimeError(
                f"missing parameters {missing_top[:4]}...; Seq2SeqServer "
                "serves models built by tiny_seq2seq (name-prefixed "
                "parameters)"
            )
        self.enc = block_list("enc{}.", self._ENC_KEYS)
        self.dec = block_list("dec{}.", self._DEC_KEYS)
        self.p = {n: by_name.pop(n) for n in self._TOP}
        if not self.enc or not self.dec:
            raise ModelRuntimeError(
                "Seq2SeqServer needs at least one encoder and one "
                "decoder block (enc0./dec0. prefixed parameters)"
            )
        if by_name:
            raise ModelRuntimeError(
                f"{len(by_name)} unconsumed parameters "
                f"({sorted(by_name)[:3]}...); not a tiny_seq2seq"
            )

        self.vocab, self.dim = self.p["src.embed"].shape
        self.max_src = self.p["src.pos"].shape[0]
        self.max_tgt = self.p["tgt.pos"].shape[0]
        self.heads, _, self.head_dim = self.dec[0]["self.wq"].shape
        for blk in self.dec:
            if blk["cross.wk"].shape[0] != self.heads:
                raise ModelRuntimeError(
                    "grouped-query cross-attention is not supported by "
                    "this server (kv_heads must equal heads)"
                )
        from ..utils.buckets import JitCache

        self.scale = 1.0 / float(np.sqrt(self.head_dim))
        self._jit_cache = JitCache()

        if weight_dtype is not None:
            from ..quant import check_weight_dtype
            from ._quant import quantize_weight as q

            check_weight_dtype(weight_dtype)

            # contraction axes match the einsums below; embeddings,
            # positions, biases, and rms gammas stay full precision
            axes = {"wq": 1, "wk": 1, "wv": 1, "wo": (0, 1)}
            for blk in self.enc + self.dec:
                for key in list(blk):
                    tail = key.rsplit(".", 1)[-1]
                    if tail in axes:
                        blk[key] = q(blk[key], axes[tail])
                    elif key in ("ffn1.weights", "ffn2.weights"):
                        blk[key] = q(blk[key], 0)
            self.p["head.weights"] = q(self.p["head.weights"], 0)

        if mesh is not None:
            self._shard_weights()

    def _shard_weights(self) -> None:
        """Megatron-style tensor parallelism for encoder-decoder serving
        (same recipe as FlashLMServer): attention by head, FFN by hidden
        column/row, LM head by vocab; embeddings/norms/biases replicated;
        batches and caches shard over ``data`` (init_caches)."""
        from ._mesh import place

        axes = {
            "wq": ("model", None, None), "wk": ("model", None, None),
            "wv": ("model", None, None), "wo": ("model", None, None),
            "ffn1.weights": (None, "model"), "ffn1.bias": ("model",),
            "ffn2.weights": ("model", None), "ffn2.bias": (None,),
        }
        for blk in self.enc + self.dec:
            for key in list(blk):
                tail = key.rsplit(".", 1)[-1]
                spec = axes.get(key) or axes.get(tail)
                if spec is None:  # rms gammas
                    spec = (None,) * np.ndim(blk[key])
                blk[key] = place(self.mesh, blk[key], spec)
        for name in self._TOP:
            if name == "head.weights":
                spec = (None, "model")
            elif name == "head.bias":
                spec = ("model",)
            else:
                spec = (None,) * np.ndim(self.p[name])
            self.p[name] = place(self.mesh, self.p[name], spec)

    def _tokens(self, x):
        """Entry placement: shard request batches over ``data``."""
        x = self._jnp.asarray(x)
        if self.mesh is not None and x.ndim >= 1:
            from ._mesh import place

            return place(self.mesh, x,
                         ("data",) + (None,) * (x.ndim - 1))
        return x

    # -- forward pieces (must mirror models/seq2seq.py exactly) ----------
    def _rms(self, x, gamma):
        jnp = self._jnp
        ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        return x / jnp.sqrt(ms + self.eps) * gamma

    def _full_attention(self, q, k, v, causal: bool, kv_mask=None):
        """Plain softmax attention [b,h,t,d]x[b,h,s,d] — the encoder's
        bidirectional core and the decoder's cross core (f32 math, max-
        subtracted softmax: matches ops/externs._jax_xla_forward).
        ``kv_mask`` [b, s] masks padded key positions (ragged sources)."""
        jnp = self._jnp
        s = jnp.einsum("nhtd,nhsd->nhts", q, k,
                       preferred_element_type=jnp.float32) * self.scale
        if causal:
            import jax

            t_, s_ = s.shape[-2], s.shape[-1]
            rows = jax.lax.broadcasted_iota(jnp.int32, (t_, s_), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (t_, s_), 1)
            s = jnp.where(rows >= cols, s, -1e30)
        if kv_mask is not None:
            s = jnp.where(kv_mask[:, None, None, :], s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        return jnp.einsum("nhts,nhsd->nhtd", p, v,
                          preferred_element_type=jnp.float32)

    def encode(self, src, lengths=None):
        """Run the encoder once; precompute the cross-attention K/V.
        Returns an ``_Enc`` usable for any number of decode steps.

        ``lengths`` ([batch] ints) serves a RAGGED batch of sources
        right-padded to a common width: padded key positions are masked
        out of the encoder's bidirectional attention AND of every later
        cross-attention read, so results match encoding each source
        alone at its true length."""
        jnp = self._jnp
        p = self.p
        ids = self._tokens(src).astype(jnp.int32)
        s_len = ids.shape[1]
        kv_mask = None
        if lengths is not None:
            lens = jnp.asarray(lengths, jnp.int32)
            kv_mask = (
                jnp.arange(s_len, dtype=jnp.int32)[None, :] < lens[:, None]
            )
        e = p["src.embed"][ids] + p["src.pos"][:s_len][None]
        for blk in self.enc:
            rn = self._rms(e, blk["att.rms.g"])
            q = jnp.einsum("ntc,hcd->nhtd", rn, _dq(blk["att.wq"]))
            k = jnp.einsum("ntc,hcd->nhtd", rn, _dq(blk["att.wk"]))
            v = jnp.einsum("ntc,hcd->nhtd", rn, _dq(blk["att.wv"]))
            att = self._full_attention(q, k, v, causal=False,
                                       kv_mask=kv_mask)
            e = e + jnp.einsum("nhtd,hde->nte", att, _dq(blk["att.wo"]))
            rn2 = self._rms(e, blk["ffn.rms.g"])
            h = jnp.maximum(
                rn2 @ _dq(blk["ffn1.weights"]) + blk["ffn1.bias"], 0.0
            )
            e = e + h @ _dq(blk["ffn2.weights"]) + blk["ffn2.bias"]
        enc = e
        # cross K/V: computed ONCE per request per decoder block
        # (context = raw encoder output, mirroring
        # multi_head_cross_attention(x_norm, enc, ...))
        ck = tuple(
            jnp.einsum("nsc,hcd->nhsd", enc, _dq(blk["cross.wk"]))
            for blk in self.dec
        )
        cv = tuple(
            jnp.einsum("nsc,hcd->nhsd", enc, _dq(blk["cross.wv"]))
            for blk in self.dec
        )
        return _Enc(enc, ck, cv, kv_mask)

    def init_caches(self, batch: int, capacity: Optional[int] = None):
        from ..ops.decode import init_cache

        capacity = capacity or self.max_tgt
        caches = [init_cache(batch, self.heads, capacity, self.head_dim,
                             dtype=self.cache_dtype)
                  for _ in self.dec]
        if self.mesh is not None:
            from ._mesh import place

            caches = [
                c._replace(
                    k=place(self.mesh, c.k, ("data", "model", None, None)),
                    v=place(self.mesh, c.v, ("data", "model", None, None)),
                    k_scale=place(self.mesh, c.k_scale,
                                  ("data", "model", None)),
                    v_scale=place(self.mesh, c.v_scale,
                                  ("data", "model", None)),
                )
                for c in caches
            ]
        return caches

    def _step(self, tokens, enc: _Enc, caches, q_pos=None, key_pos=None,
              row_starts=None):
        """Forward ``t`` fresh target tokens; returns (logits, caches).
        ``q_pos``/``key_pos``/``row_starts`` activate PER-ROW cursor
        semantics (positions, validity masking, per-row K/V writes) for
        the continuous batcher, exactly as on FlashLMServer._step."""
        from ..ops.decode import append, append_at, decode_attention

        jnp = self._jnp
        p = self.p
        ids = jnp.asarray(tokens).astype(jnp.int32)
        t = ids.shape[1]
        if q_pos is None:
            pos = caches[0].length + jnp.arange(t, dtype=jnp.int32)
            x = p["tgt.embed"][ids] + p["tgt.pos"][pos][None]
        else:
            x = p["tgt.embed"][ids] + p["tgt.pos"][
                q_pos.astype(jnp.int32)]

        new_caches = []
        for blk, cache, ck, cv in zip(self.dec, caches, enc.ck, enc.cv):
            # causal self-attention through the KV cache
            rn = self._rms(x, blk["self.rms.g"])
            q = jnp.einsum("ntc,hcd->nhtd", rn, _dq(blk["self.wq"]))
            k = jnp.einsum("ntc,hcd->nhtd", rn, _dq(blk["self.wk"]))
            v = jnp.einsum("ntc,hcd->nhtd", rn, _dq(blk["self.wv"]))
            if row_starts is None:
                cache = append(cache, k, v)
            else:
                cache = append_at(cache, k, v, row_starts)
            att = decode_attention(q, cache, sm_scale=self.scale,
                                   key_pos=key_pos, q_pos=q_pos)
            x = x + jnp.einsum("nhtd,hde->nte", att, _dq(blk["self.wo"]))

            # cross-attention against the precomputed encoder K/V
            rn = self._rms(x, blk["cross.rms.g"])
            qc = jnp.einsum("ntc,hcd->nhtd", rn, _dq(blk["cross.wq"]))
            ca = self._full_attention(qc, ck, cv, causal=False,
                                      kv_mask=enc.kv_mask)
            x = x + jnp.einsum("nhtd,hde->nte", ca, _dq(blk["cross.wo"]))

            rn = self._rms(x, blk["ffn.rms.g"])
            h = jnp.maximum(
                rn @ _dq(blk["ffn1.weights"]) + blk["ffn1.bias"], 0.0
            )
            x = x + h @ _dq(blk["ffn2.weights"]) + blk["ffn2.bias"]
            new_caches.append(cache)
        logits = (self._rms(x, p["head.rms.g"]) @ _dq(p["head.weights"])
                  + p["head.bias"])
        return logits, new_caches

    def prefill(self, tokens, enc: _Enc, caches):
        """Run a whole target prefix, filling the self-attention cache."""
        return self._step(tokens, enc, caches)

    def _jitted(self, key, build):
        """Bounded per-config jit cache (utils.buckets.JitCache)."""
        return self._jit_cache.get(key, build)

    def generate(self, src, n_new: int, bos: int = 0,
                 temperature: float = 0.0, seed: int = 0,
                 stop_token: Optional[int] = None, lengths=None,
                 top_k: Optional[int] = None, top_p: Optional[float] = None):
        """Encode ``src`` [batch, s] once, then generate ``n_new`` target
        tokens with O(1)-per-token decoding (one ``lax.scan`` program).
        ``temperature > 0`` samples — restricted to the ``top_k`` most
        likely tokens and/or the smallest ``top_p`` nucleus when given
        (the same filters, same implementation, as FlashLMServer);
        0 is greedy.  ``stop_token`` freezes
        a sequence once it emits that token (the scan still runs the
        fixed ``n_new`` steps — static shapes — finished rows carry the
        stop token forward).  ``lengths`` ([batch] ints) serves a RAGGED
        batch of right-padded sources: padded positions are masked out of
        encoder and cross attention, so greedy output matches serving
        each source alone.  Returns [batch, n_new] int32 ids."""
        import jax

        from ._sample import check_top_p, make_picker

        jnp = self._jnp
        src = self._tokens(src)
        batch, s_len = src.shape
        if n_new + 1 > self.max_tgt:
            raise ModelRuntimeError(
                f"n_new + 1 = {n_new + 1} exceeds max_tgt {self.max_tgt} "
                "positional embeddings"
            )
        if s_len > self.max_src:
            raise ModelRuntimeError(
                f"source length {s_len} exceeds max_src {self.max_src}"
            )
        self._check_lengths(lengths, batch, s_len)
        check_top_p(top_p)
        greedy = temperature <= 0.0
        ragged = lengths is not None
        key = ("gen", batch, s_len, n_new, greedy,
               float(temperature), stop_token, bos, ragged, top_k, top_p)
        picker = make_picker(self.vocab, temperature, top_k, top_p)

        def build():
            def run(src, rng_key, lens):
                enc = self.encode(src, lengths=lens)
                caches = self.init_caches(batch, capacity=n_new + 1)
                tok = jnp.full((batch, 1), bos, jnp.int32)

                def pick(logits, k):
                    return picker(logits[:, -1], k).astype(jnp.int32)

                def body(carry, k):
                    tok, caches, done = carry
                    logits, caches = self._step(tok, enc, caches)
                    nxt = pick(logits, k)
                    if stop_token is not None:
                        stop = jnp.int32(stop_token)
                        nxt = jnp.where(done, stop, nxt)
                        done = jnp.logical_or(done, nxt == stop)
                    return (nxt[:, None], caches, done), nxt

                keys = jax.random.split(rng_key, n_new)
                done0 = jnp.zeros((batch,), bool)
                (_, _, _), toks = jax.lax.scan(
                    body, (tok, caches, done0), keys
                )
                return toks.T  # [batch, n_new]

            return run

        fn = self._jitted(key, build)
        lens_arg = (
            jnp.asarray(lengths, jnp.int32) if ragged else None
        )
        return fn(src, jax.random.PRNGKey(seed), lens_arg)

    def _check_lengths(self, lengths, batch: int, s_len: int) -> None:
        if lengths is None:
            return
        lens_np = np.asarray(lengths, np.int64)
        if lens_np.shape != (batch,):
            raise ModelRuntimeError(
                f"lengths must have shape ({batch},), got {lens_np.shape}"
            )
        if lens_np.min() < 1 or lens_np.max() > s_len:
            raise ModelRuntimeError(
                f"lengths must lie in [1, source width {s_len}]"
            )

    def generate_beam(self, src, n_new: int, beams: int = 4, bos: int = 0,
                      stop_token: Optional[int] = None, lengths=None):
        """Beam-search decoding from an encoded source.

        Returns ``(tokens [batch, beams, n_new], scores [batch, beams])``
        best-first; scores are cumulative token log-probabilities.  Same
        machinery as FlashLMServer.generate_beam: each step expands every
        live beam over the vocabulary, keeps the top ``beams`` of
        ``beams * vocab`` candidates, and reorders the decoder KV caches
        by gathering parent rows — the encoder memory and cross K/V are
        replicated per beam once and never change.  ``lengths`` masks
        ragged right-padded sources (see :meth:`generate`)."""
        import jax

        jnp = self._jnp
        src = self._tokens(src)
        batch, s_len = src.shape
        V = self.vocab
        if not 1 <= beams <= V:
            raise ModelRuntimeError(
                f"beams must be in [1, vocab={V}] (got {beams})"
            )
        if n_new < 1:
            raise ModelRuntimeError(f"n_new must be >= 1 (got {n_new})")
        self._check_lengths(lengths, batch, s_len)
        if n_new + 1 > self.max_tgt:
            raise ModelRuntimeError(
                f"n_new + 1 = {n_new + 1} exceeds max_tgt {self.max_tgt}"
            )
        if s_len > self.max_src:
            raise ModelRuntimeError(
                f"source length {s_len} exceeds max_src {self.max_src}"
            )
        ragged = lengths is not None
        key = ("beam", batch, s_len, n_new, beams, bos, stop_token,
               ragged)

        def build():
          def run(src, lens):
            enc = self.encode(src, lengths=lens)
            caches = self.init_caches(batch, capacity=n_new + 1)
            tok = jnp.full((batch, 1), bos, jnp.int32)
            logits, caches = self._step(tok, enc, caches)
            logp0 = jax.nn.log_softmax(
                logits[:, -1].astype(jnp.float32), axis=-1
            )                                              # [batch, V]
            import jax.tree_util as jtu

            from ._beam import beam_search_loop, replicate_caches

            enc_rep = jtu.tree_map(
                lambda x: jnp.repeat(x, beams, axis=0), enc
            )
            caches = replicate_caches(caches, beams)

            def step(tokens, caches):
                return self._step(tokens, enc_rep, caches)

            return beam_search_loop(step, caches, logp0, n_new, beams,
                                    V, stop_token)

          return run

        lens_arg = jnp.asarray(lengths, jnp.int32) if ragged else None
        return self._jitted(key, build)(src, lens_arg)

    def generate_speculative(self, draft: "Seq2SeqServer", src,
                             n_new: int, k: int = 4, bos: int = 0,
                             temperature: float = 0.0, seed: int = 0,
                             lengths=None):
        """Speculative decoding for encoder-decoder models: BOTH servers
        encode the source once (each with its own encoder), then the
        draft proposes ``k`` target tokens per round and this model
        verifies them in one ``k``-wide cached step (models/_spec.py:
        greedy = exact target-greedy output for any draft; temperature
        sampling = exact rejection scheme).  Returns
        ``(tokens [1, n_new] int32, target_steps)``."""
        import jax

        from ._spec import check_spec_args, speculative_loop

        jnp = self._jnp
        src = self._tokens(src)
        batch, s_len = src.shape
        check_spec_args(batch, self.vocab, draft.vocab, k, n_new,
                        ModelRuntimeError)
        self._check_lengths(lengths, batch, s_len)
        need = n_new + k
        if need + 1 > self.max_tgt or need + 1 > draft.max_tgt:
            raise ModelRuntimeError(
                f"n_new + k + 1 = {need + 1} exceeds max_tgt "
                f"(target {self.max_tgt}, draft {draft.max_tgt})"
            )
        if s_len > self.max_src or s_len > draft.max_src:
            raise ModelRuntimeError(
                f"source length {s_len} exceeds max_src "
                f"(target {self.max_src}, draft {draft.max_src})"
            )
        sampled = temperature > 0.0
        T = float(temperature) if sampled else 1.0
        ragged = lengths is not None
        key = ("spec", batch, s_len, n_new, k, bos, draft, sampled,
               float(temperature), ragged)

        def build():
          def run(src, key0, lens):
            enc_t = self.encode(src, lengths=lens)
            enc_d = draft.encode(src, lengths=lens)
            tc = self.init_caches(1, capacity=need + 1)
            dc = draft.init_caches(1, capacity=need + 1)
            tok = jnp.full((1, 1), bos, jnp.int32)
            logits_t, tc = self._step(tok, enc_t, tc)
            _, dc = draft._step(tok, enc_d, dc)
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
                draft_step=lambda toks, st: draft._step(toks, enc_d, st),
                target_step=lambda toks, st: self._step(toks, enc_t, st),
                rewind=lambda st, ln: [c._replace(length=ln) for c in st],
                length_of=lambda st: st[0].length,
                dstate=dc, tstate=tc, first=first,
                n_new=n_new, k=k, temperature=temperature, key0=key0,
            )

          return run

        lens_arg = jnp.asarray(lengths, jnp.int32) if ragged else None
        return self._jitted(key, build)(src, jax.random.PRNGKey(seed),
                                        lens_arg)

    def score(self, src, tgt):
        """Teacher-forced negative log-likelihood per sequence.

        ``tgt`` [batch, t] are the reference target tokens; the model
        scores token ``tgt[:, i]`` given BOS + ``tgt[:, :i]`` (BOS = 0,
        matching :meth:`generate`).  Returns ([batch] total NLL,
        [batch] mean NLL per token) from ONE prefill pass — perplexity =
        ``exp(mean_nll)``."""
        import jax

        jnp = self._jnp
        src = self._tokens(src)
        tgt = self._tokens(tgt)
        batch, t = tgt.shape
        if t + 1 > self.max_tgt:
            raise ModelRuntimeError(
                f"t + 1 = {t + 1} exceeds max_tgt {self.max_tgt}"
            )
        if src.shape[1] > self.max_src:
            raise ModelRuntimeError(
                f"source length {src.shape[1]} exceeds max_src "
                f"{self.max_src}"
            )
        key = ("score", batch, int(src.shape[1]), t)

        def build():
            def run(src, tgt):
                enc = self.encode(src)
                caches = self.init_caches(batch, capacity=t + 1)
                ids = tgt.astype(jnp.int32)
                prefix = jnp.concatenate(
                    [jnp.zeros((batch, 1), jnp.int32), ids[:, :-1]], axis=1
                )
                logits, _ = self._step(prefix, enc, caches)
                logp = jax.nn.log_softmax(logits, axis=-1)
                tok_lp = jnp.take_along_axis(
                    logp, ids[:, :, None], axis=-1
                )[..., 0]
                nll = -jnp.sum(tok_lp, axis=-1)
                return nll, nll / t

            return run

        return self._jitted(key, build)(src, tgt)
