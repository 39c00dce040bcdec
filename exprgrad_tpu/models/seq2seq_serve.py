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
parameter of :func:`tiny_seq2seq` carries a unique prefixed name
("enc.att.wq", "dec.cross.wk", ...) because the DSL graph interleaves
encoder and decoder registration order (the encoder subgraph only
registers when cross-attention first references it).

Parity is tested (tests/test_seq2seq_serve.py): prefill logits match the
"predict" target and greedy generation matches ``greedy_decode`` token
for token.  The reference has no serving runtime at all; this follows
the repo's own FlashLMServer contract (models/serve.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from ..errors import ModelRuntimeError


class _Enc(NamedTuple):
    """Per-request encoder state: memory + precomputed cross K/V (and the
    source-position validity mask for ragged batches, or None)."""

    memory: object    # [b, s, dim]
    ck: object        # [b, h, s, hd]
    cv: object        # [b, h, s, hd]
    kv_mask: object = None  # [b, s] bool, True = real source position


class Seq2SeqServer:
    """Incremental decoder over a trained :func:`tiny_seq2seq`'s weights."""

    _NAMES = [
        "src.embed", "src.pos",
        "enc.att.rms.g", "enc.att.wq", "enc.att.wk", "enc.att.wv",
        "enc.att.wo",
        "enc.ffn.rms.g", "enc.ffn1.weights", "enc.ffn1.bias",
        "enc.ffn2.weights", "enc.ffn2.bias",
        "tgt.embed", "tgt.pos",
        "dec.self.rms.g", "dec.self.wq", "dec.self.wk", "dec.self.wv",
        "dec.self.wo",
        "dec.cross.rms.g", "dec.cross.wq", "dec.cross.wk", "dec.cross.wv",
        "dec.cross.wo",
        "dec.ffn.rms.g", "dec.ffn1.weights", "dec.ffn1.bias",
        "dec.ffn2.weights", "dec.ffn2.bias",
        "head.rms.g", "head.weights", "head.bias",
    ]

    def __init__(self, model, cache_dtype=None, eps: float = 1e-5):
        import jax.numpy as jnp

        self._jnp = jnp
        self.eps = eps
        self.cache_dtype = cache_dtype or jnp.float32

        by_name: dict = {}
        for tid in model.program.params:
            name = model.program.tensors[tid].name
            if name in by_name:
                raise ModelRuntimeError(
                    f"duplicate parameter name {name!r}; Seq2SeqServer "
                    "serves single-block tiny_seq2seq models (unique "
                    "prefixed names)"
                )
            by_name[name] = jnp.asarray(np.asarray(model.params[tid]))
        missing = [n for n in self._NAMES if n not in by_name]
        if missing:
            raise ModelRuntimeError(
                f"missing parameters {missing[:4]}...; Seq2SeqServer "
                "serves models built by tiny_seq2seq (name-prefixed "
                "parameters)"
            )
        self.p = {n: by_name[n] for n in self._NAMES}

        self.vocab, self.dim = self.p["src.embed"].shape
        self.max_src = self.p["src.pos"].shape[0]
        self.max_tgt = self.p["tgt.pos"].shape[0]
        self.heads, _, self.head_dim = self.p["dec.self.wq"].shape
        if self.p["dec.cross.wk"].shape[0] != self.heads:
            raise ModelRuntimeError(
                "grouped-query cross-attention is not supported by this "
                "server (kv_heads must equal heads)"
            )
        from ..utils.buckets import JitCache

        self.scale = 1.0 / float(np.sqrt(self.head_dim))
        self._jit_cache = JitCache()

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
        ids = jnp.asarray(src).astype(jnp.int32)
        s_len = ids.shape[1]
        kv_mask = None
        if lengths is not None:
            lens = jnp.asarray(lengths, jnp.int32)
            kv_mask = (
                jnp.arange(s_len, dtype=jnp.int32)[None, :] < lens[:, None]
            )
        e = p["src.embed"][ids] + p["src.pos"][:s_len][None]
        rn = self._rms(e, p["enc.att.rms.g"])
        q = jnp.einsum("ntc,hcd->nhtd", rn, p["enc.att.wq"])
        k = jnp.einsum("ntc,hcd->nhtd", rn, p["enc.att.wk"])
        v = jnp.einsum("ntc,hcd->nhtd", rn, p["enc.att.wv"])
        att = self._full_attention(q, k, v, causal=False, kv_mask=kv_mask)
        e = e + jnp.einsum("nhtd,hde->nte", att, p["enc.att.wo"])
        rn2 = self._rms(e, p["enc.ffn.rms.g"])
        h = jnp.maximum(rn2 @ p["enc.ffn1.weights"] + p["enc.ffn1.bias"],
                        0.0)
        enc = e + h @ p["enc.ffn2.weights"] + p["enc.ffn2.bias"]
        # cross K/V: computed ONCE per request (context = raw encoder
        # output, mirroring multi_head_cross_attention(x_norm, enc, ...))
        ck = jnp.einsum("nsc,hcd->nhsd", enc, p["dec.cross.wk"])
        cv = jnp.einsum("nsc,hcd->nhsd", enc, p["dec.cross.wv"])
        return _Enc(enc, ck, cv, kv_mask)

    def init_caches(self, batch: int, capacity: Optional[int] = None):
        from ..ops.decode import init_cache

        capacity = capacity or self.max_tgt
        return [init_cache(batch, self.heads, capacity, self.head_dim,
                           dtype=self.cache_dtype)]

    def _step(self, tokens, enc: _Enc, caches):
        """Forward ``t`` fresh target tokens; returns (logits, caches)."""
        from ..ops.decode import append, decode_attention

        jnp = self._jnp
        p = self.p
        ids = jnp.asarray(tokens).astype(jnp.int32)
        t = ids.shape[1]
        pos = caches[0].length + jnp.arange(t, dtype=jnp.int32)
        x = p["tgt.embed"][ids] + p["tgt.pos"][pos][None]

        # causal self-attention through the KV cache
        rn = self._rms(x, p["dec.self.rms.g"])
        q = jnp.einsum("ntc,hcd->nhtd", rn, p["dec.self.wq"])
        k = jnp.einsum("ntc,hcd->nhtd", rn, p["dec.self.wk"])
        v = jnp.einsum("ntc,hcd->nhtd", rn, p["dec.self.wv"])
        cache = append(caches[0], k, v)
        att = decode_attention(q, cache, sm_scale=self.scale)
        x = x + jnp.einsum("nhtd,hde->nte", att, p["dec.self.wo"])

        # cross-attention against the precomputed encoder K/V
        rn = self._rms(x, p["dec.cross.rms.g"])
        qc = jnp.einsum("ntc,hcd->nhtd", rn, p["dec.cross.wq"])
        ca = self._full_attention(qc, enc.ck, enc.cv, causal=False,
                                  kv_mask=enc.kv_mask)
        x = x + jnp.einsum("nhtd,hde->nte", ca, p["dec.cross.wo"])

        rn = self._rms(x, p["dec.ffn.rms.g"])
        h = jnp.maximum(rn @ p["dec.ffn1.weights"] + p["dec.ffn1.bias"],
                        0.0)
        x = x + h @ p["dec.ffn2.weights"] + p["dec.ffn2.bias"]
        logits = (self._rms(x, p["head.rms.g"]) @ p["head.weights"]
                  + p["head.bias"])
        return logits, [cache]

    def prefill(self, tokens, enc: _Enc, caches):
        """Run a whole target prefix, filling the self-attention cache."""
        return self._step(tokens, enc, caches)

    def _jitted(self, key, build):
        """Bounded per-config jit cache (utils.buckets.JitCache)."""
        return self._jit_cache.get(key, build)

    def generate(self, src, n_new: int, bos: int = 0,
                 temperature: float = 0.0, seed: int = 0,
                 stop_token: Optional[int] = None, lengths=None):
        """Encode ``src`` [batch, s] once, then generate ``n_new`` target
        tokens with O(1)-per-token decoding (one ``lax.scan`` program).
        ``temperature > 0`` samples; 0 is greedy.  ``stop_token`` freezes
        a sequence once it emits that token (the scan still runs the
        fixed ``n_new`` steps — static shapes — finished rows carry the
        stop token forward).  ``lengths`` ([batch] ints) serves a RAGGED
        batch of right-padded sources: padded positions are masked out of
        encoder and cross attention, so greedy output matches serving
        each source alone.  Returns [batch, n_new] int32 ids."""
        import jax

        jnp = self._jnp
        src = jnp.asarray(src)
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
        if lengths is not None:
            lens_np = np.asarray(lengths, np.int64)
            if lens_np.shape != (batch,):
                raise ModelRuntimeError(
                    f"lengths must have shape ({batch},), got "
                    f"{lens_np.shape}"
                )
            if lens_np.min() < 1 or lens_np.max() > s_len:
                raise ModelRuntimeError(
                    f"lengths must lie in [1, source width {s_len}]"
                )
        greedy = temperature <= 0.0
        ragged = lengths is not None
        key = ("gen", batch, s_len, n_new, greedy,
               float(temperature), stop_token, bos, ragged)

        def build():
            def run(src, rng_key, lens):
                enc = self.encode(src, lengths=lens)
                caches = self.init_caches(batch, capacity=n_new + 1)
                tok = jnp.full((batch, 1), bos, jnp.int32)

                def pick(logits, k):
                    last = logits[:, -1]
                    if greedy:
                        return jnp.argmax(last, axis=-1).astype(jnp.int32)
                    return jax.random.categorical(
                        k, last / temperature, axis=-1
                    ).astype(jnp.int32)

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
        src = jnp.asarray(src)
        batch, s_len = src.shape
        V = self.vocab
        if not 1 <= beams <= V:
            raise ModelRuntimeError(
                f"beams must be in [1, vocab={V}] (got {beams})"
            )
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
            from ..ops.decode import KVCache

            enc = self.encode(src, lengths=lens)
            caches = self.init_caches(batch, capacity=n_new + 1)
            tok = jnp.full((batch, 1), bos, jnp.int32)
            logits, caches = self._step(tok, enc, caches)
            logp0 = jax.nn.log_softmax(
                logits[:, -1].astype(jnp.float32), axis=-1
            )                                              # [batch, V]

            def rep(x, r):
                return None if x is None else jnp.repeat(x, r, axis=0)

            enc_rep = _Enc(
                rep(enc.memory, beams), rep(enc.ck, beams),
                rep(enc.cv, beams), rep(enc.kv_mask, beams),
            )
            caches = [
                KVCache(k=jnp.repeat(c.k, beams, axis=0),
                        v=jnp.repeat(c.v, beams, axis=0),
                        length=c.length)
                for c in caches
            ]

            scores, tok0 = jax.lax.top_k(logp0, beams)     # [batch, beams]
            tok = tok0.astype(jnp.int32)
            done = (
                tok == stop_token if stop_token is not None
                else jnp.zeros(tok.shape, bool)
            )

            def body(carry, _):
                tok, scores, done, caches = carry
                flat = tok.reshape(batch * beams)
                logits, caches = self._step(flat[:, None], enc_rep,
                                            caches)
                logp = jax.nn.log_softmax(
                    logits[:, 0].astype(jnp.float32), axis=-1
                ).reshape(batch, beams, V)
                if stop_token is not None:
                    frozen = jnp.full((V,), -jnp.inf, jnp.float32)
                    frozen = frozen.at[stop_token].set(0.0)
                    logp = jnp.where(done[:, :, None],
                                     frozen[None, None], logp)
                cand = scores[:, :, None] + logp           # [b, beams, V]
                scores, idx = jax.lax.top_k(
                    cand.reshape(batch, beams * V), beams
                )
                parent = idx // V
                tok = (idx % V).astype(jnp.int32)
                rows = (
                    jnp.arange(batch, dtype=jnp.int32)[:, None] * beams
                    + parent.astype(jnp.int32)
                ).reshape(-1)
                caches = [
                    KVCache(k=jnp.take(c.k, rows, axis=0),
                            v=jnp.take(c.v, rows, axis=0),
                            length=c.length)
                    for c in caches
                ]
                if stop_token is not None:
                    done = jnp.take_along_axis(done, parent, axis=1)
                    done = jnp.logical_or(done, tok == stop_token)
                return (tok, scores, done, caches), \
                    (tok, parent.astype(jnp.int32))

            (tok, scores, done, _), (toks, parents) = jax.lax.scan(
                body, (tok, scores, done, caches), None,
                length=n_new - 1,
            )

            def back(carry, step):
                beam_of = carry
                step_tok, step_parent = step
                toks_here = jnp.take_along_axis(step_tok, beam_of, axis=1)
                beam_of = jnp.take_along_axis(step_parent, beam_of,
                                              axis=1)
                return beam_of, toks_here

            beam_of = jnp.tile(
                jnp.arange(beams, dtype=jnp.int32)[None, :], (batch, 1)
            )
            beam_of, rev = jax.lax.scan(
                back, beam_of, (toks, parents), reverse=True
            )
            first = jnp.take_along_axis(tok0, beam_of, axis=1)
            seq = jnp.concatenate([first[None], rev], axis=0)
            return jnp.transpose(seq, (1, 2, 0)), scores

          return run

        lens_arg = jnp.asarray(lengths, jnp.int32) if ragged else None
        return self._jitted(key, build)(src, lens_arg)

    def score(self, src, tgt):
        """Teacher-forced negative log-likelihood per sequence.

        ``tgt`` [batch, t] are the reference target tokens; the model
        scores token ``tgt[:, i]`` given BOS + ``tgt[:, :i]`` (BOS = 0,
        matching :meth:`generate`).  Returns ([batch] total NLL,
        [batch] mean NLL per token) from ONE prefill pass — perplexity =
        ``exp(mean_nll)``."""
        import jax

        jnp = self._jnp
        src = jnp.asarray(src)
        tgt = jnp.asarray(tgt)
        batch, t = tgt.shape
        if t + 1 > self.max_tgt:
            raise ModelRuntimeError(
                f"t + 1 = {t + 1} exceeds max_tgt {self.max_tgt}"
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
