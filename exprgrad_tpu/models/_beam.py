"""Shared beam-search machinery for the serving bridges.

One implementation of the per-step beam expansion (top ``beams`` of
``beams * vocab`` candidates), the parent-row KV-cache gather (carrying
int8 quantization scales through ``_replace``), stop-token freezing,
and the reverse parent-pointer backtrace — consumed by both
FlashLMServer.generate_beam and Seq2SeqServer.generate_beam through a
``step(flat_tokens, caches) -> (logits, caches)`` closure, so fixes to
this subtle logic apply to every server.
"""

from __future__ import annotations

from typing import Callable, Optional


def beam_search_loop(
    step: Callable,
    caches,
    logp0,
    n_new: int,
    beams: int,
    vocab: int,
    stop_token: Optional[int],
):
    """Run ``n_new - 1`` beam steps from the first-token distribution.

    ``caches`` must already be replicated per beam (batch-major
    ``[batch * beams, ...]`` rows); ``logp0`` [batch, V] is the log-prob
    of the FIRST generated position.  ``step(tokens [b*beams, 1],
    caches)`` returns per-token logits ``[b*beams, 1, V]`` (or
    ``[b*beams, t, V]``; position 0 is used) and the updated caches.

    Returns ``(tokens [batch, beams, n_new] int32, scores
    [batch, beams])`` best-first.
    """
    import jax
    import jax.numpy as jnp

    batch = logp0.shape[0]
    V = vocab

    scores, tok0 = jax.lax.top_k(logp0, beams)          # [batch, beams]
    tok = tok0.astype(jnp.int32)
    done = (
        tok == stop_token if stop_token is not None
        else jnp.zeros(tok.shape, bool)
    )

    def body(carry, _):
        tok, scores, done, caches = carry
        flat = tok.reshape(batch * beams)
        logits, caches = step(flat[:, None], caches)
        logp = jax.nn.log_softmax(
            logits[:, 0].astype(jnp.float32), axis=-1
        ).reshape(batch, beams, V)
        if stop_token is not None:
            # finished beams only extend with the stop token, at zero
            # additional score
            frozen = jnp.full((V,), -jnp.inf, jnp.float32)
            frozen = frozen.at[stop_token].set(0.0)
            logp = jnp.where(done[:, :, None], frozen[None, None], logp)
        cand = scores[:, :, None] + logp                # [b, beams, V]
        scores, idx = jax.lax.top_k(
            cand.reshape(batch, beams * V), beams
        )
        parent = idx // V
        tok = (idx % V).astype(jnp.int32)
        rows = (
            jnp.arange(batch, dtype=jnp.int32)[:, None] * beams
            + parent.astype(jnp.int32)
        ).reshape(-1)

        def take(x):
            return None if x is None else jnp.take(x, rows, axis=0)

        caches = [
            c._replace(k=take(c.k), v=take(c.v),
                       k_scale=take(c.k_scale), v_scale=take(c.v_scale))
            for c in caches
        ]
        if stop_token is not None:
            done = jnp.take_along_axis(done, parent, axis=1)
            done = jnp.logical_or(done, tok == stop_token)
        return (tok, scores, done, caches), (tok, parent.astype(jnp.int32))

    (tok, scores, done, _), (toks, parents) = jax.lax.scan(
        body, (tok, scores, done, caches), None, length=n_new - 1
    )

    # backtrack: walk parents from the last step to recover each final
    # beam's token path (first-step tokens included)
    def back(carry, stp):
        beam_of = carry
        step_tok, step_parent = stp
        toks_here = jnp.take_along_axis(step_tok, beam_of, axis=1)
        beam_of = jnp.take_along_axis(step_parent, beam_of, axis=1)
        return beam_of, toks_here

    beam_of = jnp.tile(
        jnp.arange(beams, dtype=jnp.int32)[None, :], (batch, 1)
    )
    beam_of, rev = jax.lax.scan(back, beam_of, (toks, parents),
                                reverse=True)
    first = jnp.take_along_axis(tok0, beam_of, axis=1).astype(jnp.int32)
    seq = jnp.concatenate([first[None], rev], axis=0)   # [n_new, b, beams]
    return jnp.transpose(seq, (1, 2, 0)), scores


def replicate_caches(caches, beams: int):
    """Repeat every cache row ``beams`` times (batch-major), carrying
    quantization scales."""
    import jax.numpy as jnp

    def rep(x):
        return None if x is None else jnp.repeat(x, beams, axis=0)

    return [
        c._replace(k=rep(c.k), v=rep(c.v),
                   k_scale=rep(c.k_scale), v_scale=rep(c.v_scale))
        for c in caches
    ]
