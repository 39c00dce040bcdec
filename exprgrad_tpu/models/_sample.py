"""Token selection shared by the serving runtimes.

One implementation of greedy argmax + temperature sampling with top-k /
top-p (nucleus) filtering, used by FlashLMServer.generate and the
continuous batcher so the filter semantics cannot drift apart.  (The
reference has no serving stack at all; this backs the runtime built on
top of its model surface.)
"""

from __future__ import annotations

from typing import Optional

from ..errors import ModelRuntimeError


def check_top_p(top_p: Optional[float]) -> None:
    if top_p is not None and not 0.0 < top_p <= 1.0:
        raise ModelRuntimeError(f"top_p must lie in (0, 1] (got {top_p})")


def make_row_picker(vocab: int):
    """Return ``pick(logits [b, vocab], key, temp [b], top_k [b],
    top_p [b]) -> token ids [b]`` with PER-ROW sampling parameters as
    traced values: one compiled program serves any mix of greedy
    (``temp <= 0``), plain temperature, top-k (``top_k >= vocab``
    disables), and nucleus (``top_p >= 1`` disables) rows — the
    continuous batcher's per-request knobs.  The filter math matches
    :func:`make_picker` exactly, so greedy rows are bit-equal to solo
    serving and sampled rows draw from the same distributions."""
    import jax
    import jax.numpy as jnp

    def pick(logits, key, temp, top_k, top_p):
        temp = temp.astype(jnp.float32)
        scale = jnp.where(temp > 0.0, temp, 1.0)[:, None]
        sl_in = logits.astype(jnp.float32) / scale
        greedy = jnp.argmax(sl_in, axis=-1)

        sl = jnp.sort(sl_in, axis=-1)[:, ::-1]  # one descending sort
        # top-k: threshold at the k-th logit where active
        kk = jnp.clip(top_k.astype(jnp.int32), 1, vocab)
        kth = jnp.take_along_axis(sl, kk[:, None] - 1, axis=1)
        k_on = (kk < vocab)[:, None]
        filt = jnp.where(k_on & (sl_in < kth), -jnp.inf, sl_in)
        sl = jnp.where(
            k_on & (jnp.arange(vocab)[None, :] >= kk[:, None]),
            -jnp.inf, sl)
        # nucleus over the survivors: smallest prefix reaching top_p
        probs = jax.nn.softmax(sl, axis=-1)
        pp = top_p.astype(jnp.float32)[:, None]
        keep = jnp.cumsum(probs, axis=-1) - probs < pp
        kth_p = jnp.min(jnp.where(keep, sl, jnp.inf), axis=-1,
                        keepdims=True)
        p_on = (pp < 1.0)
        filt = jnp.where(p_on & (filt < kth_p), -jnp.inf, filt)

        sampled = jax.random.categorical(key, filt, axis=-1)
        return jnp.where(temp > 0.0, sampled, greedy)

    return pick


def make_picker(vocab: int, temperature: float,
                top_k: Optional[int], top_p: Optional[float]):
    """Return ``pick(logits [b, vocab], key) -> token ids [b]``.

    ``temperature <= 0`` is greedy argmax.  Otherwise sample from
    ``softmax(logits / temperature)`` restricted to the ``top_k`` most
    likely tokens and/or the smallest nucleus reaching ``top_p`` mass
    (top_k filter first, then top_p over the survivors).
    """
    import jax
    import jax.numpy as jnp

    def pick(logits, key):
        if temperature <= 0.0:
            return jnp.argmax(logits, axis=-1)
        logits = logits / jnp.float32(temperature)
        need_sort = (top_k is not None and top_k < vocab) or (
            top_p is not None and top_p < 1.0
        )
        if need_sort:
            sl = jnp.sort(logits, axis=-1)[:, ::-1]  # one descending sort
        if top_k is not None and top_k < vocab:
            logits = jnp.where(
                logits >= sl[:, top_k - 1][:, None], logits, -jnp.inf
            )
            sl = jnp.where(
                jnp.arange(sl.shape[-1])[None, :] < top_k, sl, -jnp.inf
            )
        if top_p is not None and top_p < 1.0:
            # nucleus: keep the smallest descending-prob prefix with
            # cumulative mass >= top_p; the cutoff is the SMALLEST kept
            # logit (the top token always stays)
            probs = jax.nn.softmax(sl, axis=-1)
            keep = jnp.cumsum(probs, axis=-1) - probs < top_p
            kth = jnp.min(jnp.where(keep, sl, jnp.inf), axis=-1,
                          keepdims=True)
            logits = jnp.where(logits >= kth, logits, -jnp.inf)
        return jax.random.categorical(key, logits, axis=-1)

    return pick
