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
