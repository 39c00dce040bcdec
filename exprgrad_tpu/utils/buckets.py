"""Shared bucketing + jit-cache helpers for the serving/inference paths.

One implementation of the "pad to the next bucket" policy
(Model.set_batch_buckets, FlashLMServer.set_prompt_buckets) and of the
bounded per-config jit cache both servers use — bucket-selection or
eviction changes happen in exactly one place.
"""

from __future__ import annotations

from ..errors import ModelRuntimeError


def normalize_buckets(buckets, what: str = "bucket"):
    """Validate and normalize: a sorted list of positive ints, or the
    string "pow2" (round up to the next power of two)."""
    if buckets == "pow2":
        return "pow2"
    try:
        bl = sorted(int(b) for b in buckets)
    except (TypeError, ValueError):
        raise ModelRuntimeError(
            f"{what}s must be a non-empty list of positive sizes or "
            "'pow2'"
        ) from None
    if not bl or bl[0] < 1:
        raise ModelRuntimeError(
            f"{what}s must be a non-empty list of positive sizes or "
            "'pow2'"
        )
    return bl


def bucket_for(buckets, n: int) -> int:
    """Smallest bucket >= n; n itself beyond the largest bucket."""
    if buckets == "pow2":
        size = 1
        while size < n:
            size *= 2
        return size
    for size in buckets:
        if size >= n:
            return size
    return n


class JitCache:
    """Bounded FIFO of jit-compiled entry points keyed by static config.

    Serving loops sweeping a config (n_new, temperature, ...) must not
    pin one XLA executable per distinct value forever; shapes are handled
    by jax.jit's own cache INSIDE each entry."""

    def __init__(self, limit: int = 32) -> None:
        self._cache: dict = {}
        self._limit = limit

    def get(self, key, build, donate_argnums=None):
        fn = self._cache.get(key)
        if fn is None:
            import jax

            if len(self._cache) >= self._limit:
                self._cache.pop(next(iter(self._cache)))
            if donate_argnums is None:
                fn = jax.jit(build())
            else:
                # donation matters for serving caches: the KV buffers are
                # rewritten every step and must update in place
                fn = jax.jit(build(), donate_argnums=donate_argnums)
            self._cache[key] = fn
        return fn

    def __len__(self) -> int:
        return len(self._cache)

    def __iter__(self):
        return iter(self._cache)

    def values(self):
        return self._cache.values()

    def __contains__(self, key) -> bool:
        return key in self._cache
