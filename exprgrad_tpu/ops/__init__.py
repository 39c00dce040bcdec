"""Standalone TPU ops: hand-scheduled Pallas kernels usable directly on
jax arrays (and used by the compiler's schedule-driven emitter)."""

from .attention import (
    flash_attention,
    flash_attention_backward,
    flash_attention_forward,
)
from .decode import KVCache, append, decode_attention, init_cache
from .matmul import pallas_matmul
from .paged_attention import paged_decode_attention

__all__ = [
    "KVCache",
    "append",
    "decode_attention",
    "flash_attention",
    "flash_attention_backward",
    "flash_attention_forward",
    "init_cache",
    "paged_decode_attention",
    "pallas_matmul",
]
