"""Standalone TPU ops: hand-scheduled Pallas kernels usable directly on
jax arrays (and used by the compiler's schedule-driven emitter)."""

from .attention import flash_attention
from .matmul import pallas_matmul

__all__ = ["flash_attention", "pallas_matmul"]
