"""Standalone TPU ops: hand-scheduled Pallas kernels usable directly on
jax arrays (and used by the compiler's schedule-driven emitter)."""

from .matmul import pallas_matmul

__all__ = ["pallas_matmul"]
