"""Weight-only int8 quantization for the serving runtimes (W8A16).

Symmetric per-output-channel quantization: for each weight matrix the
absolute maximum over its *contraction* axes picks one f32 scale per
output channel, and the codes are ``round(w / scale)`` clipped to
[-127, 127].  At serve time the codes are cast to the compute dtype and
multiplied by the scale right before the matmul — XLA fuses the
convert+multiply into the dot's operand read, so the weights live in
HBM at 1/4 the f32 footprint (1/2 of bf16) and decode, which is
weight-bandwidth-bound, reads a quarter of the bytes.

The error bound is exact: ``|w - deq(q(w))| <= scale / 2`` elementwise.
Complements the int8 KV cache (ops/decode.py) — together they quantize
both HBM-resident serving states.  (The reference has no serving or
quantization at all; this is TPU-production surface beyond parity.)
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Union


class QuantW(NamedTuple):
    """int8 codes + f32 per-output-channel scales (a jit-able pytree)."""

    codes: object  # int8, same shape as the original weight
    scale: object  # f32, keepdims-reduced over the contraction axes


def quantize_weight(w, contract_axes: Union[int, Sequence[int]]) -> QuantW:
    """Symmetric int8 quantization with one scale per output channel.

    ``contract_axes`` are the weight axes that the matmul/einsum sums
    over (every other axis indexes an output channel and keeps its own
    scale).
    """
    import jax.numpy as jnp

    if isinstance(contract_axes, int):
        contract_axes = (contract_axes,)
    w = jnp.asarray(w)
    amax = jnp.max(jnp.abs(w), axis=tuple(contract_axes), keepdims=True)
    scale = jnp.maximum(amax, 1e-30) / 127.0
    codes = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QuantW(codes, scale.astype(jnp.float32))


def dequantize(w, dtype=None):
    """Inverse of :func:`quantize_weight`; plain arrays pass through.

    Called inside the jitted forward — the convert+scale fuses into the
    consuming dot.
    """
    import jax.numpy as jnp

    if isinstance(w, QuantW):
        dtype = dtype or jnp.float32
        return w.codes.astype(dtype) * w.scale.astype(dtype)
    return w if dtype is None else jnp.asarray(w).astype(dtype)
