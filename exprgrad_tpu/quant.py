"""Weight-only int8 quantization (W8A16), integrated with the IR.

Two layers:

* the mechanics — :class:`QuantW` (int8 codes + f32 scales, a jit-able
  pytree), :func:`quantize_weight`, :func:`dequantize`.  Symmetric
  per-output-channel scales with the exact elementwise bound
  ``|w - deq(q(w))| <= scale / 2``; at use the convert+scale fuses into
  the consuming dot, so weights live in HBM at 1/4 the f32 bytes.

* the compiler integration — :func:`infer_quant_axes` reads a
  parameter's role straight off the kernel IR: a read axis whose
  iterators all appear in the kernel's write index is an *output
  channel* (keeps its own scale); an axis indexed by a reduction
  iterator is *contracted* (folded into the scale's max).  Raw,
  computed-index (gather-style), or extern-consumed reads decline, so
  embeddings and custom kernels are left at full precision
  automatically.  This is what lets ``Model.quantize_weights()`` work
  on ANY compiled DSL program — dense, conv, attention — without the
  user naming which axes are contractions.

(The reference has no quantization; this is TPU-production surface
beyond parity.  The serving runtimes reuse these helpers via
``models/_quant.py``.)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Union


class QuantW(NamedTuple):
    """int8 codes + f32 per-output-channel scales (a jit-able pytree)."""

    codes: object  # int8, same shape as the original weight
    scale: object  # f32, keepdims-reduced over the contraction axes


def check_weight_dtype(dtype) -> None:
    """The one place the supported weight dtypes are defined (shared by
    both servers and Model.quantize_weights)."""
    import numpy as np

    if np.dtype(dtype) != np.dtype(np.int8):
        from .errors import ModelRuntimeError

        raise ModelRuntimeError(
            f"unsupported weight dtype {dtype!r} (int8 weight-only "
            "quantization is supported)"
        )


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


def infer_quant_axes(
    program, tid: int, target_name: str
) -> Optional[tuple[int, ...]]:
    """Contraction axes of parameter ``tid`` in ``target_name``'s kernels.

    Returns the sorted tuple of axes that are summed over (per-channel
    scales go on every other axis), or ``None`` when per-channel
    quantization is not safely inferable:

    * the parameter is never read in this target, or only ever read
      elementwise (no contraction — quantizing it saves no matmul
      bandwidth, e.g. biases, norm gammas);
    * a read is raw (flat ``{i}`` access) or uses computed indices
      (gather-style, e.g. embedding lookups);
    * an extern kernel consumes it opaquely.

    The decision is purely structural (reference passes.nim derives
    gradients from the same read/write index structure): an axis whose
    index registers all appear in the kernel's write index enumerates
    output channels; an axis indexed by any reduction iterator is
    contracted.  Axes are unioned over all reads in the target, so a
    parameter read in several kernels gets scales valid for all of them.
    """
    target = program.targets[target_name]
    contract: set[int] = set()
    seen = False
    for kernel in target.kernels:
        if kernel.extern is not None and tid in kernel.extern.inputs:
            return None
        loop_regs = {loop.iter_reg for loop in kernel.loops}
        write_regs: set[int] = set()
        if kernel.write is not None:
            for d in kernel.write.dims:
                write_regs |= set(d.factors)
        for read in kernel.reads:
            if read.tensor != tid:
                continue
            seen = True
            if read.is_raw:
                return None
            for axis, d in enumerate(read.dims):
                regs = set(d.factors)
                if d.setup or not regs <= loop_regs:
                    return None  # computed index — a gather, not a matmul
                if not regs <= write_regs:
                    contract.add(axis)
    if not seen or not contract:
        return None
    return tuple(sorted(contract))
