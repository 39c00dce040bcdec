"""Static Mosaic block-shape constraint checking (trace-time, no TPU).

The test suite runs Pallas kernels in interpret mode, which executes the
kernel body with numpy semantics and IGNORES the TPU (Mosaic) lowering
rules — so a BlockSpec that the real chip rejects can survive hundreds of
green tests (this happened: round 2's ``lse`` row spec ``(1, block_q)``
over a ``(b*h, sq)`` array broke every flash kernel on hardware while the
whole suite stayed green).

This module encodes the Mosaic constraint that bit us as a *static* check
run at trace time on every ``pallas_call`` the package constructs, so the
CPU suite fails exactly where the chip would:

    The Pallas TPU lowering currently requires that the last two
    dimensions of your block shape are divisible by 8 and 128
    respectively, or be equal to the respective dimensions of the
    overall array.

(Analog of the reference's compile-only golden GPU tests,
``tests/test_gpu.nim:21-34`` — validate device codegen without a device.)
"""

from __future__ import annotations

# Test hook: when True, pallas_interpret() reports False so AOT
# cross-platform lowering (jax.jit(f).trace(...).lower(
# lowering_platforms=("tpu",))) builds and VERIFIES the real Mosaic
# kernels on a chip-less host — the full-strength version of the static
# block checks below (tests/test_mosaic_aot.py).
REAL_LOWERING = False

# Scoped-VMEM cap shared by every package pallas_call (the emitter and
# the hand-written ops kernels): a conservative fraction of the v5e's
# 128MB VMEM, raised from Mosaic's 16MB default because block planners'
# estimates cannot model Mosaic's exact stack accounting (layout
# padding, intermediate copies) — r4's on-chip embedding scatter-add
# compiled to a 24MB working set off a <=14MB estimate.  Raising the
# cap makes estimator error degrade pipelining instead of killing
# compilation.  Retune HERE only.
VMEM_LIMIT_BYTES = 100 * 2**20


def pallas_interpret() -> bool:
    """Whether package pallas_calls should run in interpret mode."""
    if REAL_LOWERING:
        return False
    import jax

    return jax.default_backend() not in ("tpu", "axon")


from typing import Sequence, Tuple

# Mosaic's minimum tile for the last two dims (float32; stricter dtypes
# only raise the sublane requirement, so (8, 128) is the safe floor to
# *reject* on — a block legal under (8, 128) may still need padding for
# narrower dtypes, but a block illegal under it is illegal everywhere).
_SUBLANE = 8
_LANE = 128


class MosaicBlockError(ValueError):
    """A BlockSpec the TPU (Mosaic) lowering would reject."""


def check_block(block_shape: Sequence[int], array_shape: Sequence[int],
                *, what: str = "operand") -> None:
    """Raise MosaicBlockError if ``block_shape`` over ``array_shape``
    violates the last-two-dims rule (divisible by (8, 128) or equal to
    the respective overall array dims)."""
    block = tuple(int(b) for b in block_shape)
    arr = tuple(int(a) for a in array_shape)
    if len(block) != len(arr):
        raise MosaicBlockError(
            f"{what}: block rank {len(block)} != array rank {len(arr)} "
            f"({block} over {arr})"
        )
    if len(block) < 2:
        return  # rank-0/1 blocks follow different (scalar/SMEM) rules
    for offset, req in ((-2, _SUBLANE), (-1, _LANE)):
        b, a = block[offset], arr[offset]
        if b % req != 0 and b != a:
            raise MosaicBlockError(
                f"{what}: block shape {block} over array {arr} — dim "
                f"{offset} is {b}, which is neither divisible by {req} "
                f"nor equal to the array dim {a}; Mosaic's TPU lowering "
                f"rejects this block spec"
            )


def check_specs(
    specs: Sequence,
    shapes: Sequence[Tuple[int, ...]],
    *,
    kernel: str = "pallas kernel",
    kind: str = "operand",
) -> None:
    """Validate parallel lists of BlockSpecs and array shapes."""
    if len(specs) != len(shapes):
        raise MosaicBlockError(
            f"{kernel}: {len(specs)} {kind} specs for {len(shapes)} arrays"
        )
    for i, (spec, shape) in enumerate(zip(specs, shapes)):
        block = getattr(spec, "block_shape", None)
        if block is None:  # default spec: whole-array block, always legal
            continue
        check_block(block, shape, what=f"{kernel} {kind}[{i}]")
