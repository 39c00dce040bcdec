"""Tiled Pallas matmul for the MXU.

The classic 3-loop blocked matmul: a (m/bm, n/bn, k/bk) grid with the
reduction as the innermost ("arbitrary") grid dimension and a VMEM f32
accumulator; operand blocks are pipelined HBM->VMEM by the Pallas runtime
(double-buffered).  Block defaults favour the 128x128 MXU and the ~16MB
VMEM budget.  This is the direct-use analog of the reference's tiled16
OpenCL kernel (benchmarks/matmul/matmul_gpu.nim:48-66) rebuilt for TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mosaic_check import VMEM_LIMIT_BYTES, check_specs


def _matmul_impl(
    a: jax.Array,
    b: jax.Array,
    block_m: int = 512,
    block_n: int = 512,
    block_k: int = 512,
    out_dtype=None,
    interpret: bool | None = None,
    epilogue=None,
    extra: tuple = (),
    transpose_out: bool = False,
) -> jax.Array:
    """Blocked matmul; ``epilogue(acc_f32, *extra_blocks) -> block`` is
    applied to each output block at the final reduction step (fused in
    VMEM — the product matrix never round-trips HBM).  ``extra`` entries
    are ``(array, block_pattern)`` with pattern "row" (shape [1, n], block
    [1, bn]), "col" (shape [m, 1], block [bm, 1]) or "full" ([m, n],
    block [bm, bn]).

    ``transpose_out=True`` stores the TRANSPOSED product: the result has
    shape [n, m] (the DSL's ``c[x, y] += a[y, k] * b[k, x]`` store); the
    accumulator block is transposed in VMEM at flush time and the
    epilogue (if any) runs in the transposed frame — extra patterns then
    read "row" as [1, m] and "col" as [n, 1] blocks."""
    m, k = a.shape
    k2, n = b.shape
    assert k == k2, f"contraction mismatch: {a.shape} @ {b.shape}"
    out_dtype = out_dtype or a.dtype
    block_m, block_n, block_k = (
        min(block_m, m), min(block_n, n), min(block_k, k)
    )

    # VMEM budget: in-blocks are double-buffered by the pipeline, plus the
    # f32 accumulator and the output block; keep under ~14MB of the 16MB.
    item = np.dtype(a.dtype).itemsize

    def vmem_bytes(bm, bn, bk):
        # in the transposed frame, "row" vectors span m and "col" span n
        rb, cb = (bm, bn) if transpose_out else (bn, bm)
        extra_bytes = sum(
            (rb if pat == "row" else cb if pat == "col" else bm * bn)
            * np.dtype(arr.dtype).itemsize * 2
            for arr, pat in extra
        )
        return (
            2 * (bm * bk + bk * bn) * item  # pipelined operand blocks
            + bm * bn * 4                   # accumulator
            + bm * bn * np.dtype(out_dtype).itemsize
            + extra_bytes
        )

    while vmem_bytes(block_m, block_n, block_k) > 14 * 2**20:
        if block_k > 512 and k % (block_k // 2) == 0:
            block_k //= 2
        elif block_n > 128 and n % (block_n // 2) == 0:
            block_n //= 2
        elif block_m > 128 and m % (block_m // 2) == 0:
            block_m //= 2
        else:
            break

    if m % block_m or n % block_n or k % block_k:
        raise ValueError(
            f"block sizes ({block_m},{block_n},{block_k}) must divide "
            f"problem ({m},{n},{k})"
        )
    if interpret is None:
        from .mosaic_check import pallas_interpret

        interpret = pallas_interpret()

    def kernel(a_ref, b_ref, *rest):
        extra_refs = rest[: len(extra)]
        o_ref = rest[len(extra)]
        acc_ref = rest[len(extra) + 1]

        @pl.when(pl.program_id(2) == 0)
        def _zero():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jnp.dot(
            a_ref[...], b_ref[...], preferred_element_type=jnp.float32
        )

        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _flush():
            value = acc_ref[...]
            if transpose_out:
                value = value.T
            if epilogue is not None:
                value = epilogue(value, *[r[...] for r in extra_refs])
            o_ref[...] = value.astype(o_ref.dtype)

    extra_specs = []
    extra_arrays = []
    for arr, pat in extra:
        if pat == "row":
            if transpose_out:
                extra_specs.append(
                    pl.BlockSpec((1, block_m), lambda i, j, l: (0, i))
                )
            else:
                extra_specs.append(
                    pl.BlockSpec((1, block_n), lambda i, j, l: (0, j))
                )
        elif pat == "col":
            if transpose_out:
                extra_specs.append(
                    pl.BlockSpec((block_n, 1), lambda i, j, l: (j, 0))
                )
            else:
                extra_specs.append(
                    pl.BlockSpec((block_m, 1), lambda i, j, l: (i, 0))
                )
        elif transpose_out:
            extra_specs.append(
                pl.BlockSpec((block_n, block_m), lambda i, j, l: (j, i))
            )
        else:
            extra_specs.append(
                pl.BlockSpec((block_m, block_n), lambda i, j, l: (i, j))
            )
        extra_arrays.append(arr)

    if transpose_out:
        out_spec = pl.BlockSpec((block_n, block_m), lambda i, j, l: (j, i))
        out_shape = jax.ShapeDtypeStruct((n, m), out_dtype)
    else:
        out_spec = pl.BlockSpec((block_m, block_n), lambda i, j, l: (i, j))
        out_shape = jax.ShapeDtypeStruct((m, n), out_dtype)

    in_specs = [
        pl.BlockSpec((block_m, block_k), lambda i, j, l: (i, l)),
        pl.BlockSpec((block_k, block_n), lambda i, j, l: (l, j)),
        *extra_specs,
    ]
    check_specs(in_specs, [a.shape, b.shape, *[e.shape for e in extra_arrays]],
                kernel="pallas_matmul")
    check_specs([out_spec], [out_shape.shape], kernel="pallas_matmul",
                kind="output")
    return pl.pallas_call(
        kernel,
        grid=(m // block_m, n // block_n, k // block_k),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # headroom over the 16MB default scoped-vmem cap: the block
            # clamp keeps working sets small, the cap only guards
            # against accounting-model error (see mosaic_check)
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=(m * k + k * n + m * n) * np.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, b, *extra_arrays)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def pallas_matmul(
    a: jax.Array,
    b: jax.Array,
    block_m: int = 512,
    block_n: int = 512,
    block_k: int = 512,
    out_dtype=None,
    interpret: bool | None = None,
) -> jax.Array:
    """out[m, n] = a[m, k] @ b[k, n] with explicit block scheduling.

    Requires block sizes to divide the problem; use the XLA dot for ragged
    shapes.  Differentiable: the backward matmuls run on the XLA dot (MXU).
    """
    return _matmul_impl(a, b, block_m, block_n, block_k, out_dtype, interpret)


def _mm_fwd(a, b, block_m, block_n, block_k, out_dtype, interpret):
    out = _matmul_impl(a, b, block_m, block_n, block_k, out_dtype, interpret)
    return out, (a, b)


def _mm_bwd(block_m, block_n, block_k, out_dtype, interpret, residuals, g):
    a, b = residuals
    da = jnp.dot(g, b.T, preferred_element_type=jnp.float32).astype(a.dtype)
    db = jnp.dot(a.T, g, preferred_element_type=jnp.float32).astype(b.dtype)
    return da, db


pallas_matmul.defvjp(_mm_fwd, _mm_bwd)
