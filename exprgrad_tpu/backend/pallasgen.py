"""Pallas TPU kernel emitter for schedule-annotated contractions.

This is the rebuild of the reference's schedule-driven GPU codegen
(clgen.nim + the tile/cache passes, passes.nim:2043-2323): the user's
schedule DSL — ``tile(iter, size)``, ``cache(tensor)``, ``parallel(iters)``
(parser.nim:519-564) — maps onto the Pallas machine model:

  parallel/tiled loops  -> the pallas grid (MXU-aligned block counts)
  tile_size             -> BlockSpec block shapes
  cache(t)              -> the operand's block is staged in VMEM (BlockSpec
                           with VMEM memory space; the pipeline DMAs
                           HBM->VMEM double-buffered automatically)
  shared-memory barrier  -> implicit in the grid semantics

The emitter currently covers the contraction family (matmul and friends):
one reduction grid dimension with a VMEM accumulator, parallel output
dimensions.  Anything it cannot prove maps cleanly falls back to the XLA
einsum path, which is already MXU-optimal for standard shapes.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..ir import Kernel, Op

# minimal sublane alignment per dtype (lane dim is always 128)
_SUBLANE = {"float32": 8, "bfloat16": 16, "float64": 8}


def _round_down(x: int, m: int) -> int:
    return max(m, (x // m) * m)


class PallasMatmul:
    """Schedule-driven tiled matmul: out[y,x] += a[y,k] * b[k,x]."""

    def __init__(self, lowering, kernel: Kernel):
        self.low = lowering
        self.kernel = kernel
        self.ok = self._classify()

    def _classify(self) -> bool:
        low = self.low
        kernel = self.kernel
        write = kernel.write
        if write is None or write.is_raw or kernel.setup:
            return False
        if len(kernel.reads) != 2 or any(r.is_raw for r in kernel.reads):
            return False
        if any(r.dims and len(r.dims) != 2 for r in kernel.reads):
            return False
        if len(write.dims) != 2:
            return False
        # schedule must request tiling or caching
        scheduled = any(
            loop.schedule.tile or loop.schedule.parallel for loop in kernel.loops
        ) or any(r.schedule.cache for r in kernel.reads)
        if not scheduled:
            return False

        # expression: plain product of the two reads
        defs = {i.res: i for i in kernel.expr.instrs}
        if len(kernel.expr.instrs) != 1:
            return False
        instr = defs.get(kernel.expr.res)
        if instr is None or instr.op != Op.MUL:
            return False
        read_of = {r.data: r for r in kernel.reads}
        if set(instr.args) != set(read_of):
            return False

        def axes_of(op) -> Optional[list[int]]:
            axes = []
            for dim in op.dims:
                axis = low._pure_iter(dim)
                if axis is None or low.starts[axis] != 0:
                    return None
                axes.append(axis)
            return axes

        w_axes = axes_of(write)
        a_read = read_of[instr.args[0]]
        b_read = read_of[instr.args[1]]
        a_axes, b_axes = axes_of(a_read), axes_of(b_read)
        if w_axes is None or a_axes is None or b_axes is None:
            return False
        if len(set(w_axes)) != 2 or len(low.sizes) != 3:
            return False
        # identify y (rows), x (cols), k (contraction)
        k_candidates = set(a_axes) & set(b_axes)
        if len(k_candidates) != 1:
            return False
        k = next(iter(k_candidates))
        if k in w_axes:
            return False
        y_axis, x_axis = w_axes
        # a must be [y, k] (transpose handled by swapping reads)
        if set(a_axes) == {x_axis, k} and set(b_axes) == {y_axis, k}:
            a_read, b_read = b_read, a_read
            a_axes, b_axes = b_axes, a_axes
        if set(a_axes) != {y_axis, k} or set(b_axes) != {x_axis, k}:
            return False
        if a_axes != [y_axis, k] or b_axes != [k, x_axis]:
            return False  # layout transposes: leave to the einsum path

        self.a_read, self.b_read = a_read, b_read
        self.y_axis, self.x_axis, self.k_axis = y_axis, x_axis, k
        m, n, kk = (
            low.sizes[y_axis], low.sizes[x_axis], low.sizes[k]
        )
        self.m, self.n, self.k = m, n, kk

        # block sizes: user tile_size when given, else MXU-friendly defaults
        def tile_for(axis: int, default: int, extent: int, align: int) -> int:
            loop = next(l for l in kernel.loops if low.axis_of_reg[l.iter_reg] == axis)
            size = loop.schedule.tile_size if loop.schedule.tile else default
            size = min(size, extent)
            if extent % size != 0:
                return 0  # require divisibility; else fall back
            return size

        dtype_name = np.dtype(self.low.dtype).name
        sub = _SUBLANE.get(dtype_name, 8)
        self.bm = tile_for(y_axis, _round_down(min(m, 512), sub), m, sub)
        self.bn = tile_for(x_axis, _round_down(min(n, 512), 128), n, 128)
        self.bk = tile_for(k, _round_down(min(kk, 512), 128), kk, 128)
        if not (self.bm and self.bn and self.bk):
            return False
        if self.m % self.bm or self.n % self.bn or self.k % self.bk:
            return False
        return True

    def lower(self, tensors: dict):
        from ..ops.matmul import pallas_matmul

        low = self.low
        a = tensors[self.a_read.tensor]
        b = tensors[self.b_read.tensor]
        value = pallas_matmul(
            a,
            b,
            block_m=self.bm,
            block_n=self.bn,
            block_k=self.bk,
            out_dtype=np.dtype(low.dtype),
        )

        write = self.kernel.write
        assert write is not None
        # write dims may be [y, x] or [x, y]
        if [low._pure_iter(d) for d in write.dims] == [self.x_axis, self.y_axis]:
            value = value.T
        return tensors[write.tensor] + value
