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

from .. import ir
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
        if np.dtype(low.dtype) == np.float64:
            return False  # MXU/VMEM accumulate in f32; f64 models (CPU
            # debugging) keep the exact einsum path
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

    def lower_fused(self, tensors: dict, epilogue: "PallasEpilogue"):
        """Lower matmul + the consumer's elementwise epilogue as ONE Pallas
        kernel: the epilogue runs on the f32 accumulator block in VMEM at
        the last reduction step, so the product matrix never touches HBM."""
        from ..ops.matmul import _matmul_impl

        low = self.low
        a = tensors[self.a_read.tensor]
        b = tensors[self.b_read.tensor]
        extra = [
            (epilogue.prepare(tensors[tid], pat), pat)
            for tid, pat in epilogue.extra
        ]
        return _matmul_impl(
            a,
            b,
            block_m=self.bm,
            block_n=self.bn,
            block_k=self.bk,
            out_dtype=np.dtype(low.dtype),
            epilogue=epilogue.fn,
            extra=tuple(extra),
        )


def plan_epilogue_fusions(program, target, shapes, dtype, precision):
    """Plan matmul+epilogue fusions for one target.

    Returns ``(fused, skipped)``: ``fused[i]`` is the (PallasMatmul,
    PallasEpilogue) pair for the scheduled matmul at kernel index ``i``
    whose consumer at ``i+1`` is folded into its flush step; ``skipped``
    is the set of consumer kernel indices and intermediate tensor ids to
    drop.  A fusion is only legal when the intermediate is a RESULT tensor
    written once, read only by the consumer, and not the target output.
    """
    from .jaxeval import KernelLowering

    kernels = target.kernels
    reads_of: dict[int, list[int]] = {}
    writes_of: dict[int, list[int]] = {}
    for idx, kernel in enumerate(kernels):
        for read in kernel.reads:
            reads_of.setdefault(read.tensor, []).append(idx)
        if kernel.write is not None:
            writes_of.setdefault(kernel.write.tensor, []).append(idx)

    fused: dict[int, tuple] = {}
    skipped_kernels: set[int] = set()
    skipped_tensors: set[int] = set()
    for idx in range(len(kernels) - 1):
        kernel = kernels[idx]
        if kernel.write is None or kernel.write.accumulate != "add":
            continue
        scheduled = any(
            loop.schedule.tile or loop.schedule.parallel
            for loop in kernel.loops
        ) or any(r.schedule.cache for r in kernel.reads)
        if not scheduled:
            continue
        t1 = kernel.write.tensor
        if program.tensors[t1].kind != ir.TensorKind.RESULT:
            continue
        if t1 == target.output:
            continue
        if writes_of.get(t1) != [idx] or reads_of.get(t1) != [idx + 1]:
            continue
        try:
            low1 = KernelLowering(program, kernel, shapes, dtype, precision)
        except Exception:
            continue
        if not low1._bounds_ok or low1.dynamic_axes:
            continue
        pm = PallasMatmul(low1, kernel)
        if not pm.ok:
            continue
        # matmul must write [y, x] directly (no transposed store)
        if [low1._pure_iter(d) for d in kernel.write.dims] != [
            pm.y_axis, pm.x_axis
        ]:
            continue
        consumer = kernels[idx + 1]
        if consumer.write is None or consumer.write.tensor == t1:
            continue
        try:
            low2 = KernelLowering(program, consumer, shapes, dtype, precision)
        except Exception:
            continue
        epi = PallasEpilogue(low2, consumer, t1, pm.m, pm.n)
        if not epi.ok:
            continue
        fused[idx] = (pm, epi)
        skipped_kernels.add(idx + 1)
        skipped_tensors.add(t1)
    return fused, skipped_kernels, skipped_tensors


# elementwise ops an epilogue may contain (everything index-typed, tensor
# -shaped-query or array-valued stays on the general path)
_EPILOGUE_OPS = {
    Op.SCALAR, Op.BOOL, Op.ADD, Op.SUB, Op.MUL, Op.DIV, Op.NEG,
    Op.SIN, Op.COS, Op.EXP, Op.POW, Op.SQRT,
    Op.LOG, Op.LOG10, Op.LOG2, Op.LN,
    Op.EQ, Op.LT, Op.LE, Op.AND, Op.OR, Op.SELECT,
}


class PallasEpilogue:
    """Classify a consumer kernel as a fusable elementwise epilogue.

    Pattern (the reference's motivating case is dense+bias+activation,
    dnn.nim:20-35, where the GPU backend relies on kernel fusion): the
    kernel after a scheduled matmul writing ``t``:

        out[y, x] = f(t[y, x], row[x], col[y], full[y, x], consts...)

    — a pure scalar expression over the matmul result read pointwise plus
    rank-1 broadcasts and same-shape tensors.  The expression is evaluated
    on VMEM blocks inside the matmul kernel at flush time.
    """

    def __init__(self, low, kernel: Kernel, produced: int, m: int, n: int):
        self.low = low          # KernelLowering for the CONSUMER kernel
        self.kernel = kernel
        self.produced = produced  # tensor id written by the matmul
        self.m, self.n = m, n
        self.extra: list[tuple[int, str]] = []  # (tensor id, pattern)
        self._read_pattern: dict[int, str] = {}  # read data reg -> pattern
        self.ok = self._classify()

    def _classify(self) -> bool:
        low = self.low
        kernel = self.kernel
        write = kernel.write
        if (
            write is None
            or write.is_raw
            or kernel.setup
            or write.accumulate != "add"
            or kernel.generator.kind != ir.GenKind.NONE
            or kernel.custom_grad is not None
        ):
            return False
        if not low._bounds_ok or low.dynamic_axes:
            return False
        if len(kernel.loops) != 2 or low.sizes != [self.m, self.n]:
            return False
        if len(write.dims) != 2:
            return False
        w_axes = [low._pure_iter(d) for d in write.dims]
        if w_axes != [0, 1] or low.starts != [0, 0]:
            return False
        out_shape = low.shapes[write.tensor]
        if out_shape != [self.m, self.n]:
            return False

        saw_produced = False
        for read in kernel.reads:
            if read.is_raw:
                return False
            axes = [low._pure_iter(d) for d in read.dims]
            if any(a is None for a in axes):
                return False
            shape = low.shapes[read.tensor]
            if read.tensor == self.produced:
                if axes != [0, 1]:
                    return False
                saw_produced = True
                self._read_pattern[read.data] = "acc"
                continue
            if axes == [0, 1] and shape == [self.m, self.n]:
                pat = "full"
            elif axes == [1] and shape == [self.n]:
                pat = "row"
            elif axes == [0] and shape == [self.m]:
                pat = "col"
            else:
                return False
            self._read_pattern[read.data] = pat
            self.extra.append((read.tensor, pat))

        if not saw_produced:
            return False
        for instr in kernel.expr.instrs:
            if instr.op not in _EPILOGUE_OPS:
                return False
        return True

    @staticmethod
    def prepare(arr, pattern: str):
        """Reshape rank-1 operands to 2-D so TPU blocks stay 2-D."""
        if pattern == "row":
            return arr.reshape(1, -1)
        if pattern == "col":
            return arr.reshape(-1, 1)
        return arr

    def fn(self, acc, *blocks):
        """Evaluate the consumer's expression on VMEM blocks (f32)."""
        import jax.numpy as jnp

        env: dict[int, object] = {}
        it = iter(blocks)
        for read in self.kernel.reads:
            pat = self._read_pattern[read.data]
            if pat == "acc":
                env[read.data] = acc
            else:
                env[read.data] = next(it).astype(jnp.float32)
        dtype = jnp.float32
        for instr in self.kernel.expr.instrs:
            op = instr.op
            a = [env[x] for x in instr.args]
            if op == Op.SCALAR:
                value = dtype(instr.scalar_lit)
            elif op == Op.BOOL:
                value = instr.bool_lit
            elif op == Op.ADD:
                value = a[0] + a[1]
            elif op == Op.SUB:
                value = a[0] - a[1]
            elif op == Op.MUL:
                value = a[0] * a[1]
            elif op == Op.DIV:
                value = a[0] / a[1]
            elif op == Op.NEG:
                value = -a[0]
            elif op == Op.SIN:
                value = jnp.sin(a[0])
            elif op == Op.COS:
                value = jnp.cos(a[0])
            elif op == Op.EXP:
                value = jnp.exp(a[0])
            elif op == Op.POW:
                value = jnp.power(a[0], a[1])
            elif op == Op.SQRT:
                value = jnp.sqrt(a[0])
            elif op == Op.LN:
                value = jnp.log(a[0])
            elif op == Op.LOG:
                value = jnp.log(a[0]) / jnp.log(a[1])
            elif op == Op.LOG2:
                value = jnp.log2(a[0])
            elif op == Op.LOG10:
                value = jnp.log10(a[0])
            elif op == Op.EQ:
                value = a[0] == a[1]
            elif op == Op.LT:
                value = a[0] < a[1]
            elif op == Op.LE:
                value = a[0] <= a[1]
            elif op == Op.AND:
                value = jnp.logical_and(a[0], a[1])
            elif op == Op.OR:
                value = jnp.logical_or(a[0], a[1])
            else:  # SELECT (classification guarantees the op set)
                value = jnp.where(a[0], a[1], a[2])
            if instr.res is not None:
                env[instr.res] = value
        return env[self.kernel.expr.res]
