"""Pallas TPU kernel emitter for schedule-annotated kernels.

This is the rebuild of the reference's schedule-driven GPU codegen
(clgen.nim + the tile/cache passes, passes.nim:2043-2323): the user's
schedule DSL — ``tile(iter, size)``, ``cache(tensor)``, ``parallel(iters)``,
``share_cache(iters)`` (parser.nim:519-564) — maps onto the Pallas machine
model:

  parallel/tiled loops  -> the pallas grid (MXU-aligned block counts)
  tile_size             -> BlockSpec block shapes
  cache(t)              -> the operand's block is staged in VMEM (BlockSpec
                           with VMEM memory space; the pipeline DMAs
                           HBM->VMEM double-buffered automatically)
  share_cache(it)       -> the ``it`` extent stays whole inside every block
                           (the staged tile is shared by all grid programs
                           along it — the TPU analog of the reference's
                           workgroup-shared cache, passes.nim:2173-2323)
  shared-memory barrier  -> implicit in the grid semantics

Two kernel families are covered:

* ``PallasMatmul`` — contractions (matmul and friends): one reduction grid
  dimension with a VMEM f32 accumulator, parallel output dimensions, MXU
  ``jnp.dot`` blocks (+ optional fused elementwise epilogue).
* ``PallasMapReduce`` — the map/reduce family (the reference's clgen emits
  any kernel body, clgen.nim:249-257): elementwise expressions over
  full-range reads, reduced (add/max/min) over the loop axes the write
  does not cover.  Covers scheduled softmax / layer-norm / rms-norm-shaped
  kernels with ``tile()`` -> BlockSpecs and VMEM-staged operands.

Whether a *matched* schedule actually routes to Pallas is decided by the
measured cost model in policy.py (schedule_mode="auto"/"force"/"ignore");
anything unmatched falls back to the XLA paths with a ScheduleWarning —
never silently.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .. import ir
from ..ir import Kernel, Op

# minimal sublane alignment per dtype (lane dim is always 128)
_SUBLANE = {"float32": 8, "bfloat16": 16, "float64": 8}

# Mosaic's scoped-vmem cap for emitter kernels.  The default (16MB) is a
# conservative fraction of the v5e's 128MB VMEM; the planner's own block
# budget (14MB, block_bytes below) keeps working sets small enough to
# double-buffer, but its estimate cannot model Mosaic's exact stack
# accounting — the on-chip embedding scatter-add at n=16384 v=2048
# d=512 compiled to a 24MB working set off a <=14MB estimate
# (BENCH_DETAILS.json r4 scatter_add_error).  Shared with the ops
# kernels; retune in mosaic_check only.
from ..ops.mosaic_check import VMEM_LIMIT_BYTES  # noqa: F401

# Planner working-set budget for emitter kernels.  Must track the
# Mosaic scoped-vmem cap the same pallas_calls ship
# (mosaic_check.VMEM_LIMIT_BYTES, 100MB of the v5e's 128MB VMEM) with
# headroom for Mosaic-internal scratch: the old hard-coded 14MB (a
# 16MB-era constant) declined user-tiled kernels — the bench-shape
# embedding scatter (~15MB working set) fell back to XLA under
# schedule_mode=force while the raised Mosaic cap would run it fine.
_PLANNER_BUDGET = int(VMEM_LIMIT_BYTES * 0.8)


def _round_down(x: int, m: int) -> int:
    return max(m, (x // m) * m)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_to(arr, shape: tuple):
    """Zero-pad ``arr`` up to ``shape`` (no-op when already that shape)."""
    import jax.numpy as jnp

    if tuple(arr.shape) == tuple(shape):
        return arr
    return jnp.pad(
        arr, [(0, p - s) for s, p in zip(arr.shape, shape)]
    )


def is_scheduled(kernel: Kernel) -> bool:
    """True when the user attached any schedule directive to the kernel."""
    return any(
        loop.schedule.tile or loop.schedule.parallel or loop.schedule.share_cache
        for loop in kernel.loops
    ) or any(r.schedule.cache for r in kernel.reads)


def _best_block(size: int, cap: int) -> int:
    """Largest divisor of ``size`` that is <= cap (block sizes must divide
    the extent; Pallas pads the tile internally for sublane/lane alignment)."""
    cap = min(size, max(1, cap))
    for b in range(cap, 0, -1):
        if size % b == 0:
            return b
    return 1


def _best_block_aligned(size: int, cap: int, align: int) -> int:
    """Largest divisor of ``size`` <= cap that Mosaic accepts as a partial
    block on an aligned dim: divisible by ``align`` (or the full extent —
    a whole-dim block is always legal).  Returns ``size`` (no shrink
    possible) when no aligned divisor fits under the cap."""
    cap = min(size, max(1, cap))
    for b in range(cap, 0, -1):
        if size % b == 0 and (b % align == 0 or b == size):
            return b
    return size


# elementwise ops the block evaluator supports (arrays, epoch and debug
# ops stay on the XLA paths)
_ELEMENTWISE_OPS = {
    Op.SCALAR, Op.BOOL, Op.ADD, Op.SUB, Op.MUL, Op.DIV, Op.NEG,
    Op.SIN, Op.COS, Op.EXP, Op.POW, Op.SQRT,
    Op.LOG, Op.LOG10, Op.LOG2, Op.LN,
    Op.EQ, Op.LT, Op.LE, Op.AND, Op.OR, Op.SELECT,
}

# additionally allowed in PallasMapReduce expressions: index arithmetic on
# loop iterators (materialized as broadcasted_iota blocks) for
# index-dependent masks — triangular/banded kernels and friends.  The
# epilogue folding keeps the narrower _ELEMENTWISE_OPS set.
_ITER_OPS = {
    Op.IDX, Op.TO_SCALAR, Op.TO_INDEX, Op.IDX_DIV, Op.MOD, Op.WRAP,
}
_MAPREDUCE_OPS = _ELEMENTWISE_OPS | _ITER_OPS


_NOT_STATIC = object()


def _eval_static_instr(instr, env: dict, shapes: dict):
    """Evaluate one instruction to an exact static Python value given an
    env of static values — the reference's in-expression shape-query /
    compile-time-arithmetic surface (dsl.nim:109-133).  Returns
    ``_NOT_STATIC`` when the op (or an argument) is not static, or when
    the arithmetic itself faults (division by zero, domain/overflow
    errors) — those values must take the runtime path, which computes
    inf/nan under IEEE semantics instead of crashing compilation."""
    try:
        return _eval_static_instr_inner(instr, env, shapes)
    except (ArithmeticError, ValueError, OverflowError):
        return _NOT_STATIC


def _eval_static_instr_inner(instr, env: dict, shapes: dict):
    import math

    from ..passes.shapes import trunc_div, trunc_mod

    op = instr.op
    if any(r not in env for r in instr.args):
        return _NOT_STATIC
    a = [env[r] for r in instr.args]
    if op == Op.IDX:
        return instr.index_lit
    if op == Op.SCALAR:
        return instr.scalar_lit
    if op == Op.BOOL:
        return instr.bool_lit
    if op in (Op.SHAPE, Op.SHAPE_LEN, Op.LEN):
        shape = shapes.get(instr.tensor)
        if shape is None:
            return _NOT_STATIC
        if op == Op.SHAPE:
            return shape[instr.dim]
        if op == Op.SHAPE_LEN:
            return len(shape)
        return int(np.prod(shape, dtype=np.int64))
    if op == Op.ADD:
        return a[0] + a[1]
    if op == Op.SUB:
        return a[0] - a[1]
    if op == Op.MUL:
        return a[0] * a[1]
    if op == Op.NEG:
        return -a[0]
    if op == Op.DIV:
        return a[0] / a[1]
    if op == Op.IDX_DIV:
        return trunc_div(a[0], a[1])
    if op == Op.MOD:
        return trunc_mod(a[0], a[1])
    if op == Op.WRAP:
        return a[0] % a[1] if a[1] > 0 else _NOT_STATIC
    if op == Op.TO_SCALAR:
        return float(a[0])
    if op == Op.TO_INDEX:
        return int(a[0])
    if op == Op.SQRT:
        return math.sqrt(a[0])
    if op == Op.EXP:
        return math.exp(a[0])
    if op == Op.LN:
        return math.log(a[0])
    if op == Op.LOG:
        return math.log(a[0]) / math.log(a[1])
    if op == Op.LOG2:
        return math.log2(a[0])
    if op == Op.LOG10:
        return math.log10(a[0])
    if op == Op.POW:
        return a[0] ** a[1]
    if op == Op.SIN:
        return math.sin(a[0])
    if op == Op.COS:
        return math.cos(a[0])
    if op == Op.EQ:
        return a[0] == a[1]
    if op == Op.LT:
        return a[0] < a[1]
    if op == Op.LE:
        return a[0] <= a[1]
    if op == Op.AND:
        return a[0] and a[1]
    if op == Op.OR:
        return a[0] or a[1]
    if op == Op.SELECT:
        return a[1] if a[0] else a[2]
    return _NOT_STATIC


def _flat_fold(dims: list, shape) -> tuple:
    """Row-major flat fold of a computed-dim group: (V, strides) where
    ``V`` is the flattened extent and ``strides[d]`` the flat stride of
    dim ``d`` (shared by the gather-read and scatter-write planners)."""
    V = 1
    for d in dims:
        V *= int(shape[d])
    strides = {}
    s = 1
    for d in reversed(dims):
        strides[d] = s
        s *= int(shape[d])
    return V, strides


def _eval_flat_index(indices, env):
    """Combine per-dim LinearIndex blocks into ONE flat index value over
    the row-major-flattened computed subspace (gather and scatter share
    this in-kernel combine)."""
    idxv = 0
    for index, stride in indices:
        if index.setup:
            eval_elementwise(index.setup, index.setup[-1].res, env)
        t = index.constant
        for reg, f in index.factors.items():
            t = t + env[reg] * f
        idxv = idxv + t * stride
    return idxv


def eval_elementwise(instrs, res, env: dict):
    """Evaluate a scalar-expression instruction list on jnp blocks (f32).

    ``env`` maps read data registers to blocks; classification must have
    checked every op is in _ELEMENTWISE_OPS and every arg is defined.
    Instructions whose result register is pre-seeded in ``env`` (statically
    folded shape queries) are skipped."""
    import jax.numpy as jnp

    from .jaxeval import _trunc_div, _trunc_mod

    dtype = jnp.float32
    for instr in instrs:
        op = instr.op
        if instr.res is not None and instr.res in env:
            continue
        a = [env[x] for x in instr.args]
        if op == Op.SCALAR:
            value = dtype(instr.scalar_lit)
        elif op == Op.BOOL:
            value = instr.bool_lit
        elif op == Op.IDX:
            value = instr.index_lit
        elif op == Op.TO_SCALAR:
            value = jnp.asarray(a[0]).astype(dtype)
        elif op == Op.TO_INDEX:
            value = jnp.trunc(jnp.asarray(a[0])).astype(jnp.int32)
        elif op == Op.IDX_DIV:
            if isinstance(a[0], int) and isinstance(a[1], int):
                q = abs(a[0]) // abs(a[1])
                value = -q if (a[0] < 0) != (a[1] < 0) else q
            else:
                value = _trunc_div(a[0], a[1])
        elif op == Op.MOD:
            if isinstance(a[0], int) and isinstance(a[1], int):
                q = abs(a[0]) // abs(a[1])
                q = -q if (a[0] < 0) != (a[1] < 0) else q
                value = a[0] - q * a[1]
            else:
                value = _trunc_mod(a[0], a[1])
        elif op == Op.WRAP:
            value = jnp.mod(a[0], a[1])
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
    return env[res]


def _operand_layout(axes, plans, sizes, psizes, block, pad):
    """Per-read operand layout shared by the single-kernel and row-chain
    lowerings: (extents, padded extents, block shape entries, in-kernel
    transforms) for each read-plan kind."""
    extents, pextents, blocks, transforms = [], [], [], []
    for a, (kind, p, c, D_) in zip(axes, plans):
        if kind == "stride":
            # input block covers the s-wide window band; the kernel
            # takes the phase-c strided slice
            extents.append(sizes[a] * p)
            pextents.append(sizes[a] * p)
            blocks.append(block[a] * p)
            transforms.append((a + pad, "stride", p, c, 0))
        elif kind == "div":
            # input block is 1/k of the output block; the kernel
            # repeats each element k times
            extents.append(sizes[a] // p)
            pextents.append(sizes[a] // p)
            blocks.append(max(1, block[a] // p))
            transforms.append((a + pad, "div", p, 0, 0))
        elif kind == "slice":
            # shifted stencil: the whole dim rides in every block; the
            # kernel takes the static (offset c, stride p) slice of
            # loop-extent length
            extents.append(D_)
            pextents.append(D_)
            blocks.append(D_)
            transforms.append((a + pad, "slice", p, c, sizes[a]))
        else:
            extents.append(sizes[a])
            pextents.append(psizes[a])
            blocks.append(block[a])
    return extents, pextents, blocks, transforms


def _strided_phase(val, pos: int, p: int, c: int):
    """Take elements ``[c::p]`` along ``pos`` via reshape-split + static
    index.  Mosaic rejects strided vector slices outright
    ('vector.extract_strided_slice expected strides confined to [1, 2)'),
    but splitting the axis into (L, p) and statically indexing the phase
    verifies — proven by AOT TPU lowering (tests/test_mosaic_aot.py)."""
    import jax

    shape = val.shape
    L = shape[pos] // p
    val = val.reshape(shape[:pos] + (L, p) + shape[pos + 1:])
    return jax.lax.index_in_dim(val, c, axis=pos + 1, keepdims=False)


def _apply_read_transforms(val, transforms):
    """Apply a read's in-kernel transforms to its staged block."""
    import jax
    import jax.numpy as jnp

    for pos, kind, p, c, L in transforms:
        if kind == "stride":
            if p > 1:
                val = _strided_phase(val, pos, p, c)
            # p == 1 with c == 0 is the identity
        elif kind == "slice":
            if p > 1:
                # strided shifted stencil: stride-1 slice of the p*L
                # band, then phase-split (classification guarantees
                # c + p*L <= D)
                val = jax.lax.slice_in_dim(
                    val, c, c + p * L, stride=1, axis=pos,
                )
                val = _strided_phase(val, pos, p, 0)
            else:
                val = jax.lax.slice_in_dim(
                    val, c, c + L, stride=1, axis=pos,
                )
        else:  # div: expand each input element k times
            val = jnp.repeat(val, p, axis=pos)
    return val


class PallasMatmul:
    """Schedule-driven tiled matmul: out[y,x] += a[y,k] * b[k,x].

    ``why`` carries the decline reason when ``ok`` is False, so schedule
    fallbacks report the real cause (an indivisible tile size, an operand
    layout) rather than a generic mismatch."""

    def __init__(self, lowering, kernel: Kernel):
        self.low = lowering
        self.kernel = kernel
        self.why = ""
        self.ok = self._classify()

    def _decline(self, why: str) -> bool:
        self.why = why
        return False

    def _classify(self) -> bool:
        low = self.low
        kernel = self.kernel
        write = kernel.write
        if write is None or write.is_raw or kernel.setup:
            return self._decline("raw write or setup instructions")
        if np.dtype(low.dtype) == np.float64:
            # MXU/VMEM accumulate in f32; f64 models (CPU debugging) keep
            # the exact einsum path
            return self._decline("float64 (MXU accumulates in f32)")
        if len(kernel.reads) != 2 or any(r.is_raw for r in kernel.reads):
            return self._decline("not a two-operand contraction")
        if any(r.dims and len(r.dims) != 2 for r in kernel.reads):
            return self._decline("operands are not rank-2")
        if len(write.dims) != 2:
            return self._decline("output is not rank-2")
        # schedule must request tiling or caching
        if not is_scheduled(kernel):
            return self._decline("no schedule")

        # expression: plain product of the two reads
        defs = {i.res: i for i in kernel.expr.instrs}
        if len(kernel.expr.instrs) != 1:
            return self._decline("expression is not a plain product")
        instr = defs.get(kernel.expr.res)
        if instr is None or instr.op != Op.MUL:
            return self._decline("expression is not a plain product")
        read_of = {r.data: r for r in kernel.reads}
        if set(instr.args) != set(read_of):
            return self._decline("expression is not a plain product")

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
            return self._decline("indices are not plain iterators")
        if len(set(w_axes)) != 2 or len(low.sizes) != 3:
            return self._decline("not a [y,x] += a[y,k]*b[k,x] loop nest")
        # identify the contraction axis, then orient the reads: A must be
        # laid out [rows, k] and B [k, cols] (operand transposes stay on
        # the einsum path; the MXU wants these layouts)
        k_candidates = set(a_axes) & set(b_axes)
        if len(k_candidates) != 1:
            return self._decline("no single shared contraction axis")
        k = next(iter(k_candidates))
        if k in w_axes:
            return self._decline("contraction axis appears in the output")
        if a_axes[1] == k and b_axes[0] == k:
            pass
        elif b_axes[1] == k and a_axes[0] == k:
            a_read, b_read = b_read, a_read
            a_axes, b_axes = b_axes, a_axes
        else:
            return self._decline(
                "operand layout transposed (einsum path handles it)"
            )
        y_axis, x_axis = a_axes[0], b_axes[1]
        if set(w_axes) != {y_axis, x_axis}:
            return self._decline("write axes do not match the operands")

        self.a_read, self.b_read = a_read, b_read
        self.y_axis, self.x_axis, self.k_axis = y_axis, x_axis, k
        # transposed store: c[x, y] += a[y, k] * b[k, x]
        self.transposed = w_axes == [x_axis, y_axis]
        m, n, kk = (
            low.sizes[y_axis], low.sizes[x_axis], low.sizes[k]
        )
        self.m, self.n, self.k = m, n, kk

        # block sizes: user tile_size when given, else MXU-friendly defaults.
        # Tiles that do not divide the extent (or are Mosaic-misaligned) no
        # longer decline: the operands are zero-padded up to aligned tile
        # multiples and the result is sliced back — the TPU analog of the
        # reference's bounds guards on non-divisible shapes
        # (passes.nim:2402-2569, golden-tested at test_gpu.nim:252-266).
        # Zero padding is exact for a contraction (pad rows/cols are sliced
        # away; pad k contributes 0 to every dot product).
        def tile_for(
            axis: int, default: int, extent: int, align: int,
            cap: int = 512,
        ) -> tuple[int, int]:
            """Return (block, padded_extent) for one problem dim."""
            loop = next(l for l in kernel.loops if low.axis_of_reg[l.iter_reg] == axis)
            if loop.schedule.share_cache:
                # whole extent stays VMEM-resident, shared by every grid
                # program along this axis (the _matmul_impl VMEM budget may
                # still halve it to fit the 16MB scratchpad)
                return extent, extent
            size = loop.schedule.tile_size if loop.schedule.tile else default
            size = max(1, min(size, extent))
            if extent % size == 0 and (size == extent or size % align == 0):
                return size, extent  # exact: no padding
            aligned_extent = _round_up(extent, align)
            if loop.schedule.tile:
                # honor the user's tile as closely as Mosaic allows
                size = min(_round_up(size, align), aligned_extent)
            else:
                # no explicit tile on a ragged extent: one padded
                # whole-dim block when it fits the block-size budget
                # (e.g. 100 -> one 104-row block, not two 96-row blocks
                # padded to 192), else the aligned default
                size = (
                    aligned_extent
                    if aligned_extent <= cap
                    else _round_up(default, align)
                )
            return size, _round_up(extent, size)

        dtype_name = np.dtype(self.low.dtype).name
        sub = _SUBLANE.get(dtype_name, 8)
        # alignment by the dim's position in the operand/output blocks:
        # bm is a sublane dim of A/out (lane of out when transposed), bn a
        # lane dim of B/out, bk the lane dim of A — blocks on a lane dim
        # must be 128-aligned, on a sublane dim 8/16-aligned.
        m_align = 128 if self.transposed else sub
        self.bm, self.pm = tile_for(
            y_axis, _round_down(min(m, 512), sub), m, m_align
        )
        self.bn, self.pn = tile_for(x_axis, _round_down(min(n, 512), 128), n, 128)
        self.bk, self.pk = tile_for(k, _round_down(min(kk, 512), 128), kk, 128)
        return True

    def _operands(self, tensors: dict):
        """Fetch A/B, zero-padded to the aligned tile multiples."""
        a = _pad_to(tensors[self.a_read.tensor], (self.pm, self.pk))
        b = _pad_to(tensors[self.b_read.tensor], (self.pk, self.pn))
        return a, b

    def _slice_out(self, value):
        """Cut the padded product back to the true output shape."""
        want = (self.n, self.m) if self.transposed else (self.m, self.n)
        if tuple(value.shape) != want:
            value = value[: want[0], : want[1]]
        return value

    def lower(self, tensors: dict):
        from ..ops.matmul import _matmul_impl

        low = self.low
        a, b = self._operands(tensors)
        value = _matmul_impl(
            a,
            b,
            block_m=self.bm,
            block_n=self.bn,
            block_k=self.bk,
            out_dtype=np.dtype(low.dtype),
            transpose_out=self.transposed,
        )
        write = self.kernel.write
        assert write is not None
        return tensors[write.tensor] + self._slice_out(value)

    def lower_fused(self, tensors: dict, epilogue: "PallasEpilogueChain"):
        """Lower matmul + the folded consumer chain as ONE Pallas kernel:
        the epilogue expressions run on the f32 accumulator block in VMEM
        at the last reduction step, so neither the product matrix nor any
        chain intermediate ever touches HBM."""
        from ..ops.matmul import _matmul_impl

        low = self.low
        a, b = self._operands(tensors)
        # epilogue frame [rows, cols] padded alongside the product
        pr, pc = (self.pn, self.pm) if self.transposed else (self.pm, self.pn)
        extra = []
        for tid, pat in epilogue.extra:
            arr = epilogue.prepare(tensors[tid], pat)
            if pat == "row":
                arr = _pad_to(arr, (1, pc))
            elif pat == "col":
                arr = _pad_to(arr, (pr, 1))
            else:
                arr = _pad_to(arr, (pr, pc))
            extra.append((arr, pat))
        value = _matmul_impl(
            a,
            b,
            block_m=self.bm,
            block_n=self.bn,
            block_k=self.bk,
            out_dtype=np.dtype(low.dtype),
            epilogue=epilogue.fn,
            extra=tuple(extra),
            transpose_out=self.transposed,
        )
        return self._slice_out(value)


# elementwise ops an epilogue may contain (everything index-typed, tensor
# -shaped-query or array-valued stays on the general path)
_EPILOGUE_OPS = _ELEMENTWISE_OPS


class _EpilogueStep:
    """One folded kernel of an epilogue chain.

    ``kind="map"``: a consumer kernel reading the running value (``src``)
    pointwise and writing a new tensor — out = f(acc, extras).
    ``kind="add"``: an additional accumulating writer of the running
    tensor (dense's bias kernel, dnn.py:42-46) — out = acc + f(extras).

    Two shapes are accepted in the [rows, cols] frame: rank-2 pointwise
    kernels (extras may be "row"/"col" rank-1 broadcasts or "full"
    same-shape tensors) and flat ``.raw`` elementwise kernels over
    rows*cols elements (relu-style layers; extras are "full" tensors of
    the same total size, reshaped to the frame — positionwise identical
    because elementwise expressions are position-independent).
    """

    def __init__(self, kernel: Kernel, kind: str):
        self.kernel = kernel
        self.kind = kind
        self.read_pattern: dict[int, str] = {}  # data reg -> pattern
        self.extra: list[tuple[int, str]] = []

    def fn(self, acc, blocks):
        """Evaluate on VMEM blocks; ``blocks`` is an iterator over this
        step's extra operand blocks (already in frame layout)."""
        import jax.numpy as jnp

        env: dict[int, object] = {}
        for read in self.kernel.reads:
            pat = self.read_pattern[read.data]
            if pat == "acc":
                env[read.data] = acc
            else:
                env[read.data] = next(blocks).astype(jnp.float32)
        value = eval_elementwise(
            self.kernel.expr.instrs, self.kernel.expr.res, env
        )
        value = jnp.broadcast_to(value, acc.shape)
        return acc + value if self.kind == "add" else value


def _classify_step(low, kernel: Kernel, src: int, rows: int, cols: int,
                   kind: str) -> Optional[_EpilogueStep]:
    """Classify ``kernel`` as a foldable epilogue step in the
    [rows, cols] frame, reading the running value from tensor ``src``
    (for kind="map"); returns None when it does not match."""
    write = kernel.write
    if (
        write is None
        or kernel.setup
        or write.accumulate != "add"
        or kernel.generator.kind != ir.GenKind.NONE
        or kernel.custom_grad is not None
        or kernel.extern is not None
        or kernel.remat  # recompute kernels keep their CSE fence path
    ):
        return None
    if not low._bounds_ok or low.dynamic_axes:
        return None
    if any(s != 0 for s in low.starts):
        return None

    total = rows * cols
    raw = write.is_raw
    if raw:
        if len(kernel.loops) != 1 or low.sizes != [total]:
            return None
        if low._pure_iter(write.dims[0]) != 0:
            return None
        out_shape = low.shapes[write.tensor]
        if int(np.prod(out_shape, dtype=np.int64)) != total:
            return None
    else:
        if len(kernel.loops) != 2 or low.sizes != [rows, cols]:
            return None
        if len(write.dims) != 2:
            return None
        if [low._pure_iter(d) for d in write.dims] != [0, 1]:
            return None
        if low.shapes[write.tensor] != [rows, cols]:
            return None

    step = _EpilogueStep(kernel, kind)
    saw_src = False
    for read in kernel.reads:
        shape = low.shapes[read.tensor]
        if read.is_raw:
            if not raw or low._pure_iter(read.dims[0]) != 0:
                return None
            if int(np.prod(shape, dtype=np.int64)) != total:
                return None
            pat = "full"
        else:
            if raw:
                return None
            axes = [low._pure_iter(d) for d in read.dims]
            if any(a is None for a in axes):
                return None
            if axes == [0, 1] and shape == [rows, cols]:
                pat = "full"
            elif axes == [1] and shape == [cols]:
                pat = "row"
            elif axes == [0] and shape == [rows]:
                pat = "col"
            else:
                return None
        if read.tensor == src and pat == "full" and kind == "map":
            step.read_pattern[read.data] = "acc"
            saw_src = True
            continue
        if read.tensor == src:
            return None  # add-steps may not read the running tensor
        step.read_pattern[read.data] = pat
        step.extra.append((read.tensor, pat))

    if kind == "map" and not saw_src:
        return None
    defined = set(step.read_pattern)
    for instr in kernel.expr.instrs:
        if instr.op not in _EPILOGUE_OPS:
            return None
        if any(arg not in defined for arg in instr.args):
            return None  # references a loop iterator
        if instr.res is not None:
            defined.add(instr.res)
    if kernel.expr.res not in defined:
        return None
    return step


class PallasEpilogueChain:
    """A sequence of folded epilogue steps applied to the accumulator."""

    def __init__(self, steps: list[_EpilogueStep], final_tensor: int,
                 rows: int, cols: int):
        self.steps = steps
        self.final_tensor = final_tensor
        self.rows, self.cols = rows, cols
        self.extra: list[tuple[int, str]] = [
            e for step in steps for e in step.extra
        ]

    def prepare(self, arr, pattern: str):
        """Bring an extra operand into the 2-D frame layout."""
        if pattern == "row":
            return arr.reshape(1, -1)
        if pattern == "col":
            return arr.reshape(-1, 1)
        return arr.reshape(self.rows, self.cols)

    def fn(self, acc, *blocks):
        it = iter(blocks)
        for step in self.steps:
            acc = step.fn(acc, it)
        return acc


def plan_epilogue_fusions(program, target, shapes, dtype, precision,
                          policy=None):
    """Plan matmul+epilogue-chain fusions for one target.

    For every scheduled Pallas-matched matmul, folds into its VMEM flush
    step (a) every additional accumulating writer of its output (bias
    kernels) and (b) the chain of single-consumer elementwise kernels
    downstream (activation, residual-style maps, rank-1 broadcasts) —
    dense+bias+relu(+more) becomes ONE Pallas kernel; chain intermediates
    never exist in HBM.  Transposed stores (``c[x, y]``) fuse too (the
    accumulator block transposes in VMEM).

    Returns ``(fused, skipped_kernels, skipped_tensors)``: ``fused[i]`` is
    the (PallasMatmul, PallasEpilogueChain) pair for the matmul at kernel
    index ``i``; ``skipped_kernels`` are the folded kernels' indices and
    ``skipped_tensors`` the intermediate tensors that no longer
    materialize.  Folding is only legal when each intermediate is a
    RESULT tensor, not the target output, written/read exclusively by the
    folded kernels.
    """
    from .jaxeval import KernelLowering

    kernels = target.kernels
    reads_of: dict[int, list[int]] = {}
    writes_of: dict[int, list[int]] = {}
    for idx, kernel in enumerate(kernels):
        for tid in kernel.input_tensors():
            reads_of.setdefault(tid, []).append(idx)
        if kernel.write is not None:
            writes_of.setdefault(kernel.write.tensor, []).append(idx)

    def lowering_for(kernel):
        try:
            low = KernelLowering(program, kernel, shapes, dtype, precision)
        except Exception:
            return None
        if not low._bounds_ok or low.dynamic_axes:
            return None
        return low

    fused: dict[int, tuple] = {}
    skipped_kernels: set[int] = set()
    skipped_tensors: set[int] = set()
    for idx in range(len(kernels) - 1):
        kernel = kernels[idx]
        if idx in skipped_kernels or kernel.write is None:
            continue
        if kernel.remat:
            # recompute kernels must go through KernelLowering.run, the
            # only place the CSE fence (optimization_barrier bundle) is
            # applied; fusing them would silently defeat rematerialization
            continue
        if kernel.write.accumulate != "add" or not is_scheduled(kernel):
            continue
        t1 = kernel.write.tensor
        if program.tensors[t1].kind != ir.TensorKind.RESULT:
            continue
        if t1 == target.output:
            continue
        low1 = lowering_for(kernel)
        if low1 is None:
            continue
        pm = PallasMatmul(low1, kernel)
        if not pm.ok:
            continue
        if policy is not None and not policy.contraction(
            pm.m, pm.n, pm.k
        ).use_pallas:
            continue  # run() will report the fallback for the scheduled kernel
        # frame: the value's [rows, cols] layout as stored
        rows, cols = (pm.n, pm.m) if pm.transposed else (pm.m, pm.n)

        steps: list[_EpilogueStep] = []
        folded: set[int] = set()      # kernel indices folded so far
        dropped: set[int] = set()     # intermediate tensors folded away

        def extras_ready(step: _EpilogueStep, kidx: int) -> bool:
            """Folding moves the kernel from slot ``kidx`` to the matmul's
            slot ``idx``; every extra operand must already hold its final
            value there — reject when any writer lands in (idx, kidx]
            (e.g. a residual produced by a branch flattened between the
            matmul and its consumer)."""
            for tid, _pat in step.extra:
                for w in writes_of.get(tid, []):
                    if idx < w <= kidx:
                        return False
            return True

        cur = t1
        ok = True
        while True:
            at_t1 = cur == t1  # t1 must fold away fully or not at all
            writers = writes_of.get(cur, [])
            readers = reads_of.get(cur, [])
            expected = folded | ({idx} if at_t1 else set())
            own = [w for w in writers if w not in expected]
            # absorb additional accumulating writers (bias kernels); each
            # must precede every reader (fold moves it to the matmul's
            # slot, which must not change what any reader observes) and
            # not belong to another fusion chain
            add_ok = True
            for w in own:
                low_w = lowering_for(kernels[w])
                step = (
                    _classify_step(low_w, kernels[w], cur, rows, cols, "add")
                    if low_w is not None and w not in skipped_kernels
                    and (not readers or w < min(readers))
                    else None
                )
                if step is None or not extras_ready(step, w):
                    add_ok = False
                    break
                steps.append(step)
                folded.add(w)
            if not add_ok or len(readers) != 1:
                ok = not at_t1
                break
            j = readers[0]
            consumer = kernels[j]
            low2 = lowering_for(consumer)
            step = (
                _classify_step(low2, consumer, cur, rows, cols, "map")
                if low2 is not None and j > idx and j not in skipped_kernels
                else None
            )
            if step is None or not extras_ready(step, j):
                ok = not at_t1
                break
            steps.append(step)
            folded.add(j)
            dropped.add(cur)
            cur = consumer.write.tensor
            if (
                program.tensors[cur].kind != ir.TensorKind.RESULT
                or cur == target.output
            ):
                break  # cur is the final landing tensor; stop folding

        if not ok or not steps:
            continue
        fused[idx] = (
            pm, PallasEpilogueChain(steps, cur, rows, cols)
        )
        skipped_kernels.update(folded)
        skipped_tensors.update(dropped)
    return fused, skipped_kernels, skipped_tensors


class PallasMapReduce:
    """Schedule-driven Pallas lowering for the map/reduce kernel family.

    Covers any kernel of the form

        out[i_w1, i_w2, ...] (+|max|min)= f(reads at full-range iterators)

    where ``f`` is a pure elementwise expression: the write's loop axes
    become the (tiled) parallel grid, the remaining loop axes are reduced
    inside the kernel (one may be gridded with a VMEM accumulator when the
    reduction extent exceeds the VMEM budget).  This is the TPU rebuild of
    the reference's general scheduled codegen (clgen.nim:249-257 emits any
    kernel body; tileLoops passes.nim:2043-2090 tiles any loop; cacheTensors
    passes.nim:2173-2323 stages reads through shared memory) — here tiles
    are BlockSpecs and every operand block is DMA-staged through VMEM by
    the Pallas pipeline.

    Layout strategy: every operand is embedded into the full loop-axis rank
    (size-1 dims for axes it does not cover), so blocks broadcast against
    each other with plain jnp semantics and the lane dim is the innermost
    loop.  Reads/writes whose axes are a *permutation* of loop order are
    transposed into loop order outside the kernel (a cheap XLA pass that
    usually fuses with the operand pad/copy); dynamic (iterator-dependent)
    loop bounds iterate their static hull with in-kernel identity masks —
    the same masked-compute form as the XLA general path (and the
    reference's bounds guards, passes.nim:2402-2569).  Anything else
    declines with a reason in ``self.why``.
    """

    def __init__(self, lowering, kernel: Kernel):
        self.low = lowering
        self.kernel = kernel
        self.why = ""
        self.ok = self._classify()

    def _decline(self, why: str) -> bool:
        self.why = why
        return False

    def _static_setup(self) -> Optional[dict]:
        """Evaluate kernel-level setup instructions to exact static
        values (shape queries and arithmetic on them — the reference's
        in-expression ``t.shape[d]``/``len`` surface, dsl.nim:109-133).
        Returns reg -> python value, or None when any instruction is not
        statically evaluable (epoch, arrays, debug stay on XLA paths)."""
        env: dict[int, object] = {}
        for instr in self.kernel.setup:
            v = _eval_static_instr(instr, env, self.low.shapes)
            if v is _NOT_STATIC:
                if instr.op is Op.EPOCH and instr.res is not None:
                    self.epoch_regs.add(instr.res)
                    continue
                return None
            if instr.res is not None:
                env[instr.res] = v
        return env

    def _linear_terms(self, index) -> Optional[tuple]:
        """Split a loop-bound LinearIndex into (const, [(axis, factor)...]).

        Iterator factors stay symbolic (evaluated per grid point as iota
        blocks in the kernel); everything else — setup registers (shape
        queries etc.) and the constant — must fold to one exact static
        int.  Returns None when it cannot."""
        from ..passes.shapes import eval_linear_interval

        low = self.low
        terms: list[tuple[int, int]] = []
        rest = ir.LinearIndex(setup=index.setup, constant=index.constant)
        for reg, f in index.factors.items():
            if reg in low.axis_of_reg:
                terms.append((low.axis_of_reg[reg], f))
            else:
                rest.factors[reg] = f
        iv = eval_linear_interval(rest, low.shapes, {})
        if iv is None or iv.min != iv.max:
            return None
        return int(iv.min), terms

    def _gather_dim(
        self, index, plain_info: dict, allow_pure: bool = False
    ) -> Optional[tuple]:
        """Classify a data-dependent read-dim index (the gather family:
        ``emb[to_index(tokens[n, t]), d]`` — clgen emits any computed
        index, clgen.nim:249-257).

        The index expression may reference loop iterators, statically
        folded setup registers, and the data registers of *plain* reads
        (all dims distinct full-range iterators) through the block-
        evaluator op set.  Returns ``(sorted gather axes, index-source
        data regs)`` — the loop axes the index varies over — or ``None``
        when the dim is not of this family (no data dependence, or an
        unsupported op/reg).

        With ``allow_pure`` the index may be pure iterator arithmetic
        with no data source — the computed-index fallback for non-affine
        index expressions (``a[i * j]``, ``a[(i + j) mod n]``) after the
        affine/stride/grouping analysis failed.  The same in-kernel
        one-hot-contraction gather evaluates it (the indices come from
        iota blocks alone)."""
        low = self.low
        gaxes: set[int] = set()
        srcs: set[int] = set()
        static_env = dict(self.setup_env)
        defined = set(self.setup_env)

        def resolve(reg) -> bool:
            if reg in defined:
                return True
            axis = low.axis_of_reg.get(reg)
            if axis is not None:
                gaxes.add(axis)
                self.iter_axes[reg] = axis
                defined.add(reg)
                return True
            if reg in plain_info:
                srcs.add(reg)
                gaxes.update(plain_info[reg])
                defined.add(reg)
                return True
            return False

        for instr in index.setup:
            v = _eval_static_instr(instr, static_env, low.shapes)
            if v is not _NOT_STATIC and instr.res is not None:
                static_env[instr.res] = v
                self.setup_env[instr.res] = v
                defined.add(instr.res)
                continue
            if instr.op not in _MAPREDUCE_OPS:
                return None
            if not all(resolve(a) for a in instr.args):
                return None
            if instr.res is not None:
                defined.add(instr.res)
        if not all(resolve(r) for r in index.factors):
            return None
        if not srcs and not allow_pure:
            return None  # pure iterator arithmetic: try affine forms first
        if not gaxes:
            return None  # constant index: stays on the XLA paths
        return sorted(gaxes), srcs

    def _affine_dim_plan(self, index, D: int, lane_axis: int):
        """Classify one read dim as an affine/strided/grouped plan.

        Returns ``(axis, plan, whole_axis)`` on success or the decline
        reason string when the dim is not of the single-iterator affine
        family (the caller then falls back to the computed-index
        gather)."""
        low = self.low
        deps = low._linear_deps(index)
        if len(deps) != 1:
            return "read index is not a single-iterator form"
        axis = next(iter(deps))
        L = low.sizes[axis]
        vec = low._static_dim_vector(index, axis)
        if vec is None or vec.shape != (L,):
            return "read index is not statically affine"
        c0 = int(vec[0])
        s = int(vec[1] - vec[0]) if L > 1 else 1
        if s >= 1 and np.array_equal(vec, np.arange(L) * s + c0):
            if axis != lane_axis and 0 <= c0 < s and D == s * L:
                # block-coverable phase read (pool windows): blocks
                # cover the s-wide band, strided slice in-kernel — the
                # axis may still tile/grid
                return axis, ("stride", s, c0, 0), False
            if c0 + s * (L - 1) < D and (
                axis != lane_axis or s == 1
            ) and (s == 1 or c0 + s * L <= D):
                # (the s > 1 form needs one extra trailing element so
                # the in-kernel stride-1 slice + phase-split stays in
                # range — Mosaic rejects strided slices, see
                # _strided_phase)
                # general shifted stencil (blur: img[y, x + 1]): the
                # read keeps the WHOLE dim resident per block and takes
                # a static in-kernel slice; the axis must not tile/grid
                # (overlapping windows cannot be expressed as disjoint
                # blocks).  On the lane axis only contiguous shifts
                # (s == 1) are attempted (strided lane slices are
                # Mosaic-hostile).
                return axis, ("slice", s, c0, D), True
            return (
                "affine read exceeds the tensor extent or is a "
                "strided lane-axis slice"
            )
        if axis == lane_axis:
            return "transformed read on the lane axis"
        if D >= 1 and L % D == 0 and np.array_equal(
            vec, np.repeat(np.arange(D), L // D)
        ):
            return axis, ("div", L // D, 0, 0), False
        return (
            "read index is neither affine (s*i + c) nor a "
            "grouping (i // k)"
        )

    def _classify(self) -> bool:
        low = self.low
        kernel = self.kernel
        write = kernel.write
        if write is None:
            return self._decline("no write")
        if write.is_raw and len(write.dims) != 1:
            return self._decline("multi-dim raw write")
        self.setup_env: dict[int, object] = {}
        # registers carrying the runtime epoch scalar (epoch() in LR
        # schedules etc.) — seeded in the kernel from a (1,...,1) int32
        # operand instead of declining
        self.epoch_regs: set[int] = set()
        if kernel.setup:
            env = self._static_setup()
            if env is None:
                return self._decline(
                    "kernel-level setup instructions are not static"
                )
            self.setup_env = env
        # dynamic (iterator-dependent) bounds: iterate the static hull and
        # mask points outside the true per-point [start, stop) with the
        # accumulation identity inside the kernel (the masked-compute form
        # of a triangular loop; reference bounds guards passes.nim:2402-2569)
        self.dyn_bounds: list[tuple] = []  # (axis, lo_terms, hi_terms)
        for a in low.dynamic_axes:
            loop = kernel.loops[a]
            lo = self._linear_terms(loop.start)
            hi = self._linear_terms(loop.stop)
            if lo is None or hi is None:
                return self._decline(
                    "dynamic loop bound is not affine in the iterators"
                )
            self.dyn_bounds.append((a, lo, hi))
        if not low._bounds_ok:
            return self._decline("empty loop range")
        if any(s != 0 for s in low.starts):
            return self._decline("nonzero loop start")
        if np.dtype(low.dtype) == np.float64:
            return self._decline("float64 (VPU computes in f32)")
        if not write.dims:
            return self._decline("scalar output")

        n = low.nloops
        out_shape = low.shapes[write.tensor]
        if write.is_raw:
            # flat `{i}` access (the activation family, dnn.nim:26-43):
            # the output is its row-major flattened 1-D view; lower()'s
            # final reshape restores the true shape
            out_shape = [int(np.prod(out_shape, dtype=np.int64))]
        self.read_axes: dict[int, list[int]] = {}  # data reg -> axes
        # data reg -> per-dim ("iter"|"stride"|"div"|"slice", param, off[, D])
        self.read_plans: dict[int, list[tuple]] = {}
        # data reg -> host-side transpose bringing the dims into loop order
        self.read_perms: dict[int, tuple] = {}
        # axes that must stay whole-in-block (shifted-slice reads)
        self.whole_axes: set[int] = set()
        # data regs read through flat `{i}` access (1-D flattened view)
        self.flat_reads: set[int] = set()
        # expr register -> loop axis (iterator references in the expression
        # or in gather index expressions; filled here and by the expr scan)
        self.iter_axes: dict[int, int] = {}
        # data reg -> gather plan for data-dependent (computed-index) reads:
        # {"dim", "V", "gaxes", "order"} — the gathered dim rides whole in
        # every block and the kernel gathers rows via a one-hot contraction
        # (MXU-native; TPU rebuild of clgen's computed-index reads,
        # clgen.nim:249-257)
        self.gather_reads: dict[int, dict] = {}
        # data-dependent write dim (the scatter-add family: embedding
        # gradients grad_emb[to_index(tok[i]), d] += g[i, d]); the
        # scattered dim rides whole in the out block and the kernel
        # accumulates rows via a transposed one-hot contraction
        self.scatter: Optional[dict] = None
        # plain reads (all dims distinct pure full-range iterators) are
        # legal index sources for gather reads
        plain_info: dict[int, list[int]] = {}
        for r in kernel.reads:
            if r.is_raw:
                continue
            shp = low.shapes[r.tensor]
            ax = [low._pure_iter(ix) for ix in r.dims]
            if (
                all(a is not None for a in ax)
                and len(set(ax)) == len(ax)
                and all(
                    low._full_axis(a, shp[i])  # type: ignore[arg-type]
                    for i, a in enumerate(ax)
                )
            ):
                plain_info[r.data] = ax  # type: ignore[assignment]

        out_axes: list[int] = []
        const_dims = 0
        sdims: list[tuple] = []  # (write dim, gaxes, src regs)
        for d, index in enumerate(write.dims):
            axis = low._pure_iter(index)
            if axis is None:
                # constant-0 position into a size-1 dim: the loss/scalar
                # family (loss[0] = ...) — every loop axis reduces
                if (not index.setup and not index.factors
                        and index.constant == 0 and out_shape[d] == 1):
                    const_dims += 1
                    continue
                g = None
                if not write.is_raw:
                    g = self._gather_dim(index, plain_info)
                    if g is None:
                        # non-affine pure-iterator write index
                        # (out[(i*j) mod n] += v): the scatter
                        # routes it, indices from iota alone
                        g = self._gather_dim(
                            index, plain_info, allow_pure=True
                        )
                if g is not None:
                    # data-dependent write dim (scatter-add, or
                    # max/min-accumulating scatter: the cmpred combine
                    # swaps sum for max/min with the matching identity)
                    sdims.append((d, g[0], g[1]))
                    continue
                return self._decline("write index is not a full-range iterator")
            if not low._full_axis(axis, out_shape[d]):
                return self._decline("write index is not a full-range iterator")
            out_axes.append(axis)
        if len(set(out_axes)) != len(out_axes):
            return self._decline("repeated write iterator")
        if sdims:
            if const_dims:
                return self._decline(
                    "constant write dims combined with a data-dependent dim"
                )
            sd = [d for d, _g, _s in sdims]
            sgaxes = sorted(set().union(*(g for _d, g, _s in sdims)))
            extents = [int(out_shape[d]) for d in sd]
            V, strides = _flat_fold(sd, out_shape)
            so = sorted(out_axes)
            # same mode split as reads: the transposed one-hot MXU
            # contraction's (V, Rs) output is layout-safe only in the
            # on-chip-validated out_axes == [lane] class; every other
            # class uses the compare-reduce scatter (value masked by a
            # trailing-V iota compare, scatter axes summed in place —
            # no reshapes)
            # the one-hot contraction is inherently additive; max/min
            # scatters always take the compare-reduce form
            if (
                len(sd) == 1
                and so == [n - 1]
                and (not sgaxes or max(sgaxes) < n - 1)
                and write.accumulate == "add"
            ):
                smode = "onehot"
            else:
                smode = "cmpred"
            self.scatter = {
                "dims": sd,
                "extents": extents,
                "V": V,
                "gaxes": list(sgaxes),
                "indices": [(write.dims[d], strides[d]) for d in sd],
                "mode": smode,
            }
        # write dims may visit the loop axes in any order: the kernel
        # computes its output in loop order and lower() transposes the
        # result into write-dim order (transpose-family kernels; the
        # reference's clgen emits any computed body, clgen.nim:249-257)
        self.write_axes = list(out_axes)
        out_axes = sorted(out_axes)

        lane_axis = n - 1  # embedded lane dim (after rank-1 padding too)
        for read in kernel.reads:
            shape = low.shapes[read.tensor]
            if read.is_raw:
                if len(read.dims) != 1:
                    return self._decline("multi-dim raw read")
                shape = [int(np.prod(shape, dtype=np.int64))]
                self.flat_reads.add(read.data)
            axes = []
            plans = []  # per dim: (kind, param, offset, whole_D)
            # per dim: ("iter", axis) | ("affine", axis, plan, whole)
            #        | ("computed", gaxes, src_regs)
            dim_class: list[tuple] = []
            for d, index in enumerate(read.dims):
                axis = low._pure_iter(index)
                if axis is not None and low._full_axis(axis, shape[d]):
                    dim_class.append(("iter", axis))
                    continue
                # data-dependent (computed) index -> the gather family:
                # emb[to_index(tokens[n, t]), d] and friends.  The
                # kernel computes the index block and gathers.
                g = None if read.is_raw else self._gather_dim(
                    index, plain_info
                )
                if g is not None:
                    dim_class.append(("computed",) + g)
                    continue
                # windowed/strided read family: s*i + c (pool windows,
                # shifted stencils) and i // k (upsampling) — the
                # reference's clgen emits any computed body
                # (clgen.nim:249-257); here the input block covers the
                # transformed extent and the kernel slices/repeats it.
                got = self._affine_dim_plan(
                    index, int(shape[d]), lane_axis
                )
                if not isinstance(got, str):
                    dim_class.append(("affine",) + got)
                    continue
                if not read.is_raw:
                    # non-affine pure iterator arithmetic (a[i*j],
                    # a[(i+j) mod n]): the computed-index gather
                    # evaluates the index from iota blocks alone
                    g = self._gather_dim(
                        index, plain_info, allow_pure=True
                    )
                    if g is not None:
                        dim_class.append(("computed",) + g)
                        continue
                return self._decline(got)
            gds = [d for d, c in enumerate(dim_class) if c[0] == "computed"]
            if gds:
                # fold ALL non-plain dims into ONE flat computed gather
                # over the row-major-flattened computed subspace: affine
                # dims (strided/grouped/shifted) coexisting with a
                # computed dim convert to computed form — their index
                # expressions evaluate in-kernel like any other
                for d, c in enumerate(dim_class):
                    if c[0] != "affine":
                        continue
                    g = self._gather_dim(
                        read.dims[d], plain_info, allow_pure=True
                    )
                    if g is None:
                        return self._decline(
                            "strided/grouped dims combined with a "
                            "data-dependent dim"
                        )
                    dim_class[d] = ("computed",) + g
                gds = [
                    d for d, c in enumerate(dim_class) if c[0] == "computed"
                ]
                iter_ds = [
                    d for d, c in enumerate(dim_class) if c[0] == "iter"
                ]
                axes = [dim_class[d][1] for d in iter_ds]
                if len(set(axes)) != len(axes):
                    return self._decline("repeated read iterator")
                gaxes = sorted(set().union(*(dim_class[d][1] for d in gds)))
                src_regs = set().union(*(dim_class[d][2] for d in gds))
                V, strides = _flat_fold(gds, shape)
                indices = [(read.dims[d], strides[d]) for d in gds]
                sorted_iter = sorted(iter_ds, key=lambda d: dim_class[d][1])
                axes = sorted(axes)
                # two in-kernel gather formulations:
                # * "onehot" — one-hot [M, V] MXU contraction against the
                #   whole-resident gathered dim.  Its output reshape
                #   (M, R) -> embedded blocks is a pure sublane split ONLY
                #   when the rest axes are exactly the lane axis — the
                #   on-chip-validated shape class (any other class trips
                #   Mosaic's infer-vector-layout "unsupported shape cast"
                #   on real hardware; the AOT net does not run that pass).
                # * "cmpred" — broadcast compare against a trailing-V iota
                #   and reduce over the minor axis (where + sum picks
                #   exactly one element, so it is as exact as the one-hot
                #   dot).  No reshapes at all, so it is layout-safe for
                #   every shape class: gathers on the lane axis, empty
                #   rest, interleaved or self-referencing iterator axes,
                #   multiple computed dims.
                if (
                    len(gds) == 1
                    and axes == [lane_axis]
                    and (not gaxes or max(gaxes) < lane_axis)
                ):
                    # gathered dim first (whole-resident), lane follows
                    order = gds + sorted_iter
                    mode = "onehot"
                else:
                    # gathered dims LAST (trailing flat V), rest in loop
                    # order
                    order = sorted_iter + gds
                    mode = "cmpred"
                self.gather_reads[read.data] = {
                    "V": V,
                    "gaxes": list(gaxes),
                    "order": order,
                    "indices": indices,
                    "mode": mode,
                }
                plans = [("iter", 1, 0, 0)] * len(axes)
            else:
                for c in dim_class:
                    if c[0] == "iter":
                        axes.append(c[1])
                        plans.append(("iter", 1, 0, 0))
                    else:
                        _, axis, plan, whole = c
                        axes.append(axis)
                        plans.append(plan)
                        if whole:
                            self.whole_axes.add(axis)
                if len(set(axes)) != len(axes):
                    return self._decline("repeated read iterator")
                if axes != sorted(axes):
                    # permuted read: transpose the operand into loop
                    # order outside the kernel (fuses with the operand
                    # pad/copy)
                    order = sorted(range(len(axes)), key=lambda i: axes[i])
                    self.read_perms[read.data] = tuple(order)
                    axes = [axes[i] for i in order]
                    plans = [plans[i] for i in order]
            self.read_axes[read.data] = axes
            self.read_plans[read.data] = plans

        # expression: elementwise over the read registers; references to
        # loop iterators are allowed — they materialize in the kernel as
        # broadcasted_iota index blocks offset by the grid position
        # (index-dependent masks: triangular/banded kernels, clgen.nim
        # emits any computed body at clgen.nim:249-257)
        defined = set(self.read_axes) | set(self.setup_env) | self.epoch_regs
        static_env = dict(self.setup_env)
        for instr in kernel.expr.instrs:
            # static subexpressions (shape queries and arithmetic over
            # them) fold to constants seeded into the kernel env — the
            # mean family out[y] = a[y, x] / n (dsl.nim:109-133)
            v = _eval_static_instr(instr, static_env, low.shapes)
            if v is not _NOT_STATIC and instr.res is not None:
                static_env[instr.res] = v
                self.setup_env[instr.res] = v
                defined.add(instr.res)
                continue
            if instr.op is Op.EPOCH:
                if instr.res is not None:
                    self.epoch_regs.add(instr.res)
                    defined.add(instr.res)
                continue
            if instr.op not in _MAPREDUCE_OPS:
                return self._decline(f"unsupported op {instr.op.value}")
            for arg in instr.args:
                if arg not in defined:
                    axis = low.axis_of_reg.get(arg)
                    if axis is None:
                        return self._decline(
                            "expression uses a register defined outside "
                            "the kernel"
                        )
                    self.iter_axes[arg] = axis
                    defined.add(arg)
            if instr.res is not None:
                defined.add(instr.res)
        if kernel.expr.res not in defined:
            return self._decline("empty expression")

        self.out_axes = out_axes
        self.red_axes = [a for a in range(n) if a not in out_axes]

        # contraction-shaped kernels (pure product of >=2 reads sharing a
        # reduction axis) belong on the MXU einsum/PallasMatmul paths —
        # unless the bounds are dynamic (the MXU paths require static
        # rectangular iteration; the emitter's hull masks handle it here)
        # or a gather read is involved (the einsum path takes only plain
        # iterator reads)
        if (write.accumulate == "add" and not self.dyn_bounds
                and not self.gather_reads and self.scatter is None
                and self._looks_contraction()):
            return self._decline("contraction (MXU einsum path)")

        return self._plan_blocks()

    def _looks_contraction(self) -> bool:
        defs = {i.res: i for i in self.kernel.expr.instrs}

        def mul_leaves(reg) -> Optional[list[int]]:
            if reg in self.read_axes:
                return [reg]
            instr = defs.get(reg)
            if instr is not None and instr.op == Op.MUL:
                left = mul_leaves(instr.args[0])
                right = mul_leaves(instr.args[1])
                if left is not None and right is not None:
                    return left + right
            return None

        leaves = mul_leaves(self.kernel.expr.res)
        if leaves is None or len(leaves) < 2:
            return False
        red = set(self.red_axes)

        def covers_red_plainly(reg) -> bool:
            # the einsum path only takes PLAIN iterator reads: a leaf
            # covering the reduction through a transformed plan (shifted
            # correlation a[y, x] * a[y, x+1]) is not routable there
            return any(
                a in red and plan[0] == "iter"
                for a, plan in zip(self.read_axes[reg],
                                   self.read_plans[reg])
            )

        covering = sum(1 for reg in leaves if covers_red_plainly(reg))
        return covering >= 2

    def _plan_blocks(self) -> bool:
        low = self.low
        kernel = self.kernel
        n = low.nloops
        sizes = low.sizes
        loops = kernel.loops
        block = list(sizes)  # start whole; shrink under the VMEM budget

        # Mosaic alignment: every block is embedded at full loop rank
        # (see lower()), so the last loop axis lands on the lane dim
        # (partial blocks must be 128-aligned) and the second-to-last on
        # the sublane dim (8/16-aligned by dtype).  A partial block that
        # is misaligned on those dims is rejected by the TPU lowering
        # even though interpret mode accepts it.
        sub_req = _SUBLANE.get(str(np.dtype(low.dtype)), 8)
        lane_axis = n - 1
        sub_axis = n - 2 if n >= 2 else None

        def align_of(a: int) -> int:
            if a == lane_axis:
                return 128
            if a == sub_axis:
                return sub_req
            return 1

        # per-axis block-size requirement: Mosaic alignment, plus k-
        # divisibility for grouped (i // k) reads (the input block is
        # block/k and must itself stay aligned)
        from math import gcd

        req = {a: align_of(a) for a in range(n)}
        for data, axes in self.read_axes.items():
            for a, (kind, p, _c, _D) in zip(axes, self.read_plans[data]):
                if kind == "div":
                    need = p * align_of(a)
                    req[a] = req[a] * need // gcd(req[a], need)

        def _iter_only(axis: int) -> bool:
            """Every read covering ``axis`` reads it as a plain iterator."""
            for data, axes in self.read_axes.items():
                for a, (kind, _p, _c, _D) in zip(axes, self.read_plans[data]):
                    if a == axis and kind != "iter":
                        return False
            return True

        self.pad_sizes = list(sizes)
        user_tiled: set[int] = set()
        shared: set[int] = set()
        shared.update(self.whole_axes)  # shifted-slice reads: overlapping
        # windows cannot be expressed as disjoint blocks, so those axes
        # stay whole-in-block (like share_cache)
        for axis, loop in enumerate(loops):
            if loop.schedule.share_cache:
                shared.add(axis)  # whole extent stays resident
                continue
            if not loop.schedule.tile:
                continue
            if axis in self.whole_axes:
                if min(loop.schedule.tile_size, sizes[axis]) < sizes[axis]:
                    return self._decline(
                        f"loop {axis} carries a shifted-slice read and "
                        f"cannot tile (overlapping windows)"
                    )
                continue
            t = min(loop.schedule.tile_size, sizes[axis])
            if sizes[axis] % t == 0 and (
                t == sizes[axis] or t % req[axis] == 0
            ):
                block[axis] = t
                user_tiled.add(axis)
                continue
            # masked path for non-divisible/misaligned tiles: pad the
            # extent up to aligned tile multiples, guard the padded
            # positions in the kernel (identity-masked reductions) and
            # slice the output — the TPU analog of the reference's
            # bounds guards on non-divisible shapes (passes.nim:2402-2569,
            # golden-tested at test_gpu.nim:252-266).  Needs plain-
            # iterator reads on the axis (strided/grouped read plans
            # would need their own padding arithmetic).
            if not _iter_only(axis):
                return self._decline(
                    f"tile size {t} does not divide extent {sizes[axis]} "
                    f"on a strided/grouped read axis (no mask support)"
                )
            t = min(
                _round_up(t, req[axis]), _round_up(sizes[axis], req[axis])
            )
            block[axis] = t
            self.pad_sizes[axis] = _round_up(sizes[axis], t)
            user_tiled.add(axis)

        # at most one reduction axis may be gridded (VMEM accumulator with
        # first/last-step predicates); pick the largest non-phantom one
        read_covered = set()
        for axes in self.read_axes.values():
            read_covered.update(axes)
        # gather axes drive the in-kernel index blocks (gidx applies the
        # grid offset), so a reduction axis consumed only through a
        # computed index may still grid/shrink like a plain-read axis
        for g in self.gather_reads.values():
            read_covered.update(g["gaxes"])
        if self.scatter is not None:
            read_covered.update(self.scatter["gaxes"])
        candidates = [
            a for a in self.red_axes
            if a in read_covered and a not in shared
        ]
        self.red_grid_axis: Optional[int] = None
        for a in self.red_axes:
            if a in user_tiled and block[a] < sizes[a]:
                if self.red_grid_axis is not None:
                    return self._decline("more than one tiled reduction axis")
                self.red_grid_axis = a

        def block_bytes() -> int:
            item = np.dtype(low.dtype).itemsize
            total = 0
            for read in kernel.reads:
                g = self.gather_reads.get(read.data)
                if g is not None:
                    # gathered dim whole-resident + one-hot [M, V] and
                    # gathered-value [M, R] f32 intermediates
                    R = 1
                    for a in self.read_axes[read.data]:
                        R *= block[a]
                    M = 1
                    for a in g["gaxes"]:
                        M *= block[a]
                    if g["mode"] == "cmpred":
                        # staged [rest-blocks, V] operand + the compare/
                        # select intermediate over the joint block x V
                        E = 1
                        for a in set(g["gaxes"]) | set(
                            self.read_axes[read.data]
                        ):
                            E *= block[a]
                        total += g["V"] * R * (2 * item + 4)
                        total += E * g["V"] * 8
                        continue
                    total += g["V"] * R * (2 * item + 4)
                    total += M * g["V"] * 4 + M * R * 4
                    continue
                elems = 1
                for a, (kind, p, _c, D_) in zip(
                    self.read_axes[read.data], self.read_plans[read.data]
                ):
                    if kind == "stride":
                        elems *= block[a] * p
                    elif kind == "div":
                        elems *= max(1, block[a] // p)
                    elif kind == "slice":
                        elems *= D_  # whole dim resident
                    else:
                        elems *= block[a]
                # double-buffered DMA block + the f32 copy the kernel makes
                total += elems * (2 * item + 4)
            out_elems = 1
            for a in self.out_axes:
                out_elems *= block[a]
            if self.scatter is not None:
                # scattered dim rides whole in the out block, plus the
                # one-hot [M, V] and pre-scatter [M, R] f32 intermediates
                # (onehot) or the joint-block x V masked intermediate
                # (cmpred)
                Ms = 1
                for a in self.scatter["gaxes"]:
                    Ms *= block[a]
                if self.scatter["mode"] == "cmpred":
                    E = 1
                    for a in set(self.scatter["gaxes"]) | set(
                        self.out_axes
                    ):
                        E *= block[a]
                    total += E * self.scatter["V"] * 8
                else:
                    total += (
                        Ms * self.scatter["V"] * 4 + Ms * out_elems * 4
                    )
                out_elems *= self.scatter["V"]
            # out block is double-buffered by the pipeline like the reads
            total += out_elems * (2 * item + 4)
            # the broadcast elementwise intermediate spans the full loop
            # rank (out x reduction blocks) before the in-block reduction
            value_elems = 1
            for a in range(n):
                value_elems *= block[a]
            total += value_elems * 4
            if self.red_grid_axis is not None or any(
                block[a] < sizes[a] for a in self.red_axes
            ):
                total += out_elems * 4  # accumulator scratch
            return total

        budget = _PLANNER_BUDGET
        # shrink loop: first grid the largest reduction candidate, then halve
        # untiled output axes (user tile sizes are respected: if they do not
        # fit, decline rather than silently changing the schedule)
        while block_bytes() > budget:
            # user tile sizes are respected here too: a user-tiled
            # reduction axis never shrinks further (decline below instead
            # of silently changing the schedule).  Shrinks go through
            # _best_block_aligned so a partial block on the lane/sublane
            # dims stays Mosaic-legal; an axis with no aligned smaller
            # divisor simply cannot shrink and is skipped.
            cands = sorted(
                (a for a in candidates if block[a] > 1
                 and a not in user_tiled
                 and (self.red_grid_axis in (None, a))),
                key=lambda a: -block[a],
            )
            shrunk = False
            for a in cands:
                if block[a] <= 128:
                    continue
                nb = _best_block_aligned(sizes[a], block[a] // 2, req[a])
                if nb < block[a]:
                    block[a] = nb
                    self.red_grid_axis = a if block[a] < sizes[a] else None
                    shrunk = True
                    break
            if shrunk:
                continue
            outs = sorted(
                (a for a in self.out_axes
                 if a not in user_tiled and a not in shared and block[a] > 1),
                key=lambda a: -block[a],
            )
            for a in outs:
                nb = _best_block_aligned(sizes[a], block[a] // 2, req[a])
                if nb < block[a]:
                    block[a] = nb
                    shrunk = True
                    break
            if shrunk:
                continue
            return self._decline("blocks exceed the VMEM budget")

        self.block = block
        self.total_bytes = sum(
            int(np.prod(low.shapes[r.tensor], dtype=np.int64))
            for r in kernel.reads
        ) * np.dtype(low.dtype).itemsize + int(
            np.prod(low.shapes[kernel.write.tensor], dtype=np.int64)
        ) * np.dtype(low.dtype).itemsize
        # computed-index kernels touch V candidate values per loop
        # position (compare-reduce select / one-hot MACs) — in-kernel
        # work the HBM byte count does not see; the routing policy
        # charges it against the Pallas side (policy.mapreduce)
        loop_total = 1
        for a in range(n):
            loop_total *= int(self.pad_sizes[a])
        work = 0
        for g in self.gather_reads.values():
            work += loop_total * g["V"]
        if self.scatter is not None:
            work += loop_total * self.scatter["V"]
        self.gather_work = work
        return True

    # ------------------------------------------------------------------
    def lower(self, tensors: dict):
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from ..interp import accumulation_identity
        from ..ops.mosaic_check import check_specs

        low = self.low
        kernel = self.kernel
        write = kernel.write
        assert write is not None
        n = low.nloops
        sizes = low.sizes
        block = self.block
        mode = write.accumulate

        # embed everything into the full loop rank (leading dummy axis when
        # the kernel is rank-1 so the single loop lands on the lane dim)
        pad = 1 if n == 1 else 0
        rank = n + pad

        def embed_shape(axes: list[int], extents: list[int]) -> tuple:
            shape = [1] * rank
            for a, e in zip(axes, extents):
                shape[a + pad] = e
            return tuple(shape)

        # grid: output axes with >1 block, then the gridded reduction axis
        # (extents padded up to block multiples for masked ragged tiles)
        psizes = self.pad_sizes
        grid_axes = [a for a in self.out_axes if psizes[a] // block[a] > 1]
        red_gridded = (
            self.red_grid_axis is not None
            and psizes[self.red_grid_axis] // block[self.red_grid_axis] > 1
        )
        if red_gridded:
            grid_axes.append(self.red_grid_axis)
        grid = tuple(psizes[a] // block[a] for a in grid_axes) or (1,)
        grid_pos = {a: i for i, a in enumerate(grid_axes)}

        def index_map_for(axes: list[int]):
            covered = set(axes)

            def index_map(*gids):
                out = []
                for d in range(rank):
                    axis = d - pad
                    if axis in covered and axis in grid_pos:
                        out.append(gids[grid_pos[axis]])
                    else:
                        out.append(0)
                return tuple(out)

            return index_map

        in_specs = []
        operands = []
        # per read: in-kernel transforms [(embedded pos, kind, param, off)]
        read_transforms: list[list[tuple]] = []
        for read in kernel.reads:
            axes = self.read_axes[read.data]
            plans = self.read_plans[read.data]
            g = self.gather_reads.get(read.data)
            if g is not None and g["mode"] == "onehot":
                # gathered operand: the data-dependent dim leads (whole-
                # resident, extent V); iterator dims follow in loop order
                arr = jnp.transpose(tensors[read.tensor], g["order"])
                arr = arr.reshape(
                    (g["V"],) + embed_shape(axes, [sizes[a] for a in axes])
                )
                arr = _pad_to(
                    arr,
                    (g["V"],) + embed_shape(axes, [psizes[a] for a in axes]),
                )
                operands.append(arr)
                inner_map = index_map_for(axes)

                def gather_map(*gids, _inner=inner_map):
                    return (0,) + _inner(*gids)

                in_specs.append(
                    pl.BlockSpec(
                        (g["V"],)
                        + embed_shape(axes, [block[a] for a in axes]),
                        gather_map,
                    )
                )
                read_transforms.append(None)  # gathered in the body
                continue
            if g is not None:
                # cmpred: gathered dim TRAILS (whole-resident V on the
                # minor axis), iterator dims lead in loop order — the
                # compare-reduce gather never reshapes the block
                arr = jnp.transpose(tensors[read.tensor], g["order"])
                arr = arr.reshape(
                    embed_shape(axes, [sizes[a] for a in axes]) + (g["V"],)
                )
                arr = _pad_to(
                    arr,
                    embed_shape(axes, [psizes[a] for a in axes])
                    + (g["V"],),
                )
                operands.append(arr)
                inner_map = index_map_for(axes)

                def gather_map_t(*gids, _inner=inner_map):
                    return _inner(*gids) + (0,)

                in_specs.append(
                    pl.BlockSpec(
                        embed_shape(axes, [block[a] for a in axes])
                        + (g["V"],),
                        gather_map_t,
                    )
                )
                read_transforms.append(None)  # gathered in the body
                continue
            extents, pextents, blocks, transforms = _operand_layout(
                axes, plans, sizes, psizes, block, pad
            )
            arr = tensors[read.tensor]
            if read.data in self.flat_reads:
                arr = arr.reshape(-1)
            perm = self.read_perms.get(read.data)
            if perm is not None:
                arr = jnp.transpose(arr, perm)
            arr = arr.reshape(embed_shape(axes, extents))
            arr = _pad_to(arr, embed_shape(axes, pextents))
            operands.append(arr)
            in_specs.append(
                pl.BlockSpec(embed_shape(axes, blocks), index_map_for(axes))
            )
            read_transforms.append(transforms)
        epoch_items = sorted(self.epoch_regs)
        if epoch_items:
            # the runtime epoch scalar rides as a (1,...,1) int32 operand
            # (LR-schedule expressions: epoch() inside scheduled kernels)
            operands.append(
                jnp.asarray(self.low.epoch).astype(jnp.int32).reshape(
                    (1,) * rank
                )
            )
            in_specs.append(
                pl.BlockSpec((1,) * rank, lambda *gids: (0,) * rank)
            )
        scatter = self.scatter
        out_block = embed_shape(self.out_axes, [block[a] for a in self.out_axes])
        out_embed = embed_shape(
            self.out_axes, [psizes[a] for a in self.out_axes]
        )
        if scatter is not None and scatter["mode"] == "onehot":
            # the scattered dim leads the out block, whole-resident
            out_block = (scatter["V"],) + out_block
            out_embed = (scatter["V"],) + out_embed
            inner_out_map = index_map_for(self.out_axes)

            def scatter_out_map(*gids, _inner=inner_out_map):
                return (0,) + _inner(*gids)

            out_spec = pl.BlockSpec(out_block, scatter_out_map)
        elif scatter is not None:
            # cmpred scatter: the flattened scattered subspace TRAILS the
            # out block (whole-resident V on the minor axis; layout-safe)
            out_block = out_block + (scatter["V"],)
            out_embed = out_embed + (scatter["V"],)
            inner_out_map = index_map_for(self.out_axes)

            def scatter_out_map_t(*gids, _inner=inner_out_map):
                return _inner(*gids) + (0,)

            out_spec = pl.BlockSpec(out_block, scatter_out_map_t)
        else:
            out_spec = pl.BlockSpec(out_block, index_map_for(self.out_axes))

        sa_set = set(scatter["gaxes"]) if scatter is not None else set()
        # scatter axes reduce via the one-hot contraction, not the
        # generic in-block reduce
        red_positions = [a + pad for a in self.red_axes if a not in sa_set]
        identity = accumulation_identity(mode)
        n_reads = len(kernel.reads)
        n_ops = n_reads + (1 if epoch_items else 0)
        red_dim = grid_pos.get(self.red_grid_axis) if red_gridded else None
        masked_red = [a for a in self.red_axes if psizes[a] != sizes[a]]
        iter_items = sorted(self.iter_axes.items())
        dyn_bounds = self.dyn_bounds
        # static setup registers (shape queries etc.) enter the kernel as
        # plain scalar constants (python ints keep the static index-op
        # paths in eval_elementwise; np.float32 pins scalar precision;
        # jnp arrays would be rejected as captured consts by pallas_call)
        setup_items = [
            (reg, bool(v) if isinstance(v, bool)
             else int(v) if isinstance(v, (int, np.integer))
             else np.float32(v))
            for reg, v in sorted(self.setup_env.items())
        ]

        gather_reads = self.gather_reads
        read_axes_map = self.read_axes

        def body(*refs):
            o_ref = refs[n_ops]

            def gidx(axis):
                """Global loop index along ``axis`` as an int32 block."""
                shape = embed_shape([axis], [block[axis]])
                idx = jax.lax.broadcasted_iota(jnp.int32, shape, axis + pad)
                if axis in grid_pos:
                    idx = idx + pl.program_id(grid_pos[axis]) * block[axis]
                return idx

            env = {}
            deferred = []  # gather reads: need the index-source blocks
            for read, ref, transforms in zip(
                kernel.reads, refs[:n_reads], read_transforms
            ):
                g = gather_reads.get(read.data)
                if g is not None:
                    deferred.append((read, ref, g))
                    continue
                env[read.data] = _apply_read_transforms(
                    ref[...].astype(jnp.float32), transforms
                )
            for reg, axis in iter_items:
                env[reg] = gidx(axis)
            for reg, v in setup_items:
                env[reg] = v
            if epoch_items:
                ev = refs[n_reads][...]
                for reg in epoch_items:
                    env[reg] = ev
            for read, ref, g in deferred:
                # computed-index gather: evaluate each computed dim's
                # index block and combine them into ONE flat index over
                # the row-major-flattened gathered subspace, then select
                # (one-hot MXU contraction or compare-reduce; both are
                # exact row selections)
                idxv = _eval_flat_index(g["indices"], env)
                if g["mode"] == "cmpred":
                    # layout-safe gather: compare the index block against
                    # a trailing-V iota and reduce the minor axis (where +
                    # sum touches exactly one element per position, so it
                    # is as exact as the one-hot selection; out-of-range
                    # hull/padded indices match nothing and contribute 0,
                    # masked to the identity below like the other
                    # families)
                    V = g["V"]
                    idx = jnp.asarray(idxv).astype(jnp.int32)[..., None]
                    vio = jax.lax.broadcasted_iota(
                        jnp.int32, (1,) * rank + (V,), rank
                    )
                    src = ref[...].astype(jnp.float32)
                    env[read.data] = jnp.where(
                        idx == vio, src, jnp.float32(0)
                    ).sum(axis=-1)
                    continue
                gaxes = g["gaxes"]
                rest = read_axes_map[read.data]
                M = 1
                for a in gaxes:
                    M *= block[a]
                R = 1
                for a in rest:
                    R *= block[a]
                gshape = embed_shape(gaxes, [block[a] for a in gaxes])
                idx = jnp.asarray(idxv).astype(jnp.int32)
                idx = jnp.broadcast_to(idx, gshape).reshape(M, 1)
                onehot = (
                    idx
                    == jax.lax.broadcasted_iota(jnp.int32, (M, g["V"]), 1)
                ).astype(jnp.float32)
                src = ref[...].astype(jnp.float32).reshape(g["V"], R)
                val = jnp.dot(
                    onehot,
                    src,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
                env[read.data] = val.reshape(
                    embed_shape(
                        gaxes + rest, [block[a] for a in gaxes + rest]
                    )
                )
            value = eval_elementwise(kernel.expr.instrs, kernel.expr.res, env)
            value = jnp.asarray(value, jnp.float32)
            if value.ndim != rank:
                value = jnp.broadcast_to(value, (1,) * rank)
            # guard padded reduction positions with the accumulation
            # identity (the bounds-guard analog); broadcast first so a
            # value constant along the axis is masked per-position, not
            # phantom-multiplied by the padded block size below
            for a in masked_red:
                p = a + pad
                if value.shape[p] == 1:
                    shp = list(value.shape)
                    shp[p] = block[a]
                    value = jnp.broadcast_to(value, shp)
                value = jnp.where(
                    gidx(a) < sizes[a], value, jnp.float32(identity)
                )
            # dynamic-bound masks: hull points outside the true per-point
            # [start, stop) contribute the accumulation identity (the
            # masked-compute form of a triangular loop)
            for a, (lo_c, lo_t), (hi_c, hi_t) in dyn_bounds:
                p = a + pad
                if value.shape[p] == 1:
                    shp = list(value.shape)
                    shp[p] = block[a]
                    value = jnp.broadcast_to(value, shp)
                it = gidx(a)
                lo = jnp.int32(lo_c)
                for dep, f in lo_t:
                    lo = lo + jnp.int32(f) * gidx(dep)
                hi = jnp.int32(hi_c)
                for dep, f in hi_t:
                    hi = hi + jnp.int32(f) * gidx(dep)
                value = jnp.where(
                    (it >= lo) & (it < hi), value, jnp.float32(identity)
                )
            # reduce the in-block reduction extents
            for p in red_positions:
                if value.shape[p] > 1:
                    value = _acc_reduce_jnp(value, p, mode)
                elif mode == "add" and block[p - pad] > 1:
                    value = value * jnp.float32(block[p - pad])
            if scatter is not None:
                # data-dependent write dims: combine the computed dims'
                # index blocks into ONE flat index over the row-major-
                # flattened scattered subspace
                idxv = _eval_flat_index(scatter["indices"], env)
                sgax = scatter["gaxes"]
                if scatter["mode"] == "cmpred":
                    # layout-safe scatter: mask the value by a trailing-V
                    # iota compare and sum the non-written scatter axes
                    # in place (each target row v collects exactly the
                    # positions whose computed index equals v)
                    V = scatter["V"]
                    full = list(value.shape)
                    for a in sgax:
                        full[a + pad] = block[a]
                    value = jnp.broadcast_to(value, full)
                    idx = jnp.asarray(idxv).astype(jnp.int32)[..., None]
                    vio = jax.lax.broadcasted_iota(
                        jnp.int32, (1,) * rank + (V,), rank
                    )
                    contrib = jnp.where(
                        idx == vio, value[..., None], jnp.float32(identity)
                    )
                    out_set = set(self.out_axes)
                    for a in sgax:
                        if contrib.shape[a + pad] > 1 and a not in out_set:
                            contrib = _acc_reduce_jnp(
                                contrib, a + pad, mode
                            )
                    value = jnp.broadcast_to(contrib, out_block)
                else:
                    # route each scatter-axis position's value to its
                    # target row via a transposed one-hot contraction
                    # (MXU; grad_emb[tok[i], d] += g[i, d])
                    Ms = 1
                    for a in sgax:
                        Ms *= block[a]
                    Rs = 1
                    for a in self.out_axes:
                        Rs *= block[a]
                    idx = jnp.asarray(idxv).astype(jnp.int32)
                    idx = jnp.broadcast_to(
                        idx, embed_shape(sgax, [block[a] for a in sgax])
                    ).reshape(Ms, 1)
                    onehot = (
                        idx
                        == jax.lax.broadcasted_iota(
                            jnp.int32, (Ms, scatter["V"]), 1
                        )
                    ).astype(jnp.float32)
                    full = embed_shape(
                        sgax + self.out_axes,
                        [block[a] for a in sgax + self.out_axes],
                    )
                    value = jnp.broadcast_to(value, full).reshape(Ms, Rs)
                    value = jax.lax.dot_general(
                        onehot,
                        value,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    ).reshape(out_block)
            else:
                value = jnp.broadcast_to(value, out_block)

            if red_dim is None:
                o_ref[...] = value.astype(o_ref.dtype)
                return
            acc_ref = refs[n_ops + 1]

            @pl.when(pl.program_id(red_dim) == 0)
            def _init():
                acc_ref[...] = jnp.full_like(acc_ref, jnp.float32(identity))

            if mode == "add":
                acc_ref[...] += value
            elif mode == "max":
                acc_ref[...] = jnp.maximum(acc_ref[...], value)
            else:
                acc_ref[...] = jnp.minimum(acc_ref[...], value)

            @pl.when(pl.program_id(red_dim) == pl.num_programs(red_dim) - 1)
            def _flush():
                o_ref[...] = acc_ref[...].astype(o_ref.dtype)

        scratch = (
            [pltpu.VMEM(out_block, jnp.float32)] if red_dim is not None else []
        )
        semantics = tuple(
            "arbitrary" if (red_dim is not None and i == red_dim) else "parallel"
            for i in range(len(grid))
        )
        from ..ops.mosaic_check import pallas_interpret

        interpret = pallas_interpret()
        check_specs(in_specs, [o.shape for o in operands],
                    kernel="pallas_map_reduce")
        check_specs([out_spec], [tuple(out_embed)],
                    kernel="pallas_map_reduce", kind="output")
        value = pl.pallas_call(
            body,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(out_embed, np.dtype(low.dtype)),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=semantics,
                vmem_limit_bytes=VMEM_LIMIT_BYTES,
            ),
            interpret=interpret,
        )(*operands)
        if scatter is not None and scatter["mode"] == "onehot":
            value = value.reshape(
                [scatter["V"]] + [psizes[a] for a in self.out_axes]
            )
            if any(psizes[a] != sizes[a] for a in self.out_axes):
                value = value[
                    (slice(None),)
                    + tuple(slice(0, sizes[a]) for a in self.out_axes)
                ]
            # arrange [V, out axes ascending] into write-dim order
            perm = []
            for d, index in enumerate(write.dims):
                if d == scatter["dims"][0]:
                    perm.append(0)
                else:
                    axis = low._pure_iter(index)
                    perm.append(1 + self.out_axes.index(axis))
            if perm != list(range(len(perm))):
                value = value.transpose(perm)
            value = value.reshape(low.shapes[write.tensor])
        elif scatter is not None:
            # cmpred scatter: [out axes ascending, flat V]; split V back
            # into the computed dims' extents, then arrange into
            # write-dim order
            value = value.reshape(
                [psizes[a] for a in self.out_axes] + [scatter["V"]]
            )
            if any(psizes[a] != sizes[a] for a in self.out_axes):
                value = value[
                    tuple(slice(0, sizes[a]) for a in self.out_axes)
                    + (slice(None),)
                ]
            value = value.reshape(
                [sizes[a] for a in self.out_axes] + scatter["extents"]
            )
            n_out = len(self.out_axes)
            perm = []
            for d, index in enumerate(write.dims):
                if d in scatter["dims"]:
                    perm.append(n_out + scatter["dims"].index(d))
                else:
                    axis = low._pure_iter(index)
                    perm.append(self.out_axes.index(axis))
            if perm != list(range(len(perm))):
                value = value.transpose(perm)
            value = value.reshape(low.shapes[write.tensor])
        else:
            value = value.reshape([psizes[a] for a in self.out_axes])
            if any(psizes[a] != sizes[a] for a in self.out_axes):
                value = value[
                    tuple(slice(0, sizes[a]) for a in self.out_axes)
                ]
            # permuted write dims: the kernel output is in loop order;
            # transpose back into write-dim order
            if self.write_axes != self.out_axes:
                value = value.transpose(
                    [self.out_axes.index(a) for a in self.write_axes]
                )
            # constant-0 write dims (loss[0] = ...) re-expand to the tensor
            # shape (size-1 dims the axis loop skipped)
            value = value.reshape(low.shapes[write.tensor])

        prev = tensors[write.tensor]
        if mode == "add":
            return prev + value
        if mode == "max":
            return jnp.maximum(prev, value)
        return jnp.minimum(prev, value)


def _acc_reduce_jnp(vals, axis: int, mode: str):
    if mode == "add":
        return vals.sum(axis=axis, keepdims=True)
    if mode == "max":
        return vals.max(axis=axis, keepdims=True)
    return vals.min(axis=axis, keepdims=True)


# ---------------------------------------------------------------------------
# row-chain fusion: consecutive map/reduce kernels fused into ONE Pallas
# kernel with VMEM-resident intermediates (softmax: max -> sum -> normalize)
# ---------------------------------------------------------------------------


class PallasRowChain:
    """A chain of map/reduce kernels fused into one Pallas kernel.

    The canonical case is the reference's two/three-kernel softmax
    (dnn.nim:90: row max, exp-sum, normalize) — XLA lowers those as 2-3
    HBM passes over the input; fused, the row block is read ONCE into
    VMEM, every intermediate (row max, row sums) lives in registers, and
    only the final result is written back.  Row-family chains (softmax,
    layer_norm, rms_norm) are bandwidth-bound, so halving the HBM traffic
    is the schedule-driven win the emitter exists for (the TPU analog of
    the reference's shared-memory cached fusion, passes.nim:2173-2323).

    Constraints (checked by ``plan_rowchain_fusions``): every member
    classifies as PallasMapReduce over the SAME loop-size vector; every
    axis reduced by any member stays whole-in-block (the fused grid runs
    over row blocks only); intermediates are written once and read only
    inside the chain.
    """

    def __init__(self, members: list, member_kernels: list,
                 slot_of: dict, operands_meta: list, final_idx: int,
                 block: list, psizes: list, grid_axes: list,
                 escaping: list = ()):
        self.members = members              # PallasMapReduce per member
        self.kernels = member_kernels       # ir.Kernel per member
        self.slot_of = slot_of              # (member_i, data_reg) -> slot
        self.operands_meta = operands_meta  # per slot: (tid, axes, plans, perm, flat)
        self.final_idx = final_idx
        self.block = block
        self.psizes = psizes
        self.grid_axes = grid_axes
        # member positions whose intermediate is read outside the chain
        # and must materialize as an extra pallas output
        self.escaping = list(escaping)
        low = members[0].low
        item = np.dtype(low.dtype).itemsize
        self.operand_bytes = sum(
            int(np.prod(low.shapes[tid], dtype=np.int64))
            for tid, _a, _p, _pm, _f in operands_meta
        ) * item
        out_tids = [member_kernels[-1].write.tensor] + [
            member_kernels[mi].write.tensor for mi in self.escaping
        ]
        self.out_bytes = sum(
            int(np.prod(low.shapes[t], dtype=np.int64)) for t in out_tids
        ) * item
        self.total_bytes = self.operand_bytes + self.out_bytes

    # ------------------------------------------------------------------
    def lower(self, tensors: dict):
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl

        from ..ops.mosaic_check import check_specs

        members = self.members
        final = members[self.final_idx]
        low = members[0].low
        n = low.nloops
        sizes = low.sizes
        block = self.block
        psizes = self.psizes

        pad = 1 if n == 1 else 0
        rank = n + pad

        def embed_shape(axes, extents):
            shape = [1] * rank
            for a, e in zip(axes, extents):
                shape[a + pad] = e
            return tuple(shape)

        grid = tuple(psizes[a] // block[a] for a in self.grid_axes) or (1,)
        grid_pos = {a: i for i, a in enumerate(self.grid_axes)}

        def index_map_for(axes):
            covered = set(axes)

            def index_map(*gids):
                out = []
                for d in range(rank):
                    axis = d - pad
                    if axis in covered and axis in grid_pos:
                        out.append(gids[grid_pos[axis]])
                    else:
                        out.append(0)
                return tuple(out)

            return index_map

        # operand arrays + BlockSpecs + in-kernel transforms, one per slot
        in_specs, operands, slot_transforms = [], [], []
        for tid, axes, plans, perm, flat in self.operands_meta:
            extents, pextents, blocks, transforms = _operand_layout(
                axes, plans, sizes, psizes, block, pad
            )
            arr = tensors[tid]
            if flat:
                arr = arr.reshape(-1)
            if perm is not None:
                arr = jnp.transpose(arr, perm)
            arr = arr.reshape(embed_shape(axes, extents))
            arr = _pad_to(arr, embed_shape(axes, pextents))
            operands.append(arr)
            in_specs.append(
                pl.BlockSpec(embed_shape(axes, blocks), index_map_for(axes))
            )
            slot_transforms.append(transforms)

        # outputs: the final result first, then escaping intermediates
        # (read outside the chain — materialized from the same kernel)
        out_members = [self.final_idx] + self.escaping
        out_blocks, out_embeds, out_specs = [], [], []
        for mi in out_members:
            oa = members[mi].out_axes
            out_blocks.append(embed_shape(oa, [block[a] for a in oa]))
            out_embeds.append(embed_shape(oa, [psizes[a] for a in oa]))
            out_specs.append(
                pl.BlockSpec(out_blocks[-1], index_map_for(oa))
            )
        out_pos = {mi: i for i, mi in enumerate(out_members)}
        n_slots = len(operands)
        final_i = self.final_idx
        slot_of = self.slot_of
        # member evaluation plans captured for the traced body.  NOTE:
        # no identity masks are needed here — reduction axes are frozen
        # whole-in-block (never padded); only row axes pad, and padded
        # rows slice off the outputs.
        member_plans = []
        for mi, (m, kern) in enumerate(zip(members, self.kernels)):
            setup_items = [
                (reg, bool(v) if isinstance(v, bool)
                 else int(v) if isinstance(v, (int, np.integer))
                 else np.float32(v))
                for reg, v in sorted(m.setup_env.items())
            ]
            member_plans.append((
                m, kern, sorted(m.iter_axes.items()), setup_items,
                [a + pad for a in m.red_axes],
                kern.write.accumulate,
            ))

        def body(*refs):
            o_refs = refs[n_slots:]

            def gidx(axis):
                shape = embed_shape([axis], [block[axis]])
                idx = jax.lax.broadcasted_iota(jnp.int32, shape, axis + pad)
                if axis in grid_pos:
                    idx = idx + pl.program_id(grid_pos[axis]) * block[axis]
                return idx

            slot_vals = [
                _apply_read_transforms(ref[...].astype(jnp.float32), tr)
                for ref, tr in zip(refs[:n_slots], slot_transforms)
            ]

            locals_: dict[int, object] = {}  # intermediate tid -> value
            for mi, (m, kern, iter_items, setup_items, red_positions,
                     mode) in enumerate(member_plans):
                env = {}
                for read in kern.reads:
                    if read.tensor in locals_:
                        env[read.data] = locals_[read.tensor]
                    else:
                        env[read.data] = slot_vals[slot_of[(mi, read.data)]]
                for reg, axis in iter_items:
                    env[reg] = gidx(axis)
                for reg, v in setup_items:
                    env[reg] = v
                value = eval_elementwise(
                    kern.expr.instrs, kern.expr.res, env
                )
                value = jnp.asarray(value, jnp.float32)
                if value.ndim != rank:
                    value = jnp.broadcast_to(value, (1,) * rank)
                for p in red_positions:
                    if value.shape[p] > 1:
                        value = _acc_reduce_jnp(value, p, mode)
                    elif mode == "add" and sizes[p - pad] > 1:
                        value = value * jnp.float32(sizes[p - pad])
                if mi in out_pos:
                    ref = o_refs[out_pos[mi]]
                    ref[...] = jnp.broadcast_to(
                        value, out_blocks[out_pos[mi]]
                    ).astype(ref.dtype)
                if mi != final_i:
                    locals_[kern.write.tensor] = value

        from ..ops.mosaic_check import pallas_interpret

        interpret = pallas_interpret()
        check_specs(in_specs, [o.shape for o in operands],
                    kernel="pallas_row_chain")
        check_specs(out_specs, [tuple(e) for e in out_embeds],
                    kernel="pallas_row_chain", kind="output")
        from jax.experimental.pallas import tpu as pltpu

        values = pl.pallas_call(
            body,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[
                jax.ShapeDtypeStruct(tuple(e), np.dtype(low.dtype))
                for e in out_embeds
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",) * len(grid),
                vmem_limit_bytes=VMEM_LIMIT_BYTES,
            ),
            interpret=interpret,
        )(*operands)

        results: dict[int, object] = {}
        for mi, value in zip(out_members, values):
            m = members[mi]
            write = self.kernels[mi].write
            value = value.reshape([psizes[a] for a in m.out_axes])
            if any(psizes[a] != sizes[a] for a in m.out_axes):
                value = value[
                    tuple(slice(0, sizes[a]) for a in m.out_axes)
                ]
            value = value.reshape(low.shapes[write.tensor])
            prev = tensors[write.tensor]
            mode = write.accumulate
            if mode == "add":
                results[write.tensor] = prev + value
            elif mode == "max":
                results[write.tensor] = jnp.maximum(prev, value)
            else:
                results[write.tensor] = jnp.minimum(prev, value)
        return results


def plan_rowchain_fusions(program, target, shapes, dtype, precision,
                          policy=None, consumed=frozenset()):
    """Plan map/reduce row-chain fusions for one target.

    Greedily groups maximal runs of consecutive kernels where: the head
    is a scheduled PallasMapReduce-matched kernel writing a RESULT
    tensor; each follower classifies too, reads at least one in-group
    intermediate, and shares the head's loop-size vector with positional
    axis correspondence; every intermediate is written exactly once and
    read only inside the group.  Returns ``(fused, skipped_kernels,
    skipped_tensors)`` like ``plan_epilogue_fusions`` — ``fused[i]`` is
    the PallasRowChain for the head at kernel index ``i``.

    ``consumed`` holds kernel indices already claimed by the epilogue
    planner (matmul chains take precedence).
    """
    from .jaxeval import KernelLowering

    if policy is not None and policy.mode == "ignore":
        # every chain would be declined at the decision point anyway;
        # skip the per-kernel classification work (1-core host)
        return {}, set(), set()

    kernels = target.kernels
    reads_of: dict[int, list[int]] = {}
    writes_of: dict[int, list[int]] = {}
    for idx, kernel in enumerate(kernels):
        for tid in kernel.input_tensors():
            reads_of.setdefault(tid, []).append(idx)
        if kernel.write is not None:
            writes_of.setdefault(kernel.write.tensor, []).append(idx)

    def member_for(kernel):
        """Classify one kernel for chain membership, or None."""
        if kernel.write is None or kernel.write.is_raw or kernel.remat:
            return None
        if kernel.extern:
            return None
        try:
            low = KernelLowering(program, kernel, shapes, dtype, precision)
        except Exception:
            return None
        if not low._bounds_ok or low.dynamic_axes:
            return None
        pmr = PallasMapReduce(low, kernel)
        if not pmr.ok or pmr.dyn_bounds:
            return None
        if pmr.gather_reads:
            return None  # gather members stay single-kernel
        if pmr.epoch_regs:
            return None  # epoch operand plumbing is single-kernel only
        if pmr.write_axes != pmr.out_axes:
            return None
        if len(kernel.write.dims) != len(pmr.out_axes):
            return None  # constant-0 dims (loss family) stay single
        return pmr

    fused: dict[int, PallasRowChain] = {}
    skipped_kernels: set[int] = set()
    skipped_tensors: set[int] = set()

    idx = 0
    while idx < len(kernels) - 1:
        kernel = kernels[idx]
        if (idx in consumed or idx in skipped_kernels
                or kernel.write is None or not is_scheduled(kernel)):
            idx += 1
            continue
        t0 = kernel.write.tensor
        if (program.tensors[t0].kind != ir.TensorKind.RESULT
                or t0 == target.output):
            idx += 1
            continue
        head = member_for(kernel)
        if head is None:
            idx += 1
            continue
        sizes = tuple(head.low.sizes)

        members = [head]
        member_kernels = [kernel]
        member_idx = [idx]
        produced = {t0: 0}  # tid -> member position
        j = idx + 1
        while j < len(kernels):
            if j in consumed:
                break
            nxt = kernels[j]
            if nxt.write is None:
                break
            in_group_reads = [
                r for r in nxt.reads if r.tensor in produced
            ]
            if not in_group_reads:
                break
            m = member_for(nxt)
            if m is None or tuple(m.low.sizes) != sizes:
                break
            # positional axis correspondence: in-group reads must visit
            # the producer's out axes exactly (same loop-axis embedding)
            # a permuted (transposed) in-group read would receive the
            # UN-transposed loop-order value from locals_ — reject
            # (read_axes is already re-sorted for permuted reads, so the
            # axes comparison alone cannot catch it)
            corresponds = all(
                m.read_axes[r.data]
                == members[produced[r.tensor]].out_axes
                and all(p[0] == "iter"
                        for p in m.read_plans[r.data])
                and r.data not in m.flat_reads
                and r.data not in m.read_perms
                for r in in_group_reads
            )
            if not corresponds:
                break
            members.append(m)
            member_kernels.append(nxt)
            member_idx.append(j)
            tw = nxt.write.tensor
            if (program.tensors[tw].kind == ir.TensorKind.RESULT
                    and tw != target.output):
                produced[tw] = len(members) - 1
            else:
                break  # landed on a param/cache/output: chain ends here
            j += 1

        # shrink from the tail until every non-final intermediate has a
        # single writer (its fused member); intermediates read OUTSIDE
        # the group are legal — they become extra pallas outputs
        # ("escaping": e.g. a training target's gradient kernels read
        # the forward softmax's max/sums)
        def group_ok():
            if len(members) < 2:
                return False
            return all(
                writes_of.get(kern.write.tensor) == [pos]
                for kern, pos in zip(member_kernels[:-1], member_idx[:-1])
            )

        while len(members) >= 2 and not group_ok():
            members.pop()
            member_kernels.pop()
            member_idx.pop()
        if len(members) < 2:
            idx += 1
            continue

        group = set(member_idx)
        escaping = [
            mi
            for mi, (kern, pos) in enumerate(
                zip(member_kernels[:-1], member_idx[:-1])
            )
            if not set(reads_of.get(kern.write.tensor, ())) <= group
        ]

        plan = _plan_rowchain_blocks(members, member_kernels, escaping)
        if plan is None:
            idx += 1
            continue
        slot_of, operands_meta, block, psizes, grid_axes = plan
        # an escaping intermediate must be written exactly once per grid
        # step (its out axes must cover every grid axis); a narrower
        # output would be re-written by concurrent megacore programs
        if any(
            not set(grid_axes) <= set(members[mi].out_axes)
            for mi in escaping
        ):
            idx += 1
            continue
        chain = PallasRowChain(
            members, member_kernels, slot_of, operands_meta,
            len(members) - 1, block, psizes, grid_axes,
            escaping=escaping,
        )
        if policy is not None and not policy.rowchain(
            chain.operand_bytes, chain.out_bytes, len(members)
        ).use_pallas:
            idx += 1
            continue
        fused[idx] = chain
        skipped_kernels.update(member_idx[1:])
        esc_set = set(escaping)
        skipped_tensors.update(
            k.write.tensor
            for mi, k in enumerate(member_kernels[:-1])
            if mi not in esc_set  # escaping intermediates materialize
        )
        idx = member_idx[-1] + 1
    return fused, skipped_kernels, skipped_tensors


def _plan_rowchain_blocks(members, member_kernels, escaping=()):
    """Block/grid plan for a row chain, or None when it cannot fuse.

    Every axis reduced by any member (or carrying a transformed read)
    stays whole-in-block; remaining row axes may tile/grid (masked to
    padded multiples like the single-kernel planner).  The VMEM budget
    counts every distinct operand block, the broadcast intermediates and
    the out block; row blocks shrink (then the fusion declines) when it
    does not fit."""
    from math import gcd

    low = members[0].low
    n = low.nloops
    sizes = list(low.sizes)

    red_union: set[int] = set()
    frozen: set[int] = set()  # axes that must stay whole
    for m in members:
        red_union.update(m.red_axes)
        frozen.update(m.whole_axes)
        for data, plans in m.read_plans.items():
            for a, (kind, _p, _c, _D) in zip(m.read_axes[data], plans):
                if kind != "iter":
                    frozen.add(a)
    frozen |= red_union
    for m in members:
        for axis, loop in enumerate(m.kernel.loops):
            if loop.schedule.share_cache:
                frozen.add(axis)

    grid_axes = [a for a in range(n) if a not in frozen]
    if not grid_axes:
        return None  # nothing to grid: a single block would cover all

    # operand slots (deduped across members)
    slot_of: dict[tuple, int] = {}
    operands_meta: list[tuple] = []
    produced = {k.write.tensor for k in member_kernels[:-1]}
    for mi, (m, kern) in enumerate(zip(members, member_kernels)):
        for read in kern.reads:
            if read.tensor in produced:
                continue
            key = (
                read.tensor,
                tuple(m.read_axes[read.data]),
                tuple(m.read_plans[read.data]),
                m.read_perms.get(read.data),
                read.data in m.flat_reads,
            )
            if key not in slot_of:
                slot_of[key] = len(operands_meta)
                operands_meta.append(
                    (read.tensor, list(m.read_axes[read.data]),
                     list(m.read_plans[read.data]),
                     m.read_perms.get(read.data),
                     read.data in m.flat_reads)
                )
            slot_of[(mi, read.data)] = slot_of[key]

    # alignment requirements (same rules as the single-kernel planner)
    sub_req = _SUBLANE.get(str(np.dtype(low.dtype)), 8)
    lane_axis = n - 1
    sub_axis = n - 2 if n >= 2 else None

    def align_of(a):
        if a == lane_axis:
            return 128
        if a == sub_axis:
            return sub_req
        return 1

    req = {a: align_of(a) for a in range(n)}
    for _tid, axes, plans, _perm, _flat in operands_meta:
        for a, (kind, p, _c, _D) in zip(axes, plans):
            if kind == "div":
                need = p * align_of(a)
                req[a] = req[a] * need // gcd(req[a], need)

    block = list(sizes)
    psizes = list(sizes)
    user_tiled: set[int] = set()
    for a in grid_axes:
        tiles = [
            min(m.kernel.loops[a].schedule.tile_size, sizes[a])
            for m in members
            if m.kernel.loops[a].schedule.tile
        ]
        if not tiles:
            continue
        t = min(tiles)
        user_tiled.add(a)
        if sizes[a] % t == 0 and (t == sizes[a] or t % req[a] == 0):
            block[a] = t
        else:
            t = min(_round_up(t, req[a]), _round_up(sizes[a], req[a]))
            block[a] = t
            psizes[a] = _round_up(sizes[a], t)

    def block_bytes():
        item = np.dtype(low.dtype).itemsize
        total = 0
        for _tid, axes, plans, _perm, _flat in operands_meta:
            elems = 1
            for a, (kind, p, _c, D_) in zip(axes, plans):
                if kind == "stride":
                    elems *= block[a] * p
                elif kind == "div":
                    elems *= max(1, block[a] // p)
                elif kind == "slice":
                    elems *= D_
                else:
                    elems *= block[a]
            total += elems * (2 * item + 4)
        value_elems = 1
        for a in range(n):
            value_elems *= block[a]
        # one broadcast intermediate per member (conservative: they are
        # live one at a time, but locals persist across members)
        total += value_elems * 4 * len(members)
        # output blocks: the final member plus every escaping
        # intermediate materialized from the same kernel
        for mi in [len(members) - 1, *escaping]:
            out_elems = 1
            for a in members[mi].out_axes:
                out_elems *= block[a]
            total += out_elems * (item + 4)
        return total

    budget = _PLANNER_BUDGET
    while block_bytes() > budget:
        # user tile sizes are respected (decline over silently changing
        # the schedule, same as the single-kernel planner)
        cands = sorted(
            (a for a in grid_axes if block[a] > 1 and a not in user_tiled),
            key=lambda a: -block[a],
        )
        shrunk = False
        for a in cands:
            nb = _best_block_aligned(sizes[a], block[a] // 2, req[a])
            if nb < block[a] and psizes[a] == sizes[a]:
                block[a] = nb
                shrunk = True
                break
        if not shrunk:
            return None
    grid_axes = [a for a in grid_axes if psizes[a] // block[a] > 1]
    return slot_of, operands_meta, block, psizes, grid_axes
