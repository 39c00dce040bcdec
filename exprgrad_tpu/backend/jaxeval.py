"""Lowering of structured kernels to JAX/XLA operations.

This replaces the reference's LLVM code generator (llvmgen.nim) and OpenCL
generator (clgen.nim).  Design: a kernel is a loop nest with an expression
accumulated into a write location.  Instead of emitting scalar loops, each
kernel is lowered to whole-array XLA operations chosen by pattern:

* **contraction** — the expression is a product of tensor reads and every
  access index is a plain loop iterator: lowered to ``jnp.einsum`` with
  ``preferred_element_type``, which XLA tiles onto the MXU.  This covers
  matmul/dense forward AND the autodiff-derived backward kernels (which are
  themselves einsums).
* **direct reads/writes** — accesses whose indices are distinct full-range
  iterators become transposes/reshapes (no gather); the expression runs as
  fused VPU elementwise code; reduction axes become ``sum``.
* **general** — arbitrary affine/computed indices (convolution windows,
  ``x div 2`` upsampling, scatter-add gradients) use gather +
  ``.at[].add()`` scatter over the broadcasted loop grid.

All kernels of a target execute inside ONE ``jax.jit`` so XLA fuses across
kernel boundaries — the analog of the reference's single straight-line
function per target (llvmgen.nim:529-563), but with the compiler doing the
scheduling.
"""

from __future__ import annotations

import string
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import ir
from ..errors import ModelRuntimeError, ShapeError
from ..ir import Kernel, LinearIndex, Op, Program
from ..passes.shapes import resolve_loop_bounds


def _trunc_div(a, b):
    q = jnp.floor_divide(a, b)
    r = a - q * b
    # Nim-style truncated division: bump the floored quotient where the
    # operand signs differ and a remainder exists (see interp._trunc_div).
    adjust = (r != 0) & ((jnp.asarray(a) < 0) != (jnp.asarray(b) < 0))
    return q + adjust.astype(q.dtype)


def _trunc_mod(a, b):
    return a - _trunc_div(a, b) * b


class _ArrayVal:
    __slots__ = ("data", "array_ndim")

    def __init__(self, data, array_ndim: int) -> None:
        self.data = data
        self.array_ndim = array_ndim



def _acc_reduce(vals, axis: int, mode: str, keepdims: bool = True):
    if mode == "add":
        return vals.sum(axis=axis, keepdims=keepdims)
    if mode == "max":
        return vals.max(axis=axis, keepdims=keepdims)
    return vals.min(axis=axis, keepdims=keepdims)


def _acc_combine(out, vals, mode: str):
    if mode == "add":
        return out + vals
    if mode == "max":
        return jnp.maximum(out, vals)
    return jnp.minimum(out, vals)


class KernelLowering:
    """Lower one kernel given concrete shapes; called inside jit tracing."""

    def __init__(
        self,
        program: Program,
        kernel: Kernel,
        shapes: dict[int, list[int]],
        dtype,
        precision=None,
        policy=None,
        extern_memo: Optional[dict] = None,
    ) -> None:
        self.program = program
        self.kernel = kernel
        self.shapes = shapes
        self.dtype = dtype
        self.precision = precision
        self.policy = policy
        self.extern_memo = extern_memo if extern_memo is not None else {}
        self.nloops = len(kernel.loops)
        self.starts: list[int] = []
        self.sizes: list[int] = []
        self.axis_of_reg: dict[int, int] = {}
        self.env: dict[int, object] = {}
        self.dynamic_axes: list[int] = []
        self._bounds_ok = self._eval_bounds()

    # ------------------------------------------------------------------
    def _eval_bounds(self) -> bool:
        for loop in self.kernel.loops:
            if not loop.has_bounds:
                raise ModelRuntimeError(
                    "loop range could not be inferred; use a bounded iterator"
                )
        try:
            self.starts, self.sizes, self.dynamic_axes = resolve_loop_bounds(
                self.kernel.loops, self.shapes
            )
        except ShapeError as err:
            raise ModelRuntimeError(str(err)) from err
        for axis, loop in enumerate(self.kernel.loops):
            self.axis_of_reg[loop.iter_reg] = axis
        return all(s > 0 for s in self.sizes)

    def _pure_iter(self, index: LinearIndex) -> Optional[int]:
        """Loop axis when index == one plain iterator."""
        reg = index.only_register()
        if reg is not None and reg in self.axis_of_reg and not index.setup:
            return self.axis_of_reg[reg]
        return None

    def _full_axis(self, axis: int, size: int) -> bool:
        return self.starts[axis] == 0 and self.sizes[axis] == size

    # ------------------------------------------------------------------
    # fast path: contraction -> einsum (MXU)
    # ------------------------------------------------------------------
    def _try_contraction(self, tensors: dict):
        kernel = self.kernel
        write = kernel.write
        assert write is not None
        if write.is_raw or kernel.setup:
            return None
        # write dims: distinct pure full-range iters
        out_shape = self.shapes[write.tensor]
        out_axes: list[int] = []
        for dim, index in enumerate(write.dims):
            axis = self._pure_iter(index)
            if axis is None or not self._full_axis(axis, out_shape[dim]):
                return None
            out_axes.append(axis)
        if len(set(out_axes)) != len(out_axes):
            return None
        # reads: non-raw, pure full-range iters (repeats allowed -> diagonal,
        # bail out for simplicity)
        reads_by_reg = {}
        for read in kernel.reads:
            if read.is_raw:
                return None
            shape = self.shapes[read.tensor]
            axes = []
            for dim, index in enumerate(read.dims):
                axis = self._pure_iter(index)
                if axis is None or not self._full_axis(axis, shape[dim]):
                    return None
                axes.append(axis)
            if len(set(axes)) != len(axes):
                return None
            reads_by_reg[read.data] = (read.tensor, axes)

        # expression must be a product of reads and scalar literals
        defs = {i.res: i for i in kernel.expr.instrs}

        memo: dict = {}

        def walk(reg):
            if reg not in memo:
                memo[reg] = _walk(reg)
            return memo[reg]

        def _walk(reg):
            if reg in reads_by_reg:
                return [reg], 1.0
            instr = defs.get(reg)
            if instr is None:
                return None
            if instr.op == Op.MUL:
                left = walk(instr.args[0])
                right = walk(instr.args[1])
                if left and right:
                    return left[0] + right[0], left[1] * right[1]
            elif instr.op == Op.SCALAR:
                return [], instr.scalar_lit
            elif instr.op == Op.NEG:
                inner = walk(instr.args[0])
                if inner:
                    return inner[0], -inner[1]
            elif instr.op == Op.DIV:
                left = walk(instr.args[0])
                right = walk(instr.args[1])
                if left and right and not right[0]:
                    return left[0], left[1] / right[1]
            return None

        assert kernel.expr.res is not None
        parsed = walk(kernel.expr.res)
        if parsed is None or not parsed[0]:
            return None
        factor_regs, const = parsed

        letters = string.ascii_letters
        covered: set[int] = set()
        in_specs = []
        operands = []
        for reg in factor_regs:
            tensor, axes = reads_by_reg[reg]
            in_specs.append("".join(letters[a] for a in axes))
            operands.append(tensors[tensor])
            covered.update(axes)
        out_spec = "".join(letters[a] for a in out_axes if a in covered)
        spec = ",".join(in_specs) + "->" + out_spec

        value = jnp.einsum(
            spec,
            *operands,
            preferred_element_type=self.dtype,
            precision=self.precision,
        )
        if const != 1.0:
            value = value * self.dtype(const)
        # phantom axes: in neither reads nor write -> multiply by trip count
        for axis in range(self.nloops):
            if axis not in covered and axis not in out_axes:
                value = value * self.dtype(self.sizes[axis])
        # broadcast axes: in write but not in any read
        missing = [a for a in out_axes if a not in covered]
        if missing:
            kept = [a for a in out_axes if a in covered]
            shape = [
                self.sizes[a] if a in covered else 1 for a in out_axes
            ]
            perm = [kept.index(a) for a in sorted(kept, key=out_axes.index)]
            # value currently ordered by out_spec order == write-dim order of
            # covered axes, so only expand dims:
            value = value.reshape(shape)
            value = jnp.broadcast_to(value, [self.sizes[a] for a in out_axes])
        return tensors[write.tensor] + value.astype(self.dtype)

    # ------------------------------------------------------------------
    # general vectorized path
    # ------------------------------------------------------------------
    def _grid_slot(self, axis: int):
        shape = [1] * self.nloops
        shape[axis] = self.sizes[axis]
        return jnp.arange(
            self.starts[axis], self.starts[axis] + self.sizes[axis]
        ).reshape(shape)

    def eval_instrs(self, instrs, tensors) -> None:
        env = self.env
        dtype = self.dtype
        for instr in instrs:
            op = instr.op
            a = [env[x] for x in instr.args]
            if op == Op.IDX:
                value = instr.index_lit
            elif op == Op.SCALAR:
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
            elif op == Op.SELECT:
                value = jnp.where(a[0], a[1], a[2])
            elif op == Op.TO_SCALAR:
                value = jnp.asarray(a[0]).astype(dtype)
            elif op == Op.TO_INDEX:
                value = jnp.trunc(jnp.asarray(a[0])).astype(jnp.int32)
            elif op == Op.SHAPE:
                value = self.shapes[instr.tensor][instr.dim]
            elif op == Op.LEN:
                value = int(np.prod(self.shapes[instr.tensor], dtype=np.int64))
            elif op == Op.SHAPE_LEN:
                value = len(self.shapes[instr.tensor])
            elif op == Op.EPOCH:
                value = self.epoch
            elif op in (Op.DEBUG_SCALAR, Op.DEBUG_INDEX):
                jax.debug.print(instr.label + ": {}", a[0])
                value = a[0]
            elif op == Op.ARRAY:
                value = self._make_array(a)
            elif op == Op.ARRAY_LEN:
                av = a[0]
                value = av.data.shape[av.data.ndim - av.array_ndim]
            elif op == Op.ARRAY_READ:
                value = self._array_read(a[0], a[1])
            else:
                raise ModelRuntimeError(f"cannot lower {op.value}")
            if instr.res is not None:
                env[instr.res] = value

    def _make_array(self, items):
        if items and isinstance(items[0], _ArrayVal):
            inner = items[0].array_ndim
            data = jnp.stack([it.data for it in items], axis=-inner - 1)
            return _ArrayVal(data, inner + 1)
        data = jnp.stack([jnp.asarray(v, self.dtype) for v in items], axis=-1)
        return _ArrayVal(data, 1)

    def _array_read(self, av, idx):
        axis = av.data.ndim - av.array_ndim
        if isinstance(idx, (int, np.integer)):
            data = jnp.take(av.data, int(idx), axis=axis)
            if av.array_ndim == 1:
                return data
            return _ArrayVal(data, av.array_ndim - 1)
        idx = jnp.asarray(idx)
        grid_shape = np.broadcast_shapes(av.data.shape[:axis], idx.shape)
        data = jnp.broadcast_to(av.data, grid_shape + av.data.shape[axis:])
        axis = data.ndim - av.array_ndim
        idx_e = jnp.broadcast_to(
            idx.reshape(idx.shape + (1,) * av.array_ndim),
            grid_shape + (1,) + data.shape[axis + 1 :],
        )
        taken = jnp.take_along_axis(data, idx_e, axis=axis)
        taken = jnp.squeeze(taken, axis=axis)
        if av.array_ndim == 1:
            return taken
        return _ArrayVal(taken, av.array_ndim - 1)

    def _eval_linear_vec(self, index: LinearIndex, tensors):
        self.eval_instrs(index.setup, tensors)
        value = index.constant
        for reg, factor in index.factors.items():
            value = value + self.env[reg] * factor
        return value

    def _linear_deps(self, index: LinearIndex) -> set[int]:
        """Loop axes a linear index expression depends on."""
        regs = set(index.factors)
        for instr in index.setup:
            regs.update(instr.args)
        return {self.axis_of_reg[r] for r in regs if r in self.axis_of_reg}

    def _dim_index_1d(self, index: LinearIndex, axis: Optional[int]):
        """Evaluate one dim's index with its loop iterator as a 1-D vector.

        Returns (python int) for loop-independent dims, else an int vector of
        the loop's length.  Constant-foldable affine forms come back as
        (offset, stride, length) for lowering to strided slices.
        """
        saved_env = self.env
        self.env = {}
        try:
            if axis is not None:
                self.env[self.kernel.loops[axis].iter_reg] = (
                    jnp.arange(self.starts[axis], self.starts[axis] + self.sizes[axis])
                )
            value = self._eval_linear_vec(index, None)
        except KeyError:
            # index depends on non-loop state (e.g. a data-dependent read
            # register) -> caller must use the general gather path
            return None
        finally:
            self.env = saved_env
        return value

    def _static_dim_vector(self, index: LinearIndex, axis: int):
        """Statically evaluate one dim's index as a numpy int vector over its
        loop axis.  Returns None when the index depends on runtime values
        (jnp ops inside a trace return tracers, so this evaluator runs the
        Index instruction subset directly in numpy)."""
        env: dict[int, np.ndarray | int] = {
            self.kernel.loops[axis].iter_reg: np.arange(
                self.starts[axis], self.starts[axis] + self.sizes[axis]
            )
        }
        for instr in index.setup:
            if any(a not in env for a in instr.args):
                return None
            a = [env[x] for x in instr.args]
            op = instr.op
            if op == Op.IDX:
                value = instr.index_lit
            elif op == Op.ADD:
                value = a[0] + a[1]
            elif op == Op.SUB:
                value = a[0] - a[1]
            elif op == Op.MUL:
                value = a[0] * a[1]
            elif op == Op.IDX_DIV:
                q = np.floor_divide(a[0], a[1])
                r = a[0] - q * a[1]
                value = q + (
                    (r != 0)
                    & ((np.asarray(a[0]) < 0) != (np.asarray(a[1]) < 0))
                )
            elif op == Op.MOD:
                q = np.floor_divide(a[0], a[1])
                r = a[0] - q * a[1]
                q = q + (
                    (r != 0)
                    & ((np.asarray(a[0]) < 0) != (np.asarray(a[1]) < 0))
                )
                value = a[0] - q * a[1]
            elif op == Op.WRAP:
                value = np.mod(a[0], a[1])
            elif op == Op.NEG:
                value = -a[0]
            elif op == Op.SHAPE:
                value = self.shapes[instr.tensor][instr.dim]
            elif op == Op.LEN:
                value = int(np.prod(self.shapes[instr.tensor], dtype=np.int64))
            elif op == Op.SHAPE_LEN:
                value = len(self.shapes[instr.tensor])
            else:
                return None  # epoch / reads / non-index ops: not static
            if instr.res is not None:
                env[instr.res] = value
        try:
            value = index.constant
            for reg, factor in index.factors.items():
                value = value + env[reg] * factor
        except KeyError:
            return None
        value = np.asarray(value)
        if value.ndim == 0:
            value = np.broadcast_to(value, (self.sizes[axis],))
        return value.astype(np.int64)

    def _read_value(self, read: ir.TensorOp, tensors):
        """Lower a tensor read.  Strategies, fastest first:

        1. plain full-range iterators -> transpose/reshape (zero-cost view)
        2. separable indices (each dim depends on <=1 distinct loop axis) ->
           per-axis strided slice / 1-D take; covers pooling (y*2+k),
           upsampling (y div 2), shifted windows (x+1)
        3. general flat gather over the broadcasted loop grid
        """
        tensor = tensors[read.tensor]
        shape = self.shapes[read.tensor]
        if not read.is_raw:
            axes = [self._pure_iter(d) for d in read.dims]
            if (
                all(a is not None for a in axes)
                and len(set(axes)) == len(axes)
                and all(
                    self._full_axis(a, shape[d])  # type: ignore[arg-type]
                    for d, a in enumerate(axes)
                )
            ):
                perm = sorted(range(len(axes)), key=lambda d: axes[d])
                out_shape = [1] * self.nloops
                for d, a in enumerate(axes):
                    out_shape[a] = shape[d]
                return jnp.transpose(tensor, perm).reshape(out_shape)

            sep = self._try_separable_read(read, tensor, shape)
            if sep is not None:
                return sep
        else:
            axis = self._pure_iter(read.dims[0])
            total = int(np.prod(shape, dtype=np.int64))
            if axis is not None and self._full_axis(axis, total):
                out_shape = [1] * self.nloops
                out_shape[axis] = total
                return tensor.reshape(out_shape)
        flat = self._flat_index(read, tensors)
        if self.dynamic_axes:
            # hull points outside the true bounds may index out of range;
            # clamp (their contribution is masked to the identity)
            total = int(np.prod(shape, dtype=np.int64))
            flat = jnp.clip(flat, 0, total - 1)
        return tensor.reshape(-1)[flat]

    def _try_separable_read(self, read: ir.TensorOp, tensor, shape):
        deps = [self._linear_deps(d) for d in read.dims]
        if any(len(d) > 1 for d in deps):
            return None
        dep_axes = [next(iter(d)) if d else None for d in deps]
        non_none = [a for a in dep_axes if a is not None]
        if len(set(non_none)) != len(non_none):
            return None

        value = tensor
        for d, (index, axis) in enumerate(zip(read.dims, dep_axes)):
            if axis is None:
                idx = self._dim_index_1d(index, None)
                if not isinstance(idx, (int, np.integer)):
                    return None  # depends on a traced value (e.g. epoch)
                value = jax.lax.slice_in_dim(value, int(idx), int(idx) + 1, axis=d)
                continue
            # affine in the iterator? -> strided slice
            if not index.setup:
                stride = index.factors.get(
                    self.kernel.loops[axis].iter_reg, 0
                )
                offset = index.constant + stride * self.starts[axis]
                length = self.sizes[axis]
                if stride >= 1 and 0 <= offset and (
                    offset + stride * (length - 1) < shape[d]
                ):
                    value = jax.lax.slice_in_dim(
                        value,
                        offset,
                        offset + stride * (length - 1) + 1,
                        stride=stride,
                        axis=d,
                    )
                    continue
            # monotone grouped reads i // k -> repeat (broadcast+reshape,
            # no gather; upsampling and pooling-gradient reads)
            idx_np = self._static_dim_vector(index, axis)
            if idx_np is not None:
                length = idx_np.shape[0]
                j = shape[d]
                if (
                    j > 0
                    and length % j == 0
                    and length // j > 1
                    and np.array_equal(
                        idx_np, np.repeat(np.arange(j), length // j)
                    )
                ):
                    value = jnp.repeat(value, length // j, axis=d)
                    continue
            idx = self._dim_index_1d(index, axis)
            if idx is None:
                return None
            if isinstance(idx, (int, np.integer)):
                idx = jnp.full((self.sizes[axis],), idx)
            value = jnp.take(value, idx, axis=d)

        # value dims follow tensor-dim order; sizes: L_axis or 1.
        # transpose so varying dims ascend by loop axis, then pad with 1s.
        order = sorted(
            range(len(read.dims)),
            key=lambda d: (dep_axes[d] is None, dep_axes[d] or 0),
        )
        # put no-dep (size-1) dims first, then by ascending axis
        order = [d for d in range(len(read.dims)) if dep_axes[d] is None] + sorted(
            (d for d in range(len(read.dims)) if dep_axes[d] is not None),
            key=lambda d: dep_axes[d],
        )
        value = jnp.transpose(value, order)
        out_shape = [1] * self.nloops
        for d, axis in enumerate(dep_axes):
            if axis is not None:
                out_shape[axis] = self.sizes[axis]
        return value.reshape(out_shape)

    def _flat_index(self, op: ir.TensorOp, tensors):
        shape = self.shapes[op.tensor]
        if op.is_raw:
            return self._eval_linear_vec(op.dims[0], tensors)
        flat = 0
        stride = 1
        for dim in range(len(op.dims) - 1, -1, -1):
            flat = flat + self._eval_linear_vec(op.dims[dim], tensors) * stride
            stride *= shape[dim]
        return flat

    def _try_structured_write(self, write: ir.TensorOp, out, out_shape, vals):
        """Scatter-free lowering of structured writes.

        Handles, per write dim (one distinct loop axis each):
        * ``s*i + c`` affine iterators          -> (strided) static-slice
          add; covers plain full iterators, shifted stencils (res[x+1]),
          bounded custom-gradient loops writing a prefix of a larger
          tensor, and strided pooling-gradient writes (res[2y+1])
        * ``i // k`` monotone groupings         -> reshape+sum over the
          window axis (pooling/upsample gradients)
        Returns the UPDATED output array, or None when scatter is needed.
        """
        if write.is_raw:
            return None
        n = self.nloops
        # per write dim: (loop axis, group k, offset, stride)
        plan: list[tuple[int, int, int, int]] = []
        seen_axes: set[int] = set()
        for d, index in enumerate(write.dims):
            # affine iterator s*i + c -> (strided) slice write
            if not index.setup and len(index.factors) == 1:
                (reg, stride), = index.factors.items()
                if stride >= 1 and reg in self.axis_of_reg:
                    axis = self.axis_of_reg[reg]
                    offset = index.constant + stride * self.starts[axis]
                    length = self.sizes[axis]
                    last = offset + stride * (length - 1)
                    if 0 <= offset and last < out_shape[d]:
                        plan.append((axis, 1, offset, stride))
                        seen_axes.add(axis)
                        continue
                return None
            deps = self._linear_deps(index)
            if len(deps) != 1:
                return None
            axis = next(iter(deps))
            length = self.sizes[axis]
            j = out_shape[d]
            if j <= 0 or length % j != 0:
                return None
            k = length // j
            if k == 1:
                return None  # permuted variants stay on scatter
            vec_np = self._static_dim_vector(index, axis)
            if vec_np is None:
                return None
            if vec_np.shape != (length,) or not np.array_equal(
                vec_np, np.repeat(np.arange(j), k)
            ):
                return None
            plan.append((axis, k, 0, 1))
            seen_axes.add(axis)
        if len(seen_axes) != len(plan):
            return None  # repeated axes

        mode = write.accumulate
        # reduce/scale loop axes the write does not touch
        for ax in range(n):
            if ax not in seen_axes and self.sizes[ax] > 1:
                if vals.shape[ax] > 1:
                    vals = _acc_reduce(vals, ax, mode)
                elif mode == "add":
                    vals = vals * self.dtype(self.sizes[ax])

        # group-reduce the windowed axes
        for axis, k, _off, _stride in plan:
            if k == 1:
                continue
            if vals.shape[axis] == 1:
                if mode == "add":
                    vals = vals * self.dtype(k)
            else:
                j = self.sizes[axis] // k
                shape = list(vals.shape)
                shape[axis : axis + 1] = [j, k]
                grouped = vals.reshape(shape)
                vals = _acc_reduce(grouped, axis + 1, mode, keepdims=False)

        vals = jnp.squeeze(
            vals, axis=tuple(ax for ax in range(n) if ax not in seen_axes)
        )
        axes = [axis for axis, _k, _o, _s in plan]
        order = sorted(range(len(axes)), key=lambda d: axes[d])
        inv = [0] * len(axes)
        for pos, d in enumerate(order):
            inv[d] = pos
        vals = jnp.transpose(vals, inv)

        # vals extent per dim: grouped dims cover the whole output dim;
        # affine dims carry the loop length, placed at the (strided) slice
        # [off : off + stride*(L-1) + 1 : stride]
        region_shape = tuple(
            out_shape[d] if k > 1 else self.sizes[ax]
            for d, (ax, k, _off, _s) in enumerate(plan)
        )
        region = tuple(
            slice(off, off + stride * (length - 1) + 1, stride)
            for (_ax, _k, off, stride), length in zip(plan, region_shape)
        )
        vals = jnp.broadcast_to(vals, region_shape).astype(self.dtype)
        if all(
            off == 0 and stride == 1 and length == out_shape[d]
            for d, ((_ax, _k, off, stride), length) in enumerate(
                zip(plan, region_shape)
            )
        ):
            return _acc_combine(out, vals, mode)
        if mode == "add":
            return out.at[region].add(vals)
        if mode == "max":
            return out.at[region].max(vals)
        return out.at[region].min(vals)

    def _bounds_mask(self, tensors):
        """Grid mask for dynamic (iterator-dependent) loop bounds, or None.

        Dynamic loops iterate their static interval hull; this mask is True
        where the point satisfies every dynamic loop's true per-point
        ``[start, stop)`` — contributions outside are replaced with the
        accumulation identity (the XLA-idiomatic masked-compute form of a
        triangular loop, e.g. causal attention)."""
        mask = None
        for axis in self.dynamic_axes:
            loop = self.kernel.loops[axis]
            it = self.env[loop.iter_reg]
            lo = self._eval_linear_vec(loop.start, tensors)
            hi = self._eval_linear_vec(loop.stop, tensors)
            m = (it >= lo) & (it < hi)
            mask = m if mask is None else (mask & m)
        return mask

    def _general(self, tensors, epoch):
        kernel = self.kernel
        for axis, loop in enumerate(kernel.loops):
            self.env[loop.iter_reg] = self._grid_slot(axis)
        self.eval_instrs(kernel.setup, tensors)
        mask = self._bounds_mask(tensors)
        for read in kernel.reads:
            self.env[read.data] = self._read_value(read, tensors)
        self.eval_instrs(kernel.expr.instrs, tensors)

        write = kernel.write
        assert write is not None and write.data is not None
        vals = jnp.asarray(self.env[write.data], self.dtype)
        if mask is not None:
            from ..interp import accumulation_identity

            identity = accumulation_identity(write.accumulate)
            vals = jnp.where(mask, vals, self.dtype(identity))
        if vals.ndim == 0:
            vals = vals.reshape((1,) * self.nloops)
        elif vals.ndim != self.nloops:
            vals = vals.reshape((1,) * (self.nloops - vals.ndim) + vals.shape)

        out = tensors[write.tensor]
        out_shape = self.shapes[write.tensor]

        structured = self._try_structured_write(write, out, out_shape, vals)
        if structured is not None:
            self.sub_path = "structured"
            return structured

        # detect direct (non-scatter) writes
        if not write.is_raw:
            axes = [self._pure_iter(d) for d in write.dims]
            direct = (
                all(a is not None for a in axes)
                and len(set(axes)) == len(axes)
                and all(
                    self._full_axis(a, out_shape[d])  # type: ignore[arg-type]
                    for d, a in enumerate(axes)
                )
            )
        else:
            axis = self._pure_iter(write.dims[0])
            total = int(np.prod(out_shape, dtype=np.int64))
            direct = axis is not None and self._full_axis(axis, total)
            axes = [axis]

        if direct:
            mode = write.accumulate
            # reduce axes not written
            written = set(axes)  # type: ignore[arg-type]
            for ax in range(self.nloops):
                if ax not in written and self.sizes[ax] > 1:
                    if vals.shape[ax] > 1:
                        vals = _acc_reduce(vals, ax, mode)
                    elif mode == "add":
                        vals = vals * self.dtype(self.sizes[ax])
            vals = jnp.squeeze(
                vals, axis=tuple(ax for ax in range(self.nloops) if ax not in written)
            )
            # vals axes are ordered by loop axis; transpose into write-dim order
            order = sorted(range(len(axes)), key=lambda d: axes[d])  # type: ignore[arg-type]
            inv = [0] * len(axes)
            for pos, d in enumerate(order):
                inv[d] = pos
            vals = jnp.transpose(vals, inv)
            self.sub_path = "direct"
            if write.is_raw:
                target_shape: tuple = (int(np.prod(out_shape, dtype=np.int64)),)
                flat_vals = jnp.broadcast_to(vals, target_shape)
                new = _acc_combine(out.reshape(-1), flat_vals, mode)
                return new.reshape(out.shape)
            vals = jnp.broadcast_to(vals, tuple(out_shape))
            return _acc_combine(out, vals, mode)

        widx = self._flat_index(write, tensors)
        widx = jnp.asarray(widx)
        if widx.ndim == 0:
            widx = widx.reshape((1,) * self.nloops)
        elif widx.ndim != self.nloops:
            widx = widx.reshape((1,) * (self.nloops - widx.ndim) + widx.shape)
        mode = write.accumulate
        for ax in range(self.nloops):
            if widx.shape[ax] == 1 and self.sizes[ax] > 1:
                if vals.shape[ax] > 1:
                    vals = _acc_reduce(vals, ax, mode)
                elif mode == "add":
                    vals = vals * self.dtype(self.sizes[ax])
        bshape = np.broadcast_shapes(widx.shape, vals.shape)
        widx_b = jnp.broadcast_to(widx, bshape).reshape(-1)
        vals_b = jnp.broadcast_to(vals, bshape).reshape(-1)
        self.sub_path = "scatter"
        flat = out.reshape(-1)
        if mode == "add":
            flat = flat.at[widx_b].add(vals_b)
        elif mode == "max":
            flat = flat.at[widx_b].max(vals_b)
        else:
            flat = flat.at[widx_b].min(vals_b)
        return flat.reshape(out.shape)

    def _run_extern(self, tensors: dict, stats: Optional[dict]) -> None:
        """Trace an extern kernel's registered jax implementation.

        Shares ``self.extern_memo`` (one dict per target trace) across the
        kernels of one logical multi-output call, so the op traces once.
        """
        from ..registry import ExternContext, get_extern

        ext = self.kernel.extern
        assert ext is not None and self.kernel.write is not None
        key = ext.key()
        if key not in self.extern_memo:
            edef = get_extern(ext.name)
            args = [tensors[tid] for tid in ext.inputs]
            ctx = ExternContext(
                dtype=self.dtype, precision=self.precision,
                policy=self.policy, stats=stats,
            )
            result = edef.jax_fn(args, dict(ext.attrs), ctx)
            if not isinstance(result, tuple):
                result = (result,)
            if len(result) != ext.nout:
                raise ModelRuntimeError(
                    f"extern op {ext.name!r} returned {len(result)} "
                    f"outputs, but the graph expects {ext.nout}"
                )
            self.extern_memo[key] = result
        value = self.extern_memo[key][ext.out_index].astype(self.dtype)
        out_tid = self.kernel.write.tensor
        expect = tuple(self.shapes[out_tid])
        if tuple(value.shape) != expect:
            raise ModelRuntimeError(
                f"extern op {ext.name!r} output {ext.out_index} has shape "
                f"{tuple(value.shape)}, but tensor t{out_tid} has shape "
                f"{expect} (check the with_shape/copy_shape annotation)"
            )
        tensors[out_tid] = tensors[out_tid] + value
        if stats is not None:
            stat = f"extern:{ext.name}"
            stats[stat] = stats.get(stat, 0) + 1

    def _kernel_desc(self) -> str:
        write = self.kernel.write
        name = (
            self.program.tensors[write.tensor].name
            if write is not None
            else "?"
        )
        return f"the kernel writing {name or '?'!r}"

    # ------------------------------------------------------------------
    def run(self, tensors: dict, epoch, stats: Optional[dict] = None) -> None:
        """Execute the kernel, updating ``tensors[write.tensor]``.

        Lowering order: scheduled kernels try the Pallas emitters first,
        gated by the cost-model policy; then einsum contraction -> conv
        matcher -> general.  A schedule that does not end on a Pallas path
        is reported (ScheduleWarning + a ``schedule-fallback`` stat) so
        ``tile()``/``cache()`` are never silently ignored.
        """
        if self.kernel.extern is not None:
            self._run_extern(tensors, stats)
            return
        if not self._bounds_ok:
            return
        self.epoch = epoch
        assert self.kernel.write is not None
        out_tensors = tensors
        if self.kernel.remat:
            # recompute kernel (the remat pass): fence the operands
            # BUNDLED with the anchor (loss) value in one barrier —
            # jax.checkpoint's scheme.  The anchor depends on the whole
            # forward pass, so the fenced operands do too: the recompute
            # cannot be hoisted before the loss, and CSE with the
            # original forward computation would form a cycle.
            anchor = self.kernel.remat_anchor
            tids = sorted(
                t
                for t in set(self.kernel.input_tensors())
                if t != anchor and t in tensors
            )
            bundle = [tensors[t] for t in tids]
            if anchor is not None and anchor in tensors:
                bundle.append(tensors[anchor])
            if bundle:
                fenced = jax.lax.optimization_barrier(tuple(bundle))
                tensors = dict(tensors)
                for t, v in zip(tids, fenced):
                    tensors[t] = v
            if stats is not None:
                stats["remat"] = stats.get("remat", 0) + 1
        result = None
        path = "einsum"
        # add-accumulation with static bounds is required by the einsum/conv
        # matchers; dynamic (iterator-dependent) bounds need the general
        # path's hull mask
        general_only = (
            self.kernel.write.accumulate != "add" or bool(self.dynamic_axes)
        )

        from .pallasgen import PallasMapReduce, PallasMatmul, is_scheduled

        scheduled = is_scheduled(self.kernel)
        policy = self.policy
        if policy is None:
            from .policy import SchedulePolicy

            policy = SchedulePolicy("force")  # direct/legacy constructions
        fallback_reason = None
        if scheduled and policy.mode != "ignore":
            pm = None
            if not general_only:
                pm = PallasMatmul(self, self.kernel)
                if pm.ok:
                    decision = policy.contraction(pm.m, pm.n, pm.k)
                    if decision.use_pallas:
                        path = "pallas"
                        result = pm.lower(tensors)
                    else:
                        fallback_reason = decision.reason
            if result is None and fallback_reason is None:
                # the map/reduce emitter also covers dynamic (iterator-
                # dependent) bounds via in-kernel hull masks
                pmr = PallasMapReduce(self, self.kernel)
                if pmr.ok:
                    decision = policy.mapreduce(
                        pmr.total_bytes, pmr.gather_work * 4
                    )
                    if decision.use_pallas:
                        path = "pallas-mapreduce"
                        result = pmr.lower(tensors)
                    else:
                        fallback_reason = decision.reason
                else:
                    # a matmul-shaped kernel that PallasMatmul declined
                    # LATE (indivisible tile, transposed layout): report
                    # that specific cause, not map-reduce's generic
                    # "it's a contraction"
                    why = pmr.why
                    if (
                        pm is not None
                        and why.startswith("contraction")
                        and (
                            "tile sizes" in pm.why
                            or "transposed" in pm.why
                        )
                    ):
                        why = pm.why
                    fallback_reason = (
                        f"unsupported kernel shape ({why})"
                    )
        if result is None and not general_only:
            result = self._try_contraction(tensors)
        if result is None and not general_only:
            from .convmatch import ConvMatch

            match = ConvMatch(self, self.kernel)
            if match.ok:
                path = "conv"
                result = tensors[self.kernel.write.tensor] + match.lower(tensors)
        if result is None:
            self.sub_path = "unknown"
            result = self._general(tensors, epoch)
            path = f"general-{self.sub_path}"
        if stats is not None:
            stats[path] = stats.get(path, 0) + 1
        if fallback_reason is not None:
            policy.fallback(
                stats,
                self._kernel_desc(),
                f"{fallback_reason}; lowered via {path}",
            )
        out_tensors[self.kernel.write.tensor] = result
