"""Computation-graph front-end: ``Fun`` nodes, kernel building, lowering.

This is the graph/builder half of the reference parser (exprgrad/parser.nim):
``Fun`` graph node kinds (parser.nim:67-97), kernel building via a build
context (parser.nim:128-259), and graph -> Program lowering ``to_program``
(parser.nim:261-417).  The Nim ``++=`` macro surface becomes Python item
assignment:

    y, x, it = iters("y", "x", "it")
    c = Fun("c")
    c[y, x] = a[y, it] * b[it, x]      # accumulate (+=) semantics

``fun[i, j]`` reads with per-dimension indices; ``fun.raw[i]`` is flat data
access (the reference ``{}`` operator).  ``Fun.__setitem__`` always has
*accumulate* semantics, exactly like ``++=``.
"""

from __future__ import annotations

import contextlib
import enum
import functools
from typing import Callable, Optional, Sequence

from . import ir
from .errors import ParserError
from .expr import (
    ExprNode,
    Index,
    NodeKind,
    Scalar,
    as_index,
    as_scalar,
    iters,
)
from .ir import LinearIndex, Op


class FunKind(enum.Enum):
    INPUT = "input"
    PARAM = "param"
    RESULT = "result"
    CACHE = "cache"
    RANDOM = "random"
    BACKWARDS = "backwards"
    GRADIENT = "gradient"
    EFFECT = "effect"
    MULTIPLE = "multiple"
    RESHAPE = "reshape"
    TARGET = "target"
    COND = "cond"
    GRADIENT_ARG = "gradient_arg"


class _ShapeConstrBuilder:
    """User shape annotation: with_shape / copy_shape (parser.nim:683-695)."""

    def __init__(self, kind: str, dims=None, copy: "Fun" = None) -> None:
        self.kind = kind  # "dims" | "copy"
        self.dims: list[ExprNode] = dims or []
        self.copy = copy


class ScheduleSpec:
    """Per-kernel schedule hints (reference schedule DSL, parser.nim:519-564).

    ``tile``: {iter_name: tile_size}; ``parallel``: iter names;
    ``cache``: tensors to stage through VMEM; consumed by the Pallas emitter.
    """

    def __init__(
        self,
        tile: Optional[dict[str, int]] = None,
        parallel: Sequence[str] = (),
        cache: Sequence["Fun"] = (),
        share_cache: Sequence[str] = (),
    ) -> None:
        self.tile = dict(tile or {})
        self.parallel = list(parallel)
        self.cache = list(cache)
        self.share_cache = list(share_cache)


class KernelBuilder:
    def __init__(
        self,
        target: "Fun",
        dims: list[ExprNode],
        is_raw: bool,
        value: ExprNode,
        accumulate: str = "add",
    ) -> None:
        self.target = target
        self.dims = dims
        self.is_raw = is_raw
        self.value = value
        self.accumulate = accumulate
        self.custom_grads: list[KernelBuilder] = []
        # scope -> spec; "" = every compile scope (reference per-target
        # schedule sub-blocks cpu:/threads:/gpu:, parser.nim:519-564)
        self.schedules: dict[str, ScheduleSpec] = {}

    def schedule_for(self, scope: str) -> Optional[ScheduleSpec]:
        """The schedule active under ``scope`` ("tpu"/"cpu"): an exact
        scope match wins, else the unscoped spec."""
        return self.schedules.get(scope, self.schedules.get(""))

    def build(
        self,
        tensor_of: dict[int, int],
        grads: Optional[dict[int, int]] = None,
        scope: str = "",
    ) -> ir.Kernel:
        kernel = self._build_main(tensor_of, grads, scope)
        if self.custom_grads:
            cg = ir.CustomGrad()
            shared_grads: dict[int, int] = {}
            for sub in self.custom_grads:
                cg.kernels.append(
                    sub._build_main(tensor_of, shared_grads, scope)
                )
            cg.grad_placeholders = shared_grads
            kernel.custom_grad = cg
        return kernel

    def _build_main(
        self,
        tensor_of: dict[int, int],
        grads: Optional[dict[int, int]],
        scope: str = "",
    ) -> ir.Kernel:
        ctx = _BuildCtx(self.schedule_for(scope), grads, tensor_of)
        return ctx.build_kernel(self)

    def referenced_funs(self):
        """Fun nodes this builder's expressions mention (graph children)."""
        out: list[Fun] = []

        def walk(node: ExprNode) -> None:
            for child in node.children:
                walk(child)
            if node.tensor is not None:
                out.append(node.tensor)

        walk(self.value)
        for d in self.dims:
            walk(d)
        return out


class ExternKernelBuilder(KernelBuilder):
    """Builds a kernel invoking a registered opaque op (ir.Extern).

    ``target`` receives (accumulates) output ``out_index`` of the op named
    ``extern_name`` applied to ``args``.  Gradients are NOT derived: attach
    extern backward kernels via ``custom_grad`` + ``extern_grads``.
    """

    def __init__(
        self,
        target: "Fun",
        extern_name: str,
        args: Sequence["Fun"],
        attrs: Optional[dict] = None,
        out_index: int = 0,
        nout: int = 1,
    ) -> None:
        super().__init__(target, [], False, as_scalar(0.0).node)
        self.extern_name = extern_name
        self.args = list(args)
        self.attrs = dict(attrs or {})
        self.out_index = out_index
        self.nout = nout

    def _build_main(
        self,
        tensor_of: dict[int, int],
        grads: Optional[dict[int, int]],
        scope: str = "",
    ) -> ir.Kernel:
        ctx = _BuildCtx(None, grads, tensor_of)
        kernel = ctx.kernel
        kernel.extern = ir.Extern(
            name=self.extern_name,
            inputs=[ctx.lookup_tensor(a) for a in self.args],
            out_index=self.out_index,
            nout=self.nout,
            attrs=dict(self.attrs),
        )
        kernel.write = ir.TensorOp(tensor=ctx.lookup_tensor(self.target))
        return kernel

    def referenced_funs(self):
        return list(self.args)


_BUILD_GEN = [0]


class _BuildCtx:
    """Builds one ir.Kernel from a KernelBuilder (reference BuildContext)."""

    def __init__(
        self,
        schedule: Optional[ScheduleSpec],
        grads: Optional[dict[int, int]],
        tensor_of: Optional[dict[int, int]] = None,
    ) -> None:
        self.tensor_of = tensor_of if tensor_of is not None else {}
        self.kernel = ir.Kernel()
        self.iters: dict[str, int] = {}
        self.grads: dict[int, int] = grads if grads is not None else {}
        self.blocks = 0
        self.schedule = schedule or ScheduleSpec()
        _BUILD_GEN[0] += 1
        self.gen = _BUILD_GEN[0]
        # iter reg -> name, for applying loop schedules
        self.iter_names: dict[int, str] = {}

    def alloc_block(self) -> int:
        self.blocks += 1
        return self.blocks - 1

    def lookup_tensor(self, fun: "Fun") -> int:
        if fun.kind == FunKind.GRADIENT_ARG:
            real = self.lookup_tensor(fun.children[0])
            if real not in self.grads:
                self.grads[real] = -(len(self.grads) + 1)
            return self.grads[real]
        tid = self.tensor_of.get(id(fun))
        if tid is None:
            raise ParserError(
                f"tensor for {fun.kind.value} node {fun.name!r} is not allocated; "
                "is it reachable from the compiled graph?"
            )
        return tid

    def build_linear(self, node: ExprNode) -> LinearIndex:
        setup: list[ir.Instr] = []
        reg = self.build(node, setup, self.alloc_block())
        return LinearIndex(setup=setup, factors={reg: 1})

    def build(self, node: ExprNode, instrs: list[ir.Instr], block: int) -> int:
        cached = node._res.get((self.gen, block))
        if cached is not None:
            return cached
        if len(node._res) > 64:  # drop stale entries from earlier builds
            node._res = {k: v for k, v in node._res.items() if k[0] == self.gen}

        if node.kind == NodeKind.READ:
            dims = [self.build_linear(d) for d in node.children]
            sched = ir.TensorSchedule(cache=node.tensor in self.schedule.cache)
            res = self.kernel.alloc_reg()
            self.kernel.reads.append(
                ir.TensorOp(
                    tensor=self.lookup_tensor(node.tensor),
                    dims=dims,
                    data=res,
                    is_raw=node.is_raw,
                    schedule=sched,
                )
            )
        elif node.kind == NodeKind.ITER:
            name = node.iter_name
            if name not in self.iters:
                reg = self.kernel.alloc_reg(name)
                self.iters[name] = reg
                self.iter_names[reg] = name
                loop = ir.Loop(iter_reg=reg)
                if name in self.schedule.tile:
                    loop.schedule.tile = True
                    loop.schedule.tile_size = self.schedule.tile[name]
                if name in self.schedule.parallel:
                    loop.schedule.parallel = True
                if name in self.schedule.share_cache:
                    loop.schedule.share_cache = True
                if node.children:
                    loop.has_bounds = True
                    loop.start = self.build_linear(node.children[0])
                    loop.stop = self.build_linear(node.children[1])
                    loop.step = 1
                self.kernel.loops.append(loop)
            res = self.iters[name]
            node._res[(self.gen, block)] = res
            return res
        else:  # INSTR
            assert node.op is not None
            args = [self.build(c, instrs, block) for c in node.children]
            instr = ir.Instr(
                op=node.op,
                args=args,
                index_lit=node.index_lit,
                scalar_lit=node.scalar_lit,
                bool_lit=node.bool_lit,
                dim=node.dim,
                label=node.label,
            )
            if node.tensor is not None:
                instr.tensor = self.lookup_tensor(node.tensor)
            instr.res = self.kernel.alloc_reg()
            instrs.append(instr)
            res = instr.res

        node._res[(self.gen, block)] = res
        return res

    def build_kernel(self, builder: KernelBuilder) -> ir.Kernel:
        kernel = self.kernel
        block = self.alloc_block()
        instrs: list[ir.Instr] = []
        res = self.build(builder.value, instrs, block)
        kernel.expr = ir.Expr(instrs=instrs, res=res)
        kernel.write = ir.TensorOp(
            tensor=self.lookup_tensor(builder.target),
            is_raw=builder.is_raw,
            data=res,
            dims=[self.build_linear(d) for d in builder.dims],
            accumulate=builder.accumulate,
        )
        # schedule names must bind: a tile/parallel key that matches no
        # iterator of this kernel is a silent no-op otherwise (a test
        # once tiled {"x": 256} on a kernel whose iterator was named d —
        # the planner shrank d freely and the pinned-schedule bug it was
        # written to catch went unexercised)
        for what, names in (("tile", self.schedule.tile),
                            ("parallel", self.schedule.parallel),
                            ("share_cache", self.schedule.share_cache)):
            unknown = [nm for nm in names if nm not in self.iters]
            if unknown:
                raise ParserError(
                    f"schedule {what} names {unknown} match no iterator "
                    f"of this kernel (iterators: {sorted(self.iters)})"
                )
        return kernel


# ---------------------------------------------------------------------------
# custom-grad capture
# ---------------------------------------------------------------------------

_CUSTOM_GRAD_STACK: list[list[KernelBuilder]] = []


# ---------------------------------------------------------------------------
# Fun graph nodes
# ---------------------------------------------------------------------------

class _RawAccessor:
    """``fun.raw[i]`` — flat data access, the reference ``{}`` operator."""

    __slots__ = ("fun",)

    def __init__(self, fun: "Fun") -> None:
        self.fun = fun

    def __getitem__(self, index) -> Scalar:
        node = ExprNode(
            NodeKind.READ,
            tensor=self.fun,
            is_raw=True,
            children=[as_index(index).node],
        )
        return Scalar(node)

    def __setitem__(self, index, value) -> None:
        self.fun._add_kernel([as_index(index).node], True, value)


class _ExtremeAccessor:
    """``fun.maximize[dims] = expr`` / ``fun.minimize[...]`` — max/min
    accumulation kernel writes."""

    __slots__ = ("fun", "mode")

    def __init__(self, fun: "Fun", mode: str) -> None:
        self.fun = fun
        self.mode = mode

    def __setitem__(self, indices, value) -> None:
        if not isinstance(indices, tuple):
            indices = (indices,)
        self.fun._add_kernel(
            [as_index(i).node for i in indices], False, value,
            accumulate=self.mode,
        )

    @property
    def raw(self) -> "_ExtremeRawAccessor":
        return _ExtremeRawAccessor(self.fun, self.mode)


class _ExtremeRawAccessor:
    __slots__ = ("fun", "mode")

    def __init__(self, fun: "Fun", mode: str) -> None:
        self.fun = fun
        self.mode = mode

    def __setitem__(self, index, value) -> None:
        self.fun._add_kernel(
            [as_index(index).node], True, value, accumulate=self.mode
        )


class Fun:
    """A node of the computation graph (reference parser.nim:72-97)."""

    def __init__(self, name: str = "", kind: FunKind = FunKind.RESULT) -> None:
        self.kind = kind
        self.name = name
        self.children: list[Fun] = []
        self.locked = False
        # per-kind payloads
        self.input_shape: list[int] = []
        self.param_shape: list[int] = []
        self.init_range: tuple[float, float] = (-0.1, 0.1)
        self.random_range: tuple[float, float] = (0.0, 1.0)
        self.cache_of: Optional[Fun] = None
        self.kernels: list[KernelBuilder] = []
        self.shape_constr: Optional[_ShapeConstrBuilder] = None
        self.effect: Optional[Fun] = None
        self.reshape_dims: list[int] = []
        self.cond_branches: dict[str, Fun] = {}
        self.cond_else: Optional[Fun] = None
        self.remat_flag = False
        # frozen parameters are excluded from optimize()/optimize_accum()
        # parameter collection (no optimizer update, and their gradient
        # kernels are dead-code-eliminated); the LoRA fine-tuning seam
        self.frozen = False
        # effects flattened AFTER this node's own kernels — the seam for
        # state that must observe a post-update value (EMA shadows read
        # the freshly-written parameter; see layers.base.with_ema)
        self.post_effects: list[Fun] = []

    # --- reading ------------------------------------------------------
    def __getitem__(self, indices) -> Scalar:
        if not isinstance(indices, tuple):
            indices = (indices,)
        node = ExprNode(
            NodeKind.READ,
            tensor=self,
            children=[as_index(i).node for i in indices],
        )
        return Scalar(node)

    @property
    def raw(self) -> _RawAccessor:
        return _RawAccessor(self)

    @property
    def maximize(self) -> "_ExtremeAccessor":
        """Max-accumulation writes (language extension, no reference analog):
        ``out.maximize[y] = inp[y, x]`` computes out[y] = max over x.

        Gradients flow to the elements attaining the maximum (subgradient,
        like the reference maxpool's custom gradient, dnn.nim:64-70)."""
        return _ExtremeAccessor(self, "max")

    @property
    def minimize(self) -> "_ExtremeAccessor":
        """Min-accumulation writes: ``out.minimize[y] = inp[y, x]`` computes
        out[y] = min over x; untouched elements are +inf.  Gradients gate to
        the argmin."""
        return _ExtremeAccessor(self, "min")

    # --- tensor queries ----------------------------------------------
    @property
    def shape(self) -> "_ShapeProxy":
        return _ShapeProxy(self)

    @property
    def size(self) -> Index:
        """Total element count (reference ``tensor.len``, dsl.nim:132)."""
        return Index(ExprNode(NodeKind.INSTR, op=Op.LEN, tensor=self))

    # --- writing (kernel creation) -----------------------------------
    def __setitem__(self, indices, value) -> None:
        if not isinstance(indices, tuple):
            indices = (indices,)
        self._add_kernel([as_index(i).node for i in indices], False, value)

    def _add_kernel(self, dims: list[ExprNode], is_raw: bool, value,
                    accumulate: str = "add") -> None:
        if _CUSTOM_GRAD_STACK:
            builder = KernelBuilder(
                self, dims, is_raw, as_scalar(value).node, accumulate
            )
            _CUSTOM_GRAD_STACK[-1].append(builder)
            return
        if self.kind not in (FunKind.RESULT, FunKind.EFFECT):
            raise ParserError(f"cannot add a kernel to a {self.kind.value} node")
        if self.locked:
            raise ParserError(
                f"tensor {self.name!r} is locked: no further kernels may "
                "write it (layers lock their output after attaching a "
                "custom gradient, which later writes would invalidate)"
            )
        builder = KernelBuilder(
            self, dims, is_raw, as_scalar(value).node, accumulate
        )
        self.kernels.append(builder)
        _collect_children(builder.value, self)
        for d in dims:
            _collect_children(d, self)

    def schedule(
        self,
        tile: Optional[dict[str, int]] = None,
        parallel: Sequence[str] = (),
        cache: Sequence["Fun"] = (),
        share_cache: Sequence[str] = (),
        kernel: int = -1,
        scope: str = "",
    ) -> "Fun":
        """Attach schedule hints to one of this tensor's kernels.

        ``kernel`` selects which (default: the most recently added one);
        e.g. ``dense(...).schedule(tile=..., kernel=0)`` schedules the
        matmul kernel rather than the bias-add kernel added after it.

        ``scope`` restricts the schedule to one compile environment —
        ``"tpu"`` (the jax backend on TPU devices) or ``"cpu"`` (the jax
        backend on host CPU / interpret-mode Pallas) — the TPU analog of
        the reference's per-compile-target ``cpu:``/``gpu:`` schedule
        sub-blocks (parser.nim:519-564).  Different scopes may carry
        different specs on the same kernel; an exact scope match beats
        the unscoped default at compile time.
        """
        if not self.kernels:
            raise ParserError("schedule() requires a kernel to attach to")
        if scope not in ("", "tpu", "cpu"):
            raise ParserError(
                f"schedule scope must be '', 'tpu' or 'cpu', got {scope!r}"
            )
        self.kernels[kernel].schedules[scope] = ScheduleSpec(
            tile, parallel, cache, share_cache
        )
        return self

    @contextlib.contextmanager
    def custom_grad(self):
        """Attach custom gradient kernels to the last kernel (README.md:196-205).

        Inside the block, ``grad(t)`` refers to the gradient of tensor ``t``::

            with y.custom_grad():
                grad(x).raw[i] = x.raw[i] * 2.0 * grad(y).raw[i]
        """
        if not self.kernels:
            raise ParserError("custom_grad() requires a kernel to attach to")
        collector: list[KernelBuilder] = []
        _CUSTOM_GRAD_STACK.append(collector)
        try:
            yield
        finally:
            _CUSTOM_GRAD_STACK.pop()
        # tensors referenced only inside the gradient kernels still must be
        # reachable from the graph (allocated + their kernels flattened
        # first), e.g. an extern backward reading the forward's saved
        # logsumexp tensor
        for builder in collector:
            for fun in builder.referenced_funs():
                while fun.kind == FunKind.GRADIENT_ARG:
                    fun = fun.children[0]
                if fun is not self and fun not in self.children:
                    self.children.append(fun)
        self.kernels[-1].custom_grads.extend(collector)

    # --- shape annotations -------------------------------------------
    def with_shape(self, dims: Sequence) -> "Fun":
        if self.kind != FunKind.RESULT:
            raise ParserError(f"cannot set shape of {self.kind.value} node")
        nodes = [as_index(d).node for d in dims]
        self.shape_constr = _ShapeConstrBuilder("dims", dims=nodes)
        for node in nodes:
            _collect_children(node, self)
        return self

    def copy_shape(self, src: "Fun") -> "Fun":
        if self.kind != FunKind.RESULT:
            raise ParserError(f"cannot set shape of {self.kind.value} node")
        self.shape_constr = _ShapeConstrBuilder("copy", copy=src)
        if src not in self.children:
            self.children.append(src)
        return self

    def remat(self) -> "Fun":
        """Recompute this tensor in the backward pass instead of keeping
        it alive from the forward — the symbolic-autodiff analog of
        ``jax.checkpoint``: gradient kernels read a fresh copy computed by
        duplicated (CSE-fenced) forward kernels, so the activation's HBM
        footprint is released between the passes.  Trades FLOPs for
        memory; mark large cheap activations (FFN hiddens, normalized
        activations).  No effect on forward-only targets or numerics."""
        if self.kind != FunKind.RESULT:
            raise ParserError(
                f"remat() applies to computed tensors, not {self.kind.value}"
            )
        self.remat_flag = True
        return self

    def lock(self) -> "Fun":
        """Forbid further kernel writes to this tensor.

        (The reference declares ``locked`` but never reads it,
        parser.nim:77,710-711 — a vestigial API.  The evident intent, from
        its use right after ``customGrad`` in maxpool2, dnn.nim:71, is to
        prevent later accumulating writes from invalidating the attached
        custom gradient; implemented here.)"""
        self.locked = True
        return self

    # --- graph combinators -------------------------------------------
    def target(self, name: str, compile_target: str = "tpu") -> "Fun":
        out = Fun(name, FunKind.TARGET)
        out.children = [self]
        return out

    def backwards(self) -> "Fun":
        out = Fun("backwards", FunKind.BACKWARDS)
        out.children = [self]
        return out

    def grad(self, fun: "Fun") -> "Fun":
        """Gradient of ``fun`` w.r.t. the loss this backwards node derives."""
        out = Fun("grad", FunKind.GRADIENT)
        out.children = [self, fun]
        return out

    def params(self, stop: Sequence[str] = ()) -> list["Fun"]:
        """All parameters of the graph (reference parser.nim:741-755)."""
        stop_set = set(stop)
        seen: set[int] = set()
        out: list[Fun] = []

        def walk(fun: Fun) -> None:
            if id(fun) in seen:
                return
            seen.add(id(fun))
            if fun.kind == FunKind.TARGET and fun.name in stop_set:
                return
            for child in fun.children:
                walk(child)
            for post in fun.post_effects:
                walk(post)
            if fun.effect is not None:
                walk(fun.effect)
            if fun.kind == FunKind.PARAM:
                out.append(fun)
            elif fun.kind == FunKind.COND:
                for branch in fun.cond_branches.values():
                    walk(branch)
                if fun.cond_else is not None:
                    walk(fun.cond_else)

        walk(self)
        return out

    def trainable_params(self, stop: Sequence[str] = ()) -> list["Fun"]:
        """``params()`` minus frozen parameters — the set ``optimize()``/
        ``optimize_accum()`` update by default.  Raises when nothing is
        trainable (an all-frozen graph is always a usage error)."""
        out = [p for p in self.params(stop) if not p.frozen]
        if not out:
            raise ParserError(
                "no trainable parameters: every param in the graph is "
                "frozen (unfreeze one or pass params= explicitly)"
            )
        return out

    def optimize(
        self,
        optim: Callable[["Fun", "Fun"], None],
        params: Optional[Sequence["Fun"]] = None,
    ) -> "Fun":
        """Apply ``optim(param_effect, grad)`` per parameter (parser.nim:757-775)."""
        if self.kind != FunKind.BACKWARDS:
            raise ParserError("optimize() must be applied to a backwards() node")
        if params is None:
            params = self.trainable_params()
        out = Fun("optimize", FunKind.MULTIPLE)
        for p in params:
            effect = Fun(p.name, FunKind.EFFECT)
            effect.effect = p
            g = self.grad(p)
            optim(effect, g)
            out.children.append(effect)
        return out

    def backprop(self, optim: Callable[["Fun", "Fun"], None]) -> "Fun":
        return self.backwards().optimize(optim)

    def optimize_accum(
        self,
        optim: Callable[["Fun", "Fun"], None],
        steps: int,
        params: Optional[Sequence["Fun"]] = None,
        accum_target: str = "train.accum",
        step_target: str = "train.step",
    ) -> "Fun":
        """Gradient accumulation: two targets over shared grad-sum caches.

        ``accum_target`` adds this microbatch's gradients into a
        per-parameter cache tensor; ``step_target`` adds them too, then
        applies ``optim`` with the MEAN of the accumulated gradients and
        zeroes the caches (a post-effect, so it runs after every
        optimizer read).  Running ``steps - 1`` accum microbatches + one
        step microbatch is numerically one ``optim`` update on the
        concatenated effective batch (for mean-reduced losses) at the
        memory of a single microbatch.  ``Model.fit(step_target, ...,
        accum_target=..., accum_steps=steps)`` drives the interleaving.

        The reference has no accumulation concept (its optimizers fuse
        update into the train target, parser.nim:757-775); this extends
        that seam — both targets share ONE set of gradient kernels and
        the grad-sum state lives in ordinary cache tensors, so it
        checkpoints and resumes like adam moments.
        """
        if self.kind != FunKind.BACKWARDS:
            raise ParserError(
                "optimize_accum() must be applied to a backwards() node"
            )
        if steps < 1:
            raise ParserError("optimize_accum() needs steps >= 1")
        if params is None:
            params = self.trainable_params()
        accum_out = Fun("accum", FunKind.MULTIPLE)
        step_out = Fun("step", FunKind.MULTIPLE)
        for p in params:
            g = self.grad(p)
            inner = Fun(f"{p.name}.grad_sum", FunKind.CACHE)
            inner.cache_of = p

            def acc_effect(inner=inner):
                eff = Fun(inner.name, FunKind.EFFECT)
                eff.effect = inner
                return eff

            # accum target: grad_sum += g  (writes are ++= accumulate)
            a1 = acc_effect()
            it = iters("it")
            a1.raw[it] = g.raw[it]
            accum_out.children.append(a1)

            # step target: grad_sum += g; optim(param, grad_sum/steps);
            # then zero grad_sum (post-effect: after every optim read)
            a2 = acc_effect()
            it = iters("it")
            a2.raw[it] = g.raw[it]
            mean = Fun(f"{p.name}.grad_mean", FunKind.RESULT)
            it = iters("it")
            mean.raw[it] = a2.raw[it] * (1.0 / steps)
            p_eff = Fun(p.name, FunKind.EFFECT)
            p_eff.effect = p
            optim(p_eff, mean)
            step_out.children.append(p_eff)
            a3 = acc_effect()
            it = iters("it")
            a3.raw[it] = -a3.raw[it]
            step_out.post_effects.append(a3)

        out = Fun("optimize_accum", FunKind.MULTIPLE)
        out.children = [
            accum_out.target(accum_target),
            step_out.target(step_target),
        ]
        return out

    def reshape(self, shape: Sequence[int]) -> "Fun":
        out = Fun("reshape", FunKind.RESHAPE)
        out.children = [self]
        out.reshape_dims = list(shape)
        return out

    def pipe(self, fn: Callable, *args, **kwargs) -> "Fun":
        """Method-chaining helper: ``x.pipe(dense, 2, 4).pipe(relu)``."""
        return fn(self, *args, **kwargs)

    def __repr__(self) -> str:
        return f"<Fun {self.kind.value} {self.name!r}>"

    __hash__ = object.__hash__


class _ShapeProxy:
    __slots__ = ("fun",)

    def __init__(self, fun: Fun) -> None:
        self.fun = fun

    def __getitem__(self, dim: int) -> Index:
        return Index(
            ExprNode(NodeKind.INSTR, op=Op.SHAPE, tensor=self.fun, dim=dim)
        )

    @property
    def rank(self) -> Index:
        return Index(ExprNode(NodeKind.INSTR, op=Op.SHAPE_LEN, tensor=self.fun))


def _collect_children(node: ExprNode, fun: Fun) -> None:
    """Record tensors referenced by a kernel as graph children (parser.nim:429-434)."""
    for child in node.children:
        _collect_children(child, fun)
    if node.tensor is not None and node.tensor is not fun:
        if node.tensor not in fun.children:
            fun.children.append(node.tensor)


# ---------------------------------------------------------------------------
# graph constructors (reference parser.nim:713-832)
# ---------------------------------------------------------------------------

def input(name: str, shape: Sequence[int] = ()) -> Fun:  # noqa: A001
    """Model input; unknown dims are -1 (e.g. ``input("x", [-1, 28, 28, 1])``)."""
    fun = Fun(name, FunKind.INPUT)
    fun.input_shape = list(shape)
    return fun


input_ = input


def param(
    shape: Sequence[int],
    init_range: tuple[float, float] = (-0.1, 0.1),
    name: str = "",
    frozen: bool = False,
) -> Fun:
    """Trainable parameter, uniformly initialized in ``init_range``.

    ``frozen=True`` keeps the parameter in the forward graph (and in
    checkpoints) but excludes it from ``optimize()``/``optimize_accum()``
    — no update kernels are built and its gradient kernels are removed by
    dead-code elimination.  This is the fine-tuning seam ``lora_dense``
    builds on; the reference has no freezing concept (parser.nim:741-775
    always optimizes every param)."""
    fun = Fun(name, FunKind.PARAM)
    fun.param_shape = list(shape)
    fun.init_range = init_range
    fun.frozen = frozen
    return fun


def rand(fun: Fun, random_range: tuple[float, float]) -> Fun:
    """Tensor of fresh uniform random values with the same shape as ``fun``."""
    out = Fun("rand", FunKind.RANDOM)
    out.children = [fun]
    out.random_range = random_range
    return out


def cache(of: Fun, name: str = "", shape: Optional[Sequence] = None) -> Fun:
    """Persistent state tensor shaped like ``of`` (optimizer state).

    ``shape`` overrides the shape-copy default with an explicit dims
    constraint — state tensors smaller than their parameter (Adafactor's
    factored second moments, per-row statistics).  The tensor still
    belongs to ``of`` for checkpointing and sharding purposes; only its
    extent changes.  (Reference caches are always full-shape,
    parser.nim:795-798 — this extends that seam.)
    """
    inner = Fun(name, FunKind.CACHE)
    inner.cache_of = of
    out = Fun(name, FunKind.EFFECT)
    out.effect = inner
    if shape is not None:
        # USER-priority dims constraint attached to the EFFECT node:
        # flatten() reads shape_constr off EFFECT nodes and the effect
        # shares the cache's tensor id, so this beats the inferred COPY
        # constraint in sort_shape_constraints.
        nodes = [as_index(d).node for d in shape]
        out.shape_constr = _ShapeConstrBuilder("dims", dims=nodes)
        for node in nodes:
            _collect_children(node, out)
    return out


def grad(fun: Fun) -> Fun:
    """Inside custom_grad blocks: the gradient tensor of ``fun``."""
    out = Fun("grad_arg", FunKind.GRADIENT_ARG)
    out.children = [fun]
    return out


def extern(
    name: str,
    args: Sequence[Fun],
    outs: int = 1,
    attrs: Optional[dict] = None,
):
    """Invoke a registered opaque op (see ``exprgrad_tpu.registry``) as a
    graph node — the whole-op generalization of the reference's customGrad
    seam (parser.nim:568-589).

    Returns ``outs`` fresh result Funs (a single Fun when ``outs == 1``).
    Each output used by the model must be given a shape with ``with_shape``
    or ``copy_shape`` — extern results are opaque, so affine shape
    inference cannot see through them.  Extern ops have no derived
    gradient; attach one with ``custom_grad`` + ``extern_grads`` (or treat
    the op as non-differentiable).

    The registered op is evaluated once per target execution even when
    several outputs are consumed.  Its results are *accumulated* (+=) into
    the output tensors, consistent with ``++=`` kernel semantics.
    """
    funs = []
    for index in range(outs):
        out = Fun(f"{name}.{index}" if outs > 1 else name, FunKind.RESULT)
        out.children = list(args)
        out.kernels.append(
            ExternKernelBuilder(out, name, args, attrs, index, outs)
        )
        out.lock()  # further writes would invalidate the op's semantics
        funs.append(out)
    return funs[0] if outs == 1 else tuple(funs)


def extern_grads(
    name: str,
    args: Sequence[Fun],
    into: Sequence[Fun],
    attrs: Optional[dict] = None,
) -> None:
    """Accumulate the outputs of extern op ``name`` into existing tensors.

    Typically used inside a ``custom_grad`` block with ``grad(x)`` targets
    to register a fused backward kernel for an extern forward::

        with out.custom_grad():
            extern_grads("attention_grad", [q, k, v, out, lse, grad(out)],
                         into=[grad(q), grad(k), grad(v)], attrs=...)
    """
    into = list(into)
    for index, target in enumerate(into):
        builder = ExternKernelBuilder(
            target, name, args, attrs, index, len(into)
        )
        if _CUSTOM_GRAD_STACK:
            _CUSTOM_GRAD_STACK[-1].append(builder)
            continue
        if target.kind not in (FunKind.RESULT, FunKind.EFFECT):
            raise ParserError(
                f"cannot add an extern kernel to a {target.kind.value} node"
            )
        if target.locked:
            raise ParserError(
                f"tensor {target.name!r} is locked: no further kernels may "
                "write it"
            )
        target.kernels.append(builder)
        for arg in args:
            if arg is not target and arg not in target.children:
                target.children.append(arg)


def cond(branches: dict[str, Fun], otherwise: Optional[Fun] = None) -> Fun:
    """Select an input per target; used for GAN-style architectures."""
    out = Fun("cond", FunKind.COND)
    out.cond_branches = dict(branches)
    out.cond_else = otherwise
    return out


def make_opt(optim: Callable, *args, **kwargs) -> Callable[[Fun, Fun], None]:
    """Bind optimizer hyper-parameters (reference makeOpt, parser.nim:819)."""
    return functools.partial(optim, *args, **kwargs)


def uses_scoped_schedules(graphs: "Sequence[Fun] | Fun") -> bool:
    """True when any kernel in the graph carries a scope-restricted
    schedule — only then does compile() need to know the device platform
    (resolving it initializes the jax backend, which must stay lazy for
    everything else: the TPU tunnel can be down while host-side compiles
    continue)."""
    if isinstance(graphs, Fun):
        graphs = [graphs]
    seen: set[int] = set()
    stack = list(graphs)
    while stack:
        fun = stack.pop()
        if id(fun) in seen:
            continue
        seen.add(id(fun))
        for builder in fun.kernels:
            if any(scope for scope in builder.schedules):
                return True
            stack.extend(b.target for b in builder.custom_grads)
        stack.extend(fun.children)
        stack.extend(fun.post_effects)
        if fun.effect is not None:
            stack.append(fun.effect)
        if fun.cache_of is not None:
            stack.append(fun.cache_of)
        stack.extend(fun.cond_branches.values())
        if fun.cond_else is not None:
            stack.append(fun.cond_else)
    return False


def static_rank(fun: Fun) -> Optional[int]:
    """Best-effort tensor rank known at graph-build time, or None.

    Used by rank-polymorphic layers (layer_norm/rms_norm/dense/softmax over
    arbitrary leading dims) to build the right loop nest without the user
    reshaping to rank 2 around every layer.  Sources, in order: declared
    input/param shapes, reshape dims, user shape annotations, and the
    write arity of the producing kernel.
    """
    seen: set[int] = set()

    def walk(f: Fun) -> Optional[int]:
        if id(f) in seen:
            return None
        seen.add(id(f))
        kind = f.kind
        if kind == FunKind.INPUT:
            return len(f.input_shape) if f.input_shape else None
        if kind == FunKind.PARAM:
            return len(f.param_shape)
        if kind == FunKind.RESHAPE:
            return len(f.reshape_dims)
        if kind in (FunKind.RANDOM, FunKind.TARGET, FunKind.GRADIENT):
            return walk(f.children[-1]) if f.children else None
        if kind == FunKind.EFFECT:
            return walk(f.effect) if f.effect is not None else None
        if kind == FunKind.CACHE:
            return walk(f.cache_of) if f.cache_of is not None else None
        if kind in (FunKind.RESULT,):
            constr = f.shape_constr
            if constr is not None:
                if constr.kind == "dims":
                    return len(constr.dims)
                if constr.copy is not None:
                    return walk(constr.copy)
            for builder in f.kernels:
                if isinstance(builder, ExternKernelBuilder):
                    continue
                if not builder.is_raw:
                    return len(builder.dims)
            # raw-write layers (relu-style) have the shape of their single
            # source tensor (the raw-write COPY shape-inference rule)
            for builder in f.kernels:
                refs = [g for g in builder.referenced_funs() if g is not f]
                if refs:
                    return walk(refs[0])
            return None
        return None

    return walk(fun)


def layer(fn: Callable) -> Callable:
    """Decorator: name the returned Fun after the layer function."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        out = fn(*args, **kwargs)
        if isinstance(out, Fun) and not out.name:
            out.name = fn.__name__
        return out

    return wrapped


# ---------------------------------------------------------------------------
# graph -> Program lowering (reference parser.nim:261-417)
# ---------------------------------------------------------------------------

class _GraphLowering:
    """Per-build lowering state: Fun nodes are never mutated, so the same
    graph can be compiled any number of times (unlike the reference, whose
    ``fun.tensor`` assignment makes toProgram single-shot)."""

    def __init__(self, scope: str = "") -> None:
        self.program = ir.Program()
        self.tensor_of: dict[int, int] = {}
        self.scope = scope
        self._alloc_seen: set[int] = set()
        self._flat_seen: dict[int, set[str]] = {}

    # --- tensor allocation -------------------------------------------
    def alloc(self, fun: Fun) -> None:
        if id(fun) in self._alloc_seen:
            return
        self._alloc_seen.add(id(fun))
        program = self.program
        kind = fun.kind
        if kind == FunKind.INPUT:
            if fun.name not in program.inputs:
                program.inputs[fun.name] = program.alloc_tensor(
                    ir.TensorDef(
                        ir.TensorKind.INPUT,
                        shape=list(fun.input_shape),
                        name=fun.name,
                    )
                )
            tid = program.inputs[fun.name]
            self.tensor_of[id(fun)] = tid
            if program.tensors[tid].shape != list(fun.input_shape):
                raise ParserError(
                    f"declared shapes for input {fun.name!r} do not match"
                )
        elif kind == FunKind.PARAM:
            self.tensor_of[id(fun)] = program.alloc_tensor(
                ir.TensorDef(
                    ir.TensorKind.PARAM,
                    shape=list(fun.param_shape),
                    name=fun.name,
                    init_range=fun.init_range,
                )
            )
        elif kind == FunKind.RANDOM:
            self.tensor_of[id(fun)] = program.alloc_tensor(
                ir.TensorDef(
                    ir.TensorKind.RANDOM,
                    name=fun.name,
                    random_range=fun.random_range,
                )
            )
        elif kind in (FunKind.RESULT, FunKind.GRADIENT, FunKind.RESHAPE):
            self.tensor_of[id(fun)] = program.alloc_tensor(
                ir.TensorDef(
                    ir.TensorKind.RESULT, name=fun.name,
                    remat=getattr(fun, "remat_flag", False),
                )
            )
        elif kind == FunKind.EFFECT:
            assert fun.effect is not None
            self.alloc(fun.effect)
            self.tensor_of[id(fun)] = self.tensor_of[id(fun.effect)]
        elif kind == FunKind.CACHE:
            assert fun.cache_of is not None
            self.alloc(fun.cache_of)
            self.tensor_of[id(fun)] = program.alloc_tensor(
                ir.TensorDef(
                    ir.TensorKind.CACHE,
                    name=fun.name,
                    cache_of=self.tensor_of[id(fun.cache_of)],
                )
            )
        elif kind == FunKind.COND:
            for branch in fun.cond_branches.values():
                self.alloc(branch)
            if fun.cond_else is not None:
                self.alloc(fun.cond_else)

        for child in fun.children:
            self.alloc(child)
        for post in fun.post_effects:
            self.alloc(post)

        if kind == FunKind.TARGET:
            child_tid = self.tensor_of.get(id(fun.children[0]))
            if child_tid is not None:
                self.tensor_of[id(fun)] = child_tid

    # --- flattening ---------------------------------------------------
    def flatten(self, fun: Fun, target: ir.Target) -> None:
        seen = self._flat_seen.setdefault(id(fun), set())
        if target.name in seen:
            return
        for child in fun.children:
            self.flatten(child, target)
        if fun.kind == FunKind.EFFECT and fun.effect is not None:
            self.flatten(fun.effect, target)

        seen.add(target.name)
        tensor_of = self.tensor_of
        kind = fun.kind
        if kind in (FunKind.RESULT, FunKind.EFFECT):
            for builder in fun.kernels:
                target.kernels.append(
                    builder.build(tensor_of, scope=self.scope)
                )
            constr = fun.shape_constr
            if constr is not None:
                tid = tensor_of[id(fun)]
                if constr.kind == "copy":
                    assert constr.copy is not None
                    target.shapes.append(
                        ir.ShapeConstraint(
                            ir.ShapeConstrKind.COPY,
                            dest=tid,
                            priority=ir.ShapeConstrPriority.USER,
                            src=tensor_of[id(constr.copy)],
                        )
                    )
                else:
                    sc = ir.ShapeConstraint(
                        ir.ShapeConstrKind.DIMS,
                        dest=tid,
                        priority=ir.ShapeConstrPriority.USER,
                    )
                    for dim in constr.dims:
                        ctx = _BuildCtx(None, None, tensor_of)
                        sc.dims.append(ctx.build_linear(dim))
                    target.shapes.append(sc)
        elif kind == FunKind.BACKWARDS:
            target.kernels.append(
                ir.Kernel(
                    generator=ir.Generator(
                        ir.GenKind.BACKWARDS, tensor_of[id(fun.children[0])]
                    )
                )
            )
        elif kind == FunKind.GRADIENT:
            target.kernels.append(
                ir.Kernel(
                    generator=ir.Generator(
                        ir.GenKind.GRADIENT, tensor_of[id(fun.children[1])]
                    ),
                    write=ir.TensorOp(tensor=tensor_of[id(fun)]),
                )
            )
        elif kind == FunKind.RESHAPE:
            target.kernels.append(
                ir.Kernel(
                    generator=ir.Generator(
                        ir.GenKind.RESHAPE,
                        tensor_of[id(fun.children[0])],
                        reshape=list(fun.reshape_dims),
                    ),
                    write=ir.TensorOp(tensor=tensor_of[id(fun)]),
                )
            )
        elif kind == FunKind.COND:
            child = fun.cond_branches.get(target.name, fun.cond_else)
            if child is None:
                raise ParserError(
                    f"conditional node has no branch for target {target.name!r}"
                )
            self.flatten(child, target)
            tensor_of[id(fun)] = tensor_of[id(child)]
        elif kind == FunKind.RANDOM:
            target.shapes.append(
                ir.ShapeConstraint(
                    ir.ShapeConstrKind.COPY,
                    dest=tensor_of[id(fun)],
                    priority=ir.ShapeConstrPriority.USER,
                    src=tensor_of[id(fun.children[0])],
                )
            )
        # post-effects run AFTER this node's own kernels (EMA shadows
        # read the freshly-written parameter)
        for post in fun.post_effects:
            self.flatten(post, target)


def _collect_targets(fun: Fun, targets: dict[str, Fun], seen: set[int]) -> None:
    if id(fun) in seen:
        return
    seen.add(id(fun))
    if fun.kind == FunKind.TARGET:
        if fun.name in targets and targets[fun.name] is not fun:
            raise ParserError(
                f"there are multiple targets named {fun.name!r}; "
                "target names must be unique within a model"
            )
        targets[fun.name] = fun
    elif fun.kind == FunKind.COND:
        for branch in fun.cond_branches.values():
            _collect_targets(branch, targets, seen)
        if fun.cond_else is not None:
            _collect_targets(fun.cond_else, targets, seen)
    for child in fun.children:
        _collect_targets(child, targets, seen)
    for post in fun.post_effects:
        _collect_targets(post, targets, seen)
    if fun.effect is not None:
        _collect_targets(fun.effect, targets, seen)


def to_program(
    graphs: Sequence[Fun] | Fun, schedule_scope: str = ""
) -> ir.Program:
    """Lower computation graphs to an IR program (reference parser.nim:404-417).

    Re-entrant: graphs may be compiled multiple times; all lowering state
    lives in the per-call _GraphLowering, not on the Fun nodes.
    ``schedule_scope`` selects which scoped schedules are baked into the
    kernels ("tpu"/"cpu"; unscoped ones always apply) — ``compile``
    resolves it from the backend.
    """
    if isinstance(graphs, Fun):
        graphs = [graphs]
    lowering = _GraphLowering(schedule_scope)
    targets: dict[str, Fun] = {}
    seen: set[int] = set()
    for fun in graphs:
        lowering.alloc(fun)
        _collect_targets(fun, targets, seen)
    for name, fun in targets.items():
        target = ir.Target(
            name=name, output=lowering.tensor_of.get(id(fun))
        )
        lowering.flatten(fun, target)
        lowering.program.targets[name] = target
    return lowering.program
