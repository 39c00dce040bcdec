"""Model runtime: compile graphs, run named targets, train in batches.

Parity: reference model.nim — ``compile`` (model.nim:270-273), ``call``
(model.nim:392-406), ``apply`` (model.nim:408), ``fit`` with zero-copy batch
views and epoch tracking (model.nim:413-454), ``emit_ir`` (model.nim:262).

Architecture: a target is compiled per input-shape signature into an
executor.  The default executor traces the whole target (all kernels:
forward, derived backward, optimizer updates) into ONE jitted XLA program —
the analog of the reference's single straight-line JIT function per target
(llvmgen.nim:529-563) — so parameters live on device and XLA fuses across
kernels.  The numpy interpreter backend serves as the reference oracle.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from . import ir
from .errors import ModelRuntimeError
from .fun import Fun, to_program
from .interp import run_target
from .irprint import fmt_program
from .passes import compile_program, infer_shapes


class _InterpExecutor:
    """Oracle backend: run the target with the numpy interpreter."""

    def __init__(self, program: ir.Program, target: str) -> None:
        self.program = program
        self.target = target

    def run(
        self,
        tensors: dict[int, np.ndarray],
        shapes: dict[int, list[int]],
        epoch: int,
        seed: int,
    ) -> dict[int, np.ndarray]:
        rng = np.random.default_rng(seed)
        return run_target(
            self.program, self.target, shapes, dict(tensors), epoch, rng
        )


class Model:
    """A compiled model: named target entry points over shared state."""

    def __init__(
        self,
        source: ir.Program,
        backend: str = "jax",
        seed: Optional[int] = None,
        precision: str = "highest",
        schedule_mode: str = "auto",
        init_params: bool = True,
    ) -> None:
        self.source = source
        self.precision = precision
        if schedule_mode not in ("auto", "force", "ignore"):
            raise ValueError(
                "schedule_mode must be one of ('auto', 'force', 'ignore'), "
                f"got {schedule_mode!r}"
            )
        self.schedule_mode = schedule_mode
        self.program = source.copy()
        compile_program(self.program)
        self.backend = backend
        self.epoch = 0
        self._rng = np.random.default_rng(seed)
        self._executors: dict = {}
        self._call_count = 0
        self.batch_buckets = None  # see set_batch_buckets
        self._bucket_track_memo: dict = {}
        self._mutates_memo: dict = {}
        self._quantized_tids: set = set()  # see quantize_weights

        dtype = np.dtype(self.program.scalar_type.value)
        if dtype == np.float64 and backend == "jax":
            import jax

            if not jax.config.jax_enable_x64:
                import warnings

                warnings.warn(
                    "float64 model on a jax backend without x64 enabled: "
                    "computation will silently run in float32; call "
                    'jax.config.update("jax_enable_x64", True) first',
                    stacklevel=3,
                )
        self.params: dict[int, np.ndarray] = {}
        self.caches: dict[int, np.ndarray] = {}
        if not init_params:
            # caller provides params/caches (astype, loaders): skip the
            # draw entirely instead of generating arrays to be discarded
            return
        # Large float32-family tensors draw natively in float32: float64
        # generation + astype dominates compile() wall time for LM-sized
        # models (embeddings, block weights).  Small tensors keep the
        # original float64 stream so seeded inits of existing models are
        # unchanged.  The two paths consume the rng differently, so the
        # stream (not the distribution) depends on this size threshold.
        fast_floor = 1 << 16
        for tid in self.program.params:
            tdef = self.program.tensors[tid]
            lo, hi = tdef.init_range
            n = 1
            for d in tdef.shape:
                n *= d
            if dtype != np.float64 and n >= fast_floor:
                r = self._rng.random(size=tdef.shape, dtype=np.float32)
                r *= np.float32(hi - lo)  # in place: no 2x temporaries
                r += np.float32(lo)
                self.params[tid] = (
                    r if dtype == np.float32 else r.astype(dtype)
                )
            else:
                self.params[tid] = self._rng.uniform(
                    lo, hi, size=tdef.shape
                ).astype(dtype, copy=False)
        for tid in self.program.caches:
            tdef = self.program.tensors[tid]
            self.caches[tid] = np.zeros(tdef.shape, dtype=dtype)

    # --- introspection ------------------------------------------------
    def emit_ir(self, target: Optional[str] = None) -> str:
        """IR dump for inspection; ``target`` restricts to one target and
        the tensors it references."""
        if target is not None and target not in self.program.targets:
            raise ModelRuntimeError(f"unknown target {target!r}")
        return fmt_program(self.program, target)

    def executable(
        self, target_name: str, input_shapes: dict[str, Sequence[int]]
    ):
        """Ahead-of-time compiled callable for serving.

        Returns a function ``fn(args: dict[str, array]) -> array`` bound to
        fixed input shapes; inputs may live on device already.  Parameters
        are captured at call time from the model (device-resident).
        """
        pairs = [
            (self.program.inputs[name], list(shape))
            for name, shape in input_shapes.items()
        ]
        shapes = infer_shapes(self.program, target_name, pairs)
        executor = self._executor(target_name, shapes)
        output = self.program.targets[target_name].output

        def fn(args: dict[str, np.ndarray]):
            tensors = {
                self.program.inputs[name]: value for name, value in args.items()
            }
            tensors.update(self.params)
            tensors.update(self.caches)
            seed = int(self._rng.integers(0, 2**31 - 1))
            result = executor.run(tensors, shapes, self.epoch, seed)
            return result[output] if output is not None else None

        return fn

    def summary(self) -> str:
        """Human-readable parameter/cache table with totals, plus the
        per-target kernel counts — the quick sanity view of a compiled
        model.  Reads only shapes (``np.shape``): no device->host
        transfers, safe on large jax-resident models."""
        from .quant import QuantW

        def table(items):
            lines, total = [], 0
            for tid, value in items.items():
                if isinstance(value, QuantW):  # quantize_weights codes
                    shape = np.shape(value.codes)
                else:
                    shape = np.shape(value)
                n = int(np.prod(shape))
                total += n
                lines.append(
                    f"  t{tid:<4} "
                    f"{self.program.tensors[tid].name or '<unnamed>':<18} "
                    f"{str(list(shape)):<18} {n:>10,}"
                )
            return lines, total

        lines, total = table(self.params)
        cache_lines, cache_total = table(self.caches)
        out = [f"Model: {len(self.params)} parameters "
               f"({total:,} elements), {len(self.caches)} caches "
               f"({cache_total:,} elements), epoch {self.epoch}"]
        out.append("parameters:")
        out.extend(lines)
        if cache_lines:
            out.append("caches:")
            out.extend(cache_lines)
        out.append("targets:")
        for name, target in self.program.targets.items():
            out.append(f"  {name:<12} {len(target.kernels)} kernels")
        return "\n".join(out)

    def ema_params(self) -> dict[int, np.ndarray]:
        """Debiased EMA shadow parameters (train with
        ``layers.with_ema(opt, decay)``), keyed by parameter tensor id.

        The ``"ema.w"`` companion cache tracks the exact bias weight
        (``1 - decay^steps`` after ``steps`` applied updates), so the
        returned values are ``ema / ema.w`` — correct for any stepping
        discipline.  Serve with
        ``model.params.update(model.ema_params())`` (keep a copy of
        ``model.params`` to swap back).
        """
        shadows: dict[int, int] = {}
        weights: dict[int, int] = {}
        for tid, tdef in enumerate(self.program.tensors):
            if (
                tdef.kind != ir.TensorKind.CACHE
                or tdef.cache_of is None
                or tid not in self.caches
            ):
                continue
            table = {"ema": shadows, "ema.w": weights}.get(tdef.name)
            if table is None:
                continue
            if tdef.cache_of in table:
                raise ModelRuntimeError(
                    f"parameter t{tdef.cache_of} has multiple "
                    f"{tdef.name!r} shadows (with_ema applied in more "
                    "than one target?); ema_params would be ambiguous"
                )
            table[tdef.cache_of] = tid
        if not shadows:
            raise ModelRuntimeError(
                "model has no EMA shadows; train with "
                "layers.with_ema(opt, decay)"
            )
        out: dict[int, np.ndarray] = {}
        for pid, tid in shadows.items():
            val = np.asarray(self.caches[tid])
            w = np.asarray(self.caches[weights[pid]])
            if float(np.max(w)) == 0.0:
                raise ModelRuntimeError(
                    "EMA shadow has seen no training steps yet"
                )
            out[pid] = (val / w).astype(val.dtype)
        return out

    def astype(self, dtype: str) -> "Model":
        """A new model with the same program and the parameters, caches,
        and epoch carried over, cast to ``dtype``.

        The TPU serving move: train in float32 (f32 master weights, MXU
        matmuls already run bf16 passes under ``precision="default"``),
        then ``model.astype("bfloat16")`` halves parameter/activation HBM
        for inference.  Executors recompile lazily at the new dtype; the
        original model is untouched.  Continuing to *train* the cast
        model works but rounds small updates away — cast for serving.
        """
        if self._quantized_tids:
            raise ModelRuntimeError(
                "cannot astype a weight-quantized model; cast first, "
                "then quantize_weights()"
            )
        nd = np.dtype(dtype)
        src = self.source.copy()
        src.scalar_type = ir.ScalarType(nd.name)
        out = Model(src, backend=self.backend, precision=self.precision,
                    schedule_mode=self.schedule_mode, init_params=False)
        out.params = {
            tid: np.asarray(v).astype(nd) for tid, v in self.params.items()
        }
        out.caches = {
            tid: np.asarray(v).astype(nd) for tid, v in self.caches.items()
        }
        out.epoch = self.epoch
        # carry the rand()/dropout stream so the cast model stays as
        # deterministic as the original
        out._rng.bit_generator.state = self._rng.bit_generator.state
        return out

    def quantize_weights(
        self,
        target_name: str = "predict",
        dtype: str = "int8",
        names: Optional[set] = None,
        min_size: int = 256,
    ) -> dict[str, tuple]:
        """Weight-only int8 quantization (W8A16) for inference serving.

        Each eligible parameter is replaced in-place by int8 codes plus
        per-output-channel f32 scales; the executor dequantizes inside
        the jitted program, so the int8 codes are what lives in HBM
        (1/4 the f32 bytes) and the convert+scale fuses into the
        consuming dot.  *Which* axes get scales is inferred from the
        kernel IR of ``target_name`` (quant.infer_quant_axes): read
        axes indexed by reduction iterators are contracted into the
        scale's max, the rest keep one scale per channel.  Parameters
        read raw, via computed indices (embeddings), through externs,
        or only elementwise (biases, norm gammas) stay full precision,
        as does anything smaller than ``min_size`` elements or not in
        ``names`` (when given).

        Quantization is inference-only: calling a target that *updates*
        a quantized parameter (e.g. "train") raises.  Checkpoint before
        quantizing — ``save_model`` stores full-precision weights only.
        Returns ``{param_name: contraction_axes}`` for what was
        quantized.
        """
        from .quant import (QuantW, check_weight_dtype,
                            infer_quant_axes, quantize_weight)

        if self.backend == "interp":
            raise ModelRuntimeError(
                "weight quantization is a jax-backend serving feature "
                "(the interpreter is the full-precision oracle)"
            )
        check_weight_dtype(dtype)
        if target_name not in self.program.targets:
            raise ModelRuntimeError(
                f"no target {target_name!r} to infer quantization axes "
                f"from (targets: {sorted(self.program.targets)})"
            )
        done: dict[str, tuple] = {}
        for tid in self.program.params:
            tdef = self.program.tensors[tid]
            if names is not None and tdef.name not in names:
                continue
            value = self.params[tid]
            if isinstance(value, QuantW):
                continue
            if int(np.prod(np.shape(value), dtype=np.int64)) < min_size:
                continue
            axes = infer_quant_axes(self.program, tid, target_name)
            if axes is None:
                continue
            self.params[tid] = quantize_weight(value, axes)
            self._quantized_tids.add(tid)
            done[tdef.name] = axes
        return done

    def export_compiled(
        self,
        target_name: str,
        input_shapes: dict[str, Sequence[int]],
        path: Optional[str] = None,
        seed: int = 0,
    ) -> bytes:
        """Serialize an ahead-of-time compiled serving artifact.

        The target is traced with the current parameters/caches **embedded
        as constants** and exported via ``jax.export`` (StableHLO): the
        result is a self-contained model+weights artifact that loads with
        ``exprgrad_tpu.load_compiled`` — no graph, compiler, or parameter
        files needed at serving time, and no recompilation (this doubles
        as a manual compile cache).  Bound to fixed input shapes and the
        exporting platform.  ``rand()`` tensors are fixed to ``seed``.
        """
        if self._quantized_tids:
            raise ModelRuntimeError(
                "cannot export_compiled a weight-quantized model "
                "(StableHLO export embeds plain-array constants); "
                "export first, then quantize_weights()"
            )
        import jax
        import jax.numpy as jnp

        pairs = [
            (self.program.inputs[name], list(shape))
            for name, shape in input_shapes.items()
        ]
        shapes = infer_shapes(self.program, target_name, pairs)
        executor = self._executor(target_name, shapes)
        output = self.program.targets[target_name].output
        if output is None:
            raise ModelRuntimeError(
                f"target {target_name!r} has no output to export"
            )
        state = {
            tid: jnp.asarray(value)
            for tid, value in {**self.params, **self.caches}.items()
        }
        epoch = self.epoch
        names = sorted(input_shapes)

        def serve(args: dict):
            tensors = {self.program.inputs[n]: args[n] for n in names}
            tensors.update(state)  # closed over -> exported as constants
            result = executor.run_fn(tensors, epoch, seed)
            return result[output]

        dtype = jnp.dtype(self.program.scalar_type.value)
        spec = {
            n: jax.ShapeDtypeStruct(tuple(input_shapes[n]), dtype)
            for n in names
        }
        from jax import export as jax_export

        data = jax_export.export(jax.jit(serve))(spec).serialize()
        if path is not None:
            with open(path, "wb") as f:
                f.write(data)
        return data

    def save_hlo(
        self,
        path: str,
        target_name: str,
        input_shapes: dict[str, Sequence[int]],
        optimized: bool = True,
    ) -> None:
        """Dump the target's (optimized) HLO text — the introspection analog
        of the reference's LLVM bitcode dump (saveLlvm, model.nim:266-268)."""
        import jax

        pairs = [
            (self.program.inputs[name], list(shape))
            for name, shape in input_shapes.items()
        ]
        shapes = infer_shapes(self.program, target_name, pairs)
        executor = self._executor(target_name, shapes)
        dtype = np.dtype(self.program.scalar_type.value)
        inputs = {}
        for tid in executor.input_tids:
            tdef = self.program.tensors[tid]
            inputs[tid] = jax.ShapeDtypeStruct(tuple(shapes[tid]), dtype)
        lowered = jax.jit(executor.run_fn).lower(inputs, 0, 0)
        if optimized:
            text = lowered.compile().as_text()
        else:
            text = lowered.as_text()
        with open(path, "w") as f:
            f.write(text)

    def lowering_stats(self, target_name: str) -> dict[str, int]:
        """How each kernel of already-compiled executors was lowered
        (einsum / conv / pallas / general)."""
        out: dict[str, int] = {}
        for (name, _), executor in self._executors.items():
            if name == target_name:
                for key, count in getattr(executor, "stats", {}).items():
                    out[key] = out.get(key, 0) + count
        return out

    def profile(self, target_name: str, args: dict, logdir: str) -> None:
        """Run one call under the JAX profiler; view with tensorboard."""
        import jax

        with jax.profiler.trace(logdir):
            self.call(target_name, args)

    def autotune(self, target_name: str, args: Optional[dict] = None, **kw):
        """Search tile sizes for this target's scheduled kernels by
        MEASURING candidates end-to-end on the current backend, install
        the fastest, and return the :class:`~exprgrad_tpu.autotune.
        TuneReport` (str() it for the table).

        The schedule-stripped XLA route is always a candidate, so the
        result can only match or beat both the hand schedule and plain
        XLA on this machine.  Pins ``schedule_mode="force"`` so later
        calls honor the tuned schedule (a kernel whose winner was the
        XLA route simply has no schedule left to force)."""
        from .autotune import tune

        report = tune(self, target_name, args, **kw)
        self.schedule_mode = "force"
        self._executors.clear()
        return report

    # --- execution ----------------------------------------------------
    def _executor(self, target: str, shapes: dict[int, list[int]]):
        key = (target, tuple(sorted((t, tuple(s)) for t, s in shapes.items())))
        if key not in self._executors:
            if self.backend == "interp":
                self._executors[key] = _InterpExecutor(self.program, target)
            else:
                from .backend.executor import JaxExecutor

                self._executors[key] = JaxExecutor(
                    self.program, target, shapes, precision=self.precision,
                    schedule_mode=self.schedule_mode,
                )
        return self._executors[key]

    def _input_shapes(
        self, target: str, args: dict[str, np.ndarray]
    ) -> list[tuple[int, list[int]]]:
        out = []
        for name, value in args.items():
            if name not in self.program.inputs:
                raise ModelRuntimeError(f"{name!r} is not an input to the model")
            out.append((self.program.inputs[name], list(np.shape(value))))
        return out

    def _check_quantized(self, target_name: str, executor) -> None:
        """Refuse to run a target that would UPDATE weight-quantized
        parameters (quantize_weights is inference-only); shared by every
        execution path (call/apply, fit batch loop, fit scan-epoch)."""
        if not self._quantized_tids:
            return
        hit = self._quantized_tids.intersection(executor.donated_tids)
        if hit:
            hit_names = sorted(
                self.program.tensors[t].name for t in hit
            )
            raise ModelRuntimeError(
                f"target {target_name!r} updates quantized "
                f"parameter(s) {hit_names}; weight quantization is "
                "inference-only — reload the full-precision "
                "checkpoint to train"
            )

    def _run(
        self, target_name: str, args: dict[str, np.ndarray], shapes
    ) -> Optional[np.ndarray]:
        target = self.program.targets[target_name]
        dtype = np.dtype(self.program.scalar_type.value)
        tensors: dict[int, np.ndarray] = {}
        for name, value in args.items():
            tid = self.program.inputs[name]
            if (
                self.backend == "jax"
                and not isinstance(value, np.ndarray)
                and hasattr(value, "sharding")
                and value.dtype == dtype
            ):
                # already a device-resident jax array of the right dtype
                # (e.g. placed ahead of time by io.Prefetcher): feed it
                # straight to the jitted executor — converting through
                # numpy here would force a device->host round trip
                tensors[tid] = value
            else:
                tensors[tid] = np.ascontiguousarray(value, dtype=dtype)
        tensors.update(self.params)
        tensors.update(self.caches)

        self._call_count += 1
        seed = int(self._rng.integers(0, 2**31 - 1))
        executor = self._executor(target_name, shapes)
        self._check_quantized(target_name, executor)
        result = executor.run(tensors, shapes, self.epoch, seed)

        for tid in self.params:
            if tid in result:
                self.params[tid] = result[tid]
        for tid in self.caches:
            if tid in result:
                self.caches[tid] = result[tid]
        if target.output is not None:
            return np.asarray(result[target.output])
        return None

    def set_batch_buckets(self, buckets) -> None:
        """Enable shape-bucketed padding for :meth:`call`.

        Every new input-shape signature costs a fresh XLA trace+compile
        (25s–5min through this platform's tunnel — SURVEY §7 "hard
        parts"; the reference instead JITs one shape-polymorphic function
        per target, model.nim:392-406).  With buckets set, ``call`` pads
        the leading (batch) dim of its inputs up to the next bucket
        boundary and slices the output back, so every batch size within a
        bucket reuses ONE compiled executor.

        ``buckets``: a sorted list of sizes (e.g. ``[8, 32, 128]``), or
        ``"pow2"`` to round up to the next power of two.  Padding
        replicates the last row (no NaN-generating zero rows through
        softmax/log paths).

        Scope: per-row-independent *inference* targets, checked
        statically before padding.  A target is bucketed only when (a)
        it writes no parameter/cache (training always runs exact — the
        padded rows would change batch-mean gradients), (b) its output's
        leading dim tracks the batch under shape inference, and (c) a
        kernel-lineage scan finds no read that REDUCES over a
        batch-sized leading dim (e.g. an auxiliary input of coincidental
        length, or a mean-over-batch intermediate) — any such target
        runs at its exact shape instead, costing a compile per batch
        size but never wrong numbers.  Extern ops (attention, moe) are
        assumed batch-row-independent.
        """
        from .utils.buckets import normalize_buckets

        self.batch_buckets = normalize_buckets(buckets, "batch bucket")

    def _bucket_for(self, b: int) -> int:
        from .utils.buckets import bucket_for

        return bucket_for(self.batch_buckets, b)

    def _target_mutates(self, target_name: str) -> bool:
        """Does the target write any parameter or cache tensor?
        (memoized: static per target)"""
        cached = self._mutates_memo.get(target_name)
        if cached is not None:
            return cached
        mutating = (ir.TensorKind.PARAM, ir.TensorKind.CACHE)
        result = any(
            kern.write is not None
            and self.program.tensors[kern.write.tensor].kind in mutating
            for kern in self.program.targets[target_name].kernels
        )
        self._mutates_memo[target_name] = result
        return result

    @staticmethod
    def _index_regs(index) -> set:
        regs = set(index.factors.keys())
        for instr in index.setup:
            regs.update(instr.args)
        return regs

    def _bucket_pad_safe(self, target_name: str, shapes0: dict,
                         b: int) -> bool:
        """Is edge-padding every batch-sized leading dim sound for this
        target?  Unsafe pattern: a kernel READS a tensor whose leading
        dim equals the batch but the read's dim-0 registers are absent
        from the write's dims — i.e. the kernel reduces over that dim,
        so padded rows would contaminate real rows (found by review: an
        auxiliary input of coincidental length b summed into the
        output).  Conservative: any such read disables bucketing."""
        for kern in self.program.targets[target_name].kernels:
            write = kern.write
            if write is None or kern.extern is not None:
                continue  # extern ops are batch-row-independent (doc'd)
            wregs = set()
            for d in write.dims:
                wregs |= self._index_regs(d)
            for read in kern.reads:
                shape = shapes0.get(read.tensor)
                if not shape or shape[0] != b or not read.dims:
                    continue
                if read.is_raw:
                    # raw reads flatten the batch dim into one register;
                    # safe only for raw-to-raw elementwise copies
                    if not (write.is_raw and self._index_regs(
                            read.dims[0]) <= wregs):
                        return False
                    continue
                if not self._index_regs(read.dims[0]) <= wregs:
                    return False
        return True

    def call(
        self, target_name: str, args: Optional[dict[str, np.ndarray]] = None
    ) -> np.ndarray:
        """Compute the value of a target for the given inputs.

        With :meth:`set_batch_buckets` active, inference targets run at
        the padded bucket size and the output is sliced back — batch-size
        changes within a bucket reuse the compiled executor."""
        args = args or {}
        if target_name not in self.program.targets:
            raise ModelRuntimeError(
                f"{target_name!r} is not a target of the model"
            )
        b = padded = None
        if (
            self.batch_buckets is not None
            and args
            and not self._target_mutates(target_name)
        ):
            b = int(next(iter(
                np.shape(v)[0] for v in args.values() if np.shape(v)
            ), 0))
            padded = self._bucket_for(b) if b else None
            if padded is not None and padded > b:
                # bucket only when the output's leading dim TRACKS the
                # batch (per-row target): a target whose output happens
                # to match the padded size coincidentally must not be
                # sliced, and a batch-aggregating target (scalar loss,
                # per-class sums) must not see padded rows at all
                memo_key = (target_name, b,
                            tuple(sorted(
                                (n, np.shape(v)) for n, v in args.items()
                            )))
                track = self._bucket_track_memo.get(memo_key)
                if track is None:
                    out_tid = self.program.targets[target_name].output
                    track = False
                    if out_tid is not None:
                        shapes0 = infer_shapes(
                            self.program, target_name,
                            self._input_shapes(target_name, args),
                        )
                        out0 = shapes0.get(out_tid)
                        track = (
                            bool(out0) and out0[0] == b
                            and self._bucket_pad_safe(
                                target_name, shapes0, b
                            )
                        )
                    self._bucket_track_memo[memo_key] = track
                if track:
                    args = {
                        name: (
                            np.pad(
                                np.asarray(v),
                                [(0, padded - b)]
                                + [(0, 0)] * (np.ndim(v) - 1),
                                mode="edge",
                            )
                            if np.shape(v) and np.shape(v)[0] == b
                            else v
                        )
                        for name, v in args.items()
                    }
                else:
                    padded = None
            else:
                padded = None
        shapes = infer_shapes(
            self.program, target_name, self._input_shapes(target_name, args)
        )
        out = self._run(target_name, args, shapes)
        if (
            padded is not None
            and out is not None
            and np.ndim(out) >= 1
            and np.shape(out)[0] == padded
        ):
            out = out[:b]
        return out

    def apply(
        self, target_name: str, args: Optional[dict[str, np.ndarray]] = None
    ) -> None:
        """Compute a target for its side effects, discarding the value."""
        self.call(target_name, args)

    def fit(
        self,
        target_name: str,
        args: dict[str, np.ndarray],
        batch_size: int = 32,
        log_status: bool = True,
        shuffle: bool = False,
        scan_batches: bool = False,
        monitor: Optional[str] = None,
        accum_target: Optional[str] = None,
        accum_steps: int = 1,
    ) -> Optional[float]:
        """Run a target over all batches of the inputs; increments epoch.

        Like the reference (model.nim:425, README.md:367), samples beyond the
        last full batch are dropped.  ``shuffle=True`` visits samples in a
        fresh random order each epoch (native Fisher-Yates + row gather).
        ``scan_batches=True`` compiles the whole epoch into ONE XLA program
        (lax.scan over batches, parameters as the loop carry) — removes
        per-batch dispatch overhead entirely (jax backend only).

        ``monitor`` names a scalar target (typically "loss") evaluated on
        the first batch after the epoch; its value is returned (and shown
        on the progress line when ``log_status``).

        Gradient accumulation (``Fun.optimize_accum``): pass the
        accumulate-only target as ``accum_target`` and the group size as
        ``accum_steps`` — every group of ``accum_steps`` batches runs
        ``accum_steps - 1`` accumulate batches then one ``target_name``
        (step) batch, one optimizer update per group at the memory of a
        single microbatch.  A trailing partial group leaves its gradient
        sums in the caches; they roll into the next epoch's first step.
        """
        if not args:
            raise ModelRuntimeError(
                "Model.fit requires at least one input tensor; "
                "use Model.apply for targets without inputs"
            )
        if target_name not in self.program.targets:
            raise ModelRuntimeError(
                f"{target_name!r} is not a target of the model"
            )
        if accum_steps < 1:
            raise ModelRuntimeError("accum_steps must be >= 1")
        if accum_target is not None:
            if accum_target not in self.program.targets:
                raise ModelRuntimeError(
                    f"accum target {accum_target!r} is not a target of "
                    "the model"
                )
            if scan_batches:
                raise ModelRuntimeError(
                    "gradient accumulation is not supported with "
                    "scan_batches (the scan carries only parameters)"
                )
        elif accum_steps != 1:
            raise ModelRuntimeError(
                "accum_steps > 1 requires accum_target (see "
                "Fun.optimize_accum)"
            )
        first = next(iter(args.values()))
        batch_count = first.shape[0] // batch_size

        input_shapes = []
        for name, value in args.items():
            if name not in self.program.inputs:
                raise ModelRuntimeError(f"{name!r} is not an input to the model")
            input_shapes.append(
                (self.program.inputs[name], [batch_size] + list(value.shape[1:]))
            )
        shapes = infer_shapes(self.program, target_name, input_shapes)
        accum_shapes = None
        if accum_target is not None:
            accum_shapes = infer_shapes(
                self.program, accum_target, input_shapes
            )

        order = None
        if shuffle:
            from .utils.native import gather_rows, shuffle_indices

            order = shuffle_indices(
                first.shape[0], int(self._rng.integers(0, 2**31 - 1))
            )

        if monitor is not None and monitor not in self.program.targets:
            raise ModelRuntimeError(
                f"monitor target {monitor!r} is not a target of the model"
            )

        if scan_batches and self.backend != "interp":
            self.epoch += 1
            self._fit_scan(target_name, args, shapes, batch_size,
                           batch_count, order)
            return self._monitor(monitor, args, batch_size, log_status)

        self.epoch += 1
        for batch in range(batch_count):
            if log_status:
                print(f"\r{batch}/{batch_count}", end="", flush=True)
            offset = batch * batch_size
            if order is None:
                batch_args = {
                    name: value[offset : offset + batch_size]
                    for name, value in args.items()
                }
            else:
                idx = order[offset : offset + batch_size]
                batch_args = {
                    name: gather_rows(np.asarray(value), idx)
                    for name, value in args.items()
                }
            if (accum_target is not None
                    and batch % accum_steps != accum_steps - 1):
                self._run(accum_target, batch_args, accum_shapes)
            else:
                self._run(target_name, batch_args, shapes)
        if log_status:
            print(f"\r{batch_count}/{batch_count}")
        return self._monitor(monitor, args, batch_size, log_status)

    def _monitor(
        self, monitor: Optional[str], args, batch_size: int,
        log_status: bool,
    ) -> Optional[float]:
        """Evaluate the monitor target on the first batch; scalar value."""
        if monitor is None:
            return None
        first = {
            name: value[:batch_size] for name, value in args.items()
        }
        value = float(np.asarray(self.call(monitor, first)).reshape(-1)[0])
        if log_status:
            print(f"epoch {self.epoch}: {monitor} {value:.6f}")
        return value


    def _fit_scan(
        self, target_name, args, shapes, batch_size, batch_count, order
    ) -> None:
        import numpy as _np

        from .utils.native import gather_rows

        dtype = np.dtype(self.program.scalar_type.value)
        executor = self._executor(target_name, shapes)
        self._check_quantized(target_name, executor)
        batches: dict[int, np.ndarray] = {}
        for name, value in args.items():
            tid = self.program.inputs[name]
            value = np.ascontiguousarray(value, dtype=dtype)
            if order is not None:
                value = gather_rows(value, order)
            usable = batch_count * batch_size
            batches[tid] = value[:usable].reshape(
                (batch_count, batch_size) + value.shape[1:]
            )
        tensors = dict(self.params)
        tensors.update(self.caches)
        seeds = _np.asarray(
            self._rng.integers(0, 2**31 - 1, size=batch_count), _np.int64
        )
        result = executor.run_epoch(tensors, batches, self.epoch, seeds)
        for tid in self.params:
            if tid in result:
                self.params[tid] = result[tid]
        for tid in self.caches:
            if tid in result:
                self.caches[tid] = result[tid]


def load_compiled(data: bytes | str):
    """Load a serving artifact written by ``Model.export_compiled``.

    Accepts the serialized bytes or a file path; returns
    ``fn(args: dict[str, array]) -> array``.  The artifact embeds the
    compiled program AND the parameters — nothing else is needed.
    """
    from jax import export as jax_export

    if isinstance(data, str):
        with open(data, "rb") as f:
            data = f.read()
    exported = jax_export.deserialize(bytearray(data))

    def fn(args: dict):
        return exported.call(args)

    return fn


def compile(  # noqa: A001
    graphs: Sequence[Fun] | Fun,
    dtype: str = "float32",
    backend: str = "jax",
    seed: Optional[int] = None,
    precision: str = "highest",
    schedule_mode: str = "auto",
) -> Model:
    """Compile computation graphs into a model (reference model.nim:270).

    ``precision`` controls MXU matmul precision for float32 models:
    "highest" (default) matches the CPU oracle to ~1e-6; "default" uses
    fast bfloat16-pass matmuls on TPU.

    ``schedule_mode`` controls how per-kernel schedules (``Fun.schedule``)
    are routed: "auto" (default) honors a schedule only when the measured
    cost model predicts the Pallas kernel beats the XLA lowering, warning
    (ScheduleWarning) on every fallback; "force" always honors matching
    schedules (kernel development / benchmarking); "ignore" never emits
    Pallas.  See backend/policy.py.

    Scoped schedules (``Fun.schedule(..., scope="tpu"/"cpu")``) are
    resolved here: the jax backend compiles under scope "tpu" when the
    default device is a TPU, else "cpu"; the interpreter always "cpu".
    Scope resolution only queries the device platform when the graph
    actually carries scoped schedules — plain compiles stay host-side
    (the backend initializes lazily at first execution; see CLAUDE.md on
    tunnel outages).
    """
    from .fun import uses_scoped_schedules

    scope = "cpu"
    if backend == "jax" and uses_scoped_schedules(graphs):
        import jax

        scope = "tpu" if jax.default_backend() in ("tpu", "axon") else "cpu"
    source = to_program(graphs, schedule_scope=scope)
    source.scalar_type = ir.ScalarType(np.dtype(dtype).name)
    return Model(source, backend=backend, seed=seed, precision=precision,
                 schedule_mode=schedule_mode)
