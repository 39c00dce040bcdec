"""Target executor: one jitted XLA program per (target, shape signature).

The reference JIT-compiles each target into a single LLVM function executing
all kernels back to back (llvmgen.nim:529-563, model.nim:385-390).  Here the
whole target — forward kernels, derived gradient kernels, optimizer updates
— traces into one ``jax.jit`` program: parameters stay device-resident,
XLA fuses elementwise chains across kernels, and contractions hit the MXU.

State is functional: the executor returns updated parameter/cache tensors
and the model runtime swaps them in (the analog of the reference's in-place
parameter writes, made XLA-friendly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import ir
from ..ir import Program
from .jaxeval import KernelLowering


class JaxExecutor:
    def __init__(
        self,
        program: Program,
        target_name: str,
        shapes: dict[int, list[int]],
        precision: str = "highest",
        schedule_mode: str = "auto",
    ) -> None:
        self.program = program
        self.target = program.targets[target_name]
        self.shapes = shapes
        self.dtype = jnp.dtype(program.scalar_type.value).type
        self.precision = {
            "default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST,
        }[precision]
        from .policy import SchedulePolicy

        self.policy = SchedulePolicy(schedule_mode)

        self.input_tids = sorted(
            tid
            for tid in self.target.tensors
            if program.tensors[tid].kind
            in (ir.TensorKind.INPUT, ir.TensorKind.PARAM, ir.TensorKind.CACHE)
        )
        written = {
            k.write.tensor
            for k in self.target.kernels
            if k.write is not None
        }

        # matmul+epilogue fusion plan: scheduled matmuls whose sole
        # elementwise consumer folds into the Pallas flush step
        from .pallasgen import plan_epilogue_fusions, plan_rowchain_fusions

        self.fused, self._skip_kernels, fused_away = plan_epilogue_fusions(
            program, self.target, shapes, self.dtype, self.precision,
            self.policy,
        )
        # map/reduce row-chain fusion plan: scheduled row-op chains
        # (softmax/layer-norm families) fused into ONE Pallas kernel with
        # VMEM-resident intermediates (one HBM read instead of 2-3)
        self.row_fused, row_skip, row_away = plan_rowchain_fusions(
            program, self.target, shapes, self.dtype, self.precision,
            self.policy,
            consumed=self._skip_kernels | set(self.fused),
        )
        self._skip_kernels = self._skip_kernels | row_skip
        fused_away = fused_away | row_away

        # jit outputs: ONLY the state the runtime reads back (updated
        # params/caches) and the target's result.  Intermediate RESULT
        # tensors must NOT escape the jit — as outputs XLA would have to
        # materialize every activation in HBM, blocking fusion and
        # rematerialization; kept internal they fuse/free at XLA's
        # discretion (the whole point of the one-jit target design).
        state_written = {
            tid
            for tid in written
            if program.tensors[tid].kind
            in (ir.TensorKind.PARAM, ir.TensorKind.CACHE)
        }
        self.output_tids = sorted(
            (
                state_written
                | (
                    {self.target.output}
                    if self.target.output is not None
                    else set()
                )
            )
            - fused_away
        )
        self.random_tids = sorted(
            tid
            for tid in self.target.tensors
            if program.tensors[tid].kind == ir.TensorKind.RANDOM
        )

        # parameters/caches the target updates are donated: XLA reuses their
        # device buffers for the new values (in-place updates, the analog of
        # the reference's mutable parameter tensors)
        self.donated_tids = sorted(
            tid
            for tid in self.input_tids
            if program.tensors[tid].kind
            in (ir.TensorKind.PARAM, ir.TensorKind.CACHE)
            and tid in written
        )
        donated_set = set(self.donated_tids)
        self.kept_tids = [t for t in self.input_tids if t not in donated_set]

        from ..interp import accumulation_identity, extreme_accumulated_results

        extreme = extreme_accumulated_results(self.target)

        def run_fn(inputs: dict, epoch, seed):
            from ..quant import QuantW, dequantize

            dt = jnp.dtype(program.scalar_type.value)
            # quantized parameters (Model.quantize_weights) enter as
            # QuantW pytrees; the convert+scale fuses into their
            # consuming dots, so the int8 codes are what lives in HBM
            tensors = {
                tid: dequantize(v, dt) if isinstance(v, QuantW) else v
                for tid, v in inputs.items()
            }
            for tid in sorted(self.target.tensors):
                tdef = program.tensors[tid]
                if tdef.kind == ir.TensorKind.RESULT:
                    if tid in extreme:
                        tensors[tid] = jnp.full(
                            tuple(self.shapes[tid]),
                            accumulation_identity(extreme[tid]),
                            dtype=dt,
                        )
                    else:
                        tensors[tid] = jnp.zeros(
                            tuple(self.shapes[tid]), dtype=dt
                        )
            if self.random_tids:
                key = jax.random.PRNGKey(seed)
                for tid in self.random_tids:
                    lo, hi = program.tensors[tid].random_range
                    tensors[tid] = jax.random.uniform(
                        jax.random.fold_in(key, tid),
                        tuple(self.shapes[tid]),
                        dtype=dt,
                        minval=lo,
                        maxval=hi,
                    )
            extern_memo: dict = {}  # one logical extern call per trace
            for i, kernel in enumerate(self.target.kernels):
                if i in self._skip_kernels:
                    continue  # folded into the previous matmul's epilogue
                if i in self.fused:
                    pm, epi = self.fused[i]
                    value = pm.lower_fused(tensors, epi)
                    t2 = epi.final_tensor
                    tensors[t2] = tensors[t2] + value.reshape(
                        tuple(self.shapes[t2])
                    )
                    self.stats["pallas-fused"] = (
                        self.stats.get("pallas-fused", 0) + 1
                    )
                    continue
                if i in self.row_fused:
                    # final result + any escaping intermediates (tensors
                    # read outside the chain) come out of ONE kernel
                    for tid, val in self.row_fused[i].lower(tensors).items():
                        tensors[tid] = val
                    self.stats["pallas-rowchain"] = (
                        self.stats.get("pallas-rowchain", 0) + 1
                    )
                    continue
                KernelLowering(
                    program, kernel, self.shapes, self.dtype, self.precision,
                    self.policy, extern_memo,
                ).run(tensors, epoch, self.stats)
            return {tid: tensors[tid] for tid in self.output_tids}

        self.stats: dict[str, int] = {}  # lowering-path counts, set at trace
        self.run_fn = run_fn  # unjitted; parallel/mesh.py re-jits with shardings

        def split_fn(donated: dict, kept: dict, epoch, seed):
            return run_fn({**donated, **kept}, epoch, seed)

        self._fn_split = jax.jit(split_fn, donate_argnums=(0,))
        self._fn = jax.jit(run_fn)

        # whole-epoch program: scan over stacked batches with the updated
        # params/caches as the carry — one device dispatch per epoch instead
        # of one per batch (the reference's fit loop, compiled)
        def epoch_fn(state: dict, const_inputs: dict, stacked: dict,
                     epoch, seeds):
            def body(carry, xs):
                batch_inputs, seed = xs
                result = run_fn(
                    {**const_inputs, **carry, **batch_inputs}, epoch, seed
                )
                return {tid: result[tid] for tid in carry}, None

            final, _ = jax.lax.scan(body, state, (stacked, seeds))
            return final

        self._epoch_fn = jax.jit(epoch_fn, donate_argnums=(0,))

    def run_epoch(
        self,
        tensors: dict,
        batches: dict,
        epoch: int,
        seeds,
    ) -> dict:
        """Run one full epoch; ``batches`` maps input tid -> stacked array
        of shape [n_batches, batch, ...].  Returns updated state tensors."""
        state = {tid: tensors[tid] for tid in self.donated_tids}
        const_inputs = {
            tid: tensors[tid]
            for tid in self.kept_tids
            if tid not in batches
        }
        return self._epoch_fn(state, const_inputs, batches, epoch, seeds)

    def run(
        self,
        tensors: dict[int, np.ndarray],
        shapes: dict[int, list[int]],
        epoch: int,
        seed: int,
    ) -> dict:
        donated = {tid: tensors[tid] for tid in self.donated_tids}
        kept = {tid: tensors[tid] for tid in self.kept_tids}
        return self._fn_split(donated, kept, epoch, seed)
