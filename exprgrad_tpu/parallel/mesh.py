"""Sharded target execution: data parallelism + tensor parallelism.

Strategy (the standard TPU recipe — pick a mesh, annotate shardings, let
XLA insert collectives):

* inputs: batch (leading) dimension sharded over the ``data`` axis;
* parameters: replicated by default; matrices whose last dim divides the
  ``model`` axis are sharded over it (tensor parallelism for dense layers);
* optimizer caches follow their parameter's sharding;
* result tensors: the compiler chooses (XLA propagates shardings through
  the program); gradient psums and TP all-gathers ride the ICI.

Because the whole target (forward + derived backward + optimizer update) is
one functional XLA program, data-parallel gradient reduction falls out of
SPMD partitioning without any hand-written collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import ir
from ..backend.executor import JaxExecutor
from ..errors import ModelRuntimeError
from ..model import Model
from ..passes import infer_shapes


def make_mesh(
    n_devices: Optional[int] = None,
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a (data, model) mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ModelRuntimeError(
            f"mesh {data}x{model} does not match {n} devices"
        )
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


class ShardedExecutor:
    """A target jitted over a mesh with dp (+ optional tp) shardings."""

    def __init__(
        self,
        model: Model,
        target_name: str,
        input_shapes: dict[str, list[int]],
        mesh: Mesh,
        batch_inputs: Optional[Sequence[str]] = None,
        input_specs: Optional[dict[str, P]] = None,
        zero: bool = False,
        fsdp: bool = False,
        offload_opt_state: bool = False,
    ) -> None:
        """``input_specs`` overrides the default batch-dim sharding per input
        name with an explicit PartitionSpec — e.g. sequence parallelism:
        ``{"tokens": P("data", "model")}`` shards the sequence
        dimension over the model axis and XLA inserts the attention
        collectives.

        ``zero=True`` shards OPTIMIZER-STATE caches (adam m/v, momentum,
        EMA shadows) over the ``data`` axis on their leading dim
        (ZeRO-1): each device stores 1/N of the optimizer state, and XLA
        inserts the reduce-scatter/all-gather pair the sharded update
        implies.  Values match the replicated layout to float
        reduction-order noise (tested at 1e-6 relative) — sharding is
        a layout annotation, not an algorithmic change.

        ``fsdp=True`` additionally shards the PARAMETERS themselves over
        the ``data`` axis (ZeRO-3 / fully-sharded data parallelism): each
        device stores 1/N of every weight, XLA all-gathers a weight just
        before its forward/backward use and reduce-scatters its gradient.
        Composes with tensor parallelism (a matrix can be ``data`` x
        ``model`` sharded) and implies the optimizer state follows its
        parameter's sharding.  Peak per-device memory drops from
        O(params) to O(params / data); results match the replicated
        layout up to float reduction-order noise (tested at 1e-6
        relative).

        ``offload_opt_state=True`` parks optimizer-state caches (adam
        m/v, momentum, EMA shadows) in ``pinned_host`` memory between
        steps (the ZeRO-Offload recipe, TPU-style): the jitted step
        streams them into HBM at entry and ``run`` parks the updated
        state back in host memory right after the step, so the state's
        HBM footprint is transient per step instead of resident.
        Composes with ``zero``/``fsdp`` (the host copies keep the same
        partition spec)."""
        from ..quant import QuantW

        if any(
            isinstance(v, QuantW) for v in model.params.values()
        ):
            raise ModelRuntimeError(
                "sharded execution of a weight-quantized model is not "
                "supported (quantize_weights is a single-device serving "
                "feature); for tensor-parallel quantized serving use "
                "FlashLMServer(model, mesh=..., weight_dtype=...)"
            )
        self.model = model
        program = model.program
        self.program = program
        self.target_name = target_name
        pairs = [
            (program.inputs[name], list(shape))
            for name, shape in input_shapes.items()
        ]
        self.shapes = infer_shapes(program, target_name, pairs)
        self.executor = JaxExecutor(
            program, target_name, self.shapes, precision=model.precision,
            schedule_mode=getattr(model, "schedule_mode", "auto"),
        )
        self.mesh = mesh
        model_axis = mesh.shape.get("model", 1)
        data_axis = mesh.shape.get("data", 1)

        if batch_inputs is None:
            batch_inputs = list(input_shapes)
        batch_tids = {program.inputs[name] for name in batch_inputs}
        spec_of_tid = {
            program.inputs[name]: spec
            for name, spec in (input_specs or {}).items()
        }

        def sharding_for(tid: int) -> NamedSharding:
            tdef = program.tensors[tid]
            shape = self.shapes[tid]
            if tid in spec_of_tid:
                return NamedSharding(mesh, spec_of_tid[tid])
            if tdef.kind == ir.TensorKind.INPUT and tid in batch_tids:
                return NamedSharding(
                    mesh, P("data", *([None] * (len(shape) - 1)))
                )
            if tdef.kind in (ir.TensorKind.PARAM, ir.TensorKind.CACHE):
                if tdef.kind == ir.TensorKind.CACHE:
                    # caches follow their parameter's layout decisions —
                    # unless the cache's shape diverges from the param's
                    # (factored Adafactor moments), where the param's
                    # last-dim divisibility says nothing about the
                    # cache's own axes: such state uses its own shape
                    tdef_p = program.tensors[tdef.cache_of]
                    if list(shape) != list(self.shapes.get(tdef.cache_of, tdef_p.shape)):
                        tdef_p = tdef
                else:
                    tdef_p = tdef
                spec = [None] * len(shape)
                if (
                    model_axis > 1
                    and len(tdef_p.shape) >= 2
                    and tdef_p.shape[-1] % model_axis == 0
                    and len(shape) >= 1
                ):
                    spec[-1] = "model"
                # data-axis sharding of the state itself: fsdp shards
                # params AND caches (ZeRO-3); zero shards only the
                # optimizer caches (ZeRO-1)
                shard_state = fsdp or (
                    zero and tdef.kind == ir.TensorKind.CACHE
                )
                if shard_state and data_axis > 1:
                    for d in range(len(shape)):
                        if spec[d] is None and shape[d] % data_axis == 0:
                            spec[d] = "data"
                            break
                if offload_opt_state and tdef.kind == ir.TensorKind.CACHE:
                    return NamedSharding(
                        mesh, P(*spec), memory_kind="pinned_host"
                    )
                return NamedSharding(mesh, P(*spec))
            return NamedSharding(mesh, P())

        self.in_shardings = {
            tid: sharding_for(tid) for tid in self.executor.input_tids
        }
        run_fn = self.executor.run_fn
        if offload_opt_state:
            # write the updated optimizer state straight back to host
            # memory inside the step — its HBM footprint is transient
            self._host_out = {
                tid: self.in_shardings[tid]
                for tid in self.in_shardings
                if program.tensors[tid].kind == ir.TensorKind.CACHE
            }
            # same partition specs, but in device memory: the state is
            # streamed into HBM at step entry (an in-jit device_put XLA
            # can overlap with compute) and parked back in host memory
            # right after the step, outside the jit — XLA's SPMD
            # partitioner rejects replicated host-placement annotations
            # on jit OUTPUTS, so the writeback is a plain transfer
            dev_in = {
                tid: NamedSharding(mesh, s.spec, memory_kind="device")
                for tid, s in self._host_out.items()
            }
            base_fn = run_fn

            def run_fn(inputs: dict, epoch, seed):
                inputs = {
                    tid: (
                        jax.device_put(v, dev_in[tid])
                        if tid in dev_in
                        else v
                    )
                    for tid, v in inputs.items()
                }
                return base_fn(inputs, epoch, seed)
        else:
            self._host_out = {}

        self._fn = jax.jit(
            run_fn, in_shardings=(self.in_shardings, None, None)
        )

    def run(
        self,
        args: dict[str, np.ndarray],
        epoch: Optional[int] = None,
        seed: int = 0,
    ):
        """Execute one step; returns the executor's output tensor dict and
        updates the model's params/caches in place.

        ``epoch`` defaults to ``model.epoch``, matching ``Model.call`` —
        adam-style bias correction divides by ``1 - beta**epoch``, so an
        implicit epoch of 0 would silently produce NaN updates."""
        if epoch is None:
            epoch = self.model.epoch
        program = self.program
        dtype = np.dtype(program.scalar_type.value)
        tensors = {}
        for name, value in args.items():
            if (
                not isinstance(value, np.ndarray)
                and hasattr(value, "sharding")
                and value.dtype == dtype
            ):
                # already a device-resident jax array (e.g. from
                # io.Prefetcher): the device_put below reshards it
                # device-to-device; converting here would bounce it
                # through the host
                tensors[program.inputs[name]] = value
            else:
                tensors[program.inputs[name]] = np.ascontiguousarray(
                    value, dtype
                )
        tensors.update(self.model.params)
        tensors.update(self.model.caches)
        # ALWAYS place onto the declared sharding: step outputs come back
        # with compiler-chosen layouts, and feeding them to the next step
        # unplaced trips jit's in_shardings check (device_put is a no-op
        # when the sharding already matches)
        inputs = {
            tid: jax.device_put(tensors[tid], self.in_shardings[tid])
            for tid in self.executor.input_tids
        }
        result = self._fn(inputs, epoch, seed)
        for tid, sharding in self._host_out.items():
            if tid in result:
                result[tid] = jax.device_put(result[tid], sharding)
        for tid in self.model.params:
            if tid in result:
                self.model.params[tid] = result[tid]
        for tid in self.model.caches:
            if tid in result:
                self.model.caches[tid] = result[tid]
        return result


def sharded_fit(
    model: Model,
    target_name: str,
    args: dict[str, np.ndarray],
    mesh: Mesh,
    batch_size: int = 32,
    log_status: bool = False,
) -> None:
    """Data-parallel Model.fit: every batch is sharded over the mesh."""
    first = next(iter(args.values()))
    batch_count = first.shape[0] // batch_size
    input_shapes = {
        name: [batch_size] + list(value.shape[1:])
        for name, value in args.items()
    }
    executor = ShardedExecutor(model, target_name, input_shapes, mesh)
    model.epoch += 1
    for batch in range(batch_count):
        if log_status:
            print(f"\r{batch}/{batch_count}", end="", flush=True)
        offset = batch * batch_size
        batch_args = {
            name: value[offset : offset + batch_size]
            for name, value in args.items()
        }
        executor.run(batch_args, model.epoch, batch)
    if log_status:
        print(f"\r{batch_count}/{batch_count}")
