"""Sharded checkpointing for mesh-training state.

The single-file checkpoint (``io.save_model``) gathers every tensor into
one host array — right for a single chip, wrong for a mesh: dp x tp /
FSDP training state is sharded across devices, and a production
checkpointer must (a) write each shard without materializing the global
array, (b) restore directly onto a mesh — including a DIFFERENT mesh
shape than the one that saved (elastic resharding), and (c) let the
training loop keep running while file IO happens (async save).

The reference checkpoints single-process state only (serialize.nim:
376-379); this is the multi-chip extension, rebuilt the jax way: saving
walks ``jax.Array.addressable_shards`` (one file per unique shard),
loading assembles exactly the slice each device needs through
``jax.make_array_from_callback`` — so a checkpoint written on a
``data=8`` mesh loads straight onto ``data=4, model=2`` (or onto plain
host arrays with ``mesh=None``) without ever building the full tensor.

Layout on disk::

    <dir>/manifest.json   tensor table: tid, kind, dtype, shape,
                          partition spec, shard index -> file
    <dir>/program.bin     the IR program (io.save_program format)
    <dir>/t<tid>_s<k>.bin raw shard bytes (C order)

Async save snapshots shards to host synchronously (donated device
buffers may be invalidated by the next training step) and does the file
writes on a background thread; ``SaveHandle.wait()`` joins and
re-raises any IO error.
"""

from __future__ import annotations

import json
import os
import threading
import zlib
from typing import Optional

import numpy as np

from .. import ir
from ..errors import ModelRuntimeError

_VERSION = 1


def _dtype_name(dtype) -> str:
    return np.dtype(dtype).name


def _dtype_from_name(name: str):
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes

        return np.dtype(getattr(ml_dtypes, name))


def _spec_to_json(spec) -> list:
    out = []
    for entry in tuple(spec):
        if entry is None:
            out.append(None)
        elif isinstance(entry, (tuple, list)):
            out.append(list(entry))
        else:
            out.append(str(entry))
    return out


def _spec_from_json(entries):
    from jax.sharding import PartitionSpec as P

    parts = []
    for entry in entries:
        if entry is None:
            parts.append(None)
        elif isinstance(entry, list):
            parts.append(tuple(entry))
        else:
            parts.append(entry)
    return P(*parts)


def _norm_index(index, shape) -> list[list[int]]:
    """Normalize a tuple of slices to concrete [start, stop) per dim."""
    out = []
    for sl, dim in zip(index, shape):
        start, stop, step = sl.indices(dim)
        if step != 1:
            raise ModelRuntimeError("strided shard indices are unsupported")
        out.append([start, stop])
    # shards of rank-deficient indices (scalar tensors) normalize to []
    return out


def _program_crc(program: ir.Program) -> int:
    from io import BytesIO

    from ..io.serialize import Writer, write_program

    buf = BytesIO()
    write_program(Writer(buf), program)
    return zlib.crc32(buf.getvalue()) & 0xFFFFFFFF


class SaveHandle:
    """Join point for an async sharded save."""

    def __init__(self, thread: Optional[threading.Thread], box: dict) -> None:
        self._thread = thread
        self._box = box

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        err = self._box.get("error")
        if err is not None:
            self._box["error"] = None
            raise err

    @property
    def done(self) -> bool:
        return self._thread is None or not self._thread.is_alive()


def save_sharded(model, path: str, async_save: bool = False) -> SaveHandle:
    """Write ``model``'s params/caches as a sharded checkpoint directory.

    Each unique shard of every (possibly mesh-sharded) tensor becomes
    one file; replicas are deduplicated.  Host numpy tensors save as a
    single full-extent shard, so the format is uniform for un-sharded
    models too.  ``async_save=True`` snapshots device shards to host,
    then writes files on a background thread — call ``.wait()`` on the
    returned handle before relying on the checkpoint.
    """
    from ..io.serialize import save_program
    from ..quant import QuantW

    if any(isinstance(v, QuantW) for v in model.params.values()):
        raise ModelRuntimeError(
            "sharded checkpointing of a weight-quantized model is not "
            "supported; save before quantize_weights"
        )
    os.makedirs(path, exist_ok=True)
    program = model.program

    tensors_meta = []
    writes: list[tuple[str, np.ndarray]] = []
    for kind_name, table in (("param", model.params), ("cache", model.caches)):
        for tid, arr in table.items():
            shape = list(np.shape(arr))
            entry = {
                "tid": int(tid),
                "kind": kind_name,
                "dtype": _dtype_name(arr.dtype),
                "shape": shape,
                "spec": [None] * len(shape),
                "shards": [],
            }
            shards: list[tuple[list[list[int]], np.ndarray]] = []
            if isinstance(arr, np.ndarray) or not hasattr(
                arr, "addressable_shards"
            ):
                full = [[0, d] for d in shape]
                shards.append((full, np.ascontiguousarray(arr)))
            else:
                sharding = arr.sharding
                spec = getattr(sharding, "spec", None)
                if spec is not None:
                    padded = list(_spec_to_json(spec))
                    padded += [None] * (len(shape) - len(padded))
                    entry["spec"] = padded
                seen: set[tuple] = set()
                for shard in arr.addressable_shards:
                    index = _norm_index(shard.index, shape)
                    key = tuple(tuple(p) for p in index)
                    if key in seen:
                        continue
                    seen.add(key)
                    # snapshot NOW: the next jit step may donate (and
                    # invalidate) this buffer
                    shards.append((index, np.asarray(shard.data)))
            for k, (index, data) in enumerate(shards):
                fname = f"t{tid}_s{k}.bin"
                entry["shards"].append({"index": index, "file": fname})
                writes.append((os.path.join(path, fname), data))
            tensors_meta.append(entry)

    manifest = {
        "version": _VERSION,
        "epoch": int(model.epoch),
        "program_crc": _program_crc(program),
        # host RNG stream: restoring it makes stochastic-shuffle resume
        # bit-identical to uninterrupted training
        "rng_state": model._rng.bit_generator.state,
        "tensors": tensors_meta,
    }
    save_program(program, os.path.join(path, "program.bin"))

    def write_all() -> None:
        for fpath, data in writes:
            tmp = fpath + ".tmp"
            with open(tmp, "wb") as f:
                f.write(np.ascontiguousarray(data).tobytes())
            os.replace(tmp, fpath)
        tmp = os.path.join(path, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, os.path.join(path, "manifest.json"))

    box: dict = {"error": None}
    if not async_save:
        write_all()
        return SaveHandle(None, box)

    def runner() -> None:
        try:
            write_all()
        except BaseException as exc:  # re-raised in wait()
            box["error"] = exc

    thread = threading.Thread(
        target=runner, name="egtpu-ckpt-save", daemon=True
    )
    thread.start()
    return SaveHandle(thread, box)


class _ShardReader:
    """Assemble arbitrary global slices of one tensor from its shard
    files (loads each shard file at most once)."""

    def __init__(self, path: str, entry: dict) -> None:
        self.path = path
        self.entry = entry
        self.dtype = _dtype_from_name(entry["dtype"])
        self.shape = list(entry["shape"])
        self._cache: dict[str, np.ndarray] = {}

    def _shard(self, meta: dict) -> np.ndarray:
        fname = meta["file"]
        if fname not in self._cache:
            fpath = os.path.join(self.path, fname)
            shard_shape = [stop - start for start, stop in meta["index"]]
            try:
                raw = np.fromfile(fpath, dtype=np.uint8)
            except OSError as exc:
                raise ModelRuntimeError(
                    f"sharded checkpoint is missing {fname}: {exc}"
                ) from exc
            want = int(np.prod(shard_shape, dtype=np.int64))
            want *= self.dtype.itemsize
            if raw.nbytes != want:
                raise ModelRuntimeError(
                    f"shard {fname} has {raw.nbytes} bytes, expected {want}"
                )
            self._cache[fname] = raw.view(self.dtype).reshape(shard_shape)
        return self._cache[fname]

    def read(self, index) -> np.ndarray:
        target = _norm_index(index, self.shape)
        out_shape = [stop - start for start, stop in target]
        out = np.empty(out_shape, dtype=self.dtype)
        filled = np.zeros(out_shape, dtype=bool) if out.size else None
        for meta in self.entry["shards"]:
            ov = []
            for (t0, t1), (s0, s1) in zip(target, meta["index"]):
                lo, hi = max(t0, s0), min(t1, s1)
                if lo >= hi:
                    ov = None
                    break
                ov.append((lo, hi))
            if ov is None and len(target) > 0:
                continue
            shard = self._shard(meta)
            dst = tuple(
                slice(lo - t0, hi - t0)
                for (lo, hi), (t0, _) in zip(ov, target)
            )
            src = tuple(
                slice(lo - s0, hi - s0)
                for (lo, hi), (s0, _) in zip(ov, meta["index"])
            )
            out[dst] = shard[src]
            if filled is not None:
                filled[dst] = True
        if filled is not None and not filled.all():
            raise ModelRuntimeError(
                f"shards of tensor {self.entry['tid']} do not cover the "
                "requested slice (corrupt manifest?)"
            )
        return out


def load_sharded(path: str, model, mesh=None) -> None:
    """Restore a sharded checkpoint into ``model`` (in place).

    ``mesh`` places every tensor back on devices with its saved
    partition spec over THIS mesh — the mesh may be a different shape
    than the one that saved (each device assembles exactly its slice
    from the shard files: elastic resharding).  Spec axes missing from
    ``mesh`` fall back to replicated on that dim.  ``mesh=None``
    restores plain host arrays (single-device use).
    """
    manifest_path = os.path.join(path, "manifest.json")
    try:
        with open(manifest_path) as f:
            manifest = json.load(f)
    except OSError as exc:
        raise ModelRuntimeError(
            f"{path} is not a sharded checkpoint: {exc}"
        ) from exc
    except json.JSONDecodeError as exc:
        raise ModelRuntimeError(
            f"corrupt sharded-checkpoint manifest {manifest_path}: {exc}"
        ) from exc
    if manifest.get("version") != _VERSION:
        raise ModelRuntimeError(
            f"unsupported sharded-checkpoint version "
            f"{manifest.get('version')!r}"
        )
    if manifest["program_crc"] != _program_crc(model.program):
        raise ModelRuntimeError(
            "sharded checkpoint was written by a different program than "
            "the model being restored (program CRC mismatch)"
        )

    for entry in manifest["tensors"]:
        tid = int(entry["tid"])
        table = model.params if entry["kind"] == "param" else model.caches
        if tid not in table:
            raise ModelRuntimeError(
                f"checkpoint tensor {tid} ({entry['kind']}) is not part "
                "of the model"
            )
        reader = _ShardReader(path, entry)
        shape = tuple(entry["shape"])
        if mesh is None:
            table[tid] = reader.read(tuple(slice(0, d) for d in shape))
            continue
        import jax
        from jax.sharding import NamedSharding

        axes = set(mesh.shape)
        spec_entries = []
        for dim, spec_entry in enumerate(entry["spec"]):
            names = (
                spec_entry
                if isinstance(spec_entry, list)
                else [spec_entry]
            )
            keep = [n for n in names if n is not None and n in axes]
            # resharding onto a smaller/renamed mesh: a spec axis the
            # new mesh lacks degrades to replicated on that dim; a kept
            # axis must still divide the dim
            if keep and shape[dim] % int(
                np.prod([mesh.shape[n] for n in keep])
            ):
                keep = []
            if not keep:
                spec_entries.append(None)
            elif len(keep) == 1:
                spec_entries.append(keep[0])
            else:
                spec_entries.append(tuple(keep))
        sharding = NamedSharding(mesh, _spec_from_json(spec_entries))
        table[tid] = jax.make_array_from_callback(
            shape, sharding, reader.read
        )
    model.epoch = int(manifest["epoch"])
    rng_state = manifest.get("rng_state")
    if rng_state is not None:
        try:
            model._rng.bit_generator.state = rng_state
        except (ValueError, TypeError, KeyError) as err:
            raise ModelRuntimeError(
                "checkpoint carries an RNG state this numpy cannot "
                f"restore ({type(err).__name__}: {err})"
            ) from err
