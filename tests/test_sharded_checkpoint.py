"""Sharded checkpoints (parallel.save_sharded / load_sharded).

Contract: a checkpoint written from a sharded (fsdp / tp) training
state restores the EXACT state — onto the same mesh, onto a different
mesh shape (elastic resharding), or onto plain host arrays — and
training resumed from the restore is bit-identical to training that
never stopped.  Async save must match sync save byte-for-byte even
when the train loop keeps stepping (donation invalidates device
buffers, so shards snapshot at save time).
"""

import json
import os

import jax
import numpy as np
import pytest

from exprgrad_tpu import Fun, compile, input, iters, make_opt, param
from exprgrad_tpu.errors import ModelRuntimeError
from exprgrad_tpu.layers import adam, mse
from exprgrad_tpu.parallel import (
    ShardedExecutor,
    load_sharded,
    make_mesh,
    save_sharded,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _graph():
    y, x, it = iters("y", "x", "it")
    w = param([8, 16], (-0.5, 0.5), name="w")
    inp, lbl = input("inp"), input("lbl")
    pred = Fun("pred")
    pred[y, x] = inp[y, it] * w[it, x]
    loss = mse(pred, lbl)
    return (loss.target("loss").backwards()
            .optimize(make_opt(adam, eta=0.01)).target("train"))


def _data(n=16, seed=0):
    rng = np.random.default_rng(seed)
    inp = rng.normal(size=(n, 8))
    lbl = rng.normal(size=(n, 16))
    return {"inp": inp, "lbl": lbl}


def _exec(model, mesh, **kw):
    return ShardedExecutor(
        model, "train", {"inp": [16, 8], "lbl": [16, 16]}, mesh, **kw
    )


def _host_params(model):
    return {tid: np.asarray(v).copy() for tid, v in model.params.items()}


def _train_steps(model, mesh, steps, seed=0, **kw):
    ex = _exec(model, mesh, **kw)
    for k in range(steps):
        model.epoch = k + 1
        ex.run(_data(seed=seed + k))
    # adam at an implicit epoch of 0 divides by zero; NaN states would
    # make every equality below vacuous (assert_array_equal treats
    # NaN == NaN as equal)
    for v in model.params.values():
        assert np.isfinite(np.asarray(v)).all()
    return ex


def test_roundtrip_same_mesh(tmp_path):
    mesh = make_mesh(8, model=2)
    m = compile(_graph(), backend="jax", seed=3)
    _train_steps(m, mesh, 2, **{"fsdp": True})
    want_p = _host_params(m)
    want_c = {tid: np.asarray(v).copy() for tid, v in m.caches.items()}

    save_sharded(m, str(tmp_path / "ckpt"))
    m2 = compile(_graph(), backend="jax", seed=99)  # different init
    load_sharded(str(tmp_path / "ckpt"), m2, mesh=mesh)

    assert m2.epoch == m.epoch
    for tid, want in want_p.items():
        got = m2.params[tid]
        np.testing.assert_array_equal(np.asarray(got), want)
        assert isinstance(got, jax.Array)
    for tid, want in want_c.items():
        np.testing.assert_array_equal(np.asarray(m2.caches[tid]), want)

    # resumed training == uninterrupted training, bit for bit
    _train_steps(m, mesh, 1, seed=50, **{"fsdp": True})
    m2.epoch = m.epoch - 1
    _train_steps(m2, mesh, 1, seed=50, **{"fsdp": True})
    for tid in want_p:
        np.testing.assert_array_equal(
            np.asarray(m.params[tid]), np.asarray(m2.params[tid])
        )


def test_elastic_reshard(tmp_path):
    mesh8 = make_mesh(8, model=1)
    m = compile(_graph(), backend="jax", seed=4)
    _train_steps(m, mesh8, 2, **{"fsdp": True, "zero": True})
    want = _host_params(m)
    save_sharded(m, str(tmp_path / "ckpt"))

    # restore onto a 4x2 mesh: values identical, placement on new mesh
    mesh42 = make_mesh(8, data=4, model=2)
    m2 = compile(_graph(), backend="jax", seed=77)
    load_sharded(str(tmp_path / "ckpt"), m2, mesh=mesh42)
    for tid, arr in want.items():
        got = m2.params[tid]
        np.testing.assert_array_equal(np.asarray(got), arr)
        assert got.sharding.mesh.shape == mesh42.shape

    # restore to plain host arrays
    m3 = compile(_graph(), backend="jax", seed=78)
    load_sharded(str(tmp_path / "ckpt"), m3, mesh=None)
    for tid, arr in want.items():
        assert isinstance(m3.params[tid], np.ndarray)
        np.testing.assert_array_equal(m3.params[tid], arr)


def test_shards_are_real_and_deduped(tmp_path):
    """fsdp over data=8: every param shard file is 1/8 of the tensor."""
    mesh = make_mesh(8, model=1)
    m = compile(_graph(), backend="jax", seed=5)
    _train_steps(m, mesh, 1, **{"fsdp": True})
    save_sharded(m, str(tmp_path / "ckpt"))
    manifest = json.load(open(tmp_path / "ckpt" / "manifest.json"))
    w = next(t for t in manifest["tensors"]
             if t["kind"] == "param" and t["shape"] == [8, 16])
    assert w["spec"][0] == "data"
    assert len(w["shards"]) == 8
    size = os.path.getsize(tmp_path / "ckpt" / w["shards"][0]["file"])
    assert size == (8 * 16 * np.dtype(w["dtype"]).itemsize) // 8


def test_async_save_matches_sync(tmp_path):
    mesh = make_mesh(8, model=2)
    m = compile(_graph(), backend="jax", seed=6)
    ex = _train_steps(m, mesh, 1, **{"fsdp": True})
    handle = save_sharded(m, str(tmp_path / "async"), async_save=True)
    # keep training while the save writes: donation must not corrupt it
    m.epoch += 1
    ex.run(_data(seed=123))
    handle.wait()
    assert handle.done

    m2 = compile(_graph(), backend="jax", seed=91)
    load_sharded(str(tmp_path / "async"), m2, mesh=None)
    # reload equals the state at save time, not the post-step state
    m3 = compile(_graph(), backend="jax", seed=6)
    _train_steps(m3, make_mesh(8, model=2), 1, **{"fsdp": True})
    for tid in m3.params:
        np.testing.assert_array_equal(
            np.asarray(m3.params[tid]), np.asarray(m2.params[tid])
        )


def test_error_paths(tmp_path):
    m = compile(_graph(), backend="jax", seed=7)
    with pytest.raises(ModelRuntimeError, match="not a sharded checkpoint"):
        load_sharded(str(tmp_path / "nope"), m)

    mesh = make_mesh(8, model=1)
    _train_steps(m, mesh, 1)
    save_sharded(m, str(tmp_path / "ckpt"))

    # program mismatch: a different graph refuses the checkpoint
    other = compile(
        input("x").target("identity"), backend="jax", seed=1
    )
    with pytest.raises(ModelRuntimeError, match="CRC mismatch"):
        load_sharded(str(tmp_path / "ckpt"), other)

    # truncated shard file
    manifest = json.load(open(tmp_path / "ckpt" / "manifest.json"))
    victim = manifest["tensors"][0]["shards"][0]["file"]
    with open(tmp_path / "ckpt" / victim, "r+b") as f:
        f.truncate(3)
    m2 = compile(_graph(), backend="jax", seed=8)
    with pytest.raises(ModelRuntimeError, match="bytes, expected"):
        load_sharded(str(tmp_path / "ckpt"), m2, mesh=None)
