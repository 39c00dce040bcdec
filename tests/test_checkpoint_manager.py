"""CheckpointManager: rotation, latest-discovery, resume, train() hook.

Contract: a crash-resumed run (restore latest, keep training) matches
an uninterrupted run exactly; disk usage is bounded by ``keep``; both
checkpoint formats (single-file, sharded directory) obey the same
policy surface.
"""

import os

import jax
import numpy as np
import pytest

from exprgrad_tpu import Fun, compile, input, iters, make_opt, param
from exprgrad_tpu.errors import ModelRuntimeError
from exprgrad_tpu.io import CheckpointManager
from exprgrad_tpu.layers import adam, mse
from exprgrad_tpu.train import train


def _graph():
    y, x, it = iters("y", "x", "it")
    w = param([6, 4], (-0.5, 0.5), name="w")
    inp, lbl = input("inp"), input("lbl")
    pred = Fun("pred")
    pred[y, x] = inp[y, it] * w[it, x]
    loss = mse(pred, lbl)
    return (loss.target("loss").backwards()
            .optimize(make_opt(adam, eta=0.01)).target("train"))


def _data(n=32, seed=0):
    rng = np.random.default_rng(seed)
    return {"inp": rng.normal(size=(n, 6)),
            "lbl": rng.normal(size=(n, 4))}


def test_rotation_and_latest(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep=2)
    m = compile(_graph(), backend="jax", seed=0)
    data = _data()
    for k in range(5):
        m.fit("train", data, batch_size=16, log_status=False)
        mgr.save(m)
    assert mgr.steps() == [4, 5]
    assert mgr.latest() == 5
    assert sorted(os.listdir(tmp_path)) == ["step_4.egt", "step_5.egt"]


def test_resume_matches_uninterrupted(tmp_path):
    data = _data()
    mgr = CheckpointManager(str(tmp_path), keep=3)

    straight = compile(_graph(), backend="jax", seed=1)
    for _ in range(6):
        straight.fit("train", data, batch_size=16, log_status=False)

    first = compile(_graph(), backend="jax", seed=1)
    for _ in range(3):
        first.fit("train", data, batch_size=16, log_status=False)
    mgr.save(first)

    resumed = mgr.restore()  # fresh model from the latest checkpoint
    assert resumed.epoch == 3
    for _ in range(3):
        resumed.fit("train", data, batch_size=16, log_status=False)
    for tid in straight.params:
        np.testing.assert_allclose(
            np.asarray(straight.params[tid]),
            np.asarray(resumed.params[tid]), rtol=1e-6, atol=1e-8,
        )
        assert np.isfinite(np.asarray(straight.params[tid])).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_mode(tmp_path):
    from exprgrad_tpu.parallel import ShardedExecutor, make_mesh

    mesh = make_mesh(8, model=2)
    m = compile(_graph(), backend="jax", seed=2)
    ex = ShardedExecutor(m, "train", {"inp": [16, 6], "lbl": [16, 4]},
                         mesh, fsdp=True)
    mgr = CheckpointManager(str(tmp_path), keep=1, sharded=True)
    data = _data(16)
    for k in range(3):
        m.epoch = k + 1
        ex.run(data)
        mgr.save(m, async_save=True)
    mgr.wait()
    assert mgr.steps() == [3]
    want = {tid: np.asarray(v).copy() for tid, v in m.params.items()}
    assert all(np.isfinite(v).all() for v in want.values())

    m2 = compile(_graph(), backend="jax", seed=55)
    mgr.restore(model=m2, mesh=mesh)
    assert m2.epoch == 3
    for tid, v in want.items():
        np.testing.assert_array_equal(np.asarray(m2.params[tid]), v)


def test_train_integration(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep=10)
    m = compile(_graph(), backend="jax", seed=3)
    data = _data()
    train(m, "train", data, epochs=4, batch_size=16, monitor="loss",
          checkpoint=mgr, checkpoint_every=2)
    assert mgr.steps() == [2, 4]
    restored = mgr.restore(step=4)
    for tid in m.params:
        np.testing.assert_array_equal(np.asarray(m.params[tid]),
                                      np.asarray(restored.params[tid]))


def test_errors(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep=1)
    with pytest.raises(ModelRuntimeError, match="no checkpoints"):
        mgr.restore()
    with pytest.raises(ModelRuntimeError, match="keep must be"):
        CheckpointManager(str(tmp_path), keep=0)
    m = compile(_graph(), backend="jax", seed=4)
    with pytest.raises(ModelRuntimeError, match="sharded=True"):
        mgr.save(m, async_save=True)
    mgr.save(m)
    with pytest.raises(ModelRuntimeError, match="not found"):
        mgr.restore(step=999)


def test_stochastic_resume_bit_exact(tmp_path):
    """shuffle=True resume == uninterrupted run: the checkpoint carries
    the host RNG stream (format v8), so shuffle orders and per-call
    seeds continue exactly where the save left off."""
    data = _data()
    straight = compile(_graph(), backend="jax", seed=9)
    for _ in range(6):
        straight.fit("train", data, batch_size=16, log_status=False,
                     shuffle=True)

    mgr = CheckpointManager(str(tmp_path), keep=2)
    first = compile(_graph(), backend="jax", seed=9)
    for _ in range(3):
        first.fit("train", data, batch_size=16, log_status=False,
                  shuffle=True)
    mgr.save(first)
    resumed = mgr.restore()
    for _ in range(3):
        resumed.fit("train", data, batch_size=16, log_status=False,
                    shuffle=True)
    for tid in straight.params:
        a = np.asarray(straight.params[tid])
        assert np.isfinite(a).all()
        np.testing.assert_array_equal(a, np.asarray(resumed.params[tid]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_train_over_mesh_matches_single_device(tmp_path):
    """train(mesh=...) = the same trajectory as single-device train()
    (dp gradient psums are a layout choice, not an algorithm change),
    with validation/early-stop/sharded-checkpointing composing."""
    from exprgrad_tpu.parallel import make_mesh

    data = _data(32)
    val = _data(16, seed=5)

    single = compile(_graph(), backend="jax", seed=11)
    h1 = train(single, "train", data, epochs=4, batch_size=16,
               validation=val, monitor="loss", shuffle=False)

    mesh = make_mesh(8, model=2)
    mgr = CheckpointManager(str(tmp_path), keep=2, sharded=True)
    sharded = compile(_graph(), backend="jax", seed=11)
    h2 = train(sharded, "train", data, epochs=4, batch_size=16,
               validation=val, monitor="loss", shuffle=False,
               mesh=mesh, mesh_options={"fsdp": True},
               checkpoint=mgr)
    assert mgr.steps() == [3, 4]
    for tid in single.params:
        a = np.asarray(single.params[tid])
        assert np.isfinite(a).all()
        np.testing.assert_allclose(
            a, np.asarray(sharded.params[tid]), rtol=1e-6, atol=1e-9)
    for e1, e2 in zip(h1, h2):
        assert abs(e1["val_loss"] - e2["val_loss"]) < 1e-6

    # restore the sharded checkpoint and keep training on the mesh
    m2 = compile(_graph(), backend="jax", seed=70)
    mgr.restore(model=m2, mesh=mesh)
    assert m2.epoch == 4
    train(m2, "train", data, epochs=1, batch_size=16, monitor="loss",
          shuffle=False, mesh=mesh, mesh_options={"fsdp": True})
    assert m2.epoch == 5


def test_train_mesh_rejects_scan_batches():
    from exprgrad_tpu.parallel import make_mesh

    m = compile(_graph(), backend="jax", seed=0)
    with pytest.raises(ModelRuntimeError, match="scan_batches"):
        train(m, "train", _data(), epochs=1, batch_size=16,
              monitor="loss", mesh=make_mesh(8), scan_batches=True)
