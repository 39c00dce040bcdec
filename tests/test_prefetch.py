"""Async input pipeline (io.Prefetcher) + device-resident model inputs.

Contract: prefetching is a pure overlap optimization — the batches a
Prefetcher yields, and the training trajectory fed through it, are
bit-identical to the synchronous loop (the reference's fit loop is the
synchronous baseline, model.nim:437-449).  Also pins the plumbing that
makes the overlap real: Model accepts already-placed jax arrays without
a host round trip, sharded placement lands on the requested
NamedSharding, producer errors surface at the consumer, and abandoning
the iterator does not leak the thread.
"""

import threading

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from exprgrad_tpu import Fun, compile, input, iters, make_opt, param
from exprgrad_tpu.io import Batches, Prefetcher, fit_epochs
from exprgrad_tpu.layers import gradient_descent, mse
from exprgrad_tpu.parallel import make_mesh


def _graph():
    y, x, it = iters("y", "x", "it")
    w = param([8, 4], (-0.5, 0.5), name="w")
    inp, lbl = input("inp"), input("lbl")
    pred = Fun("pred")
    pred[y, x] = inp[y, it] * w[it, x]
    loss = mse(pred, lbl)
    return (loss.target("loss").backwards()
            .optimize(make_opt(gradient_descent, rate=0.1)).target("train"))


def _data(n=64, seed=0):
    rng = np.random.default_rng(seed)
    inp = rng.normal(size=(n, 8)).astype(np.float64)
    true_w = rng.normal(size=(8, 4)).astype(np.float64)
    lbl = (inp @ true_w).astype(np.float64)
    return {"inp": inp, "lbl": lbl}


def test_prefetcher_yields_identical_batches():
    data = _data(50)
    direct = list(Batches(data, 16, shuffle=True, seed=3))
    fetched = list(Prefetcher(Batches(data, 16, shuffle=True, seed=3),
                              depth=2))
    assert len(direct) == len(fetched) == 3
    for a, b in zip(direct, fetched):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]))
            assert isinstance(b[k], jax.Array)


def test_fit_epochs_prefetch_matches_sync():
    data = _data(64)
    sync = compile(_graph(), backend="jax", seed=11)
    pre = compile(_graph(), backend="jax", seed=11)
    fit_epochs(sync, "train", Batches(data, 16, shuffle=True, seed=5),
               epochs=3)
    fit_epochs(pre, "train", Batches(data, 16, shuffle=True, seed=5),
               epochs=3, prefetch=2)
    assert sync.params.keys() == pre.params.keys()
    for tid in sync.params:
        np.testing.assert_array_equal(np.asarray(sync.params[tid]),
                                      np.asarray(pre.params[tid]))


def test_model_accepts_device_resident_inputs():
    data = _data(16)
    model = compile(_graph(), backend="jax", seed=2)
    dtype = np.dtype(model.program.scalar_type.value)
    placed = {k: jax.device_put(v.astype(dtype)) for k, v in data.items()}
    host = float(np.asarray(model.call("loss", data)).reshape(-1)[0])
    dev = float(np.asarray(model.call("loss", placed)).reshape(-1)[0])
    assert host == dev


def test_sharded_placement():
    mesh = make_mesh(8, data=8)
    sharding = NamedSharding(mesh, P("data"))
    data = _data(32)
    batches = Batches(data, 16, shuffle=False)
    for batch in Prefetcher(batches, depth=1, placement=sharding):
        for v in batch.values():
            assert v.sharding == sharding
        np.testing.assert_array_equal(np.asarray(batch["inp"]),
                                      data["inp"][:16])
        break


def test_producer_error_reraises():
    def bad():
        yield {"x": np.zeros((2, 2))}
        raise ValueError("boom in producer")

    it = iter(Prefetcher(bad(), depth=1))
    next(it)
    with pytest.raises(ValueError, match="boom in producer"):
        next(it)


def test_abandoned_iterator_stops_thread():
    before = {t.name for t in threading.enumerate()}
    data = _data(64)
    it = iter(Prefetcher(Batches(data, 4, shuffle=False), depth=1))
    next(it)
    it.close()  # generator finalizer must stop + join the producer
    after = [t for t in threading.enumerate()
             if t.name == "egtpu-prefetch" and t.is_alive()]
    assert not after or all(t.name in before for t in after)


def test_depth_validation():
    with pytest.raises(ValueError):
        Prefetcher([], depth=0)
