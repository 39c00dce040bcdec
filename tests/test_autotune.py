"""Measured schedule autotuning (exprgrad_tpu/autotune.py).

CPU timings are real (just not TPU-relevant), so these tests pin the
MECHANISM: candidates enumerated, argmin chosen and installed, output
unchanged, XLA-strip candidate present, schedule_mode pinned to force.
"""

import numpy as np
import pytest

from exprgrad_tpu import Fun, compile, input, iters
from exprgrad_tpu.errors import ModelRuntimeError


def _matmul_model(schedule=True, m=256, k=256, n=256):
    y, x, it = iters("y", "x", "it")
    a, b = input("a"), input("b")
    c = Fun("c")
    c[y, x] = a[y, it] * b[it, x]
    if schedule:
        c.schedule(tile={"y": 128, "x": 128, "it": 128},
                   parallel=["y", "x"])
    model = compile(c.target("c"), backend="jax")
    rng = np.random.default_rng(0)
    args = {
        "a": rng.normal(size=(m, k)).astype(np.float32),
        "b": rng.normal(size=(k, n)).astype(np.float32),
    }
    return model, args


def test_autotune_reports_and_installs():
    model, args = _matmul_model()
    want = np.asarray(model.call("c", args))

    report = model.autotune("c", args, tile_sizes=(128, 256), reps=1,
                            chain=2)
    # one scheduled kernel; candidates = original + xla + per-loop sweeps
    assert len(report.entries) == 1
    entry = report.entries[0]
    assert entry.writes == "c"
    labels = [c["label"] for c in entry.candidates]
    assert "original schedule" in labels
    assert "xla (no schedule)" in labels
    assert any(l.startswith("tile ") for l in labels)
    # chosen is the measured argmin of the final descent state: it can
    # never be slower than the original-schedule measurement
    assert entry.chosen is not None
    assert entry.chosen["seconds"] <= entry.candidates[0]["seconds"] + 1e-9
    # installed: later calls honor the tuned schedule and stay correct
    assert model.schedule_mode == "force"
    got = np.asarray(model.call("c", args))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # report renders a table
    text = str(report)
    assert "autotune 'c'" in text and "ms" in text


def test_autotune_tuned_time_recorded():
    model, args = _matmul_model()
    report = model.autotune("c", args, tile_sizes=(128,), reps=1, chain=2)
    assert report.baseline_s > 0 and report.tuned_s > 0
    assert report.speedup > 0


def test_autotune_requires_jax_backend():
    y, x, it = iters("y", "x", "it")
    a, b = input("a"), input("b")
    c = Fun("c")
    c[y, x] = a[y, it] * b[it, x]
    model = compile(c.target("c"), backend="interp")
    with pytest.raises(ModelRuntimeError, match="backend"):
        model.autotune("c", {})


def test_autotune_unknown_target():
    model, args = _matmul_model()
    with pytest.raises(ModelRuntimeError, match="target"):
        model.autotune("nope", args)


def test_autotune_unscheduled_target_is_noop():
    """A target with no scheduled kernels tunes to itself (no entries)."""
    model, args = _matmul_model(schedule=False)
    report = model.autotune("c", args, reps=1, chain=1)
    assert report.entries == []
    got = np.asarray(model.call("c", args))
    np.testing.assert_allclose(got, args["a"] @ args["b"], rtol=2e-4,
                               atol=2e-4)


def test_export_apply_tuning_roundtrip(tmp_path):
    """Tuned schedules survive checkpoint save/load via export/apply."""
    import json

    from exprgrad_tpu.autotune import apply_tuning, export_tuning
    from exprgrad_tpu.io import load_model, save_model

    model, args = _matmul_model()
    model.autotune("c", args, tile_sizes=(256,), reps=1, chain=1)
    want = np.asarray(model.call("c", args))
    tuning = export_tuning(model, "c")
    # JSON round-trip (the on-disk form)
    tuning = json.loads(json.dumps(tuning))

    ckpt = tmp_path / "m.egt"
    save_model(model, str(ckpt))
    loaded = load_model(str(ckpt), backend="jax")
    apply_tuning(loaded, tuning)
    assert loaded.schedule_mode == "force"

    # schedules on the loaded program match the tuned ones exactly
    src = model.program.targets["c"].kernels
    dst = loaded.program.targets["c"].kernels
    for ks, kd in zip(src, dst):
        for ls, ld in zip(ks.loops, kd.loops):
            assert (ls.schedule.tile, ls.schedule.parallel,
                    ls.schedule.tile_size, ls.schedule.share_cache) == (
                ld.schedule.tile, ld.schedule.parallel,
                ld.schedule.tile_size, ld.schedule.share_cache)
    got = np.asarray(loaded.call("c", args))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_apply_tuning_rejects_mismatched_source():
    from exprgrad_tpu.autotune import apply_tuning, export_tuning

    model, args = _matmul_model()
    tuning = export_tuning(model, "c")
    other, _ = _matmul_model(schedule=False)
    tuning_bad = dict(tuning, n_kernels=tuning["n_kernels"] + 1)
    with pytest.raises(ModelRuntimeError, match="source changed"):
        apply_tuning(other, tuning_bad)
    with pytest.raises(ModelRuntimeError, match="format"):
        apply_tuning(model, {"format": 99})
    with pytest.raises(ModelRuntimeError, match="target"):
        apply_tuning(model, dict(tuning, target="nope"))


def test_autotune_training_target_leaves_params_untouched():
    """Tuning a mutating target must not step the host-side params."""
    from exprgrad_tpu import make_opt, param
    from exprgrad_tpu.layers import gradient_descent, mse

    y, x, it = iters("y", "x", "it")
    w = param([64, 64], (-0.1, 0.1), name="w")
    inp, lbl = input("inp"), input("lbl")
    pred = Fun("pred")
    pred[y, x] = inp[y, it] * w[it, x]
    pred.schedule(tile={"y": 128, "x": 128, "it": 128})
    loss = mse(pred, lbl)
    graph = (
        loss.target("loss")
        .backwards()
        .optimize(make_opt(gradient_descent, rate=0.1))
        .target("train")
    )
    model = compile(graph, backend="jax", seed=3)
    rng = np.random.default_rng(1)
    args = {
        "inp": rng.normal(size=(32, 64)).astype(np.float32),
        "lbl": rng.normal(size=(32, 64)).astype(np.float32),
    }
    before = {tid: v.copy() for tid, v in model.params.items()}
    model.autotune("train", args, tile_sizes=(128,), reps=1, chain=1)
    for tid, v in model.params.items():
        np.testing.assert_array_equal(np.asarray(v), before[tid])
    # and training still works afterwards
    l0 = float(model.call("loss", args)[0])
    for _ in range(3):
        model.apply("train", args)
    assert float(model.call("loss", args)[0]) < l0
