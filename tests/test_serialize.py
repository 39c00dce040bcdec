"""Checkpoint/resume tests.

The reference only round-trips primitives/tensors/instrs
(tests/test_serialize.nim:31-56) because its model-load path is bitrotted
(serialize.nim:364); here the full model checkpoint round-trips: a trained
model saved + reloaded must produce identical predictions and continue
training (epoch preserved for adam bias correction).
"""

import pathlib

import pytest

import numpy as np

from exprgrad_tpu import Tensor, compile
from exprgrad_tpu.io import load_model, load_program, save_model, save_program
from exprgrad_tpu.models import xor_mlp
from exprgrad_tpu.fun import to_program
from exprgrad_tpu.irprint import fmt_program

TRAIN_X = Tensor.new([4, 2], [0, 0, 0, 1, 1, 0, 1, 1])
TRAIN_Y = Tensor.new([4, 1], [0, 1, 1, 0])


def test_program_roundtrip(tmp_path):
    program = to_program(xor_mlp())
    path = tmp_path / "prog.bin"
    save_program(program, str(path))
    loaded = load_program(str(path))
    assert fmt_program(loaded) == fmt_program(program)


def test_model_roundtrip(tmp_path):
    model = compile(xor_mlp(rate=0.5), backend="jax", seed=10)
    for _ in range(50):
        model.fit("train", {"x": TRAIN_X, "y": TRAIN_Y}, batch_size=4,
                  log_status=False)
    pred_before = model.call("predict", {"x": TRAIN_X})

    path = tmp_path / "model.bin"
    save_model(model, str(path))
    loaded = load_model(str(path), backend="jax")

    assert loaded.epoch == model.epoch
    pred_after = loaded.call("predict", {"x": TRAIN_X})
    np.testing.assert_allclose(pred_after, pred_before, rtol=1e-6)

    # training continues from the checkpoint
    loaded.fit("train", {"x": TRAIN_X, "y": TRAIN_Y}, batch_size=4,
               log_status=False)
    assert loaded.epoch == model.epoch + 1


def test_adam_state_roundtrip(tmp_path):
    from exprgrad_tpu import input, make_opt
    from exprgrad_tpu.layers import adam, dense, mse, sigmoid

    net = (
        input("x").pipe(dense, 2, 1).pipe(sigmoid).target("predict")
        .pipe(mse, input("y")).target("loss")
        .backprop(make_opt(adam, eta=0.1)).target("train")
    )
    model = compile(net, backend="jax", seed=3)
    for _ in range(5):
        model.fit("train", {"x": TRAIN_X, "y": TRAIN_Y}, batch_size=4,
                  log_status=False)
    path = tmp_path / "model.bin"
    save_model(model, str(path))
    loaded = load_model(str(path))
    # optimizer caches (m, v) must round-trip
    assert set(loaded.caches) == set(model.caches)
    for tid in model.caches:
        np.testing.assert_allclose(
            np.asarray(loaded.caches[tid]), np.asarray(model.caches[tid])
        )
    # one more step on each must agree exactly
    model.fit("train", {"x": TRAIN_X, "y": TRAIN_Y}, batch_size=4,
              log_status=False)
    loaded.fit("train", {"x": TRAIN_X, "y": TRAIN_Y}, batch_size=4,
               log_status=False)
    for tid in model.params:
        np.testing.assert_allclose(
            np.asarray(loaded.params[tid]),
            np.asarray(model.params[tid]),
            rtol=1e-6,
        )


def test_random_program_roundtrips():
    """Serialization must round-trip arbitrary compiled programs exactly
    (structure pinned via the deterministic pretty-printer)."""
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_fuzz import _random_kernel

    from exprgrad_tpu.io.serialize import (
        MAGIC,
        Reader,
        Writer,
        read_program,
        write_program,
    )
    import io

    for seed in range(10):
        rng = np.random.default_rng(7000 + seed)
        graph, _arrays = _random_kernel(rng, smooth=False)
        program = to_program(graph.target("out"))
        from exprgrad_tpu.passes import compile_program

        compile_program(program)
        buf = io.BytesIO()
        write_program(Writer(buf), program)
        buf.seek(0)
        loaded = read_program(Reader(buf))
        assert fmt_program(loaded) == fmt_program(program)


def test_checkpoint_crc_detects_corruption(tmp_path):
    """A flipped payload byte fails the CRC32 trailer check with a clean
    error instead of deserializing garbage."""
    from exprgrad_tpu.errors import ModelRuntimeError
    from exprgrad_tpu.io import load_model, save_model
    from exprgrad_tpu.models import flash_transformer

    # a model whose file is dominated by one big tensor, so a mid-file
    # flip lands in raw tensor DATA — structurally valid, only the CRC
    # can catch it (corrupted framing fields fail with their own error)
    model = compile(
        flash_transformer(vocab=64, dim=32, heads=2, hidden=64,
                          max_seq=16),
        seed=0,
    )
    path = tmp_path / "m.bin"
    save_model(model, str(path))
    data = bytearray(path.read_bytes())
    data[len(data) // 2] ^= 0xFF
    path.write_bytes(bytes(data))
    with pytest.raises(ModelRuntimeError, match="CRC32|corrupted"):
        load_model(str(path))


def test_corrupted_framing_gives_clean_error(tmp_path):
    """A flipped LENGTH field must raise ModelRuntimeError, never a raw
    MemoryError from an absurd allocation."""
    from exprgrad_tpu.errors import ModelRuntimeError
    from exprgrad_tpu.io import load_model, save_model
    from exprgrad_tpu.models import xor_mlp

    model = compile(xor_mlp(), seed=0)
    path = tmp_path / "m.bin"
    save_model(model, str(path))
    raw = path.read_bytes()
    for off in (12, 20, 40, 100):
        data = bytearray(raw)
        data[len(data) - off] ^= 0xFF
        path.write_bytes(bytes(data))
        with pytest.raises(ModelRuntimeError):
            load_model(str(path))


def test_checkpoint_truncation_detected(tmp_path):
    from exprgrad_tpu.errors import ModelRuntimeError
    from exprgrad_tpu.io import load_model, save_model
    from exprgrad_tpu.models import xor_mlp

    model = compile(xor_mlp(), seed=0)
    path = tmp_path / "m.bin"
    save_model(model, str(path))
    data = path.read_bytes()
    path.write_bytes(data[:-2])  # drop half the trailer
    with pytest.raises(ModelRuntimeError):
        load_model(str(path))


def test_old_v6_magic_clean_error(tmp_path):
    from exprgrad_tpu.errors import ModelRuntimeError
    from exprgrad_tpu.io import load_model

    path = tmp_path / "old.bin"
    path.write_bytes(b"EGTPU\x06\n" + b"\x00" * 32)
    with pytest.raises(ModelRuntimeError, match="v6 checkpoint"):
        load_model(str(path))


def test_corrupted_dtype_tag_gives_clean_error(tmp_path):
    """A corrupted tensor dtype-tag string must raise ModelRuntimeError,
    not a raw TypeError from np.dtype (review finding)."""
    from exprgrad_tpu.errors import ModelRuntimeError
    from exprgrad_tpu.io import load_model, save_model
    from exprgrad_tpu.models import xor_mlp

    model = compile(xor_mlp(), seed=0)
    path = tmp_path / "m.bin"
    save_model(model, str(path))
    data = bytearray(path.read_bytes())
    idx = bytes(data).find(b"<f4")
    assert idx > 0
    data[idx + 2] = ord("9")  # "<f4" -> "<f9": invalid dtype
    path.write_bytes(bytes(data))
    with pytest.raises(ModelRuntimeError):
        load_model(str(path))


def test_rng_state_roundtrips(tmp_path):
    """v8 checkpoints carry the host RNG stream: the next random draws
    after a reload equal the draws the saved model would have made —
    the ingredient that makes stochastic-shuffle resume bit-exact."""
    from exprgrad_tpu.io import load_model, save_model
    from exprgrad_tpu.models import xor_mlp

    model = compile(xor_mlp(), seed=123)
    model._rng.integers(0, 1000, size=7)  # advance the stream
    path = tmp_path / "m.bin"
    save_model(model, str(path))
    expected = model._rng.integers(0, 2**31 - 1, size=16)

    loaded = load_model(str(path))
    got = loaded._rng.integers(0, 2**31 - 1, size=16)
    np.testing.assert_array_equal(expected, got)
