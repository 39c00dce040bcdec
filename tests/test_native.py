"""Native C++ data-plumbing library tests (with fallback equivalence)."""

import zlib

import numpy as np
import pytest

from exprgrad_tpu.utils import have_native
from exprgrad_tpu.utils.native import (
    crc32,
    gather_rows,
    one_hot_native,
    shuffle_indices,
    u8_to_f32,
)


def test_native_builds():
    assert have_native(), "native library failed to build (g++ available?)"


def test_u8_to_f32():
    src = np.arange(256, dtype=np.uint8).reshape(16, 16)
    out = u8_to_f32(src, 1.0 / 255.0)
    np.testing.assert_allclose(out, src.astype(np.float32) / 255.0, rtol=1e-6)
    assert out.dtype == np.float32

    out2 = u8_to_f32(src, (0.9 - 0.1) / 255.0, 0.1)
    np.testing.assert_allclose(
        out2, src.astype(np.float32) * (0.8 / 255.0) + 0.1, rtol=1e-5
    )


def test_one_hot_native():
    labels = np.array([0, 3, 1, 3])
    out = one_hot_native(labels, 4)
    expected = np.zeros((4, 4), np.float32)
    expected[np.arange(4), labels] = 1
    np.testing.assert_array_equal(out, expected)


def test_gather_rows():
    src = np.arange(24, dtype=np.float32).reshape(6, 4)
    idx = np.array([5, 0, 3])
    np.testing.assert_array_equal(gather_rows(src, idx), src[idx])
    # multi-dim rows
    src3 = np.arange(48, dtype=np.int32).reshape(6, 2, 4)
    np.testing.assert_array_equal(gather_rows(src3, idx), src3[idx])


def test_shuffle_indices():
    perm = shuffle_indices(100, seed=7)
    assert sorted(perm.tolist()) == list(range(100))
    perm2 = shuffle_indices(100, seed=7)
    np.testing.assert_array_equal(perm, perm2)  # deterministic
    assert not np.array_equal(perm, np.arange(100))


def test_crc32_matches_zlib():
    data = bytes(range(256)) * 17
    assert crc32(data) == zlib.crc32(data)
    assert crc32(data, 123) == zlib.crc32(data, 123)


def test_measure_time(capsys):
    from exprgrad_tpu.utils import measure_time

    fenced = []
    with measure_time("work", fence=lambda: fenced.append(1)):
        pass
    out = capsys.readouterr().out
    assert "work:" in out and out.strip().endswith("s")
    assert fenced == [1]
