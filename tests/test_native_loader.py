"""Native C++ batch loader vs numpy fallbacks."""
import numpy as np
import pytest

from nuwa_tpu.native import (
    build_library,
    gather_i64,
    gather_normalize_f32,
    library_available,
    rot90_f32,
)


def test_library_builds():
    path = build_library()
    assert library_available(), path


def test_gather_normalize_matches_numpy():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, size=(20, 3, 8, 8), dtype=np.uint8)
    idx = np.array([3, 0, 19, 7], np.int64)
    out = gather_normalize_f32(src, idx)
    ref = src[idx].astype(np.float32) / 255.0
    np.testing.assert_allclose(out, ref, atol=1e-7)
    assert out.dtype == np.float32


def test_rot90_matches_numpy():
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(3, 4, 6)).astype(np.float32)
    for k in range(4):
        out = rot90_f32(img, k)
        ref = np.rot90(img, k, axes=(-2, -1))
        np.testing.assert_allclose(out, ref, atol=0)


def test_gather_i64():
    src = np.arange(40, dtype=np.int64).reshape(10, 4)
    idx = np.array([9, 2, 2], np.int64)
    out = gather_i64(src, idx)
    np.testing.assert_array_equal(out, src[idx])
