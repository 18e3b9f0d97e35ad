"""Byte-view row ops: correctness for native and ml_dtypes dtypes."""

import ml_dtypes
import numpy as np

from convdr_tpu.utils.hostops import concat_rows, pad_rows


def test_pad_rows_f32(rng):
    a = rng.randn(5, 4).astype(np.float32)
    out = pad_rows(a, 9)
    assert out.shape == (9, 4)
    assert np.array_equal(out[:5], a) and not out[5:].any()


def test_pad_rows_bf16(rng):
    a = rng.randn(7, 6).astype(np.float32).astype(ml_dtypes.bfloat16)
    out = pad_rows(a, 12)
    assert out.dtype == a.dtype and out.shape == (12, 6)
    assert np.array_equal(out[:7].view(np.uint16), a.view(np.uint16))
    assert not out[7:].view(np.uint16).any()


def test_pad_rows_noop_and_error(rng):
    a = rng.randn(3, 2).astype(np.float32)
    assert pad_rows(a, 3) is a
    try:
        pad_rows(a, 2)
        assert False
    except ValueError:
        pass


def test_concat_rows_matches_numpy(rng):
    for dt in (np.float32, ml_dtypes.bfloat16):
        parts = [rng.randn(n, 3).astype(np.float32).astype(dt) for n in (2, 5, 1)]
        got = concat_rows(parts)
        ref = np.concatenate([p.astype(np.float32) for p in parts])
        assert got.dtype == np.dtype(dt)
        assert np.array_equal(got.astype(np.float32), ref)


def test_pad_rows_1d_bf16(rng):
    """1-D non-native arrays pad by ROWS, not bytes (ADVICE r2)."""
    a = rng.randn(5).astype(np.float32).astype(ml_dtypes.bfloat16)
    out = pad_rows(a, 9)
    assert out.shape == (9,)
    assert np.array_equal(out[:5].astype(np.float32), a.astype(np.float32))
    assert not out[5:].astype(np.float32).any()


def test_pad_rows_empty_nonnative():
    out = pad_rows(np.zeros((0, 4), dtype=ml_dtypes.bfloat16), 8)
    assert out.shape == (8, 4)
    assert not out.any()
