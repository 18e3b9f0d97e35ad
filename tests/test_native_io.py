"""C++ host runtime (native/convdr_native.cpp) via its ctypes bindings.

Covers both the native path (when the toolchain builds the .so) and byte
compatibility between the C++ and Python implementations of each entry point.
"""

import numpy as np
import pytest

from convdr_tpu import native_io
from convdr_tpu.native_io import (
    merge_token_splits,
    merge_topk_host,
    native_available,
    read_native_block,
    write_native_block,
)


def test_native_library_builds():
    """g++ is part of this image's toolchain: the fast path must be active."""
    assert native_available()


def test_block_roundtrip(tmp_path, rng):
    emb = rng.randn(100, 32).astype(np.float32)
    ids = rng.randint(0, 10_000, size=100).astype(np.int64)
    path = str(tmp_path / "block.cnb")
    write_native_block(path, emb, ids)
    emb2, ids2 = read_native_block(path, num_threads=4)
    np.testing.assert_array_equal(emb2, emb)
    np.testing.assert_array_equal(ids2, ids)


def test_block_bad_magic(tmp_path):
    path = str(tmp_path / "junk.cnb")
    with open(path, "wb") as f:
        f.write(b"\x00" * 64)
    with pytest.raises(IOError):
        read_native_block(path)


def test_python_and_native_block_bytes_match(tmp_path, rng):
    """The fallback writer and C++ writer must produce identical files."""
    if not native_available():
        pytest.skip("no native library")
    emb = rng.randn(8, 4).astype(np.float32)
    ids = np.arange(8, dtype=np.int64)
    native_path = str(tmp_path / "n.cnb")
    write_native_block(native_path, emb, ids)
    # force the python fallback by writing manually
    lib, native_io._lib = native_io._lib, None
    tried = native_io._tried
    native_io._tried = True
    try:
        py_path = str(tmp_path / "p.cnb")
        write_native_block(py_path, emb, ids)
        assert open(native_path, "rb").read() == open(py_path, "rb").read()
        # python reader reads the native file
        emb2, ids2 = read_native_block(native_path)
        np.testing.assert_array_equal(emb2, emb)
    finally:
        native_io._lib = lib
        native_io._tried = tried


def test_merge_token_splits(tmp_path):
    """Reference split-record layout: pid(8B BE) + len(4B BE) + int32 ids."""
    record_ids = 4  # 4 int32 tokens
    record_bytes = 4 + record_ids * 4

    def record(pid, length, ids):
        return (
            pid.to_bytes(8, "big")
            + length.to_bytes(4, "big")
            + np.asarray(ids, np.int32).tobytes()
        )

    s0 = tmp_path / "split0"
    s1 = tmp_path / "split1"
    s0.write_bytes(record(100, 2, [1, 2, 0, 0]) + record(101, 4, [3, 4, 5, 6]))
    s1.write_bytes(record(200, 1, [9, 0, 0, 0]))
    out = str(tmp_path / "merged")
    pids = merge_token_splits([str(s0), str(s1)], out, record_bytes, 10)
    assert list(pids) == [100, 101, 200]
    data = open(out, "rb").read()
    assert len(data) == 3 * record_bytes
    assert int.from_bytes(data[:4], "big") == 2  # first record length
    first_ids = np.frombuffer(data[4 : 4 + 16], np.int32)
    assert list(first_ids) == [1, 2, 0, 0]


def test_merge_topk_host_matches_reference_semantics():
    s_a = np.asarray([[5.0, 3.0, 1.0]], np.float32)
    i_a = np.asarray([[10, 11, 12]], np.int64)
    s_b = np.asarray([[5.0, 4.0, 0.5]], np.float32)
    i_b = np.asarray([[20, 21, 22]], np.int64)
    s, i = merge_topk_host(s_a, i_a, s_b, i_b)
    assert list(i[0]) == [10, 20, 21]  # A wins the 5.0 tie
    np.testing.assert_allclose(s[0], [5.0, 5.0, 4.0])


def test_merge_topk_host_matches_device_merge(rng):
    """C++ merge == jax merge_topk (same tie semantics)."""
    import jax.numpy as jnp

    from convdr_tpu.ops.exact_search import merge_topk

    k = 16
    s_a = -np.sort(-rng.randn(5, k).astype(np.float32), axis=1)
    s_b = -np.sort(-rng.randn(5, k).astype(np.float32), axis=1)
    i_a = rng.randint(0, 1000, size=(5, k)).astype(np.int64)
    i_b = rng.randint(1000, 2000, size=(5, k)).astype(np.int64)
    s_c, i_c = merge_topk_host(s_a, i_a, s_b, i_b)
    s_j, i_j = merge_topk(
        jnp.asarray(s_a), jnp.asarray(i_a), jnp.asarray(s_b), jnp.asarray(i_b), k
    )
    np.testing.assert_array_equal(s_c, np.asarray(s_j))
    np.testing.assert_array_equal(i_c, np.asarray(i_j))


@pytest.mark.parametrize("use_lib", [True, False])
def test_native_block_bf16_roundtrip(tmp_path, monkeypatch, use_lib, rng):
    """bf16 blocks round-trip bit-exactly through the native store, via the
    C library and the byte-compatible python fallback."""
    import ml_dtypes

    from convdr_tpu import native_io

    if not use_lib:
        monkeypatch.setattr(native_io, "_load", lambda: None)
    emb = rng.randn(37, 16).astype(np.float32).astype(ml_dtypes.bfloat16)
    ids = np.arange(100, 137, dtype=np.int64)
    path = str(tmp_path / f"blk_{use_lib}.cnb")
    native_io.write_native_block(path, emb, ids)
    got_emb, got_ids = native_io.read_native_block(path)
    assert got_emb.dtype == np.dtype(ml_dtypes.bfloat16)
    assert np.array_equal(got_emb.view(np.uint16), emb.view(np.uint16))
    assert np.array_equal(got_ids, ids)


def test_native_block_bf16_cross_impl(tmp_path, monkeypatch, rng):
    """Written by the C library, read by the python fallback (and back)."""
    import ml_dtypes

    from convdr_tpu import native_io

    if native_io._load() is None:
        pytest.skip("native library unavailable")
    emb = rng.randn(9, 8).astype(np.float32).astype(ml_dtypes.bfloat16)
    ids = np.arange(9, dtype=np.int64)
    p1 = str(tmp_path / "by_c.cnb")
    native_io.write_native_block(p1, emb, ids)
    monkeypatch.setattr(native_io, "_load", lambda: None)
    e1, i1 = native_io.read_native_block(p1)
    assert np.array_equal(e1.view(np.uint16), emb.view(np.uint16))
    p2 = str(tmp_path / "by_py.cnb")
    native_io.write_native_block(p2, emb, ids)
    monkeypatch.undo()
    e2, i2 = native_io.read_native_block(p2)
    assert np.array_equal(e2.view(np.uint16), emb.view(np.uint16))
    assert np.array_equal(i2, ids)


def test_native_block_rejects_unknown_dtype(tmp_path):
    from convdr_tpu import native_io

    with pytest.raises(ValueError, match="f32/bf16"):
        native_io.write_native_block(
            str(tmp_path / "x.cnb"),
            np.zeros((2, 2), np.int32),
            np.zeros(2, np.int64),
        )
