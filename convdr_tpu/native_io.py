"""ctypes bindings for the C++ host runtime (native/convdr_native.cpp).

The shared library is built on demand with the repo Makefile (g++ is part of
the toolchain; pybind11 is not available, hence the C ABI + ctypes). Every
entry point has a pure-Python/numpy fallback so the framework degrades
gracefully on hosts without a compiler; ``native_available()`` reports which
path is active.

Native block files (``.cnb``) hold a 32-byte header, contiguous f32 rows,
and int64 ids -- loaded straight into numpy buffers with multithreaded
reads, replacing pickle on the serving path.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libconvdr_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_NATIVE_DIR, check=True, capture_output=True
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning("native build failed: %s", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_NATIVE_DIR, "convdr_native.cpp")
    if not os.path.exists(src):
        return None
    # `make -s` is a ~ms no-op when fresh and rebuilds a stale .so whose
    # symbol table predates newer entry points (ctypes would otherwise
    # raise AttributeError on setup below).
    if not _build() and not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        logger.warning("cannot load %s: %s", _LIB_PATH, e)
        return None

    try:
        lib.convdr_write_block.restype = ctypes.c_int
        lib.convdr_write_block.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.convdr_read_block_header.restype = ctypes.c_int
        lib.convdr_read_block_header.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.convdr_read_block.restype = ctypes.c_int
        lib.convdr_read_block.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.convdr_write_block_ex.restype = ctypes.c_int
        lib.convdr_write_block_ex.argtypes = [
            ctypes.c_char_p,
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.convdr_read_block_header_ex.restype = ctypes.c_int
        lib.convdr_read_block_header_ex.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.convdr_read_block_ex.restype = ctypes.c_int
        lib.convdr_read_block_ex.argtypes = [
            ctypes.c_char_p,
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.convdr_merge_splits.restype = ctypes.c_int64
        lib.convdr_merge_splits.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        lib.convdr_gather_rows.restype = ctypes.c_int
        lib.convdr_gather_rows.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_int,
        ]
        lib.convdr_merge_topk.restype = None
        lib.convdr_merge_topk.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
        ]
    except AttributeError as e:
        logger.warning("stale native library at %s: %s", _LIB_PATH, e)
        return None
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _fp(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


# ---------------------------------------------------------------------------
# Block store
# ---------------------------------------------------------------------------
_HEADER_BYTES = 32
_MAGIC = 0x434E5642304B4C42


def _block_dtype_code(dtype: np.dtype):
    """numpy dtype -> header dtype code (0 = f32, 1 = bf16, 2 = int8)."""
    import ml_dtypes

    dtype = np.dtype(dtype)
    if dtype == np.float32:
        return 0, dtype
    if dtype == np.dtype(ml_dtypes.bfloat16):
        return 1, dtype
    if dtype == np.int8:
        return 2, dtype
    raise ValueError(f"native block store supports f32/bf16/int8, not {dtype}")


def _block_dtype_from_code(code: int) -> np.dtype:
    import ml_dtypes

    if code == 0:
        return np.dtype(np.float32)
    if code == 1:
        return np.dtype(ml_dtypes.bfloat16)
    if code == 2:
        return np.dtype(np.int8)
    raise IOError(f"unknown native-block dtype code {code}")


def write_native_block(path: str, emb: np.ndarray, ids: np.ndarray) -> None:
    """Raw block store write; dtype (f32/bf16) recorded in the header."""
    emb = np.ascontiguousarray(emb)
    if emb.dtype == np.float64:
        emb = emb.astype(np.float32)
    code, _ = _block_dtype_code(emb.dtype)
    ids = np.ascontiguousarray(ids, np.int64)
    rows, dim = emb.shape
    lib = _load()
    if lib is not None:
        rc = lib.convdr_write_block_ex(
            path.encode(), emb.ctypes.data, _ip(ids), rows, dim, code
        )
        if rc != 0:
            raise IOError(f"convdr_write_block_ex({path}) failed: rc={rc}")
        return
    with open(path, "wb") as f:  # python fallback, same byte layout
        f.write(
            np.asarray([_MAGIC, rows, dim, code], np.uint64).tobytes()
        )
        f.write(emb.tobytes())
        f.write(ids.tobytes())


def read_native_block(
    path: str, num_threads: int = 8
) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    if lib is not None:
        rows = ctypes.c_int64()
        dim = ctypes.c_int64()
        code = ctypes.c_int64()
        rc = lib.convdr_read_block_header_ex(
            path.encode(), ctypes.byref(rows), ctypes.byref(dim),
            ctypes.byref(code),
        )
        if rc != 0:
            raise IOError(f"convdr_read_block_header({path}) failed: rc={rc}")
        emb = np.empty((rows.value, dim.value), _block_dtype_from_code(code.value))
        ids = np.empty(rows.value, np.int64)
        rc = lib.convdr_read_block_ex(
            path.encode(), emb.ctypes.data, _ip(ids), rows.value, dim.value,
            code.value, num_threads,
        )
        if rc != 0:
            raise IOError(f"convdr_read_block({path}) failed: rc={rc}")
        return emb, ids
    with open(path, "rb") as f:  # python fallback
        header = np.frombuffer(f.read(_HEADER_BYTES), np.uint64)
        if header[0] != _MAGIC:
            raise IOError(f"{path} is not a convdr native block")
        rows, dim = int(header[1]), int(header[2])
        dtype = _block_dtype_from_code(int(header[3]))
        emb = np.frombuffer(
            f.read(rows * dim * dtype.itemsize), dtype
        ).reshape(rows, dim)
        ids = np.frombuffer(f.read(rows * 8), np.int64)
        return emb.copy(), ids.copy()


def gather_file_rows(
    path: str,
    payload_off: int,
    dtype: np.dtype,
    dim: int,
    row_idx: np.ndarray,
    *,
    num_threads: int = 4,
) -> np.ndarray:
    """Read only the listed rows of a flat row-major [N, dim] payload that
    starts at byte ``payload_off`` of ``path`` (the random-access primitive
    behind candidate-proportional rescoring, retrieval/refine.py). Native
    path coalesces consecutive rows into single preads; the fallback is an
    ``np.memmap`` fancy-index read (same bytes, OS page cache)."""
    dtype = np.dtype(dtype)
    row_idx = np.ascontiguousarray(row_idx, np.int64)
    out = np.empty((row_idx.shape[0], dim), dtype)
    if row_idx.shape[0] == 0:
        return out
    row_bytes = dim * dtype.itemsize
    lib = _load()
    if lib is not None:
        rc = lib.convdr_gather_rows(
            path.encode(), payload_off, row_bytes, _ip(row_idx),
            row_idx.shape[0], out.ctypes.data, num_threads,
        )
        if rc != 0:
            raise IOError(f"convdr_gather_rows({path}) failed: rc={rc}")
        return out
    file_rows = (os.path.getsize(path) - payload_off) // row_bytes
    mm = np.memmap(
        path, dtype=dtype, mode="r", offset=payload_off,
        shape=(file_rows, dim),
    )
    out[:] = mm[row_idx]
    del mm
    return out


# ---------------------------------------------------------------------------
# Token-cache split merge
# ---------------------------------------------------------------------------
def merge_token_splits(
    split_paths: List[str],
    out_path: str,
    record_bytes: int,
    max_records: int,
) -> np.ndarray:
    """Merge worker split files into the cache body; returns pid array."""
    lib = _load()
    if lib is not None:
        pids = np.zeros(max_records, np.int64)
        arr = (ctypes.c_char_p * len(split_paths))(
            *[p.encode() for p in split_paths]
        )
        count = lib.convdr_merge_splits(
            arr, len(split_paths), out_path.encode(), record_bytes,
            _ip(pids), max_records,
        )
        if count < 0:
            raise IOError(f"convdr_merge_splits failed: rc={count}")
        return pids[:count]
    # python fallback
    pids_list: List[int] = []
    full = 8 + record_bytes
    with open(out_path, "wb") as out:
        for split in split_paths:
            with open(split, "rb") as f:
                while True:
                    rec = f.read(full)
                    if not rec:
                        break
                    if len(rec) != full:
                        raise IOError(f"truncated record in {split}")
                    pids_list.append(int.from_bytes(rec[:8], "big"))
                    out.write(rec[8:])
    return np.asarray(pids_list, np.int64)


# ---------------------------------------------------------------------------
# Host-side exact top-k merge
# ---------------------------------------------------------------------------
def merge_topk_host(
    s_a: np.ndarray, i_a: np.ndarray, s_b: np.ndarray, i_b: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """2-pointer merge of sorted-desc [Q, k] candidate lists; A wins ties."""
    s_a = np.ascontiguousarray(s_a, np.float32)
    s_b = np.ascontiguousarray(s_b, np.float32)
    i_a = np.ascontiguousarray(i_a, np.int64)
    i_b = np.ascontiguousarray(i_b, np.int64)
    nq, k = s_a.shape
    out_s = np.empty_like(s_a)
    out_i = np.empty_like(i_a)
    lib = _load()
    if lib is not None:
        lib.convdr_merge_topk(
            _fp(s_a), _ip(i_a), _fp(s_b), _ip(i_b), nq, k, _fp(out_s),
            _ip(out_i),
        )
        return out_s, out_i
    for q in range(nq):  # python fallback
        p1 = p2 = 0
        for o in range(k):
            if p2 >= k or (p1 < k and s_a[q, p1] >= s_b[q, p2]):
                out_s[q, o], out_i[q, o] = s_a[q, p1], i_a[q, p1]
                p1 += 1
            else:
                out_s[q, o], out_i[q, o] = s_b[q, p2], i_b[q, p2]
                p2 += 1
    return out_s, out_i
