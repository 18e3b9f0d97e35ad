"""Fast host-side row operations for custom-dtype (bf16) arrays.

numpy has no fast copy loop for ml_dtypes' bfloat16: ``np.concatenate`` /
``arr.copy()`` on bf16 crawl at ~14 MB/s on this host (measured; f32 copies
run at ~700 MB/s). That turned every capacity-mode block pad into minutes
of host time. These helpers route row copies through byte views --
``arr.view(np.uint8)`` reshapes [N, D] into [N, D*itemsize] -- so the copy
is a plain memcpy for ANY dtype. Native float/int dtypes take the normal
numpy path.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

_NATIVE_KINDS = frozenset("fiub")  # float/int/uint/bool have fast loops


def _is_native(dtype: np.dtype) -> bool:
    return np.dtype(dtype).kind in _NATIVE_KINDS


def pad_rows(arr: np.ndarray, total_rows: int) -> np.ndarray:
    """Zero-pad a [N, D] array to [total_rows, D] at memcpy speed."""
    n = arr.shape[0]
    if total_rows == n:
        return arr
    if total_rows < n:
        raise ValueError(f"total_rows {total_rows} < rows {n}")
    if _is_native(arr.dtype):
        return np.concatenate(
            [arr, np.zeros((total_rows - n, *arr.shape[1:]), arr.dtype)]
        )
    out = np.zeros((total_rows, *arr.shape[1:]), arr.dtype)
    if n:  # reshape(0, -1) on an empty byte view raises; nothing to copy
        src = np.ascontiguousarray(arr)
        # Byte views of a 1-D array flatten rows into a single byte axis,
        # so a [:n] slice would take n BYTES; reshape row-per-byte-row.
        out.view(np.uint8).reshape(total_rows, -1)[:n] = (
            src.view(np.uint8).reshape(n, -1)
        )
    return out


def concat_rows(arrays: Sequence[np.ndarray]) -> np.ndarray:
    """Row-wise concatenate at memcpy speed for any dtype."""
    arrays = [np.ascontiguousarray(a) for a in arrays]
    if not arrays:
        raise ValueError("need at least one array")
    if _is_native(arrays[0].dtype):
        return np.concatenate(arrays, axis=0)
    views: List[np.ndarray] = [a.view(np.uint8) for a in arrays]
    return np.concatenate(views, axis=0).view(arrays[0].dtype)
