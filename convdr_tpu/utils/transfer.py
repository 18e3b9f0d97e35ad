"""Chunked host->device transfers.

Single host->device transfers above ~1-2 GB fall off a bandwidth cliff on
this stack (measured v5e tunnel: ~1.1 GB/s at <=1 GB, 150 MB/s at 2 GB, and
multi-minute stalls on 3 GB uploads). Row-aligned <=1 GiB slices uploaded
separately and concatenated in HBM (a ~ms device op) restore full rate.
Used by the block searcher and every benchmark that stages a corpus.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

CHUNK_BYTES = 1 << 30


def device_put_chunked(
    arr: np.ndarray, dtype=None, *, pad_rows_to: int = 0
) -> jnp.ndarray:
    """Upload ``arr`` ([N, ...]) in row-aligned <=1 GiB slices.

    ``dtype`` converts on device (host cast of bf16 crawls, hostops.py).
    ``pad_rows_to`` > N appends device-side zero rows (padding in HBM is
    microseconds; a host-side pad of a bf16 block costs minutes).
    """
    n = arr.shape[0]
    dtype = arr.dtype if dtype is None else dtype
    row_bytes = max(int(arr.nbytes // max(n, 1)), 1)
    rows_per_chunk = max(1, CHUNK_BYTES // row_bytes)
    parts = [
        jnp.asarray(arr[i : i + rows_per_chunk], dtype=dtype)
        for i in range(0, n, rows_per_chunk)
    ]
    if pad_rows_to > n:
        parts.append(
            jnp.zeros((pad_rows_to - n, *arr.shape[1:]), dtype)
        )
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
