"""MXU-native k-means (the FAISS ``Clustering`` counterpart).

FAISS trains IVF coarse quantizers with Lloyd's algorithm on the CPU
(``faiss.Clustering`` / ``IndexIVFFlat.train``; the reference links FAISS at
/root/reference/drivers/run_convdr_inference.py:157-242 but only ever uses
the flat index — clustering is the capability its FAISS dependency carries).
Here both Lloyd phases are TPU matmuls:

  * assignment: ``argmax(x @ c.T - |c|^2/2)`` == nearest centroid in L2 —
    one [B, K] MXU matmul per block, no [B, K, D] difference tensor;
  * update: one-hot(assign) contracted against the block
    (``einsum('bk,bd->kd')``) — the scatter-add becomes an MXU matmul, the
    TPU idiom for segment sums (scatter lowers poorly on TPU).

The f32 accumulator keeps sums exact; the one-hot operand is exact in bf16
(0/1 values), so default matmul precision is safe for the update. Assignment
runs at default precision too — clustering is approximate by nature and the
bf16 score error (~1e-3 relative) only ever flips near-equidistant ties.

Empty clusters are reseeded between iterations by splitting the largest
cluster (FAISS ``Clustering::post_process_centroids`` semantics): the donor
centroid is duplicated with a +/- eps perturbation, deterministic given the
iteration state.
"""

from __future__ import annotations

import functools
import logging
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

# Assignment/update block: bounds the [B, K] score + one-hot buffers
# (B=65536, K=4096 => 512 MB bf16 one-hot) while keeping the MXU fed.
_KMEANS_BLOCK_ROWS = 65536

# Host-chunk byte cap for streamed assignment inputs (assign_top_t):
# bounds the resident input slab uploaded per dispatch.
_ASSIGN_CHUNK_BYTES = int(2 * (1 << 30))


def _block_rows_for(n: int, k: int, requested: int) -> int:
    """Cap the scan block so scores f32 + one-hot bf16 stay under ~1.5 GB
    (6 bytes per [B, K] cell) — K=16384 would otherwise need 6 GB of
    per-block buffers at the default 65536 rows."""
    cap = max(4096, int((1.5 * (1 << 30)) // (6 * max(k, 1))))
    return max(1, min(requested, cap, n))


@functools.partial(jax.jit, static_argnames=("block_rows",))
def _lloyd_iter(
    x: jnp.ndarray, c: jnp.ndarray, block_rows: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One Lloyd iteration. Returns (sums [K, D] f32, counts [K] f32,
    objective = sum of squared distances to assigned centroids, up to the
    row-norm constant: sum(|c_a|^2/2 - x.c_a) per row, f32 scalar)."""
    n, d = x.shape
    k = c.shape[0]
    nblocks = -(-n // block_rows)
    pad = nblocks * block_rows - n
    if pad:
        # padded rows are masked out of the one-hot below via a validity row
        x = jnp.pad(x, ((0, pad), (0, 0)))
    chalf = 0.5 * jnp.sum(
        c.astype(jnp.float32) * c.astype(jnp.float32), axis=1
    )  # [K]
    xb = x.reshape(nblocks, block_rows, d)

    def step(carry, inp):
        sums, counts, obj = carry
        blk, bidx = inp
        scores = (
            jnp.dot(
                blk.astype(jnp.bfloat16),
                c.astype(jnp.bfloat16).T,
                preferred_element_type=jnp.float32,
            )
            - chalf[None, :]
        )  # [B, K]
        assign = jnp.argmax(scores, axis=1)  # [B]
        row = jax.lax.broadcasted_iota(jnp.int32, (block_rows,), 0)
        valid = (bidx * block_rows + row) < n  # mask the zero-pad rows
        onehot = jax.nn.one_hot(assign, k, dtype=jnp.bfloat16)
        onehot = jnp.where(valid[:, None], onehot, 0)
        sums = sums + jnp.einsum(
            "bk,bd->kd",
            onehot,
            blk.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        counts = counts + jnp.sum(onehot.astype(jnp.float32), axis=0)
        best = jnp.max(scores, axis=1)
        obj = obj - jnp.sum(jnp.where(valid, best, 0.0))
        return (sums, counts, obj), None

    init = (
        jnp.zeros((k, d), jnp.float32),
        jnp.zeros((k,), jnp.float32),
        jnp.asarray(0.0, jnp.float32),
    )
    (sums, counts, obj), _ = jax.lax.scan(
        step, init, (xb, jnp.arange(nblocks, dtype=jnp.int32))
    )
    return sums, counts, obj


def _split_empty(
    c: np.ndarray, counts: np.ndarray, eps: float = 1.0 / 1024.0
) -> Tuple[np.ndarray, int]:
    """Reseed empty clusters by splitting the currently largest ones."""
    c = c.copy()
    counts = counts.copy()
    empties = np.flatnonzero(counts == 0)
    for j in empties:
        donor = int(np.argmax(counts))
        if counts[donor] < 2:
            break  # fewer distinct points than clusters; leave as-is
        c[j] = c[donor] * (1.0 + eps)
        c[donor] = c[donor] * (1.0 - eps)
        counts[j] = counts[donor] // 2
        counts[donor] -= counts[donor] // 2
    return c, len(empties)


def fit_kmeans(
    x: np.ndarray,
    nlist: int,
    *,
    iters: int = 20,
    seed: int = 42,
    sample_max: int | None = None,
    block_rows: int = _KMEANS_BLOCK_ROWS,
) -> np.ndarray:
    """Fit ``nlist`` centroids with Lloyd's algorithm on the TPU.

    ``sample_max`` caps the training set (FAISS defaults to 256 points per
    centroid; pass ``256 * nlist`` for that behavior); the subsample is a
    seeded choice without replacement. Returns centroids [nlist, D] f32.
    """
    x = np.asarray(x, np.float32)
    n, d = x.shape
    if nlist < 1 or nlist > n:
        raise ValueError(f"nlist={nlist} must be in [1, n_rows={n}]")
    rng = np.random.Generator(np.random.PCG64(seed))
    if sample_max is not None and n > sample_max:
        x = x[rng.choice(n, size=sample_max, replace=False)]
        n = sample_max
    c = x[rng.choice(n, size=nlist, replace=False)].copy()

    block_rows = _block_rows_for(n, nlist, block_rows)
    x_dev = jax.device_put(x)
    prev_obj = np.inf
    for it in range(iters):
        sums, counts, obj = _lloyd_iter(x_dev, jnp.asarray(c), block_rows)
        sums = np.asarray(sums)
        counts = np.asarray(counts)
        obj = float(obj)
        nonzero = counts > 0
        new_c = c.copy()
        new_c[nonzero] = sums[nonzero] / counts[nonzero, None]
        new_c, n_empty = _split_empty(new_c, counts)
        logger.info(
            "kmeans iter %d/%d: obj=%.4f empties=%d max/mean=%.2f",
            it + 1, iters, obj, n_empty,
            counts.max() / max(counts.mean(), 1e-9),
        )
        c = new_c
        if n_empty == 0 and abs(prev_obj - obj) <= 1e-7 * max(1.0, abs(obj)):
            break  # converged
        prev_obj = obj
    return c.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("t", "block_rows"))
def _assign_topt_dev(
    x: jnp.ndarray, c: jnp.ndarray, t: int, block_rows: int
) -> jnp.ndarray:
    from convdr_tpu.ops.exact_search import grouped_topk_last_axis

    n, d = x.shape
    nblocks = -(-n // block_rows)
    pad = nblocks * block_rows - n
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    chalf = 0.5 * jnp.sum(
        c.astype(jnp.float32) * c.astype(jnp.float32), axis=1
    )

    def step(_, blk):
        scores = (
            jnp.dot(
                blk.astype(jnp.bfloat16),
                c.astype(jnp.bfloat16).T,
                preferred_element_type=jnp.float32,
            )
            - chalf[None, :]
        )
        _, idx = grouped_topk_last_axis(scores, t)
        return None, idx

    _, out = jax.lax.scan(
        step, None, x.reshape(nblocks, block_rows, d)
    )
    return out.reshape(nblocks * block_rows, t)[:n]


def assign_top_t(
    x: np.ndarray,
    centroids: np.ndarray,
    t: int = 1,
    *,
    block_rows: int = _KMEANS_BLOCK_ROWS,
) -> np.ndarray:
    """For each row, its ``t`` nearest centroids (L2), nearest first.

    [N, t] int32. The multi-choice output feeds the IVF builder's
    bounded-capacity assignment (spill to the next-nearest list).

    Inputs stream to the device in ~2 GiB host chunks: a single 38M-scale
    block is 14.6 GB f32 — over v5e HBM by itself — and the assignment
    matmul runs bf16 regardless, so bf16 / uint16-bit-pattern block rows
    upload in their own dtype at half the bytes (no host cast).
    """
    import ml_dtypes

    from convdr_tpu.utils.transfer import device_put_chunked

    x = np.asarray(x)
    if x.dtype == np.uint16:  # bf16 bit patterns (block-file layout)
        x = x.view(ml_dtypes.bfloat16)
    elif x.dtype not in (
        np.dtype(np.float32), np.dtype(ml_dtypes.bfloat16)
    ):
        x = x.astype(np.float32)
    t = min(t, centroids.shape[0])
    n = x.shape[0]
    if n == 0:
        return np.zeros((0, t), np.int32)
    c_dev = jnp.asarray(centroids, jnp.float32)
    br = _block_rows_for(n, centroids.shape[0], block_rows)
    host_chunk = max(
        br, _ASSIGN_CHUNK_BYTES // max(1, x.itemsize * int(x.shape[1]))
    )
    outs = []
    for lo in range(0, n, host_chunk):
        hi = min(n, lo + host_chunk)
        out = _assign_topt_dev(
            device_put_chunked(x[lo:hi]), c_dev, t, min(br, hi - lo)
        )
        outs.append(np.asarray(out, np.int32))
    return outs[0] if len(outs) == 1 else np.concatenate(outs)
