"""Exact inner-product top-k search (the FAISS ``IndexFlatIP`` replacement).

The reference delegates retrieval to FAISS FlatIP over up to 8 sequentially
loaded embedding blocks, then merges per-block top-N lists with a 2-pointer
walk (/root/reference/drivers/run_convdr_inference.py:157-242). Here the
whole engine is XLA/Pallas-native:

  * :func:`topk_oracle`     -- numpy reference implementation (test oracle);
  * :func:`flat_ip_topk`    -- jitted blocked scan: per-block MXU matmul with
    fp32 accumulation + hierarchical exact top-k, O(k) running state, no
    [Q, N] score materialization in HBM beyond one block;
  * :func:`merge_topk`      -- stable merge of sorted candidate lists with
    the reference's tie rule (earlier block / lower passage index wins,
    run_convdr_inference.py:217-229).

Exactness contract: scores are accumulated in fp32 regardless of storage
dtype; ordering is (score desc, candidate index asc), which matches both
FAISS FlatIP and ``jax.lax.top_k``'s documented tie behavior, so recall@k
is bit-identical to the oracle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = float(np.finfo(np.float32).min)


# ---------------------------------------------------------------------------
# numpy oracle
# ---------------------------------------------------------------------------
def topk_oracle(
    queries: np.ndarray, passages: np.ndarray, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact top-k by full argsort; ties broken by lower passage index.

    Returns (scores [Q, k] f32 desc, indices [Q, k] int32). Rows beyond the
    corpus size are filled with (NEG_INF, -1).
    """
    q = queries.astype(np.float32)
    p = passages.astype(np.float32)
    scores = q @ p.T  # [Q, N]
    n = scores.shape[1]
    kk = min(k, n)
    # stable sort on -score keeps lower index first among equals
    order = np.argsort(-scores, axis=1, kind="stable")[:, :kk]
    top_s = np.take_along_axis(scores, order, axis=1)
    if kk < k:
        pad_s = np.full((scores.shape[0], k - kk), NEG_INF, np.float32)
        pad_i = np.full((scores.shape[0], k - kk), -1, np.int64)
        top_s = np.concatenate([top_s, pad_s], axis=1)
        order = np.concatenate([order, pad_i], axis=1)
    return top_s.astype(np.float32), order.astype(np.int32)


# ---------------------------------------------------------------------------
# XLA blocked search
# ---------------------------------------------------------------------------
def _chunked_topk(scores: jnp.ndarray, k: int, chunk: int = 2048):
    """Exact top-k over the last axis via a two-level tournament.

    Sorting a whole [Q, B] block costs O(B log B) on the VPU; splitting into
    S-sized chunks and merging chunk winners costs O(B log S + C*k log(C*k)),
    a large constant-factor win for B >> S while remaining exact (any global
    top-k element is a top-k element of its chunk since k <= S).
    """
    qn, b = scores.shape
    if b <= max(chunk, k):
        return jax.lax.top_k(scores, k)
    c = -(-b // chunk)
    pad = c * chunk - b
    if pad:
        scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=NEG_INF)
    s3 = scores.reshape(qn, c, chunk)
    sc, ic = jax.lax.top_k(s3, min(k, chunk))  # [Q, C, k]
    base = (jnp.arange(c, dtype=jnp.int32) * chunk)[None, :, None]
    ic = ic.astype(jnp.int32) + base
    flat_s = sc.reshape(qn, -1)
    flat_i = ic.reshape(qn, -1)
    # Candidates are ordered chunk-major, so equal scores from a lower chunk
    # (lower global index) appear first; top_k's stable tie rule keeps them.
    top_s, sel = jax.lax.top_k(flat_s, k)
    top_i = jnp.take_along_axis(flat_i, sel, axis=1)
    return top_s, top_i


def merge_topk(
    s_a: jnp.ndarray,
    i_a: jnp.ndarray,
    s_b: jnp.ndarray,
    i_b: jnp.ndarray,
    k: int,
):
    """Merge two sorted-desc candidate lists; list A wins ties.

    Equivalent to the reference's 2-pointer merge with ``>=`` on the earlier
    list (run_convdr_inference.py:217-229): concatenating A before B and
    using stable top_k yields the identical selection and order.
    """
    cat_s = jnp.concatenate([s_a, s_b], axis=1)
    cat_i = jnp.concatenate([i_a, i_b], axis=1)
    top_s, sel = jax.lax.top_k(cat_s, k)
    top_i = jnp.take_along_axis(cat_i, sel, axis=1)
    return top_s, top_i


@functools.partial(jax.jit, static_argnames=("k", "block_rows"))
def flat_ip_topk(
    queries: jnp.ndarray,
    passages: jnp.ndarray,
    k: int,
    *,
    block_rows: int = 65536,
    valid_rows=-1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact FlatIP top-k: scan over row blocks of the passage matrix.

    queries  [Q, D] (any float dtype; promoted to the matmul dtype)
    passages [N, D] (bf16/f32 storage; fp32 accumulation on the MXU)
    valid_rows: logical corpus size if ``passages`` is padded (-1 = N).
        May be a traced scalar (used by the sharded search where each shard's
        valid row count is data-dependent).

    Memory: one [Q, block_rows] fp32 score block + O(Q*k) running state.
    """
    qn, d = queries.shape
    n = passages.shape[0]
    valid = jnp.where(jnp.asarray(valid_rows) < 0, n, valid_rows)
    k_eff = min(k, n)

    nblocks = -(-n // block_rows)
    pad = nblocks * block_rows - n
    if pad:
        passages = jnp.pad(passages, ((0, pad), (0, 0)))
    blocks = passages.reshape(nblocks, block_rows, d)

    init_s = jnp.full((qn, k_eff), NEG_INF, jnp.float32)
    init_i = jnp.full((qn, k_eff), -1, jnp.int32)

    q = queries

    def step(carry, inputs):
        run_s, run_i = carry
        block, block_idx = inputs
        scores = jnp.dot(
            q, block.T, preferred_element_type=jnp.float32
        )  # [Q, block_rows] fp32
        base = block_idx * block_rows
        row_ids = base + jnp.arange(block_rows, dtype=jnp.int32)
        scores = jnp.where(row_ids[None, :] < valid, scores, NEG_INF)
        blk_s, blk_i = _chunked_topk(scores, min(k_eff, block_rows))
        blk_i = blk_i + base
        # Running list first => earlier blocks win ties (reference semantics).
        new_s, new_i = merge_topk(run_s, run_i, blk_s, blk_i, k_eff)
        return (new_s, new_i), None

    (out_s, out_i), _ = jax.lax.scan(
        step, (init_s, init_i), (blocks, jnp.arange(nblocks, dtype=jnp.int32))
    )
    if k_eff < k:
        out_s = jnp.pad(out_s, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF)
        out_i = jnp.pad(out_i, ((0, 0), (0, k - k_eff)), constant_values=-1)
    # Padded/invalid slots report index -1.
    out_i = jnp.where(out_s == NEG_INF, -1, out_i)
    return out_s, out_i
