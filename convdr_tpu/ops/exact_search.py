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
def _chunked_topk(
    scores: jnp.ndarray,
    k: int,
    group: int = 32,
    valid=None,
    gather: str = "auto",
):
    """Exact top-k over the last axis via group-max candidate selection.

    A full sort of a [Q, B] block is the throughput killer on TPU (top_k
    lowers to sort). Instead:

      1. reduce per-``group`` maxima (one cheap VPU pass): [Q, B/G];
      2. stable top-k of the maxima picks candidate groups -- any global
         top-k element must live in one of the k max-ranked groups (k
         groups with larger-or-earlier maxima would otherwise each hold an
         element ranked above it);
      3. sort the selected group ids ascending so gathered candidates stay
         in global index order (preserving the (score desc, index asc) tie
         rule under stable top-k);
      4. gather the candidate groups with a one-hot batched matmul -- the
         MXU eats this, ~2x faster end-to-end than take_along_axis's dynamic
         gather on TPU, and numerically exact (a single 1.0 term per sum) --
         then take the final exact top-k of the k*G candidates.

    ``valid``: optional traced count of valid columns. Instead of masking
    the full [Q, B] score block (an extra memory pass), fully-invalid
    groups are masked at the [Q, B/G] group level and the one straddling
    group's tail is masked at the [Q, k+1, G] candidate level; one extra
    candidate group absorbs a possibly-spurious straddle selection, keeping
    the result exact.

    Work drops from O(B log B) sort to O(B) reduce + O(kG log kG) sort.
    G=32 measured fastest on v5e for k=100 over 100k rows (the final
    payload-carrying sort dominates; smaller G shrinks it, below 32 the
    group-max reduce and wider group top-k win back the cost).
    """
    qn, b = scores.shape
    n_groups = -(-b // group)
    if b <= group or n_groups <= k + 1:
        if valid is not None:
            col = jax.lax.broadcasted_iota(jnp.int32, (qn, b), 1)
            scores = jnp.where(col < valid, scores, NEG_INF)
        return jax.lax.top_k(scores, min(k, b))
    pad = n_groups * group - b
    if pad:
        scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=NEG_INF)
    s3 = scores.reshape(qn, n_groups, group)
    group_max = jnp.max(s3, axis=-1)  # [Q, n_groups]
    return select_from_groupmax(s3, group_max, k, group, valid, gather=gather)


# Widths at or below this go straight to lax.top_k; above it, group-prune
# recursively. 4096 keeps every payload sort narrow while the group-max
# reduce + one-hot gather overhead stays negligible next to the sort saved.
_TOPK_BASE_WIDTH = 4096

# Multi-block scans up to this many blocks unroll statically (compile time
# grows with the unroll; beyond it lax.scan keeps one compiled body).
_UNROLL_MAX_BLOCKS = 8


def grouped_topk_last_axis(
    x: jnp.ndarray, k: int, group: int = 32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over the last axis with RECURSIVE group pruning.

    Same contract as ``jax.lax.top_k`` (values desc, stable lower-index-first
    on ties) but the O(W log W) payload sort is replaced by: per-group maxima
    (VPU reduce), a recursive top-k over the W/G maxima, a one-hot MXU gather
    of the k selected groups, and a final k*G-wide sort. Every level's sort
    is at most max(_TOPK_BASE_WIDTH, k*G) wide no matter how wide W grows --
    at the reference's block sizes (524k rows => 16k groups at G=32,
    run_convdr_inference.py:159, README.md:216) the single-level selection's
    16k-wide payload sort and [Q, k, 16k] one-hot gather dominated the whole
    search; recursion caps both.

    Exactness: any top-k element lives in one of the k top-ranked groups
    (k groups with larger-or-tied-earlier maxima would otherwise each hold
    an element ranked above it), so pruning never drops a needed candidate;
    ascending-sorted group ids + stable sorts at every level preserve the
    global (score desc, index asc) tie order.
    """
    qn, w = x.shape
    n_groups = -(-w // group)
    if w <= max(_TOPK_BASE_WIDTH, 2 * k) or n_groups <= k:
        return jax.lax.top_k(x, k)
    pad = n_groups * group - w
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=NEG_INF)
    x3 = x.reshape(qn, n_groups, group)
    gmax = jnp.max(x3, axis=-1)
    _, gsel = grouped_topk_last_axis(gmax, min(k, n_groups), group)
    gsel = jnp.sort(gsel, axis=-1)  # ascending group ids => global order
    cand = _onehot_gather_groups(x3, gsel)  # [Q, k, G]
    top_s, sel = grouped_topk_last_axis(cand.reshape(qn, -1), k, group)
    grp_ids = jnp.take_along_axis(gsel, sel // group, axis=1)
    top_i = grp_ids * group + sel % group
    return top_s, top_i


def _onehot_gather_groups(s3: jnp.ndarray, gsel: jnp.ndarray) -> jnp.ndarray:
    """Gather score groups ``s3[q, gsel[q, j], :]`` via a one-hot batched
    matmul -- the MXU eats this, ~2x faster end-to-end than
    take_along_axis's dynamic gather on TPU, and numerically exact (a single
    1.0 term per sum). HIGHEST precision: the default TPU matmul rounds
    operands to bf16, which would corrupt the gathered f32 scores."""
    n_groups = s3.shape[1]
    onehot = jax.nn.one_hot(gsel, n_groups, dtype=jnp.float32)  # [Q, kg, NG]
    return jnp.einsum(
        "qkn,qng->qkg",
        onehot,
        s3,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _gather_candidate_groups(s3, gsel, group, gather: str):
    """Gather s3[q, gsel[q, j], :] -> [Q, kg, G] via the requested impl.

    ``auto`` = the one-hot MXU gather. The Pallas DMA containing-tile
    gather (``dma``, :func:`convdr_tpu.ops.pallas_search.dma_gather_groups`)
    moves ~20x less HBM but measured SLOWER in-path on v5e (1M rows, Q=512:
    48.6 ms full search vs 46.7 ms one-hot; isolated per-block 3.6 vs
    3.2-5.6 ms) -- the pallas_call is a fusion/overlap barrier while the
    einsum pipelines with the surrounding selection. Kept as an exact,
    tested opt-in; see the kernel docstring for the close-out analysis.
    """
    qn, n_groups, g = s3.shape
    if gather not in ("auto", "onehot", "dma"):
        raise ValueError(f"unknown gather impl {gather!r}")
    if gather == "dma":
        from convdr_tpu.ops.pallas_search import dma_gather_groups

        return dma_gather_groups(s3.reshape(qn, n_groups * g), gsel, group=g)
    return _onehot_gather_groups(s3, gsel)


def select_from_groupmax(
    s3: jnp.ndarray,
    group_max: jnp.ndarray,
    k: int,
    group: int,
    valid=None,
    *,
    gather: str = "auto",
):
    """Candidate selection given grouped scores + group maxima.

    Shared tail of the XLA and Pallas search paths: stable top-k of the
    maxima picks candidate groups (+1 absorber when validity-masked), group
    ids sort ascending to preserve the global tie order, a one-hot MXU
    matmul or Pallas DMA tile copy gathers candidates (``gather``:
    auto/onehot/dma), and indices are recovered arithmetically from the
    final stable top-k's positions. Both the group-max top-k and the final
    candidate top-k recurse through :func:`grouped_topk_last_axis`, so
    selection sorts stay narrow even at 500k+-row blocks.
    """
    qn, n_groups, _g = s3.shape
    k_grp = k
    if valid is not None:
        group_start = jnp.arange(n_groups, dtype=jnp.int32) * group
        group_max = jnp.where(group_start[None, :] < valid, group_max, NEG_INF)
        k_grp = k + 1  # absorb a spurious straddling-group selection
    k_grp = min(k_grp, n_groups)
    _, gsel = grouped_topk_last_axis(group_max, k_grp, group)
    gsel = jnp.sort(gsel, axis=-1)  # ascending group ids => global order
    cand = _gather_candidate_groups(s3, gsel, group, gather)  # [Q, kg, G]
    if valid is not None:
        cand_idx = gsel[:, :, None] * group + jnp.arange(
            group, dtype=jnp.int32
        )[None, None, :]
        cand = jnp.where(cand_idx < valid, cand, NEG_INF)
    top_s, sel = grouped_topk_last_axis(cand.reshape(qn, -1), k, group)
    # Recover global indices arithmetically from the flat candidate position
    # (sel = grp_slot * G + offset) -- a [Q, k]-sized gather into gsel
    # instead of materializing and gathering a [Q, kG] index matrix (the
    # naive path doubles end-to-end search time on TPU).
    grp_ids = jnp.take_along_axis(gsel, sel // group, axis=1)
    top_i = grp_ids * group + sel % group
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


_PRECISIONS = {
    "default": None,                       # bf16 operands (fastest, ~1e-3 err)
    "high": jax.lax.Precision.HIGH,        # bf16x3 (~2x slower, ~2e-3 err*)
    "highest": jax.lax.Precision.HIGHEST,  # full f32 (oracle bit-exact)
}
# *HIGH's error figure measured on v5e for 768-d dot products; despite more
# passes than default its worst-case error was similar there -- only
# "highest" preserved oracle-exact ordering.


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_rows", "precision", "group", "gather"),
)
def flat_ip_topk(
    queries: jnp.ndarray,
    passages: jnp.ndarray,
    k: int,
    *,
    block_rows: int = 65536,
    valid_rows=-1,
    precision: str = "highest",
    group: int = 32,
    gather: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact FlatIP top-k: scan over row blocks of the passage matrix.

    queries  [Q, D] (any float dtype; promoted to the matmul dtype)
    passages [N, D] (bf16/f32 storage; fp32 accumulation on the MXU).
        int8 passages select the SQ8 path (``ops/quant.py``): queries must
        then be the int-valued f32 rows from ``quantize_queries`` and the
        returned scores are unscaled integer inner products — bit-exact vs
        :func:`convdr_tpu.ops.quant.int8_topk_oracle` (``precision`` is
        ignored; the default-precision bf16 matmul is already integer-exact
        at dim <= 1040).
    valid_rows: logical corpus size if ``passages`` is padded (-1 = N).
        May be a traced scalar (used by the sharded search where each shard's
        valid row count is data-dependent).

    Memory: one [Q, block_rows] fp32 score block + O(Q*k) running state.

    ``precision`` trades exactness for speed: "highest" (default) is
    oracle-bit-exact; "high"/"default" run the MXU at bf16x3/bf16 (up to
    ~1.7x faster matmul, scores off by ~2e-3 relative -- close ranks can
    swap; recall@k sets stay near-identical).
    """
    if precision not in _PRECISIONS:
        raise ValueError(
            f"unknown matmul precision {precision!r}; choose one of "
            f"{sorted(_PRECISIONS)} (SearchConfig.matmul_precision)"
        )
    qn, d = queries.shape
    n = passages.shape[0]
    # A concrete negative valid_rows means "all rows valid": skip masking
    # entirely (saves a memory pass per block). A TRACED valid_rows (e.g.
    # the sentinel forwarded through an outer jit) resolves the sentinel at
    # runtime instead.
    fully_valid = isinstance(valid_rows, int) and valid_rows < 0
    if fully_valid:
        valid = None
    else:
        valid_arr = jnp.asarray(valid_rows)
        valid = jnp.where(valid_arr < 0, n, valid_arr)
    k_eff = min(k, n)
    q = queries

    block_rows = min(block_rows, n)  # don't pad tiny corpora to a full block
    nblocks = -(-n // block_rows)
    pad = nblocks * block_rows - n
    if pad:
        passages = jnp.pad(passages, ((0, pad), (0, 0)))
        if valid is None:
            valid = jnp.asarray(n)  # zero-pad rows must not surface

    int8_storage = passages.dtype == jnp.int8

    def block_topk(block, base):
        if int8_storage:
            # SQ8 path (ops/quant.py): operands are int8 / int-valued f32.
            # Every int8 value and every product of two is exactly
            # representable in bf16, and partial sums stay below 2^24 at
            # dim<=1040, so this DEFAULT-precision bf16 matmul is bit-exact
            # integer arithmetic — HIGHEST would only add MXU passes for
            # zero accuracy. (A native s8xs8->s32 dot_general is NOT used:
            # XLA scalarizes it on TPU, ~1600x slower than this.)
            scores = jnp.dot(
                q.astype(jnp.bfloat16),
                block.astype(jnp.bfloat16).T,
                preferred_element_type=jnp.float32,
            )  # [Q, block_rows] integer-valued fp32
        else:
            # HIGHEST: full-f32 MXU passes. The default TPU precision
            # computes in bf16 (max relative score error ~1e-3), which
            # reorders close candidates and breaks bit-exact recall parity
            # with FlatIP; at retrieval sizes the matmul is HBM-bound so
            # HIGHEST costs ~6%.
            scores = jnp.dot(
                q,
                block.T,
                preferred_element_type=jnp.float32,
                precision=_PRECISIONS[precision],
            )  # [Q, block_rows] fp32
        block_valid = None if valid is None else valid - base
        blk_s, blk_i = _chunked_topk(
            scores, min(k_eff, block_rows), group=group, valid=block_valid,
            gather=gather,
        )
        return blk_s, blk_i + base

    if nblocks == 1:
        out_s, out_i = block_topk(passages, 0)
    elif nblocks <= _UNROLL_MAX_BLOCKS:
        # Static unroll: lax.scan's per-iteration dynamic slice of the
        # blocks array can materialize a copy of each (GB-scale) block in
        # HBM, while static slices read the original buffer in place (the
        # scan path measured ~6 ms slower than an unrolled 2-block loop at
        # 1M rows, scripts/bench_stages.py stage F vs E).
        out_s = out_i = None
        for b in range(nblocks):
            blk_s, blk_i = block_topk(
                passages[b * block_rows : (b + 1) * block_rows], b * block_rows
            )
            if out_s is None:
                out_s, out_i = blk_s, blk_i
                if out_s.shape[1] < k_eff:
                    # k > block_rows: widen the running list to k_eff so
                    # later merges can reach it (the scan path's carry is
                    # born k_eff wide; without this, merge_topk's
                    # lax.top_k(cat, k_eff) would see cat < k_eff and
                    # crash). No-op at normal retrieval sizes.
                    pad = k_eff - out_s.shape[1]
                    out_s = jnp.pad(
                        out_s, ((0, 0), (0, pad)), constant_values=NEG_INF
                    )
                    out_i = jnp.pad(
                        out_i, ((0, 0), (0, pad)), constant_values=-1
                    )
            else:
                out_s, out_i = merge_topk(out_s, out_i, blk_s, blk_i, k_eff)
    else:
        blocks = passages.reshape(nblocks, block_rows, d)
        init_s = jnp.full((qn, k_eff), NEG_INF, jnp.float32)
        init_i = jnp.full((qn, k_eff), -1, jnp.int32)

        def step(carry, inputs):
            run_s, run_i = carry
            block, block_idx = inputs
            blk_s, blk_i = block_topk(block, block_idx * block_rows)
            # Running list first => earlier blocks win ties (reference
            # semantics).
            new_s, new_i = merge_topk(run_s, run_i, blk_s, blk_i, k_eff)
            return (new_s, new_i), None

        (out_s, out_i), _ = jax.lax.scan(
            step,
            (init_s, init_i),
            (blocks, jnp.arange(nblocks, dtype=jnp.int32)),
        )
    if k_eff < k:
        out_s = jnp.pad(out_s, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF)
        out_i = jnp.pad(out_i, ((0, 0), (0, k - k_eff)), constant_values=-1)
    # Padded/invalid slots report index -1.
    out_i = jnp.where(out_s == NEG_INF, -1, out_i)
    return out_s, out_i
