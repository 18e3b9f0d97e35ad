"""Pallas TPU kernel: fused inner-product scores + group-max epilogue.

The XLA search path (:mod:`convdr_tpu.ops.exact_search`) materializes the
[Q, B] score block in HBM, then re-reads it to reduce per-group maxima --
one full extra HBM pass over the (large) score matrix. This kernel fuses the
reduction into the matmul epilogue: each grid step loads one passage tile
into VMEM, runs the MXU matmul at f32 precision, writes the score tile once,
and emits the [Q, T/G] group maxima from registers/VMEM without touching HBM
again. Downstream candidate selection (group top-k, one-hot gather, final
exact top-k) stays in XLA where sorts are already tuned.

Layout per grid step i (tile T rows of the passage matrix):
  q     [Q, D]   VMEM-resident across steps (Q <= ~512, D = 768: ~1.5 MB)
  p_i   [T, D]   VMEM tile (T = 1024 f32: 3 MB; Pallas double-buffers in/out blocks, so T=2048 f32 overflows the 16 MB VMEM)
  (compiled path uses G=128: group reduction along the 128-lane axis is
  the only shape cast Mosaic accepts here; gmax accumulates in a resident
  VMEM block)
  s_i   [Q, T]   score tile -> HBM output column block
  g_i   [Q, T/G] group maxima -> HBM output column block

Exactness: f32 accumulation via ``preferred_element_type`` and HIGHEST
precision (see exact_search.py for why bf16 default breaks FlatIP parity).
The in-kernel dot accumulates in a different order than XLA's matmul, so
individual scores can differ by ~1 ulp from the numpy oracle; measured on
v5e over 512x100k, the recall@100 SET is identical in all rows with only
O(1e-5)-gap adjacent-rank swaps.

Measured v5e (512 queries x 100k x 768, top-100): this fused path runs at
~7.4 ms/search vs ~4.1 ms for the XLA path in exact_search.py -- the fusion
saves one HBM score pass but the G=128 selection (12.8k-wide payload sort)
and the small T=512 tile (VMEM double-buffering limits) cost more than the
saved pass. The XLA path therefore remains the production default.

TILE-SWEEP VERDICT (round 3, closes the round-2 open item;
scripts/bench_fused_tiles.py, operands as arguments). 524288 x 768,
Q=512, top-100, HIGHEST, production block_rows:

    fused f32  T=256 25.6 ms | T=512 24.3 ms | T=1024 VMEM-overflow
    fused bf16 T=512 24.3 ms | T=1024/2048 VMEM-overflow
    XLA   f32 storage 24.1 ms | XLA bf16 storage 17.4 ms

T=512 is the best compilable tile (double-buffered in/out blocks cap the
budget; see the VMEM table in bench_fused_tiles.py). At its best the
fused kernel only TIES the XLA f32 path -- and the in-kernel dot promotes
bf16 tiles to f32, so it cannot exploit the mixed-precision win that
makes XLA bf16-STORAGE the fastest exact config (HIGHEST on f32 x bf16
needs half the MXU passes of f32 x f32; 1M rows: 33.9 vs 47.3 ms, 1.40x).
Sweep finished, kernel stays a tested building block, XLA stays default.

STREAMING VERDICT (round 2, closes VERDICT r1 item 3). The fully streaming
variant below (``streaming_flat_ip_topk``: scores never reach HBM; group
maxima in one pass, candidate groups re-scored in a second pass) is exact
(recall-set parity vs the XLA path at 524k rows on-chip) but LOSES on v5e
at every measured operating point:

    524288 x 768 f32, top-100, HIGHEST precision
      Q=512: streaming 117 ms   vs XLA flat_ip_topk 23.9 ms
      Q=512 (query_tile=128): 116 ms; query_tile=256 exceeds VMEM
      Q=64 : streaming 16.8 ms  vs XLA  6.8 ms

Roofline explanation: at HIGHEST precision the score matmul costs ~12.5 ms
per 512-query block (412 GFLOP at the ~33 TF/s f32 effective MXU rate).
The [Q, B] score traffic streaming avoids is only ~3 x 1 GB = ~3.7 ms of
HBM time at Q=512 (write + gmax read + gather read) -- and XLA fuses part
of that. Avoiding <4 ms of HBM by paying a second >=12.5 ms matmul pass
(pass B re-scores selected groups against the full corpus) cannot win; at
small Q both passes shrink together, and the Mosaic in-kernel HIGHEST
matmul additionally sustains ~2-3x less throughput than XLA's tuned
emitter. A streaming design only becomes interesting at default (bf16)
matmul precision -- ~8x cheaper FLOPs flip the ratio -- but that mode
breaks the oracle-exactness contract this engine is specified for
(exact_search.py), so the XLA path remains the production default and the
streaming kernels are kept as exact, tested building blocks.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convdr_tpu.ops.exact_search import (
    NEG_INF,
    grouped_topk_last_axis,
    select_from_groupmax,
)


def _score_groupmax_kernel(q_ref, p_ref, s_ref, g_ref, *, group: int):
    # Promote a bf16 passage tile to f32 in registers: queries stay f32 so
    # score accumulation matches the XLA path (demoting queries to the
    # storage dtype would reorder close candidates).
    scores = jax.lax.dot_general(
        q_ref[:],
        p_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [Q, T]
    s_ref[:] = scores
    qn, t = scores.shape
    # G = 128 groups are lane-native: [Q, T] -> [Q, T/128, 128], reduce the
    # lane axis (Mosaic rejects sub-lane shape casts like G=16/32). The
    # per-tile maxima land in a [n_tiles, Q, T/G] output (tile-major) so
    # each block store is fully aligned; the caller transposes the tiny
    # result back to [Q, NG].
    gpt = t // group
    g_ref[0] = jnp.max(scores.reshape(qn, gpt, group), axis=-1)


@functools.partial(
    jax.jit, static_argnames=("group", "tile_rows", "interpret")
)
def fused_scores_groupmax(
    queries: jnp.ndarray,
    passages: jnp.ndarray,
    *,
    group: int = 128,
    tile_rows: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(scores [Q, N] f32, group maxima [Q, N/group] f32).

    N must be a multiple of ``tile_rows`` (callers pad rows; padded rows are
    masked downstream via valid-row logic). ``interpret=True`` runs the
    kernel in interpreter mode for CPU-based tests.
    """
    qn, d = queries.shape
    n = passages.shape[0]
    if n % tile_rows:
        raise ValueError(f"rows {n} not a multiple of tile_rows {tile_rows}")
    if tile_rows % group:
        raise ValueError(f"tile_rows {tile_rows} not a multiple of group {group}")
    n_tiles = n // tile_rows
    groups_per_tile = tile_rows // group
    # Mosaic supports only lane-width (128) contiguous group reductions in
    # this kernel; interpreter mode (CPU tests) has no such constraint.
    if not interpret and group != 128:
        raise ValueError("the compiled TPU kernel requires group=128")

    kernel = functools.partial(_score_groupmax_kernel, group=group)
    scores, gmax = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((qn, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((qn, tile_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, qn, groups_per_tile),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qn, n), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, qn, groups_per_tile), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * qn * n * d,
            bytes_accessed=(
                qn * d * 4 + n * d * passages.dtype.itemsize + qn * n * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries.astype(jnp.float32), passages)
    # [n_tiles, Q, gpt] -> [Q, n_tiles*gpt]; tiny (Q x NG) so the transpose
    # is negligible next to the score matrix.
    gmax = jnp.transpose(gmax, (1, 0, 2)).reshape(qn, n // group)
    return scores, gmax


@functools.partial(
    jax.jit, static_argnames=("k", "group", "tile_rows", "interpret")
)
def pallas_flat_ip_topk(
    queries: jnp.ndarray,
    passages: jnp.ndarray,
    k: int,
    *,
    group: int = 128,
    tile_rows: int = 512,
    valid_rows=-1,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact FlatIP top-k with the fused Pallas scoring kernel.

    Same contract as :func:`convdr_tpu.ops.exact_search.flat_ip_topk`
    (score desc, low index first; -1 padding) for row counts that are a
    multiple of ``tile_rows``. Candidate selection reuses the stable-top-k
    machinery in XLA.
    """
    qn, d = queries.shape
    n = passages.shape[0]
    pad = (-n) % tile_rows
    fully_valid = isinstance(valid_rows, int) and valid_rows < 0
    if fully_valid:
        valid = None
    else:
        valid_arr = jnp.asarray(valid_rows)
        valid = jnp.where(valid_arr < 0, n, valid_arr)
    if pad:
        passages = jnp.pad(passages, ((0, pad), (0, 0)))
        if valid is None:
            valid = jnp.asarray(n)
    n_padded = passages.shape[0]
    scores, gmax = fused_scores_groupmax(
        queries, passages, group=group, tile_rows=tile_rows, interpret=interpret
    )
    n_groups = n_padded // group
    k_eff = min(k, n, n_groups * group)

    s3 = scores.reshape(qn, n_groups, group)
    top_s, top_i = select_from_groupmax(s3, gmax, k_eff, group, valid)
    if k_eff < k:
        top_s = jnp.pad(top_s, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF)
        top_i = jnp.pad(top_i, ((0, 0), (0, k - k_eff)), constant_values=-1)
    top_i = jnp.where(top_s == NEG_INF, -1, top_i)
    return top_s, top_i


# ---------------------------------------------------------------------------
# DMA candidate gather: copy only the containing (8,128) tiles
# ---------------------------------------------------------------------------
def _dma_gather_kernel(tcol_ref, *refs, k_block: int):
    """Copy one score row slice per selected group out of the k_block tiles
    the BlockSpec machinery DMA'd for this step.

    ``refs`` = k_block aliased views of the score matrix (one (8, 128) tile
    each, at data-dependent tile columns) + the (1, k_block, 128) output
    block. The query's row within its 8-row tile band is dynamic
    (program_id % 8) -- a dynamic SUBLANE index, which Mosaic supports,
    unlike the dynamic sub-lane-width slice that sank the fine-grained
    per-(query,group) copy design (see docstring of
    :func:`dma_gather_groups`).
    """
    in_refs, out_ref = refs[:-1], refs[-1]
    qmod = pl.program_id(0) % 8
    for j, in_ref in enumerate(in_refs):
        row = in_ref[pl.ds(qmod, 1), :]  # [1, 128], dynamic sublane
        out_ref[0:1, j : j + 1, :] = row.reshape(1, 1, 128)


@functools.partial(
    jax.jit, static_argnames=("group", "k_block", "interpret")
)
def dma_gather_groups(
    scores: jnp.ndarray,
    gsel: jnp.ndarray,
    *,
    group: int = 32,
    k_block: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Gather candidate score groups by DMA-ing only their containing tiles.

    ``scores`` [Q, B] f32; ``gsel`` [Q, K] int32 group ids (< B // group).
    Returns [Q, K, group] f32 with row (q, k) = scores[q, g*group:(g+1)*group]
    for g = gsel[q, k] -- the same contract as the one-hot gather inside
    :func:`convdr_tpu.ops.exact_search.select_from_groupmax`, which reads the
    ENTIRE score matrix through the MXU to move K*group values per query
    (~2 GB of HBM traffic + a 6-pass HIGHEST matmul at the 524288-row block
    size). Here each candidate costs one (8, 128)-tile DMA (4 KB), ~200 MB
    total at Q=512/K=101 -- ~20x less traffic and zero MXU time.

    MEASURED VERDICT (round 3, v5e, closes VERDICT r2 #1): compiles, exact
    (== one-hot bit-for-bit on-chip), but LOSES in production context --
    full 1M search 48.6 ms (dma) vs 46.7 ms (one-hot); isolated per
    524288-row block 3.64 ms vs 3.2 ms; k_block 8/16/32 sweep = 3.64 /
    3.83 / 4.15 ms (deeper blocks pay more padded copies, not more
    overlap). Effective DMA throughput is ~59 GB/s -- 4 KB descriptors are
    latency/issue-bound, not bandwidth-bound -- so the 20x traffic saving
    buys only ~1.8x kernel-local time vs the einsum's ~2.4 ms HBM floor,
    and the pallas_call is additionally a fusion/overlap barrier between
    the selection and final-top-k stages that XLA otherwise pipelines.
    Default stays one-hot (``gather="auto"``); this kernel ships as the
    exact opt-in ``gather="dma"`` (scripts/bench_gather.py reproduces).

    Mosaic constrains HBM->VMEM slices to (8, 128)-tile granularity (a
    1 x group slice cannot compile: "Slice shape along dimension 0 must be
    aligned to tiling (8)"). So the kernel copies the CONTAINING tile --
    rows (q//8)*8..+8, lanes (g*group//128)*128..+128, a data-dependent
    block index served by scalar-prefetched tile columns -- extracts the
    query's row (dynamic sublane: supported), writes the 128-lane superlane
    to the output, and the group-of-``group`` sub-slice is selected OUTSIDE
    the kernel by a tiny [Q, K, 128/group, group] take_along_axis (dynamic
    LANE slicing, the remaining Mosaic blocker, is never needed).

    Constraints: Q % 8 == 0, B % 128 == 0, group divides 128, f32 scores.
    """
    qn, b = scores.shape
    k = gsel.shape[1]
    if qn % 8:
        raise ValueError(f"queries {qn} not a multiple of the 8-row tile")
    if b % 128:
        raise ValueError(f"columns {b} not a multiple of the 128-lane tile")
    if 128 % group:
        raise ValueError(f"group {group} must divide 128")
    if scores.dtype != jnp.float32:
        raise ValueError("scores must be f32 (the search score dtype)")
    groups_per_lane = 128 // group
    k_pad = (-k) % k_block
    padded = jnp.pad(gsel, ((0, 0), (0, k_pad))) if k_pad else gsel
    kp = k + k_pad
    tile_cols = (padded // groups_per_lane).astype(jnp.int32)

    def in_index(j):
        return lambda q, kb, tcol: (q // 8, tcol[q, kb * k_block + j])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(qn, kp // k_block),
        in_specs=[
            pl.BlockSpec((8, 128), in_index(j), memory_space=pltpu.VMEM)
            for j in range(k_block)
        ],
        out_specs=pl.BlockSpec(
            (1, k_block, 128), lambda q, kb, tcol: (q, kb, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out128 = pl.pallas_call(
        functools.partial(_dma_gather_kernel, k_block=k_block),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((qn, kp, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=qn * kp * (8 * 128 + 128) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(tile_cols, *([scores] * k_block))
    out4 = out128[:, :k].reshape(qn, k, groups_per_lane, group)
    sub = (gsel % groups_per_lane).astype(jnp.int32)
    return jnp.take_along_axis(
        out4, sub[:, :, None, None], axis=2
    )[:, :, 0, :]


# ---------------------------------------------------------------------------
# Streaming search: the [Q, B] score matrix never touches HBM
# ---------------------------------------------------------------------------
def _groupmax_only_kernel(q_ref, p_ref, g_ref, *, group: int):
    """Score tile in VMEM -> per-group maxima; scores are never stored."""
    scores = jax.lax.dot_general(
        q_ref[:],
        p_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [Q, T]
    qn, t = scores.shape
    g_ref[0] = jnp.max(scores.reshape(qn, t // group, group), axis=-1)


@functools.partial(jax.jit, static_argnames=("group", "tile_rows", "interpret"))
def streaming_groupmax(
    queries: jnp.ndarray,
    passages: jnp.ndarray,
    *,
    group: int = 128,
    tile_rows: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Group maxima [Q, N/group] with ONE HBM pass over the passages.

    Pass A of the streaming search: unlike :func:`fused_scores_groupmax`,
    the [Q, B] score matrix is never written to HBM -- only the [Q, N/G]
    maxima (a 1/G fraction) leave the chip. This is the HBM-minimal scoring
    pass the round-1 kernel's docstring promised (VERDICT r1 N1).

    VMEM constraint (measured on v5e): at the standard Q=512 operating
    point, ``tile_rows`` must be <= 512 -- the [Q, tile] f32 score tile plus
    the passage tile overflow the 16 MB scoped VMEM limit at tile_rows=1024.
    The default is therefore 512; raise it only for small query batches.
    """
    qn, d = queries.shape
    n = passages.shape[0]
    if n % tile_rows:
        raise ValueError(f"rows {n} not a multiple of tile_rows {tile_rows}")
    if tile_rows % group:
        raise ValueError(f"tile_rows {tile_rows} not a multiple of group {group}")
    if not interpret and group != 128:
        raise ValueError("the compiled TPU kernel requires group=128")
    n_tiles = n // tile_rows
    gpt = tile_rows // group
    gmax = pl.pallas_call(
        functools.partial(_groupmax_only_kernel, group=group),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((qn, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, qn, gpt), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, qn, gpt), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * qn * n * d,
            bytes_accessed=qn * d * 4
            + n * d * passages.dtype.itemsize
            + qn * (n // group) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries.astype(jnp.float32), passages)
    return jnp.transpose(gmax, (1, 0, 2)).reshape(qn, n // group)


def _extract_candidates_kernel(
    q_ref, gsel_ref, p_ref, out_ref, *, group: int, gpt: int
):
    """Recompute the score tile and scatter selected groups' scores into
    their [Q, kg, G] candidate slots. Each global group lives in exactly one
    tile, so zero-init + add accumulates every slot's scores exactly once
    (a single matching 1.0 term per sum -- numerically exact)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tile_gids = j * gpt + jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, gpt), dimension=2
    )
    match = (gsel_ref[:][:, :, None] == tile_gids).astype(jnp.float32)

    @pl.when(jnp.any(match > 0))
    def _():
        scores = jax.lax.dot_general(
            q_ref[:],
            p_ref[:].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [Qt, T]
        qn, t = scores.shape
        s3 = scores.reshape(qn, gpt, group)
        contrib = jax.lax.dot_general(
            match,
            s3,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [Qt, kg, G]
        out_ref[:] = out_ref[:] + contrib


@functools.partial(
    jax.jit,
    static_argnames=("group", "tile_rows", "query_tile", "interpret"),
)
def extract_candidate_scores(
    queries: jnp.ndarray,
    passages: jnp.ndarray,
    gsel: jnp.ndarray,
    *,
    group: int = 128,
    tile_rows: int = 1024,
    query_tile: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pass B of the streaming search: re-score ONLY the selected groups.

    Returns cand [Q, kg, group] f32 where cand[q, j] = scores of group
    ``gsel[q, j]``. HBM traffic: passages re-read ceil(Q/query_tile) times
    plus the [Q, kg, G] output -- no [Q, B] score materialization. The
    candidate block stays VMEM-resident across the inner passage-tile loop
    (grid is query-tile-major), so it is written to HBM exactly once per
    query tile.
    """
    qn, d = queries.shape
    n = passages.shape[0]
    kg = gsel.shape[1]
    if n % tile_rows or tile_rows % group:
        raise ValueError("shape misalignment")
    if qn % query_tile:
        raise ValueError(f"queries {qn} not a multiple of query_tile {query_tile}")
    if not interpret and group != 128:
        raise ValueError("the compiled TPU kernel requires group=128")
    n_tiles = n // tile_rows
    gpt = tile_rows // group
    q_tiles = qn // query_tile
    cand = pl.pallas_call(
        functools.partial(_extract_candidates_kernel, group=group, gpt=gpt),
        grid=(q_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (query_tile, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (query_tile, kg), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_rows, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (query_tile, kg, group),
            lambda i, j: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((qn, kg, group), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * qn * n * d + 2 * qn * kg * gpt * group * n_tiles,
            bytes_accessed=q_tiles * n * d * passages.dtype.itemsize
            + qn * d * 4
            + qn * kg * group * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries.astype(jnp.float32), gsel.astype(jnp.int32), passages)
    return cand


@functools.partial(
    jax.jit,
    static_argnames=("k", "group", "tile_rows", "query_tile", "interpret"),
)
def streaming_flat_ip_topk(
    queries: jnp.ndarray,
    passages: jnp.ndarray,
    k: int,
    *,
    group: int = 128,
    tile_rows: int = 1024,
    query_tile: int = 128,
    valid_rows=-1,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact FlatIP top-k that never materializes the [Q, B] score matrix.

    Three stages: (A) :func:`streaming_groupmax` -- one passage pass, only
    [Q, N/G] maxima to HBM; (B) recursive group selection on the maxima
    (tiny, XLA); (C) :func:`extract_candidate_scores` -- re-score only the
    selected groups (second passage pass), then the exact final top-k over
    [Q, kg*G] candidates. Same contract as ``flat_ip_topk``.

    The FAISS equivalent is the fused GPU k-selection behind ``index.search``
    (/root/reference/drivers/run_convdr_inference.py:180-182). Total HBM
    traffic: (1 + ceil(Q/query_tile)) passage passes + O(Q*N/G); the
    score-materializing path moves ~3 extra [Q, N] f32 passes instead --
    streaming wins when Q is small relative to 2*D/bytes_per_elt (see
    PARITY.md roofline notes).
    """
    qn, d = queries.shape
    n = passages.shape[0]
    pad_rows = (-n) % tile_rows
    fully_valid = isinstance(valid_rows, int) and valid_rows < 0
    if fully_valid:
        valid = None
    else:
        valid_arr = jnp.asarray(valid_rows)
        valid = jnp.where(valid_arr < 0, n, valid_arr)
    if pad_rows:
        passages = jnp.pad(passages, ((0, pad_rows), (0, 0)))
        if valid is None:
            valid = jnp.asarray(n)
    pad_q = (-qn) % query_tile
    if pad_q:
        queries = jnp.pad(queries, ((0, pad_q), (0, 0)))
    n_padded = passages.shape[0]
    n_groups = n_padded // group
    k_eff = min(k, n)

    gmax = streaming_groupmax(
        queries, passages, group=group, tile_rows=tile_rows, interpret=interpret
    )  # [Q', NG]
    k_grp = min(k_eff + (0 if valid is None else 1), n_groups)
    if valid is not None:
        group_start = jnp.arange(n_groups, dtype=jnp.int32) * group
        gmax = jnp.where(group_start[None, :] < valid, gmax, NEG_INF)
    _, gsel = grouped_topk_last_axis(gmax, k_grp, 32)
    gsel = jnp.sort(gsel, axis=-1)

    cand = extract_candidate_scores(
        queries,
        passages,
        gsel,
        group=group,
        tile_rows=tile_rows,
        query_tile=query_tile,
        interpret=interpret,
    )  # [Q', kg, G]
    if valid is not None:
        cand_idx = gsel[:, :, None] * group + jnp.arange(
            group, dtype=jnp.int32
        )[None, None, :]
        cand = jnp.where(cand_idx < valid, cand, NEG_INF)
    qn_p = cand.shape[0]
    top_s, sel = grouped_topk_last_axis(cand.reshape(qn_p, -1), k_eff, 32)
    grp_ids = jnp.take_along_axis(gsel, sel // group, axis=1)
    top_i = grp_ids * group + sel % group
    if pad_q:
        top_s, top_i = top_s[:qn], top_i[:qn]
    if k_eff < k:
        top_s = jnp.pad(top_s, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF)
        top_i = jnp.pad(top_i, ((0, 0), (0, k - k_eff)), constant_values=-1)
    top_i = jnp.where(top_s == NEG_INF, -1, top_i)
    return top_s, top_i
