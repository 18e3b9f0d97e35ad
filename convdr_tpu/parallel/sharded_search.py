"""Mesh-sharded exact retrieval: local Pallas/XLA top-k + ICI merge collective.

The reference shards its flat index across GPUs inside FAISS
(run_convdr_inference.py:355-368) and merges per-*block* top-N lists in
Python (:217-229). Here the passage-embedding matrix is row-sharded over the
``index`` mesh axis (HBM-resident), every device searches its shard with the
blocked exact kernel, and the per-shard (score, global_index) top-k lists are
merged with an ``all_gather`` over ICI followed by a stable on-device top-k —
the "top-k merge collective" of SURVEY.md §2.3.

Tie semantics match the single-device kernel: shard 0 holds the lowest
global rows and appears first in the gathered candidate list, so equal
scores resolve to the lower passage index, bit-identical to the oracle.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from convdr_tpu.ops.exact_search import flat_ip_topk, NEG_INF


def sharded_flat_ip_topk(
    mesh: Mesh,
    queries: jnp.ndarray,
    passage_shards: jnp.ndarray,
    k: int,
    *,
    valid_rows: int = -1,
    block_rows: int = 65536,
    axis: str = "index",
    precision: str = "highest",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Search a row-sharded passage matrix; returns replicated (scores, idx).

    queries        [Q, D]             replicated
    passage_shards [N_padded, D]      sharded over ``axis`` on dim 0
    valid_rows     logical corpus size before padding (-1 => N_padded)

    N_padded must divide evenly by the axis size (pad rows score NEG_INF and
    never surface). Output indices are global rows in [0, valid_rows) or -1.
    """
    n_pad, d = passage_shards.shape
    n_shards = mesh.shape[axis]
    if n_pad % n_shards:
        raise ValueError(f"padded rows {n_pad} not divisible by {n_shards} shards")
    rows_per_shard = n_pad // n_shards
    valid = n_pad if valid_rows < 0 else valid_rows

    def local_search(q, p_shard):
        # p_shard [1?, rows_per_shard, D] block of the sharded dim -> search
        shard_id = jax.lax.axis_index(axis)
        base = shard_id * rows_per_shard
        # valid rows within this shard (pad rows live in the last shards)
        local_valid = jnp.clip(valid - base, 0, rows_per_shard)
        s, i = flat_ip_topk(
            q,
            p_shard,
            k,
            block_rows=min(block_rows, rows_per_shard),
            valid_rows=local_valid,
            precision=precision,
        )
        row_ok = i >= 0
        s = jnp.where(row_ok, s, NEG_INF)
        i = jnp.where(row_ok, i + base, -1)
        # ICI merge: gather candidates in shard order (stability => shard 0,
        # i.e. lowest global rows, wins ties), then stable top-k.
        all_s = jax.lax.all_gather(s, axis)  # [S, Q, k]
        all_i = jax.lax.all_gather(i, axis)
        qn = q.shape[0]
        cat_s = jnp.swapaxes(all_s, 0, 1).reshape(qn, -1)
        cat_i = jnp.swapaxes(all_i, 0, 1).reshape(qn, -1)
        top_s, sel = jax.lax.top_k(cat_s, k)
        top_i = jnp.take_along_axis(cat_i, sel, axis=1)
        return top_s, top_i

    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        # The per-shard scan carry starts replicated and becomes
        # shard-varying after the first block; skip the vma check.
        check_vma=False,
    )
    return fn(queries, passage_shards)


def sharded_ivf_topk(
    mesh: Mesh,
    q_probe: jnp.ndarray,
    q_score: jnp.ndarray,
    centroids: jnp.ndarray,
    lists: jnp.ndarray,
    rowids: jnp.ndarray,
    k: int,
    nprobe: int,
    *,
    axis: str = "index",
    packed: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """IVF search over sub-lists row-sharded on the ``axis`` mesh dim.

    Multi-chip analogue of FAISS's per-GPU IVF shards (each GPU probes its
    own inverted lists, results merged): every device holds a slice of the
    sub-list tensor + matching (duplicated) sub-centroids, probes the
    ``ceil(nprobe / n_shards)`` best LOCAL sub-lists, scores its gathered
    candidates, and the per-shard top-k lists merge with an ``all_gather``
    over ICI + stable top-k — the same merge collective as
    :func:`sharded_flat_ip_topk`.

    centroids [L_pad, D] / lists [L_pad, cap, D] / rowids [L_pad, cap]
    must be sharded (or shardable) over dim 0 with ``L_pad`` divisible by
    the axis size; pad sub-lists carry rowid -1 everywhere (their
    candidates mask to NEG_INF; a wasted probe slot at worst). Probe
    allocation is forced-balanced across shards, so the probed set can
    differ from the single-device index's global top-``nprobe`` — recall
    is comparable, not bit-identical (ANN contract; with nprobe >= L every
    row is still scored on some shard, recovering the exact result set).
    """
    from convdr_tpu.ops.exact_search import grouped_topk_last_axis

    l_pad, cap, d = lists.shape
    n_shards = mesh.shape[axis]
    if l_pad % n_shards:
        raise ValueError(
            f"padded sub-list count {l_pad} not divisible by {n_shards}"
        )
    l_local = l_pad // n_shards
    nprobe_local = max(1, min(-(-nprobe // n_shards), l_local))

    def local_search(qp, qs, cent, ls, rid):
        cs = jnp.dot(
            qp,
            cent.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [Q, L_local]
        _, probes = grouped_topk_last_axis(cs, nprobe_local)
        qn = qp.shape[0]
        flat_probes = probes.reshape(-1)
        cand = jnp.take(ls, flat_probes, axis=0).reshape(
            qn, nprobe_local * cap, d
        )
        rid_g = jnp.take(rid, flat_probes, axis=0).reshape(
            qn, nprobe_local * cap
        )
        if ls.dtype == jnp.uint8:
            # IVFPQ lists: d is the code width, qs the [Q, M, K] ADC LUT
            from convdr_tpu.retrieval.ivf import _adc_candidate_scores

            scores = _adc_candidate_scores(
                cand, qs, qs.shape[-1], packed=packed
            )
        elif ls.dtype == jnp.int8:
            scores = jnp.einsum(
                "qnd,qd->qn",
                cand.astype(jnp.bfloat16),
                qs.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        else:
            scores = jnp.einsum(
                "qnd,qd->qn",
                cand,
                qs,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        scores = jnp.where(rid_g >= 0, scores, NEG_INF)
        kk = min(k, nprobe_local * cap)
        top_s, sel = grouped_topk_last_axis(scores, kk)
        top_i = jnp.take_along_axis(rid_g, sel, axis=1)
        if kk < k:
            top_s = jnp.pad(
                top_s, ((0, 0), (0, k - kk)), constant_values=NEG_INF
            )
            top_i = jnp.pad(top_i, ((0, 0), (0, k - kk)), constant_values=-1)
        top_i = jnp.where(top_s == NEG_INF, -1, top_i)
        # ICI merge, shard order first => deterministic tie resolution
        all_s = jax.lax.all_gather(top_s, axis)  # [S, Q, k]
        all_i = jax.lax.all_gather(top_i, axis)
        cat_s = jnp.swapaxes(all_s, 0, 1).reshape(qn, -1)
        cat_i = jnp.swapaxes(all_i, 0, 1).reshape(qn, -1)
        out_s, sel2 = jax.lax.top_k(cat_s, k)
        out_i = jnp.take_along_axis(cat_i, sel2, axis=1)
        return out_s, out_i

    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(q_probe, q_score, centroids, lists, rowids)


def sharded_pq_topk(
    mesh: Mesh,
    lut: jnp.ndarray,
    code_shards: jnp.ndarray,
    k: int,
    ksub: int,
    *,
    valid_rows: int = -1,
    block_rows: int = 1 << 18,
    axis: str = "index",
    exact: bool = False,
    packed: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ADC search over row-sharded PQ codes; returns replicated (scores, idx).

    lut         [Q, M, K] f32      replicated per-query ADC tables
    code_shards [N_padded, M] u8   sharded over ``axis`` on dim 0
                ([N_padded, M/2] with ``packed=True`` — nbits=4 nibbles)
    valid_rows  logical corpus size before padding (-1 => N_padded)

    The PQ analogue of :func:`sharded_flat_ip_topk`: every device runs the
    blocked ADC matmul scan (:func:`convdr_tpu.ops.pq.pq_flat_topk`) over
    its code shard, per-shard top-k lists merge with an ``all_gather``
    over ICI + stable top-k. Shard 0 holds the lowest global rows, so ties
    resolve to the lower row index like the single-device kernel.
    """
    from convdr_tpu.ops.pq import pq_flat_topk

    n_pad = code_shards.shape[0]
    n_shards = mesh.shape[axis]
    if n_pad % n_shards:
        raise ValueError(
            f"padded rows {n_pad} not divisible by {n_shards} shards"
        )
    rows_per_shard = n_pad // n_shards
    valid = n_pad if valid_rows < 0 else valid_rows

    def local_search(lt, codes):
        shard_id = jax.lax.axis_index(axis)
        base = shard_id * rows_per_shard
        local_valid = jnp.clip(valid - base, 0, rows_per_shard)
        s, i = pq_flat_topk(
            lt,
            codes,
            k,
            ksub,
            block_rows=min(block_rows, rows_per_shard),
            valid_rows=local_valid,
            exact=exact,
            packed=packed,
        )
        row_ok = i >= 0
        s = jnp.where(row_ok, s, NEG_INF)
        i = jnp.where(row_ok, i + base, -1)
        all_s = jax.lax.all_gather(s, axis)  # [S, Q, k]
        all_i = jax.lax.all_gather(i, axis)
        qn = lt.shape[0]
        cat_s = jnp.swapaxes(all_s, 0, 1).reshape(qn, -1)
        cat_i = jnp.swapaxes(all_i, 0, 1).reshape(qn, -1)
        top_s, sel = jax.lax.top_k(cat_s, k)
        top_i = jnp.take_along_axis(cat_i, sel, axis=1)
        return top_s, top_i

    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(lut, code_shards)
