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
