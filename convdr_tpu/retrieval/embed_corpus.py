"""Corpus embedding pipeline: token cache -> embedding blocks.

TPU-native replacement for the reference's DDP embedding generator
(/root/reference/drivers/gen_passage_embeddings.py): instead of one NCCL
process per GPU with round-robin record assignment (utils/util.py:423-424)
and filesystem-pickle collectives (barrier_array_merge, util.py:88-143), a
single program streams the memmapped token cache in fixed-shape batches
through one jitted ``body_emb`` (batch sharded over the ``data`` mesh axis)
and writes per-block files directly -- the blocks ARE the retrieval shards
consumed by :class:`~convdr_tpu.retrieval.searcher.BlockedSearcher`, exactly
as upstream (gen_passage_embeddings.py:156-167 feeding
run_convdr_inference.py:163-175).

Multi-chunk models return ``[B, C, E]``; chunk rows are flattened into extra
block rows sharing the same token-cache offset
(gen_passage_embeddings.py:117-123), deduped later at run-writing time.
"""

from __future__ import annotations

import logging
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from convdr_tpu.data.token_cache import TokenCache
from convdr_tpu.retrieval.blocks import write_embedding_block

logger = logging.getLogger(__name__)


def make_body_encode_fn(
    apply_fn: Callable, *, mesh: Optional[Mesh] = None, data_axis: str = "data",
    is_query: bool = False,
):
    """Jit the corpus-side encoder; derive the mask on device from lengths."""

    def encode(params, ids, lengths):
        mask = (
            jnp.arange(ids.shape[1], dtype=jnp.int32)[None, :]
            < lengths[:, None]
        ).astype(jnp.int32)
        return apply_fn(params, ids, mask, is_query)

    if mesh is None:
        return jax.jit(encode)
    repl = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(data_axis))
    return jax.jit(
        encode, in_shardings=(repl, sharded, sharded), out_shardings=repl
    )


def generate_embeddings(
    apply_fn: Callable,
    params,
    cache: TokenCache,
    out_dir: str,
    *,
    batch_size: int = 64,
    num_blocks: int = 1,
    mesh: Optional[Mesh] = None,
    data_axis: str = "data",
    is_query: bool = False,
    emb_prefix: str = "passage__emb_p_",
    embid_prefix: str = "passage__embid_p_",
) -> int:
    """Encode the whole cache into ``num_blocks`` reference-format blocks.

    Block ``b`` holds records ``i % num_blocks == b`` (the reference's
    per-rank round-robin split), each row tagged with its cache offset.
    Returns the total number of embedding rows written (chunks included).
    """
    encode = make_body_encode_fn(
        apply_fn, mesh=mesh, data_axis=data_axis, is_query=is_query
    )
    total_rows = 0
    emb_dim = 0  # learned from the first encoded batch; used for empty shards
    for block_id in range(num_blocks):
        embs_out = []
        ids_out = []
        for ids, lens, offsets in cache.iter_batches(
            batch_size, shard_index=block_id, num_shards=num_blocks
        ):
            out = np.asarray(
                encode(params, jnp.asarray(ids), jnp.asarray(lens))
            )
            valid = offsets >= 0
            if out.ndim == 3:  # multi-chunk [B, C, E] -> C rows per record
                for chunk in range(out.shape[1]):
                    embs_out.append(out[valid, chunk, :])
                    ids_out.append(offsets[valid])
            else:
                embs_out.append(out[valid])
                ids_out.append(offsets[valid])
        if embs_out:
            block_embs = np.concatenate(embs_out, axis=0)
            emb_dim = block_embs.shape[-1]
        else:
            # empty round-robin shard (num_blocks > record count): keep the
            # real embedding dim so downstream loads/search stay well-typed
            block_embs = np.zeros((0, emb_dim), np.float32)
        block_ids = (
            np.concatenate(ids_out, axis=0) if ids_out else np.zeros((0,), np.int64)
        )
        write_embedding_block(
            out_dir,
            block_id,
            block_embs,
            block_ids,
            emb_prefix=emb_prefix,
            embid_prefix=embid_prefix,
        )
        total_rows += block_embs.shape[0]
        logger.info(
            "wrote block %d: %d rows -> %s", block_id, block_embs.shape[0], out_dir
        )
    return total_rows
