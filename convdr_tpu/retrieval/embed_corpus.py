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

import functools
import logging
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from convdr_tpu.data.token_cache import TokenCache
from convdr_tpu.ops.quant import Int8Quantizer
from convdr_tpu.retrieval.blocks import write_embedding_block
from convdr_tpu.utils.hostops import concat_rows

logger = logging.getLogger(__name__)


@functools.lru_cache(maxsize=8)
def make_body_encode_fn(
    apply_fn: Callable, *, mesh: Optional[Mesh] = None, data_axis: str = "data",
    is_query: bool = False,
):
    """Jit the corpus-side encoder; derive the mask on device from lengths.

    Cached per (apply_fn, mesh, axis, side) so repeated
    :func:`generate_embeddings` calls (multi-block runs, tests, notebooks)
    reuse the compiled executables instead of re-jitting per call. Bounded
    (LRU of 8): every model reload creates a fresh ``apply_fn``, and an
    unbounded cache would pin each one's executables forever.
    """

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


def default_length_buckets(max_seq_length: int) -> tuple:
    """Sequence-length buckets for :func:`generate_embeddings`.

    Fixed 128-step rungs (+ a 64 rung for short passages: MS MARCO averages
    ~70 tokens) capped by the cache record length; a handful of rungs keeps
    the number of compiled programs small while cutting the padding FLOPs
    the reference always pays (it pads every document to max_seq_length,
    gen_passage_embeddings.py:104-112 via GetProcessingFn's fixed pad).
    """
    rungs = [b for b in (64, 128, 256, 384) if b < max_seq_length]
    return tuple(rungs) + (max_seq_length,)


class _BucketBuffer:
    """Accumulates rows per length bucket; flushes fixed-shape batches.

    Each bucket flushes at a constant token budget (``batch_size`` rows at
    the top rung): shorter rungs take proportionally more rows per batch,
    which keeps activation memory flat, feeds the MXU full tiles at short
    sequence lengths, and cuts dispatch count.
    """

    def __init__(self, buckets, batch_size: int):
        self.buckets = tuple(sorted(buckets))
        top = self.buckets[-1]
        self.batch_sizes = {
            b: batch_size * (top // b) for b in self.buckets
        }
        self._rows = {b: [] for b in self.buckets}  # (ids, lens, offsets)

    def add(self, ids: np.ndarray, lens: np.ndarray, offsets: np.ndarray):
        """Route rows to buckets; return full (bucket, ids, lens, offsets)
        batches. Eager (a list, not a generator): buffer state must not
        depend on how far a caller iterates."""
        bidx = np.searchsorted(np.asarray(self.buckets), lens, side="left")
        # rows longer than the top rung land in it (truncation = the cache
        # writer's own clamp semantics); normally the top rung >= record len
        bidx = np.minimum(bidx, len(self.buckets) - 1)
        out = []
        for j, bucket in enumerate(self.buckets):
            sel = bidx == j
            if not sel.any():
                continue
            self._rows[bucket].append(
                (ids[sel, :bucket], lens[sel], offsets[sel])
            )
            out.extend(self._drain(bucket, full_only=True))
        return out

    def flush(self):
        """Return the remaining partial batches, padded to batch_size."""
        out = []
        for bucket in self.buckets:
            out.extend(self._drain(bucket, full_only=False))
        return out

    def _drain(self, bucket: int, *, full_only: bool):
        batch_size = self.batch_sizes[bucket]
        rows = self._rows[bucket]
        n = sum(r[0].shape[0] for r in rows)
        if n == 0 or (full_only and n < batch_size):
            return []
        ids = np.concatenate([r[0] for r in rows], axis=0)
        lens = np.concatenate([r[1] for r in rows], axis=0)
        offsets = np.concatenate([r[2] for r in rows], axis=0)
        out = []
        pos = 0
        while n - pos >= batch_size:
            sl = slice(pos, pos + batch_size)
            out.append((bucket, ids[sl], lens[sl], offsets[sl]))
            pos += batch_size
        rest = n - pos
        if full_only:
            self._rows[bucket] = (
                [(ids[pos:], lens[pos:], offsets[pos:])] if rest else []
            )
            return out
        self._rows[bucket] = []
        if rest:
            pad = batch_size - rest
            out.append((
                bucket,
                np.concatenate([ids[pos:], np.repeat(ids[-1:], pad, 0)], 0),
                np.concatenate([lens[pos:], np.repeat(lens[-1:], pad, 0)], 0),
                np.concatenate(
                    [offsets[pos:], np.full(pad, -1, offsets.dtype)], 0
                ),
            ))
        return out


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
    length_buckets: Optional[tuple] = None,
    block_format: str = "pickle",
    storage_dtype: str = "float32",
) -> int:
    """Encode the whole cache into ``num_blocks`` reference-format blocks.

    Block ``b`` holds records ``i % num_blocks == b`` (the reference's
    per-rank round-robin split), each row tagged with its cache offset.
    Returns the total number of embedding rows written (chunks included).

    ``length_buckets`` (ascending, last >= the cache record length) batches
    records by length rung so short passages aren't encoded at full padded
    length -- embeddings are unchanged (pads never influence valid tokens:
    attention excludes them, pooling masks them, RoBERTa position ids come
    from the mask) but real-corpus throughput rises by roughly the padding
    ratio. Row order within a block follows flush order, not cache order;
    consumers map rows through the block's offset array. For multi-chunk
    models pass chunk-multiple rungs (each record encodes only the chunks
    its rung covers; empty chunks are skipped instead of indexed).

    ``storage_dtype``: on-disk block dtype. "float32" (default) keeps the
    reference block format byte-readable by the upstream consumers
    (run_convdr_inference.py:163-175 pickles are f32); "bfloat16" halves
    disk + HBM for capacity-mode search (searcher accumulates in f32, so
    recall sets match the bf16-rounded oracle -- see bench.py --scale);
    "int8" is SQ8 scalar quantization (ops/quant.py; quarter disk/HBM,
    default-precision matmul speed, int8_scales.npy sidecar written next
    to the blocks, results bit-exact vs the int8 oracle).
    """
    storage_np = np.dtype("float32") if storage_dtype == "float32" else None
    if storage_dtype not in ("float32", "bfloat16", "int8"):
        raise ValueError(f"unknown storage_dtype {storage_dtype!r}")
    if storage_dtype == "bfloat16":
        import ml_dtypes

        storage_np = np.dtype(ml_dtypes.bfloat16)
    quantizer = None  # int8: fitted on the first non-empty block
    if storage_dtype == "int8":
        storage_np = np.dtype(np.float32)  # blocks quantize after concat
    if length_buckets is not None:
        length_buckets = tuple(sorted(length_buckets))
        if length_buckets[-1] < cache.max_seq_length:
            raise ValueError(
                f"top length bucket {length_buckets[-1]} is shorter than the "
                f"cache record length {cache.max_seq_length}; rows would be "
                "truncated"
            )
    encode = make_body_encode_fn(
        apply_fn, mesh=mesh, data_axis=data_axis, is_query=is_query
    )
    total_rows = 0
    emb_dim = 0  # learned from the first encoded batch; used for empty shards
    for block_id in range(num_blocks):
        embs_out = []
        ids_out = []

        def run_batch(ids, lens, offsets):
            out = np.asarray(
                encode(params, jnp.asarray(ids), jnp.asarray(lens))
            )
            valid = offsets >= 0
            # multi-chunk [B, C, E] -> C rows per record. Under length
            # buckets only chunks covering real tokens are emitted, even
            # when a sparse rung ladder leaves pad chunks inside the rung
            # (the reference indexes every all-pad chunk as a garbage row).
            if out.ndim == 3:
                chunk_len = ids.shape[1] // out.shape[1]
                for chunk in range(out.shape[1]):
                    keep = valid
                    if length_buckets is not None:
                        keep = valid & (lens > chunk * chunk_len)
                    embs_out.append(out[keep, chunk, :])
                    ids_out.append(offsets[keep])
            else:
                embs_out.append(out[valid])
                ids_out.append(offsets[valid])

        if length_buckets is None:
            for ids, lens, offsets in cache.iter_batches(
                batch_size, shard_index=block_id, num_shards=num_blocks
            ):
                run_batch(ids, lens, offsets)
        else:
            buf = _BucketBuffer(length_buckets, batch_size)
            for ids, lens, offsets in cache.iter_batches(
                batch_size, shard_index=block_id, num_shards=num_blocks
            ):
                valid = offsets >= 0
                for _b, bids, blens, boffs in buf.add(
                    ids[valid], lens[valid], offsets[valid]
                ):
                    run_batch(bids, blens, boffs)
            for _b, bids, blens, boffs in buf.flush():
                run_batch(bids, blens, boffs)
        if embs_out:
            block_embs = concat_rows(embs_out).astype(storage_np, copy=False)
            emb_dim = block_embs.shape[-1]
            if storage_dtype == "int8":
                # SQ8 (ops/quant.py): fit per-dim scales on the first
                # non-empty block (an unbiased i%num_blocks round-robin
                # shard — the sample FAISS trains its scalar quantizer
                # on), persist the sidecar the searcher folds into
                # queries, clip later blocks' rare out-of-range values.
                if quantizer is None:
                    quantizer = Int8Quantizer.fit(block_embs)
                    quantizer.save(out_dir)
                block_embs = quantizer.quantize_passages(block_embs)
        else:
            # empty round-robin shard (num_blocks > record count): keep the
            # real embedding dim so downstream loads/search stay well-typed
            empty_np = np.dtype(np.int8) if storage_dtype == "int8" else storage_np
            block_embs = np.zeros((0, emb_dim), empty_np)
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
            fmt=block_format,
        )
        total_rows += block_embs.shape[0]
        logger.info(
            "wrote block %d: %d rows -> %s", block_id, block_embs.shape[0], out_dir
        )
    return total_rows
