"""Blocked exact search driver: stream embedding blocks through the TPU.

Drop-in replacement for the reference's ``search_one_by_one``
(/root/reference/drivers/run_convdr_inference.py:157-242): load block b,
search, map local rows to token-cache offsets via the block's id array
(:190-191), merge with the running top-N preferring earlier blocks on ties
(:217-229) -- except the FAISS ``index.add``/``search``/``reset`` cycle
becomes a jitted MXU matmul + fused top-k per block (optionally sharded over
an ``index`` mesh axis), and the Python 2-pointer merge becomes the stable
on-device merge of :func:`convdr_tpu.ops.exact_search.merge_topk`.

Blocks are padded to bucket sizes so XLA compiles a handful of shapes, not
one per block.
"""

from __future__ import annotations

import logging
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from convdr_tpu.core.config import SearchConfig
from convdr_tpu.ops.exact_search import NEG_INF, flat_ip_topk, merge_topk
from convdr_tpu.ops.quant import Int8Quantizer, rescore_candidates
from convdr_tpu.parallel.mesh import pad_to_multiple
from convdr_tpu.parallel.sharded_search import sharded_flat_ip_topk
from convdr_tpu.retrieval.blocks import iter_embedding_blocks

logger = logging.getLogger(__name__)

# Host->device transfers above ~1-2 GB fall off a bandwidth cliff on this
# stack; blocks upload in row-aligned <=1 GiB slices and concatenate +
# zero-pad in HBM (~ms). See utils/transfer.py for the measurements.
from convdr_tpu.utils.transfer import device_put_chunked


def prefetch_iter(iterable, depth: int = 1):
    """Run an iterator on a background thread, ``depth`` items ahead.

    Overlaps the next block's disk read + unpickle (seconds for a
    reference-scale block on a single disk) with the current block's
    upload + device search. Read-only producer, bounded queue, exceptions
    re-raised at the consumer.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    done = object()
    closed = threading.Event()  # consumer gone: producer must not block on put

    def put_checked(item) -> bool:
        while not closed.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterable:
                if not put_checked(item):
                    return
            put_checked(done)
        except BaseException as e:  # propagate into the consumer
            put_checked(("__prefetch_error__", e))

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is done:
                break
            if isinstance(item, tuple) and len(item) == 2 and item[0] == "__prefetch_error__":
                raise item[1]
            yield item
    finally:
        # Abandoned early (exception in the consumer, generator GC'd):
        # unblock the producer so it exits instead of holding GB-scale
        # blocks alive for the life of the process.
        closed.set()


def _device_put_padded(block_embs: np.ndarray, padded_n: int, dtype) -> jnp.ndarray:
    return device_put_chunked(block_embs, dtype, pad_rows_to=padded_n)


@jax.jit
def _quantize_block_dev(p: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """Device-side SQ8 of a float block (round-half-even, clip) —
    bit-identical to the host ``quantize_passages`` (same IEEE divide +
    rint), but ~free on the VPU vs seconds of single-core numpy."""
    q = jnp.rint(p.astype(jnp.float32) / scales[None, :])
    return jnp.clip(q, -127, 127).astype(jnp.int8)


class BlockedSearcher:
    """Exact top-N retrieval over on-disk embedding blocks."""

    def __init__(
        self,
        config: SearchConfig = SearchConfig(),
        *,
        mesh: Optional[Mesh] = None,
        index_axis: str = "index",
        quantizer: Optional[Int8Quantizer] = None,
    ):
        self.config = config
        self.mesh = mesh
        self.index_axis = index_axis
        # int8 storage needs the fitted per-dimension scales to fold into
        # queries; pass one here, or search_blocks loads the sidecar from
        # the block directory, or search_arrays fits on the passed corpus.
        self.quantizer = quantizer

    # -- int8 (SQ8) plumbing -------------------------------------------
    @property
    def _int8(self) -> bool:
        return self.config.storage_dtype == "int8"

    def _require_quantizer(self) -> Int8Quantizer:
        if self.quantizer is None:
            raise ValueError(
                "storage_dtype='int8' needs fitted scales: pass "
                "quantizer=Int8Quantizer(...) or search a block dir with "
                "an int8_scales.npy sidecar (generate_embeddings writes it)"
            )
        return self.quantizer

    def _prepare_queries(self, query_embs: np.ndarray):
        """-> (matmul-ready queries, per-query score scale or None).

        int8 storage folds the passage scales into the queries and
        quantizes them (ops/quant.py); the returned int-valued f32 rows
        drive an integer-exact scan whose scores are rescaled by ``tq``
        only at the end (per-query positive scale: ranking unaffected).
        """
        if self._int8:
            return self._require_quantizer().quantize_queries(query_embs)
        return np.asarray(query_embs), None

    @staticmethod
    def _scale_scores(s: np.ndarray, i: np.ndarray, tq) -> np.ndarray:
        if tq is None:
            return s
        return np.where(i >= 0, s * tq, NEG_INF).astype(np.float32)

    def _bucket_rows(self, n: int) -> int:
        """Pad block row counts to a <=1.25x geometric ladder of buckets
        (>= 8192) to bound the number of distinct compiled shapes; buckets
        round up to a multiple of shards*128 so the sharded search divides
        evenly on any axis size (incl. non-power-of-two slices).

        A power-of-two ladder wasted up to 2x matmul FLOPs + HBM on the
        tail block (600k rows padded to 1,048,576); the 1.25x ladder caps
        the waste at 25% while still compiling only ~O(log n) shapes --
        and real block files are equal-sized, so in practice one or two
        rungs ever compile."""
        bucket = 8192
        while bucket < n:
            bucket = -(-int(bucket * 1.25) // 128) * 128
        if self.mesh is not None:
            quantum = self.mesh.shape[self.index_axis] * 128
            bucket = -(-bucket // quantum) * quantum
        return bucket

    def search_block(
        self, query_embs: np.ndarray, block_embs: np.ndarray, top_n: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-N of one block; returns (scores, local row indices)."""
        q_ready, tq = self._prepare_queries(query_embs)
        s, i = self._search_block_device(q_ready, block_embs, top_n)
        s, i = np.asarray(s), np.asarray(i)
        return self._scale_scores(s, i, tq), i

    def _search_block_device(
        self, q_ready, block_embs: np.ndarray, top_n: int
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Device-array variant of :meth:`search_block`: no host sync, so
        the block-streaming loop pipelines the next block's HBM upload
        behind the current search.

        Blocks above ``config.max_device_block_bytes`` are searched as
        sequential sub-blocks merged in order: sub-block row indices are
        shifted by their offset and :func:`merge_topk` prefers its first
        argument on ties, so the result is bit-identical to a single-shot
        search (lower row index wins ties either way). This keeps the
        reference's 8-on-disk-block layout (README.md:216) valid at 38M
        rows where one block alone approaches half of a v5e's HBM.
        """
        n = block_embs.shape[0]
        storage_itemsize = jnp.dtype(self.config.storage_dtype).itemsize
        row_bytes = block_embs.shape[1] * storage_itemsize
        cap_rows = max(1024, int(self.config.max_device_block_bytes // row_bytes))
        # round the cap to the scan-block quantum so sub-blocks bucket well
        quantum = min(self.config.passage_block_size, cap_rows)
        cap_rows = max(quantum, cap_rows // quantum * quantum)
        if n > cap_rows:
            merged_s = merged_i = None
            for lo in range(0, n, cap_rows):
                hi = min(n, lo + cap_rows)
                s, i = self._search_block_device(
                    q_ready, block_embs[lo:hi], top_n
                )
                i = jnp.where(i >= 0, i + lo, -1)
                if merged_s is None:
                    merged_s, merged_i = s, i
                else:
                    merged_s, merged_i = merge_topk(
                        merged_s, merged_i, s, i, top_n
                    )
            return merged_s, merged_i
        padded_n = self._bucket_rows(n)
        storage_dtype = jnp.dtype(self.config.storage_dtype)
        if self._int8 and block_embs.dtype != np.int8:
            # float block under int8 config: upload in source precision
            # (a plain int8 cast would truncate, not quantize), SQ8 on the
            # VPU, free the float copy. Serving-style setups quantize once
            # and keep only the int8 corpus resident.
            scales = jnp.asarray(self._require_quantizer().scales)
            p_float = device_put_chunked(block_embs, pad_rows_to=padded_n)
            p = _quantize_block_dev(p_float, scales)
            del p_float
        else:
            p = _device_put_padded(block_embs, padded_n, storage_dtype)
        q = jnp.asarray(q_ready)
        if self.mesh is not None:
            s, i = sharded_flat_ip_topk(
                self.mesh,
                q,
                p,
                top_n,
                valid_rows=n,
                block_rows=self.config.passage_block_size,
                axis=self.index_axis,
                precision=self.config.matmul_precision,
            )
        else:
            s, i = flat_ip_topk(
                q,
                p,
                top_n,
                block_rows=min(self.config.passage_block_size, padded_n),
                valid_rows=n,
                precision=self.config.matmul_precision,
            )
        return s, i

    def search_blocks(
        self,
        ann_data_dir: str,
        query_embs: np.ndarray,
        top_n: int,
        *,
        max_blocks: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Search all blocks under ``ann_data_dir``; returns
        (scores [Q, top_n] desc, token-cache offsets [Q, top_n], -1 padded).

        ``max_blocks`` limits the scan (e.g. a single-block compile warm-up
        before a timed full sweep).

        int8 storage: the scales sidecar is loaded from ``ann_data_dir``
        (unless a quantizer was passed at construction); block scans run on
        unscaled integer scores and the merged result is rescaled once per
        query. With ``config.rescore_factor`` > 0 (int8 OR bfloat16
        storage) the blocks must be float files (the original rows are
        the refinement source); each block's top ``rescore_factor *
        top_n`` quantized candidates are re-ranked host-side at full
        precision before the cross-block merge — FAISS's
        ``IndexRefineFlat(IndexScalarQuantizer)`` composition (bf16: the
        ~0.3% of top-100 rows the rounded scan reorders come back).
        """
        if self._int8 and self.quantizer is None:
            self.quantizer = Int8Quantizer.load_optional(ann_data_dir)
            if self.quantizer is None:
                # no sidecar: float blocks can self-fit (block 0 is an
                # unbiased round-robin shard, same sample FAISS trains on);
                # int8 blocks without scales are unusable.
                from convdr_tpu.retrieval.blocks import load_embedding_block

                blk = load_embedding_block(ann_data_dir, 0)
                if blk is None:
                    raise FileNotFoundError(
                        f"No embedding blocks found in {ann_data_dir}"
                    )
                if blk[0].dtype == np.int8:
                    raise FileNotFoundError(
                        f"int8 blocks in {ann_data_dir} have no "
                        "int8_scales.npy sidecar; regenerate with "
                        "generate_embeddings(storage_dtype='int8')"
                    )
                logger.warning(
                    "no int8_scales.npy in %s; fitting scales on block 0",
                    ann_data_dir,
                )
                self.quantizer = Int8Quantizer.fit(blk[0])
        q_ready, tq = self._prepare_queries(query_embs)
        rescoring = (
            self.config.rescore_factor > 0
            and self.config.storage_dtype in ("int8", "bfloat16")
        )
        q_orig = np.asarray(query_embs, np.float32) if rescoring else None
        merged_s: Optional[jnp.ndarray] = None
        merged_i: Optional[jnp.ndarray] = None
        qn = query_embs.shape[0]
        t_start = time.time()
        prev_merged: Optional[jnp.ndarray] = None  # pipeline depth bound
        for block_id, emb, emb2offset in prefetch_iter(
            iter_embedding_blocks(ann_data_dir, max_blocks=max_blocks)
        ):
            if emb.shape[0] == 0:
                logger.info("block %d is empty; skipping", block_id)
                continue
            logger.info(
                "searching block %d: %s passages", block_id, emb.shape[0]
            )
            # Device work is async: block b's HBM upload overlaps block
            # b-1's search. Backpressure: before enqueuing block b, block
            # on the merge of block b-2 so at most ~2 block buffers are
            # alive in HBM at once (unbounded enqueue could exhaust HBM
            # when disk reads outpace the device).
            if prev_merged is not None:
                jax.block_until_ready(prev_merged)
            prev_merged = merged_s
            if rescoring:
                if emb.dtype != np.float32:
                    raise ValueError(
                        "rescore_factor needs float block files (the "
                        "original rows are the refinement source); these "
                        f"blocks are already {emb.dtype}"
                    )
                m = self.config.rescore_factor * top_n
                s_m, i_m = self._search_block_device(q_ready, emb, m)
                s, i = rescore_candidates(q_orig, emb, np.asarray(i_m), top_n)
                s, i = jnp.asarray(s), jnp.asarray(i)
            else:
                s, i = self._search_block_device(q_ready, emb, top_n)
            # local row -> token-cache offset on device; -1 rows stay -1
            offs = jnp.take(
                jnp.asarray(emb2offset.astype(np.int64)),
                jnp.clip(i, 0, None),
                axis=0,
            )
            o_j = jnp.where(i >= 0, offs, -1)
            if merged_s is None:
                merged_s, merged_i = s, o_j
            else:
                merged_s, merged_i = merge_topk(
                    merged_s, merged_i, s, o_j, top_n
                )
        if merged_s is None:
            raise FileNotFoundError(f"No embedding blocks found in {ann_data_dir}")
        out_s = np.asarray(merged_s)
        out_i = np.asarray(merged_i)
        elapsed = time.time() - t_start
        logger.info(
            "search: total=%.4fs queries=%d per_query=%.6fs",
            elapsed, qn, elapsed / max(qn, 1),
        )
        out_i = np.where(out_s <= NEG_INF, -1, out_i)
        if not rescoring:
            out_s = self._scale_scores(out_s, out_i, tq)
        return out_s, out_i

    def search_arrays(
        self,
        query_embs: np.ndarray,
        passage_embs: np.ndarray,
        emb2offset: np.ndarray,
        top_n: int,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """In-memory single-block convenience path.

        int8 storage: scales fit on the passed corpus when no quantizer is
        set (float input), and ``config.rescore_factor`` > 0 (int8 or
        bfloat16 storage) re-ranks the quantized top ``factor * top_n``
        with full-precision host scores.
        """
        if self._int8 and self.quantizer is None:
            if passage_embs.dtype == np.int8:
                self._require_quantizer()  # raises with guidance
            self.quantizer = Int8Quantizer.fit(passage_embs)
        if self.config.rescore_factor > 0 and self.config.storage_dtype in (
            "int8", "bfloat16"
        ):
            if passage_embs.dtype != np.float32:
                raise ValueError(
                    "rescore_factor needs the original float rows; the "
                    f"passed corpus is already {passage_embs.dtype}"
                )
            q_ready, _tq = self._prepare_queries(query_embs)
            m = self.config.rescore_factor * top_n
            _s_m, i_m = self._search_block_device(q_ready, passage_embs, m)
            s, i = rescore_candidates(
                np.asarray(query_embs, np.float32),
                passage_embs,
                np.asarray(i_m),
                top_n,
            )
        else:
            s, i = self.search_block(query_embs, passage_embs, top_n)
        offsets = np.where(i >= 0, emb2offset[np.clip(i, 0, None)], -1)
        return s, offsets
