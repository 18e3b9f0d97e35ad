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


class BlockedSearcher:
    """Exact top-N retrieval over on-disk embedding blocks."""

    def __init__(
        self,
        config: SearchConfig = SearchConfig(),
        *,
        mesh: Optional[Mesh] = None,
        index_axis: str = "index",
    ):
        self.config = config
        self.mesh = mesh
        self.index_axis = index_axis

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
        s, i = self._search_block_device(query_embs, block_embs, top_n)
        return np.asarray(s), np.asarray(i)

    def _search_block_device(
        self, query_embs: np.ndarray, block_embs: np.ndarray, top_n: int
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
                    query_embs, block_embs[lo:hi], top_n
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
        p = _device_put_padded(block_embs, padded_n, storage_dtype)
        q = jnp.asarray(query_embs)
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
        """
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
            s, i = self._search_block_device(query_embs, emb, top_n)
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
        return out_s, out_i

    def search_arrays(
        self,
        query_embs: np.ndarray,
        passage_embs: np.ndarray,
        emb2offset: np.ndarray,
        top_n: int,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """In-memory single-block convenience path."""
        s, i = self.search_block(query_embs, passage_embs, top_n)
        offsets = np.where(i >= 0, emb2offset[np.clip(i, 0, None)], -1)
        return s, offsets
