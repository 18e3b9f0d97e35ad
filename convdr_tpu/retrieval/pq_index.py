"""HBM-resident PQ index (FAISS ``IndexPQ`` / ``IndexRefineFlat`` family).

The reference streams 8 float32 pickle blocks through FAISS FlatIP per
inference run (/root/reference/drivers/run_convdr_inference.py:157-242) —
at its 38M-passage scale (README.md:152) that is >100 GB of disk traffic
PER QUERY SWEEP on any accelerator whose memory can't hold the corpus.
This index holds PQ codes instead: 48-96 bytes/row puts the entire 38M
corpus in a single v5e's HBM, so after one build, query sweeps never touch
the host again. Search is the ADC-as-matmul scan (ops/pq.py); optional
rescoring re-ranks the ADC candidate list against the original float rows
(FAISS ``IndexRefineFlat``) either from an in-memory matrix or via one
streaming pass over the embedding block files.

Quality contract: ADC ranking approximates inner-product ranking with the
codec's reconstruction error; candidate recall at rescore_factor x k is
the serving contract (tests/test_pq.py). Rowids follow the IVF convention
(emb2offset payloads), so drivers map results to passage ids identically.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from convdr_tpu.ops.exact_search import NEG_INF
from convdr_tpu.ops.pq import PQCodec, pq_flat_topk
from convdr_tpu.utils.transfer import device_put_chunked

logger = logging.getLogger(__name__)

_META_FILENAME = "pq_index_meta.json"

# [Q, block] f32 score transients bound the query chunk (the ADC one-hot
# block is bounded separately inside pq_flat_topk)
_MAX_QUERY_CHUNK = 2048


class PQIndex:
    """Product-quantized flat index: codes [N, M] uint8 + payload rowids."""

    def __init__(
        self,
        codec: PQCodec,
        codes: np.ndarray,
        rowids: Optional[np.ndarray] = None,
        *,
        stats: Optional[dict] = None,
        packed: bool = False,
    ):
        codes = np.asarray(codes)
        if packed and codec.nbits != 4:
            raise ValueError("packed codes are nbits=4 only")
        width = codec.m // 2 if packed else codec.m
        if codes.ndim != 2 or codes.shape[1] != width:
            raise ValueError(
                f"codes must be [N, {width}] for this codec "
                f"(packed={packed}), got {codes.shape}"
            )
        if codes.dtype != np.uint8:
            raise ValueError(f"codes must be uint8, got {codes.dtype}")
        self.packed = bool(packed)
        if rowids is None:
            rowids = np.arange(codes.shape[0], dtype=np.int32)
        rowids = np.asarray(rowids, np.int32)
        if rowids.shape != (codes.shape[0],):
            raise ValueError("rowids must be one id per code row")
        self.codec = codec
        self.codes = codes
        self.rowids = rowids
        self.stats = dict(stats or {})
        self._dev: Optional[jnp.ndarray] = None
        self._dev_sharded = None
        self._dev_sharded_key = None

    # -- geometry -------------------------------------------------------
    @property
    def ntotal(self) -> int:
        return self.codes.shape[0]

    @property
    def dim(self) -> int:
        return self.codec.dim

    @property
    def code_bytes(self) -> int:
        return self.codes.shape[1]

    # -- build ----------------------------------------------------------
    @classmethod
    def build(
        cls,
        embeddings: np.ndarray,
        m: int,
        nbits: int = 8,
        *,
        rowids: Optional[np.ndarray] = None,
        iters: int = 20,
        seed: int = 42,
        train_sample: Optional[int] = None,
        codec: Optional[PQCodec] = None,
        opq_iters: int = 0,
        pack: bool = False,
    ) -> "PQIndex":
        """Fit a codec on ``embeddings`` [N, D] (or reuse ``codec``) and
        encode every row. ``train_sample`` caps the codebook training set
        (None = FAISS's ~256 rows per centroid); ``opq_iters`` > 0 also
        learns the OPQ rotation (ops/pq.py); ``pack`` stores nbits=4
        codes 2-per-byte (half the HBM/disk; the unpack fuses into the
        ADC kernel — FAISS packs pq4 the same way)."""
        from convdr_tpu.ops.pq import pack_codes_4bit

        emb = np.asarray(embeddings, np.float32)
        if codec is None:
            codec = PQCodec.fit(
                emb, m, nbits, iters=iters, seed=seed,
                sample_max=train_sample, opq_iters=opq_iters,
            )
        codes = codec.encode(emb)
        if pack:
            codes = pack_codes_4bit(codes)
        return cls(
            codec, codes, rowids,
            stats={"block_sizes": [len(emb)]}, packed=pack,
        )

    @classmethod
    def build_from_blocks(
        cls,
        ann_data_dir: str,
        m: int,
        nbits: int = 8,
        *,
        iters: int = 20,
        seed: int = 42,
        train_sample: Optional[int] = None,
        max_blocks: Optional[int] = None,
        opq_iters: int = 0,
        pack: bool = False,
    ) -> "PQIndex":
        """Build from on-disk embedding blocks (gen_passage_embeddings
        output) in ONE streaming pass, RAM-bounded to max(one float block,
        the codebook training sample) + the packed codes: float blocks
        buffer (round-robin shards are unbiased samples) until the
        training target — ``train_sample`` or FAISS's ~256 rows per
        centroid — is covered or the stream ends, the codec fits, pending
        blocks flush through encode, and every later block encodes as it
        is read. Row payloads are each block's emb2offset values, so
        search returns token-cache offsets exactly like
        ``BlockedSearcher.search_blocks``. int8 blocks are dequantized
        with their scales sidecar before encoding (PQ re-quantizes the
        reconstructed rows)."""
        from convdr_tpu.ops.pq import pack_codes_4bit
        from convdr_tpu.ops.quant import Int8Quantizer
        from convdr_tpu.retrieval.blocks import iter_embedding_blocks

        if pack and nbits != 4:
            raise ValueError("pack=True is nbits=4 only")
        fit_target = train_sample if train_sample else 256 * (1 << nbits)
        codec = None
        quantizer = None
        pending = []  # float blocks seen before the codec could fit
        pending_rows = 0
        all_codes = []
        all_ids = []
        sizes = []

        def flush(femb_list):
            # per-block pack keeps peak RAM at the packed code size
            for femb in femb_list:
                codes = codec.encode(femb)
                all_codes.append(pack_codes_4bit(codes) if pack else codes)

        for block_id, emb, emb2offset in iter_embedding_blocks(
            ann_data_dir, max_blocks=max_blocks
        ):
            if emb.shape[0] == 0:
                sizes.append(0)
                continue
            if emb.dtype == np.int8:
                if quantizer is None:
                    quantizer = Int8Quantizer.load(ann_data_dir)
                femb = emb.astype(np.float32) * quantizer.scales[None, :]
            elif codec is not None:
                # post-fit: encode the raw rows (bf16 blocks ride the
                # wire at half the f32 bytes; encode() handles dtypes)
                femb = emb
            else:
                femb = np.asarray(emb, np.float32)
            off = np.asarray(emb2offset, np.int64)
            if off.size and off.max() >= 2**31:
                raise ValueError("emb2offset exceeds int32 payload range")
            all_ids.append(off.astype(np.int32))
            sizes.append(emb.shape[0])
            if codec is None:
                pending.append(femb)
                pending_rows += femb.shape[0]
                if pending_rows >= fit_target:
                    codec = PQCodec.fit(
                        np.concatenate(pending) if len(pending) > 1
                        else pending[0],
                        m, nbits, iters=iters, seed=seed,
                        sample_max=train_sample, opq_iters=opq_iters,
                    )
                    flush(pending)
                    pending = []
            else:
                flush([femb])
            logger.info(
                "pq build block %d: %d rows read", block_id, emb.shape[0]
            )
        if codec is None and pending:
            # stream ended before the sample target: fit on everything
            codec = PQCodec.fit(
                np.concatenate(pending) if len(pending) > 1 else pending[0],
                m, nbits, iters=iters, seed=seed, sample_max=train_sample,
                opq_iters=opq_iters,
            )
            flush(pending)
        if codec is None:
            raise FileNotFoundError(
                f"No embedding blocks found in {ann_data_dir}"
            )
        return cls(
            codec,
            np.concatenate(all_codes),
            np.concatenate(all_ids),
            stats={"block_sizes": sizes},
            packed=pack,
        )

    # -- device binding ---------------------------------------------------
    def _device_codes(self) -> jnp.ndarray:
        if self._dev is None:
            self._dev = device_put_chunked(self.codes, jnp.uint8)
        return self._dev

    def _device_codes_sharded(self, mesh, axis: str) -> jnp.ndarray:
        key = (id(mesh), axis)
        if self._dev_sharded_key == key:
            return self._dev_sharded
        from jax import device_put
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_shards = int(mesh.shape[axis])
        n_pad = -(-self.ntotal // n_shards) * n_shards
        codes = self.codes
        if n_pad > self.ntotal:
            codes = np.concatenate(
                [
                    codes,
                    np.zeros(
                        (n_pad - self.ntotal, codes.shape[1]), np.uint8
                    ),
                ]
            )
        self._dev_sharded = device_put(codes, NamedSharding(mesh, P(axis)))
        self._dev_sharded_key = key
        return self._dev_sharded

    # -- search -----------------------------------------------------------
    def search(
        self,
        queries: np.ndarray,
        k: int,
        *,
        rescore_factor: int = 0,
        rescore_passages: Optional[np.ndarray] = None,
        mesh=None,
        index_axis: str = "index",
        exact: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """ADC top-k. Returns (scores [Q, k] desc f32, rowids [Q, k] int32).

        ``rescore_factor`` > 0 re-ranks the top ``rescore_factor * k`` ADC
        candidates against ``rescore_passages`` [N, D] float rows (indexed
        by ROW POSITION, not rowid — pass the same matrix the index was
        built from); use :meth:`rescore_block_pass` when the float rows
        only exist as block files. With a ``mesh``, codes row-shard over
        ``index_axis`` and per-shard lists merge over ICI.
        """
        q = np.asarray(queries, np.float32)
        if q.ndim != 2 or q.shape[1] != self.dim:
            raise ValueError(f"queries must be [Q, {self.dim}]")
        if rescore_factor and rescore_passages is None:
            raise ValueError(
                "rescore_factor needs rescore_passages (in-memory float "
                "rows) — or call rescore_block_pass for block files"
            )
        k_cand = max(k, rescore_factor * k) if rescore_factor else k
        out_s, out_i = [], []
        for lo in range(0, q.shape[0], _MAX_QUERY_CHUNK):
            hi = min(q.shape[0], lo + _MAX_QUERY_CHUNK)
            lut = jnp.asarray(self.codec.lut(q[lo:hi]))
            if mesh is not None:
                from convdr_tpu.parallel.sharded_search import sharded_pq_topk

                codes_dev = self._device_codes_sharded(mesh, index_axis)
                s, i = sharded_pq_topk(
                    mesh, lut, codes_dev, k_cand, self.codec.ksub,
                    valid_rows=self.ntotal, axis=index_axis, exact=exact,
                    packed=self.packed,
                )
            else:
                s, i = pq_flat_topk(
                    lut, self._device_codes(), k_cand, self.codec.ksub,
                    exact=exact, packed=self.packed,
                )
            out_s.append(np.asarray(s))
            out_i.append(np.asarray(i))
        s = np.concatenate(out_s)
        pos = np.concatenate(out_i)
        if rescore_factor:
            from convdr_tpu.ops.quant import rescore_candidates

            s, pos = rescore_candidates(q, rescore_passages, pos, k)
        # map row positions -> payload rowids
        ids = np.where(pos >= 0, self.rowids[np.clip(pos, 0, None)], -1)
        return s.astype(np.float32), ids.astype(np.int32)

    def rescore(
        self,
        ann_data_dir: str,
        queries: np.ndarray,
        cand_pos: np.ndarray,
        k: int,
        *,
        max_blocks: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Refine ADC candidates at O(candidates) disk cost when the block
        directory supports random access (native .cnb or protocol-4 pickle
        blocks — retrieval/refine.py), falling back to the one-pass
        streaming :meth:`rescore_block_pass` otherwise. Same positional
        candidate contract; bit-identical outputs either way."""
        sizes = self.stats.get("block_sizes")
        if not sizes:
            raise ValueError(
                "rescore needs stats['block_sizes'] (an index from "
                "build_from_blocks)"
            )
        store = self._refine_store(ann_data_dir, max_blocks)
        if store is not None:
            out_s, out_p = store.refine_positional(
                queries, cand_pos, k, block_sizes=sizes
            )
            ids = np.where(
                out_p >= 0,
                self.rowids[np.clip(out_p.astype(np.int64), 0, None)],
                -1,
            )
            return out_s, ids.astype(np.int32)
        return self.rescore_block_pass(
            ann_data_dir, queries, cand_pos, k, max_blocks=max_blocks
        )

    def _refine_store(self, ann_data_dir: str, max_blocks):
        from convdr_tpu.retrieval.refine import cached_refine_store

        return cached_refine_store(self, ann_data_dir, max_blocks)

    def rescore_block_pass(
        self,
        ann_data_dir: str,
        queries: np.ndarray,
        cand_pos: np.ndarray,
        k: int,
        *,
        max_blocks: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Re-rank ADC candidates against float rows streamed from block
        files (one sequential disk pass, no corpus residency).

        ``cand_pos`` [Q, m] are ROW POSITIONS from an un-rescored
        :meth:`search` built via :meth:`build_from_blocks` (positions are
        block-concatenation order, recorded in ``stats['block_sizes']``).
        Returns (scores [Q, k] f32 desc, rowids [Q, k] int32) with exact
        float ranking of the candidate set — FAISS ``IndexRefineFlat``
        semantics at streaming cost.
        """
        from convdr_tpu.retrieval.blocks import iter_embedding_blocks

        sizes = self.stats.get("block_sizes")
        if not sizes:
            raise ValueError(
                "rescore_block_pass needs stats['block_sizes'] (an index "
                "from build_from_blocks)"
            )
        starts = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
        q = np.asarray(queries, np.float32)
        pos = np.asarray(cand_pos, np.int64)
        scores = np.full(pos.shape, NEG_INF, np.float32)
        bi = 0
        quantizer = None
        for block_id, emb, _e2o in iter_embedding_blocks(
            ann_data_dir, max_blocks=max_blocks
        ):
            lo, hi_ = starts[bi], starts[bi + 1]
            bi += 1
            if emb.shape[0] == 0:
                continue
            in_block = (pos >= lo) & (pos < hi_)
            if not in_block.any():
                continue
            qi, slot = np.nonzero(in_block)
            rows = emb[pos[qi, slot] - lo]  # [C, D]
            if rows.dtype == np.int8:
                # SQ8 blocks dequantize through the scales sidecar (same
                # contract as IVFIndex.rescore_block_pass)
                if quantizer is None:
                    from convdr_tpu.ops.quant import Int8Quantizer

                    quantizer = Int8Quantizer.load(ann_data_dir)
                rows = rows.astype(np.float32) * quantizer.scales[None, :]
            else:
                rows = np.asarray(rows, np.float32)
            scores[qi, slot] = np.einsum(
                "cd,cd->c", rows, q[qi], dtype=np.float32
            )
        if bi < len(sizes):
            raise ValueError(
                f"block files in {ann_data_dir} ended at block {bi} but the "
                f"index was built from {len(sizes)} blocks"
            )
        # exact float ranking of the candidate set; (score desc, pos asc)
        # — the SAME tail as RefineStore (the bit-parity contract between
        # the streaming and random-access paths lives in one place)
        from convdr_tpu.retrieval.refine import rank_candidate_tail

        out_s, out_p = rank_candidate_tail(scores, pos, k)
        ids = np.where(
            out_p >= 0,
            self.rowids[np.clip(out_p.astype(np.int64), 0, None)],
            -1,
        )
        return out_s, ids.astype(np.int32)

    # -- persistence --------------------------------------------------------
    def save(self, index_dir: str) -> None:
        os.makedirs(index_dir, exist_ok=True)
        np.save(os.path.join(index_dir, "codes.npy"), self.codes)
        np.save(os.path.join(index_dir, "rowids.npy"), self.rowids)
        self.codec.save(index_dir)
        meta = {
            "ntotal": self.ntotal,
            "dim": self.dim,
            "m": self.codec.m,
            "nbits": self.codec.nbits,
            "packed": self.packed,
            "stats": self.stats,
        }
        with open(os.path.join(index_dir, _META_FILENAME), "w") as f:
            json.dump(meta, f, indent=2)

    @classmethod
    def load(cls, index_dir: str, *, mmap: bool = True) -> "PQIndex":
        meta_path = os.path.join(index_dir, _META_FILENAME)
        if not os.path.exists(meta_path):
            raise FileNotFoundError(f"no PQ index at {meta_path}")
        with open(meta_path) as f:
            meta = json.load(f)
        mmap_mode = "r" if mmap else None
        return cls(
            PQCodec.load(index_dir),
            np.load(os.path.join(index_dir, "codes.npy"), mmap_mode=mmap_mode),
            np.load(os.path.join(index_dir, "rowids.npy")),
            stats=meta.get("stats"),
            packed=meta.get("packed", False),
        )


def is_pq_index_dir(index_dir: str) -> bool:
    return os.path.exists(os.path.join(index_dir, _META_FILENAME))
