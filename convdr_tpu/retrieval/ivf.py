"""TPU-native IVF index (FAISS ``IndexIVFFlat`` / ``IndexIVFScalarQuantizer``).

The reference's retrieval backend is FAISS (/root/reference/drivers/
run_convdr_inference.py:157-242); it only ever instantiates the flat index,
but the IVF family is the FAISS capability users reach for when the exact
scan gets too slow or a corpus must serve at low latency. This is the
TPU-first redesign of that family:

  * the coarse quantizer is MXU k-means (:mod:`convdr_tpu.ops.kmeans`);
  * inverted lists are a dense ``[nlist, cap, D]`` tensor — every list is a
    CONTIGUOUS fixed-capacity slab, so probing is an XLA gather of whole
    ``cap x D`` slices (hundreds of KB each, HBM-friendly) instead of the
    fine-grained row gathers that measured latency-bound on v5e
    (ops/pallas_search.py close-out);
  * cluster-size skew is absorbed by VIRTUAL SUB-LISTS, not displacement: a
    cluster of ``l`` rows occupies ``ceil(l / cap)`` fixed-capacity
    sub-lists, its centroid duplicated once per sub-list, so probe
    selection ranks sub-lists directly and big clusters naturally draw
    more of the probe budget (see ``_sublist_layout`` for why the usual
    bounded-capacity spill assignment fails in high dimensions). Memory is
    bounded at corpus + one partial sub-list of padding per cluster;
  * search is one jitted program: sub-centroid scores (queries rank lists
    by inner product, the MIPS convention), top-``nprobe`` via the exact
    grouped top-k, slab gather, batched scoring matmul with f32
    accumulation, and a final exact top-k over the ``nprobe * cap``
    candidates. int8 storage reuses the SQ8 integer-exact contract
    (ops/quant.py): candidate scoring needs no HIGHEST passes.

Approximation contract: every row lives in its nearest cluster's sub-lists;
a query misses a row iff that row's sub-list ranks outside the query's
top-``nprobe`` (``nprobe`` counts SUB-lists; a cluster's sub-lists score
identically and are taken adjacently, so the budget spreads across clusters
proportionally to their mass). With ``nprobe == index.nlist`` every row is
scored and the result set equals the exact flat search (ties may order
differently: candidates are ranked in probe-major order, not global index
order — an ANN, not FlatIP, contract).
"""

from __future__ import annotations

import functools
import json
import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from convdr_tpu.ops.exact_search import NEG_INF, grouped_topk_last_axis
from convdr_tpu.ops.kmeans import assign_top_t, fit_kmeans
from convdr_tpu.ops.pq import PQCodec
from convdr_tpu.ops.quant import Int8Quantizer, quantize_passages
from convdr_tpu.utils.transfer import device_put_chunked

logger = logging.getLogger(__name__)

_META_FILENAME = "ivf_meta.json"


def _pack_rows(emb: np.ndarray, storage_dtype: str) -> np.ndarray:
    """Rows in the index's host representation (int8 handled by caller)."""
    import ml_dtypes

    if storage_dtype == "float32":
        return np.asarray(emb, np.float32)
    if storage_dtype == "bfloat16":
        return np.ascontiguousarray(
            np.asarray(emb).astype(ml_dtypes.bfloat16, copy=False)
        ).view(np.uint16)
    raise ValueError(f"unknown storage_dtype {storage_dtype!r}")


def _sublist_layout(
    assign: np.ndarray, nlist: int, cap: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, dict]:
    """Chop each natural cluster into fixed-capacity SUB-LISTS.

    ``assign`` [N]: each row's nearest-centroid id. A cluster of ``l``
    rows occupies ``ceil(l / cap)`` consecutive sub-lists (the last one
    zero-padded), and the cluster's centroid is DUPLICATED once per
    sub-list, so probe selection ranks sub-lists directly: a big cluster
    presents more (equal-scoring, adjacent) probe targets and naturally
    receives more of the probe budget. Every row stays in its nearest
    cluster — no bounded-capacity displacement. (A capacity-bounded
    greedy with spill-to-next-nearest was tried first and measured: in
    high dimensions the shrunken multi-cluster centroids rank ahead of
    everything for every row, so saturated lists dominate all spill
    choices and displaced rows land in effectively random lists,
    capping recall. Sub-lists remove that failure mode outright.)

    Returns (sub_id [N] int32, slot [N] int32, owner [L] int32 natural
    -cluster id per sub-list, stats). Memory bound: L * cap <= N +
    nlist * cap rows (each cluster wastes < cap pad rows).
    """
    n = assign.shape[0]
    assign = np.asarray(assign, np.int64)
    sizes = np.bincount(assign, minlength=nlist).astype(np.int64)
    n_sub = -(-sizes // cap)  # ceil; empty clusters get no sub-list
    sub_start = np.concatenate([[0], np.cumsum(n_sub)[:-1]])
    total = int(n_sub.sum())
    order = np.argsort(assign, kind="stable")  # cluster-major, row order kept
    cluster_sorted = assign[order]
    cum_rows = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    pos_in_cluster = np.arange(n, dtype=np.int64) - cum_rows[cluster_sorted]
    sub_id = np.empty(n, np.int32)
    slot = np.empty(n, np.int32)
    sub_id[order] = (
        sub_start[cluster_sorted] + pos_in_cluster // cap
    ).astype(np.int32)
    slot[order] = (pos_in_cluster % cap).astype(np.int32)
    owner = np.repeat(np.arange(nlist, dtype=np.int32), n_sub)
    stats = {
        "n_clusters": int(nlist),
        "n_sublists": total,
        "cap": int(cap),
        "pad_rows": int(total * cap - n),
        "pad_frac": float((total * cap - n) / max(total * cap, 1)),
        "max_cluster": int(sizes.max()) if nlist else 0,
        "empty_clusters": int((sizes == 0).sum()),
    }
    return sub_id, slot, owner, stats


def _adc_candidate_scores(
    cand_codes: jnp.ndarray,
    lut: jnp.ndarray,
    ksub: int,
    exact: bool = False,
    packed: bool = False,
) -> jnp.ndarray:
    """ADC scores for per-query gathered PQ candidates.

    cand_codes [Q, C, M] integer codes ([Q, C, M/2] packed nibbles with
    ``packed`` — the unpack fuses into the one-hot, and the gathered
    candidate tensor rides at half the bytes), lut [Q, M, K] f32 ->
    scores [Q, C] f32: sum_m lut[q, m, cand_codes[q, c, m]].

    Unlike the flat scan's QUERY-SHARED one-hot (ops/pq.py), IVF
    candidates differ per query, so the one-hot block is per-query —
    [Q, C, M, K] — and is the memory driver. A q-chunked lax.scan keeps
    the transient ~256 MB; nbits=4 (K=16) keeps its HBM traffic near the
    gathered-candidate traffic itself (nbits=8 pays 16x more one-hot
    bytes — prefer pq4 lists for latency-bound probing). ``exact`` keeps
    f32 operands through the contraction (test parity with
    :func:`convdr_tpu.ops.pq.pq_adc_oracle`).
    """
    qn, c, width = cand_codes.shape
    m = width * 2 if packed else width
    dtype = jnp.float32 if exact else jnp.bfloat16
    precision = jax.lax.Precision.HIGHEST if exact else None
    lut_x = lut.astype(dtype)
    per_q = c * m * ksub * (4 if exact else 2)
    q_chunk = max(1, min(qn, (256 << 20) // max(per_q, 1)))

    def score(codes_c, lut_c):
        if packed:
            from convdr_tpu.ops.pq import unpack_codes_4bit_dev

            codes_c = unpack_codes_4bit_dev(codes_c)
        oh = jax.nn.one_hot(codes_c, ksub, dtype=dtype)  # [qc, C, M, K]
        return jnp.einsum(
            "qcmk,qmk->qc",
            oh,
            lut_c,
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    if q_chunk >= qn:
        return score(cand_codes, lut_x)
    nchunks = -(-qn // q_chunk)
    pad = nchunks * q_chunk - qn
    if pad:
        cand_codes = jnp.pad(cand_codes, ((0, pad), (0, 0), (0, 0)))
        lut_x = jnp.pad(lut_x, ((0, pad), (0, 0), (0, 0)))
    cc = cand_codes.reshape(nchunks, q_chunk, c, width)
    lc = lut_x.reshape(nchunks, q_chunk, m, ksub)
    _, out = jax.lax.scan(lambda _, inp: (None, score(*inp)), None, (cc, lc))
    return out.reshape(nchunks * q_chunk, c)[:qn]


@functools.partial(
    jax.jit, static_argnames=("k", "nprobe", "exact", "packed")
)
def _ivf_search_dev(
    q_probe: jnp.ndarray,
    q_score: jnp.ndarray,
    centroids: jnp.ndarray,
    lists: jnp.ndarray,
    rowids: jnp.ndarray,
    k: int,
    nprobe: int,
    exact: bool = False,
    packed: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fused probe->gather->score->select program.

    q_probe [Q, D] f32 ranks lists by <q, centroid>; q_score scores
    candidates: [Q, D] original rows (float lists), SQ8 int-valued rows
    (int8 lists), or [Q, M, K] ADC tables (uint8 PQ-code lists — the
    IVFPQ composition, scored by :func:`_adc_candidate_scores`; ``packed``
    lists hold 2 nibbles/byte at half the residency + gather traffic).
    Returns (scores [Q, k] desc f32, global row ids [Q, k] int32, -1 pad).
    """
    qn = q_probe.shape[0]
    nlist, cap, d = lists.shape
    cscores = jnp.dot(
        q_probe,
        centroids.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [Q, nlist]
    _, probes = grouped_topk_last_axis(cscores, nprobe)  # [Q, P]
    flat_probes = probes.reshape(-1)
    cand = jnp.take(lists, flat_probes, axis=0).reshape(qn, nprobe * cap, d)
    rid = jnp.take(rowids, flat_probes, axis=0).reshape(qn, nprobe * cap)
    if lists.dtype == jnp.uint8:
        # IVFPQ: d is the code width M (M/2 packed), q_score the LUT
        scores = _adc_candidate_scores(
            cand, q_score, q_score.shape[-1], exact=exact, packed=packed
        )
    elif lists.dtype == jnp.int8:
        # SQ8: int-valued operands make the default-precision bf16 matmul
        # bit-exact integer arithmetic (ops/quant.py module docstring).
        scores = jnp.einsum(
            "qnd,qd->qn",
            cand.astype(jnp.bfloat16),
            q_score.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    else:
        scores = jnp.einsum(
            "qnd,qd->qn",
            cand,
            q_score,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    scores = jnp.where(rid >= 0, scores, NEG_INF)  # mask pad slots
    kk = min(k, nprobe * cap)
    top_s, sel = grouped_topk_last_axis(scores, kk)
    top_i = jnp.take_along_axis(rid, sel, axis=1)
    if kk < k:
        top_s = jnp.pad(top_s, ((0, 0), (0, k - kk)), constant_values=NEG_INF)
        top_i = jnp.pad(top_i, ((0, 0), (0, k - kk)), constant_values=-1)
    top_i = jnp.where(top_s == NEG_INF, -1, top_i)
    return top_s, top_i


class IVFIndex:
    """Inverted-file index over fixed-capacity contiguous lists."""

    def __init__(
        self,
        centroids: np.ndarray,
        lists: np.ndarray,
        rowids: np.ndarray,
        *,
        storage_dtype: Optional[str] = None,
        quantizer: Optional[Int8Quantizer] = None,
        codec: Optional[PQCodec] = None,
        stats: Optional[dict] = None,
        packed: bool = False,
    ):
        if lists.ndim != 3 or rowids.shape != lists.shape[:2]:
            raise ValueError(
                f"lists [K, cap, D] + rowids [K, cap] expected, got "
                f"{lists.shape} / {rowids.shape}"
            )
        if lists.dtype == np.int8 and quantizer is None:
            raise ValueError("int8 lists need their fitted Int8Quantizer")
        if lists.dtype == np.uint8 and codec is None:
            raise ValueError("PQ-code lists need their fitted PQCodec")
        if storage_dtype is None:
            # bfloat16 lists live as uint16 bit patterns on the host/disk
            # (numpy can't serialize ml_dtypes natively); viewed as bf16
            # at device upload. uint8 lists are PQ codes.
            storage_dtype = {
                np.dtype(np.int8): "int8",
                np.dtype(np.uint16): "bfloat16",
                np.dtype(np.float32): "float32",
            }.get(lists.dtype)
            if storage_dtype is None and lists.dtype == np.uint8:
                storage_dtype = f"pq{codec.nbits}"
            if storage_dtype is None:
                raise ValueError(f"cannot infer storage from {lists.dtype}")
        if storage_dtype not in ("float32", "bfloat16", "int8", "pq4", "pq8"):
            raise ValueError(f"unknown storage_dtype {storage_dtype!r}")
        self.storage_dtype = storage_dtype
        is_pq = storage_dtype.startswith("pq")
        if packed and (not is_pq or codec is None or codec.nbits != 4):
            raise ValueError("packed lists are pq4 storage only")
        self.packed = bool(packed)
        dim = codec.dim if is_pq else lists.shape[2]
        if centroids.shape != (lists.shape[0], dim):
            raise ValueError(f"centroids must be [nlist, {dim}]")
        width = (codec.m // 2 if packed else codec.m) if is_pq else None
        if is_pq and lists.shape[2] != width:
            raise ValueError(
                f"PQ lists must be [K, cap, {width}] codes "
                f"(packed={packed}), got {lists.shape}"
            )
        self.centroids = np.ascontiguousarray(centroids, np.float32)
        self.lists = lists
        self.rowids = np.ascontiguousarray(rowids, np.int32)
        self.quantizer = quantizer
        self.codec = codec
        self.stats = dict(stats or {})
        self._dev: Optional[tuple] = None

    # -- geometry -------------------------------------------------------
    @property
    def nlist(self) -> int:
        return self.lists.shape[0]

    @property
    def cap(self) -> int:
        return self.lists.shape[1]

    @property
    def dim(self) -> int:
        """Query/embedding dimensionality (PQ lists store M code bytes)."""
        return self.codec.dim if self.codec is not None else self.lists.shape[2]

    @property
    def ntotal(self) -> int:
        return int((self.rowids >= 0).sum())

    # -- build ----------------------------------------------------------
    @classmethod
    def build(
        cls,
        embeddings: np.ndarray,
        nlist: int,
        *,
        rowids: Optional[np.ndarray] = None,
        storage_dtype: str = "float32",
        slack: float = 1.0,
        iters: int = 20,
        seed: int = 42,
        train_sample: Optional[int] = None,
        centroids: Optional[np.ndarray] = None,
        pq_m: int = 96,
        opq_iters: int = 0,
        pack: bool = False,
    ) -> "IVFIndex":
        """Cluster + pack ``embeddings`` [N, D] into an IVF index.

        ``rowids``: payload id per row (defaults to 0..N-1); what search
        returns. ``slack``: sub-list capacity as a multiple of the mean
        cluster size (smaller = finer probe granularity, more pad rows).
        ``train_sample``: k-means training subsample cap (FAISS trains on
        ~256 points/centroid; None = train on everything). ``centroids``:
        skip training and use these (e.g. fitted on one block of a larger
        corpus). storage_dtype "pq4"/"pq8" packs PQ codes (``pq_m`` bytes
        per row) instead of rows — the FAISS IVFPQ composition; ``pack``
        stores pq4 nibbles 2-per-byte (half the residency + gather
        traffic; the unpack fuses into the ADC one-hot).
        """
        if pack and storage_dtype != "pq4":
            raise ValueError("pack=True is pq4 storage only")
        emb = np.asarray(embeddings)
        n, d = emb.shape
        if rowids is None:
            rowids = np.arange(n, dtype=np.int32)
        rowids = np.asarray(rowids, np.int32)
        if rowids.shape != (n,):
            raise ValueError("rowids must be one id per embedding row")
        if centroids is None:
            centroids = fit_kmeans(
                emb.astype(np.float32, copy=False),
                nlist,
                iters=iters,
                seed=seed,
                sample_max=train_sample,
            )
        centroids = np.asarray(centroids, np.float32)
        if centroids.shape != (nlist, d):
            raise ValueError(f"centroids [{nlist}, {d}] expected")
        cap = int(np.ceil(slack * n / nlist))
        cap = max(8, -(-cap // 8) * 8)  # multiple of 8 (sublane-friendly)
        assign = assign_top_t(emb, centroids, t=1)[:, 0]
        sub_id, slot, owner, stats = _sublist_layout(assign, nlist, cap)
        logger.info("ivf build: %s", stats)

        quantizer = None
        codec = None
        if storage_dtype == "int8":
            quantizer = Int8Quantizer.fit(np.asarray(emb, np.float32))
            packed_src = quantize_passages(
                np.asarray(emb, np.float32), quantizer.scales
            )
        elif storage_dtype in ("pq4", "pq8"):
            codec = PQCodec.fit(
                np.asarray(emb, np.float32),
                pq_m,
                int(storage_dtype[2]),
                iters=iters,
                seed=seed,
                sample_max=train_sample,
                opq_iters=opq_iters,
            )
            packed_src = codec.encode(np.asarray(emb, np.float32))
            if pack:
                from convdr_tpu.ops.pq import pack_codes_4bit

                packed_src = pack_codes_4bit(packed_src)
        else:
            packed_src = _pack_rows(emb, storage_dtype)

        n_sub = stats["n_sublists"]
        flat = np.zeros((n_sub * cap, packed_src.shape[1]), packed_src.dtype)
        flat_ids = np.full(n_sub * cap, -1, np.int32)
        pos = sub_id.astype(np.int64) * cap + slot
        flat[pos] = packed_src
        flat_ids[pos] = rowids
        return cls(
            centroids[owner],  # one (duplicated) centroid per sub-list
            flat.reshape(n_sub, cap, packed_src.shape[1]),
            flat_ids.reshape(n_sub, cap),
            storage_dtype=storage_dtype,
            quantizer=quantizer,
            codec=codec,
            stats=stats,
            packed=pack,
        )

    @classmethod
    def build_from_blocks(
        cls,
        ann_data_dir: str,
        nlist: int,
        *,
        storage_dtype: str = "float32",
        slack: float = 1.0,
        iters: int = 20,
        seed: int = 42,
        train_sample: Optional[int] = None,
        max_blocks: Optional[int] = None,
        pq_m: int = 96,
        opq_iters: int = 0,
        pack: bool = False,
    ) -> "IVFIndex":
        """Build from on-disk embedding blocks (gen_passage_embeddings
        output), RAM-bounded: two streaming passes over the block files
        hold at most one float block + the packed index in memory.

        Pass 1 fits centroids on block 0 (an unbiased ``i % num_blocks``
        round-robin shard — the same sample convention the searcher's SQ8
        fit uses) and assigns every row its nearest cluster; pass 2
        re-reads the blocks and packs rows into the sub-list tensor. Row
        payloads are each block's emb2offset values, so search returns
        token-cache offsets exactly like ``BlockedSearcher.search_blocks``.
        int8 block files reuse their ``int8_scales.npy`` sidecar (rows are
        packed bit-identical, never re-quantized; "pq4"/"pq8" encode the
        dequantized rows). For PQ storage the codec trains on an evenly
        strided row sample accumulated across pass-1 blocks (bounded at
        the training target, so RAM stays one block + the sample).
        """
        from convdr_tpu.retrieval.blocks import iter_embedding_blocks

        if storage_dtype not in (
            "float32", "bfloat16", "int8", "pq4", "pq8"
        ):
            raise ValueError(f"unknown storage_dtype {storage_dtype!r}")
        if pack and storage_dtype != "pq4":
            raise ValueError("pack=True is pq4 storage only")
        is_pq = storage_dtype.startswith("pq")
        pq_fit_target = (
            (train_sample or 256 * (1 << int(storage_dtype[2])))
            if is_pq else 0
        )
        centroids = None
        quantizer = None
        codec = None
        pq_sample: list = []
        pq_sample_rows = 0
        assigns: list = []
        offsets: list = []
        sizes: list = []
        for block_id, emb, emb2offset in iter_embedding_blocks(
            ann_data_dir, max_blocks=max_blocks
        ):
            if emb.shape[0] == 0:
                sizes.append(0)
                continue
            if emb.dtype == np.int8:
                if storage_dtype != "int8" and not is_pq:
                    raise ValueError(
                        "int8 block files can only build an int8 or PQ "
                        "index (the original float rows are gone)"
                    )
                if quantizer is None:
                    quantizer = Int8Quantizer.load(ann_data_dir)
                femb = emb.astype(np.float32) * quantizer.scales[None, :]
            else:
                femb = np.asarray(emb, np.float32)
            if centroids is None:
                centroids = fit_kmeans(
                    femb, nlist, iters=iters, seed=seed,
                    sample_max=train_sample,
                )
                if storage_dtype == "int8" and quantizer is None:
                    quantizer = Int8Quantizer.fit(femb)
            if is_pq and pq_sample_rows < pq_fit_target:
                stride = max(1, femb.shape[0] // pq_fit_target)
                take = femb[::stride][: pq_fit_target - pq_sample_rows]
                pq_sample.append(np.array(take))
                pq_sample_rows += take.shape[0]
            assigns.append(assign_top_t(femb, centroids, t=1)[:, 0])
            off = np.asarray(emb2offset, np.int64)
            if off.size and off.max() >= 2**31:
                raise ValueError("emb2offset exceeds int32 payload range")
            offsets.append(off.astype(np.int32))
            sizes.append(emb.shape[0])
            logger.info(
                "ivf pass1 block %d: %d rows assigned", block_id, emb.shape[0]
            )
        if centroids is None:
            raise FileNotFoundError(
                f"No embedding blocks found in {ann_data_dir}"
            )
        if is_pq:
            codec = PQCodec.fit(
                np.concatenate(pq_sample),
                pq_m,
                int(storage_dtype[2]),
                iters=iters,
                seed=seed,
                sample_max=train_sample,
                opq_iters=opq_iters,
            )
            del pq_sample
        assign = np.concatenate(assigns)
        del assigns
        n = assign.shape[0]
        cap = int(np.ceil(slack * n / nlist))
        cap = max(8, -(-cap // 8) * 8)
        sub_id, slot, owner, stats = _sublist_layout(assign, nlist, cap)
        del assign
        logger.info("ivf build: %s", stats)

        host_dtype = {
            "float32": np.float32, "bfloat16": np.uint16, "int8": np.int8,
            "pq4": np.uint8, "pq8": np.uint8,
        }[storage_dtype]
        d = (pq_m // 2 if pack else pq_m) if is_pq else centroids.shape[1]
        n_sub = stats["n_sublists"]
        flat = np.zeros((n_sub * cap, d), host_dtype)
        flat_ids = np.full(n_sub * cap, -1, np.int32)
        rowids = np.concatenate(offsets) if offsets else np.zeros(0, np.int32)
        gstart = 0
        bi = 0
        for block_id, emb, _e2o in iter_embedding_blocks(
            ann_data_dir, max_blocks=max_blocks
        ):
            nb = sizes[bi] if bi < len(sizes) else emb.shape[0]
            bi += 1
            if emb.shape[0] == 0:
                continue
            if is_pq:
                if emb.dtype == np.int8:
                    femb = emb.astype(np.float32) * quantizer.scales[None, :]
                else:
                    femb = emb  # raw rows; encode() handles bf16/uint16
                packed = codec.encode(femb)
                if pack:
                    from convdr_tpu.ops.pq import pack_codes_4bit

                    packed = pack_codes_4bit(packed)
            elif emb.dtype == np.int8:
                packed = emb
            elif storage_dtype == "int8":
                packed = quantize_passages(
                    np.asarray(emb, np.float32), quantizer.scales
                )
            else:
                packed = _pack_rows(emb, storage_dtype)
            pos = (
                sub_id[gstart : gstart + nb].astype(np.int64) * cap
                + slot[gstart : gstart + nb]
            )
            flat[pos] = packed
            flat_ids[pos] = rowids[gstart : gstart + nb]
            gstart += nb
            logger.info(
                "ivf pass2 block %d: %d rows packed", block_id, nb
            )
        return cls(
            centroids[owner],
            flat.reshape(n_sub, cap, d),
            flat_ids.reshape(n_sub, cap),
            storage_dtype=storage_dtype,
            quantizer=quantizer,
            codec=codec,
            stats=stats,
            packed=pack,
        )

    @classmethod
    def from_pq_index(
        cls,
        pq_index,
        ann_data_dir: str,
        nlist: int,
        *,
        slack: float = 1.0,
        iters: int = 20,
        seed: int = 42,
        train_sample: Optional[int] = None,
        max_blocks: Optional[int] = None,
        centroids: Optional[np.ndarray] = None,
    ) -> "IVFIndex":
        """IVFPQ from an already-encoded flat :class:`PQIndex`: reuse its
        codec and code rows verbatim and add only the coarse structure —
        ONE streaming pass over the embedding blocks for the k-means fit
        (block 0, like ``build_from_blocks``) plus per-row assignment,
        then a permutation of the existing codes into the sub-list slab.
        The encode — the dominant build cost at scale (~2 h at 38M rows,
        host-feed bound) — is never repeated; this is the FAISS
        ``add_core`` / precomputed-codes path. ``ann_data_dir`` must hold
        the SAME corpus in the SAME block order the PQIndex was built
        from (validated: row count and per-row payload ids must match).
        ``centroids`` skips the k-means fit (e.g. reuse a saved coarse
        quantizer).
        """
        from convdr_tpu.retrieval.blocks import iter_embedding_blocks

        import ml_dtypes

        codec = pq_index.codec
        cent = None if centroids is None else np.asarray(
            centroids, np.float32
        )
        quantizer = None
        assigns: list = []
        offsets: list = []
        for block_id, emb, emb2offset in iter_embedding_blocks(
            ann_data_dir, max_blocks=max_blocks
        ):
            if emb.shape[0] == 0:
                continue
            if emb.dtype == np.int8:
                if quantizer is None:
                    quantizer = Int8Quantizer.load(ann_data_dir)
                rows = emb.astype(np.float32) * quantizer.scales[None, :]
            else:
                # raw rows: assign_top_t streams f32/bf16/uint16-bit-
                # pattern inputs natively — a host f32 cast of a 38M-scale
                # block (14.6 GB) is pure 1-core waste
                rows = emb
            if cent is None:
                sample = rows
                if train_sample and rows.shape[0] > train_sample:
                    sel = np.random.Generator(np.random.PCG64(seed)).choice(
                        rows.shape[0], size=train_sample, replace=False
                    )
                    sample = rows[sel]
                if sample.dtype == np.uint16:
                    sample = sample.view(ml_dtypes.bfloat16)
                cent = fit_kmeans(
                    np.asarray(sample, np.float32), nlist, iters=iters,
                    seed=seed, sample_max=train_sample,
                )
                del sample
            assigns.append(assign_top_t(rows, cent, t=1)[:, 0])
            offsets.append(np.asarray(emb2offset, np.int64).astype(np.int32))
            logger.info(
                "ivf from_pq pass block %d: %d rows assigned",
                block_id, emb.shape[0],
            )
        if cent is None:
            raise FileNotFoundError(
                f"No embedding blocks found in {ann_data_dir}"
            )
        if cent.shape != (nlist, codec.dim):
            raise ValueError(f"centroids [{nlist}, {codec.dim}] expected")
        rowids = (
            np.concatenate(offsets) if offsets else np.zeros(0, np.int32)
        )
        if rowids.shape[0] != pq_index.ntotal or not np.array_equal(
            rowids, pq_index.rowids
        ):
            raise ValueError(
                f"block files in {ann_data_dir} do not match the PQIndex: "
                f"{rowids.shape[0]} rows / payload ids differ from the "
                f"index's {pq_index.ntotal} (the codes were encoded from "
                "a different corpus or block order)"
            )
        assign = np.concatenate(assigns)
        del assigns, offsets
        n = assign.shape[0]
        cap = int(np.ceil(slack * n / nlist))
        cap = max(8, -(-cap // 8) * 8)
        sub_id, slot, owner, stats = _sublist_layout(assign, nlist, cap)
        del assign
        logger.info("ivf from_pq build: %s", stats)
        width = pq_index.codes.shape[1]
        n_sub = stats["n_sublists"]
        flat = np.zeros((n_sub * cap, width), np.uint8)
        flat_ids = np.full(n_sub * cap, -1, np.int32)
        pos = sub_id.astype(np.int64) * cap + slot
        flat[pos] = pq_index.codes
        flat_ids[pos] = rowids
        return cls(
            cent[owner],
            flat.reshape(n_sub, cap, width),
            flat_ids.reshape(n_sub, cap),
            storage_dtype=f"pq{codec.nbits}",
            codec=codec,
            stats=stats,
            packed=pq_index.packed,
        )

    # -- capacity ---------------------------------------------------------
    #: Resident-bytes budget per device for the uploaded list tensor
    #: (lists + centroids + rowids). A v5e has 15.75 GB usable HBM; the
    #: search transient (gathered candidates, bounded by
    #: ``max_candidate_bytes``) plus XLA scratch need headroom, so the
    #: default refuses above 12 GB. Overridable per instance for
    #: larger-HBM parts.
    max_resident_bytes: int = 12 << 30

    def device_bytes(self) -> int:
        """Device-resident footprint of the uploaded index tensors."""
        return (
            self.lists.nbytes
            + self.centroids.nbytes
            + self.rowids.nbytes
        )

    def _check_capacity(self, n_shards: int = 1) -> None:
        per_dev = self.device_bytes() // n_shards
        if per_dev > self.max_resident_bytes:
            shard_hint = (
                ""
                if n_shards > 1
                else " Shard the index over a device mesh "
                "(search(mesh=...) splits sub-lists across devices),"
            )
            raise MemoryError(
                f"IVF index needs {per_dev / 2**30:.1f} GB resident per "
                f"device ({self.nlist} sub-lists x cap {self.cap} x "
                f"{self.lists.shape[2]} {self.storage_dtype}), above the "
                f"{self.max_resident_bytes / 2**30:.1f} GB budget "
                f"(IVFIndex.max_resident_bytes).{shard_hint} use int8 or "
                "pq4 list storage (4x / 32x smaller), or fall back to the "
                "streamed BlockedSearcher, which has no residency "
                "requirement."
            )

    # -- device binding ---------------------------------------------------
    def _device_arrays(self):
        if self._dev is None:
            import ml_dtypes

            self._check_capacity()

            dtype = {
                "float32": jnp.float32,
                "bfloat16": jnp.bfloat16,
                "int8": jnp.int8,
                "pq4": jnp.uint8,
                "pq8": jnp.uint8,
            }[self.storage_dtype]
            flat = self.lists.reshape(self.nlist * self.cap, -1)
            if flat.dtype == np.uint16:  # bf16 bit patterns (zero-copy)
                flat = flat.view(ml_dtypes.bfloat16)
            lists_dev = device_put_chunked(flat, dtype).reshape(
                self.nlist, self.cap, self.lists.shape[2]
            )
            self._dev = (
                jnp.asarray(self.centroids),
                lists_dev,
                jnp.asarray(self.rowids),
            )
        return self._dev

    def _device_arrays_sharded(self, mesh, axis: str):
        """Sub-lists row-sharded over the mesh ``axis`` (pad sub-lists —
        zero centroid, all rowids -1 — round L up to the axis size)."""
        key = (id(mesh), axis)
        if getattr(self, "_dev_sharded_key", None) == key:
            return self._dev_sharded
        import ml_dtypes
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_shards = int(mesh.shape[axis])
        self._check_capacity(n_shards)
        l_pad = -(-self.nlist // n_shards) * n_shards
        pad = l_pad - self.nlist
        cent = np.zeros((l_pad, self.dim), np.float32)
        cent[: self.nlist] = self.centroids
        lists = self.lists
        rowids = self.rowids
        if pad:
            lists = np.concatenate(
                [
                    lists,
                    np.zeros(
                        (pad, self.cap, lists.shape[2]), lists.dtype
                    ),
                ]
            )
            rowids = np.concatenate(
                [rowids, np.full((pad, self.cap), -1, np.int32)]
            )
        if lists.dtype == np.uint16:
            lists = lists.view(ml_dtypes.bfloat16)
        shard = NamedSharding(mesh, P(axis))
        dtype = {
            "float32": jnp.float32,
            "bfloat16": jnp.bfloat16,
            "int8": jnp.int8,
            "pq4": jnp.uint8,
            "pq8": jnp.uint8,
        }[self.storage_dtype]
        self._dev_sharded = (
            jax.device_put(cent, shard),
            jax.device_put(jnp.asarray(lists, dtype), shard),
            jax.device_put(rowids, shard),
        )
        self._dev_sharded_key = key
        return self._dev_sharded

    # -- search -----------------------------------------------------------
    def search(
        self,
        queries: np.ndarray,
        k: int,
        *,
        nprobe: int = 8,
        max_candidate_bytes: int = 2 << 30,
        mesh=None,
        index_axis: str = "index",
        exact: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """ANN top-k. Returns (scores [Q, k] desc f32, rowids [Q, k] int32).

        ``nprobe`` sub-lists are scored per query; queries are chunked so
        the gathered candidate tensor stays under ``max_candidate_bytes``.
        With a ``mesh``, sub-lists shard over ``index_axis`` and each
        device probes its balanced share of ``nprobe``
        (:func:`convdr_tpu.parallel.sharded_search.sharded_ivf_topk`).
        ``exact`` (PQ lists only): f32/HIGHEST ADC for oracle-parity tests.
        """
        q = np.asarray(queries, np.float32)
        if q.ndim != 2 or q.shape[1] != self.dim:
            raise ValueError(f"queries must be [Q, {self.dim}]")
        nprobe = max(1, min(nprobe, self.nlist))
        if self.storage_dtype == "int8":
            q_score, tq = self.quantizer.quantize_queries(q)
        elif self.codec is not None:
            q_score, tq = self.codec.lut(q), None  # [Q, M, K] ADC tables
        else:
            q_score, tq = q, None
        itemsize = {
            "float32": 4, "bfloat16": 2, "int8": 1, "pq4": 1, "pq8": 1,
        }[self.storage_dtype]
        width = self.lists.shape[2]
        per_query = nprobe * self.cap * width * itemsize
        chunk = max(1, int(max_candidate_bytes // max(per_query, 1)))
        if mesh is not None:
            from convdr_tpu.parallel.sharded_search import sharded_ivf_topk

            cent, lists_dev, rid_dev = self._device_arrays_sharded(
                mesh, index_axis
            )
        else:
            cent, lists_dev, rid_dev = self._device_arrays()
        out_s, out_i = [], []
        for lo in range(0, q.shape[0], chunk):
            hi = min(q.shape[0], lo + chunk)
            if mesh is not None:
                s, i = sharded_ivf_topk(
                    mesh,
                    jnp.asarray(q[lo:hi]),
                    jnp.asarray(q_score[lo:hi]),
                    cent,
                    lists_dev,
                    rid_dev,
                    k,
                    nprobe,
                    axis=index_axis,
                    packed=self.packed,
                )
            else:
                s, i = _ivf_search_dev(
                    jnp.asarray(q[lo:hi]),
                    jnp.asarray(q_score[lo:hi]),
                    cent,
                    lists_dev,
                    rid_dev,
                    k,
                    nprobe,
                    exact=exact,
                    packed=self.packed,
                )
            s, i = np.asarray(s), np.asarray(i)
            if tq is not None:
                s = np.where(
                    i >= 0, s * tq[lo:hi], NEG_INF
                ).astype(np.float32)
            out_s.append(s)
            out_i.append(i)
        return np.concatenate(out_s), np.concatenate(out_i)

    def rescore(
        self,
        ann_data_dir: str,
        queries: np.ndarray,
        cand_ids: np.ndarray,
        k: int,
        *,
        max_blocks: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Refine candidates at O(candidates) disk cost when the block
        directory supports random access (native .cnb or protocol-4 pickle
        blocks — retrieval/refine.py), falling back to the one-pass
        streaming :meth:`rescore_block_pass` otherwise. Outputs are
        bit-identical either way. The RefineStore (id maps + payload
        offsets) is cached per directory across calls."""
        store = self._refine_store(ann_data_dir, max_blocks)
        if store is not None:
            return store.refine_by_value(queries, cand_ids, k)
        return self.rescore_block_pass(
            ann_data_dir, queries, cand_ids, k, max_blocks=max_blocks
        )

    def _refine_store(self, ann_data_dir: str, max_blocks):
        from convdr_tpu.retrieval.refine import cached_refine_store

        return cached_refine_store(self, ann_data_dir, max_blocks)

    def rescore_block_pass(
        self,
        ann_data_dir: str,
        queries: np.ndarray,
        cand_ids: np.ndarray,
        k: int,
        *,
        max_blocks: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Re-rank IVF candidates against rows streamed from block files.

        The FAISS ``IndexIVFPQ`` + ``IndexRefineFlat`` composition — the
        capability the reference reaches through its FAISS dependency
        beyond /root/reference/drivers/run_convdr_inference.py:353 — at
        one-sequential-disk-pass cost: the (codec- or SQ8-approximate)
        IVF scan proposes ``cand_ids`` [Q, C] ROWIDS (emb2offset
        payloads, -1 padded, from :meth:`search` with ``k = factor *
        top_n``), whose true inner products are recomputed here from the
        embedding blocks and the top ``k`` kept.

        Candidates match block rows BY ROWID VALUE (unlike
        ``PQIndex.rescore_block_pass``'s positional contract), so any
        block directory whose emb2offset payloads built the index works,
        regardless of block layout. Duplicate rowids (multi-chunk FirstP
        emits one row per chunk under one offset) score as the max over
        their rows — the reference's chunk-max semantics
        (/root/reference/model/models.py:100-118). int8 block files are
        dequantized with their scales sidecar (refinement then recovers
        SQ8-grade rather than f32-grade ranking — still strictly above
        ADC). Returns (scores [Q, k] f32 desc, rowids [Q, k] int32), ties
        by lower rowid.
        """
        from convdr_tpu.retrieval.blocks import iter_embedding_blocks

        q = np.asarray(queries, np.float32)
        cand = np.asarray(cand_ids, np.int64)
        if q.shape[0] != cand.shape[0]:
            raise ValueError("one candidate row per query expected")
        scores = np.full(cand.shape, NEG_INF, np.float32)
        valid = cand >= 0
        quantizer = None
        saw_block = False
        for block_id, emb, emb2offset in iter_embedding_blocks(
            ann_data_dir, max_blocks=max_blocks
        ):
            saw_block = True
            if emb.shape[0] == 0:
                continue
            offs = np.asarray(emb2offset, np.int64)
            order = np.argsort(offs, kind="stable")
            sorted_offs = offs[order]
            left = np.searchsorted(sorted_offs, cand, side="left")
            right = np.searchsorted(sorted_offs, cand, side="right")
            hit = valid & (right > left)
            if not hit.any():
                continue
            if emb.dtype == np.int8 and quantizer is None:
                quantizer = Int8Quantizer.load(ann_data_dir)

            def block_rows(flat_pos):
                rows = emb[order[flat_pos]]
                if rows.dtype == np.int8:
                    return rows.astype(np.float32) * quantizer.scales[None, :]
                return np.asarray(rows, np.float32)

            qi, slot = np.nonzero(hit)
            rows = block_rows(left[qi, slot])  # first row per rowid
            s = np.einsum("cd,cd->c", rows, q[qi], dtype=np.float32)
            np.maximum.at(scores, (qi, slot), s)
            # multi-chunk: extra rows under the same rowid, max-combined
            # (einsum like the first-row batch, so every row's score is
            # computed with identical numerics — RefineStore.refine_by_value
            # relies on this for bit-parity, max being order-independent)
            extra = hit & (right - left > 1)
            for eq, es in zip(*np.nonzero(extra)):
                for r in range(left[eq, es] + 1, right[eq, es]):
                    s2 = np.einsum(
                        "cd,cd->c",
                        block_rows(np.array([r])),
                        q[eq][None, :],
                        dtype=np.float32,
                    )[0]
                    scores[eq, es] = max(scores[eq, es], s2)
        if not saw_block:
            raise FileNotFoundError(
                f"No embedding blocks found in {ann_data_dir}"
            )
        missed = int((valid & (scores == NEG_INF)).sum())
        if missed:
            raise ValueError(
                f"{missed} candidate rowids never appeared in "
                f"{ann_data_dir}'s emb2offset payloads — these blocks are "
                "not the ones this index was built from"
            )
        # exact ranking of the candidate set; ties (score desc, rowid asc)
        # — the SAME tail as RefineStore (the bit-parity contract between
        # the streaming and random-access paths lives in one place)
        from convdr_tpu.retrieval.refine import rank_candidate_tail

        return rank_candidate_tail(scores, cand, k)

    # -- persistence --------------------------------------------------------
    def save(self, index_dir: str) -> None:
        os.makedirs(index_dir, exist_ok=True)
        np.save(os.path.join(index_dir, "centroids.npy"), self.centroids)
        np.save(os.path.join(index_dir, "lists.npy"), self.lists)
        np.save(os.path.join(index_dir, "rowids.npy"), self.rowids)
        if self.quantizer is not None:
            self.quantizer.save(index_dir)
        if self.codec is not None:
            self.codec.save(index_dir)
        meta = {
            "nlist": self.nlist,
            "cap": self.cap,
            "dim": self.dim,
            "ntotal": self.ntotal,
            "storage_dtype": self.storage_dtype,
            "packed": self.packed,
            "stats": self.stats,
        }
        with open(os.path.join(index_dir, _META_FILENAME), "w") as f:
            json.dump(meta, f, indent=2)

    @classmethod
    def load(cls, index_dir: str, *, mmap: bool = True) -> "IVFIndex":
        with open(os.path.join(index_dir, _META_FILENAME)) as f:
            meta = json.load(f)
        mmap_mode = "r" if mmap else None
        lists = np.load(
            os.path.join(index_dir, "lists.npy"), mmap_mode=mmap_mode
        )
        return cls(
            np.load(os.path.join(index_dir, "centroids.npy")),
            lists,
            np.load(os.path.join(index_dir, "rowids.npy")),
            storage_dtype=meta["storage_dtype"],
            quantizer=Int8Quantizer.load_optional(index_dir),
            codec=PQCodec.load_optional(index_dir),
            stats=meta.get("stats"),
            packed=meta.get("packed", False),
        )
