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
  * capacity is bounded (``slack * N / nlist``), which bounds device memory
    at ``slack`` x corpus regardless of cluster skew. Rows that overflow
    their nearest list spill to their next-nearest list with space
    (``spill_choices`` candidates, then any free list) — a bounded-capacity
    assignment in the spirit of balanced k-means; the builder reports how
    many rows were displaced;
  * search is one jitted program: centroid scores (queries rank lists by
    inner product, the MIPS convention), top-``nprobe`` via the exact
    grouped top-k, slab gather, batched scoring matmul with f32
    accumulation, and a final exact top-k over the ``nprobe * cap``
    candidates. int8 storage reuses the SQ8 integer-exact contract
    (ops/quant.py): candidate scoring needs no HIGHEST passes.

Approximation contract: a query misses a row iff the row's list is outside
the query's top-``nprobe`` probed lists (plus the rare displaced rows). With
``nprobe == nlist`` every row is scored and the result set equals the exact
flat search (ties may order differently: candidates are ranked in
probe-major order, not global index order — an ANN, not FlatIP, contract).
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


def _bounded_assign(
    top: np.ndarray, nlist: int, cap: int
) -> Tuple[np.ndarray, np.ndarray, dict]:
    """Assign each row to one list with at most ``cap`` rows per list.

    ``top`` [N, T]: each row's T nearest lists, nearest first. Greedy
    rounds: in round t, still-unplaced rows try their t-th choice;
    within a round, lower row index wins the remaining slots (stable,
    deterministic). Rows exhausting all T choices take any free slot.
    Returns (listid [N] int32, slot [N] int32, stats).
    """
    n, t_choices = top.shape
    counts = np.zeros(nlist, np.int64)
    listid = np.full(n, -1, np.int32)
    slot = np.full(n, -1, np.int32)
    unplaced = np.arange(n)
    placed_at_choice = np.zeros(t_choices, np.int64)
    for t in range(t_choices):
        if unplaced.size == 0:
            break
        cand = top[unplaced, t].astype(np.int64)
        order = np.argsort(cand, kind="stable")  # lower row index first
        cand_s = cand[order]
        rows_s = unplaced[order]
        # rank of each row within its list group this round
        is_new = np.empty(cand_s.size, bool)
        is_new[0] = True
        np.not_equal(cand_s[1:], cand_s[:-1], out=is_new[1:])
        idx = np.arange(cand_s.size)
        start = np.maximum.accumulate(np.where(is_new, idx, 0))
        rank = idx - start
        accept = rank < (cap - counts[cand_s])
        rows_a = rows_s[accept]
        cand_a = cand_s[accept]
        listid[rows_a] = cand_a.astype(np.int32)
        slot[rows_a] = (counts[cand_a] + rank[accept]).astype(np.int32)
        counts += np.bincount(cand_a, minlength=nlist)
        placed_at_choice[t] = rows_a.size
        unplaced = rows_s[~accept]
    overflow = unplaced.size
    if overflow:
        # any list with space, in list order (total space >= slack*N > N)
        space = cap - counts
        free_list = np.repeat(np.arange(nlist), space)
        cum = np.concatenate([[0], np.cumsum(space)[:-1]])
        free_slot = (
            np.arange(free_list.size)
            - np.repeat(cum, space)
            + np.repeat(counts, space)
        )
        take = unplaced  # arbitrary but deterministic order
        listid[take] = free_list[: take.size].astype(np.int32)
        slot[take] = free_slot[: take.size].astype(np.int32)
    stats = {
        "placed_first_choice": int(placed_at_choice[0]),
        "spilled": int(n - placed_at_choice[0]),
        "displaced_past_choices": int(overflow),
        "max_list": int(counts.max()) if nlist else 0,
        "mean_list": float(n / nlist),
    }
    return listid, slot, stats


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def _ivf_search_dev(
    q_probe: jnp.ndarray,
    q_score: jnp.ndarray,
    centroids: jnp.ndarray,
    lists: jnp.ndarray,
    rowids: jnp.ndarray,
    k: int,
    nprobe: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fused probe->gather->score->select program.

    q_probe [Q, D] f32 ranks lists by <q, centroid>; q_score [Q, D] scores
    candidates (original rows, or SQ8 int-valued rows for int8 lists).
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
    if lists.dtype == jnp.int8:
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
        stats: Optional[dict] = None,
    ):
        if lists.ndim != 3 or rowids.shape != lists.shape[:2]:
            raise ValueError(
                f"lists [K, cap, D] + rowids [K, cap] expected, got "
                f"{lists.shape} / {rowids.shape}"
            )
        if centroids.shape != (lists.shape[0], lists.shape[2]):
            raise ValueError("centroids must be [nlist, D]")
        if lists.dtype == np.int8 and quantizer is None:
            raise ValueError("int8 lists need their fitted Int8Quantizer")
        if storage_dtype is None:
            # bfloat16 lists live as uint16 bit patterns on the host/disk
            # (numpy can't serialize ml_dtypes natively); viewed as bf16
            # at device upload.
            storage_dtype = {
                np.dtype(np.int8): "int8",
                np.dtype(np.uint16): "bfloat16",
                np.dtype(np.float32): "float32",
            }.get(lists.dtype)
            if storage_dtype is None:
                raise ValueError(f"cannot infer storage from {lists.dtype}")
        if storage_dtype not in ("float32", "bfloat16", "int8"):
            raise ValueError(f"unknown storage_dtype {storage_dtype!r}")
        self.storage_dtype = storage_dtype
        self.centroids = np.ascontiguousarray(centroids, np.float32)
        self.lists = lists
        self.rowids = np.ascontiguousarray(rowids, np.int32)
        self.quantizer = quantizer
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
        return self.lists.shape[2]

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
        slack: float = 1.25,
        spill_choices: int = 4,
        iters: int = 20,
        seed: int = 42,
        train_sample: Optional[int] = None,
        centroids: Optional[np.ndarray] = None,
    ) -> "IVFIndex":
        """Cluster + pack ``embeddings`` [N, D] into an IVF index.

        ``rowids``: payload id per row (defaults to 0..N-1); what search
        returns. ``train_sample``: k-means training subsample cap (FAISS
        trains on ~256 points/centroid; None = train on everything).
        ``centroids``: skip training and use these (e.g. fitted on one
        block of a larger corpus).
        """
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
        top = assign_top_t(emb, centroids, t=min(spill_choices, nlist))
        listid, slot, stats = _bounded_assign(top, nlist, cap)
        logger.info("ivf build: %s (cap=%d)", stats, cap)

        quantizer = None
        if storage_dtype == "int8":
            quantizer = Int8Quantizer.fit(np.asarray(emb, np.float32))
            packed_src = quantize_passages(
                np.asarray(emb, np.float32), quantizer.scales
            )
        else:
            packed_src = _pack_rows(emb, storage_dtype)

        flat = np.zeros((nlist * cap, d), packed_src.dtype)
        flat_ids = np.full(nlist * cap, -1, np.int32)
        pos = listid.astype(np.int64) * cap + slot
        flat[pos] = packed_src
        flat_ids[pos] = rowids
        lists = flat.reshape(nlist, cap, d)
        return cls(
            centroids,
            lists,
            flat_ids.reshape(nlist, cap),
            storage_dtype=storage_dtype,
            quantizer=quantizer,
            stats=stats,
        )

    @classmethod
    def build_from_blocks(
        cls,
        ann_data_dir: str,
        nlist: int,
        *,
        storage_dtype: str = "float32",
        slack: float = 1.25,
        spill_choices: int = 4,
        iters: int = 20,
        seed: int = 42,
        train_sample: Optional[int] = None,
        max_blocks: Optional[int] = None,
    ) -> "IVFIndex":
        """Build from on-disk embedding blocks (gen_passage_embeddings
        output), RAM-bounded: two streaming passes over the block files
        hold at most one float block + the packed index in memory.

        Pass 1 fits centroids on block 0 (an unbiased ``i % num_blocks``
        round-robin shard — the same sample convention the searcher's SQ8
        fit uses) and assigns every row its ``spill_choices`` nearest
        lists; pass 2 re-reads the blocks and packs rows into the
        fixed-capacity list tensor. Row payloads are each block's
        emb2offset values, so search returns token-cache offsets exactly
        like ``BlockedSearcher.search_blocks``. int8 block files reuse
        their ``int8_scales.npy`` sidecar (rows are packed bit-identical,
        never re-quantized).
        """
        from convdr_tpu.retrieval.blocks import iter_embedding_blocks

        if storage_dtype not in ("float32", "bfloat16", "int8"):
            raise ValueError(f"unknown storage_dtype {storage_dtype!r}")
        centroids = None
        quantizer = None
        tops: list = []
        offsets: list = []
        sizes: list = []
        t_choices = min(spill_choices, nlist)
        for block_id, emb, emb2offset in iter_embedding_blocks(
            ann_data_dir, max_blocks=max_blocks
        ):
            if emb.shape[0] == 0:
                sizes.append(0)
                continue
            if emb.dtype == np.int8:
                if storage_dtype != "int8":
                    raise ValueError(
                        "int8 block files can only build an int8 index "
                        "(the original float rows are gone)"
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
            tops.append(assign_top_t(femb, centroids, t=t_choices))
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
        top = np.concatenate(tops)
        del tops
        n = top.shape[0]
        cap = int(np.ceil(slack * n / nlist))
        cap = max(8, -(-cap // 8) * 8)
        listid, slot, stats = _bounded_assign(top, nlist, cap)
        del top
        logger.info("ivf build: %s (cap=%d)", stats, cap)

        host_dtype = {
            "float32": np.float32, "bfloat16": np.uint16, "int8": np.int8
        }[storage_dtype]
        d = centroids.shape[1]
        flat = np.zeros((nlist * cap, d), host_dtype)
        flat_ids = np.full(nlist * cap, -1, np.int32)
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
            if emb.dtype == np.int8:
                packed = emb
            elif storage_dtype == "int8":
                packed = quantize_passages(
                    np.asarray(emb, np.float32), quantizer.scales
                )
            else:
                packed = _pack_rows(emb, storage_dtype)
            pos = (
                listid[gstart : gstart + nb].astype(np.int64) * cap
                + slot[gstart : gstart + nb]
            )
            flat[pos] = packed
            flat_ids[pos] = rowids[gstart : gstart + nb]
            gstart += nb
            logger.info(
                "ivf pass2 block %d: %d rows packed", block_id, nb
            )
        return cls(
            centroids,
            flat.reshape(nlist, cap, d),
            flat_ids.reshape(nlist, cap),
            storage_dtype=storage_dtype,
            quantizer=quantizer,
            stats=stats,
        )

    # -- device binding ---------------------------------------------------
    def _device_arrays(self):
        if self._dev is None:
            import ml_dtypes

            dtype = {
                "float32": jnp.float32,
                "bfloat16": jnp.bfloat16,
                "int8": jnp.int8,
            }[self.storage_dtype]
            flat = self.lists.reshape(self.nlist * self.cap, self.dim)
            if flat.dtype == np.uint16:  # bf16 bit patterns (zero-copy)
                flat = flat.view(ml_dtypes.bfloat16)
            lists_dev = device_put_chunked(flat, dtype).reshape(
                self.nlist, self.cap, self.dim
            )
            self._dev = (
                jnp.asarray(self.centroids),
                lists_dev,
                jnp.asarray(self.rowids),
            )
        return self._dev

    # -- search -----------------------------------------------------------
    def search(
        self,
        queries: np.ndarray,
        k: int,
        *,
        nprobe: int = 8,
        max_candidate_bytes: int = 2 << 30,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """ANN top-k. Returns (scores [Q, k] desc f32, rowids [Q, k] int32).

        ``nprobe`` lists are scored per query; queries are chunked so the
        gathered candidate tensor stays under ``max_candidate_bytes``.
        """
        q = np.asarray(queries, np.float32)
        if q.ndim != 2 or q.shape[1] != self.dim:
            raise ValueError(f"queries must be [Q, {self.dim}]")
        nprobe = max(1, min(nprobe, self.nlist))
        if self.storage_dtype == "int8":
            q_score, tq = self.quantizer.quantize_queries(q)
        else:
            q_score, tq = q, None
        itemsize = {"float32": 4, "bfloat16": 2, "int8": 1}[
            self.storage_dtype
        ]
        per_query = nprobe * self.cap * self.dim * itemsize
        chunk = max(1, int(max_candidate_bytes // max(per_query, 1)))
        cent, lists_dev, rid_dev = self._device_arrays()
        out_s, out_i = [], []
        for lo in range(0, q.shape[0], chunk):
            hi = min(q.shape[0], lo + chunk)
            s, i = _ivf_search_dev(
                jnp.asarray(q[lo:hi]),
                jnp.asarray(q_score[lo:hi]),
                cent,
                lists_dev,
                rid_dev,
                k,
                nprobe,
            )
            s, i = np.asarray(s), np.asarray(i)
            if tq is not None:
                s = np.where(
                    i >= 0, s * tq[lo:hi], NEG_INF
                ).astype(np.float32)
            out_s.append(s)
            out_i.append(i)
        return np.concatenate(out_s), np.concatenate(out_i)

    # -- persistence --------------------------------------------------------
    def save(self, index_dir: str) -> None:
        os.makedirs(index_dir, exist_ok=True)
        np.save(os.path.join(index_dir, "centroids.npy"), self.centroids)
        np.save(os.path.join(index_dir, "lists.npy"), self.lists)
        np.save(os.path.join(index_dir, "rowids.npy"), self.rowids)
        if self.quantizer is not None:
            self.quantizer.save(index_dir)
        meta = {
            "nlist": self.nlist,
            "cap": self.cap,
            "dim": self.dim,
            "ntotal": self.ntotal,
            "storage_dtype": self.storage_dtype,
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
            stats=meta.get("stats"),
        )
