"""HNSW approximate nearest-neighbor index (DPR-heritage side path).

Parity with the reference's ``DenseHNSWFlatIndexer``
(/root/reference/utils/dpr_utils.py:156-221): an L2 HNSW graph (the compact
C++ implementation in native/hnsw.cpp, FAISS ``IndexHNSWFlat``'s role) plus
the DPR inner-product -> L2 conversion that appends an auxiliary dimension
``sqrt(phi - |v|^2)`` to every document vector and ``0`` to queries
(:178-199, :208-217), so L2-nearest == IP-most-similar. Like the reference,
all data must be indexed in one ``index_data`` call since ``phi`` is a
corpus-wide constant.

The exact TPU search is the production path; this exists for API/capability
parity and host-only deployments.
"""

from __future__ import annotations

import ctypes
import logging
import os
from typing import List, Sequence, Tuple

import numpy as np

from convdr_tpu import native_io

logger = logging.getLogger(__name__)


class HnswIndex:
    """Thin ctypes wrapper over the C++ HNSW (L2 metric)."""

    def __init__(self, dim: int, m: int = 32, ef_construction: int = 200,
                 ef_search: int = 128, seed: int = 42):
        lib = native_io._load()
        if lib is None:
            raise RuntimeError(
                "native library unavailable; HNSW requires the C++ runtime"
            )
        self._lib = lib
        self._configure_signatures()
        self.dim = dim
        self._handle = lib.convdr_hnsw_create(dim, m, ef_construction,
                                              ef_search, seed)

    def _configure_signatures(self) -> None:
        lib = self._lib
        lib.convdr_hnsw_create.restype = ctypes.c_void_p
        lib.convdr_hnsw_create.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64,
        ]
        lib.convdr_hnsw_free.argtypes = [ctypes.c_void_p]
        lib.convdr_hnsw_add.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.convdr_hnsw_size.restype = ctypes.c_int64
        lib.convdr_hnsw_size.argtypes = [ctypes.c_void_p]
        lib.convdr_hnsw_set_ef_search.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.convdr_hnsw_search.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.convdr_hnsw_add_parallel.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.convdr_hnsw_search_parallel.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]

    def __len__(self) -> int:
        return int(self._lib.convdr_hnsw_size(self._handle))

    def add(self, vectors: np.ndarray, num_threads: int = 1) -> None:
        """Insert rows. ``num_threads > 1`` builds concurrently with
        per-node locks (hnswlib-style): same recall contract, but the
        exact graph depends on thread interleaving. The default stays
        single-threaded for bit-reproducible builds (this dev host also
        has one core; multi-core hosts should pass os.cpu_count())."""
        vecs = np.ascontiguousarray(vectors, np.float32)
        assert vecs.shape[1] == self.dim
        ptr = vecs.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        if num_threads > 1:
            self._lib.convdr_hnsw_add_parallel(
                self._handle, ptr, vecs.shape[0], num_threads
            )
        else:
            self._lib.convdr_hnsw_add(self._handle, ptr, vecs.shape[0])

    def set_ef_search(self, ef_search: int) -> None:
        self._lib.convdr_hnsw_set_ef_search(self._handle, ef_search)

    def search(
        self, queries: np.ndarray, k: int, num_threads: int = 0
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batch k-NN. ``num_threads``: 0 = one thread per core (queries
        are independent and the graph immutable, so results are identical
        at any thread count), 1 = serial, N = exactly N."""
        q = np.ascontiguousarray(queries, np.float32)
        nq = q.shape[0]
        dists = np.empty((nq, k), np.float32)
        ids = np.empty((nq, k), np.int64)
        if num_threads == 0:
            num_threads = os.cpu_count() or 1
        self._lib.convdr_hnsw_search_parallel(
            self._handle,
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nq,
            k,
            dists.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            num_threads,
        )
        return dists, ids

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.convdr_hnsw_free(handle)
            self._handle = None


class DenseHNSWFlatIndexer:
    """DPR-compatible ANN indexer: IP similarity over an L2 HNSW graph."""

    def __init__(self, vector_sz: int, buffer_size: int = 50000,
                 store_n: int = 512, ef_search: int = 128,
                 ef_construction: int = 200, num_threads: int = 1):
        self.buffer_size = buffer_size
        # build threads; 1 (default) = deterministic graphs, >1 = hnswlib
        # -style concurrent insertion (recall contract unchanged)
        self.num_threads = num_threads
        self.index_id_to_db_id: List[object] = []
        if store_n > 128:
            logger.warning(
                "store_n=%d as HNSW degree M is large (reference default); "
                "build time and memory grow with M", store_n,
            )
        # +1 auxiliary dimension for the IP->L2 conversion
        self.index = HnswIndex(
            vector_sz + 1,
            m=store_n,
            ef_construction=ef_construction,
            ef_search=ef_search,
        )
        self.phi = 0.0

    def index_data(self, data: Sequence[Tuple[object, np.ndarray]]) -> None:
        if self.phi > 0:
            raise RuntimeError(
                "DPR HNSWF index needs to index all data at once, "
                "results will be unpredictable otherwise."
            )
        phi = 0.0
        for _id, vec in data:
            phi = max(phi, float((np.asarray(vec) ** 2).sum()))
        self.phi = phi

        n = len(data)
        for start in range(0, n, self.buffer_size):
            chunk = data[start : start + self.buffer_size]
            vectors = np.stack(
                [np.asarray(v, np.float32).reshape(-1) for _id, v in chunk]
            )
            norms = (vectors**2).sum(axis=1)
            aux = np.sqrt(np.maximum(phi - norms, 0.0)).astype(np.float32)
            hnsw_vectors = np.concatenate([vectors, aux[:, None]], axis=1)
            self.index_id_to_db_id.extend(_id for _id, _v in chunk)
            self.index.add(hnsw_vectors, num_threads=self.num_threads)
            logger.info("data indexed %d", len(self.index_id_to_db_id))

    def search_knn(
        self, query_vectors: np.ndarray, top_docs: int
    ) -> List[Tuple[List[object], List[float]]]:
        q = np.asarray(query_vectors, np.float32)
        aux = np.zeros((q.shape[0], 1), np.float32)
        scores, indexes = self.index.search(
            np.concatenate([q, aux], axis=1), top_docs
        )
        result = []
        for row_ids, row_scores in zip(indexes, scores):
            db_ids = [
                self.index_id_to_db_id[i] if i >= 0 else None for i in row_ids
            ]
            result.append((db_ids, list(row_scores)))
        return result
