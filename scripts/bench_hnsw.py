"""HNSW ANN speed/recall record (SURVEY §2.3 N5, reference side path).

The reference's ``DenseHNSWFlatIndexer`` (/root/reference/utils/
dpr_utils.py:156-221) wraps FAISS ``IndexHNSWFlat``; ours is the compact
C++ graph in ``native/hnsw.cpp`` behind the same IP→L2 auxiliary-dimension
conversion. This measures host-side build time and the query-throughput /
recall@k trade against the exact numpy oracle so the optional ANN path has
numbers, not just recall tests.

Host-only (1 CPU core here — sizes kept moderate):
    python scripts/bench_hnsw.py --rows 100000 --dim 768
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from convdr_tpu.retrieval.hnsw import DenseHNSWFlatIndexer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--ef_construction", type=int, default=200)
    ap.add_argument("--ef_search", type=int, default="0",
                    help="0 = sweep 16/64/128/256")
    ap.add_argument(
        "--data", default="clustered", choices=["clustered", "gaussian"],
        help="'clustered' models real encoder embeddings (low-dim cluster "
        "structure; queries near centers). 'gaussian' is iid noise -- the "
        "known ANN worst case at d=768 (distance concentration leaves no "
        "graph structure to exploit; recall is honestly poor there for "
        "FAISS HNSW too)",
    )
    ap.add_argument("--clusters", type=int, default=500)
    ap.add_argument("--threads", type=int, default=1,
                    help="build threads (per-node-lock concurrent insertion); search always fans out over all cores")
    args = ap.parse_args()

    gen = np.random.Generator(np.random.PCG64(0))
    if args.data == "gaussian":
        docs = gen.standard_normal((args.rows, args.dim), dtype=np.float32)
        queries = gen.standard_normal(
            (args.queries, args.dim), dtype=np.float32
        )
    else:
        centers = gen.standard_normal(
            (args.clusters, args.dim), dtype=np.float32
        )
        assign = gen.integers(0, args.clusters, size=args.rows)
        docs = centers[assign] + 0.35 * gen.standard_normal(
            (args.rows, args.dim), dtype=np.float32
        )
        q_assign = gen.integers(0, args.clusters, size=args.queries)
        queries = centers[q_assign] + 0.35 * gen.standard_normal(
            (args.queries, args.dim), dtype=np.float32
        )

    # exact IP oracle
    t0 = time.perf_counter()
    scores = queries @ docs.T
    oracle = np.argpartition(-scores, args.k - 1, axis=1)[:, : args.k]
    t_exact = time.perf_counter() - t0
    print(f"exact host matmul+topk: {t_exact:6.2f} s "
          f"({args.queries / t_exact:7.1f} QPS)", flush=True)

    indexer = DenseHNSWFlatIndexer(
        args.dim, store_n=args.m, ef_construction=args.ef_construction,
        num_threads=args.threads,
    )
    t0 = time.perf_counter()
    indexer.index_data([(i, docs[i]) for i in range(args.rows)])
    t_build = time.perf_counter() - t0
    print(f"hnsw build (M={args.m}, efC={args.ef_construction}): "
          f"{t_build:6.1f} s ({args.rows / t_build:7.0f} docs/s)", flush=True)

    efs = [args.ef_search] if args.ef_search else [16, 64, 128, 256]
    for ef in efs:
        indexer.index.set_ef_search(ef)
        t0 = time.perf_counter()
        results = indexer.search_knn(queries, args.k)
        dt = time.perf_counter() - t0
        hits = sum(
            len(set(int(i) for i in ids) & set(int(j) for j in oracle[r]))
            for r, (ids, _s) in enumerate(results)
        )
        recall = hits / (args.queries * args.k)
        print(f"ef={ef:4d}: {args.queries / dt:8.0f} QPS  "
              f"recall@{args.k}={recall:.4f}", flush=True)


if __name__ == "__main__":
    main()
