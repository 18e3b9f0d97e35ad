"""38M-row IVFPQ: promote the flat pq38m index, sweep, rescore.

Completes the PQ capacity story at the reference's full corpus scale
(/root/reference/README.md:152, 38M rows): the flat 38M PQIndex
(scripts/bench_pq_38m.py) is ADC-exact but scans every code row; this
promotes it to IVFPQ with ``IVFIndex.from_pq_index`` — codec + code rows
reused verbatim, ONE assignment pass instead of the ~2 h re-encode
(FAISS's precomputed-codes ``add_core`` path) — then measures:

  1. promote wall (k-means fit on a block-0 subsample + 38M-row
     streamed assignment + code permutation);
  2. device-side probe sweeps (Q=512, in-jit fori_loop timing) per
     nprobe;
  3. recall@100 vs the cached blocked exact oracle (16 queries,
     bench_pq_38m.blocked_oracle_top100), probe-only and with float
     re-ranking through the candidate-proportional refine
     (``IVFIndex.rescore`` -> retrieval/refine.py): per config the disk
     cost is O(candidates) row preads (~hundreds of KB at 16 queries),
     NOT the ~55 GB full-corpus pass the old ``rescore_block_pass``
     design needed — at 38M this is exactly where the streaming pass
     stops being usable (VERDICT r4 #1/#2). The one-time RefineStore
     open (id maps + payload offsets, ~300 MB of id reads) is timed
     separately.

Isotropic-gaussian caveat: recall here is the PQ codec's worst case AND
IVF probing is degenerate on isotropic corpora (recall ~ nprobe/nlist by
construction, retrieval/ivf.py docstring) — the point of this record is
capacity + throughput at 38M with honest quality accounting; clustered /
real-embedding recall curves live in bench_ivf.py / bench_ann_real.py.

Usage:
  python scripts/bench_pq_38m.py --build_only   # the flat source index
  python scripts/bench_ivfpq_38m.py [--promote_only]
Emits one JSON line per stage.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_pq_38m import blocked_oracle_top100  # noqa: E402
from convdr_tpu.retrieval.ivf import IVFIndex, _ivf_search_dev
from convdr_tpu.retrieval.pq_index import PQIndex

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TOP_K = 100
DIM = 768
N_QUERIES = 512


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks_dir",
                    default=os.path.join(repo, ".bench_cache", "bfloat16"))
    ap.add_argument("--pq_dir",
                    default=os.path.join(repo, ".bench_cache", "pq38m"))
    ap.add_argument("--index_dir", default="")
    ap.add_argument("--nlist", type=int, default=65536)
    ap.add_argument("--slack", type=float, default=1.25)
    ap.add_argument("--kmeans_iters", type=int, default=15)
    ap.add_argument("--train_sample", type=int, default=2_000_000)
    ap.add_argument("--check_queries", type=int, default=16)
    ap.add_argument("--nprobes", default="8,32,128")
    ap.add_argument("--factors", default="0,2,5")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--promote_only", action="store_true")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    index_dir = args.index_dir or os.path.join(
        repo, ".bench_cache", f"ivfpq38m_{args.nlist}"
    )

    # ---- promote (cached) -------------------------------------------------
    if os.path.exists(os.path.join(index_dir, "ivf_meta.json")):
        index = IVFIndex.load(index_dir)
        promote_s = None
    else:
        flat = PQIndex.load(args.pq_dir)
        t0 = time.perf_counter()
        index = IVFIndex.from_pq_index(
            flat, args.blocks_dir, args.nlist,
            slack=args.slack, iters=args.kmeans_iters, seed=0,
            train_sample=args.train_sample,
        )
        promote_s = time.perf_counter() - t0
        del flat
        index.save(index_dir)
    print(json.dumps({
        "bench": "ivfpq38m_promote", "rows": index.ntotal,
        "nlist": args.nlist, "cap": index.cap, "packed": index.packed,
        "list_tensor_gb": round(index.lists.nbytes / 2**30, 3),
        "promote_s": round(promote_s, 1) if promote_s else "cached",
        **{f"assign_{k}": v for k, v in index.stats.items()},
    }), flush=True)
    if args.promote_only:
        return

    rng = np.random.RandomState(7)  # the bench.py --scale query set
    queries = rng.randn(N_QUERIES, DIM).astype(np.float32)
    nprobes = [int(x) for x in args.nprobes.split(",")]
    factors = [int(x) for x in args.factors.split(",")]

    # ---- device-side probe sweeps ------------------------------------------
    cent, lists_dev, rid_dev = index._device_arrays()
    jax.block_until_ready(lists_dev)
    lut_all = jnp.asarray(index.codec.lut(queries))
    q_dev = jnp.asarray(queries)
    packed = index.packed
    for nprobe in nprobes:
        def body(it, qp, qsc, ce, li, ri, nprobe=nprobe):
            eps = it.astype(jnp.float32) * 1e-8
            bs, bi = _ivf_search_dev(
                qp + eps, qsc + eps, ce, li, ri, TOP_K, nprobe,
                packed=packed,
            )
            return bs[0, 0] + bi[0, 0].astype(jnp.float32)

        @jax.jit
        def repeat(*arrs):
            def step(i, acc):
                return acc + body(i, *arrs)
            return jax.lax.fori_loop(0, args.iters, step, 0.0)

        float(repeat(q_dev, lut_all, cent, lists_dev, rid_dev))
        t0 = time.perf_counter()
        float(repeat(q_dev, lut_all, cent, lists_dev, rid_dev))
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "bench": "ivfpq38m_sweep", "rows": index.ntotal, "Q": N_QUERIES,
            "nprobe": nprobe, "ms_per_batch": round(dt * 1e3, 3),
            "device_qps": round(N_QUERIES / dt, 1),
        }), flush=True)
    del cent, lists_dev, rid_dev, lut_all, q_dev

    # ---- quality: probe-only + rescored, one disk pass for all configs ----
    cq = args.check_queries
    if not cq:
        return
    qs = queries[:cq]
    oracle = blocked_oracle_top100(args.blocks_dir, qs)
    oracle_sets = [set(oracle[r].tolist()) for r in range(cq)]

    def recall(ids):
        return float(np.mean([
            len(set(ids[r].tolist()) & oracle_sets[r]) / TOP_K
            for r in range(cq)
        ]))

    t0 = time.perf_counter()
    store = index._refine_store(args.blocks_dir, None)
    open_s = time.perf_counter() - t0
    print(json.dumps({
        "bench": "ivfpq38m_refine_store",
        "open_s": round(open_s, 1),
        "random_access": store is not None,
    }), flush=True)
    for nprobe in nprobes:
        for factor in factors:
            k_cand = max(TOP_K, factor * TOP_K)
            _, ids = index.search(qs, k_cand, nprobe=nprobe)
            if factor == 0:
                print(json.dumps({
                    "bench": "ivfpq38m_recall", "nprobe": nprobe,
                    "rescore_factor": 0, "check_queries": cq,
                    "recall_at_100": round(recall(ids), 4),
                }), flush=True)
                continue
            t0 = time.perf_counter()
            _, got = index.rescore(
                args.blocks_dir, qs, np.asarray(ids, np.int64), TOP_K
            )
            refine_s = time.perf_counter() - t0
            print(json.dumps({
                "bench": "ivfpq38m_recall", "nprobe": nprobe,
                "rescore_factor": factor, "check_queries": cq,
                "recall_at_100": round(recall(got), 4),
                "refine_s": round(refine_s, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
