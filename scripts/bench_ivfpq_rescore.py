"""IVFPQ + rescore_factor end-to-end measurement (VERDICT r3 #1).

The repo's measured IVFPQ contract: pq4 lists give ~139.6k QPS but recall
is CODEC-capped (~0.57 at Q=512, and more probes converge it DOWN toward
flat-ADC ~0.53). The recovery lever is FAISS's IndexRefineFlat
composition: probe with codes, re-rank the top ``factor * k`` candidates
against the original float rows. This script measures that full curve at
--n_rows (default 1M, same PCG64(1234) mixture geometry as
scripts/bench_ivf.py):

  * writes the corpus as float32 embedding blocks (once, cached);
  * builds the IVFPQ index with ``IVFIndex.build_from_blocks`` (cached);
  * per (nprobe, rescore_factor): device-side probe ms (in-jit fori_loop
    methodology), host rescore wall (``rescore_block_pass``, the driver's
    --ivf_dir --rescore_factor path; blocks ride the page cache after the
    first pass), and recall@100 vs the exact f32 search.

Serving economics to read from the output: the ADC probe runs at ~100k+
QPS device-side; the refinement is a HOST streaming pass whose cost is
gather + [Q*C, D] matvecs on this 1-core machine — the recall lift is the
point, the combined QPS is host-bound (scales with host cores, not TPU).

Usage: python scripts/bench_ivfpq_rescore.py [--n_rows 1000000]
Emits one JSON line per configuration.
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

from convdr_tpu.ops.exact_search import flat_ip_topk
from convdr_tpu.retrieval.blocks import load_embedding_block, write_embedding_block
from convdr_tpu.retrieval.ivf import IVFIndex, _ivf_search_dev
from convdr_tpu.utils.transfer import device_put_chunked

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TOP_K = 100
DIM = 768


def timed_loop(fn, iters, *arrays):
    @jax.jit
    def repeat(*arrs):
        def body(i, acc):
            return acc + fn(i, *arrs)
        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(repeat(*arrays))  # compile + warm
    t0 = time.perf_counter()
    float(repeat(*arrays))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_rows", type=int, default=1_000_000)
    ap.add_argument("--nlist", type=int, default=16384)
    ap.add_argument("--pq_m", type=int, default=96)
    ap.add_argument("--slack", type=float, default=1.25)
    ap.add_argument("--kmeans_iters", type=int, default=15)
    ap.add_argument("--train_sample", type=int, default=262144)
    ap.add_argument("--opq_iters", type=int, default=0)
    ap.add_argument("--q", type=int, default=512)
    ap.add_argument("--nprobes", default="4,8,16")
    ap.add_argument("--factors", default="0,2,5")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--n_blocks", type=int, default=4)
    ap.add_argument("--n_centers", type=int, default=0)
    ap.add_argument("--spread", type=float, default=0.35)
    ap.add_argument(
        "--cache_dir",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".bench_cache", "ivfpq_rescore",
        ),
    )
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    gen = np.random.Generator(np.random.PCG64(1234))
    n_centers = args.n_centers or max(16, args.n_rows // 50)
    centers = gen.standard_normal((n_centers, DIM), dtype=np.float32)
    which = gen.integers(0, n_centers, size=args.n_rows)
    corpus = centers[which] + args.spread * gen.standard_normal(
        (args.n_rows, DIM), dtype=np.float32
    )
    near = gen.choice(args.n_rows, size=args.q, replace=False)
    queries = corpus[near] + args.spread * gen.standard_normal(
        (args.q, DIM), dtype=np.float32
    )
    del centers, which

    # ---- blocks on disk (the rescore source; reference block layout) ----
    blocks_dir = os.path.join(args.cache_dir, f"blocks_{args.n_rows}")
    rows_per = -(-args.n_rows // args.n_blocks)
    for b in range(args.n_blocks):
        if load_embedding_block(blocks_dir, b) is not None:
            continue
        lo, hi = b * rows_per, min(args.n_rows, (b + 1) * rows_per)
        write_embedding_block(
            blocks_dir, b, corpus[lo:hi], np.arange(lo, hi, dtype=np.int64)
        )
        print(f"wrote block {b}", file=sys.stderr)

    # ---- exact oracle ---------------------------------------------------
    p_dev = device_put_chunked(corpus)
    _, o_i = flat_ip_topk(
        jnp.asarray(queries), p_dev, TOP_K,
        block_rows=min(args.n_rows, 524288),
    )
    oracle_sets = [set(np.asarray(o_i)[r].tolist()) for r in range(args.q)]
    del p_dev

    # ---- IVFPQ build (cached) -------------------------------------------
    index_dir = os.path.join(
        args.cache_dir,
        f"ivfpq_{args.n_rows}_{args.nlist}_{args.pq_m}_opq{args.opq_iters}",
    )
    if os.path.exists(os.path.join(index_dir, "ivf_meta.json")):
        index = IVFIndex.load(index_dir)
        build_s = None
    else:
        t0 = time.perf_counter()
        index = IVFIndex.build_from_blocks(
            blocks_dir,
            args.nlist,
            storage_dtype="pq4",
            pq_m=args.pq_m,
            slack=args.slack,
            iters=args.kmeans_iters,
            seed=0,
            train_sample=args.train_sample,
            opq_iters=args.opq_iters,
        )
        build_s = time.perf_counter() - t0
        index.save(index_dir)
    print(json.dumps({
        "bench": "ivfpq_build", "n_rows": args.n_rows,
        "nlist": args.nlist, "cap": index.cap, "pq_m": args.pq_m,
        "opq": bool(args.opq_iters),
        "build_s": round(build_s, 1) if build_s else "cached",
        **index.stats,
    }), flush=True)

    cent, lists_dev, rid_dev = index._device_arrays()
    jax.block_until_ready(lists_dev)
    lut_all = jnp.asarray(index.codec.lut(queries))
    q_dev = jnp.asarray(queries)

    for nprobe in [int(x) for x in args.nprobes.split(",")]:
        for factor in [int(x) for x in args.factors.split(",")]:
            k_cand = max(TOP_K, factor * TOP_K)
            s, cand = _ivf_search_dev(
                q_dev, lut_all, cent, lists_dev, rid_dev, k_cand, nprobe
            )
            cand = np.asarray(cand)
            rescore_s = refine_s = None
            if factor > 0:
                # the candidate-proportional refine (retrieval/refine.py,
                # the driver's default) vs the one-pass streaming rescore
                # it replaced — outputs must match bit for bit
                t0 = time.perf_counter()
                _rf, got_f = index.rescore(blocks_dir, queries, cand, TOP_K)
                refine_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                _rs, got = index.rescore_block_pass(
                    blocks_dir, queries, cand, TOP_K
                )
                rescore_s = time.perf_counter() - t0
                assert np.array_equal(got, got_f), "refine != streaming"
            else:
                got = cand[:, :TOP_K]
            recall = float(np.mean([
                len(set(got[r].tolist()) & oracle_sets[r]) / TOP_K
                for r in range(args.q)
            ]))

            def body(it, qp, qsc, ce, li, ri, nprobe=nprobe, k_cand=k_cand):
                eps = it.astype(jnp.float32) * 1e-8
                bs, bi = _ivf_search_dev(
                    qp + eps, qsc + eps, ce, li, ri, k_cand, nprobe
                )
                return bs[0, 0] + bi[0, 0].astype(jnp.float32)

            dt = timed_loop(
                body, args.iters, q_dev, lut_all, cent, lists_dev, rid_dev
            )
            total = dt + (rescore_s or 0.0)
            print(json.dumps({
                "bench": "ivfpq_rescore", "n_rows": args.n_rows,
                "nlist": args.nlist, "Q": args.q, "nprobe": nprobe,
                "rescore_factor": factor,
                "recall_at_100": round(recall, 4),
                "probe_ms_per_batch": round(dt * 1e3, 3),
                "probe_qps": round(args.q / dt, 1),
                **({
                    "rescore_wall_s": round(rescore_s, 3),
                    "refine_wall_s": round(refine_s, 3),
                    "combined_qps_1core_host": round(args.q / total, 1),
                    "combined_qps_refine": round(
                        args.q / (dt + refine_s), 1
                    ),
                } if rescore_s is not None else {}),
            }), flush=True)


if __name__ == "__main__":
    main()
