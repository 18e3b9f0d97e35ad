"""IVF vs exact-scan benchmark on the real chip.

Measures, at --n_rows x 768:
  * exact flat_ip_topk (f32 HIGHEST / bf16 / int8 storage) device-side
    ms per query batch — the baseline the IVF index must beat;
  * IVF (retrieval/ivf.py) over a --nprobe sweep: device-side ms + QPS +
    top-100 recall vs the exact f32 search.

Timing is the CLAUDE.md in-jit methodology: a fori_loop whose body
perturbs the queries by the loop index (so nothing hoists/folds) and
consumes the final top-k outputs, read back once — the ~31 ms tunnel
dispatch RTT amortizes across iters. Host load (e.g. a concurrent block
generation) does not skew these device-side figures.

Usage: python scripts/bench_ivf.py --n_rows 1000000 --nlist 4096 \
           --storage_dtype int8 --qs 16,64,512 --nprobes 4,8,16,32,64
Emits one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from convdr_tpu.ops.exact_search import flat_ip_topk
from convdr_tpu.ops.quant import Int8Quantizer
from convdr_tpu.retrieval.ivf import IVFIndex, _ivf_search_dev
from convdr_tpu.utils.transfer import device_put_chunked

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TOP_K = 100
DIM = 768


def timed_loop(fn, iters, *arrays):
    """Compile body(i, *arrays) -> f32 scalar into a fori_loop; s/iter.

    Arrays pass as jit ARGUMENTS: closing over device buffers would bake
    them into the program as constants (the GB-scale corpus then rides
    the remote-compile request — HTTP 413 through the tunnel)."""

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
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--storage_dtype", default="int8",
                    choices=["float32", "bfloat16", "int8", "pq4", "pq8"])
    ap.add_argument("--pq_m", type=int, default=96,
                    help="PQ code bytes per row (pq4/pq8 lists)")
    ap.add_argument("--opq_iters", type=int, default=0,
                    help="OPQ rotation refinement iters (pq4/pq8 lists)")
    ap.add_argument("--slack", type=float, default=1.25)
    ap.add_argument("--kmeans_iters", type=int, default=15)
    ap.add_argument("--train_sample", type=int, default=262144)
    ap.add_argument("--qs", default="16,64,512")
    ap.add_argument("--nprobes", default="4,8,16,32,64")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--skip_flat", action="store_true")
    ap.add_argument(
        "--data", default="mixture", choices=["mixture", "gaussian"],
        help="mixture = gaussian mixture with queries near corpus points "
        "(embedding-like geometry; ANN recall is meaningful). gaussian = "
        "isotropic noise — the degenerate un-clusterable case where IVF "
        "recall collapses to ~nprobe/nlist by construction",
    )
    ap.add_argument("--n_centers", type=int, default=0,
                    help="mixture centers (0 = n_rows/50)")
    ap.add_argument("--spread", type=float, default=0.35,
                    help="mixture within-cluster sigma / center sigma")
    args = ap.parse_args()

    qs = [int(x) for x in args.qs.split(",")]
    nprobes = [int(x) for x in args.nprobes.split(",")]
    max_q = max(qs)

    gen = np.random.Generator(np.random.PCG64(1234))
    if args.data == "gaussian":
        corpus = gen.standard_normal((args.n_rows, DIM), dtype=np.float32)
        queries = gen.standard_normal((max_q, DIM), dtype=np.float32)
    else:
        n_centers = args.n_centers or max(16, args.n_rows // 50)
        centers = gen.standard_normal((n_centers, DIM), dtype=np.float32)
        which = gen.integers(0, n_centers, size=args.n_rows)
        corpus = centers[which] + args.spread * gen.standard_normal(
            (args.n_rows, DIM), dtype=np.float32
        )
        near = gen.choice(args.n_rows, size=max_q, replace=False)
        queries = corpus[near] + args.spread * gen.standard_normal(
            (max_q, DIM), dtype=np.float32
        )
        del centers, which

    # ---- exact baseline + recall reference -----------------------------
    p_dev = device_put_chunked(corpus)
    oracle = {}
    flat_q = jnp.asarray(queries)
    for q_n in qs:
        s, i = flat_ip_topk(
            flat_q[:q_n], p_dev, TOP_K, block_rows=min(args.n_rows, 524288)
        )
        oracle[q_n] = np.asarray(i)
    if not args.skip_flat:
        for q_n in qs:

            def body(it, qq, pp):
                s, i = flat_ip_topk(
                    qq + it.astype(jnp.float32) * 1e-8,
                    pp,
                    TOP_K,
                    block_rows=min(args.n_rows, 524288),
                )
                return s[0, 0] + i[0, 0].astype(jnp.float32)

            dt = timed_loop(body, args.iters, flat_q[:q_n], p_dev)
            print(json.dumps({
                "bench": "flat", "n_rows": args.n_rows, "Q": q_n,
                "storage": "float32", "precision": "highest",
                "ms_per_batch": round(dt * 1e3, 3),
                "qps": round(q_n / dt, 1),
            }), flush=True)

    # ---- build ----------------------------------------------------------
    t0 = time.perf_counter()
    index = IVFIndex.build(
        corpus,
        args.nlist,
        storage_dtype=args.storage_dtype,
        slack=args.slack,
        iters=args.kmeans_iters,
        seed=0,
        train_sample=args.train_sample,
        pq_m=args.pq_m,
        opq_iters=args.opq_iters,
    )
    build_s = time.perf_counter() - t0
    del p_dev
    cent, lists_dev, rid_dev = index._device_arrays()
    jax.block_until_ready(lists_dev)
    print(json.dumps({
        "bench": "ivf_build", "n_rows": args.n_rows, "nlist": args.nlist,
        "cap": index.cap, "storage": args.storage_dtype,
        "build_s": round(build_s, 1), **index.stats,
    }), flush=True)

    if args.storage_dtype == "int8":
        q_score_all, _tq = index.quantizer.quantize_queries(queries)
    elif args.storage_dtype.startswith("pq"):
        q_score_all = index.codec.lut(queries)  # [Q, M, K] ADC tables
    else:
        q_score_all = queries
    q_score_all = jnp.asarray(q_score_all)

    # ---- sweep ----------------------------------------------------------
    for q_n in qs:
        qq_probe = flat_q[:q_n]
        qq_score = q_score_all[:q_n]
        for nprobe in nprobes:
            row_bytes = {
                "float32": 4 * DIM, "bfloat16": 2 * DIM, "int8": DIM,
                "pq4": args.pq_m, "pq8": args.pq_m,
            }[args.storage_dtype]
            cand_bytes = q_n * nprobe * index.cap * row_bytes
            if cand_bytes > (6 << 30):
                print(json.dumps({
                    "bench": "ivf", "n_rows": args.n_rows, "Q": q_n,
                    "nprobe": nprobe, "skipped": "candidate tensor > 6 GiB",
                }), flush=True)
                continue
            # recall vs the exact f32 search
            s, i = _ivf_search_dev(
                qq_probe, qq_score, cent, lists_dev, rid_dev, TOP_K, nprobe
            )
            got = np.asarray(i)
            recall = float(np.mean([
                len(set(got[r]) & set(oracle[q_n][r])) / TOP_K
                for r in range(q_n)
            ]))

            def body(it, qp, qsc, ce, li, ri, nprobe=nprobe):
                eps = it.astype(jnp.float32) * 1e-8
                s, i = _ivf_search_dev(
                    qp + eps, qsc + eps, ce, li, ri, TOP_K, nprobe,
                )
                return s[0, 0] + i[0, 0].astype(jnp.float32)

            dt = timed_loop(
                body, args.iters,
                qq_probe, qq_score, cent, lists_dev, rid_dev,
            )
            print(json.dumps({
                "bench": "ivf", "n_rows": args.n_rows, "nlist": args.nlist,
                "storage": args.storage_dtype, "Q": q_n, "nprobe": nprobe,
                "ms_per_batch": round(dt * 1e3, 3),
                "qps": round(q_n / dt, 1),
                "recall_at_100": round(recall, 4),
            }), flush=True)


if __name__ == "__main__":
    main()
