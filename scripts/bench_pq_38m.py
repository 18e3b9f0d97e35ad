"""The 38M-row HBM-resident PQ record (VERDICT r3 #2).

Proves ops/pq.py's flagship claim at flagship scale: the reference's 38M
CAsT corpus (/root/reference/README.md:152) is >100 GB of disk traffic
per sweep for any float representation, but at m=96/nbits=4 PACKED the
codes are 1.7 GB — the whole corpus HBM-resident on one v5e, sweeps never
touch the host after the one-time build.

Pipeline (each stage cached/resumable):
  1. source rows: the bench.py --scale bfloat16 block cache
     (.bench_cache/bfloat16, deterministic PCG64(1000+b) blocks);
  2. PQIndex.build_from_blocks(pack=True) — encode is host-feed bound
     (~1.8 h at 38M through the tunnel); the built index persists under
     --index_dir so sweeps re-run without re-encoding;
  3. device-side 512-query ADC sweeps (in-jit fori_loop timing);
  4. quality: direct recall@100 + candidate recall at 2x/5x (the
     rescoring contract) vs the blocked exact oracle on --check_queries
     queries (numpy, bf16-rounded inputs like bench.py --scale).

NOTE on geometry: the scale cache is ISOTROPIC gaussian — the hardest
case for PQ (no structure to exploit; reconstruction error is the
codec's floor), so the recall figures here are a LOWER bound relative to
clustered/real embeddings (scripts/bench_pq.py --data mixture and
scripts/bench_ann_real.py measure those regimes). The record's point is
capacity + throughput at reference scale with the quality honestly
stated on the worst-case corpus.

Usage:
  python bench.py --scale 38000000 --storage_dtype bfloat16 --gen_only
  python scripts/bench_pq_38m.py [--build_only]
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

from convdr_tpu.ops.pq import pq_flat_topk
from convdr_tpu.retrieval.blocks import iter_embedding_blocks
from convdr_tpu.retrieval.pq_index import PQIndex
from convdr_tpu.utils.transfer import device_put_chunked

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TOP_K = 100
DIM = 768
N_QUERIES = 512


def blocked_oracle_top100(blocks_dir: str, qs: np.ndarray) -> np.ndarray:
    """Exact top-100 rowids [cq, 100] via one blocked numpy pass, cached
    on disk (the 38M pass reads ~55 GB; bench_ivfpq_38m reuses it)."""
    cache = os.path.join(
        blocks_dir, f"oracle_top{TOP_K}_q{qs.shape[0]}.npy"
    )
    if os.path.exists(cache):
        return np.load(cache)
    best_s = best_i = None
    for b, emb, offs in iter_embedding_blocks(blocks_dir):
        scores = qs @ np.asarray(emb, np.float32).T
        part = np.argpartition(-scores, TOP_K - 1, axis=1)[:, :TOP_K]
        ps = np.take_along_axis(scores, part, axis=1)
        pi = np.asarray(offs)[part]
        if best_s is None:
            best_s, best_i = ps, pi
        else:
            cs = np.concatenate([best_s, ps], axis=1)
            ci = np.concatenate([best_i, pi], axis=1)
            keep = np.argpartition(-cs, TOP_K - 1, axis=1)[:, :TOP_K]
            best_s = np.take_along_axis(cs, keep, axis=1)
            best_i = np.take_along_axis(ci, keep, axis=1)
        print(f"oracle block {b} done", file=sys.stderr)
    np.save(cache, best_i)
    return best_i


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks_dir",
                    default=os.path.join(repo, ".bench_cache", "bfloat16"))
    ap.add_argument("--index_dir",
                    default=os.path.join(repo, ".bench_cache", "pq38m"))
    ap.add_argument("--m", type=int, default=96)
    ap.add_argument("--kmeans_iters", type=int, default=15)
    ap.add_argument("--check_queries", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--build_only", action="store_true")
    ap.add_argument("--no_pack", action="store_true",
                    help="store unpacked codes (3.4 GB instead of 1.7)")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    # ---- build (cached) --------------------------------------------------
    if os.path.exists(os.path.join(args.index_dir, "pq_index_meta.json")):
        index = PQIndex.load(args.index_dir)
        build_s = None
    else:
        t0 = time.perf_counter()
        index = PQIndex.build_from_blocks(
            args.blocks_dir, args.m, 4,
            iters=args.kmeans_iters, seed=0, pack=not args.no_pack,
        )
        build_s = time.perf_counter() - t0
        index.save(args.index_dir)
    print(json.dumps({
        "bench": "pq38m_build", "rows": index.ntotal, "m": args.m,
        "nbits": 4, "packed": index.packed,
        "code_tensor_gb": round(index.codes.nbytes / 2**30, 3),
        "build_s": round(build_s, 1) if build_s else "cached",
    }), flush=True)
    if args.build_only:
        return

    # ---- resident sweep ---------------------------------------------------
    rng = np.random.RandomState(7)  # the bench.py --scale query set
    queries = rng.randn(N_QUERIES, DIM).astype(np.float32)
    codes_dev = device_put_chunked(np.asarray(index.codes), jnp.uint8)
    jax.block_until_ready(codes_dev)
    cb_dev = jnp.asarray(index.codec.codebooks)
    qq = jnp.asarray(queries)
    packed = index.packed
    m, ksub = index.codec.m, index.codec.ksub

    def body(it, q_in, cds, cb):
        q_pert = q_in + it.astype(jnp.float32) * 1e-8
        lut = jnp.einsum(
            "qmd,mkd->qmk",
            q_pert.reshape(N_QUERIES, m, DIM // m),
            cb,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        s, i = pq_flat_topk(lut, cds, TOP_K, ksub, packed=packed)
        return s[0, 0] + i[0, 0].astype(jnp.float32)

    @jax.jit
    def repeat(*arrs):
        def step(i, acc):
            return acc + body(i, *arrs)
        return jax.lax.fori_loop(0, args.iters, step, 0.0)

    float(repeat(qq, codes_dev, cb_dev))  # compile + warm
    t0 = time.perf_counter()
    float(repeat(qq, codes_dev, cb_dev))
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "bench": "pq38m_sweep", "rows": index.ntotal, "Q": N_QUERIES,
        "packed": packed,
        "ms_per_batch": round(dt * 1e3, 3),
        "device_qps": round(N_QUERIES / dt, 1),
        "code_hbm_gb": round(index.codes.nbytes / 2**30, 3),
    }), flush=True)

    # ---- quality vs the blocked exact oracle ------------------------------
    cq = args.check_queries
    if not cq:
        return
    lut = jnp.asarray(index.codec.lut(queries[:cq]))
    got = {}
    for k_cand in (TOP_K, 2 * TOP_K, 5 * TOP_K):
        _, i = pq_flat_topk(lut, codes_dev, k_cand, ksub, packed=packed)
        got[k_cand] = np.asarray(i)
    del codes_dev
    best_i = blocked_oracle_top100(args.blocks_dir, queries[:cq])
    oracle_sets = [set(best_i[r].tolist()) for r in range(cq)]
    # rowids are arange offsets in the scale cache: positions == rowids
    for k_cand, ii in got.items():
        rec = float(np.mean([
            len(set(ii[r].tolist()) & oracle_sets[r]) / TOP_K
            for r in range(cq)
        ]))
        print(json.dumps({
            "bench": "pq38m_recall", "rows": index.ntotal,
            "check_queries": cq, "k_cand": k_cand,
            "recall_exact_top100": round(rec, 4),
            "note": "isotropic gaussian corpus = PQ worst case",
        }), flush=True)


if __name__ == "__main__":
    main()
