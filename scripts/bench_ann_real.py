"""ANN recall on REAL encoder embeddings (VERDICT r3 #7).

All IVF/PQ recall numbers so far come from synthetic gaussian-mixture
corpora (scripts/bench_ivf.py / bench_pq.py). This harness feeds genuine
model embeddings — the blocks a rehearsal run's ``gen_passage_embeddings``
wrote on-chip, plus query embeddings encoded from the rehearsal's eval
topics with the trained checkpoint — through the same recall measurement,
so the synthetic operating points can be compared against the embedding
geometry users actually serve (the regime of the reference's
run_convdr_inference.py:157-242).

Prereq: a completed rehearsal workdir (scripts/rehearsal.py), which leaves
  <workdir>/embeddings/   float32 block files (the real corpus embeddings)
  <workdir>/model/        the trained student checkpoint
  <workdir>/raw/          eval_topics.jsonl
Usage:
  python scripts/rehearsal.py --workdir /tmp/rehearsal        # once
  python scripts/bench_ann_real.py --workdir /tmp/rehearsal
Emits one JSON line per configuration (same fields as bench_ivf/bench_pq).
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
from convdr_tpu.ops.pq import PQCodec, pq_flat_topk
from convdr_tpu.ops.quant import rescore_candidates
from convdr_tpu.retrieval.blocks import iter_embedding_blocks
from convdr_tpu.retrieval.ivf import IVFIndex, _ivf_search_dev
from convdr_tpu.utils.transfer import device_put_chunked

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TOP_K = 100


def timed_loop(fn, iters, *arrays):
    @jax.jit
    def repeat(*arrs):
        def body(i, acc):
            return acc + fn(i, *arrs)
        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(repeat(*arrays))
    t0 = time.perf_counter()
    float(repeat(*arrays))
    return (time.perf_counter() - t0) / iters


def encode_eval_queries(workdir: str, model_type: str, arch_size: str,
                        max_concat_length: int, max_query_length: int):
    """Student query embeddings for the rehearsal eval topics (the real
    serving queries), via the inference driver's encode path. Length caps
    must match the rehearsal's serving point (96/32 defaults) — a wider
    concat cap would pull in MORE history turns than the checkpoint was
    evaluated with."""
    from types import SimpleNamespace

    from convdr_tpu.drivers.run_convdr_inference import encode_queries

    args = SimpleNamespace(
        model_type=model_type,
        arch_size=arch_size,
        gelu="auto",
        dtype="float32",
        query="no_res",
        max_concat_length=max_concat_length,
        max_query_length=max_query_length,
        per_gpu_eval_batch_size=16,
    )
    _qids, embs, _raw = encode_queries(
        args,
        os.path.join(workdir, "model"),
        os.path.join(workdir, "raw", "eval_topics.jsonl"),
        jnp.float32,
    )
    return embs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True,
                    help="a completed scripts/rehearsal.py workdir")
    ap.add_argument("--model_type", default="rdot_nll")
    ap.add_argument("--arch_size", default="base",
                    help="match the rehearsal run (smoke = tiny)")
    ap.add_argument("--nlist", type=int, default=0,
                    help="0 = ~N/64 like the 1M benchmarks")
    ap.add_argument("--nprobes", default="4,8,16,32,64")
    ap.add_argument("--pq_m", type=int, default=96)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--max_concat_length", type=int, default=96,
                    help="match the rehearsal run's serving cap")
    ap.add_argument("--max_query_length", type=int, default=32)
    ap.add_argument("--opq_iters", type=int, default=0,
                    help="also measure an OPQ-rotated pq4 codec "
                    "(real-embedding dims are correlated — the regime "
                    "OPQ exists for)")
    ap.add_argument("--sections", default="ivf,pq,ivfpq",
                    help="comma list of benchmark sections to run")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (debug/smoke only; "
                    "timings are meaningless off-TPU)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    logging.basicConfig(level=logging.INFO)

    # ---- real corpus embeddings from the rehearsal blocks --------------
    ann_dir = os.path.join(args.workdir, "embeddings")
    parts, offs = [], []
    for _b, emb, e2o in iter_embedding_blocks(ann_dir):
        parts.append(np.asarray(emb, np.float32))
        offs.append(np.asarray(e2o, np.int64))
    corpus = np.concatenate(parts)
    del parts
    n_rows, dim = corpus.shape
    queries = encode_eval_queries(
        args.workdir, args.model_type, args.arch_size,
        args.max_concat_length, args.max_query_length,
    ).astype(np.float32)
    q_n = queries.shape[0]
    print(json.dumps({
        "bench": "real_corpus", "n_rows": n_rows, "dim": dim,
        "n_queries": q_n, "source": ann_dir,
    }), flush=True)

    # ---- exact oracle ---------------------------------------------------
    p_dev = device_put_chunked(corpus)
    q_dev = jnp.asarray(queries)
    _, o_i = flat_ip_topk(
        q_dev, p_dev, TOP_K, block_rows=min(n_rows, 524288)
    )
    oracle_sets = [set(np.asarray(o_i)[r].tolist()) for r in range(q_n)]
    del p_dev

    def recall(got):
        return float(np.mean([
            len(set(got[r].tolist()) & oracle_sets[r]) / TOP_K
            for r in range(q_n)
        ]))

    nlist = args.nlist or max(64, n_rows // 64)
    nprobes = [int(x) for x in args.nprobes.split(",")]
    sections = set(args.sections.split(","))

    if "ivf" in sections:
        _bench_ivf_int8(args, corpus, queries, q_dev, recall, nlist, nprobes)
    if "pq" in sections:
        _bench_flat_pq(args, corpus, queries, recall, dim, n_rows, q_n)
    if "ivfpq" in sections:
        _bench_ivfpq(args, corpus, queries, q_dev, recall, nlist, nprobes,
                     dim, n_rows, q_n)


def _bench_ivf_int8(args, corpus, queries, q_dev, recall, nlist, nprobes):
    n_rows = corpus.shape[0]
    q_n = queries.shape[0]
    idx = IVFIndex.build(
        corpus, nlist, storage_dtype="int8", slack=1.25, iters=15, seed=0,
        train_sample=min(n_rows, 262144),
    )
    cent, lists_dev, rid_dev = idx._device_arrays()
    q_score, _tq = idx.quantizer.quantize_queries(queries)
    q_score = jnp.asarray(q_score)
    for nprobe in nprobes:
        _s, i = _ivf_search_dev(
            q_dev, q_score, cent, lists_dev, rid_dev, TOP_K, nprobe
        )

        def body(it, qp, qsc, ce, li, ri, nprobe=nprobe):
            eps = it.astype(jnp.float32) * 1e-8
            bs, bi = _ivf_search_dev(
                qp + eps, qsc + eps, ce, li, ri, TOP_K, nprobe
            )
            return bs[0, 0] + bi[0, 0].astype(jnp.float32)

        dt = timed_loop(
            body, args.iters, q_dev, q_score, cent, lists_dev, rid_dev
        )
        print(json.dumps({
            "bench": "ivf_real", "n_rows": n_rows, "nlist": nlist,
            "storage": "int8", "Q": q_n, "nprobe": nprobe,
            "ms_per_batch": round(dt * 1e3, 3),
            "qps": round(q_n / dt, 1),
            "recall_at_100": round(recall(np.asarray(i)), 4),
        }), flush=True)


def _bench_flat_pq(args, corpus, queries, recall, dim, n_rows, q_n):
    # ---- flat PQ (pq4 + pq8, plain and OPQ) ------------------------------
    # OPQ was closed as not-worth-it on the SYNTHETIC mixture (+0.002 at
    # pq4); real embedding dims are correlated (learned features), the
    # regime a rotation can actually help — measure it where it matters.
    for nbits in (4, 8):
        for opq_iters in (0, args.opq_iters):
            if nbits == 8 and opq_iters:
                continue  # pq8+OPQ measured once on synthetic; keep runs short
            m = args.pq_m if dim % args.pq_m == 0 else dim // 8
            codec = PQCodec.fit(
                corpus, m, nbits, iters=15, seed=0, opq_iters=opq_iters
            )
            codes_dev = device_put_chunked(codec.encode(corpus), jnp.uint8)
            lut = jnp.asarray(codec.lut(queries))
            for k_cand in (TOP_K, 5 * TOP_K):
                _, i = pq_flat_topk(lut, codes_dev, k_cand, codec.ksub)
                print(json.dumps({
                    "bench": "pq_real", "n_rows": n_rows, "m": m,
                    "nbits": nbits, "opq_iters": opq_iters, "Q": q_n,
                    "k_cand": k_cand,
                    "recall_exact_top100": round(recall(np.asarray(i)), 4),
                }), flush=True)
            del codes_dev
            if not args.opq_iters:
                break


def _bench_ivfpq(args, corpus, queries, q_dev, recall, nlist, nprobes,
                 dim, n_rows, q_n):
    # ---- IVFPQ (pq4 lists, plain and OPQ codec) -------------------------
    m = args.pq_m if dim % args.pq_m == 0 else dim // 8
    for opq_iters in (0, args.opq_iters):
        idx = IVFIndex.build(
            corpus, nlist, storage_dtype="pq4", pq_m=m, slack=1.25,
            iters=15, seed=0, train_sample=min(n_rows, 262144),
            opq_iters=opq_iters,
        )
        cent, lists_dev, rid_dev = idx._device_arrays()
        lut = jnp.asarray(idx.codec.lut(queries))
        for nprobe in nprobes:
            _s, i = _ivf_search_dev(
                q_dev, lut, cent, lists_dev, rid_dev, TOP_K, nprobe
            )
            print(json.dumps({
                "bench": "ivfpq_real", "n_rows": n_rows, "nlist": nlist,
                "storage": "pq4", "opq_iters": opq_iters, "Q": q_n,
                "nprobe": nprobe,
                "recall_at_100": round(recall(np.asarray(i)), 4),
            }), flush=True)
            # rescore_factor float re-ranking (the recommended IVFPQ
            # lever; rows are in host memory here, so this is the cheap
            # rescore_candidates path, not a block-file pass)
            for factor in (2, 5):
                _cs, ci = _ivf_search_dev(
                    q_dev, lut, cent, lists_dev, rid_dev,
                    factor * TOP_K, nprobe,
                )
                _rs, ri = rescore_candidates(
                    queries, corpus, np.asarray(ci), TOP_K
                )
                print(json.dumps({
                    "bench": "ivfpq_real", "n_rows": n_rows,
                    "nlist": nlist, "storage": "pq4",
                    "opq_iters": opq_iters, "Q": q_n, "nprobe": nprobe,
                    "rescore_factor": factor,
                    "recall_at_100": round(recall(ri), 4),
                }), flush=True)
        del cent, lists_dev, rid_dev, idx
        if not args.opq_iters:
            break


if __name__ == "__main__":
    main()
