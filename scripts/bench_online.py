"""Online serving latency: Q=1 text -> top-100, fused vs two-dispatch.

Measures VERDICT r4 #3's deliverable: end-to-end per-turn latency of the
single-dispatch serving path (retrieval/online.py — encoder forward +
resident-index search in ONE jitted program) against the batch driver's
shape (encode program, host read-back, search program — two dispatches),
on the real v5e through the ~31 ms dispatch tunnel where the second
round-trip is pure floor.

Corpus: 1M x 768 clustered mixture (the bench_ivf geometry), written as
float32 blocks once and cached. Model: base RoBERTa rdot_nll (random
init — latency does not depend on weights), bf16, concat length 256 (the
reference driver's default serving cap). Each backend serves 64 single
turns with distinct histories; reported numbers are p50/p90/p99 of the
full request wall (host tokenize + dispatch + read-back + id map).

Backends: flat f32 / bf16 / int8 resident; IVF-int8 and packed IVFPQ-pq4
(nlist 16384, nprobe 8) resident. Two-dispatch baselines for flat f32 and
IVF-int8 use the same params/operands, so the delta is dispatch count.

Usage: python scripts/bench_online.py [--n_rows 1000000] [--turns 64]
Emits one JSON line per backend.
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
from convdr_tpu.retrieval.ivf import IVFIndex
from convdr_tpu.retrieval.online import OnlineSearcher, history_to_inputs

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DIM = 768
TOP_K = 100


def make_histories(n: int):
    """n distinct 3-turn conversations (token content varies per turn)."""
    subjects = ["throat cancer", "bronze age trade", "lucid dreaming",
                "coral reefs", "rust compilers", "monsoon seasons",
                "jazz harmony", "glacier melt"]
    out = []
    for i in range(n):
        s = subjects[i % len(subjects)]
        out.append([
            f"tell me about {s} case {i}",
            f"what causes it in region {i % 7}",
            f"how is it treated or managed today, variant {i}",
        ])
    return out


def summarize(name: str, lat, extra=None):
    lat = np.asarray(lat)
    rec = {
        "bench": "online_serving", "backend": name,
        "turns": int(lat.shape[0]),
        "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 2),
        "p90_ms": round(float(np.percentile(lat, 90)) * 1e3, 2),
        "p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 2),
        "mean_ms": round(float(lat.mean()) * 1e3, 2),
    }
    rec.update(extra or {})
    print(json.dumps(rec), flush=True)


def serve_loop(searcher, histories):
    searcher.warmup()
    searcher.stats.latencies.clear()
    for h in histories:
        searcher.search(h)
    return searcher.stats.latencies


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_rows", type=int, default=1_000_000)
    ap.add_argument("--turns", type=int, default=64)
    ap.add_argument("--nlist", type=int, default=16384)
    ap.add_argument("--nprobe", type=int, default=8)
    ap.add_argument("--max_concat_length", type=int, default=256)
    ap.add_argument("--n_blocks", type=int, default=4)
    ap.add_argument("--backends",
                    default="flat_f32,flat_bf16,flat_int8,ivf_int8,ivfpq_pq4")
    ap.add_argument("--cache_dir",
                    default=os.path.join(repo, ".bench_cache", "online"))
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    backends = args.backends.split(",")
    histories = make_histories(args.turns)

    # ---- blocks on disk (cached) ---------------------------------------
    blocks_dir = os.path.join(args.cache_dir, f"blocks_{args.n_rows}")
    if load_embedding_block(blocks_dir, 0) is None:
        gen = np.random.Generator(np.random.PCG64(1234))
        n_centers = max(16, args.n_rows // 50)
        centers = gen.standard_normal((n_centers, DIM), dtype=np.float32)
        which = gen.integers(0, n_centers, size=args.n_rows)
        corpus = centers[which] + 0.35 * gen.standard_normal(
            (args.n_rows, DIM), dtype=np.float32
        )
        del centers, which
        rows_per = -(-args.n_rows // args.n_blocks)
        for b in range(args.n_blocks):
            lo, hi = b * rows_per, min(args.n_rows, (b + 1) * rows_per)
            write_embedding_block(
                blocks_dir, b, corpus[lo:hi],
                np.arange(lo, hi, dtype=np.int64),
            )
            print(f"wrote block {b}", file=sys.stderr)
        del corpus

    # ---- index builds (cached) -----------------------------------------
    def built(kind, **kw):
        d = os.path.join(args.cache_dir, f"{kind}_{args.n_rows}_{args.nlist}")
        if not os.path.exists(os.path.join(d, "ivf_meta.json")):
            t0 = time.perf_counter()
            idx = IVFIndex.build_from_blocks(
                blocks_dir, args.nlist, iters=15, seed=0,
                train_sample=262144, slack=1.25, **kw,
            )
            idx.save(d)
            print(json.dumps({
                "bench": "online_index_build", "kind": kind,
                "build_s": round(time.perf_counter() - t0, 1),
            }), flush=True)
            del idx
        return d

    common = dict(
        model_type="rdot_nll",
        top_n=TOP_K,
        max_concat_length=args.max_concat_length,
        dtype=jnp.bfloat16,
    )

    for backend in backends:
        if backend.startswith("flat"):
            storage = {"flat_f32": "float32", "flat_bf16": "bfloat16",
                       "flat_int8": "int8"}[backend]
            searcher = OnlineSearcher.from_blocks(
                None, blocks_dir, storage_dtype=storage, **common
            )
            lat = serve_loop(searcher, histories)
            summarize(backend, lat, {"rows": args.n_rows})

            if backend == "flat_f32":
                # two-dispatch baseline: same params + corpus operand,
                # encode program -> HOST read-back -> search program (the
                # batch driver's serving shape, each jitted separately)
                params = searcher.params
                corpus_dev, _ = searcher._operands
                from convdr_tpu.core.loading import (
                    load_model_and_params,
                    make_apply_fn,
                )

                _c, tok, model, _p = load_model_and_params(
                    "rdot_nll", None, dtype=jnp.bfloat16
                )
                apply_fn = make_apply_fn(model)
                enc = jax.jit(
                    lambda p, ids, m:
                        apply_fn(p, ids, m, True).astype(jnp.float32)
                )
                srch = jax.jit(
                    lambda q, c: flat_ip_topk(
                        q, c, TOP_K, block_rows=min(524288, args.n_rows)
                    )
                )
                rto = searcher._rowid_to_offset
                lat2 = []
                for it, h in enumerate([histories[0]] + histories):
                    t0 = time.perf_counter()  # tokenize in, like search()
                    ids, mask = history_to_inputs(
                        tok, h, max_concat_length=args.max_concat_length
                    )
                    q = np.asarray(
                        enc(params, jnp.asarray(ids), jnp.asarray(mask))
                    )
                    s, i = srch(jnp.asarray(q), corpus_dev)
                    s, i = np.asarray(s), np.asarray(i)
                    _ = np.where(i >= 0, rto[np.clip(i, 0, None)], -1)
                    if it:  # drop the compile turn
                        lat2.append(time.perf_counter() - t0)
                summarize("flat_f32_two_dispatch", lat2,
                          {"rows": args.n_rows})
            del searcher
        elif backend == "ivf_int8":
            d = built("ivf_int8", storage_dtype="int8")
            searcher = OnlineSearcher.from_ivf(
                None, d, nprobe=args.nprobe, **common
            )
            lat = serve_loop(searcher, histories)
            summarize(backend, lat,
                      {"rows": args.n_rows, "nprobe": args.nprobe})

            # two-dispatch baseline: encode program -> host -> the
            # offline IVFIndex.search (its own jitted probe program)
            index = IVFIndex.load(d)
            index._device_arrays()
            from convdr_tpu.core.loading import (
                load_model_and_params,
                make_apply_fn,
            )

            _c, tok, model, _p = load_model_and_params(
                "rdot_nll", None, dtype=jnp.bfloat16
            )
            apply_fn = make_apply_fn(model)
            enc = jax.jit(
                lambda p, ids, m:
                    apply_fn(p, ids, m, True).astype(jnp.float32)
            )
            params = searcher.params
            lat2 = []
            for it, h in enumerate([histories[0]] + histories):
                t0 = time.perf_counter()  # tokenize in, like search()
                ids, mask = history_to_inputs(
                    tok, h, max_concat_length=args.max_concat_length
                )
                q = np.asarray(
                    enc(params, jnp.asarray(ids), jnp.asarray(mask))
                )
                index.search(q, TOP_K, nprobe=args.nprobe)
                if it:
                    lat2.append(time.perf_counter() - t0)
            summarize("ivf_int8_two_dispatch", lat2,
                      {"rows": args.n_rows, "nprobe": args.nprobe})
            del searcher, index
        elif backend == "ivfpq_pq4":
            d = built("ivfpq_pq4", storage_dtype="pq4", pq_m=96, pack=True)
            searcher = OnlineSearcher.from_ivf(
                None, d, nprobe=args.nprobe, **common
            )
            lat = serve_loop(searcher, histories)
            summarize(backend, lat,
                      {"rows": args.n_rows, "nprobe": args.nprobe})
            del searcher
        else:
            raise SystemExit(f"unknown backend {backend}")


if __name__ == "__main__":
    main()
