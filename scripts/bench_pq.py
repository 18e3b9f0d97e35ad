"""PQ ADC-scan benchmark on the real chip.

Measures, at --n_rows x 768:
  * exact flat_ip_topk f32 HIGHEST device-side ms per query batch (the
    baseline + the recall reference);
  * PQ (ops/pq.py) fit + encode wall time, then the resident ADC sweep:
    device-side ms + QPS + two recall figures against the exact f32
    top-100 — direct overlap at k=100 and CANDIDATE recall (exact top-100
    found inside the ADC top-{200,500}, the rescoring serving contract).

Timing is the CLAUDE.md in-jit methodology: a fori_loop whose body
perturbs the queries by the loop index (so nothing hoists/folds), computes
the LUT on device, runs the full ADC scan, and consumes the outputs; the
~31 ms tunnel RTT amortizes across iters.

Usage: python scripts/bench_pq.py --n_rows 1000000 --m 96 --nbits 4 \
           --qs 16,64,512
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
from convdr_tpu.ops.pq import PQCodec, pq_flat_topk
from convdr_tpu.utils.transfer import device_put_chunked

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TOP_K = 100
DIM = 768


def timed_loop(fn, iters, *arrays):
    """Compile body(i, *arrays) -> f32 scalar into a fori_loop; s/iter."""

    @jax.jit
    def repeat(*arrs):
        def body(i, acc):
            return acc + fn(i, *arrs)
        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(repeat(*arrays))  # compile + warm
    t0 = time.perf_counter()
    float(repeat(*arrays))
    return (time.perf_counter() - t0) / iters


def overlap(got, want, k):
    return float(np.mean([
        len(set(got[r].tolist()) & set(want[r][:k].tolist())) / k
        for r in range(got.shape[0])
    ]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_rows", type=int, default=1_000_000)
    ap.add_argument("--m", type=int, default=96)
    ap.add_argument("--nbits", type=int, default=4, choices=[4, 8])
    ap.add_argument("--kmeans_iters", type=int, default=15)
    ap.add_argument("--opq_iters", type=int, default=0)
    ap.add_argument(
        "--packed", action="store_true",
        help="nbits=4 only: store codes 2-per-byte (half the HBM; the "
        "nibble unpack fuses into the ADC one-hot — ops/pq.py "
        "pack_codes_4bit)",
    )
    ap.add_argument("--train_sample", type=int, default=0,
                    help="0 = FAISS default (256 per centroid)")
    ap.add_argument("--qs", default="16,64,512")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--block_rows", type=int, default=1 << 18)
    ap.add_argument("--skip_flat", action="store_true")
    ap.add_argument(
        "--data", default="mixture", choices=["mixture", "gaussian"],
        help="mixture = embedding-like clustered geometry; gaussian = "
        "isotropic (hardest case for PQ: no structure to exploit, "
        "reconstruction error is the quantizer's floor)",
    )
    ap.add_argument("--n_centers", type=int, default=0)
    ap.add_argument("--spread", type=float, default=0.35)
    args = ap.parse_args()

    qs = [int(x) for x in args.qs.split(",")]
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
        _, i = flat_ip_topk(
            flat_q[:q_n], p_dev, TOP_K, block_rows=min(args.n_rows, 524288)
        )
        oracle[q_n] = np.asarray(i)
    if not args.skip_flat:
        for q_n in qs:

            def body(it, qq, pp):
                s, i = flat_ip_topk(
                    qq + it.astype(jnp.float32) * 1e-8, pp, TOP_K,
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
    del p_dev

    # ---- build ----------------------------------------------------------
    t0 = time.perf_counter()
    codec = PQCodec.fit(
        corpus, args.m, args.nbits, iters=args.kmeans_iters, seed=0,
        sample_max=args.train_sample or None, opq_iters=args.opq_iters,
    )
    fit_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    codes = codec.encode(corpus)
    encode_s = time.perf_counter() - t0
    if args.packed:
        from convdr_tpu.ops.pq import pack_codes_4bit

        codes = pack_codes_4bit(codes)
    codes_dev = device_put_chunked(codes, jnp.uint8)
    jax.block_until_ready(codes_dev)
    cb_dev = jnp.asarray(codec.codebooks)
    print(json.dumps({
        "bench": "pq_build", "n_rows": args.n_rows, "m": args.m,
        "nbits": args.nbits, "opq": bool(args.opq_iters),
        "packed": args.packed,
        "fit_s": round(fit_s, 1),
        "encode_s": round(encode_s, 1),
        "code_bytes": int(codes.nbytes),
        "code_gb_per_38m": round(
            38_000_000 * codes.shape[1] / 2**30, 2
        ),
    }), flush=True)

    # ---- sweep ----------------------------------------------------------
    ksub = codec.ksub
    r_dev = (
        jnp.asarray(codec.rotation)
        if codec.rotation is not None
        else jnp.eye(DIM, dtype=jnp.float32)
    )
    for q_n in qs:
        qq = flat_q[:q_n]
        for k_cand in (TOP_K, 2 * TOP_K, 5 * TOP_K):
            _, i = pq_flat_topk(
                jnp.asarray(codec.lut(np.asarray(qq))), codes_dev,
                k_cand, ksub, block_rows=args.block_rows,
                packed=args.packed,
            )
            got = np.asarray(i)
            # fraction of the exact top-100 inside the ADC top-k_cand
            rec = overlap(got, oracle[q_n], TOP_K)
            if k_cand == TOP_K:
                direct = rec

                def body(it, q_in, cds, cb, rot, k_cand=k_cand):
                    q_pert = q_in + it.astype(jnp.float32) * 1e-8
                    # OPQ folds into the LUT as one [Q, D] x [D, D] matmul
                    q_rot = jnp.dot(
                        q_pert, rot,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    lut = jnp.einsum(
                        "qmd,mkd->qmk",
                        q_rot.reshape(q_in.shape[0], args.m, DIM // args.m),
                        cb,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    s, i = pq_flat_topk(
                        lut, cds, TOP_K, ksub, block_rows=args.block_rows,
                        packed=args.packed,
                    )
                    return s[0, 0] + i[0, 0].astype(jnp.float32)

                dt = timed_loop(body, args.iters, qq, codes_dev, cb_dev, r_dev)
            print(json.dumps({
                "bench": "pq", "n_rows": args.n_rows, "m": args.m,
                "nbits": args.nbits, "opq": bool(args.opq_iters),
                "packed": args.packed,
                "Q": q_n, "k_cand": k_cand,
                "recall_exact_top100": round(rec, 4),
                **({"ms_per_batch": round(dt * 1e3, 3),
                    "qps": round(q_n / dt, 1)} if k_cand == TOP_K else {}),
            }), flush=True)


if __name__ == "__main__":
    main()
