"""Headline benchmark: exact FlatIP top-100 query throughput.

BASELINE.json config #1: "exact FlatIP top-100 over a 100k-passage
embedding shard". The reference serves this with FAISS ``IndexFlatIP``
(/root/reference/drivers/run_convdr_inference.py:353); the north-star is
>10x query throughput vs CPU FAISS on TPU. FAISS is not installable here, so
the CPU baseline is the same exact computation (matmul + top-k) through
torch-CPU -- FlatIP search *is* a GEMM + partial sort, so this tracks the
FAISS flat kernel closely.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

N_PASSAGES = 100_000
N_QUERIES = 512
DIM = 768
TOP_K = 100
TPU_ITERS = 128
CPU_ITERS = 3


def bench_tpu(queries: np.ndarray, passages: np.ndarray) -> float:
    """Device-side throughput: the search repeated inside ONE jitted loop.

    Host-side per-call timing measures the dispatch tunnel (~30 ms RTT in
    this environment), not the kernel; serving batches queries far deeper
    than one dispatch per batch, so steady-state device throughput is the
    honest number. Timing is closed by a host read-back of the result.
    """
    import jax
    import jax.numpy as jnp

    from convdr_tpu.ops.exact_search import flat_ip_topk

    q = jnp.asarray(queries)
    p = jnp.asarray(passages)

    block_rows = min(N_PASSAGES, 524288)

    @jax.jit
    def repeat(q, p):
        def body(i, acc):
            # perturb queries so the loop body cannot be hoisted/collapsed
            qq = q + i.astype(jnp.float32) * 1e-8
            s, idx = flat_ip_topk(qq, p, TOP_K, block_rows=block_rows)
            return acc + s[0, 0] + idx[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, TPU_ITERS, body, 0.0)

    float(repeat(q, p))  # compile + warm
    t0 = time.perf_counter()
    float(repeat(q, p))  # read-back closes the timing
    dt = (time.perf_counter() - t0) / TPU_ITERS
    return N_QUERIES / dt


def bench_cpu(queries: np.ndarray, passages: np.ndarray) -> float:
    import torch

    q = torch.from_numpy(queries)
    p = torch.from_numpy(passages).T.contiguous()

    def run():
        scores = q @ p
        return torch.topk(scores, TOP_K, dim=1)

    run()  # warm
    t0 = time.perf_counter()
    for _ in range(CPU_ITERS):
        run()
    dt = (time.perf_counter() - t0) / CPU_ITERS
    return N_QUERIES / dt


def main():
    global N_PASSAGES
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--n_passages", type=int, default=N_PASSAGES,
        help="corpus rows (e.g. 1000000 reproduces the README 1M figure; "
        "the CPU baseline always runs the default 100k config)",
    )
    args = parser.parse_args()

    rng = np.random.RandomState(0)
    baseline = rng.randn(N_PASSAGES, DIM).astype(np.float32)
    queries = rng.randn(N_QUERIES, DIM).astype(np.float32)
    cpu_qps = bench_cpu(queries, baseline)

    N_PASSAGES = args.n_passages
    passages = (
        baseline
        if args.n_passages == baseline.shape[0]
        else rng.randn(args.n_passages, DIM).astype(np.float32)
    )
    tpu_qps = bench_tpu(queries, passages)

    label = f"{args.n_passages // 1000}k"
    print(
        json.dumps(
            {
                "metric": f"flatip_top100_qps_{label}",
                "value": round(tpu_qps, 2),
                "unit": "queries/s",
                "vs_baseline": round(tpu_qps / cpu_qps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
