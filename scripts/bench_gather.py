"""Benchmark candidate-gather implementations on the v5e chip.

Compares, at the 1M-row search operating point (Q=512, block 524288, G=32,
K=101 candidate groups):
  * one-hot MXU gather (current default inside select_from_groupmax)
  * Pallas DMA containing-tile gather (dma_gather_groups)

Timing: in-jit fori_loop + host read-back (CLAUDE.md tunnel methodology).
Big operands passed as arguments, never captured as jit constants.
"""
import argparse
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np

from convdr_tpu.ops.exact_search import _onehot_gather_groups
from convdr_tpu.utils.transfer import device_put_chunked
from convdr_tpu.ops.pallas_search import dma_gather_groups


def timeit(fn, *args, iters=32):
    float(fn(*args))  # compile + warm (host read-back; block_until_ready
    t0 = time.perf_counter()  # does not reliably wait through the tunnel)
    float(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--q", type=int, default=512)
    ap.add_argument("--b", type=int, default=524288)
    ap.add_argument("--k", type=int, default=101)
    ap.add_argument("--group", type=int, default=32)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--k_block", type=int, default=8)
    args = ap.parse_args()
    Q, B, K, G = args.q, args.b, args.k, args.group
    NG = B // G
    gen = np.random.Generator(np.random.PCG64(0))
    scores = gen.standard_normal((Q, B), dtype=np.float32)
    gsel = np.sort(
        gen.integers(0, NG, size=(Q, K)), axis=1
    ).astype(np.int32)

    s_dev = device_put_chunked(scores)
    g_dev = jnp.asarray(gsel)
    iters = args.iters

    @jax.jit
    def run_onehot(s, g):
        s3 = s.reshape(Q, NG, G)

        def body(i, acc):
            gg = jnp.clip(g + i % 2, 0, NG - 1)  # defeat loop hoisting
            cand = _onehot_gather_groups(s3, gg)
            # full reduce: consuming one element would let XLA slice
            # through the einsum and gather a single group (DCE hazard)
            return acc + jnp.max(cand)

        return jax.lax.fori_loop(0, iters, body, 0.0)

    @jax.jit
    def run_dma(s, g):
        def body(i, acc):
            gg = jnp.clip(g + i % 2, 0, NG - 1)
            cand = dma_gather_groups(s, gg, group=G, k_block=args.k_block)
            return acc + jnp.max(cand)

        return jax.lax.fori_loop(0, iters, body, 0.0)

    # correctness: single-shot compare
    got = np.asarray(dma_gather_groups(s_dev, g_dev, group=G,
                                       k_block=args.k_block))
    ref = np.asarray(_onehot_gather_groups(
        s_dev.reshape(Q, NG, G), g_dev))
    np.testing.assert_array_equal(got, ref)
    print("exactness: DMA gather == one-hot gather")

    dt_one = timeit(run_onehot, s_dev, g_dev, iters=iters)
    dt_dma = timeit(run_dma, s_dev, g_dev, iters=iters)
    print(f"one-hot gather: {dt_one*1e3:.3f} ms")
    print(f"DMA gather (k_block={args.k_block}): {dt_dma*1e3:.3f} ms")
    print(f"speedup: {dt_one/dt_dma:.2f}x")


if __name__ == "__main__":
    main()
