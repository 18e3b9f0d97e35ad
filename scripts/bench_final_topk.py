"""Micro-benchmark: exact top-100 over [Q, ~3.2k] candidates with payload.

The final selection stage of the blocked search. Variants:
  * lax.top_k (current)
  * lax.sort 2-operand, slice k
  * approx_max_k (exactness CHECKED, not assumed)
  * bitonic top-k: sorted 2k-blocks + pairwise merges (hand-rolled network)
"""
import argparse
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=64):
    float(fn(*args))  # compile + warm (host read-back; block_until_ready
    t0 = time.perf_counter()  # does not reliably wait through the tunnel)
    float(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--q", type=int, default=512)
    ap.add_argument("--w", type=int, default=3232)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()
    Q, W, K, iters = args.q, args.w, args.k, args.iters
    gen = np.random.Generator(np.random.PCG64(0))
    x_h = gen.standard_normal((Q, W), dtype=np.float32)
    xd = jnp.asarray(x_h)

    def loop(body):
        @jax.jit
        def run(x):
            def step(i, acc):
                xx = x + i.astype(jnp.float32) * 1e-8
                s, idx = body(xx)
                return acc + s[0, 0] + idx[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, step, 0.0)
        return run

    def v_topk(x):
        return jax.lax.top_k(x, K)

    def v_sort(x):
        iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        s, i = jax.lax.sort((-x, iota), num_keys=1)
        return -s[:, :K], i[:, :K]

    def v_approx(x):
        return jax.lax.approx_max_k(x, K, recall_target=0.99,
                                    aggregate_to_topk=True)

    def v_approx_exactish(x):
        return jax.lax.approx_max_k(
            x, K, recall_target=0.9999, aggregate_to_topk=True)

    oracle_s, oracle_i = jax.lax.top_k(jnp.asarray(x_h), K)
    variants = [("lax.top_k", v_topk), ("lax.sort2", v_sort),
                ("approx.99", v_approx), ("approx.9999", v_approx_exactish)]
    for name, body in variants:
        s, i = body(jnp.asarray(x_h))
        s_np = np.asarray(s)
        exact = np.array_equal(np.asarray(oracle_s), s_np) and np.array_equal(
            np.asarray(oracle_i), np.asarray(i))
        seteq = all(
            set(np.asarray(i)[r]) == set(np.asarray(oracle_i)[r])
            for r in range(Q)
        )
        dt = timeit(loop(body), xd, iters=iters) * 1e3
        print(f"{name:12s}: {dt:7.3f} ms  exact={exact} set_equal={seteq}")


if __name__ == "__main__":
    main()
