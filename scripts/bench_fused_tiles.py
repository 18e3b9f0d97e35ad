"""Tile sweep for the fused Pallas score+groupmax kernel (round-3 item).

Round-2 measured the fused path at 24.6 ms vs XLA 23.1 ms at 524k rows with
T=512 (the sweep died on a timing script that closed over a 1.6 GB
jit-constant -- operands are ARGUMENTS here, CLAUDE.md "Round-3 gotchas").
This finishes the sweep: tile_rows x storage dtype at the production
operating point (Q=512, top-100, HIGHEST), against the XLA
``flat_ip_topk`` reference on identical operands.

VMEM budget per grid step (double-buffered in/out blocks):
  q [Q,D] f32 resident  + 2 x p [T,D] dtype + 2 x s [Q,T] f32 + gmax
  f32:  T=512 -> 1.5 + 3.0 + 2.0 = ~6.6 MB   T=1024 -> ~11.8 MB (tight)
  bf16: T=1024 -> 1.5 + 3.0 + 4.1 = ~8.7 MB  T=2048 -> ~16.9 MB (over)

Usage (TPU):  python scripts/bench_fused_tiles.py --rows 524288
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np

from convdr_tpu.ops.exact_search import flat_ip_topk
from convdr_tpu.ops.pallas_search import pallas_flat_ip_topk
from convdr_tpu.utils.transfer import device_put_chunked


def timeit(fn, *args, iters=16):
    """In-jit loop timing closed by host read-back (the tunnel's
    block_until_ready does not reliably wait)."""

    @jax.jit
    def repeat(*a):
        def body(i, acc):
            qq = a[0] + i.astype(jnp.float32) * 1e-8
            s, idx = fn(qq, *a[1:])
            return acc + s[0, 0] + idx[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(repeat(*args))  # compile + warm
    t0 = time.perf_counter()
    float(repeat(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=524_288)
    ap.add_argument("--q", type=int, default=512)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()
    Q, D, K = args.q, 768, args.k

    gen = np.random.Generator(np.random.PCG64(0))
    q_h = gen.standard_normal((Q, D), dtype=np.float32)
    p_h = gen.standard_normal((args.rows, D), dtype=np.float32)
    qd = jnp.asarray(q_h)
    pd = device_put_chunked(p_h)
    pd.block_until_ready()
    pd_bf16 = jnp.asarray(pd, jnp.bfloat16)
    pd_bf16.block_until_ready()

    # XLA reference on the same operands (both dtypes), at the production
    # scan-block size (the searcher passes 524288; the function's default
    # 65536 costs ~8 extra selection+merge passes here)
    for name, p in (("f32", pd), ("bf16", pd_bf16)):
        dt = timeit(
            lambda qq, pp: flat_ip_topk(qq, pp, K, block_rows=args.rows),
            qd, p, iters=args.iters,
        )
        print(f"xla   {name:5s}            : {dt * 1e3:7.2f} ms "
              f"({Q / dt:8.0f} QPS)", flush=True)

    for name, p, tiles in (
        ("f32", pd, (256, 512, 1024)),
        ("bf16", pd_bf16, (512, 1024, 2048)),
    ):
        for t in tiles:
            if args.rows % t:
                continue
            try:
                dt = timeit(
                    lambda qq, pp, t=t: pallas_flat_ip_topk(
                        qq, pp, K, tile_rows=t
                    ),
                    qd, p, iters=args.iters,
                )
                print(f"fused {name:5s} tile={t:5d} : {dt * 1e3:7.2f} ms "
                      f"({Q / dt:8.0f} QPS)", flush=True)
            except Exception as e:  # VMEM overflow etc. -- record and go on
                msg = str(e).splitlines()[0][:100]
                print(f"fused {name:5s} tile={t:5d} : FAILED {msg}", flush=True)


if __name__ == "__main__":
    main()
