"""Ablate the 1M-row exact search into stages on the v5e chip.

Cumulative ablation (each timing includes everything before it), at the
production operating point: Q=512, 1M rows (2 scan blocks of 524288), G=32,
top-100, HIGHEST precision. In-jit fori_loop timing, operands as arguments.
"""
import argparse
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np

from convdr_tpu.utils.transfer import device_put_chunked
from convdr_tpu.ops.exact_search import (
    NEG_INF,
    _onehot_gather_groups,
    flat_ip_topk,
    grouped_topk_last_axis,
    merge_topk,
)

PREC = jax.lax.Precision.HIGHEST


def timeit(fn, *args, iters=16):
    float(fn(*args))  # compile + warm (host read-back; block_until_ready
    t0 = time.perf_counter()  # does not reliably wait through the tunnel)
    float(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_048_576)
    ap.add_argument("--block", type=int, default=524_288)
    ap.add_argument("--q", type=int, default=512)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--group", type=int, default=32)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()
    Q, D, K, G = args.q, 768, args.k, args.group
    B = args.block
    nblocks = args.rows // B
    NG = B // G
    iters = args.iters

    # PCG64 + f32 ziggurat: legacy RandomState.randn at this scale costs
    # minutes of single-core host time (measured 805M samples > 5 min)
    gen = np.random.Generator(np.random.PCG64(0))
    q_h = gen.standard_normal((Q, D), dtype=np.float32)
    p_h = gen.standard_normal((args.rows, D), dtype=np.float32)
    qd = jnp.asarray(q_h)
    # 3 GB in one transfer stalls for minutes on the tunnel; chunk it
    pd = device_put_chunked(p_h)
    pd.block_until_ready()

    def perturb(q, i):
        return q + i.astype(jnp.float32) * 1e-8

    def loop(body):
        @jax.jit
        def run(q, p):
            def step(i, acc):
                return acc + body(perturb(q, i), p)
            return jax.lax.fori_loop(0, iters, step, 0.0)
        return run

    # stage A: matmul only
    def a_body(q, p):
        acc = 0.0
        for b in range(nblocks):
            s = jnp.dot(q, p[b * B:(b + 1) * B].T,
                        preferred_element_type=jnp.float32, precision=PREC)
            acc += jnp.max(s)  # full reduce: DCE-proof (adds ~1 HBM pass)
        return acc

    # stage B: + group max
    def b_body(q, p):
        acc = 0.0
        for b in range(nblocks):
            s = jnp.dot(q, p[b * B:(b + 1) * B].T,
                        preferred_element_type=jnp.float32, precision=PREC)
            gmax = jnp.max(s.reshape(Q, NG, G), axis=-1)
            acc += jnp.max(gmax)
        return acc

    # stage C: + group select (recursive top-k over gmax + sort ids)
    def c_body(q, p):
        acc = 0.0
        for b in range(nblocks):
            s = jnp.dot(q, p[b * B:(b + 1) * B].T,
                        preferred_element_type=jnp.float32, precision=PREC)
            gmax = jnp.max(s.reshape(Q, NG, G), axis=-1)
            _, gsel = grouped_topk_last_axis(gmax, K + 1, G)
            gsel = jnp.sort(gsel, axis=-1)
            acc += jnp.max(gsel).astype(jnp.float32)
        return acc

    # stage D: + candidate gather
    def d_body(q, p):
        acc = 0.0
        for b in range(nblocks):
            s = jnp.dot(q, p[b * B:(b + 1) * B].T,
                        preferred_element_type=jnp.float32, precision=PREC)
            s3 = s.reshape(Q, NG, G)
            gmax = jnp.max(s3, axis=-1)
            _, gsel = grouped_topk_last_axis(gmax, K + 1, G)
            gsel = jnp.sort(gsel, axis=-1)
            cand = _onehot_gather_groups(s3, gsel)
            acc += jnp.max(cand)
        return acc

    # stage E: + final top-k per block
    def e_body(q, p):
        acc = 0.0
        for b in range(nblocks):
            s = jnp.dot(q, p[b * B:(b + 1) * B].T,
                        preferred_element_type=jnp.float32, precision=PREC)
            s3 = s.reshape(Q, NG, G)
            gmax = jnp.max(s3, axis=-1)
            _, gsel = grouped_topk_last_axis(gmax, K + 1, G)
            gsel = jnp.sort(gsel, axis=-1)
            cand = _onehot_gather_groups(s3, gsel)
            ts, sel = grouped_topk_last_axis(cand.reshape(Q, -1), K, G)
            acc += jnp.max(ts) + jnp.max(sel).astype(jnp.float32)
        return acc

    # stage F: the full production path
    def f_body(q, p):
        s, i = flat_ip_topk(q, p, K, block_rows=B)
        return s[0, 0] + i[0, 0].astype(jnp.float32)

    stages = [("A matmul", a_body), ("B +gmax", b_body),
              ("C +select", c_body), ("D +gather", d_body),
              ("E +final", e_body), ("F full", f_body)]
    prev = 0.0
    for name, body in stages:
        dt = timeit(loop(body), qd, pd, iters=iters) * 1e3
        print(f"{name:10s}: {dt:8.3f} ms  (+{dt - prev:7.3f})")
        prev = dt


if __name__ == "__main__":
    main()
