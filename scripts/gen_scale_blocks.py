"""Generate bench.py --scale block caches for BOTH storage dtypes in one pass.

``bench.py --gen_only`` generates one dtype's cache per invocation; at 38M
rows the dominant cost is the single-core ``standard_normal`` draw (~29B
samples), which the int8 and bfloat16 caches would otherwise pay twice.
This script draws each block's rows once and writes both dtype variants,
producing byte-identical outputs to two separate ``bench.py --gen_only``
runs (same per-block PCG64(1000+b) streams, same stamp files, same
``int8_scales.npy`` sidecar), so ``bench.py --scale N --storage_dtype X``
finds a warm cache for either X.

Resumable exactly like ``ensure_scale_blocks``: complete (emb, embid) file
pairs are skipped per dtype; a dtype whose stamp exists is skipped outright.

Usage:  python scripts/gen_scale_blocks.py --scale 38000000 [--blocks 8]
"""

from __future__ import annotations

import argparse
import os
import sys

import ml_dtypes
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import DIM, _scale_sample_quantizer  # noqa: E402
from convdr_tpu.retrieval.blocks import (  # noqa: E402
    EMB_PREFIX,
    EMBID_PREFIX,
    _block_path,
    write_embedding_block,
)


def _pair_complete(cache_dir: str, b: int, rows: int, row_bytes: int) -> bool:
    path = _block_path(cache_dir, EMB_PREFIX, b)
    id_path = _block_path(cache_dir, EMBID_PREFIX, b)
    return (
        os.path.exists(path)
        and os.path.getsize(path) >= rows * row_bytes
        and os.path.exists(id_path)
        and os.path.getsize(id_path) >= rows * 8
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--scale", type=int, required=True)
    parser.add_argument("--blocks", type=int, default=8)
    parser.add_argument(
        "--cache_dir",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".bench_cache",
        ),
    )
    parser.add_argument(
        "--dtypes", nargs="+", default=["int8", "bfloat16"],
        choices=["int8", "bfloat16"],
    )
    args = parser.parse_args()

    n_rows, n_blocks = args.scale, args.blocks
    rows_per_block = -(-n_rows // n_blocks)
    dirs = {d: os.path.join(args.cache_dir, d) for d in args.dtypes}
    stamps = {
        d: os.path.join(p, f"stamp_{n_rows}_{n_blocks}_{DIM}_{d}")
        for d, p in dirs.items()
    }
    todo = [d for d in args.dtypes if not os.path.exists(stamps[d])]
    if not todo:
        print("all requested caches already stamped", file=sys.stderr)
        return
    for d in todo:
        os.makedirs(dirs[d], exist_ok=True)

    quant = None
    if "int8" in todo:
        quant = _scale_sample_quantizer()
        quant.save(dirs["int8"])
    row_bytes = {"int8": DIM, "bfloat16": DIM * 2}

    for b in range(n_blocks):
        lo = b * rows_per_block
        hi = min(n_rows, lo + rows_per_block)
        missing = [
            d for d in todo
            if not _pair_complete(dirs[d], b, hi - lo, row_bytes[d])
        ]
        if not missing:
            print(f"block {b}: both dtypes on disk, skipping", file=sys.stderr)
            continue
        gen = np.random.Generator(np.random.PCG64(1000 + b))
        emb = gen.standard_normal((hi - lo, DIM), dtype=np.float32)
        ids = np.arange(lo, hi, dtype=np.int64)
        if "int8" in missing:
            write_embedding_block(
                dirs["int8"], b, quant.quantize_passages(emb), ids
            )
            print(f"block {b} int8 written: rows {lo}:{hi}", file=sys.stderr)
        if "bfloat16" in missing:
            write_embedding_block(
                dirs["bfloat16"], b, emb.astype(ml_dtypes.bfloat16), ids
            )
            print(f"block {b} bf16 written: rows {lo}:{hi}", file=sys.stderr)
    for d in todo:
        with open(stamps[d], "w") as f:
            f.write("ok")
    print("done", file=sys.stderr)


if __name__ == "__main__":
    main()
