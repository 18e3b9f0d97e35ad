"""CLI: build a TPU-native IVF index from embedding blocks.

The reference has no index-building driver because FAISS builds indexes
in-process (/root/reference/drivers/run_convdr_inference.py:157-182 creates
a fresh FlatIP per block on every inference run). IVF inverts that
economics: cluster + pack once (this driver), then serve many inference
runs at a fraction of the exact scan's latency via
``run_convdr_inference --ivf_dir ... --nprobe ...``.

Input: a ``gen_passage_embeddings`` output directory (float32 / bfloat16 /
int8 block files + sidecars). Output: an index directory loadable by
:class:`convdr_tpu.retrieval.ivf.IVFIndex`.
"""

from __future__ import annotations

import argparse
import json
import logging

from convdr_tpu.retrieval.ivf import IVFIndex

logger = logging.getLogger(__name__)


def get_arguments(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--ann_data_dir", type=str, required=True,
        help="embedding block directory (gen_passage_embeddings output)",
    )
    parser.add_argument(
        "--index_dir", type=str, required=True,
        help="output directory for the built index",
    )
    parser.add_argument(
        "--nlist", type=int, required=True,
        help="number of inverted lists (k-means centroids); FAISS rule of "
        "thumb ~sqrt(N)..16*sqrt(N)",
    )
    parser.add_argument(
        "--storage_dtype", default="float32",
        choices=["float32", "bfloat16", "int8"],
        help="list-tensor dtype. int8 = SQ8 (quarter the HBM, "
        "integer-exact candidate scoring); int8 BLOCK files force int8",
    )
    parser.add_argument(
        "--slack", type=float, default=1.0,
        help="sub-list capacity = slack * N / nlist (a cluster of l rows "
        "occupies ceil(l/cap) fixed-capacity sub-lists; smaller = finer "
        "probe granularity, more zero-pad rows)",
    )
    parser.add_argument("--kmeans_iters", type=int, default=20)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument(
        "--train_sample", type=int, default=0,
        help="k-means training subsample cap (0 = train on all of block "
        "0; FAISS uses ~256 rows per centroid)",
    )
    parser.add_argument("--max_blocks", type=int, default=0,
                        help="index only the first N blocks (0 = all)")
    return parser.parse_args(argv)


def main(argv=None):
    logging.basicConfig(
        format="%(asctime)s - %(levelname)s - %(name)s - %(message)s",
        level=logging.INFO,
    )
    args = get_arguments(argv)
    index = IVFIndex.build_from_blocks(
        args.ann_data_dir,
        args.nlist,
        storage_dtype=args.storage_dtype,
        slack=args.slack,
        iters=args.kmeans_iters,
        seed=args.seed,
        train_sample=args.train_sample or None,
        max_blocks=args.max_blocks or None,
    )
    index.save(args.index_dir)
    summary = {
        "index_dir": args.index_dir,
        "nlist": index.nlist,
        "cap": index.cap,
        "dim": index.dim,
        "ntotal": index.ntotal,
        "storage_dtype": index.storage_dtype,
        "list_tensor_bytes": int(index.lists.nbytes),
        **{f"assign_{k}": v for k, v in index.stats.items()},
    }
    logger.info("built IVF index: %s", summary)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
