"""Online serving driver: one turn per dispatch, measured latency.

The batch driver (run_convdr_inference.py) mirrors the reference's
evaluation shape: encode ALL queries, then search — two device programs,
two dispatches, fine for replaying an eval set. A production
conversational system serves one turn at a time, and the reference's only
latency surface is its per-batch timing instrumentation
(/root/reference/drivers/run_convdr_inference.py:181-189). This driver is
the TPU-first serving counterpart: it builds a resident
:class:`convdr_tpu.retrieval.online.OnlineSearcher` (encoder forward +
index search fused into ONE jitted program, model and index resident in
HBM), replays the eval topics ONE TURN AT A TIME, and reports end-to-end
per-turn latency percentiles alongside the usual TREC run + metrics.

Backends: --ann_data_dir (flat resident corpus; --storage_dtype
float32/bfloat16/int8) or --ivf_dir (resident IVF/IVFPQ probe, --nprobe).

Output: the standard metrics JSON line when --qrels is given, plus a
``serving_latency`` JSON line with p50/p90/p99 per-turn milliseconds
(single dispatch + read-back + id mapping; this replay pre-tokenizes the
eval set through ConvSearchDataset, so tokenize is outside the timed
window here — the text entry point ``OnlineSearcher.search``, measured
by scripts/bench_online.py, times it in and it is sub-ms on this host.
The first, compile-heavy turn is excluded via a warmup call).
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import jax.numpy as jnp
import numpy as np

from convdr_tpu.core.registry import MODEL_REGISTRY
from convdr_tpu.data.collection import load_qrels
from convdr_tpu.data.conv_dataset import ConvSearchDataset
from convdr_tpu.data.token_cache import load_offset2pid
from convdr_tpu.evaluation.metrics import evaluate_run, mean_metrics
from convdr_tpu.retrieval.online import OnlineSearcher
from convdr_tpu.retrieval.run_writer import write_run_outputs

logger = logging.getLogger(__name__)


def get_arguments(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--eval_file", type=str, required=True)
    parser.add_argument("--processed_data_dir", type=str, required=True)
    parser.add_argument("--ann_data_dir", type=str, default=None,
                        help="flat resident corpus (embedding blocks)")
    parser.add_argument("--ivf_dir", type=str, default=None,
                        help="resident IVF/IVFPQ index directory")
    parser.add_argument("--qrels", type=str, default=None)
    parser.add_argument("--output_trec_file", type=str, default=None)
    parser.add_argument(
        "--query", default="no_res",
        choices=["no_res", "man_can", "auto_can"],
        help="serving concatenates the session history (reference "
        "inference modes that see history; target/output/raw are "
        "single-utterance eval modes, use the batch driver for those)",
    )
    parser.add_argument("--model_type", required=True, type=str,
                        choices=sorted(MODEL_REGISTRY))
    parser.add_argument("--top_n", default=100, type=int)
    parser.add_argument("--nprobe", default=8, type=int)
    parser.add_argument(
        "--storage_dtype", default="float32",
        choices=["float32", "bfloat16", "int8"],
    )
    parser.add_argument(
        "--matmul_precision", default="highest",
        choices=["highest", "high", "default"],
    )
    parser.add_argument("--max_concat_length", default=256, type=int)
    parser.add_argument("--max_query_length", default=64, type=int)
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--arch_size", default="base",
                        choices=["base", "tiny"])
    return parser.parse_args(argv)


def build_searcher(args) -> OnlineSearcher:
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    preset = "tiny" if args.arch_size == "tiny" else None
    if (args.ann_data_dir is None) == (args.ivf_dir is None):
        raise ValueError(
            "exactly one of --ann_data_dir (flat) or --ivf_dir (ANN) "
            "selects the resident backend"
        )
    if args.ivf_dir:
        return OnlineSearcher.from_ivf(
            args.model_path,
            args.ivf_dir,
            model_type=args.model_type,
            top_n=args.top_n,
            nprobe=args.nprobe,
            max_concat_length=args.max_concat_length,
            dtype=dtype,
            arch_preset=preset,
        )
    return OnlineSearcher.from_blocks(
        args.model_path,
        args.ann_data_dir,
        model_type=args.model_type,
        top_n=args.top_n,
        max_concat_length=args.max_concat_length,
        storage_dtype=args.storage_dtype,
        precision=args.matmul_precision,
        dtype=dtype,
        arch_preset=preset,
    )


def main(argv=None):
    logging.basicConfig(
        format="%(asctime)s - %(levelname)s - %(name)s - %(message)s",
        level=logging.INFO,
    )
    args = get_arguments(argv)
    searcher = build_searcher(args)

    dataset = ConvSearchDataset(
        [args.eval_file],
        searcher.tokenizer,
        mode="inference",
        query_mode=args.query,
        model_type=args.model_type,
        max_concat_length=searcher.max_concat_length,
        max_query_length=args.max_query_length,
    )

    logger.info("warmup dispatch (compile)...")
    searcher.warmup()

    qids, all_s, all_i, raw = [], [], [], {}
    for batch in dataset.batches(1):  # ONE turn per dispatch: the point
        ids = np.asarray(batch["concat_ids"])
        mask = np.asarray(batch["concat_mask"])
        s, i = searcher.search_tokens(ids, mask)
        qids.extend(batch["qid"])
        all_s.append(s)
        all_i.append(i)
        for qid, seq in zip(batch["qid"], batch["history_utterances"]):
            raw[qid] = seq
    scores = np.concatenate(all_s)
    offsets = np.concatenate(all_i)

    offset2pid = load_offset2pid(args.processed_data_dir)
    qrels = load_qrels(args.qrels) if args.qrels else None
    run = write_run_outputs(
        qids, scores, offsets, offset2pid, args.top_n,
        output_trec_file=args.output_trec_file,
        qrels=qrels,
        raw_sequences=raw,
    )
    latency = searcher.stats.summary()
    print(json.dumps({"serving_latency": latency}))
    logger.info("per-turn latency: %s", latency)
    if qrels:
        per_q = evaluate_run(
            run, qrels, ndcg_cuts=(3,), recall_cuts=(args.top_n,)
        )
        means = mean_metrics(per_q)
        logger.info("metrics over %d judged queries: %s", len(per_q), means)
        print(json.dumps({"num_queries": len(per_q), **means}))
        return {**means, "serving_latency": latency}
    return {"run": run, "serving_latency": latency}


if __name__ == "__main__":
    main()
