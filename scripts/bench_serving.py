"""End-to-end ANN serving sweep through the PRODUCTION inference driver.

The ANN harnesses (bench_ivf / bench_pq / bench_ann_real) measure
*candidate recall* against the exact top-100. This sweep measures what
ANN approximation costs in FINAL TASK METRICS (map / mrr / ndcg@3 /
recall@100 vs qrels) through the exact path a user deploys — the flow of
the reference's ``run_convdr_inference.py:157-242`` with FAISS swapped
for the TPU index family:

    build_ivf_index --ann_data_dir <embeddings> ...       (once per index)
    run_convdr_inference --ivf_dir ... --nprobe N [--rescore_factor F]

It produced the "End-to-end ANN serving through the production driver"
table in PARITY.md (IVF-int8 nprobe 32 serves ndcg@3/mrr within 1% of
exact; IVFPQ-OPQ + rescore_factor 5 within 1.3% on every metric).

Prereq: a completed rehearsal workdir (scripts/rehearsal.py), which leaves
  <workdir>/embeddings/   float32 block files (real corpus embeddings)
  <workdir>/model/        the trained student checkpoint
  <workdir>/raw/          eval_topics.jsonl + qrels.tsv
  <workdir>/processed/    tokenized queries
Usage:
  python scripts/rehearsal.py --workdir /tmp/rehearsal        # once
  python scripts/bench_serving.py --workdir /tmp/rehearsal
Emits one JSON line per serving config plus a markdown table on stderr.
Indexes are built on first use and reused on re-runs (delete
<workdir>/serving_idx_* to rebuild).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (tag, index key or "" for the exact flat scan, extra driver flags)
DEFAULT_CONFIGS = [
    ("exact", "", []),
    ("ivf_np8", "ivf_int8", ["--nprobe", "8"]),
    ("ivf_np32", "ivf_int8", ["--nprobe", "32"]),
    ("ivf_np64", "ivf_int8", ["--nprobe", "64"]),
    ("ivf_np8_f2", "ivf_int8",
     ["--nprobe", "8", "--rescore_factor", "2"]),
    ("ivf_np32_f2", "ivf_int8",
     ["--nprobe", "32", "--rescore_factor", "2"]),
    ("ivfpq_np8", "ivfpq_opq", ["--nprobe", "8"]),
    ("ivfpq_np64", "ivfpq_opq", ["--nprobe", "64"]),
    ("ivfpq_np64_f5", "ivfpq_opq",
     ["--nprobe", "64", "--rescore_factor", "5"]),
]

# index key -> build_ivf_index flags beyond --ann_data_dir/--index_dir.
# ivfpq uses the recommended real-corpus config (pq4 m=96, packed codes,
# OPQ on — see build_ivf_index --opq_iters help / PARITY.md).
INDEX_BUILDS = {
    "ivf_int8": ["--index_type", "ivf", "--storage_dtype", "int8"],
    "ivfpq_opq": ["--index_type", "ivf", "--storage_dtype", "pq4",
                  "--pack_codes", "--opq_iters", "6"],
}


def parse_metrics(stdout: str) -> dict:
    """Last JSON object the inference driver prints (num_queries + means)."""
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            d = json.loads(line)
            if "num_queries" in d:
                return d
    raise RuntimeError("no metrics JSON line in driver output")


def build_index(args, key: str) -> str:
    index_dir = os.path.join(args.workdir, f"serving_idx_{key}")
    # IVFIndex.save writes ivf_meta.json, PQIndex pq_index_meta.json —
    # either marks a completed build worth reusing.
    for marker in ("ivf_meta.json", "pq_index_meta.json"):
        if os.path.exists(os.path.join(index_dir, marker)):
            return index_dir
    cmd = [
        sys.executable, "-m", "convdr_tpu.drivers.build_ivf_index",
        "--ann_data_dir", os.path.join(args.workdir, "embeddings"),
        "--index_dir", index_dir,
        "--nlist", str(args.nlist), "--slack", str(args.slack),
        "--seed", "0", *INDEX_BUILDS[key],
    ]
    print(f"# building {key}: {' '.join(cmd)}", file=sys.stderr)
    subprocess.run(cmd, check=True, cwd=REPO)
    return index_dir


def run_config(args, tag: str, index_dir: str, extra: list) -> dict:
    wd = args.workdir
    cmd = [
        sys.executable, "-m", "convdr_tpu.drivers.run_convdr_inference",
        "--eval_file", os.path.join(wd, "raw", "eval_topics.jsonl"),
        "--ann_data_dir", os.path.join(wd, "embeddings"),
        "--processed_data_dir", os.path.join(wd, "processed"),
        "--raw_data_dir", os.path.join(wd, "raw"),
        "--output_query_type", "raw", "--query", "no_res",
        "--qrels", os.path.join(wd, "raw", "qrels.tsv"),
        "--top_n", str(args.top_n),
        "--max_concat_length", str(args.max_concat_length),
        "--max_query_length", str(args.max_query_length),
        "--per_gpu_eval_batch_size", "32",
        "--model_type", args.model_type, "--dtype", "bfloat16",
        "--model_path", os.path.join(wd, "model"),
        "--output_trec_file", os.path.join(wd, f"serve_{tag}.trec"),
    ]
    if index_dir:
        cmd += ["--ivf_dir", index_dir]
    cmd += extra
    print(f"# run {tag}", file=sys.stderr)
    proc = subprocess.run(
        cmd, check=True, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=1800,
    )
    try:
        return parse_metrics(proc.stdout)
    except Exception:
        sys.stderr.write(proc.stdout[-4000:])
        raise


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True,
                    help="completed scripts/rehearsal.py workdir")
    ap.add_argument("--nlist", type=int, default=781,
                    help="IVF lists (default ~sqrt-scale for the 50k "
                    "rehearsal corpus; match bench_ann_real)")
    ap.add_argument("--slack", type=float, default=1.25)
    ap.add_argument("--top_n", type=int, default=100)
    # Caps MUST match the rehearsal's serving point (rehearsal.py defaults
    # 96/32): a wider concat cap pulls in more history turns than the
    # checkpoint was trained/evaluated with, confounding any comparison
    # against bench_ann_real's recall table on the same workdir.
    ap.add_argument("--max_concat_length", type=int, default=96)
    ap.add_argument("--max_query_length", type=int, default=32)
    ap.add_argument("--model_type", default="rdot_nll")
    ap.add_argument("--tags", default="",
                    help="comma-separated subset of config tags to run")
    args = ap.parse_args()

    want = {t for t in args.tags.split(",") if t} or None
    rows = []
    for tag, key, extra in DEFAULT_CONFIGS:
        if want and tag not in want:
            continue
        index_dir = build_index(args, key) if key else ""
        m = run_config(args, tag, index_dir, extra)
        row = {"config": tag, "map": round(m["map"], 4),
               "mrr": round(m["mrr"], 4),
               "ndcg_cut_3": round(m["ndcg_cut_3"], 4),
               "recall_100": round(m["recall_100"], 4),
               "num_queries": m["num_queries"]}
        print(json.dumps(row), flush=True)
        rows.append(row)

    print("\n| serving config | map | mrr | ndcg@3 | recall@100 |",
          file=sys.stderr)
    print("|---|---|---|---|---|", file=sys.stderr)
    for r in rows:
        print(f"| {r['config']} | {r['map']:.3f} | {r['mrr']:.3f} "
              f"| {r['ndcg_cut_3']:.3f} | {r['recall_100']:.3f} |",
              file=sys.stderr)


if __name__ == "__main__":
    main()
