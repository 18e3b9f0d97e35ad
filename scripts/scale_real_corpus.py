"""Grow a rehearsal workdir's REAL-embedding corpus to production shape
(VERDICT r4 missing #4).

`scripts/bench_ann_real.py` measures ANN recall on genuine encoder
embeddings, but a default rehearsal leaves only 50k rows / nlist 781 —
every production guidance point (nprobe sizing, the OPQ-on
recommendation) extrapolated from that shape, and round 4 proved small /
synthetic curves mislead (the OPQ reversal). This script scales the
corpus to the serving regime of the reference
(/root/reference/drivers/run_convdr_inference.py:157-242): it generates
``--n_passages`` additional topic-structured passages (disjoint pid
space, fresh topics, fresh rng), tokenizes them, encodes them with the
SAME deterministic "init" teacher the rehearsal corpus was embedded with
(core/loading.py::init_params seeds PRNGKey(0), so a separate driver run
reproduces the identical embedding space), and assembles a merged
workdir whose ``embeddings/`` holds rehearsal blocks + scale blocks
renumbered consecutively. ``bench_ann_real.py --workdir <out>`` then
measures recall curves at 500k–1M real rows and nlist 4096–16384.

The scale passages are ALL topic-owned (``--n_topics`` defaults to
n_passages / 12): through a real encoder that yields a fully clustered
corpus — the regime IVF coarse quantizers are built for and the closest
analogue of a web passage collection. The rehearsal's 48 eval topics
stay present via the copied block, so the trained student's queries keep
their true neighbors in the merged corpus.

Usage (after `python scripts/rehearsal.py --workdir /tmp/rehearsal`):
    python scripts/scale_real_corpus.py \
        --rehearsal_workdir /tmp/rehearsal --out_workdir /tmp/real1m \
        --n_passages 950000
    python scripts/bench_ann_real.py --workdir /tmp/real1m --nlist 4096

The default output reuses the rehearsal's blocks via hard links, which
leaves two token-cache offset spaces side by side — sufficient for
bench_ann_real (pure row-index recall) but not for the drivers. Pass
``--unified`` to build one token cache over rehearsal + scale passages
and re-encode everything from it: that workdir runs the production
inference driver (offset→pid maps are consistent) and therefore
``bench_serving.py`` at scale.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from rehearsal import OWNED_PER_TOPIC, WORDS, make_corpus


def _list_blocks(d):
    """Consecutive block ids present in `d` (reference layout,
    retrieval/blocks.py: {EMB_PREFIX}_data_obj_{b}.pb + id file)."""
    from convdr_tpu.retrieval.blocks import EMB_PREFIX

    ids = []
    b = 0
    while os.path.exists(
        os.path.join(d, f"{EMB_PREFIX}_data_obj_{b}.pb")
    ):
        ids.append(b)
        b += 1
    return ids


def _link_block(src_dir, src_b, dst_dir, dst_b):
    from convdr_tpu.retrieval.blocks import EMB_PREFIX, EMBID_PREFIX

    for prefix in (EMB_PREFIX, EMBID_PREFIX):
        src = os.path.join(src_dir, f"{prefix}_data_obj_{src_b}.pb")
        dst = os.path.join(dst_dir, f"{prefix}_data_obj_{dst_b}.pb")
        if os.path.exists(dst):
            os.remove(dst)
        os.link(src, dst)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rehearsal_workdir", required=True,
                    help="a completed scripts/rehearsal.py workdir "
                    "(base arch, rdot_nll)")
    ap.add_argument("--out_workdir", required=True)
    ap.add_argument("--n_passages", type=int, default=950_000,
                    help="ADDITIONAL passages; total corpus = these + "
                    "the rehearsal's rows")
    ap.add_argument("--n_topics", type=int, default=0,
                    help="0 = n_passages/12 (fully topic-clustered)")
    ap.add_argument("--model_type", default="rdot_nll")
    ap.add_argument("--arch_size", default="base",
                    help="match the rehearsal run (smoke = tiny)")
    ap.add_argument("--dtype", default="bfloat16",
                    help="encode compute dtype; must match the rehearsal")
    ap.add_argument("--max_seq_length", type=int, default=128,
                    help="must match the rehearsal's corpus tokenization")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--num_blocks", type=int, default=4)
    ap.add_argument("--seed", type=int, default=517,
                    help="rng for scale passages/topics (!= rehearsal's 17)")
    ap.add_argument("--pid_base", type=int, default=10_000_000,
                    help="scale pids start here (disjoint from the "
                    "rehearsal's 0..N pid space)")
    ap.add_argument("--unified", action="store_true",
                    help="build ONE token cache over rehearsal + scale "
                    "passages and encode all rows from it. The default "
                    "(hard-linked block merge) reuses the rehearsal's "
                    "blocks but leaves two token-cache OFFSET spaces "
                    "side by side — fine for bench_ann_real (row-index "
                    "recall) but NOT for the drivers, which map offsets "
                    "-> pids through one processed dir. --unified costs "
                    "a full re-encode and yields a workdir the "
                    "production drivers (and bench_serving.py) can run "
                    "at scale: qrels/eval topics carry over because "
                    "rehearsal pids are preserved verbatim.")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny arch + 8-device CPU mesh (pairs with a "
                    "`rehearsal.py --smoke` workdir)")
    args = ap.parse_args(argv)
    if args.smoke:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.arch_size = "tiny"
        args.dtype = "float32"
        args.n_passages = min(args.n_passages, 3000)

    wd = args.out_workdir
    raw = os.path.join(wd, "raw")
    processed = os.path.join(wd, "processed")
    emb_new = os.path.join(wd, "embeddings_scale")
    emb_merged = os.path.join(wd, "embeddings")
    os.makedirs(raw, exist_ok=True)
    os.makedirs(emb_merged, exist_ok=True)

    reh_raw = os.path.join(args.rehearsal_workdir, "raw")
    reh_emb = os.path.join(args.rehearsal_workdir, "embeddings")
    reh_blocks = _list_blocks(reh_emb)
    assert reh_blocks, f"no embedding blocks under {reh_emb}"

    # ---- 1) scale collection --------------------------------------------
    col = os.path.join(raw, "collection.tsv")
    if not os.path.exists(col + ".done"):
        t0 = time.time()
        rng = np.random.RandomState(args.seed)
        n_topics = args.n_topics or max(
            1, args.n_passages // OWNED_PER_TOPIC
        )
        topics = [
            f"{WORDS[rng.randint(len(WORDS))]} "
            f"{WORDS[rng.randint(len(WORDS))]}"
            for _ in range(n_topics)
        ]
        scale_col = (
            os.path.join(raw, "collection_scale.tsv")
            if args.unified else col
        )
        make_corpus(scale_col, args.n_passages, topics, rng,
                    pid_base=args.pid_base)
        if args.unified:
            # one collection, rehearsal pids first (preserved verbatim
            # so the rehearsal's qrels stay valid), scale pids after
            with open(col, "w") as out:
                for src in (os.path.join(reh_raw, "collection.tsv"),
                            scale_col):
                    with open(src) as f:
                        shutil.copyfileobj(f, out)
        open(col + ".done", "w").close()
        print(f"[scale] corpus: {args.n_passages} passages, "
              f"{n_topics} topics, unified={args.unified}, "
              f"{time.time() - t0:.1f}s", flush=True)

    # ---- 2) tokenize ----------------------------------------------------
    from convdr_tpu.drivers import gen_passage_embeddings, tokenize_collection

    if not os.path.exists(os.path.join(processed, "done.flag")):
        t0 = time.time()
        tokenize_collection.main([
            "--collection", col,
            "--out_data_dir", processed,
            "--model_type", args.model_type,
            "--max_seq_length", str(args.max_seq_length),
            "--num_workers", "1",
        ])
        open(os.path.join(processed, "done.flag"), "w").close()
        print(f"[scale] tokenize done in {time.time() - t0:.1f}s",
              flush=True)

    # ---- 3) encode with the deterministic init teacher ------------------
    emb_out = emb_merged if args.unified else emb_new
    if not _list_blocks(emb_out):
        t0 = time.time()
        gen_passage_embeddings.main([
            "--data_dir", processed,
            "--checkpoint", "init",
            "--output_dir", emb_out,
            "--cache_dir", os.path.join(wd, "cache"),
            "--per_gpu_eval_batch_size", str(args.batch_size),
            "--length_buckets", "auto",
            "--num_blocks", str(args.num_blocks),
            "--model_type", args.model_type,
            "--arch_size", args.arch_size,
            "--dtype", args.dtype,
        ])
        print(f"[scale] encode done in {time.time() - t0:.1f}s", flush=True)

    # ---- 4) merge: rehearsal blocks first, scale blocks after -----------
    if args.unified:
        new_blocks = _list_blocks(emb_merged)
    else:
        for b in reh_blocks:
            _link_block(reh_emb, b, emb_merged, b)
        new_blocks = _list_blocks(emb_new)
        for i, b in enumerate(new_blocks):
            _link_block(emb_new, b, emb_merged, len(reh_blocks) + i)

    # ---- 5) eval topics + model pointers for bench_ann_real -------------
    for fname in ("eval_topics.jsonl", "qrels.tsv", "queries.raw.tsv"):
        src = os.path.join(reh_raw, fname)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(raw, fname))
    model_link = os.path.join(wd, "model")
    if not os.path.exists(model_link):
        os.symlink(os.path.join(args.rehearsal_workdir, "model"),
                   model_link)

    n_rows = 0
    from convdr_tpu.retrieval.blocks import iter_embedding_blocks
    for _b, emb, _o in iter_embedding_blocks(emb_merged):
        n_rows += emb.shape[0]
    print(json.dumps({
        "scale_workdir": wd,
        "rehearsal_blocks": len(reh_blocks),
        "scale_blocks": len(new_blocks),
        "total_rows": n_rows,
    }), flush=True)


if __name__ == "__main__":
    main()
