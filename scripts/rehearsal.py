"""Quality-parity rehearsal at discriminating scale (VERDICT r1 item 9).

Drives the FULL driver pipeline -- tokenize -> embed (length-bucketed) ->
teacher-run -> ranking data -> KD+ranking training -> inference -> metrics
(the reference flow: /root/reference/run_convdr_inference.py:21-113 +
README.md:207) -- on a synthetic CAsT-shaped corpus with STRUCTURED
relevance, and asserts that training moves the needle:

  * NDCG@3 / MRR of the trained student (conversational `no_res` input)
    improves over the untrained student;
  * recall@100 of the searcher matches a numpy oracle on a query subset.

Relevance construction mirrors the reference's KD premise: in ConvDR the
teacher (ANCE) defines the target geometry and the student learns to map
the raw conversation onto the teacher's embedding of the manual rewrite
(run_convdr_train.py:109-115). Here qrels := the frozen teacher's top-3
passages for each manual rewrite, so teacher-on-manual scores NDCG@3 = 1 by
construction, an untrained student on raw conversational input scores far
lower, and KD measurably closes the gap -- a discriminating end-to-end
signal with no external checkpoints (zero-egress environment).

Usage (TPU, ~15-30 min mostly compiles):
    python scripts/rehearsal.py --workdir /tmp/rehearsal
Smoke (CPU mesh, tiny arch):
    python scripts/rehearsal.py --workdir /tmp/r_smoke --smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# runnable as `python scripts/rehearsal.py` even without the editable install
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


WORDS = (
    "ocean coral reef tide current whale dolphin plankton kelp harbor "
    "mountain glacier summit ridge valley avalanche granite basalt quartz "
    "engine turbine piston exhaust throttle chassis gearbox clutch axle "
    "violin cello sonata tempo rhythm harmony melody chord orchestra "
    "neuron synapse cortex axon dendrite receptor dopamine plasticity "
    "senate ballot statute amendment tribunal verdict appeal precedent "
    "harvest orchard irrigation fertilizer drought silo tractor plough "
    "galaxy nebula quasar pulsar photon orbit eclipse meteor asteroid "
    "protein enzyme ribosome membrane nucleus mitochondria chromosome "
    "ledger equity dividend futures hedge liquidity margin arbitrage"
).split()

FILLER = (
    "the a this that with from into over under about between during "
    "describes explains covers discusses concerns presents details"
).split()


OWNED_PER_TOPIC = 12


def make_corpus(path: str, n_passages: int, topics, rng,
                base_words: int = 30, pid_base: int = 0):
    """Passages with CAsT-like structure: each topic owns
    ``OWNED_PER_TOPIC`` passages rich in its subject words (so even a
    random-init teacher embeds them measurably closer to the topic's
    queries than background noise -- real score margins, not razor-thin
    ones); the rest are background noise over the shared pool. Without
    owned passages the teacher's top-3 are arbitrary word salads whose
    margins vanish at 768-dim/50k scale, and no achievable KD fidelity
    recovers them (measured: converged MSE 0.13 still scored ndcg 0).

    ``base_words`` sizes the passages: ~30 for single-chunk families, large
    enough to spill into a second chunk for ``rdot_nll_multi_chunk`` (the
    FirstP max-over-chunks path is only exercised when chunk 2 has real
    text, models.py:100-118)."""
    with open(path, "w") as f:
        for pid in range(n_passages):
            topic_id = pid // OWNED_PER_TOPIC
            subject = (
                topics[topic_id].split() if topic_id < len(topics) else None
            )
            words = []
            for i in range(base_words):
                words.append(WORDS[rng.randint(len(WORDS))])
                if subject is not None and rng.rand() < 0.35:
                    words.append(subject[rng.randint(len(subject))])
                if rng.rand() < 0.25:
                    words.append(FILLER[rng.randint(len(FILLER))])
            f.write(f"{pid_base + pid}\t{' '.join(words)}\n")


def make_topics(eval_path, queries_path, topics, turns, rng):
    """CAsT-shaped conversations: turn 0 states the subject; later turns
    are elliptical follow-ups; `target` is always the full rewrite.

    Targets carry extra per-query subject-correlated words: a random-init
    teacher's embeddings of short template sentences share a ~0.94 cosine
    common component, which makes the constant-output student the
    MSE-optimal degenerate basin (see PARITY.md); diverse target text
    spreads the teacher space so input-following is rewarded."""
    with open(eval_path, "w") as ef, open(queries_path, "w") as qf:
        for t, subject in enumerate(topics):
            history = []
            for turn in range(turns):
                aspects = ["overview", "history", "cost", "impact"]
                aspect = aspects[turn % len(aspects)]
                if turn == 0:
                    raw = f"{subject} tell me about it"
                else:
                    raw = f"what about its {aspect}"  # ellipsis: no subject
                # spread comes ONLY from words the conversation determines
                # (subject + aspect), repeated -- unpredictable extra words
                # would make the KD target unlearnable noise instead.
                # Subject-LED phrasing (not "tell me about <subject>"):
                # a shared many-token prefix inflates the query-side common
                # embedding component, and for DPR (raw CLS, no LayerNorm
                # head) that collapses the teacher's ranking to one global
                # doc order -- every query gets the same top-3, qrels
                # degenerate, and the untrained student scores 1.0
                # (measured round 3; ANCE's per-example LayerNorm hides
                # this for rdot_nll).
                target = (
                    f"{subject} {aspect}: {subject} {aspect}, "
                    f"{subject} {aspect} explained"
                )
                history.append(raw)
                qid = f"{t + 1}_{turn + 1}"
                ef.write(json.dumps({
                    "topic_number": t + 1,
                    "query_number": turn + 1,
                    "input": list(history),
                    "target": target,
                }) + "\n")
                qf.write(f"{qid}\t{raw}\n")


def run(cmd_module, argv, tag):
    t0 = time.time()
    print(f"[rehearsal] {tag}: {' '.join(argv)}", flush=True)
    out = cmd_module.main(argv)
    print(f"[rehearsal] {tag} done in {time.time() - t0:.1f}s", flush=True)
    return out


def build_warmup_ranking(eval_topics_path, collection_path, out_path, rng):
    """Teacher-warmup ranking data from LEXICAL ground truth.

    Topic t owns passages [t*OWNED_PER_TOPIC, (t+1)*OWNED_PER_TOPIC); the
    warmup positive is an owned passage, negatives are random background.
    Used to pre-train a discriminative teacher for families whose raw
    pooled embedding is rank-degenerate at random init (dpr: CLS without a
    LayerNorm head ranks every query identically -- measured round 3, the
    teacher-on-manual top-3 was one global doc set). ConvDR's real teacher
    is always a TRAINED retriever (README.md:21), so warming the teacher
    reproduces the reference premise, not a shortcut.
    """
    texts = {}
    with open(collection_path) as f:
        for line in f:
            pid, text = line.rstrip("\n").split("\t", 1)
            texts[int(pid)] = text
    n = len(texts)
    with open(eval_topics_path) as f, open(out_path, "w") as out:
        for line in f:
            rec = json.loads(line)
            topic = rec["topic_number"] - 1
            owned = [
                topic * OWNED_PER_TOPIC + j
                for j in range(OWNED_PER_TOPIC)
                if topic * OWNED_PER_TOPIC + j < n
            ]
            pos = owned[rng.randint(len(owned))]
            negs = []
            while len(negs) < 9:
                cand = rng.randint(n)
                if cand not in owned:
                    negs.append(cand)
            rec["doc_pos"] = texts[pos]
            rec["doc_negs"] = [texts[c] for c in negs]
            out.write(json.dumps(rec) + "\n")


def build_qrels_from_run(trec_path, qrels_path, top_rel=3):
    """qrels := teacher-on-manual top-`top_rel` per query (graded 2,1,1)."""
    per_q = {}
    with open(trec_path) as f:
        for line in f:
            qid, _, pid, rank, _score, _tag = line.split()
            per_q.setdefault(qid, []).append((int(rank), pid))
    with open(qrels_path, "w") as f:
        for qid, items in per_q.items():
            for rank, pid in sorted(items)[:top_rel]:
                rel = 2 if rank == 1 else 1
                f.write(f"{qid}\t0\t{pid}\t{rel}\n")


def oracle_subset_check(ann_dir, processed_dir, raw_dir, model_path, args):
    """recall@100 exactness: library search vs numpy oracle, 8 queries."""
    import numpy as np

    from convdr_tpu.core.config import SearchConfig
    from convdr_tpu.core.loading import load_model_and_params, make_apply_fn
    from convdr_tpu.data.conv_dataset import ConvSearchDataset
    from convdr_tpu.retrieval.blocks import iter_embedding_blocks
    from convdr_tpu.retrieval.searcher import BlockedSearcher

    import jax
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    config, tokenizer, model, params = load_model_and_params(
        args.model_type, model_path,
        dtype=dtype,
        arch_preset="tiny" if args.smoke else None,
    )
    ds = ConvSearchDataset(
        [os.path.join(raw_dir, "eval_topics.jsonl")], tokenizer,
        max_query_length=args.max_query_length,
        max_concat_length=args.max_concat_length,
        mode="inference", query_mode="no_res",
    )
    batch = ds.collate([ds[i] for i in range(8)])
    apply_fn = make_apply_fn(model)
    q = np.asarray(apply_fn(
        params, jnp.asarray(batch["concat_ids"]),
        jnp.asarray(batch["concat_mask"]), True,
    ), np.float32)

    searcher = BlockedSearcher(SearchConfig(top_n=100))
    s, got_offs = searcher.search_blocks(ann_dir, q, 100)

    # blocked numpy oracle over the same block files
    best_s = best_i = None
    for _b, emb, offs in iter_embedding_blocks(ann_dir):
        scores = q @ emb.astype(np.float32).T
        kk = min(100, scores.shape[1])
        part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        ps = np.take_along_axis(scores, part, axis=1)
        pi = offs[part]
        if best_s is None:
            best_s, best_i = ps, pi
        else:
            cs = np.concatenate([best_s, ps], axis=1)
            ci = np.concatenate([best_i, pi], axis=1)
            keep = np.argpartition(-cs, 99, axis=1)[:, :100]
            best_s = np.take_along_axis(cs, keep, axis=1)
            best_i = np.take_along_axis(ci, keep, axis=1)
    mismatch = sum(
        set(got_offs[r]) != set(best_i[r]) for r in range(q.shape[0])
    )
    return int(mismatch)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", required=True)
    parser.add_argument(
        "--model_type", default="rdot_nll",
        choices=["rdot_nll", "rdot_nll_multi_chunk", "dpr"],
        help="registry family to rehearse (VERDICT r2 #4: all three "
        "families must be shown to LEARN, not just run)",
    )
    parser.add_argument("--n_passages", type=int, default=50_000)
    parser.add_argument("--n_topics", type=int, default=48)
    parser.add_argument("--turns", type=int, default=4)
    parser.add_argument(
        "--steps", type=int, default=None,
        help="default: 2000 (base) / 500 (smoke)",
    )
    parser.add_argument(
        "--max_seq_length", type=int, default=None,
        help="default: 128; multi_chunk: 2 chunks (2x512 base, 2x32 tiny)",
    )
    parser.add_argument("--max_concat_length", type=int, default=96)
    parser.add_argument("--max_query_length", type=int, default=32)
    parser.add_argument("--dtype", default="bfloat16")
    # KD to a random-init teacher is schedule-sensitive in BOTH directions:
    # too short stalls mid-flight collapsed toward the mean (60 steps ->
    # ndcg 0 on smoke); too hot at base scale kills input sensitivity
    # entirely (3e-4 -> constant embeddings, ndcg 0 even after 3000 steps).
    # Validated: tiny/smoke 3e-4 x 500 (ndcg 0.195 -> 0.61); RoBERTa-base
    # 2e-5 x 2000 (ndcg 0.0165 -> 0.504, mrr 0.0415 -> 0.791 on v5e).
    parser.add_argument(
        "--learning_rate", type=float, default=None,
        help="default: 2e-5 (base) / 3e-4 (smoke)",
    )
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument(
        "--smoke", action="store_true",
        help="tiny arch + 8-device CPU mesh + small corpus (CI-sized)",
    )
    parser.add_argument(
        "--teacher_warmup_steps", type=int, default=None,
        help="contrastively train the teacher's question tower on the "
        "lexical owned-passage truth before KD (default: 0; dpr: 500 -- "
        "raw-CLS random init is rank-degenerate, see build_warmup_ranking)",
    )
    args = parser.parse_args(argv)
    if args.teacher_warmup_steps is None:
        args.teacher_warmup_steps = 500 if args.model_type == "dpr" else 0

    if args.smoke:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.n_passages = min(args.n_passages, 1500)
        args.n_topics = min(args.n_topics, 6)
        args.dtype = "float32"
    args.steps = args.steps or (500 if args.smoke else 2000)
    args.learning_rate = args.learning_rate or (3e-4 if args.smoke else 2e-5)

    multi_chunk = args.model_type == "rdot_nll_multi_chunk"
    chunk_len = (32 if args.smoke else 512) if multi_chunk else None
    if args.max_seq_length is None:
        args.max_seq_length = 2 * chunk_len if multi_chunk else 128
    # multi-chunk: passages must spill into chunk 2 (~0.7 words/token); the
    # corpus shrinks to keep total token volume comparable
    passage_words = (
        max(30, int(args.max_seq_length * 0.8)) if multi_chunk else 30
    )
    if multi_chunk and not args.smoke:
        args.n_passages = min(args.n_passages, 12_000)

    import numpy as np

    from convdr_tpu.drivers import (
        gen_passage_embeddings,
        run_convdr_inference,
        run_convdr_train,
        tokenize_collection,
    )
    from convdr_tpu.etl import ranking_data

    wd = args.workdir
    raw = os.path.join(wd, "raw")
    processed = os.path.join(wd, "processed")
    embeddings = os.path.join(wd, "embeddings")
    os.makedirs(raw, exist_ok=True)

    rng = np.random.RandomState(17)
    topics = [
        f"{WORDS[rng.randint(len(WORDS))]} {WORDS[rng.randint(len(WORDS))]}"
        for _ in range(args.n_topics)
    ]
    make_corpus(os.path.join(raw, "collection.tsv"), args.n_passages, topics,
                rng, base_words=passage_words)
    make_topics(
        os.path.join(raw, "eval_topics.jsonl"),
        os.path.join(raw, "queries.raw.tsv"),
        topics, args.turns, rng,
    )

    arch = ["--arch_size", "tiny"] if args.smoke else []
    common_model = ["--model_type", args.model_type, "--dtype", args.dtype] + arch

    # 1) tokenize
    run(tokenize_collection, [
        "--collection", os.path.join(raw, "collection.tsv"),
        "--out_data_dir", processed,
        "--model_type", args.model_type,
        "--max_seq_length", str(args.max_seq_length),
        "--num_workers", "1",
    ], "tokenize")

    # 2) teacher corpus embeddings (length-bucketed)
    run(gen_passage_embeddings, [
        "--data_dir", processed,
        "--checkpoint", "init",
        "--output_dir", embeddings,
        "--cache_dir", os.path.join(wd, "cache"),
        "--per_gpu_eval_batch_size", "64",
        "--length_buckets", "auto",
    ] + common_model, "embed")

    infer_common = [
        "--eval_file", os.path.join(raw, "eval_topics.jsonl"),
        "--ann_data_dir", embeddings,
        "--processed_data_dir", processed,
        "--raw_data_dir", raw,
        "--output_query_type", "raw",
        "--top_n", "100",
        "--max_concat_length", str(args.max_concat_length),
        "--max_query_length", str(args.max_query_length),
        "--per_gpu_eval_batch_size", "32",
    ] + common_model

    import jax

    n_dev = len(jax.devices())
    n_examples = args.n_topics * args.turns
    per_gpu = max(1, min(args.batch_size, n_examples // n_dev))

    # 2b) teacher warmup (dpr): train the question tower contrastively on
    # the lexical owned-passage truth so the frozen teacher's geometry is
    # discriminative (random-init raw-CLS ranks every query identically;
    # see build_warmup_ranking). The ctx tower receives no gradient (docs
    # are encoded by the frozen teacher inside the ranking loss), so the
    # corpus embeddings from step 2 remain valid for the warmed model.
    teacher_path = "init"
    if args.teacher_warmup_steps > 0:
        warm_rank = os.path.join(wd, "warmup_rank.jsonl")
        build_warmup_ranking(
            os.path.join(raw, "eval_topics.jsonl"),
            os.path.join(raw, "collection.tsv"), warm_rank, rng,
        )
        teacher_path = os.path.join(wd, "teacher_warm")
        run(run_convdr_train, [
            "--output_dir", teacher_path,
            "--train_file", warm_rank,
            "--query", "target",
            "--teacher_model", "init",
            "--model_name_or_path", "init",
            "--ranking_task", "--no_mse",
            "--max_steps", str(args.teacher_warmup_steps),
            "--learning_rate", str(args.learning_rate),
            "--per_gpu_train_batch_size", str(per_gpu),
            "--max_concat_length", str(args.max_concat_length),
            "--max_query_length", str(args.max_query_length),
            "--max_doc_length", str(args.max_seq_length),
            "--log_steps", "50",
            "--overwrite_output_dir",
        ] + common_model, "teacher-warmup")

    # 3) teacher on MANUAL rewrites -> defines qrels (and the ranking run)
    teacher_trec = os.path.join(wd, "teacher_manual.trec")
    run(run_convdr_inference, infer_common + [
        "--model_path", teacher_path,
        "--query", "target",
        "--output_trec_file", teacher_trec,
    ], "teacher-run")
    qrels = os.path.join(raw, "qrels.tsv")
    build_qrels_from_run(teacher_trec, qrels)

    # 4) untrained student on raw conversational input
    metrics_base = run(run_convdr_inference, infer_common + [
        "--model_path", "init",
        "--query", "no_res",
        "--qrels", qrels,
        "--output_trec_file", os.path.join(wd, "baseline.trec"),
    ], "baseline-eval")

    # 5) ranking data from the teacher run (judged negatives + positives)
    train_rank = os.path.join(wd, "train_rank.jsonl")
    run(ranking_data, [
        "--train", os.path.join(raw, "eval_topics.jsonl"),
        "--run", teacher_trec,
        "--qrels", qrels,
        "--output", train_rank,
        "--collection", os.path.join(raw, "collection.tsv"),
        "--num_negs", "9",
        "--seed", "13",
    ], "ranking-data")

    # 6) KD + ranking training. One optimizer batch spans all devices;
    # keep it <= the training-set size or no step would fit (the loop
    # rejects that explicitly).
    model_dir = os.path.join(wd, "model")
    run(run_convdr_train, [
        "--output_dir", model_dir,
        "--train_file", train_rank,
        "--query", "no_res",
        "--teacher_model", teacher_path,
        "--model_name_or_path", "init",
        "--ranking_task",
        "--max_steps", str(args.steps),
        "--learning_rate", str(args.learning_rate),
        "--per_gpu_train_batch_size", str(per_gpu),
        "--max_concat_length", str(args.max_concat_length),
        "--max_query_length", str(args.max_query_length),
        # ranking docs share the corpus token budget (for multi-chunk the
        # driver rounds this to a chunk multiple)
        "--max_doc_length", str(args.max_seq_length),
        "--log_steps", "20",
        "--overwrite_output_dir",
    ] + common_model, "train")

    # 7) trained student on raw conversational input
    metrics_post = run(run_convdr_inference, infer_common + [
        "--model_path", model_dir,
        "--query", "no_res",
        "--qrels", qrels,
        "--output_trec_file", os.path.join(wd, "trained.trec"),
    ], "trained-eval")

    # 8) recall@100 oracle subset check
    mismatches = oracle_subset_check(
        embeddings, processed, raw, model_dir, args
    )

    summary = {
        "baseline": {k: round(v, 4) for k, v in metrics_base.items()},
        "trained": {k: round(v, 4) for k, v in metrics_post.items()},
        "oracle_set_mismatches_8q": mismatches,
        "config": {
            "model_type": args.model_type,
            "n_passages": args.n_passages, "n_topics": args.n_topics,
            "turns": args.turns, "steps": args.steps, "smoke": args.smoke,
            "max_seq_length": args.max_seq_length,
        },
    }
    print(json.dumps(summary, indent=2))
    with open(os.path.join(wd, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)

    assert mismatches == 0, "searcher recall@100 diverged from oracle"
    for key in ("ndcg_cut_3", "mrr"):
        assert metrics_post[key] > metrics_base[key], (
            f"{key} did not improve: {metrics_base[key]} -> {metrics_post[key]}"
        )
    print("[rehearsal] PASS: KD training improved conversational retrieval")
    return summary


if __name__ == "__main__":
    main()
