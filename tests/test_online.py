"""Online serving path: the fused single-dispatch program must reproduce
the batch two-dispatch pipeline exactly (same model, same index, same
results), for every resident backend (flat f32/int8, IVF int8, IVFPQ).

Reference surface: /root/reference/drivers/run_convdr_inference.py:181-189
(the reference's per-query latency instrumentation — its serving shape is
encode-then-search, two device programs; retrieval/online.py fuses them).
"""

import json
import os

import numpy as np
import pytest

from convdr_tpu.drivers import (
    build_ivf_index,
    gen_passage_embeddings,
    run_convdr_inference,
    run_convdr_train,
    serve_online,
    tokenize_collection,
)

TOPICS = ["cats", "dogs", "fish", "birds"]
N_PASSAGES = 24


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    """Tokenize -> train (3 steps) -> embed -> IVF indexes, once."""
    work = tmp_path_factory.mktemp("online")
    raw = work / "raw"
    os.makedirs(raw)
    with open(raw / "collection.tsv", "w") as f:
        for pid in range(N_PASSAGES):
            f.write(f"{pid}\tall about {TOPICS[pid % 4]} number {pid}\n")
    with open(raw / "queries.raw.tsv", "w") as f:
        for t, topic in enumerate(TOPICS):
            f.write(f"{t + 1}_1\ttell me about {topic}\n")
    with open(raw / "eval_topics.jsonl", "w") as f:
        for t, topic in enumerate(TOPICS):
            f.write(json.dumps({
                "topic_number": t + 1,
                "query_number": 1,
                "input": [f"hi there", f"tell me about {topic}"],
                "target": f"tell me about {topic}",
            }) + "\n")
    with open(raw / "qrels.tsv", "w") as f:
        for t in range(4):
            for pid in range(N_PASSAGES):
                if pid % 4 == t:
                    f.write(f"{t + 1}_1\t0\t{pid}\t1\n")
    tokenize_collection.main([
        "--collection", str(raw / "collection.tsv"),
        "--out_data_dir", str(work / "processed"),
        "--model_type", "rdot_nll",
        "--max_seq_length", "32",
        "--num_workers", "1",
    ])
    run_convdr_train.main([
        "--output_dir", str(work / "model"),
        "--model_name_or_path", "init",
        "--train_file", str(raw / "eval_topics.jsonl"),
        "--model_type", "rdot_nll",
        "--max_steps", "3",
        "--per_gpu_train_batch_size", "2",
        "--max_concat_length", "48",
        "--max_query_length", "48",
        "--learning_rate", "1e-3",
        "--arch_size", "tiny",
        "--no_mesh",
    ])
    gen_passage_embeddings.main([
        "--data_dir", str(work / "processed"),
        "--checkpoint", str(work / "model"),
        "--model_type", "rdot_nll",
        "--output_dir", str(work / "embeddings"),
        "--per_gpu_eval_batch_size", "8",
        "--num_blocks", "2",
        "--dtype", "float32",
        "--arch_size", "tiny",
        "--no_mesh",
    ])
    build_ivf_index.main([
        "--ann_data_dir", str(work / "embeddings"),
        "--index_dir", str(work / "ivf_int8"),
        "--nlist", "4",
        "--storage_dtype", "int8",
        "--kmeans_iters", "6",
    ])
    build_ivf_index.main([
        "--ann_data_dir", str(work / "embeddings"),
        "--index_dir", str(work / "ivfpq"),
        "--nlist", "4",
        "--storage_dtype", "pq4",
        "--pq_m", "8",
        "--kmeans_iters", "6",
    ])
    return work


def _serve(workdir, tmp_path, *extra):
    trec = tmp_path / "serve.trec"
    out = serve_online.main([
        "--model_path", str(workdir / "model"),
        "--eval_file", str(workdir / "raw" / "eval_topics.jsonl"),
        "--model_type", "rdot_nll",
        "--processed_data_dir", str(workdir / "processed"),
        "--qrels", str(workdir / "raw" / "qrels.tsv"),
        "--output_trec_file", str(trec),
        "--top_n", "10",
        "--max_concat_length", "48",
        "--arch_size", "tiny",
        *extra,
    ])
    return out, trec


def _batch_run(workdir, tmp_path, *extra):
    trec = tmp_path / "batch.trec"
    run_convdr_inference.main([
        "--model_path", str(workdir / "model"),
        "--eval_file", str(workdir / "raw" / "eval_topics.jsonl"),
        "--model_type", "rdot_nll",
        "--ann_data_dir", str(workdir / "embeddings"),
        "--processed_data_dir", str(workdir / "processed"),
        "--raw_data_dir", str(workdir / "raw"),
        "--output_trec_file", str(trec),
        "--output_query_type", "raw",
        "--top_n", "10",
        "--max_concat_length", "48",
        "--arch_size", "tiny",
        "--no_mesh",
        # Q=1 encode batches: the same program shape as the online path,
        # so embeddings (and scores) are bit-identical, not just close
        "--per_gpu_eval_batch_size", "1",
        *extra,
    ])
    return trec


def _runs_equal(trec_a, trec_b, *, sets_only=False):
    from convdr_tpu.evaluation.metrics import parse_trec_run

    ra, rb = parse_trec_run(str(trec_a)), parse_trec_run(str(trec_b))
    assert set(ra) == set(rb)
    for qid in ra:
        pids_a = [pid for pid, _ in ra[qid]]
        pids_b = [pid for pid, _ in rb[qid]]
        if sets_only:
            assert set(pids_a) == set(pids_b), qid
        else:
            assert pids_a == pids_b, qid


def test_flat_f32_serve_matches_batch_driver(workdir, tmp_path):
    """One-dispatch flat f32 serving reproduces the batch driver's TREC
    ranking exactly (same checkpoint, same blocks, HIGHEST matmul)."""
    out, trec = _serve(
        workdir, tmp_path, "--ann_data_dir", str(workdir / "embeddings")
    )
    batch_trec = _batch_run(workdir, tmp_path)
    _runs_equal(trec, batch_trec)
    lat = out["serving_latency"]
    assert lat["count"] == len(TOPICS)  # warmup excluded
    assert lat["p50_ms"] > 0 and lat["p99_ms"] >= lat["p50_ms"]


def test_flat_int8_serve_matches_batch_driver(workdir, tmp_path):
    """The in-jit SQ8 query fold (online.py::_fold_int8_queries) must
    reproduce the host quantize_queries path bit for bit: same ranking,
    same scores as the batch driver's --storage_dtype int8."""
    out, trec = _serve(
        workdir, tmp_path,
        "--ann_data_dir", str(workdir / "embeddings"),
        "--storage_dtype", "int8",
    )
    batch_trec = _batch_run(workdir, tmp_path, "--storage_dtype", "int8")
    _runs_equal(trec, batch_trec)
    assert out["serving_latency"]["count"] == len(TOPICS)


def test_ivf_int8_serve_matches_offline_index(workdir, tmp_path):
    """Full-probe online IVF == the offline index search (and therefore
    the exact oracle, test_drivers.test_04h)."""
    _out, trec = _serve(
        workdir, tmp_path,
        "--ivf_dir", str(workdir / "ivf_int8"),
        "--nprobe", "999",
    )
    batch_trec = _batch_run(
        workdir, tmp_path,
        "--ivf_dir", str(workdir / "ivf_int8"), "--nprobe", "999",
    )
    _runs_equal(trec, batch_trec)


def test_ivfpq_serve_matches_offline_index(workdir, tmp_path):
    """Online IVFPQ (in-jit ADC LUT) == offline probe at the same nprobe.
    The LUT einsum runs on device at HIGHEST f32 vs host numpy f32 —
    sets must match (the repo's large-scale exactness convention)."""
    _out, trec = _serve(
        workdir, tmp_path,
        "--ivf_dir", str(workdir / "ivfpq"),
        "--nprobe", "999",
    )
    batch_trec = _batch_run(
        workdir, tmp_path,
        "--ivf_dir", str(workdir / "ivfpq"), "--nprobe", "999",
    )
    _runs_equal(trec, batch_trec, sets_only=True)


def test_history_tokenize_matches_dataset(workdir):
    """history_to_inputs must produce the dataset's inference-mode concat
    ids token for token (the serving tokenizer IS the eval tokenizer)."""
    from convdr_tpu.data.conv_dataset import ConvSearchDataset
    from convdr_tpu.data.tokenizers import load_tokenizer
    from convdr_tpu.retrieval.online import history_to_inputs

    tokenizer = load_tokenizer("roberta", "tiny")
    dataset = ConvSearchDataset(
        [str(workdir / "raw" / "eval_topics.jsonl")],
        tokenizer,
        mode="inference",
        query_mode="no_res",
        model_type="rdot_nll",
        max_concat_length=48,
    )
    for batch in dataset.batches(1):
        history = batch["history_utterances"][0]
        ids, mask = history_to_inputs(
            tokenizer, history, model_type="rdot_nll", max_concat_length=48
        )
        np.testing.assert_array_equal(ids[0], batch["concat_ids"][0])
        np.testing.assert_array_equal(mask[0], batch["concat_mask"][0])


def test_history_tokenize_matches_dataset_man_can(tmp_path):
    """The <response> injection must match the dataset's man_can path:
    history_to_inputs takes the raw ``input`` turns (WITHOUT the response
    inserted) plus response_text, exactly like parse_topics_file feeds
    _concat_session_ids (reference util.py:463-466)."""
    from convdr_tpu.data.conv_dataset import ConvSearchDataset
    from convdr_tpu.data.tokenizers import load_tokenizer
    from convdr_tpu.retrieval.online import history_to_inputs

    tokenizer = load_tokenizer("roberta", "tiny")
    topics = tmp_path / "topics.jsonl"
    records = [
        {
            "topic_number": t + 1,
            "query_number": 1,
            "input": ["hi there", f"more on {topic}", f"treat {topic}?"],
            "target": f"tell me about {topic}",
            "manual_response": [f"{topic} overview", f"{topic} causes"],
        }
        for t, topic in enumerate(TOPICS)
    ]
    with open(topics, "w") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")
    dataset = ConvSearchDataset(
        [str(topics)],
        tokenizer,
        mode="inference",
        query_mode="man_can",
        model_type="rdot_nll",
        max_concat_length=64,
    )
    for batch, rec in zip(dataset.batches(1), records):
        ids, mask = history_to_inputs(
            tokenizer,
            rec["input"],
            model_type="rdot_nll",
            max_concat_length=64,
            response_text=rec["manual_response"][-2],
        )
        np.testing.assert_array_equal(ids[0], batch["concat_ids"][0])
        np.testing.assert_array_equal(mask[0], batch["concat_mask"][0])


def test_serve_stats_empty_summary():
    from convdr_tpu.retrieval.online import ServeStats

    stats = ServeStats([])
    assert stats.summary() == {"count": 0}
    with pytest.raises(ValueError):
        stats.percentile(50)


def test_gather_by_position_rejects_negative(tmp_path):
    from convdr_tpu.retrieval.blocks import write_embedding_block
    from convdr_tpu.retrieval.refine import RefineStore

    rows = np.arange(12, dtype=np.float32).reshape(4, 3)
    write_embedding_block(str(tmp_path), 0, rows, np.arange(4, dtype=np.int64))
    store = RefineStore.open(str(tmp_path), 3)
    with pytest.raises(IndexError):
        store.gather_by_position(np.array([-1]))
    with pytest.raises(IndexError):
        store.gather_by_position(np.array([4]))
