"""Multi-chip validation on the virtual CPU mesh: the graft entry points and
the meshed driver path (what the external driver exercises with N virtual
devices)."""

import importlib.util
import os

import jax
import pytest


def load_graft():
    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dryrun_multichip_8():
    graft = load_graft()
    graft.dryrun_multichip(len(jax.devices()))


def test_dryrun_multichip_2():
    graft = load_graft()
    graft.dryrun_multichip(2)


def test_entry_abstract_shape():
    graft = load_graft()
    fn, args = graft.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape[-1] == 768


def test_inference_driver_meshed(tmp_path):
    """run_convdr_inference without --no_mesh shards search over the 8
    virtual devices (the index-axis path end to end through the CLI)."""
    import json

    from convdr_tpu.drivers import (
        gen_passage_embeddings,
        run_convdr_inference,
        tokenize_collection,
    )

    raw = tmp_path / "raw"
    os.makedirs(raw)
    topics = ["cats", "dogs"]
    with open(raw / "collection.tsv", "w") as f:
        for pid in range(12):
            f.write(f"{pid}\tall about {topics[pid % 2]} number {pid}\n")
    with open(raw / "queries.raw.tsv", "w") as f:
        for t, topic in enumerate(topics):
            f.write(f"{t + 1}_1\ttell me about {topic}\n")
    with open(raw / "eval_topics.jsonl", "w") as f:
        for t, topic in enumerate(topics):
            f.write(json.dumps({
                "topic_number": t + 1, "query_number": 1,
                "input": [f"tell me about {topic}"],
                "target": f"tell me about {topic}",
            }) + "\n")
    with open(raw / "qrels.tsv", "w") as f:
        for t in range(2):
            for pid in range(12):
                if pid % 2 == t:
                    f.write(f"{t + 1}_1\t0\t{pid}\t1\n")

    tokenize_collection.main([
        "--collection", str(raw / "collection.tsv"),
        "--out_data_dir", str(tmp_path / "processed"),
        "--model_type", "rdot_nll", "--max_seq_length", "32",
        "--num_workers", "1",
    ])
    gen_passage_embeddings.main([
        "--data_dir", str(tmp_path / "processed"),
        "--checkpoint", "init",
        "--model_type", "rdot_nll",
        "--output_dir", str(tmp_path / "embeddings"),
        "--cache_dir", str(tmp_path / "cache"),
        "--per_gpu_eval_batch_size", "8",
        "--dtype", "float32",
        "--arch_size", "tiny",
        # NOTE: no --no_mesh -> meshed encode over all virtual devices
    ])
    metrics = run_convdr_inference.main([
        "--model_path", "init",
        "--eval_file", str(raw / "eval_topics.jsonl"),
        "--model_type", "rdot_nll",
        "--ann_data_dir", str(tmp_path / "embeddings"),
        "--processed_data_dir", str(tmp_path / "processed"),
        "--raw_data_dir", str(raw),
        "--qrels", str(raw / "qrels.tsv"),
        "--output_trec_file", str(tmp_path / "run.trec"),
        "--output_query_type", "raw",
        "--top_n", "5",
        "--max_concat_length", "48",
        "--arch_size", "tiny",
        # NOTE: no --no_mesh -> sharded search over the index axis
    ])
    assert "mrr" in metrics
