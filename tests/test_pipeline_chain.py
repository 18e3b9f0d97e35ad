"""The five-program pipeline chained on the REAL ETL formats (VERDICT r3
#10): cast19 ETL -> tokenize -> train -> embed -> inference, exactly the
chain the README quick start writes, as one driver-level regression net.

Mirrors the reference's program pipeline (SURVEY §0: raw corpora -> (1)
dataset ETL -> (2) tokenize -> (3) gen_passage_embeddings -> (4a) train /
(4b) inference), starting from the raw CAsT-19 input formats (TREC-CAR
cbor + MARCO tsv + topic JSON/TSV + qrels) rather than pre-made tsv
fixtures — every on-disk contract between programs is exercised.
"""

import json
import os

import numpy as np
import pytest

from convdr_tpu.etl import cast19
from convdr_tpu.etl.cbor_car import encode_item

TOPICS = ["cats", "dogs", "fish", "birds"]


@pytest.fixture(scope="module")
def chain(tmp_path_factory):
    """Raw CAsT-19-format inputs: 8 CAR passages + 8 MARCO passages over 4
    topics, 4 conversations of 2 turns each, qrels on both id spaces."""
    work = tmp_path_factory.mktemp("chain")
    cast = work / "cast"
    os.makedirs(cast)
    with open(work / "car.cbor", "wb") as f:
        for i in range(8):
            f.write(encode_item([
                1, f"carpid{i}",
                [[0, f"car facts about {TOPICS[i % 4]} number {i}"]],
            ]))
    with open(work / "marco.tsv", "w") as f:
        for i in range(8):
            f.write(f"{i}\tmarco facts about {TOPICS[i % 4]} number {i}\n")
    with open(work / "dup.txt", "w") as f:
        f.write("CAR_carpid0:MARCO_7\n")  # MARCO_7 deduped away
    topics_json = [
        {
            "number": 31 + t,
            "title": f"topic {t}",
            "description": "",
            "turn": [
                {"number": 1, "raw_utterance": f"tell me about {topic}"},
                {"number": 2, "raw_utterance": "more please"},
            ],
        }
        for t, topic in enumerate(TOPICS)
    ]
    with open(cast / "evaluation_topics_v1.0.json", "w") as f:
        json.dump(topics_json, f)
    with open(
        cast / "evaluation_topics_annotated_resolved_v1.0.tsv", "w"
    ) as f:
        for t, topic in enumerate(TOPICS):
            f.write(f"{31 + t}_1\ttell me about {topic}\n")
            f.write(f"{31 + t}_2\tmore about {topic}\n")
    with open(cast / "2019qrels.txt", "w") as f:
        for t in range(4):
            for i in range(8):
                if i % 4 == t:
                    f.write(f"{31 + t}_1 0 CAR_carpid{i} 2\n")
                    if i != 7:  # MARCO_7 deduped out of the collection
                        f.write(f"{31 + t}_1 0 MARCO_{i} 1\n")
    return work


def test_five_program_chain(chain):
    # ---- (1) dataset ETL: raw CAsT-19 -> collection/topics/queries/qrels
    data = chain / "datasets"
    coll = chain / "collections"
    cast19.main([
        "--car_cbor", str(chain / "car.cbor"),
        "--msmarco_collection", str(chain / "marco.tsv"),
        "--duplicate_file", str(chain / "dup.txt"),
        "--cast_dir", str(chain / "cast"),
        "--out_data_dir", str(data),
        "--out_collection_dir", str(coll),
    ])
    n_passages = len(open(coll / "collection.tsv").read().strip().split("\n"))
    assert n_passages == 15  # 8 CAR + 8 MARCO - 1 dup
    # inference reads queries + qrels + collection from one raw dir
    os.symlink(coll / "collection.tsv", data / "collection.tsv")

    # ---- (2) tokenize the ETL collection into the binary token cache
    from convdr_tpu.drivers import tokenize_collection

    count = tokenize_collection.main([
        "--collection", str(coll / "collection.tsv"),
        "--out_data_dir", str(chain / "processed"),
        "--model_type", "rdot_nll",
        "--max_seq_length", "32",
        "--num_workers", "2",
    ])
    assert count == n_passages

    # ---- (4a) train ConvDR on the ETL topics (KD to a frozen teacher)
    from convdr_tpu.drivers import run_convdr_train

    run_convdr_train.main([
        "--output_dir", str(chain / "model"),
        "--model_type", "rdot_nll",
        "--teacher_model", "init",
        "--model_name_or_path", "init",
        "--train_file", str(data / "eval_topics.jsonl"),
        "--query", "no_res",
        "--per_gpu_train_batch_size", "1",
        "--num_train_epochs", "1",
        "--max_concat_length", "48",
        "--max_query_length", "16",
        "--arch_size", "tiny",
        "--learning_rate", "1e-4",
    ])
    assert (chain / "model").exists()

    # ---- (3) embed the corpus into retrieval blocks
    from convdr_tpu.drivers import gen_passage_embeddings

    gen_passage_embeddings.main([
        "--data_dir", str(chain / "processed"),
        "--checkpoint", str(chain / "model"),
        "--output_dir", str(chain / "embeddings"),
        "--model_type", "rdot_nll",
        "--per_gpu_eval_batch_size", "8",
        "--arch_size", "tiny",
        "--no_mesh",
    ])
    from convdr_tpu.retrieval.blocks import load_embedding_block

    blk = load_embedding_block(str(chain / "embeddings"), 0)
    assert blk is not None

    # ---- (4b) retrieve + evaluate on the ETL eval topics/qrels
    from convdr_tpu.drivers import run_convdr_inference

    trec_file = chain / "run.trec"
    metrics = run_convdr_inference.main([
        "--model_path", str(chain / "model"),
        "--eval_file", str(data / "eval_topics.jsonl"),
        "--model_type", "rdot_nll",
        "--ann_data_dir", str(chain / "embeddings"),
        "--processed_data_dir", str(chain / "processed"),
        "--raw_data_dir", str(data),
        "--qrels", str(data / "qrels.tsv"),
        "--output_trec_file", str(trec_file),
        "--output_query_type", "raw",
        "--top_n", "10",
        "--max_concat_length", "48",
        "--arch_size", "tiny",
        "--no_mesh",
    ])
    # metrics computed in-process over the ETL qrels (4 judged turn-1
    # queries; turn-2 queries are unjudged)
    assert "ndcg_cut_3" in metrics and "recall_10" in metrics

    # ---- retrieval correctness: the driver's TREC ranking must equal a
    # numpy exact-oracle ranking of the same checkpoint's embeddings
    # (set equality at top-10 per query) — the chain fails if retrieval,
    # not just the file formats, regresses (VERDICT r4 Weak #3)
    import jax.numpy as jnp

    from convdr_tpu.data.token_cache import load_offset2pid
    from convdr_tpu.drivers.run_convdr_inference import (
        encode_queries,
        get_arguments,
    )
    from convdr_tpu.evaluation.metrics import parse_trec_run
    from convdr_tpu.retrieval.blocks import iter_embedding_blocks

    infer_args = get_arguments([
        "--model_path", str(chain / "model"),
        "--eval_file", str(data / "eval_topics.jsonl"),
        "--model_type", "rdot_nll",
        "--ann_data_dir", str(chain / "embeddings"),
        "--processed_data_dir", str(chain / "processed"),
        "--raw_data_dir", str(data),
        "--output_query_type", "raw",
        "--max_concat_length", "48",
        "--arch_size", "tiny",
        "--no_mesh",
    ])
    qids, q_embs, _raw = encode_queries(
        infer_args, str(chain / "model"), str(data / "eval_topics.jsonl"),
        jnp.float32,
    )
    rows, rowids = [], []
    for _b, emb, offs in iter_embedding_blocks(str(chain / "embeddings")):
        rows.append(np.asarray(emb, np.float32))
        rowids.append(np.asarray(offs, np.int64))
    corpus = np.concatenate(rows)
    rowids = np.concatenate(rowids)
    offset2pid = load_offset2pid(str(chain / "processed"))
    scores = q_embs.astype(np.float32) @ corpus.T
    run = parse_trec_run(str(trec_file))
    for r, qid in enumerate(qids):
        top = rowids[np.argsort(-scores[r], kind="stable")[:10]]
        oracle_pids = {offset2pid[int(o)] for o in top}
        got_pids = {pid for pid, _s in run[qid][:10]}
        assert got_pids == oracle_pids, (
            f"{qid}: driver ranking diverged from the numpy oracle"
        )

    # TREC run format: qid Q0 pid rank score ance, pids in the ETL's
    # remapped id space (CAR base 10,000,000 / MARCO dense ints)
    lines = open(trec_file).read().strip().split("\n")
    assert len(lines) == 8 * 10  # 8 eval turns x top_n
    qids = set()
    for line in lines:
        qid, q0, pid, rank, _score, tag = line.split(" ")
        assert q0 == "Q0" and tag == "ance"
        assert 0 <= int(pid) < 8 or 10000000 <= int(pid) < 10000008
        qids.add(qid)
    assert qids == {f"{31 + t}_{n}" for t in range(4) for n in (1, 2)}
