import json
import os
import pickle

import pytest

from convdr_tpu.core.config import NUM_FOLD
from convdr_tpu.etl import cast19, cast20, cast21, orquac
from convdr_tpu.etl.cbor_car import encode_item
from convdr_tpu.etl.common import (
    contiguous_topic_folds,
    load_fold_assignment,
    parse_sim_file,
)
from convdr_tpu.etl.id_remap import remap_run
from convdr_tpu.etl.ranking_data import generate_ranking_data


# ---------------- fixtures ----------------
def make_car_cbor(path, n=3):
    with open(path, "wb") as f:
        for i in range(n):
            f.write(
                encode_item([1, f"carpid{i}", [[0, f"car passage {i} text"]]])
            )


def make_marco_tsv(path, n=4):
    with open(path, "w") as f:
        for i in range(n):
            f.write(f"{i}\tmarco passage {i} text\n")


def make_sim_file(path):
    # MARCO_1 is a duplicate of some CAR passage
    with open(path, "w") as f:
        f.write("CAR_carpid0:MARCO_1\n")
        f.write("CAR_carpid1:\n")


@pytest.fixture()
def cast19_env(tmp_path):
    raw = tmp_path / "cast"
    os.makedirs(raw)
    make_car_cbor(tmp_path / "car.cbor")
    make_marco_tsv(tmp_path / "marco.tsv")
    make_sim_file(tmp_path / "dup.txt")
    topics = [
        {
            "number": 31 + t,
            "title": f"topic {t}",
            "description": "",
            "turn": [
                {"number": 1, "raw_utterance": f"q{t} one"},
                {"number": 2, "raw_utterance": f"q{t} two"},
            ],
        }
        for t in range(NUM_FOLD)
    ]
    with open(raw / "evaluation_topics_v1.0.json", "w") as f:
        json.dump(topics, f)
    with open(raw / "evaluation_topics_annotated_resolved_v1.0.tsv", "w") as f:
        for t in range(NUM_FOLD):
            f.write(f"{31 + t}_1\tmanual q{t} one\n")
            f.write(f"{31 + t}_2\tmanual q{t} two\n")
    with open(raw / "2019qrels.txt", "w") as f:
        f.write("31_1 0 CAR_carpid0 2\n")
        f.write("31_1 0 MARCO_2 1\n")
        f.write("31_2 0 UNKNOWN_9 1\n")
    return tmp_path


def test_parse_sim_file(tmp_path):
    make_sim_file(tmp_path / "dup.txt")
    sim = parse_sim_file(str(tmp_path / "dup.txt"))
    assert sim == {"MARCO_1": 1}


def test_cast19_end_to_end(cast19_env):
    out_data = cast19_env / "out_data"
    out_coll = cast19_env / "out_coll"
    cast19.main([
        "--car_cbor", str(cast19_env / "car.cbor"),
        "--msmarco_collection", str(cast19_env / "marco.tsv"),
        "--duplicate_file", str(cast19_env / "dup.txt"),
        "--cast_dir", str(cast19_env / "cast"),
        "--out_data_dir", str(out_data),
        "--out_collection_dir", str(out_coll),
    ])
    # collection: 3 CAR (ids 10000000..) + 3 MARCO (id 1 deduped)
    lines = open(out_coll / "collection.tsv").read().strip().split("\n")
    assert len(lines) == 6
    assert lines[0].startswith("10000000\t")
    marco_ids = [l.split("\t")[0] for l in lines[3:]]
    assert marco_ids == ["0", "2", "3"]
    # id maps
    with open(out_coll / "car_id_to_idx.pickle", "rb") as f:
        car_map = pickle.load(f)
    assert car_map["CAR_carpid0"] == 10000000
    # topics: cumulative inputs
    recs = [json.loads(l) for l in open(out_data / "eval_topics.jsonl")]
    assert len(recs) == NUM_FOLD * 2
    assert recs[1]["input"] == ["q0 one", "q0 two"]
    assert recs[1]["target"] == "manual q0 two"
    # folds: 5 topics -> one per fold
    for fold in range(NUM_FOLD):
        fold_recs = [
            json.loads(l) for l in open(f"{out_data}/eval_topics.jsonl.{fold}")
        ]
        assert {r["topic_number"] for r in fold_recs} == {str(31 + fold)}
    # qrels remapped; unknown prefix dropped
    qrels = open(out_data / "qrels.tsv").read().strip().split("\n")
    assert qrels == ["31_1\t0\t10000000\t2", "31_1\t0\t2\t1"]


def test_contiguous_topic_folds():
    folds = contiguous_topic_folds([f"t{i}" for i in range(10)])
    assert folds["t0"] == 0 and folds["t9"] == 4


@pytest.fixture()
def cast20_env(cast19_env):
    raw = cast19_env / "cast"
    auto = [
        {
            "number": 81,
            "turn": [
                {
                    "number": 1,
                    "raw_utterance": "auto q1",
                    "automatic_canonical_result_id": "MARCO_0",
                },
                {
                    "number": 2,
                    "raw_utterance": "auto q2",
                    "automatic_canonical_result_id": "CAR_carpid1",
                },
            ],
        }
    ]
    manual = [
        {
            "number": 81,
            "turn": [
                {
                    "number": 1,
                    "manual_rewritten_utterance": "manual q1",
                    "manual_canonical_result_id": "MARCO_2",
                },
                {
                    "number": 2,
                    "manual_rewritten_utterance": "manual q2",
                    "manual_canonical_result_id": "CAR_carpid2",
                },
            ],
        }
    ]
    with open(raw / "2020_automatic_evaluation_topics_v1.0.json", "w") as f:
        json.dump(auto, f)
    with open(raw / "2020_manual_evaluation_topics_v1.0.json", "w") as f:
        json.dump(manual, f)
    with open(raw / "2020qrels.txt", "w") as f:
        f.write("81_1 0 MARCO_3 2\n")
    return cast19_env


def test_cast20_end_to_end(cast20_env):
    out_data = cast20_env / "out20"
    out_coll = cast20_env / "coll20"
    cast20.main([
        "--car_cbor", str(cast20_env / "car.cbor"),
        "--msmarco_collection", str(cast20_env / "marco.tsv"),
        "--duplicate_file", str(cast20_env / "dup.txt"),
        "--cast_dir", str(cast20_env / "cast"),
        "--out_data_dir", str(out_data),
        "--out_collection_dir", str(out_coll),
    ])
    recs = [json.loads(l) for l in open(out_data / "eval_topics.jsonl")]
    assert len(recs) == 2
    # canonical response TEXT captured, cumulative
    assert recs[0]["manual_response"] == ["marco passage 2 text"]
    assert recs[1]["manual_response"] == [
        "marco passage 2 text",
        "car passage 2 text",
    ]
    assert recs[1]["automatic_response_id"] == ["MARCO_0", "CAR_carpid1"]
    # fold: topic 81 -> fold 0
    fold0 = open(f"{out_data}/eval_topics.jsonl.0").read()
    assert len(fold0.strip().split("\n")) == 2


def test_cast21_parser(tmp_path):
    content = (
        "<DOC><DOCNO>DOC_A</DOCNO><TITLE>Title A</TITLE>"
        "<passage id=0>first passage\ncontent</passage>"
        "<passage id=1>second passage</passage></DOC>"
        "<DOC><DOCNO>DOC_B</DOCNO><TITLE>Title B</TITLE>"
        "<passage id=0>b passage</passage></DOC>"
    )
    corpus = tmp_path / "kilt.txt"
    corpus.write_text(content)
    out = tmp_path / "collection.tsv"
    doc_id_to_idx, collection = cast21.build_collection(
        [str(corpus)],
        str(out),
        str(tmp_path / "id2idx.pickle"),
        str(tmp_path / "idx2id.pickle"),
    )
    assert doc_id_to_idx == {"DOC_A-0": 0, "DOC_A-1": 1, "DOC_B-0": 2}
    assert collection[0] == "Title A first passage content"
    lines = open(out).read().strip().split("\n")
    assert lines[2] == "2\tTitle B b passage"


def test_cast21_topics_and_pseudo_qrels(tmp_path):
    corpus = tmp_path / "kilt.txt"
    corpus.write_text(
        "<DOC><DOCNO>DOC_A</DOCNO><TITLE>T</TITLE>"
        "<passage id=0>text zero</passage></DOC>"
    )
    manual = [
        {
            "number": 106,
            "turn": [
                {
                    "number": 1,
                    "raw_utterance": "q one",
                    "manual_rewritten_utterance": "manual one",
                    "canonical_result_id": "DOC_A",
                    "passage_id": 0,
                }
            ],
        }
    ]
    cast_dir = tmp_path / "cast"
    os.makedirs(cast_dir)
    with open(cast_dir / "2021_manual_evaluation_topics_v1.0.json", "w") as f:
        json.dump(manual, f)
    cast21.main([
        "--kilt", str(corpus),
        "--msmarco", "",
        "--wapo", "",
        "--cast_dir", str(cast_dir),
        "--out_data_dir", str(tmp_path / "data21"),
        "--out_collection_dir", str(tmp_path / "coll21"),
    ])
    recs = [json.loads(l) for l in open(tmp_path / "data21" / "eval_topics.jsonl")]
    assert recs[0]["manual_response"] == ["T text zero"]
    qrels = open(tmp_path / "data21" / "qrels.tsv").read().strip()
    assert qrels == "106_1\t0\t0\t1"


def test_orquac_end_to_end(tmp_path):
    orq = tmp_path / "orquac"
    os.makedirs(orq / "preprocessed")
    with open(orq / "all_blocks.txt", "w") as f:
        f.write(json.dumps({"id": "B1", "title": "t1", "text": "text\none"}) + "\n")
        f.write(json.dumps({"id": "B2", "title": "t2", "text": "text two"}) + "\n")
    records = [
        {
            "qid": "D1#1",
            "question": "raw one",
            "rewrite": "rewrite one",
            "answer": {"text": "answer one"},
            "history": [],
        },
        {
            "qid": "D1#2",
            "question": "raw two",
            "rewrite": "rewrite two",
            "answer": {"text": "answer two"},
            "history": [{"question": "raw one"}],
        },
        {
            "qid": "D2#1",
            "question": "other raw",
            "rewrite": "other rewrite",
            "answer": {"text": "other answer"},
            "history": [],
        },
    ]
    for split in ("train", "dev", "test"):
        with open(orq / "preprocessed" / f"{split}.txt", "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
    with open(orq / "qrels.txt", "w") as f:
        json.dump({"D1#1": {"B2": 1}}, f)

    out = tmp_path / "out"
    orquac.main(["--orquac_dir", str(orq), "--output_dir", str(out)])

    coll = [json.loads(l) for l in open(out / "collection.jsonl")]
    assert coll[0] == {"id": 0, "title": "t1", "text": "text one"}
    train = [json.loads(l) for l in open(out / "train.jsonl")]
    assert train[1]["input"] == ["raw one", "raw two"]
    assert train[1]["manual_response"] == ["answer one", "answer two"]
    # responses reset on new dialog
    assert train[2]["manual_response"] == ["other answer"]
    qrels = open(out / "qrels.tsv").read().strip()
    assert qrels == "D1#1\t0\t1\t1"
    assert os.path.exists(out / "queries.dev.raw.tsv")


def test_gen_ranking_data(tmp_path):
    # topics
    train = tmp_path / "train.jsonl"
    with open(train, "w") as f:
        f.write(json.dumps({"topic_number": "31", "query_number": "1",
                            "input": ["q"], "target": "q"}) + "\n")
    # fold file: qid 31_1 -> fold 2
    with open(f"{train}.2", "w") as f:
        f.write(json.dumps({"topic_number": "31", "query_number": "1",
                            "input": ["q"], "target": "q"}) + "\n")
    for fold in (0, 1, 3, 4):
        open(f"{train}.{fold}", "w").close()
    # qrels: pid 1 positive (rel 2), pid 2 judged negative
    qrels = tmp_path / "qrels.tsv"
    with open(qrels, "w") as f:
        f.write("31_1\t0\t1\t2\n31_1\t0\t2\t0\n31_1\t0\t5\t1\n")
    # run: ranked docs
    run = tmp_path / "run.trec"
    with open(run, "w") as f:
        for rank, pid in enumerate([1, 2, 3, 4]):
            f.write(f"31_1 Q0 {pid} {rank + 1} {100 - rank} ance\n")
    coll = tmp_path / "collection.tsv"
    with open(coll, "w") as f:
        for pid in range(6):
            f.write(f"{pid}\tpassage {pid}\n")

    out = tmp_path / "ranking.jsonl"
    n = generate_ranking_data(
        str(train), str(run), str(qrels), str(coll), str(out),
        num_negs=2, cast=True, seed=0,
    )
    assert n == 1
    rec = json.loads(open(out).read())
    # highest-rel positive is pid 1
    assert rec["doc_pos_id"] == 1
    assert rec["doc_pos"] == "passage 1"
    # negatives sampled from the pool {2 (judged), 3, 4 (unjudged)}
    assert 1 not in rec["doc_negs_id"]
    assert len(rec["doc_negs_id"]) == 2
    assert set(rec["doc_negs_id"]) <= {2, 3, 4}
    # fold routing via fold files
    fold2 = open(f"{out}.2").read().strip()
    assert fold2 != ""
    assert open(f"{out}.0").read() == ""


def test_load_fold_assignment(tmp_path):
    base = tmp_path / "topics.jsonl"
    for fold in range(NUM_FOLD):
        with open(f"{base}.{fold}", "w") as f:
            f.write(json.dumps({"qid": f"q{fold}"}) + "\n")
    assign = load_fold_assignment(str(base))
    assert assign == {f"q{i}": i for i in range(NUM_FOLD)}


def test_id_remap(tmp_path):
    with open(tmp_path / "map.pickle", "wb") as f:
        pickle.dump(["DOC_A-0", "DOC_B-3"], f)
    with open(tmp_path / "in.trec", "w") as f:
        f.write("31_1 Q0 1 1 199 ance\n")
    remap_run(
        str(tmp_path / "in.trec"),
        str(tmp_path / "map.pickle"),
        str(tmp_path / "out.trec"),
    )
    assert open(tmp_path / "out.trec").read() == "31_1 Q0 DOC_B-3 1 199 ance\n"


def test_cast21_parser_pid_canonicalization_and_title_state(tmp_path):
    """Reference-scanner equivalences the regex scanner must keep:
    numeric pid canonicalization (id=007 -> 7) and title state carrying
    over to a doc that declares none (preprocess_cast21.py:175-221)."""
    content = (
        "<DOC><DOCNO>D1</DOCNO><TITLE>T1</TITLE>"
        "<passage id=007>padded\tpid</passage></DOC>"
        "<DOC><DOCNO>D2</DOCNO>"  # no TITLE: reuses T1 like the reference
        "<passage id=1>later doc</passage></DOC>"
    )
    corpus = tmp_path / "c.txt"
    corpus.write_text(content)
    doc_id_to_idx, collection = cast21.build_collection(
        [str(corpus)],
        str(tmp_path / "collection.tsv"),
        str(tmp_path / "id2idx.pickle"),
        str(tmp_path / "idx2id.pickle"),
    )
    assert doc_id_to_idx == {"D1-7": 0, "D2-1": 1}
    assert collection[0] == "T1 padded pid"
    assert collection[1] == "T1 later doc"


def test_cast21_parser_warns_on_unclosed_tag(tmp_path, caplog):
    """Unclosed <passage> = corpus corruption: must warn loudly rather
    than silently shorten the collection (shifted dense pids misalign
    qrels downstream; the reference crashed here)."""
    import logging

    content = (
        "<DOC><DOCNO>D</DOCNO><TITLE>T</TITLE>"
        "<passage id=0>fine</passage>"
        "<passage id=1>never closed"
    )
    corpus = tmp_path / "bad.txt"
    corpus.write_text(content)
    with caplog.at_level(logging.WARNING):
        _ids, collection = cast21.build_collection(
            [str(corpus)],
            str(tmp_path / "c.tsv"),
            str(tmp_path / "a.pickle"),
            str(tmp_path / "b.pickle"),
        )
    assert len(collection) == 1
    assert any("unclosed" in r.message for r in caplog.records)
