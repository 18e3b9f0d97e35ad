import math

from convdr_tpu.evaluation.metrics import (
    average_precision,
    evaluate_run,
    mean_metrics,
    mrr,
    ndcg_at_k,
    parse_trec_run,
    recall_at_k,
)


QRELS = {"q1": {1: 2, 2: 1, 3: 0, 9: 3}}


def test_ndcg_perfect_ranking():
    # ideal order: 9 (rel 3), 1 (rel 2), 2 (rel 1)
    assert ndcg_at_k([9, 1, 2], QRELS["q1"], 3) == 1.0


def test_ndcg_linear_gain_convention():
    # trec_eval ndcg_cut uses rel/log2(rank+1)
    got = ndcg_at_k([1, 9], QRELS["q1"], 2)
    dcg = 2 / math.log2(2) + 3 / math.log2(3)
    idcg = 3 / math.log2(2) + 2 / math.log2(3)
    assert abs(got - dcg / idcg) < 1e-12


def test_ndcg_no_relevant():
    assert ndcg_at_k([1, 2], {}, 3) == 0.0


def test_mrr_positions():
    assert mrr([3, 1, 2], QRELS["q1"]) == 0.5  # rel(3)=0, rel(1)=2
    assert mrr([9], QRELS["q1"]) == 1.0
    assert mrr([3], QRELS["q1"]) == 0.0


def test_recall():
    # relevant: {1, 2, 9}
    assert recall_at_k([1, 2, 3], QRELS["q1"], 3) == 2 / 3
    assert recall_at_k([1, 2, 9], QRELS["q1"], 3) == 1.0


def test_average_precision():
    # relevant {1,2,9}; ranking [1, 7, 2]: AP = (1/1 + 2/3)/3
    got = average_precision([1, 7, 2], QRELS["q1"])
    assert abs(got - (1 + 2 / 3) / 3) < 1e-12


def test_evaluate_run_and_mean():
    run = {"q1": [(9, 5.0), (1, 4.0), (2, 3.0)], "q_unjudged": [(5, 1.0)]}
    per_q = evaluate_run(run, QRELS, ndcg_cuts=(3,), recall_cuts=(3,))
    assert set(per_q) == {"q1"}  # unjudged queries skipped
    assert per_q["q1"]["ndcg_cut_3"] == 1.0
    means = mean_metrics(per_q)
    assert means["mrr"] == 1.0


def test_evaluate_run_skips_no_relevant_topics():
    """trec_eval excludes num_rel==0 topics from num_q: a judged query
    whose judgments are all rel<=0 contributes nothing (not zeros)."""
    qrels = {"q1": {1: 2}, "q0": {5: 0, 6: 0}}
    run = {"q1": [(1, 2.0)], "q0": [(5, 1.0)]}
    per_q = evaluate_run(run, qrels)
    assert set(per_q) == {"q1"}
    assert mean_metrics(per_q)["mrr"] == 1.0


def test_golden_fixture():
    """The committed run+qrels golden: values hand-derived from
    trec_eval's documented formulas (fixtures/metrics_golden/DERIVATION.md
    shows the full arithmetic). Loads through the REAL parsers so loader
    quirks (first-positive-line topic creation) are pinned too."""
    import json
    import os

    from convdr_tpu.data.collection import load_qrels

    fdir = os.path.join(os.path.dirname(__file__), "fixtures",
                        "metrics_golden")
    run = parse_trec_run(os.path.join(fdir, "run.trec"))
    qrels = load_qrels(os.path.join(fdir, "qrels.tsv"))
    with open(os.path.join(fdir, "expected.json")) as f:
        expected = json.load(f)
    per_q = evaluate_run(run, qrels, ndcg_cuts=(3,), recall_cuts=(2, 100))
    assert set(per_q) == set(expected["per_query"])
    for qid, wants in expected["per_query"].items():
        for metric, want in wants.items():
            assert abs(per_q[qid][metric] - want) < 1e-12, (qid, metric)
    means = mean_metrics(per_q)
    for metric, want in expected["mean"].items():
        assert abs(means[metric] - want) < 1e-12, metric


def test_parse_trec_run_roundtrip(tmp_path):
    from convdr_tpu.retrieval.run_writer import write_trec_run

    run = {"31_1": [(7, 0.9), (3, 0.8)], "31_2": [(5, 0.7)]}
    path = str(tmp_path / "run.trec")
    write_trec_run(run, path)
    back = parse_trec_run(path)
    assert [pid for pid, _ in back["31_1"]] == [7, 3]
    # reference writes rank-derived scores 199, 198, ...
    with open(path) as f:
        first = f.readline().split()
    assert first == ["31_1", "Q0", "7", "1", "199", "ance"]
