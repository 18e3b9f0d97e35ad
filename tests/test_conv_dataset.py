import json

import numpy as np
import pytest

from convdr_tpu.data.conv_dataset import ConvSearchDataset, RESPONSE_TOKEN
from convdr_tpu.data.tokenizers import ByteLevelBPETokenizer, WordPieceTokenizer


@pytest.fixture()
def topics_file(tmp_path):
    records = [
        {
            "topic_number": 31,
            "query_number": 1,
            "input": ["what is a cat"],
            "target": "what is a cat",
            "manual_response": [],
            "automatic_response": [],
        },
        {
            "topic_number": 31,
            "query_number": 2,
            "input": ["what is a cat", "what does it eat"],
            "target": "what does a cat eat",
            "manual_response": ["cats are pets", "cats eat fish"],
            "automatic_response": ["cats are pets", "cats eat fish"],
        },
        {
            "qid": "q3",
            "input": ["only question"],
            "target": "only question rewritten",
            "output": "rewriter output",
            "manual_response": [],
            "automatic_response": [],
        },
    ]
    path = tmp_path / "topics.jsonl"
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    return str(path)


@pytest.fixture()
def rtok():
    tok = ByteLevelBPETokenizer.tiny()
    tok.add_tokens([RESPONSE_TOKEN])
    return tok


def test_qid_construction(topics_file, rtok):
    ds = ConvSearchDataset([topics_file], rtok, mode="inference",
                           query_mode="no_res")
    qids = [ex.qid for ex in ds.examples]
    assert qids == ["31_1", "31_2", "q3"]


def test_roberta_concat_layout(topics_file, rtok):
    """<s> q1 </s> <s> q2 </s> for multi-turn (util.py:491-519)."""
    ds = ConvSearchDataset([topics_file], rtok, mode="train",
                           query_mode="no_res", max_concat_length=64)
    ex = ds.examples[1]  # two turns
    ids = ex.concat_ids
    cls_id, sep_id = rtok.cls_token_id, rtok.sep_token_id
    n_valid = sum(ex.concat_mask)
    valid = ids[:n_valid]
    assert valid[0] == cls_id
    assert valid.count(cls_id) == 2
    assert valid.count(sep_id) == 2
    assert valid[-1] == sep_id
    assert len(ids) == 64 and len(ex.concat_mask) == 64


def test_bert_concat_layout(topics_file):
    """[CLS] q1 [SEP] q2 [SEP] -- single leading CLS (util.py:486-498)."""
    tok = WordPieceTokenizer.tiny()
    ds = ConvSearchDataset([topics_file], tok, mode="train",
                           query_mode="no_res", model_type="dpr",
                           max_concat_length=64)
    ex = ds.examples[1]
    n_valid = sum(ex.concat_mask)
    valid = ex.concat_ids[:n_valid]
    assert valid.count(tok.cls_token_id) == 1
    assert valid.count(tok.sep_token_id) == 2


def test_response_injection(topics_file, rtok):
    """man_can injects responses[-2] after <response> (util.py:500-512)."""
    ds = ConvSearchDataset([topics_file], rtok, mode="train",
                           query_mode="man_can", max_concat_length=128)
    ex = ds.examples[1]
    rid = rtok.convert_tokens_to_ids([RESPONSE_TOKEN])[0]
    assert rid in ex.concat_ids
    # the raw sequence log gains the response before the last utterance
    assert ex.raw_sequences[-2] == "cats are pets"
    # turn 1 has < 2 responses: no injection
    assert rid not in ds.examples[0].concat_ids


def test_target_mode(topics_file, rtok):
    ds = ConvSearchDataset([topics_file], rtok, mode="inference",
                           query_mode="target", max_query_length=32)
    ex = ds.examples[0]
    assert len(ex.concat_ids) == 32
    assert ex.concat_ids[0] == rtok.cls_token_id


def test_train_has_target_ids(topics_file, rtok):
    ds = ConvSearchDataset([topics_file], rtok, mode="train",
                           query_mode="no_res", max_query_length=32)
    for ex in ds.examples:
        assert ex.target_ids is not None and len(ex.target_ids) == 32
        assert sum(ex.target_mask) > 0


def test_collate_shapes(topics_file, rtok):
    ds = ConvSearchDataset([topics_file], rtok, mode="train",
                           query_mode="no_res", max_concat_length=64,
                           max_query_length=32)
    batch = next(ds.batches(2))
    assert batch["concat_ids"].shape == (2, 64)
    assert batch["concat_ids"].dtype == np.int32
    assert batch["target_ids"].shape == (2, 32)


def test_inference_carries_history(topics_file, rtok):
    ds = ConvSearchDataset([topics_file], rtok, mode="inference",
                           query_mode="no_res")
    batch = next(ds.batches(3))
    assert batch["history_utterances"][1] == [
        "what is a cat", "what does it eat"
    ]
