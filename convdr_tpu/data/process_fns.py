"""ANCE-heritage line-processing functions (numpy, not torch).

Parity with /root/reference/data/process_fn.py: functions that turn one raw
text line into fixed-shape feature rows for ad-hoc (non-conversational)
training streams. The reference registers ``triple_process_fn`` as every
model's ``default_process_fn`` (model/models.py:272) even though the ConvDR
drivers never call it; kept here for full API coverage and for pre-training
ANCE-style teachers in-framework.

  * :func:`dual_process_fn`        -- ``qid \\t text`` -> (ids, mask, types, qid)
  * :func:`triple_process_fn`      -- ``query \\t pos \\t neg`` -> one row of
    interleaved (ids, mask) triples
  * :func:`triple2dual_process_fn` -- same input -> two (query, doc, label)
    rows, label 1 for the positive and 0 for the negative

All outputs are numpy arrays sized ``max_seq_length`` (right padding, mask 1
for valid positions), ready to batch for the jitted encoders.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from convdr_tpu.data.padding import pad_input_ids_with_mask


def _encode(text: str, tokenizer, max_seq_length: int):
    ids = tokenizer.encode(
        text.strip(), add_special_tokens=True, max_length=max_seq_length
    )
    ids, mask = pad_input_ids_with_mask(
        ids, max_seq_length, pad_token=tokenizer.pad_token_id
    )
    return (
        np.asarray(ids, np.int32),
        np.asarray(mask, np.int32),
        np.zeros(max_seq_length, np.int32),
    )


def dual_process_fn(line: str, i: int, tokenizer, max_seq_length: int) -> List[list]:
    cells = line.split("\t")
    if len(cells) != 2:
        raise ValueError(
            f"Line doesn't have correct length: {len(cells)}. Expected 2."
        )
    ids, mask, types = _encode(cells[1], tokenizer, max_seq_length)
    return [[ids, mask, types, int(cells[0])]]


def triple_process_fn(line: str, i: int, tokenizer, max_seq_length: int) -> List[list]:
    cells = line.split("\t")
    if len(cells) != 3:
        raise ValueError(
            f"Line doesn't have correct length: {len(cells)}. Expected 3."
        )
    features: list = []
    for text in cells:
        ids, mask, _types = _encode(text, tokenizer, max_seq_length)
        features += [ids, mask]
    return [features]


def triple2dual_process_fn(
    line: str, i: int, tokenizer, max_seq_length: int
) -> List[list]:
    cells = line.split("\t")
    if len(cells) != 3:
        raise ValueError(
            f"Line doesn't have correct length: {len(cells)}. Expected 3."
        )
    q_ids, q_mask, _ = _encode(cells[0], tokenizer, max_seq_length)
    pos_ids, pos_mask, _ = _encode(cells[1], tokenizer, max_seq_length)
    neg_ids, neg_mask, _ = _encode(cells[2], tokenizer, max_seq_length)
    return [
        [q_ids, q_mask, pos_ids, pos_mask, 1],
        [q_ids, q_mask, neg_ids, neg_mask, 0],
    ]
