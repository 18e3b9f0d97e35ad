import numpy as np
import pytest

from convdr_tpu.data.token_cache import (
    TokenCache,
    TokenCacheWriter,
    attention_mask_from_lengths,
    load_offset2pid,
    save_id_maps,
)


@pytest.fixture()
def cache_path(tmp_path):
    base = str(tmp_path / "passages")
    with TokenCacheWriter(base, max_seq_length=16) as w:
        for i in range(10):
            ids = list(range(1, i + 2))  # lengths 1..10
            w.write(ids)
    return base


def test_roundtrip_single(cache_path):
    cache = TokenCache(cache_path)
    assert len(cache) == 10
    n, ids = cache[3]
    assert n == 4
    assert list(ids[:4]) == [1, 2, 3, 4]
    assert all(ids[4:] == 0)


def test_reference_record_layout(cache_path):
    """Bytes on disk match the reference layout (tokenizing.py:116)."""
    with open(cache_path, "rb") as f:
        rec = f.read(4 + 16 * 4)
    assert int.from_bytes(rec[:4], "big") == 1
    ids = np.frombuffer(rec[4:], dtype=np.int32)
    assert ids[0] == 1 and ids[1] == 0


def test_batch_access(cache_path):
    cache = TokenCache(cache_path)
    ids, lens = cache.batch([0, 5, 9])
    assert ids.shape == (3, 16)
    assert list(lens) == [1, 6, 10]
    mask = attention_mask_from_lengths(lens, 16)
    assert mask.sum() == 1 + 6 + 10


def test_truncation(tmp_path):
    base = str(tmp_path / "p")
    with TokenCacheWriter(base, max_seq_length=4) as w:
        w.write(list(range(100, 110)))
    cache = TokenCache(base)
    n, ids = cache[0]
    assert n == 4
    assert list(ids) == [100, 101, 102, 103]


def test_sharded_iteration(cache_path):
    """Round-robin shards cover all rows disjointly (util.py:423-424)."""
    cache = TokenCache(cache_path)
    seen = []
    for shard in range(3):
        for ids, lens, offsets in cache.iter_batches(
            4, shard_index=shard, num_shards=3
        ):
            seen.extend([o for o in offsets if o >= 0])
    assert sorted(seen) == list(range(10))


def test_seeded_permutation_iteration(cache_path):
    """shuffle_seed iterates a seeded permutation of the cache, matching the
    reference EmbeddingCache's seed>=0 order (util.py:364-368,398-402)."""
    cache = TokenCache(cache_path)
    seen = []
    for ids, lens, offsets in cache.iter_batches(4, shuffle_seed=7):
        seen.extend(int(o) for o in offsets if o >= 0)
    expect = list(np.random.RandomState(7).permutation(10))
    assert seen == expect
    assert sorted(seen) == list(range(10))
    # rows decode to the permuted records
    first = next(iter(cache.iter_batches(4, shuffle_seed=7)))
    ids, lens, offsets = first
    for row in range(4):
        n, rec = cache[int(offsets[row])]
        assert n == lens[row]
        assert list(rec) == list(ids[row])
    # sharded + shuffled still covers every row exactly once
    seen = []
    for shard in range(3):
        for _, _, offs in cache.iter_batches(
            4, shard_index=shard, num_shards=3, shuffle_seed=7
        ):
            seen.extend(int(o) for o in offs if o >= 0)
    assert sorted(seen) == list(range(10))


def test_id_maps(tmp_path):
    save_id_maps(str(tmp_path), [7, 3, 9])
    assert load_offset2pid(str(tmp_path)) == [7, 3, 9]


def test_query_cache_roundtrip(tmp_path):
    """tokenize_queries_file persists the cache AND the qid maps
    (reference query-cache path, data/tokenizing.py:119-130, 58-75)."""
    from convdr_tpu.data.token_cache import load_query_id_maps
    from convdr_tpu.data.tokenize_pipeline import tokenize_queries_file
    from convdr_tpu.data.tokenizers import load_tokenizer

    tok = load_tokenizer("roberta", "tiny")
    qpath = tmp_path / "queries.dev.tsv"
    # numeric qids coerce to int (reference tokenizing.py:123 typing);
    # CAsT-style composite ids stay str
    queries = [(123, "tell me about cats"), ("2_1", "dogs are loud"),
               ("31_4", "more cats please")]
    with open(qpath, "w") as f:
        for qid, text in queries:
            f.write(f"{qid}\t{text}\n")
        f.write("malformed-line-no-tab\n")  # skipped, like the reference

    base = str(tmp_path / "queries.dev")
    n = tokenize_queries_file(str(qpath), base, tokenizer=tok, max_query_length=12)
    assert n == 3

    cache = TokenCache(base)
    qid2offset, offset2qid = load_query_id_maps(base)
    assert offset2qid == [q for q, _ in queries]
    assert qid2offset == {q: i for i, (q, _) in enumerate(queries)}
    for i, (_, text) in enumerate(queries):
        expect = tok.encode(text, add_special_tokens=True, max_length=12)
        length, ids = cache[i]
        assert length == len(expect)
        assert list(ids[:length]) == list(expect)
