import json

import numpy as np
import pytest

from convdr_tpu.core.config import SearchConfig
from convdr_tpu.data.collection import Collection
from convdr_tpu.ops.exact_search import topk_oracle
from convdr_tpu.parallel.mesh import get_mesh
from convdr_tpu.retrieval.blocks import (
    iter_embedding_blocks,
    load_embedding_block,
    write_embedding_block,
)
from convdr_tpu.retrieval.run_writer import (
    build_run,
    dedup_ranked_candidates,
    write_run_outputs,
)
from convdr_tpu.retrieval.searcher import BlockedSearcher


def test_block_roundtrip(tmp_path):
    emb = np.random.RandomState(0).randn(10, 8).astype(np.float32)
    ids = np.arange(10, dtype=np.int64)
    write_embedding_block(str(tmp_path), 0, emb, ids)
    back = load_embedding_block(str(tmp_path), 0)
    np.testing.assert_array_equal(back[0], emb)
    np.testing.assert_array_equal(back[1], ids)


def test_block_reference_filenames(tmp_path):
    """Files must match the reference naming (run_convdr_inference.py:163-175)."""
    write_embedding_block(str(tmp_path), 3, np.zeros((1, 4), np.float32),
                          np.zeros(1, np.int64))
    assert (tmp_path / "passage__emb_p__data_obj_3.pb").exists()
    assert (tmp_path / "passage__embid_p__data_obj_3.pb").exists()


def test_iter_stops_at_gap(tmp_path):
    for b in (0, 1, 3):  # gap at 2
        write_embedding_block(str(tmp_path), b, np.zeros((2, 4), np.float32),
                              np.arange(2))
    seen = [b for b, _, _ in iter_embedding_blocks(str(tmp_path))]
    assert seen == [0, 1]


def make_blocks(tmp_path, rng, n=200, d=16, n_blocks=3):
    """Split a corpus row-robin into blocks like the reference's ranks."""
    passages = rng.randn(n, d).astype(np.float32)
    for b in range(n_blocks):
        rows = np.arange(b, n, n_blocks)
        write_embedding_block(str(tmp_path), b, passages[rows], rows.astype(np.int64))
    return passages


def test_blocked_search_matches_oracle(tmp_path, rng):
    passages = make_blocks(tmp_path, rng)
    queries = rng.randn(5, 16).astype(np.float32)
    searcher = BlockedSearcher(SearchConfig(passage_block_size=64))
    s, offsets = searcher.search_blocks(str(tmp_path), queries, 30)
    os_, oi = topk_oracle(queries, passages, 30)
    np.testing.assert_allclose(s, os_, rtol=1e-5)
    # offsets are global corpus rows here (cache offsets)
    np.testing.assert_array_equal(offsets, oi.astype(np.int64))


def test_blocked_search_sharded_matches_oracle(tmp_path, rng):
    mesh = get_mesh(("index",))
    passages = make_blocks(tmp_path, rng, n=160)
    queries = rng.randn(4, 16).astype(np.float32)
    searcher = BlockedSearcher(SearchConfig(passage_block_size=64), mesh=mesh)
    s, offsets = searcher.search_blocks(str(tmp_path), queries, 20)
    os_, oi = topk_oracle(queries, passages, 20)
    np.testing.assert_array_equal(offsets, oi.astype(np.int64))


def test_oversized_block_splits_and_matches_single_shot(rng):
    """A block above max_device_block_bytes searches as sequential
    sub-blocks merged in order; results must be bit-identical to the
    unsplit search (lower row index wins ties either way). Guards the
    38M-rows/8-blocks capacity path (one 7.3 GB block OOMs a v5e whole)."""
    n, d = 3000, 16
    passages = rng.randn(n, d).astype(np.float32)
    # force a cross-sub-block tie to exercise the tie-ordering contract
    passages[13] = passages[2555]
    queries = rng.randn(4, d).astype(np.float32)
    whole = BlockedSearcher(SearchConfig(passage_block_size=64))
    cap_cfg = SearchConfig(
        passage_block_size=64,
        # 1024-row floor -> 3 sub-blocks at n=3000
        max_device_block_bytes=1,
    )
    cap = BlockedSearcher(cap_cfg)
    ws, wi = whole.search_block(queries, passages, 30)
    cs, ci = cap.search_block(queries, passages, 30)
    np.testing.assert_array_equal(wi, ci)
    np.testing.assert_array_equal(ws, cs)


def test_oversized_block_splits_sharded_matches_oracle(tmp_path, rng):
    """Capacity split composed with index-axis sharding: sub-blocks are
    re-sharded over the mesh and merged; offsets must still match the
    oracle exactly."""
    mesh = get_mesh(("index",))
    passages = make_blocks(tmp_path, rng, n=320)
    queries = rng.randn(4, 16).astype(np.float32)
    searcher = BlockedSearcher(
        SearchConfig(passage_block_size=64, max_device_block_bytes=1),
        mesh=mesh,
    )
    s, offsets = searcher.search_blocks(str(tmp_path), queries, 20)
    os_, oi = topk_oracle(queries, passages, 20)
    np.testing.assert_array_equal(offsets, oi.astype(np.int64))


def test_search_missing_dir(tmp_path):
    searcher = BlockedSearcher()
    with pytest.raises(FileNotFoundError):
        searcher.search_blocks(str(tmp_path), np.zeros((1, 4), np.float32), 5)


# ---------------- run writer ----------------
def test_dedup_keeps_best_rank():
    offset2pid = [100, 101, 100, 102]  # offsets 0 and 2 are the same pid
    scores = [9.0, 8.0, 7.0, 6.0]
    offsets = [0, 2, 1, 3]
    out = dedup_ranked_candidates(scores, offsets, offset2pid, 3)
    assert out == [(100, 9.0), (101, 7.0), (102, 6.0)]


def test_dedup_skips_invalid_and_pads_to_top_n():
    """Short lists pad with (0, 0) placeholder rows like EvalDevQuery's
    preallocated [(0, 0)] * topN (run_convdr_inference.py:52)."""
    out = dedup_ranked_candidates([5.0, 4.0], [-1, 0], [7], 5)
    assert out == [(7, 4.0), (0, 0.0), (0, 0.0), (0, 0.0), (0, 0.0)]
    out2 = dedup_ranked_candidates([5.0, 4.0], [-1, 0], [7], 5,
                                   pad_to_top_n=False)
    assert out2 == [(7, 4.0)]


def test_build_run_int_qids_first_occurrence_wins():
    """Non-string qids normalize consistently; duplicates keep row 0."""
    import numpy as np

    from convdr_tpu.retrieval.run_writer import build_run

    scores = np.asarray([[9.0], [1.0]])
    offsets = np.asarray([[0], [1]])
    run = build_run([7, 7], scores, offsets, [100, 101], 1)
    assert run == {"7": [(100, 9.0)]}


def test_write_run_outputs(tmp_path):
    offset2pid = [10, 11, 12]
    qids = ["31_1", "31_2"]
    scores = np.asarray([[3.0, 2.0], [5.0, 1.0]])
    offsets = np.asarray([[2, 0], [1, 2]])
    queries = {"31_1": "query one", "31_2": "query two"}
    collection = Collection({10: "doc ten", 11: "doc eleven", 12: "doc twelve"})
    qrels = {"31_1": {12: 2}}
    trec = str(tmp_path / "run.trec")
    om = str(tmp_path / "run.jsonl")
    run = write_run_outputs(
        qids, scores, offsets, offset2pid, 2,
        output_trec_file=trec, output_file=om,
        queries=queries, collection=collection, qrels=qrels,
        raw_sequences={"31_1": ["q1"], "31_2": ["q1", "q2"]},
    )
    assert run["31_1"][0] == (12, 3.0)
    lines = open(om).read().strip().split("\n")
    rec = json.loads(lines[0])
    assert rec["label"] == 2 and rec["doc"] == "doc twelve"
    assert rec["input"] == ["q1"]
    trec_lines = open(trec).read().strip().split("\n")
    assert trec_lines[0] == "31_1 Q0 12 1 199 ance"


def test_multi_block_search_set_exactness_large(tmp_path):
    """Large multi-block streamed search: recall sets equal the oracle.

    Order may legitimately differ from the BLAS oracle for f32 near-ties
    (true score gap < 1 ULP, seen from ~1e5 rows up), so this asserts SET
    equality plus score agreement, the contract the smaller bit-exact tests
    cannot cover (see CLAUDE.md perf facts).
    """
    import numpy as np

    from convdr_tpu.core.config import SearchConfig
    from convdr_tpu.ops.exact_search import topk_oracle
    from convdr_tpu.retrieval.blocks import write_embedding_block
    from convdr_tpu.retrieval.searcher import BlockedSearcher

    rng = np.random.RandomState(7)
    nb, rows, d, qn, k = 3, 20000, 96, 16, 100
    blocks = [rng.randn(rows, d).astype(np.float32) for _ in range(nb)]
    tmp = str(tmp_path)
    for b, emb in enumerate(blocks):
        write_embedding_block(
            tmp, b, emb, np.arange(b * rows, (b + 1) * rows)
        )
    q = rng.randn(qn, d).astype(np.float32)
    s, i = BlockedSearcher(SearchConfig(passage_block_size=8192)).search_blocks(
        tmp, q, k
    )
    os_, oi = topk_oracle(q, np.concatenate(blocks, 0), k)
    for qi in range(qn):
        assert set(i[qi].tolist()) == set(oi[qi].tolist())
    np.testing.assert_allclose(np.sort(s, axis=1), np.sort(os_, axis=1),
                               rtol=1e-6)


def test_prefetch_iter_equivalence_and_errors():
    from convdr_tpu.retrieval.searcher import prefetch_iter

    assert list(prefetch_iter(iter(range(20)), depth=3)) == list(range(20))
    assert list(prefetch_iter(iter([]))) == []

    def boom():
        yield 1
        raise RuntimeError("disk gone")

    out = []
    try:
        for x in prefetch_iter(boom()):
            out.append(x)
        assert False, "expected RuntimeError"
    except RuntimeError as e:
        assert "disk gone" in str(e) and out == [1]

    # tuples that merely look like the error sentinel pass through
    vals = [("__prefetch_error__x", 1), (1, 2)]
    assert list(prefetch_iter(iter(vals))) == vals


def test_prefetch_iter_abandoned_consumer_stops_producer():
    """If the consumer abandons the generator early, the producer thread
    must exit instead of blocking on a full queue forever (ADVICE r2)."""
    import threading
    import time

    from convdr_tpu.retrieval.searcher import prefetch_iter

    produced = []
    alive = threading.Event()
    alive.set()

    def source():
        for i in range(1000):
            produced.append(i)
            yield i
        alive.clear()

    g = prefetch_iter(source(), depth=1)
    assert next(g) == 0
    g.close()  # GeneratorExit inside the yield loop -> finally -> closed
    deadline = time.time() + 5.0
    while time.time() < deadline and threading.active_count() > 1:
        time.sleep(0.05)
    # producer stopped early: it never drained the whole source
    assert len(produced) < 1000


def test_sharded_bf16_multiblock_matches_oracle(tmp_path, rng):
    """Mesh-sharded search over bf16 multi-block storage: recall sets equal
    a bf16-rounded numpy oracle (capacity mode on the index axis)."""
    import ml_dtypes

    from convdr_tpu.core.config import SearchConfig
    from convdr_tpu.parallel.mesh import get_mesh
    from convdr_tpu.retrieval.blocks import write_embedding_block
    from convdr_tpu.retrieval.searcher import BlockedSearcher

    mesh = get_mesh(("index",))
    p = rng.randn(600, 24).astype(np.float32)
    q = rng.randn(6, 24).astype(np.float32)
    for b in range(3):
        seg = p[b * 200:(b + 1) * 200]
        write_embedding_block(
            str(tmp_path), b, seg.astype(ml_dtypes.bfloat16),
            np.arange(b * 200, (b + 1) * 200),
        )
    searcher = BlockedSearcher(
        SearchConfig(top_n=25, storage_dtype="bfloat16",
                     passage_block_size=256),
        mesh=mesh,
    )
    s, offs = searcher.search_blocks(str(tmp_path), q, 25)
    scores = q @ p.astype(ml_dtypes.bfloat16).astype(np.float32).T
    ref = np.argsort(-scores, axis=1, kind="stable")[:, :25]
    for r in range(6):
        assert set(offs[r]) == set(ref[r]), r


def test_bf16_storage_rescore_recovers_f32_ranking(tmp_path, rng):
    """bfloat16 storage + rescore_factor: the bf16-rounded scan proposes,
    host float re-ranking restores the f32-exact ordering when the
    candidate width covers the reordered tail (FAISS IndexRefineFlat
    over the bf16 capacity mode — same contract as int8)."""
    n, d, k = 4000, 32, 10
    p = rng.randn(n, d).astype(np.float32)
    q = rng.randn(6, d).astype(np.float32)
    offs = np.arange(n, dtype=np.int64)
    ddir = str(tmp_path / "blocks")
    for b in range(2):
        write_embedding_block(ddir, b, p[b::2], offs[b::2])
    o_s, o_i = topk_oracle(q, p, k)
    plain = BlockedSearcher(SearchConfig(storage_dtype="bfloat16"))
    rescored = BlockedSearcher(
        SearchConfig(storage_dtype="bfloat16", rescore_factor=4)
    )
    s_r, i_r = rescored.search_blocks(ddir, q, k)
    np.testing.assert_array_equal(i_r, o_i)
    np.testing.assert_allclose(s_r, o_s, rtol=1e-6)
    # arrays path too
    s_a, i_a = rescored.search_arrays(q, p, offs, k)
    np.testing.assert_array_equal(i_a, o_i)
    # bf16 block FILES cannot rescore (original rows are gone)
    bdir = str(tmp_path / "blocks_bf16")
    import ml_dtypes

    write_embedding_block(bdir, 0, p.astype(ml_dtypes.bfloat16), offs)
    with pytest.raises(ValueError, match="float block files"):
        rescored.search_blocks(bdir, q, k)
