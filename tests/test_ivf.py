"""IVF index + MXU k-means tests (FAISS IVFFlat/IVF-SQ8 counterparts).

The reference delegates all retrieval to FAISS
(/root/reference/drivers/run_convdr_inference.py:157-242); the IVF family is
the FAISS capability class this package re-implements TPU-first in
convdr_tpu/retrieval/ivf.py + convdr_tpu/ops/kmeans.py.
"""

import numpy as np
import pytest

from convdr_tpu.ops.exact_search import topk_oracle
from convdr_tpu.ops.kmeans import _split_empty, assign_top_t, fit_kmeans
from convdr_tpu.ops.quant import int8_topk_oracle
from convdr_tpu.retrieval.ivf import IVFIndex, _sublist_layout


def _clustered(n, d, n_clusters, seed=0, spread=0.05):
    rng = np.random.Generator(np.random.PCG64(seed))
    centers = rng.standard_normal((n_clusters, d), dtype=np.float32)
    which = rng.integers(0, n_clusters, size=n)
    x = centers[which] + spread * rng.standard_normal(
        (n, d), dtype=np.float32
    )
    return x.astype(np.float32), centers, which


def test_kmeans_recovers_separated_clusters():
    x, centers, which = _clustered(600, 16, 4, seed=1, spread=0.02)
    c = fit_kmeans(x, 4, iters=25, seed=0)
    # every fitted centroid sits on top of one true center, bijectively
    d2 = ((c[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    match = d2.argmin(axis=1)
    assert sorted(match) == [0, 1, 2, 3]
    assert np.all(d2.min(axis=1) < 0.01)


def test_kmeans_handles_degenerate_duplicates():
    # more clusters than distinct points: must stay finite, no crash
    x = np.repeat(np.eye(3, 8, dtype=np.float32), 40, axis=0)
    c = fit_kmeans(x, 6, iters=5, seed=0)
    assert np.all(np.isfinite(c))
    assert c.shape == (6, 8)


def test_split_empty_reseeds_from_largest():
    c = np.array([[1.0, 0.0], [0.0, 1.0], [5.0, 5.0]], np.float32)
    counts = np.array([10.0, 0.0, 0.0], np.float32)
    c2, n_empty = _split_empty(c, counts)
    assert n_empty == 2
    assert np.all(np.isfinite(c2))
    # donors perturbed off the original, not duplicated exactly
    assert not np.allclose(c2[1], c[1])


def test_assign_top_t_matches_numpy():
    rng = np.random.Generator(np.random.PCG64(7))
    x = rng.standard_normal((300, 12), dtype=np.float32)
    c = rng.standard_normal((20, 12), dtype=np.float32)
    got = assign_top_t(x, c, t=3)
    d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    want = np.argsort(d2, axis=1, kind="stable")[:, :3]
    # bf16 assignment matmul may flip near-equidistant pairs; the nearest
    # centroid itself must agree except on genuine near-ties
    gap = np.partition(d2, 1, axis=1)
    clear = (gap[:, 1] - gap[:, 0]) > 1e-2
    assert np.array_equal(got[clear, 0], want[clear, 0])
    assert got.shape == (300, 3)


def test_assign_top_t_host_chunking_and_bf16_inputs(monkeypatch):
    """The streamed multi-chunk path (38M-scale blocks exceed HBM as one
    upload) must equal the one-shot path, and uint16 bf16-bit-pattern
    rows (the block-file layout) must assign like their float values."""
    import ml_dtypes

    from convdr_tpu.ops import kmeans as km

    rng = np.random.Generator(np.random.PCG64(17))
    x = rng.standard_normal((1000, 16), dtype=np.float32)
    c = rng.standard_normal((12, 16), dtype=np.float32)
    want = assign_top_t(x, c, t=2)
    # force 2 host chunks of 800 rows (the host chunk floors at one scan
    # block, so shrink block_rows alongside the byte cap)
    monkeypatch.setattr(km, "_ASSIGN_CHUNK_BYTES", 4 * x.shape[1] * 800)
    got = assign_top_t(x, c, t=2, block_rows=100)
    assert np.array_equal(got, want)
    xb = x.astype(ml_dtypes.bfloat16)
    via_u16 = assign_top_t(xb.view(np.uint16), c, t=2)
    via_bf16 = assign_top_t(xb, c, t=2)
    assert np.array_equal(via_u16, via_bf16)


def test_sublist_layout_invariants():
    rng = np.random.Generator(np.random.PCG64(3))
    n, k, cap = 500, 8, 24
    # heavy skew: cluster j gets ~j^2 mass
    weights = (np.arange(k, dtype=np.float64) + 1) ** 2
    assign = rng.choice(k, size=n, p=weights / weights.sum()).astype(np.int32)
    sub_id, slot, owner, stats = _sublist_layout(assign, k, cap)
    sizes = np.bincount(assign, minlength=k)
    assert stats["n_sublists"] == int(np.sum(-(-sizes // cap)))
    assert owner.shape == (stats["n_sublists"],)
    assert np.all(slot >= 0) and np.all(slot < cap)
    # every row's sub-list is owned by its OWN nearest cluster
    np.testing.assert_array_equal(owner[sub_id], assign)
    # (sub, slot) pairs unique — no overwrites in the packed tensor
    pos = sub_id.astype(np.int64) * cap + slot
    assert len(np.unique(pos)) == n
    # sub-list occupancy: all full except each cluster's last one
    occupancy = np.bincount(sub_id, minlength=stats["n_sublists"])
    for j in range(k):
        subs = np.flatnonzero(owner == j)
        if len(subs):
            assert np.all(occupancy[subs[:-1]] == cap)
            assert occupancy[subs[-1]] == sizes[j] - (len(subs) - 1) * cap
    assert stats["pad_rows"] == stats["n_sublists"] * cap - n


def test_ivf_full_probe_matches_flat_oracle():
    rng = np.random.Generator(np.random.PCG64(11))
    x = rng.standard_normal((2000, 24), dtype=np.float32)
    q = rng.standard_normal((16, 24), dtype=np.float32)
    idx = IVFIndex.build(x, 16, iters=8, seed=0)
    s, i = idx.search(q, 10, nprobe=idx.nlist)  # full probe: every row scored
    o_s, o_i = topk_oracle(q, x, 10)
    for row in range(q.shape[0]):
        assert set(i[row]) == set(o_i[row])
    np.testing.assert_allclose(np.sort(s, 1), np.sort(o_s, 1), rtol=1e-5)


def test_ivf_recall_on_clustered_corpus():
    x, centers, _ = _clustered(4000, 32, 64, seed=5, spread=0.05)
    rng = np.random.Generator(np.random.PCG64(9))
    # queries near corpus points: the realistic retrieval regime
    q = x[rng.choice(4000, 32, replace=False)] + 0.01 * rng.standard_normal(
        (32, 32), dtype=np.float32
    )
    idx = IVFIndex.build(x, 32, iters=15, seed=0)
    _, o_i = topk_oracle(q, x, 10)
    _, i4 = idx.search(q, 10, nprobe=4)
    recall4 = np.mean([
        len(set(i4[r]) & set(o_i[r])) / 10 for r in range(32)
    ])
    _, i16 = idx.search(q, 10, nprobe=16)
    recall16 = np.mean([
        len(set(i16[r]) & set(o_i[r])) / 10 for r in range(32)
    ])
    assert recall4 >= 0.75, recall4
    assert recall16 >= 0.95, recall16
    assert recall16 >= recall4


def test_ivf_int8_full_probe_matches_int8_oracle():
    rng = np.random.Generator(np.random.PCG64(13))
    x = rng.standard_normal((1500, 16), dtype=np.float32)
    q = rng.standard_normal((8, 16), dtype=np.float32)
    idx = IVFIndex.build(x, 12, storage_dtype="int8", iters=8, seed=0)
    s, i = idx.search(q, 10, nprobe=idx.nlist)
    q_int, tq = idx.quantizer.quantize_queries(q)
    p_i8 = idx.quantizer.quantize_passages(x)
    o_s, o_i = int8_topk_oracle(q_int, p_i8, 10)
    for row in range(q.shape[0]):
        assert set(i[row]) == set(o_i[row])
    np.testing.assert_allclose(
        np.sort(s, 1), np.sort(o_s * tq, 1), rtol=1e-3
    )


def test_ivf_custom_rowids_returned():
    rng = np.random.Generator(np.random.PCG64(17))
    x = rng.standard_normal((400, 8), dtype=np.float32)
    # unit rows: a row's best inner-product match is itself
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    payload = (np.arange(400, dtype=np.int32) * 7 + 3)
    idx = IVFIndex.build(x, 4, rowids=payload, iters=5, seed=0)
    _, i = idx.search(x[:5], 1, nprobe=idx.nlist)
    np.testing.assert_array_equal(i[:, 0], payload[:5])


def test_ivf_query_chunking_is_transparent():
    rng = np.random.Generator(np.random.PCG64(19))
    x = rng.standard_normal((800, 16), dtype=np.float32)
    q = rng.standard_normal((9, 16), dtype=np.float32)
    idx = IVFIndex.build(x, 8, iters=5, seed=0)
    s1, i1 = idx.search(q, 5, nprobe=3)
    s2, i2 = idx.search(q, 5, nprobe=3, max_candidate_bytes=1)  # 1 q/chunk
    # XLA picks batch-shape-dependent contraction orders, so scores are
    # allclose (f32 reassociation), not bit-equal; result sets must match
    for row in range(q.shape[0]):
        assert set(i1[row]) == set(i2[row])
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_ivf_save_load_roundtrip(tmp_path):
    rng = np.random.Generator(np.random.PCG64(23))
    x = rng.standard_normal((600, 16), dtype=np.float32)
    q = rng.standard_normal((4, 16), dtype=np.float32)
    for dtype in ("float32", "int8"):
        idx = IVFIndex.build(x, 8, storage_dtype=dtype, iters=5, seed=0)
        s1, i1 = idx.search(q, 7, nprobe=idx.nlist)
        d = tmp_path / dtype
        idx.save(str(d))
        idx2 = IVFIndex.load(str(d))
        assert idx2.storage_dtype == dtype
        assert idx2.ntotal == 600
        s2, i2 = idx2.search(q, 7, nprobe=idx2.nlist)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(s1, s2)


def test_ivf_k_exceeding_candidates_pads():
    rng = np.random.Generator(np.random.PCG64(29))
    x = rng.standard_normal((100, 8), dtype=np.float32)
    idx = IVFIndex.build(x, 10, iters=4, seed=0)
    s, i = idx.search(x[:3], 50, nprobe=1)  # one list holds ~<=13 rows
    assert s.shape == (3, 50)
    assert np.all(i[s == np.finfo(np.float32).min] == -1)
    valid = i[0][i[0] >= 0]
    assert len(valid) == len(set(valid.tolist()))


def test_ivf_bfloat16_storage_roundtrip(tmp_path):
    rng = np.random.Generator(np.random.PCG64(31))
    x = rng.standard_normal((800, 16), dtype=np.float32)
    q = rng.standard_normal((6, 16), dtype=np.float32)
    idx = IVFIndex.build(x, 8, storage_dtype="bfloat16", iters=5, seed=0)
    assert idx.lists.dtype == np.uint16  # bf16 bit patterns on host
    s, i = idx.search(q, 10, nprobe=idx.nlist)
    _, o_i = topk_oracle(q, x, 10)
    # full probe, bf16-rounded rows: sets match the f32 oracle except
    # bf16-rounding near-ties
    recall = np.mean([len(set(i[r]) & set(o_i[r])) / 10 for r in range(6)])
    assert recall >= 0.9, recall
    d = tmp_path / "bf16"
    idx.save(str(d))
    idx2 = IVFIndex.load(str(d))
    assert idx2.storage_dtype == "bfloat16"
    s2, i2 = idx2.search(q, 10, nprobe=idx2.nlist)
    np.testing.assert_array_equal(i, i2)
    np.testing.assert_array_equal(s, s2)


def test_ivf_build_from_blocks_matches_payload(tmp_path):
    from convdr_tpu.retrieval.blocks import write_embedding_block

    rng = np.random.Generator(np.random.PCG64(37))
    x = rng.standard_normal((600, 16), dtype=np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    offsets = np.arange(600, dtype=np.int64) * 3 + 11  # fake cache offsets
    d = str(tmp_path / "blocks")
    # reference round-robin sharding: block b holds rows i % 2 == b
    for b in range(2):
        write_embedding_block(d, b, x[b::2], offsets[b::2])
    idx = IVFIndex.build_from_blocks(d, 8, iters=6, seed=0)
    assert idx.ntotal == 600
    s, i = idx.search(x[:5], 1, nprobe=idx.nlist)  # unit rows: self is top-1
    np.testing.assert_array_equal(i[:, 0], offsets[:5].astype(np.int32))


def test_ivf_build_from_blocks_int8_blocks(tmp_path):
    from convdr_tpu.ops.quant import Int8Quantizer
    from convdr_tpu.retrieval.blocks import write_embedding_block

    rng = np.random.Generator(np.random.PCG64(41))
    x = rng.standard_normal((400, 16), dtype=np.float32)
    quant = Int8Quantizer.fit(x)
    d = str(tmp_path / "blocks_i8")
    for b in range(2):
        write_embedding_block(
            d, b, quant.quantize_passages(x[b::2]),
            np.arange(400, dtype=np.int64)[b::2],
        )
    quant.save(d)
    # int8 blocks can only build an int8 index
    with pytest.raises(ValueError):
        IVFIndex.build_from_blocks(d, 4, storage_dtype="float32")
    idx = IVFIndex.build_from_blocks(
        d, 4, storage_dtype="int8", iters=5, seed=0
    )
    assert idx.storage_dtype == "int8"
    assert idx.ntotal == 400
    # packed rows are bit-identical to the on-disk quantization: a full
    # probe reproduces the int8 oracle's sets
    from convdr_tpu.ops.quant import int8_topk_oracle

    q = rng.standard_normal((4, 16), dtype=np.float32)
    s, i = idx.search(q, 10, nprobe=idx.nlist)
    q_int, _tq = quant.quantize_queries(q)
    o_s, o_i = int8_topk_oracle(q_int, quant.quantize_passages(x), 10)
    for r in range(4):
        assert set(i[r]) == set(o_i[r])


def test_ivf_sharded_search_matches_contract():
    """8-device CPU mesh: full probe over sharded sub-lists reproduces the
    flat oracle's sets; balanced per-shard probing keeps recall in family
    with the single-device index at equal total nprobe."""
    import jax
    from convdr_tpu.parallel.mesh import get_mesh

    assert len(jax.devices()) == 8
    mesh = get_mesh(("index",))
    x, _c, _w = _clustered(4000, 32, 64, seed=5, spread=0.05)
    rng = np.random.Generator(np.random.PCG64(9))
    q = x[rng.choice(4000, 16, replace=False)] + 0.01 * rng.standard_normal(
        (16, 32), dtype=np.float32
    )
    idx = IVFIndex.build(x, 32, iters=10, seed=0)
    _, o_i = topk_oracle(q, x, 10)
    # full probe == exhaustive, regardless of how shards split the lists
    _, i_full = idx.search(q, 10, nprobe=idx.nlist, mesh=mesh)
    for r in range(16):
        assert set(i_full[r]) == set(o_i[r])
    # partial probe: balanced allocation stays in recall family
    _, i_single = idx.search(q, 10, nprobe=16)
    _, i_shard = idx.search(q, 10, nprobe=16, mesh=mesh)
    rec_single = np.mean([
        len(set(i_single[r]) & set(o_i[r])) / 10 for r in range(16)
    ])
    rec_shard = np.mean([
        len(set(i_shard[r]) & set(o_i[r])) / 10 for r in range(16)
    ])
    assert rec_shard >= rec_single - 0.15, (rec_shard, rec_single)


def test_ivf_rejects_bad_shapes():
    with pytest.raises(ValueError):
        IVFIndex(
            np.zeros((4, 8), np.float32),
            np.zeros((4, 10, 8), np.float32),
            np.zeros((4, 9), np.int32),  # rowids shape mismatch
        )
    with pytest.raises(ValueError):
        IVFIndex(
            np.zeros((4, 8), np.float32),
            np.zeros((4, 10, 8), np.int8),  # int8 without quantizer
            np.zeros((4, 10), np.int32),
        )


def test_ivf_rescore_block_pass_recovers_oracle_ranking(tmp_path):
    """IVFPQ + rescore (FAISS IndexIVFPQ + IndexRefineFlat): a full-probe
    pq4 scan proposes candidates, the block pass re-ranks them with true
    float scores — output must equal the exact oracle ranking over the
    candidate set, and recall@k must be >= the un-rescored ADC recall."""
    from convdr_tpu.retrieval.blocks import write_embedding_block

    x, _c, _w = _clustered(1200, 32, 24, seed=11, spread=0.08)
    offsets = np.arange(1200, dtype=np.int64) * 2 + 5
    d = str(tmp_path / "blocks")
    for b in range(3):
        write_embedding_block(d, b, x[b::3], offsets[b::3])
    idx = IVFIndex.build_from_blocks(
        d, 8, storage_dtype="pq4", pq_m=8, iters=6, seed=0
    )
    rng = np.random.Generator(np.random.PCG64(12))
    q = x[rng.choice(1200, 8, replace=False)] + 0.02 * rng.standard_normal(
        (8, 32), dtype=np.float32
    )
    k, factor = 10, 4
    _s_adc, cand = idx.search(q, factor * k, nprobe=idx.nlist)
    s, i = idx.rescore_block_pass(d, q, cand, k)
    # exact oracle over the candidate set, by rowid
    off_to_row = {int(o): r for r, o in enumerate(offsets)}
    for r in range(8):
        rows = np.array(
            sorted(off_to_row[int(c)] for c in cand[r] if c >= 0)
        )
        true = q[r] @ x[rows].T
        order = np.argsort(-true, kind="stable")[:k]
        np.testing.assert_allclose(s[r], true[order], rtol=1e-5)
        np.testing.assert_array_equal(
            i[r], offsets[rows[order]].astype(np.int32)
        )
    # rescoring never loses recall vs the raw ADC cut at k
    _, o_i = topk_oracle(q, x, k)
    oracle_sets = [set(offsets[o_i[r]]) for r in range(8)]
    s_raw, i_raw = idx.search(q, k, nprobe=idx.nlist)
    rec = lambda ii: np.mean(
        [len(set(ii[r]) & oracle_sets[r]) / k for r in range(8)]
    )
    assert rec(i) >= rec(i_raw) - 1e-9, (rec(i), rec(i_raw))


def test_ivf_rescore_block_pass_multichunk_duplicates(tmp_path):
    """Duplicate rowids (multi-chunk FirstP: one offset, several rows)
    score as the max over their rows."""
    from convdr_tpu.retrieval.blocks import write_embedding_block

    rng = np.random.Generator(np.random.PCG64(21))
    x = rng.standard_normal((60, 8), dtype=np.float32)
    offsets = np.repeat(np.arange(30, dtype=np.int64), 2)  # 2 chunks/doc
    d = str(tmp_path / "blocks_mc")
    write_embedding_block(d, 0, x, offsets)
    idx = IVFIndex.build(
        x, 4, rowids=offsets.astype(np.int32), iters=5, seed=0
    )
    q = rng.standard_normal((3, 8), dtype=np.float32)
    _s, cand = idx.search(q, 40, nprobe=idx.nlist)
    s, i = idx.rescore_block_pass(d, q, cand, 5)
    true = q @ x.T  # [3, 60]
    chunk_max = np.maximum(true[:, 0::2], true[:, 1::2])  # [3, 30] per doc
    for r in range(3):
        # every returned (rowid, score) pair carries the doc's CHUNK MAX
        # (both duplicate slots surface with the same max; the run writer
        # dedups downstream, reference run_convdr_inference.py:58-69)
        np.testing.assert_allclose(s[r], chunk_max[r, i[r]], rtol=1e-5)
        # distinct docs appear in descending chunk-max order
        _, first = np.unique(i[r], return_index=True)
        docs = i[r][np.sort(first)]
        want = np.argsort(-chunk_max[r], kind="stable")[: len(docs)]
        np.testing.assert_array_equal(docs, want)


def test_ivf_rescore_block_pass_int8_blocks(tmp_path):
    """int8 block files refine via their scales sidecar (SQ8-grade)."""
    from convdr_tpu.ops.quant import Int8Quantizer
    from convdr_tpu.retrieval.blocks import write_embedding_block

    rng = np.random.Generator(np.random.PCG64(31))
    x = rng.standard_normal((300, 16), dtype=np.float32)
    quant = Int8Quantizer.fit(x)
    d = str(tmp_path / "blocks_i8r")
    write_embedding_block(
        d, 0, quant.quantize_passages(x), np.arange(300, dtype=np.int64)
    )
    quant.save(d)
    idx = IVFIndex.build_from_blocks(
        d, 4, storage_dtype="pq4", pq_m=8, iters=5, seed=0
    )
    q = rng.standard_normal((4, 16), dtype=np.float32)
    _s, cand = idx.search(q, 30, nprobe=idx.nlist)
    s, i = idx.rescore_block_pass(d, q, cand, 5)
    deq = quant.quantize_passages(x).astype(np.float32) * quant.scales
    for r in range(4):
        rows = np.array(sorted(int(c) for c in cand[r] if c >= 0))
        true = q[r] @ deq[rows].T
        order = np.argsort(-true, kind="stable")[:5]
        np.testing.assert_allclose(s[r], true[order], rtol=1e-5)


def test_ivf_rescore_block_pass_wrong_dir_raises(tmp_path):
    from convdr_tpu.retrieval.blocks import write_embedding_block

    rng = np.random.Generator(np.random.PCG64(51))
    x = rng.standard_normal((100, 8), dtype=np.float32)
    d = str(tmp_path / "blocks_a")
    write_embedding_block(d, 0, x, np.arange(100, dtype=np.int64))
    idx = IVFIndex.build(
        x, 4, rowids=np.arange(100, dtype=np.int32) + 5000, iters=4, seed=0
    )
    q = rng.standard_normal((2, 8), dtype=np.float32)
    _s, cand = idx.search(q, 10, nprobe=idx.nlist)
    with pytest.raises(ValueError, match="never appeared"):
        idx.rescore_block_pass(d, q, cand, 5)
    with pytest.raises(FileNotFoundError):
        idx.rescore_block_pass(str(tmp_path / "empty"), q, cand, 5)


def test_ivf_capacity_guard_raises_with_sizing_message():
    """Oversized resident lists refuse upload with a sizing message; the
    budget prorates across mesh shards."""
    import jax
    from convdr_tpu.parallel.mesh import get_mesh

    x = np.zeros((64, 8), np.float32)
    idx = IVFIndex.build(x, 4, iters=2, seed=0)
    idx.max_resident_bytes = 64  # force the refusal
    with pytest.raises(MemoryError, match="GB resident per device"):
        idx.search(x[:2], 3)
    # an 8-way mesh divides the footprint; a budget that fits one shard
    # but not the whole index must pass sharded and fail unsharded
    per_shard = idx.device_bytes() // 8
    idx.max_resident_bytes = per_shard + 64
    with pytest.raises(MemoryError):
        idx._check_capacity(1)
    mesh = get_mesh(("index",))
    assert len(jax.devices()) == 8
    s, i = idx.search(x[:2], 3, nprobe=idx.nlist, mesh=mesh)
    assert s.shape == (2, 3)


def test_ivf_from_pq_index_reuses_codes_exactly(tmp_path):
    """from_pq_index (the FAISS precomputed-codes add_core path) must
    produce an IVFPQ whose full-probe result equals the source flat
    index's ADC search — same codec, same code rows, only coarse
    structure added — for both packed and unpacked codes."""
    from convdr_tpu.retrieval.blocks import write_embedding_block
    from convdr_tpu.retrieval.pq_index import PQIndex

    rng = np.random.Generator(np.random.PCG64(77))
    x = rng.standard_normal((600, 16), dtype=np.float32)
    offsets = np.arange(600, dtype=np.int64) * 3 + 11
    d = str(tmp_path / "blocks")
    for b in range(2):
        write_embedding_block(d, b, x[b::2], offsets[b::2])
    q = rng.standard_normal((5, 16), dtype=np.float32)
    for pack in (False, True):
        flat = PQIndex.build_from_blocks(
            d, 8, 4, iters=6, seed=1, pack=pack
        )
        ivf = IVFIndex.from_pq_index(flat, d, 8, iters=6, seed=0)
        assert ivf.storage_dtype == "pq4"
        assert ivf.packed is pack
        assert ivf.ntotal == flat.ntotal
        # code rows moved, never re-encoded: multiset of rows identical
        flat_rows = {bytes(r) for r in np.asarray(flat.codes)}
        live = ivf.rowids.reshape(-1) >= 0
        ivf_rows = {
            bytes(r) for r in ivf.lists.reshape(-1, ivf.lists.shape[2])[live]
        }
        assert ivf_rows == flat_rows
        f_s, f_i = flat.search(q, 10, exact=True)
        i_s, i_i = ivf.search(q, 10, nprobe=ivf.nlist, exact=True)
        for row in range(q.shape[0]):
            assert set(i_i[row].tolist()) == set(f_i[row].tolist())
        np.testing.assert_allclose(
            np.sort(i_s, 1), np.sort(f_s, 1), rtol=1e-4, atol=1e-4
        )


def test_ivf_from_pq_index_bf16_blocks(tmp_path):
    """Promotion over bf16-stored blocks (the 38M scale-cache layout:
    uint16 bit patterns on disk) — no host f32 cast of the corpus."""
    import ml_dtypes

    from convdr_tpu.retrieval.blocks import write_embedding_block
    from convdr_tpu.retrieval.pq_index import PQIndex

    rng = np.random.Generator(np.random.PCG64(79))
    x = rng.standard_normal((400, 16), dtype=np.float32).astype(
        ml_dtypes.bfloat16
    )
    d = str(tmp_path / "blocks")
    write_embedding_block(d, 0, x, np.arange(400, dtype=np.int64))
    flat = PQIndex.build_from_blocks(d, 8, 4, iters=5, seed=1, pack=True)
    ivf = IVFIndex.from_pq_index(
        flat, d, 8, iters=5, seed=0, train_sample=256
    )
    assert ivf.ntotal == 400 and ivf.packed
    q = rng.standard_normal((4, 16), dtype=np.float32)
    f_s, f_i = flat.search(q, 10, exact=True)
    i_s, i_i = ivf.search(q, 10, nprobe=ivf.nlist, exact=True)
    for row in range(4):
        assert set(i_i[row].tolist()) == set(f_i[row].tolist())


def test_ivf_from_pq_index_rejects_mismatched_blocks(tmp_path):
    from convdr_tpu.retrieval.blocks import write_embedding_block
    from convdr_tpu.retrieval.pq_index import PQIndex

    rng = np.random.Generator(np.random.PCG64(78))
    x = rng.standard_normal((200, 16), dtype=np.float32)
    d_good = str(tmp_path / "good")
    write_embedding_block(d_good, 0, x, np.arange(200, dtype=np.int64))
    flat = PQIndex.build_from_blocks(d_good, 8, 4, iters=4, seed=1)
    # same rows, different payload ids => refuse (codes/blocks disagree)
    d_bad = str(tmp_path / "bad")
    write_embedding_block(d_bad, 0, x, np.arange(200, dtype=np.int64) + 7)
    with pytest.raises(ValueError, match="do not match the PQIndex"):
        IVFIndex.from_pq_index(flat, d_bad, 8, iters=4, seed=0)
    # different row count => refuse
    d_short = str(tmp_path / "short")
    write_embedding_block(
        d_short, 0, x[:100], np.arange(100, dtype=np.int64)
    )
    with pytest.raises(ValueError, match="do not match the PQIndex"):
        IVFIndex.from_pq_index(flat, d_short, 8, iters=4, seed=0)
