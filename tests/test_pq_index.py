"""PQIndex: resident codes, block builds, rescoring, sharded search.

Contract under test (module docstring of retrieval/pq_index.py): the index
wraps the ADC flat search with payload rowids (emb2offset convention),
full-width candidates + rescoring reproduce exact float ranking (FAISS
IndexRefineFlat), and the mesh path's per-shard merge matches the
single-device scan. Counterpart of FAISS IndexPQ reached through the
reference's FAISS dependency (run_convdr_inference.py:157-242).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from convdr_tpu.ops.exact_search import NEG_INF, topk_oracle
from convdr_tpu.ops.pq import PQCodec, pq_adc_oracle, pq_flat_topk
from convdr_tpu.parallel.mesh import get_mesh
from convdr_tpu.retrieval.pq_index import PQIndex, is_pq_index_dir


def corpus(seed=3, n=800, d=32):
    rng = np.random.Generator(np.random.PCG64(seed))
    x = rng.standard_normal((n, d), dtype=np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


@pytest.fixture(scope="module")
def built():
    x = corpus()
    index = PQIndex.build(x, m=8, nbits=4, iters=8, seed=1)
    queries = x[:7] + 0.02 * corpus(seed=9, n=7)
    return x, index, queries


def test_search_matches_adc_oracle(built):
    x, index, queries = built
    lut = index.codec.lut(queries)
    want_s, want_i = pq_adc_oracle(lut, index.codes, 9)
    s, i = index.search(queries, 9, exact=True)
    np.testing.assert_allclose(s, want_s, rtol=1e-4, atol=1e-4)
    for q in range(7):
        assert set(i[q].tolist()) == set(want_i[q].tolist())


def test_rowid_payloads_returned(built):
    x, _, queries = built
    offsets = np.arange(800, dtype=np.int32) * 7 + 3
    index = PQIndex.build(x, m=8, nbits=4, iters=8, seed=1, rowids=offsets)
    s, i = index.search(queries, 5, exact=True)
    base_s, base_pos = PQIndex.build(
        x, m=8, nbits=4, iters=8, seed=1
    ).search(queries, 5, exact=True)
    np.testing.assert_array_equal(i, np.where(base_pos >= 0,
                                              base_pos * 7 + 3, -1))
    np.testing.assert_allclose(s, base_s)


def test_self_retrieval_quality(built):
    # unit-norm corpus: each row's top-3 ADC hits should include itself
    x, index, _ = built
    s, i = index.search(x[:20], 3)
    hits = np.mean([(q in i[q]) for q in range(20)])
    assert hits >= 0.9, (hits, i[:5])


def test_rescore_in_memory_recovers_exact(built):
    # full-width candidates + rescoring == exact float oracle, bit-wise
    x, index, queries = built
    k = 6
    s, i = index.search(
        queries, k, rescore_factor=-(-800 // k),  # candidates cover corpus
        rescore_passages=x,
    )
    want_s, want_i = topk_oracle(queries, x, k)
    np.testing.assert_allclose(s, want_s, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i, want_i)


def test_rescore_requires_passages(built):
    _, index, queries = built
    with pytest.raises(ValueError):
        index.search(queries, 5, rescore_factor=2)


def test_save_load_roundtrip(tmp_path, built):
    _, index, queries = built
    d = str(tmp_path / "pqidx")
    assert not is_pq_index_dir(d)
    index.save(d)
    assert is_pq_index_dir(d)
    loaded = PQIndex.load(d)
    assert loaded.ntotal == index.ntotal
    s0, i0 = index.search(queries, 8, exact=True)
    s1, i1 = loaded.search(queries, 8, exact=True)
    np.testing.assert_allclose(s0, s1)
    np.testing.assert_array_equal(i0, i1)
    with pytest.raises(FileNotFoundError):
        PQIndex.load(str(tmp_path / "nope"))


def test_build_from_blocks_and_block_rescore(tmp_path):
    from convdr_tpu.retrieval.blocks import write_embedding_block

    x = corpus(seed=5, n=500)
    offsets = np.arange(500, dtype=np.int64) * 3 + 11
    d = str(tmp_path / "blocks")
    # reference round-robin sharding: block b holds rows i % 2 == b
    for b in range(2):
        write_embedding_block(d, b, x[b::2], offsets[b::2])
    index = PQIndex.build_from_blocks(d, m=8, nbits=4, iters=6, seed=0)
    assert index.ntotal == 500
    assert index.stats["block_sizes"] == [250, 250]

    queries = x[:6]
    # payloads are offsets
    _, ids = index.search(queries, 3)
    assert set(ids.ravel().tolist()) <= set(offsets.tolist())

    # block-pass rescoring over full-width candidates == exact oracle on
    # the block-concatenated row order
    x_concat = np.concatenate([x[0::2], x[1::2]])
    off_concat = np.concatenate([offsets[0::2], offsets[1::2]])
    lut = jnp.asarray(index.codec.lut(queries))
    _, pos = pq_flat_topk(
        lut, jnp.asarray(index.codes), 500, index.codec.ksub, exact=True
    )
    s, ids = index.rescore_block_pass(d, queries, np.asarray(pos), 4)
    want_s, want_pos = topk_oracle(queries, x_concat, 4)
    np.testing.assert_allclose(s, want_s, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(ids, off_concat[want_pos].astype(np.int32))


def test_build_from_blocks_int8(tmp_path):
    from convdr_tpu.ops.quant import Int8Quantizer
    from convdr_tpu.retrieval.blocks import write_embedding_block

    x = corpus(seed=6, n=300)
    quant = Int8Quantizer.fit(x)
    d = str(tmp_path / "blocks_i8")
    for b in range(2):
        write_embedding_block(
            d, b, quant.quantize_passages(x[b::2]),
            np.arange(300, dtype=np.int64)[b::2],
        )
    quant.save(d)
    index = PQIndex.build_from_blocks(d, m=8, nbits=4, iters=5, seed=0)
    assert index.ntotal == 300
    s, i = index.search(x[:10], 3)
    hits = np.mean([(q in i[q]) for q in range(10)])
    assert hits >= 0.8  # PQ over dequantized rows still self-retrieves


def test_sharded_search_matches_single_device(built):
    x, index, queries = built
    mesh = get_mesh(("index",))
    s0, i0 = index.search(queries, 10, exact=True)
    s1, i1 = index.search(queries, 10, exact=True, mesh=mesh)
    np.testing.assert_allclose(s0, s1, rtol=1e-5, atol=1e-6)
    for q in range(len(queries)):
        assert set(i0[q].tolist()) == set(i1[q].tolist())


def test_validation_errors(built):
    x, index, _ = built
    with pytest.raises(ValueError):
        PQIndex(index.codec, index.codes.astype(np.int32))  # not uint8
    with pytest.raises(ValueError):
        PQIndex(index.codec, index.codes[:, :4])  # wrong M
    with pytest.raises(ValueError):
        PQIndex(index.codec, index.codes, np.arange(3, dtype=np.int32))
    with pytest.raises(ValueError):
        index.search(np.zeros((2, 7), np.float32), 3)  # wrong dim


# ---------------------------------------------------------------------------
# IVFPQ composition (retrieval/ivf.py storage_dtype="pq4"/"pq8")
# ---------------------------------------------------------------------------
def test_ivfpq_full_probe_matches_adc_oracle():
    from convdr_tpu.retrieval.ivf import IVFIndex

    x = corpus(seed=21, n=600, d=32)
    idx = IVFIndex.build(
        x, nlist=6, storage_dtype="pq4", pq_m=8, iters=6, seed=0
    )
    assert idx.storage_dtype == "pq4" and idx.codec is not None
    assert idx.lists.dtype == np.uint8 and idx.lists.shape[2] == 8
    assert idx.dim == 32  # queries stay D-dimensional
    queries = x[:6]
    s, i = idx.search(queries, 7, nprobe=idx.nlist, exact=True)
    codes = idx.codec.encode(x)
    want_s, want_i = pq_adc_oracle(idx.codec.lut(queries), codes, 7)
    np.testing.assert_allclose(np.sort(s, 1), np.sort(want_s, 1),
                               rtol=1e-4, atol=1e-4)
    for q in range(6):
        assert set(i[q].tolist()) == set(want_i[q].tolist())


def test_ivfpq_recall_on_clustered_corpus():
    from convdr_tpu.ops.exact_search import topk_oracle
    from convdr_tpu.retrieval.ivf import IVFIndex

    rng = np.random.Generator(np.random.PCG64(5))
    centers = rng.standard_normal((12, 32), dtype=np.float32)
    which = rng.integers(0, 12, size=1500)
    x = centers[which] + 0.25 * rng.standard_normal(
        (1500, 32), dtype=np.float32
    )
    idx = IVFIndex.build(
        x, nlist=12, storage_dtype="pq8", pq_m=8, iters=8, seed=0
    )
    queries = x[:10] + 0.05 * rng.standard_normal((10, 32), dtype=np.float32)
    _, want = topk_oracle(queries, x, 10)
    _, got = idx.search(queries, 30, nprobe=4)
    rec = np.mean([
        len(set(got[q].tolist()) & set(want[q].tolist())) / 10.0
        for q in range(10)
    ])
    assert rec >= 0.6, rec


def test_ivfpq_save_load_roundtrip(tmp_path):
    from convdr_tpu.retrieval.ivf import IVFIndex

    x = corpus(seed=23, n=400, d=32)
    idx = IVFIndex.build(
        x, nlist=5, storage_dtype="pq4", pq_m=8, iters=5, seed=0
    )
    d = str(tmp_path / "ivfpq")
    idx.save(d)
    loaded = IVFIndex.load(d)
    assert loaded.storage_dtype == "pq4"
    assert loaded.codec is not None and loaded.codec.nbits == 4
    q = x[:5]
    s0, i0 = idx.search(q, 6, nprobe=3, exact=True)
    s1, i1 = loaded.search(q, 6, nprobe=3, exact=True)
    np.testing.assert_allclose(s0, s1)
    np.testing.assert_array_equal(i0, i1)


def test_ivfpq_build_from_blocks_and_int8_blocks(tmp_path):
    from convdr_tpu.ops.quant import Int8Quantizer
    from convdr_tpu.retrieval.blocks import write_embedding_block
    from convdr_tpu.retrieval.ivf import IVFIndex

    x = corpus(seed=25, n=500, d=32)
    offsets = np.arange(500, dtype=np.int64) * 2 + 7
    d = str(tmp_path / "blocks")
    for b in range(2):
        write_embedding_block(d, b, x[b::2], offsets[b::2])
    idx = IVFIndex.build_from_blocks(
        d, 6, storage_dtype="pq4", pq_m=8, iters=5, seed=0
    )
    assert idx.ntotal == 500 and idx.storage_dtype == "pq4"
    _, ids = idx.search(x[:5], 3, nprobe=idx.nlist)
    assert set(ids.ravel().tolist()) <= set(offsets.tolist())

    # int8 blocks may build a PQ index (dequantized rows re-encode)
    quant = Int8Quantizer.fit(x)
    d8 = str(tmp_path / "blocks_i8")
    for b in range(2):
        write_embedding_block(
            d8, b, quant.quantize_passages(x[b::2]), offsets[b::2]
        )
    quant.save(d8)
    idx8 = IVFIndex.build_from_blocks(
        d8, 6, storage_dtype="pq4", pq_m=8, iters=5, seed=0
    )
    assert idx8.ntotal == 500 and idx8.codec is not None


def test_ivfpq_sharded_search_contract():
    from convdr_tpu.retrieval.ivf import IVFIndex

    x = corpus(seed=27, n=640, d=32)
    idx = IVFIndex.build(
        x, nlist=8, storage_dtype="pq4", pq_m=8, iters=5, seed=0
    )
    mesh = get_mesh(("index",))
    q = x[:6]
    s0, i0 = idx.search(q, 8, nprobe=idx.nlist)
    s1, i1 = idx.search(q, 8, nprobe=idx.nlist, mesh=mesh)
    # full probe on both paths: every row scored, result sets match
    for r in range(6):
        assert set(i0[r].tolist()) == set(i1[r].tolist())


def test_packed_index_matches_unpacked(tmp_path, built):
    """pack=True: half the code bytes, identical search results, save/load
    + sharded paths preserved."""
    x, index, queries = built
    packed = PQIndex.build(x, m=8, nbits=4, codec=index.codec, pack=True)
    assert packed.code_bytes == 4 and index.code_bytes == 8
    assert packed.codes.nbytes == index.codes.nbytes // 2
    s_u, i_u = index.search(queries, 15)
    s_p, i_p = packed.search(queries, 15)
    np.testing.assert_array_equal(s_u, s_p)
    np.testing.assert_array_equal(i_u, i_p)
    d = str(tmp_path / "pq_packed")
    packed.save(d)
    loaded = PQIndex.load(d)
    assert loaded.packed
    s_l, i_l = loaded.search(queries, 15)
    np.testing.assert_array_equal(s_u, s_l)
    np.testing.assert_array_equal(i_u, i_l)
    mesh = get_mesh(("index",))
    s_m, i_m = loaded.search(queries, 15, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(s_m), s_u)
    np.testing.assert_array_equal(np.asarray(i_m), i_u)


def test_packed_requires_nbits4(built):
    x, _index, _q = built
    codec8 = PQCodec.fit(x, m=8, nbits=8, iters=4, seed=1)
    with pytest.raises(ValueError, match="nbits=4 only"):
        PQIndex(codec8, np.zeros((4, 4), np.uint8), packed=True)


def test_ivfpq_packed_lists_match_unpacked():
    """pack=True pq4 IVF lists: half the list bytes, bit-identical search
    results single-device and sharded."""
    from convdr_tpu.retrieval.ivf import IVFIndex

    rng = np.random.Generator(np.random.PCG64(77))
    centers = rng.standard_normal((16, 32), dtype=np.float32)
    which = rng.integers(0, 16, size=2000)
    x = (centers[which] + 0.1 * rng.standard_normal((2000, 32))).astype(
        np.float32
    )
    q = x[rng.choice(2000, 8, replace=False)] + 0.02 * rng.standard_normal(
        (8, 32)
    ).astype(np.float32)
    a = IVFIndex.build(x, 16, storage_dtype="pq4", pq_m=8, iters=6, seed=0)
    b = IVFIndex.build(
        x, 16, storage_dtype="pq4", pq_m=8, iters=6, seed=0, pack=True
    )
    assert b.packed and b.lists.nbytes == a.lists.nbytes // 2
    s_a, i_a = a.search(q, 10, nprobe=4)
    s_b, i_b = b.search(q, 10, nprobe=4)
    np.testing.assert_array_equal(s_a, s_b)
    np.testing.assert_array_equal(i_a, i_b)
    mesh = get_mesh(("index",))
    s_m, i_m = b.search(q, 10, nprobe=8, mesh=mesh)
    s_n, i_n = a.search(q, 10, nprobe=8, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(s_m), np.asarray(s_n))
    np.testing.assert_array_equal(np.asarray(i_m), np.asarray(i_n))


def test_ivfpq_packed_save_load_roundtrip(tmp_path):
    from convdr_tpu.retrieval.ivf import IVFIndex

    rng = np.random.Generator(np.random.PCG64(78))
    x = rng.standard_normal((300, 16), dtype=np.float32)
    idx = IVFIndex.build(
        x, 4, storage_dtype="pq4", pq_m=8, iters=4, seed=0, pack=True
    )
    d = str(tmp_path / "ivfpq_packed")
    idx.save(d)
    loaded = IVFIndex.load(d)
    assert loaded.packed
    q = rng.standard_normal((3, 16), dtype=np.float32)
    s1, i1 = idx.search(q, 5, nprobe=idx.nlist)
    s2, i2 = loaded.search(q, 5, nprobe=loaded.nlist)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(i1, i2)


def test_ivf_pack_requires_pq4():
    from convdr_tpu.retrieval.ivf import IVFIndex

    x = np.zeros((64, 16), np.float32)
    with pytest.raises(ValueError, match="pq4 storage only"):
        IVFIndex.build(x, 4, storage_dtype="int8", pack=True)
