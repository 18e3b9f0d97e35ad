"""Int8 scalar-quantized (SQ8) search: ops/quant.py + searcher integration.

Contract under test (module docstring of ops/quant.py): the int8 search is
bit-exact vs the int32 oracle (bf16 matmul over int8 operands is integer
arithmetic at dim <= 1040), scales fold into queries without changing any
ranking, and the rescore pass reproduces full-precision ordering — the TPU
equivalents of FAISS IndexScalarQuantizer / IndexRefineFlat, which the
reference reaches through faiss.IndexFlatIP (run_convdr_inference.py:157-242).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from convdr_tpu.core.config import SearchConfig
from convdr_tpu.ops.exact_search import NEG_INF, flat_ip_topk, topk_oracle
from convdr_tpu.ops.quant import (
    INT8_EXACT_MAX_DIM,
    Int8Quantizer,
    fit_int8_scales,
    int8_topk_oracle,
    quantize_passages,
    quantize_queries,
    rescore_candidates,
)
from convdr_tpu.parallel.mesh import get_mesh, pad_to_multiple
from convdr_tpu.parallel.sharded_search import sharded_flat_ip_topk
from convdr_tpu.retrieval.blocks import write_embedding_block
from convdr_tpu.retrieval.searcher import BlockedSearcher


def quantized_problem(rng, q=9, n=700, d=48):
    queries = rng.randn(q, d).astype(np.float32)
    passages = rng.randn(n, d).astype(np.float32)
    quant = Int8Quantizer.fit(passages)
    p_i8 = quant.quantize_passages(passages)
    q_int, tq = quant.quantize_queries(queries)
    return queries, passages, quant, p_i8, q_int, tq


# ---------------------------------------------------------------------------
# quantizer mechanics
# ---------------------------------------------------------------------------
def test_fit_scales_cover_sample(rng):
    p = rng.randn(200, 16).astype(np.float32)
    s = fit_int8_scales(p)
    q = quantize_passages(p, s)
    assert q.dtype == np.int8
    # symmetric absmax scaling: sample values never clip
    assert np.abs(q).max() <= 127
    # reconstruction error bounded by half a quantization step
    err = np.abs(q.astype(np.float32) * s[None, :] - p)
    assert np.all(err <= s[None, :] * 0.5 + 1e-6)


def test_fit_scales_zero_dim_safe():
    p = np.zeros((10, 4), np.float32)
    p[:, 0] = 3.0
    s = fit_int8_scales(p)
    assert s[0] == pytest.approx(3.0 / 127)
    assert np.all(s[1:] == 1.0)  # zero dims stay quantizable
    assert np.all(quantize_passages(p, s)[:, 1:] == 0)


def test_quantize_queries_int_valued_and_rank_safe(rng):
    queries, _p, _quant, _p_i8, q_int, tq = quantized_problem(rng)
    assert np.array_equal(q_int, np.rint(q_int))  # integers in f32
    assert np.abs(q_int).max() <= 127
    assert np.all(tq > 0)  # positive per-query scale: ranking unchanged


def test_exact_dim_bound_documented():
    assert INT8_EXACT_MAX_DIM >= 768  # BERT-family dim inside the contract


# ---------------------------------------------------------------------------
# engine: int8 path of flat_ip_topk is bit-exact vs the int32 oracle
# ---------------------------------------------------------------------------
def test_flat_ip_topk_int8_matches_int_oracle(rng):
    _q, _p, _quant, p_i8, q_int, _tq = quantized_problem(rng)
    os_, oi = int8_topk_oracle(q_int, p_i8, 25)
    s, i = flat_ip_topk(jnp.asarray(q_int), jnp.asarray(p_i8), 25)
    np.testing.assert_array_equal(np.asarray(i), oi)
    np.testing.assert_array_equal(np.asarray(s), os_)  # integer-exact


def test_flat_ip_topk_int8_blocked_scan_and_valid_rows(rng):
    _q, _p, _quant, p_i8, q_int, _tq = quantized_problem(rng, n=603)
    padded = np.concatenate([p_i8, rng.randint(-127, 127, (37, p_i8.shape[1])).astype(np.int8)])
    os_, oi = int8_topk_oracle(q_int, p_i8, 40)
    s, i = flat_ip_topk(
        jnp.asarray(q_int), jnp.asarray(padded), 40,
        block_rows=128, valid_rows=603,
    )
    np.testing.assert_array_equal(np.asarray(i), oi)
    np.testing.assert_array_equal(np.asarray(s), os_)


def test_sharded_int8_matches_oracle(rng):
    mesh = get_mesh(("index",))
    n_dev = mesh.shape["index"]
    _q, _p, _quant, p_i8, q_int, _tq = quantized_problem(rng, n=333, d=32)
    n_pad = pad_to_multiple(333, n_dev)
    padded = np.concatenate([p_i8, np.zeros((n_pad - 333, 32), np.int8)])
    os_, oi = int8_topk_oracle(q_int, p_i8, 30)
    s, i = sharded_flat_ip_topk(
        mesh, jnp.asarray(q_int), jnp.asarray(padded), 30,
        valid_rows=333, block_rows=64,
    )
    np.testing.assert_array_equal(np.asarray(i), oi)
    np.testing.assert_array_equal(np.asarray(s), os_)


# ---------------------------------------------------------------------------
# rescore (IndexRefineFlat parity)
# ---------------------------------------------------------------------------
def test_rescore_candidates_full_set_equals_oracle(rng):
    q = rng.randn(5, 24).astype(np.float32)
    p = rng.randn(80, 24).astype(np.float32)
    # candidate set = everything (scrambled, with pads): rescore must
    # reproduce the full-precision oracle including tie order
    idx = np.stack([rng.permutation(80) for _ in range(5)])
    idx = np.concatenate([idx, np.full((5, 7), -1)], axis=1)
    os_, oi = topk_oracle(q, p, 10)
    s, i = rescore_candidates(q, p, idx, 10)
    np.testing.assert_array_equal(i, oi)
    np.testing.assert_allclose(s, os_, rtol=1e-6)


def test_rescore_tie_break_low_index():
    q = np.ones((1, 4), np.float32)
    p = np.zeros((6, 4), np.float32)
    p[2] = 1.0
    p[4] = 1.0
    # candidates arrive in reverse order; ties must still prefer row 2
    s, i = rescore_candidates(q, p, np.asarray([[5, 4, 3, 2, 1]]), 2)
    assert list(i[0]) == [2, 4]


def test_rescore_pads_when_candidates_short():
    q = np.ones((2, 4), np.float32)
    p = np.ones((3, 4), np.float32)
    s, i = rescore_candidates(q, p, np.asarray([[0, 2, -1], [1, -1, -1]]), 4)
    assert i.shape == (2, 4)
    assert list(i[0]) == [0, 2, -1, -1]
    assert s[0, 2] == NEG_INF


# ---------------------------------------------------------------------------
# searcher integration
# ---------------------------------------------------------------------------
def test_search_arrays_int8_fits_and_matches_int_oracle(rng):
    queries, passages, quant, p_i8, q_int, tq = quantized_problem(rng)
    searcher = BlockedSearcher(
        SearchConfig(storage_dtype="int8"), quantizer=quant
    )
    s, offs = searcher.search_arrays(
        queries, passages, np.arange(700) * 3, 20
    )
    os_, oi = int8_topk_oracle(q_int, p_i8, 20)
    np.testing.assert_array_equal(offs, oi * 3)
    np.testing.assert_allclose(s, os_ * tq, rtol=1e-6)  # tq-rescaled ints


def test_search_arrays_int8_device_quantize_matches_host(rng):
    # float corpus under int8 config: the device-side VPU quantization must
    # be bit-identical to the host quantizer (same IEEE divide + rint)
    queries, passages, quant, p_i8, q_int, _tq = quantized_problem(rng, n=450)
    searcher = BlockedSearcher(SearchConfig(storage_dtype="int8"))
    s, offs = searcher.search_arrays(queries, passages, np.arange(450), 15)
    assert searcher.quantizer is not None  # self-fitted
    q_int2, _ = searcher.quantizer.quantize_queries(queries)
    _os, oi = int8_topk_oracle(q_int2, searcher.quantizer.quantize_passages(passages), 15)
    np.testing.assert_array_equal(offs, oi)


def test_search_arrays_int8_rescore_recovers_f32_oracle(rng):
    queries, passages, _quant, _p_i8, _q_int, _tq = quantized_problem(rng, n=400)
    # factor large enough that the candidate set covers the corpus: the
    # refined result must equal the full-precision oracle bit for bit
    searcher = BlockedSearcher(
        SearchConfig(storage_dtype="int8", rescore_factor=40)
    )
    s, offs = searcher.search_arrays(queries, passages, np.arange(400), 10)
    os_, oi = topk_oracle(queries, passages, 10)
    np.testing.assert_array_equal(offs, oi)
    np.testing.assert_allclose(s, os_, rtol=1e-6)


def test_search_arrays_int8_overlap_reasonable(rng):
    # realistic regime: quantized-only search keeps high top-k overlap
    queries, passages, quant, _p_i8, _q_int, _tq = quantized_problem(
        rng, q=16, n=2000, d=64
    )
    searcher = BlockedSearcher(
        SearchConfig(storage_dtype="int8"), quantizer=quant
    )
    _s, offs = searcher.search_arrays(queries, passages, np.arange(2000), 10)
    _os, oi = topk_oracle(queries, passages, 10)
    overlap = np.mean(
        [len(set(offs[i]) & set(oi[i])) for i in range(16)]
    ) / 10
    assert overlap >= 0.8, overlap


def test_search_blocks_int8_blocks_with_sidecar(rng, tmp_path):
    queries, passages, quant, p_i8, q_int, tq = quantized_problem(rng, n=640)
    d = str(tmp_path)
    # two int8 blocks + scales sidecar, the generate_embeddings layout
    write_embedding_block(d, 0, p_i8[:320], np.arange(320) * 2)
    write_embedding_block(d, 1, p_i8[320:], (320 + np.arange(320)) * 2)
    quant.save(d)
    searcher = BlockedSearcher(SearchConfig(storage_dtype="int8"))
    s, offs = searcher.search_blocks(d, queries, 25)
    os_, oi = int8_topk_oracle(q_int, p_i8, 25)
    np.testing.assert_array_equal(offs, oi * 2)
    np.testing.assert_allclose(s, os_ * tq, rtol=1e-6)


def test_search_blocks_int8_blocks_without_sidecar_raises(rng, tmp_path):
    _q, _p, _quant, p_i8, _qi, _tq = quantized_problem(rng, n=100)
    d = str(tmp_path)
    write_embedding_block(d, 0, p_i8, np.arange(100))
    searcher = BlockedSearcher(SearchConfig(storage_dtype="int8"))
    with pytest.raises(FileNotFoundError, match="sidecar"):
        searcher.search_blocks(d, np.zeros((2, p_i8.shape[1]), np.float32), 5)


def test_search_blocks_float_blocks_int8_config_self_fits(rng, tmp_path, caplog):
    queries, passages, _quant, _p_i8, _qi, _tq = quantized_problem(rng, n=500)
    d = str(tmp_path)
    write_embedding_block(d, 0, passages[:250], np.arange(250))
    write_embedding_block(d, 1, passages[250:], 250 + np.arange(250))
    searcher = BlockedSearcher(SearchConfig(storage_dtype="int8"))
    s, offs = searcher.search_blocks(d, queries, 20)
    # scales were fitted on block 0; result is exact vs that quantizer
    q_int, tq = searcher.quantizer.quantize_queries(queries)
    p_i8 = searcher.quantizer.quantize_passages(passages)
    os_, oi = int8_topk_oracle(q_int, p_i8, 20)
    np.testing.assert_array_equal(offs, oi)


def test_search_blocks_int8_rescore_from_float_blocks(rng, tmp_path):
    queries, passages, _quant, _p_i8, _qi, _tq = quantized_problem(rng, n=300)
    d = str(tmp_path)
    write_embedding_block(d, 0, passages[:150], np.arange(150))
    write_embedding_block(d, 1, passages[150:], 150 + np.arange(150))
    searcher = BlockedSearcher(
        SearchConfig(storage_dtype="int8", rescore_factor=30)
    )
    s, offs = searcher.search_blocks(d, queries, 10)
    # factor * top_n >= block sizes: refinement covers every row, so the
    # result equals the full-precision oracle
    os_, oi = topk_oracle(queries, passages, 10)
    np.testing.assert_array_equal(offs, oi)
    np.testing.assert_allclose(s, os_, rtol=1e-6)


def test_search_blocks_rescore_rejects_int8_blocks(rng, tmp_path):
    _q, _p, quant, p_i8, _qi, _tq = quantized_problem(rng, n=100)
    d = str(tmp_path)
    write_embedding_block(d, 0, p_i8, np.arange(100))
    quant.save(d)
    searcher = BlockedSearcher(
        SearchConfig(storage_dtype="int8", rescore_factor=2)
    )
    with pytest.raises(ValueError, match="float block"):
        searcher.search_blocks(d, np.zeros((2, p_i8.shape[1]), np.float32), 5)


def test_quantizer_save_load_roundtrip(tmp_path, rng):
    quant = Int8Quantizer.fit(rng.randn(50, 12).astype(np.float32))
    quant.save(str(tmp_path))
    again = Int8Quantizer.load(str(tmp_path))
    np.testing.assert_array_equal(again.scales, quant.scales)
    assert Int8Quantizer.load_optional(str(tmp_path / "missing")) is None
