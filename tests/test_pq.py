"""Product quantization: ops/pq.py codec + flat ADC search.

Contract under test (module docstring of ops/pq.py): ADC scores equal
sum_m lut[q,m,codes[n,m]] — identically <q, decode(codes[n])> — and the
device ADC matmul search matches the numpy oracle's top-k; fit/encode are
MXU-batched but must agree with per-subspace numpy nearest-centroid
assignment. The TPU counterpart of FAISS ProductQuantizer / IndexPQ, which
the reference reaches through its FAISS dependency
(run_convdr_inference.py:157-242).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from convdr_tpu.ops.exact_search import NEG_INF, topk_oracle
from convdr_tpu.ops.pq import PQCodec, pq_adc_oracle, pq_flat_topk


def clustered(rng, n=1200, d=32, n_clusters=24, spread=0.15):
    centers = rng.randn(n_clusters, d).astype(np.float32)
    assign = rng.randint(0, n_clusters, size=n)
    return (
        centers[assign] + spread * rng.randn(n, d).astype(np.float32)
    ).astype(np.float32)


@pytest.fixture(scope="module")
def codec_problem():
    rng = np.random.RandomState(7)
    passages = clustered(rng, n=1500, d=32)
    queries = clustered(rng, n=9, d=32)
    codec = PQCodec.fit(passages, m=8, nbits=4, iters=12, seed=3)
    codes = codec.encode(passages)
    return rng, passages, queries, codec, codes


# ---------------------------------------------------------------------------
# codec mechanics
# ---------------------------------------------------------------------------
def test_fit_shapes_and_validation(codec_problem):
    _, _, _, codec, codes = codec_problem
    assert codec.codebooks.shape == (8, 16, 4)
    assert codec.dim == 32 and codec.ksub == 16 and codec.code_bytes == 8
    assert codes.dtype == np.uint8 and codes.max() < 16
    with pytest.raises(ValueError):
        PQCodec(codec.codebooks, nbits=8)  # K=16 but nbits says 256
    with pytest.raises(ValueError):
        PQCodec.fit(np.zeros((100, 30), np.float32), m=7, nbits=4)  # 30 % 7


def test_encode_matches_numpy_nearest(codec_problem):
    _, passages, _, codec, codes = codec_problem
    # brute-force nearest centroid per subspace
    x = passages.reshape(passages.shape[0], codec.m, codec.dsub)
    for mi in range(codec.m):
        d2 = (
            ((x[:, mi, None, :] - codec.codebooks[None, mi]) ** 2).sum(-1)
        )  # [N, K]
        want = np.argmin(d2, axis=1)
        got = codes[:, mi].astype(np.int64)
        # bf16 assignment may flip near-equidistant ties; distances must tie
        diff = want != got
        if diff.any():
            np.testing.assert_allclose(
                d2[diff, want[diff]], d2[diff, got[diff]], rtol=2e-2
            )


def test_decode_reconstruction_beats_mean(codec_problem):
    _, passages, _, codec, codes = codec_problem
    rec = codec.decode(codes)
    mse = ((rec - passages) ** 2).mean()
    base = ((passages - passages.mean(0)) ** 2).mean()
    assert mse < 0.25 * base  # clustered data quantizes well


def test_lut_is_subspace_inner_products(codec_problem):
    _, _, queries, codec, _ = codec_problem
    lut = codec.lut(queries)
    assert lut.shape == (9, codec.m, codec.ksub)
    qs = queries.reshape(9, codec.m, codec.dsub)
    want = np.einsum("qmd,mkd->qmk", qs, codec.codebooks)
    np.testing.assert_allclose(lut, want, rtol=1e-5, atol=1e-5)


def test_adc_oracle_equals_decoded_inner_product(codec_problem):
    _, _, queries, codec, codes = codec_problem
    lut = codec.lut(queries)
    s, i = pq_adc_oracle(lut, codes, k=5)
    rec = codec.decode(codes)
    want_s, want_i = topk_oracle(queries, rec, 5)
    # identical math up to f32 summation order
    np.testing.assert_allclose(s, want_s, rtol=1e-4, atol=1e-4)
    assert (i == want_i).mean() > 0.95  # near-ties may swap


def test_persistence_roundtrip(tmp_path, codec_problem):
    _, passages, _, codec, codes = codec_problem
    codec.save(str(tmp_path))
    loaded = PQCodec.load(str(tmp_path))
    assert loaded.nbits == codec.nbits
    np.testing.assert_array_equal(loaded.codebooks, codec.codebooks)
    np.testing.assert_array_equal(loaded.encode(passages[:64]), codes[:64])
    assert PQCodec.load_optional(str(tmp_path / "nope")) is None
    with pytest.raises(FileNotFoundError):
        PQCodec.load(str(tmp_path / "nope"))


# ---------------------------------------------------------------------------
# flat ADC search
# ---------------------------------------------------------------------------
def assert_topk_set_equal(s, i, want_s, want_i):
    np.testing.assert_allclose(s, want_s, rtol=1e-4, atol=1e-4)
    for q in range(i.shape[0]):
        assert set(i[q].tolist()) == set(want_i[q].tolist())


@pytest.mark.parametrize("block_rows", [1 << 18, 256, 100])
def test_flat_topk_matches_oracle(codec_problem, block_rows):
    # 256 => 6 blocks (static unroll); 100 => 15 blocks (lax.scan path)
    _, _, queries, codec, codes = codec_problem
    lut = codec.lut(queries)
    want_s, want_i = pq_adc_oracle(lut, codes, k=10)
    s, i = pq_flat_topk(
        jnp.asarray(lut), jnp.asarray(codes), 10, codec.ksub,
        block_rows=block_rows, exact=True,
    )
    assert_topk_set_equal(np.asarray(s), np.asarray(i), want_s, want_i)


def test_flat_topk_default_precision_recall(codec_problem):
    # bf16 LUT rounding must not disturb the recalled set on separated data
    _, _, queries, codec, codes = codec_problem
    lut = codec.lut(queries)
    want_s, want_i = pq_adc_oracle(lut, codes, k=10)
    s, i = pq_flat_topk(jnp.asarray(lut), jnp.asarray(codes), 10, codec.ksub)
    overlap = np.mean(
        [
            len(set(i[q].tolist()) & set(want_i[q].tolist())) / 10.0
            for q in range(i.shape[0])
        ]
    )
    assert overlap >= 0.9


def test_flat_topk_valid_rows_mask(codec_problem):
    _, _, queries, codec, codes = codec_problem
    lut = codec.lut(queries)
    n = codes.shape[0]
    padded = np.concatenate([codes, codes[:37]])  # duplicate high scorers
    want_s, want_i = pq_adc_oracle(lut, codes, k=8)
    s, i = pq_flat_topk(
        jnp.asarray(lut), jnp.asarray(padded), 8, codec.ksub,
        valid_rows=n, exact=True,
    )
    assert np.asarray(i).max() < n
    assert_topk_set_equal(np.asarray(s), np.asarray(i), want_s, want_i)


def test_flat_topk_k_exceeds_corpus(codec_problem):
    _, _, queries, codec, codes = codec_problem
    lut = codec.lut(queries)
    small = codes[:6]
    s, i = pq_flat_topk(
        jnp.asarray(lut), jnp.asarray(small), 9, codec.ksub, exact=True
    )
    s, i = np.asarray(s), np.asarray(i)
    assert s.shape == (9, 9) and np.all(i[:, 6:] == -1)
    assert np.all(s[:, 6:] == NEG_INF)
    want_s, want_i = pq_adc_oracle(lut, small, k=6)
    assert_topk_set_equal(s[:, :6], i[:, :6], want_s, want_i)


def test_pq8_recall_against_float_search():
    # end-to-end quality on clustered data. Within-cluster neighbors sit
    # closer than the reconstruction error, so direct top-10 overlap is
    # moderate by nature — the serving contract is CANDIDATE recall: the
    # exact top-10 must surface inside a wider ADC candidate list, where a
    # rescoring pass (ops/quant.py::rescore_candidates, FAISS
    # IndexRefineFlat) recovers exact ranking.
    rng = np.random.RandomState(11)
    passages = clustered(rng, n=3000, d=64, n_clusters=40)
    queries = clustered(rng, n=12, d=64, n_clusters=40)
    codec = PQCodec.fit(passages, m=16, nbits=8, iters=10, seed=5)
    codes = codec.encode(passages)
    lut = codec.lut(queries)
    _, want_i = topk_oracle(queries, passages, 10)

    def overlap(k_cand):
        _, i = pq_flat_topk(
            jnp.asarray(lut), jnp.asarray(codes), k_cand, codec.ksub
        )
        i = np.asarray(i)
        return np.mean(
            [
                len(set(i[q].tolist()) & set(want_i[q].tolist())) / 10.0
                for q in range(12)
            ]
        )

    assert overlap(10) >= 0.35
    assert overlap(50) >= 0.85  # rescore_factor=5 recovers exact ranking


# ---------------------------------------------------------------------------
# OPQ rotation
# ---------------------------------------------------------------------------
def correlated(rng, n=2000, d=32):
    # strongly anisotropic data: raw subspace splits cut across the
    # principal axes, the OPQ rotation re-aligns them
    z = rng.randn(n, d).astype(np.float32)
    mix = rng.randn(d, d).astype(np.float32)
    scales = np.logspace(0, -1.5, d).astype(np.float32)
    return (z * scales[None, :]) @ mix


def test_opq_reduces_reconstruction_error():
    rng = np.random.RandomState(31)
    x = correlated(rng)
    plain = PQCodec.fit(x, m=8, nbits=4, iters=10, seed=3)
    opq = PQCodec.fit(x, m=8, nbits=4, iters=10, seed=3, opq_iters=8)
    assert opq.rotation is not None
    # orthogonality
    np.testing.assert_allclose(
        opq.rotation @ opq.rotation.T, np.eye(32), atol=1e-4
    )
    mse_plain = ((plain.decode(plain.encode(x)) - x) ** 2).mean()
    mse_opq = ((opq.decode(opq.encode(x)) - x) ** 2).mean()
    assert mse_opq < 0.9 * mse_plain, (mse_opq, mse_plain)


def test_opq_scores_approximate_original_ips():
    # <xR, qR> == <x, q>: ADC scores approximate ORIGINAL inner products
    rng = np.random.RandomState(33)
    x = correlated(rng, n=1500)
    q = correlated(rng, n=6)
    codec = PQCodec.fit(x, m=8, nbits=8, iters=8, seed=1, opq_iters=5)
    codes = codec.encode(x)
    lut = codec.lut(q)
    s, i = pq_adc_oracle(lut, codes, 5)
    true = q @ x.T
    got_true = np.take_along_axis(true, i.astype(np.int64), axis=1)
    err = np.abs(s - got_true) / (np.abs(true).max() + 1e-9)
    assert err.max() < 0.25, err.max()


def test_opq_persistence_roundtrip(tmp_path):
    rng = np.random.RandomState(35)
    x = correlated(rng, n=800)
    codec = PQCodec.fit(x, m=8, nbits=4, iters=6, seed=2, opq_iters=4)
    codec.save(str(tmp_path))
    loaded = PQCodec.load(str(tmp_path))
    np.testing.assert_array_equal(loaded.rotation, codec.rotation)
    np.testing.assert_array_equal(loaded.encode(x[:64]), codec.encode(x[:64]))
    np.testing.assert_allclose(loaded.lut(x[:4]), codec.lut(x[:4]))


# ---------------------------------------------------------------------------
# packed pq4 codes
# ---------------------------------------------------------------------------
def test_pack_unpack_roundtrip_and_validation():
    from convdr_tpu.ops.pq import (
        pack_codes_4bit,
        unpack_codes_4bit,
        unpack_codes_4bit_dev,
    )

    rng = np.random.RandomState(5)
    codes = rng.randint(0, 16, size=(37, 8)).astype(np.uint8)
    packed = pack_codes_4bit(codes)
    assert packed.shape == (37, 4)
    np.testing.assert_array_equal(unpack_codes_4bit(packed), codes)
    np.testing.assert_array_equal(
        np.asarray(unpack_codes_4bit_dev(jnp.asarray(packed))), codes
    )
    with pytest.raises(ValueError, match="4 bits"):
        pack_codes_4bit(np.full((2, 4), 16, np.uint8))
    with pytest.raises(ValueError, match="even"):
        pack_codes_4bit(np.zeros((2, 5), np.uint8))


@pytest.mark.parametrize("block_rows", [1 << 18, 256])
def test_flat_topk_packed_matches_unpacked(codec_problem, block_rows):
    """Packed nibble codes produce bit-identical results to unpacked
    (same ADC scores, same selection) at half the code bytes."""
    from convdr_tpu.ops.pq import pack_codes_4bit

    _, _, queries, codec, codes = codec_problem
    lut = jnp.asarray(codec.lut(queries))
    s_u, i_u = pq_flat_topk(
        lut, jnp.asarray(codes), 20, codec.ksub, block_rows=block_rows
    )
    s_p, i_p = pq_flat_topk(
        lut,
        jnp.asarray(pack_codes_4bit(codes)),
        20,
        codec.ksub,
        block_rows=block_rows,
        packed=True,
    )
    np.testing.assert_array_equal(np.asarray(s_u), np.asarray(s_p))
    np.testing.assert_array_equal(np.asarray(i_u), np.asarray(i_p))


def test_flat_topk_packed_rejects_pq8(codec_problem):
    _, _, queries, codec, codes = codec_problem
    lut = jnp.zeros((2, 8, 256), jnp.float32)
    with pytest.raises(ValueError, match="nbits=4 only"):
        pq_flat_topk(lut, jnp.asarray(codes[:, :4]), 5, 256, packed=True)


def test_opq_lifts_candidate_recall_on_correlated_data():
    """The round-4 real-embedding finding, as a contract: on CORRELATED
    data (learned-encoder-like geometry) the OPQ rotation must lift pq4
    candidate recall, not just reconstruction error (measured on real
    rehearsal embeddings: flat pq4 recall@100 0.186 -> 0.556, PARITY.md
    'ANN recall on real encoder embeddings')."""
    rng = np.random.RandomState(41)
    x = correlated(rng, n=2500)
    q = correlated(rng, n=24)[:16]
    k = 10
    _, exact_i = topk_oracle(q.astype(np.float32), x.astype(np.float32), k)

    def recall(codec):
        codes = codec.encode(x)
        _, i = pq_adc_oracle(codec.lut(q), codes, k)
        return np.mean([
            len(set(i[r]) & set(exact_i[r])) / k for r in range(q.shape[0])
        ])

    plain = recall(PQCodec.fit(x, m=8, nbits=4, iters=10, seed=3))
    opq = recall(PQCodec.fit(x, m=8, nbits=4, iters=10, seed=3, opq_iters=6))
    assert opq >= plain + 0.05, (plain, opq)
