"""Pallas fused search kernel parity vs numpy oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from convdr_tpu.ops.exact_search import topk_oracle
from convdr_tpu.ops.pallas_search import (
    fused_scores_groupmax,
    pallas_flat_ip_topk,
)


def problem(rng, q=4, n=256, d=32):
    return (
        rng.randn(q, d).astype(np.float32),
        rng.randn(n, d).astype(np.float32),
    )


def test_fused_scores_groupmax_matches_numpy():
    q, p = problem(np.random.RandomState(11))
    scores, gmax = fused_scores_groupmax(
        jnp.asarray(q), jnp.asarray(p), group=8, tile_rows=64, interpret=True
    )
    ref = q @ p.T
    np.testing.assert_allclose(np.asarray(scores), ref, rtol=1e-4, atol=1e-4)
    ref_g = ref.reshape(4, 256 // 8, 8).max(axis=-1)
    np.testing.assert_allclose(np.asarray(gmax), ref_g, rtol=1e-4, atol=1e-4)


def test_fused_rejects_bad_tiling(rng):
    q, p = problem(rng, n=100)
    with pytest.raises(ValueError):
        fused_scores_groupmax(
            jnp.asarray(q), jnp.asarray(p), tile_rows=64, interpret=True
        )


def test_pallas_topk_matches_oracle(rng):
    q, p = problem(rng, q=5, n=512, d=16)
    os_, oi = topk_oracle(q, p, 20)
    s, i = pallas_flat_ip_topk(
        jnp.asarray(q), jnp.asarray(p), 20, group=8, tile_rows=64,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(i), oi)
    np.testing.assert_allclose(np.asarray(s), os_, rtol=1e-5)


def test_pallas_topk_padding_and_valid_rows(rng):
    q, p = problem(rng, q=3, n=200, d=16)  # 200 % 64 != 0 -> padded
    os_, oi = topk_oracle(q, p, 50)
    s, i = pallas_flat_ip_topk(
        jnp.asarray(q), jnp.asarray(p), 50, group=8, tile_rows=64,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(i), oi)


def test_pallas_topk_tie_break(rng):
    q = np.ones((1, 8), np.float32)
    p = np.zeros((128, 8), np.float32)
    for idx in (3, 64, 100):
        p[idx] = 1.0
    s, i = pallas_flat_ip_topk(
        jnp.asarray(q), jnp.asarray(p), 3, group=8, tile_rows=64,
        interpret=True,
    )
    assert list(np.asarray(i)[0]) == [3, 64, 100]


def test_pallas_topk_k_exceeds_n(rng):
    q, p = problem(rng, q=2, n=64, d=8)
    s, i = pallas_flat_ip_topk(
        jnp.asarray(q), jnp.asarray(p), 80, group=8, tile_rows=64,
        interpret=True,
    )
    assert i.shape == (2, 80)
    assert np.all(np.asarray(i)[:, 64:] == -1)


# ---------------------------------------------------------------------------
# streaming path (scores never materialized)
# ---------------------------------------------------------------------------
def test_streaming_groupmax_matches_numpy(rng):
    from convdr_tpu.ops.pallas_search import streaming_groupmax

    q, p = problem(rng, q=4, n=512, d=32)
    gmax = np.asarray(streaming_groupmax(
        jnp.asarray(q), jnp.asarray(p), group=16, tile_rows=64, interpret=True
    ))
    ref = (q @ p.T).reshape(4, 512 // 16, 16).max(-1)
    np.testing.assert_allclose(gmax, ref, rtol=1e-5)


def test_extract_candidate_scores_exact(rng):
    from convdr_tpu.ops.pallas_search import extract_candidate_scores

    q, p = problem(rng, q=8, n=512, d=32)
    group, kg = 16, 5
    gsel = np.sort(
        np.stack([
            rng.choice(512 // group, size=kg, replace=False) for _ in range(8)
        ]).astype(np.int32), axis=1,
    )
    cand = np.asarray(extract_candidate_scores(
        jnp.asarray(q), jnp.asarray(p), jnp.asarray(gsel),
        group=group, tile_rows=64, query_tile=4, interpret=True,
    ))
    full = q @ p.T
    for r in range(8):
        for j in range(kg):
            g = gsel[r, j]
            np.testing.assert_allclose(
                cand[r, j], full[r, g * group:(g + 1) * group], rtol=1e-5
            )


@pytest.mark.parametrize("n,valid", [(640, -1), (600, 555)])
def test_streaming_topk_matches_oracle(rng, n, valid):
    from convdr_tpu.ops.pallas_search import streaming_flat_ip_topk

    q, p = problem(rng, q=6, n=n, d=32)
    n_valid = n if valid < 0 else valid
    os_, oi = topk_oracle(q, p[:n_valid], 37)
    s, i = streaming_flat_ip_topk(
        jnp.asarray(q), jnp.asarray(p), 37,
        group=16, tile_rows=64, query_tile=4, valid_rows=valid,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(i), oi)
    np.testing.assert_allclose(np.asarray(s), os_, rtol=1e-5)


def test_streaming_topk_tie_break(rng):
    from convdr_tpu.ops.pallas_search import streaming_flat_ip_topk

    q = np.ones((4, 8), np.float32)
    p = np.zeros((512, 8), np.float32)
    for idx in (5, 16, 255, 256, 400):
        p[idx] = 1.0
    s, i = streaming_flat_ip_topk(
        jnp.asarray(q), jnp.asarray(p), 5,
        group=16, tile_rows=64, query_tile=4, interpret=True,
    )
    assert list(np.asarray(i)[0]) == [5, 16, 255, 256, 400]


def test_dma_gather_groups_interpret(rng):
    """Containing-tile DMA gather == direct slicing (interpret mode)."""
    from convdr_tpu.ops.pallas_search import dma_gather_groups

    Q, B, G, K = 16, 1024, 32, 5
    scores = rng.randn(Q, B).astype(np.float32)
    gsel = rng.randint(0, B // G, size=(Q, K)).astype(np.int32)
    out = dma_gather_groups(
        jnp.asarray(scores), jnp.asarray(gsel), group=G, interpret=True
    )
    assert out.shape == (Q, K, G)
    for q in range(Q):
        for j, g in enumerate(gsel[q]):
            np.testing.assert_array_equal(
                np.asarray(out)[q, j], scores[q, g * G : (g + 1) * G]
            )


def test_dma_gather_rejects_bad_shapes(rng):
    from convdr_tpu.ops.pallas_search import dma_gather_groups

    ok_scores = jnp.zeros((16, 1024), jnp.float32)
    gsel = jnp.zeros((16, 4), jnp.int32)
    with pytest.raises(ValueError, match="multiple of the 8-row"):
        dma_gather_groups(jnp.zeros((15, 1024), jnp.float32), jnp.zeros((15, 4), jnp.int32), interpret=True)
    with pytest.raises(ValueError, match="128-lane"):
        dma_gather_groups(jnp.zeros((16, 1000), jnp.float32), gsel, interpret=True)
    with pytest.raises(ValueError, match="divide 128"):
        dma_gather_groups(ok_scores, gsel, group=48, interpret=True)
    with pytest.raises(ValueError, match="f32"):
        dma_gather_groups(ok_scores.astype(jnp.bfloat16), gsel, interpret=True)
