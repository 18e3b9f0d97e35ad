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
