import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convdr_tpu.ops.exact_search import (
    NEG_INF,
    flat_ip_topk,
    merge_topk,
    topk_oracle,
)
from convdr_tpu.parallel.mesh import get_mesh, pad_to_multiple
from convdr_tpu.parallel.sharded_search import sharded_flat_ip_topk


def random_problem(rng, q=7, n=500, d=32):
    queries = rng.randn(q, d).astype(np.float32)
    passages = rng.randn(n, d).astype(np.float32)
    return queries, passages


def test_oracle_basic(rng):
    q, p = random_problem(rng)
    s, i = topk_oracle(q, p, 10)
    assert s.shape == (7, 10) and i.shape == (7, 10)
    # descending scores
    assert np.all(np.diff(s, axis=1) <= 0)
    # matches brute force
    full = q @ p.T
    np.testing.assert_allclose(s[0], np.sort(full[0])[::-1][:10], rtol=1e-6)


def test_oracle_tie_break_low_index():
    q = np.ones((1, 4), np.float32)
    p = np.zeros((6, 4), np.float32)
    p[2] = 1.0
    p[4] = 1.0  # same score as row 2
    s, i = topk_oracle(q, p, 3)
    assert i[0, 0] == 2 and i[0, 1] == 4


def test_oracle_k_exceeds_n():
    q = np.ones((2, 4), np.float32)
    p = np.ones((3, 4), np.float32)
    s, i = topk_oracle(q, p, 5)
    assert i.shape == (2, 5)
    assert list(i[0, 3:]) == [-1, -1]
    assert s[0, 3] == NEG_INF


@pytest.mark.parametrize("block_rows", [64, 128, 500, 1000])
def test_flat_ip_matches_oracle(rng, block_rows):
    q, p = random_problem(rng, q=5, n=500)
    os_, oi = topk_oracle(q, p, 25)
    s, i = flat_ip_topk(jnp.asarray(q), jnp.asarray(p), 25, block_rows=block_rows)
    np.testing.assert_array_equal(np.asarray(i), oi)
    np.testing.assert_allclose(np.asarray(s), os_, rtol=1e-5)


def test_flat_ip_tie_break(rng):
    q = np.ones((1, 8), np.float32)
    p = np.zeros((300, 8), np.float32)
    for idx in (5, 64, 130, 290):
        p[idx] = 1.0
    s, i = flat_ip_topk(jnp.asarray(q), jnp.asarray(p), 4, block_rows=128)
    assert list(np.asarray(i)[0]) == [5, 64, 130, 290]


def test_flat_ip_valid_rows(rng):
    """Padding rows (zeros) must never enter the top-k."""
    q, p = random_problem(rng, q=3, n=100)
    padded = np.concatenate([p, np.zeros((28, p.shape[1]), np.float32)])
    os_, oi = topk_oracle(q, p, 100)
    s, i = flat_ip_topk(jnp.asarray(q), jnp.asarray(padded), 100, block_rows=64,
                        valid_rows=100)
    np.testing.assert_array_equal(np.asarray(i), oi)


def test_flat_ip_bf16_storage(rng):
    """bf16 storage with fp32 accumulation: ranks close to fp32 oracle."""
    q, p = random_problem(rng, q=4, n=400, d=64)
    s32, i32 = topk_oracle(q, p, 10)
    s, i = flat_ip_topk(
        jnp.asarray(q), jnp.asarray(p, dtype=jnp.bfloat16), 10, block_rows=128
    )
    # bf16 rounding perturbs scores; top-1 should still overlap strongly
    overlap = np.mean([
        len(set(np.asarray(i)[r]) & set(i32[r])) / 10 for r in range(4)
    ])
    assert overlap > 0.7


def test_merge_topk_prefers_first_list():
    s_a = jnp.asarray([[5.0, 3.0]])
    i_a = jnp.asarray([[10, 11]], dtype=jnp.int32)
    s_b = jnp.asarray([[5.0, 4.0]])
    i_b = jnp.asarray([[20, 21]], dtype=jnp.int32)
    s, i = merge_topk(s_a, i_a, s_b, i_b, 3)
    assert list(np.asarray(i)[0]) == [10, 20, 21]
    assert list(np.asarray(s)[0]) == [5.0, 5.0, 4.0]


def test_sharded_matches_oracle(rng):
    mesh = get_mesh(("index",))
    n_dev = mesh.shape["index"]
    q, p = random_problem(rng, q=6, n=333, d=32)
    n_pad = pad_to_multiple(333, n_dev)
    padded = np.concatenate([p, np.zeros((n_pad - 333, 32), np.float32)])
    os_, oi = topk_oracle(q, p, 50)
    s, i = sharded_flat_ip_topk(
        mesh, jnp.asarray(q), jnp.asarray(padded), 50,
        valid_rows=333, block_rows=64,
    )
    np.testing.assert_array_equal(np.asarray(i), oi)
    np.testing.assert_allclose(np.asarray(s), os_, rtol=1e-5)


def test_sharded_tie_break_across_shards(rng):
    mesh = get_mesh(("index",))
    n_dev = mesh.shape["index"]
    if n_dev < 2:
        pytest.skip("needs >= 2 devices")
    n = n_dev * 16
    q = np.ones((1, 8), np.float32)
    p = np.zeros((n, 8), np.float32)
    # equal winners on shard 0 and the last shard
    p[3] = 1.0
    p[n - 5] = 1.0
    s, i = sharded_flat_ip_topk(mesh, jnp.asarray(q), jnp.asarray(p), 2)
    assert list(np.asarray(i)[0]) == [3, n - 5]


def test_sharded_k_larger_than_shard(rng):
    """k greater than rows-per-shard still returns global top-k."""
    mesh = get_mesh(("index",))
    n_dev = mesh.shape["index"]
    n = n_dev * 8  # 8 rows per shard < k
    q, p = random_problem(rng, q=2, n=n, d=16)
    os_, oi = topk_oracle(q, p, 20)
    s, i = sharded_flat_ip_topk(mesh, jnp.asarray(q), jnp.asarray(p), 20)
    # slots beyond n are -1-padded in both
    np.testing.assert_array_equal(np.asarray(i), oi)


def test_invalid_precision_raises_clearly():
    import numpy as np
    import pytest

    from convdr_tpu.ops.exact_search import flat_ip_topk

    q = np.ones((2, 8), np.float32)
    p = np.ones((16, 8), np.float32)
    with pytest.raises(ValueError, match="matmul precision"):
        flat_ip_topk(q, p, 4, precision="bf16")


# ---------------------------------------------------------------------------
# recursive grouped top-k (the wide-block selection path)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("w", [100, 4095, 4097, 40000, 200001])
def test_grouped_topk_matches_lax_topk(rng, w):
    """Values AND indices must equal lax.top_k exactly (stable tie order),
    across widths that exercise 0, 1, and 2+ recursion levels."""
    from convdr_tpu.ops.exact_search import grouped_topk_last_axis

    x = jnp.asarray(rng.randn(5, w).astype(np.float32))
    ref_s, ref_i = jax.lax.top_k(x, 100)
    got_s, got_i = grouped_topk_last_axis(x, 100, group=32)
    assert np.array_equal(np.asarray(got_s), np.asarray(ref_s))
    assert np.array_equal(np.asarray(got_i), np.asarray(ref_i))


@pytest.mark.parametrize("group", [32, 128])
def test_grouped_topk_tie_storm(rng, group):
    """Massive exact ties (scores drawn from 4 distinct values): the pruned
    selection must keep lax.top_k's lower-index-first order bit-for-bit."""
    from convdr_tpu.ops.exact_search import grouped_topk_last_axis

    x = jnp.asarray(
        rng.randint(0, 4, size=(4, 50000)).astype(np.float32)
    )
    ref_s, ref_i = jax.lax.top_k(x, 128)
    got_s, got_i = grouped_topk_last_axis(x, 128, group=group)
    assert np.array_equal(np.asarray(got_s), np.asarray(ref_s))
    assert np.array_equal(np.asarray(got_i), np.asarray(ref_i))


def test_grouped_topk_boundary_ties(rng):
    """Tied group maxima straddling the selection cut must resolve to the
    lower global index (the reference's first-block-wins rule scaled down)."""
    from convdr_tpu.ops.exact_search import grouped_topk_last_axis

    w, k = 20000, 7
    x = np.full((1, w), -1.0, np.float32)
    # k+3 copies of the same max score scattered across groups
    pos = np.asarray([5, 31, 32, 63, 9000, 9001, 12800, 19998, 19999])
    x[0, pos] = 3.5
    ref_s, ref_i = jax.lax.top_k(jnp.asarray(x), k)
    got_s, got_i = grouped_topk_last_axis(jnp.asarray(x), k, group=32)
    assert np.array_equal(np.asarray(got_s), np.asarray(ref_s))
    assert np.array_equal(np.asarray(got_i), np.asarray(ref_i))


def test_flat_ip_large_block_matches_oracle(rng):
    """End-to-end: a block wide enough to trigger recursive selection."""
    queries = rng.randn(4, 24).astype(np.float32)
    passages = rng.randn(150000, 24).astype(np.float32)
    s, i = flat_ip_topk(jnp.asarray(queries), jnp.asarray(passages), 50,
                        block_rows=150000)
    os_, oi = topk_oracle(queries, passages, 50)
    assert np.array_equal(np.asarray(i), oi)
    assert np.allclose(np.asarray(s), os_, atol=2e-5)


def test_flat_ip_topk_unrolled_vs_scan_boundary(rng):
    """Block counts on both sides of the static-unroll boundary (<=8
    unrolls, >8 scans) produce identical, oracle-exact results."""
    import jax.numpy as jnp

    from convdr_tpu.ops.exact_search import flat_ip_topk, topk_oracle

    q = rng.randn(6, 16).astype(np.float32)
    p = rng.randn(2560, 16).astype(np.float32)
    os_, oi = topk_oracle(q, p, 7)
    for block_rows in (320, 256):  # 8 blocks (unroll) / 10 blocks (scan)
        s, i = flat_ip_topk(
            jnp.asarray(q), jnp.asarray(p), 7, block_rows=block_rows
        )
        np.testing.assert_array_equal(np.asarray(i), oi)
        np.testing.assert_allclose(np.asarray(s), os_, rtol=1e-5)


def test_k_exceeds_twice_block_rows_unrolled(rng):
    """k > 2*block_rows on the static-unroll path (2-8 blocks): the first
    block's result must widen to k_eff before merging, or merge_topk's
    lax.top_k(cat, k_eff) sees cat < k_eff and crashes (round-3 review)."""
    q = rng.randn(3, 16).astype(np.float32)
    p = rng.randn(2560, 16).astype(np.float32)
    s, i = flat_ip_topk(jnp.asarray(q), jnp.asarray(p), 700, block_rows=320)
    scores = q @ p.T
    oracle = np.sort(scores, axis=1)[:, ::-1][:, :700]
    np.testing.assert_allclose(np.asarray(s), oracle, rtol=1e-5)
    # every returned index valid and unique per row
    ii = np.asarray(i)
    assert (ii >= 0).all()
    assert all(len(set(ii[r])) == 700 for r in range(3))
