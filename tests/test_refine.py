"""Candidate-proportional refinement (retrieval/refine.py).

The contract under test: RefineStore gathers ONLY candidate rows (random
access into native .cnb blocks and into reference-format pickle blocks via
the located payload offset) and produces BIT-IDENTICAL outputs to the
one-pass streaming rescores (`IVFIndex.rescore_block_pass`,
`PQIndex.rescore_block_pass`) — FAISS IndexRefineFlat resident-vector
semantics (/root/reference/drivers/run_convdr_inference.py:353) at
O(candidates) disk cost.
"""

import os
import pickle

import ml_dtypes
import numpy as np
import pytest

from convdr_tpu.native_io import gather_file_rows
from convdr_tpu.ops.quant import Int8Quantizer
from convdr_tpu.retrieval.blocks import (
    _block_path,
    EMB_PREFIX,
    write_embedding_block,
)
from convdr_tpu.retrieval.ivf import IVFIndex
from convdr_tpu.retrieval.refine import RefineStore, locate_pickle_payload


def _rng(seed=0):
    return np.random.Generator(np.random.PCG64(seed))


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
def test_locate_pickle_payload_all_dtypes(tmp_path, dtype):
    """The located payload offset memmaps to exactly the pickled array."""
    rng = _rng(7)
    x = rng.standard_normal((137, 24), dtype=np.float32)
    if dtype == "bfloat16":
        x = x.astype(ml_dtypes.bfloat16)
    elif dtype == "int8":
        x = (x * 10).astype(np.int8)
    d = str(tmp_path / "blocks")
    write_embedding_block(d, 0, x, np.arange(137, dtype=np.int64))
    path = _block_path(d, EMB_PREFIX, 0)
    off, found_dtype = locate_pickle_payload(path, 137, 24)
    assert found_dtype == x.dtype
    mm = np.memmap(path, dtype=x.dtype, mode="r", offset=off, shape=x.shape)
    np.testing.assert_array_equal(np.asarray(mm), x)


def test_locate_pickle_payload_tiny_block(tmp_path):
    """< 256-byte payloads serialize as SHORT_BINBYTES and still locate."""
    x = _rng(1).standard_normal((4, 8), dtype=np.float32).astype(np.int8)
    d = str(tmp_path / "tiny")
    write_embedding_block(d, 0, x, np.arange(4, dtype=np.int64))
    off, dt = locate_pickle_payload(_block_path(d, EMB_PREFIX, 0), 4, 8)
    assert dt == np.int8
    mm = np.memmap(
        _block_path(d, EMB_PREFIX, 0), dtype=np.int8, mode="r",
        offset=off, shape=(4, 8),
    )
    np.testing.assert_array_equal(np.asarray(mm), x)


def test_locate_pickle_payload_rejects_non_pickle(tmp_path):
    p = str(tmp_path / "junk.pb")
    with open(p, "wb") as f:
        f.write(os.urandom(4096))
    with pytest.raises(ValueError, match="no contiguous numpy payload"):
        locate_pickle_payload(p, 17, 24)


def test_gather_file_rows_native_matches_fallback(tmp_path, monkeypatch):
    """The C++ pread gather and the memmap fallback return the same
    bytes, for contiguous runs and scattered rows alike."""
    import convdr_tpu.native_io as nio

    rng = _rng(3)
    x = rng.standard_normal((500, 32), dtype=np.float32)
    d = str(tmp_path / "nb")
    os.makedirs(d)
    path = os.path.join(d, "blk.cnb")
    nio.write_native_block(path, x, np.arange(500, dtype=np.int64))
    idx = np.concatenate(
        [np.arange(40, 80), rng.choice(500, 60, replace=False)]
    ).astype(np.int64)
    got = gather_file_rows(path, 32, np.dtype(np.float32), 32, idx)
    np.testing.assert_array_equal(got, x[idx])
    if nio.native_available():
        monkeypatch.setattr(nio, "_lib", None)
        monkeypatch.setattr(nio, "_tried", True)
        fallback = gather_file_rows(path, 32, np.dtype(np.float32), 32, idx)
        np.testing.assert_array_equal(fallback, x[idx])


def _blocks_with_duplicates(tmp_path, dtype, fmt, n=240, dim=16, seed=5):
    """3 block files; offsets are even doc ids, each doc has 1-2 chunk
    rows (multi-chunk FirstP), rows shuffled across blocks."""
    rng = _rng(seed)
    docs = np.arange(n // 2, dtype=np.int64) * 2 + 11
    offsets = np.concatenate([docs, docs[:: 3]])  # every 3rd doc 2-chunk
    rng.shuffle(offsets)
    x = rng.standard_normal((offsets.shape[0], dim), dtype=np.float32)
    d = str(tmp_path / f"blk_{dtype}_{fmt}")
    quant = None
    if dtype == "int8":
        quant = Int8Quantizer.fit(x)
        stored = quant.quantize_passages(x)
    elif dtype == "bfloat16":
        stored = x.astype(ml_dtypes.bfloat16)
    else:
        stored = x
    for b in range(3):
        write_embedding_block(d, b, stored[b::3], offsets[b::3], fmt=fmt)
    if quant is not None:
        quant.save(d)
    return d, x, offsets, docs


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
@pytest.mark.parametrize("fmt", ["pickle", "native"])
def test_refine_by_value_bit_identical_to_streaming(tmp_path, dtype, fmt):
    """RefineStore.refine_by_value == IVFIndex.rescore_block_pass bit for
    bit — scores AND ids — across storage dtypes, block formats, and
    multi-chunk duplicate rowids."""
    d, x, offsets, docs = _blocks_with_duplicates(tmp_path, dtype, fmt)
    dim = x.shape[1]
    idx = IVFIndex.build(
        x, 4, rowids=offsets.astype(np.int32), iters=4, seed=0
    )
    rng = _rng(9)
    q = rng.standard_normal((6, dim), dtype=np.float32)
    _s, cand = idx.search(q, 50, nprobe=idx.nlist)
    s_stream, i_stream = idx.rescore_block_pass(d, q, cand, 10)
    store = RefineStore.open(d, dim)
    s_ref, i_ref = store.refine_by_value(q, cand, 10)
    np.testing.assert_array_equal(s_ref, s_stream)
    np.testing.assert_array_equal(i_ref, i_stream)
    # the dispatching method picks the random-access path transparently
    s_m, i_m = idx.rescore(d, q, cand, 10)
    np.testing.assert_array_equal(s_m, s_stream)
    np.testing.assert_array_equal(i_m, i_stream)


def test_refine_by_value_missing_rowid_raises(tmp_path):
    d, x, offsets, _docs = _blocks_with_duplicates(
        tmp_path, "float32", "pickle"
    )
    store = RefineStore.open(d, x.shape[1])
    q = _rng(2).standard_normal((2, x.shape[1]), dtype=np.float32)
    cand = np.array([[offsets[0], 999999], [offsets[1], -1]], np.int64)
    with pytest.raises(ValueError, match="never appeared"):
        store.refine_by_value(q, cand, 2)
    with pytest.raises(FileNotFoundError):
        RefineStore.open(str(tmp_path / "nothing"), x.shape[1])


@pytest.mark.parametrize("fmt", ["pickle", "native"])
def test_refine_positional_bit_identical_to_streaming(tmp_path, fmt):
    """RefineStore.refine_positional == PQIndex.rescore_block_pass bit for
    bit; PQIndex.rescore dispatches to it and maps positions to rowids."""
    from convdr_tpu.retrieval.pq_index import PQIndex

    rng = _rng(13)
    x = rng.standard_normal((360, 16), dtype=np.float32)
    offsets = np.arange(360, dtype=np.int64) * 3 + 7
    d = str(tmp_path / f"pqblk_{fmt}")
    for b in range(3):
        write_embedding_block(d, b, x[b::3], offsets[b::3], fmt=fmt)
    idx = PQIndex.build_from_blocks(d, m=8, nbits=4, iters=5, seed=0)
    q = rng.standard_normal((5, 16), dtype=np.float32)
    from convdr_tpu.ops.pq import pq_flat_topk
    import jax.numpy as jnp

    lut = jnp.asarray(idx.codec.lut(q))
    _, pos = pq_flat_topk(lut, idx._device_codes(), 40, idx.codec.ksub,
                          packed=idx.packed)
    pos = np.asarray(pos)
    s_stream, i_stream = idx.rescore_block_pass(d, q, pos, 10)
    store = RefineStore.open(d, 16)
    s_ref, p_ref = store.refine_positional(
        q, pos, 10, block_sizes=idx.stats["block_sizes"]
    )
    np.testing.assert_array_equal(s_ref, s_stream)
    ids = np.where(p_ref >= 0, idx.rowids[np.clip(p_ref, 0, None)], -1)
    np.testing.assert_array_equal(ids.astype(np.int32), i_stream)
    s_m, i_m = idx.rescore(d, q, pos, 10)
    np.testing.assert_array_equal(s_m, s_stream)
    np.testing.assert_array_equal(i_m, i_stream)


def test_refine_positional_layout_mismatch_raises(tmp_path):
    rng = _rng(17)
    x = rng.standard_normal((60, 8), dtype=np.float32)
    d = str(tmp_path / "layout")
    write_embedding_block(d, 0, x, np.arange(60, dtype=np.int64))
    store = RefineStore.open(d, 8)
    q = rng.standard_normal((1, 8), dtype=np.float32)
    with pytest.raises(ValueError, match="do not match"):
        store.refine_positional(
            q, np.array([[0, 1]], np.int64), 2, block_sizes=[30, 30]
        )


def test_refine_int8_positional_dequantizes(tmp_path):
    """PQ-contract refinement over int8 blocks goes through the scales
    sidecar (same SQ8 dequant as the by-value contract)."""
    from convdr_tpu.retrieval.refine import rank_candidate_tail

    rng = _rng(23)
    x = rng.standard_normal((90, 8), dtype=np.float32)
    quant = Int8Quantizer.fit(x)
    d = str(tmp_path / "i8pos")
    write_embedding_block(
        d, 0, quant.quantize_passages(x), np.arange(90, dtype=np.int64)
    )
    quant.save(d)
    store = RefineStore.open(d, 8)
    q = rng.standard_normal((2, 8), dtype=np.float32)
    pos = np.tile(np.arange(20, dtype=np.int64), (2, 1))
    s, p = store.refine_positional(q, pos, 5)
    deq = quant.quantize_passages(x).astype(np.float32) * quant.scales
    want = np.einsum("cd,qd->qc", deq[:20], q)
    ws, wp = rank_candidate_tail(
        want.astype(np.float32), pos, 5
    )
    np.testing.assert_array_equal(s, ws)
    np.testing.assert_array_equal(p, wp)


def test_locate_pickle_payload_large_probe(tmp_path):
    """Probing a dtype whose payload would exceed 4 GiB must skip the
    u32 BINBYTES prefix (struct.pack('<I') raises above 2**32-1) instead
    of crashing — 38M-scale bf16 blocks hit this via the f32 probe."""
    from convdr_tpu.retrieval.refine import locate_pickle_payload

    p = tmp_path / "x.pb"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError):
        locate_pickle_payload(str(p), 1 << 29, 768)
