"""Embedding block storage: the retrieval shards on disk.

Byte-compatible with the reference's block files
(/root/reference/utils/util.py:108-111 writes
``{prefix}_data_obj_{rank}.pb`` pickles; gen_passage_embeddings.py:156-167
uses prefixes ``passage__emb_p_`` / ``passage__embid_p_``;
run_convdr_inference.py:163-175 reads blocks 0..7 until one is missing).
A block is a pair:

  * ``passage__emb_p__data_obj_{b}.pb``   -- pickled float32 [N_b, E]
  * ``passage__embid_p__data_obj_{b}.pb`` -- pickled int64  [N_b] token-cache
    offsets (NOT pids; offset -> pid goes through offset2pid at eval time,
    run_convdr_inference.py:59)

On TPU these blocks are produced by the sharded embedding pipeline (one per
data shard by default) and consumed by :class:`~convdr_tpu.retrieval.searcher.
BlockedSearcher`, which streams them through HBM.
"""

from __future__ import annotations

import os
import pickle
from typing import Iterator, Optional, Tuple

import numpy as np

EMB_PREFIX = "passage__emb_p_"
EMBID_PREFIX = "passage__embid_p_"
NATIVE_TEMPLATE = "passage_block_{block_id}.cnb"


def _block_path(data_dir: str, prefix: str, block_id: int) -> str:
    return os.path.join(data_dir, f"{prefix}_data_obj_{block_id}.pb")


def _native_path(data_dir: str, block_id: int) -> str:
    return os.path.join(data_dir, NATIVE_TEMPLATE.format(block_id=block_id))


def write_embedding_block(
    data_dir: str,
    block_id: int,
    embeddings: np.ndarray,
    offsets: np.ndarray,
    *,
    emb_prefix: str = EMB_PREFIX,
    embid_prefix: str = EMBID_PREFIX,
    fmt: str = "pickle",
) -> None:
    """fmt="pickle" writes reference-compatible files; fmt="native" writes
    one .cnb file via the C++ block store (faster load on the serving path).

    Embedding dtype is preserved for f32/bf16/int8 in BOTH formats (bf16
    storage halves disk + HBM for capacity-mode search, int8 quarters it —
    SearchConfig.storage_dtype; int8 blocks pair with the int8_scales.npy
    sidecar from ops/quant.py); float64 is downcast to the reference's
    float32.
    """
    os.makedirs(data_dir, exist_ok=True)
    emb = np.asarray(embeddings)
    if emb.dtype == np.float64:
        emb = emb.astype(np.float32)
    if fmt == "native":
        from convdr_tpu.native_io import write_native_block

        write_native_block(
            _native_path(data_dir, block_id),
            emb,
            np.asarray(offsets, np.int64),
        )
        return
    with open(_block_path(data_dir, emb_prefix, block_id), "wb") as f:
        pickle.dump(emb, f, protocol=4)
    with open(_block_path(data_dir, embid_prefix, block_id), "wb") as f:
        pickle.dump(np.asarray(offsets), f, protocol=4)


def load_embedding_block(
    data_dir: str,
    block_id: int,
    *,
    emb_prefix: str = EMB_PREFIX,
    embid_prefix: str = EMBID_PREFIX,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    native = _native_path(data_dir, block_id)
    if os.path.exists(native):
        from convdr_tpu.native_io import read_native_block

        return read_native_block(native)
    emb_path = _block_path(data_dir, emb_prefix, block_id)
    id_path = _block_path(data_dir, embid_prefix, block_id)
    if not (os.path.exists(emb_path) and os.path.exists(id_path)):
        return None
    with open(emb_path, "rb") as f:
        emb = pickle.load(f)
    with open(id_path, "rb") as f:
        ids = pickle.load(f)
    return np.asarray(emb), np.asarray(ids)


def iter_embedding_blocks(
    data_dir: str,
    *,
    max_blocks: Optional[int] = None,
    emb_prefix: str = EMB_PREFIX,
    embid_prefix: str = EMBID_PREFIX,
) -> Iterator[Tuple[int, np.ndarray, np.ndarray]]:
    """Yield consecutive blocks starting at 0; stop at the first gap
    (reference semantics, run_convdr_inference.py:176-177). No implicit
    block-count cap: the writer may emit one block per data shard."""
    b = 0
    while max_blocks is None or b < max_blocks:
        blk = load_embedding_block(
            data_dir, b, emb_prefix=emb_prefix, embid_prefix=embid_prefix
        )
        if blk is None:
            break
        yield b, blk[0], blk[1]
        b += 1
