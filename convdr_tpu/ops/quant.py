"""Int8 scalar quantization for embedding storage (FAISS SQ8 counterpart).

The reference stores passage embeddings as float32 pickles and searches them
with FAISS ``IndexFlatIP`` (/root/reference/drivers/run_convdr_inference.py:
157-242). FAISS's capacity answer at this scale is the scalar quantizer
(``IndexScalarQuantizer(d, QT_8bit)``, optionally wrapped in
``IndexRefineFlat``); this module is the TPU-native equivalent, designed
around one v5e measurement and one arithmetic fact:

  * XLA does NOT lower ``s8 x s8 -> s32`` dots to the MXU — a native int8
    ``lax.dot_general`` measured ~1600x slower than bf16 at the search
    operating point (Q=512, 524k x 768). The fast int8 path is instead
    *storage* quantization with an in-kernel bf16 dequant: the convert
    fuses into the matmul and runs at exactly bf16-matmul speed (4.2 ms vs
    4.2 ms per 524k block) while reading 2x less HBM than bf16 and 4x less
    than f32 (and shrinking disk blocks + host->device transfers the same
    4x / 2x, which bounds the streamed capacity path).
  * Every int8 value is exactly representable in bfloat16, each product of
    two int8 values (<= 127^2 = 16129) is exactly representable too, and a
    768-term sum of such products (< 2^24) is exact in the MXU's float32
    accumulator. A *default-precision* bf16 matmul over int8-quantized
    operands is therefore bit-exact integer arithmetic: the int8 search
    needs no ``Precision.HIGHEST`` (the f32/bf16 paths' 2x-cost exactness
    lever) and carries a deterministic exactness contract — results equal
    the int32 oracle (:func:`int8_topk_oracle`) bit for bit whenever
    ``dim * 127^2 < 2^24`` (dim <= 1040; BERT-family dim is 768).

Scheme (symmetric, per-dimension, like FAISS ``QT_8bit_uniform`` per dim):

  passage p  ->  p_i8[d] = clip(round(p[d] / s[d]), -127, 127),
                 s[d] = max_rows |p[:, d]| / 127   (fit on a sample)
  query q    ->  folded = q * s;  t_q = max_d |folded[d]| / 127;
                 q_int[d] = clip(round(folded[d] / t_q), -127, 127)

  score(q, p) ~= t_q * <q_int, p_i8>

The per-dimension passage scale folds into the query side, so the device
matmul is a plain integer inner product; ``t_q`` is a per-query positive
scalar, so it never changes any query's ranking — candidate selection runs
entirely on integer-exact scores and ``t_q`` only rescales the reported
values to approximate the true inner products (run-file score columns).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

INT8_SCALES_FILENAME = "int8_scales.npy"

# dim bound for the bit-exact integer contract: dim * 127^2 < 2^24 keeps
# every partial sum exactly representable in the f32 accumulator.
INT8_EXACT_MAX_DIM = (1 << 24) // (127 * 127)


def fit_int8_scales(sample: np.ndarray) -> np.ndarray:
    """Per-dimension symmetric scales from a sample of passage embeddings.

    FAISS trains its scalar quantizer on a sample the same way
    (``IndexScalarQuantizer.train``); the embedding pipeline fits on its
    first block (an unbiased ``i % num_blocks`` round-robin shard) and
    clips later blocks' rare out-of-range values.
    """
    sample = np.asarray(sample)
    if sample.ndim != 2 or sample.shape[0] == 0:
        raise ValueError(f"need a non-empty [N, D] sample, got {sample.shape}")
    absmax = np.max(np.abs(sample.astype(np.float32)), axis=0)
    # all-zero dimensions carry no signal; scale 1 maps them to 0 safely
    return np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)


def quantize_passages(emb: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """f32/bf16 [N, D] -> int8 [N, D] with per-dimension scales (clipped)."""
    emb = np.asarray(emb, np.float32)
    q = np.rint(emb / scales[None, :])
    return np.clip(q, -127, 127).astype(np.int8)


def quantize_queries(
    queries: np.ndarray, scales: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """f32 [Q, D] -> (int-valued f32 [Q, D], per-query score scale [Q, 1]).

    The passage scales fold into the queries (see module docstring), then
    each query row quantizes with its own scalar. The integer row is
    returned as float32 so the device matmul can cast it to bf16 exactly
    (int8 device arrays would hit XLA's scalarized s8 dot instead).
    """
    q = np.asarray(queries, np.float32) * np.asarray(scales, np.float32)[None, :]
    t = np.max(np.abs(q), axis=1, keepdims=True) / 127.0
    t = np.where(t > 0, t, 1.0).astype(np.float32)
    q_int = np.clip(np.rint(q / t), -127, 127).astype(np.float32)
    return q_int, t


def int8_topk_oracle(
    q_int: np.ndarray, p_i8: np.ndarray, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact int32 oracle for the quantized search (test contract).

    Returns (integer scores as f32 [Q, k] desc, indices [Q, k] int32), ties
    broken by lower passage index — the same (score desc, index asc) order
    as :func:`convdr_tpu.ops.exact_search.topk_oracle`.
    """
    scores = q_int.astype(np.int64) @ p_i8.astype(np.int64).T
    order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    top = np.take_along_axis(scores, order, axis=1)
    return top.astype(np.float32), order.astype(np.int32)


def rescore_candidates(
    queries: np.ndarray,
    passages: np.ndarray,
    cand_idx: np.ndarray,
    k: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Re-rank quantized-search candidates with full-precision scores.

    The FAISS ``IndexRefineFlat`` step: the int8 scan proposes
    ``cand_idx`` [Q, m] rows (-1 padded), whose true float32 inner products
    are recomputed here and the top ``k`` kept. Host-side by design: the
    gather + [Q, m] batched matvec is ~150 MFLOP at serving shapes (vs GB
    of candidate-row traffic if bounced through the device), and the float
    rows live host-side anyway. Ties break by lower global index — the
    candidate rows are index-sorted before the stable final sort, so the
    output order matches :func:`convdr_tpu.ops.exact_search.topk_oracle`
    over the candidate set.
    """
    neg_inf = float(np.finfo(np.float32).min)
    q = np.asarray(queries, np.float32)
    idx = np.asarray(cand_idx, np.int64)
    key = np.where(idx >= 0, idx, np.iinfo(np.int64).max)
    ord0 = np.argsort(key, axis=1, kind="stable")
    idx = np.take_along_axis(idx, ord0, axis=1)
    cand = np.asarray(passages, np.float32)[np.clip(idx, 0, None)]  # [Q,m,D]
    s = np.matmul(cand, q[:, :, None])[:, :, 0]  # [Q, m]
    s = np.where(idx >= 0, s, neg_inf).astype(np.float32)
    kk = min(k, s.shape[1])
    sel = np.argsort(-s, axis=1, kind="stable")[:, :kk]
    out_s = np.take_along_axis(s, sel, axis=1)
    out_i = np.take_along_axis(idx, sel, axis=1).astype(np.int32)
    if kk < k:
        out_s = np.pad(out_s, ((0, 0), (0, k - kk)), constant_values=neg_inf)
        out_i = np.pad(out_i, ((0, 0), (0, k - kk)), constant_values=-1)
    out_i = np.where(out_s <= neg_inf, -1, out_i)
    return out_s, out_i


class Int8Quantizer:
    """Holds fitted per-dimension scales; persists next to embedding blocks.

    The scales sidecar (``int8_scales.npy``) lives in the block directory so
    the searcher can fold them into incoming queries — the int8 analogue of
    FAISS serializing the trained quantizer inside the index file.
    """

    def __init__(self, scales: np.ndarray):
        self.scales = np.asarray(scales, np.float32)
        if self.scales.ndim != 1:
            raise ValueError(f"scales must be [D], got {self.scales.shape}")

    @classmethod
    def fit(cls, sample: np.ndarray) -> "Int8Quantizer":
        return cls(fit_int8_scales(sample))

    def quantize_passages(self, emb: np.ndarray) -> np.ndarray:
        return quantize_passages(emb, self.scales)

    def quantize_queries(self, queries: np.ndarray):
        return quantize_queries(queries, self.scales)

    # -- persistence ---------------------------------------------------
    def save(self, data_dir: str) -> str:
        os.makedirs(data_dir, exist_ok=True)
        path = os.path.join(data_dir, INT8_SCALES_FILENAME)
        np.save(path, self.scales)
        return path

    @classmethod
    def load(cls, data_dir: str) -> "Int8Quantizer":
        path = os.path.join(data_dir, INT8_SCALES_FILENAME)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"int8 blocks need their scales sidecar; {path} is missing "
                "(written by generate_embeddings(storage_dtype='int8'))"
            )
        return cls(np.load(path))

    @classmethod
    def load_optional(cls, data_dir: str) -> Optional["Int8Quantizer"]:
        try:
            return cls.load(data_dir)
        except FileNotFoundError:
            return None
