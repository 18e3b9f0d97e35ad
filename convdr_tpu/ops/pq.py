"""Product quantization for embedding storage (FAISS ``IndexPQ`` family).

The reference's retrieval dependency is FAISS (/root/reference/drivers/
run_convdr_inference.py:157-242); it instantiates only the flat index, but
product quantization (``ProductQuantizer`` / ``IndexPQ`` / ``IndexIVFPQ``)
is FAISS's capacity answer when a corpus outgrows memory. At the
reference's own scale — 38M CAsT passages (/root/reference/README.md:152),
116 GB as float32 — no flat representation fits a v5e's 15.75 GB HBM, so
exact search must stream blocks through the host. PQ codes at M=96 bytes
per row are 3.65 GB: the whole corpus becomes HBM-RESIDENT and repeated
query sweeps never touch the host again.

TPU-first design — every phase is an MXU matmul, no fine-grained gathers:

  * FIT: all ``M`` subspace k-means problems run as ONE batched Lloyd
    iteration (``einsum('mbd,mkd->mbk')`` assignment, one-hot matmul
    update), not ``M`` sequential fits — through a dispatch tunnel, batch
    count is the latency bill.
  * ENCODE: blocked batched nearest-centroid assignment, same einsum.
  * SEARCH (ADC): the classic CPU formulation gathers ``LUT[m, code]``
    per row — N*M fine-grained lookups, the access pattern measured
    latency-bound on TPU (ops/pallas_search.py close-out). Instead the
    asymmetric distance computation IS a matmul:

        one_hot(codes, K).reshape(N, M*K) @ LUT.reshape(Q, M*K).T

    The one-hot block is QUERY-SHARED (built once per row block, reused by
    all Q queries), 0/1-valued (exact in bf16), and the contraction runs
    on the MXU. Cost relative to an exact bf16 scan is (M*K)/D in FLOPs:
    nbits=4 (K=16, M=96, D=768) costs 2x an exact scan while storing
    vectors 32x smaller; nbits=8 costs 32x (use it where candidates are
    few, e.g. IVF-PQ probing, or when sweep latency is not the bound).

Quality contract: ADC scores approximate true inner products with the
quantizer's reconstruction error; :func:`pq_adc_oracle` is the numpy
reference the device path must match (near-tie set-equality, the repo's
established large-matmul contract), and rescoring top candidates against
the float rows (ops/quant.py::rescore_candidates — FAISS
``IndexRefineFlat``) recovers exact ranking of the recalled set.
"""

from __future__ import annotations

import functools
import json
import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from convdr_tpu.ops.exact_search import (
    NEG_INF,
    _UNROLL_MAX_BLOCKS,
    _chunked_topk,
    merge_topk,
)

logger = logging.getLogger(__name__)

PQ_META_FILENAME = "pq_codebooks.npz"

# [M, B, K] score f32 + one-hot bf16 buffers in the batched Lloyd /
# encode programs: ~6 bytes per cell, capped ~1.5 GB like ops/kmeans.py.
_PQ_BUFFER_BYTES = int(1.5 * (1 << 30))

# Byte cap on the device-resident f32 copy of one encode() host chunk
# (see encode: XLA converts the whole chunk up front).
_ENCODE_CHUNK_BYTES = int(2 * (1 << 30))


def _fit_block_rows(m: int, k: int) -> int:
    return max(256, _PQ_BUFFER_BYTES // (6 * m * k))


# ---------------------------------------------------------------------------
# codebook fitting: M subspace k-means as one batched Lloyd program
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("block_rows",))
def _pq_lloyd_iter(
    x: jnp.ndarray, c: jnp.ndarray, block_rows: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One Lloyd iteration over all subspaces at once.

    x [M, N, dsub] f32, c [M, K, dsub] f32. Returns (sums [M, K, dsub]
    f32, counts [M, K] f32, objective f32). Assignment = argmax of
    ``<x, c> - |c|^2/2`` (nearest centroid in L2 without the [B, K, dsub]
    difference tensor) at HIGHEST precision: unlike the coarse quantizer
    (ops/kmeans.py runs bf16), PQ subspaces are 4-16 dims with tiny score
    gaps — bf16 rounding measurably mis-assigns ~0.3% of rows to worse
    centroids, and assignment error here IS the product's quality. These
    matmuls are a negligible share of any pipeline (offline, dsub-thin),
    so exactness is free. The one-hot update matmul stays bf16 (0/1
    operands are exact; sums accumulate in f32).
    """
    m, n, dsub = x.shape
    k = c.shape[1]
    nblocks = -(-n // block_rows)
    pad = nblocks * block_rows - n
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    chalf = 0.5 * jnp.sum(c * c, axis=-1)  # [M, K]
    xb = x.reshape(m, nblocks, block_rows, dsub).transpose(1, 0, 2, 3)

    def step(carry, inp):
        sums, counts, obj = carry
        blk, bidx = inp  # blk [M, B, dsub]
        scores = (
            jnp.einsum(
                "mbd,mkd->mbk",
                blk,
                c,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            - chalf[:, None, :]
        )  # [M, B, K]
        assign = jnp.argmax(scores, axis=-1)  # [M, B]
        row = jax.lax.broadcasted_iota(jnp.int32, (block_rows,), 0)
        valid = (bidx * block_rows + row) < n  # [B]
        onehot = jax.nn.one_hot(assign, k, dtype=jnp.bfloat16)
        onehot = jnp.where(valid[None, :, None], onehot, 0)
        sums = sums + jnp.einsum(
            "mbk,mbd->mkd",
            onehot,
            blk.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        counts = counts + jnp.sum(onehot.astype(jnp.float32), axis=1)
        best = jnp.max(scores, axis=-1)  # [M, B]
        obj = obj - jnp.sum(jnp.where(valid[None, :], best, 0.0))
        return (sums, counts, obj), None

    init = (
        jnp.zeros((m, k, dsub), jnp.float32),
        jnp.zeros((m, k), jnp.float32),
        jnp.asarray(0.0, jnp.float32),
    )
    (sums, counts, obj), _ = jax.lax.scan(
        step, init, (xb, jnp.arange(nblocks, dtype=jnp.int32))
    )
    return sums, counts, obj


def _split_empty_subspace(
    c: np.ndarray, counts: np.ndarray, eps: float = 1.0 / 1024.0
) -> Tuple[np.ndarray, int]:
    """Reseed empty clusters per subspace by splitting its largest one
    (FAISS ``Clustering::post_process_centroids`` semantics, applied
    independently inside each of the M subspaces)."""
    c = c.copy()
    counts = counts.copy()
    n_empty = 0
    for mi in range(c.shape[0]):
        empties = np.flatnonzero(counts[mi] == 0)
        n_empty += len(empties)
        for j in empties:
            donor = int(np.argmax(counts[mi]))
            if counts[mi, donor] < 2:
                break
            c[mi, j] = c[mi, donor] * (1.0 + eps)
            c[mi, donor] = c[mi, donor] * (1.0 - eps)
            counts[mi, j] = counts[mi, donor] // 2
            counts[mi, donor] -= counts[mi, donor] // 2
    return c, n_empty


@functools.partial(jax.jit, static_argnames=("block_rows",))
def _pq_assign_dev(
    x: jnp.ndarray, c: jnp.ndarray, block_rows: int, r=None
) -> jnp.ndarray:
    """codes [N, M] int32: nearest centroid per subspace per row.

    x is the RAW [N, D] row block (any float dtype — rows upload in their
    storage dtype and the subspace reshape happens here, on device: a
    host-side [M, N, dsub] transpose measured minutes of copy + a >2 GB
    single transfer, the tunnel's stall cliff, utils/transfer.py).
    ``r`` (optional [D, D]) applies the OPQ rotation before the split.
    """
    n, d = x.shape
    m, k, dsub = c.shape
    nblocks = -(-n // block_rows)
    pad = nblocks * block_rows - n
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    chalf = 0.5 * jnp.sum(c * c, axis=-1)  # [M, K]
    xb = x.reshape(nblocks, block_rows, d)

    def step(_, blk):
        blk = blk.astype(jnp.float32)
        if r is not None:
            blk = jnp.dot(
                blk, r, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        # HIGHEST: see _pq_lloyd_iter — thin-subspace score gaps sit
        # inside bf16 noise and mis-assignment costs recall directly.
        scores = (
            jnp.einsum(
                "bmd,mkd->bmk",
                blk.reshape(block_rows, m, dsub),
                c,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            - chalf[None, :, :]
        )
        return None, jnp.argmax(scores, axis=-1).astype(jnp.int32)

    _, out = jax.lax.scan(step, None, xb)  # [nblocks, B, M]
    return out.reshape(nblocks * block_rows, m)[:n]


def _fit_codebooks(
    x: np.ndarray, m: int, k: int, iters: int, seed: int
) -> np.ndarray:
    """Lloyd loop over all M subspaces at once on ``x`` [N, D] (already
    subsampled). Returns codebooks [M, K, dsub] f32."""
    n, d = x.shape
    dsub = d // m
    rng = np.random.Generator(np.random.PCG64(seed))
    xs = np.ascontiguousarray(
        x.reshape(n, m, dsub).transpose(1, 0, 2)
    )  # [M, N, dsub]
    # init: a shared row subset, each subspace taking its slice (FAISS
    # initializes each sub-quantizer from the same training pass)
    c = xs[:, rng.choice(n, size=k, replace=False), :].copy()
    block_rows = min(_fit_block_rows(m, k), n)
    x_dev = jax.device_put(xs)
    prev_obj = np.inf
    for it in range(iters):
        sums, counts, obj = _pq_lloyd_iter(x_dev, jnp.asarray(c), block_rows)
        sums = np.asarray(sums)
        counts = np.asarray(counts)
        obj = float(obj)
        nonzero = counts > 0
        new_c = c.copy()
        new_c[nonzero] = sums[nonzero] / counts[nonzero][:, None]
        new_c, n_empty = _split_empty_subspace(new_c, counts)
        logger.info(
            "pq fit iter %d/%d: obj=%.4f empties=%d",
            it + 1, iters, obj, n_empty,
        )
        c = new_c
        if n_empty == 0 and abs(prev_obj - obj) <= 1e-7 * max(1.0, abs(obj)):
            break
        prev_obj = obj
    return c.astype(np.float32)


@jax.jit
def _rotate_dev(x: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(
        x, r, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


class PQCodec:
    """A trained product quantizer: M codebooks of K centroids each.

    codebooks [M, K, dsub] float32, D = M * dsub, K = 2**nbits. Codes are
    stored unpacked as uint8 [N, M] (nbits=4 values occupy 0..15).
    ``rotation`` (optional, [D, D] orthogonal) is an OPQ transform: rows
    encode as ``x @ R`` and query LUTs build from ``q @ R``; orthogonality
    keeps rotated inner products equal to the originals, so ADC scores
    still approximate true IPs while the subspace split aligns with the
    data's principal structure (Ge et al., OPQ; FAISS ``OPQMatrix``).
    """

    def __init__(
        self,
        codebooks: np.ndarray,
        nbits: int,
        rotation: Optional[np.ndarray] = None,
    ):
        cb = np.asarray(codebooks, np.float32)
        if cb.ndim != 3:
            raise ValueError(f"codebooks must be [M, K, dsub], got {cb.shape}")
        if nbits not in (4, 8):
            raise ValueError(f"nbits must be 4 or 8, got {nbits}")
        if cb.shape[1] != (1 << nbits):
            raise ValueError(
                f"codebooks have K={cb.shape[1]} centroids but nbits={nbits} "
                f"implies K={1 << nbits}"
            )
        self.codebooks = cb
        self.nbits = int(nbits)
        d = cb.shape[0] * cb.shape[2]
        if rotation is not None:
            rotation = np.asarray(rotation, np.float32)
            if rotation.shape != (d, d):
                raise ValueError(f"rotation must be [{d}, {d}]")
        self.rotation = rotation

    # -- geometry -------------------------------------------------------
    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def ksub(self) -> int:
        return self.codebooks.shape[1]

    @property
    def dsub(self) -> int:
        return self.codebooks.shape[2]

    @property
    def dim(self) -> int:
        return self.m * self.dsub

    @property
    def code_bytes(self) -> int:
        return self.m  # unpacked uint8 per subspace

    # -- training -------------------------------------------------------
    @classmethod
    def fit(
        cls,
        sample: np.ndarray,
        m: int,
        nbits: int = 8,
        *,
        iters: int = 20,
        seed: int = 42,
        sample_max: Optional[int] = None,
        opq_iters: int = 0,
    ) -> "PQCodec":
        """Train M subspace codebooks on ``sample`` [N, D].

        ``sample_max`` caps the training rows (FAISS trains PQ on ~256
        rows per centroid; None = that default, ``256 * 2**nbits``).
        All M k-means problems iterate together in one batched device
        program.

        ``opq_iters`` > 0 also learns an OPQ rotation by alternating
        optimization (Ge et al. non-parametric OPQ; FAISS ``OPQMatrix``):
        fit codebooks on the rotated sample, reconstruct, solve the
        orthogonal Procrustes problem ``min_R |XR - X_hat|`` via SVD of
        ``X^T X_hat`` (both matmuls on device — the 768-wide products are
        minutes on a 1-core host, milliseconds on the MXU), re-rotate,
        repeat; a final full-depth fit runs on the converged rotation.
        """
        x = np.asarray(sample, np.float32)
        if x.ndim != 2 or x.shape[0] < (1 << nbits):
            raise ValueError(
                f"need [N>={1 << nbits}, D] training sample, got {x.shape}"
            )
        n, d = x.shape
        if d % m:
            raise ValueError(f"dim {d} not divisible by m={m}")
        k = 1 << nbits
        if sample_max is None:
            sample_max = 256 * k
        rng = np.random.Generator(np.random.PCG64(seed))
        if n > sample_max:
            x = x[rng.choice(n, size=sample_max, replace=False)]
            n = sample_max

        if not opq_iters:
            return cls(_fit_codebooks(x, m, k, iters, seed), nbits)

        rotation = np.eye(d, dtype=np.float32)
        inner = max(4, iters // 4)
        for t in range(opq_iters):
            xr = np.asarray(_rotate_dev(jnp.asarray(x), jnp.asarray(rotation)))
            codec = cls(_fit_codebooks(xr, m, k, inner, seed), nbits)
            xhat = codec.decode(codec.encode(xr))  # rotated-space recon
            # Procrustes: R = U V^T of X^T X_hat (on device)
            cov = np.asarray(
                _rotate_dev(jnp.asarray(x.T), jnp.asarray(xhat))
            )  # [D, D]
            u, _, vt = np.linalg.svd(cov)
            rotation = np.ascontiguousarray(
                (u @ vt).astype(np.float32)
            )
            err = float(((xr - xhat) ** 2).mean())
            logger.info(
                "opq iter %d/%d: recon_mse=%.6f", t + 1, opq_iters, err
            )
        xr = np.asarray(_rotate_dev(jnp.asarray(x), jnp.asarray(rotation)))
        return cls(_fit_codebooks(xr, m, k, iters, seed), nbits, rotation)

    # -- encode / decode --------------------------------------------------
    def encode(self, emb: np.ndarray) -> np.ndarray:
        """[N, D] float -> codes [N, M] uint8 (blocked batched assignment).

        Rows upload chunked in their own dtype (bf16 inputs ride the wire
        at half the bytes; the assignment einsum runs f32/HIGHEST either
        way — input rounding is part of the vector being encoded, not an
        arithmetic error) and the subspace split happens on device.
        """
        from convdr_tpu.utils.transfer import device_put_chunked

        x = np.asarray(emb)
        if x.ndim != 2 or x.shape[1] != self.dim:
            raise ValueError(f"embeddings must be [N, {self.dim}]")
        n = x.shape[0]
        if n == 0:
            return np.zeros((0, self.m), np.uint8)
        import ml_dtypes

        if x.dtype == np.uint16:  # bf16 bit patterns (block-file layout)
            x = x.view(ml_dtypes.bfloat16)
        elif x.dtype not in (
            np.dtype(np.float32), np.dtype(ml_dtypes.bfloat16)
        ):
            x = x.astype(np.float32)
        out = np.empty((n, self.m), np.uint8)
        c_dev = jnp.asarray(self.codebooks)
        r_dev = (
            jnp.asarray(self.rotation) if self.rotation is not None else None
        )
        # ~16 scan blocks per dispatch amortizes the tunnel RTT, byte-
        # capped: XLA materializes the WHOLE uploaded chunk as f32 (the
        # per-step astype hoists into the scan-input reshape), so an
        # uncapped 2.8M-row chunk at 38M scale allocated 8 GB f32 +
        # 4 GB bf16 on device and OOM'd v5e; ~2 GiB of f32 copy keeps
        # the dispatch peak ~4.5 GB and costs ~55 RTTs per 38M encode
        # (noise vs the host-feed-bound block reads).
        host_chunk = max(1, min(
            16 * _fit_block_rows(self.m, self.ksub),
            _ENCODE_CHUNK_BYTES // (4 * self.dim),
        ))
        for lo in range(0, n, host_chunk):
            hi = min(n, lo + host_chunk)
            codes = _pq_assign_dev(
                device_put_chunked(x[lo:hi]),
                c_dev,
                min(_fit_block_rows(self.m, self.ksub), hi - lo),
                r_dev,
            )
            out[lo:hi] = np.asarray(codes)
        return out

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """codes [N, M] -> reconstructed [N, D] float32 (host-side; used
        for tests and quality accounting, not the search path). With an
        OPQ rotation the reconstruction is de-rotated back to the
        original space."""
        codes = np.asarray(codes)
        if codes.ndim != 2 or codes.shape[1] != self.m:
            raise ValueError(f"codes must be [N, {self.m}]")
        out = np.empty((codes.shape[0], self.dim), np.float32)
        for mi in range(self.m):
            out[:, mi * self.dsub : (mi + 1) * self.dsub] = self.codebooks[
                mi, codes[:, mi].astype(np.int64)
            ]
        if self.rotation is not None:
            out = out @ self.rotation.T
        return out

    def lut(self, queries: np.ndarray) -> np.ndarray:
        """Per-query ADC tables [Q, M, K] f32: lut[q,m,k] = <q_m, c_mk>.

        With an OPQ rotation queries rotate first; orthogonality keeps
        ``<xR, qR> == <x, q>``, so ADC scores approximate ORIGINAL inner
        products either way.
        """
        q = np.asarray(queries, np.float32)
        if q.ndim != 2 or q.shape[1] != self.dim:
            raise ValueError(f"queries must be [Q, {self.dim}]")
        if self.rotation is not None:
            q = q @ self.rotation
        qs = q.reshape(q.shape[0], self.m, self.dsub)
        return np.einsum(
            "qmd,mkd->qmk", qs, self.codebooks, dtype=np.float32
        ).astype(np.float32)

    # -- persistence ------------------------------------------------------
    def save(self, data_dir: str) -> str:
        os.makedirs(data_dir, exist_ok=True)
        path = os.path.join(data_dir, PQ_META_FILENAME)
        extra = (
            {"rotation": self.rotation} if self.rotation is not None else {}
        )
        np.savez(path, codebooks=self.codebooks, nbits=self.nbits, **extra)
        return path

    @classmethod
    def load(cls, data_dir: str) -> "PQCodec":
        path = os.path.join(data_dir, PQ_META_FILENAME)
        if not os.path.exists(path):
            raise FileNotFoundError(f"no PQ codebooks at {path}")
        with np.load(path) as z:
            return cls(
                z["codebooks"],
                int(z["nbits"]),
                z["rotation"] if "rotation" in z.files else None,
            )

    @classmethod
    def load_optional(cls, data_dir: str) -> Optional["PQCodec"]:
        try:
            return cls.load(data_dir)
        except FileNotFoundError:
            return None


# ---------------------------------------------------------------------------
# 4-bit code packing
# ---------------------------------------------------------------------------
def pack_codes_4bit(codes: np.ndarray) -> np.ndarray:
    """[N, M] uint8 nibble values (0..15) -> [N, M/2] packed bytes.

    Byte j holds subspaces (2j, 2j+1): ``codes[:, 2j] | codes[:, 2j+1]
    << 4`` (FAISS packs pq4 the same low-nibble-first way). Halves code
    HBM/disk at the capacity-motivated operating point — 38M rows at
    m=96/nbits=4 drop from 3.4 GB to 1.7 GB resident; the matching
    in-kernel unpack (:func:`unpack_codes_4bit_dev`) is two VPU
    elementwise ops that fuse into the ADC one-hot.
    """
    codes = np.asarray(codes)
    if codes.dtype != np.uint8 or codes.ndim != 2:
        raise ValueError(f"codes must be uint8 [N, M], got {codes.dtype}")
    if codes.shape[1] % 2:
        raise ValueError(f"m={codes.shape[1]} must be even to pack")
    if codes.max(initial=0) > 15:
        raise ValueError("codes exceed 4 bits; packing is nbits=4 only")
    return (codes[:, 0::2] | (codes[:, 1::2] << 4)).astype(np.uint8)


def unpack_codes_4bit(packed: np.ndarray) -> np.ndarray:
    """Host inverse of :func:`pack_codes_4bit`: [N, M/2] -> [N, M]."""
    packed = np.asarray(packed, np.uint8)
    out = np.empty((packed.shape[0], packed.shape[1] * 2), np.uint8)
    out[:, 0::2] = packed & 0xF
    out[:, 1::2] = packed >> 4
    return out


def unpack_codes_4bit_dev(packed: jnp.ndarray) -> jnp.ndarray:
    """Device unpack [..., M/2] -> [..., M]; fuses into the consumer
    (shift/mask/interleave are elementwise — XLA folds them into the
    one-hot expansion, so packed codes never materialize unpacked in
    HBM)."""
    lo = packed & jnp.uint8(0xF)
    hi = packed >> jnp.uint8(4)
    return jnp.stack([lo, hi], axis=-1).reshape(
        *packed.shape[:-1], packed.shape[-1] * 2
    )


# ---------------------------------------------------------------------------
# ADC search
# ---------------------------------------------------------------------------
def pq_adc_oracle(
    lut: np.ndarray, codes: np.ndarray, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Numpy ADC reference: scores[q,n] = sum_m lut[q,m,codes[n,m]].

    Returns (scores [Q, k] f32 desc, indices [Q, k] int32), ties broken by
    lower row index (the repo's (score desc, index asc) contract).
    """
    qn, m, k_sub = lut.shape
    codes = np.asarray(codes, np.int64)
    scores = np.zeros((qn, codes.shape[0]), np.float32)
    for mi in range(m):
        scores += lut[:, mi, :][:, codes[:, mi]]
    order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return (
        np.take_along_axis(scores, order, axis=1).astype(np.float32),
        order.astype(np.int32),
    )


def adc_block_scores(
    lut_flat: jnp.ndarray,
    codes_block: jnp.ndarray,
    ksub: int,
    precision: Optional[jax.lax.Precision] = None,
) -> jnp.ndarray:
    """ADC scores for one row block as a single MXU matmul.

    lut_flat [Q, M*K] (f32), codes_block [B, M] integer. The one-hot
    block is query-shared and 0/1-valued — exact in bf16 — so default
    precision only rounds the LUT entries (~2^-9 relative, far inside the
    PQ reconstruction error). ``precision=HIGHEST`` keeps the LUT in f32
    for oracle-parity tests. Returns [Q, B] f32.
    """
    b, m = codes_block.shape
    oh_dtype = jnp.float32 if precision is not None else jnp.bfloat16
    onehot = jax.nn.one_hot(codes_block, ksub, dtype=oh_dtype)  # [B, M, K]
    return jnp.einsum(
        "qx,bx->qb",
        lut_flat,
        onehot.reshape(b, m * ksub),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _adc_block_rows(m: int, ksub: int, requested: int) -> int:
    """Cap the scan block so the [B, M*K] one-hot stays ~512 MB in bf16
    (the transient that bounds HBM traffic per block)."""
    cap = max(1024, (512 << 20) // (2 * m * ksub))
    return max(1, min(requested, cap))


@functools.partial(
    jax.jit,
    static_argnames=("k", "ksub", "block_rows", "exact", "group", "packed"),
)
def pq_flat_topk(
    lut: jnp.ndarray,
    codes: jnp.ndarray,
    k: int,
    ksub: int,
    *,
    block_rows: int = 1 << 18,
    valid_rows=-1,
    exact: bool = False,
    group: int = 32,
    packed: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flat ADC top-k over PQ codes: scan row blocks, ADC matmul per block.

    lut   [Q, M, K] f32 per-query tables (:meth:`PQCodec.lut`);
    codes [N, M] uint8 (device-resident — 48-96 B/row is the whole point:
          38M rows fit HBM where no float representation does), or
          [N, M/2] packed nibbles with ``packed=True`` (nbits=4 codes at
          half the HBM; :func:`unpack_codes_4bit_dev` fuses in-kernel);
    valid_rows: logical corpus size if codes are padded (-1 = N).
    ``exact`` keeps LUT entries f32 through the matmul (HIGHEST; tests).

    Returns (scores [Q, k] desc f32, row indices [Q, k] int32, -1 pad).
    Selection reuses the exact grouped top-k engine, so ordering follows
    the (score desc, index asc) contract over ADC scores.
    """
    qn, m, k_tab = lut.shape
    n = codes.shape[0]
    code_width = m // 2 if packed else m
    if packed and ksub != 16:
        raise ValueError("packed codes are nbits=4 only (ksub=16)")
    if k_tab != ksub or codes.shape[1] != code_width:
        raise ValueError(
            f"lut [Q, M, K]={lut.shape} vs codes [N, {code_width}]="
            f"{codes.shape} with ksub={ksub}, packed={packed}"
        )
    precision = jax.lax.Precision.HIGHEST if exact else None
    lut_flat = lut.reshape(qn, m * ksub)
    if not exact:
        lut_flat = lut_flat.astype(jnp.bfloat16)

    fully_valid = isinstance(valid_rows, int) and valid_rows < 0
    if fully_valid:
        valid = None
    else:
        valid_arr = jnp.asarray(valid_rows)
        valid = jnp.where(valid_arr < 0, n, valid_arr)
    k_eff = min(k, n)

    block_rows = _adc_block_rows(m, ksub, min(block_rows, n))
    nblocks = -(-n // block_rows)
    pad = nblocks * block_rows - n
    if pad:
        codes = jnp.pad(codes, ((0, pad), (0, 0)))
        if valid is None:
            valid = jnp.asarray(n)

    def block_topk(block, base):
        if packed:
            block = unpack_codes_4bit_dev(block)
        scores = adc_block_scores(lut_flat, block, ksub, precision)
        block_valid = None if valid is None else valid - base
        blk_s, blk_i = _chunked_topk(
            scores, min(k_eff, block_rows), group=group, valid=block_valid
        )
        return blk_s, blk_i + base

    if nblocks == 1:
        out_s, out_i = block_topk(codes, 0)
        if out_s.shape[1] < k_eff:
            out_s = jnp.pad(
                out_s,
                ((0, 0), (0, k_eff - out_s.shape[1])),
                constant_values=NEG_INF,
            )
            out_i = jnp.pad(
                out_i, ((0, 0), (0, k_eff - out_i.shape[1])),
                constant_values=-1,
            )
    elif nblocks <= _UNROLL_MAX_BLOCKS:
        # static unroll: scan's dynamic block slice would copy GB-scale
        # code tensors per iteration (ops/exact_search.py:379-384)
        out_s = out_i = None
        for bi in range(nblocks):
            blk_s, blk_i = block_topk(
                codes[bi * block_rows : (bi + 1) * block_rows],
                bi * block_rows,
            )
            if out_s is None:
                out_s, out_i = blk_s, blk_i
                if out_s.shape[1] < k_eff:
                    padk = k_eff - out_s.shape[1]
                    out_s = jnp.pad(
                        out_s, ((0, 0), (0, padk)), constant_values=NEG_INF
                    )
                    out_i = jnp.pad(
                        out_i, ((0, 0), (0, padk)), constant_values=-1
                    )
            else:
                out_s, out_i = merge_topk(out_s, out_i, blk_s, blk_i, k_eff)
    else:
        blocks = codes.reshape(nblocks, block_rows, code_width)
        init = (
            jnp.full((qn, k_eff), NEG_INF, jnp.float32),
            jnp.full((qn, k_eff), -1, jnp.int32),
        )

        def step(carry, inputs):
            run_s, run_i = carry
            block, bidx = inputs
            blk_s, blk_i = block_topk(block, bidx * block_rows)
            return merge_topk(run_s, run_i, blk_s, blk_i, k_eff), None

        (out_s, out_i), _ = jax.lax.scan(
            step, init, (blocks, jnp.arange(nblocks, dtype=jnp.int32))
        )
    if k_eff < k:
        out_s = jnp.pad(
            out_s, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF
        )
        out_i = jnp.pad(out_i, ((0, 0), (0, k - k_eff)), constant_values=-1)
    out_i = jnp.where(out_s == NEG_INF, -1, out_i)
    return out_s, out_i
