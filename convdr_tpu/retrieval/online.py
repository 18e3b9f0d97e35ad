"""Single-dispatch online serving: conversation text -> top-N in ONE program.

The reference's only latency surface is the per-batch instrumentation in
/root/reference/drivers/run_convdr_inference.py:181-189 (tokenize+encode
timed separately from the FAISS search). Its serving shape is therefore
two device round-trips per request: encode the query, then search. Through
this machine's ~31 ms dispatch tunnel two dispatches DOUBLE the latency
floor before any compute runs — and a production conversational system
serves one turn at a time, so the floor IS the p50.

The TPU-first answer is one jitted program that fuses the whole request:

    token ids -> encoder forward -> [1, D] embedding -> resident-index
    search -> (scores, ids)

with the model parameters AND the index operands (flat corpus rows, or
IVF centroids + list tensors) resident in HBM across requests. Host work
per request is tokenization + the final id->pid map (microseconds). XLA
sees encode and search in one computation, so the dispatch, the encode
-> search handoff, and the result read-back cost exactly one RTT.

Backends (mirroring the offline search family):

  * flat float32 — oracle-bit-exact (HIGHEST matmul), FlatIP parity;
  * flat bfloat16 — half the HBM, exact vs the bf16-rounded oracle;
  * flat int8 (SQ8) — quarter the HBM; the passage scales fold into the
    query ON DEVICE (same round-half-even arithmetic as
    ops/quant.quantize_queries, so scores match the offline path bit for
    bit) and the integer-exact default-precision matmul carries the
    oracle contract with no HIGHEST passes;
  * IVF int8 / IVFPQ (packed or not) — the ANN probe of retrieval/ivf.py
    with the query-side prep (SQ8 fold, or the ADC LUT einsum + optional
    OPQ rotation) moved inside the program. The offline path computes the
    LUT in host numpy f32; on device it runs at HIGHEST f32 — last-ULP
    LUT differences are possible on adversarial ties, result SETS match
    (the repo's large-scale exactness convention, CLAUDE.md).

Measured end-to-end Q=1 latencies live in PARITY.md ("online serving");
scripts/bench_online.py reproduces them.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from convdr_tpu.data.conv_dataset import _concat_session_ids
from convdr_tpu.data.padding import pad_input_ids_with_mask
from convdr_tpu.ops.exact_search import NEG_INF, flat_ip_topk

logger = logging.getLogger(__name__)


def history_to_inputs(
    tokenizer,
    history: Sequence[str],
    *,
    model_type: str = "rdot_nll",
    max_concat_length: int = 256,
    response_text: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """One conversation history -> padded (ids [1, L], mask [1, L]).

    ``history`` is the session's utterances with the CURRENT question
    last — exactly the ``input`` field of a topics record, so the ids
    match ConvSearchDataset's inference mode token for token
    (data/conv_dataset.py::_concat_session_ids; reference util.py:452-520).
    ``response_text`` injects a ``<response>`` passage before the current
    question (man_can/auto_can serving); like the dataset path, the
    injection happens inside ``_concat_session_ids`` — ``history`` must
    NOT already contain the response utterance.
    """
    if not history:
        raise ValueError("history must contain at least the current question")
    raw_ids = _concat_session_ids(
        tokenizer,
        list(history),
        is_bert_style=(model_type == "dpr"),
        response_text=response_text,
    )
    ids, mask = pad_input_ids_with_mask(raw_ids, max_concat_length)
    return (
        np.asarray([ids], np.int32),
        np.asarray([mask], np.int32),
    )


def _fold_int8_queries(q: jnp.ndarray, scales: jnp.ndarray):
    """In-jit twin of ops/quant.quantize_queries: fold the passage scales
    into the query, quantize each row by its own scalar. Same f32 IEEE
    divide + round-half-even ``rint`` as the host version — bit-identical
    int rows and score scales."""
    qf = q.astype(jnp.float32) * scales[None, :]
    t = jnp.max(jnp.abs(qf), axis=1, keepdims=True) / 127.0
    t = jnp.where(t > 0, t, 1.0).astype(jnp.float32)
    q_int = jnp.clip(jnp.rint(qf / t), -127, 127).astype(jnp.float32)
    return q_int, t


@dataclass
class ServeStats:
    """Wall-clock latencies (seconds) of completed ``search`` calls."""

    latencies: List[float]

    def percentile(self, p: float) -> float:
        if not self.latencies:
            raise ValueError("no completed search calls recorded yet")
        return float(np.percentile(np.asarray(self.latencies), p))

    def summary(self) -> dict:
        if not self.latencies:
            return {"count": 0}
        lat = np.asarray(self.latencies)
        return {
            "count": int(lat.shape[0]),
            "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 3),
            "p90_ms": round(float(np.percentile(lat, 90)) * 1e3, 3),
            "p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 3),
            "mean_ms": round(float(lat.mean()) * 1e3, 3),
        }


class OnlineSearcher:
    """text/tokens -> top-N through ONE resident jitted program.

    Build with :meth:`from_blocks` (flat resident corpus) or
    :meth:`from_ivf` (resident ANN index). Per request call
    :meth:`search` (history text) or :meth:`search_tokens` (pre-built
    ids/mask, e.g. from ConvSearchDataset). Results are (scores [Q, k]
    f32 desc, ids [Q, k]) where ids are token-cache offsets (flat blocks
    map block rows -> emb2offset; IVF rowids ARE offsets).
    """

    def __init__(
        self,
        *,
        tokenizer,
        params,
        serve_fn: Callable,
        operands: Tuple,
        top_n: int,
        model_type: str,
        max_concat_length: int,
        rowid_to_offset: Optional[np.ndarray] = None,
    ):
        self.tokenizer = tokenizer
        self.params = params
        self._serve_fn = serve_fn
        self._operands = operands
        self.top_n = top_n
        self.model_type = model_type
        self.max_concat_length = max_concat_length
        self._rowid_to_offset = rowid_to_offset
        self.stats = ServeStats([])

    # -- construction -----------------------------------------------------
    @classmethod
    def from_blocks(
        cls,
        model_path: Optional[str],
        ann_data_dir: str,
        *,
        model_type: str = "rdot_nll",
        top_n: int = 100,
        max_concat_length: int = 256,
        storage_dtype: str = "float32",
        precision: str = "highest",
        block_rows: int = 524288,
        dtype=jnp.float32,
        arch_preset: Optional[str] = None,
        max_blocks: Optional[int] = None,
    ) -> "OnlineSearcher":
        """Resident flat search over every block under ``ann_data_dir``.

        Blocks upload one at a time (chunked, utils/transfer.py) in
        ``storage_dtype`` and concatenate ON DEVICE: float blocks
        SQ8-quantize per block when ``storage_dtype='int8'``
        (bit-identical to the host quantizer,
        searcher.py::_quantize_block_dev), so the peak HBM transient is
        one float block plus the quantized corpus — never the whole
        corpus at float width (a corpus that only fits resident as int8
        would otherwise OOM before quantization).
        """
        from convdr_tpu.core.loading import load_model_and_params, make_apply_fn
        from convdr_tpu.ops.quant import Int8Quantizer
        from convdr_tpu.retrieval.blocks import iter_embedding_blocks
        from convdr_tpu.retrieval.searcher import _quantize_block_dev
        from convdr_tpu.utils.transfer import device_put_chunked

        _cfg, tokenizer, model, params = load_model_and_params(
            model_type, model_path, dtype=dtype, arch_preset=arch_preset
        )
        apply_fn = make_apply_fn(model)
        max_concat_length = min(
            max_concat_length, tokenizer.max_len_single_sentence
        )

        int8 = storage_dtype == "int8"
        target = {
            "float32": jnp.float32,
            "bfloat16": jnp.bfloat16,
            "int8": jnp.int8,
        }[storage_dtype]
        quantizer = Int8Quantizer.load_optional(ann_data_dir)
        devs, offs = [], []
        for _b, emb, emb2offset in iter_embedding_blocks(
            ann_data_dir, max_blocks=max_blocks
        ):
            offs.append(np.asarray(emb2offset, np.int64))
            if emb.shape[0] == 0:
                continue
            if int8:
                if emb.dtype == np.int8:
                    if quantizer is None:
                        raise FileNotFoundError(
                            f"int8 blocks in {ann_data_dir} have no "
                            "int8_scales.npy sidecar"
                        )
                    devs.append(device_put_chunked(emb, jnp.int8))
                else:
                    if quantizer is None:
                        # block 0 only — the same fallback sample the
                        # offline BlockedSearcher fits on, so rankings
                        # match it
                        logger.warning(
                            "no int8_scales.npy in %s; fitting scales on "
                            "block 0", ann_data_dir,
                        )
                        quantizer = Int8Quantizer.fit(emb)
                    p_float = device_put_chunked(emb)
                    devs.append(
                        _quantize_block_dev(
                            p_float, jnp.asarray(quantizer.scales)
                        )
                    )
                    del p_float
            elif emb.dtype == np.int8:
                # SQ8 blocks under a float config dequantize through the
                # scales sidecar (a plain cast would drop the per-dim
                # scales and corrupt the ranking)
                if quantizer is None:
                    raise FileNotFoundError(
                        f"int8 blocks in {ann_data_dir} have no "
                        "int8_scales.npy sidecar"
                    )
                deq = emb.astype(np.float32) * quantizer.scales[None, :]
                devs.append(device_put_chunked(deq, target))
                del deq
            else:
                devs.append(device_put_chunked(emb, target))
        if not offs:
            raise FileNotFoundError(f"No embedding blocks in {ann_data_dir}")
        corpus_dev = devs[0] if len(devs) == 1 else jnp.concatenate(devs)
        del devs
        rowid_to_offset = np.concatenate(offs)
        n = int(corpus_dev.shape[0])

        scales_dev = jnp.asarray(quantizer.scales) if int8 else None
        eff_block_rows = min(block_rows, n)

        @partial(jax.jit, static_argnums=())
        def serve(params, ids, mask, corpus_op, scales_op):
            q = apply_fn(params, ids, mask, True).astype(jnp.float32)
            if int8:
                q_int, t = _fold_int8_queries(q, scales_op)
                s, i = flat_ip_topk(
                    q_int, corpus_op, top_n, block_rows=eff_block_rows
                )
                s = jnp.where(i >= 0, s * t, NEG_INF).astype(jnp.float32)
            else:
                s, i = flat_ip_topk(
                    q, corpus_op, top_n,
                    block_rows=eff_block_rows, precision=precision,
                )
            return s, i

        operands = (corpus_dev, scales_dev)
        return cls(
            tokenizer=tokenizer,
            params=params,
            serve_fn=serve,
            operands=operands,
            top_n=top_n,
            model_type=model_type,
            max_concat_length=max_concat_length,
            rowid_to_offset=rowid_to_offset,
        )

    @classmethod
    def from_ivf(
        cls,
        model_path: Optional[str],
        ivf_dir: str,
        *,
        model_type: str = "rdot_nll",
        top_n: int = 100,
        nprobe: int = 8,
        max_concat_length: int = 256,
        dtype=jnp.float32,
        arch_preset: Optional[str] = None,
    ) -> "OnlineSearcher":
        """Resident ANN probe over a saved IVF/IVFPQ index.

        Query-side prep runs inside the program: SQ8 scale folding (int8
        lists) or the ADC LUT einsum + optional OPQ rotation (PQ lists).
        Returned ids are the index's rowids (= emb2offset values).
        """
        from convdr_tpu.core.loading import load_model_and_params, make_apply_fn
        from convdr_tpu.retrieval.ivf import IVFIndex, _ivf_search_dev

        _cfg, tokenizer, model, params = load_model_and_params(
            model_type, model_path, dtype=dtype, arch_preset=arch_preset
        )
        apply_fn = make_apply_fn(model)
        max_concat_length = min(
            max_concat_length, tokenizer.max_len_single_sentence
        )

        index = IVFIndex.load(ivf_dir)
        cent, lists_dev, rid_dev = index._device_arrays()
        nprobe = max(1, min(nprobe, index.nlist))
        storage = index.storage_dtype
        packed = index.packed

        if storage == "int8":
            scales_dev = jnp.asarray(index.quantizer.scales)
            rot_dev = books_dev = None
            m = dsub = 0
        elif index.codec is not None:
            scales_dev = None
            codec = index.codec
            rot_dev = (
                jnp.asarray(codec.rotation)
                if codec.rotation is not None else None
            )
            books_dev = jnp.asarray(codec.codebooks)  # [M, K, dsub]
            m, dsub = codec.m, codec.dsub
        else:
            scales_dev = rot_dev = books_dev = None
            m = dsub = 0

        @partial(jax.jit, static_argnums=())
        def serve(params, ids, mask, cent_op, lists_op, rid_op,
                  scales_op, rot_op, books_op):
            q = apply_fn(params, ids, mask, True).astype(jnp.float32)
            t = None
            if storage == "int8":
                q_score, t = _fold_int8_queries(q, scales_op)
            elif books_op is not None:
                qr = q
                if rot_op is not None:
                    # orthogonal OPQ rotation: <xR, qR> == <x, q>
                    qr = jnp.dot(
                        q, rot_op,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                qs = qr.reshape(qr.shape[0], m, dsub)
                # per-query ADC tables [Q, M, K] (host twin: ops/pq.lut)
                q_score = jnp.einsum(
                    "qmd,mkd->qmk", qs, books_op,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                ).astype(jnp.float32)
            else:
                q_score = q
            s, i = _ivf_search_dev(
                q, q_score, cent_op, lists_op, rid_op, top_n, nprobe,
                packed=packed,
            )
            if t is not None:
                s = jnp.where(i >= 0, s * t, NEG_INF).astype(jnp.float32)
            return s, i

        operands = (cent, lists_dev, rid_dev, scales_dev, rot_dev, books_dev)
        return cls(
            tokenizer=tokenizer,
            params=params,
            serve_fn=serve,
            operands=operands,
            top_n=top_n,
            model_type=model_type,
            max_concat_length=max_concat_length,
            rowid_to_offset=None,  # IVF rowids are already offsets
        )

    # -- serving ------------------------------------------------------------
    def warmup(self) -> None:
        """Compile + run the program once (first compiles are 20-40 s
        through the tunnel; serve loops should not pay that on turn 1)."""
        ids = np.zeros((1, self.max_concat_length), np.int32)
        ids[:, 0] = self.tokenizer.cls_token_id
        mask = np.zeros_like(ids)
        mask[:, 0] = 1
        self.search_tokens(ids, mask, record=False)

    def search_tokens(
        self,
        ids: np.ndarray,
        mask: np.ndarray,
        *,
        record: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """One dispatch: (ids [Q, L], mask [Q, L]) -> (scores, offsets).

        Each distinct Q compiles once (L is fixed at construction); online
        serving is Q=1 per turn, evaluation replays can batch. Records
        dispatch + read-back + id mapping; the text entry point
        :meth:`search` times host tokenization in as well.
        """
        import time

        t0 = time.perf_counter()
        s, i = self._serve_fn(
            self.params, jnp.asarray(ids), jnp.asarray(mask), *self._operands
        )
        s = np.asarray(s)  # host read-back = the dispatch sync point
        i = np.asarray(i)
        if self._rowid_to_offset is not None:
            i = np.where(
                i >= 0, self._rowid_to_offset[np.clip(i, 0, None)], -1
            ).astype(np.int64)
        if record:
            self.stats.latencies.append(time.perf_counter() - t0)
        return s, i

    def search(
        self,
        history: Sequence[str],
        *,
        response_text: Optional[str] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """One conversation turn: history (current question last) ->
        (scores [1, top_n], token-cache offsets [1, top_n]). The recorded
        latency is the FULL request wall: host tokenize + dispatch +
        read-back + id mapping."""
        import time

        t0 = time.perf_counter()
        ids, mask = history_to_inputs(
            self.tokenizer,
            history,
            model_type=self.model_type,
            max_concat_length=self.max_concat_length,
            response_text=response_text,
        )
        out = self.search_tokens(ids, mask, record=False)
        self.stats.latencies.append(time.perf_counter() - t0)
        return out
