"""Typed configuration for the framework.

Replaces the reference's per-driver argparse namespaces (mutated ad hoc, e.g.
/root/reference/drivers/run_convdr_train.py:255-435) with frozen dataclasses.
Driver CLIs construct these from flag values, keeping the reference's flag
surface (--model_type, --query, --max_concat_length, ...) intact.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class EncoderArchConfig:
    """Transformer encoder architecture (BERT/RoBERTa base by default)."""

    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    # RoBERTa offsets position ids by pad_token_id + 1; BERT starts at 0.
    position_offset: int = 2
    pad_token_id: int = 1
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    # GELU flavor: False = exact erf (HF-parity numerics), True = tanh
    # approximation. Under bf16 compute the two are inside the bf16 noise
    # floor (rel-L2 vs f32-erf: 7.4e-3 erf, 7.7e-3 tanh on RoBERTa-base)
    # and tanh encodes ~20% faster on v5e (erf is VPU-expensive).
    gelu_approximate: bool = False

    @staticmethod
    def roberta_base(vocab_size: int = 50265) -> "EncoderArchConfig":
        return EncoderArchConfig(vocab_size=vocab_size)

    @staticmethod
    def bert_base(vocab_size: int = 30522) -> "EncoderArchConfig":
        return EncoderArchConfig(
            vocab_size=vocab_size,
            max_position_embeddings=512,
            type_vocab_size=2,
            layer_norm_eps=1e-12,
            position_offset=0,
            pad_token_id=0,
        )

    @staticmethod
    def tiny(vocab_size: int = 256, roberta: bool = True) -> "EncoderArchConfig":
        """A miniature config for tests; same topology, tiny dims."""
        base = (
            EncoderArchConfig.roberta_base(vocab_size)
            if roberta
            else EncoderArchConfig.bert_base(vocab_size)
        )
        return dataclasses.replace(
            base,
            hidden_size=32,
            num_layers=2,
            num_heads=2,
            intermediate_size=64,
            max_position_embeddings=key_len(base, 130),
        )


def key_len(base: EncoderArchConfig, n: int) -> int:
    return n + base.position_offset


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """A retrieval model = encoder arch + head + pooling choices.

    Mirrors the reference registry entries (model/models.py:291-309):
    rdot_nll / rdot_nll_multi_chunk (RoBERTa + 768-d head + LN, first-token
    pool) and dpr (two BERT towers, CLS pool, no head).
    """

    name: str
    arch: EncoderArchConfig
    embedding_dim: int = 768
    use_mean: bool = False
    # ANCE-style projection head + LayerNorm (models.py:136-137); DPR has none.
    projection_head: bool = True
    # Two independent towers (DPR) vs a single shared encoder (ANCE).
    two_tower: bool = False
    # Multi-chunk FirstP long-document handling (models.py:159-188).
    multi_chunk: bool = False
    chunk_len: int = 512
    tokenizer_kind: str = "roberta"  # "roberta" (byte BPE) | "bert" (WordPiece)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """KD + ranking training hyperparameters.

    Defaults track /root/reference/drivers/run_convdr_train.py:255-435 and
    README.md:160-164 (bs 4/device, lr 1e-5, clip 1.0, 9 negatives).
    """

    learning_rate: float = 1e-5
    weight_decay: float = 0.0
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    warmup_steps: int = 0
    num_train_epochs: float = 1.0
    max_steps: int = -1
    per_device_batch_size: int = 4
    gradient_accumulation_steps: int = 1
    num_negatives: int = 9
    ranking_task: bool = False
    no_mse: bool = False
    max_concat_length: int = 256
    max_query_length: int = 64
    max_doc_length: int = 512
    seed: int = 42
    log_steps: int = 1
    save_steps: int = -1
    # Reference parity: torch model.train() keeps dropout active during KD
    # (run_convdr_train.py:107); off by default here (deterministic KD is
    # usually at least as good and keeps the step fully reproducible).
    use_dropout: bool = False
    # Ranking-doc length rungs: each batch's doc tensor is trimmed to the
    # smallest rung covering its longest document (one jit specialization
    # per rung). Teacher doc embeddings are unchanged -- pads never reach
    # valid tokens -- but short-doc corpora skip most of the doc-encode
    # FLOPs, the dominant cost of a ranking step. None = fixed
    # max_doc_length (reference behavior).
    doc_length_buckets: Optional[Tuple[int, ...]] = None


@dataclasses.dataclass(frozen=True)
class SearchConfig:
    """Exact inner-product retrieval configuration.

    top_n default matches run_convdr_inference.py:316-319; passage blocks
    mirror the reference's 8-block sequential design (README.md:216) but are
    device-sharded on TPU.
    """

    top_n: int = 100
    embedding_dim: int = 768
    # Passages per scan block on one device. Bigger is faster until the
    # [Q, block] f32 score buffer pressures HBM: measured v5e at 1M rows /
    # 512 queries: 56.6 / 51.3 / 44.3 ms per search at 256k / 524k / 1M
    # scan blocks (each halving of the block count drops one selection +
    # merge pass). 524288 (= 1 GB of scores at Q=512) leaves room for
    # streamed block buffers alongside; raise it for HBM-resident corpora.
    passage_block_size: int = 524288
    # Embedding block storage on HBM: "float32" (FAISS-bit exact),
    # "bfloat16" (half the HBM/disk, exact vs the bf16-rounded oracle), or
    # "int8" (SQ8 scalar quantization, ops/quant.py: quarter the HBM/disk,
    # default-precision matmul speed, bit-exact vs the int8 oracle).
    storage_dtype: str = "float32"
    # "highest" = oracle-bit-exact (FAISS-parity); "high"/"default" trade
    # ~2e-3 score error for matmul speed (see ops/exact_search.py). Ignored
    # for int8 storage, whose default-precision matmul is already exact.
    matmul_precision: str = "highest"
    # int8 only: re-rank the top (rescore_factor * top_n) quantized
    # candidates with full-precision host-side inner products before the
    # final cut (FAISS IndexRefineFlat's k_factor). Needs the original
    # float rows (in-memory passages or float block files). 0 = off.
    # Measured at 524k rows: f32 top-100 is ~98% covered by int8 top-100
    # and fully covered by int8 top-150, so 2 recovers f32-grade ranking.
    rescore_factor: int = 0
    # Device-side capacity cap: an on-disk block whose embedding matrix
    # exceeds this many bytes is searched as sequential sub-blocks (results
    # merged in order, preserving the lower-index tie preference). The
    # jitted search transiently holds the raw upload PLUS its
    # bucket-padded copy plus the [Q, scan_block] f32 score buffer, so a
    # 38M/8 corpus (7.3 GB bf16 blocks) OOMs a 16 GB v5e without this
    # (measured: 17.7 GB requested). 3.2 GB caps the transient at ~8 GB
    # while leaving the 1M-row f32 resident path (3.07 GB) in one piece.
    max_device_block_bytes: int = 3_200_000_000


@dataclasses.dataclass(frozen=True)
class DataConfig:
    max_seq_length: int = 512
    max_query_length: int = 64
    max_doc_character: int = 10000
    num_tokenize_workers: int = 32


NUM_FOLD = 5  # 5-fold CV harness (utils/util.py:32)

QUERY_MODES: Tuple[str, ...] = (
    "no_res",
    "man_can",
    "auto_can",
    "target",
    "output",
    "raw",
)
