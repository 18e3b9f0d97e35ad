"""Dense retrieval encoders: ANCE-style dot encoder and DPR bi-encoder.

Capability parity with /root/reference/model/models.py:

  * :class:`AnceEncoder` == ``RobertaDot_NLL_LN`` (models.py:129-148):
    shared RoBERTa backbone, first-token (or masked-mean) pooling
    (models.py:32-43), ``Linear(hidden -> 768)`` projection + LayerNorm head
    (models.py:136-137,144). ``query_emb == body_emb``.
  * multi-chunk FirstP == ``RobertaDot_CLF_ANN_NLL_MultiChunk``
    (models.py:159-188): a ``[B, C*L]`` document is reshaped to ``[B*C, L]``,
    chunks encoded independently, ``body_emb`` returns ``[B, C, E]``; scoring
    takes the max chunk inner product with a ``-9999`` bias on empty chunks
    (models.py:100-118).
  * :class:`DPRBiEncoder` == ``BiEncoder`` (models.py:219-262): two
    independent BERT towers, CLS pooling (models.py:210).

All are flax modules over the shared :class:`TransformerEncoder`; losses (KD
MSE, in-batch/ranking NLL) live in :mod:`convdr_tpu.train.losses` so the
modules stay pure embedding functions under jit/pjit.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from convdr_tpu.core.config import ModelConfig
from convdr_tpu.models.transformer import TransformerEncoder

CHUNK_MASK_BIAS = -9999.0


def masked_mean(seq: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over valid positions (models.py:32-35)."""
    m = mask.astype(seq.dtype)[..., None]
    return jnp.sum(seq * m, axis=1) / jnp.sum(m, axis=1)


def pool(seq: jnp.ndarray, mask: jnp.ndarray, use_mean: bool) -> jnp.ndarray:
    """Masked mean or first token ([CLS]) pooling (models.py:37-43)."""
    if use_mean:
        return masked_mean(seq, mask)
    return seq[:, 0]


class AnceEncoder(nn.Module):
    """Shared-tower dot-product encoder with projection head + LayerNorm."""

    config: ModelConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = TransformerEncoder(
            self.config.arch, dtype=self.dtype, name="backbone"
        )
        if self.config.projection_head:
            self.embedding_head = nn.Dense(
                self.config.embedding_dim, dtype=self.dtype, name="embedding_head"
            )
            self.head_norm = nn.LayerNorm(
                epsilon=1e-5, dtype=jnp.float32, name="head_norm"
            )

    def _encode(self, input_ids, attention_mask, deterministic: bool):
        seq = self.backbone(input_ids, attention_mask, deterministic=deterministic)
        emb = pool(seq, attention_mask, self.config.use_mean)
        if self.config.projection_head:
            emb = self.head_norm(self.embedding_head(emb))
        return emb.astype(jnp.float32)

    def query_emb(self, input_ids, attention_mask, deterministic: bool = True):
        return self._encode(input_ids, attention_mask, deterministic)

    def body_emb(self, input_ids, attention_mask, deterministic: bool = True):
        if not self.config.multi_chunk:
            return self._encode(input_ids, attention_mask, deterministic)
        # FirstP multi-chunk: [B, C*L] -> [B*C, L] -> [B, C, E].
        b, full_len = input_ids.shape
        chunk_len = self.config.chunk_len
        c = full_len // chunk_len
        ids = input_ids.reshape(b * c, chunk_len)
        mask = attention_mask.reshape(b * c, chunk_len)
        emb = self._encode(ids, mask, deterministic)
        return emb.reshape(b, c, -1)

    def __call__(self, input_ids, attention_mask, *, is_query: bool = True,
                 deterministic: bool = True):
        if is_query:
            return self.query_emb(input_ids, attention_mask, deterministic)
        return self.body_emb(input_ids, attention_mask, deterministic)


def multi_chunk_scores(
    q_embs: jnp.ndarray, doc_embs: jnp.ndarray, doc_mask: jnp.ndarray,
    chunk_len: int,
) -> jnp.ndarray:
    """Max-over-chunks inner product with empty-chunk bias (models.py:96-118).

    q_embs [B, E], doc_embs [B, C, E], doc_mask [B, C*L] -> scores [B].
    """
    b, c, _ = doc_embs.shape
    chunk_valid = doc_mask.reshape(b, c, chunk_len)[:, :, 0]
    bias = (1.0 - chunk_valid.astype(jnp.float32)) * CHUNK_MASK_BIAS
    per_chunk = jnp.einsum(
        "be,bce->bc", q_embs, doc_embs, preferred_element_type=jnp.float32
    )
    return jnp.max(per_chunk + bias, axis=-1)


class DPRBiEncoder(nn.Module):
    """Two independent BERT towers with CLS pooling (models.py:219-262)."""

    config: ModelConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.question_model = TransformerEncoder(
            self.config.arch, dtype=self.dtype, name="question_model"
        )
        self.ctx_model = TransformerEncoder(
            self.config.arch, dtype=self.dtype, name="ctx_model"
        )

    def query_emb(self, input_ids, attention_mask, deterministic: bool = True):
        seq = self.question_model(
            input_ids, attention_mask, deterministic=deterministic
        )
        return seq[:, 0].astype(jnp.float32)

    def body_emb(self, input_ids, attention_mask, deterministic: bool = True):
        seq = self.ctx_model(input_ids, attention_mask, deterministic=deterministic)
        return seq[:, 0].astype(jnp.float32)

    def __call__(self, input_ids, attention_mask, *, is_query: bool = True,
                 deterministic: bool = True):
        if self.is_initializing():
            # Touch both towers so a single init() creates all parameters.
            q = self.query_emb(input_ids, attention_mask, deterministic)
            b = self.body_emb(input_ids, attention_mask, deterministic)
            return q if is_query else b
        if is_query:
            return self.query_emb(input_ids, attention_mask, deterministic)
        return self.body_emb(input_ids, attention_mask, deterministic)


def build_model(config: ModelConfig, dtype: jnp.dtype = jnp.float32):
    """Registry-name -> flax module (factory used by drivers)."""
    if config.two_tower:
        return DPRBiEncoder(config=config, dtype=dtype)
    return AnceEncoder(config=config, dtype=dtype)
