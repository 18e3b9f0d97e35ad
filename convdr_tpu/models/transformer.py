"""From-scratch flax transformer encoder (BERT/RoBERTa topology).

TPU-native re-design of the reference's HF torch backbones
(/root/reference/model/models.py:6-8,129-216). One module covers both
families via :class:`~convdr_tpu.core.config.EncoderArchConfig`:

  * RoBERTa: position ids offset by ``position_offset=2`` past pad positions,
    layer_norm_eps 1e-5, single token type.
  * BERT: positions from 0, eps 1e-12, two token types.

Design choices for TPU/XLA:
  * params stored fp32, compute in a configurable ``dtype`` (bf16 by default
    on TPU) -- matmuls hit the MXU at full rate, LayerNorm/softmax accumulate
    in fp32;
  * static shapes only; attention mask is additive bias built once per batch;
  * no data-dependent Python control flow; the layer stack is a plain loop of
    identical modules which XLA fuses/pipelines (scan-over-layers optional via
    ``remat_scan`` if memory-bound).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from convdr_tpu.core.config import EncoderArchConfig
from convdr_tpu.models.attention import multi_head_attention, naive_attention


class MultiHeadAttention(nn.Module):
    cfg: EncoderArchConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, attention_mask, bias, deterministic: bool = True):
        cfg = self.cfg
        head_dim = cfg.hidden_size // cfg.num_heads
        dense = lambda name: nn.DenseGeneral(  # noqa: E731
            features=(cfg.num_heads, head_dim),
            axis=-1,
            dtype=self.dtype,
            name=name,
        )
        q = dense("query")(hidden)
        k = dense("key")(hidden)
        v = dense("value")(hidden)
        # Flash attention has no dropout hook: use it only when attention
        # dropout is inactive (inference, or deterministic training).
        use_dropout = not deterministic and cfg.attention_dropout > 0.0
        if not use_dropout:
            ctx = multi_head_attention(
                q, k, v, attention_mask, bias, self.dtype
            )
        else:
            # reference semantics: dropout on the attention probabilities
            head_dim = cfg.hidden_size // cfg.num_heads
            scale = 1.0 / jnp.sqrt(head_dim).astype(jnp.float32)
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            )
            probs = jax.nn.softmax(scores * scale + bias, axis=-1).astype(
                self.dtype
            )
            probs = nn.Dropout(rate=cfg.attention_dropout)(
                probs, deterministic=False
            )
            ctx = jnp.einsum(
                "bhqk,bkhd->bqhd", probs, v,
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
        out = nn.DenseGeneral(
            features=cfg.hidden_size,
            axis=(-2, -1),
            dtype=self.dtype,
            name="out",
        )(ctx)
        return out


class EncoderLayer(nn.Module):
    cfg: EncoderArchConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, attention_mask, bias, deterministic: bool = True):
        cfg = self.cfg
        attn_out = MultiHeadAttention(cfg, self.dtype, name="attention")(
            hidden, attention_mask, bias, deterministic
        )
        attn_out = nn.Dropout(rate=cfg.hidden_dropout)(
            attn_out, deterministic=deterministic
        )
        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="attention_norm"
        )(hidden + attn_out).astype(self.dtype)

        ff = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="intermediate")(
            hidden
        )
        ff = nn.gelu(ff, approximate=cfg.gelu_approximate)
        ff = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output")(ff)
        ff = nn.Dropout(rate=cfg.hidden_dropout)(ff, deterministic=deterministic)
        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="output_norm"
        )(hidden + ff).astype(self.dtype)
        return hidden


class TransformerEncoder(nn.Module):
    """Token ids + mask -> contextual sequence output [B, T, H]."""

    cfg: EncoderArchConfig
    dtype: jnp.dtype = jnp.float32

    def position_ids(self, input_ids, attention_mask):
        cfg = self.cfg
        if cfg.position_offset > 0:
            # RoBERTa: cumulative index over non-pad positions, offset past pad.
            mask = attention_mask.astype(jnp.int32)
            incremental = jnp.cumsum(mask, axis=1) * mask
            return incremental + cfg.pad_token_id
        return jnp.broadcast_to(
            jnp.arange(input_ids.shape[1], dtype=jnp.int32)[None, :],
            input_ids.shape,
        )

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask,
        token_type_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        input_ids = input_ids.astype(jnp.int32)
        attention_mask = attention_mask.astype(jnp.int32)

        word_emb = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="word_embeddings"
        )(input_ids)
        pos_ids = self.position_ids(input_ids, attention_mask)
        pos_emb = nn.Embed(
            cfg.max_position_embeddings,
            cfg.hidden_size,
            dtype=self.dtype,
            name="position_embeddings",
        )(pos_ids)
        hidden = word_emb + pos_emb
        if cfg.type_vocab_size > 0:
            if token_type_ids is None:
                token_type_ids = jnp.zeros_like(input_ids)
            hidden = hidden + nn.Embed(
                cfg.type_vocab_size,
                cfg.hidden_size,
                dtype=self.dtype,
                name="token_type_embeddings",
            )(token_type_ids)
        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="embeddings_norm"
        )(hidden).astype(self.dtype)
        hidden = nn.Dropout(rate=cfg.hidden_dropout)(
            hidden, deterministic=deterministic
        )

        # Additive attention bias: 0 for valid, large negative for padding.
        bias = jnp.where(
            attention_mask[:, None, None, :] > 0, 0.0, -1e9
        ).astype(jnp.float32)

        for i in range(cfg.num_layers):
            hidden = EncoderLayer(cfg, self.dtype, name=f"layer_{i}")(
                hidden, attention_mask, bias, deterministic
            )
        return hidden
