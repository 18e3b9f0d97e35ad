"""Training losses: KD MSE, ranking NLL, in-batch pairwise NLL.

Functional equivalents of the reference's loss heads:

  * :func:`kd_mse_loss`      -- ``MSELoss`` between student session embedding
    and frozen teacher manual-query embedding
    (/root/reference/drivers/run_convdr_train.py:109-115,460).
  * :func:`ranking_nll_loss` -- dot-product logits over [positive, negatives]
    with ``CrossEntropyLoss`` at label 0 (run_convdr_train.py:162-170).
  * :func:`in_batch_nll_loss` -- the ANCE ``NLL.forward`` pairwise loss
    (model/models.py:52-75): softmax over (q·pos, q·neg), -log p(pos).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kd_mse_loss(student_embs: jnp.ndarray, teacher_embs: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error over all elements (torch MSELoss 'mean')."""
    teacher_embs = jax.lax.stop_gradient(teacher_embs)
    return jnp.mean(jnp.square(student_embs - teacher_embs))


def ranking_nll_loss(
    query_embs: jnp.ndarray, doc_embs: jnp.ndarray
) -> jnp.ndarray:
    """query_embs [B, E], doc_embs [B, K, E] with the positive at k=0.

    logits[b, k] = q_b . d_bk ; loss = mean_b CE(logits_b, 0).
    """
    doc_embs = jax.lax.stop_gradient(doc_embs)
    logits = jnp.einsum(
        "be,bke->bk", query_embs, doc_embs, preferred_element_type=jnp.float32
    )
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(logprobs[:, 0])


def in_batch_nll_loss(
    q_embs: jnp.ndarray, pos_embs: jnp.ndarray, neg_embs: jnp.ndarray
) -> jnp.ndarray:
    """Pairwise (pos, neg) NLL: -log softmax([q.pos, q.neg])[0], averaged."""
    s_pos = jnp.sum(q_embs * pos_embs, axis=-1)
    s_neg = jnp.sum(q_embs * neg_embs, axis=-1)
    logits = jnp.stack([s_pos, s_neg], axis=1)
    return -jnp.mean(jax.nn.log_softmax(logits, axis=1)[:, 0])


def in_batch_nll_multichunk_loss(
    q_embs: jnp.ndarray,
    pos_embs: jnp.ndarray,
    pos_mask: jnp.ndarray,
    neg_embs: jnp.ndarray,
    neg_mask: jnp.ndarray,
    chunk_len: int,
) -> jnp.ndarray:
    """Multi-chunk pairwise NLL (``NLL_MultiChunk.forward``, models.py:78-126).

    Document embeddings are [B, C, E] chunk matrices with [B, C*L] token
    masks; each document scores as the max chunk inner product with a -9999
    bias on empty chunks (models.py:100-118), then the standard pairwise NLL.
    """
    from convdr_tpu.models.encoders import multi_chunk_scores

    s_pos = multi_chunk_scores(q_embs, pos_embs, pos_mask, chunk_len)
    s_neg = multi_chunk_scores(q_embs, neg_embs, neg_mask, chunk_len)
    logits = jnp.stack([s_pos, s_neg], axis=1)
    return -jnp.mean(jax.nn.log_softmax(logits, axis=1)[:, 0])


def ranking_nll_multichunk_loss(
    query_embs: jnp.ndarray,
    doc_embs: jnp.ndarray,
    doc_mask: jnp.ndarray,
    chunk_len: int,
) -> jnp.ndarray:
    """Ranking CE with multi-chunk documents (positive at k=0).

    query_embs [B, E]; doc_embs [B, K, C, E]; doc_mask [B, K, C*L]. Each
    document scores as the max chunk inner product with the -9999 empty-
    chunk bias (``NLL_MultiChunk``, models.py:100-118), then the reference
    ranking task's CE with label 0 (run_convdr_train.py:162-170).
    """
    from convdr_tpu.models.encoders import multi_chunk_scores

    doc_embs = jax.lax.stop_gradient(doc_embs)
    b, k, c, e = doc_embs.shape
    q_rep = jnp.repeat(query_embs, k, axis=0)  # [B*K, E]
    scores = multi_chunk_scores(
        q_rep, doc_embs.reshape(b * k, c, e),
        doc_mask.reshape(b * k, -1), chunk_len,
    ).reshape(b, k)
    logprobs = jax.nn.log_softmax(scores, axis=-1)
    return -jnp.mean(logprobs[:, 0])
