"""Jitted KD + ranking training: one compiled SPMD step over the mesh.

TPU-native restructuring of the reference train loop
(/root/reference/drivers/run_convdr_train.py:41-252):

  * the reference tokenizes ranking documents *inside* the hot loop on CPU
    (:127-137) and teacher-encodes them in micro-batches of 8 with repeated
    host->device transfers (:139-157). Here document tokenization happens in
    the input pipeline (:mod:`convdr_tpu.train.ranking_data`) and the whole
    step -- student encode, frozen teacher encode, MSE + ranking CE, AdamW
    update -- is one jitted function; with a ``data`` mesh axis the batch is
    sharded and XLA inserts the gradient psum (replacing
    ``torch.nn.DataParallel``, :77-78).
  * teacher parameters are captured as frozen pytree constants; no_grad
    becomes ``stop_gradient`` inside the loss.
  * negative sampling (:123, ``random.sample`` of 9 of 19 negatives) becomes
    a seeded host-side choice in the input pipeline so the device step stays
    static-shape: documents arrive as ``[B, 1+num_negatives, L]``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from convdr_tpu.core.config import TrainConfig
from convdr_tpu.train.losses import (
    kd_mse_loss,
    ranking_nll_loss,
    ranking_nll_multichunk_loss,
)
from convdr_tpu.train.optimizer import make_optimizer


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step), None),
    lambda _, c: TrainState(params=c[0], opt_state=c[1], step=c[2]),
)


def create_train_state(
    params: Any, config: TrainConfig, total_steps: int
) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = make_optimizer(config, total_steps)
    return (
        TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)),
        tx,
    )


def make_train_step(
    student_apply: Callable,
    teacher_apply: Callable,
    tx: optax.GradientTransformation,
    config: TrainConfig,
    *,
    mesh: Optional[Mesh] = None,
    data_axis: str = "data",
    jit: bool = True,
):
    """Build the jitted train step.

    student_apply(params, ids, mask, is_query) -> [B, E]
    teacher_apply(params, ids, mask, is_query) -> [B, E]

    The returned function has signature
    ``step(state, teacher_params, batch) -> (state, metrics)`` where batch is
    a dict with ``concat_ids/concat_mask/target_ids/target_mask`` and
    optionally ``doc_ids/doc_mask [B, K, L]`` for the ranking task.

    ``jit=False`` returns the raw traceable step (no jit wrapper, no buffer
    donation) for embedding into a larger jitted program, e.g. the in-jit
    multi-step timing loop in ``bench.py --mfu`` (per-step dispatch through
    the TPU tunnel costs ~15-30 ms, so honest step timing must loop on
    device).
    """

    use_mse = not config.no_mse
    use_ranking = config.ranking_task
    use_dropout = getattr(config, "use_dropout", False)
    dropout_base = jax.random.PRNGKey(config.seed)

    def loss_fn(params, teacher_params, batch, step):
        if use_dropout:
            rngs = {"dropout": jax.random.fold_in(dropout_base, step)}
            embs = student_apply(
                params, batch["concat_ids"], batch["concat_mask"], True, rngs
            )
        else:
            embs = student_apply(
                params, batch["concat_ids"], batch["concat_mask"], True
            )
        metrics: Dict[str, jnp.ndarray] = {}
        loss = jnp.zeros((), jnp.float32)
        if use_mse:
            teacher_embs = teacher_apply(
                teacher_params, batch["target_ids"], batch["target_mask"], True
            )
            mse = kd_mse_loss(embs, teacher_embs)
            loss = loss + mse
            metrics["mse_loss"] = mse
        if use_ranking:
            b, k, l = batch["doc_ids"].shape
            doc_embs = teacher_apply(
                teacher_params,
                batch["doc_ids"].reshape(b * k, l),
                batch["doc_mask"].reshape(b * k, l),
                False,
            )
            if doc_embs.ndim == 3:
                # multi-chunk teacher: [B*K, C, E] -> max-over-chunk scores
                # (NLL_MultiChunk semantics, models.py:100-118)
                c = doc_embs.shape[1]
                rank_loss = ranking_nll_multichunk_loss(
                    embs,
                    doc_embs.reshape(b, k, c, -1),
                    batch["doc_mask"],
                    l // c,
                )
            else:
                rank_loss = ranking_nll_loss(embs, doc_embs.reshape(b, k, -1))
            loss = loss + rank_loss
            metrics["ranking_loss"] = rank_loss
        metrics["loss"] = loss
        return loss, metrics

    def train_step(state: TrainState, teacher_params, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(
            state.params, teacher_params, batch, state.step
        )
        updates, new_opt_state = tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params, opt_state=new_opt_state, step=state.step + 1
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if not jit:
        return train_step
    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    # SPMD data parallelism: batch sharded over the data axis, params and
    # optimizer state replicated; XLA inserts the grad all-reduce over ICI.
    repl = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(data_axis))
    return jax.jit(
        train_step,
        in_shardings=(repl, repl, batch_sharded),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_query_encode_fn(apply_fn: Callable, *, mesh: Optional[Mesh] = None,
                         data_axis: str = "data"):
    """Jitted inference-time query encoder (evaluate(), inference.py:116-154)."""

    def encode(params, ids, mask):
        return apply_fn(params, ids, mask, True)

    if mesh is None:
        return jax.jit(encode)
    repl = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(data_axis))
    return jax.jit(
        encode,
        in_shardings=(repl, sharded, sharded),
        out_shardings=repl,
    )
