"""Optimizer factory: AdamW + linear warmup/decay with no-decay groups.

Mirrors the reference's ``get_optimizer`` (/root/reference/utils/dpr_utils.py:80-87
-- weight decay excluded for biases and LayerNorm weights) and the linear
warmup schedule (run_convdr_train.py:71-74), plus global-norm gradient
clipping at ``max_grad_norm`` (run_convdr_train.py:188-189), all as one optax
chain so the whole update stays inside the jitted train step.
"""

from __future__ import annotations

from typing import Any

import optax

from convdr_tpu.core.config import TrainConfig


def _decay_mask(params: Any) -> Any:
    """No-decay leaves: every ``bias`` plus LayerNorm ``scale`` (reference
    no_decay = ['bias', 'LayerNorm.weight'])."""

    def mask_path(path, _leaf) -> bool:
        keys = [getattr(k, "key", str(k)) for k in path]
        leaf_name = keys[-1]
        if leaf_name == "bias":
            return False
        if leaf_name == "scale":  # LayerNorm/RMSNorm scale
            return False
        return True

    import jax

    return jax.tree_util.tree_map_with_path(mask_path, params)


def linear_warmup_decay(
    learning_rate: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    """0 -> lr over warmup, then lr -> 0 at total_steps (HF linear schedule)."""
    warmup = optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1))
    decay = optax.linear_schedule(
        learning_rate, 0.0, max(total_steps - warmup_steps, 1)
    )
    return optax.join_schedules([warmup, decay], [warmup_steps])


def make_optimizer(
    config: TrainConfig, total_steps: int
) -> optax.GradientTransformation:
    schedule = linear_warmup_decay(
        config.learning_rate, config.warmup_steps, total_steps
    )
    tx = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adamw(
            learning_rate=schedule,
            b1=0.9,
            b2=0.999,
            eps=config.adam_epsilon,
            weight_decay=config.weight_decay,
            mask=_decay_mask if config.weight_decay > 0 else None,
        ),
    )
    if config.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, config.gradient_accumulation_steps)
    return tx
