"""Model/tokenizer/params loading: the ``load_model`` equivalent.

Mirrors /root/reference/utils/util.py:241-280 but handles three checkpoint
flavors transparently:

  * **reference torch formats** -- HF ``save_pretrained`` dirs
    (pytorch_model.bin/model.safetensors) and DPR CheckpointState files,
    via :mod:`convdr_tpu.models.import_torch`;
  * **native orbax checkpoints** -- directories written by
    :mod:`convdr_tpu.train.checkpoint` (identified by ``convdr_meta.json``);
  * **fresh init** -- checkpoint path ``None``/"init".

Tokenizers load from vocab files colocated with the checkpoint, an explicit
path, or the deterministic "tiny" test vocab.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from convdr_tpu.core.config import ModelConfig
from convdr_tpu.core.registry import get_model_config
from convdr_tpu.data.tokenizers import (
    ByteLevelBPETokenizer,
    WordPieceTokenizer,
)
from convdr_tpu.models.encoders import build_model


def load_tokenizer_for(
    config: ModelConfig, path: Optional[str]
) -> Any:
    """Resolve a tokenizer for a checkpoint path.

    None/"tiny"/"init" -> the deterministic test vocab. A directory must
    contain vocab files (itself or, for single-file checkpoints such as DPR
    ``.cp`` files, its parent directory). A path that names no vocab raises
    instead of silently degrading to the tiny vocab -- mis-tokenization
    silently destroys retrieval quality.
    """
    cls = (
        ByteLevelBPETokenizer
        if config.tokenizer_kind == "roberta"
        else WordPieceTokenizer
    )
    if path in (None, "tiny", "init"):
        return cls.tiny()
    vocab_marker = (
        "vocab.json" if config.tokenizer_kind == "roberta" else "vocab.txt"
    )
    candidates = []
    if os.path.isdir(path):
        candidates.append(path)
    elif os.path.isfile(path):
        # single-file checkpoint (e.g. DPR CheckpointState): vocab lives
        # next to it
        candidates.append(os.path.dirname(path) or ".")
    for cand in candidates:
        if os.path.exists(os.path.join(cand, vocab_marker)):
            return cls.from_pretrained(cand)
    raise FileNotFoundError(
        f"No {vocab_marker} found for tokenizer at {path!r}; pass "
        "tokenizer_path explicitly (or 'tiny' for the test vocab)"
    )


def _resolve_orbax_dir(path: str) -> Optional[str]:
    """Return the orbax tree dir for ``path`` (itself, or its ``final``
    subdirectory as written by the train driver), else None."""
    if not os.path.isdir(path):
        return None
    for cand in (path, os.path.join(path, "final")):
        if os.path.isdir(cand) and (
            os.path.exists(os.path.join(cand, "convdr_meta.json"))
            or os.path.exists(os.path.join(cand, "_CHECKPOINT_METADATA"))
        ):
            return cand
    return None


def _is_torch_checkpoint(path: str) -> bool:
    if os.path.isdir(path):
        return any(
            os.path.exists(os.path.join(path, n))
            for n in ("pytorch_model.bin", "model.safetensors")
        )
    return os.path.isfile(path)


def init_params(model, config: ModelConfig, seed: int = 0):
    ids = jnp.ones((1, 8), jnp.int32)
    return model.init(jax.random.PRNGKey(seed), ids, jnp.ones_like(ids))


def resize_token_embeddings(params, new_size: int, seed: int = 0):
    """Grow word-embedding tables to ``new_size`` rows (normal(0, 0.02) init),
    the equivalent of HF ``resize_token_embeddings`` after ``add_tokens``
    (run_convdr_train.py:472-474)."""
    rng = np.random.RandomState(seed)

    def resize(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for key, val in tree.items():
            if key == "word_embeddings" and isinstance(val, dict):
                emb = np.asarray(val["embedding"])
                if emb.shape[0] < new_size:
                    extra = rng.normal(
                        0.0, 0.02, size=(new_size - emb.shape[0], emb.shape[1])
                    ).astype(emb.dtype)
                    val = {"embedding": np.concatenate([emb, extra], axis=0)}
            out[key] = resize(val) if isinstance(val, dict) else val
        return out

    return resize(params)


def gelu_arch_overrides(gelu: str, dtype_name: str) -> Optional[dict]:
    """Resolve a driver ``--gelu {auto,erf,tanh}`` flag to arch overrides.

    "auto" picks tanh under bf16 compute (where the erf/tanh difference is
    below the bf16 noise floor and tanh is ~20% faster on v5e) and exact
    erf under f32 (checkpoint-import numerical parity).
    """
    if gelu not in ("auto", "erf", "tanh"):
        raise ValueError(f"unknown gelu flavor {gelu!r}")
    use_tanh = gelu == "tanh" or (gelu == "auto" and dtype_name == "bfloat16")
    return {"gelu_approximate": True} if use_tanh else None


def load_model_and_params(
    model_type: str,
    checkpoint_path: Optional[str],
    *,
    tokenizer_path: Optional[str] = None,
    dtype=jnp.float32,
    arch_preset: Optional[str] = None,
    arch_overrides: Optional[dict] = None,
    extra_tokens: Tuple[str, ...] = (),
    seed: int = 0,
):
    """Returns (config, tokenizer, model, params).

    arch_preset "tiny" swaps in the miniature architecture (hermetic tests /
    smoke runs); None keeps the registry's base architecture.
    """
    from convdr_tpu.core.config import EncoderArchConfig

    config = get_model_config(model_type)
    tokenizer = load_tokenizer_for(
        config, tokenizer_path or checkpoint_path
    )
    for tok in extra_tokens:
        tokenizer.add_tokens([tok])

    arch = config.arch
    if arch_preset == "tiny":
        arch = EncoderArchConfig.tiny(
            vocab_size=len(tokenizer) + 8,
            roberta=config.tokenizer_kind == "roberta",
        )
        config = dataclasses.replace(
            config,
            embedding_dim=min(config.embedding_dim, 32),
            chunk_len=min(config.chunk_len, 32),
        )
    updates = dict(arch_overrides or {})
    vocab_needed = len(tokenizer)
    if vocab_needed > updates.get("vocab_size", arch.vocab_size):
        updates["vocab_size"] = vocab_needed
    if updates:
        arch = dataclasses.replace(arch, **updates)
    # Unconditionally: `arch` may differ from config.arch via the tiny
    # preset alone (updates empty) -- gating this on `updates` silently
    # built the BASE architecture for tiny runs.
    config = dataclasses.replace(config, arch=arch)

    # Keep the tokenizer's declared capacity in sync with the actual
    # position-embedding table so driver-side clamps
    # (min(max_concat_length, max_len_single_sentence)) are meaningful.
    tokenizer.model_max_length = (
        config.arch.max_position_embeddings - config.arch.position_offset
    )

    model = build_model(config, dtype=dtype)

    orbax_dir = (
        _resolve_orbax_dir(checkpoint_path)
        if checkpoint_path not in (None, "init")
        else None
    )
    if checkpoint_path in (None, "init"):
        params = init_params(model, config, seed)
    elif orbax_dir is not None:
        from convdr_tpu.train.checkpoint import restore_checkpoint

        template = init_params(model, config, seed)
        params = restore_checkpoint(orbax_dir, template)
    elif _is_torch_checkpoint(checkpoint_path):
        from convdr_tpu.models.import_torch import import_reference_checkpoint

        params = import_reference_checkpoint(checkpoint_path, config)
        params = {"params": resize_token_embeddings(
            params["params"], config.arch.vocab_size, seed
        )}
    else:
        raise FileNotFoundError(f"No checkpoint at {checkpoint_path}")

    # Checkpoint restore / torch import return HOST numpy trees; committing
    # them here makes the residency uniform with the `init` branch. Without
    # this every jitted call that takes the tree as an argument re-uploads
    # it (measured: a frozen BERT-base teacher cost ~0.4 GB and ~22 s PER
    # STEP through the TPU tunnel). Mesh users still re-shard once with an
    # explicit NamedSharding (train/loop.py).
    import jax

    params = jax.tree.map(
        lambda x: x if isinstance(x, jax.Array) else jax.device_put(x), params
    )

    return config, tokenizer, model, params


def make_apply_fn(model):
    """(params, ids, mask, is_query[, rngs]) -> embeddings.

    Passing ``rngs={"dropout": key}`` switches the encoder to stochastic
    mode (training-time dropout, reference parity); without it the pass is
    deterministic.
    """

    def apply_fn(params, ids, mask, is_query, rngs=None):
        method = model.query_emb if is_query else model.body_emb
        if rngs is not None:
            return model.apply(
                params, ids, mask, False, method=method, rngs=rngs
            )
        return model.apply(params, ids, mask, method=method)

    return apply_fn
