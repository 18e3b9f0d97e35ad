"""Importers for the reference's checkpoint formats -> flax param trees.

Two formats exist upstream (SURVEY.md §5.4):

  * HF ``save_pretrained`` directories holding a ``pytorch_model.bin`` /
    ``model.safetensors`` state dict for the ANCE rdot_nll models
    (/root/reference/drivers/run_convdr_train.py:216-227; keys include
    ``roberta.*``, ``embeddingHead.*``, ``norm.*`` per model/models.py:129-148);
  * DPR ``CheckpointState`` namedtuple dicts ``torch.save``d with
    ``model_dict`` keys ``question_model.* / ctx_model.*``
    (/root/reference/utils/dpr_utils.py:23-25,74-78).

Torch is used purely as a host-side deserializer (CPU); every tensor is
converted to numpy and laid out for the flax modules in
:mod:`convdr_tpu.models.transformer` (attention kernels reshaped to
``[hidden, heads, head_dim]`` DenseGeneral layout, torch ``[out, in]``
matrices transposed).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from convdr_tpu.core.config import EncoderArchConfig, ModelConfig


def _load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch state dict (file or HF dir) into numpy arrays."""
    import torch

    if os.path.isdir(path):
        for name in ("pytorch_model.bin", "model.safetensors"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(f"No model weights found under {path}")
    if path.endswith(".safetensors"):
        from safetensors.torch import load_file

        sd = load_file(path)
    else:
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model_dict" in sd:
            sd = sd["model_dict"]  # DPR CheckpointState._asdict()
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            for k, v in sd.items()}


def _strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    return out if out else sd


def _linear(sd, key):
    """torch Linear -> flax Dense: kernel [in, out], bias [out]."""
    return {
        "kernel": sd[key + ".weight"].T.copy(),
        "bias": sd[key + ".bias"].copy(),
    }


def _layer_norm(sd, key):
    return {"scale": sd[key + ".weight"].copy(), "bias": sd[key + ".bias"].copy()}


def _attention_in(sd, key, num_heads):
    """torch [H, H] proj -> DenseGeneral kernel [H, heads, head_dim]."""
    w = sd[key + ".weight"]  # [out, in]
    hidden = w.shape[1]
    head_dim = hidden // num_heads
    return {
        "kernel": w.T.reshape(hidden, num_heads, head_dim).copy(),
        "bias": sd[key + ".bias"].reshape(num_heads, head_dim).copy(),
    }


def _attention_out(sd, key, num_heads):
    """torch [H, H] out proj -> DenseGeneral kernel [heads, head_dim, H]."""
    w = sd[key + ".weight"]  # [out, in]
    hidden = w.shape[0]
    head_dim = w.shape[1] // num_heads
    return {
        "kernel": w.T.reshape(num_heads, head_dim, hidden).copy(),
        "bias": sd[key + ".bias"].copy(),
    }


def hf_encoder_to_flax(
    sd: Dict[str, np.ndarray], arch: EncoderArchConfig
) -> Dict[str, Any]:
    """HF BERT/RoBERTa encoder state dict -> TransformerEncoder param tree."""
    emb = "embeddings."
    tree: Dict[str, Any] = {
        "word_embeddings": {"embedding": sd[emb + "word_embeddings.weight"].copy()},
        "position_embeddings": {
            "embedding": sd[emb + "position_embeddings.weight"].copy()
        },
        "embeddings_norm": _layer_norm(sd, emb + "LayerNorm"),
    }
    if arch.type_vocab_size > 0 and emb + "token_type_embeddings.weight" in sd:
        tree["token_type_embeddings"] = {
            "embedding": sd[emb + "token_type_embeddings.weight"].copy()
        }
    for i in range(arch.num_layers):
        p = f"encoder.layer.{i}."
        tree[f"layer_{i}"] = {
            "attention": {
                "query": _attention_in(sd, p + "attention.self.query", arch.num_heads),
                "key": _attention_in(sd, p + "attention.self.key", arch.num_heads),
                "value": _attention_in(sd, p + "attention.self.value", arch.num_heads),
                "out": _attention_out(
                    sd, p + "attention.output.dense", arch.num_heads
                ),
            },
            "attention_norm": _layer_norm(sd, p + "attention.output.LayerNorm"),
            "intermediate": _linear(sd, p + "intermediate.dense"),
            "output": _linear(sd, p + "output.dense"),
            "output_norm": _layer_norm(sd, p + "output.LayerNorm"),
        }
    return tree


def import_ance_checkpoint(
    path: str, config: ModelConfig
) -> Dict[str, Any]:
    """HF dir / state-dict file for rdot_nll* -> AnceEncoder params."""
    sd = _load_torch_state_dict(path)
    backbone_sd = _strip_prefix(sd, "roberta.")
    params: Dict[str, Any] = {
        "backbone": hf_encoder_to_flax(backbone_sd, config.arch)
    }
    if config.projection_head:
        params["embedding_head"] = _linear(sd, "embeddingHead")
        params["head_norm"] = _layer_norm(sd, "norm")
    return {"params": params}


def import_dpr_checkpoint(path: str, config: ModelConfig) -> Dict[str, Any]:
    """DPR CheckpointState / BiEncoder state dict -> DPRBiEncoder params."""
    sd = _load_torch_state_dict(path)
    towers = {}
    for tower in ("question_model", "ctx_model"):
        tower_sd = _strip_prefix(sd, tower + ".")
        tower_sd = _strip_prefix(tower_sd, "bert.")
        towers[tower] = hf_encoder_to_flax(tower_sd, config.arch)
    return {"params": towers}


def import_reference_checkpoint(path: str, config: ModelConfig):
    if config.two_tower:
        return import_dpr_checkpoint(path, config)
    return import_ance_checkpoint(path, config)


def export_ance_checkpoint(params: Dict[str, Any], config: ModelConfig,
                           path: str) -> None:
    """Inverse of :func:`import_ance_checkpoint` (round-trip/interop)."""
    import torch

    p = params["params"]
    sd: Dict[str, Any] = {}

    def put(key, arr):
        sd[key] = torch.from_numpy(np.array(arr, copy=True))

    bb = p["backbone"]
    put("roberta.embeddings.word_embeddings.weight", bb["word_embeddings"]["embedding"])
    put(
        "roberta.embeddings.position_embeddings.weight",
        bb["position_embeddings"]["embedding"],
    )
    if "token_type_embeddings" in bb:
        put(
            "roberta.embeddings.token_type_embeddings.weight",
            bb["token_type_embeddings"]["embedding"],
        )
    put("roberta.embeddings.LayerNorm.weight", bb["embeddings_norm"]["scale"])
    put("roberta.embeddings.LayerNorm.bias", bb["embeddings_norm"]["bias"])
    arch = config.arch
    for i in range(arch.num_layers):
        lp = f"roberta.encoder.layer.{i}."
        lt = bb[f"layer_{i}"]
        for name in ("query", "key", "value"):
            k = lt["attention"][name]["kernel"]
            hidden = k.shape[0]
            put(lp + f"attention.self.{name}.weight", k.reshape(hidden, -1).T)
            put(lp + f"attention.self.{name}.bias",
                lt["attention"][name]["bias"].reshape(-1))
        ko = lt["attention"]["out"]["kernel"]
        hidden = ko.shape[-1]
        put(lp + "attention.output.dense.weight", ko.reshape(-1, hidden).T)
        put(lp + "attention.output.dense.bias", lt["attention"]["out"]["bias"])
        put(lp + "attention.output.LayerNorm.weight", lt["attention_norm"]["scale"])
        put(lp + "attention.output.LayerNorm.bias", lt["attention_norm"]["bias"])
        put(lp + "intermediate.dense.weight", lt["intermediate"]["kernel"].T)
        put(lp + "intermediate.dense.bias", lt["intermediate"]["bias"])
        put(lp + "output.dense.weight", lt["output"]["kernel"].T)
        put(lp + "output.dense.bias", lt["output"]["bias"])
        put(lp + "output.LayerNorm.weight", lt["output_norm"]["scale"])
        put(lp + "output.LayerNorm.bias", lt["output_norm"]["bias"])
    if config.projection_head:
        put("embeddingHead.weight", p["embedding_head"]["kernel"].T)
        put("embeddingHead.bias", p["embedding_head"]["bias"])
        put("norm.weight", p["head_norm"]["scale"])
        put("norm.bias", p["head_norm"]["bias"])
    torch.save(sd, path)
