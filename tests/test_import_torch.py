"""Checkpoint-importer parity: HF torch encoders vs our flax encoders.

Builds randomly initialized HF models with miniature configs, imports their
state dicts through convdr_tpu.models.import_torch, and checks the flax
forward pass reproduces the torch reference numerics -- validating both the
key mapping and the transformer implementation (pooling, LN placement, GELU,
position-id construction).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convdr_tpu.core.config import EncoderArchConfig, ModelConfig
from convdr_tpu.models.encoders import AnceEncoder, DPRBiEncoder
from convdr_tpu.models.import_torch import (
    export_ance_checkpoint,
    hf_encoder_to_flax,
    import_ance_checkpoint,
    import_dpr_checkpoint,
)
from convdr_tpu.models.transformer import TransformerEncoder

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def tiny_arch_roberta():
    return EncoderArchConfig(
        vocab_size=100,
        hidden_size=32,
        num_layers=2,
        num_heads=2,
        intermediate_size=64,
        max_position_embeddings=66,
        type_vocab_size=1,
        layer_norm_eps=1e-5,
        position_offset=2,
        pad_token_id=1,
        hidden_dropout=0.0,
        attention_dropout=0.0,
    )


def tiny_hf_roberta(arch):
    cfg = transformers.RobertaConfig(
        vocab_size=arch.vocab_size,
        hidden_size=arch.hidden_size,
        num_hidden_layers=arch.num_layers,
        num_attention_heads=arch.num_heads,
        intermediate_size=arch.intermediate_size,
        max_position_embeddings=arch.max_position_embeddings,
        type_vocab_size=arch.type_vocab_size,
        layer_norm_eps=arch.layer_norm_eps,
        pad_token_id=arch.pad_token_id,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    model = transformers.RobertaModel(cfg, add_pooling_layer=False)
    model.eval()
    return model


def make_inputs(rng, arch, b=2, t=10):
    ids = rng.randint(3, arch.vocab_size, size=(b, t)).astype(np.int64)
    lens = np.array([t, t - 3])
    mask = (np.arange(t)[None, :] < lens[:, None]).astype(np.int64)
    ids = ids * mask + arch.pad_token_id * (1 - mask)
    return ids, mask


def test_backbone_parity_roberta(rng):
    arch = tiny_arch_roberta()
    hf = tiny_hf_roberta(arch)
    ids, mask = make_inputs(rng, arch)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    tree = hf_encoder_to_flax(
        {k: v.numpy() for k, v in hf.state_dict().items()}, arch
    )
    enc = TransformerEncoder(arch)
    out = enc.apply(
        {"params": tree}, jnp.asarray(ids), jnp.asarray(mask)
    )
    # Compare only valid positions: HF computes padded positions with
    # position-id 1 while we mask them; retrieval never reads them.
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(out)[valid], ref[valid], atol=2e-5, rtol=1e-4
    )


def test_ance_import_and_head(rng, tmp_path):
    arch = tiny_arch_roberta()
    hf = tiny_hf_roberta(arch)
    # compose an ANCE-style state dict: roberta.* + embeddingHead + norm
    sd = {"roberta." + k: v for k, v in hf.state_dict().items()}
    head = torch.nn.Linear(arch.hidden_size, 24)
    norm = torch.nn.LayerNorm(24)
    sd["embeddingHead.weight"] = head.weight.detach()
    sd["embeddingHead.bias"] = head.bias.detach()
    sd["norm.weight"] = norm.weight.detach()
    sd["norm.bias"] = norm.bias.detach()
    path = tmp_path / "pytorch_model.bin"
    torch.save(sd, str(path))

    cfg = ModelConfig(name="rdot_nll", arch=arch, embedding_dim=24)
    params = import_ance_checkpoint(str(path), cfg)
    model = AnceEncoder(config=cfg)
    ids, mask = make_inputs(rng, arch)
    emb = model.apply(
        params, jnp.asarray(ids), jnp.asarray(mask), method=model.query_emb
    )

    with torch.no_grad():
        seq = hf(torch.tensor(ids), attention_mask=torch.tensor(mask))
        ref = norm(head(seq.last_hidden_state[:, 0])).numpy()
    np.testing.assert_allclose(np.asarray(emb), ref, atol=2e-5, rtol=1e-4)


def test_ance_export_roundtrip(rng, tmp_path):
    arch = tiny_arch_roberta()
    cfg = ModelConfig(name="rdot_nll", arch=arch, embedding_dim=24)
    model = AnceEncoder(config=cfg)
    ids, mask = make_inputs(rng, arch)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask))
    out1 = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))

    path = tmp_path / "export.bin"
    export_ance_checkpoint(
        jax.tree.map(np.asarray, params), cfg, str(path)
    )
    params2 = import_ance_checkpoint(str(path), cfg)
    out2 = model.apply(params2, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_dpr_import(rng, tmp_path):
    arch = EncoderArchConfig(
        vocab_size=80,
        hidden_size=32,
        num_layers=2,
        num_heads=2,
        intermediate_size=64,
        max_position_embeddings=64,
        type_vocab_size=2,
        layer_norm_eps=1e-12,
        position_offset=0,
        pad_token_id=0,
        hidden_dropout=0.0,
        attention_dropout=0.0,
    )
    bcfg = transformers.BertConfig(
        vocab_size=arch.vocab_size,
        hidden_size=arch.hidden_size,
        num_hidden_layers=arch.num_layers,
        num_attention_heads=arch.num_heads,
        intermediate_size=arch.intermediate_size,
        max_position_embeddings=arch.max_position_embeddings,
        type_vocab_size=arch.type_vocab_size,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    q_tower = transformers.BertModel(bcfg, add_pooling_layer=False).eval()
    c_tower = transformers.BertModel(bcfg, add_pooling_layer=False).eval()
    state = {}
    for prefix, tower in (("question_model.", q_tower), ("ctx_model.", c_tower)):
        for k, v in tower.state_dict().items():
            state[prefix + k] = v
    # DPR CheckpointState shape: dict with model_dict
    path = tmp_path / "dpr.cp"
    torch.save(
        {
            "model_dict": state,
            "optimizer_dict": {},
            "scheduler_dict": {},
            "offset": 0,
            "epoch": 0,
            "encoder_params": {},
        },
        str(path),
    )

    cfg = ModelConfig(
        name="dpr", arch=arch, projection_head=False, two_tower=True
    )
    params = import_dpr_checkpoint(str(path), cfg)
    model = DPRBiEncoder(config=cfg)
    ids, mask = make_inputs(rng, arch)
    q = model.apply(params, jnp.asarray(ids), jnp.asarray(mask),
                    method=model.query_emb)
    b = model.apply(params, jnp.asarray(ids), jnp.asarray(mask),
                    method=model.body_emb)
    with torch.no_grad():
        ref_q = q_tower(torch.tensor(ids), attention_mask=torch.tensor(mask)
                        ).last_hidden_state[:, 0].numpy()
        ref_b = c_tower(torch.tensor(ids), attention_mask=torch.tensor(mask)
                        ).last_hidden_state[:, 0].numpy()
    np.testing.assert_allclose(np.asarray(q), ref_q, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(b), ref_b, atol=2e-5, rtol=1e-4)
