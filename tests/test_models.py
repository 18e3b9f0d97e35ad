import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convdr_tpu.core.config import EncoderArchConfig, ModelConfig
from convdr_tpu.models.encoders import (
    AnceEncoder,
    DPRBiEncoder,
    build_model,
    masked_mean,
    multi_chunk_scores,
    pool,
)


def tiny_model(multi_chunk=False, use_mean=False, chunk_len=16):
    arch = EncoderArchConfig.tiny(vocab_size=64)
    return ModelConfig(
        name="test",
        arch=arch,
        embedding_dim=24,
        use_mean=use_mean,
        projection_head=True,
        multi_chunk=multi_chunk,
        chunk_len=chunk_len,
    )


def make_batch(rng, b=2, t=16, vocab=64):
    ids = rng.randint(4, vocab, size=(b, t)).astype(np.int32)
    lens = rng.randint(2, t + 1, size=(b,))
    mask = (np.arange(t)[None, :] < lens[:, None]).astype(np.int32)
    ids = ids * mask + 1 * (1 - mask)  # pad id 1
    return jnp.asarray(ids), jnp.asarray(mask)


def test_ance_query_emb_shape(rng):
    cfg = tiny_model()
    model = AnceEncoder(config=cfg)
    ids, mask = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    emb = model.apply(params, ids, mask, method=model.query_emb)
    assert emb.shape == (2, 24)
    assert emb.dtype == jnp.float32


def test_ance_query_equals_body(rng):
    """rdot_nll: body_emb == query_emb (models.py:147-148)."""
    cfg = tiny_model()
    model = AnceEncoder(config=cfg)
    ids, mask = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    q = model.apply(params, ids, mask, method=model.query_emb)
    b = model.apply(params, ids, mask, method=model.body_emb)
    np.testing.assert_allclose(np.asarray(q), np.asarray(b), rtol=1e-6)


def test_padding_invariance(rng):
    """Extra padding must not change the embedding (masking correctness)."""
    cfg = tiny_model()
    model = AnceEncoder(config=cfg)
    ids, mask = make_batch(rng, b=1, t=16)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    emb1 = model.apply(params, ids, mask, method=model.query_emb)
    # pad out to 24 tokens
    ids2 = jnp.pad(ids, ((0, 0), (0, 8)), constant_values=1)
    mask2 = jnp.pad(mask, ((0, 0), (0, 8)))
    emb2 = model.apply(params, ids2, mask2, method=model.query_emb)
    np.testing.assert_allclose(np.asarray(emb1), np.asarray(emb2), atol=1e-5)


def test_multi_chunk_body_emb(rng):
    cfg = tiny_model(multi_chunk=True, chunk_len=16)
    model = AnceEncoder(config=cfg)
    ids, mask = make_batch(rng, b=2, t=16)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    # a 2-chunk document: [B, 32]
    ids2 = jnp.concatenate([ids, ids], axis=1)
    mask2 = jnp.concatenate([mask, jnp.zeros_like(mask)], axis=1)
    emb = model.apply(params, ids2, mask2, method=model.body_emb)
    assert emb.shape == (2, 2, 24)
    # chunk 0 must equal the single-chunk encoding
    single = model.apply(params, ids, mask, method=model.body_emb)
    # single-chunk body on multi_chunk model returns [B, 1, E]
    np.testing.assert_allclose(
        np.asarray(emb[:, 0]), np.asarray(single[:, 0]), atol=1e-5
    )


def test_multi_chunk_scoring_masks_empty_chunks():
    q = jnp.ones((1, 4))
    docs = jnp.stack(
        [jnp.concatenate([jnp.ones((1, 4)), 100 * jnp.ones((1, 4))], axis=0)]
    )  # [1, 2, 4]; chunk 1 has huge score but is invalid
    mask = jnp.concatenate(
        [jnp.ones((1, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32)], axis=1
    )
    scores = multi_chunk_scores(q, docs, mask, chunk_len=8)
    np.testing.assert_allclose(np.asarray(scores), [4.0])


def test_dpr_two_towers_differ(rng):
    arch = EncoderArchConfig.tiny(vocab_size=64, roberta=False)
    cfg = ModelConfig(name="dpr", arch=arch, projection_head=False,
                      two_tower=True, tokenizer_kind="bert")
    model = DPRBiEncoder(config=cfg)
    ids, mask = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    q = model.apply(params, ids, mask, method=model.query_emb)
    b = model.apply(params, ids, mask, method=model.body_emb)
    assert q.shape == (2, arch.hidden_size)
    assert not np.allclose(np.asarray(q), np.asarray(b))


def test_pooling_helpers():
    seq = jnp.asarray(np.arange(24, dtype=np.float32).reshape(1, 4, 6))
    mask = jnp.asarray([[1, 1, 0, 0]])
    mm = masked_mean(seq, mask)
    np.testing.assert_allclose(np.asarray(mm)[0, 0], 3.0)
    first = pool(seq, mask, use_mean=False)
    np.testing.assert_allclose(np.asarray(first)[0], np.arange(6.0))


def test_build_model_factory():
    assert isinstance(build_model(tiny_model()), AnceEncoder)
    arch = EncoderArchConfig.tiny(roberta=False)
    dpr = ModelConfig(name="dpr", arch=arch, two_tower=True,
                      projection_head=False)
    assert isinstance(build_model(dpr), DPRBiEncoder)


def test_jit_compiles_once(rng):
    cfg = tiny_model()
    model = AnceEncoder(config=cfg)
    ids, mask = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), ids, mask)

    @jax.jit
    def encode(p, i, m):
        return model.apply(p, i, m, method=model.query_emb)

    e1 = encode(params, ids, mask)
    e2 = encode(params, ids, mask)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))


def test_gelu_approximate_changes_outputs_slightly(rng):
    """gelu_approximate swaps erf->tanh GELU: outputs differ but stay close."""
    import dataclasses

    cfg = tiny_model()
    cfg_tanh = dataclasses.replace(
        cfg, arch=dataclasses.replace(cfg.arch, gelu_approximate=True)
    )
    ids, mask = make_batch(rng)
    params = AnceEncoder(config=cfg).init(jax.random.PRNGKey(0), ids, mask)
    e_erf = np.asarray(
        AnceEncoder(config=cfg).apply(params, ids, mask)
    )
    e_tanh = np.asarray(
        AnceEncoder(config=cfg_tanh).apply(params, ids, mask)
    )
    assert not np.array_equal(e_erf, e_tanh)
    rel = np.linalg.norm(e_erf - e_tanh) / np.linalg.norm(e_erf)
    assert rel < 0.05


def test_gelu_arch_overrides_resolution():
    from convdr_tpu.core.loading import gelu_arch_overrides

    assert gelu_arch_overrides("auto", "bfloat16") == {"gelu_approximate": True}
    assert gelu_arch_overrides("auto", "float32") is None
    assert gelu_arch_overrides("tanh", "float32") == {"gelu_approximate": True}
    assert gelu_arch_overrides("erf", "bfloat16") is None
    with pytest.raises(ValueError):
        gelu_arch_overrides("gelu", "float32")
