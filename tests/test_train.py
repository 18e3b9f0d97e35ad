import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convdr_tpu.core.config import EncoderArchConfig, ModelConfig, TrainConfig
from convdr_tpu.models.encoders import AnceEncoder
from convdr_tpu.parallel.mesh import get_mesh
from convdr_tpu.train.losses import (
    in_batch_nll_loss,
    kd_mse_loss,
    ranking_nll_loss,
)
from convdr_tpu.train.optimizer import linear_warmup_decay, make_optimizer
from convdr_tpu.train.ranking_data import (
    DocumentTokenizerCache,
    sample_ranking_batch,
)
from convdr_tpu.train.trainer import (
    TrainState,
    create_train_state,
    make_query_encode_fn,
    make_train_step,
)
from convdr_tpu.data.tokenizers import ByteLevelBPETokenizer


def tiny_cfg():
    return ModelConfig(
        name="rdot_nll",
        arch=EncoderArchConfig.tiny(vocab_size=64),
        embedding_dim=16,
    )


def make_setup(rng, batch=4, length=12, ranking=False, num_negatives=2):
    cfg = tiny_cfg()
    model = AnceEncoder(config=cfg)
    ids = jnp.asarray(rng.randint(4, 60, size=(batch, length)), jnp.int32)
    mask = jnp.ones((batch, length), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    teacher_params = model.init(jax.random.PRNGKey(1), ids, mask)

    def apply_fn(p, i, m, is_query):
        method = model.query_emb if is_query else model.body_emb
        return model.apply(p, i, m, method=method)

    tcfg = TrainConfig(
        learning_rate=1e-3,
        ranking_task=ranking,
        num_negatives=num_negatives,
    )
    batch_dict = {
        "concat_ids": ids,
        "concat_mask": mask,
        "target_ids": ids,
        "target_mask": mask,
    }
    if ranking:
        k = num_negatives + 1
        batch_dict["doc_ids"] = jnp.asarray(
            rng.randint(4, 60, size=(batch, k, length)), jnp.int32
        )
        batch_dict["doc_mask"] = jnp.ones((batch, k, length), jnp.int32)
    return cfg, model, apply_fn, params, teacher_params, tcfg, batch_dict


# ---------------- losses ----------------
def test_kd_mse_zero_for_identical():
    x = jnp.ones((3, 8))
    assert float(kd_mse_loss(x, x)) == 0.0


def test_kd_mse_matches_torch_semantics():
    a = jnp.asarray([[1.0, 2.0]])
    b = jnp.asarray([[0.0, 0.0]])
    np.testing.assert_allclose(float(kd_mse_loss(a, b)), 2.5)


def test_ranking_loss_prefers_positive():
    q = jnp.asarray([[1.0, 0.0]])
    good_docs = jnp.asarray([[[1.0, 0.0], [-1.0, 0.0]]])  # pos aligned
    bad_docs = jnp.asarray([[[-1.0, 0.0], [1.0, 0.0]]])  # neg aligned
    assert float(ranking_nll_loss(q, good_docs)) < float(
        ranking_nll_loss(q, bad_docs)
    )


def test_in_batch_nll_bounds():
    q = jnp.asarray([[1.0, 0.0]])
    pos = jnp.asarray([[2.0, 0.0]])
    neg = jnp.asarray([[-2.0, 0.0]])
    loss = float(in_batch_nll_loss(q, pos, neg))
    assert 0 < loss < 0.1


# ---------------- optimizer ----------------
def test_linear_schedule_shape():
    sched = linear_warmup_decay(1e-3, warmup_steps=10, total_steps=110)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-5)
    assert float(sched(60)) < 1e-3
    np.testing.assert_allclose(float(sched(110)), 0.0, atol=1e-9)


def test_decay_mask_excludes_bias_and_scale(rng):
    cfg, model, apply_fn, params, *_ = make_setup(rng)
    from convdr_tpu.train.optimizer import _decay_mask

    mask = _decay_mask(params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    for path, decay in flat:
        keys = [getattr(k, "key", str(k)) for k in path]
        if keys[-1] in ("bias", "scale"):
            assert not decay, keys
        elif keys[-1] in ("kernel", "embedding"):
            assert decay, keys


# ---------------- train step ----------------
def test_kd_step_decreases_loss(rng):
    cfg, model, apply_fn, params, teacher_params, tcfg, batch = make_setup(rng)
    state, tx = create_train_state(params, tcfg, total_steps=100)
    step = make_train_step(apply_fn, apply_fn, tx, tcfg)
    losses = []
    for _ in range(5):
        state, metrics = step(state, teacher_params, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5


def test_ranking_step_runs_and_reports(rng):
    cfg, model, apply_fn, params, teacher_params, tcfg, batch = make_setup(
        rng, ranking=True
    )
    state, tx = create_train_state(params, tcfg, total_steps=100)
    step = make_train_step(apply_fn, apply_fn, tx, tcfg)
    state, metrics = step(state, teacher_params, batch)
    assert "ranking_loss" in metrics and "mse_loss" in metrics
    assert np.isfinite(float(metrics["loss"]))


def test_no_mse_mode(rng):
    cfg, model, apply_fn, params, teacher_params, tcfg, batch = make_setup(
        rng, ranking=True
    )
    import dataclasses

    tcfg = dataclasses.replace(tcfg, no_mse=True)
    state, tx = create_train_state(params, tcfg, total_steps=100)
    step = make_train_step(apply_fn, apply_fn, tx, tcfg)
    state, metrics = step(state, teacher_params, batch)
    assert "mse_loss" not in metrics
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics["ranking_loss"]), rtol=1e-6
    )


def test_teacher_frozen(rng):
    """Teacher params receive no gradient: loss depends only on student."""
    cfg, model, apply_fn, params, teacher_params, tcfg, batch = make_setup(rng)
    state, tx = create_train_state(params, tcfg, total_steps=100)
    step = make_train_step(apply_fn, apply_fn, tx, tcfg)
    t0 = jax.tree.map(np.asarray, teacher_params)
    state, _ = step(state, teacher_params, batch)
    t1 = jax.tree.map(np.asarray, teacher_params)
    for a, b in zip(jax.tree.leaves(t0), jax.tree.leaves(t1)):
        np.testing.assert_array_equal(a, b)


def test_data_parallel_step_matches_single():
    """Sharded-batch step == unsharded step (grad psum correctness)."""
    mesh = get_mesh(("data",))
    rng = np.random.RandomState(123)  # local: independent of test order
    cfg, model, apply_fn, params, teacher_params, tcfg, batch = make_setup(
        rng, batch=8
    )
    # copy params: the train step donates its input state buffers
    params_copy = jax.tree.map(jnp.copy, params)
    state1, tx1 = create_train_state(params, tcfg, total_steps=100)
    step1 = make_train_step(apply_fn, apply_fn, tx1, tcfg)
    state1, m1 = step1(state1, teacher_params, batch)

    state2, tx2 = create_train_state(params_copy, tcfg, total_steps=100)
    step2 = make_train_step(apply_fn, apply_fn, tx2, tcfg, mesh=mesh)
    state2, m2 = step2(state2, teacher_params, batch)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-5
    )
    # fp32 reduction-order differences across shards pass through Adam's
    # grad normalization; allow a small fraction of the 1e-3 step size.
    for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_grad_accumulation(rng):
    import dataclasses

    cfg, model, apply_fn, params, teacher_params, tcfg, batch = make_setup(rng)
    tcfg2 = dataclasses.replace(tcfg, gradient_accumulation_steps=2)
    state, tx = create_train_state(params, tcfg2, total_steps=100)
    step = make_train_step(apply_fn, apply_fn, tx, tcfg2)
    p0 = jax.tree.leaves(jax.tree.map(np.asarray, state.params))
    state, _ = step(state, teacher_params, batch)
    p1 = jax.tree.leaves(jax.tree.map(np.asarray, state.params))
    # first micro-step: no update applied yet
    for a, b in zip(p0, p1):
        np.testing.assert_array_equal(a, b)
    state, _ = step(state, teacher_params, batch)
    p2 = jax.tree.leaves(jax.tree.map(np.asarray, state.params))
    assert any(not np.array_equal(a, b) for a, b in zip(p1, p2))


def test_query_encode_fn(rng):
    cfg, model, apply_fn, params, *_ = make_setup(rng)
    encode = make_query_encode_fn(apply_fn)
    ids = jnp.asarray(np.arange(24).reshape(2, 12) % 60, jnp.int32)
    mask = jnp.ones_like(ids)
    out = encode(params, ids, mask)
    assert out.shape == (2, 16)


# ---------------- ranking input pipeline ----------------
def test_sample_ranking_batch_shapes():
    tok = ByteLevelBPETokenizer.tiny()
    cache = DocumentTokenizerCache(tok, max_doc_length=16)
    docs = [
        ["title[SEP]pos text", "neg one", "neg two", "neg three"],
        ["pos only", "neg a", "neg b", "neg c"],
    ]
    rng = np.random.RandomState(0)
    ids, mask = sample_ranking_batch(docs, cache, num_negatives=2, rng=rng)
    assert ids.shape == (2, 3, 16)
    assert mask.shape == (2, 3, 16)
    assert ids.dtype == np.int32
    # slot 0 is always the positive
    pos_ids, _ = cache.encode("title[SEP]pos text")
    np.testing.assert_array_equal(ids[0, 0], pos_ids)


def test_sample_ranking_too_few_negatives():
    tok = ByteLevelBPETokenizer.tiny()
    cache = DocumentTokenizerCache(tok, max_doc_length=8)
    docs = [["pos", "only neg"]]
    rng = np.random.RandomState(0)
    ids, mask = sample_ranking_batch(docs, cache, num_negatives=3, rng=rng)
    assert ids.shape == (1, 4, 8)


def test_doc_cache_memoizes():
    tok = ByteLevelBPETokenizer.tiny()
    cache = DocumentTokenizerCache(tok, max_doc_length=8)
    a1 = cache.encode("same doc")
    a2 = cache.encode("same doc")
    assert a1 is a2


def test_dropout_training_mode(rng):
    """use_dropout=True: stochastic student pass (reference model.train()
    semantics), varying per step; teacher pass stays deterministic."""
    import dataclasses

    from convdr_tpu.core.loading import make_apply_fn

    cfg = tiny_cfg()
    model = AnceEncoder(config=cfg)
    ids = jnp.asarray(rng.randint(4, 60, size=(4, 12)), jnp.int32)
    mask = jnp.ones((4, 12), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    teacher_params = model.init(jax.random.PRNGKey(1), ids, mask)
    apply_fn = make_apply_fn(model)
    batch = {"concat_ids": ids, "concat_mask": mask,
             "target_ids": ids, "target_mask": mask}
    params2 = jax.tree.map(jnp.copy, params)  # step donates state buffers
    tcfg = TrainConfig(learning_rate=0.0, use_dropout=True)  # lr 0: isolate dropout
    state, tx = create_train_state(params, tcfg, total_steps=10)
    step = make_train_step(apply_fn, apply_fn, tx, tcfg)
    losses = []
    for _ in range(3):
        state, metrics = step(state, teacher_params, batch)
        losses.append(float(metrics["loss"]))
    # lr=0 keeps params fixed; loss still varies because dropout rng folds
    # in the step counter
    assert len(set(losses)) > 1, losses

    # deterministic mode: identical losses at lr 0
    tcfg2 = TrainConfig(learning_rate=0.0, use_dropout=False)
    state2, tx2 = create_train_state(params2, tcfg2, total_steps=10)
    step2 = make_train_step(apply_fn, apply_fn, tx2, tcfg2)
    losses2 = []
    for _ in range(3):
        state2, metrics2 = step2(state2, teacher_params, batch)
        losses2.append(float(metrics2["loss"]))
    assert len(set(losses2)) == 1, losses2


def test_in_batch_nll_multichunk_masks_empty_chunks():
    from convdr_tpu.train.losses import in_batch_nll_multichunk_loss

    q = jnp.asarray([[1.0, 0.0]])
    # pos: chunk0 aligned (score 1), chunk1 huge but EMPTY (masked)
    pos = jnp.asarray([[[1.0, 0.0], [100.0, 0.0]]])
    pos_mask = jnp.concatenate(
        [jnp.ones((1, 4), jnp.int32), jnp.zeros((1, 4), jnp.int32)], axis=1
    )
    # neg: one valid chunk scoring -1
    neg = jnp.asarray([[[-1.0, 0.0], [0.0, 0.0]]])
    neg_mask = pos_mask
    loss = float(in_batch_nll_multichunk_loss(q, pos, pos_mask, neg, neg_mask, 4))
    # logits [1, -1]: loss = -log softmax -> log(1 + e^-2)
    np.testing.assert_allclose(loss, np.log(1 + np.exp(-2.0)), rtol=1e-5)


def test_sample_ranking_batch_length_rungs():
    """Rung trimming keeps content and masks; width = smallest covering rung."""
    from convdr_tpu.data.tokenizers import ByteLevelBPETokenizer

    tok = ByteLevelBPETokenizer.tiny()
    cache = DocumentTokenizerCache(tok, max_doc_length=64)
    docs = [["short pos", "neg one", "neg two"],
            ["another positive doc", "n1", "n2"]]
    rng = np.random.RandomState(0)
    full_ids, full_mask = sample_ranking_batch(docs, cache, 2, rng)
    assert full_ids.shape[2] == 64
    longest = int(full_mask.sum(-1).max())
    assert longest <= 32, "fixture docs must be short enough to force a trim"
    rng = np.random.RandomState(0)
    ids, mask = sample_ranking_batch(docs, cache, 2, rng,
                                     length_rungs=(8, 16, 32, 64))
    # exact rung: the smallest of the ladder covering the longest doc
    expected_w = next(r for r in (8, 16, 32, 64) if r >= longest)
    assert ids.shape[2] == expected_w < 64
    np.testing.assert_array_equal(ids, full_ids[:, :, :expected_w])
    np.testing.assert_array_equal(mask, full_mask[:, :, :expected_w])
    # no valid tokens were cut off
    assert int(full_mask[:, :, expected_w:].sum()) == 0
    # a ladder whose top rung is below the longest doc falls back to full L
    rng = np.random.RandomState(0)
    ids2, _ = sample_ranking_batch(docs, cache, 2, rng,
                                   length_rungs=(4,))
    assert ids2.shape[2] == 64


def test_ranking_nll_multichunk_loss_masks_empty_chunks():
    from convdr_tpu.train.losses import ranking_nll_multichunk_loss

    rng = np.random.RandomState(0)
    b, k, c, e, L = 2, 3, 2, 8, 4
    q = jnp.asarray(rng.randn(b, e).astype(np.float32))
    docs = rng.randn(b, k, c, e).astype(np.float32)
    # chunk 1 of every doc is empty; poison its embedding with huge values
    docs_poison = docs.copy()
    docs_poison[:, :, 1, :] = 1e3
    mask = np.zeros((b, k, c * L), np.int32)
    mask[:, :, :L] = 1  # only chunk 0 valid
    l1 = ranking_nll_multichunk_loss(q, jnp.asarray(docs), jnp.asarray(mask), L)
    l2 = ranking_nll_multichunk_loss(
        q, jnp.asarray(docs_poison), jnp.asarray(mask), L
    )
    # empty-chunk scores are biased away: poisoned chunk must not matter
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    # but a valid chunk change must matter
    docs2 = docs.copy(); docs2[:, :, 0, :] *= 2.0
    l3 = ranking_nll_multichunk_loss(q, jnp.asarray(docs2), jnp.asarray(mask), L)
    assert abs(float(l3) - float(l1)) > 1e-6


def test_train_step_multichunk_ranking():
    """KD+ranking step with a multi-chunk teacher compiles and is finite."""
    import dataclasses

    from convdr_tpu.core.config import EncoderArchConfig, ModelConfig
    from convdr_tpu.core.loading import make_apply_fn
    from convdr_tpu.models.encoders import build_model

    chunk_len = 16
    cfg = ModelConfig(
        name="mc", arch=EncoderArchConfig.tiny(vocab_size=64),
        embedding_dim=16, multi_chunk=True, chunk_len=chunk_len,
    )
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    bs, concat, k, doclen = 2, 16, 3, chunk_len * 2
    ids = jnp.asarray(rng.randint(4, 60, (bs, concat)), jnp.int32)
    mask = jnp.ones((bs, concat), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    teacher = model.init(jax.random.PRNGKey(1), ids, mask)
    apply_fn = make_apply_fn(model)
    afn = lambda p, i, m, q: apply_fn(p, i, m, q)  # noqa: E731
    tcfg = TrainConfig(ranking_task=True, num_negatives=k - 1)
    state, tx = create_train_state(params, tcfg, total_steps=10)
    step = make_train_step(afn, afn, tx, tcfg)
    doc_mask = np.zeros((bs, k, doclen), np.int32)
    doc_mask[:, :, :chunk_len] = 1  # second chunk of every doc empty
    batch = {
        "concat_ids": ids, "concat_mask": mask,
        "target_ids": ids, "target_mask": mask,
        "doc_ids": jnp.asarray(rng.randint(4, 60, (bs, k, doclen)), jnp.int32),
        "doc_mask": jnp.asarray(doc_mask),
    }
    state, metrics = step(state, teacher, batch)
    assert np.isfinite(float(np.asarray(metrics["loss"])))
    assert np.isfinite(float(np.asarray(metrics["ranking_loss"])))
