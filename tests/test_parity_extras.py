"""Parity extras: ANCE process fns, QA answer matching, training resume."""

import numpy as np
import pytest

from convdr_tpu.data.process_fns import (
    dual_process_fn,
    triple2dual_process_fn,
    triple_process_fn,
)
from convdr_tpu.data.tokenizers import ByteLevelBPETokenizer
from convdr_tpu.evaluation.qa_eval import (
    SimpleTokenizer,
    check_answer,
    has_answer,
    hit_at_k,
)


@pytest.fixture()
def tok():
    return ByteLevelBPETokenizer.tiny()


# ---------------- process fns ----------------
def test_dual_process_fn(tok):
    rows = dual_process_fn("42\tsome passage text", 0, tok, 16)
    assert len(rows) == 1
    ids, mask, types, qid = rows[0]
    assert ids.shape == (16,) and mask.shape == (16,)
    assert qid == 42
    assert mask.sum() > 0


def test_dual_process_fn_bad_line(tok):
    with pytest.raises(ValueError):
        dual_process_fn("only one cell", 0, tok, 16)


def test_triple_process_fn(tok):
    rows = triple_process_fn("query\tpositive doc\tnegative doc", 0, tok, 16)
    assert len(rows) == 1
    assert len(rows[0]) == 6  # 3 x (ids, mask)


def test_triple2dual_process_fn(tok):
    rows = triple2dual_process_fn("q\tpos\tneg", 0, tok, 16)
    assert len(rows) == 2
    assert rows[0][-1] == 1 and rows[1][-1] == 0
    np.testing.assert_array_equal(rows[0][0], rows[1][0])  # same query ids


# ---------------- QA eval ----------------
def test_simple_tokenizer_words():
    words = SimpleTokenizer().tokenize("Hello, World! 42").words(uncased=True)
    assert words == ["hello", ",", "world", "!", "42"]


def test_has_answer_window_match():
    assert has_answer(["the cat"], "I saw the cat yesterday")
    assert not has_answer(["the dog"], "I saw the cat yesterday")
    assert has_answer(["CAT"], "the cat")  # uncased
    assert not has_answer(["cat"], None)


def test_check_answer_and_hit_at_k():
    passages = {0: "about dogs", 1: ("the cat sat", "title"), 2: "nothing"}
    hits = check_answer(passages, ["cat"], [0, 1, 2])
    assert hits == [False, True, False]
    assert not hit_at_k(hits, 1)
    assert hit_at_k(hits, 2)


# ---------------- training resume ----------------
def test_train_resume_continues_step_count(tmp_path):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from convdr_tpu.core.config import EncoderArchConfig, ModelConfig, TrainConfig
    from convdr_tpu.models.encoders import AnceEncoder
    from convdr_tpu.train.loop import train_one_model

    cfg = ModelConfig(
        name="rdot_nll", arch=EncoderArchConfig.tiny(vocab_size=64),
        embedding_dim=8,
    )
    model = AnceEncoder(config=cfg)
    rng = np.random.RandomState(0)

    class FakeDataset:
        mode = "train"
        ranking_task = False

        def __len__(self):
            return 8

        def batches(self, batch_size, **kw):
            for _ in range(8 // batch_size):
                ids = rng.randint(4, 60, size=(batch_size, 8)).astype(np.int32)
                yield {
                    "concat_ids": ids,
                    "concat_mask": np.ones_like(ids),
                    "target_ids": ids,
                    "target_mask": np.ones_like(ids),
                }

    ids0 = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids0, jnp.ones_like(ids0))
    teacher = model.init(jax.random.PRNGKey(1), ids0, jnp.ones_like(ids0))

    def apply_fn(p, i, m, is_query):
        method = model.query_emb if is_query else model.body_emb
        return model.apply(p, i, m, method=method)

    out_dir = str(tmp_path / "run")
    tcfg = TrainConfig(per_device_batch_size=4, num_train_epochs=2.0,
                       save_steps=2, learning_rate=1e-3)
    # the jitted step donates state buffers: fresh param copies per phase
    params1 = jax.tree.map(jnp.copy, params)
    params2 = jax.tree.map(jnp.copy, params)
    # phase 1: stop after 2 steps (max_steps), checkpoint written at step 2
    t1 = dataclasses.replace(tcfg, max_steps=2)
    _, step1, _ = train_one_model(
        FakeDataset(), apply_fn, params1, apply_fn, teacher, t1,
        output_dir=out_dir,
    )
    assert step1 == 2

    # phase 2: resume; step counter continues past the checkpoint
    _, step2, _ = train_one_model(
        FakeDataset(), apply_fn, params2, apply_fn, teacher, tcfg,
        output_dir=out_dir, resume=True,
    )
    assert step2 > 2
