import jax
import jax.numpy as jnp
import numpy as np

from convdr_tpu.core.config import EncoderArchConfig, ModelConfig, TrainConfig
from convdr_tpu.models.encoders import AnceEncoder
from convdr_tpu.train.checkpoint import (
    latest_checkpoint,
    load_metadata,
    restore_checkpoint,
    save_checkpoint,
)
from convdr_tpu.train.trainer import create_train_state


def make_state():
    cfg = ModelConfig(
        name="rdot_nll",
        arch=EncoderArchConfig.tiny(vocab_size=32),
        embedding_dim=8,
    )
    model = AnceEncoder(config=cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    state, tx = create_train_state(params, TrainConfig(), total_steps=10)
    return state


def test_save_restore_roundtrip(tmp_path):
    state = make_state()
    path = str(tmp_path / "ckpt" / "checkpoint-5")
    save_checkpoint(path, state, metadata={"global_step": 5})
    restored = restore_checkpoint(path, state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert load_metadata(path) == {"global_step": 5}


def test_latest_checkpoint(tmp_path):
    state = make_state()
    for step in (3, 10, 7):
        save_checkpoint(str(tmp_path / f"checkpoint-{step}"), state)
    best = latest_checkpoint(str(tmp_path))
    assert best.endswith("checkpoint-10")


def test_latest_checkpoint_empty(tmp_path):
    assert latest_checkpoint(str(tmp_path)) is None
    assert latest_checkpoint(str(tmp_path / "missing")) is None


def test_loaded_checkpoint_params_are_device_committed(tmp_path):
    """Params restored through load_model_and_params must be jax.Arrays:
    host numpy trees passed to a jitted step re-upload the whole tree every
    call (measured ~0.4 GB and ~22 s PER STEP for a frozen BERT-base
    teacher through the TPU tunnel)."""
    from convdr_tpu.core.loading import load_model_and_params

    _cfg, _tok, _model, params = load_model_and_params(
        "rdot_nll", "init", arch_preset="tiny"
    )
    # the train driver persists the final model as a params-only tree
    # under <output_dir>/final (train/loop.py)
    save_checkpoint(str(tmp_path / "model" / "final"), params,
                    metadata={"model_type": "rdot_nll", "global_step": 1})
    # restore through the public loader (the orbax path returns numpy)
    _cfg2, _tok2, _model2, restored = load_model_and_params(
        "rdot_nll", str(tmp_path / "model"), arch_preset="tiny",
        tokenizer_path="tiny",
    )
    for leaf in jax.tree.leaves(restored):
        assert isinstance(leaf, jax.Array), type(leaf)
