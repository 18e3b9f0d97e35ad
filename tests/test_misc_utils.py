import json

from convdr_tpu.utils.misc import (
    InputFeaturesPair,
    convert_to_string_id,
    get_checkpoint_no,
    get_latest_ann_data,
)


def test_convert_to_string_id():
    out = convert_to_string_id({1: {2: 0.5}, "a": {3: 1}})
    assert out == {"1": {"2": 0.5}, "a": {"3": 1}}


def test_get_checkpoint_no():
    assert get_checkpoint_no("/x/checkpoint-1500") == 1500
    assert get_checkpoint_no("run2/checkpoint-10") == 10


def test_get_latest_ann_data(tmp_path):
    assert get_latest_ann_data(str(tmp_path / "missing")) == (-1, None, None)
    for n in (1, 3):
        with open(tmp_path / f"ann_ndcg_{n}", "w") as f:
            json.dump({"ndcg": 0.1 * n}, f)
    no, data_path, meta = get_latest_ann_data(str(tmp_path))
    assert no == 3
    assert data_path.endswith("ann_training_data_3")
    assert meta == {"ndcg": 0.30000000000000004} or abs(meta["ndcg"] - 0.3) < 1e-9


def test_input_features_pair_json():
    pair = InputFeaturesPair(input_ids_a=[1, 2], label=1)
    parsed = json.loads(pair.to_json_string())
    assert parsed["input_ids_a"] == [1, 2]
    assert parsed["label"] == 1
