"""Opt-in end-to-end quality rehearsal (slow: ~20 min on the CPU mesh).

Run with RUN_SLOW_REHEARSAL=1 to execute the full driver pipeline on the
synthetic structured corpus and assert KD training improves NDCG@3/MRR
(see scripts/rehearsal.py; TPU-scale runs are recorded in PARITY.md).
"""

import importlib.util
import os

import pytest


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW_REHEARSAL"),
    reason="set RUN_SLOW_REHEARSAL=1 to run the ~20 min e2e rehearsal",
)
def test_rehearsal_smoke(tmp_path):
    spec = importlib.util.spec_from_file_location(
        "rehearsal",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "rehearsal.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    summary = mod.main(["--workdir", str(tmp_path / "r"), "--smoke"])
    assert summary["trained"]["ndcg_cut_3"] > summary["baseline"]["ndcg_cut_3"]
