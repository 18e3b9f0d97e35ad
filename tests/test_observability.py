"""Observability: metrics sink, phase timer, profiler trace capture."""

import glob
import json
import os

import jax
import jax.numpy as jnp

from convdr_tpu.utils.observability import (
    MetricsLogger,
    PhaseTimer,
    profile_trace,
)


def test_metrics_logger_and_phase_timer(tmp_path):
    m = MetricsLogger(str(tmp_path))
    m.log(1, {"loss": 2.5})
    with PhaseTimer("phase", sink=m, step=2):
        pass
    m.close()
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert rows[0]["loss"] == 2.5
    assert "phase_seconds" in rows[1]


def test_profile_trace_noop_without_dir():
    with profile_trace(""):
        pass
    with profile_trace(None):
        pass


def test_profile_trace_captures(tmp_path):
    """profile_trace writes a real xplane capture (works on the CPU backend
    too); wired into bench.py --profile_dir and the inference driver."""
    out = str(tmp_path / "trace")
    with profile_trace(out):
        jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64))).block_until_ready()
    captured = glob.glob(os.path.join(out, "**", "*.xplane.pb"),
                         recursive=True)
    assert captured, f"no xplane capture under {out}"
