"""Unified checkpointing: one orbax tree for params + optimizer + step.

The reference has two save-only formats and no mid-training resume
(SURVEY.md §5.4): HF ``save_pretrained`` dirs for rdot_nll
(run_convdr_train.py:216-227) and ``CheckpointState`` torch pickles for dpr
(dpr_utils.py:23-25). Here a single orbax checkpoint carries
``{params, opt_state, step}``, giving exact resume; the reference formats are
handled by the importers/exporter in :mod:`convdr_tpu.models.import_torch`
so published ANCE teachers load and trained students can be exported back.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state: Any, metadata: Optional[dict] = None) -> None:
    """Save a pytree (TrainState or bare params) to ``path`` (a directory).

    Overwrites an existing checkpoint (orbax refuses by default, which
    would crash re-runs / resumed runs into the same output_dir).
    """
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, state), force=True)
    ckptr.wait_until_finished()
    if metadata is not None:
        with open(os.path.join(path, "convdr_meta.json"), "w") as f:
            json.dump(metadata, f)


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint` into the template's
    structure (shapes/dtypes taken from ``template``)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=jax.tree.map(np.asarray, template))


def load_metadata(path: str) -> Optional[dict]:
    meta = os.path.join(os.path.abspath(path), "convdr_meta.json")
    if os.path.exists(meta):
        with open(meta) as f:
            return json.load(f)
    return None


def latest_checkpoint(output_dir: str, prefix: str = "checkpoint-") -> Optional[str]:
    """Find the highest-step ``checkpoint-N`` directory under ``output_dir``."""
    if not os.path.isdir(output_dir):
        return None
    best, best_no = None, -1
    for name in os.listdir(output_dir):
        if name.startswith(prefix):
            try:
                no = int(name[len(prefix):])
            except ValueError:
                continue
            if no > best_no:
                best, best_no = os.path.join(output_dir, name), no
    return best
