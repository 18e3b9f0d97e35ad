"""Device mesh construction and sharding helpers.

Replaces the reference's process-group ceremony (NCCL init at
/root/reference/drivers/gen_passage_embeddings.py:305-316, rank filtering at
utils/util.py:423-424) with a single :class:`jax.sharding.Mesh`: one program,
SPMD over the slice. Axes:

  * ``data``  -- batch sharding for encode/training (DP);
  * ``index`` -- passage-row sharding for retrieval (the TPU equivalent of
    FAISS's multi-GPU ``shard=True`` clone, run_convdr_inference.py:355-368).

On one chip both axes are size 1 and everything degenerates to plain jit.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(
    axis_names: Sequence[str] = ("data",),
    axis_sizes: Optional[Sequence[int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over available devices.

    With no explicit sizes, all devices go to the first axis and remaining
    axes get size 1.
    """
    devs = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = [len(devs)] + [1] * (len(axis_names) - 1)
    total = int(np.prod(axis_sizes))
    if total != len(devs):
        raise ValueError(
            f"Mesh wants {total} devices ({dict(zip(axis_names, axis_sizes))}) "
            f"but {len(devs)} are available"
        )
    arr = np.array(devs).reshape(axis_sizes)
    return Mesh(arr, axis_names)


def shard_batch(mesh: Mesh, x, axis: str = "data"):
    """Place array(s) with the leading dim sharded over ``axis``."""
    spec = P(axis)
    return jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, spec)), x
    )


def replicate(mesh: Mesh, x):
    """Fully replicate array(s) across the mesh."""
    return jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), x
    )


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m
