from convdr_tpu.parallel.mesh import (  # noqa: F401
    get_mesh,
    shard_batch,
    replicate,
)
from convdr_tpu.parallel.sharded_search import sharded_flat_ip_topk  # noqa: F401
