from convdr_tpu.ops.exact_search import (  # noqa: F401
    flat_ip_topk,
    merge_topk,
    topk_oracle,
)
