from convdr_tpu.ops.exact_search import (  # noqa: F401
    flat_ip_topk,
    grouped_topk_last_axis,
    merge_topk,
    topk_oracle,
)
from convdr_tpu.ops.pallas_search import (  # noqa: F401
    dma_gather_groups,
    pallas_flat_ip_topk,
    streaming_flat_ip_topk,
)
from convdr_tpu.ops.quant import (  # noqa: F401
    Int8Quantizer,
    fit_int8_scales,
    int8_topk_oracle,
    quantize_passages,
    quantize_queries,
    rescore_candidates,
)
from convdr_tpu.ops.kmeans import assign_top_t, fit_kmeans  # noqa: F401
