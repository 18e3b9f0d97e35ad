from convdr_tpu.retrieval.blocks import (  # noqa: F401
    load_embedding_block,
    iter_embedding_blocks,
    write_embedding_block,
)
from convdr_tpu.retrieval.searcher import BlockedSearcher  # noqa: F401
from convdr_tpu.retrieval.run_writer import write_run_outputs  # noqa: F401
from convdr_tpu.retrieval.ivf import IVFIndex  # noqa: F401
from convdr_tpu.retrieval.pq_index import PQIndex  # noqa: F401
