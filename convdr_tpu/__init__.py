"""ConvDR-TPU: a TPU-native conversational dense retrieval framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of thunlp/ConvDR
(SIGIR 2021, "Few-Shot Conversational Dense Retrieval"):

  * data plane     -- binary token caches, conversational query datasets, ETL
  * models         -- flax bi-encoders (ANCE-style RoBERTa dot, DPR BERT towers)
  * ops            -- Pallas exact inner-product top-k retrieval kernels
  * parallel       -- jax.sharding mesh / shard_map based scaling (no NCCL)
  * train          -- jitted knowledge-distillation + ranking training
  * retrieval      -- blocked/sharded search drivers, TREC/OpenMatch writers
  * evaluation     -- in-process trec_eval-compatible metrics (NDCG@k, MRR, ...)

The compute path is jit/pjit over a `jax.sharding.Mesh`; collectives ride ICI
via shard_map, replacing the reference's NCCL + filesystem-pickle collectives.
"""

__version__ = "0.1.0"

from convdr_tpu.core.registry import MODEL_REGISTRY, get_model_config  # noqa: F401
