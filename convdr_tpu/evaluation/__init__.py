from convdr_tpu.evaluation.metrics import (  # noqa: F401
    evaluate_run,
    mean_metrics,
    mrr,
    ndcg_at_k,
    recall_at_k,
)
