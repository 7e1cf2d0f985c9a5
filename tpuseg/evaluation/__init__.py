from tpuseg.evaluation.metrics import (
    fast_hist,
    fast_hist_jax,
    eval_metrics_from_hist,
    format_evaluate_results,
)

__all__ = [
    "fast_hist",
    "fast_hist_jax",
    "eval_metrics_from_hist",
    "format_evaluate_results",
]
