from image_retrieval_tpu.ops.metrics import (  # noqa: F401
    METRIC_NAMES,
    pairwise_metrics,
    pair_metrics,
    optimized_similarity,
    optimized_similarity_from_metrics,
    cosine_similarity,
)
from image_retrieval_tpu.ops.binning import discretize, bin_edges  # noqa: F401
from image_retrieval_tpu.ops.mi import mutual_info_from_labels, mutual_info_binned  # noqa: F401
from image_retrieval_tpu.ops.topk import exact_topk, topk_with_scores  # noqa: F401
