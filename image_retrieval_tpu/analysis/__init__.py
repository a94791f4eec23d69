from image_retrieval_tpu.analysis.color_mi import ColorMIAnalyzer, analyze_color_embeddings  # noqa: F401
from image_retrieval_tpu.analysis.pair_mi import PairMIAnalysis, EnhancedPairMIAnalysis  # noqa: F401
