from image_retrieval_tpu.app.embed import ImageEmbeddingSystem  # noqa: F401
from image_retrieval_tpu.app.search import TextImageSearcher  # noqa: F401
from image_retrieval_tpu.app.pipeline import ImageSearchApp, SimpleSearcher, run_color_analysis  # noqa: F401
