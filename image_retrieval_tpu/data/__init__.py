from image_retrieval_tpu.data.color import (  # noqa: F401
    classify_rgb,
    extract_dominant_color,
    dominant_colors_batch,
)
from image_retrieval_tpu.data.dataset import (  # noqa: F401
    ColorDatasetManager,
    prepare_color_dataset,
    CATEGORIES,
    COLORS,
)
