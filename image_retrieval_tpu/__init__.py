"""image_retrieval_tpu — a TPU-native text→image retrieval framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
MeltingCrystals/Image-Retrieval- (reference mounted at /root/reference):

- CLIP ViT-B/32 image+text embedding (Flax, pjit-sharded)           -> models/
- geometric distance/similarity metric library (batched, fused)     -> ops/
- sharded exact vector index replacing Milvus                       -> index/
- mutual-information analysis engine (vectorized, on-device)        -> analysis/
- color-controlled dataset builder                                  -> data/
- application facade + CLI                                          -> app/
- contrastive training over a device mesh                           -> train/
- mesh/sharding utilities and collectives                           -> parallel/

Reference parity contracts preserved (see each module's docstring):
  results.json schema   (reference mi_analysis.py:1240-1260)
  pairs.json schema     (reference imageProcessing.py:549-561)
  metadata.csv schema   (reference imageProcessing.py:389-394)
  search result dicts   (reference app_pipeline.py:165-168, image_search.py:182-193)
  similarity params     (reference app_pipeline.py:379-385)
"""

__version__ = "0.1.0"

from image_retrieval_tpu.config import Config, default_config  # noqa: F401
