from image_retrieval_tpu.parallel.mesh import make_mesh, shard_rows, replicate  # noqa: F401
from image_retrieval_tpu.parallel.collectives import sharded_search_topk  # noqa: F401
