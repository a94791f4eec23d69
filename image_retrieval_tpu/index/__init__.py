from image_retrieval_tpu.index.vector_index import ShardedVectorIndex  # noqa: F401
