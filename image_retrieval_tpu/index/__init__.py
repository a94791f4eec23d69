from image_retrieval_tpu.index.vector_index import ShardedVectorIndex  # noqa: F401
from image_retrieval_tpu.index.screen import ScreenedSearch  # noqa: F401
from image_retrieval_tpu.index.plan import IndexPlan, plan_index  # noqa: F401
from image_retrieval_tpu.index.journal import IndexJournal  # noqa: F401
