"""Import smoke test — the reference's test_basic.py (C12) as real asserts."""


def test_imports():
    from image_retrieval_tpu.analysis import ColorMIAnalyzer  # noqa: F401
    from image_retrieval_tpu.app.pipeline import ImageSearchApp
    from image_retrieval_tpu.index import ShardedVectorIndex  # noqa: F401
    from image_retrieval_tpu.models.encoder import FakeEncoder  # noqa: F401
    import matplotlib  # noqa: F401

    app = ImageSearchApp()  # instantiation is the one behavior the reference
    assert app.searcher.similarity_params["w_angle"] == 1.0  # exercises (test_basic.py:10)


def test_config_constants():
    from image_retrieval_tpu.config import EMBEDDING_DIM, BATCH_SIZE, SCORE_THRESHOLD

    assert EMBEDDING_DIM == 512
    assert BATCH_SIZE == 100
    assert SCORE_THRESHOLD == 0.25
