"""Milvus-compat shim + exact pair-sampling parity with the reference RNG."""

import numpy as np
import pytest

from image_retrieval_tpu.index.compat import Collection, has_collection, drop_collection


def test_milvus_style_usage(rng):
    drop_collection("image_embeddings")
    collection = Collection("image_embeddings", dim=64)
    emb = rng.normal(size=(50, 64)).astype(np.float32)
    mags = np.linalg.norm(emb, axis=1)
    unit = emb / mags[:, None]
    paths = [f"p{i}.jpg" for i in range(50)]
    collection.insert([paths, unit, mags])
    collection.flush()
    assert collection.num_entities == 50
    assert has_collection("image_embeddings")
    collection.create_index("embedding", {"metric_type": "COSINE"})
    collection.load()
    q = unit[3]
    results = collection.search(
        data=[q],
        anns_field="embedding",
        param={"metric_type": "COSINE", "params": {"nprobe": 10}},
        limit=5,
        output_fields=["image_path", "embedding", "magnitude"],
    )
    hit = results[0][0]
    assert hit.entity.get("image_path") == "p3.jpg"  # self-match first
    assert hit.score == pytest.approx(1.0, abs=1e-5)
    np.testing.assert_allclose(hit.entity.get("embedding"), unit[3], atol=1e-6)
    rows = collection.query(expr="id >= 0", output_fields=["image_path", "magnitude"],
                            limit=10)
    assert len(rows) == 10 and rows[0]["image_path"] == "p0.jpg"
    collection.release()
    # reopening by name shares the stored data (server-side persistence analog)
    again = Collection("image_embeddings")
    assert again.num_entities == 50


def reference_sample_loop(n, max_comparisons, seed=42):
    """The reference's sampling loop restated verbatim-semantically
    (mi_analysis.py:54,63-75) with its O(n) list dedup."""
    import random

    random.seed(seed)
    indices = list(range(n))
    sampled = []
    for _ in range(max_comparisons):
        i, j = random.sample(indices, 2)
        if i > j:
            i, j = j, i
        if (i, j) not in sampled:
            sampled.append((i, j))
    return sampled


def test_pair_sampling_matches_reference_rng(rng):
    from image_retrieval_tpu.analysis.pair_mi import PairMIAnalysis

    embs = [(f"i{i}", rng.normal(size=8).astype(np.float32)) for i in range(25)]
    an = PairMIAnalysis(embs, num_pairs=30, max_comparisons=120)
    ours, _ = an._sample_index_pairs()
    want = reference_sample_loop(25, 120)
    assert ours == want


def test_collection_l2_metric_and_drop(rng):
    from image_retrieval_tpu.index.compat import Collection, drop_collection, has_collection

    drop_collection("tmp_l2")
    col = Collection("tmp_l2", dim=32)
    emb = rng.normal(size=(20, 32)).astype(np.float32)
    col.insert([[f"x{i}" for i in range(20)], emb / np.linalg.norm(emb, axis=1, keepdims=True),
                np.linalg.norm(emb, axis=1)][0:3])
    # L2 scores magnitude-reconstructed vectors, so query with the original
    res = col.search(data=[emb[5]], param={"metric_type": "L2"},
                     limit=3, output_fields=["image_path"])
    assert res[0][0].entity.get("image_path") == "x5"  # exact self-match
    drop_collection("tmp_l2")
    assert not has_collection("tmp_l2")


def test_collection_schema_and_metric_validation(rng):
    """Explicit dim conflicts and unsupported metric types raise instead of
    silently returning wrong results; empty collections return empty hits
    (pymilvus behavior), not errors."""
    import pytest as _pytest

    from image_retrieval_tpu.index.compat import Collection, drop_collection

    drop_collection("val_test")
    c = Collection("val_test", dim=32)
    # empty search -> empty hit lists, not ValueError
    res = c.search([rng.normal(size=32).astype(np.float32)], limit=3)
    assert res == [[]]
    # opening by name without dim works; explicit conflicting dim raises
    assert Collection("val_test")._impl.dim == 32
    with _pytest.raises(ValueError, match="dim"):
        Collection("val_test", dim=128)
    # unsupported metric_type raises instead of silently remapping
    c.insert([["a"], rng.normal(size=(1, 32)).astype(np.float32)])
    with _pytest.raises(ValueError, match="metric_type"):
        c.search([rng.normal(size=32).astype(np.float32)],
                 param={"metric_type": "IP"}, limit=1)
    drop_collection("val_test")
