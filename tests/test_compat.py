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


def test_partitions_lifecycle_and_scoped_ops(rng):
    """Milvus partitions: create/has/list, partition-routed insert,
    partition-scoped search/query, drop_partition deletes its rows.
    The hidden _partition column rides the same attribute-filter mask as
    user filters (index/filters.py), so scoped search compiles nothing."""
    from image_retrieval_tpu.index.compat import Collection, drop_collection

    drop_collection("parts")
    c = Collection("parts", dim=32)
    c.create_partition("summer")
    c.create_partition("winter")
    assert c.has_partition("summer") and not c.has_partition("autumn")
    assert c.partitions == ["_default", "summer", "winter"]

    def rows(n, tag):
        emb = rng.normal(size=(n, 32)).astype(np.float32)
        mags = np.linalg.norm(emb, axis=1)
        return [[f"{tag}{i}.jpg" for i in range(n)], emb / mags[:, None], mags]

    c.insert(rows(6, "s"), partition_name="summer")
    c.insert(rows(6, "w"), partition_name="winter")
    c.insert(rows(4, "d"))  # -> _default
    assert c.num_entities == 16
    with pytest.raises(ValueError, match="does not exist"):
        c.insert(rows(1, "x"), partition_name="autumn")

    q = rng.normal(size=32).astype(np.float32)
    hits = c.search([q], limit=16, partition_names=["summer"])[0]
    assert len(hits) == 6
    assert all(h.entity.get("image_path").startswith("s") for h in hits)
    hits = c.search([q], limit=16, partition_names=["summer", "winter"])[0]
    assert len(hits) == 12
    # expr AND partition compose
    hits = c.search([q], limit=16, expr="image_path != 's0.jpg'",
                    partition_names=["summer"])[0]
    assert len(hits) == 5
    with pytest.raises(ValueError, match="does not exist"):
        c.search([q], limit=3, partition_names=["autumn"])

    rows_q = c.query(expr="id >= 0", partition_names=["winter"],
                     output_fields=["image_path"])
    assert len(rows_q) == 6
    assert all(r["image_path"].startswith("w") for r in rows_q)

    assert c.drop_partition("winter") == 6
    assert not c.has_partition("winter")
    assert c.search([q], limit=16)[0].__len__() == 10  # winter rows gone
    with pytest.raises(ValueError, match="_default"):
        c.drop_partition("_default")
    # reopening by name keeps the partition registry
    again = Collection("parts")
    assert again.partitions == ["_default", "summer"]
    drop_collection("parts")


def test_partitions_default_when_column_absent(rng):
    """Rows inserted directly through ShardedVectorIndex (no shim) belong
    to _default when partition scoping is later used."""
    from image_retrieval_tpu.index.compat import Collection, drop_collection
    from image_retrieval_tpu.index.vector_index import ShardedVectorIndex

    drop_collection("parts_raw")
    idx = ShardedVectorIndex(dim=16)
    emb = rng.normal(size=(5, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    idx.insert([f"r{i}.jpg" for i in range(5)], emb)
    c = Collection("parts_raw", index=idx)
    q = rng.normal(size=16).astype(np.float32)
    assert len(c.search([q], limit=9, partition_names=["_default"])[0]) == 5
    c.create_partition("p1")
    assert c.search([q], limit=9, partition_names=["p1"])[0] == []
    drop_collection("parts_raw")


def test_search_batches_query_list(rng):
    """Collection.search ships the whole query list in ONE batched device
    dispatch (r5); per-query results must match single-query searches."""
    drop_collection("batched_search")
    c = Collection("batched_search", dim=32)
    emb = rng.normal(size=(40, 32)).astype(np.float32)
    mags = np.linalg.norm(emb, axis=1)
    unit = emb / mags[:, None]
    c.insert([[f"b{i}.jpg" for i in range(40)], unit, mags])
    queries = [unit[5], unit[17], unit[33]]
    batched = c.search(data=queries, limit=4,
                       output_fields=["image_path"])
    assert len(batched) == 3
    for qi, q in enumerate(queries):
        single = c.search(data=[q], limit=4, output_fields=["image_path"])
        assert ([h.entity.get("image_path") for h in batched[qi]]
                == [h.entity.get("image_path") for h in single[0]])
        np.testing.assert_allclose(
            [h.score for h in batched[qi]], [h.score for h in single[0]],
            rtol=1e-6)
    drop_collection("batched_search")


def test_search_empty_query_list(rng):
    """pymilvus returns [] for an empty data list, not an error — both on
    an empty collection and on one with live rows (r5 review finding)."""
    drop_collection("empty_query_list")
    c = Collection("empty_query_list", dim=16)
    assert c.search(data=[], limit=5) == []
    emb = rng.normal(size=(8, 16)).astype(np.float32)
    mags = np.linalg.norm(emb, axis=1)
    c.insert([[f"e{i}.jpg" for i in range(8)], emb / mags[:, None], mags])
    assert c.search(data=[], limit=5) == []
    drop_collection("empty_query_list")


def test_journaled_collection_double_open_is_safe(tmp_path):
    """Re-instantiating a registered journaled collection reuses the live
    journal instead of opening a second IndexJournal on the same directory
    (duplicate seqs / overwritten segments — r5 review); a DIFFERENT
    journal_dir for the same name refuses."""
    jd = str(tmp_path / "j")
    drop_collection("dbl")
    c1 = Collection("dbl", dim=16, journal_dir=jd)
    emb = np.eye(16, dtype=np.float32)[:3]
    c1.insert([[f"x{i}" for i in range(3)], emb, np.ones(3, np.float32)])
    c2 = Collection("dbl", journal_dir=jd)
    assert c2._impl is c1._impl  # same live index + journal
    c3 = Collection("dbl")      # plain reopen also reuses
    assert c3._impl is c1._impl
    with pytest.raises(ValueError, match="already open"):
        Collection("dbl", journal_dir=str(tmp_path / "other"))
    drop_collection("dbl")


def test_non_ascii_partition_names(rng):
    """Partition names outside ASCII must scope searches correctly (the
    json \\uXXXX escaping used to make them match zero rows; r5 review)."""
    drop_collection("uni")
    c = Collection("uni", dim=16)
    c.create_partition("café")
    emb = rng.normal(size=(4, 16)).astype(np.float32)
    unit = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    mags = np.ones(4, np.float32)
    c.insert([[f"c{i}" for i in range(2)], unit[:2], mags[:2]],
             partition_name="café")
    c.insert([[f"d{i}" for i in range(2)], unit[2:], mags[2:]])
    hits = c.search(data=[unit[0]], limit=4, partition_names=["café"],
                    output_fields=["image_path"])
    got = {h.entity.get("image_path") for h in hits[0]}
    assert got == {"c0", "c1"}
    assert c.drop_partition("café") == 2
    drop_collection("uni")
