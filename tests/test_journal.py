"""Write-ahead journal durability for the sharded index (Milvus WAL
parity — reference docker-compose.yml persistence volume +
collection.flush(), ImageEmbeddingSystem.py:136-137).

Every test simulates a process crash by simply dropping the index object
without save() and re-opening the journal directory."""

import json
import os

import numpy as np
import pytest

from image_retrieval_tpu.config import IndexConfig
from image_retrieval_tpu.index.vector_index import ShardedVectorIndex


def _mk(journal_dir, dtype="float32", dim=32):
    return ShardedVectorIndex.open(
        str(journal_dir), config=IndexConfig(embedding_dim=dim, dtype=dtype))


def _rows(n, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, dim)).astype(np.float32)


def test_unflushed_save_free_inserts_survive_reopen(tmp_path):
    idx = _mk(tmp_path / "j")
    idx.insert([f"p{i}" for i in range(8)], _rows(8))
    idx.flush()
    del idx  # crash: no save()

    re = _mk(tmp_path / "j")
    assert re.paths == [f"p{i}" for i in range(8)]
    assert re.live_count == 8


def test_replay_preserves_search_results_exactly(tmp_path):
    emb = _rows(40, seed=3)
    idx = _mk(tmp_path / "j")
    idx.insert([f"p{i}" for i in range(40)], emb)
    q = _rows(1, seed=9)[0]
    want = idx.search(q, top_k=5)
    del idx

    re = _mk(tmp_path / "j")
    got = re.search(q, top_k=5)
    np.testing.assert_array_equal(np.asarray(want[1]), np.asarray(got[1]))
    np.testing.assert_allclose(np.asarray(want[0]), np.asarray(got[0]))


def test_deletes_and_compact_replay(tmp_path):
    idx = _mk(tmp_path / "j")
    idx.insert([f"p{i}" for i in range(10)], _rows(10))
    idx.delete(["p1", "p3"])
    idx.compact()
    idx.insert(["q0", "q1"], _rows(2, seed=5))
    idx.delete_rows([0])  # kills p0 (post-compact numbering)
    del idx

    re = _mk(tmp_path / "j")
    assert re.live_count == 9
    live = {re.paths[i] for i in np.flatnonzero(re.live_mask())}
    assert live == {"p2", "p4", "p5", "p6", "p7", "p8", "p9", "q0", "q1"}


def test_checkpoint_truncates_and_reopens_fast_path(tmp_path):
    jd = tmp_path / "j"
    idx = _mk(jd)
    idx.insert([f"p{i}" for i in range(6)], _rows(6))
    idx.checkpoint()
    # log truncated, segments GC'd, CURRENT points at the snapshot
    assert (jd / "CURRENT").exists()
    assert os.path.getsize(jd / "ops.jsonl") == 0
    assert not [f for f in os.listdir(jd) if f.startswith("seg-")]

    # post-checkpoint mutations land in the fresh log and replay on top
    idx.insert(["late"], _rows(1, seed=7))
    idx.delete(["p0"])
    del idx

    re = _mk(jd)
    assert re.live_count == 6
    assert "late" in re.paths
    assert re.live_mask()[re.paths.index("p0")] == False  # noqa: E712


def test_second_checkpoint_gcs_the_first(tmp_path):
    jd = tmp_path / "j"
    idx = _mk(jd)
    idx.insert(["a", "b"], _rows(2))
    idx.checkpoint()
    first = (jd / "CURRENT").read_text()
    idx.insert(["c"], _rows(1, seed=1))
    idx.checkpoint()
    second = (jd / "CURRENT").read_text()
    assert first != second
    assert not (jd / first).exists()  # old snapshot dir GC'd
    del idx
    re = _mk(jd)
    assert sorted(re.paths) == ["a", "b", "c"]


def test_torn_tail_is_ignored(tmp_path):
    jd = tmp_path / "j"
    idx = _mk(jd)
    idx.insert(["a", "b", "c"], _rows(3))
    idx.flush()
    del idx
    # simulate a crash mid-append: garbage partial record at the tail
    with open(jd / "ops.jsonl", "a") as f:
        f.write('{"op": "ins')

    re = _mk(jd)
    assert re.paths == ["a", "b", "c"]
    # and the journal keeps working after recovery
    re.insert(["d"], _rows(1, seed=2))
    del re
    re2 = _mk(jd)
    assert "d" in re2.paths


def test_torn_segment_drops_unflushed_tail(tmp_path):
    """GROUP COMMIT: segment payloads fsync at the flush() barrier, so a
    crash can leave a logged insert whose segment is torn. Recovery must
    keep everything up to the last flush and drop the torn record AND all
    records after it (they were never acknowledged durable)."""
    jd = tmp_path / "j"
    idx = _mk(jd)
    idx.insert(["a", "b"], _rows(2))
    idx.flush()  # barrier: a+b durable
    idx.insert(["c"], _rows(1, seed=1))      # seq of this seg gets torn
    idx.insert(["d"], _rows(1, seed=2))      # after the torn record
    seqs = sorted(int(f[4:-4]) for f in os.listdir(jd)
                  if f.startswith("seg-"))
    torn = seqs[-2]  # the "c" insert
    with open(jd / f"seg-{torn}.npz", "r+b") as f:
        f.truncate(8)  # simulate a page-cache loss mid-file

    re = _mk(jd)
    assert re.paths == ["a", "b"]  # d dropped too: it followed the tear
    # the journal keeps working after the truncation
    re.insert(["e"], _rows(1, seed=3))
    re.flush()
    del re
    re2 = _mk(jd)
    assert re2.paths == ["a", "b", "e"]


def test_flush_fsyncs_pending_segments(tmp_path):
    """After flush() no segment remains pending (the barrier covered
    them); before it, inserts accumulate pending fsyncs."""
    jd = tmp_path / "j"
    idx = _mk(jd)
    idx.insert(["a"], _rows(1))
    idx.insert(["b"], _rows(1, seed=1))
    assert len(idx._journal._pending_segs) == 2
    idx.flush()
    assert idx._journal._pending_segs == []


def test_int8_tier_replay_requantizes_identically(tmp_path):
    emb = _rows(30, seed=4)
    idx = _mk(tmp_path / "j", dtype="int8")
    idx.insert([f"p{i}" for i in range(30)], emb)
    q = _rows(1, seed=8)[0]
    want = idx.search(q, top_k=5)
    del idx

    re = _mk(tmp_path / "j", dtype="int8")
    got = re.search(q, top_k=5)
    np.testing.assert_array_equal(np.asarray(want[1]), np.asarray(got[1]))
    np.testing.assert_allclose(np.asarray(want[0]), np.asarray(got[0]))


def test_attrs_and_filtered_delete_replay(tmp_path):
    idx = _mk(tmp_path / "j")
    idx.insert(["a", "b", "c"], _rows(3),
               attrs={"color": ["red", "blue", "red"]})
    idx.delete_where("color == 'blue'")
    del idx

    re = _mk(tmp_path / "j")
    assert re.live_count == 2
    mask = re.filter_mask("color == 'red'")
    assert int(mask.sum()) == 2


def test_journal_records_are_json_clean(tmp_path):
    idx = _mk(tmp_path / "j")
    idx.insert(["a"], _rows(1), attrs={"n": [np.int64(3)]})
    with open(tmp_path / "j" / "ops.jsonl") as f:
        rec = json.loads(f.readline())
    assert rec["attrs"]["n"] == [3]


def test_unjournaled_index_checkpoint_raises(tmp_path):
    idx = ShardedVectorIndex(dim=16, config=IndexConfig(embedding_dim=16))
    with pytest.raises(ValueError):
        idx.checkpoint()
    idx.flush()  # no-op, must not raise


def test_reopen_without_config_recovers_tier(tmp_path):
    """A journal-only directory (no checkpoint yet) must still know its
    dim/dtype on reopen — the config is persisted at first open."""
    idx = _mk(tmp_path / "j", dtype="int8", dim=64)
    idx.insert(["a"], _rows(1, dim=64))
    del idx
    re = ShardedVectorIndex.open(str(tmp_path / "j"))  # no config arg
    assert re.dim == 64
    assert re.config.dtype == "int8"
    assert re.paths == ["a"]


def test_shim_collection_durable_across_processes(tmp_path):
    """pymilvus-shim surface: Collection(journal_dir=...) recovers state,
    including partition routing, exactly like a restarted Milvus server."""
    from image_retrieval_tpu.index import compat

    jd = str(tmp_path / "milvus")
    col = compat.Collection("jtest", dim=32, journal_dir=jd)
    col.create_partition("red")
    col.insert([["a", "b"], _rows(2)], partition_name="red")
    col.insert([["c"], _rows(1, seed=1)])
    col.flush()
    # simulate a process restart: wipe the registry, reopen from disk
    compat._REGISTRY.pop("jtest")
    re = compat.Collection("jtest2", dim=32, journal_dir=jd)
    assert re.num_entities == 3
    assert re.has_partition("red")
    hits = re.search([_rows(1, seed=2)[0]], "embedding",
                     {"metric_type": "COSINE"}, limit=3,
                     partition_names=["red"],
                     output_fields=["image_path"])
    got = {h.entity.get("image_path") for h in hits[0]}
    assert got == {"a", "b"}


def test_magnitudes_roundtrip_through_journal(tmp_path):
    emb = _rows(5, seed=6) * 3.7  # unnormalized
    idx = _mk(tmp_path / "j")
    idx.insert([f"p{i}" for i in range(5)], emb)
    want = idx.get_magnitudes(range(5))
    del idx
    re = _mk(tmp_path / "j")
    np.testing.assert_allclose(re.get_magnitudes(range(5)), want, rtol=1e-6)
    # reconstructed originals match too
    recon = dict(re.reconstruct_original_embeddings(limit=5))
    np.testing.assert_allclose(recon["p0"], emb[0], rtol=1e-5)


def test_idle_checkpoint_is_noop_and_preserves_snapshot(tmp_path):
    """checkpoint() twice with no mutations in between must NOT touch the
    live snapshot (the old code rmtree'd it as a 'leftover' and re-saved —
    a crash mid-save would have lost the whole index; r5 review)."""
    jd = tmp_path / "j"
    idx = _mk(jd)
    idx.insert(["a", "b", "c"], _rows(3))
    idx.checkpoint()
    snap = (jd / "CURRENT").read_text()
    snap_dir = jd / snap
    mtimes = {f: os.path.getmtime(snap_dir / f) for f in os.listdir(snap_dir)}

    idx.checkpoint()  # idle: nothing logged since the last one
    assert (jd / "CURRENT").read_text() == snap
    assert snap_dir.exists()
    assert {f: os.path.getmtime(snap_dir / f)
            for f in os.listdir(snap_dir)} == mtimes
    del idx

    re = _mk(jd)
    assert re.live_count == 3


def test_idle_checkpoint_after_reopen(tmp_path):
    """Same idle-checkpoint safety through a close/reopen cycle (covered_seq
    is reconstructed from CURRENT on open)."""
    jd = tmp_path / "j"
    idx = _mk(jd)
    idx.insert(["a", "b"], _rows(2))
    idx.checkpoint()
    del idx
    re = _mk(jd)
    re.checkpoint()  # no new ops since the reopened checkpoint
    del re
    again = _mk(jd)
    assert again.live_count == 2


def test_recovery_terminates_unterminated_final_line(tmp_path):
    """A final log line that parsed but lost its trailing newline must be
    terminated during recovery — appending onto it would merge two records
    on one line, and a LATER recovery would drop both (losing a flushed,
    acknowledged record; r5 review)."""
    jd = tmp_path / "j"
    idx = _mk(jd)
    idx.insert(["a", "b"], _rows(2))
    idx.flush()
    del idx
    # simulate the crash artifact: strip the final newline
    ops = jd / "ops.jsonl"
    raw = ops.read_bytes()
    assert raw.endswith(b"\n")
    ops.write_bytes(raw[:-1])

    re1 = _mk(jd)           # recovery terminates the line
    assert re1.live_count == 2
    re1.insert(["c"], _rows(1, seed=2))
    re1.flush()
    del re1

    re2 = _mk(jd)           # both records must survive the second cycle
    assert re2.live_count == 3
    assert "c" in re2.paths
