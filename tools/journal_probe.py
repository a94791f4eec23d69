"""Micro-probe: where do the ~6.5 ms per journaled 512-row insert go?

BENCH_r04 measured `journal_insert_ms_per_batch512` = 6.51 ms after group
commit (fsync only at the flush barrier). VERDICT r4 item 6 asks for the
attribution: npz serialization vs fsync count vs rename vs log append —
and whether a cheap 2-3x is available or 6.5 ms is the floor.

Per journaled batch the write path is (index/journal.py log_insert +
flush):
  1. np.savez(unit (512, 512) f32 + mags (512,) f32) -> seg tmp  (~1 MB)
  2. os.replace(tmp, seg)
  3. JSON record append + file flush (no fsync)
  4. flush(): open+fsync(seg), flush+fsync(log)

This probe times each leg standalone over many reps on the same
filesystem the bench uses (tempfile dir), and compares three segment
serializers over identical payloads:
  npz     np.savez (zip container, CRC32 per member) — the shipped form
  npy     one np.lib.format.write_array of a (512, 513) f32 block
          (unit || mags column) — no zip container, one header
  raw     header-less f.write(arr.tobytes()) — the lower bound

Output: bench_results/journal_probe.json
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def best_of(fn, reps=30):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return {"best_ms": round(min(ts) * 1e3, 3),
            "p50_ms": round(float(np.percentile(ts, 50)) * 1e3, 3)}


def main():
    rng = np.random.default_rng(0)
    unit = rng.normal(size=(512, 512)).astype(np.float32)
    mags = rng.normal(size=(512,)).astype(np.float32)
    d = tempfile.mkdtemp(prefix="journal_probe_")
    out = {"dir": d, "payload_MB": round((unit.nbytes + mags.nbytes) / 1e6, 3)}
    i = [0]

    def path():
        i[0] += 1
        return os.path.join(d, f"seg-{i[0]}")

    # -- serializers (write + close, no fsync) ------------------------------
    def w_npz():
        p = path()
        with open(p, "wb") as f:
            np.savez(f, unit=unit, mags=mags)
            f.flush()

    def w_npy():
        p = path()
        blk = np.concatenate([unit, mags[:, None]], axis=1)
        with open(p, "wb") as f:
            np.lib.format.write_array(f, blk, allow_pickle=False)
            f.flush()

    def w_raw():
        p = path()
        with open(p, "wb") as f:
            f.write(unit.tobytes())
            f.write(mags.tobytes())
            f.flush()

    out["serialize_npz"] = best_of(w_npz)
    out["serialize_npy_single_block"] = best_of(w_npy)
    out["serialize_raw"] = best_of(w_raw)

    # -- rename -------------------------------------------------------------
    src = os.path.join(d, "tmpseg")
    with open(src, "wb") as f:
        f.write(unit.tobytes())

    def w_rename():
        dst = path()
        os.replace(src, dst)
        os.replace(dst, src)  # keep the source alive; two renames per rep

    r = best_of(w_rename)
    out["rename_pair"] = r  # two os.replace calls

    # -- fsync of a ~1 MB file (written, not yet synced) ---------------------
    def w_fsync():
        p = path()
        with open(p, "wb") as f:
            f.write(unit.tobytes())
        fd = os.open(p, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)

    out["write_plus_fsync"] = best_of(w_fsync, reps=20)
    # isolate the fsync: sync an ALREADY-synced file (metadata-only)
    p_synced = path()
    with open(p_synced, "wb") as f:
        f.write(unit.tobytes())
        f.flush()
        os.fsync(f.fileno())

    def w_fsync_clean():
        fd = os.open(p_synced, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)

    out["fsync_clean_file"] = best_of(w_fsync_clean)

    # -- log append (JSON line + flush, no fsync) ----------------------------
    logp = os.path.join(d, "ops.jsonl")
    fh = open(logp, "a", encoding="utf-8")
    rec = {"op": "insert", "paths": [f"j{k}" for k in range(512)], "seq": 1}

    def w_log():
        fh.write(json.dumps(rec) + "\n")
        fh.flush()

    out["log_append_flush"] = best_of(w_log)

    def w_log_fsync():
        fh.write(json.dumps(rec) + "\n")
        fh.flush()
        os.fsync(fh.fileno())

    out["log_append_fsync"] = best_of(w_log_fsync, reps=20)

    # -- end-to-end: shipped journal vs plain index, same protocol as bench --
    import shutil

    from image_retrieval_tpu.config import IndexConfig
    from image_retrieval_tpu.index.vector_index import ShardedVectorIndex

    rows = rng.normal(size=(4096, 512)).astype(np.float32)
    paths = [f"j{k}" for k in range(4096)]

    def insert_all(idx):
        t0 = time.perf_counter()
        for s in range(0, 4096, 512):
            idx.insert(paths[s:s + 512], rows[s:s + 512])
            idx.flush()
        return time.perf_counter() - t0

    best_delta = None
    for _ in range(5):
        plain = ShardedVectorIndex(dim=512, config=IndexConfig(
            embedding_dim=512, capacity_step=4096))
        t_plain = insert_all(plain)
        jdir = tempfile.mkdtemp(prefix="journal_probe_e2e_")
        try:
            jidx = ShardedVectorIndex.open(jdir, config=IndexConfig(
                embedding_dim=512, capacity_step=4096))
            t_j = insert_all(jidx)
        finally:
            shutil.rmtree(jdir, ignore_errors=True)
        delta = (t_j - t_plain) / 8 * 1e3
        best_delta = delta if best_delta is None else min(best_delta, delta)
    out["e2e_journal_ms_per_batch512_best"] = round(best_delta, 3)

    shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out, indent=1))
    respath = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "journal_probe.json")
    with open(respath, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
