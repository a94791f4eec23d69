"""Attribute the ingest e2e gap (VERDICT r4 item 1).

BENCH_r04: e2e 112 img/s vs a 314 img/s transfer bound, overlap 0.0 —
*below* the ~241 img/s fully-serial floor. This probe answers, on the real
tunnel:

  A. is jnp.asarray()/device_put async (dispatch returns before the bytes
     move) or blocking?
  B. does host->device transfer burn host CPU (process_time vs wall)? On a
     1-core host a CPU-bound transfer CANNOT overlap decode no matter how
     the pipeline is scheduled — the bound becomes cpu(decode)+cpu(transfer).
  C. decode-during-transfer concurrency: wall(thread-transfer || decode)
     vs wall(transfer)+wall(decode).
  D. instrumented e2e loop (the exact tools/ingest_bench.py chain) with
     per-phase timers: q.get wait / dispatch / drain-fetch / insert.

Writes bench_results/ingest_attrib_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_results", "ingest_attrib_probe.json")
res: dict = {}


def save():
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from tools.ingest_bench import ensure_corpus
    from image_retrieval_tpu.utils.native import decode_preprocess_batch_u8

    corpus = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".ingest_corpus")
    paths = ensure_corpus(corpus, 512)

    staged, ok = decode_preprocess_batch_u8(paths[:256], threads=1)
    assert ok.all()
    nbytes = staged.nbytes
    res["batch_shape"] = list(staged.shape)
    res["batch_MB"] = round(nbytes / 1e6, 1)

    # --- A: dispatch async? -------------------------------------------------
    # warm transfer path
    d = jnp.asarray(staged); _ = jax.device_get(d.ravel()[0])
    for name, arr in (("put", staged), ("put_b", staged.copy())):
        t0 = time.perf_counter(); tc0 = time.process_time()
        dev = jnp.asarray(arr)
        t_dispatch = time.perf_counter() - t0
        _ = jax.device_get(dev.ravel()[0])
        t_total = time.perf_counter() - t0
        tcpu = time.process_time() - tc0
        res[f"A_{name}"] = {
            "dispatch_s": round(t_dispatch, 4),
            "total_s": round(t_total, 4),
            "cpu_s": round(tcpu, 4),
            "MB_per_s_wall": round(nbytes / 1e6 / t_total, 1),
        }
    save()

    # --- B: repeated transfers, wall vs cpu ---------------------------------
    reps = 4
    bufs = [staged.copy() for _ in range(2)]
    t0 = time.perf_counter(); tc0 = time.process_time()
    for i in range(reps):
        dev = jnp.asarray(bufs[i % 2])
        _ = jax.device_get(dev.ravel()[0])
    wall = time.perf_counter() - t0
    cpu = time.process_time() - tc0
    res["B_transfer"] = {
        "wall_s_per_batch": round(wall / reps, 4),
        "cpu_s_per_batch": round(cpu / reps, 4),
        "cpu_fraction": round(cpu / wall, 3),
        "MB_per_s": round(nbytes / 1e6 / (wall / reps), 1),
    }
    save()

    # --- C: decode while a transfer is in flight ----------------------------
    sample = paths[:128]
    decode_preprocess_batch_u8(sample[:8], threads=1)  # warm page cache
    t0 = time.perf_counter()
    _, _ = decode_preprocess_batch_u8(sample, threads=1)
    t_dec = time.perf_counter() - t0

    def xfer(buf, out):
        t0 = time.perf_counter()
        dev = jnp.asarray(buf)
        _ = jax.device_get(dev.ravel()[0])
        out.append(time.perf_counter() - t0)

    t_x = res["B_transfer"]["wall_s_per_batch"]
    xt: list = []
    t0 = time.perf_counter()
    th = threading.Thread(target=xfer, args=(bufs[0], xt))
    th.start()
    _, _ = decode_preprocess_batch_u8(sample, threads=1)
    t_dec_during = time.perf_counter() - t0
    th.join()
    t_both = time.perf_counter() - t0
    res["C_overlap"] = {
        "decode_alone_s": round(t_dec, 4),
        "transfer_alone_s": round(t_x, 4),
        "decode_during_transfer_s": round(t_dec_during, 4),
        "both_wall_s": round(t_both, 4),
        "serial_sum_s": round(t_dec + t_x, 4),
        "overlap_won_s": round(t_dec + t_x - t_both, 4),
    }
    save()

    # --- D: instrumented e2e (real serving encoder) --------------------------
    from image_retrieval_tpu.config import Config, IndexConfig, vit_b32_serving
    from image_retrieval_tpu.data.loader import ImageBatchLoader
    from image_retrieval_tpu.index import ShardedVectorIndex
    from image_retrieval_tpu.models.encoder import get_encoder

    encoder = get_encoder(config=Config(model=vit_b32_serving()))
    _ = encoder.encode_pixels(staged)  # compile + warm

    for bs in (256, 128):
        index = ShardedVectorIndex(dim=encoder.dim,
                                   config=IndexConfig(capacity_step=4096))
        tw = {"wait_decode": 0.0, "encode_call": 0.0, "insert": 0.0}
        t_run0 = time.perf_counter()
        tc0 = time.process_time()
        it = iter(ImageBatchLoader(paths, batch_size=bs, size=224,
                                   use_native=True, threads=1, emit="u8"))
        n_ok = 0
        while True:
            t0 = time.perf_counter()
            try:
                chunk, batch, okm = next(it)
            except StopIteration:
                break
            tw["wait_decode"] += time.perf_counter() - t0
            good = np.flatnonzero(okm)
            t0 = time.perf_counter()
            embs = encoder.encode_pixels(batch if okm.all() else batch[good])
            tw["encode_call"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            index.insert([chunk[int(i)] for i in good], embs)
            tw["insert"] += time.perf_counter() - t0
            n_ok += len(good)
        t_e2e = time.perf_counter() - t_run0
        cpu_e2e = time.process_time() - tc0
        res[f"D_e2e_bs{bs}"] = {
            "img_per_s": round(len(paths) / t_e2e, 1),
            "t_e2e_s": round(t_e2e, 3),
            "cpu_s": round(cpu_e2e, 3),
            **{k: round(v, 3) for k, v in tw.items()},
            "unattributed_s": round(t_e2e - sum(tw.values()), 3),
        }
        save()


if __name__ == "__main__":
    main()
