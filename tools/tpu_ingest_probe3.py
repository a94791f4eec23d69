"""Third ingest probe: does PROCESS-level decode dodge the in-process
decode/transfer contention?

probe2 measured decode and async tunnel transfers slowing each other
2-4x inside one process (decode 0.28 -> 0.64 s; a 38 MB put needing
~2.4 s vs 0.64 clean) even though the transfer needs only ~10% CPU —
pointing at GIL churn, not core exhaustion. Cases:

  child_decode_alone     decode 256 images in a worker process, parent idle
  child_decode_async_put decode in the worker WHILE the parent holds an
                         un-fetched 38 MB jnp.asarray + barriers it
  pipe_roundtrip         ship the decoded (256,224,224,3) u8 batch back
                         through a Pipe (the transport cost a process-
                         based loader would pay)

If child decode stays ~full speed under the async put AND the put drains
at clean speed, a decode-worker process restores true pipeline overlap on
this host. Output: bench_results/ingest_attrib3_probe.json
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_results", "ingest_attrib3_probe.json")
res: dict = {}


def save():
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)


def worker(conn):
    """Persistent decode worker: receives path lists, replies
    (seconds, ok_count); 'pipe' requests also ship the batch back."""
    # child must not touch the TPU: force CPU before jax can initialize
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from image_retrieval_tpu.utils.native import decode_preprocess_batch_u8

    while True:
        msg = conn.recv()
        if msg is None:
            return
        cmd, paths = msg
        t0 = time.perf_counter()
        batch, ok = decode_preprocess_batch_u8(paths, threads=1)
        dt = time.perf_counter() - t0
        if cmd == "pipe":
            conn.send((dt, int(ok.sum()), batch))
        else:
            conn.send((dt, int(ok.sum())))


def main():
    import jax
    import jax.numpy as jnp

    from tools.ingest_bench import ensure_corpus
    from image_retrieval_tpu.utils.native import decode_preprocess_batch_u8

    corpus = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".ingest_corpus")
    paths = ensure_corpus(corpus, 512)
    batch_paths = paths[256:512]

    staged, _ = decode_preprocess_batch_u8(paths[:256], threads=1)
    d = jnp.asarray(staged); _ = jax.device_get(d.ravel()[0])  # warm link

    ctx = mp.get_context("spawn")
    parent, child = ctx.Pipe()
    p = ctx.Process(target=worker, args=(child,), daemon=True)
    p.start()
    parent.send(("time", batch_paths[:8]))  # warm child (imports, lib)
    parent.recv()

    # child decode, parent idle
    parent.send(("time", batch_paths))
    dt, nok = parent.recv()
    assert nok == len(batch_paths)
    res["child_decode_alone_s"] = round(dt, 3)
    save()

    # child decode while parent holds an async put + barriers it
    parent.send(("time", batch_paths))
    t0 = time.perf_counter()
    dev = jnp.asarray(staged.copy())
    _ = jax.device_get(dev.ravel()[0])
    t_put = time.perf_counter() - t0
    dt2, _n = parent.recv()
    wall = time.perf_counter() - t0
    res["child_decode_during_put_s"] = round(dt2, 3)
    res["put_during_child_decode_s"] = round(t_put, 3)
    res["both_wall_s"] = round(wall, 3)
    save()

    # pipe transport cost for one decoded batch
    t0 = time.perf_counter()
    parent.send(("pipe", batch_paths))
    dt3, _n, batch = parent.recv()
    total = time.perf_counter() - t0
    res["pipe_roundtrip_s"] = round(total, 3)
    res["pipe_overhead_s"] = round(total - dt3, 3)
    res["batch_MB"] = round(batch.nbytes / 1e6, 1)
    save()

    parent.send(None)
    p.join(timeout=5)


if __name__ == "__main__":
    main()
