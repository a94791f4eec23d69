"""Second ingest attribution probe: why does decode slow ~7x inside the
streamed pipeline when it overlaps ASYNC device work?

ingest_attrib_probe.json showed decode-at-1070/s standalone but the
streamed e2e loop waited 3.48 s on a decode queue that should drain in
0.5 s. Cases here time ONE native 256-image decode (threads=1) in a helper
thread while the main thread:

  sleep        sleeps (baseline thread overhead)
  async_put    holds an un-fetched 38 MB jnp.asarray in flight
  async_enc    holds an un-fetched u8 encode dispatch in flight
  fetch_wait   blocks fetching a previously dispatched encode
  sync_put     runs a synchronous put+barrier (r1 probe's C case, control)

If decode slows only under async_* the tunnel's async engine burns/steals
the single host core (or holds the GIL) between dispatch and completion.

Writes bench_results/ingest_attrib2_probe.json.
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
                   "bench_results", "ingest_attrib2_probe.json")
res: dict = {}


import faulthandler

faulthandler.enable()


def save():
    # watchdog: if any case wedges for 3 min, dump all thread stacks and
    # exit instead of hanging the session (re-armed after every case)
    faulthandler.dump_traceback_later(180, exit=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from tools.ingest_bench import ensure_corpus
    from image_retrieval_tpu.config import Config, vit_b32_serving
    from image_retrieval_tpu.models.encoder import get_encoder
    from image_retrieval_tpu.utils.native import decode_preprocess_batch_u8

    corpus = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".ingest_corpus")
    paths = ensure_corpus(corpus, 512)
    batch_paths = paths[256:512]  # same images the e2e loop's batch 2 uses

    staged, _ = decode_preprocess_batch_u8(paths[:256], threads=1)
    encoder = get_encoder(config=Config(model=vit_b32_serving()))
    warm = encoder.encode_pixels(staged)  # compile + warm
    del warm

    def decode_once() -> float:
        t0 = time.perf_counter()
        _, ok = decode_preprocess_batch_u8(batch_paths, threads=1)
        assert ok.all()
        return time.perf_counter() - t0

    decode_once()  # page-cache warm
    res["decode_alone_s"] = round(min(decode_once() for _ in range(3)), 3)
    save()

    def run_case(name, setup, teardown=None):
        out = {}
        th_res = []
        th = threading.Thread(
            target=lambda: th_res.append(decode_once()))
        state = setup()
        t0 = time.perf_counter()
        th.start()
        th.join()
        out["decode_s"] = round(th_res[0], 3)
        out["wall_s"] = round(time.perf_counter() - t0, 3)
        res[name] = out  # before teardown: teardowns annotate res[name]
        if teardown:
            teardown(state)
        save()

    # sleep baseline
    run_case("sleep", lambda: None)

    # async_put: dispatch a 38 MB put, decode while it lands, then barrier
    def setup_put():
        return jnp.asarray(staged.copy())
    def td_put(d):
        t0 = time.perf_counter()
        _ = jax.device_get(d.ravel()[0])
        res["async_put"]["drain_after_s"] = round(time.perf_counter() - t0, 3)
    run_case("async_put", setup_put, td_put)

    # async_enc: dispatch put + encode, decode while in flight, then fetch
    def setup_enc():
        return encoder._dispatch_pixels(staged.copy())
    def td_enc(parts):
        t0 = time.perf_counter()
        for d, m in parts:
            _ = np.asarray(d)[:m]
        res["async_enc"]["drain_after_s"] = round(time.perf_counter() - t0, 3)
    run_case("async_enc", setup_enc, td_enc)

    # fetch_wait: main thread blocks in the fetch while the decode runs
    parts = encoder._dispatch_pixels(staged.copy())
    th_res = []
    th = threading.Thread(target=lambda: th_res.append(decode_once()))
    t0 = time.perf_counter()
    th.start()
    for d, m in parts:
        _ = np.asarray(d)[:m]
    t_fetch = time.perf_counter() - t0
    th.join()
    res["fetch_wait"] = {"decode_s": round(th_res[0], 3),
                         "fetch_s": round(t_fetch, 3),
                         "wall_s": round(time.perf_counter() - t0, 3)}
    save()

    # sync_put control (r1 probe case C shape)
    def sync_put():
        d = jax.device_put(staged.copy())
        _ = jax.device_get(d.ravel()[0])
    th = threading.Thread(target=sync_put)
    th_res = []
    th2 = threading.Thread(target=lambda: th_res.append(decode_once()))
    t0 = time.perf_counter()
    th.start(); th2.start()
    th2.join(); th.join()
    res["sync_put"] = {"decode_s": round(th_res[0], 3),
                       "wall_s": round(time.perf_counter() - t0, 3)}
    save()


if __name__ == "__main__":
    main()
