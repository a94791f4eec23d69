"""SearchServer serving-path QPS capture (VERDICT r4 item 7).

The library layer's batched numbers (batched_qps_int8 ~18.9k) are
device-seconds with the tunnel RTT cancelled; the micro-batching
SearchServer (app/server.py — the Milvus-server analog) had concurrency
tests but no throughput number, so its batching/lock overhead was a
belief. This probe measures, over a 1M x 512 int8 index:

  direct_batch64     wall seconds for one index.search of a 64-query
                     batch (INCLUDING one tunnel RTT) — the floor any
                     serving layer on this host pays per dispatch.
  server_qps         N concurrent client threads x sequential
                     server.search() calls, steady-state wall QPS, plus
                     the observed micro-batch size distribution
                     (stats requests/batches) and the per-batch overhead
                     vs direct_batch64.
  server_many_qps    one client using search_many (the batch API) — the
                     upper bound of the server path.
  http_qps           the same through the web UI's HTTP layer
                     (ThreadingHTTPServer /search) with N keep-alive-less
                     clients — the reference's pymilvus-gRPC-hop analog
                     (image_search.py:85-95).

FakeEncoder keeps text-encode off the measurement (the capture isolates
serving overhead, not CLIP). Output: bench_results/server_qps_probe.json
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_results", "server_qps_probe.json")
res: dict = {}


def save():
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)


def main(n_rows=1 << 20, clients=32, seconds=12.0):
    from image_retrieval_tpu.app.server import SearchServer
    from image_retrieval_tpu.config import IndexConfig
    from image_retrieval_tpu.index import ShardedVectorIndex
    from image_retrieval_tpu.models.encoder import FakeEncoder

    res["n_rows"] = n_rows
    res["clients"] = clients
    enc = FakeEncoder(dim=512)
    idx = ShardedVectorIndex(
        dim=512, config=IndexConfig(dtype="int8", capacity_step=n_rows))
    rng = np.random.default_rng(5)
    print("building 1M int8 index...", flush=True)
    for s in range(0, n_rows, 1 << 18):
        e = min(s + (1 << 18), n_rows)
        rows = rng.normal(size=(e - s, 512)).astype(np.float32)
        idx.insert([f"r{i}" for i in range(s, e)], rows)
    idx.load()

    queries = [f"object {i} color {c}" for i in range(200)
               for c in ("red", "green", "blue")]
    q_emb = enc.encode_texts(queries[:64]).astype(np.float32)
    qn = q_emb / np.linalg.norm(q_emb, axis=1, keepdims=True)

    # --- direct 64-query dispatch wall (incl. one tunnel RTT) --------------
    _ = idx.search(qn, top_k=10)  # compile + warm
    ts = [0.0] * 5
    for i in range(5):
        t0 = time.perf_counter()
        _ = idx.search(qn, top_k=10)
        ts[i] = time.perf_counter() - t0
    res["direct_batch64_wall_ms"] = round(sorted(ts)[2] * 1e3, 2)
    res["direct_wall_qps"] = round(64 / sorted(ts)[2], 1)
    save()

    # --- concurrent clients through SearchServer ---------------------------
    with SearchServer(enc, idx, max_batch=64, max_wait_ms=2.0) as server:
        _ = server.search(queries[0], top_k=10)  # warm the server path
        stop_at = time.perf_counter() + seconds
        counts = [0] * clients
        base_stats = dict(server.stats)

        def client(ci):
            i = ci
            while time.perf_counter() < stop_at:
                server.search(queries[i % len(queries)], top_k=10)
                counts[ci] += 1
                i += clients

        threads = [threading.Thread(target=client, args=(ci,))
                   for ci in range(clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        nreq = sum(counts)
        nbatch = server.stats["batches"] - base_stats["batches"]
        res["server_qps"] = round(nreq / wall, 1)
        res["server_requests"] = nreq
        res["server_batches"] = nbatch
        res["server_mean_batch"] = round(nreq / max(nbatch, 1), 1)
        res["server_max_batch"] = server.stats["max_observed_batch"]
        # overhead per micro-batch beyond the direct dispatch wall; the
        # direct cost is RTT-dominated and near-independent of Q (a
        # 32-query dispatch costs ~a 64-query one), so compare straight
        res["server_ms_per_batch"] = round(wall / max(nbatch, 1) * 1e3, 2)
        res["server_overhead_ms_per_batch"] = round(
            wall / max(nbatch, 1) * 1e3 - res["direct_batch64_wall_ms"], 2)
        save()

        # --- search_many batch API (single client, coalesced) --------------
        many = queries[:256]
        _ = server.search_many(many[:8], top_k=10)
        t0 = time.perf_counter()
        reps = 4
        for _r in range(reps):
            _ = server.search_many(many, top_k=10)
        res["server_many_qps"] = round(
            len(many) * reps / (time.perf_counter() - t0), 1)
        save()

        # --- HTTP layer (web UI /search + /batch_search) --------------------
        from image_retrieval_tpu.app.webui import serve

        httpd = serve(server, idx.paths, port=0)
        th = threading.Thread(target=httpd.serve_forever, daemon=True)
        th.start()
        port = httpd.server_address[1]
        base = f"http://127.0.0.1:{port}"
        _ = urllib.request.urlopen(base + "/search?q=warm&k=10").read()
        stop_at = time.perf_counter() + seconds
        hcounts = [0] * clients

        def hclient(ci):
            i = ci
            while time.perf_counter() < stop_at:
                urllib.request.urlopen(
                    base + f"/search?q=object+{i%600}&k=10").read()
                hcounts[ci] += 1
                i += clients

        hthreads = [threading.Thread(target=hclient, args=(ci,))
                    for ci in range(clients)]
        t0 = time.perf_counter()
        for t in hthreads:
            t.start()
        for t in hthreads:
            t.join()
        res["http_qps"] = round(sum(hcounts) / (time.perf_counter() - t0), 1)
        # HTTP batch endpoint: one POST carrying 256 queries
        body = json.dumps({"queries": many, "k": 10}).encode()
        req = urllib.request.Request(base + "/batch_search", data=body,
                                     headers={"Content-Type":
                                              "application/json"})
        _ = urllib.request.urlopen(req).read()
        t0 = time.perf_counter()
        for _r in range(reps):
            req = urllib.request.Request(base + "/batch_search", data=body,
                                         headers={"Content-Type":
                                                  "application/json"})
            _ = urllib.request.urlopen(req).read()
        res["http_batch_qps"] = round(
            len(many) * reps / (time.perf_counter() - t0), 1)
        httpd.shutdown()
        save()


if __name__ == "__main__":
    main()
