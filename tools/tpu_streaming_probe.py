"""Beyond-HBM gallery scaling probe (VERDICT r2 item 5).

Measures, on the real chip:
  1. host->device transfer bandwidth (device_put of large int8 blocks) —
     the streaming path's speed-of-light; through this dev environment's
     remote-TPU tunnel it is far below a real host's PCIe/DMA rate, so the
     probe records it explicitly and the analysis reports both measured
     numbers and the transfer-bound model for production hosts.
  2. HBM-resident int8 exact sweep at 8M and 16M rows (64-query batch) —
     the configurations that still fit on-chip (16M x 512 int8 = 8 GB).
  3. Streamed sweep (index/streaming.py) at 16M and 32M rows: wall seconds
     per full-gallery pass for the 64-query batch, per-query ms, and
     achieved bandwidth vs the device_put bound.

Run:  python tools/tpu_streaming_probe.py [--rows-streamed 16,32] [--quick]
Writes bench_results/streaming_probe.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.tpu_embed_probe import _enable_cache

D = 512
K = 10
NQ = 64


def rec(out, **kw):
    out.append(kw)
    print(json.dumps(kw), flush=True)


def measure_put_bandwidth(out, mb=512, repeats=3):
    """device_put wall bandwidth, barriered by fetching one element."""
    arr = np.random.default_rng(0).integers(-127, 127, (mb << 20,), np.int8)
    # warm (allocator + any lazy session setup)
    x = jax.device_put(arr[: 1 << 20])
    _ = jax.device_get(x[0])
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        x = jax.device_put(arr)
        _ = jax.device_get(x[-1])
        ts.append(time.perf_counter() - t0)
        del x
    bw = mb / 1e3 / min(ts)
    rec(out, name="host_to_device_put", block_mb=mb,
        seconds_min=round(min(ts), 3), gbps=round(bw, 3))
    return bw


def make_host_gallery(n_rows):
    """int8 rows + norm-preserving scales, generated chunkwise (1-core
    host; the f32 upcast for norms never exceeds one chunk)."""
    rng = np.random.default_rng(1)
    g8 = np.empty((n_rows, D), np.int8)
    scales = np.empty(n_rows, np.float32)
    step = 4 << 20
    for s in range(0, n_rows, step):
        e = min(s + step, n_rows)
        g8[s:e] = rng.integers(-127, 128, (e - s, D), np.int8)
        qn = np.linalg.norm(g8[s:e].astype(np.float32), axis=1)
        scales[s:e] = 1.0 / np.where(qn > 0, qn, 1.0)
    return g8, scales


def resident_sweep(out, g8_host, scales, tag):
    """HBM-resident int8 64-query sweep (bench.py cos8 path), timed by the
    one-vs-two-dispatch difference."""
    n = len(g8_host)
    g8 = jax.device_put(g8_host)
    sc = jax.device_put(scales)
    _ = jax.device_get(g8[0, 0])

    @jax.jit
    def sweep(g, s, qs):
        qn = qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
        dots = jax.lax.dot_general(
            qn.astype(jnp.bfloat16), g.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        return jax.lax.top_k(dots * s[None, :], K)

    mk = jax.jit(lambda k: jax.random.normal(k, (NQ, D), jnp.float32))
    pool = [mk(jax.random.PRNGKey(10 + i)) for i in range(16)]
    _ = jax.device_get(pool[-1][0, 0])
    _ = jax.device_get(sweep(g8, sc, pool[0])[0])  # compile
    ts = []
    tag_i = 1
    for _ in range(5):
        a = sweep(g8, sc, pool[tag_i]); tag_i += 1
        t0 = time.perf_counter(); _ = jax.device_get(a[0]); t1 = time.perf_counter()
        b = sweep(g8, sc, pool[tag_i]); tag_i += 1
        c = sweep(g8, sc, pool[tag_i]); tag_i += 1
        t2 = time.perf_counter(); _ = jax.device_get(c[0]); t3 = time.perf_counter()
        del b
        ts.append(max((t3 - t2) - (t1 - t0), 1e-9))
    sec = float(np.median(ts))
    rec(out, name=f"resident_int8_{tag}", rows=n, sweep_ms=round(sec * 1e3, 3),
        ms_per_query=round(sec / NQ * 1e3, 4), qps=round(NQ / sec, 1),
        hbm_gbps=round(n * D / sec / 1e9, 1))
    del g8, sc
    return sec


def streamed_sweep(out, g8, scales, tag, chunk_rows, put_gbps, repeats=2):
    from image_retrieval_tpu.index.streaming import StreamingGallerySearch

    eng = StreamingGallerySearch(g8, scales, chunk_rows=chunk_rows)
    rng = np.random.default_rng(2)
    q = rng.normal(size=(NQ, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        vals, idx = eng.search(q, top_k=K)
        ts.append(time.perf_counter() - t0)
    sec = min(ts)
    xfer_bound = eng.bytes_per_sweep / (put_gbps * 1e9)
    rec(out, name=f"streamed_int8_{tag}", rows=eng.n, chunk_rows=chunk_rows,
        sweep_s=round(sec, 3), ms_per_query=round(sec / NQ * 1e3, 2),
        qps=round(NQ / sec, 2),
        achieved_gbps=round(eng.bytes_per_sweep / sec / 1e9, 3),
        transfer_bound_s=round(xfer_bound, 3),
        overlap_efficiency=round(xfer_bound / sec, 3),
        top1_sane=bool(np.isfinite(vals[:, 0]).all() and (idx[:, 0] >= 0).all()))
    return sec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-streamed", default="16,32",
                    help="streamed gallery sizes, in Mrows")
    ap.add_argument("--quick", action="store_true",
                    help="small sizes (tunnel sanity run)")
    args = ap.parse_args()

    _enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    out = []
    put_gbps = measure_put_bandwidth(out, mb=64 if args.quick else 512)

    if args.quick:
        resident_rows = [1 << 20]
        streamed_rows = [2 << 20]
        chunk = 1 << 20
    else:
        resident_rows = [8 << 20, 16 << 20]
        streamed_rows = [int(float(m)) << 20
                         for m in args.rows_streamed.split(",")]
        chunk = 4 << 20

    for n in resident_rows:
        g8, sc = make_host_gallery(n)
        resident_sweep(out, g8, sc, f"{n >> 20}M")
        del g8, sc

    for n in streamed_rows:
        g8, sc = make_host_gallery(n)
        streamed_sweep(out, g8, sc, f"{n >> 20}M", chunk, put_gbps)
        del g8, sc

    res = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "bench_results", "streaming_probe.json")
    with open(res, "w") as f:
        json.dump(out, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
