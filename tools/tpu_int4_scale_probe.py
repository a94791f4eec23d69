"""TPU probe: int4 capacity tier at scale (bench_results/int4_scale_probe.json).

What this captures:
  resident_int8_16M   — baseline batched int8 sweep (64-query dispatch).
  int4_screen_16M     — batched packed screen sweep at the same rows.
  int4_screen1q_16M   — single-query screen latency (lax.scan over 64
                        queries inside one dispatch, like the 1M probe).
  int4_rerank_16M     — device rerank compute for (64, C) pre-staged
                        candidates; the two-phase device time is
                        screen + rerank. The host gather (numpy fancy
                        index of C rows/query from the 8 GB int8 array)
                        is timed host-side and reported separately — on
                        this box the tunnel RTT (~35-45 ms) dominates any
                        mid-query host hop, which production PCIe hosts
                        do not pay.
  recall_16M          — two-phase recall@10 vs the RESIDENT int8 sweep
                        at 16M (the tier's replacement target).
  int4_screen_32M     — the capacity headline: 32M x 512 rows resident as
                        8 GB packed int4 (int8 would need 16 GB and not
                        fit v5e's usable HBM); batched sweep timing +
                        memory_stats deltas.
  recall_32M          — two-phase recall@10 at 32M vs a STREAMED int8
                        exact oracle (one ~286 s sweep, 16 queries).
  streamed_4M         — int8 vs packed int4 streamed sweep wall time at
                        4M rows (the transfer-bytes halving, which the
                        RTT-dominated dev tunnel only partially rewards;
                        DMA-bound production hosts see ~2x).

Methodology: one-vs-two-dispatch differencing (the tunnel's fetch RTT
drifts between sessions; the difference cancels it).
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = 512
K = 10
NQ = 64
C = 128

OUT_PATH = os.path.join(os.path.dirname(__file__), "..",
                        "bench_results", "int4_scale_probe.json")
out = {"d": D, "k": K, "nq": NQ, "c": C, "cases": {}}
# resumable: each case flushes on capture; a relaunch (after a timeout or
# tunnel wedge) skips sections whose cases are all present
if os.path.exists(OUT_PATH):
    try:
        with open(OUT_PATH) as _f:
            _prev = json.load(_f)
        out["cases"].update(_prev.get("cases", {}))
    except Exception:
        pass


def have(*names):
    return all(n in out["cases"] for n in names)


def flush():
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=1)


def rec(name, **kw):
    out["cases"][name] = kw
    print(json.dumps({name: kw}), flush=True)
    flush()


def mem_bytes():
    try:
        return jax.devices()[0].memory_stats()["bytes_in_use"]
    except Exception:
        return None


def device_seconds(enqueue, fetch, repeats=5):
    _ = fetch(enqueue(0))
    ts = []
    tag = 1
    for _r in range(repeats):
        a = enqueue(tag); tag += 1
        t0 = time.perf_counter(); _ = fetch(a); t1 = time.perf_counter()
        b = enqueue(tag); tag += 1
        c = enqueue(tag); tag += 1
        t2 = time.perf_counter(); _ = fetch(c); t3 = time.perf_counter()
        del b
        ts.append(max((t3 - t2) - (t1 - t0), 1e-9))
    return float(np.median(ts))


def make_gallery(n_rows, want_int8=True):
    """Chunkwise host generation: unit rows -> int8 + packed int4 (+scales).
    Returns (g8, s8, pk, s4); g8/s8 are None when want_int8 is False."""
    from image_retrieval_tpu.ops.int4 import quantize_pack_int4

    rng = np.random.default_rng(3)
    g8 = np.empty((n_rows, D), np.int8) if want_int8 else None
    s8 = np.empty(n_rows, np.float32) if want_int8 else None
    pk = np.empty((n_rows, D // 2), np.uint8)
    s4 = np.empty(n_rows, np.float32)
    step = 1 << 20
    for s in range(0, n_rows, step):
        e = min(s + step, n_rows)
        rows = rng.normal(size=(e - s, D)).astype(np.float32)
        rows /= np.linalg.norm(rows, axis=1, keepdims=True)
        if want_int8:
            grid = np.maximum(np.abs(rows).max(axis=1), 1e-12) / 127.0
            q8 = np.clip(np.rint(rows / grid[:, None]), -127, 127
                         ).astype(np.int8)
            qn = np.linalg.norm(q8.astype(np.float32), axis=1)
            g8[s:e] = q8
            s8[s:e] = 1.0 / np.where(qn > 0, qn, 1.0)
        pk[s:e], s4[s:e] = quantize_pack_int4(rows)
    return g8, s8, pk, s4


def batched_int8_step(g, sc, qs):
    qn = qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
    dots = jax.lax.dot_general(
        qn.astype(jnp.bfloat16), g.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    return jax.lax.top_k(dots * sc[None, :], K)


def batched_int4_step(g, sc, qs, k=C):
    # the tiled screen (ops/int4.py screen_int4_topc): the direct two-dot
    # form loses unpack fusion at multi-M rows (431.8 ms at 16M, first
    # capture in this file's history) — production now tiles
    from image_retrieval_tpu.ops.int4 import screen_int4_topc

    qn = (qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
          ).astype(jnp.bfloat16)
    valid = jnp.ones((g.shape[0],), bool)
    return screen_int4_topc(qn, g, sc, valid, k)


def make_pool(nq=NQ, n=16):
    mk = jax.jit(lambda key: jax.random.normal(key, (nq, D), jnp.float32))
    pool = [mk(jax.random.PRNGKey(10 + i)) for i in range(n)]
    _ = jax.device_get(pool[-1][0, 0])
    return pool


def time_batched(name, step, g, sc, pool, extra=None):
    run = jax.jit(step)
    nq = int(pool[0].shape[0])
    sec = device_seconds(lambda i: run(g, sc, pool[i]),
                         lambda a: jax.device_get(a[0][0, 0]))
    kw = dict(rows=int(g.shape[0]), nq=nq, sweep_ms=round(sec * 1e3, 3),
              ms_per_query=round(sec / nq * 1e3, 4),
              qps=round(nq / sec, 1),
              hbm_gbps=round(g.nbytes / sec / 1e9, 1))  # paired int32 and
              # uint8 layouts differ in itemsize; nbytes is layout-true
    if extra:
        kw.update(extra)
    rec(name, **kw)
    return run


SEC16 = ("resident_int8_16M", "int4_screen_16M", "int4_screen1q_16M",
         "int4_rerank_16M", "recall_16M")
SEC32 = ("int4_screen_32M", "recall_32M")
SEC4 = ("streamed_4M_int8", "streamed_4M_int4")


def run_16m():
    # ---------------- 16M: head-to-head + recall --------------------------
    # HBM budget forces sequencing: int8 (8 GB) and packed int4 (4 GB)
    # cannot be co-resident with a (64, 16M) f32 score buffer (4.3 GB) on a
    # 16 GB chip — the first attempt OOM'd exactly there. Time int8, take
    # the oracle top-k, FREE the int8 gallery, then run the int4 legs.
    n16 = 1 << 24
    print("generating 16M gallery...", flush=True)
    g8h, s8h, pkh, s4h = make_gallery(n16)
    pool = make_pool()

    base = mem_bytes()
    g8 = jax.device_put(g8h)
    s8 = jax.device_put(s8h)
    _ = jax.device_get(g8[0, 0])
    m_int8 = mem_bytes()
    time_batched("resident_int8_16M", batched_int8_step, g8, s8, pool)

    # resident int8 oracle for recall_16M, before freeing the gallery
    run8 = jax.jit(batched_int8_step)
    _, oi = jax.device_get(run8(g8, s8, pool[0]))
    g8.delete(); s8.delete()
    del g8, s8

    pk = jax.device_put(pkh)
    s4 = jax.device_put(s4h)
    _ = jax.device_get(pk[0, 0])
    m_pk16 = mem_bytes()
    if base is not None:
        rec("hbm_16M", int8_bytes=int(m_int8 - base),
            packed_bytes=int(m_pk16 - base))

    run4 = time_batched(
        "int4_screen_16M", lambda g, sc, qs: batched_int4_step(g, sc, qs),
        pk, s4, pool)

    # single-query screen latency: scan over NQ queries inside one dispatch
    @jax.jit
    def scan1q(g, sc, qs):
        def body(_, q):
            return None, batched_int4_step(g, sc, q[None])
        _, o = jax.lax.scan(body, None, qs)
        return o
    sec = device_seconds(lambda i: scan1q(pk, s4, pool[i]),
                         lambda a: jax.device_get(a[0][0, 0, 0]))
    rec("int4_screen1q_16M", ms_per_query=round(sec / NQ * 1e3, 4))

    # two-phase: screen cand -> host gather (timed) -> device rerank (timed)
    from image_retrieval_tpu.ops.int4 import rerank_int8_topk

    cv, ci = jax.device_get(run4(pk, s4, pool[0]))
    t0 = time.perf_counter()
    rows = g8h[ci]            # (NQ, C, D) int8 host gather
    sc8 = s8h[ci]
    t_gather = time.perf_counter() - t0
    rows_d = jax.device_put(rows)
    sc8_d = jax.device_put(sc8.astype(np.float32))
    ok_d = jax.device_put(np.ones((NQ, C), bool))
    qs_d = pool[0]
    _ = jax.device_get(rows_d[0, 0, 0])
    sec_rr = device_seconds(
        lambda i: rerank_int8_topk(qs_d, rows_d, sc8_d, ok_d, K),
        lambda a: jax.device_get(a[0][0, 0]))
    rec("int4_rerank_16M", rerank_ms=round(sec_rr * 1e3, 3),
        rerank_ms_per_query=round(sec_rr / NQ * 1e3, 4),
        host_gather_s=round(t_gather, 4),
        gather_bytes=int(rows.nbytes))

    # recall vs the resident int8 oracle (computed above, pre-free)
    rv, ri = jax.device_get(
        rerank_int8_topk(qs_d, rows_d, sc8_d, ok_d, K))
    final = np.take_along_axis(np.asarray(ci), np.asarray(ri), axis=1)
    recall = float(np.mean([len(set(a) & set(b)) / K
                            for a, b in zip(oi, final)]))
    raw = float(np.mean([len(set(a) & set(b[:K])) / K
                         for a, b in zip(oi, ci)]))
    rec("recall_16M", two_phase_at_10=round(recall, 4),
        raw_int4_at_10=round(raw, 4))
    rows_d.delete(); del rows_d, sc8_d, ok_d
    pk.delete(); s4.delete()
    del pk, s4
    return g8h, s8h, pkh, s4h


def run_32m():
    # ---------------- 32M: the capacity headline --------------------------
    # 8.6 GB packed + the f32 score buffer: a 64-query dispatch would need
    # another 8.6 GB — dispatch 16 queries instead (2.1 GB scores).
    n32 = 1 << 25
    nq32 = 16
    print("generating 32M gallery...", flush=True)
    # int8 rows stay HOST-side only (16 GB — the point: they cannot be
    # resident; they are the rerank source)
    # shared on-disk cache (tools/int4_gallery_cache): generation costs
    # ~1 h on this 1-core host — a tunnel wedge mid-probe must not force
    # a regeneration on resume. NOTE: the cache's seeded stream matches
    # make_gallery's (same rng seed + chunking).
    from tools.int4_gallery_cache import get_gallery

    g8h32, s8h32, pkh32, s4h32 = get_gallery(n32, want_int8=True)
    pool = make_pool(nq=nq32)
    base = mem_bytes()
    # PRODUCTION paired layout + Pallas screen (what ShardedVectorIndex
    # dtype='int4' ships since r4 — pack_words_paired + approx_max_k
    # selection; the XLA tiled form measured 431 ms/64q at 16M)
    from image_retrieval_tpu.ops.pallas_kernels import (
        int4_screen_topc_pallas,
        pack_words_paired,
    )

    print("pairing 32M packed rows...", flush=True)
    pk32 = jax.device_put(pack_words_paired(pkh32))
    s432 = jax.device_put(s4h32)
    _ = jax.device_get(pk32[0, 0])
    m_pk = mem_bytes()

    def paired_step(g, sc, qs, k=C):
        qn = (qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
              ).astype(jnp.bfloat16)
        # valid created IN-TRACE: a captured 32M device mask would ship
        # through the remote compiler as a 32 MB constant
        valid = jnp.ones((2 * g.shape[0],), bool)
        return int4_screen_topc_pallas(qn, g, sc, valid, k,
                                       selector="approx")

    run432 = time_batched(
        "int4_screen_32M", paired_step,
        pk32, s432, pool,
        extra={"packed_hbm_bytes": (int(m_pk - base)
                                    if base is not None else None),
               "int8_equiv_bytes": n32 * D,
               "kernel": "pallas_paired_approx"})

    # recall at 32M vs a streamed int8 exact oracle (16 queries, one sweep)
    from image_retrieval_tpu.index.streaming import StreamingGallerySearch

    nq_o = 16
    qs_h = np.asarray(jax.device_get(pool[0]))[:nq_o]
    qu = qs_h / np.linalg.norm(qs_h, axis=1, keepdims=True)
    t0 = time.perf_counter()
    eng = StreamingGallerySearch(g8h32, s8h32, chunk_rows=4 << 20)
    ov, oi32 = eng.search(qu, top_k=K)
    t_oracle = time.perf_counter() - t0
    cv32, ci32 = jax.device_get(run432(pk32, s432, pool[0]))
    ci32 = ci32[:nq_o]
    rows32 = g8h32[ci32]
    sc832 = s8h32[ci32].astype(np.float32)
    from image_retrieval_tpu.ops.int4 import rerank_int8_topk as rr
    rv32, ri32 = jax.device_get(
        rr(jnp.asarray(qs_h), jnp.asarray(rows32), jnp.asarray(sc832),
           jnp.asarray(np.ones((nq_o, C), bool)), K))
    final32 = np.take_along_axis(ci32, np.asarray(ri32), axis=1)
    recall32 = float(np.mean([len(set(a) & set(b)) / K
                              for a, b in zip(oi32, final32)]))
    rec("recall_32M", two_phase_at_10=round(recall32, 4),
        oracle="streamed int8 exact", oracle_sweep_s=round(t_oracle, 1),
        nq=nq_o)
    pk32.delete(); s432.delete()
    del pk32, s432, g8h32, s8h32, pkh32, s4h32


def run_streamed_4m(g16=None):
    # ---------------- streamed transfer halving at 4M ----------------------
    from image_retrieval_tpu.index.streaming import StreamingGallerySearch

    n4 = 1 << 22
    if g16 is not None:
        g8h, s8h, pkh, s4h = g16
        g8s, s8s, pks, s4s = g8h[:n4], s8h[:n4], pkh[:n4], s4h[:n4]
    else:
        # chunked rng: the first 4M rows equal the 16M gallery's first 4M
        print("generating 4M gallery...", flush=True)
        g8s, s8s, pks, s4s = make_gallery(n4)
    qu64 = np.asarray(jax.device_get(make_pool(n=2)[1]))
    qu64 = qu64 / np.linalg.norm(qu64, axis=1, keepdims=True)
    for tag, eng in (
        ("int8", StreamingGallerySearch(g8s, s8s, chunk_rows=1 << 21)),
        ("int4", StreamingGallerySearch(
            pks, s4s, chunk_rows=1 << 21, packed4=True,
            rerank_rows=g8s, rerank_scales=s8s, rerank_c=C)),
    ):
        t0 = time.perf_counter()
        _v, _i = eng.search(qu64, top_k=K)
        sec = time.perf_counter() - t0
        rec(f"streamed_4M_{tag}", rows=n4, sweep_s=round(sec, 2),
            bytes_moved=int(eng.bytes_per_sweep),
            gbps=round(eng.bytes_per_sweep / sec / 1e9, 3))


def main():
    dev = jax.devices()[0]
    out["device"] = str(dev)
    flush()
    g16 = None
    if not have(*SEC16):
        g16 = run_16m()
    else:
        print("16M section already captured, skipping", flush=True)
    if not have(*SEC4):
        run_streamed_4m(g16)  # before 32M: reuses the 16M host arrays
    if g16 is not None:
        del g16
    if not have(*SEC32):
        run_32m()
    flush()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
