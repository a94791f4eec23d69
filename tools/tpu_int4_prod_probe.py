"""TPU probe: the PRODUCTION int4 path at 16M rows (verdict r4 item 1).

Round-3 state: the Pallas screen kernel measured 29x the XLA form at 4M
rows but production `_search_int4` still ran the XLA tiled sweep — 431 ms
batched Q=64 at 16M vs int8's 57 ms. The isolate probe then pinned the
16M end-to-end loss on exact lax.top_k(c=128) over the wide plane
(6.2 ms/query on RANDOM scores vs approx_max_k's 0.09). This probe
measures the fixed production wiring (paired int32 device layout +
int4_screen_topc_pallas with per-half approx_max_k selection inside
sharded_int4_screen_topk):

  kernel_16M_approx      — the raw kernel+selector, device-differenced
  kernel_16M_exact       — same with exact top_k (the r3 regression form)
  prod_screen_dev_16M    — sharded_int4_screen_topk through the index's
                           actual device arrays (shard_map + merge)
  prod_search_wall_16M   — full ShardedVectorIndex.search wall (screen ->
                           host gather -> exact rerank), median; the
                           tunnel pays ~2 fetch RTTs that PCIe hosts
                           don't — reported alongside, not subtracted
  prod_recall_16M        — production two-phase top-10 vs the device int8
                           oracle over the same rows
  prod_int8_wall_16M     — resident int8 index wall at 16M (the tier's
                           replacement target), same methodology

Target (VERDICT.md r3 item 1): batched int4 Q=64 at 16M <= int8's 57 ms
total, ~30 ms at half the bytes.

Output: bench_results/int4_prod_probe.json (resumable).
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
NQ = 64
C = 128
K = 10
N = 1 << 24

OUT_PATH = os.path.join(os.path.dirname(__file__), "..",
                        "bench_results", "int4_prod_probe.json")
out = {"d": D, "nq": NQ, "c": C, "k": K, "rows": N, "cases": {}}
if os.path.exists(OUT_PATH):
    try:
        with open(OUT_PATH) as _f:
            out["cases"].update(json.load(_f).get("cases", {}))
    except Exception:
        pass


def rec(name, **kw):
    out["cases"][name] = kw
    print(json.dumps({name: kw}), flush=True)
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=1)


def have(name):
    c = out["cases"].get(name)
    return c is not None and "error" not in c


def device_seconds(enqueue, fetch, repeats=3):
    """One-vs-two-dispatch differencing (cancels the tunnel's drifting
    fetch RTT)."""
    _ = fetch(enqueue(0))
    ts = []
    tag = 1
    for _r in range(repeats):
        a = enqueue(tag); tag += 1
        t0 = time.perf_counter(); _ = fetch(a); t1 = time.perf_counter()
        b = enqueue(tag); tag += 1
        c2 = enqueue(tag); tag += 1
        t2 = time.perf_counter(); _ = fetch(c2); t3 = time.perf_counter()
        del b
        ts.append(max((t3 - t2) - (t1 - t0), 1e-9))
    return float(np.median(ts))


def main():
    from tools.int4_gallery_cache import get_gallery

    dev = jax.devices()[0]
    out["device"] = str(dev.device_kind)
    print("device:", dev, flush=True)

    g8, s8, pk, s4 = get_gallery(N, want_int8=True)
    rng = np.random.default_rng(11)
    qpool = [rng.normal(size=(NQ, D)).astype(np.float32) for _ in range(8)]
    qdev = [jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True),
                        jnp.bfloat16) for q in qpool]

    # ---- raw kernel cases (paired layout as a plain jit arg) -------------
    if not (have("kernel_16M_approx") and have("kernel_16M_exact")
            and have("kernel_16M_approx_qi8")):
        from image_retrieval_tpu.ops.pallas_kernels import (
            int4_screen_topc_pallas,
            pack_words_paired,
        )

        print("packing paired layout...", flush=True)
        pkp = jnp.asarray(pack_words_paired(pk))
        sc = jnp.asarray(np.asarray(s4))
        valid = jnp.ones((N,), bool)
        for sel, qform in (("approx", "bf16"), ("exact", "bf16"),
                           ("approx", "i8")):
            name = (f"kernel_16M_{sel}" if qform == "bf16"
                    else f"kernel_16M_{sel}_qi8")
            if have(name):
                continue
            try:
                sec = device_seconds(
                    lambda i, sel=sel, qform=qform: int4_screen_topc_pallas(
                        qdev[i % len(qdev)], pkp, sc, valid, C,
                        selector=sel, qform=qform),
                    lambda r: jax.device_get(r[0][0, 0]))
                rec(name, sweep_ms=round(sec * 1e3, 3),
                    ms_per_query=round(sec / NQ * 1e3, 4),
                    hbm_gbps=round(N * D / 2 / sec / 1e9, 1))
            except Exception as e:
                rec(name, error=repr(e)[:500])
        del pkp, sc, valid

    # ---- production index path -------------------------------------------
    need_prod = not (have("prod_screen_dev_16M")
                     and have("prod_search_wall_16M")
                     and have("prod_recall_16M"))
    oracle_ids = None
    if (need_prod or not have("prod_int8_wall_16M")
            or not have("prod_latency_wall_16M")):
        from image_retrieval_tpu.config import IndexConfig
        from image_retrieval_tpu.index.vector_index import ShardedVectorIndex

        def inject(idx, with_int4):
            idx._grow_to(N)
            np.copyto(idx._host_gallery[:N], g8)
            np.copyto(idx._host_scales[:N], s8)
            if with_int4:
                np.copyto(idx._host_packed[:N], pk)
                np.copyto(idx._host_scales4[:N], s4)
            idx._host_valid[:N] = True
            idx.count = N
            idx.attrs.append(None, N)
            idx._device_dirty = True

    if need_prod:
        idx4 = ShardedVectorIndex(
            dim=D, config=IndexConfig(embedding_dim=D, dtype="int4",
                                      rerank_c=C))
        print("injecting 16M rows into the int4 index...", flush=True)
        inject(idx4, True)
        t0 = time.perf_counter()
        idx4._sync_device()
        print(f"sync (pair-pack + ship) {time.perf_counter()-t0:.1f}s; "
              f"paired dtype {idx4._packed.dtype}", flush=True)
        assert idx4._packed.dtype == jnp.int32

        if not have("prod_screen_dev_16M"):
            from image_retrieval_tpu.parallel.collectives import (
                sharded_int4_screen_topk,
            )
            try:
                sec = device_seconds(
                    lambda i: sharded_int4_screen_topk(
                        jnp.asarray(qpool[i % len(qpool)]), idx4._packed,
                        idx4._valid, idx4._scales4, C,
                        mesh=idx4.mesh, axis=idx4._row_axes),
                    lambda r: jax.device_get(r[0][0, 0]))
                rec("prod_screen_dev_16M", sweep_ms=round(sec * 1e3, 3),
                    ms_per_query=round(sec / NQ * 1e3, 4),
                    hbm_gbps=round(N * D / 2 / sec / 1e9, 1))
            except Exception as e:
                rec("prod_screen_dev_16M", error=repr(e)[:500])

        if not have("prod_search_wall_16M"):
            try:
                _ = idx4.search(qpool[0], top_k=K)  # warm/compile
                walls = []
                for r in range(5):
                    t0 = time.perf_counter()
                    _ = idx4.search(qpool[r % len(qpool)], top_k=K)
                    walls.append(time.perf_counter() - t0)
                w = float(np.median(walls))
                rec("prod_search_wall_16M", wall_ms=round(w * 1e3, 2),
                    ms_per_query=round(w / NQ * 1e3, 4),
                    qps=round(NQ / w, 1),
                    note="includes ~2 tunnel fetch RTTs + host gather")
            except Exception as e:
                rec("prod_search_wall_16M", error=repr(e)[:500])

        pid = None
        if not have("prod_recall_16M"):
            try:
                _, pid = idx4.search(qpool[0], top_k=K)
                pid = np.asarray(pid)
            except Exception as e:
                rec("prod_recall_16M", error=repr(e)[:500])
        # free the int4 device arrays BEFORE the oracle: paired(4G) +
        # bf16 gallery(8G as the dot operand) + (64,16M) f32 plane(4G)
        # would not co-reside in 16G HBM
        del idx4
        if pid is not None:
            try:
                # device int8 oracle over the same rows (the tier's
                # replacement target)
                @jax.jit
                def int8_topk(g, sc, qs):
                    qn = qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
                    dots = jax.lax.dot_general(
                        qn.astype(jnp.bfloat16), g.astype(jnp.bfloat16),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    return jax.lax.top_k(dots * sc[None, :], K)

                _, oid = int8_topk(jnp.asarray(g8),
                                   jnp.asarray(np.asarray(s8)),
                                   jnp.asarray(qpool[0]))
                oracle_ids = np.asarray(oid)
                hit = np.mean([len(set(a.tolist()) & set(b.tolist())) / K
                               for a, b in zip(pid, oracle_ids)])
                rec("prod_recall_16M", recall_at_10=round(float(hit), 4))
            except Exception as e:
                rec("prod_recall_16M", error=repr(e)[:500])

    if not have("prod_latency_wall_16M"):
        # LATENCY mode (config.rerank_device): screen + exact rerank fused
        # in ONE dispatch; int8 rows resident (12.3 GB total at 16M)
        idxl = ShardedVectorIndex(
            dim=D, config=IndexConfig(embedding_dim=D, dtype="int4",
                                      rerank_c=C, rerank_device=True))
        print("injecting 16M rows into the latency-mode index...",
              flush=True)
        inject(idxl, True)
        try:
            idxl._sync_device()
            assert idxl._gallery is not None
            _ = idxl.search(qpool[0], top_k=K)
            walls = []
            for r in range(5):
                t0 = time.perf_counter()
                _ = idxl.search(qpool[r % len(qpool)], top_k=K)
                walls.append(time.perf_counter() - t0)
            w = float(np.median(walls))
            from image_retrieval_tpu.parallel.collectives import (
                sharded_int4_two_phase_topk,
            )

            sec = device_seconds(
                lambda i: sharded_int4_two_phase_topk(
                    jnp.asarray(qpool[i % len(qpool)]), idxl._packed,
                    idxl._valid, idxl._scales4, idxl._gallery,
                    idxl._scales, C, K, mesh=idxl.mesh,
                    axis=idxl._row_axes),
                lambda r: jax.device_get(r[0][0, 0]))
            rec("prod_latency_wall_16M", wall_ms=round(w * 1e3, 2),
                device_ms=round(sec * 1e3, 3),
                ms_per_query_device=round(sec / NQ * 1e3, 4),
                qps_wall=round(NQ / w, 1),
                note="rerank_device one-dispatch two-phase; wall includes "
                     "1 tunnel fetch RTT")
        except Exception as e:
            rec("prod_latency_wall_16M", error=repr(e)[:500])
        del idxl

    if not have("prod_int8_wall_16M"):
        idx8 = ShardedVectorIndex(
            dim=D, config=IndexConfig(embedding_dim=D, dtype="int8"))
        print("injecting 16M rows into the int8 index...", flush=True)
        inject(idx8, False)
        try:
            _ = idx8.search(qpool[0], top_k=K)
            walls = []
            for r in range(5):
                t0 = time.perf_counter()
                _ = idx8.search(qpool[r % len(qpool)], top_k=K)
                walls.append(time.perf_counter() - t0)
            w = float(np.median(walls))
            rec("prod_int8_wall_16M", wall_ms=round(w * 1e3, 2),
                ms_per_query=round(w / NQ * 1e3, 4), qps=round(NQ / w, 1))
        except Exception as e:
            rec("prod_int8_wall_16M", error=repr(e)[:500])
        del idx8

    print("done", flush=True)


if __name__ == "__main__":
    main()
