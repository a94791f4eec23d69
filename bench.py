"""Benchmark: exact top-10 retrieval over a 1M x 512 gallery + embed throughput.

Headline metric (BASELINE.md): p50 exact top-10 cosine query latency over
1M x 512-d vectors on one chip, target < 5 ms. The reference has no published
perf numbers (its search path is an O(N) Python loop, app_pipeline.py:155-172,
or a Milvus server round-trip); vs_baseline is target_ms / measured_ms, so
values > 1.0 beat the 5 ms target.

Methodology: each measurement runs a lax.scan over NQ distinct inputs inside
ONE dispatch. Under the dev-environment TPU tunnel, block_until_ready
returns before device execution completes (fully async futures) and only a
host fetch of the result is a true execution barrier; the fetch round-trip
itself is ~30-45 ms and DRIFTS between sessions, so instead of subtracting a
separately measured estimate, every number uses an overhead-cancelling
difference (`device_seconds`): time fetch(1 dispatch) and fetch(2 dispatches
queued back-to-back) of the same program on distinct inputs — the difference
is pure device time. Fresh inputs per dispatch defeat replay caching. The
gallery is always a jit *argument* so the 2 GB buffer never becomes a
compile-time constant.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., "extra": {...}}
"""

import json
import time

import numpy as np


def _wait_for_tpu_tunnel(max_wait_s=1500, probe_timeout_s=75):
    """The axon tunnel occasionally wedges (CLAUDE.md: trivial jits hang;
    one observed outage >4 h). If bench starts mid-outage it would hang at
    the first dispatch and the driver's capture would be lost — so probe
    with a tiny subprocess jit first and wait (bounded) for recovery.
    Returns True when a probe succeeds, False when the budget runs out
    (callers emit an error JSON line instead of hanging).

    Probe timeout: r5 measured that SUCCESSFUL attaches complete in
    seconds (the trivial jit rides the warm compile cache) while failed
    ones hang indefinitely in lucky/unlucky windows — so short probes +
    more attempts beat one long probe (75 s + 60 s sleep = ~11 attempts
    per 25-min budget vs 4 at the old 330 s). The child shares the repo's
    persistent compile cache so retries don't recompile from scratch."""
    import os
    import subprocess
    import sys

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return True
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    code = (
        "import jax;"
        f"jax.config.update('jax_compilation_cache_dir', {cache_dir!r});"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0);"
        "import jax.numpy as jnp;"
        "x = jax.jit(lambda a: a * 2 + 1)(jnp.ones((8, 8)));"
        "print('TUNNEL_OK', float(jax.device_get(x).sum()))"
    )
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True,
                timeout=probe_timeout_s,
            )
            if "TUNNEL_OK" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return False
        # stderr: stdout must stay the ONE JSON line the driver parses
        print(
            f"# tpu tunnel unresponsive (probe {attempt}); waiting...",
            file=sys.stderr, flush=True,
        )
        time.sleep(60)


def main():
    import os

    import jax

    # On this machine the env var alone does not force CPU (sitecustomize
    # initializes the axon plugin first — CLAUDE.md); honor it in-process
    # so `JAX_PLATFORMS=cpu python bench.py` works as written.
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    if not _wait_for_tpu_tunnel():
        print(json.dumps({
            "metric": "p50_exact_top10_query_latency_1M",
            "value": None,
            "unit": "ms",
            "vs_baseline": None,
            "extra": {"error": "tpu tunnel wedged: trivial jit probes hung "
                               "for the full wait budget (known environment "
                               "failure mode, CLAUDE.md)"},
        }))
        return

    # Persistent compile cache: repeated bench runs (and the driver's
    # end-of-round run) reuse executables instead of paying the remote
    # compiler again. Harmless if the backend ignores it.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    n = 1_000_000 if on_tpu else 65_536
    d = 512
    k = 10
    nq = 64 if on_tpu else 8
    extra = {"backend": backend, "gallery_n": n, "dim": d, "queries_per_scan": nq}

    @jax.jit
    def make_gallery(key):
        g = jax.random.normal(key, (n, d), jnp.float32)
        return g / jnp.linalg.norm(g, axis=1, keepdims=True)

    gallery = make_gallery(jax.random.PRNGKey(0))
    mags = jax.jit(
        lambda key: jax.random.uniform(key, (n,), jnp.float32, 5.0, 15.0)
    )(jax.random.PRNGKey(1))
    make_queries = jax.jit(
        lambda key: jax.random.normal(key, (nq, 1, d), jnp.float32)
    )
    _ = jax.device_get(gallery[0, 0])
    _ = jax.device_get(mags[0])

    # fetch round-trip overhead on a trivially cheap computation
    _ = jax.device_get(make_queries(jax.random.PRNGKey(1)))
    t0 = time.perf_counter()
    _ = jax.device_get(make_queries(jax.random.PRNGKey(2)))
    fetch_rt = time.perf_counter() - t0
    extra["fetch_roundtrip_ms"] = round(fetch_rt * 1e3, 2)

    def device_seconds(enqueue, repeats=5):
        """Pure device-seconds for ONE unit of work, overhead-cancelled.

        enqueue(i) dispatches the SAME jitted program on repeat-distinct
        inputs and returns the (unfetched) result. Each repeat times
        fetch(1 unit) and fetch(2 units queued back-to-back); the
        difference is one unit of device time — the tunnel's fetch
        round-trip and dispatch overhead cancel exactly instead of being
        subtracted as a separately measured (and drifting) estimate.
        """
        _ = jax.device_get(enqueue(0))  # compile + warm
        ts = []
        tag = 1
        for _r in range(repeats):
            a = enqueue(tag); tag += 1
            t0 = time.perf_counter()
            _ = jax.device_get(a)
            t1 = time.perf_counter()
            b = enqueue(tag); tag += 1
            c = enqueue(tag); tag += 1
            t2 = time.perf_counter()
            # fetch ONLY c: the device executes dispatches in order, so c's
            # completion implies b finished — fetching b too would add a
            # second round-trip and break the cancellation whenever the unit
            # time is smaller than the RTT.
            _ = jax.device_get(c)
            t3 = time.perf_counter()
            del b
            ts.append(max((t3 - t2) - (t1 - t0), 1e-9))
        return np.array(ts)

    def tags_needed(repeats):
        """Distinct input tags device_seconds(enqueue, repeats) consumes:
        1 warm + 3 per repeat. Single source of truth for pool sizing —
        bumping repeats anywhere can no longer under-size a pool."""
        return 3 * repeats + 1

    def tile_scan(scan_fn, reps):
        """Jitter-proofing for sub-RTT sweeps: wrap a (g, s, qss) scan so
        one dispatch covers the query tensor `reps` times — the
        differencing window then holds tens of ms of device work instead
        of sitting inside the tunnel RTT's multi-ms jitter (untiled int8/
        approx dispatches read 520k/199k QPS in r5 runs, past the HBM
        roofline). Callers divide the measured unit by reps."""
        @jax.jit
        def tiled(g, s, qss):
            return scan_fn(g, s, jnp.concatenate([qss] * reps))
        return tiled

    def timed_per_query(fn, repeats=5):
        """fn(queries) -> small output. Returns per-query device-seconds."""
        qs_pool = [make_queries(jax.random.PRNGKey(100 + i))
                   for i in range(tags_needed(repeats))]
        _ = jax.device_get(qs_pool[-1][0, 0, 0])  # sync generation
        return device_seconds(lambda i: fn(qs_pool[i]), repeats) / nq

    # --- headline: exact cosine top-10, single query (scan = per-query pass) --
    @jax.jit
    def cosine_scan(g, qs):
        def step(_, q):
            qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
            scores = jnp.dot(qn, g.T, preferred_element_type=jnp.float32)
            return None, jax.lax.top_k(scores, k)
        _, out = jax.lax.scan(step, None, qs)
        return out

    t = timed_per_query(lambda qs: cosine_scan(gallery, qs))
    p50_ms = float(np.percentile(t, 50) * 1e3)
    extra["cosine_p50_ms"] = round(p50_ms, 4)
    extra["cosine_best_ms"] = round(float(t.min() * 1e3), 4)
    extra["hbm_gbps_at_p50"] = round(n * d * 4 / (p50_ms / 1e3) / 1e9, 1)

    # --- batched throughput: 64 queries in one gallery pass -------------------
    # scan over 8 batches so one dispatch amortizes the fetch barrier
    n_qbatches = 8

    @jax.jit
    def cosine_batch_scan(g, qss):
        def step(_, qs):
            q2 = qs[:, 0, :]
            qn = q2 / jnp.linalg.norm(q2, axis=-1, keepdims=True)
            scores = jnp.dot(qn, g.T, preferred_element_type=jnp.float32)
            return None, jax.lax.top_k(scores, k)
        return jax.lax.scan(step, None, qss)[1]

    _make_qbatches = jax.jit(
        lambda kk: jax.random.normal(kk, (n_qbatches, nq, 1, d), jnp.float32)
    )

    def make_qbatches(key):
        # one hoisted jit: wrapping a fresh jit per call would trace/compile
        # the identical program for every pool element
        return _make_qbatches(key)

    # sized for the LARGEST repeats any consumer passes (the approx sweep
    # uses 7) — modulo-wrapping a smaller pool would silently reuse inputs
    # and defeat device_seconds' repeat-distinct-inputs contract
    qss_pool = [make_qbatches(jax.random.PRNGKey(300 + i))
                for i in range(tags_needed(7))]
    _ = jax.device_get(qss_pool[-1][0, 0, 0, 0])
    tb = device_seconds(
        lambda i: cosine_batch_scan(gallery, qss_pool[i]), repeats=5
    ) / n_qbatches
    qps = nq / tb
    extra["batched64_total_ms"] = round(float(np.percentile(tb, 50) * 1e3), 4)
    extra["batched_qps"] = round(float(np.median(qps)), 1)
    extra["batched_qps_min"] = round(float(qps.min()), 1)
    extra["batched_qps_max"] = round(float(qps.max()), 1)

    # the reference's published optimal weights; used by the fused, int8,
    # and Pallas sections below (defined OUTSIDE the try so one section's
    # import failure doesn't NameError the other two)
    weights = (1.0, 1.0, 1.0, 0.0, 0.5)

    # --- fused multi-metric (optimized similarity) search --------------------
    try:
        from image_retrieval_tpu.ops.metrics import fused_optimized_scores_xla

        @jax.jit
        def fused_scan(g, m, qs):
            def step(_, q):
                scores = fused_optimized_scores_xla(q, g, m, weights)
                return None, jax.lax.top_k(scores, k)
            _, out = jax.lax.scan(step, None, qs)
            return out

        t2 = timed_per_query(lambda qs: fused_scan(gallery, mags, qs), repeats=3)
        extra["fused_multimetric_p50_ms"] = round(float(np.percentile(t2, 50) * 1e3), 4)
    except Exception as e:  # pragma: no cover
        extra["fused_multimetric_error"] = str(e)[:200]

    # --- int8 fused multi-metric (bf16 MXU dot + Gram L2 + bf16 L1 sweep) ----
    try:
        from image_retrieval_tpu.ops.metrics import fused_optimized_scores_int8

        @jax.jit
        def quantize_norm_preserving(g):
            grid = jnp.maximum(jnp.max(jnp.abs(g), axis=1), 1e-12) / 127.0
            q8 = jnp.clip(jnp.round(g / grid[:, None]), -127, 127).astype(jnp.int8)
            qn8 = jnp.linalg.norm(q8.astype(jnp.float32), axis=1)
            return q8, 1.0 / jnp.where(qn8 > 0, qn8, 1.0)

        g8q, sc8q = quantize_norm_preserving(gallery)
        _ = jax.device_get(g8q[0, 0])

        @jax.jit
        def int8_fused_scan(g, s, m, qs):
            def step(_, q):
                scores = fused_optimized_scores_int8(q, g, s, m, weights)
                return None, jax.lax.top_k(scores, k)
            return jax.lax.scan(step, None, qs)[1]

        t8f = timed_per_query(
            lambda qs: int8_fused_scan(g8q, sc8q, mags, qs), repeats=3
        )
        extra["fused_multimetric_int8_p50_ms"] = round(
            float(np.percentile(t8f, 50) * 1e3), 4
        )

        # shadow variant (IndexConfig.l1_shadow): pre-dequantized bf16 rows
        # for the L1 sweep — bitwise-identical scores, one less VPU op per
        # element in the VPU-bound live-L1 regime (ARCHITECTURE.md scorer
        # ceiling analysis). Measured here through the same scan shape.
        from image_retrieval_tpu.ops.metrics import (
            fused_optimized_scores_int8_shadow,
            make_l1_shadow,
        )

        shadow = jax.jit(make_l1_shadow)(g8q, sc8q, mags)
        _ = jax.device_get(shadow[0, 0])

        @jax.jit
        def int8_shadow_scan(g, s, m, sh, qs):
            def step(_, q):
                scores = fused_optimized_scores_int8_shadow(
                    q, g, s, m, sh, weights
                )
                return None, jax.lax.top_k(scores, k)
            return jax.lax.scan(step, None, qs)[1]

        t8s = timed_per_query(
            lambda qs: int8_shadow_scan(g8q, sc8q, mags, shadow, qs),
            repeats=3,
        )
        extra["fused_multimetric_int8_shadow_p50_ms"] = round(
            float(np.percentile(t8s, 50) * 1e3), 4
        )
        del shadow
    except Exception as e:  # pragma: no cover
        extra["fused_int8_error"] = str(e)[:200]

    # (the Pallas fused-topk kernel is DEMOTED for the f32 multi-metric
    # sweep — XLA's fused form won three ways, ARCHITECTURE.md; its last
    # driver captures are BENCH_r01–r03 at ~10.5 vs XLA's 2.9 ms, and it
    # stays measurable via tools/ probes rather than burning driver bench
    # time every round. The Pallas kernels that DID win ship in the
    # serving tower and the int4 screen, both measured below/elsewhere.)

    # --- compressed-gallery cosine (the latency lever) -----------------------
    try:
        g16 = gallery.astype(jnp.bfloat16)
        absmax = jnp.maximum(jnp.max(jnp.abs(gallery), axis=1), 1e-12)
        g_scale = (absmax / 127.0).astype(jnp.float32)
        g8 = jnp.clip(jnp.round(gallery / g_scale[:, None]), -127, 127).astype(jnp.int8)

        @jax.jit
        def cos16_scan(g, qs):
            def step(_, q):
                qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
                scores = jnp.dot(qn.astype(jnp.bfloat16), g.T,
                                 preferred_element_type=jnp.float32)
                return None, jax.lax.top_k(scores, k)
            return jax.lax.scan(step, None, qs)[1]

        @jax.jit
        def cos8_scan(g, s, qs):
            def step(_, q):
                qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
                dots = jnp.dot(qn.astype(jnp.bfloat16), g.astype(jnp.bfloat16).T,
                               preferred_element_type=jnp.float32)
                return None, jax.lax.top_k(dots * s[None, :], k)
            return jax.lax.scan(step, None, qs)[1]

        t16 = timed_per_query(lambda qs: cos16_scan(g16, qs), repeats=3)
        t8 = timed_per_query(lambda qs: cos8_scan(g8, g_scale, qs), repeats=3)
        extra["cosine_bf16_p50_ms"] = round(float(np.percentile(t16, 50) * 1e3), 4)
        extra["cosine_int8_p50_ms"] = round(float(np.percentile(t8, 50) * 1e3), 4)

        # int8 batched QPS: 64-query sweeps over the 0.5 GB int8 gallery
        @jax.jit
        def cos8_batch_scan(g, s, qss):
            def step(_, qs2):
                q2 = qs2[:, 0, :]
                qn = q2 / jnp.linalg.norm(q2, axis=-1, keepdims=True)
                dots = jnp.dot(qn.astype(jnp.bfloat16), g.astype(jnp.bfloat16).T,
                               preferred_element_type=jnp.float32)
                return None, jax.lax.top_k(dots * s[None, :], k)
            return jax.lax.scan(step, None, qss)[1]

        # ~0.7 ms/batch: tile to ~70 ms per dispatch (see tile_scan)
        reps8 = 12 if on_tpu else 2
        cos8_batch_scan_tiled = tile_scan(cos8_batch_scan, reps8)

        tb8 = device_seconds(
            lambda i: cos8_batch_scan_tiled(g8, g_scale, qss_pool[i]),
            repeats=5,
        ) / (n_qbatches * reps8)
        extra["batched_qps_int8"] = round(float(np.median(nq / tb8)), 1)
    except Exception as e:  # pragma: no cover
        extra["compressed_error"] = str(e)[:200]

    # --- approx_select recurring guard (VERDICT r4 item 4) -------------------
    # The serving-stack selector (IndexConfig.approx_select / ?approx=1):
    # approx_max_k candidate SET + exact top-k of TRUE scores. Tracks both
    # its latency win and its recall vs the exact int8 selection on the
    # same gallery/queries, so the one-off int8_tiled_probe capture can't
    # silently rot.
    try:
        @jax.jit
        def cos8_approx_batch_scan(g, s, qss):
            def step(_, qs2):
                q2 = qs2[:, 0, :]
                qn = q2 / jnp.linalg.norm(q2, axis=-1, keepdims=True)
                dots = jnp.dot(qn.astype(jnp.bfloat16),
                               g.astype(jnp.bfloat16).T,
                               preferred_element_type=jnp.float32)
                scores = dots * s[None, :]
                cc = min(max(4 * k, 128), scores.shape[-1])
                av, ai = jax.lax.approx_max_k(scores, cc, recall_target=0.95)
                tv, tpos = jax.lax.top_k(av, k)
                return None, (tv, jnp.take_along_axis(ai, tpos, axis=1))
            return jax.lax.scan(step, None, qss)[1]

        # ~0.25 ms/batch: tile harder (see tile_scan)
        repsa = 24 if on_tpu else 2
        cos8_approx_batch_scan_tiled = tile_scan(cos8_approx_batch_scan,
                                                 repsa)

        tba = device_seconds(
            lambda i: cos8_approx_batch_scan_tiled(g8, g_scale, qss_pool[i]),
            repeats=7,
        ) / (n_qbatches * repsa)
        extra["approx_select_batched_qps"] = round(
            float(np.median(nq / tba)), 1)
        _, ids_exact = jax.device_get(
            cos8_batch_scan(g8, g_scale, qss_pool[0]))
        _, ids_approx = jax.device_get(
            cos8_approx_batch_scan(g8, g_scale, qss_pool[0]))
        ex = ids_exact.reshape(-1, k)
        ap = ids_approx.reshape(-1, k)
        extra["approx_select_recall_at_10"] = round(float(np.mean(
            [len(set(a) & set(b)) / k for a, b in zip(ex, ap)])), 4)
    except Exception as e:  # pragma: no cover
        extra["approx_select_error"] = str(e)[:200]

    # --- int4 capacity tier: packed screen + two-phase recall ----------------
    # (ops/int4.py; resident capacity 2x int8 at screen latency ~= int8's
    # sweep — the rerank is a C-row gather, timed in the scale probe)
    try:
        from image_retrieval_tpu.ops.int4 import unpack2_dots

        @jax.jit
        def pack4(g):
            grid = jnp.maximum(jnp.abs(g).max(axis=1), 1e-12) / 7.0
            q4 = jnp.clip(jnp.round(g / grid[:, None]), -7, 7).astype(jnp.int8)
            qn4 = jnp.linalg.norm(q4.astype(jnp.float32), axis=1)
            sc4 = (1.0 / jnp.where(qn4 > 0, qn4, 1.0)).astype(jnp.float32)
            u = (q4 + 8).astype(jnp.uint8)
            return u[:, 0::2] | (u[:, 1::2] << 4), sc4

        gp, s4 = pack4(gallery)

        @jax.jit
        def cos4_scan(g, s, qs):
            def step(_, q):
                qn = (q / jnp.linalg.norm(q, axis=-1, keepdims=True)
                      ).astype(jnp.bfloat16)
                return None, jax.lax.top_k(unpack2_dots(qn, g) * s[None, :], k)
            return jax.lax.scan(step, None, qs)[1]

        t4 = timed_per_query(lambda qs: cos4_scan(gp, s4, qs), repeats=3)
        extra["cosine_int4_screen_p50_ms"] = round(
            float(np.percentile(t4, 50) * 1e3), 4)

        # two-phase recall vs the int8 sweep on one query scan (C=128
        # screen -> exact rerank, all device-resident here)
        @jax.jit
        def int4_two_phase_scan(g, s, g8_, s8_, qs):
            def step(_, q):
                qn = (q / jnp.linalg.norm(q, axis=-1, keepdims=True)
                      ).astype(jnp.bfloat16)
                cand = jax.lax.top_k(unpack2_dots(qn, g) * s[None, :], 128)[1][0]
                rows = jnp.take(g8_, cand, axis=0).astype(jnp.bfloat16)
                ex = jnp.dot(qn, rows.T, preferred_element_type=jnp.float32)
                ex = ex * s8_[cand][None, :]
                _v, i = jax.lax.top_k(ex, k)
                return None, jnp.take(cand, i[0])[None, :]
            return jax.lax.scan(step, None, qs)[1]

        qs0 = make_queries(jax.random.PRNGKey(100))  # same as pool tag 0
        ids4 = np.asarray(
            jax.device_get(int4_two_phase_scan(gp, s4, g8, g_scale, qs0))
        )[:, 0, :]
        ids8 = np.asarray(jax.device_get(cos8_scan(g8, g_scale, qs0))[1])[:, 0, :]
        extra["int4_two_phase_recall_at_10_vs_int8"] = round(float(np.mean(
            [len(set(a) & set(b)) / k for a, b in zip(ids4, ids8)])), 4)
        # production paired Pallas screen (the SHIPPED int4 sweep:
        # pack_words_paired layout + int4_screen_topc_pallas with per-half
        # approx_max_k — what ShardedVectorIndex dtype='int4' actually
        # runs; the 16M headline lives in bench_results/int4_prod_probe.json)
        try:
            from image_retrieval_tpu.ops.pallas_kernels import (
                int4_screen_topc_pallas,
                pack_words_paired,
            )

            # the paired kernel wants row counts in 8192-multiples
            # (128-pair blocks x 4096 block_n x 2 halves); pad with
            # invalid rows — n=1M decimal is NOT such a multiple
            n_pad4 = -(-n // 8192) * 8192
            pad4 = n_pad4 - n
            pk_np = np.asarray(gp)
            if pad4:
                pk_np = np.concatenate(
                    [pk_np, np.zeros((pad4, d // 2), np.uint8)])
            pkp = jnp.asarray(pack_words_paired(pk_np))
            valid4 = jnp.asarray(np.arange(n_pad4) < n)
            s4p = (jnp.concatenate([s4, jnp.ones((pad4,), jnp.float32)])
                   if pad4 else s4)
            _make_qb = jax.jit(
                lambda key: jax.random.normal(key, (nq, d), jnp.bfloat16))
            qb_pool = [_make_qb(jax.random.PRNGKey(300 + i))
                       for i in range(tags_needed(5))]
            _ = jax.device_get(qb_pool[-1][0, 0])
            # ~1.5 ms units sit inside tunnel RTT jitter (r5 runs spread
            # 0.0138-0.048 ms/q); scan the dispatch 16x like the int8/
            # approx sweeps so each differencing window is ~25 ms of
            # device work
            reps4 = 16 if on_tpu else 2

            @jax.jit
            def int4_screen_scanned(qb, pk_, s4_, v_):
                def step(_, qx):
                    return None, int4_screen_topc_pallas(
                        qx, pk_, s4_, v_, 128, selector="approx")
                qbs = jnp.stack([qb + jnp.bfloat16(1e-3) * ii
                                 for ii in range(reps4)])
                return jax.lax.scan(step, None, qbs)[1]

            tp4 = device_seconds(
                lambda i: int4_screen_scanned(qb_pool[i], pkp, s4p, valid4),
                repeats=5,
            ) / (nq * reps4)
            extra["int4_screen_pallas_p50_ms"] = round(
                float(np.percentile(tp4, 50) * 1e3), 4)

            # latency mode: the COMPLETE two-phase search (screen +
            # fused exact int8 rerank) in one dispatch
            # (parallel/collectives.py sharded_int4_two_phase_topk —
            # what IndexConfig.rerank_device ships; 16M capture:
            # int4_prod_probe.json)
            from jax.sharding import Mesh as _Mesh

            from image_retrieval_tpu.parallel.collectives import (
                sharded_int4_two_phase_topk,
            )

            mesh1 = _Mesh(np.array(jax.devices()[:1]), ("data",))
            g8p = (jnp.concatenate(
                       [g8, jnp.zeros((pad4, d), jnp.int8)])
                   if pad4 else g8)
            g_scale_p = (jnp.concatenate(
                             [g_scale, jnp.ones((pad4,), jnp.float32)])
                         if pad4 else g_scale)
            @jax.jit
            def int4_two_phase_scanned(qb, pk_, v_, s4_, g8_, gs_):
                def step(_, qx):
                    return None, sharded_int4_two_phase_topk(
                        qx, pk_, v_, s4_, g8_, gs_, 128, k,
                        mesh=mesh1, axis="data")
                qbs = jnp.stack([qb.astype(jnp.float32) + 1e-3 * ii
                                 for ii in range(reps4)])
                return jax.lax.scan(step, None, qbs)[1]

            tpl = device_seconds(
                lambda i: int4_two_phase_scanned(
                    qb_pool[i], pkp, valid4, s4p, g8p, g_scale_p),
                repeats=5,
            ) / (nq * reps4)
            extra["int4_two_phase_fused_p50_ms"] = round(
                float(np.percentile(tpl, 50) * 1e3), 4)
            del pkp, valid4, s4p
        except Exception as e:  # pragma: no cover
            extra["int4_pallas_error"] = str(e)[:200]
        del gp, s4
    except Exception as e:  # pragma: no cover
        extra["int4_error"] = str(e)[:200]

    # --- journaled-insert overhead (WAL fsync per batch; VERDICT r3 item 2) --
    try:
        import shutil
        import tempfile

        from image_retrieval_tpu.config import IndexConfig
        from image_retrieval_tpu.index.vector_index import ShardedVectorIndex

        jrows = np.random.default_rng(5).normal(size=(4096, d)).astype(
            np.float32)
        jpaths = [f"j{i}" for i in range(4096)]

        def insert_all(idx):
            t0 = time.perf_counter()
            for s in range(0, 4096, 512):
                idx.insert(jpaths[s:s + 512], jrows[s:s + 512])
                idx.flush()
            return time.perf_counter() - t0

        plain = ShardedVectorIndex(dim=d, config=IndexConfig(
            embedding_dim=d, capacity_step=4096))
        t_plain = insert_all(plain)
        jdir = tempfile.mkdtemp(prefix="bench_journal_")
        try:
            jidx = ShardedVectorIndex.open(jdir, config=IndexConfig(
                embedding_dim=d, capacity_step=4096))
            t_j = insert_all(jidx)
        finally:
            shutil.rmtree(jdir, ignore_errors=True)
        extra["journal_insert_ms_per_batch512"] = round(
            (t_j - t_plain) / 8 * 1e3, 2)
        # pct is vs a bare in-RAM concat, so it reads large even when the
        # absolute cost is tiny — the sustained journaled rate is the
        # operative number (Milvus-WAL analog: fsync at the flush barrier)
        extra["journal_insert_overhead_pct"] = round(
            100.0 * (t_j - t_plain) / max(t_plain, 1e-9), 1)
        extra["journal_insert_rows_per_s"] = round(4096 / max(t_j, 1e-9), 0)
    except Exception as e:  # pragma: no cover
        extra["journal_bench_error"] = str(e)[:200]

    # --- embed throughput: CLIP ViT-B/32 image encode ------------------------
    try:
        from image_retrieval_tpu.config import ModelConfig
        from image_retrieval_tpu.models.clip import CLIP, init_params

        cfg = ModelConfig()
        model, params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
        bs = 192 if on_tpu else 8  # measured sweet spot on v5e (r2 sweep:
        #   11.4k img/s at 192 vs 11.1k at 128, 10.4k at 256)
        n_batches = 16 if on_tpu else 2

        # One pre-generated batch, perturbed per step by a scalar offset —
        # keeps per-step inputs distinct (defeats CSE) without paying PRNG
        # generation inside the timed loop.
        base = jax.jit(
            lambda key: jax.random.normal(key, (bs, 224, 224, 3), jnp.bfloat16)
        )(jax.random.PRNGKey(5))

        @jax.jit
        def encode_scan(p, base, j):
            def step(_, i):
                x = base + (i + j * n_batches).astype(jnp.bfloat16) * 1e-6
                emb = model.apply(p, x, method=CLIP.encode_image)
                return None, emb[:, 0]
            _, out = jax.lax.scan(step, None, jnp.arange(n_batches))
            return out

        times = device_seconds(
            lambda i: encode_scan(params, base, jnp.int32(i)), repeats=5
        ) / n_batches
        ips = bs / times
        extra["embed_img_per_s_per_chip"] = round(float(np.median(ips)), 1)
        extra["embed_img_per_s_min"] = round(float(ips.min()), 1)
        extra["embed_img_per_s_max"] = round(float(ips.max()), 1)
        extra["embed_batch_size"] = bs
    except Exception as e:  # pragma: no cover
        extra["embed_error"] = str(e)[:200]

    # --- embed throughput, serving config (fully-fused Pallas sub-blocks
    # with int8 MXU projections in-kernel, cos >0.999 vs bf16 baseline;
    # bench_results/attn_probe7.json) ---------------------------------------
    try:
        from image_retrieval_tpu.config import vit_b32_serving

        if not on_tpu:
            raise RuntimeError("serving embed: TPU-only (interpret mode is slow)")
        cfg_s = vit_b32_serving()
        model_s, params_s = init_params(cfg_s, seed=0, dtype=jnp.bfloat16)
        bs_s = 256  # serving sweet spot (bench_results/attn_probe8/9.json);
        #             the parity path peaks at 192 instead
        base_s = jax.jit(
            lambda key: jax.random.normal(key, (bs_s, 224, 224, 3), jnp.bfloat16)
        )(jax.random.PRNGKey(6))

        @jax.jit
        def encode_scan_serving(p, base, j):
            def step(_, i):
                x = base + (i + j * n_batches).astype(jnp.bfloat16) * 1e-6
                emb = model_s.apply(p, x, method=CLIP.encode_image)
                return None, emb[:, 0]
            _, out = jax.lax.scan(step, None, jnp.arange(n_batches))
            return out

        times_s = device_seconds(
            lambda i: encode_scan_serving(params_s, base_s, jnp.int32(i)),
            repeats=5,
        ) / n_batches
        ips_s = bs_s / times_s
        extra["embed_serving_batch_size"] = bs_s
        extra["embed_serving_img_per_s"] = round(float(np.median(ips_s)), 1)
        extra["embed_serving_img_per_s_min"] = round(float(ips_s.min()), 1)
        extra["embed_serving_img_per_s_max"] = round(float(ips_s.max()), 1)
    except Exception as e:  # pragma: no cover
        extra["embed_serving_error"] = str(e)[:200]

    # --- text encode throughput (query path): parity + serving config -------
    # The serving config's fused causal blocks apply the autoregressive mask
    # in-kernel (ops/flash_attention.py _inkernel_attention causal=True).
    try:
        if not on_tpu:
            raise RuntimeError("text encode bench: TPU-only")
        tbs = 256
        toks = jax.jit(
            lambda key: jax.random.randint(key, (tbs, 77), 1, 49407, jnp.int32)
        )(jax.random.PRNGKey(7))

        for tag, (mdl, prm) in {
            "text_parity": (model, params),
            "text_serving": (model_s, params_s),
        }.items():
            @jax.jit
            def tscan(p, toks, j, mdl=mdl):
                def step(_, i):
                    # vary the tokens per step (defeats CSE/hoisting)
                    tt = jnp.maximum(toks - ((i + j).astype(jnp.int32) % 2), 1)
                    return None, mdl.apply(p, tt, method=CLIP.encode_text)[:, 0]
                _, out = jax.lax.scan(step, None, jnp.arange(n_batches))
                return out

            tt = device_seconds(
                lambda i, f=tscan, prm=prm: f(prm, toks, jnp.int32(i)),
                repeats=5,
            ) / n_batches
            tps = tbs / tt
            extra[f"{tag}_per_s"] = round(float(np.median(tps)), 1)
            extra[f"{tag}_per_s_min"] = round(float(tps.min()), 1)
    except Exception as e:  # pragma: no cover
        extra["text_encode_error"] = str(e)[:200]

    # --- end-to-end query QPS: text tokens -> serving CLIP text encode ->
    # int8 exact top-10 over the 1M gallery, all in one dispatch -------------
    try:
        if not on_tpu:
            raise RuntimeError("e2e query bench: TPU-only")
        qtoks = jax.jit(
            lambda key: jax.random.randint(
                key, (n_qbatches, nq, 77), 1, 49407, jnp.int32
            )
        )(jax.random.PRNGKey(8))

        @jax.jit
        def e2e_scan(p, toks, g, s, j):
            def step(_, tb):
                tb = jnp.maximum(tb - j % 2, 1)
                q = model_s.apply(p, tb, method=CLIP.encode_text)
                qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
                dots = jnp.dot(
                    qn.astype(jnp.bfloat16), g.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32,
                )
                return None, jax.lax.top_k(dots * s[None, :], k)
            return jax.lax.scan(step, None, toks)[1]

        # tile both e2e chains too (tile_scan rationale): the exact chain
        # is ~50 ms/dispatch and the approx one ~23 ms — the latter sits
        # inside RTT jitter untiled (its first two r5 readings spread 23%)
        repse = 2 if on_tpu else 1
        repsea = 4 if on_tpu else 1

        @jax.jit
        def e2e_scan_tiled(p, toks, g, s, j):
            return e2e_scan(p, jnp.concatenate([toks] * repse), g, s, j)

        te = device_seconds(
            lambda i: e2e_scan_tiled(
                params_s, qtoks, g8, g_scale, jnp.int32(i)),
            repeats=5,
        ) / (n_qbatches * repse)
        extra["e2e_query_qps_int8"] = round(float(np.median(nq / te)), 1)

        # same chain with the approximate selector (true scores, approx
        # candidate set — the serving-stack --approx-select path): with the
        # text tower at ~26k texts/s the exact int8 sweep is about half the
        # per-query budget, so the selector's ~4x selection win roughly
        # doubles end-to-end QPS at its guarded recall (the
        # approx_select_recall_at_10 extra above, measured on this same
        # gallery)
        @jax.jit
        def e2e_scan_approx(p, toks, g, s, j):
            def step(_, tb):
                tb = jnp.maximum(tb - j % 2, 1)
                q = model_s.apply(p, tb, method=CLIP.encode_text)
                qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
                dots = jnp.dot(
                    qn.astype(jnp.bfloat16), g.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32,
                )
                scores = dots * s[None, :]
                cc = min(max(4 * k, 128), scores.shape[-1])
                av, ai = jax.lax.approx_max_k(scores, cc, recall_target=0.95)
                tv, tpos = jax.lax.top_k(av, k)
                return None, (tv, jnp.take_along_axis(ai, tpos, axis=1))
            return jax.lax.scan(step, None, toks)[1]

        @jax.jit
        def e2e_scan_approx_tiled(p, toks, g, s, j):
            return e2e_scan_approx(
                p, jnp.concatenate([toks] * repsea), g, s, j)

        tea = device_seconds(
            lambda i: e2e_scan_approx_tiled(
                params_s, qtoks, g8, g_scale, jnp.int32(i)),
            repeats=5,
        ) / (n_qbatches * repsea)
        extra["e2e_query_qps_int8_approx"] = round(
            float(np.median(nq / tea)), 1)
    except Exception as e:  # pragma: no cover
        extra["e2e_query_error"] = str(e)[:200]

    # --- end-to-end ingest: JPEG on disk -> decode pool -> batched encode ->
    # indexed row (reference ImageEmbeddingSystem.py:100-137; VERDICT r2
    # item 2). The extras decompose the bound into three legs (decode /
    # host->device transfer / encode) — on this box the transfer leg rides
    # the remote axon tunnel and dominates; a production PCIe host has no
    # such leg, so the n-core projection is the honest scaling claim.
    try:
        if not on_tpu:
            raise RuntimeError("ingest e2e bench: TPU-only (encode leg)")
        sys_path = os.path.dirname(os.path.abspath(__file__))
        import sys as _sys

        if sys_path not in _sys.path:
            _sys.path.insert(0, sys_path)
        from tools.ingest_bench import run_ingest_bench

        from image_retrieval_tpu.config import Config as _Cfg
        from image_retrieval_tpu.models.encoder import get_encoder as _ge

        _enc = _ge(config=_Cfg(model=vit_b32_serving()))
        ing = run_ingest_bench(
            _enc,
            corpus_dir=os.path.join(sys_path, ".ingest_corpus"),
            n_images=512,
            batch_size=256,
            device_rate_hint=extra.get("embed_serving_img_per_s", 0.0),
        )
        extra["ingest_img_per_s_e2e"] = ing["e2e_img_per_s"]
        extra["ingest_decode_img_per_s_core"] = ing["decode_img_per_s_core"]
        extra["ingest_transfer_img_per_s"] = ing.get("transfer_img_per_s", 0.0)
        extra["ingest_transfer_MB_per_s"] = ing.get("transfer_MB_per_s", 0.0)
        extra["ingest_encode_img_per_s_device"] = ing.get(
            "encode_img_per_s_device", 0.0)
        extra["ingest_pipeline_bound"] = ing.get("pipeline_bound", "")
        extra["ingest_pipeline_bound_img_per_s"] = ing.get(
            "pipeline_bound_img_per_s", 0.0)
        extra["ingest_serial_floor_img_per_s"] = ing.get(
            "serial_floor_img_per_s", 0.0)
        extra["ingest_overlap_efficiency"] = ing["overlap_efficiency"]
        # per-phase e2e attribution: a slow run names its slow phase
        # (wait_decode = host decode starved; wait_device = device fetch/
        # dispatch barrier; insert = host index append; dispatch = loop
        # residual)
        for key in ("e2e_wait_decode_s", "e2e_wait_device_s", "e2e_insert_s",
                    "e2e_dispatch_s", "e2e_cpu_s", "e2e_seconds",
                    "e2e_mode", "e2e_img_per_s_thread",
                    "e2e_img_per_s_process", "e2e_img_per_s_staged"):
            if key in ing:
                extra[f"ingest_{key}"] = ing[key]
        extra["ingest_cores_to_saturate"] = ing["cores_to_saturate_device"]
        extra["ingest_projected_img_per_s_32cores"] = ing[
            "projected_img_per_s_32cores"
        ]
    except Exception as e:  # pragma: no cover
        extra["ingest_error"] = str(e)[:200]


    target_ms = 5.0
    print(
        json.dumps(
            {
                "metric": "p50_exact_top10_query_latency_1M" if on_tpu
                else "p50_exact_top10_query_latency_65k_cpu",
                "value": round(p50_ms, 4),
                "unit": "ms",
                "vs_baseline": round(target_ms / p50_ms, 3) if p50_ms > 0 else None,
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
