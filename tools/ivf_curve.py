"""IVF recall@10 / latency vs nprobe on UNCLUSTERED data at 1M x 512.

VERDICT r1 #6 ("IVF honesty pass"): clustered-synthetic recall 1.0 is
trivially easy; this measures the curve CLIP-like embeddings actually see —
anisotropic Gaussian unit vectors with a geometric spectrum, no cluster
structure — at the reference's operating point (nlist=1024; Milvus IVF_FLAT
semantics, reference ImageEmbeddingSystem.py:56-61, image_search.py:88).

Latency protocol: scan over NQ queries inside one dispatch, host-fetch
barrier, minus the measured fetch round-trip (CLAUDE.md).

Run:  python tools/ivf_curve.py  (writes bench_results/ivf_curve.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from image_retrieval_tpu.index.ivf import IVFIndex, _ivf_search  # noqa: E402

N, D, K, NQ = 1_000_000, 512, 10, 16
NLIST = 1024
NPROBES = (1, 5, 10, 20, 40)


def anisotropic_unit(rng, n, d, decay=0.985):
    scales = (decay ** np.arange(d)).astype(np.float32)
    out = np.empty((n, d), np.float32)
    step = 100_000
    for i in range(0, n, step):  # chunked: 1-core host, bounded peak memory
        x = rng.standard_normal((min(step, n - i), d), dtype=np.float32) * scales
        out[i : i + step] = x / np.linalg.norm(x, axis=1, keepdims=True)
    return out


def main():
    rng = np.random.default_rng(0)
    print("generating 1M anisotropic unit vectors...", flush=True)
    unit = anisotropic_unit(rng, N, D)
    queries = anisotropic_unit(rng, 64, D)

    cache = f"/tmp/ivf_curve_build_{N}x{D}_nl{NLIST}.npz"  # config-keyed
    ivf = IVFIndex(nlist=NLIST, nprobe=10, seed=0)
    if os.path.exists(cache):
        print("loading cached build...", flush=True)
        z = np.load(cache)
        ivf._centroids = jnp.asarray(z["centroids"])
        ivf._packed = jnp.asarray(z["packed"])
        ivf._row_ids = jnp.asarray(z["row_ids"])
        ivf._scales = None
        ivf._lmax = int(z["lmax"])
        ivf.nlist = int(z["nlist"])
        ivf.count = N
        ivf.paths = [str(i) for i in range(N)]
        build_s = 0.0
    else:
        print("building IVF (device kmeans nlist=1024)...", flush=True)
        t0 = time.time()
        ivf.build(unit)
        build_s = time.time() - t0
        print(f"built in {build_s:.0f}s, lmax={ivf._lmax}", flush=True)
        np.savez(
            cache,
            centroids=np.asarray(ivf._centroids),
            packed=np.asarray(ivf._packed),
            row_ids=np.asarray(ivf._row_ids),
            lmax=ivf._lmax,
            nlist=ivf.nlist,
        )

    # exact ids on device (ground truth)
    g = jnp.asarray(unit)
    exact = np.asarray(
        jax.jit(lambda q, g: jax.lax.top_k(q @ g.T, K)[1])(jnp.asarray(queries), g)
    )
    del g

    # fetch round-trip
    mk = jax.jit(lambda key: jax.random.normal(key, (NQ, D), jnp.float32))
    _ = jax.device_get(mk(jax.random.PRNGKey(0)))
    t0 = time.perf_counter()
    _ = jax.device_get(mk(jax.random.PRNGKey(1)))
    fetch = time.perf_counter() - t0
    print(f"fetch {fetch*1e3:.1f} ms", flush=True)

    results = {"n": N, "d": D, "k": K, "nlist": ivf.nlist, "lmax": ivf._lmax,
               "build_s": round(build_s, 1), "points": []}
    qdev = jnp.asarray(queries)
    lmax = ivf._lmax
    for nprobe in NPROBES:
        recall = ivf.recall_at(queries, exact, k=K, nprobe=nprobe)

        # Big tensors MUST be jit arguments — a closure capture ships the
        # 2 GB packed gallery through the remote compiler as a constant
        # (CLAUDE.md "Environment quirks"). Scalars (nprobe/lmax/K) close
        # over as trace-time constants, which is what we want.
        def make_run(np_):
            @jax.jit
            def run(qs, centroids, packed, row_ids):
                def step(_, q):
                    return None, _ivf_search(
                        q[None], centroids, packed, row_ids, lmax, np_, K, None,
                    )
                return jax.lax.scan(step, None, qs)[1]
            return run

        run = make_run(nprobe)

        qs = qdev[:NQ]
        args = (qs, ivf._centroids, ivf._packed, ivf._row_ids)
        _ = jax.device_get(run(*args))
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            _ = jax.device_get(run(*args))
            ts.append(max(time.perf_counter() - t0 - fetch, 1e-9) / NQ)
        point = {
            "nprobe": nprobe,
            "recall_at_10": round(float(recall), 4),
            "p50_ms": round(float(np.median(ts)) * 1e3, 3),
        }
        results["points"].append(point)
        print(json.dumps(point), flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "bench_results", "ivf_curve.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("done", flush=True)


def replicas_point():
    """Measure the replicas=2 recall point at 1M (run after main())."""
    rng = np.random.default_rng(0)
    unit = anisotropic_unit(rng, N, D)
    queries = anisotropic_unit(rng, 64, D)
    g = jnp.asarray(unit)
    exact = np.asarray(
        jax.jit(lambda q, gg: jax.lax.top_k(q @ gg.T, K)[1])(jnp.asarray(queries), g)
    )
    del g
    print("building replicas=2 ...", flush=True)
    t0 = time.time()
    ivf = IVFIndex(nlist=NLIST, nprobe=10, seed=0).build(unit, replicas=2)
    print(f"built in {time.time()-t0:.0f}s lmax={ivf._lmax}", flush=True)
    out = {}
    for nprobe in (5, 10, 20):
        out[nprobe] = round(float(ivf.recall_at(queries, exact, k=K, nprobe=nprobe)), 4)
        print(json.dumps({"replicas": 2, "nprobe": nprobe, "recall_at_10": out[nprobe]}),
              flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "bench_results", "ivf_curve.json")
    try:
        with open(path) as f:
            data = json.load(f)
        data["replicas2_recall_at_10"] = out
        with open(path, "w") as f:
            json.dump(data, f, indent=1)
    except Exception as e:
        print("merge failed:", e)


if __name__ == "__main__":
    if "--replicas" in sys.argv:
        replicas_point()
    else:
        main()
