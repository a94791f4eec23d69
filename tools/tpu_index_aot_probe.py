"""AOT-compile the index-side Pallas consumers for an 8-chip v5e topology
(VERDICT r4 item 2).

tools/tpu_gspmd_probe.py proved the shard_map-wrapped SERVING tower
AOT-compiles for v5e:2x4 with no attached chips; this probe extends the same
evidence to every Pallas path a production index tier dispatches:

  int4_screen        sharded_int4_screen_topk, paired int32 layout
                     (ops/pallas_kernels.py _int4_screen_kernel)
  int4_two_phase     sharded_int4_two_phase_topk (screen + in-jit exact
                     int8 rerank, IndexConfig.rerank_device)
  int8_fused         sharded_search_topk with int8 scales +
                     optimized_similarity (the fused int8 scorer)
  int8_cosine_approx sharded_search_topk cosine int8, selector="approx"
                     (IndexConfig.approx_select)
  multimetric        sharded_multimetric_topk (5 metrics, one pass)

Each case records lower/compile seconds into
bench_results/gspmd_probe.json under cases["index_<name>"], alongside the
r4 serving-tower rows. A failure is recorded verbatim — that is the fence
the index would need before claiming the tier multi-chip-ready.
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
from jax.sharding import NamedSharding, PartitionSpec as P

OUT_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench_results", "gspmd_probe.json")


def load_out():
    try:
        with open(OUT_PATH) as f:
            return json.load(f)
    except Exception:
        return {"cases": {}}


out = load_out()


def rec(name, **kw):
    out["cases"][name] = kw
    print(json.dumps({name: kw}), flush=True)
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=1)


def sds(shape, dtype, sharding):
    return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)


def main():
    from jax.experimental import topologies

    from image_retrieval_tpu.parallel import collectives as C

    topo_name = out.get("aot_topology_name", "v5e:2x4")
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=topo_name)
    tmesh = topologies.make_mesh(topo, (8,), ("data",))
    repl = NamedSharding(tmesh, P())
    row = NamedSharding(tmesh, P("data"))
    row2d = NamedSharding(tmesh, P("data", None))

    ndev = 8
    nlocal = 4096  # per-shard rows; 256-multiple for the paired block map
    n = nlocal * ndev
    d = 512
    q = 64

    queries = sds((q, d), jnp.float32, repl)
    valid = sds((n,), jnp.bool_, row)
    mags = sds((n,), jnp.float32, row)
    scales = sds((n,), jnp.float32, row)
    rows8 = sds((n, d), jnp.int8, row2d)
    # paired int32 layout: (N/2, 2*D/8) per ops/pallas_kernels.pack_words_paired
    packed = sds((n // 2, 2 * d // 8), jnp.int32, row2d)
    scales4 = sds((n,), jnp.float32, row)

    def aot(name, fn, *args, **kw):
        try:
            t0 = time.perf_counter()
            lowered = fn.lower(*args, **kw)
            t_lower = time.perf_counter() - t0
            t0 = time.perf_counter()
            lowered.compile()
            t_comp = time.perf_counter() - t0
            rec(f"index_{name}", ok=True, lower_s=round(t_lower, 1),
                compile_s=round(t_comp, 1), n=n, q=q,
                topology=topo_name)
        except Exception as e:  # pragma: no cover
            rec(f"index_{name}", ok=False, error=str(e)[:600],
                topology=topo_name)

    aot("int4_screen", C.sharded_int4_screen_topk,
        queries, packed, valid, scales4, 128, mesh=tmesh, axis="data")
    aot("int4_two_phase", C.sharded_int4_two_phase_topk,
        queries, packed, valid, scales4, rows8, scales, 128, 10,
        mesh=tmesh, axis="data")
    aot("int8_fused", C.sharded_search_topk,
        queries, rows8, valid, mags, 10,
        metric="optimized_similarity",
        weights=(1.0, 1.0, 1.0, 0.0, 0.5),
        scales=scales, mesh=tmesh, axis="data")
    aot("int8_cosine_approx", C.sharded_search_topk,
        queries, rows8, valid, mags, 10,
        metric="cosine_similarity", scales=scales,
        mesh=tmesh, axis="data", selector="approx")
    aot("multimetric", C.sharded_multimetric_topk,
        queries, sds((n, d), jnp.float32, row2d), valid, mags, 10,
        mesh=tmesh, axis="data")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
