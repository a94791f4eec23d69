"""TPU probe: compiled (non-interpret) Pallas serving tower under GSPMD.

Ledger item (VERDICT r2, "what's missing" #2): the serving mega-kernels
are validated under GSPMD only in interpret mode (dryrun_multichip's CPU
mesh) — compiled-Pallas-under-GSPMD had no hardware evidence anywhere.
Real multi-chip hardware is unavailable here (one v5e behind the tunnel),
so this probe captures the two strongest single-chip proxies:

  sharded_1dev — run the full serving image tower (whole-layer int8
      Pallas mega-kernels, vit_b32_serving) on the real chip with its
      batch input carrying a NamedSharding over a 1-device ("data",)
      Mesh. GSPMD partitioning runs over the module (sharded jit is a
      different compile path + executable than the unsharded one) and the
      Mosaic kernels execute compiled, not interpreted. Numerics are
      compared against the unsharded jit of the same apply.

  aot_v5e8 — compile-only AOT attempt for an 8-chip v5e topology via
      jax.experimental.topologies: lower the data-sharded serving tower
      against ShapeDtypeStructs sharded over the 2x4 topology mesh and
      invoke the compiler with no attached devices. Success proves the
      multi-chip GSPMD lowering + Mosaic compile combination; failure is
      recorded verbatim (the axon tunnel may not expose a compile-only
      backend).

Output: bench_results/gspmd_probe.json
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_PATH = os.path.join(os.path.dirname(__file__), "..",
                        "bench_results", "gspmd_probe.json")
out = {"cases": {}}


def flush():
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=1)


def rec(name, **kw):
    out["cases"][name] = kw
    print(json.dumps({name: kw}), flush=True)
    flush()


def main():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from image_retrieval_tpu.config import vit_b32_serving
    from image_retrieval_tpu.models.clip import CLIP, init_params

    dev = jax.devices()[0]
    out["device"] = str(dev)
    flush()

    cfg = vit_b32_serving()
    model, params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
    bs = 64
    x = jax.jit(
        lambda key: jax.random.normal(key, (bs, 224, 224, 3), jnp.bfloat16)
    )(jax.random.PRNGKey(11))
    _ = jax.device_get(x[0, 0, 0, 0])

    def encode(p, xx):
        return model.apply(p, xx, method=CLIP.encode_image)

    # --- unsharded compiled baseline --------------------------------------
    t0 = time.perf_counter()
    ref = np.asarray(jax.device_get(jax.jit(encode)(params, x)), np.float64)
    t_plain = time.perf_counter() - t0
    rec("unsharded_exec", ok=True, batch=bs,
        compile_plus_run_s=round(t_plain, 1))

    # --- 1-device mesh: GSPMD-partitioned compile of the same tower -------
    try:
        mesh = Mesh(np.array([dev]), ("data",))
        data_sh = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        xs = jax.device_put(x, data_sh)
        ps = jax.device_put(params, repl)
        jitted = jax.jit(encode, in_shardings=(repl, data_sh),
                         out_shardings=data_sh)
        t0 = time.perf_counter()
        got = np.asarray(jax.device_get(jitted(ps, xs)), np.float64)
        t_sh = time.perf_counter() - t0
        cos = (ref * got).sum(-1) / (
            np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1))
        rec("sharded_1dev_exec", ok=True,
            compile_plus_run_s=round(t_sh, 1),
            max_abs_diff=float(np.abs(ref - got).max()),
            min_cos_vs_unsharded=float(cos.min()),
            bitwise_identical=bool(np.array_equal(ref, got)))
    except Exception as e:  # pragma: no cover
        rec("sharded_1dev_exec", ok=False, error=str(e)[:500])

    # --- AOT compile-only for an 8-chip v5e topology -----------------------
    try:
        from jax.experimental import topologies

        topo = None
        errs = {}
        for name in ("v5e:2x4", "v5litepod-8", "v5e-8"):
            try:
                topo = topologies.get_topology_desc(
                    platform="tpu", topology_name=name)
                out["aot_topology_name"] = name
                break
            except Exception as e:
                errs[name] = str(e)[:200]
        if topo is None:
            raise RuntimeError(f"no topology resolved: {errs}")

        tmesh = topologies.make_mesh(topo, (8,), ("data",))
        tdata = NamedSharding(tmesh, P("data"))
        trepl = NamedSharding(tmesh, P())
        x_s = jax.ShapeDtypeStruct((256, 224, 224, 3), jnp.bfloat16,
                                   sharding=tdata)
        p_s = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=trepl),
            params)
        t0 = time.perf_counter()
        lowered = jax.jit(encode, in_shardings=(trepl, tdata),
                          out_shardings=tdata).lower(p_s, x_s)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_comp = time.perf_counter() - t0
        mem = None
        try:
            an = compiled.memory_analysis()
            mem = getattr(an, "output_size_in_bytes", None)
        except Exception:
            pass
        rec("aot_v5e8_compile", ok=True, lower_s=round(t_lower, 1),
            compile_s=round(t_comp, 1), output_bytes=mem,
            note="serving tower (Pallas mega-kernels) compiled for a "
                 "2x4 v5e topology with no attached chips")
    except Exception as e:  # pragma: no cover
        rec("aot_v5e8_compile", ok=False, error=str(e)[:500])

    # --- AOT compile-only, SHARD_MAP wrap (the production multi-chip
    # form: GSPMD cannot auto-partition Mosaic; models/encoder.py wraps
    # the tower in shard_map over the data axis) ------------------------
    try:
        from jax.experimental import topologies
        from jax import shard_map

        topo = topologies.get_topology_desc(
            platform="tpu", topology_name=out.get("aot_topology_name",
                                                  "v5e:2x4"))
        tmesh = topologies.make_mesh(topo, (8,), ("data",))
        tdata = NamedSharding(tmesh, P("data"))
        trepl = NamedSharding(tmesh, P())
        sm = shard_map(encode, mesh=tmesh, in_specs=(P(), P("data")),
                       out_specs=P("data"), check_vma=False)
        x_s = jax.ShapeDtypeStruct((256, 224, 224, 3), jnp.bfloat16,
                                   sharding=tdata)
        p_s = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                           sharding=trepl),
            params)
        t0 = time.perf_counter()
        lowered = jax.jit(sm, in_shardings=(trepl, tdata),
                          out_shardings=tdata).lower(p_s, x_s)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_comp = time.perf_counter() - t0
        rec("aot_v5e8_shardmap_compile", ok=True,
            lower_s=round(t_lower, 1), compile_s=round(t_comp, 1),
            note="shard_map-wrapped serving tower compiled for 2x4 v5e "
                 "with no attached chips — the multi-chip serving path")
    except Exception as e:  # pragma: no cover
        rec("aot_v5e8_shardmap_compile", ok=False, error=str(e)[:500])

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
