"""TPU probe: int4 gallery tier — sweep speed, rerank cost, transfer win.

Questions this answers (bench_results/int4_probe.json):
  int8      — exact int8 sweep baseline on the same data/methodology.
  unpack    — nibble-packed uint8 (N, D/2), interleave-unpack -> bf16 dot.
              (r3 capture: 2.11 ms vs int8 1.13 — the stack+reshape
              interleave materializes; kept for comparison.)
  unpack2   — two-dot decomposition: q_even @ lo + q_odd @ hi, no
              interleave. Mathematically identical scores; the question is
              whether XLA fuses nibble extraction into the matmul operand
              read (gp is 256 MB; reading it twice still equals int8's
              512 MB).
  unpack2_rr— two-phase: packed-int4 screen -> top-C -> gather resident
              int8 rows -> exact rerank. CPU sim says recall@10 ~1.0 at
              C=128; here we measure device time + recall.
  put_bw    — host->device device_put bandwidth for a 2M-row chunk, int8
              (1 GiB) vs packed int4 (512 MiB): the streamed-tier win is
              transfer-bound, so this ratio IS the streamed speedup bound.

Native jnp.int4 (S4) is RECORDED-DEAD on this backend: passing an
S4[1M,512] array as a jit argument trips "Recursively calling jit" inside
the axon runtime (two captures, bench_results/int4_probe.json r3 runs 1-2).
The packed-uint8 representation below is the production form.

Methodology: bench.py's one-vs-two-dispatch `device_seconds` (the tunnel's
fetch RTT drifts; differencing cancels it), single-query latency via a
lax.scan over nq=64 queries inside ONE dispatch.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

N = 1 << 20
D = 512
K = 10
NQ = 64
C = 128  # rerank candidates per query

out = {"n": N, "d": D, "k": K, "nq": NQ, "c": C, "cases": {}}


def device_seconds(enqueue, repeats=5):
    _ = jax.device_get(enqueue(0))
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
        _ = jax.device_get(c)
        t3 = time.perf_counter()
        del b
        ts.append(max((t3 - t2) - (t1 - t0), 1e-9))
    return np.array(ts)


def main():
    dev = jax.devices()[0]
    out["device"] = str(dev)
    out["native_int4"] = (
        "unsupported: S4 jit arg trips 'Recursively calling jit' on this "
        "backend (r3 captures); packed-uint8 is the production form"
    )

    @jax.jit
    def make_gallery(key):
        g = jax.random.normal(key, (N, D), jnp.float32)
        return g / jnp.linalg.norm(g, axis=1, keepdims=True)

    g32 = make_gallery(jax.random.PRNGKey(0))

    @jax.jit
    def quant8(g):
        grid = jnp.maximum(jnp.abs(g).max(axis=1), 1e-12) / 127.0
        q = jnp.clip(jnp.round(g / grid[:, None]), -127, 127).astype(jnp.int8)
        qn = jnp.linalg.norm(q.astype(jnp.float32), axis=1)
        return q, (1.0 / jnp.where(qn > 0, qn, 1.0)).astype(jnp.float32)

    @jax.jit
    def quant4_vals(g):
        grid = jnp.maximum(jnp.abs(g).max(axis=1), 1e-12) / 7.0
        q = jnp.clip(jnp.round(g / grid[:, None]), -7, 7).astype(jnp.int8)
        qn = jnp.linalg.norm(q.astype(jnp.float32), axis=1)
        return q, (1.0 / jnp.where(qn > 0, qn, 1.0)).astype(jnp.float32)

    g8, s8 = quant8(g32)
    q4v, s4 = quant4_vals(g32)  # int8-held int4 values, for packing

    # nibble-packed uint8: lo nibble = even dims, hi nibble = odd dims,
    # biased by 8 so values live in [1, 15]
    @jax.jit
    def pack_nibbles(v):
        u = (v + 8).astype(jnp.uint8)
        lo = u[:, 0::2]
        hi = u[:, 1::2]
        return lo | (hi << 4)

    gp = pack_nibbles(q4v)

    qs_pool_n = 3 * 5 + 1
    make_queries = jax.jit(
        lambda key: jax.random.normal(key, (NQ, 1, D), jnp.float32)
    )
    qs_pool = [make_queries(jax.random.PRNGKey(100 + i))
               for i in range(qs_pool_n)]
    _ = jax.device_get(qs_pool[-1][0, 0, 0])

    def scan_over_queries(step):
        @jax.jit
        def run(g, sc, qs):
            def body(_, q):
                qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
                return None, step(g, sc, qn.astype(jnp.bfloat16))
            _, o = jax.lax.scan(body, None, qs)
            return o
        return run

    def sweep_step(g, sc, qn16):
        dots = jax.lax.dot_general(
            qn16, g.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jax.lax.top_k(dots * sc[None, :], K)

    def time_case(name, g, sc, step):
        try:
            run = scan_over_queries(step)
            ts = device_seconds(lambda i: run(g, sc, qs_pool[i])) / NQ
            out["cases"][name] = {
                "ms_per_query": round(float(np.median(ts)) * 1e3, 4),
                "ms_min": round(float(ts.min()) * 1e3, 4),
                "ms_max": round(float(ts.max()) * 1e3, 4),
            }
            return run
        except Exception as e:
            out["cases"][name] = {"error": str(e)[:300]}
            return None

    run8 = time_case("int8", g8, s8, sweep_step)

    def unpack_step(g, sc, qn16):
        lo = (g & 0xF).astype(jnp.int8) - 8
        hi = (g >> 4).astype(jnp.int8) - 8
        v = jnp.stack([lo, hi], axis=-1).reshape(g.shape[0], D)
        dots = jax.lax.dot_general(
            qn16, v.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jax.lax.top_k(dots * sc[None, :], K)

    time_case("unpack", gp, s4, unpack_step)

    def unpack2_step(g, sc, qn16):
        # dot over even dims with lo nibbles + odd dims with hi nibbles:
        # order-invariant sum, no interleave materialization
        lo = ((g & 0xF).astype(jnp.int8) - 8).astype(jnp.bfloat16)
        hi = ((g >> 4).astype(jnp.int8) - 8).astype(jnp.bfloat16)
        dots = (
            jax.lax.dot_general(qn16[:, 0::2], lo, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(qn16[:, 1::2], hi, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        )
        return jax.lax.top_k(dots * sc[None, :], K)

    run2 = time_case("unpack2", gp, s4, unpack2_step)

    # --- two-phase: packed-int4 screen -> exact int8 rerank -----------------
    @jax.jit
    def rr(gp_, g8_, s4_, s8_, qs):
        def body(_, q):
            qn = (q / jnp.linalg.norm(q, axis=-1, keepdims=True)
                  ).astype(jnp.bfloat16)
            lo = ((gp_ & 0xF).astype(jnp.int8) - 8).astype(jnp.bfloat16)
            hi = ((gp_ >> 4).astype(jnp.int8) - 8).astype(jnp.bfloat16)
            dots = (
                jax.lax.dot_general(qn[:, 0::2], lo, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(qn[:, 1::2], hi,
                                      (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            )
            _, cand = jax.lax.top_k(dots * s4_[None, :], C)
            cand = cand[0]
            rows = jnp.take(g8_, cand, axis=0).astype(jnp.bfloat16)
            ex = jax.lax.dot_general(
                qn, rows, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ex = ex * s8_[cand][None, :]
            v, i = jax.lax.top_k(ex, K)
            return None, (v, jnp.take(cand, i[0])[None, :])
        _, o = jax.lax.scan(body, None, qs)
        return o

    try:
        ts = device_seconds(lambda i: rr(gp, g8, s4, s8, qs_pool[i])) / NQ
        out["cases"]["unpack2_rr"] = {
            "ms_per_query": round(float(np.median(ts)) * 1e3, 4),
            "ms_min": round(float(ts.min()) * 1e3, 4),
            "ms_max": round(float(ts.max()) * 1e3, 4),
        }
    except Exception as e:
        out["cases"]["unpack2_rr"] = {"error": str(e)[:300]}

    # --- host->device transfer bandwidth: int8 vs packed --------------------
    try:
        cn = 1 << 21  # 2M rows: 1 GiB int8, 512 MiB packed
        host8 = np.asarray(jax.device_get(g8[:cn]))
        hostp = np.asarray(jax.device_get(gp[:cn]))
        bw = {}
        for name, arr in (("int8", host8), ("packed4", hostp)):
            # time put + materialization; first one warms the path
            d = jax.device_put(arr, dev)
            _ = jax.device_get(jax.jit(lambda v: v[0, 0])(d))
            del d
            ts = []
            for _r in range(3):
                t0 = time.perf_counter()
                d = jax.device_put(arr, dev)
                _ = jax.device_get(jax.jit(lambda v: v[0, 0])(d))
                ts.append(time.perf_counter() - t0)
                del d
            sec = float(np.median(ts))
            bw[name] = {
                "bytes": int(arr.nbytes),
                "seconds": round(sec, 4),
                "gbps": round(arr.nbytes / sec / 1e9, 3),
            }
        bw["transfer_speedup"] = round(
            bw["int8"]["seconds"] / bw["packed4"]["seconds"], 3)
        out["cases"]["put_bw"] = bw
        del host8, hostp
    except Exception as e:
        out["cases"]["put_bw"] = {"error": str(e)[:300]}

    # --- recall vs on-device f32 oracle --------------------------------------
    try:
        @jax.jit
        def oracle(g, qs):
            def body(_, q):
                qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
                s = jnp.dot(qn, g.T, preferred_element_type=jnp.float32)
                return None, jax.lax.top_k(s, K)
            _, o = jax.lax.scan(body, None, qs)
            return o
        qs = qs_pool[0]
        _, oidx = jax.device_get(oracle(g32, qs))
        recs = {}
        if run2 is not None:
            _, i4 = jax.device_get(run2(gp, s4, qs))
            recs["int4_raw"] = float(np.mean([
                len(set(a[0]) & set(b[0])) / K for a, b in zip(oidx, i4)]))
        _, irr = jax.device_get(rr(gp, g8, s4, s8, qs))
        recs["int4_rr"] = float(np.mean([
            len(set(a[0]) & set(b[0])) / K for a, b in zip(oidx, irr)]))
        if run8 is not None:
            _, i8 = jax.device_get(run8(g8, s8, qs))
            recs["int8"] = float(np.mean([
                len(set(a[0]) & set(b[0])) / K for a, b in zip(oidx, i8)]))
        out["recall_at_10"] = {k: round(v, 4) for k, v in recs.items()}
    except Exception as e:
        out["recall_error"] = str(e)[:300]

    path = os.path.join(os.path.dirname(__file__), "..",
                        "bench_results", "int4_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
