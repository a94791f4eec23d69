"""End-to-end ingest benchmark: JPEG-on-disk -> decoded -> embedded ->
indexed rows (VERDICT r2 item 2; pipeline overlap VERDICT r4 item 1).

The reference's write path is a synchronous per-image loop
(/root/reference/src/ImageEmbeddingSystem.py:100-137). Ours is the decode
pool -> prefetch queue -> cross-batch async device encode -> sharded insert
pipeline (data/loader.py + models/encoder.py encode_stream). This tool
measures the full chain from bytes on disk and decomposes the bound:

  decode_img_per_s_core   per-core native decode+preprocess rate (the host
                          leg; this box has ONE core). NOTE: this rate
                          drifts ~3x BETWEEN SESSIONS on the shared dev
                          host (350-1100 img/s on the same corpus,
                          bench_results/ingest_attrib_probe.json vs
                          BENCH_r04) — which is why e2e numbers from
                          different sessions are only comparable through
                          the per-run legs reported alongside them.
  transfer_img_per_s      host->device pixel upload rate. Measured with
                          EQUALIZED barriers: (1 put + 1 barrier) vs
                          (3 puts + 1 barrier), difference / 2 — both
                          variants pay exactly one jitted-reduction fetch,
                          so the drifting tunnel RTT cancels instead of
                          leaking into the difference (r4 ADVICE item 1).
  encode_img_per_s_device device-only encode rate on PRE-STAGED device
                          pixels via the one-vs-two-dispatch difference
                          (no transfer leg, no fetch-estimate subtraction
                          — r4 ADVICE item 3).
  e2e_img_per_s           JPEG file -> indexed row through the overlapped
                          pipeline, with per-phase attribution
                          (e2e_wait_decode_s / e2e_wait_device_s /
                          e2e_insert_s / e2e_dispatch_s — same meanings in
                          every schedule) so a slow run self-explains.
  pipeline_bound          name of the slowest leg; pipeline_bound_img_per_s
                          is the best rate ANY scheduler could reach here.
  overlap_efficiency      (sum(legs) - T_e2e) / (sum(legs) - max(legs)):
                          1.0 = perfectly pipelined (e2e == slowest leg),
                          0.0 = fully serial. Computed over all THREE legs.
  cores_to_saturate       decode cores needed to feed the device rate;
                          projected_img_per_s_Ncores = the honest n-core
                          form of the ">=10k img/s/chip" ingest claim
                          (assumes a PCIe-class link, i.e. no transfer leg)

Importable (`run_ingest_bench`) so bench.py captures `ingest_img_per_s_e2e`
in the driver run; CLI for standalone probes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def ensure_corpus(corpus_dir: str, n_images: int = 512, wh=(640, 480)) -> list:
    """Synthetic JPEG corpus (shape scenes, quality 85 — natural-image-like
    decode cost), cached across runs."""
    os.makedirs(corpus_dir, exist_ok=True)
    paths = [os.path.join(corpus_dir, f"img_{i:05d}.jpg") for i in range(n_images)]
    if all(os.path.exists(p) for p in paths):
        return paths
    from image_retrieval_tpu.data.synthetic import synth_image

    colors = ("white", "black", "brown")
    for i, p in enumerate(paths):
        if os.path.exists(p):
            continue
        im = synth_image(i % 10, colors[i % 3], i, size=max(wh))
        im = im.resize(wh)
        im.save(p, quality=85)
    return paths


def _transfer_seconds_per_batch(staged: np.ndarray, reps: int = 3) -> float:
    """Per-batch host->device transfer time, barrier-equalized.

    Times (1 put + barrier) and (3 puts + barrier) and divides the
    min-over-reps difference by 2. The barrier is a tiny jitted reduction
    CONSUMING every put (its execution cannot start until all transfers
    land) fetched once — both variants pay exactly one fetch round-trip
    (30-50 ms on the dev tunnel, drifting), so it cancels in the
    difference. Distinct host buffers so no put can alias another.
    """
    import jax
    import jax.numpy as jnp

    bufs = [staged, staged.copy(), staged.copy()]
    bar1 = jax.jit(lambda a: a.ravel()[0].astype(jnp.float32))
    bar3 = jax.jit(
        lambda a, b, c: (
            a.ravel()[0].astype(jnp.float32)
            + b.ravel()[0].astype(jnp.float32)
            + c.ravel()[0].astype(jnp.float32)
        )
    )

    def put1() -> float:
        t0 = time.perf_counter()
        d = jax.device_put(bufs[0])
        _ = jax.device_get(bar1(d))
        return time.perf_counter() - t0

    def put3() -> float:
        t0 = time.perf_counter()
        devs = [jax.device_put(x) for x in bufs]
        _ = jax.device_get(bar3(*devs))
        return time.perf_counter() - t0

    put1(); put3()  # warm transfers + compile both barriers
    t1 = min(put1() for _ in range(reps))
    t3 = min(put3() for _ in range(reps))
    return max((t3 - t1) / 2.0, 0.0)


def _device_encode_seconds(encoder, staged: np.ndarray, reps: int = 3) -> float:
    """Device-only encode seconds per batch on PRE-STAGED device pixels.

    One-vs-two-dispatch difference (bench.py device_seconds method): each
    rep times fetch(1 forward) and fetch(2 forwards queued back-to-back)
    on device-resident inputs; the difference is one forward of pure
    device time — dispatch overhead and the drifting fetch RTT cancel.
    """
    import jax
    import jax.numpy as jnp

    xa = jnp.asarray(staged)
    xb = jnp.asarray(staged.copy())
    _ = jax.device_get(xa.ravel()[0]); _ = jax.device_get(xb.ravel()[0])
    enc = (encoder._encode_image_u8 if staged.dtype == np.uint8
           else encoder._encode_image)
    p = encoder.params
    _ = jax.device_get(enc(p, xa))  # compile + warm
    ts = []
    for _r in range(reps):
        a = enc(p, xa)
        t0 = time.perf_counter()
        _ = jax.device_get(a)
        t1 = time.perf_counter()
        b = enc(p, xa)
        c = enc(p, xb)
        t2 = time.perf_counter()
        # fetch ONLY c: same-device executions run in dispatch order
        _ = jax.device_get(c)
        t3 = time.perf_counter()
        del b
        ts.append(max((t3 - t2) - (t1 - t0), 1e-9))
    return float(np.median(ts))


def run_ingest_bench(
    encoder,
    corpus_dir: str,
    n_images: int = 512,
    batch_size: int = 256,
    use_native: bool = True,
    device_rate_hint: float = 0.0,
) -> dict:
    """Measure the chain with the given encoder. Returns the metric dict."""
    from image_retrieval_tpu.config import IndexConfig
    from image_retrieval_tpu.data.loader import ImageBatchLoader
    from image_retrieval_tpu.index import ShardedVectorIndex

    paths = ensure_corpus(corpus_dir, n_images)
    out: dict = {"n_images": len(paths), "use_native": use_native}

    # --- host leg: decode+preprocess rate, 1 thread (= per core) -----------
    sample = paths[: min(128, len(paths))]
    if use_native:
        from image_retrieval_tpu.utils import native

        use_native = native.available()
        out["use_native"] = use_native
    if use_native:
        # u8 emit: the production throughput form (DCT-scaled decode +
        # raw-byte output; normalize runs on device)
        from image_retrieval_tpu.utils.native import decode_preprocess_batch_u8

        decode_preprocess_batch_u8(sample[:8], threads=1)  # warm (page cache)
        t0 = time.perf_counter()
        _, ok = decode_preprocess_batch_u8(sample, threads=1)
        t_dec_sample = time.perf_counter() - t0
        assert ok.all()
        out["decode_img_per_s_core"] = round(len(sample) / t_dec_sample, 1)
    else:
        from image_retrieval_tpu.data.loader import _decode_chunk_pil

        _decode_chunk_pil(sample[:8], 224)
        t0 = time.perf_counter()
        _, ok = _decode_chunk_pil(sample, 224)
        t_dec_sample = time.perf_counter() - t0
        out["decode_img_per_s_core"] = round(len(sample) / t_dec_sample, 1)
    decode_rate = out["decode_img_per_s_core"]
    t_decode_full = len(paths) / decode_rate

    # staged pixels for the transfer/encode legs
    if use_native:
        from image_retrieval_tpu.utils.native import decode_preprocess_batch_u8

        staged, _ = decode_preprocess_batch_u8(
            paths[:batch_size], threads=os.cpu_count() or 1
        )
    else:
        from image_retrieval_tpu.data.loader import _decode_chunk_pil

        staged, _ = _decode_chunk_pil(paths[:batch_size], 224)

    # --- link leg: host->device pixel upload (the tunnel/PCIe leg) ----------
    try:
        t_xfer_batch = _transfer_seconds_per_batch(staged)
        out["transfer_img_per_s"] = round(staged.shape[0] / max(t_xfer_batch, 1e-9), 1)
        out["transfer_MB_per_s"] = round(staged.nbytes / 1e6 / max(t_xfer_batch, 1e-9), 1)
        t_transfer_full = len(paths) * (t_xfer_batch / staged.shape[0])
    except Exception:  # CPU / no device: the leg is negligible
        t_transfer_full = 0.0
        out["transfer_img_per_s"] = 0.0
        out["transfer_MB_per_s"] = 0.0

    # --- device leg: encode rate on pre-staged DEVICE pixels ----------------
    try:
        t_enc_batch = _device_encode_seconds(encoder, staged)
        out["encode_img_per_s_device"] = round(batch_size / t_enc_batch, 1)
        t_encode_full = len(paths) * (t_enc_batch / batch_size)
    except Exception:  # fake encoder / CPU: fall back to a wall measure
        _ = encoder.encode_pixels(staged)
        t0 = time.perf_counter()
        for _ in range(3):
            _ = encoder.encode_pixels(staged)
        t_enc_batch = (time.perf_counter() - t0) / 3
        out["encode_img_per_s_device"] = round(batch_size / t_enc_batch, 1)
        t_encode_full = max(
            len(paths) * (t_enc_batch / batch_size) - t_transfer_full, 1e-9
        )

    # --- e2e: loader (background decode) -> streamed encode -> insert -------
    # encode_stream keeps device batches in flight across loader batches:
    # batch N's fetch happens while batch N+1 decodes and its transfer is
    # in the air (per-batch encode_pixels measured fully serial —
    # bench_results/ingest_attrib_probe.json D_e2e). Two decode schedules
    # are measured: thread (in-process; contends with the tunnel client
    # through the GIL on this host — ingest_attrib2_probe.json) and
    # process (decode subprocess, one pipe hop per batch). The headline
    # e2e is the better one; both are reported.
    def run_e2e(use_process: bool) -> dict:
        index = ShardedVectorIndex(
            dim=encoder.dim, config=IndexConfig(capacity_step=4096)
        )
        phase = {"wait_decode": 0.0, "wait_device": 0.0, "insert": 0.0}

        def feed():
            it = iter(ImageBatchLoader(
                paths, batch_size=batch_size, size=224,
                use_native=use_native, threads=1,
                emit="u8" if use_native else "f32",
                use_process=use_process,
            ))
            while True:
                t0 = time.perf_counter()
                try:
                    chunk, batch, ok = next(it)
                except StopIteration:
                    return
                phase["wait_decode"] += time.perf_counter() - t0
                good = np.flatnonzero(ok)
                if not len(good):
                    continue
                # all-ok batches skip the fancy-index copy (1 ingest core)
                yield ([chunk[int(i)] for i in good],
                       batch if ok.all() else batch[good])

        t0_run = time.perf_counter()
        cpu0 = time.process_time()
        n_ok = 0
        stream = encoder.encode_stream(feed())
        while True:
            # the stream advance is where encode_stream blocks on the
            # device (fetch barrier on the oldest in-flight batch +
            # dispatch of the newest); feed() runs inside it too, so net
            # out the decode wait it accumulates during this window to
            # keep the phases a partition of the wall
            t0 = time.perf_counter()
            wd0 = phase["wait_decode"]
            try:
                good_paths, embs = next(stream)
            except StopIteration:
                break
            phase["wait_device"] += (time.perf_counter() - t0) - (
                phase["wait_decode"] - wd0)
            t0 = time.perf_counter()
            index.insert(good_paths, embs)
            n_ok += len(good_paths)
            phase["insert"] += time.perf_counter() - t0
        index.flush()
        t_e2e = time.perf_counter() - t0_run
        assert n_ok == len(paths), (n_ok, len(paths))
        assert len(index) == len(paths)
        r = {"img_per_s": round(len(paths) / t_e2e, 1),
             "seconds": round(t_e2e, 2),
             "cpu_s": round(time.process_time() - cpu0, 2)}
        # attribution: wait_decode = blocked on the loader queue;
        # wait_device = blocked in the stream advance (device fetch/
        # dispatch); insert = host-side index append; the residual is
        # loop overhead. Partitions the wall, so a slow driver run
        # self-explains (r4's 112-vs-240 spread had no such breakdown).
        for k, v in phase.items():
            r[f"{k}_s"] = round(v, 2)
        r["dispatch_s"] = round(t_e2e - sum(phase.values()), 2)
        return r

    def run_e2e_staged() -> dict:
        """Third schedule: decode inline, and BARRIER each batch's
        host->device transfer before decoding the next — decode is never
        concurrent with a transfer (they mutually degrade 2-4x+ on this
        host, ingest_attrib2/3 probes); only the device COMPUTE (host-
        passive) overlaps the next decode. Costs one tiny fetch RTT per
        batch; immune to the tunnel client's CPU-spin behavior."""
        import jax
        import jax.numpy as jnp

        from image_retrieval_tpu.utils.native import (
            decode_preprocess_batch_u8,
        )

        index = ShardedVectorIndex(
            dim=encoder.dim, config=IndexConfig(capacity_step=4096)
        )
        phase = {"wait_decode": 0.0, "wait_device": 0.0, "insert": 0.0}
        enc_fn = encoder._encode_image_u8
        params = encoder.params
        t0_run = time.perf_counter()
        cpu0 = time.process_time()
        prev = None  # (chunk_paths, pending_result, n)
        for i in range(0, len(paths), batch_size):
            chunk = paths[i : i + batch_size]
            t0 = time.perf_counter()
            batch, ok = decode_preprocess_batch_u8(chunk, threads=1)
            phase["wait_decode"] += time.perf_counter() - t0
            good = np.flatnonzero(ok)
            px = batch if ok.all() else batch[good]
            nb = encoder._batch_sizes(px.shape[0])
            if px.shape[0] != nb:
                px = np.concatenate(
                    [px, np.zeros((nb - px.shape[0],) + px.shape[1:],
                                  px.dtype)])
            dev = jnp.asarray(px)
            _ = jax.device_get(dev.ravel()[0])  # transfer barrier
            pending = enc_fn(params, dev)  # compute async (host-passive)
            if prev is not None:
                pchunk, pres, pn = prev
                t0 = time.perf_counter()
                emb = np.asarray(pres)[:pn]  # device fetch barrier
                phase["wait_device"] += time.perf_counter() - t0
                t0 = time.perf_counter()
                index.insert(pchunk, emb)
                phase["insert"] += time.perf_counter() - t0
            prev = ([chunk[int(j)] for j in good], pending, len(good))
        if prev is not None:
            pchunk, pres, pn = prev
            t0 = time.perf_counter()
            emb = np.asarray(pres)[:pn]
            phase["wait_device"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            index.insert(pchunk, emb)
            phase["insert"] += time.perf_counter() - t0
        index.flush()
        t_e2e = time.perf_counter() - t0_run
        assert len(index) == len(paths)
        r = {"img_per_s": round(len(paths) / t_e2e, 1),
             "seconds": round(t_e2e, 2),
             "cpu_s": round(time.process_time() - cpu0, 2)}
        for k, v in phase.items():
            r[f"{k}_s"] = round(v, 2)
        r["dispatch_s"] = round(t_e2e - sum(phase.values()), 2)
        return r

    def best_of(fn, reps=2):
        # the host's available CPU and the tunnel's throughput both drift
        # minute-to-minute (decode measured 400-1194 img/s within one
        # session, same binary/corpus); best-of-2 keeps a one-off collapse
        # from masquerading as a scheduling property
        runs = [fn() for _ in range(reps)]
        return max(runs, key=lambda r: r["img_per_s"])

    if use_native:
        # warm the persistent decode worker (spawn + imports amortize to
        # zero in a long-lived ingest service; keep them off the clock)
        for _ in ImageBatchLoader(paths[:8], batch_size=8, size=224,
                                  use_native=use_native, threads=1,
                                  emit="u8", use_process=True):
            pass
        modes = {"thread": best_of(lambda: run_e2e(False)),
                 "process": best_of(lambda: run_e2e(True))}
        try:
            modes["staged"] = best_of(run_e2e_staged)
        except AttributeError:
            pass  # fake encoder: no raw forward handles
    else:
        modes = {"thread": run_e2e(False)}
    best = max(modes, key=lambda m: modes[m]["img_per_s"])
    out["e2e_img_per_s"] = modes[best]["img_per_s"]
    out["e2e_mode"] = best
    out["e2e_seconds"] = modes[best]["seconds"]
    out["e2e_cpu_s"] = modes[best]["cpu_s"]
    for k in ("wait_decode_s", "wait_device_s", "insert_s", "dispatch_s"):
        out[f"e2e_{k}"] = modes[best][k]
    for m, r in modes.items():
        out[f"e2e_img_per_s_{m}"] = r["img_per_s"]

    # --- bound decomposition: three legs (decode / link / device encode) ----
    legs = {
        "decode": t_decode_full,
        "transfer": t_transfer_full,
        "encode": t_encode_full,
    }
    t_serial = sum(legs.values())
    t_ideal = max(legs.values())
    out["pipeline_bound"] = max(legs, key=legs.get)
    out["pipeline_bound_img_per_s"] = round(len(paths) / max(t_ideal, 1e-9), 1)
    out["serial_floor_img_per_s"] = round(len(paths) / max(t_serial, 1e-9), 1)
    # 1.0 = perfectly pipelined (e2e == slowest leg); 0.0 = fully serial
    denom = t_serial - t_ideal
    out["overlap_efficiency"] = round(
        max(0.0, min(1.0, (t_serial - out["e2e_seconds"]) / denom)), 3
    ) if denom > 1e-9 else 1.0
    # n-core projection uses the DEVICE-only rate (no transfer leg on a
    # PCIe-class production host); device_rate_hint (the serving capture)
    # takes precedence, the netted device rate is the fallback
    device_rate = device_rate_hint or out["encode_img_per_s_device"]
    out["cores_to_saturate_device"] = round(device_rate / decode_rate, 1)
    for cores in (8, 32, 64):
        out[f"projected_img_per_s_{cores}cores"] = round(
            min(cores * decode_rate, device_rate), 1
        )
    return out


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--pil", action="store_true", help="force PIL decode")
    ap.add_argument("--fake-encoder", action="store_true")
    ap.add_argument("--corpus-dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".ingest_corpus"))
    args = ap.parse_args()

    from image_retrieval_tpu.models.encoder import get_encoder

    if args.fake_encoder:
        encoder = get_encoder(fake=True)
        hint = 0.0
    else:
        from image_retrieval_tpu.config import Config, vit_b32_serving

        encoder = get_encoder(config=Config(model=vit_b32_serving()))
        hint = 21000.0  # measured serving embed rate (r2_layer8_bench.json)
    res = run_ingest_bench(
        encoder, args.corpus_dir, args.n_images, args.batch_size,
        use_native=not args.pil, device_rate_hint=hint,
    )
    print(json.dumps(res, indent=1))
    respath = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "ingest_bench.json")
    with open(respath, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
