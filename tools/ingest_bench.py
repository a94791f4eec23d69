"""End-to-end ingest benchmark: JPEG-on-disk -> decoded -> embedded ->
indexed rows (VERDICT r2 item 2).

The reference's write path is a synchronous per-image loop
(/root/reference/src/ImageEmbeddingSystem.py:100-137). Ours is the decode
pool -> prefetch queue -> batched device encode -> sharded insert pipeline
(data/loader.py + app/embed.py). Every published img/s number so far starts
from pre-staged pixels; this tool measures the full chain from bytes on
disk and decomposes the bound:

  decode_img_per_s_core   per-core native decode+preprocess rate (the host
                          leg; this box has ONE core, so e2e here is
                          decode-bound by construction)
  encode_img_per_s        device encode rate on pre-staged pixels
  e2e_img_per_s           JPEG file -> indexed row, overlapped pipeline
  overlap_efficiency      (T_decode + T_encode - T_e2e) / min(T_d, T_e):
                          1.0 = the smaller leg fully hidden
  cores_to_saturate       decode cores needed to feed the device rate;
                          projected_img_per_s_Ncores = the honest n-core
                          form of the ">=10k img/s/chip" ingest claim

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

    # --- device leg: encode rate on pre-staged pixels -----------------------
    if use_native:
        from image_retrieval_tpu.utils.native import decode_preprocess_batch_u8

        staged, _ = decode_preprocess_batch_u8(
            paths[:batch_size], threads=os.cpu_count() or 1
        )
    else:
        from image_retrieval_tpu.data.loader import _decode_chunk_pil

        staged, _ = _decode_chunk_pil(paths[:batch_size], 224)
    _ = encoder.encode_pixels(staged)  # compile + warm
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        _ = encoder.encode_pixels(staged)
    t_enc_batch = (time.perf_counter() - t0) / reps
    out["encode_img_per_s"] = round(batch_size / t_enc_batch, 1)
    t_encode_full = len(paths) / (batch_size / t_enc_batch)

    # --- e2e: loader (background decode) -> encode -> index insert ----------
    index = ShardedVectorIndex(
        dim=encoder.dim, config=IndexConfig(capacity_step=4096)
    )
    t0 = time.perf_counter()
    n_ok = 0
    for chunk, batch, ok in ImageBatchLoader(
        paths, batch_size=batch_size, size=224, use_native=use_native,
        threads=1, emit="u8" if use_native else "f32",
    ):
        good = np.flatnonzero(ok)
        if not len(good):
            continue
        # all-ok batches skip the fancy-index copy (single ingest core)
        embs = encoder.encode_pixels(batch if ok.all() else batch[good])
        index.insert([chunk[int(i)] for i in good], embs)
        n_ok += len(good)
    index.flush()
    t_e2e = time.perf_counter() - t0
    assert n_ok == len(paths), (n_ok, len(paths))
    assert len(index) == len(paths)
    out["e2e_img_per_s"] = round(len(paths) / t_e2e, 1)
    out["e2e_seconds"] = round(t_e2e, 2)

    # --- bound decomposition -------------------------------------------------
    hidden = t_decode_full + t_encode_full - t_e2e
    out["overlap_efficiency"] = round(
        max(0.0, min(1.0, hidden / max(min(t_decode_full, t_encode_full), 1e-9))), 3
    )
    device_rate = device_rate_hint or out["encode_img_per_s"]
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
