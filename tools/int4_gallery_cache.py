"""Shared on-disk cache of the synthetic int4/int8 probe galleries.

Generating 16M unit rows + int8 + packed int4 takes ~20 min on this
1-core host; the int4 probes (scale, block, operand-variant) all need the
same arrays. Cache them once under /tmp as .npy files and memmap on load
(seeded chunked generation — identical across runs and probe scripts).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = 512
CACHE_DIR = "/tmp/int4_gallery_cache"


def get_gallery(n_rows, want_int8=True, seed=3):
    """(g8, s8, pk, s4) for the first n_rows of the seeded stream; g8/s8
    None when want_int8 is False. Arrays are read-only memmaps.

    seed: rng seed of the generated stream. 3 is the historical default
    (every capture before r5 used it); a second seed backs the r5
    capacity-tier recall re-check (VERDICT r4 item 3)."""
    from image_retrieval_tpu.ops.int4 import quantize_pack_int4

    os.makedirs(CACHE_DIR, exist_ok=True)
    sfx = "" if seed == 3 else f"_s{seed}"
    names = {k: os.path.join(CACHE_DIR, f"{k}_{n_rows}{sfx}.npy")
             for k in ("g8", "s8", "pk", "s4")}
    need = ["pk", "s4"] + (["g8", "s8"] if want_int8 else [])
    if not all(os.path.exists(names[k]) for k in need):
        print(f"generating {n_rows >> 20}M gallery into {CACHE_DIR}...",
              flush=True)
        rng = np.random.default_rng(seed)
        g8 = np.lib.format.open_memmap(
            names["g8"] + ".tmp", mode="w+", dtype=np.int8,
            shape=(n_rows, D))
        s8 = np.lib.format.open_memmap(
            names["s8"] + ".tmp", mode="w+", dtype=np.float32,
            shape=(n_rows,))
        pk = np.lib.format.open_memmap(
            names["pk"] + ".tmp", mode="w+", dtype=np.uint8,
            shape=(n_rows, D // 2))
        s4 = np.lib.format.open_memmap(
            names["s4"] + ".tmp", mode="w+", dtype=np.float32,
            shape=(n_rows,))
        step = 1 << 20
        for s in range(0, n_rows, step):
            e = min(s + step, n_rows)
            rows = rng.normal(size=(e - s, D)).astype(np.float32)
            rows /= np.linalg.norm(rows, axis=1, keepdims=True)
            grid = np.maximum(np.abs(rows).max(axis=1), 1e-12) / 127.0
            q8 = np.clip(np.rint(rows / grid[:, None]), -127, 127
                         ).astype(np.int8)
            qn = np.linalg.norm(q8.astype(np.float32), axis=1)
            g8[s:e] = q8
            s8[s:e] = 1.0 / np.where(qn > 0, qn, 1.0)
            pk[s:e], s4[s:e] = quantize_pack_int4(rows)
        for arr in (g8, s8, pk, s4):
            arr.flush()
        del g8, s8, pk, s4
        for k in ("g8", "s8", "pk", "s4"):
            os.replace(names[k] + ".tmp", names[k])
    out = {}
    for k in need:
        out[k] = np.load(names[k], mmap_mode="r")
    return (out.get("g8"), out.get("s8"), out["pk"], out["s4"])
