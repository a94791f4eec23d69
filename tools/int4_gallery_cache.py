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


def generate_on_device(n_rows, seed, step=1 << 20):
    """Populate the cache for `seed` by generating + quantizing ON the TPU
    and fetching only the quantized bytes (~775 MB/1M rows).

    The 1-core host takes hours to run the numpy path at 32M rows; the
    device does each chunk in milliseconds and the wall time collapses to
    the tunnel-fetch rate (~10-15 min for 32M). The random stream is
    jax.random (threefry), NOT numpy's PCG64 — so a given seed's device
    gallery differs from its host gallery. Quantization formulas match
    get_gallery exactly (same grids, same norm conventions, same nibble
    pack). Seed 3 is the historical HOST stream every pre-r5 capture used;
    keep device generation to NEW seeds so those captures stay
    reproducible. Resumable: a .progress file records completed chunks.
    """
    import jax
    import jax.numpy as jnp

    os.makedirs(CACHE_DIR, exist_ok=True)
    sfx = "" if seed == 3 else f"_s{seed}"
    names = {k: os.path.join(CACHE_DIR, f"{k}_{n_rows}{sfx}.npy")
             for k in ("g8", "s8", "pk", "s4")}
    if all(os.path.exists(names[k]) for k in names):
        return
    prog_path = os.path.join(CACHE_DIR, f"gen_{n_rows}{sfx}.progress")
    done_upto = 0
    if os.path.exists(prog_path):
        with open(prog_path) as f:
            done_upto = int(f.read().strip() or 0)
    mode = "r+" if done_upto else "w+"
    opens = {}
    for k, dt, shp in (("g8", np.int8, (n_rows, D)),
                       ("s8", np.float32, (n_rows,)),
                       ("pk", np.uint8, (n_rows, D // 2)),
                       ("s4", np.float32, (n_rows,))):
        p = names[k] + ".tmp"
        if mode == "r+" and os.path.exists(p):
            opens[k] = np.lib.format.open_memmap(p, mode="r+")
        else:
            opens[k] = np.lib.format.open_memmap(p, mode="w+", dtype=dt,
                                                 shape=shp)

    @jax.jit
    def gen(key):
        rows = jax.random.normal(key, (step, D), jnp.float32)
        rows = rows / jnp.linalg.norm(rows, axis=1, keepdims=True)
        absmax = jnp.maximum(jnp.abs(rows).max(axis=1), 1e-12)
        q8 = jnp.clip(jnp.rint(rows / (absmax / 127.0)[:, None]),
                      -127, 127).astype(jnp.int8)
        qn8 = jnp.linalg.norm(q8.astype(jnp.float32), axis=1)
        s8 = (1.0 / jnp.where(qn8 > 0, qn8, 1.0)).astype(jnp.float32)
        q4 = jnp.clip(jnp.rint(rows / (absmax / 7.0)[:, None]),
                      -7, 7).astype(jnp.int8)
        qn4 = jnp.linalg.norm(q4.astype(jnp.float32), axis=1)
        rn = jnp.linalg.norm(rows, axis=1)
        s4 = (rn / jnp.where(qn4 > 0, qn4, 1.0)).astype(jnp.float32)
        u = (q4.astype(jnp.int16) + 8).astype(jnp.uint8)
        pk = u[:, 0::2] | (u[:, 1::2] << 4)
        return q8, s8, pk, s4

    base = jax.random.PRNGKey(seed)
    import time as _time
    for s in range(done_upto, n_rows, step):
        e = min(s + step, n_rows)
        t0 = _time.time()
        q8, s8_, pk_, s4_ = jax.device_get(
            gen(jax.random.fold_in(base, s // step)))
        opens["g8"][s:e] = q8[: e - s]
        opens["s8"][s:e] = s8_[: e - s]
        opens["pk"][s:e] = pk_[: e - s]
        opens["s4"][s:e] = s4_[: e - s]
        with open(prog_path, "w") as f:
            f.write(str(e))
        print(f"  chunk {s >> 20}M..{e >> 20}M in {_time.time() - t0:.1f}s",
              flush=True)
    for arr in opens.values():
        arr.flush()
    del opens
    for k in names:
        os.replace(names[k] + ".tmp", names[k])
    os.remove(prog_path)
