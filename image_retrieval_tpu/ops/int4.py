"""Packed int4 gallery representation: quantize/pack + the two-dot sweep.

The int4 tier halves gallery bytes vs int8 — HBM-resident capacity doubles
(~54M 512-d rows per v5e chip) and the beyond-HBM streamed tier moves half
the host->device bytes per sweep. Raw int4 ranking is a SCREEN (recall@10
~0.75 at 1M, bench_results/int4_probe.json); production search is
two-phase: int4 screen -> top-C candidates -> exact int8 rerank (recall
0.983 vs int8's 0.984 on the same capture).

Representation notes (measured, bench_results/int4_probe.json):
  * native jnp.int4 (S4) is unusable on this backend — passing an
    S4[1M,512] array as a jit argument trips "Recursively calling jit"
    inside the runtime. Nibble-packed uint8 (N, D/2) is the storage form:
    lo nibble = even dims, hi nibble = odd dims, biased +8 (values in
    [1, 15] for quantized [-7, 7]).
  * scoring unpacks via the TWO-DOT decomposition
    q . g == q_even . lo + q_odd . hi — each dot's nibble extraction
    fuses into the MXU operand read. The interleaving unpack
    (stack+reshape to (N, D)) materializes and measures 2.1 ms vs the
    two-dot's 1.10 ms at 1M x 512 (int8 baseline: 1.12 ms). XLA reads the
    packed array once PER DOT, so the sweep moves the same HBM bytes as
    int8 — int4 is a CAPACITY lever resident, a TRANSFER lever streamed,
    not a resident-latency lever.

Quantization matches the int8 scheme (index/vector_index.py insert):
symmetric per-row absmax/7 grid with a norm-preserving scale, so
raw-int4 dot * scale approximates cosine against unit queries directly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_pack_int4(rows: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Quantize f32 rows to int4 and nibble-pack.

    Returns (packed (N, D/2) uint8, scales (N,) f32). Scales are
    norm-preserving: ||int4 row|| * scale == ||original row||, so for unit
    rows `raw_dot * scale` is the cosine approximation with no grid-norm
    bias (same property as the int8 path).
    """
    rows = np.asarray(rows, np.float32)
    assert rows.ndim == 2 and rows.shape[1] % 2 == 0, rows.shape
    absmax = np.maximum(np.abs(rows).max(axis=1), 1e-12)
    grid = (absmax / 7.0).astype(np.float32)
    q4 = np.clip(np.rint(rows / grid[:, None]), -7, 7).astype(np.int8)
    qn = np.linalg.norm(q4.astype(np.float32), axis=1)
    rn = np.linalg.norm(rows, axis=1)
    scales = (rn / np.where(qn > 0, qn, 1.0)).astype(np.float32)
    return pack_nibbles(q4), scales


def pack_nibbles(q4: np.ndarray) -> np.ndarray:
    """(N, D) int8 values in [-8, 7] -> (N, D/2) uint8 nibble-packed
    (lo = even dims, hi = odd dims, +8 bias)."""
    u = (np.asarray(q4, np.int16) + 8).astype(np.uint8)
    return u[:, 0::2] | (u[:, 1::2] << 4)


def unpack_nibbles(packed: np.ndarray) -> np.ndarray:
    """Inverse of pack_nibbles: (N, D/2) uint8 -> (N, D) int8 values."""
    packed = np.asarray(packed, np.uint8)
    lo = (packed & 0xF).astype(np.int8) - 8
    hi = (packed >> 4).astype(np.int8) - 8
    out = np.empty((packed.shape[0], packed.shape[1] * 2), np.int8)
    out[:, 0::2] = lo
    out[:, 1::2] = hi
    return out


def unpack2_dots(queries_bf16: jnp.ndarray, packed: jnp.ndarray) -> jnp.ndarray:
    """(Q, D) bf16 queries x (Nl, D/2) packed rows -> (Q, Nl) f32 raw dots.

    The two-dot decomposition: the dot product is a sum over dims, so
    even-dim and odd-dim partial sums add. Each dot's nibble extraction
    (mask/shift/bias -> bf16) fuses into its MXU operand production —
    no (Nl, D) intermediate is ever materialized. Multiply the result by
    the per-row scales for the cosine approximation.
    """
    lo = ((packed & 0xF).astype(jnp.int8) - 8).astype(jnp.bfloat16)
    hi = ((packed >> 4).astype(jnp.int8) - 8).astype(jnp.bfloat16)
    # jnp.dot(q, X.T) form: XLA folds the transpose into the matmul
    # (identical HLO to a (1,),(1,) dot_general on TPU); the explicit
    # dot_general form hits an unsupported mixed-precision DotThunk on
    # the CPU backend the tests run on
    return (
        jnp.dot(queries_bf16[:, 0::2], lo.T,
                preferred_element_type=jnp.float32)
        + jnp.dot(queries_bf16[:, 1::2], hi.T,
                  preferred_element_type=jnp.float32)
    )


def unpack8_dots_i32(queries_bf16: jnp.ndarray, packed: jnp.ndarray) -> jnp.ndarray:
    """(Q, D) bf16 x (N, D/2) packed -> (Q, N) raw dots via int32 lanes.

    The two-dot uint8 form (unpack2_dots) never reaches the MXU for Q>1:
    XLA lowers 8-bit mask/shift operand production as a VPU reduce that
    costs ~7 ms/query at 16M rows regardless of tiling, materialization,
    or transpose (bench_results/int4_fuse_probe.json, int4_fuse2_probe.json).
    This form bitcasts the packed bytes to int32 words (4 bytes = 8
    nibbles = 8 consecutive dims) and decomposes the dot into EIGHT
    per-nibble-position dots whose operands are produced by native int32
    shifts/masks — the elementwise-convert pattern XLA does fuse into
    matmuls. Numerically identical to unpack2_dots (same bf16 operands).

    Nibble j (shift 4j) of word w maps to dim 8w + 2*(j//2) + (j%2)
    (little-endian byte order; lo nibble = even dim within the byte) —
    verified against unpack2_dots in tests/test_int4.py.

    `packed` may be the (N, D/2) uint8 nibble layout or its (N, D/8)
    int32 word view (`pack_words` / np .view(np.int32)) — the resident
    index stores the word view so the Pallas screen kernel reads native
    int32 lanes.
    """
    if packed.dtype == jnp.int32:
        pk32 = packed
    else:
        n, half = packed.shape
        pk32 = jax.lax.bitcast_convert_type(
            packed.reshape(n, half // 4, 4), jnp.int32)  # (N, D/8)
    acc = None
    for j in range(8):
        off = 2 * (j // 2) + (j % 2)
        nib = ((pk32 >> (4 * j)) & 0xF) - 8  # int32 (N, D/8)
        d = jnp.dot(queries_bf16[:, off::8], nib.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    return acc


def screen_int4_topc(
    queries_bf16: jnp.ndarray,
    packed: jnp.ndarray,
    scales: jnp.ndarray,
    valid: jnp.ndarray,
    c: int,
    block: int = 1 << 21,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-c int4 cosine screen, tiled so the nibble unpack stays fused.

    The direct `unpack2_dots` form is at int8-parity bandwidth at 1M rows
    (1.10 vs 1.12 ms, bench_results/int4_probe.json) but COLLAPSES at
    16M — 431.8 ms vs int8's 57.2 ms, ~10 GB/s effective — because XLA
    stops fusing the mask/shift/bias unpack into the MXU operand read at
    that size and materializes the (N, D) bf16 operands through HBM
    (bench_results/int4_scale_probe.json, first capture). Tiling the sweep
    into `block`-row slabs (lax.scan + running top-c merge, one static
    tail step — the index/screen.py phase-1 pattern) keeps every tile in
    the proven-fused regime at any gallery size, with O(Q*block) peak
    memory instead of O(Q*N).

    `valid` rows score -inf (tombstones / attribute filters). Returns
    (scores, indices), each (Q, min(c, live-ish n)); callers treat -inf
    rows as padding. Accepts the uint8 nibble layout or the int32 word
    view (the resident storage form — see unpack8_dots_i32).
    """
    from image_retrieval_tpu.ops.topk import exact_topk

    n = packed.shape[0]
    cc = min(c, n)
    dots = (unpack8_dots_i32 if packed.dtype == jnp.int32
            else unpack2_dots)

    def tile(pk, sc, v, off):
        s = dots(queries_bf16, pk) * sc[None, :]
        s = jnp.where(v[None, :], s, -jnp.inf)
        tv, ti = exact_topk(s, min(cc, pk.shape[0]), descending=True)
        return tv, ti.astype(jnp.int32) + off

    if n <= block or cc > block:
        return tile(packed, scales, valid, 0)

    nb = n // block
    tail = n - nb * block

    def merge(carry, tv, ti):
        vals, ids = carry
        cand_v = jnp.concatenate([vals, tv], axis=1)
        cand_i = jnp.concatenate([ids, ti], axis=1)
        mv, mi = jax.lax.top_k(cand_v, cc)
        return mv, jnp.take_along_axis(cand_i, mi, axis=1)

    def step(carry, i):
        off = i * block
        tv, ti = tile(
            jax.lax.dynamic_slice_in_dim(packed, off, block, 0),
            jax.lax.dynamic_slice_in_dim(scales, off, block, 0),
            jax.lax.dynamic_slice_in_dim(valid, off, block, 0),
            off,
        )
        return merge(carry, tv, ti), None

    q_n = queries_bf16.shape[0]
    init = (jnp.full((q_n, cc), -jnp.inf, jnp.float32),
            jnp.zeros((q_n, cc), jnp.int32))
    carry, _ = jax.lax.scan(step, init, jnp.arange(nb))
    if tail:
        tv, ti = tile(packed[nb * block:], scales[nb * block:],
                      valid[nb * block:], nb * block)
        carry = merge(carry, tv, ti)
    return carry


@functools.partial(jax.jit, static_argnames=("k",))
def rerank_int8_topk(
    queries: jnp.ndarray,
    cand_rows: jnp.ndarray,
    cand_scales: jnp.ndarray,
    cand_ok: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Phase 2 of the int4 tier: exact rerank of screened candidates.

    queries (Q, D) f32 (unnormalized fine), cand_rows (Q, C, D) int8
    gathered from the host int8 gallery, cand_scales (Q, C) f32
    norm-preserving scales, cand_ok (Q, C) bool (False = screen padding
    when fewer than C rows matched). Returns (vals (Q, k), pos (Q, k)) —
    pos indexes into C; the caller maps back to global row ids. The bf16
    MXU dot * f32 scale matches the resident int8 sweep bitwise, so
    two-phase scores equal what a resident int8 index reports for the
    same rows.
    """
    qf = queries.astype(jnp.float32)
    qn = jnp.linalg.norm(qf, axis=-1, keepdims=True)
    qu = jnp.where(qn > 0, qf / jnp.where(qn > 0, qn, 1.0), 0.0)
    dots = jnp.einsum(
        "qd,qcd->qc", qu.astype(jnp.bfloat16),
        cand_rows.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    scores = jnp.where(cand_ok, dots * cand_scales, -jnp.inf)
    return jax.lax.top_k(scores, k)
