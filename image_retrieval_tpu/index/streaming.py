"""Beyond-HBM exact search: chunked host-RAM -> device streaming sweep.

One v5e chip holds ~27M int8 512-d rows in HBM (13.5 GB usable); past that
the gallery must live in host RAM and stream through the chip. This engine
keeps the gallery as int8 rows (+ per-row norm-preserving scales) in host
memory, sweeps it in fixed-size chunks with a double-buffered transfer
window, and maintains the running top-k entirely on device so the whole
sweep is one async dispatch chain with a single host fetch at the end.

Scale story this completes (reference C13: Milvus scales server-side,
ImageEmbeddingSystem.py:56-61): HBM-resident sharded exact search
(vector_index.py) -> int8 HBM-resident (4x rows) -> THIS (host-RAM bound,
~64x rows at 32 GB) -> multi-chip mesh sharding (parallel/collectives.py).

Design notes:
  * per-chunk work is top_k over (Q, chunk_rows) scores from one bf16 MXU
    matmul — identical math to the resident int8 path, so streamed results
    match the resident int8 sweep exactly.
  * ALL per-row scales ship once, up front (0.8% of gallery bytes): per-
    chunk transfers are then a single device_put each, which matters when
    each transfer pays a round-trip (measured: the dev tunnel's put path
    is RTT-dominated below ~256 MB blocks).
  * the running merge is top_k over (Q, 2k) — negligible.
  * transfers overlap compute only as much as the runtime allows; the
    bench tool (tools/tpu_streaming_probe.py) measures achieved bandwidth
    and overlap efficiency, and documents the resident-vs-streamed
    crossover for production-host transfer rates.
  * queries sweep per chunk (gallery pass amortized over the whole query
    batch) — streaming is a throughput configuration; single-query
    latency is chunk-transfer bound by construction.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


def quantize_rows_int8(rows: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Norm-preserving symmetric int8 quantization (same scheme as the
    resident int8 index): per-row absmax grid, scales set so the QUANTIZED
    row has unit norm — cosine against unit queries needs no extra
    correction beyond the per-row scale multiply."""
    rows = np.asarray(rows, np.float32)
    grid = np.maximum(np.abs(rows).max(axis=1), 1e-12) / 127.0
    q8 = np.clip(np.rint(rows / grid[:, None]), -127, 127).astype(np.int8)
    qn = np.linalg.norm(q8.astype(np.float32), axis=1)
    scales = (1.0 / np.where(qn > 0, qn, 1.0)).astype(np.float32)
    return q8, scales


class StreamingGallerySearch:
    """Exact cosine top-k over a host-resident int8 gallery, streamed in
    chunks through the device.

    rows_int8: (N, D) int8, scales: (N,) f32 (see quantize_rows_int8).
    chunk_rows: rows per transfer; device working set is ~2 chunks
    (double buffer) x D bytes plus the (Q, chunk_rows) score tile.

    packed4 mode: rows_int8 is instead a nibble-packed (N, D/2) uint8
    int4 gallery (ops/int4.py quantize_pack_int4) — each sweep moves HALF
    the host->device bytes (the streamed tier is transfer-bound, so the
    sweep time halves on DMA-bound hosts) and host RAM per row halves
    too. The streamed pass becomes a SCREEN (running top-C instead of
    top-k); pass `rerank_rows` (an (N, D) int8 ndarray OR np.memmap — the
    full-precision rows may stay on disk) + `rerank_scales` to finish
    with an exact device rerank of the top rerank_c candidates
    (recall@10 0.983 vs the int8 sweep's 0.984 at 1M,
    bench_results/int4_probe.json). Without rerank_rows the raw screen
    ranking is returned (recall ~0.75 — probe/analysis use only).
    """

    def __init__(
        self,
        rows_int8: np.ndarray,
        scales: np.ndarray,
        chunk_rows: int = 4_194_304,
        device=None,
        packed4: bool = False,
        rerank_rows: np.ndarray = None,
        rerank_scales: np.ndarray = None,
        rerank_c: int = 128,
    ):
        self.packed4 = bool(packed4)
        if self.packed4:
            assert rows_int8.dtype == np.uint8 and rows_int8.ndim == 2
            self.n, self.dim = rows_int8.shape[0], rows_int8.shape[1] * 2
            if rerank_rows is not None:
                assert rerank_rows.shape == (self.n, self.dim), (
                    rerank_rows.shape)
                assert rerank_scales is not None
        else:
            assert rows_int8.dtype == np.int8 and rows_int8.ndim == 2
            self.n, self.dim = rows_int8.shape
        self._rerank_rows = rerank_rows if self.packed4 else None
        self._rerank_scales = rerank_scales if self.packed4 else None
        self.rerank_c = int(rerank_c)
        assert scales.shape == (self.n,)
        self.chunk_rows = int(min(chunk_rows, self.n))
        self.device = device or jax.devices()[0]
        # packed4 + kernel-compatible dims -> PAIRED chunk layout: each
        # chunk is pre-paired host-side (ops/pallas_kernels.py
        # pack_words_paired per chunk, so chunk-local ids stay contiguous)
        # and the sweep scores through the Pallas int4 screen kernel. The
        # XLA two-dot chunk scorer is COMPUTE-bound past ~2M rows (the
        # nibble unpack runs as a per-query VPU reduce, ~7 ms/query —
        # int4_isolate_probe.json), which would dominate PCIe-host
        # transfer; the kernel restores the transfer-bound contract at
        # half the int8 bytes. Costs one paired copy of the packed rows
        # (same byte count) at init.
        self._paired = False
        if self.packed4:
            from image_retrieval_tpu.ops.pallas_kernels import (
                int4_paired_block_n,
            )

            self._paired_block = int4_paired_block_n(self.chunk_rows // 2)
            self._paired = (self.dim % 512 == 0
                            and self.chunk_rows % 2 == 0
                            and self._paired_block > 0)
        self._chunks = []
        if self._paired:
            from image_retrieval_tpu.ops.pallas_kernels import (
                pack_words_paired,
            )

            for s in range(0, self.n, self.chunk_rows):
                e = min(s + self.chunk_rows, self.n)
                g = rows_int8[s:e]
                if e - s < self.chunk_rows:  # pad the tail BEFORE pairing
                    g = np.concatenate(
                        [g, np.zeros((self.chunk_rows - (e - s),
                                      self.dim // 2), np.uint8)], 0)
                self._chunks.append((s, pack_words_paired(g), e - s))
        else:
            for s in range(0, self.n, self.chunk_rows):
                e = min(s + self.chunk_rows, self.n)
                self._chunks.append((s, rows_int8[s:e], e - s))
        # scales: padded to whole chunks, resident on device for the whole
        # engine lifetime (N*4 bytes) — saves one put + round-trip per chunk
        n_pad = len(self._chunks) * self.chunk_rows
        sc = scales if n_pad == self.n else np.concatenate(
            [scales, np.zeros(n_pad - self.n, np.float32)]
        )
        self._scales_dev = jax.device_put(sc, self.device)

        # stored chunk layout: packed int4 halves the width and rides uint8
        self._store_width = self.dim // 2 if self.packed4 else self.dim
        self._store_dtype = np.uint8 if self.packed4 else np.int8
        cr = self.chunk_rows
        packed = self.packed4

        def _chunk_dots(qn16, g):
            if packed:
                from image_retrieval_tpu.ops.int4 import unpack2_dots

                return unpack2_dots(qn16, g)
            return jax.lax.dot_general(
                qn16, g.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def _sweep_body(state_vals, state_idx, g8, mask, all_scales,
                        qn16, offset, n_valid):
            """One chunk: score + chunk top-k + merge into running state.
            mask=None is the unfiltered form (its own jit signature, no
            mask transfer); a (chunk_rows,) bool mask scores False rows
            -inf — attribute-filtered search at streaming scale, 1/D of
            the row payload so the sweep stays transfer-bound. ONE body
            for both (the two near-identical jits diverged — r5 review)."""
            k = state_vals.shape[1]
            sc = jax.lax.dynamic_slice_in_dim(all_scales, offset, cr, 0)
            dots = _chunk_dots(qn16, g8)
            scores = dots * sc[None, :]
            # pad rows (row >= n_valid) must lose every comparison
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            keep = col < n_valid
            if mask is not None:
                keep = keep & mask[None, :]
            scores = jnp.where(keep, scores, -jnp.inf)
            # a chunk can contribute at most chunk_rows candidates (k may
            # exceed the chunk when chunks are tiny); the merge still fills
            # all k state slots from the accumulated candidates
            cv, ci = jax.lax.top_k(scores, min(k, scores.shape[1]))
            cand_vals = jnp.concatenate([state_vals, cv], axis=1)
            cand_idx = jnp.concatenate(
                [state_idx, ci.astype(jnp.int32) + offset], axis=1
            )
            mv, mi = jax.lax.top_k(cand_vals, k)
            return mv, jnp.take_along_axis(cand_idx, mi, axis=1)

        self._sweep_chunk = jax.jit(
            lambda sv, si, g8, asc, qn, off, nv: _sweep_body(
                sv, si, g8, None, asc, qn, off, nv))
        self._sweep_chunk_masked = jax.jit(_sweep_body)

        if self._paired:
            from image_retrieval_tpu.ops.pallas_kernels import (
                _int4_screen_scores_halves,
            )

            bn = self._paired_block
            halfr = cr // 2

            @jax.jit
            def _sweep_chunk_paired(state_vals, state_idx, gp, dm,
                                    all_scales, qn16, offset, n_valid):
                """Paired Pallas chunk sweep: kernel score halves ->
                per-half approx top-k -> merge into the running state.
                Half h covers chunk rows [h*cr/2, (h+1)*cr/2); dm is the
                optional (cr,) bool attribute mask (None -> unmasked
                jit signature, no mask transfer)."""
                k = state_vals.shape[1]
                sc = jax.lax.dynamic_slice_in_dim(all_scales, offset, cr, 0)
                s0, s1, _ = _int4_screen_scores_halves(qn16, gp, sc,
                                                       block_n=bn)
                col = jax.lax.broadcasted_iota(jnp.int32, s0.shape, 1)
                keep0 = col < jnp.minimum(n_valid, halfr)
                keep1 = (col + halfr) < n_valid
                if dm is not None:
                    keep0 = keep0 & dm[:halfr][None, :]
                    keep1 = keep1 & dm[halfr:][None, :]
                kk = min(k, halfr)
                tv0, ti0 = jax.lax.approx_max_k(
                    jnp.where(keep0, s0, -jnp.inf), kk, recall_target=0.95)
                tv1, ti1 = jax.lax.approx_max_k(
                    jnp.where(keep1, s1, -jnp.inf), kk, recall_target=0.95)
                cand_vals = jnp.concatenate([state_vals, tv0, tv1], axis=1)
                cand_idx = jnp.concatenate(
                    [state_idx,
                     offset + ti0.astype(jnp.int32),
                     offset + halfr + ti1.astype(jnp.int32)], axis=1)
                mv, mi = jax.lax.top_k(cand_vals, k)
                return mv, jnp.take_along_axis(cand_idx, mi, axis=1)

            self._sweep_chunk_paired = _sweep_chunk_paired

    # -- search ---------------------------------------------------------------

    def search(
        self, queries_unit: np.ndarray, top_k: int = 10,
        mask: np.ndarray = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """queries_unit: (Q, D) L2-normalized f32. Returns (vals, idx) each
        (Q, top_k), exact over all N rows. `mask`: optional (N,) bool —
        rows where it is False are excluded (score -inf, index may be a
        sentinel when fewer than top_k rows match)."""
        q = np.asarray(queries_unit, np.float32)
        if q.ndim == 1:
            q = q[None]
        qn16 = jax.device_put(q.astype(jnp.bfloat16), self.device)
        k = int(min(top_k, self.n))
        # packed4 + rerank: the running state carries top-C candidates
        # (the streamed pass is the SCREEN); plain mode carries top-k
        rerank = self.packed4 and self._rerank_rows is not None
        kk = int(min(max(self.rerank_c, k), self.n)) if rerank else k
        vals = jax.device_put(
            jnp.full((q.shape[0], kk), -jnp.inf, jnp.float32), self.device
        )
        idx = jax.device_put(
            jnp.full((q.shape[0], kk), -1, jnp.int32), self.device
        )

        pad_to = self.chunk_rows
        if mask is not None:
            mask = np.asarray(mask, bool)
            assert mask.shape == (self.n,), mask.shape
        window: list = [None, None]  # double buffer: <=2 chunks on device

        def stage(ci):
            s, arr, nv = self._chunks[ci]
            if not self._paired and nv < pad_to:
                arr = np.concatenate(
                    [arr, np.zeros((pad_to - nv, self._store_width),
                                   self._store_dtype)], 0
                )  # paired chunks were padded before pairing at init
            dm = None
            if mask is not None:
                m = mask[s:s + nv]
                if nv < pad_to:
                    m = np.concatenate([m, np.zeros(pad_to - nv, bool)])
                dm = jax.device_put(m, self.device)
            return (s, nv, jax.device_put(arr, self.device), dm)

        if self._chunks:
            window[0] = stage(0)
        for ci in range(len(self._chunks)):
            # stage the NEXT chunk before consuming this one: its transfer
            # overlaps this chunk's matmul in the async dispatch stream
            if ci + 1 < len(self._chunks):
                window[(ci + 1) % 2] = stage(ci + 1)
            s, nv, dg, dm = window[ci % 2]
            if self._paired:
                vals, idx = self._sweep_chunk_paired(
                    vals, idx, dg, dm, self._scales_dev, qn16,
                    jnp.int32(s), jnp.int32(nv),
                )
            elif dm is None:
                vals, idx = self._sweep_chunk(
                    vals, idx, dg, self._scales_dev, qn16,
                    jnp.int32(s), jnp.int32(nv),
                )
            else:
                vals, idx = self._sweep_chunk_masked(
                    vals, idx, dg, dm, self._scales_dev, qn16,
                    jnp.int32(s), jnp.int32(nv),
                )
            window[ci % 2] = None  # release this chunk's device buffer
        vals, idx = np.asarray(vals), np.asarray(idx)
        if rerank:
            # exact phase 2: gather the candidates' int8 rows from the
            # rerank source (ndarray or np.memmap — fancy indexing pulls
            # only C rows/query off disk) and rerank on device with the
            # same bf16-dot math as the resident int8 sweep
            from image_retrieval_tpu.ops.int4 import rerank_int8_topk

            ok = np.isfinite(vals)
            safe = np.where(ok, idx, 0)
            rows = np.asarray(self._rerank_rows[safe])
            sc8 = np.asarray(self._rerank_scales)[safe].astype(np.float32)
            rvals, pos = rerank_int8_topk(
                jnp.asarray(q), jnp.asarray(rows), jnp.asarray(sc8),
                jnp.asarray(ok), k,
            )
            vals = np.asarray(rvals)
            idx = np.take_along_axis(idx, np.asarray(pos), axis=1)
            idx = np.where(np.isfinite(vals), idx, -1)
        elif mask is not None:
            # fewer than top_k matches: sentinel out the -inf tail (its
            # indices are whatever the merge happened to carry)
            idx = np.where(np.isfinite(vals), idx, -1)
        return vals, idx

    # -- introspection --------------------------------------------------------

    @property
    def bytes_per_sweep(self) -> int:
        """Host->device bytes one full gallery pass moves (scales are
        resident, not re-streamed; packed int4 moves half of int8)."""
        return self.n * self._store_width

    def expected_sweep_seconds(
        self, transfer_gbps: float, compute_s_per_chunk: float
    ) -> float:
        """Analytic sweep-time model: max(transfer, compute) per chunk when
        overlapped (the probe reports achieved overlap vs this bound)."""
        # _store_width, not dim: packed int4 chunks move dim/2 bytes/row
        # (the old form over-estimated int4 transfer 2x — r5 review)
        per_chunk_bytes = self.chunk_rows * self._store_width
        t_xfer = per_chunk_bytes / (transfer_gbps * 1e9)
        return len(self._chunks) * max(t_xfer, compute_s_per_chunk)
