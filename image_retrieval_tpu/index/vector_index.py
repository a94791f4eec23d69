"""Sharded exact-search vector index — the Milvus replacement.

One index unifies the reference's two disjoint retrieval stacks (the Milvus
collection in ImageEmbeddingSystem.py:35-66 / image_search.py:85-95 and the
in-memory dict + O(N) Python loop in app_pipeline.py:17,155-172). Gallery
rows live as a padded (capacity, D) f32 array sharded over the mesh `data`
axis; search is one fused score + per-shard top-k + ICI merge
(parallel/collectives.py). Exact, so the reference's IVF overfetch+rerank is
subsumed.

Milvus API semantics preserved (SURVEY §5):
    insert(paths, unit_vectors, magnitudes)   ImageEmbeddingSystem.py:136-137
    search(query, top_k, ...)                 image_search.py:88-95
    query(limit)                              ImageEmbeddingSystem.py:158-171
    load()/release() lifecycle                no-ops kept for API parity
    stored decomposition (unit vec, magnitude) ImageEmbeddingSystem.py:88-94
"""

from __future__ import annotations

import dataclasses
import errno
import functools
import json
import os
import threading
import zipfile
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from image_retrieval_tpu.config import IndexConfig
from image_retrieval_tpu.index.filters import AttributeStore, parse_filter
from image_retrieval_tpu.parallel.mesh import make_mesh, shard_rows, replicate
from image_retrieval_tpu.parallel.collectives import (
    multislice_search_topk,
    sharded_scores,
    sharded_search_topk,
)

_WEIGHT_KEYS = ("w_angle", "w_l1", "w_l2", "w_inf", "w_mag")


def _config_from_saved(saved: dict) -> IndexConfig:
    """IndexConfig from a persisted dict, ignoring unknown keys (forward
    compat with configs saved by newer versions). One helper shared by
    journal recovery and load_from() so the two reconstruction paths can
    never diverge."""
    known = {fl.name for fl in dataclasses.fields(IndexConfig)}
    return IndexConfig(**{k: v for k, v in saved.items() if k in known})


def _locked(fn):
    """Serialize public index operations under the per-index RLock.

    Milvus handles concurrent insert/search server-side (reference C13);
    in-process, a mutation mid-search would race `_sync_device` (host
    buffers and device arrays swap underneath the sweep). The lock is
    reentrant so compound operations (save->compact, search_paths->search)
    compose; search holds it only for dispatch+fetch of its own batch, and
    the micro-batching server already funnels searches through one worker,
    so serving throughput is unaffected."""

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        with self._lock:
            return fn(self, *args, **kwargs)

    return wrapper


class ShardedVectorIndex:
    """Exact vector index sharded over a device mesh.

    Stores L2-normalized vectors plus magnitudes, mirroring the reference's
    schema (id/image_path/embedding/magnitude, ImageEmbeddingSystem.py:41-47).
    """

    def __init__(
        self,
        dim: int = 512,
        mesh: Optional[Mesh] = None,
        config: Optional[IndexConfig] = None,
    ):
        self.config = config or IndexConfig(embedding_dim=dim)
        self._lock = threading.RLock()  # see _locked
        # write-ahead journal (index/journal.py); attached by open().
        # _replaying suppresses re-logging while ops are applied FROM it.
        self._journal = None
        self._replaying = False
        self.dim = dim
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis = self.config.shard_axis
        # Multi-slice mode: a mesh with a "slice" axis shards rows over
        # (slice, data) and search merges hierarchically — k candidates per
        # slice over DCN instead of k per chip (SURVEY §5 scale-out).
        self._multislice = (
            "slice" in self.mesh.axis_names and self.axis in self.mesh.axis_names
        )
        self._row_axes = ("slice", self.axis) if self._multislice else self.axis
        self._nshards = 1
        for a in self._row_axes if self._multislice else (self.axis,):
            self._nshards *= self.mesh.shape[a]
        self.paths: List[str] = []
        # small JSON metadata that must survive save()/journal recovery
        # independently of row data (e.g. the Milvus-shim partition name
        # set — Milvus persists partitions even when they hold no rows)
        self.meta: Dict[str, object] = {}
        self.count = 0
        self.capacity = 0
        # Host staging buffers are the source of truth; device copies are
        # materialized lazily on first search after a mutation, so N inserts
        # cost one device_put instead of N round-trips.
        self._host_gallery = None  # (capacity, D) numpy
        self._host_mags = None  # (capacity,) numpy
        self._host_valid = None  # (capacity,) numpy bool
        self._host_scales = None  # (capacity,) numpy, int8/int4 modes
        self._host_packed = None  # (capacity, D/2) uint8, int4 mode only
        self._host_scales4 = None  # (capacity,) numpy, int4 mode only
        self._gallery = None  # (capacity, D) sharded jax
        self._shadow = None  # (capacity, D) bf16 sharded (config.l1_shadow)
        self._mags = None  # (capacity,) sharded jax
        self._valid = None  # (capacity,) bool sharded jax
        self._scales = None  # (capacity,) sharded jax, int8 mode only
        self._packed = None  # int4 mode: (capacity/2, 2*D/8) int32 PAIRED
        # (Pallas screen layout, _paired_packed_form) or (capacity, D/2)
        # uint8 nibble rows (XLA fallback), sharded
        self._scales4 = None  # (capacity,) sharded jax, int4 mode only
        self._device_dirty = True
        # beyond-HBM tier (config.stream_threshold_bytes): host-resident
        # int8 gallery streamed through the device per search; None while
        # the gallery fits on device
        self._stream = None
        self._stream_live = None  # live-row id map for streamed results
        self._stream_rows = None  # host int8 rows backing the stream
        self._stream_scales = None
        # monotone content-generation counter: bumps on every mutation
        # (insert/delete/compact/load); derived structures (IVF) key their
        # staleness on it — live_count alone misses delete+insert of equal size
        self.generation = 0
        # scalar attribute columns (Milvus boolean-expr filtering analog);
        # indexes that never pass attrs= pay nothing
        self.attrs = AttributeStore()
        # (expr, generation) -> sharded device mask; repeated serving
        # traffic with the same filter reuses the mask (and the SAME search
        # jit — the mask replaces `valid`, identical shape/sharding)
        self._filter_cache: Dict[str, Tuple[int, jnp.ndarray]] = {}

    # -- storage ------------------------------------------------------------

    @property
    def _np_dtype(self):
        if self.config.dtype == "bfloat16":
            import ml_dtypes

            return ml_dtypes.bfloat16
        if self.config.dtype in ("int8", "int4"):
            # int4 keeps the HOST rows at int8: they are the exact-rerank
            # source for the two-phase search (and the IVF/save/query
            # reconstruction source); only the DEVICE copy is nibble-packed
            return np.int8
        return np.float32

    @property
    def _quantized(self) -> bool:
        return self.config.dtype in ("int8", "int4")

    @property
    def _packed4(self) -> bool:
        return self.config.dtype == "int4"

    def _grow_to(self, n: int) -> None:
        step = max(self.config.capacity_step, self._nshards)
        cap = -(-n // step) * step
        # capacity must split evenly across shards
        cap = -(-cap // self._nshards) * self._nshards
        if cap <= self.capacity:
            return
        # Gallery storage dtype is configurable: bfloat16 halves HBM traffic
        # on the bandwidth-bound search sweep (~2x faster) at ~0.4% relative
        # score error; float32 (default) preserves oracle ranking parity.
        g = np.zeros((cap, self.dim), self._np_dtype)
        m = np.zeros((cap,), np.float32)
        v = np.zeros((cap,), bool)
        sc = np.ones((cap,), np.float32) if self._quantized else None
        pk = np.zeros((cap, self.dim // 2), np.uint8) if self._packed4 else None
        sc4 = np.ones((cap,), np.float32) if self._packed4 else None
        if self.count:
            g[: self.count] = self._host_gallery[: self.count]
            m[: self.count] = self._host_mags[: self.count]
            # copy flags, not True: growth must not resurrect tombstones
            v[: self.count] = self._host_valid[: self.count]
            if self._quantized:
                sc[: self.count] = self._host_scales[: self.count]
            if self._packed4:
                pk[: self.count] = self._host_packed[: self.count]
                sc4[: self.count] = self._host_scales4[: self.count]
        self.capacity = cap
        self._host_gallery, self._host_mags, self._host_valid = g, m, v
        self._host_scales = sc
        self._host_packed, self._host_scales4 = pk, sc4
        self._device_dirty = True

    @_locked
    def insert(
        self,
        paths: Sequence[str],
        embeddings: np.ndarray,
        magnitudes: Optional[Sequence[float]] = None,
        attrs: Optional[Dict[str, Sequence]] = None,
    ) -> int:
        """Bulk insert. `embeddings` may be unnormalized; they are stored as
        (unit vector, magnitude) exactly like the reference
        (ImageEmbeddingSystem.py:88-94). `attrs` maps field name -> one
        scalar per row (str or number) for boolean-expr filtered search
        (Milvus nullable-scalar-field analog; fields are per-insert
        optional and absent values become missing sentinels that only
        match != / not in). Returns number inserted."""
        emb = np.asarray(embeddings, np.float32)
        if emb.ndim == 1:
            emb = emb[None]
        assert emb.shape[1] == self.dim, (emb.shape, self.dim)
        if len(paths) != emb.shape[0]:
            raise ValueError(
                f"insert(): {len(paths)} paths for {emb.shape[0]} embedding "
                "rows — path/row alignment would silently corrupt every "
                "subsequent search result"
            )
        if magnitudes is None:
            mags = np.linalg.norm(emb, axis=1)
            safe = np.where(mags > 0, mags, 1.0)
            unit = emb / safe[:, None]
        else:
            mags = np.asarray(magnitudes, np.float32)
            if mags.shape != (emb.shape[0],):
                # validate BEFORE attrs commit: a later length error would
                # leave the attribute columns permanently shifted against
                # the gallery rows (and a 1-element list would silently
                # broadcast one magnitude over every row)
                raise ValueError(
                    f"insert(): magnitudes shape {mags.shape} for "
                    f"{emb.shape[0]} embedding rows"
                )
            unit = emb
        # validates schema/lengths and commits only on success, BEFORE the
        # gallery mutates — a bad attrs dict leaves the index untouched
        self.attrs.append(attrs, emb.shape[0])
        n_new = emb.shape[0]
        start = self.count
        self._grow_to(start + n_new)
        if self._quantized:
            # Symmetric per-row int8 (absmax/127 grid); HBM reads drop 4x.
            # The stored scale is norm-preserving — ||int8 row|| * scale ==
            # ||original row|| exactly — so dequantized unit rows are exactly
            # unit norm. That makes the int8 fused scorer's Gram-form L2
            # (ops/metrics.py fused_optimized_scores_int8) exact and removes
            # the quantization-grid norm error from cosine scores.
            absmax = np.maximum(np.abs(unit).max(axis=1), 1e-12)
            grid = (absmax / 127.0).astype(np.float32)
            qrows = np.clip(np.rint(unit / grid[:, None]), -127, 127).astype(np.int8)
            qnorm = np.linalg.norm(qrows.astype(np.float32), axis=1)
            unorm = np.linalg.norm(unit, axis=1)
            qscale = (unorm / np.where(qnorm > 0, qnorm, 1.0)).astype(np.float32)
            self._host_gallery[start : start + n_new] = qrows
            self._host_scales[start : start + n_new] = qscale
            if self._packed4:
                # independent int4 quantization of the SAME unit rows (not
                # a re-quantization of the int8 rows): the packed copy is
                # the device screen, the int8 rows stay the exact-rerank
                # source (ops/int4.py)
                from image_retrieval_tpu.ops.int4 import quantize_pack_int4

                pk, sc4 = quantize_pack_int4(unit)
                self._host_packed[start : start + n_new] = pk
                self._host_scales4[start : start + n_new] = sc4
        else:
            self._host_gallery[start : start + n_new] = unit.astype(self._np_dtype)
        self._host_mags[start : start + n_new] = mags
        self._host_valid[start : start + n_new] = True
        self._device_dirty = True
        self.generation += 1
        self.paths.extend(str(p) for p in paths)
        self.count += n_new
        if self._journal is not None and not self._replaying:
            # journal the (unit, mags) form: replaying it through insert()
            # re-quantizes identically for every tier
            self._journal.log_insert(paths, unit, mags, attrs)
        return n_new

    @_locked
    def delete(self, paths: Sequence[str]) -> int:
        """Tombstone rows by path (Milvus delete-by-expr analog). Removed
        rows never appear in search results; storage is reclaimed on the
        next save/load cycle. Returns number deleted."""
        targets = set(str(p) for p in paths)
        deleted = 0
        for i, p in enumerate(self.paths[: self.count]):
            if p in targets and self._host_valid[i]:
                self._host_valid[i] = False
                deleted += 1
        if deleted:
            self._device_dirty = True
            self.generation += 1
            if self._journal is not None and not self._replaying:
                self._journal.log_delete(paths)
        return deleted

    @_locked
    def delete_where(self, flt) -> int:
        """Tombstone every live row matching a boolean attribute expression
        (Milvus `collection.delete(expr)` analog). Returns rows deleted."""
        return self.delete_rows(np.flatnonzero(self.filter_mask(flt)))

    @_locked
    def delete_rows(self, row_indices) -> int:
        """Tombstone rows by global row index (exact, unlike delete(paths)
        which tombstones every row sharing a path). Returns rows newly
        deleted; already-dead and out-of-range indices are ignored."""
        idx = np.unique(np.asarray(row_indices, np.int64).ravel())
        idx = idx[(idx >= 0) & (idx < self.count)]
        idx = idx[self._host_valid[idx]] if self._host_valid is not None else idx
        if len(idx):
            self._host_valid[idx] = False
            self._device_dirty = True
            self.generation += 1
            if self._journal is not None and not self._replaying:
                self._journal.log_delete_rows(idx)
        return int(len(idx))

    @_locked
    def filter_mask(self, flt) -> np.ndarray:
        """(count,) bool — live rows matching the filter. `flt` is either a
        boolean expression string (vectorized host evaluation over the
        attribute columns, index/filters.py) or a precomputed (count,) bool
        mask (the pymilvus shim evaluates exprs with virtual id/image_path
        columns itself and passes the mask through)."""
        if isinstance(flt, np.ndarray):
            if flt.shape != (self.count,):
                raise ValueError(
                    f"filter mask shape {flt.shape} != ({self.count},)"
                )
            mask = flt.astype(bool, copy=True)
        else:
            mask = self.attrs.evaluate(parse_filter(flt), self.count)
        if self._host_valid is not None:
            mask = mask & self._host_valid[: self.count]
        return mask

    def _filtered_valid(self, flt) -> jnp.ndarray:
        """Sharded device mask for a filter: (filter AND live), padded to
        capacity — a drop-in replacement for the `valid` argument of the
        masked search, so NO new jit signatures. Expression strings are
        cached per (expression, generation); precomputed mask arrays are
        shipped fresh each call (unhashable, shim-only path)."""
        key = flt if isinstance(flt, str) else None
        if key is not None:
            hit = self._filter_cache.get(key)
            if hit is not None and hit[0] == self.generation:
                return hit[1]
        full = np.zeros((self.capacity,), bool)
        full[: self.count] = self.filter_mask(flt)
        dev = shard_rows(full, self.mesh, self._row_axes)
        if key is not None:
            if len(self._filter_cache) >= 16:  # bound device-mask memory
                self._filter_cache.pop(next(iter(self._filter_cache)))
            self._filter_cache[key] = (self.generation, dev)
        return dev

    @property
    def live_count(self) -> int:
        if self._host_valid is None:
            return 0
        return int(self._host_valid[: self.count].sum())

    def live_mask(self) -> np.ndarray:
        """(count,) bool — True for non-tombstoned rows. Consumers of the
        full scores() matrix must mask with this (search() masks itself)."""
        if self._host_valid is None:
            return np.zeros((0,), bool)
        return self._host_valid[: self.count].copy()

    @_locked
    def compact(self) -> int:
        """Reclaim tombstoned rows in place: live rows slide down, paths and
        per-row sidecars stay aligned. Returns rows reclaimed."""
        if self._host_valid is None:
            return 0
        live = np.flatnonzero(self._host_valid[: self.count])
        reclaimed = self.count - len(live)
        if reclaimed == 0:
            return 0
        self._host_gallery[: len(live)] = self._host_gallery[live]
        self._host_mags[: len(live)] = self._host_mags[live]
        if self._quantized:
            self._host_scales[: len(live)] = self._host_scales[live]
        if self._packed4:
            self._host_packed[: len(live)] = self._host_packed[live]
            self._host_scales4[: len(live)] = self._host_scales4[live]
        self._host_valid[:] = False
        self._host_valid[: len(live)] = True
        self.paths = [self.paths[int(i)] for i in live]
        self.attrs.take(live)
        self.count = len(live)
        self._device_dirty = True
        self.generation += 1
        if self._journal is not None and not self._replaying:
            self._journal.log_compact()
        return reclaimed

    def _stream_active(self) -> bool:
        thr = self.config.stream_threshold_bytes
        if thr is None or self._host_gallery is None:
            return False
        # stored DEVICE-row bytes, not host-buffer capacity: a compacted
        # gallery that fits again returns to the resident path, and the
        # int4 tier counts its nibble-packed footprint (half of int8 —
        # packing doubles how far the resident tier stretches before
        # streaming kicks in)
        if self._packed4:
            # latency mode (rerank_device) also keeps the int8 rows
            # resident: 1.5x bytes/row vs the capacity configuration
            row_bytes = (self.dim // 2 + self.dim
                         if self.config.rerank_device else self.dim // 2)
        else:
            row_bytes = self._host_gallery.itemsize * self.dim
        return self.count * row_bytes > thr

    def _sync_device(self) -> None:
        if not self._device_dirty or self._host_gallery is None:
            return
        if self._stream_active():
            # Beyond-HBM tier: the gallery stays in host RAM and streams
            # through a double-buffered device window per search
            # (index/streaming.py — measured AT the transfer bound). Cosine
            # only; scale-out for the other metrics is mesh sharding.
            if not self._quantized:
                raise ValueError(
                    "stream_threshold_bytes exceeded with dtype="
                    f"'{self.config.dtype}': the streamed tier requires "
                    "int8 storage (IndexConfig(dtype='int8')) — streaming "
                    "f32 would quadruple the transfer-bound sweep time"
                )
            from image_retrieval_tpu.index.streaming import (
                StreamingGallerySearch,
            )

            # the stored norm-preserving scales (unit_norm / qnorm) are
            # exactly the engine's expected form: raw int8 dot * scale ==
            # cosine against a unit query (streaming.quantize_rows_int8
            # computes the identical 1/qnorm for unit rows)
            n_live = int(self._host_valid[: self.count].sum())
            if n_live == self.count:
                # no tombstones (the common case at this scale): hand the
                # engine VIEWS — a fancy-indexed copy would transiently
                # double host RAM at exactly the beyond-HBM sizes this
                # tier exists for (16 GB at 32M int8 rows)
                rows = self._host_gallery[: self.count]
                sc = self._host_scales[: self.count]
                pk = (self._host_packed[: self.count]
                      if self._packed4 else None)
                sc4 = (self._host_scales4[: self.count]
                       if self._packed4 else None)
                self._stream_live = None  # identity id map
            else:
                live = np.flatnonzero(self._host_valid[: self.count])
                rows = self._host_gallery[live]
                sc = self._host_scales[live].astype(np.float32)
                pk = self._host_packed[live] if self._packed4 else None
                sc4 = (self._host_scales4[live].astype(np.float32)
                       if self._packed4 else None)
                self._stream_live = live
            if self._packed4:
                # int4 streamed: each sweep moves the nibble-packed rows
                # (HALF the transfer bytes — the tier is transfer-bound);
                # the int8 rows stay host-side as the exact-rerank source
                self._stream = StreamingGallerySearch(
                    pk, sc4, packed4=True, rerank_rows=rows,
                    rerank_scales=sc, rerank_c=self.config.rerank_c,
                )
            else:
                self._stream = StreamingGallerySearch(rows, sc)
            # kept for derived engines (index/screen.py streamed mode):
            # views when no tombstones, else the same arrays the engine
            # holds — never an extra copy
            self._stream_rows = rows
            self._stream_scales = sc
            self._gallery = self._mags = self._valid = self._scales = None
            self._shadow = None
            # also drop the int4 resident arrays: a previous resident sync
            # left ~threshold-sized _packed/_scales4 on device, and the
            # streamed tier would otherwise compete with that dead HBM at
            # exactly the beyond-HBM sizes it exists for (r5 review)
            self._packed = self._scales4 = None
            self._device_dirty = False
            return
        self._stream = self._stream_live = None
        self._stream_rows = self._stream_scales = None
        if self._packed4:
            # int4 capacity tier: the DEVICE holds only the nibble-packed
            # screen copy (D/2 bytes per row-pair — ~2x resident rows per
            # chip); the int8 rows stay in host RAM as the exact-rerank
            # source. Magnitudes never ship: the tier is cosine-only.
            paired = self._paired_packed_form()
            self._packed = shard_rows(
                paired if paired is not None else self._host_packed,
                self.mesh, self._row_axes)
            self._scales4 = shard_rows(self._host_scales4, self.mesh,
                                       self._row_axes)
            self._valid = shard_rows(self._host_valid, self.mesh,
                                     self._row_axes)
            self._gallery = self._mags = self._scales = self._shadow = None
            if self.config.rerank_device and paired is not None:
                # int4 LATENCY mode: int8 rows also resident, so the exact
                # rerank fuses into the screen dispatch (config.py
                # rerank_device). 1.5x int8's HBM; screen sweeps half the
                # int8 bytes, so two-phase beats the int8 sweep outright.
                from image_retrieval_tpu.index.plan import USABLE_HBM_BYTES

                est = (self.capacity // self._nshards) * (
                    self.dim // 2 + self.dim + 8)
                if est > USABLE_HBM_BYTES:
                    import logging

                    logging.getLogger(__name__).warning(
                        "rerank_device: ~%.1f GiB/device exceeds the "
                        "measured ~%.1f GiB usable HBM — expect an OOM; "
                        "use the capacity configuration "
                        "(rerank_device=False) or more devices "
                        "(plan_index() picks this automatically)",
                        est / (1 << 30), USABLE_HBM_BYTES / (1 << 30))
                self._gallery = shard_rows(self._host_gallery, self.mesh,
                                           self._row_axes)
                self._scales = shard_rows(self._host_scales, self.mesh,
                                          self._row_axes)
            elif self.config.rerank_device:
                import logging

                logging.getLogger(__name__).warning(
                    "rerank_device requested but the paired int4 layout "
                    "gates failed (dim %% 512 or shard-row alignment); "
                    "falling back to the host-gather rerank")
            self._device_dirty = False
            return
        self._packed = self._scales4 = None
        self._gallery = shard_rows(self._host_gallery, self.mesh, self._row_axes)
        self._mags = shard_rows(self._host_mags, self.mesh, self._row_axes)
        self._valid = shard_rows(self._host_valid, self.mesh, self._row_axes)
        if self._quantized:
            self._scales = shard_rows(self._host_scales, self.mesh, self._row_axes)
        self._shadow = None
        if self._quantized and self.config.l1_shadow:
            # sharding-preserving elementwise derive on device — the bf16
            # multiply rounds identically to the in-sweep dequant, so
            # searches with/without the shadow are bitwise equal
            from image_retrieval_tpu.ops.metrics import make_l1_shadow

            self._shadow = jax.jit(make_l1_shadow)(
                self._gallery, self._scales, self._mags
            )
        self._device_dirty = False

    # Milvus load() now has real work: it stages the gallery onto the mesh
    # (the reference's collection.load() pulls segments into Milvus memory).
    @_locked
    def load(self) -> None:
        self._sync_device()

    def release(self) -> None:
        pass

    @_locked
    def set_meta(self, key: str, value) -> None:
        """Set a small JSON-serializable metadata value. Journaled (when a
        journal is attached) and included in save(), so it survives both
        crash recovery and checkpoints — the persistence path for state
        with no rows behind it (e.g. empty partitions, COMPAT.md §15)."""
        self.meta[str(key)] = value
        if self._journal is not None and not self._replaying:
            self._journal.log_meta(key, value)

    @_locked
    def flush(self) -> None:
        """Durability barrier (Milvus collection.flush(),
        ImageEmbeddingSystem.py:137): when the index was opened with a
        journal, fsync the op log so every mutation so far survives a
        process crash. No-op without a journal."""
        if self._journal is not None:
            self._journal.flush()

    def __len__(self) -> int:
        return self.count

    # -- search -------------------------------------------------------------

    @staticmethod
    def _weights_tuple(params: Optional[Dict[str, float]]) -> Tuple[float, ...]:
        params = params or {}
        return tuple(float(params.get(k, 1.0 if k == "w_angle" else 0.0))
                     for k in _WEIGHT_KEYS)

    # Each distinct query-batch shape costs a jit compile (minutes through
    # the remote TPU compiler); the micro-batching server produces batches
    # of every size 1..max_batch, so Q snaps to a small bucket ladder and
    # the padded rows are sliced off the result.
    _Q_BUCKETS = (1, 8, 32, 64, 128, 256)

    def _prep_queries(self, queries: np.ndarray) -> Tuple[jnp.ndarray, bool, int]:
        q = np.asarray(queries, np.float32)
        single = q.ndim == 1
        if single:
            q = q[None]
        nq = q.shape[0]
        bucket = next((b for b in self._Q_BUCKETS if nq <= b), nq)
        if bucket > nq:
            q = np.concatenate([q, np.zeros((bucket - nq, q.shape[1]), np.float32)])
        return replicate(jnp.asarray(q), self.mesh), single, nq

    @_locked
    def search(
        self,
        queries: np.ndarray,
        top_k: int = 5,
        metric: str = "cosine_similarity",
        params: Optional[Dict[str, float]] = None,
        flt: Optional[str] = None,
        approx: Optional[bool] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Exact top-k. Returns (scores (Q,k), indices (Q,k)) as numpy.

        metric: any ops.metrics name or "optimized_similarity" (weighted
        combo per reference geometric_metrics.py:60-94, computed against
        magnitude-reconstructed stored vectors as in image_search.py:103-107).

        flt: optional boolean attribute expression (Milvus expr analog,
        e.g. "color == 'red' and views >= 100" — index/filters.py), or a
        precomputed (count,) bool mask. The filter mask replaces the
        tombstone mask inside the SAME masked-scan jit, so filtered
        searches compile nothing new; when fewer than top_k rows match,
        the tail pads with index -1 and the metric's worst-score sentinel
        (-inf for descending similarity metrics, +inf for ascending
        distance metrics) — check `idx < 0`, not the score value.

        approx: per-call override of ``IndexConfig.approx_select`` (None =
        use the config). Approximate candidate SET with true scores —
        recall/latency trading like the reference's Milvus nprobe
        (image_search.py:88). Resident sharded tier only: the streamed,
        int4, and multislice tiers ignore it (their selection strategies
        are fixed by their own measured designs). Each selector value is
        its own jit signature, so flipping per request costs one extra
        compile, not one per call.
        """
        if self.count == 0:
            raise ValueError("index is empty")
        if metric == "cosine":
            # the int4/streamed tiers accepted this alias while the
            # resident tiers crashed on it — normalize once here so the
            # same caller code survives an IndexConfig.dtype change
            metric = "cosine_similarity"
        self._sync_device()
        if self._stream is not None:
            return self._search_streamed(queries, top_k, metric, flt=flt)
        if self._packed4:
            return self._search_int4(queries, top_k, metric, flt=flt)
        valid = self._valid if flt is None else self._filtered_valid(flt)
        qdev, single, nq = self._prep_queries(queries)
        weights = self._weights_tuple(params) if metric == "optimized_similarity" else None
        if self._multislice:
            vals, idx = multislice_search_topk(
                qdev,
                self._gallery,
                valid,
                self._mags,
                min(top_k, self.live_count),
                metric,
                weights,
                self._scales,
                self._shadow if metric == "optimized_similarity" else None,
                mesh=self.mesh,
                slice_axis="slice",
                data_axis=self.axis,
            )
        else:
            vals, idx = sharded_search_topk(
                qdev,
                self._gallery,
                valid,
                self._mags,
                min(top_k, self.live_count),
                metric,
                weights,
                self._scales,
                # only the optimized sweep reads it; passing it for other
                # metrics would fork their jit signatures for nothing
                self._shadow if metric == "optimized_similarity" else None,
                mesh=self.mesh,
                axis=self.axis,
                # approximate candidate SET, true scores (5.8x at 16M,
                # recall@10 0.9984 — int8_tiled_probe.json)
                selector=("approx" if (self.config.approx_select
                                       if approx is None else approx)
                          else "exact"),
            )
        # one grouped fetch: sequential np.asarray calls each pay a full
        # host round-trip (40-50 ms on the dev tunnel; a PCIe hop each on
        # production hosts)
        vals, idx = jax.device_get((vals, idx))
        vals, idx = vals[:nq], idx[:nq]
        if flt is not None:
            # sub-top_k matches surface as sentinel scores; make the index
            # column unambiguous for callers (-1, like the streamed tier)
            idx = np.where(np.isfinite(vals), idx, -1)
        if single:
            return vals[0], idx[0]
        return vals, idx

    def _paired_packed_form(self) -> Optional[np.ndarray]:
        """PAIRED int32 device layout for the int4 Pallas screen kernel.

        (capacity, D/2) uint8 nibble rows -> (capacity/2, 2*D/8) int32,
        paired PER SHARD (pack_words_paired on each shard's contiguous
        row block) so a shard's paired rows cover exactly its identity
        row range [s*L, (s+1)*L) — `valid`/`scales` keep their identity
        sharding and local ids map to global as sid*L + id, unchanged.
        Returns None when the kernel's layout gates fail (the sharded
        sweep then runs the XLA tiled form on the uint8 rows):
          * lane dim 2*D/8 must be a whole number of 128-lane registers
            (D % 512 == 0) — 512 is the flagship CLIP dim;
          * per-shard rows must split into 128-pair kernel blocks
            (capacity % (256 * nshards) == 0; default capacity_step 64k
            always satisfies this).
        """
        if self.dim % 512:
            return None
        local_rows = self.capacity // self._nshards
        if local_rows % 256:
            return None
        from image_retrieval_tpu.ops.pallas_kernels import pack_words_paired

        blocks = self._host_packed.reshape(
            self._nshards, local_rows, self.dim // 2)
        return np.concatenate([pack_words_paired(b) for b in blocks], axis=0)

    def _search_int4(
        self, queries: np.ndarray, top_k: int, metric: str,
        flt: Optional[str] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """int4 capacity tier: two-phase exact-rerank search.

        Phase 1 (device): two-dot cosine sweep over the nibble-packed
        sharded gallery -> per-shard top-C -> ICI merge (cosine screen,
        recall@10 ~0.75 raw). Phase 2: gather the candidates' int8 rows
        from host RAM and rerank exactly on device (bf16 MXU dot * scale —
        the identical math to the resident int8 sweep, so returned scores
        match what dtype='int8' reports for the same rows). Measured
        end-to-end recall@10 0.983 vs the int8 sweep's 0.984 at 1M
        (bench_results/int4_probe.json). On production hosts the phase-2
        host hop is a PCIe gather of rerank_c rows/query (microseconds);
        tombstones and attribute filters mask inside phase 1.
        """
        if metric not in ("cosine_similarity", "cosine"):
            raise ValueError(
                f"metric '{metric}' is not available in the int4 capacity "
                "tier (cosine-only two-phase search); use dtype='int8' for "
                "multi-metric galleries"
            )
        from image_retrieval_tpu.ops.int4 import rerank_int8_topk
        from image_retrieval_tpu.parallel.collectives import (
            sharded_int4_screen_topk,
            sharded_int4_two_phase_topk,
        )

        valid = self._valid if flt is None else self._filtered_valid(flt)
        qdev, single, nq = self._prep_queries(queries)
        k = int(min(top_k, self.live_count))
        if k == 0:  # fully tombstoned: mirror the resident k=0 shape
            ev = np.zeros((nq, 0), np.float32)
            ei = np.zeros((nq, 0), np.int32)
            return (ev[0], ei[0]) if single else (ev, ei)
        c = int(min(max(self.config.rerank_c, k), self.count))
        if self._gallery is not None:
            # LATENCY mode (config.rerank_device): screen + exact rerank
            # in one dispatch against the device-resident int8 rows — no
            # host hop, one fetch. Candidate pool is c PER SHARD (superset
            # of the host path's global c).
            vals, idx = jax.device_get(sharded_int4_two_phase_topk(
                qdev, self._packed, valid, self._scales4,
                self._gallery, self._scales, c, k,
                mesh=self.mesh, axis=self._row_axes,
            ))
            vals, idx = vals[:nq], idx[:nq]
            idx = np.where(np.isfinite(vals), idx, -1)
            if single:
                return vals[0], idx[0]
            return vals, idx
        vals4, gidx = sharded_int4_screen_topk(
            qdev, self._packed, valid, self._scales4, c,
            mesh=self.mesh, axis=self._row_axes,
        )
        # grouped fetch (one round-trip); keep padding rows so the rerank
        # jit sees only bucketed shapes
        vals4, gidx = jax.device_get((vals4, gidx))
        ok = np.isfinite(vals4)
        safe = np.where(ok, gidx, 0)
        rows = self._host_gallery[safe]  # (bucket, c, D) int8 host gather
        sc8 = self._host_scales[safe].astype(np.float32)
        vals, pos = jax.device_get(rerank_int8_topk(qdev, rows, sc8, ok, k))
        vals = vals[:nq]
        pos = pos[:nq]
        idx = np.take_along_axis(gidx[:nq], pos, axis=1)
        # sub-k matches (filters/tombstones): sentinel like the other tiers
        idx = np.where(np.isfinite(vals), idx, -1)
        if single:
            return vals[0], idx[0]
        return vals, idx

    def _search_streamed(
        self, queries: np.ndarray, top_k: int, metric: str,
        flt: Optional[str] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Beyond-HBM cosine via the chunked streaming engine; results are
        identical to the resident int8 sweep (same bf16-dot math). An
        attribute filter becomes a per-chunk bool mask riding the same
        double-buffered window (1/D of the row payload — the sweep stays
        transfer-bound at the same rate)."""
        if metric not in ("cosine_similarity", "cosine"):
            raise ValueError(
                f"metric '{metric}' is not available in the streamed "
                "beyond-HBM tier (cosine only); shard the gallery over a "
                "mesh (parallel/collectives.py) for multi-metric search at "
                "this scale, or raise stream_threshold_bytes"
            )
        q = np.asarray(queries, np.float32)
        single = q.ndim == 1
        if single:
            q = q[None]
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        qu = q / np.where(qn > 0, qn, 1.0)
        mask = None
        if flt is not None:
            # filter_mask is in full row space (already ANDed with
            # tombstones); the engine holds live rows only when compacted
            full = self.filter_mask(flt)
            mask = full[self._stream_live] if self._stream_live is not None \
                else full
        vals, idx = self._stream.search(
            qu, top_k=min(top_k, self.live_count), mask=mask
        )
        if self._stream_live is not None:  # None = identity (no tombstones)
            idx = np.where(idx >= 0, self._stream_live[np.maximum(idx, 0)], -1)
        return (vals[0], idx[0]) if single else (vals, idx)

    @_locked
    def multi_metric_topk(
        self, queries: np.ndarray, top_k: int = 5,
        flt: Optional[str] = None,
    ) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
        """Exact per-metric top-k for all five metrics in one gallery pass
        (parallel/collectives.py sharded_multimetric_topk). `flt` filters
        rows by attribute expression like search()."""
        if self.count == 0:
            raise ValueError("index is empty")
        self._sync_device()
        if self._stream is not None:
            raise ValueError(
                "multi-metric search is not available in the streamed "
                "beyond-HBM tier; shard over a mesh or raise "
                "stream_threshold_bytes"
            )
        if self._packed4:
            raise ValueError(
                "multi-metric search is not available in the int4 capacity "
                "tier (cosine-only); use dtype='int8'"
            )
        from image_retrieval_tpu.parallel.collectives import sharded_multimetric_topk

        valid = self._valid if flt is None else self._filtered_valid(flt)
        qdev, single, nq = self._prep_queries(queries)
        out = sharded_multimetric_topk(
            qdev, self._gallery, valid, self._mags,
            min(top_k, self.live_count), self._scales, mesh=self.mesh,
            axis=self._row_axes,
        )
        result = {}
        for name, (vals, idx) in out.items():
            vals, idx = jax.device_get((vals, idx))
            vals, idx = vals[:nq], idx[:nq]
            if flt is not None:
                idx = np.where(np.isfinite(vals), idx, -1)
            result[name] = (vals[0], idx[0]) if single else (vals, idx)
        return result

    @_locked
    def search_paths(
        self,
        queries: np.ndarray,
        top_k: int = 5,
        metric: str = "cosine_similarity",
        params: Optional[Dict[str, float]] = None,
    ) -> List[Dict[str, float]]:
        """Single-query search returning reference-shaped result dicts
        [{'path': ..., 'score': ...}] (app_pipeline.py:165-168)."""
        vals, idx = self.search(queries, top_k, metric, params)
        if vals.ndim != 1:
            raise ValueError("search_paths takes a single query vector")
        return [
            {"path": self.paths[int(i)], "score": float(v)}
            for v, i in zip(vals, idx)
        ]

    @_locked
    def scores(
        self,
        queries: np.ndarray,
        metric: str = "cosine_similarity",
        params: Optional[Dict[str, float]] = None,
    ) -> np.ndarray:
        """Full (Q, count) score matrix (for analysis-scale galleries)."""
        if self.count == 0:
            raise ValueError("index is empty")
        self._sync_device()
        if self._stream is not None:
            raise ValueError(
                "scores() materializes (Q, count) — not available in the "
                "streamed beyond-HBM tier (use search()/top-k)"
            )
        if self._packed4:
            raise ValueError(
                "scores() is not available in the int4 capacity tier "
                "(two-phase top-k only); use dtype='int8' for full score "
                "matrices"
            )
        qdev, single, nq = self._prep_queries(queries)
        weights = self._weights_tuple(params) if metric == "optimized_similarity" else None
        s = np.asarray(
            sharded_scores(
                qdev, self._gallery, self._mags, metric, weights, self._scales,
                mesh=self.mesh, axis=self._row_axes,
            )
        )[:nq, : self.count]
        return s[0] if single else s

    @_locked
    def get_vectors(self, indices: Sequence[int]) -> np.ndarray:
        """Stored unit vectors for global indices (candidate fetch for
        overfetch->rerank parity with reference image_search.py:94-101)."""
        rows = self._host_gallery[np.asarray(indices, int)].astype(np.float32)
        if self._quantized:
            rows *= self._host_scales[np.asarray(indices, int)][:, None]
        return rows

    @_locked
    def get_magnitudes(self, indices: Sequence[int]) -> np.ndarray:
        return self._host_mags[np.asarray(indices, int)].astype(np.float32)

    # -- Milvus-style retrieval of stored data ------------------------------

    @_locked
    def query(self, limit: int = 1000, with_magnitude: bool = False):
        """Return stored (path, unit_embedding[, magnitude]) tuples
        (reference ImageEmbeddingSystem.py:147-202). Tombstoned (deleted)
        rows are excluded — Milvus query() never returns deleted
        entities, and delete() promises that parity."""
        if self.count == 0 or self._host_gallery is None:
            return []  # Milvus query() on an empty collection returns []
        # select the emitted live rows FIRST, then dequantize only that
        # slice — the old form dequantized the whole gallery to f32 up
        # front (a ~65 GB allocation at the 32M int8 tier) for what is
        # typically a limit<=1000 peek (r5 review finding)
        if self._host_valid is not None:
            live = np.flatnonzero(self._host_valid[: self.count])[:limit]
        else:
            live = np.arange(min(limit, self.count))
        rows = self._host_gallery[live].astype(np.float32)
        if self._quantized and live.size:
            rows = rows * self._host_scales[live, None]
        out = []
        for j, i in enumerate(live):
            i = int(i)
            if with_magnitude:
                out.append((self.paths[i], rows[j], float(self._host_mags[i])))
            else:
                out.append((self.paths[i], rows[j]))
        return out

    @_locked
    def reconstruct_original_embeddings(self, limit: int = 1000):
        """(path, unit*magnitude) round-trip (ImageEmbeddingSystem.py:204-215)."""
        return [
            (p, e * m) for p, e, m in self.query(limit, with_magnitude=True)
        ]

    # -- persistence --------------------------------------------------------

    @_locked
    def save(self, path: str) -> None:
        """Persist as npz + json sidecar (replaces Milvus server-side
        persistence, docker-compose.yml:11-12). Tombstoned rows are
        compacted away first so deletes survive the save/load cycle."""
        self.compact()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        g = (self._host_gallery[: self.count].astype(np.float32)
             if self.count else np.zeros((0, self.dim), np.float32))
        if self._quantized and self.count:
            g = g * self._host_scales[: self.count, None]
        m = (self._host_mags[: self.count].astype(np.float32)
             if self.count else np.zeros((0,), np.float32))
        attr_arrays, attr_meta = self.attrs.to_arrays()
        np.savez(path, embeddings=g, magnitudes=m, **attr_arrays)
        # np.savez appends .npz when absent; key the sidecar off the FINAL
        # npz filename so save('gallery') / load_from('gallery') round-trip
        npz_path = path if path.endswith(".npz") else path + ".npz"
        with open(npz_path + ".paths.json", "w") as f:
            json.dump(self.paths, f)
        if attr_arrays:
            with open(npz_path + ".attrs.json", "w") as f:
                json.dump(attr_meta, f)
        # Persist the tier configuration: embeddings are stored as portable
        # dequantized f32, but without the config a reloaded int8/int4
        # index would silently come back as the float32 tier (and lose
        # rerank_c / l1_shadow / stream_threshold_bytes with it).
        with open(npz_path + ".config.json", "w") as f:
            json.dump(dataclasses.asdict(self.config), f)
        if self.meta:
            with open(npz_path + ".meta.json", "w") as f:
                json.dump(self.meta, f)

    @_locked
    def checkpoint(self) -> None:
        """Seal the journal: write a full snapshot into the journal
        directory, atomically publish it, truncate the op log and GC
        consumed segments (the Milvus segment-seal analog). Requires an
        index opened with open()."""
        if self._journal is None:
            raise ValueError(
                "checkpoint() requires a journaled index — use "
                "ShardedVectorIndex.open(journal_dir)")
        seq, base = self._journal.begin_checkpoint()
        if seq is None:
            return  # nothing logged since the last checkpoint: no-op
        # save() compacts; suppress journaling of that compact — the
        # snapshot embodies its effect and the log is truncated anyway
        self._replaying = True
        try:
            self.save(base)
        finally:
            self._replaying = False
        self._journal.commit_checkpoint(seq)

    @classmethod
    def open(
        cls, journal_dir: str, mesh: Optional[Mesh] = None,
        config: Optional[IndexConfig] = None,
    ) -> "ShardedVectorIndex":
        """Open (or create) a journaled index: load the newest checkpoint
        under `journal_dir` if one exists, replay the pending op log on
        top, and attach the journal so every subsequent mutation is
        logged. flush() is the durability barrier; checkpoint() seals.
        `config` applies when creating a fresh directory (afterwards the
        checkpoint's saved config wins unless overridden)."""
        from image_retrieval_tpu.index.journal import IndexJournal

        journal = IndexJournal(journal_dir)
        snap = journal.snapshot_path()
        if snap is not None:
            idx = cls.load_from(snap, mesh=mesh, config=config)
        else:
            # no checkpoint yet: the tier config must come from the journal
            # directory itself, or a 64-dim int8 index would replay into a
            # fresh 512-dim f32 one
            if config is None:
                saved = journal.load_config()
                if saved is not None:
                    config = _config_from_saved(saved)
            cfg = config or IndexConfig()
            idx = cls(dim=cfg.embedding_dim, mesh=mesh, config=config)
        journal.store_config(dataclasses.asdict(idx.config))
        for rec in journal.pending():
            op = rec["op"]
            if op == "insert":
                try:
                    unit, mags = journal.load_segment(rec["seq"])
                except (FileNotFoundError, KeyError, OSError, ValueError,
                        zipfile.BadZipFile) as e:
                    # torn/missing segment: this record and everything
                    # after it are the un-flushed tail (group commit —
                    # segments fsync at the flush() barrier); drop them,
                    # exactly the durability Milvus gives pre-flush writes.
                    # NOT a bare except: a transient MemoryError here must
                    # re-raise, never destroy flushed durable records
                    if isinstance(e, OSError) and e.errno in (
                            errno.ENOMEM, errno.EMFILE, errno.ENFILE):
                        raise
                    journal.drop_from(rec["seq"])
                    break
                idx.insert(rec["paths"], unit, mags, attrs=rec.get("attrs"))
            elif op == "delete":
                idx.delete(rec["paths"])
            elif op == "delete_rows":
                idx.delete_rows(rec["rows"])
            elif op == "compact":
                idx.compact()
            elif op == "meta":
                idx.meta[rec["key"]] = rec["value"]
        idx._journal = journal
        return idx

    @classmethod
    def load_from(
        cls, path: str, mesh: Optional[Mesh] = None,
        config: Optional[IndexConfig] = None,
    ) -> "ShardedVectorIndex":
        """Rebuild from save(). The saved tier configuration is restored
        by default (insert() re-quantizes the portable f32 rows per the
        config); pass config= to override, e.g. to re-tier on load."""
        npz_path = path if path.endswith(".npz") else path + ".npz"
        data = np.load(npz_path)
        with open(npz_path + ".paths.json") as f:
            paths = json.load(f)
        if config is None and os.path.exists(npz_path + ".config.json"):
            with open(npz_path + ".config.json") as f:
                saved = json.load(f)
            config = _config_from_saved(saved)
        emb = data["embeddings"]
        dim = (emb.shape[1] if emb.size
               else (config.embedding_dim if config else 512))
        idx = cls(dim=dim, mesh=mesh, config=config)
        if len(paths):
            idx.insert(paths, emb, data["magnitudes"])
        attr_arrays = {k: data[k] for k in data.files if k.startswith("attr__")}
        if attr_arrays and os.path.exists(npz_path + ".attrs.json"):
            with open(npz_path + ".attrs.json") as f:
                meta = json.load(f)
            idx.attrs = AttributeStore.from_arrays(attr_arrays, meta)
        if os.path.exists(npz_path + ".meta.json"):
            with open(npz_path + ".meta.json") as f:
                idx.meta = json.load(f)
        return idx
