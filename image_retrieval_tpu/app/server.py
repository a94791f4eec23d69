"""Micro-batching query server — production serving over the sharded index.

One gallery sweep serves an entire query batch at nearly the cost of one
query (bandwidth-bound), so throughput serving is a batching problem: this
engine collects concurrent requests into micro-batches (up to `max_batch` or
`max_wait_ms`, whichever first) and dispatches one batched encode + one
batched exact search per tick. The reference has no serving story (its GUI
ran one blocking search per click, reloading CLIP each time,
app_pipeline.py:174-191).

Usage:
    server = SearchServer(encoder, index)
    server.start()
    results = server.search("a brown dog", top_k=10)   # thread-safe
    ...
    server.stop()
"""

from __future__ import annotations

import logging
import os
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Sequence, Dict, List, Optional

import numpy as np

from image_retrieval_tpu.index import ShardedVectorIndex
from image_retrieval_tpu.index.vector_index import _WEIGHT_KEYS
from image_retrieval_tpu.models.encoder import Encoder

logger = logging.getLogger(__name__)


@dataclass
class _Request:
    query: str
    top_k: int
    metric: str = "cosine_similarity"
    weights: Optional[tuple] = None  # (w_angle, w_l1, w_l2, w_inf, w_mag)
    flt: Optional[str] = None  # boolean attribute expression (index/filters.py)
    approx: Optional[bool] = None  # per-request approx_select override
    # image-query requests arrive pre-embedded (search_similar); they skip
    # the batch text encode but share the grouped gallery sweeps
    embedding: Optional[np.ndarray] = None
    exclude_path: Optional[str] = None  # drop the query image's own row
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[List[dict]] = None
    error: Optional[Exception] = None


class SearchServer:
    """Thread-safe text-search server with request micro-batching."""

    def __init__(
        self,
        encoder: Encoder,
        index: ShardedVectorIndex,
        max_batch: int = 64,
        max_wait_ms: float = 2.0,
        ann=None,
        overfetch: int = 3,
        approx_select: Optional[bool] = None,
    ):
        """`ann`: optional IVFIndex over the same rows — candidate generation
        then runs two-phase (IVF candidates -> exact rerank), the reference's
        Milvus-ANN serving shape (image_search.py:85-112). `overfetch` is the
        candidate factor (reference image_search.py:93; keep in sync with
        SearchConfig.overfetch).

        `approx_select`: server-wide default for the approximate candidate
        selector (IndexConfig.approx_select — true scores, approximate
        candidate set; 5.8x batched latency at 16M rows at recall@10
        0.9984, bench_results/int8_tiled_probe.json). None = inherit the
        index config; requests can still override per call via
        search(approx=...). The reference's serving default is far more
        approximate (Milvus IVF nprobe=10, image_search.py:88)."""
        self.encoder = encoder
        self.index = index
        self.ann = ann
        self.overfetch = overfetch
        self.approx_select = approx_select
        if ann is not None and approx_select:
            logger.warning(
                "approx_select has no effect on requests served by the ANN "
                "candidate path (unfiltered cosine/optimized); only "
                "filtered/other-metric requests fall through to the exact "
                "index sweep where the selector applies"
            )
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self.stats: Dict[str, float] = {
            "requests": 0, "batches": 0, "max_observed_batch": 0,
        }

    # -- lifecycle -----------------------------------------------------------

    def start(self) -> None:
        if self._thread is not None:
            return
        self.index.load()  # stage gallery onto the mesh before serving
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        # order matters: _stop first, so _enqueue fails fast from here on
        # and the drain below can't race a later put (ADVICE r2)
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
        # fail fast for requests still queued (enqueued after the loop's
        # last collect): without this their callers block for the full
        # request timeout before seeing an error
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            req.error = RuntimeError("server stopped")
            req.done.set()

    def _enqueue(self, req: _Request) -> None:
        if self._stop.is_set():
            raise RuntimeError("server stopped")
        self._queue.put(req)
        if self._stop.is_set() and not req.done.is_set():
            # stop() may have drained between the check and the put; make
            # sure this request fails fast either way (double done.set from
            # a concurrent drain is harmless)
            req.error = RuntimeError("server stopped")
            req.done.set()

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()

    def _ann_search(self, q_unit, q_in, k, metric, params):
        """Two-phase IVF serving: overfetched cosine candidates, exact rerank
        for the optimized metric (reference image_search.py:88-107).

        Under-full probed clusters yield -1 padding slots; those are dropped
        per query and the output padded with (score=-inf, id=-1), which the
        result builder skips — fewer-than-k hits, never bogus paths."""
        limit = min(k * self.overfetch, len(self.index))
        cos, cand = self.ann.search(q_unit, top_k=limit)
        # drop candidates tombstoned in the base index since the ANN was
        # built/extended (live remove_images deletes base rows only; the
        # exact path masks tombstones in-sweep, this is the ANN analog)
        live = self.index.live_mask()
        if len(live):
            dead = (cand >= 0) & ~live[np.clip(cand, 0, len(live) - 1)]
            if dead.any():
                cos = np.where(dead, -np.inf, cos)
                cand = np.where(dead, -1, cand)
        width = min(k, limit)
        vals = np.full((len(q_unit), width), -np.inf, np.float32)
        idx = np.full((len(q_unit), width), -1, np.int64)
        if metric == "cosine_similarity":
            for r in range(len(q_unit)):
                valid = cand[r] >= 0
                m = min(width, int(valid.sum()))
                vals[r, :m] = cos[r][valid][:m]
                idx[r, :m] = cand[r][valid][:m]
            return vals, idx
        from image_retrieval_tpu.app.search import (
            _all_metrics_rows,
            _optimized_rows,
        )

        for r in range(len(q_in)):
            cr = cand[r][cand[r] >= 0]
            if not len(cr):
                continue
            rows = (
                self.index.get_vectors(cr)
                * self.index.get_magnitudes(cr)[:, None]
            )
            s = _optimized_rows(_all_metrics_rows(q_in[r], rows), params or {})
            order = np.argsort(-s, kind="stable")[:width]
            vals[r, : len(order)] = s[order]
            idx[r, : len(order)] = cr[order]
        return vals, idx

    # -- live ingest ---------------------------------------------------------

    def add_images(self, image_paths: Sequence, batch_size: Optional[int] = None,
                   attrs_fn=None):
        """Live ingest: decode + batch-embed + insert into the serving index
        with no restart (Milvus serves insert and search concurrently;
        reference ImageEmbeddingSystem.py:100-137). Safe against in-flight
        micro-batches via the index RLock; new rows appear in results from
        the next batch after the insert commits. An attached IVF ANN gets
        the new rows via its exactly-swept tail (IVFIndex.add). Inserts
        only change the jit signature when the gallery crosses a
        capacity_step boundary, so steady drip-feeding recompiles nothing.
        Returns (inserted, failed)."""
        from image_retrieval_tpu.app.embed import ImageEmbeddingSystem

        start = len(self.index)
        emb = ImageEmbeddingSystem(self.encoder, index=self.index,
                                   attrs_fn=attrs_fn)
        ok, failed = emb.process_and_store_images(
            list(image_paths), batch_size=batch_size)
        if self.ann is not None and ok:
            if hasattr(self.ann, "add"):
                self.ann.add(self.index.get_vectors(range(start, start + ok)))
            else:
                # e.g. a ScreenedSearch: no incremental add, and a stale
                # sketch raises on every later search. Detach so serving
                # degrades to the exact sweep (correct results) instead of
                # erroring per batch (r5 review).
                logger.warning(
                    "attached ANN (%s) has no add(); detaching — serving "
                    "falls back to the exact sweep (rebuild and re-attach "
                    "to restore the two-phase path)",
                    type(self.ann).__name__)
                self.ann = None
        # durability barrier BEFORE acknowledging: with a journaled index
        # an insert this method returned for must survive a crash (Milvus
        # flush() contract, reference ImageEmbeddingSystem.py:137); no-op
        # on an in-memory index
        self.index.flush()
        self.stats["ingested"] = self.stats.get("ingested", 0) + ok
        return ok, failed

    def remove_images(self, image_paths: Sequence) -> int:
        """Live delete: tombstone rows by path. The exact path masks
        tombstones in-sweep; ANN candidates referencing dead rows are
        filtered in _ann_search. Storage is reclaimed by a later
        compact()/save() — do NOT compact while an ANN is attached (row
        ids shift; rebuild the ANN after). Returns rows deleted."""
        n = self.index.delete(list(image_paths))
        if n:
            if self.ann is not None and not hasattr(self.ann, "add"):
                # generation-checked tiers (ScreenedSearch) would raise on
                # every post-mutation search; detach -> exact fallback
                logger.warning(
                    "attached ANN (%s) cannot follow deletions; detaching "
                    "— serving falls back to the exact sweep",
                    type(self.ann).__name__)
                self.ann = None
            # tombstones are journaled mutations too: an acknowledged
            # delete must not resurrect on restart
            self.index.flush()
        self.stats["removed"] = self.stats.get("removed", 0) + n
        return n

    # -- client API ----------------------------------------------------------

    def search(
        self,
        query: str,
        top_k: int = 10,
        timeout: float = 30.0,
        metric: str = "cosine_similarity",
        weights: Optional[dict] = None,
        flt: Optional[str] = None,
        approx: Optional[bool] = None,
    ) -> List[dict]:
        """Blocking search; safe to call from many threads concurrently.

        metric: "cosine_similarity" (default) or "optimized_similarity" with
        the 5-weight params dict (reference similarity_params).
        flt: boolean attribute expression (index/filters.py); requests with
        the same filter share a micro-batch group and the cached mask.
        approx: per-request approx_select override (None = the server /
        index default); requests with the same setting share a group."""
        wt = None
        if weights is not None:
            wt = tuple(float(weights.get(k, 1.0 if k == "w_angle" else 0.0))
                       for k in _WEIGHT_KEYS)
        req = _Request(query=query, top_k=top_k, metric=metric, weights=wt,
                       flt=flt, approx=approx)
        self._enqueue(req)
        if not req.done.wait(timeout):
            raise TimeoutError(f"search timed out after {timeout}s")
        if req.error is not None:
            raise req.error
        return req.result

    def search_similar(
        self,
        image,
        top_k: int = 10,
        timeout: float = 30.0,
        metric: str = "cosine_similarity",
        weights: Optional[dict] = None,
        exclude_self: bool = True,
        flt: Optional[str] = None,
        approx: Optional[bool] = None,
    ) -> List[dict]:
        """Image-query search: encode `image` (a path or (H, W, 3) pixels)
        in the calling thread, then ride the same micro-batched gallery
        sweeps as text requests. A gallery path equal to the query path is
        dropped from its own results unless exclude_self=False."""
        exclude = None
        if isinstance(image, (str, bytes)) or hasattr(image, "__fspath__"):
            path = str(image)
            emb = self.encoder.encode_images([path])[0]
            if exclude_self:
                exclude = path
        else:
            pixels = np.asarray(image)
            if pixels.ndim != 3:
                raise ValueError(
                    f"expected a path or (H, W, 3) pixels, got shape "
                    f"{pixels.shape}"
                )
            emb = self.encoder.encode_pixels(pixels[None])[0]
        wt = None
        if weights is not None:
            wt = tuple(float(weights.get(k, 1.0 if k == "w_angle" else 0.0))
                       for k in _WEIGHT_KEYS)
        req = _Request(query="", top_k=top_k, metric=metric, weights=wt,
                       embedding=np.asarray(emb, np.float32),
                       exclude_path=exclude, flt=flt, approx=approx)
        self._enqueue(req)
        if not req.done.wait(timeout):
            raise TimeoutError(f"search timed out after {timeout}s")
        if req.error is not None:
            raise req.error
        return req.result

    def search_many(
        self,
        queries: Sequence[str],
        top_k: int = 10,
        timeout: float = 30.0,
        metric: str = "cosine_similarity",
        weights: Optional[dict] = None,
        flt: Optional[str] = None,
        approx: Optional[bool] = None,
    ) -> List[List[dict]]:
        """Enqueue ALL queries before waiting, so they coalesce into shared
        micro-batches (one encode + one gallery sweep per batch) instead of
        paying a sequential round-trip — and the batching delay — per
        query. Results are in input order; per-request errors re-raise."""
        wt = None
        if weights is not None:
            wt = tuple(float(weights.get(k, 1.0 if k == "w_angle" else 0.0))
                       for k in _WEIGHT_KEYS)
        reqs = [
            _Request(query=q, top_k=top_k, metric=metric, weights=wt,
                     flt=flt, approx=approx)
            for q in queries
        ]
        for r in reqs:
            self._enqueue(r)
        deadline = time.perf_counter() + timeout
        out = []
        for r in reqs:
            if not r.done.wait(max(deadline - time.perf_counter(), 0.0)):
                raise TimeoutError(f"batch search timed out after {timeout}s")
            if r.error is not None:
                raise r.error
            out.append(r.result)
        return out

    # -- batching loop ---------------------------------------------------------

    def _collect(self) -> List[_Request]:
        try:
            first = self._queue.get(timeout=0.05)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _loop(self) -> None:
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            try:
                # text requests share one batch encode; pre-embedded
                # (image-query) requests slot straight into the arrays
                text_rows = [i for i, r in enumerate(batch)
                             if r.embedding is None]
                parts: List[Optional[np.ndarray]] = [
                    None if r.embedding is None else r.embedding
                    for r in batch
                ]
                if text_rows:
                    tembs = self.encoder.encode_texts(
                        [batch[i].query for i in text_rows]
                    )
                    for row, i in enumerate(text_rows):
                        parts[i] = np.asarray(tembs[row])
                embs = np.stack(parts).astype(np.float32)
                norms = np.linalg.norm(embs, axis=1, keepdims=True)
                qn = embs / np.where(norms > 0, norms, 1.0)
                # one index sweep per (metric, weights) group in the batch
                groups: Dict[tuple, List[int]] = {}
                for i, r in enumerate(batch):
                    # request override > server default > index config
                    approx = (r.approx if r.approx is not None
                              else self.approx_select)
                    # the ANN candidate path ignores the selector — don't
                    # let a mixed approx=0/1 batch split one sweep in two
                    if (self.ann is not None and r.flt is None
                            and r.metric in ("cosine_similarity",
                                             "optimized_similarity")):
                        approx = None
                    groups.setdefault(
                        (r.metric, r.weights, r.flt, approx), []
                    ).append(i)
                for (metric, weights, flt, approx), rows in groups.items():
                    try:
                        k = max(
                            batch[i].top_k
                            + (1 if batch[i].exclude_path is not None else 0)
                            for i in rows
                        )
                        # optimized metric scores against unnormalized query
                        q_in = (embs[rows] if metric == "optimized_similarity"
                                else qn[rows])
                        params = (
                            dict(zip(_WEIGHT_KEYS, weights))
                            if weights is not None else None
                        )
                        if self.ann is not None and flt is None and metric in (
                            "cosine_similarity", "optimized_similarity",
                        ):
                            vals, idx = self._ann_search(
                                qn[rows], q_in, k, metric, params
                            )
                        else:
                            # filters ride the exact masked scan (flt=None
                            # is the unfiltered fast path, same jit)
                            vals, idx = self.index.search(
                                q_in, top_k=min(k, len(self.index)),
                                metric=metric, params=params, flt=flt,
                                approx=approx,
                            )
                        for row, i in enumerate(rows):
                            r = batch[i]
                            hits = []
                            for v, j in zip(vals[row], idx[row]):
                                if j < 0:  # ANN padding: fewer, not bogus
                                    continue
                                p = self.index.paths[int(j)]
                                if r.exclude_path is not None and (
                                    p == r.exclude_path
                                    or os.path.realpath(p)
                                    == os.path.realpath(r.exclude_path)
                                ):
                                    continue
                                hits.append({"path": p, "score": float(v)})
                                if len(hits) >= r.top_k:
                                    break
                            r.result = hits
                            r.done.set()
                    except Exception as e:
                        # a bad metric/weights group fails only its own
                        # requests, not the whole batch
                        logger.exception("group failed")
                        for i in rows:
                            batch[i].error = e
                            batch[i].done.set()
                self.stats["requests"] += len(batch)
                self.stats["batches"] += 1
                self.stats["max_observed_batch"] = max(
                    self.stats["max_observed_batch"], len(batch)
                )
            except Exception as e:  # pragma: no cover - surfaced to callers
                logger.exception("batch failed")
                for r in batch:
                    r.error = e
                    r.done.set()
