"""Prefetching host->device ingest pipeline.

The reference embeds images one at a time with a synchronous
decode->forward per image (reference ImageEmbeddingSystem.py:120-129,
color_analysis_workflow.py:127-142). At TPU throughput the bottleneck moves
to host decode, so ingest is a pipeline:

    decode workers (native C++ thread pool or PIL threads)
        -> bounded batch queue (backpressure)
        -> device transfer + encode (caller)

Double buffering comes from the queue: while the TPU encodes batch i, the
workers decode batch i+1.
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def _decode_chunk_native(paths: List[str], size: int, threads: int,
                         emit: str = "f32"):
    from image_retrieval_tpu.utils import native

    fn = (native.decode_preprocess_batch_u8 if emit == "u8"
          else native.decode_preprocess_batch)
    batch, ok = fn(paths, size=size, threads=threads)
    return batch, ok


def _decode_worker_main(conn, size: int, use_native: bool, emit: str,
                        threads: int):
    """Decode-worker subprocess loop: receives path chunks, replies
    (batch, ok). Exists because in-process native decode and in-flight
    tunnel/device transfers degrade each other 2-4x through the GIL on a
    1-core host (bench_results/ingest_attrib2_probe.json); a subprocess
    gives decode its own interpreter. Top-level so 'spawn' can pickle it."""
    import os as _os

    # never let the child touch the accelerator: it only decodes. The env
    # var alone is too late on hosts whose sitecustomize imports jax before
    # this function runs (jax reads JAX_PLATFORMS at import time), so pin
    # the already-imported config too — same trap tests/conftest.py
    # documents. Attaching a second client wedges single-owner device
    # tunnels.
    _os.environ["JAX_PLATFORMS"] = "cpu"
    import sys as _sys
    if "jax" in _sys.modules:  # config flip only; don't import jax to decode
        try:
            _sys.modules["jax"].config.update("jax_platforms", "cpu")
        except Exception:
            pass
    try:
        while True:
            msg = conn.recv()
            if msg is None:
                return
            chunk = msg
            try:
                if use_native:
                    batch, ok = _decode_chunk_native(chunk, size, threads,
                                                     emit)
                else:
                    batch, ok = _decode_chunk_pil(chunk, size, emit)
                conn.send((batch, ok))
            except Exception as e:  # surfaced through the queue
                conn.send(e)
    except (EOFError, KeyboardInterrupt):
        return


class _WorkerHandle:
    """A spawned decode worker + its pipe, reusable across loaders."""

    def __init__(self, size, use_native, emit, threads):
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        self.conn, child = ctx.Pipe()
        self.proc = ctx.Process(
            target=_decode_worker_main,
            args=(child, size, use_native, emit, threads),
            daemon=True,
        )
        self.proc.start()
        child.close()
        # one loader drives the pipe at a time (request/reply protocol)
        self.lock = threading.Lock()

    def close(self):
        try:
            self.conn.send(None)
            self.conn.close()
        except Exception:
            pass
        self.proc.join(timeout=5)
        if self.proc.is_alive():
            self.proc.terminate()


# persistent decode workers keyed by (size, use_native, emit, threads):
# spawn + interpreter start costs seconds, a production ingest service
# reuses one worker for its lifetime. Guarded by a lock; cleaned at exit.
_WORKERS: dict = {}
_WORKERS_LOCK = threading.Lock()


def _get_worker(key) -> _WorkerHandle:
    with _WORKERS_LOCK:
        w = _WORKERS.get(key)
        if w is None or not w.proc.is_alive():
            w = _WorkerHandle(*key)
            _WORKERS[key] = w
        return w


def _shutdown_workers():
    with _WORKERS_LOCK:
        for w in _WORKERS.values():
            w.close()
        _WORKERS.clear()


import atexit

atexit.register(_shutdown_workers)


def _decode_chunk_pil(paths: List[str], size: int, emit: str = "f32"):
    from image_retrieval_tpu.models.preprocess import (
        preprocess_host,
        preprocess_host_u8,
    )

    fn = preprocess_host_u8 if emit == "u8" else preprocess_host
    out = np.zeros((len(paths), size, size, 3),
                   np.uint8 if emit == "u8" else np.float32)
    ok = np.zeros((len(paths),), bool)
    for i, p in enumerate(paths):
        try:
            out[i] = fn(p, size)
            ok[i] = True
        except Exception as e:
            logger.warning(f"decode failed for {p}: {e}")
    return out, ok


class ImageBatchLoader:
    """Iterate (paths, pixels, ok_mask) batches with background decoding.

    Args:
        paths: image files to decode.
        batch_size: images per emitted batch.
        size: output H=W.
        prefetch: max decoded batches buffered ahead (backpressure bound).
        use_native: prefer the C++ decoder (falls back to PIL when absent).
        threads: decode threads for the native path.
        emit: "f32" = CLIP-normalized float batches (parity path) or
            "u8" = raw RGB bytes, normalized ON DEVICE inside the encoder
            jit — 1/4 the host->device transfer bytes and no host
            normalize pass (the high-throughput ingest form; the encoder
            switches on batch dtype).
    """

    def __init__(
        self,
        paths: Sequence[str],
        batch_size: int = 256,
        size: int = 224,
        prefetch: int = 2,
        use_native: bool = True,
        threads: int = 0,
        emit: str = "f32",
        use_process: bool = False,
    ):
        assert emit in ("f32", "u8"), emit
        self.emit = emit
        self.paths = [str(p) for p in paths]
        self.batch_size = batch_size
        self.size = size
        self.prefetch = prefetch
        self.threads = threads
        # use_process: decode in a SPAWNED subprocess instead of a thread.
        # On a 1-core host with a CPU-mediated device link, in-process
        # decode and in-flight transfers strangle each other through the
        # GIL (measured 2-4x mutual slowdown, ingest_attrib2_probe.json);
        # a subprocess costs one 38 MB pipe hop per batch (~0.2 s) but
        # decodes at full speed while the parent moves bytes. Production
        # multi-core hosts want this too (N decode processes scale past
        # the GIL); single-process remains the default for tests/small
        # runs (spawn + import costs ~5-10 s once).
        self.use_process = use_process
        if use_native:
            try:
                from image_retrieval_tpu.utils import native

                use_native = native.available()
            except Exception:
                use_native = False
        self.use_native = use_native

    def __len__(self) -> int:
        return -(-len(self.paths) // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[List[str], np.ndarray, np.ndarray]]:
        # maxsize must be >= 1: Queue(maxsize=0) means UNBOUNDED in Python —
        # the opposite of the documented backpressure bound
        q: "queue.Queue" = queue.Queue(maxsize=max(1, self.prefetch))
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded put that still observes stop: a plain q.put() on a
            # full queue blocks forever once the consumer abandons the
            # iterator, leaking the thread and its decoded batches
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            worker = None
            held = False
            pending = 0
            try:
                if self.use_process:
                    worker = _get_worker((self.size, self.use_native,
                                          self.emit, self.threads))
                    worker.lock.acquire()
                    held = True
                chunks = [self.paths[i : i + self.batch_size]
                          for i in range(0, len(self.paths),
                                         self.batch_size)]
                if worker is not None and chunks:
                    # prime one chunk so the worker decodes ahead while
                    # the parent receives/queues the previous batch
                    worker.conn.send(chunks[0])
                    pending = 1
                for j, chunk in enumerate(chunks):
                    if stop.is_set():
                        return
                    if worker is not None:
                        if j + 1 < len(chunks):
                            worker.conn.send(chunks[j + 1])
                            pending += 1
                        got = worker.conn.recv()
                        pending -= 1
                        if isinstance(got, BaseException):
                            raise got
                        batch, ok = got
                    elif self.use_native:
                        batch, ok = _decode_chunk_native(
                            chunk, self.size, self.threads, self.emit)
                    else:
                        batch, ok = _decode_chunk_pil(chunk, self.size,
                                                      self.emit)
                    if not _put((chunk, batch, ok)):
                        return
            except BaseException as e:  # surfaced to the consumer, not lost
                _put(e)
            finally:
                if held:
                    try:
                        # drain replies for any chunk still queued so the
                        # next loader starts on a clean pipe
                        while pending > 0:
                            worker.conn.recv()
                            pending -= 1
                    except (EOFError, OSError):
                        pass
                    worker.lock.release()
                _put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    # producer died mid-run: re-raise instead of silently
                    # truncating the corpus
                    raise item
                yield item
        finally:
            stop.set()
            # drain so a blocked producer can observe stop and exit
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass


def stream_decoded(
    paths: Sequence[str],
    batch_size: int = 256,
    size: int = 224,
    fail_count: Optional[list] = None,
    **loader_kw,
):
    """(good_paths, good_pixels) batches from the decode loader, per-image
    failures dropped. `fail_count`: optional 1-element list accumulating
    the failed-image count. The ONE loader->encode_stream adapter —
    encode_folder and ImageEmbeddingSystem both ride it (two verbatim
    copies had started to drift — r5 review)."""
    for chunk, batch, ok in ImageBatchLoader(paths, batch_size, size,
                                             **loader_kw):
        if fail_count is not None:
            fail_count[0] += int(len(chunk) - ok.sum())
        if not ok.any():
            continue
        good = np.flatnonzero(ok)
        # all-ok batches skip the fancy-index copy (it costs a full
        # batch write on the single ingest core)
        yield ([chunk[int(i)] for i in good],
               batch if ok.all() else batch[good])


def encode_folder(
    encoder,
    paths: Sequence[str],
    batch_size: int = 256,
    size: int = 224,
    **loader_kw,
) -> Tuple[List[str], np.ndarray]:
    """High-throughput variant of ImageEmbeddingSystem ingest: overlapping
    host decode with device encode. Returns (ok_paths, embeddings)."""

    def feed():
        return stream_decoded(paths, batch_size, size, **loader_kw)

    ok_paths: List[str] = []
    embs: List[np.ndarray] = []
    # encode_stream keeps batches in flight ACROSS loader batches, so batch
    # N's device transfer/compute/fetch overlaps batch N+1's decode
    # (per-batch encode_pixels fetch-barriers each call — measured fully
    # serial, bench_results/ingest_attrib_probe.json)
    for good_paths, out in encoder.encode_stream(feed()):
        embs.append(out)
        ok_paths.extend(good_paths)
    if embs:
        return ok_paths, np.concatenate(embs, 0)
    return ok_paths, np.zeros((0, encoder.dim), np.float32)
