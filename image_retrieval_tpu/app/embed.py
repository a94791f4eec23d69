"""Embedding write path: batched encode -> sharded index insert.

Replaces reference ImageEmbeddingSystem.py:18-215 (per-image CLIP forward at
batch size 1 into a Milvus collection) with device-batched encoding over the
mesh `data` axis and a ShardedVectorIndex insert. Storage schema is the same
(unit vector + magnitude decomposition, ImageEmbeddingSystem.py:88-94), so
`reconstruct_original_embeddings` round-trips identically.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Tuple

import numpy as np

from image_retrieval_tpu.config import Config
from image_retrieval_tpu.index import ShardedVectorIndex
from image_retrieval_tpu.models.encoder import Encoder

logger = logging.getLogger(__name__)


class ImageEmbeddingSystem:
    """Generate and store image embeddings (reference write path)."""

    def __init__(
        self,
        encoder: Encoder,
        index: Optional[ShardedVectorIndex] = None,
        config: Optional[Config] = None,
        attrs_fn=None,
    ):
        self.encoder = encoder
        self.config = config or Config()
        self.index = index if index is not None else ShardedVectorIndex(
            dim=encoder.dim, config=self.config.index
        )
        # optional paths -> {field: [values]} hook: every insert attaches
        # scalar attribute columns for boolean-expr filtered search
        # (index/filters.py). Opt-in, so existing mixed-writer indexes keep
        # their schema-less inserts.
        self.attrs_fn = attrs_fn

    def generate_embedding(self, image_path) -> Tuple[np.ndarray, float]:
        """(unit_embedding, magnitude) for one image
        (reference ImageEmbeddingSystem.py:68-98)."""
        emb = self.encoder.encode_images([str(image_path)])[0]
        magnitude = float(np.linalg.norm(emb))
        # zero-norm guard (matches ShardedVectorIndex.insert): a degenerate
        # embedding must not produce a NaN unit vector
        return emb / (magnitude if magnitude > 0 else 1.0), magnitude

    def process_and_store_images(
        self, image_paths: Sequence, batch_size: Optional[int] = None
    ) -> Tuple[int, int]:
        """Batched encode + bulk insert; per-image failures are skipped
        (reference ImageEmbeddingSystem.py:100-145 semantics, batched).

        Pipelined since r5: decode runs in the loader's background thread
        (PIL path — identical pixels to the old per-image loop) and the
        encoder's encode_stream keeps device batches in flight across
        loader batches, so decode of batch N+1 overlaps batch N's device
        transfer/compute/fetch instead of fetch-barriering each batch.

        Returns (successful_count, failed_count)."""
        if not image_paths:
            logger.warning("No image paths provided for processing.")
            return 0, 0
        from image_retrieval_tpu.data.loader import stream_decoded

        bs = batch_size or self.config.batch_size
        ok_paths: List[str] = []
        ok_embs: List[np.ndarray] = []
        paths = [str(p) for p in image_paths]
        size = self.config.model.image_size
        # use_native=False keeps the PIL decode (preprocess_host) of the
        # original per-image loop — bit-identical pixels; decode failures
        # surface through the ok mask with a logged warning. One shared
        # loader->stream adapter (data/loader.py stream_decoded).
        fail_count = [0]
        feed = stream_decoded(paths, batch_size=bs, size=size,
                              fail_count=fail_count, use_native=False)

        for good_paths, embs in self.encoder.encode_stream(feed):
            ok_paths.extend(good_paths)
            ok_embs.extend(embs)
        if ok_paths:
            from image_retrieval_tpu.utils.profiling import trace

            with trace("embed/index_insert"):
                attrs = self.attrs_fn(ok_paths) if self.attrs_fn else None
                self.index.insert(ok_paths, np.stack(ok_embs), attrs=attrs)
                self.index.flush()
            logger.info(f"Inserted batch of {len(ok_paths)} images into index.")
        return len(ok_paths), fail_count[0]

    def get_embeddings(self, limit: int = 1000):
        """[(path, unit_embedding)] (reference ImageEmbeddingSystem.py:147-171)."""
        return self.index.query(limit)

    def get_embeddings_with_magnitude(self, limit: int = 1000):
        """[(path, unit_embedding, magnitude)]
        (reference ImageEmbeddingSystem.py:173-202)."""
        return self.index.query(limit, with_magnitude=True)

    def reconstruct_original_embeddings(self, embeddings=None, limit: int = 1000):
        """[(path, unnormalized_embedding)]
        (reference ImageEmbeddingSystem.py:204-215)."""
        if embeddings is not None:
            return [(p, e * m) for p, e, m in embeddings]
        return self.index.reconstruct_original_embeddings(limit)
