"""Text->image search read path (reference EnhancedTextImageSearcher).

Reproduces the observable behavior of reference image_search.py:15-308 on
top of the exact sharded index: candidate generation is an exact cosine
top-(k*overfetch) instead of Milvus IVF ANN, followed by the same rerank /
threshold / dedup pipeline. Reranking uses the stored *unit* vectors against
the unnormalized text embedding — exactly what the reference does with the
vectors Milvus returns (image_search.py:101-107).

The reference calls an undefined `get_all_distances` in
search_with_multiple_metrics (image_search.py:180); implemented here as
get_all_metrics, the documented intent (SURVEY §7).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional

import numpy as np

from image_retrieval_tpu.config import DEFAULT_SIMILARITY_PARAMS, SCORE_THRESHOLD
from image_retrieval_tpu.index import ShardedVectorIndex
from image_retrieval_tpu.models.encoder import Encoder

logger = logging.getLogger(__name__)

_DEFAULT_PARAMS = DEFAULT_SIMILARITY_PARAMS


def _all_metrics_rows(q: np.ndarray, g: np.ndarray) -> Dict[str, np.ndarray]:
    """Host float64 metrics of one query vs candidate rows (tiny set)."""
    q = q.astype(np.float64)
    g = g.astype(np.float64)
    d = g.shape[1]
    nq = np.linalg.norm(q)
    ng = np.linalg.norm(g, axis=1)
    denom = nq * ng
    dots = g @ q
    cos = np.where(denom > 0, dots / np.where(denom > 0, denom, 1.0), 0.0)
    diff = np.abs(g - q[None, :])
    return {
        "cosine_similarity": cos,
        "cosine_distance": 1 - cos,
        "angular_distance": np.arccos(np.clip(cos, -1.0, 1.0)),
        "l1_distance": diff.sum(1) / d,
        "l2_distance": np.sqrt((diff * diff).sum(1)) / np.sqrt(d),
        "linf_distance": diff.max(1),
        "magnitude_difference": np.abs(ng - nq),
    }


def ann_valid_candidates(ann, index, q_unit: np.ndarray, limit: int):
    """VALID IVF candidates for one unit query: (cosine scores, index-order
    ids) with -1 padding slots (under-full probed clusters) dropped.

    Every ANN consumer must use this (or filter identically): a -1 id fed to
    index.paths / index.get_vectors silently wraps to the LAST row."""
    cos, idx = ann.search(q_unit, top_k=min(limit, len(index)))
    valid = idx >= 0
    return cos[valid], idx[valid]


def _optimized_rows(m: Dict[str, np.ndarray], p: Dict[str, float]) -> np.ndarray:
    return (
        p.get("w_angle", 1.0) * m["cosine_similarity"]
        - p.get("w_l1", 0.0) * m["l1_distance"]
        - p.get("w_l2", 0.0) * m["l2_distance"]
        - p.get("w_inf", 0.0) * m["linf_distance"]
        - p.get("w_mag", 0.0) * m["magnitude_difference"]
    )


class TextImageSearcher:
    """Multi-metric text->image search over the sharded index.

    With `ann` set (an index.ivf.IVFIndex built over the same rows), candidate
    generation runs through IVF and reranking stays exact — the literal
    two-phase shape of the reference (Milvus ANN candidates + exact rerank,
    image_search.py:87-112). Default is the exact index (recall 1.0)."""

    def __init__(self, encoder: Encoder, index: ShardedVectorIndex, ann=None):
        self.encoder = encoder
        self.index = index
        self.ann = ann
        self.similarity_params = dict(_DEFAULT_PARAMS)

    def set_similarity_params(self, params: dict) -> None:
        self.similarity_params = params
        logger.info(f"Set similarity parameters: {params}")

    def generate_text_embedding(self, text: str) -> np.ndarray:
        """Unnormalized text embedding (reference image_search.py:47-64)."""
        if not text.strip():
            raise ValueError("Text query cannot be empty")
        return self.encoder.encode_texts([text])[0]

    def _candidates(self, text_embedding: np.ndarray, limit: int,
                    filter_expr=None):
        qn = text_embedding / max(float(np.linalg.norm(text_embedding)), 1e-12)
        if filter_expr is not None:
            # attribute filters ride the exact masked scan (the ANN tiers
            # don't see attribute columns; exact is the recommendation
            # anyway — see --ann help)
            if self.ann is not None:
                logger.info("filter set: using the exact index, not the ANN")
            return self.index.search(
                qn, top_k=min(limit, len(self.index)), flt=filter_expr
            )
        if self.ann is not None:
            return ann_valid_candidates(self.ann, self.index, qn, limit)
        vals, idx = self.index.search(qn, top_k=min(limit, len(self.index)))
        return vals, idx

    def search(
        self,
        text_query: str,
        top_k: int = 5,
        score_threshold: float = SCORE_THRESHOLD,
        use_optimized_similarity: bool = False,
        filter_expr: Optional[str] = None,
    ) -> List[dict]:
        """Candidate overfetch -> optional optimized rerank -> threshold ->
        dedup -> top_k (reference image_search.py:66-142). `filter_expr`
        restricts candidates by attribute expression (Milvus expr analog,
        index/filters.py) — evaluated inside the masked device scan."""
        logger.info(f"Searching for: {text_query} (optimized: {use_optimized_similarity})")
        from image_retrieval_tpu.utils.profiling import trace

        with trace("search/encode_text"):
            text_embedding = self.generate_text_embedding(text_query)
        unique = self._search_with_embedding(
            text_embedding, top_k, score_threshold, use_optimized_similarity,
            filter_expr=filter_expr,
        )
        logger.info(f"Found {len(unique)} matches for '{text_query}'")
        return unique

    def search_by_image(
        self,
        image,
        top_k: int = 5,
        score_threshold: float = SCORE_THRESHOLD,
        use_optimized_similarity: bool = False,
        exclude_self: bool = True,
        filter_expr: Optional[str] = None,
    ) -> List[dict]:
        """Image→image similarity search (beyond the reference, which is
        text-query only): encode the query image with the same tower that
        embedded the gallery and run the identical candidate → rerank →
        threshold → dedup chain.

        `image` is a file path or an (H, W, 3) pixel array; a path already
        present in the index is excluded from its own results unless
        `exclude_self=False`."""
        import numpy as _np

        from image_retrieval_tpu.utils.profiling import trace

        exclude = frozenset()
        with trace("search/encode_image"):
            if isinstance(image, (str, bytes)) or hasattr(image, "__fspath__"):
                path = os.fsdecode(image)  # str(b'...') would mangle bytes
                emb = self.encoder.encode_images([path])[0]
                if exclude_self:
                    exclude = frozenset([path])
            else:
                pixels = _np.asarray(image)
                if pixels.ndim != 3:
                    raise ValueError(
                        f"expected a path or (H, W, 3) pixels, got shape "
                        f"{pixels.shape}"
                    )
                # raw pixel arrays need the full CLIP transform (resize/
                # crop/normalize): the tower's positional embeddings are
                # fixed-size, and a float array would otherwise be trusted
                # as already-normalized (garbage scores)
                from image_retrieval_tpu.models.preprocess import (
                    preprocess_host,
                )

                size = getattr(
                    getattr(getattr(self.encoder, "config", None),
                            "model", None),
                    "image_size", 224) or 224
                if pixels.dtype != _np.uint8:
                    arr = _np.asarray(pixels, _np.float32)
                    if arr.size and float(arr.max()) <= 1.0:
                        arr = arr * 255.0  # [0,1] float convention
                    pixels = _np.clip(_np.rint(arr), 0, 255).astype(_np.uint8)
                emb = self.encoder.encode_pixels(
                    preprocess_host(pixels, size=size)[None])[0]
        unique = self._search_with_embedding(
            _np.asarray(emb), top_k, score_threshold, use_optimized_similarity,
            exclude_paths=exclude, filter_expr=filter_expr,
        )
        logger.info(f"Found {len(unique)} image-query matches")
        return unique

    def _search_with_embedding(
        self,
        embedding: np.ndarray,
        top_k: int,
        score_threshold: float,
        use_optimized_similarity: bool,
        exclude_paths: frozenset = frozenset(),
        filter_expr: Optional[str] = None,
    ) -> List[dict]:
        """Shared query chain: candidates → optional optimized rerank →
        threshold (min-max-relative when reranked, reference
        image_search.py:118-123) → dedup → top_k."""
        self.index.load()
        try:
            # overfetch one extra when the query's own row may be dropped
            cos_scores, idx = self._candidates(
                embedding, (top_k + len(exclude_paths)) * 3, filter_expr
            )
            if filter_expr is not None:
                # sub-overfetch matches pad with (-inf, -1); drop them so
                # the min-max rerank normalization isn't skewed to -inf
                keep = np.isfinite(cos_scores) & (idx >= 0)
                cos_scores, idx = cos_scores[keep], idx[keep]
            if use_optimized_similarity:
                cand = self.index.get_vectors(idx)
                metrics = _all_metrics_rows(embedding, cand)
                scores = _optimized_rows(metrics, self.similarity_params)
            else:
                scores = cos_scores
            matches = [
                {"path": self.index.paths[int(i)], "score": float(s)}
                for s, i in zip(scores, idx)
            ]
            matches.sort(key=lambda x: x["score"], reverse=True)
            if use_optimized_similarity:
                if matches:
                    lo = min(m["score"] for m in matches)
                    hi = max(m["score"] for m in matches)
                else:
                    lo, hi = 0, 1
                cut = lo + score_threshold * (hi - lo)
                filtered = [m for m in matches if m["score"] >= cut]
            else:
                filtered = [m for m in matches if m["score"] >= score_threshold]
            # exclusion compares REAL paths: the caller's spelling of the
            # query path ('./a/b.png', an absolute form, a symlink) rarely
            # equals the indexed string byte-for-byte
            excl_real = {os.path.realpath(p) for p in exclude_paths}
            seen, unique = set(exclude_paths), []
            for m in filtered:
                if (m["path"] not in seen
                        and os.path.realpath(m["path"]) not in excl_real):
                    seen.add(m["path"])
                    unique.append(m)
                    if len(unique) >= top_k:
                        break
            return unique[:top_k]
        finally:
            self.index.release()

    def search_with_multiple_metrics(self, text_query: str, top_k: int = 5) -> dict:
        """Per-metric rankings + intersection/unique-contribution analysis
        (reference image_search.py:144-271)."""
        logger.info(f"Multi-metric search for: {text_query}")
        text_embedding = self.generate_text_embedding(text_query)
        self.index.load()
        try:
            _, idx = self._candidates(text_embedding, top_k * 5)
            cand = self.index.get_vectors(idx)
            m = _all_metrics_rows(text_embedding, cand)
            opt = _optimized_rows(m, self.similarity_params)
            candidates = [
                {
                    "path": self.index.paths[int(i)],
                    "cosine_similarity": float(m["cosine_similarity"][r]),
                    "angular_distance": float(m["angular_distance"][r]),
                    "l1_distance": float(m["l1_distance"][r]),
                    "l2_distance": float(m["l2_distance"][r]),
                    "linf_distance": float(m["linf_distance"][r]),
                    "magnitude_difference": float(m["magnitude_difference"][r]),
                    "optimized_similarity": float(opt[r]),
                }
                for r, i in enumerate(idx)
            ]
            metric_results = {
                "cosine_similarity": sorted(
                    candidates, key=lambda x: x["cosine_similarity"], reverse=True
                )[:top_k],
                "l1_distance": sorted(candidates, key=lambda x: x["l1_distance"])[:top_k],
                "l2_distance": sorted(candidates, key=lambda x: x["l2_distance"])[:top_k],
                "linf_distance": sorted(candidates, key=lambda x: x["linf_distance"])[:top_k],
                "magnitude_difference": sorted(
                    candidates, key=lambda x: x["magnitude_difference"]
                )[:top_k],
                "optimized_similarity": sorted(
                    candidates, key=lambda x: x["optimized_similarity"], reverse=True
                )[:top_k],
            }
            metric_results["analysis"] = self._analyze_metric_results(metric_results)
            return metric_results
        finally:
            self.index.release()

    @staticmethod
    def _analyze_metric_results(metric_results: dict) -> dict:
        """Pairwise intersections + unique contributions
        (reference image_search.py:230-271)."""
        paths_by_metric = {
            metric: [r["path"] for r in results]
            for metric, results in metric_results.items()
            if metric != "analysis"
        }
        intersections = {}
        for m1 in paths_by_metric:
            for m2 in paths_by_metric:
                if m1 < m2:
                    inter = set(paths_by_metric[m1]) & set(paths_by_metric[m2])
                    intersections[f"{m1}_vs_{m2}"] = {
                        "intersection_size": len(inter),
                        "intersection_ratio": len(inter) / len(paths_by_metric[m1])
                        if paths_by_metric[m1]
                        else 0,
                        "common_items": list(inter),
                    }
        unique_contributions = {}
        for metric, paths in paths_by_metric.items():
            others = set()
            for om, op in paths_by_metric.items():
                if om != metric:
                    others.update(op)
            uniq = set(paths) - others
            unique_contributions[metric] = {
                "unique_count": len(uniq),
                "unique_ratio": len(uniq) / len(paths) if paths else 0,
                "unique_items": list(uniq),
            }
        return {
            "intersections": intersections,
            "unique_contributions": unique_contributions,
        }

    def search_batch(
        self, text_queries: List[str], top_k: int = 5
    ) -> List[List[dict]]:
        """Batched serving path: encode all queries at once, score the whole
        batch in one gallery sweep (one sweep serves every query — 14.1k QPS
        at 64 queries over 1M x 512 on one v5e chip, BENCH_r01 batched_qps)."""
        if not text_queries:
            return []
        for q in text_queries:
            if not q.strip():
                # same contract as search(): a blank query is a caller
                # error, and its zero embedding would divide to NaN rows
                raise ValueError("Text query cannot be empty")
        embs = self.encoder.encode_texts(text_queries)
        norms = np.linalg.norm(embs, axis=1, keepdims=True)
        qn = embs / np.maximum(norms, 1e-12)
        vals, idx = self.index.search(qn, top_k=min(top_k, len(self.index)))
        return [
            [
                {"path": self.index.paths[int(i)], "score": float(v)}
                for v, i in zip(vrow, irow)
            ]
            for vrow, irow in zip(vals, idx)
        ]

    def compare_search_methods(self, text_query: str, top_k: int = 5) -> dict:
        """Standard vs optimized comparison (reference image_search.py:273-308)."""
        standard = self.search(text_query, top_k, use_optimized_similarity=False)
        optimized = self.search(text_query, top_k, use_optimized_similarity=True)
        sp = [r["path"] for r in standard]
        op = [r["path"] for r in optimized]
        inter = set(sp) & set(op)
        return {
            "standard_results": standard,
            "optimized_results": optimized,
            "metrics": {
                "intersection_size": len(inter),
                "intersection_ratio": len(inter) / top_k if top_k > 0 else 0,
                "unique_to_standard": list(set(sp) - set(op)),
                "unique_to_optimized": list(set(op) - set(sp)),
            },
        }
