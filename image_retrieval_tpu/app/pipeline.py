"""Application facade (reference EnhancedImageSearchApp).

Mirrors the public surface of reference app_pipeline.py:14-427 — embedding
cache discovery, folder processing, text search, MI analyses — on top of the
unified sharded index instead of the in-memory dict + O(N) Python loop
(app_pipeline.py:17,155-172). Differences by design:

  * the encoder is constructed once and reused — the reference reloads the
    full CLIP checkpoint on every query (app_pipeline.py:181-183)
  * scan_folders takes a directory argument instead of opening a Tkinter
    dialog (app_pipeline.py:21-27); the CLI (app/cli.py) is the interactive
    surface
  * abs-score ranking (app_pipeline.py:167) is preserved behind
    SearchConfig.rank_by_abs (default True for parity)
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from image_retrieval_tpu.config import Config
from image_retrieval_tpu.index import ShardedVectorIndex
from image_retrieval_tpu.models.encoder import Encoder, FakeEncoder
from image_retrieval_tpu.ops import metrics as M

logger = logging.getLogger(__name__)

# Reference embedding-cache discovery list (app_pipeline.py:34-42).
EMBEDDING_CACHE_PATHS = [
    "color_embeddings.npz",
    "color_analysis/color_embeddings.npz",
    "../color_embeddings.npz",
    "embeddings.npz",
    "color_dataset/embeddings.npz",
    "~/Desktop/color_embeddings.npz",
    "~/Desktop/color_analysis/color_embeddings.npz",
]


class SimpleSearcher:
    """Similarity-params holder (reference app_pipeline.py:375-390)."""

    def __init__(self):
        from image_retrieval_tpu.config import DEFAULT_SIMILARITY_PARAMS

        self.similarity_params = dict(DEFAULT_SIMILARITY_PARAMS)

    def set_similarity_params(self, params):
        self.similarity_params.update(params)
        logger.info(f"Updated similarity parameters: {self.similarity_params}")


class ImageSearchApp:
    """Self-contained search application over local image folders."""

    def __init__(
        self,
        encoder: Optional[Encoder] = None,
        config: Optional[Config] = None,
        journal_dir: Optional[str] = None,
    ):
        """`journal_dir` makes the app's index durable (index/journal.py):
        existing rows are recovered from the directory on first use, every
        mutation is write-ahead logged, and `checkpoint()` seals the log
        into a snapshot — the Milvus WAL+volume contract the reference gets
        from its docker server (docker-compose.yml:11-12). Without it the
        index is in-memory only (mutations die with the process)."""
        self.config = config or Config()
        self.encoder = encoder  # lazy: only constructed when needed
        self.journal_dir = journal_dir
        self.embeddings: Dict[str, np.ndarray] = {}
        self.searcher = SimpleSearcher()
        self._index: Optional[ShardedVectorIndex] = None
        self._index_dirty = True
        self._ann = None  # lazily built ANN engine (config.search.ann)
        self._ann_gen = None  # (generation, ann config) the engine was built from

    # -- encoder management (no per-query reloads) ---------------------------

    def _get_encoder(self) -> Encoder:
        if self.encoder is None:
            try:
                from image_retrieval_tpu.models.encoder import CLIPEncoder

                self.encoder = CLIPEncoder(config=self.config)
            except Exception as e:
                logger.warning(f"CLIP encoder unavailable ({e}); using FakeEncoder")
                self.encoder = FakeEncoder(dim=self.config.model.embed_dim)
        return self.encoder

    # -- ingestion -----------------------------------------------------------

    def scan_folders(self, folder: str) -> List[Path]:
        """*.jpg + *.png glob (reference app_pipeline.py:21-27, sans
        Tkinter), extended to recurse into subdirectories — category trees
        like dataset/red/*.png index in one call and filtered search
        (`filter_expr="dir == 'red'"`) works on the auto-attached parent
        directory attribute."""
        p = Path(folder)
        return sorted(p.rglob("*.jpg")) + sorted(p.rglob("*.png"))

    def process_images(self, image_paths: Sequence) -> None:
        """Load cached embeddings when available, else encode
        (reference app_pipeline.py:29-90: exact-path then filename match)."""
        logger.info(f"Processing {len(image_paths)} images...")
        if self.journal_dir is not None:
            image_paths = self._recover_from_journal(image_paths)
            if not image_paths:
                logger.info("All images recovered from the journal")
                return
        embeddings_file = None
        for cand in EMBEDDING_CACHE_PATHS:
            cand = os.path.expanduser(cand)
            if os.path.exists(cand):
                embeddings_file = cand
                logger.info(f"Found embeddings file: {cand}")
                break
        if embeddings_file:
            try:
                data = np.load(embeddings_file, allow_pickle=True)
                if isinstance(data, np.lib.npyio.NpzFile) and "embeddings" in data:
                    stored = data["embeddings"].item()
                    # basename fallback (reference app_pipeline.py filename
                    # match) is only safe when the name is UNAMBIGUOUS on
                    # both sides: recursive category trees commonly repeat
                    # names (red/im1.png, blue/im1.png) and a collision
                    # would silently assign one cached embedding to every
                    # same-named file
                    from collections import Counter

                    stored_names = Counter(Path(k).name for k in stored)
                    by_name = {Path(k).name: v for k, v in stored.items()
                               if stored_names[Path(k).name] == 1}
                    scan_names = Counter(Path(str(p)).name
                                         for p in image_paths)
                    matched = 0
                    for image_path in image_paths:
                        s = str(image_path)
                        name = Path(s).name
                        if s in stored:
                            self.embeddings[s] = stored[s]
                            matched += 1
                        elif scan_names[name] == 1 and name in by_name:
                            self.embeddings[s] = by_name[name]
                            matched += 1
                    if matched > 0:
                        logger.info(f"Matched {matched}/{len(image_paths)} images")
                        self._index_dirty = True
                        return
                    logger.warning("No matching embeddings found for selected images")
            except Exception as e:
                logger.warning(f"Failed to load pre-computed embeddings: {e}")
        logger.info("Generating new embeddings...")
        self._generate_embeddings(image_paths)

    def _generate_embeddings(self, image_paths: Sequence) -> None:
        """Streamed decode -> batched encode + npz cache save
        (reference app_pipeline.py:92-134, without holding every decoded
        image in memory at once)."""
        enc = self._get_encoder()
        paths = [str(p) for p in image_paths]
        from image_retrieval_tpu.data.loader import encode_folder

        ok_paths, embs = encode_folder(
            enc, paths, batch_size=self.config.batch_size,
            size=self.config.model.image_size, use_native=False
        )
        if ok_paths:
            for p, e in zip(ok_paths, embs):
                self.embeddings[p] = e
            self._index_dirty = True
            try:
                np.savez("new_embeddings.npz",
                         embeddings=np.array(self.embeddings, dtype=object))
                logger.info("Saved new embeddings to new_embeddings.npz")
            except Exception as e:
                logger.warning(f"Failed to save embeddings: {e}")
        logger.info(f"Generated {len(self.embeddings)} embeddings")

    def _open_journaled_index(self) -> Optional[ShardedVectorIndex]:
        """Open (recovering) the journaled index once; cached thereafter."""
        import dataclasses as _dc

        if self._index is None:
            cfg = self.config.index
            if self.embeddings:
                dim = next(iter(self.embeddings.values())).shape[0]
                if cfg.embedding_dim != dim:
                    cfg = _dc.replace(cfg, embedding_dim=dim)
            self._index = ShardedVectorIndex.open(self.journal_dir, config=cfg)
            self._index_dirty = True
        return self._index

    def _recover_from_journal(self, image_paths: Sequence) -> List[str]:
        """Restart fast-path: open (recover) the journaled index, adopt the
        embeddings of rows it already holds (reconstructed unit×magnitude,
        the documented (unit, mag) schema contract), and return only the
        paths that still need encoding. A server restart over an unchanged
        folder therefore encodes nothing — Milvus likewise never re-ingests
        on reconnect (reference ImageEmbeddingSystem.py:100-137 re-runs the
        encode; the docker server keeps the rows)."""
        idx = self._open_journaled_index()
        todo = [str(p) for p in image_paths]
        if idx is None or not len(idx):
            return todo
        live = idx.live_mask()
        row_of = {p: i for i, p in enumerate(idx.paths) if live[i]}
        hit = [p for p in todo if p in row_of]
        if hit:
            rows = np.asarray([row_of[p] for p in hit])
            vecs = idx.get_vectors(rows) * idx.get_magnitudes(rows)[:, None]
            for p, v in zip(hit, np.asarray(vecs, np.float32)):
                self.embeddings[p] = v
            self._index_dirty = True
            logger.info(f"Recovered {len(hit)}/{len(todo)} images from "
                        f"journal {self.journal_dir}")
        return [p for p in todo if p not in row_of]

    @staticmethod
    def _dir_attrs(paths):
        # auto attribute: parent directory name — on the reference's
        # category/color dataset tree this makes filtered search
        # (search_images(filter_expr="dir == 'red'")) work out of the box
        return [os.path.basename(os.path.dirname(os.path.abspath(p)))
                for p in paths]

    def _ensure_index(self) -> Optional[ShardedVectorIndex]:
        if self.journal_dir is not None:
            return self._ensure_journaled_index()
        if not self.embeddings:
            return None
        if self._index is None or self._index_dirty:
            dim = next(iter(self.embeddings.values())).shape[0]
            self._index = ShardedVectorIndex(dim=dim, config=self.config.index)
            paths = list(self.embeddings.keys())
            self._index.insert(
                paths, np.stack([self.embeddings[p] for p in paths]),
                attrs={"dir": self._dir_attrs(paths)},
            )
            self._index_dirty = False
            self._ann = None  # gallery changed; rebuild IVF lists on demand
        return self._index

    def _ensure_journaled_index(self) -> Optional[ShardedVectorIndex]:
        """Durable-index variant of _ensure_index: recover rows from the
        journal directory once, then DELTA-insert embeddings whose paths
        the index does not already hold (re-running process_images after a
        restart must not duplicate recovered rows). Each delta batch is
        flushed (fsync) before returning, so an index handed to a server
        is durable from the first search onward."""
        self._open_journaled_index()
        if self._index_dirty:
            live = self._index.live_mask()
            have = {p for p, alive in zip(self._index.paths, live) if alive}
            new = [p for p in self.embeddings if p not in have]
            if new:
                self._index.insert(
                    new, np.stack([self.embeddings[p] for p in new]),
                    attrs={"dir": self._dir_attrs(new)},
                )
                self._index.flush()
                self._ann = None
            self._index_dirty = False
        return self._index if len(self._index) else None

    def checkpoint(self) -> None:
        """Seal the journal into a snapshot (bounds restart replay time).
        Requires journal_dir; no-op when the index was never built."""
        idx = self._ensure_index()
        if idx is not None:
            idx.checkpoint()

    def _ensure_ann(self, index: ShardedVectorIndex):
        """Two-phase candidate generator when configured: 'ivf' (the Milvus
        IVF_FLAT analog, reference ImageEmbeddingSystem.py:56-61) or
        'screen' (projection-screened sketch sweep, index/screen.py). Both
        expose the same search(q_unit, top_k) -> (cos, idx) contract."""
        sc = self.config.search
        if sc.ann not in ("ivf", "screen") or index is None or index.live_count == 0:
            # live_count, not len(): a fully-tombstoned gallery must fall
            # back to the exact path (which returns []) instead of crashing
            # an empty IVF build
            return None
        # staleness keys on the index's mutation generation PLUS the ann
        # configuration — generation alone misses a config flip (e.g.
        # ivf -> screen, or a changed nlist) between searches, and
        # live_count alone misses a delete+insert of equal size
        key = (index.generation, sc.ann, sc.nlist, sc.nprobe,
               sc.screen_dims, sc.screen_candidates)
        if self._ann is None or self._ann_gen != key:
            if sc.ann == "screen":
                from image_retrieval_tpu.index.screen import ScreenedSearch

                self._ann = ScreenedSearch.from_index(
                    index,
                    sketch_dims=sc.screen_dims,
                    candidates=sc.screen_candidates,
                )
                self._ann_gen = key
                return self._ann
            from image_retrieval_tpu.index.ivf import IVFIndex, recommended_ivf

            nlist, nprobe = sc.nlist, sc.nprobe
            if nlist == 0 or nprobe == 0:
                # auto: the measured operating point for this gallery size
                # (or stay exact below the ~4M-row crossover)
                rec = recommended_ivf(index.live_count)
                if rec is None:
                    return None
                nlist = nlist or rec[0]
                nprobe = nprobe or rec[1]
            self._ann = IVFIndex.from_index(
                index, nlist=min(nlist, index.live_count), nprobe=nprobe
            )
            self._ann_gen = key
        return self._ann

    # -- search --------------------------------------------------------------

    def _get_query_embedding(self, query: str) -> np.ndarray:
        """Cached-encoder text embedding (vs per-query reload,
        reference app_pipeline.py:174-191)."""
        return self._get_encoder().encode_texts([query])[0]

    def search_images(
        self, query: str, top_k: int = 10, use_optimized_similarity: bool = False,
        filter_expr: Optional[str] = None,
    ) -> List[dict]:
        """Exact search over all processed images, ranked by abs(score)
        (reference app_pipeline.py:143-172). `filter_expr` restricts rows
        by attribute expression (index/filters.py; the facade auto-attaches
        `dir` = parent directory name, so "dir == 'red'" works on a
        category/color dataset tree)."""
        logger.info(f"Searching for: '{query}' (optimized: {use_optimized_similarity})")
        index = self._ensure_index()
        if index is None:
            logger.warning("No embeddings available for search")
            return []
        q = self._get_query_embedding(query)
        return self._rank_with_embedding(
            index, q, top_k, use_optimized_similarity, filter_expr=filter_expr
        )

    def find_similar_images(
        self,
        image,
        top_k: int = 10,
        use_optimized_similarity: bool = False,
        exclude_self: bool = True,
        filter_expr: Optional[str] = None,
    ) -> List[dict]:
        """Image→image similarity over the processed gallery (beyond the
        reference, which is text-query only): encode the query image with
        the gallery's own tower, then rank with the same chain as
        search_images. A query image already in the index is dropped from
        its own results unless exclude_self=False."""
        import os as _os

        index = self._ensure_index()
        if index is None:
            logger.warning("No embeddings available for search")
            return []
        enc = self._get_encoder()
        exclude: frozenset = frozenset()
        if isinstance(image, (str, bytes)) or hasattr(image, "__fspath__"):
            path = _os.fsdecode(image)  # str(b'...') would mangle bytes
            q = enc.encode_images([path])[0]
            if exclude_self:
                exclude = frozenset({path, _os.path.abspath(path)})
        else:
            pixels = np.asarray(image)
            if pixels.ndim != 3:
                raise ValueError(
                    f"expected a path or (H, W, 3) pixels, got shape "
                    f"{pixels.shape}"
                )
            # full CLIP transform for raw arrays (fixed-size positional
            # embeddings; float inputs must not bypass normalize)
            from image_retrieval_tpu.models.preprocess import preprocess_host

            if pixels.dtype != np.uint8:
                arr = np.asarray(pixels, np.float32)
                if arr.size and float(arr.max()) <= 1.0:
                    arr = arr * 255.0
                pixels = np.clip(np.rint(arr), 0, 255).astype(np.uint8)
            q = enc.encode_pixels(preprocess_host(
                pixels, size=self.config.model.image_size)[None])[0]
        logger.info(f"Image-query search (optimized: {use_optimized_similarity})")
        return self._rank_with_embedding(
            index, np.asarray(q), top_k, use_optimized_similarity,
            exclude_paths=exclude, filter_expr=filter_expr,
        )

    def _rank_with_embedding(
        self,
        index,
        q: np.ndarray,
        top_k: int,
        use_optimized_similarity: bool,
        exclude_paths: frozenset = frozenset(),
        filter_expr: Optional[str] = None,
    ) -> List[dict]:
        """Shared ranking chain for text and image queries: ANN or exact
        candidates → optional optimized rerank → abs-ranking flag →
        tombstone/exclusion filtering → top_k."""
        k_eff = top_k + len(exclude_paths)
        metric = "optimized_similarity" if use_optimized_similarity else "cosine_similarity"
        ann = self._ensure_ann(index)
        if filter_expr is not None and ann is not None:
            # attribute filters ride the exact masked scan; the ANN tiers
            # don't see attribute columns (exact is the recommendation)
            logger.info("filter set: using the exact index, not the ANN")
            ann = None
        if ann is not None:
            # two-phase: IVF candidates (overfetched) -> exact rerank, the
            # reference's Milvus-ANN shape (image_search.py:88-107)
            from image_retrieval_tpu.app.search import ann_valid_candidates

            limit = min(k_eff * self.config.search.overfetch, len(index))
            qn = q / max(np.linalg.norm(q), 1e-12)
            cos, cand = ann_valid_candidates(ann, index, qn, limit)
            if self.config.search.rank_by_abs:
                # abs-ranking (reference app_pipeline.py:167) also surfaces
                # strongly NEGATIVE cosines; IVF candidates are descending
                # only, so probe the antipode too and take the union.
                ncos, ncand = ann_valid_candidates(ann, index, -qn, limit)
                keep = ~np.isin(ncand, cand)
                cand = np.concatenate([cand, ncand[keep]])
                cos = np.concatenate([cos, -ncos[keep]])
            if use_optimized_similarity:
                from image_retrieval_tpu.app.search import (
                    _all_metrics_rows,
                    _optimized_rows,
                )

                rows = index.get_vectors(cand) * index.get_magnitudes(cand)[:, None]
                scores = _optimized_rows(
                    _all_metrics_rows(q, rows), self.searcher.similarity_params
                )
            else:
                scores = cos
            pool = np.asarray(cand)
        else:
            scores = index.scores(
                q, metric=metric,
                params=self.searcher.similarity_params
                if use_optimized_similarity else None,
            )
            pool = None
        if self.config.search.rank_by_abs:
            rank_scores = np.abs(scores)
        else:
            rank_scores = scores
        if pool is None:
            # scores() is the full matrix incl. tombstoned rows — drop them
            # from the ranking AFTER abs() (abs(-inf) would rank first);
            # with a filter, drop the non-matching rows the same way
            mask = (index.filter_mask(filter_expr) if filter_expr is not None
                    else index.live_mask())
            rank_scores = np.where(mask, rank_scores, -np.inf)
        order = np.argsort(-rank_scores, kind="stable")[:k_eff]
        out = []
        for i in order:
            if not np.isfinite(rank_scores[i]):
                continue
            path = index.paths[int(i if pool is None else pool[int(i)])]
            if path in exclude_paths:
                continue
            out.append({"path": path, "score": float(rank_scores[i])})
            if len(out) >= top_k:
                break
        return out

    def _calculate_optimized_similarity(self, query_emb, image_emb) -> float:
        p = self.searcher.similarity_params
        m = M.pair_metrics(
            np.asarray(query_emb)[None], np.asarray(image_emb)[None],
            metrics=("cosine_similarity", "l1_distance", "l2_distance",
                     "linf_distance", "magnitude_difference"),
        )
        return float(M.optimized_similarity_from_metrics(
            {k: np.asarray(v)[0] for k, v in m.items()}, p
        ))

    # -- MI analyses (reference app_pipeline.py:200-240) ----------------------

    def run_mi_analysis(self, num_pairs: int = 1000, num_bins: int = 20):
        if not self.embeddings:
            logger.warning("No embeddings available for MI analysis")
            return None, None
        from image_retrieval_tpu.analysis.pair_mi import EnhancedPairMIAnalysis

        embeddings_list = list(self.embeddings.items())
        analyzer = EnhancedPairMIAnalysis(embeddings_list, num_pairs, num_bins)
        analyzer.generate_pairs()
        mi_results = analyzer.compute_mi_for_all_metrics()
        default_mi = max(mi_results.values()) if mi_results else 0.0
        return analyzer, {"default": default_mi}

    def run_enhanced_mi_analysis(
        self, num_pairs: int = 1000, num_bins: int = 20, keep_unnormalized: bool = True
    ):
        if not self.embeddings:
            logger.warning("No embeddings available for enhanced MI analysis")
            return None, None
        from image_retrieval_tpu.analysis.pair_mi import EnhancedPairMIAnalysis

        embeddings_list = list(self.embeddings.items())
        max_pairs = min(num_pairs, 1000)  # reference cap (app_pipeline.py:230)
        analyzer = EnhancedPairMIAnalysis(
            embeddings_list, max_pairs, num_bins, keep_unnormalized
        )
        analyzer.generate_pairs()
        mi_results = analyzer.compute_mi_for_all_metrics()
        logger.info(f"MI analysis complete. Results: {mi_results}")
        return analyzer, mi_results

    def run_enhanced_mi_analysis_coco(
        self, num_pairs: int = 1000, num_bins: int = 20, keep_unnormalized: bool = True
    ):
        """COCO-pair variant (the orphaned module-level function in the
        reference, app_pipeline.py:403-427, attached properly here)."""
        if not self.embeddings:
            return None, None
        from image_retrieval_tpu.analysis.pair_mi import EnhancedPairMIAnalysis

        embeddings_list = list(self.embeddings.items())
        n = len(embeddings_list)
        max_pairs = min(num_pairs, n * (n - 1) // 2)
        analyzer = EnhancedPairMIAnalysis(
            embeddings_list, max_pairs, num_bins, keep_unnormalized
        )
        analyzer.generate_coco_pairs()
        return analyzer, analyzer.compute_mi_for_all_metrics()

    # -- visual placeholders (reference app_pipeline.py:242-276) --------------

    def create_mi_visualization(self, filename: str) -> str:
        return self._placeholder_plot(filename, "Standard MI Analysis")

    def create_enhanced_mi_visualization(self, filename: str) -> str:
        return self._placeholder_plot(filename, "Enhanced MI Analysis")

    def _placeholder_plot(self, filename: str, title: str) -> str:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(8, 6))
        if self.embeddings:
            plt.text(0.5, 0.5,
                     f"{title}\nEmbeddings loaded: {len(self.embeddings)}\n"
                     "Run analysis to see results",
                     ha="center", va="center", fontsize=12)
        else:
            plt.text(0.5, 0.5, f"{title}\nNo embeddings loaded",
                     ha="center", va="center", fontsize=14)
        plt.title(title)
        plt.axis("off")
        plt.savefig(filename, dpi=150, bbox_inches="tight")
        plt.close()
        return filename

    # -- multi-metric search (reference app_pipeline.py:278-372) ---------------

    def search_with_multiple_metrics(self, query: str, top_k: int = 5) -> dict:
        # index-based guard (not self.embeddings): after a journaled
        # restart the rows live in the recovered index while the
        # embeddings dict is empty — search_images already works there
        # and this surface must too (r5 review)
        index = self._ensure_index()
        if index is None or len(index) == 0:
            return {"analysis": {"intersections": {}, "unique_contributions": {}}}
        q = self._get_query_embedding(query)
        paths = index.paths
        # one gallery pass for every metric (multi_metric_topk masks
        # tombstones and fetches only top_k entries — the old form ran
        # three full scores() sweeps and shipped three (count,) matrices)
        mm = index.multi_metric_topk(q, top_k=top_k)

        def top_entries(key, negate):
            vals, idx = mm[key]
            vals = np.atleast_2d(np.asarray(vals))[0]
            idx = np.atleast_2d(np.asarray(idx))[0]
            return [
                {"path": paths[int(i)], key: float(v),
                 "score": float(-v if negate else v)}
                for v, i in zip(vals, idx)
                if i >= 0 and np.isfinite(v)
            ]

        results = {
            "cosine_similarity": top_entries("cosine_similarity", negate=False),
            "l1_distance": top_entries("l1_distance", negate=True),
            "l2_distance": top_entries("l2_distance", negate=True),
        }
        cp = set(r["path"] for r in results["cosine_similarity"])
        p1 = set(r["path"] for r in results["l1_distance"])
        p2 = set(r["path"] for r in results["l2_distance"])
        denom = top_k if top_k > 0 else 1
        intersections = {
            "cosine_vs_l1": {"intersection_size": len(cp & p1),
                             "intersection_ratio": len(cp & p1) / denom},
            "cosine_vs_l2": {"intersection_size": len(cp & p2),
                             "intersection_ratio": len(cp & p2) / denom},
            "l1_vs_l2": {"intersection_size": len(p1 & p2),
                         "intersection_ratio": len(p1 & p2) / denom},
        }
        allp = cp | p1 | p2
        na = len(allp) if allp else 1
        unique_contributions = {
            "cosine_similarity": {"unique_count": len(cp - p1 - p2),
                                  "unique_ratio": len(cp - p1 - p2) / na},
            "l1_distance": {"unique_count": len(p1 - cp - p2),
                            "unique_ratio": len(p1 - cp - p2) / na},
            "l2_distance": {"unique_count": len(p2 - cp - p1),
                            "unique_ratio": len(p2 - cp - p1) / na},
        }
        results["analysis"] = {
            "intersections": intersections,
            "unique_contributions": unique_contributions,
        }
        return results


def run_color_analysis(embeddings_file: str, dataset_dir: str, results_dir: str):
    """Compatibility entry (reference app_pipeline.py:393-400)."""
    from image_retrieval_tpu.analysis.color_mi import analyze_color_embeddings

    return analyze_color_embeddings(embeddings_file, dataset_dir, results_dir)
