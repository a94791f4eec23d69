"""Interactive CLI — the terminal replacement for the reference Tkinter GUI.

The reference GUI (reference main.py:25-768) has four tabs; each maps to a
subcommand here, driving the same app facade:

  Tab 1 Search            -> `search`       (main.py:105-321)
  Tab 2 MI Analysis       -> `mi`           (main.py:323-384)
  Tab 3 Geometric MI      -> `geometric`    (main.py:386-659, incl. the
                             243-combo parameter optimization :582-639)
  Tab 4 Metric Comparison -> `compare`      (main.py:661-768)

Helpers the reference GUI calls but never defines are implemented here:
  find_optimal_threshold (main.py:353) -> ColorMIAnalyzer.f1_optimal_threshold
  interpret_mi_value     (main.py:370) -> interpret_mi_value()
and the fabricated confidence interval (main.py:551-570, sigma ~ MI/sqrt(1000))
is replaced by an honest bootstrap (mi_confidence_interval).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
from typing import Tuple

import numpy as np

logger = logging.getLogger(__name__)


def interpret_mi_value(mi: float) -> str:
    """Qualitative reading of an MI value (implements the undefined helper
    the reference GUI calls at main.py:370)."""
    if mi <= 0.0:
        return "no dependence detected"
    if mi < 0.01:
        return "negligible dependence"
    if mi < 0.05:
        return "weak dependence"
    if mi < 0.2:
        return "moderate dependence"
    if mi < 0.5:
        return "strong dependence"
    return "very strong dependence"


def mi_confidence_interval(
    values: np.ndarray,
    labels: np.ndarray,
    n_bins: int = 20,
    n_boot: int = 200,
    alpha: float = 0.05,
    seed: int = 0,
) -> Tuple[float, float]:
    """Bootstrap CI for binned MI — replaces the reference GUI's fabricated
    sigma ~ MI/sqrt(1000)*0.1 (main.py:551-570)."""
    from image_retrieval_tpu.ops.mi import mutual_info_from_labels

    rng = np.random.default_rng(seed)
    values = np.asarray(values, float)
    labels = np.asarray(labels)
    n = len(values)
    stats = np.empty(n_boot)
    for b in range(n_boot):
        idx = rng.integers(0, n, n)
        stats[b] = mutual_info_from_labels(values[idx], labels[idx], n_bins)
    lo, hi = np.quantile(stats, [alpha / 2, 1 - alpha / 2])
    return float(lo), float(hi)


def _build_app(args):
    from image_retrieval_tpu.app.pipeline import ImageSearchApp
    from image_retrieval_tpu.models.encoder import get_encoder

    encoder = get_encoder(fake=args.fake_encoder) if args.fake_encoder else None
    app = ImageSearchApp(encoder=encoder,
                         journal_dir=getattr(args, "journal_dir", None))
    if getattr(args, "fast_encoder", False) and not args.fake_encoder:
        # Measured-fastest v5e serving model (whole-layer Pallas mega-
        # kernels + int8 MXU projections, 21.0k img/s @256, cos >0.999 vs
        # f32; bench_results/r2_layer8_bench.json).
        from image_retrieval_tpu.config import vit_b32_serving

        app.config.model = vit_b32_serving()
    if getattr(args, "approx_select", False):
        # approximate candidate SET, true scores: 5.8x batched at 16M for
        # recall@10 0.9984 (bench_results/int8_tiled_probe.json) — still
        # far more exact than the reference's Milvus-IVF default
        app.config.index.approx_select = True
    if getattr(args, "ann", "exact") != "exact":
        app.config.search.ann = args.ann
        app.config.search.nlist = args.nlist
        app.config.search.nprobe = args.nprobe
        app.config.search.screen_dims = args.screen_dims
        app.config.search.screen_candidates = args.screen_candidates
    paths = app.scan_folders(args.folder)
    if not paths:
        print(f"No images found under {args.folder}", file=sys.stderr)
        sys.exit(1)
    app.process_images(paths)
    return app


def save_results_grid(results, output_path: str, thumb: int = 180) -> str:
    """Contact sheet of search hits — the terminal replacement for the GUI's
    thumbnail panel (reference main.py:274-321)."""
    from PIL import Image, ImageDraw

    n = max(len(results), 1)
    cols = min(5, n)
    rows = -(-n // cols)
    pad, caption = 8, 18
    sheet = Image.new(
        "RGB",
        (cols * (thumb + pad) + pad, rows * (thumb + caption + pad) + pad),
        (245, 245, 245),
    )
    draw = ImageDraw.Draw(sheet)
    for i, r in enumerate(results):
        x = pad + (i % cols) * (thumb + pad)
        y = pad + (i // cols) * (thumb + caption + pad)
        try:
            im = Image.open(r["path"]).convert("RGB")
            im.thumbnail((thumb, thumb))
            sheet.paste(im, (x + (thumb - im.width) // 2, y + (thumb - im.height) // 2))
        except Exception:
            draw.rectangle([x, y, x + thumb, y + thumb], outline=(200, 60, 60))
        draw.text((x, y + thumb + 2),
                  f"{r['score']:.3f} {os.path.basename(r['path'])[:24]}",
                  fill=(30, 30, 30))
    sheet.save(output_path)
    return output_path


def cmd_search(args) -> int:
    if (args.query is None) == (args.image is None):
        print("search: provide exactly one of <query> or --image PATH")
        return 2
    app = _build_app(args)
    if args.image is not None:
        results = app.find_similar_images(
            args.image, top_k=args.top_k,
            use_optimized_similarity=args.optimized,
            filter_expr=args.filter,
        )
    else:
        results = app.search_images(
            args.query, top_k=args.top_k,
            use_optimized_similarity=args.optimized,
            filter_expr=args.filter,
        )
    for i, r in enumerate(results, 1):
        print(f"{i:3d}. {r['score']:.4f}  {r['path']}")
    if args.save_grid and results:
        save_results_grid(results, args.save_grid)
        print(f"Saved results grid to {args.save_grid}")
    return 0


def cmd_mi(args) -> int:
    app = _build_app(args)
    analyzer, results = app.run_mi_analysis(num_pairs=args.num_pairs,
                                            num_bins=args.num_bins)
    if results is None:
        return 1
    print(f"Default MI: {results['default']:.4f} bits "
          f"({interpret_mi_value(results['default'])})")
    if analyzer is not None and analyzer.mi_values:
        for metric, mi in sorted(analyzer.mi_values.items(), key=lambda x: -x[1]):
            print(f"  {metric:16s} {mi:.4f} bits  ({interpret_mi_value(mi)})")
    return 0


def cmd_geometric(args) -> int:
    app = _build_app(args)
    analyzer, results = app.run_enhanced_mi_analysis(
        num_pairs=args.num_pairs, num_bins=args.num_bins, keep_unnormalized=True
    )
    if results is None:
        return 1
    print("Per-metric MI (enhanced analysis):")
    for metric, mi in sorted(results.items(), key=lambda x: -x[1]):
        print(f"  {metric:16s} {mi:.4f} bits  ({interpret_mi_value(mi)})")
    if args.plot:
        from image_retrieval_tpu.analysis.plots import mi_bar_chart

        ci = None
        if args.ci:
            numeric = np.array(
                [analyzer.label_map.get(l, -1) for l in analyzer.labels]
            )
            # distance_measures covers only the KEPT pairs; select labels
            # by the kept indices (truncation misaligns every label after
            # a dropped pair — pair_mi._pair_matrices docstring)
            kept = analyzer._pair_matrices()[4]
            ci = {}
            for metric, vals in analyzer.distance_measures.items():
                v = np.array(vals)
                labels_v = (numeric[kept[: len(v)]] if len(kept) >= len(v)
                            else numeric[: len(v)])
                ci[metric] = mi_confidence_interval(
                    v, labels_v, n_bins=args.num_bins
                )
        mi_bar_chart(results, args.plot, ci=ci,
                     title="Geometric MI Analysis (bootstrap 95% CI)" if ci
                     else "Geometric MI Analysis")
        print(f"Saved bar chart to {args.plot}")
    if args.optimize:
        grid = np.linspace(0, 1, args.grid_size)
        res = analyzer.find_optimal_parameters(
            {k: grid for k in ("w_angle", "w_l1", "w_l2", "w_inf", "w_mag")}
        )
        print(f"Optimal parameters (MI={res['mi_value']:.4f}):")
        for k, v in res["parameters"].items():
            print(f"  {k} = {v:.2f}")
        if args.apply:
            app.searcher.set_similarity_params(res["parameters"])
            print("Applied optimal parameters to searcher.")
    return 0


def cmd_compare(args) -> int:
    app = _build_app(args)
    results = app.search_with_multiple_metrics(args.query, top_k=args.top_k)
    for metric in ("cosine_similarity", "l1_distance", "l2_distance"):
        if metric in results:
            print(f"\n== {metric} ==")
            for i, r in enumerate(results[metric], 1):
                print(f"{i:3d}. {r['score']:+.4f}  {r['path']}")
    analysis = results.get("analysis", {})
    print("\n== intersections ==")
    for k, v in analysis.get("intersections", {}).items():
        print(f"  {k}: {v['intersection_size']} ({v['intersection_ratio']:.0%})")
    print("== unique contributions ==")
    for k, v in analysis.get("unique_contributions", {}).items():
        print(f"  {k}: {v['unique_count']} ({v['unique_ratio']:.0%})")
    return 0


def cmd_serve(args) -> int:
    """Interactive serving loop over the micro-batching SearchServer."""
    from image_retrieval_tpu.app.server import SearchServer

    app = _build_app(args)
    index = app._ensure_index()
    if index is None or len(index) == 0:
        print("No images produced any embeddings - nothing to serve.")
        return 1
    ann = app._ensure_ann(index)
    with SearchServer(
        app._get_encoder(), index, max_batch=args.max_batch, ann=ann,
        overfetch=app.config.search.overfetch,
    ) as server:
        print(f"Serving {len(index)} vectors. Enter queries (blank line to exit).")
        while True:
            try:
                line = input("query> ").strip()
            except EOFError:
                break
            if not line:
                break
            for i, r in enumerate(server.search(line, top_k=args.top_k), 1):
                print(f"{i:3d}. {r['score']:.4f}  {r['path']}")
        print(f"stats: {server.stats}")
    return 0


def cmd_analyze(args) -> int:
    """Full offline color-analysis pipeline (wraps app/workflow.py)."""
    from image_retrieval_tpu.app.workflow import run_workflow

    results = run_workflow(
        coco_dir=args.coco_dir,
        annotation_file=args.annotation_file,
        output_dir=args.output_dir,
        skip_dataset=args.skip_dataset,
        skip_embeddings=args.skip_embeddings,
        synthetic=args.synthetic,
        fake_encoder=args.fake_encoder,
        num_examples=args.num_examples,
    )
    if results:
        print(json.dumps(results, indent=2))
    return 0 if results else 1


def cmd_plan(args) -> int:
    """Print the measured-best index tier for a corpus size."""
    from image_retrieval_tpu.index.plan import plan_index

    plan = plan_index(
        n_rows=args.rows, dim=args.dim, n_devices=args.devices,
        recall_floor=args.recall_floor, clustered=args.clustered,
        exact_scores=args.exact_scores,
        host_to_device_gbps=args.link_gbps,
    )
    print(plan.describe())
    return 0


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="image-retrieval-tpu",
        description="TPU-native text-to-image retrieval and geometric MI analysis",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--folder", required=True, help="Image folder")
        sp.add_argument("--journal-dir", default=None,
                        help="Durable index directory: rows are recovered "
                             "from it on start and every mutation is "
                             "write-ahead logged, so live inserts survive "
                             "restarts (the Milvus WAL+volume contract the "
                             "reference gets from docker-compose.yml:11-12)")
        sp.add_argument("--fake-encoder", action="store_true",
                        help="Deterministic encoder (no CLIP weights needed)")
        sp.add_argument("--fast-encoder", action="store_true",
                        help="Serving-optimized CLIP (whole-layer Pallas "
                             "mega-kernels + int8 MXU projections; 21.0k vs "
                             "11.4k img/s on v5e, cos >0.999 vs f32 — "
                             "r2_layer8_bench.json)")
        sp.add_argument("--approx-select", action="store_true",
                        help="Approximate SELECTION on the exact sweep: "
                             "per-shard approx_max_k picks the candidate "
                             "set, scores stay exact — 5.8x batched at 16M "
                             "rows for recall@10 0.9984 "
                             "(int8_tiled_probe.json)")
        sp.add_argument("--ann", choices=("exact", "ivf", "screen"),
                        default="exact",
                        help="Candidate generation: exact sharded index "
                             "(recall 1.0; the recommendation — fastest "
                             "batched at any measured scale), on-device IVF "
                             "(Milvus IVF_FLAT analog; wins at 4M+ rows on "
                             "clustered data), or projection-screened "
                             "two-phase (int8 sketch sweep -> exact rerank; "
                             "research option for HBM-resident galleries — "
                             "measured slower than exact batched and "
                             "recall-fragile on unclustered data, see "
                             "bench_results/screen*_probe.json; its "
                             "production niche is the streamed beyond-HBM "
                             "mode on clustered corpora)")
        sp.add_argument("--nlist", type=int, default=1024,
                        help="IVF cluster count (reference "
                             "ImageEmbeddingSystem.py:56-61); 0 = auto "
                             "(measured operating point for the gallery "
                             "size, exact below the ~4M-row crossover)")
        sp.add_argument("--nprobe", type=int, default=10,
                        help="IVF clusters probed per query (reference "
                             "image_search.py:88); 0 = auto")
        sp.add_argument("--screen-dims", type=int, default=128,
                        help="ann=screen sketch width (phase-1 HBM reads "
                             "scale as screen_dims/D)")
        sp.add_argument("--screen-candidates", type=int, default=128,
                        help="ann=screen per-shard candidates reranked "
                             "exactly in phase 2")

    sp = sub.add_parser("search", help="Text search over an image folder")
    common(sp)
    sp.add_argument("query", nargs="?", default=None,
                    help="text query (omit when using --image)")
    sp.add_argument("--image", default=None,
                    help="image-query search: rank the gallery by "
                         "similarity to this image instead of a text query")
    sp.add_argument("--top-k", type=int, default=10)
    sp.add_argument("--optimized", action="store_true",
                    help="Rank with the weighted optimized similarity")
    sp.add_argument("--filter", default=None,
                    help="Boolean attribute expression (Milvus expr "
                         "analog), e.g. \"dir == 'red'\" — the facade "
                         "auto-attaches dir = parent directory name; "
                         "evaluated inside the masked device scan")
    sp.add_argument("--save-grid", help="Write a thumbnail contact sheet PNG")
    sp.set_defaults(fn=cmd_search)

    sp = sub.add_parser("mi", help="Standard MI analysis")
    common(sp)
    sp.add_argument("--num-pairs", type=int, default=1000)
    sp.add_argument("--num-bins", type=int, default=20)
    sp.set_defaults(fn=cmd_mi)

    sp = sub.add_parser("geometric", help="Geometric (multi-metric) MI analysis")
    common(sp)
    sp.add_argument("--num-pairs", type=int, default=1000)
    sp.add_argument("--num-bins", type=int, default=20)
    sp.add_argument("--optimize", action="store_true",
                    help="Run the weight grid search")
    sp.add_argument("--grid-size", type=int, default=3)
    sp.add_argument("--apply", action="store_true",
                    help="Apply optimal weights to the searcher")
    sp.add_argument("--plot", help="Write an MI bar chart PNG here")
    sp.add_argument("--ci", action="store_true",
                    help="Add bootstrap confidence intervals to the chart")
    sp.set_defaults(fn=cmd_geometric)

    sp = sub.add_parser("compare", help="Multi-metric search comparison")
    common(sp)
    sp.add_argument("query")
    sp.add_argument("--top-k", type=int, default=5)
    sp.set_defaults(fn=cmd_compare)

    sp = sub.add_parser("serve", help="Interactive micro-batched search server")
    common(sp)
    sp.add_argument("--top-k", type=int, default=10)
    sp.add_argument("--max-batch", type=int, default=64)
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser("analyze", help="Full color-analysis workflow")
    sp.add_argument("--coco_dir")
    sp.add_argument("--annotation_file")
    sp.add_argument("--output_dir", default="color_analysis")
    sp.add_argument("--skip_dataset", action="store_true")
    sp.add_argument("--skip_embeddings", action="store_true")
    sp.add_argument("--synthetic", action="store_true")
    sp.add_argument("--fake-encoder", dest="fake_encoder", action="store_true")
    sp.add_argument("--num_examples", type=int, default=5)
    sp.set_defaults(fn=cmd_analyze)

    sp = sub.add_parser(
        "plan",
        help="Pick the measured-best index tier for a corpus size "
             "(resident f32/bf16/int8/int4, streamed, offloaded IVF)")
    sp.add_argument("--rows", type=int, required=True,
                    help="corpus size in vectors")
    sp.add_argument("--dim", type=int, default=512)
    sp.add_argument("--devices", type=int, default=1,
                    help="chips in the mesh (rows shard over 'data')")
    sp.add_argument("--recall-floor", type=float, default=0.98,
                    help="min recall@10 vs the f32 oracle; 1.0 forces "
                         "exact tiers, 0.98 admits int8/int4 (measured "
                         "0.984/0.983)")
    sp.add_argument("--clustered", action="store_true",
                    help="corpus has cluster structure (gates IVF tiers; "
                         "IVF recall collapses on i.i.d. data)")
    sp.add_argument("--exact-scores", action="store_true",
                    help="require bit-faithful f32 similarity values "
                         "(e.g. MI analysis), not just top-k recall")
    sp.add_argument("--link-gbps", type=float, default=16.0,
                    help="host->device GB/s for beyond-HBM estimates")
    sp.set_defaults(fn=cmd_plan)
    return p


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    args = make_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
