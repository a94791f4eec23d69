"""Analysis engine vs an sklearn/scalar oracle implementing the reference
algorithm (reference mi_analysis.py) — the MI digit-parity tests."""

import json
import os
from itertools import product

import numpy as np
import pytest
from sklearn.metrics import mutual_info_score
from sklearn.preprocessing import KBinsDiscretizer

from image_retrieval_tpu.analysis.color_mi import ColorMIAnalyzer
from image_retrieval_tpu.analysis.pair_mi import PairMIAnalysis, EnhancedPairMIAnalysis
from image_retrieval_tpu.data.dataset import prepare_color_dataset


# ---------------------------------------------------------------------------
# oracle pieces (scalar float64, sklearn binning/MI) — restating the
# reference pipeline semantics directly in the test
# ---------------------------------------------------------------------------

def oracle_metrics(v1, v2):
    v1, v2 = v1.astype(np.float64), v2.astype(np.float64)
    n1, n2 = np.linalg.norm(v1), np.linalg.norm(v2)
    cos = 0.0 if n1 == 0 or n2 == 0 else np.dot(v1, v2) / (n1 * n2)
    d = len(v1)
    diff = np.abs(v1 - v2)
    return {
        "cosine_similarity": cos,
        "cosine_distance": 1 - cos,
        "l1_distance": diff.sum() / d,
        "l2_distance": np.sqrt((diff**2).sum()) / np.sqrt(d),
        "linf_distance": diff.max(),
        "magnitude_difference": abs(n1 - n2),
    }


def oracle_mi(values, labels, n_bins=20, strategy="uniform"):
    values = np.asarray(values, np.float64)
    labels = np.asarray(labels)
    valid = ~np.isnan(values)
    values, labels = values[valid], labels[valid]
    kw = {"quantile_method": "linear"} if strategy == "quantile" else {}
    disc = KBinsDiscretizer(n_bins=n_bins, encode="ordinal", strategy=strategy, **kw)
    binned = disc.fit_transform(values.reshape(-1, 1)).astype(int).ravel()
    return mutual_info_score(binned, labels)


@pytest.fixture(scope="module")
def color_dataset(tmp_path_factory):
    """Synthetic dataset + deterministic embeddings whose geometry encodes
    category and color (so MI values are non-trivial)."""
    base = str(tmp_path_factory.mktemp("analysis") / "color_dataset")
    pairs, metadata = prepare_color_dataset(base_dir=base, num_examples=3)
    rng = np.random.default_rng(7)
    cat_dirs = {}
    col_dirs = {}
    embeddings = {}
    for m in metadata:
        c, col = m["category"], m["color"]
        if c not in cat_dirs:
            cat_dirs[c] = rng.normal(size=64)
        if col not in col_dirs:
            col_dirs[col] = rng.normal(size=64)
        e = (
            3.0 * cat_dirs[c]
            + 1.5 * col_dirs[col]
            + 0.5 * rng.normal(size=64)
        ).astype(np.float32)
        embeddings[m["path"]] = e * rng.uniform(0.8, 1.3)
    emb_file = os.path.join(os.path.dirname(base), "color_embeddings.npz")
    np.savez(emb_file, embeddings=np.array(embeddings, dtype=object))
    return base, emb_file, embeddings


def test_general_mi_matches_oracle(color_dataset):
    base, emb_file, embeddings = color_dataset
    an = ColorMIAnalyzer(base_dir=base, bin_count=20)
    ok, msg = an.load_dataset(emb_file)
    assert ok, msg
    an.calculate_distances()
    got = an.calculate_mutual_information()

    # oracle: scalar loop over the same pairs
    for metric in an.metric_names:
        all_d, all_y = [], []
        for i, rel in enumerate(an.relationship_types):
            for p1, p2 in an.pairs[rel]:
                if p1 in embeddings and p2 in embeddings:
                    all_d.append(oracle_metrics(embeddings[p1], embeddings[p2])[metric])
                    all_y.append(i)
        want = oracle_mi(all_d, all_y)
        assert got[metric] == pytest.approx(want, abs=1e-10), metric


def test_color_specific_mi_matches_oracle(color_dataset):
    base, emb_file, embeddings = color_dataset
    an = ColorMIAnalyzer(base_dir=base)
    an.load_dataset(emb_file)
    got = an.calculate_color_specific_mi()
    diff = an.pairs["same_object_diff_color"]
    same = an.pairs["same_object_same_color"]
    pairs = diff + same
    labels = [1] * len(diff) + [0] * len(same)
    for metric in an.metric_names:
        d, y = [], []
        for (p1, p2), lab in zip(pairs, labels):
            if p1 in embeddings and p2 in embeddings:
                d.append(oracle_metrics(embeddings[p1], embeddings[p2])[metric])
                y.append(lab)
        want = oracle_mi(d, y)
        assert got[metric] == pytest.approx(want, abs=1e-10), metric


def test_optimize_weights_matches_oracle_gridsearch(color_dataset):
    base, emb_file, embeddings = color_dataset
    an = ColorMIAnalyzer(base_dir=base)
    an.load_dataset(emb_file)
    got = an.optimize_weights(grid_size=2)  # 32 combos, fast oracle

    diff = an.pairs["same_object_diff_color"]
    same = an.pairs["same_object_same_color"]
    pairs = diff + same
    labels = [1] * len(diff) + [0] * len(same)
    best_mi, best = -np.inf, None
    for combo in product(np.linspace(0, 1, 2), repeat=5):
        w = dict(zip(("w_angle", "w_l1", "w_l2", "w_inf", "w_mag"), combo))
        d, y = [], []
        for (p1, p2), lab in zip(pairs, labels):
            if p1 in embeddings and p2 in embeddings:
                m = oracle_metrics(embeddings[p1], embeddings[p2])
                sim = (
                    w["w_angle"] * m["cosine_similarity"]
                    - w["w_l1"] * m["l1_distance"]
                    - w["w_l2"] * m["l2_distance"]
                    - w["w_inf"] * m["linf_distance"]
                    - w["w_mag"] * m["magnitude_difference"]
                )
                d.append(-sim)
                y.append(lab)
        mi = oracle_mi(d, y)
        if mi > best_mi:
            best_mi, best = mi, w
    assert got == pytest.approx(best)


def test_run_full_analysis_results_json(color_dataset, tmp_path):
    base, emb_file, _ = color_dataset
    out_dir = str(tmp_path / "results")
    an = ColorMIAnalyzer(base_dir=base)
    res = an.run_full_analysis(emb_file, out_dir)
    assert "error" not in res
    with open(os.path.join(out_dir, "results.json")) as f:
        saved = json.load(f)
    # schema parity (reference mi_analysis.py:1240-1260)
    assert set(saved.keys()) == {"general_mi", "color_mi", "optimal_weights"}
    assert set(saved["optimal_weights"].keys()) == {
        "w_angle", "w_l1", "w_l2", "w_inf", "w_mag"
    }
    assert set(saved["general_mi"].keys()) == set(an.metric_names)
    # artifacts
    for name in (
        "angle_distribution.png",
        "color_metrics_comparison.png",
        "precision_recall_curves.png",
        "summary.png",
        "cosine_distance_density.png",
    ):
        assert os.path.exists(os.path.join(out_dir, name)), name


def test_precision_recall_vectorized_vs_loop(color_dataset):
    base, emb_file, _ = color_dataset
    an = ColorMIAnalyzer(base_dir=base)
    an.load_dataset(emb_file)
    rng = np.random.default_rng(0)
    d = rng.uniform(0, 1, 200)
    y = rng.integers(0, 2, 200)
    th, p, r = an.precision_recall(d, y)
    # scalar loop oracle (reference mi_analysis.py:779-798)
    for t_idx in [0, 17, 50, 99]:
        t = th[t_idx]
        pred = (d <= t).astype(int)
        tp = int(((pred == 1) & (y == 1)).sum())
        fp = int(((pred == 1) & (y == 0)).sum())
        fn = int(((pred == 0) & (y == 1)).sum())
        want_p = tp / (tp + fp) if tp + fp else 0
        want_r = tp / (tp + fn) if tp + fn else 0
        assert p[t_idx] == pytest.approx(want_p)
        assert r[t_idx] == pytest.approx(want_r)


# ---------------------------------------------------------------------------
# pair-based (self-supervised) analysis
# ---------------------------------------------------------------------------


def make_embedding_list(rng, n=40, d=32):
    out = []
    for i in range(n):
        cluster = rng.normal(size=d) * 2 if i % 2 == 0 else rng.normal(size=d)
        out.append((f"img_{i}.jpg", (cluster + 0.3 * rng.normal(size=d)).astype(np.float32)))
    return out


def test_pair_generation_deterministic(rng):
    embs = make_embedding_list(rng)
    a1 = PairMIAnalysis(embs, num_pairs=30, max_comparisons=500)
    a1.generate_pairs()
    a2 = PairMIAnalysis(embs, num_pairs=30, max_comparisons=500)
    a2.generate_pairs()
    assert a1.pairs == a2.pairs
    assert a1.labels == a2.labels
    assert set(a1.labels) <= {"same_category", "same_object", "different_categories"}
    assert len(a1.pairs) > 0


def test_enhanced_mi_all_metrics_vs_oracle(rng):
    embs = make_embedding_list(rng, n=30)
    an = EnhancedPairMIAnalysis(embs, num_pairs=60, num_bins=10, max_comparisons=300)
    an.generate_pairs()
    got = an.compute_mi_for_all_metrics()
    assert set(got.keys()) == {"angular", "l1", "l2", "linf", "magnitude_diff"}
    # oracle for one metric (l1 on unnormalized)
    emb_map = dict(embs)
    d_vals, labels = [], []
    for (p1, p2), lab in zip(an.pairs, an.labels):
        v1, v2 = emb_map[p1].astype(np.float64), emb_map[p2].astype(np.float64)
        d_vals.append(np.abs(v1 - v2).sum() / len(v1))
        labels.append({"same_object": 0, "same_category": 1, "different_categories": 2}.get(lab, -1))
    want = oracle_mi(d_vals, labels, n_bins=10)
    assert got["l1"] == pytest.approx(want, abs=1e-10)


def test_enhanced_coco_pairs_and_optimize(rng):
    embs = make_embedding_list(rng, n=20)
    an = EnhancedPairMIAnalysis(embs, num_pairs=45, num_bins=10)
    an.generate_coco_pairs()
    assert "related_category" in an.labels  # reference label set
    res = an.find_optimal_parameters({k: [0.0, 1.0] for k in
                                      ("w_angle", "w_l1", "w_l2", "w_inf", "w_mag")})
    assert set(res.keys()) == {"parameters", "mi_value"}
    # direct evaluation of the winner reproduces its MI
    mi = an.compute_mi_for_optimized_similarity(res["parameters"])
    assert mi == pytest.approx(res["mi_value"], abs=1e-12)


def test_device_precision_close_to_strict(color_dataset):
    base, emb_file, _ = color_dataset
    strict = ColorMIAnalyzer(base_dir=base, precision="strict")
    strict.load_dataset(emb_file)
    dev = ColorMIAnalyzer(base_dir=base, precision="device")
    dev.load_dataset(emb_file)
    mi_s = strict.calculate_mutual_information()
    mi_d = dev.calculate_mutual_information()
    for m in strict.metric_names:
        assert mi_d[m] == pytest.approx(mi_s[m], abs=5e-3), m


def test_quantile_strategy_matches_oracle(color_dataset):
    base, emb_file, embeddings = color_dataset
    an = ColorMIAnalyzer(base_dir=base, bin_count=10, bin_strategy="quantile")
    an.load_dataset(emb_file)
    got = an.calculate_mutual_information()
    for metric in ("cosine_distance", "l2_distance"):
        all_d, all_y = [], []
        for i, rel in enumerate(an.relationship_types):
            for p1, p2 in an.pairs[rel]:
                if p1 in embeddings and p2 in embeddings:
                    all_d.append(oracle_metrics(embeddings[p1], embeddings[p2])[metric])
                    all_y.append(i)
        want = oracle_mi(all_d, all_y, n_bins=10, strategy="quantile")
        assert got[metric] == pytest.approx(want, abs=1e-10), metric


def test_pair_matrices_cache_invalidates_on_regeneration():
    """Replacing the pairs list (same length, possibly recycled id) must not
    serve stale matrices: the memo keys on a generation counter bumped by
    every pair-generating method / invalidate_pairs_cache (ADVICE r2)."""
    rng = np.random.default_rng(11)
    embs = [(f"p{i}.jpg", rng.normal(size=8)) for i in range(30)]
    an = EnhancedPairMIAnalysis(embs, num_pairs=30, num_bins=5,
                               max_comparisons=200)
    an.generate_pairs()
    A1, *_ = an._pair_matrices()
    # externally replace pairs with a same-length list of different pairs
    new_pairs = [("p0.jpg", f"p{(i % 29) + 1}.jpg")
                 for i in range(len(an.pairs))]
    an.pairs = new_pairs
    an.invalidate_pairs_cache()
    A2, B2, *_ , keep2 = an._pair_matrices()
    assert len(keep2) == len(new_pairs)
    assert np.allclose(A2, np.stack([embs[0][1]] * len(new_pairs)))
    # and generate_coco_pairs self-invalidates (no manual call needed)
    an.pairs, an.angles, an.labels = [], [], []
    an.generate_coco_pairs()
    A3, *_ = an._pair_matrices()
    assert A3.shape[0] == len(an.pairs)
