"""Direct parity vs the ORIGINAL reference implementation.

These tests import the actual reference modules from /root/reference/src
(read-only; available in the build environment) and assert our TPU-native
re-implementations produce identical numbers on identical inputs. They are
skipped automatically where the reference tree isn't mounted — the
oracle-based tests (test_analysis.py etc.) cover the same semantics
standalone.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)

if os.path.isdir(REF):
    os.environ.setdefault("MPLBACKEND", "Agg")
    sys.path.insert(0, REF)


@pytest.fixture(scope="module")
def ref_metrics():
    from geometric_metrics import GeometricSimilarityMetrics  # reference import

    return GeometricSimilarityMetrics


def test_all_metrics_match_reference_exactly(ref_metrics, rng):
    from image_retrieval_tpu.analysis.color_mi import _pair_metric_table

    a = rng.normal(size=(20, 64)).astype(np.float64) * 3
    b = rng.normal(size=(20, 64)).astype(np.float64) * 2
    ours = _pair_metric_table(a, b)
    for i in range(20):
        ref = ref_metrics.get_all_metrics(a[i], b[i])
        for name, want in ref.items():
            assert ours[name][i] == pytest.approx(float(want), rel=1e-12, abs=1e-12), name


def test_optimized_similarity_matches_reference(ref_metrics, rng):
    from image_retrieval_tpu.analysis.color_mi import _pair_metric_table

    params = {"w_angle": 0.7, "w_l1": 0.3, "w_l2": 0.9, "w_inf": 0.2, "w_mag": 0.5}
    a = rng.normal(size=(10, 32)).astype(np.float64)
    b = rng.normal(size=(10, 32)).astype(np.float64)
    t = _pair_metric_table(a, b)
    ours = (
        params["w_angle"] * t["cosine_similarity"]
        - params["w_l1"] * t["l1_distance"]
        - params["w_l2"] * t["l2_distance"]
        - params["w_inf"] * t["linf_distance"]
        - params["w_mag"] * t["magnitude_difference"]
    )
    for i in range(10):
        want = ref_metrics.optimized_similarity(a[i], b[i], params)
        assert ours[i] == pytest.approx(float(want), rel=1e-12, abs=1e-12)


@pytest.fixture(scope="module")
def shared_dataset(tmp_path_factory):
    """One synthetic dataset + embeddings used by both implementations."""
    from image_retrieval_tpu.data.dataset import prepare_color_dataset

    base = str(tmp_path_factory.mktemp("refparity") / "color_dataset")
    pairs, metadata = prepare_color_dataset(base_dir=base, num_examples=2)
    rng = np.random.default_rng(99)
    cat_dirs, col_dirs, embeddings = {}, {}, {}
    for m in metadata:
        cat_dirs.setdefault(m["category"], rng.normal(size=48))
        col_dirs.setdefault(m["color"], rng.normal(size=48))
        e = 2.0 * cat_dirs[m["category"]] + col_dirs[m["color"]] + 0.3 * rng.normal(size=48)
        embeddings[m["path"]] = (e * rng.uniform(0.9, 1.1)).astype(np.float32)
    emb_file = base + "_embeddings.npz"
    np.savez(emb_file, embeddings=np.array(embeddings, dtype=object))
    return base, emb_file


def test_color_mi_pipeline_matches_reference(shared_dataset):
    """General MI, color MI, and the weight grid search vs the reference's
    ColorMIAnalyzer running the identical inputs."""
    import mi_analysis as ref_mi  # reference import

    from image_retrieval_tpu.analysis.color_mi import ColorMIAnalyzer

    base, emb_file = shared_dataset

    ref = ref_mi.ColorMIAnalyzer(base_dir=base, bin_count=14)
    ok, msg = ref.load_dataset(emb_file)
    assert ok, msg
    ref.calculate_distances()
    ref_general = ref.calculate_mutual_information()
    ref_color = ref.calculate_color_specific_mi()
    ref_weights = ref.optimize_weights(grid_size=2)

    ours = ColorMIAnalyzer(base_dir=base, bin_count=14)
    ok, msg = ours.load_dataset(emb_file)
    assert ok, msg
    ours.calculate_distances()
    our_general = ours.calculate_mutual_information()
    our_color = ours.calculate_color_specific_mi()
    our_weights = ours.optimize_weights(grid_size=2)

    for m, want in ref_general.items():
        assert our_general[m] == pytest.approx(want, rel=1e-9, abs=1e-12), ("general", m)
    for m, want in ref_color.items():
        assert our_color[m] == pytest.approx(want, rel=1e-9, abs=1e-12), ("color", m)
    assert our_weights == pytest.approx(ref_weights)


def test_enhanced_mi_matches_reference(rng):
    """Pair sampling (RNG sequence), labels, and per-metric MI vs the
    reference EnhancedMIAnalysis on identical embeddings."""
    import mi_analysis as ref_mi  # reference import

    from image_retrieval_tpu.analysis.pair_mi import EnhancedPairMIAnalysis

    embs = []
    for i in range(24):
        v = rng.normal(size=32).astype(np.float64) * (1 + (i % 3))
        embs.append((f"img_{i}.jpg", v))

    ref = ref_mi.EnhancedMIAnalysis(list(embs), num_pairs=30, num_bins=8,
                                    keep_unnormalized=True)
    ref.generate_pairs()
    ref_values = ref.compute_mi_for_all_metrics()

    ours = EnhancedPairMIAnalysis(list(embs), num_pairs=30, num_bins=8,
                                  keep_unnormalized=True)
    ours.generate_pairs()
    our_values = ours.compute_mi_for_all_metrics()

    assert ours.pairs == ref.pairs
    assert ours.labels == ref.labels
    for m, want in ref_values.items():
        assert our_values[m] == pytest.approx(want, rel=1e-9, abs=1e-12), m


def test_relationship_pairs_match_reference(tmp_path):
    """Pair enumeration vs the reference ColorDatasetManager given identical
    metadata (excluding diff_object_diff_color, whose reference ordering is
    Python-set/hash dependent — COMPAT.md divergence #8; we compare it as a
    set)."""
    import imageProcessing as ref_ip  # reference import

    from image_retrieval_tpu.data.dataset import ColorDatasetManager

    ours = ColorDatasetManager(str(tmp_path / "ds"), num_examples=2)
    ours.categories = ["dog", "cat", "car"]
    ours.colors = ["brown", "white"]
    ours.create_synthetic()

    ref = ref_ip.ColorDatasetManager(str(tmp_path / "ref_ds"))
    ref.categories = list(ours.categories)
    ref.colors = list(ours.colors)
    ref.metadata = [dict(m) for m in ours.metadata]

    ref_pairs = ref.generate_relationship_pairs()
    our_pairs = ours.generate_relationship_pairs()
    for rel in ("same_object_same_color", "same_object_diff_color",
                "diff_object_same_color"):
        assert our_pairs[rel] == [tuple(p) for p in ref_pairs[rel]], rel
    # Reference enumerates category pairs in Python-set order, which can flip
    # (cat1, cat2) direction run to run — compare as unordered pairs.
    assert {frozenset(p) for p in our_pairs["diff_object_diff_color"]} == {
        frozenset(p) for p in ref_pairs["diff_object_diff_color"]
    }


# -- COCO-ingestion parity (reference imageProcessing.py:122-216, :508-571) --


_COLOR_RGB = {
    "white": (250, 250, 250),
    "black": (15, 15, 15),
    "brown": (160, 60, 30),
    "other": (40, 160, 220),
}


def _write_tricolor_jpeg(path, dominant, rng):
    """32x32 JPEG: 70% of rows the dominant color, 15% each of two others.
    Contiguous blocks + subsampling=0 keep the three pixel clusters crisp, so
    sklearn KMeans and our JAX KMeans find the same dominant cluster."""
    from PIL import Image

    minors = [c for c in _COLOR_RGB if c != dominant][:2]
    arr = np.zeros((32, 32, 3), np.uint8)
    arr[:22] = _COLOR_RGB[dominant]
    arr[22:27] = _COLOR_RGB[minors[0]]
    arr[27:] = _COLOR_RGB[minors[1]]
    Image.fromarray(arr).save(path, quality=100, subsampling=0)


def _make_coco_tree(root):
    """Synthetic COCO-format tree: images + annotation JSON, including the
    edge cases the reference handles (multi-annotation images use the first
    matching category; unknown categories are ignored; missing files skip)."""
    import json as _json

    img_dir = root / "val2017"
    img_dir.mkdir()
    rng = np.random.default_rng(7)
    cats = ["dog", "car", "chair", "zebra"]  # zebra not in the manager's list
    cat_ids = {c: i + 1 for i, c in enumerate(cats)}
    images, annotations = [], []
    img_id, ann_id = 1, 1

    def add(cat_names, dominant, write_file=True):
        nonlocal img_id, ann_id
        fname = f"{img_id:012d}.jpg"
        if write_file:
            _write_tricolor_jpeg(str(img_dir / fname), dominant, rng)
        images.append({"id": img_id, "file_name": fname})
        for c in cat_names:
            annotations.append(
                {"id": ann_id, "image_id": img_id, "category_id": cat_ids[c]}
            )
            ann_id += 1
        img_id += 1

    for cat in ("dog", "car", "chair"):
        for color in ("white", "black", "brown", "other"):
            for _ in range(2):
                add([cat], color)
    add(["dog", "car"], "white")  # first matching category (dog) wins
    add(["zebra"], "white")  # unknown category: never a candidate
    add(["car"], "brown", write_file=False)  # missing file: warned + skipped

    ann = {
        "images": images,
        "categories": [{"id": i, "name": c} for c, i in cat_ids.items()],
        "annotations": annotations,
    }
    ann_path = root / "instances.json"
    with open(ann_path, "w") as f:
        _json.dump(ann, f)
    return str(img_dir), str(ann_path)


def test_coco_ingestion_matches_reference(tmp_path):
    """Full step-1 parity: reference prepare_color_dataset vs ours on the
    SAME synthetic COCO tree — identical selected images, metadata.csv rows,
    and pairs.json (reference imageProcessing.py:122-216 + :508-571)."""
    import json as _json

    import pandas as pd

    import imageProcessing as ref_ip  # reference import

    from image_retrieval_tpu.data.dataset import prepare_color_dataset

    coco_dir, ann_file = _make_coco_tree(tmp_path)
    ref_base = str(tmp_path / "ref_out")
    our_base = str(tmp_path / "our_out")

    ref_pairs, ref_meta = ref_ip.prepare_color_dataset(coco_dir, ann_file, ref_base)
    our_pairs, our_meta = prepare_color_dataset(coco_dir, ann_file, our_base)

    def relativize(meta, base):
        out = []
        for m in meta:
            m = dict(m)
            m["path"] = os.path.relpath(m["path"], base)
            out.append(m)
        return out

    assert relativize(our_meta, our_base) == relativize(ref_meta, ref_base)
    # 3 cats x 3 matching colors x 2, +1 multi-annotation white dog
    # ("other"-colored images drop; the missing file and zebra image drop)
    assert len(our_meta) == 19

    # metadata.csv: identical rows modulo the base-dir prefix
    ref_df = pd.read_csv(os.path.join(ref_base, "metadata.csv"))
    our_df = pd.read_csv(os.path.join(our_base, "metadata.csv"))
    for df, base in ((ref_df, ref_base), (our_df, our_base)):
        df["path"] = df["path"].map(lambda p: os.path.relpath(p, base))
    pd.testing.assert_frame_equal(our_df, ref_df)

    # identical copied file tree
    def tree(base):
        out = set()
        for dirpath, _, files in os.walk(base):
            for fn in files:
                if fn.endswith(".jpg"):
                    out.add(os.path.relpath(os.path.join(dirpath, fn), base))
        return out

    assert tree(our_base) == tree(ref_base)

    # pairs.json: exact for the order-stable relations, set-equal for the one
    # the reference enumerates in Python-set order (COMPAT.md divergence #8)
    with open(os.path.join(ref_base, "pairs.json")) as f:
        ref_json = _json.load(f)
    with open(os.path.join(our_base, "pairs.json")) as f:
        our_json = _json.load(f)
    assert set(our_json) == set(ref_json)
    for rel in ("same_object_same_color", "same_object_diff_color",
                "diff_object_same_color"):
        assert our_json[rel] == ref_json[rel], rel
    assert {frozenset(map(tuple, p)) for p in our_json["diff_object_diff_color"]} == {
        frozenset(map(tuple, p)) for p in ref_json["diff_object_diff_color"]
    }
