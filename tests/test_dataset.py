"""Dataset builder: color extraction, pair generation, schema contracts."""

import json
import numpy as np
import pandas as pd
import pytest

from image_retrieval_tpu.data.color import (
    classify_rgb,
    dominant_colors_batch,
    extract_dominant_color,
)
from image_retrieval_tpu.data.dataset import (
    ColorDatasetManager,
    prepare_color_dataset,
)
from image_retrieval_tpu.data.synthetic import synth_image


def test_classify_rgb_reference_thresholds():
    assert classify_rgb(220, 210, 205) == "white"
    assert classify_rgb(30, 40, 50) == "black"
    assert classify_rgb(150, 80, 40) == "brown"
    assert classify_rgb(100, 150, 200) == "other"
    # boundary semantics: strict inequalities as in the reference
    assert classify_rgb(200, 200, 200) == "other"
    assert classify_rgb(60, 60, 60) == "other"


def test_dominant_color_solid_images():
    imgs = [
        np.full((64, 64, 3), c, np.uint8)
        for c in [(235, 235, 235), (20, 20, 20), (139, 69, 19), (90, 140, 220)]
    ]
    got = dominant_colors_batch(imgs)
    assert got == ["white", "black", "brown", "other"]
    # mean fallback agrees on solid images
    assert dominant_colors_batch(imgs, method="mean") == ["white", "black", "brown", "other"]


def test_dominant_color_majority_cluster():
    # 3/4 brown, 1/4 white -> brown must win
    img = np.full((64, 64, 3), (139, 69, 19), np.uint8)
    img[:16, :, :] = (250, 250, 250)
    assert extract_dominant_color(img) == "brown"


def test_synth_images_have_right_dominant_color():
    for ci in range(10):
        for color in ("brown", "white", "black"):
            im = synth_image(ci, color, 0)
            assert im.size == (224, 224)


def test_pair_generation_counts(tmp_path):
    m = ColorDatasetManager(str(tmp_path / "ds"), num_examples=2)
    # 2 categories x 2 colors x 2 examples, built synthetically
    m.categories = ["dog", "cat"]
    m.colors = ["brown", "white"]
    m.create_synthetic()
    pairs = m.generate_relationship_pairs()
    # same/same: C(2,2)=1 per bucket x 4 buckets
    assert len(pairs["same_object_same_color"]) == 4
    # same obj diff color: 2 cats x (2x2 path combos) = 8
    assert len(pairs["same_object_diff_color"]) == 8
    # diff obj same color: 2 colors x (2x2) = 8
    assert len(pairs["diff_object_same_color"]) == 8
    # diff obj diff color: 1 cat pair x 2 color perms x 4 = 8
    assert len(pairs["diff_object_diff_color"]) == 8
    # determinism
    pairs2 = m.generate_relationship_pairs()
    assert pairs == pairs2


def test_prepare_color_dataset_schema(tmp_path):
    base = str(tmp_path / "color_dataset")
    pairs, metadata = prepare_color_dataset(base_dir=base, num_examples=2)
    # metadata.csv schema (reference imageProcessing.py:389-394)
    df = pd.read_csv(base + "/metadata.csv")
    assert list(df.columns) == ["path", "category", "color", "original_id", "original_path"]
    assert len(df) == 10 * 3 * 2
    # pairs.json: relative paths, 4 relationship types
    with open(base + "/pairs.json") as f:
        saved = json.load(f)
    assert set(saved.keys()) == {
        "same_object_same_color",
        "same_object_diff_color",
        "diff_object_same_color",
        "diff_object_diff_color",
    }
    p1, p2 = saved["same_object_same_color"][0]
    assert not p1.startswith(base)  # relative
    import os
    assert os.path.exists(os.path.join(base, p1))


def make_mini_coco(tmp_path, rng):
    """Tiny COCO-format dataset: images + annotation JSON."""
    import json as _json
    from PIL import Image

    img_dir = tmp_path / "coco"
    img_dir.mkdir(exist_ok=True)
    images, annotations = [], []
    categories = [{"id": 1, "name": "dog"}, {"id": 2, "name": "cat"},
                  {"id": 3, "name": "zebra"}]
    colors = {"brown": (139, 69, 19), "white": (235, 235, 235),
              "black": (25, 25, 25), "other": (90, 140, 220)}
    spec = [
        (1, "dog", "brown"), (2, "dog", "brown"), (3, "dog", "white"),
        (4, "cat", "black"), (5, "cat", "other"), (6, "zebra", "brown"),
    ]
    for img_id, cat, color in spec:
        fname = f"{img_id:012d}.jpg"
        Image.new("RGB", (64, 64), colors[color]).save(img_dir / fname)
        images.append({"id": img_id, "file_name": fname})
        cat_id = {"dog": 1, "cat": 2, "zebra": 3}[cat]
        annotations.append({"image_id": img_id, "category_id": cat_id})
    ann_file = tmp_path / "instances.json"
    with open(ann_file, "w") as f:
        _json.dump({"images": images, "annotations": annotations,
                    "categories": categories}, f)
    return str(img_dir), str(ann_file), spec


def test_filter_coco_images(tmp_path, rng):
    """COCO filtering: category mapping, color classification, quota, copy,
    metadata schema (reference imageProcessing.py:122-216)."""
    img_dir, ann_file, spec = make_mini_coco(tmp_path, rng)
    m = ColorDatasetManager(str(tmp_path / "out"), num_examples=2)
    m.filter_coco_images(img_dir, ann_file)
    got = {(r["category"], r["color"]) for r in m.metadata}
    # dog brown x2 within quota; dog white; cat black. cat 'other' color and
    # 'zebra' (not in the 10 categories) must be excluded.
    assert ("dog", "brown") in got and ("dog", "white") in got
    assert ("cat", "black") in got
    assert not any(cat == "zebra" for cat, _ in got)
    assert not any(color == "other" for _, color in got)
    assert sum(1 for r in m.metadata if (r["category"], r["color"]) == ("dog", "brown")) == 2
    import os
    for r in m.metadata:
        assert os.path.exists(r["path"])
        assert set(r.keys()) == {"path", "category", "color", "original_id",
                                 "original_path"}


def test_filter_coco_respects_quota(tmp_path, rng):
    img_dir, ann_file, spec = make_mini_coco(tmp_path, rng)
    m = ColorDatasetManager(str(tmp_path / "out1"), num_examples=1)
    m.filter_coco_images(img_dir, ann_file)
    assert sum(1 for r in m.metadata
               if (r["category"], r["color"]) == ("dog", "brown")) == 1
