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
