"""Golden regression: full analysis pipeline output frozen on fixed inputs.

Any change to metric math, binning, MI, pair generation, or the weight grid
search that shifts results.json will trip this test. The golden values were
produced by the host-f64 strict pipeline, cross-validated against the
sklearn/scalar oracles in tests/test_analysis.py.
"""

import json

import numpy as np
import pytest

from image_retrieval_tpu.analysis.color_mi import ColorMIAnalyzer
from image_retrieval_tpu.data.dataset import prepare_color_dataset


def build_fixture(tmp_path):
    base = str(tmp_path / "color_dataset")
    pairs, metadata = prepare_color_dataset(base_dir=base, num_examples=2)
    rng = np.random.default_rng(123)
    cat_dirs, col_dirs, embeddings = {}, {}, {}
    for m in metadata:
        c, col = m["category"], m["color"]
        cat_dirs.setdefault(c, rng.normal(size=32))
        col_dirs.setdefault(col, rng.normal(size=32))
        e = (2.5 * cat_dirs[c] + 1.2 * col_dirs[col] + 0.4 * rng.normal(size=32))
        embeddings[m["path"]] = (e * rng.uniform(0.9, 1.2)).astype(np.float32)
    emb_file = str(tmp_path / "emb.npz")
    np.savez(emb_file, embeddings=np.array(embeddings, dtype=object))
    return base, emb_file


def test_full_analysis_golden(tmp_path):
    base, emb_file = build_fixture(tmp_path)
    an = ColorMIAnalyzer(base_dir=base, bin_count=12)
    res = an.run_full_analysis(emb_file, str(tmp_path / "out"), make_plots=False)
    assert "error" not in res
    got = res["results"]

    # Frozen golden values (host-f64 strict pipeline, seed 123 fixture).
    golden_general = {
        "cosine_distance": 0.42823183054288483,
        "l1_distance": 0.3869018199200071,
        "l2_distance": 0.3933707314979954,
        "linf_distance": 0.3203462816014803,
        "magnitude_difference": 0.016473780917383715,
    }
    golden_color = {
        "cosine_distance": 0.5004024235381876,
        "l1_distance": 0.5004024235381879,
        "l2_distance": 0.5004024235381876,
        "linf_distance": 0.5004024235381874,
        "magnitude_difference": 0.05808327022027901,
    }
    golden_weights = {"w_angle": 0.0, "w_l1": 0.5, "w_l2": 0.0,
                      "w_inf": 0.0, "w_mag": 0.0}
    for k, v in golden_general.items():
        assert got["general_mi"][k] == pytest.approx(v, abs=1e-9), (
            "general", k, got["general_mi"])
    for k, v in golden_color.items():
        assert got["color_mi"][k] == pytest.approx(v, abs=1e-9), (
            "color", k, got["color_mi"])
    assert got["optimal_weights"] == pytest.approx(golden_weights)
