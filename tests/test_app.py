"""App layer: embed system, searcher, facade, CLI, end-to-end workflow."""

import json
import os

import numpy as np
import pytest

from image_retrieval_tpu.app.embed import ImageEmbeddingSystem
from image_retrieval_tpu.app.search import TextImageSearcher
from image_retrieval_tpu.app.pipeline import ImageSearchApp, SimpleSearcher
from image_retrieval_tpu.app.cli import interpret_mi_value, main as cli_main
from image_retrieval_tpu.config import Config, IndexConfig
from image_retrieval_tpu.index import ShardedVectorIndex
from image_retrieval_tpu.models.encoder import FakeEncoder


@pytest.fixture(scope="module")
def image_folder(tmp_path_factory):
    from image_retrieval_tpu.data.synthetic import synth_image

    folder = tmp_path_factory.mktemp("images")
    for ci in range(4):
        for v, color in enumerate(("brown", "white", "black")):
            synth_image(ci, color, v).save(folder / f"img_{ci}_{color}.jpg")
    return str(folder)


@pytest.fixture(scope="module")
def loaded_system(image_folder):
    enc = FakeEncoder(dim=512)
    idx = ShardedVectorIndex(dim=512, config=IndexConfig(capacity_step=64))
    sys_ = ImageEmbeddingSystem(enc, idx)
    paths = sorted(
        os.path.join(image_folder, f) for f in os.listdir(image_folder)
    )
    ok, failed = sys_.process_and_store_images(paths)
    assert ok == 12 and failed == 0
    return sys_, paths


def test_embed_roundtrip(loaded_system):
    sys_, paths = loaded_system
    stored = sys_.get_embeddings_with_magnitude(limit=100)
    assert len(stored) == 12
    p, e, m = stored[0]
    assert abs(np.linalg.norm(e) - 1.0) < 1e-5  # unit vectors stored
    rec = sys_.reconstruct_original_embeddings(limit=100)
    enc_direct = sys_.encoder.encode_images([p])[0]
    np.testing.assert_allclose(rec[0][1], enc_direct, rtol=1e-4, atol=1e-4)


def test_embed_skips_bad_files(tmp_path, loaded_system):
    enc = FakeEncoder(dim=512)
    sys_ = ImageEmbeddingSystem(enc, ShardedVectorIndex(dim=512, config=IndexConfig(capacity_step=64)))
    bad = tmp_path / "not_an_image.jpg"
    bad.write_text("junk")
    from image_retrieval_tpu.data.synthetic import synth_image

    good = tmp_path / "good.jpg"
    synth_image(0, "brown", 0).save(good)
    ok, failed = sys_.process_and_store_images([str(bad), str(good)])
    assert ok == 1 and failed == 1


def test_searcher_standard_and_optimized(loaded_system):
    sys_, paths = loaded_system
    searcher = TextImageSearcher(sys_.encoder, sys_.index)
    res = searcher.search("brown dog", top_k=5, score_threshold=-10.0)
    assert len(res) == 5
    assert all(set(r.keys()) == {"path", "score"} for r in res)
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)
    searcher.set_similarity_params(
        {"w_angle": 1.0, "w_l1": 0.5, "w_l2": 0.5, "w_inf": 0.0, "w_mag": 0.1}
    )
    res_opt = searcher.search("brown dog", top_k=5, score_threshold=0.0,
                              use_optimized_similarity=True)
    assert len(res_opt) >= 1


def test_searcher_threshold_filtering(loaded_system):
    sys_, _ = loaded_system
    searcher = TextImageSearcher(sys_.encoder, sys_.index)
    res = searcher.search("query", top_k=12, score_threshold=1e9)
    assert res == []  # nothing passes an absurd threshold


def test_searcher_multi_metric_structure(loaded_system):
    sys_, _ = loaded_system
    searcher = TextImageSearcher(sys_.encoder, sys_.index)
    out = searcher.search_with_multiple_metrics("white cat", top_k=3)
    for key in ("cosine_similarity", "l1_distance", "l2_distance", "linf_distance",
                "magnitude_difference", "optimized_similarity", "analysis"):
        assert key in out
    # distances ascend, similarities descend
    l2 = [r["l2_distance"] for r in out["l2_distance"]]
    assert l2 == sorted(l2)
    cos = [r["cosine_similarity"] for r in out["cosine_similarity"]]
    assert cos == sorted(cos, reverse=True)
    ana = out["analysis"]
    assert "intersections" in ana and "unique_contributions" in ana
    some_key = next(iter(ana["intersections"]))
    assert set(ana["intersections"][some_key].keys()) == {
        "intersection_size", "intersection_ratio", "common_items"
    }


def test_compare_search_methods(loaded_system):
    sys_, _ = loaded_system
    searcher = TextImageSearcher(sys_.encoder, sys_.index)
    cmp = searcher.compare_search_methods("black bird", top_k=3)
    assert set(cmp.keys()) == {"standard_results", "optimized_results", "metrics"}
    assert set(cmp["metrics"].keys()) == {
        "intersection_size", "intersection_ratio",
        "unique_to_standard", "unique_to_optimized",
    }


def test_app_facade_search(image_folder):
    app = ImageSearchApp(encoder=FakeEncoder(dim=512))
    paths = app.scan_folders(image_folder)
    assert len(paths) == 12
    app.process_images(paths)
    assert len(app.embeddings) == 12
    res = app.search_images("brown dog", top_k=5)
    assert len(res) == 5
    assert all(r["score"] >= 0 for r in res)  # abs ranking (reference parity)
    # deterministic across repeated searches (no model reload jitter)
    res2 = app.search_images("brown dog", top_k=5)
    assert [r["path"] for r in res] == [r["path"] for r in res2]


def test_app_abs_ranking_parity(image_folder):
    """abs(score) ranking flips strong negatives above weak positives
    (reference app_pipeline.py:167)."""
    app = ImageSearchApp(encoder=FakeEncoder(dim=512))
    app.embeddings = {
        "neg.jpg": -np.ones(8, np.float32),
        "weak.jpg": np.ones(8, np.float32) * 0.1 + np.arange(8, dtype=np.float32) * 0.01,
    }
    app._index_dirty = True
    app._get_query_embedding = lambda q: np.ones(8, np.float32)
    res = app.search_images("anything", top_k=2)
    assert res[0]["path"] == "neg.jpg"  # |-1| > cos(weak)


def test_app_mi_analyses(image_folder):
    app = ImageSearchApp(encoder=FakeEncoder(dim=512))
    app.process_images(app.scan_folders(image_folder))
    analyzer, std = app.run_mi_analysis(num_pairs=40, num_bins=10)
    assert std is not None and "default" in std
    analyzer2, enhanced = app.run_enhanced_mi_analysis(num_pairs=40, num_bins=10)
    assert set(enhanced.keys()) == {"angular", "l1", "l2", "linf", "magnitude_diff"}
    analyzer3, coco = app.run_enhanced_mi_analysis_coco(num_pairs=42, num_bins=10)
    assert set(coco.keys()) == {"angular", "l1", "l2", "linf", "magnitude_diff"}


def test_app_multi_metric_search(image_folder):
    app = ImageSearchApp(encoder=FakeEncoder(dim=512))
    app.process_images(app.scan_folders(image_folder))
    out = app.search_with_multiple_metrics("white horse", top_k=3)
    assert set(out["analysis"]["intersections"].keys()) == {
        "cosine_vs_l1", "cosine_vs_l2", "l1_vs_l2"
    }


def test_embedding_cache_discovery(tmp_path, image_folder, monkeypatch):
    """npz cache with filename-based matching (reference app_pipeline.py:60-83)."""
    monkeypatch.chdir(tmp_path)
    enc = FakeEncoder(dim=512)
    paths = sorted(
        os.path.join(image_folder, f) for f in os.listdir(image_folder)
    )
    embs = {f"/other/prefix/{os.path.basename(p)}": enc.encode_images([p])[0] for p in paths}
    np.savez("color_embeddings.npz", embeddings=np.array(embs, dtype=object))
    app = ImageSearchApp(encoder=None)  # encoder must NOT be needed
    app.process_images(paths)
    assert len(app.embeddings) == 12
    assert app.encoder is None  # loaded from cache without constructing encoder


def test_embedding_cache_skips_ambiguous_basenames(tmp_path, image_folder,
                                                   monkeypatch):
    """Recursive category trees repeat basenames (red/im1.png, blue/im1.png);
    the filename-match fallback must not assign one cached embedding to
    every same-named file — ambiguous names fall through to re-encode."""
    monkeypatch.chdir(tmp_path)
    enc = FakeEncoder(dim=512)
    src = sorted(
        os.path.join(image_folder, f) for f in os.listdir(image_folder)
    )[:2]
    scan = []
    for color in ("red", "blue"):
        d = tmp_path / "tree" / color
        d.mkdir(parents=True)
        for s in src:
            dst = d / os.path.basename(s)
            dst.write_bytes(open(s, "rb").read())
            scan.append(str(dst))
    # cache keyed by basename only — ambiguous for every scanned file
    embs = {f"/old/{os.path.basename(s)}": enc.encode_images([s])[0]
            for s in src}
    np.savez("color_embeddings.npz", embeddings=np.array(embs, dtype=object))
    app = ImageSearchApp(encoder=FakeEncoder(dim=512))
    app.process_images(scan)
    assert len(app.embeddings) == 4  # re-encoded, not 4 copies of 2 rows
    reds = [v for k, v in app.embeddings.items() if "/red/" in k]
    blues = [v for k, v in app.embeddings.items() if "/blue/" in k]
    # identical pixels still agree; the point is no cross-name aliasing
    assert len(reds) == 2 and len(blues) == 2


def test_cli_search_and_compare(image_folder, capsys):
    rc = cli_main(["search", "--folder", image_folder, "--fake-encoder",
                   "brown dog", "--top-k", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert len(out.strip().splitlines()) == 3
    rc = cli_main(["compare", "--folder", image_folder, "--fake-encoder",
                   "white cat", "--top-k", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "intersections" in out


def test_cli_geometric_optimize(image_folder, capsys):
    rc = cli_main(["geometric", "--folder", image_folder, "--fake-encoder",
                   "--num-pairs", "30", "--num-bins", "10",
                   "--optimize", "--grid-size", "2", "--apply"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Optimal parameters" in out


def test_interpret_mi_value():
    assert interpret_mi_value(0.0) == "no dependence detected"
    assert "weak" in interpret_mi_value(0.03)
    assert "strong" in interpret_mi_value(0.3)


def test_workflow_end_to_end(tmp_path):
    """The full reproducible pipeline: synthetic dataset -> embeddings ->
    analysis -> results.json (reference config #2)."""
    from image_retrieval_tpu.app.workflow import run_workflow

    out_dir = str(tmp_path / "color_analysis")
    results = run_workflow(
        output_dir=out_dir, synthetic=True, fake_encoder=True, num_examples=2
    )
    assert results is not None
    assert set(results.keys()) == {"general_mi", "color_mi", "optimal_weights"}
    assert os.path.exists(os.path.join(out_dir, "color_dataset", "metadata.csv"))
    assert os.path.exists(os.path.join(out_dir, "color_embeddings.npz"))
    assert os.path.exists(os.path.join(out_dir, "analysis_results", "results.json"))
    assert os.path.exists(os.path.join(out_dir, "analysis_results", "summary.png"))
    # resumability: skip flags reuse artifacts
    results2 = run_workflow(
        output_dir=out_dir, synthetic=True, fake_encoder=True,
        skip_dataset=True, skip_embeddings=True,
    )
    assert results2["general_mi"] == results["general_mi"]


def test_cli_search_save_grid(image_folder, tmp_path, capsys):
    grid = str(tmp_path / "grid.png")
    rc = cli_main(["search", "--folder", image_folder, "--fake-encoder",
                   "brown dog", "--top-k", "4", "--save-grid", grid])
    assert rc == 0
    assert os.path.exists(grid)


def test_cli_geometric_plot(image_folder, tmp_path):
    plot = str(tmp_path / "mi.png")
    rc = cli_main(["geometric", "--folder", image_folder, "--fake-encoder",
                   "--num-pairs", "30", "--num-bins", "10", "--plot", plot])
    assert rc == 0
    assert os.path.exists(plot)


def test_search_batch(loaded_system):
    sys_, _ = loaded_system
    searcher = TextImageSearcher(sys_.encoder, sys_.index)
    out = searcher.search_batch(["brown dog", "white cat", "black boat"], top_k=4)
    assert len(out) == 3 and all(len(r) == 4 for r in out)
    single = searcher.search("brown dog", top_k=4, score_threshold=-1e9)
    assert [r["path"] for r in out[0]] == [r["path"] for r in single]


def test_cli_analyze_synthetic(tmp_path, capsys):
    out_dir = str(tmp_path / "an")
    rc = cli_main(["analyze", "--synthetic", "--fake-encoder",
                   "--output_dir", out_dir, "--num_examples", "2"])
    assert rc == 0
    captured = capsys.readouterr().out
    assert "general_mi" in captured
    assert os.path.exists(os.path.join(out_dir, "analysis_results", "results.json"))


def test_cli_fast_encoder_flag_parses():
    from image_retrieval_tpu.app.cli import make_parser

    args = make_parser().parse_args(
        ["search", "--folder", "/tmp/x", "--fast-encoder", "dog"]
    )
    assert args.fast_encoder is True
    # fake encoder wins over fast (fast needs the real CLIP towers)
    args2 = make_parser().parse_args(
        ["search", "--folder", "/tmp/x", "--fake-encoder", "dog"]
    )
    assert args2.fake_encoder is True and args2.fast_encoder is False


def test_serving_model_config():
    from image_retrieval_tpu.config import vit_b32_serving

    cfg = vit_b32_serving()
    assert cfg.fused_layer_block and cfg.int8_matmuls
    # same architecture as the parity config — only execution strategy flags
    from image_retrieval_tpu.config import ModelConfig
    import dataclasses

    base = ModelConfig()
    for f in dataclasses.fields(ModelConfig):
        if f.name in ("fused_layer_block", "int8_matmuls"):
            continue
        assert getattr(cfg, f.name) == getattr(base, f.name), f.name


def test_serving_config_applies_to_any_preset():
    from image_retrieval_tpu.config import (
        serving_config, vit_b16, vit_b32_serving, vit_l14,
    )

    for base in (vit_b16(), vit_l14()):
        cfg = serving_config(base)
        assert cfg.fused_layer_block and cfg.int8_matmuls
        assert cfg.patch_size == base.patch_size
        assert cfg.vision_width == base.vision_width
    from image_retrieval_tpu.config import ModelConfig

    assert vit_b32_serving() == serving_config(ModelConfig())


def test_workflow_explicit_dataset_dir_must_exist(tmp_path):
    """A typo'd --dataset-dir must fail fast, not silently regenerate a
    dataset at the wrong location and analyze the wrong data."""
    from image_retrieval_tpu.app.workflow import run_workflow

    with pytest.raises(FileNotFoundError, match="dataset_dir"):
        run_workflow(
            output_dir=str(tmp_path / "out"),
            dataset_dir=str(tmp_path / "does_not_exist"),
            fake_encoder=True,
        )


def test_search_by_image_self_top_and_excluded(loaded_system):
    """Image-query search: the query image itself ranks top when included,
    is dropped when excluded (default), and results flow through the same
    chain as text search."""
    sys_, paths = loaded_system
    searcher = TextImageSearcher(sys_.encoder, sys_.index)
    q = paths[3]
    with_self = searcher.search_by_image(q, top_k=3, exclude_self=False,
                                         score_threshold=-10.0)
    assert with_self[0]["path"] == q
    assert with_self[0]["score"] == pytest.approx(1.0, abs=1e-3)
    without = searcher.search_by_image(q, top_k=3, score_threshold=-10.0)
    assert all(r["path"] != q for r in without)
    # self-excluded list == with-self list minus the query row
    assert [r["path"] for r in without][:2] == [r["path"] for r in with_self[1:3]]


def test_search_by_image_pixels_and_errors(loaded_system):
    sys_, paths = loaded_system
    searcher = TextImageSearcher(sys_.encoder, sys_.index)
    from PIL import Image

    px = np.asarray(Image.open(paths[0]).convert("RGB"), np.float32) / 255.0
    res = searcher.search_by_image(px, top_k=2, score_threshold=-10.0)
    assert len(res) == 2
    with pytest.raises(ValueError, match="pixels"):
        searcher.search_by_image(np.zeros((4, 4)), top_k=2)


def test_facade_find_similar_images(image_folder):
    app = ImageSearchApp(encoder=FakeEncoder(dim=512))
    paths = app.scan_folders(image_folder)
    app.process_images(paths)
    q = str(paths[0])
    res = app.find_similar_images(q, top_k=5)
    assert len(res) == 5 and all(r["path"] != q for r in res)
    res_self = app.find_similar_images(q, top_k=5, exclude_self=False)
    assert res_self[0]["path"] == q
    # text-path behavior unchanged by the refactor
    assert len(app.search_images("brown dog", top_k=5)) == 5


def test_cli_search_by_image(image_folder, capsys):
    import os as _os

    img = sorted(_os.path.join(image_folder, f)
                 for f in _os.listdir(image_folder))[0]
    rc = cli_main(["search", "--folder", image_folder, "--fake-encoder",
                   "--image", img, "--top-k", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert len(out.strip().splitlines()) == 3
    # exactly one of query/--image required
    rc = cli_main(["search", "--folder", image_folder, "--fake-encoder"])
    assert rc == 2


def test_facade_find_similar_through_screen_ann(image_folder):
    """Image-query riding the projection-screen ANN candidate path (the
    two-phase shape) still excludes the query row and returns top_k."""
    app = ImageSearchApp(encoder=FakeEncoder(dim=512))
    app.config.search.ann = "screen"
    app.config.search.screen_dims = 32
    app.config.search.screen_candidates = 12
    paths = app.scan_folders(image_folder)
    app.process_images(paths)
    q = str(paths[1])
    res = app.find_similar_images(q, top_k=4)
    assert len(res) == 4 and all(r["path"] != q for r in res)
    with_self = app.find_similar_images(q, top_k=4, exclude_self=False)
    assert with_self[0]["path"] == q


def test_workflow_weight_validation_gate(tmp_path, caplog):
    """--weights_path triggers one-time checksum-gated port validation
    (VERDICT r4 item 8): no blob -> warn; already-validated checksum ->
    silent skip (no subprocess)."""
    import hashlib
    import logging

    from image_retrieval_tpu.app.workflow import _maybe_validate_weights

    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"
    ckpt.mkdir(); out.mkdir()
    with caplog.at_level(logging.WARNING):
        _maybe_validate_weights(str(ckpt), str(out))
    assert any("skipping validation" in r.message for r in caplog.records)

    (ckpt / "model.safetensors").write_bytes(b"weights")
    digest = hashlib.sha256(b"weights").hexdigest()
    (out / ".validated_weights").write_text(digest + "\n")
    caplog.clear()
    _maybe_validate_weights(str(ckpt), str(out))  # returns before the tool
    assert not caplog.records


def test_workflow_weight_validation_stat_shortcircuit(tmp_path):
    """After a digest match, the (path, size, mtime) tag is recorded and
    later runs skip the full-file re-hash (r5 review finding: a ~600 MB
    sha256 on every workflow start on a 1-core host)."""
    import hashlib

    from image_retrieval_tpu.app import workflow as wf

    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"
    ckpt.mkdir(); out.mkdir()
    blob = ckpt / "model.safetensors"
    blob.write_bytes(b"weights")
    digest = hashlib.sha256(b"weights").hexdigest()
    marker = out / ".validated_weights"
    marker.write_text(digest + "\n")

    # first call: digest path taken, stat tag appended
    wf._maybe_validate_weights(str(ckpt), str(out))
    assert "stat:" in marker.read_text()

    # second call must return via the stat tag without hashing
    real_sha = hashlib.sha256
    calls = []

    class _Spy:
        def __init__(self):
            calls.append(1)
            self._h = real_sha()
        def update(self, b):
            self._h.update(b)
        def hexdigest(self):
            return self._h.hexdigest()

    hashlib.sha256 = _Spy
    try:
        wf._maybe_validate_weights(str(ckpt), str(out))
    finally:
        hashlib.sha256 = real_sha
    assert calls == []


def test_search_by_image_pixels_match_path_query(loaded_system):
    """A raw pixel-array query routes through the SAME preprocess as the
    path form (resize/crop/normalize) — a float array must not be trusted
    as already CLIP-normalized (r5 review)."""
    sys_, paths = loaded_system
    searcher = TextImageSearcher(sys_.encoder, sys_.index)
    from PIL import Image

    arr_u8 = np.asarray(Image.open(paths[2]).convert("RGB"))
    by_path = searcher.search_by_image(paths[2], top_k=3, exclude_self=False,
                                       score_threshold=-10.0)
    by_pixels = searcher.search_by_image(arr_u8, top_k=3,
                                         score_threshold=-10.0)
    assert [r["path"] for r in by_pixels] == [r["path"] for r in by_path]
    np.testing.assert_allclose(
        [r["score"] for r in by_pixels], [r["score"] for r in by_path],
        rtol=1e-4, atol=1e-5)
    # [0,1] float convention lands on the same results
    by_f = searcher.search_by_image(arr_u8.astype(np.float32) / 255.0,
                                    top_k=3, score_threshold=-10.0)
    assert [r["path"] for r in by_f] == [r["path"] for r in by_path]


def test_search_by_image_excludes_relative_spelling(loaded_system, tmp_path):
    """exclude_self matches by realpath, so './'-prefixed or relative
    spellings of an indexed path still exclude the query image."""
    import os

    sys_, paths = loaded_system
    searcher = TextImageSearcher(sys_.encoder, sys_.index)
    q = paths[1]
    rel = os.path.join(".", os.path.relpath(q))
    assert rel != q
    res = searcher.search_by_image(rel, top_k=3, score_threshold=-10.0)
    assert all(os.path.realpath(r["path"]) != os.path.realpath(q)
               for r in res)


def test_multi_metric_search_after_journal_restart(tmp_path, monkeypatch):
    """search_with_multiple_metrics must serve from the journal-recovered
    index like search_images does (the old self.embeddings guard returned
    an empty analysis after restart — r5 review)."""
    monkeypatch.chdir(tmp_path)
    from image_retrieval_tpu.data.synthetic import synth_image

    folder = tmp_path / "imgs"
    folder.mkdir()
    imgs = []
    for i in range(5):
        p = folder / f"i{i}.png"
        synth_image(i % 10, "brown", i).save(p)
        imgs.append(str(p))
    jdir = str(tmp_path / "j")
    app1 = ImageSearchApp(encoder=FakeEncoder(dim=512), journal_dir=jdir)
    app1.process_images(imgs)
    before = app1.search_with_multiple_metrics("brown shape", top_k=3)
    assert len(before["cosine_similarity"]) == 3

    app2 = ImageSearchApp(encoder=FakeEncoder(dim=512), journal_dir=jdir)
    assert not app2.embeddings  # nothing re-encoded
    after = app2.search_with_multiple_metrics("brown shape", top_k=3)
    assert ([r["path"] for r in after["cosine_similarity"]]
            == [r["path"] for r in before["cosine_similarity"]])
    assert len(after["l1_distance"]) == 3 and len(after["l2_distance"]) == 3
