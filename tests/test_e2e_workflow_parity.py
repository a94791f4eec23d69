"""FULL end-to-end workflow parity vs the reference, zero-egress.

The reference's headline artifact is color_analysis_workflow.py run end to
end (COCO -> color dataset -> CLIP embeddings -> MI analysis ->
results.json). No pretrained checkpoint exists in this environment, so both
stacks run from ONE shared randomly-initialized torch CLIPModel (tiny dims,
real 224x224 input geometry):

  reference: color_analysis_workflow.main() with its CLIPModel/CLIPProcessor
             loaders monkeypatched to that model (per-image torch loop,
             reference color_analysis_workflow.py:86-146)
  ours:      app.workflow.run_workflow() with the SAME checkpoint ported
             through models/weights.py (batched sharded JAX forward)

Assertions split by what each stage can promise:
  * dataset artifacts     — identical (also covered in test_reference_parity)
  * per-image embeddings  — forward parity (torch f32 vs XLA f32, ~1e-4)
  * analysis on the SAME npz — digit parity (1e-9): our step 3 re-run on the
    reference's own embeddings file must reproduce reference results.json
  * full-chain MI values  — close (binning is discontinuous, so a 1e-4
    embedding delta may flip a bin assignment; asserted at atol=0.05)
"""

import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)

from tests.test_reference_parity import _make_coco_tree  # noqa: E402

from image_retrieval_tpu.config import Config, ModelConfig  # noqa: E402


def _tiny_checkpoint(tmp_path):
    """One shared torch CLIP checkpoint dir (weights + fixture BPE vocab)."""
    import shutil

    from transformers import CLIPConfig

    from image_retrieval_tpu.models.tokenizer import FIXTURE_DIR

    with open(f"{FIXTURE_DIR}/vocab.json", encoding="utf-8") as f:
        vocab = json.load(f)
    vsize = len(vocab)
    hf_cfg = CLIPConfig(
        text_config=dict(
            vocab_size=vsize, hidden_size=32, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=77, hidden_act="quick_gelu",
            bos_token_id=vocab["<|startoftext|>"],
            eos_token_id=vocab["<|endoftext|>"],
        ),
        vision_config=dict(
            hidden_size=64, intermediate_size=256, num_hidden_layers=2,
            num_attention_heads=2, image_size=224, patch_size=32,
            hidden_act="quick_gelu",
        ),
        projection_dim=32,
    )
    torch.manual_seed(7)
    hf_model = transformers.CLIPModel(hf_cfg).eval()
    ckpt = tmp_path / "ckpt"
    hf_model.save_pretrained(str(ckpt))
    shutil.copy(f"{FIXTURE_DIR}/vocab.json", ckpt / "vocab.json")
    shutil.copy(f"{FIXTURE_DIR}/merges.txt", ckpt / "merges.txt")

    our_cfg = ModelConfig(
        image_size=224, patch_size=32, vision_width=64, vision_layers=2,
        vision_heads=2, text_width=32, text_layers=2, text_heads=2,
        vocab_size=vsize, context_length=77, embed_dim=32, dtype="float32",
    )
    return hf_model, str(ckpt), our_cfg


def _run_reference_workflow(monkeypatch, hf_model, ckpt, coco_dir, ann_file, out_dir):
    sys.path.insert(0, REF)
    try:
        import color_analysis_workflow as ref_wf  # reference import

        from transformers import CLIPImageProcessor, CLIPProcessor, CLIPTokenizer

        processor = CLIPProcessor(
            image_processor=CLIPImageProcessor(),
            tokenizer=CLIPTokenizer(
                os.path.join(ckpt, "vocab.json"), os.path.join(ckpt, "merges.txt")
            ),
        )

        class _ModelLoader:
            @staticmethod
            def from_pretrained(name):
                return hf_model

        class _ProcLoader:
            @staticmethod
            def from_pretrained(name):
                return processor

        monkeypatch.setattr(ref_wf, "CLIPModel", _ModelLoader)
        monkeypatch.setattr(ref_wf, "CLIPProcessor", _ProcLoader)
        monkeypatch.setattr(
            sys, "argv",
            ["color_analysis_workflow.py", "--coco_dir", coco_dir,
             "--annotation_file", ann_file, "--output_dir", out_dir],
        )
        ref_wf.main()
    finally:
        sys.path.remove(REF)


def _load_npz_embeddings(path):
    with np.load(path, allow_pickle=True) as z:
        return dict(z["embeddings"].item())


def test_full_workflow_parity(tmp_path, monkeypatch):
    from image_retrieval_tpu.app.pipeline import run_color_analysis
    from image_retrieval_tpu.app.workflow import run_workflow

    hf_model, ckpt, our_cfg = _tiny_checkpoint(tmp_path)
    coco_dir, ann_file = _make_coco_tree(tmp_path)

    ref_out = str(tmp_path / "ref_run")
    our_out = str(tmp_path / "our_run")

    _run_reference_workflow(monkeypatch, hf_model, ckpt, coco_dir, ann_file, ref_out)
    our_results = run_workflow(
        coco_dir=coco_dir,
        annotation_file=ann_file,
        output_dir=our_out,
        config=Config(model=our_cfg, weights_path=ckpt),
    )
    assert our_results is not None

    # --- stage 1: identical dataset metadata ---
    import pandas as pd

    ref_meta = pd.read_csv(os.path.join(ref_out, "color_dataset", "metadata.csv"))
    our_meta = pd.read_csv(os.path.join(our_out, "color_dataset", "metadata.csv"))
    for df, base in ((ref_meta, ref_out), (our_meta, our_out)):
        df["path"] = df["path"].map(
            lambda p: os.path.relpath(p, os.path.join(base, "color_dataset"))
        )
    pd.testing.assert_frame_equal(our_meta, ref_meta)

    # --- stage 2: per-image embedding forward parity (torch vs ported JAX) ---
    ref_embs = _load_npz_embeddings(os.path.join(ref_out, "color_embeddings.npz"))
    our_embs = _load_npz_embeddings(os.path.join(our_out, "color_embeddings.npz"))

    def rel(d, base):
        return {
            os.path.relpath(p, os.path.join(base, "color_dataset")): np.asarray(
                v, np.float64
            )
            for p, v in d.items()
        }

    ref_embs, our_embs = rel(ref_embs, ref_out), rel(our_embs, our_out)
    assert set(ref_embs) == set(our_embs)
    assert len(ref_embs) == 19  # the synthetic tree's selected-image count
    for key in sorted(ref_embs):
        a, b = our_embs[key], ref_embs[key]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 1 - 1e-7, (key, cos)
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4, err_msg=key)

    # --- stage 3 digit parity: OUR analysis on the REFERENCE's own npz must
    # reproduce the reference's results.json to the digit ---
    with open(os.path.join(ref_out, "analysis_results", "results.json")) as f:
        ref_results = json.load(f)
    ours_on_ref_dir = str(tmp_path / "ours_on_ref_results")
    run_color_analysis(
        embeddings_file=os.path.join(ref_out, "color_embeddings.npz"),
        dataset_dir=os.path.join(ref_out, "color_dataset"),
        results_dir=ours_on_ref_dir,
    )
    with open(os.path.join(ours_on_ref_dir, "results.json")) as f:
        ours_on_ref = json.load(f)
    assert set(ours_on_ref) >= {"general_mi", "color_mi", "optimal_weights"}
    for section in ("general_mi", "color_mi"):
        assert set(ours_on_ref[section]) == set(ref_results[section]), section
        for metric, want in ref_results[section].items():
            assert ours_on_ref[section][metric] == pytest.approx(
                want, rel=1e-9, abs=1e-12
            ), (section, metric)
    assert ours_on_ref["optimal_weights"] == pytest.approx(
        ref_results["optimal_weights"]
    )

    # --- full chain: our own results.json is structurally identical and
    # numerically close (bin-edge flips bound the achievable tolerance) ---
    assert set(our_results["general_mi"]) == set(ref_results["general_mi"])
    assert set(our_results["color_mi"]) == set(ref_results["color_mi"])
    for section in ("general_mi", "color_mi"):
        for metric, want in ref_results[section].items():
            assert our_results[section][metric] == pytest.approx(
                want, abs=0.05
            ), (section, metric)

    # both chains produced the full artifact set
    for base in (ref_out, our_out):
        assert os.path.exists(os.path.join(base, "analysis_results", "results.json"))
