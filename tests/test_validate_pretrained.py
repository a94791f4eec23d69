"""tools/validate_pretrained.py — the one-command checkpoint validation
harness (VERDICT r2 item 6) — runs its full chain in CI against the tiny
test checkpoint: port -> tokenizer check -> embed -> analyze -> diff table.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tests.test_e2e_workflow_parity import _tiny_checkpoint  # noqa: E402


def _run(argv):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    try:
        import validate_pretrained

        return validate_pretrained.main(argv)
    finally:
        sys.path.pop(0)


def test_validate_pretrained_full_chain(tmp_path, capsys):
    _, ckpt, _ = _tiny_checkpoint(tmp_path)
    out = str(tmp_path / "val_run")

    # 1) full chain, synthetic dataset, report-only diff vs the reference's
    # published results.json (random tiny weights won't match it — the point
    # is that the table is produced and the chain completes)
    rc = _run([ckpt, "--synthetic", "--output-dir", out, "--report-only",
               "--check-serving"])
    assert rc == 0
    results_json = os.path.join(out, "analysis_results", "results.json")
    assert os.path.exists(results_json)
    printed = capsys.readouterr().out
    if os.path.exists(
        "/root/reference/src/color_analysis_results/analysis_results/results.json"
    ):
        assert "general_mi.l2_distance" in printed
        assert "worst |delta|" in printed

    # 2) re-run on the dataset built in (1), diffing against (1)'s own
    # results: self-consistency must pass the tolerance gate (exit 0)
    out2 = str(tmp_path / "val_run2")
    rc2 = _run([
        ckpt,
        "--dataset-dir", os.path.join(out, "color_dataset"),
        "--output-dir", out2,
        "--reference-results", results_json,
        "--atol", "1e-9",
    ])
    assert rc2 == 0
    printed2 = capsys.readouterr().out
    assert "worst |delta|" in printed2

    # the self-diff is exact: same checkpoint, same dataset, same pipeline
    with open(os.path.join(out2, "analysis_results", "results.json")) as f:
        r2 = json.load(f)
    with open(results_json) as f:
        r1 = json.load(f)
    for section in ("general_mi", "color_mi"):
        for k, v in r1[section].items():
            assert r2[section][k] == pytest.approx(v, abs=1e-9), (section, k)


def test_validate_pretrained_rejects_missing_vocab(tmp_path):
    _, ckpt, _ = _tiny_checkpoint(tmp_path)
    os.remove(os.path.join(ckpt, "vocab.json"))
    with pytest.raises(FileNotFoundError, match="vocab.json"):
        _run([ckpt, "--synthetic", "--output-dir", str(tmp_path / "x")])
