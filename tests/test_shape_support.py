"""Mosaic compile-shape support table (ops/shape_support.py) + the
models/clip.py Block guard that consults it."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from image_retrieval_tpu.ops import shape_support


@pytest.fixture
def table(tmp_path, monkeypatch):
    def write(entries):
        p = tmp_path / "mosaic_shapes.json"
        p.write_text(json.dumps(entries))
        monkeypatch.setenv("IR_MOSAIC_SHAPES", str(p))
        shape_support._load.cache_clear()
        return str(p)

    yield write
    shape_support._load.cache_clear()


def test_swept_points_override_heuristics(table):
    table([
        {"kernel": "layer", "quant": True, "width": 768, "t": 50, "ok": True},
        # a swept rejection on a point the heuristic would allow
        {"kernel": "layer", "quant": False, "width": 512, "t": 50, "ok": False},
        {"kernel": "attn", "quant": False, "width": 64, "t": 11, "ok": False},
    ])
    assert shape_support.layer_kernel_fits(True, 768, 50) is True
    assert shape_support.layer_kernel_fits(False, 512, 50) is False
    # unswept points keep the measured VMEM-envelope fallbacks
    assert shape_support.layer_kernel_fits(True, 768, 77) is True
    assert shape_support.layer_kernel_fits(False, 768, 77) is False
    assert shape_support.layer_kernel_fits(False, 1024, 77) is False
    # sub-blocks: swept rejection blocks the pair; unswept stays permissive
    assert shape_support.subblock_kernel_fits(False, 64, 11) is False
    assert shape_support.subblock_kernel_fits(False, 768, 50) is True


def test_missing_table_means_heuristics(monkeypatch, tmp_path):
    monkeypatch.setenv("IR_MOSAIC_SHAPES", str(tmp_path / "nope.json"))
    shape_support._load.cache_clear()
    try:
        assert shape_support.lookup("layer", True, 768, 50) is None
        assert shape_support.layer_kernel_fits(True, 768, 50) is True
        assert shape_support.layer_kernel_fits(False, 512, 77) is True
        assert shape_support.subblock_kernel_fits(False, 512, 11) is True
    finally:
        shape_support._load.cache_clear()


def test_block_falls_back_to_unfused_on_rejected_subblock(table, monkeypatch):
    """A swept-and-rejected sub-block shape must route around the Pallas
    kernels entirely (unfused XLA path) — never call them."""
    import dataclasses

    import jax

    from image_retrieval_tpu.config import ModelConfig
    from image_retrieval_tpu.models.clip import CLIP, init_params
    from image_retrieval_tpu.ops import flash_attention as fa

    # vision t = (32/8)^2 + 1 = 17; text t = context_length = 50
    table([
        {"kernel": k, "quant": False, "width": 64, "t": t, "ok": False}
        for k in ("attn", "mlp", "layer") for t in (17, 50)
    ])

    def boom(*a, **kw):  # pragma: no cover - failing is the assertion
        raise AssertionError("rejected kernel shape was invoked")

    monkeypatch.setattr(fa, "attention_block", boom)
    monkeypatch.setattr(fa, "mlp_block", boom)
    monkeypatch.setattr(fa, "layer_block", boom)

    cfg = ModelConfig(
        image_size=32, patch_size=8, vision_width=64, vision_layers=1,
        vision_heads=2, text_width=64, text_layers=1, text_heads=2,
        vocab_size=64, context_length=50, embed_dim=32, dtype="float32",
        fused_attn_block=True, fused_mlp_block=True, fused_layer_block=True,
    )
    model, params = init_params(cfg, seed=0)
    px = jnp.asarray(np.zeros((2, 32, 32, 3), np.float32))
    out = model.apply(params, px, method=CLIP.encode_image)
    assert np.isfinite(np.asarray(out)).all()  # ran via the XLA path


def test_mlp_gate_independent_of_attn_rejection(table):
    """An attention-kernel rejection must not disable the independent MLP
    kernel (models/clip.py keeps fused_mlp on masked/oversized layers)."""
    table([
        {"kernel": "attn", "quant": False, "width": 64, "t": 11, "ok": False},
        {"kernel": "mlp", "quant": False, "width": 64, "t": 11, "ok": True},
    ])
    assert shape_support.attn_kernel_fits(False, 64, 11) is False
    assert shape_support.mlp_kernel_fits(False, 64, 11) is True
    # the pair (layer-replacement path) still needs both
    assert shape_support.subblock_kernel_fits(False, 64, 11) is False
