"""Port HF "openai/clip-vit-base-patch32" PyTorch weights into the Flax CLIP.

The zero-egress build environment has no HF cache, so this path activates
only when a local checkpoint directory is supplied (Config.weights_path).
Mapping is written against the HF CLIPModel state-dict layout
(text_model.*/vision_model.*/visual_projection/text_projection/logit_scale).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from image_retrieval_tpu.config import ModelConfig


def _to_numpy(t) -> np.ndarray:
    """torch tensor -> numpy; bf16 (a common HF export dtype) upcasts to
    f32 first — .numpy() raises on bfloat16, and the mapping casts to f32
    at the end regardless."""
    if t.dtype.is_floating_point and t.element_size() < 4:
        t = t.float()
    return t.numpy()


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    safep = os.path.join(path, "model.safetensors")
    binp = os.path.join(path, "pytorch_model.bin")
    if os.path.exists(safep):
        try:
            from safetensors.numpy import load_file

            return load_file(safep)
        except (TypeError, ValueError, ImportError):
            # safetensors.numpy rejects bf16 tensors; go through torch
            from safetensors.torch import load_file as load_torch

            return {k: _to_numpy(v) for k, v in load_torch(safep).items()}
    if os.path.exists(binp):
        import torch

        sd = torch.load(binp, map_location="cpu", weights_only=True)
        return {k: _to_numpy(v) for k, v in sd.items()}
    raise FileNotFoundError(f"no checkpoint found under {path}")


def _dense(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _block(sd, prefix):
    return {
        "ln1": _ln(sd, f"{prefix}.layer_norm1"),
        "ln2": _ln(sd, f"{prefix}.layer_norm2"),
        "attn": {
            "q_proj": _dense(sd, f"{prefix}.self_attn.q_proj"),
            "k_proj": _dense(sd, f"{prefix}.self_attn.k_proj"),
            "v_proj": _dense(sd, f"{prefix}.self_attn.v_proj"),
            "out_proj": _dense(sd, f"{prefix}.self_attn.out_proj"),
        },
        "mlp": {
            "fc1": _dense(sd, f"{prefix}.mlp.fc1"),
            "fc2": _dense(sd, f"{prefix}.mlp.fc2"),
        },
    }


def model_config_from_hf(path: str) -> ModelConfig:
    """Build a ModelConfig from an HF checkpoint dir's config.json (CLIPConfig
    layout: text_config/vision_config/projection_dim). Missing keys fall back
    to the HF CLIPText/VisionConfig defaults, so both the real
    openai/clip-vit-base-patch32 export and the tiny CI checkpoint resolve
    correctly."""
    import json

    with open(os.path.join(path, "config.json"), encoding="utf-8") as f:
        c = json.load(f)
    t = c.get("text_config", {})
    v = c.get("vision_config", {})
    return ModelConfig(
        image_size=v.get("image_size", 224),
        patch_size=v.get("patch_size", 32),
        vision_width=v.get("hidden_size", 768),
        vision_layers=v.get("num_hidden_layers", 12),
        vision_heads=v.get("num_attention_heads", 12),
        text_width=t.get("hidden_size", 512),
        text_layers=t.get("num_hidden_layers", 12),
        text_heads=t.get("num_attention_heads", 8),
        vocab_size=t.get("vocab_size", 49408),
        context_length=t.get("max_position_embeddings", 77),
        embed_dim=c.get("projection_dim", 512),
        dtype="float32",
    )


def load_hf_clip_params(path: str, cfg: ModelConfig):
    """Return a Flax param dict for models.clip.CLIP from an HF checkpoint."""
    return params_from_state_dict(_load_state_dict(path), cfg)


def params_from_state_dict(sd: Dict[str, "np.ndarray"], cfg: ModelConfig):
    """Map an HF CLIPModel state dict (already as numpy) to Flax params.

    Tested against a randomly-initialized transformers CLIPModel by forward
    parity (tests/test_weights_port.py) — the zero-egress environment has no
    pretrained checkpoint, but the mapping is checkpoint-independent."""
    sd = {k.removeprefix("clip."): v for k, v in sd.items()}

    vision = {
        # HF conv weight (out, in, kh, kw) -> flax (kh, kw, in, out)
        "patch_embed": {
            "kernel": np.transpose(
                sd["vision_model.embeddings.patch_embedding.weight"], (2, 3, 1, 0)
            )
        },
        "class_embedding": sd["vision_model.embeddings.class_embedding"],
        "position_embedding": sd["vision_model.embeddings.position_embedding.weight"],
        "pre_ln": _ln(sd, "vision_model.pre_layrnorm"),
        "post_ln": _ln(sd, "vision_model.post_layernorm"),
        "proj": sd["visual_projection.weight"].T,
    }
    for i in range(cfg.vision_layers):
        vision[f"block_{i}"] = _block(sd, f"vision_model.encoder.layers.{i}")

    text = {
        "token_embedding": {
            "embedding": sd["text_model.embeddings.token_embedding.weight"]
        },
        "position_embedding": sd["text_model.embeddings.position_embedding.weight"],
        "final_ln": _ln(sd, "text_model.final_layer_norm"),
        "proj": sd["text_projection.weight"].T,
    }
    for i in range(cfg.text_layers):
        text[f"block_{i}"] = _block(sd, f"text_model.encoder.layers.{i}")

    params = {
        "vision": vision,
        "text": text,
        "logit_scale": sd["logit_scale"],
    }
    import jax

    return {"params": jax.tree.map(lambda x: np.asarray(x, np.float32), params)}
