"""HF torch CLIP -> Flax weight-port forward parity.

No pretrained weights exist in this environment, so the test instantiates a
randomly-initialized transformers CLIPModel (small dims), ports its state
dict through models/weights.py, and checks that torch and JAX forward passes
agree — validating the architecture (pre/post LN, quick_gelu, causal mask,
EOT pooling, projections) and the parameter mapping end to end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from image_retrieval_tpu.config import ModelConfig
from image_retrieval_tpu.models.clip import CLIP
from image_retrieval_tpu.models.weights import params_from_state_dict


def small_configs():
    from transformers import CLIPConfig, CLIPTextConfig, CLIPVisionConfig

    hf = CLIPConfig(
        text_config=dict(
            vocab_size=1000,
            hidden_size=32,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=2,
            max_position_embeddings=16,
            hidden_act="quick_gelu",
            # EOT must be the max id so HF first-eos pooling and our
            # argmax pooling select the same position (as with the real
            # vocab where EOS=49407 is the largest id).
            bos_token_id=998,
            eos_token_id=999,
        ),
        vision_config=dict(
            hidden_size=48,
            intermediate_size=192,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=32,
            patch_size=8,
            hidden_act="quick_gelu",
        ),
        projection_dim=24,
    )
    ours = ModelConfig(
        image_size=32,
        patch_size=8,
        vision_width=48,
        vision_layers=2,
        vision_heads=4,
        text_width=32,
        text_layers=2,
        text_heads=2,
        vocab_size=1000,
        context_length=16,
        embed_dim=24,
        dtype="float32",
    )
    return hf, ours


@pytest.fixture(scope="module")
def ported():
    import jax.numpy as jnp
    from transformers import CLIPModel

    hf_cfg, our_cfg = small_configs()
    torch.manual_seed(0)
    hf_model = CLIPModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params = params_from_state_dict(sd, our_cfg)
    our_model = CLIP(our_cfg, dtype=jnp.float32)
    return hf_model, our_model, params


def test_image_tower_parity(ported, rng):
    import jax.numpy as jnp

    hf_model, our_model, params = ported
    pixels = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = hf_model.get_image_features(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).numpy()
    got = np.asarray(
        our_model.apply(params, jnp.asarray(pixels), method=CLIP.encode_image)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_text_tower_parity(ported, rng):
    import jax.numpy as jnp

    hf_model, our_model, params = ported
    ids = rng.integers(1, 900, size=(2, 16)).astype(np.int64)
    ids[:, -1] = 999  # EOT = max id, pooled position
    with torch.no_grad():
        want = hf_model.get_text_features(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.ones_like(torch.from_numpy(ids)),
        ).numpy()
    got = np.asarray(
        our_model.apply(params, jnp.asarray(ids.astype(np.int32)),
                        method=CLIP.encode_text)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_logit_scale_ported(ported):
    hf_model, our_model, params = ported
    assert float(params["params"]["logit_scale"]) == pytest.approx(
        float(hf_model.logit_scale.detach()), abs=1e-6
    )


def test_checkpoint_dir_end_to_end(tmp_path, rng):
    """The FULL L0 replacement in one shot: a checkpoint directory
    (model.safetensors + vocab.json/merges.txt) drives CLIPEncoder via
    Config.weights_path — ported weights AND the real BPE tokenizer — and
    both towers match transformers' outputs on raw text/pixels."""
    import shutil

    import jax.numpy as jnp
    from transformers import CLIPConfig, CLIPModel, CLIPTokenizer

    from image_retrieval_tpu.config import Config
    from image_retrieval_tpu.models.encoder import CLIPEncoder
    from image_retrieval_tpu.models.tokenizer import FIXTURE_DIR

    # HF config whose vocab/eos match the vendored fixture vocab (eos must
    # be the max id so HF first-eos pooling == our argmax pooling)
    import json as _json

    with open(f"{FIXTURE_DIR}/vocab.json", encoding="utf-8") as f:
        vocab = _json.load(f)
    vsize = len(vocab)
    eos = vocab["<|endoftext|>"]
    bos = vocab["<|startoftext|>"]
    assert eos == vsize - 1  # fixture layout: eos is the largest id
    hf_cfg = CLIPConfig(
        text_config=dict(
            vocab_size=vsize, hidden_size=32, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=77, hidden_act="quick_gelu",
            bos_token_id=bos, eos_token_id=eos,
        ),
        vision_config=dict(
            hidden_size=48, intermediate_size=192, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8,
            hidden_act="quick_gelu",
        ),
        projection_dim=24,
    )
    torch.manual_seed(1)
    hf_model = CLIPModel(hf_cfg).eval()
    ckpt = tmp_path / "ckpt"
    hf_model.save_pretrained(str(ckpt))
    shutil.copy(f"{FIXTURE_DIR}/vocab.json", ckpt / "vocab.json")
    shutil.copy(f"{FIXTURE_DIR}/merges.txt", ckpt / "merges.txt")

    our_cfg = ModelConfig(
        image_size=32, patch_size=8, vision_width=48, vision_layers=2,
        vision_heads=4, text_width=32, text_layers=2, text_heads=2,
        vocab_size=vsize, context_length=77, embed_dim=24, dtype="float32",
    )
    enc = CLIPEncoder(Config(model=our_cfg, weights_path=str(ckpt)))

    # text path: raw strings through OUR tokenizer + towers vs raw strings
    # through HF's tokenizer + towers
    texts = ["a photo of a white car", "the quick brown fox!"]
    got_txt = enc.encode_texts(texts)
    hf_tok = CLIPTokenizer(str(ckpt / "vocab.json"), str(ckpt / "merges.txt"))
    batch = hf_tok(texts, padding="max_length", max_length=77,
                   return_tensors="pt")
    with torch.no_grad():
        want_txt = hf_model.get_text_features(
            input_ids=batch["input_ids"],
            attention_mask=torch.ones_like(batch["input_ids"]),
        ).numpy()
    np.testing.assert_allclose(got_txt, want_txt, rtol=2e-4, atol=2e-4)

    # image path
    pixels = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    got_img = enc.encode_pixels(pixels)
    with torch.no_grad():
        want_img = hf_model.get_image_features(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).numpy()
    np.testing.assert_allclose(got_img, want_img, rtol=2e-4, atol=2e-4)
