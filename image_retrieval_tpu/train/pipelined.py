"""Pipelined CLIP training: data x pipeline parallelism in one shard_map.

Hand-rolled SPMD trainer over a (data, pipe) mesh:

  * transformer trunks (the homogeneous Block stacks of both towers) are
    stage-sharded over `pipe` and executed with the GPipe schedule
    (parallel/pipeline.py::gpipe_local — microbatches, ppermute hops, AD
    through the schedule);
  * embeddings/heads/logit_scale are replicated; their grads psum over both
    axes (the pipeline computes them only on the first/last stage);
  * the batch is sharded over `data`; pooled embeddings all_gather over
    `data` for the global contrastive matrix; block grads psum over `data`;
  * the AdamW update runs per-device on local shards (elementwise — local
    update == global update).

Verified loss-equivalent to the plain dp x tp trainer (train/trainer.py)
across mesh layouts in tests/test_pipelined.py. At ViT-B scale this is the
scaling demonstration; for deeper towers it is the memory-viable layout.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from image_retrieval_tpu.config import ModelConfig
from image_retrieval_tpu.models.clip import Block, init_params
from image_retrieval_tpu.parallel.pipeline import gpipe_local, stack_layer_params
from image_retrieval_tpu.train.trainer import clip_contrastive_loss

Dtype = Any


class VisionEmbed(nn.Module):
    """Patch conv + [CLS] + positions + pre-LN (param names match
    CLIPVisionTower so standard checkpoints slice straight in)."""

    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels):
        c = self.cfg
        b = pixels.shape[0]
        x = nn.Conv(c.vision_width, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), use_bias=False,
                    dtype=self.dtype, name="patch_embed")(pixels.astype(self.dtype))
        n = (c.image_size // c.patch_size) ** 2
        x = x.reshape(b, n, c.vision_width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.vision_width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, c.vision_width)), x], 1
        )
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (n + 1, c.vision_width))
        x = x + pos.astype(self.dtype)[None]
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="pre_ln")(x).astype(
            self.dtype
        )


class VisionHead(nn.Module):
    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="post_ln")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (c.vision_width, c.embed_dim))
        return jnp.dot(pooled.astype(self.dtype), proj.astype(self.dtype),
                       preferred_element_type=jnp.float32)


class TextEmbed(nn.Module):
    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids):
        c = self.cfg
        t = token_ids.shape[1]
        tok = nn.Embed(c.vocab_size, c.text_width, dtype=self.dtype,
                       name="token_embedding")(token_ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (c.context_length, c.text_width))
        return tok + pos.astype(self.dtype)[None, :t]


class TextHead(nn.Module):
    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, token_ids):
        c = self.cfg
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_ln")(x)
        eot = jnp.argmax(token_ids, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (c.text_width, c.embed_dim))
        return jnp.dot(pooled.astype(self.dtype), proj.astype(self.dtype),
                       preferred_element_type=jnp.float32)


_V_EMBED_KEYS = ("patch_embed", "class_embedding", "position_embedding", "pre_ln")
_V_HEAD_KEYS = ("post_ln", "proj")
_T_EMBED_KEYS = ("token_embedding", "position_embedding")
_T_HEAD_KEYS = ("final_ln", "proj")


def split_clip_params(params, cfg: ModelConfig):
    """Standard CLIP param tree -> pipelined layout
    {ve, vb(stacked), vh, te, tb(stacked), th, logit_scale}."""
    p = params["params"]
    return {
        "ve": {k: p["vision"][k] for k in _V_EMBED_KEYS},
        "vb": stack_layer_params(
            [p["vision"][f"block_{i}"] for i in range(cfg.vision_layers)]
        ),
        "vh": {k: p["vision"][k] for k in _V_HEAD_KEYS},
        "te": {k: p["text"][k] for k in _T_EMBED_KEYS},
        "tb": stack_layer_params(
            [p["text"][f"block_{i}"] for i in range(cfg.text_layers)]
        ),
        "th": {k: p["text"][k] for k in _T_HEAD_KEYS},
        "logit_scale": p["logit_scale"],
    }


class PipelinedCLIPTrainer:
    """dp x pp contrastive training; see module docstring."""

    def __init__(
        self,
        cfg: Optional[ModelConfig] = None,
        mesh: Optional[Mesh] = None,
        num_micro: int = 2,
        learning_rate: float = 1e-4,
        weight_decay: float = 0.01,
        seed: int = 0,
        params=None,
        optimizer=None,
    ):
        self.cfg = cfg or ModelConfig()
        if self.cfg.int8_matmuls and not (
            self.cfg.fused_attn_block or self.cfg.fused_layer_block
        ):
            raise ValueError(
                "int8_matmuls without fused kernels is inference-only "
                "(non-differentiable QuantDense) - see CLIPTrainer"
            )
        assert mesh is not None and "pipe" in mesh.axis_names and "data" in mesh.axis_names
        self.mesh = mesh
        stages = mesh.shape["pipe"]
        assert self.cfg.vision_layers % stages == 0, "vision layers % stages"
        assert self.cfg.text_layers % stages == 0, "text layers % stages"
        self.num_micro = num_micro
        dtype = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32
        self.dtype = dtype
        if params is None:
            _, params = init_params(self.cfg, seed=seed, dtype=dtype)
        split = split_clip_params(params, self.cfg)

        def spec_of(key):
            def f(x):
                if key in ("vb", "tb"):
                    return P("pipe", *([None] * (x.ndim - 1)))
                return P()
            return f

        self._param_specs = {
            k: jax.tree.map(spec_of(k), v) for k, v in split.items()
        }
        shardings = jax.tree.map(
            lambda s: NamedSharding(mesh, s), self._param_specs,
            is_leaf=lambda x: isinstance(x, P),
        )
        self.params = jax.device_put(split, shardings)
        self.tx = optimizer if optimizer is not None else optax.adamw(
            learning_rate, weight_decay=weight_decay
        )
        opt_state = self.tx.init(self.params)
        rep = NamedSharding(mesh, P())
        opt_shardings = jax.tree.map(
            lambda x: x.sharding
            if isinstance(x, jax.Array) and x.sharding.num_devices == mesh.size
            else rep,
            opt_state,
        )
        self.opt_state = jax.device_put(opt_state, opt_shardings)

        c = self.cfg
        v_embed = VisionEmbed(c, dtype)
        v_head = VisionHead(c, dtype)
        t_embed = TextEmbed(c, dtype)
        t_head = TextHead(c, dtype)
        block_cls = nn.remat(Block) if c.remat else Block
        block_v = block_cls(c.vision_width, c.vision_heads, dtype)
        block_t = block_cls(c.text_width, c.text_heads, dtype)
        M = num_micro
        mesh_size = mesh.size

        def body(params_l, opt_l, pixels_l, tokens_l):
            mbl = pixels_l.shape[0] // M
            px = pixels_l.reshape(M, mbl, *pixels_l.shape[1:])
            tk = tokens_l.reshape(M, mbl, tokens_l.shape[1])
            # causal mask from the ACTUAL token length (CLIPTextTower
            # semantics) — a fixed context_length mask breaks shorter batches
            t_len = tokens_l.shape[1]
            causal = jnp.triu(
                jnp.full((t_len, t_len), -jnp.inf, jnp.float32), k=1
            )[None, None]

            def loss_fn(pl):
                ve = jax.vmap(lambda a: v_embed.apply({"params": pl["ve"]}, a))(px)
                vb = gpipe_local(
                    lambda lp, x: block_v.apply({"params": lp}, x),
                    pl["vb"], ve, axis="pipe", num_stages=stages,
                )
                img = jax.vmap(lambda a: v_head.apply({"params": pl["vh"]}, a))(vb)
                img = img.reshape(M * mbl, -1)

                te = jax.vmap(lambda a: t_embed.apply({"params": pl["te"]}, a))(tk)
                tb = gpipe_local(
                    lambda lp, x: block_t.apply({"params": lp}, x, causal),
                    pl["tb"], te, axis="pipe", num_stages=stages,
                )
                txt = jax.vmap(
                    lambda a, ids: t_head.apply({"params": pl["th"]}, a, ids)
                )(tb, tk)
                txt = txt.reshape(M * mbl, -1)

                img = img / (jnp.linalg.norm(img, axis=-1, keepdims=True) + 1e-8)
                txt = txt / (jnp.linalg.norm(txt, axis=-1, keepdims=True) + 1e-8)
                img_all = jax.lax.all_gather(img, "data", axis=0, tiled=True)
                txt_all = jax.lax.all_gather(txt, "data", axis=0, tiled=True)
                logits = jnp.exp(pl["logit_scale"]) * jnp.dot(
                    img_all, txt_all.T, preferred_element_type=jnp.float32
                )
                return clip_contrastive_loss(logits)

            loss, grads = jax.value_and_grad(loss_fn)(params_l)
            # data-parallel grad reduction for everything...
            grads = jax.lax.psum(grads, "data")
            # ...and pipe reduction for the replicated (non-stacked) leaves,
            # which the pipeline only touches on the first/last stage.
            for key in ("ve", "vh", "te", "th", "logit_scale"):
                grads[key] = jax.lax.psum(grads[key], "pipe")
            # Every device computes the SAME global loss (img/txt are
            # all-gathered; gpipe_local psum-replicates stage outputs), so
            # the psums above accumulate mesh.size identical gradients.
            # Rescale to the true gradient so non-scale-invariant optimizers
            # (SGD, grad clipping, grad-norm logging) match trainer.py's
            # GSPMD gradients — verified by the SGD layout-equivalence test.
            grads = jax.tree.map(lambda g: g / mesh_size, grads)
            updates, new_opt = self.tx.update(grads, opt_l, params_l)
            new_params = optax.apply_updates(params_l, updates)
            return new_params, new_opt, loss

        opt_specs = jax.tree.map(
            lambda x: (
                self._shard_spec_for(x) if isinstance(x, jax.Array) else P()
            ),
            self.opt_state,
        )
        data_spec = P("data")
        self._step = jax.jit(
            shard_map(
                body,
                mesh=mesh,
                in_specs=(self._param_specs, opt_specs, data_spec, data_spec),
                out_specs=(self._param_specs, opt_specs, P()),
                check_vma=False,
            ),
            donate_argnums=(0, 1),
        )

    def _shard_spec_for(self, x) -> P:
        if isinstance(x, jax.Array) and hasattr(x, "sharding") and isinstance(
            x.sharding, NamedSharding
        ):
            return x.sharding.spec
        return P()

    def train_step_async(self, pixels, tokens):
        """One step, loss returned as a device array (no host sync) so
        consecutive steps pipeline — see CLIPTrainer.train_step_async."""
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, jnp.asarray(pixels), jnp.asarray(tokens)
        )
        return loss

    def train_step(self, pixels: np.ndarray, tokens: np.ndarray) -> float:
        """pixels (B, H, W, 3), tokens (B, T); B must divide over
        data_shards * num_micro. Synchronous; prefer train_step_async for
        throughput."""
        return float(self.train_step_async(pixels, tokens))
