"""Contrastive CLIP training over a (data, model) device mesh.

The reference is inference-only (it downloads pretrained CLIP weights,
app_pipeline.py:103); a complete framework also needs the fine-tuning path
for domain galleries. Greenfield TPU design (SURVEY §2 "parallelism"):

  * data parallelism: image/text batches sharded over the `data` axis; the
    contrastive loss needs the *global* batch's similarity matrix, obtained
    with an all-gather of the (small) embedding activations — not the
    images.
  * tensor parallelism: transformer MLP and attention projection matrices
    sharded over the `model` axis (megatron-style column/row split), with
    XLA inserting the reduce at the row-parallel matmul.

Everything is expressed as shardings on one jitted train step; XLA GSPMD
lays down the collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from image_retrieval_tpu.config import ModelConfig
from image_retrieval_tpu.models.clip import CLIP, init_params
from image_retrieval_tpu.parallel.mesh import make_mesh


def clip_contrastive_loss(logits: jnp.ndarray) -> jnp.ndarray:
    """Symmetric InfoNCE over the (B, B) image->text logit matrix."""
    b = logits.shape[0]
    labels = jnp.arange(b)
    li = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    lt = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    return 0.5 * (li + lt)


def _param_spec(path: Tuple[str, ...], leaf) -> P:
    """Tensor-parallel sharding rules for CLIP parameters.

    Column-parallel (output dim on `model`): attention q/k/v, MLP fc1.
    Row-parallel (input dim on `model`): attention out_proj, MLP fc2.
    Everything else replicated."""
    names = [getattr(k, "key", str(k)) for k in path]
    joined = "/".join(str(n) for n in names)
    if leaf.ndim == 2:
        if any(s in joined for s in ("q_proj", "k_proj", "v_proj", "fc1")) and joined.endswith("kernel"):
            return P(None, "model")
        if any(s in joined for s in ("out_proj", "fc2")) and joined.endswith("kernel"):
            return P("model", None)
    if leaf.ndim == 1 and any(
        s in joined for s in ("q_proj", "k_proj", "v_proj", "fc1")
    ) and joined.endswith("bias"):
        return P("model")
    return P()


def param_shardings(params, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _param_spec(path, leaf)), params
    )


class CLIPTrainer:
    """jit-compiled sharded train step + simple host loop."""

    def __init__(
        self,
        cfg: Optional[ModelConfig] = None,
        mesh: Optional[Mesh] = None,
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
            # QuantDense now carries its own straight-through VJP
            # (models/clip.py _quant_matmul, ADVICE r2), so direct jax.grad
            # over the unfused int8 path is no longer silently wrong — but
            # training through it quantizes EVERY projection's forward with
            # none of the fused kernels' speed, the worst of both. Keep the
            # trainer opinionated: int8 training goes through the fused-
            # kernel STE path.
            raise ValueError(
                "int8_matmuls without fused kernels: use the fused-kernel "
                "STE path (fused_attn_block/fused_layer_block) for int8 "
                "training, or the default config for bf16/f32 training. "
                "(Direct jax.grad over unfused QuantDense does work — "
                "straight-through — but is never the fast configuration.)"
            )
        self.mesh = mesh if mesh is not None else make_mesh()
        dtype = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32
        self.model = CLIP(self.cfg, dtype=dtype)
        if params is None:
            _, params = init_params(self.cfg, seed=seed, dtype=dtype)
        self.tx = optimizer if optimizer is not None else optax.adamw(
            learning_rate, weight_decay=weight_decay
        )
        p_shardings = param_shardings(params, self.mesh)
        self.params = jax.device_put(params, p_shardings)
        opt_state = self.tx.init(self.params)
        rep = NamedSharding(self.mesh, P())
        opt_shardings = jax.tree_util.tree_map(
            lambda x: x.sharding
            if isinstance(x, jax.Array) and x.sharding.num_devices == self.mesh.size
            else rep,
            opt_state,
        )
        self.opt_state = jax.device_put(opt_state, opt_shardings)
        data_sh = NamedSharding(self.mesh, P("data"))

        def step(params, opt_state, pixels, tokens):
            def loss_fn(p):
                img = self.model.apply(p, pixels, method=CLIP.encode_image)
                txt = self.model.apply(p, tokens, method=CLIP.encode_text)
                img = img / (jnp.linalg.norm(img, axis=-1, keepdims=True) + 1e-8)
                txt = txt / (jnp.linalg.norm(txt, axis=-1, keepdims=True) + 1e-8)
                scale = jnp.exp(p["params"]["logit_scale"])
                logits = scale * jnp.dot(
                    img, txt.T, preferred_element_type=jnp.float32
                )
                return clip_contrastive_loss(logits)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt, loss

        self._step = jax.jit(
            step,
            in_shardings=(p_shardings, opt_shardings, data_sh, data_sh),
            out_shardings=(p_shardings, opt_shardings, NamedSharding(self.mesh, P())),
            donate_argnums=(0, 1),
        )

    def train_step_async(self, pixels, tokens):
        """One optimizer step; returns the loss as a DEVICE array with no
        host sync, so back-to-back steps pipeline — the runtime dispatches
        ahead while earlier steps execute. (A per-step `float(loss)` sync
        stalls the device for a full host round-trip between steps: under
        the dev tunnel that is 30-45 ms/step, more than the step itself.)"""
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, jnp.asarray(pixels), jnp.asarray(tokens)
        )
        return loss

    def train_step(self, pixels: np.ndarray, tokens: np.ndarray) -> float:
        """One optimizer step on a (global) batch; batch size must divide the
        `data` axis. Synchronous (fetches the loss); prefer fit() or
        train_step_async() for throughput."""
        return float(self.train_step_async(pixels, tokens))

    def fit(self, batches, steps: Optional[int] = None,
            max_in_flight: int = 8) -> list:
        """Pipelined training loop: steps are dispatched asynchronously,
        synced every `max_in_flight` steps (unbounded dispatch would queue
        one full input batch of device memory per step — ~150 MB at batch
        256 — and OOM if the host loop outruns the device), and losses are
        drained in one batched transfer at the end."""
        losses = []
        for i, (pixels, tokens) in enumerate(batches):
            if steps is not None and i >= steps:
                break
            losses.append(self.train_step_async(pixels, tokens))
            if len(losses) % max_in_flight == 0:
                _ = jax.device_get(losses[-1])  # bound in-flight steps
        return [float(v) for v in jax.device_get(losses)]

    # -- checkpoint / resume (orbax) ------------------------------------------
    # The reference's only "checkpointing" is npz artifact caching
    # (SURVEY §5); training state gets real checkpoints.

    def save_checkpoint(self, path: str) -> None:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            path, {"params": self.params, "opt_state": self.opt_state}, force=True
        )
        ckptr.wait_until_finished()

    def restore_checkpoint(self, path: str) -> None:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        target = {"params": self.params, "opt_state": self.opt_state}
        restored = ckptr.restore(path, target)
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
