"""Flax CLIP vision tower (ViT) + multimodal projector.

Parity basis for the reference's VLM shims: the CLIP model's 4 sections
(text, vision, both projections — models/clip.py:13-299) and LLaVA's
vision tower + mm projector + LLM stack (models/llava.py).  All linears
are QDense, so the vision tower quantizes under the same plans
(quantVision / quantVisionProjection kwargs of the reference,
models/base.py:216-404).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from qdm_tpu.models.layers import LayerNorm, NO_PLAN, QConv, QDense
from qdm_tpu.quant.plan import QuantPlan

Dtype = Any


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 336
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    projection_dim: int = 768
    hidden_act: str = "quick_gelu"


CLIP_VIT_L_336 = ViTConfig()


def tiny_vit_config() -> ViTConfig:
    return ViTConfig(image_size=16, patch_size=8, hidden_size=32,
                     intermediate_size=64, num_hidden_layers=2,
                     num_attention_heads=2, projection_dim=32)


class ViTEncoderLayer(nn.Module):
    config: ViTConfig
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h_dim, heads = cfg.hidden_size, cfg.num_attention_heads
        d = h_dim // heads
        b, s, _ = x.shape

        h = LayerNorm(dtype=self.dtype, name="layer_norm1")(x)
        q = QDense(h_dim, dtype=self.dtype, plan=self.plan, name="self_attn/q_proj")(h)
        k = QDense(h_dim, dtype=self.dtype, plan=self.plan, name="self_attn/k_proj")(h)
        v = QDense(h_dim, dtype=self.dtype, plan=self.plan, name="self_attn/v_proj")(h)
        q = q.reshape(b, s, heads, d)
        k = k.reshape(b, s, heads, d)
        v = v.reshape(b, s, heads, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * (d ** -0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        att = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, h_dim)
        x = x + QDense(h_dim, dtype=self.dtype, plan=self.plan,
                       name="self_attn/out_proj")(att)

        h = LayerNorm(dtype=self.dtype, name="layer_norm2")(x)
        act = (lambda z: z * jax.nn.sigmoid(1.702 * z)) \
            if self.config.hidden_act == "quick_gelu" else nn.gelu
        h = QDense(cfg.intermediate_size, dtype=self.dtype, plan=self.plan,
                   name="mlp/fc1")(h)
        h = QDense(h_dim, dtype=self.dtype, plan=self.plan, name="mlp/fc2")(act(h))
        return x + h


class CLIPVisionModel(nn.Module):
    """Returns (last_hidden_state, penultimate, pooled_projected)."""

    config: ViTConfig = CLIP_VIT_L_336
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN
    with_projection: bool = False

    @nn.compact
    def __call__(self, pixel_values):
        """pixel_values: (B, H, W, 3) NHWC normalized."""
        cfg = self.config
        b = pixel_values.shape[0]
        n_patches = (cfg.image_size // cfg.patch_size) ** 2

        patches = QConv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                        cfg.patch_size, 0, use_bias=False, dtype=self.dtype,
                        plan=self.plan, name="patch_embedding")(pixel_values)
        patches = patches.reshape(b, n_patches, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size)),
             patches], axis=1)
        pos = nn.Embed(n_patches + 1, cfg.hidden_size, dtype=self.dtype,
                       name="position_embedding")(jnp.arange(n_patches + 1)[None])
        x = x + pos
        x = LayerNorm(dtype=self.dtype, name="pre_layrnorm")(x)

        penultimate = x
        for i in range(cfg.num_hidden_layers):
            penultimate = x
            x = ViTEncoderLayer(cfg, dtype=self.dtype, plan=self.plan,
                                name=f"layers_{i}")(x)
        last = LayerNorm(dtype=self.dtype, name="post_layernorm")(x)
        pooled = last[:, 0]
        if self.with_projection:
            pooled = QDense(cfg.projection_dim, use_bias=False, dtype=self.dtype,
                            plan=self.plan, name="visual_projection")(pooled)
        return last, penultimate, pooled


class LlavaMultiModalProjector(nn.Module):
    """2-layer GELU MLP vision->text bridge (llava.py fuser context)."""

    text_hidden: int
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, image_features):
        h = QDense(self.text_hidden, dtype=self.dtype, plan=self.plan,
                   name="linear_1")(image_features)
        h = nn.gelu(h, approximate=False)
        return QDense(self.text_hidden, dtype=self.dtype, plan=self.plan,
                      name="linear_2")(h)


class Qwen2VLPatchMerger(nn.Module):
    """Qwen2-VL patch merger: LN, 2x2 spatial patch grouping, then a
    2-layer GELU MLP into the LM embedding space.  The consumer side of
    the smart-resize contract (utils/vl_preprocess.py == reference
    utils/qwen_vl_utils.py: images are resized to multiples of
    patch*merge so the grid always groups evenly)."""

    text_hidden: int
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, patch_grid):
        """patch_grid: (B, Gh, Gw, H) patch features on the 2D grid."""
        b, gh, gw, h = patch_grid.shape
        assert gh % 2 == 0 and gw % 2 == 0, (gh, gw)
        x = LayerNorm(dtype=self.dtype, name="ln_q")(patch_grid)
        x = x.reshape(b, gh // 2, 2, gw // 2, 2, h)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (gh // 2) * (gw // 2),
                                                  4 * h)
        x = QDense(4 * h, dtype=self.dtype, plan=self.plan, name="mlp_0")(x)
        x = nn.gelu(x, approximate=False)
        return QDense(self.text_hidden, dtype=self.dtype, plan=self.plan,
                      name="mlp_2")(x)
