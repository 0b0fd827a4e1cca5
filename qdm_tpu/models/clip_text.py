"""Flax CLIP text encoder (SD1.x/SDXL text conditioning).

Replaces the reference's use of ``transformers.CLIPTextModel`` inside
the diffusers pipeline (reference: models/base.py:199, quantized via the
text_encoder component hooks StableDiffusion1_x.py:49-57).  Also the
basis of the CLIP model-shim parity (reference models/clip.py).

Module names mirror HF keys (text_model.encoder.layers.N.self_attn.q_proj
-> layers_N/self_attn/q_proj) for mechanical checkpoint conversion.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from qdm_tpu.models.layers import LayerNorm, NO_PLAN, QDense
from qdm_tpu.quant.plan import QuantPlan

Dtype = Any


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"   # CLIP-L; OpenCLIP bigG uses "gelu"
    projection_dim: int = 768        # used by SDXL text_encoder_2


SD15_TEXT = CLIPTextConfig()
SDXL_TEXT2 = CLIPTextConfig(hidden_size=1280, intermediate_size=5120,
                            num_hidden_layers=32, num_attention_heads=20,
                            hidden_act="gelu", projection_dim=1280)


def tiny_clip_config() -> CLIPTextConfig:
    return CLIPTextConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=2,
                          max_position_embeddings=16, projection_dim=32)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return lambda x: nn.gelu(x, approximate=False)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        h = cfg.num_attention_heads
        d = cfg.hidden_size // h
        b, s, _ = x.shape
        q = QDense(cfg.hidden_size, dtype=self.dtype, plan=self.plan, name="q_proj")(x)
        k = QDense(cfg.hidden_size, dtype=self.dtype, plan=self.plan, name="k_proj")(x)
        v = QDense(cfg.hidden_size, dtype=self.dtype, plan=self.plan, name="v_proj")(x)
        q = q.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (d ** -0.5)
        logits = logits + causal_mask
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, cfg.hidden_size)
        return QDense(cfg.hidden_size, dtype=self.dtype, plan=self.plan, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        h = LayerNorm(dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(cfg, dtype=self.dtype, plan=self.plan,
                              name="self_attn")(h, causal_mask)
        h = LayerNorm(dtype=self.dtype, name="layer_norm2")(x)
        h = QDense(cfg.intermediate_size, dtype=self.dtype, plan=self.plan,
                   name="mlp/fc1")(h)
        h = _act(cfg.hidden_act)(h)
        h = QDense(cfg.hidden_size, dtype=self.dtype, plan=self.plan,
                   name="mlp/fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Returns (last_hidden_state, penultimate_hidden_state, pooled).

    SD1.5 conditions on the final hidden states; SDXL uses the
    penultimate layer of both encoders plus text_encoder_2's pooled
    (projected) embedding."""

    config: CLIPTextConfig = SD15_TEXT
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN
    with_projection: bool = False

    @nn.compact
    def __call__(self, input_ids):
        cfg = self.config
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=self.dtype, name="position_embedding")(
            jnp.arange(s)[None, :])
        x = tok + pos
        causal_mask = jnp.triu(
            jnp.full((s, s), -1e9, jnp.float32), k=1)[None, None]
        penultimate = x
        for i in range(cfg.num_hidden_layers):
            penultimate = x
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, plan=self.plan,
                                 name=f"layers_{i}")(x, causal_mask)
        last = LayerNorm(dtype=self.dtype, name="final_layer_norm")(x)
        # pooled = hidden state at the EOT token (highest token id)
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = last[jnp.arange(b), eot]
        if self.with_projection:
            pooled = QDense(cfg.projection_dim, use_bias=False, dtype=self.dtype,
                            plan=self.plan, name="text_projection")(pooled)
        return last, penultimate, pooled
