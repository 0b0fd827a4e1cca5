"""Flax Bloom causal LM (reference shim: models/bloom.py).

Architecturally distinct from the LLaMA family: ALiBi position biases
(no RoPE), a fused query_key_value projection, LayerNorms with bias,
word-embedding LayerNorm, and a GELU MLP whose activation is scalable —
the reference's only `get_act_for_scaling` user (bloom.py:13-19,
scale_gelu_fc scale.py:156-164), realized here as a ScaledActivation
module whose `scales` the SmoothQuant/AWQ migration updates.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from qdm_tpu.models.layers import LayerNorm, NO_PLAN, QDense, ScaledActivation
from qdm_tpu.quant.plan import QuantPlan

Dtype = Any


@dataclass(frozen=True)
class BloomConfig:
    vocab_size: int = 250880
    hidden_size: int = 4096
    num_hidden_layers: int = 30
    num_attention_heads: int = 32
    layer_norm_epsilon: float = 1e-5

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads


def tiny_bloom_config() -> BloomConfig:
    return BloomConfig(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=4)


def alibi_slopes(n_heads: int) -> np.ndarray:
    """Standard ALiBi head slopes."""
    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(n_heads).is_integer():
        return np.asarray(pow2_slopes(n_heads), np.float32)
    closest = 2 ** math.floor(math.log2(n_heads))
    return np.asarray(
        pow2_slopes(closest) + pow2_slopes(2 * closest)[0::2][: n_heads - closest],
        np.float32)


class BloomBlock(nn.Module):
    config: BloomConfig
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x, alibi_bias):
        cfg = self.config
        b, s, _ = x.shape
        h, d = cfg.num_attention_heads, cfg.head_dim

        res = x
        hx = LayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=self.dtype,
                       name="input_layernorm")(x)
        qkv = QDense(3 * cfg.hidden_size, dtype=self.dtype, plan=self.plan,
                     name="self_attention/query_key_value")(hx)
        qkv = qkv.reshape(b, s, h, 3, d)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        logits = logits * (d ** -0.5) + alibi_bias
        mask = jnp.tril(jnp.ones((s, s), bool))[None, None]
        logits = jnp.where(mask, logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        att = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, h * d)
        x = res + QDense(cfg.hidden_size, dtype=self.dtype, plan=self.plan,
                         name="self_attention/dense")(att)

        res = x
        hx = LayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=self.dtype,
                       name="post_attention_layernorm")(x)
        hx = QDense(4 * cfg.hidden_size, dtype=self.dtype, plan=self.plan,
                    name="mlp/dense_h_to_4h")(hx)
        # scalable GELU: the reference migrates scales into this
        # activation (get_act_for_scaling, bloom.py:13-19)
        hx = ScaledActivation(act_fn=lambda z: nn.gelu(z, approximate=True),
                              name="mlp/gelu_impl")(hx)
        hx = QDense(cfg.hidden_size, dtype=self.dtype, plan=self.plan,
                    name="mlp/dense_4h_to_h")(hx)
        return res + hx


class BloomForCausalLM(nn.Module):
    config: BloomConfig
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, input_ids):
        cfg = self.config
        b, s = input_ids.shape
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                     name="word_embeddings")(input_ids)
        x = LayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=self.dtype,
                      name="word_embeddings_layernorm")(x)
        slopes = jnp.asarray(alibi_slopes(cfg.num_attention_heads))
        pos = jnp.arange(s)
        rel = (pos[None, :] - pos[:, None]).astype(jnp.float32)  # k - q
        alibi = slopes[:, None, None] * jnp.minimum(rel, 0.0)[None]
        alibi = alibi[None]                                      # (1,h,s,s)
        for i in range(cfg.num_hidden_layers):
            x = BloomBlock(cfg, dtype=self.dtype, plan=self.plan,
                           name=f"h_{i}")(x, alibi)
        x = LayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=self.dtype,
                      name="ln_f")(x)
        embed = self.variables["params"]["word_embeddings"]["embedding"]
        return (x @ embed.T.astype(self.dtype)).astype(jnp.float32)
