"""Flax T5 encoder — SD3.5's third text conditioner (text_encoder_3).

Encoder-only T5 (HF T5EncoderModel parity): pre-RMSNorm blocks with
relative-position-bias attention (bias table on block 0, shared
thereafter), gated-GELU feed-forward, *unscaled* attention scores
(T5 folds d^-0.5 into init).  Module names mirror HF keys
(encoder.block.N.layer.0.SelfAttention.q -> block_N/layer_0/SelfAttention/q).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from qdm_tpu.models.layers import NO_PLAN, QDense, RMSNorm
from qdm_tpu.quant.plan import QuantPlan

Dtype = Any


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6


T5_XXL = T5Config()


def tiny_t5_config() -> T5Config:
    return T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64,
                    num_layers=2, num_heads=4)


def relative_position_bucket(relative_position, num_buckets: int = 32,
                             max_distance: int = 128):
    """Bidirectional bucketing (HF T5 semantics)."""
    num_buckets = num_buckets // 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class T5Attention(nn.Module):
    config: T5Config
    has_bias_table: bool = False
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x, position_bias=None):
        cfg = self.config
        b, s, _ = x.shape
        h, d = cfg.num_heads, cfg.d_kv
        inner = h * d
        q = QDense(inner, use_bias=False, dtype=self.dtype, plan=self.plan,
                   name="q")(x).reshape(b, s, h, d)
        k = QDense(inner, use_bias=False, dtype=self.dtype, plan=self.plan,
                   name="k")(x).reshape(b, s, h, d)
        v = QDense(inner, use_bias=False, dtype=self.dtype, plan=self.plan,
                   name="v")(x).reshape(b, s, h, d)

        if position_bias is None:
            assert self.has_bias_table
            table = self.param(
                "relative_attention_bias/embedding",
                nn.initializers.normal(1.0),
                (cfg.relative_attention_num_buckets, h), jnp.float32)
            pos = jnp.arange(s)
            rel = pos[None, :] - pos[:, None]
            buckets = relative_position_bucket(
                rel, cfg.relative_attention_num_buckets,
                cfg.relative_attention_max_distance)
            position_bias = table[buckets].transpose(2, 0, 1)[None]  # (1,h,s,s)

        # T5: no d^-0.5 scaling
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        logits = logits + position_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, inner)
        out = QDense(cfg.d_model, use_bias=False, dtype=self.dtype,
                     plan=self.plan, name="o")(out)
        return out, position_bias


class T5Block(nn.Module):
    config: T5Config
    has_bias_table: bool = False
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x, position_bias=None):
        cfg = self.config
        h = RMSNorm(epsilon=cfg.layer_norm_epsilon, dtype=self.dtype,
                    name="layer_0/layer_norm")(x)
        attn, position_bias = T5Attention(
            cfg, self.has_bias_table, dtype=self.dtype, plan=self.plan,
            name="layer_0/SelfAttention")(h, position_bias)
        x = x + attn
        h = RMSNorm(epsilon=cfg.layer_norm_epsilon, dtype=self.dtype,
                    name="layer_1/layer_norm")(x)
        wi0 = QDense(cfg.d_ff, use_bias=False, dtype=self.dtype, plan=self.plan,
                     name="layer_1/DenseReluDense/wi_0")(h)
        wi1 = QDense(cfg.d_ff, use_bias=False, dtype=self.dtype, plan=self.plan,
                     name="layer_1/DenseReluDense/wi_1")(h)
        act = nn.gelu(wi0, approximate=True) * wi1
        x = x + QDense(cfg.d_model, use_bias=False, dtype=self.dtype,
                       plan=self.plan, name="layer_1/DenseReluDense/wo")(act)
        return x, position_bias


class T5Encoder(nn.Module):
    config: T5Config = T5_XXL
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, input_ids):
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype,
                     name="shared")(input_ids)
        position_bias = None
        for i in range(cfg.num_layers):
            x, position_bias = T5Block(
                cfg, has_bias_table=(i == 0), dtype=self.dtype, plan=self.plan,
                name=f"block_{i}")(x, position_bias)
        return RMSNorm(epsilon=cfg.layer_norm_epsilon, dtype=self.dtype,
                       name="final_layer_norm")(x)
