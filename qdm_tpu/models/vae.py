"""Flax AutoencoderKL (SD VAE) — decoder (latents -> image) and encoder.

The reference quantizes only the VAE *decoder* (models/
StableDiffusion1_x.py:59-67 returns decoder children).  Module names
mirror diffusers keys for mechanical checkpoint conversion.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from qdm_tpu.models.layers import GroupNorm, NO_PLAN, QConv, QDense
from qdm_tpu.ops.attention import dot_product_attention
from qdm_tpu.quant.plan import QuantPlan

Dtype = Any


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215  # SD1.x/SDXL(0.13025 for sdxl-vae)
    shift_factor: float = 0.0        # SD3: 0.0609
    use_quant_conv: bool = True      # SD3: False


SD_VAE = VAEConfig()
SDXL_VAE = VAEConfig(scaling_factor=0.13025)
SD3_VAE = VAEConfig(latent_channels=16, scaling_factor=1.5305,
                    shift_factor=0.0609, use_quant_conv=False)


def tiny_vae_config() -> VAEConfig:
    return VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                     norm_num_groups=8)


class VAEResnet(nn.Module):
    out_channels: int
    norm_num_groups: int = 32
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = GroupNorm(self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = QConv(self.out_channels, (3, 3), 1, 1, dtype=self.dtype,
                  plan=self.plan, name="conv1")(h)
        h = GroupNorm(self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = QConv(self.out_channels, (3, 3), 1, 1, dtype=self.dtype,
                  plan=self.plan, name="conv2")(h)
        if in_ch != self.out_channels:
            x = QConv(self.out_channels, (1, 1), 1, 0, dtype=self.dtype,
                      plan=self.plan, name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head spatial self-attention in the VAE mid block."""

    channels: int
    norm_num_groups: int = 32
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = GroupNorm(self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        h = h.reshape(b, hh * ww, c)
        q = QDense(c, dtype=self.dtype, plan=self.plan, name="to_q")(h)
        k = QDense(c, dtype=self.dtype, plan=self.plan, name="to_k")(h)
        v = QDense(c, dtype=self.dtype, plan=self.plan, name="to_v")(h)
        out = dot_product_attention(q[:, :, None, :], k[:, :, None, :], v[:, :, None, :])
        out = out.reshape(b, hh * ww, c)
        out = QDense(c, dtype=self.dtype, plan=self.plan, name="to_out_0")(out)
        return x + out.reshape(b, hh, ww, c)


class VAEMidBlock(nn.Module):
    channels: int
    norm_num_groups: int = 32
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x):
        x = VAEResnet(self.channels, self.norm_num_groups, dtype=self.dtype,
                      plan=self.plan, name="resnets_0")(x)
        x = VAEAttention(self.channels, self.norm_num_groups, dtype=self.dtype,
                         plan=self.plan, name="attentions_0")(x)
        return VAEResnet(self.channels, self.norm_num_groups, dtype=self.dtype,
                         plan=self.plan, name="resnets_1")(x)


class VAEDecoder(nn.Module):
    config: VAEConfig = SD_VAE
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        ch = cfg.block_out_channels[-1]
        h = QConv(ch, (3, 3), 1, 1, dtype=self.dtype, plan=self.plan, name="conv_in")(z)
        h = VAEMidBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                        plan=self.plan, name="mid_block")(h)
        rev = list(reversed(cfg.block_out_channels))
        for i, out_ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = VAEResnet(out_ch, cfg.norm_num_groups, dtype=self.dtype,
                              plan=self.plan, name=f"up_blocks_{i}/resnets_{j}")(h)
            if i < len(rev) - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), method="nearest")
                h = QConv(out_ch, (3, 3), 1, 1, dtype=self.dtype, plan=self.plan,
                          name=f"up_blocks_{i}/upsamplers_0/conv")(h)
        h = GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=self.dtype,
                      name="conv_norm_out")(h)
        h = nn.silu(h)
        return QConv(cfg.out_channels, (3, 3), 1, 1, dtype=self.dtype,
                     plan=self.plan, name="conv_out")(h)


class VAEEncoder(nn.Module):
    config: VAEConfig = SD_VAE
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = QConv(cfg.block_out_channels[0], (3, 3), 1, 1, dtype=self.dtype,
                  plan=self.plan, name="conv_in")(x)
        for i, out_ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = VAEResnet(out_ch, cfg.norm_num_groups, dtype=self.dtype,
                              plan=self.plan, name=f"down_blocks_{i}/resnets_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                h = QConv(out_ch, (3, 3), 2, ((0, 1), (0, 1)), dtype=self.dtype,
                          plan=self.plan, name=f"down_blocks_{i}/downsamplers_0/conv")(h)
        h = VAEMidBlock(cfg.block_out_channels[-1], cfg.norm_num_groups,
                        dtype=self.dtype, plan=self.plan, name="mid_block")(h)
        h = GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=self.dtype,
                      name="conv_norm_out")(h)
        h = nn.silu(h)
        return QConv(cfg.latent_channels * 2, (3, 3), 1, 1, dtype=self.dtype,
                     plan=self.plan, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """decode(z) / encode(x) with the quant_conv projections."""

    config: VAEConfig = SD_VAE
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    def setup(self):
        self.decoder = VAEDecoder(self.config, dtype=self.dtype, plan=self.plan)
        self.encoder = VAEEncoder(self.config, dtype=self.dtype, plan=self.plan)
        if self.config.use_quant_conv:
            self.post_quant_conv = QConv(self.config.latent_channels, (1, 1), 1, 0,
                                         dtype=self.dtype, plan=self.plan)
            self.quant_conv = QConv(self.config.latent_channels * 2, (1, 1), 1, 0,
                                    dtype=self.dtype, plan=self.plan)

    def decode(self, z):
        z = z / self.config.scaling_factor + self.config.shift_factor
        if self.config.use_quant_conv:
            z = self.post_quant_conv(z)
        return self.decoder(z)

    def encode_moments(self, x):
        h = self.encoder(x)
        if self.config.use_quant_conv:
            h = self.quant_conv(h)
        return h

    def __call__(self, z):
        return self.decode(z)
