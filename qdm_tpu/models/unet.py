"""Flax UNet2DCondition — TPU-native port of the Stable Diffusion UNet.

Covers SD1.x (reference shim: models/StableDiffusion1_x.py) and SDXL
(models/StableDiffusionXL.py) via one config.  Module names mirror the
diffusers parameter tree (down_blocks_0/attentions_1/transformer_blocks_0/
attn1/to_q, ...) so HF safetensors checkpoints convert mechanically
(qdm_tpu/api/loader.py) and the reference's SmoothQuant scaling groups
(StableDiffusion1_x.py:115-150: norm1 -> attn1.{to_q,to_k,to_v},
norm3 -> ff.net.0.proj) address the same paths.

Layout: NHWC activations, bf16 compute, f32 params/norm stats.
Every linear is a QDense and every conv a QConv consulting the
QuantPlan, so a single module tree serves bf16 / fake-quant / Pallas
packed execution.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from qdm_tpu.models.layers import GroupNorm, LayerNorm, NO_PLAN, QConv, QDense
from qdm_tpu.ops.attention import dot_product_attention
from qdm_tpu.quant.plan import QuantPlan

Dtype = Any


@dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D", "DownBlock2D")
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D", "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D", "CrossAttnUpBlock2D")
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    # SD1.x quirk: `attention_head_dim` is the *head count* (diffusers
    # keeps the historical name); SDXL sets num_attention_heads per level
    attention_head_dim: Tuple[int, ...] = (8, 8, 8, 8)
    transformer_layers_per_block: Tuple[int, ...] = (1, 1, 1, 1)
    use_linear_projection: bool = False
    norm_num_groups: int = 32
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    addition_embed_type: Optional[str] = None    # SDXL: "text_time"
    addition_time_embed_dim: int = 256           # SDXL
    projection_class_embeddings_input_dim: int = 2816  # SDXL

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


SD15_UNET = UNetConfig()

SDXL_UNET = UNetConfig(
    sample_size=128,
    block_out_channels=(320, 640, 1280),
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"),
    cross_attention_dim=2048,
    attention_head_dim=(5, 10, 20),
    transformer_layers_per_block=(1, 2, 10),
    use_linear_projection=True,
    addition_embed_type="text_time",
)


def tiny_unet_config(cross_dim: int = 32) -> UNetConfig:
    """Small random-init config for tests."""
    return UNetConfig(
        sample_size=8,
        block_out_channels=(32, 64),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1,
        cross_attention_dim=cross_dim,
        attention_head_dim=(2, 2),
        transformer_layers_per_block=(1, 1),
        norm_num_groups=8,
    )


def get_timestep_embedding(timesteps, dim: int, flip_sin_to_cos: bool = True,
                           freq_shift: float = 0.0, max_period: float = 10000.0):
    """Sinusoidal timestep embedding (diffusers get_timestep_embedding
    semantics; SD uses flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    dim: int
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, sample):
        h = QDense(self.dim, dtype=self.dtype, plan=self.plan, name="linear_1")(sample)
        h = nn.silu(h)
        return QDense(self.dim, dtype=self.dtype, plan=self.plan, name="linear_2")(h)


class CrossAttention(nn.Module):
    query_dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x, context=None, residual=None, ln=None):
        """ln, if given, LayerNorms the query-side input x (folded into
        the q/kv projection kernels when they're packed int8)."""
        is_self = context is None
        context = x if context is None else context
        inner = self.heads * self.dim_head
        if self.plan.fuse_qkv and is_self:
            qkv = QDense(inner * 3, use_bias=False, dtype=self.dtype,
                         plan=self.plan, name="to_qkv")(x, ln=ln)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        elif self.plan.fuse_qkv:
            q = QDense(inner, use_bias=False, dtype=self.dtype, plan=self.plan,
                       name="to_q")(x, ln=ln)
            kv = QDense(inner * 2, use_bias=False, dtype=self.dtype,
                        plan=self.plan, name="to_kv")(context)
            k, v = jnp.split(kv, 2, axis=-1)
        else:
            q = QDense(inner, use_bias=False, dtype=self.dtype, plan=self.plan, name="to_q")(x, ln=ln)
            k = QDense(inner, use_bias=False, dtype=self.dtype, plan=self.plan, name="to_k")(
                context, ln=ln if is_self else None)
            v = QDense(inner, use_bias=False, dtype=self.dtype, plan=self.plan, name="to_v")(
                context, ln=ln if is_self else None)
        b, sq = q.shape[0], q.shape[1]
        q = q.reshape(b, sq, self.heads, self.dim_head)
        k = k.reshape(b, -1, self.heads, self.dim_head)
        v = v.reshape(b, -1, self.heads, self.dim_head)
        out = dot_product_attention(q, k, v, quantized=self.plan.int8_bmm)
        out = out.reshape(b, sq, inner)
        return QDense(self.query_dim, dtype=self.dtype, plan=self.plan,
                      name="to_out_0")(out, residual=residual)


class _W8A8GEGLUProj(nn.Module):
    """Fused int8 GEGLU projection (param layout identical to the
    QDense w8a8 layer it replaces, so pack_params output loads as-is)."""

    features: int          # 2 * inner_dim
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x2):
        from qdm_tpu.ops import quant_matmul as qmm

        in_features = x2.shape[-1]
        w_i8 = self.param("qweight", nn.initializers.zeros_init(),
                          (qmm._round_up(in_features, 32),
                           qmm._round_up(self.features, qmm.LANE)), jnp.int8)
        w_scale = self.param("scales", nn.initializers.ones_init(),
                             (1, w_i8.shape[1]), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        bias_p = jnp.zeros((1, w_i8.shape[1]), jnp.float32).at[0, :self.features].set(bias)
        return qmm.w8a8_geglu_fused(x2.astype(self.dtype), w_i8, w_scale,
                                    bias_p, out_dtype=self.dtype)


class GEGLU(nn.Module):
    inner_dim: int
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x):
        from qdm_tpu.ops.quant_matmul import on_tpu, _round_up, LANE

        spec = self.plan.spec_for("/".join(str(p) for p in self.path) + "/proj")
        fusable = (spec.mode == "w8a8" and on_tpu()
                   and self.inner_dim % LANE == 0
                   and _round_up(self.inner_dim * 2, LANE) == self.inner_dim * 2)
        if fusable:
            # single fused kernel: both halves + gelu gating in-kernel,
            # no (M, 2*inner) HBM round trip
            return _W8A8GEGLUProj(self.inner_dim * 2, dtype=self.dtype,
                                  name="proj")(x.reshape(-1, x.shape[-1])
                                               ).reshape(*x.shape[:-1], self.inner_dim)
        h = QDense(self.inner_dim * 2, dtype=self.dtype, plan=self.plan, name="proj")(x)
        hidden, gate = jnp.split(h, 2, axis=-1)
        return hidden * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x, residual=None):
        h = GEGLU(self.dim * self.mult, dtype=self.dtype, plan=self.plan, name="net_0")(x)
        return QDense(self.dim, dtype=self.dtype, plan=self.plan,
                      name="net_2")(h, residual=residual)


class BasicTransformerBlock(nn.Module):
    """norm1->attn1(self), norm2->attn2(cross), norm3->ff; the unit the
    reference smooths (get_smoothing_blocks, StableDiffusion1_x.py:96-102)."""

    dim: int
    heads: int
    dim_head: int
    context_dim: int
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x, context):
        # residual adds ride the projection kernels' epilogues; with
        # plan.fuse_ln the norms fold into the packed qkv kernels too
        if self.plan.fuse_ln:
            ln1 = LayerNorm(dtype=self.dtype, name="norm1")(
                x, return_params_only=True)
            x = CrossAttention(self.dim, self.heads, self.dim_head,
                               dtype=self.dtype, plan=self.plan, name="attn1")(
                x, residual=x, ln=ln1)
            ln2 = LayerNorm(dtype=self.dtype, name="norm2")(
                x, return_params_only=True)
            x = CrossAttention(self.dim, self.heads, self.dim_head,
                               context_dim=self.context_dim, dtype=self.dtype,
                               plan=self.plan, name="attn2")(
                x, context, residual=x, ln=ln2)
        else:
            h = LayerNorm(dtype=self.dtype, name="norm1")(x)
            x = CrossAttention(self.dim, self.heads, self.dim_head,
                               dtype=self.dtype, plan=self.plan, name="attn1")(
                h, residual=x)
            h = LayerNorm(dtype=self.dtype, name="norm2")(x)
            x = CrossAttention(self.dim, self.heads, self.dim_head,
                               context_dim=self.context_dim, dtype=self.dtype,
                               plan=self.plan, name="attn2")(h, context, residual=x)
        h = LayerNorm(dtype=self.dtype, name="norm3")(x)
        x = FeedForward(self.dim, dtype=self.dtype, plan=self.plan,
                        name="ff")(h, residual=x)
        return x


class Transformer2D(nn.Module):
    in_channels: int
    heads: int
    dim_head: int
    depth: int
    context_dim: int
    use_linear_projection: bool
    norm_num_groups: int = 32
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x, context):
        b, hgt, wdt, c = x.shape
        residual = x
        h = GroupNorm(self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if self.use_linear_projection:
            h = h.reshape(b, hgt * wdt, c)
            h = QDense(c, dtype=self.dtype, plan=self.plan, name="proj_in")(h)
        else:
            h = QConv(c, (1, 1), 1, 0, dtype=self.dtype, plan=self.plan, name="proj_in")(h)
            h = h.reshape(b, hgt * wdt, c)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                c, self.heads, self.dim_head, self.context_dim,
                dtype=self.dtype, plan=self.plan, name=f"transformer_blocks_{i}",
            )(h, context)
        if self.use_linear_projection:
            h = QDense(c, dtype=self.dtype, plan=self.plan, name="proj_out")(h)
            h = h.reshape(b, hgt, wdt, c)
        else:
            h = h.reshape(b, hgt, wdt, c)
            h = QConv(c, (1, 1), 1, 0, dtype=self.dtype, plan=self.plan, name="proj_out")(h)
        return h + residual


class ResnetBlock2D(nn.Module):
    out_channels: int
    norm_num_groups: int = 32
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x, temb):
        in_channels = x.shape[-1]
        h = GroupNorm(self.norm_num_groups, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = QConv(self.out_channels, (3, 3), 1, 1, dtype=self.dtype,
                  plan=self.plan, name="conv1")(h)
        t = QDense(self.out_channels, dtype=self.dtype, plan=self.plan,
                   name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = GroupNorm(self.norm_num_groups, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = QConv(self.out_channels, (3, 3), 1, 1, dtype=self.dtype,
                  plan=self.plan, name="conv2")(h)
        if in_channels != self.out_channels:
            x = QConv(self.out_channels, (1, 1), 1, 0, dtype=self.dtype,
                      plan=self.plan, name="conv_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    channels: int
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x):
        return QConv(self.channels, (3, 3), 2, 1, dtype=self.dtype,
                     plan=self.plan, name="conv")(x)


class Upsample2D(nn.Module):
    channels: int
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return QConv(self.channels, (3, 3), 1, 1, dtype=self.dtype,
                     plan=self.plan, name="conv")(x)


class UNet2DCondition(nn.Module):
    """The full conditioned UNet (diffusers UNet2DConditionModel parity)."""

    config: UNetConfig = SD15_UNET
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 added_cond: Optional[dict] = None):
        """sample: (B, H, W, C_in) latents; timesteps: (B,) or scalar;
        encoder_hidden_states: (B, S, D_ctx)."""
        cfg = self.config
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        # --- time + addition embeddings
        t_emb = get_timestep_embedding(
            timesteps, cfg.block_out_channels[0],
            cfg.flip_sin_to_cos, cfg.freq_shift).astype(self.dtype)
        temb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                 plan=self.plan, name="time_embedding")(t_emb)
        if cfg.addition_embed_type == "text_time":
            assert added_cond is not None, "SDXL needs text_embeds/time_ids"
            text_embeds = added_cond["text_embeds"]
            time_ids = added_cond["time_ids"]
            t_ids_emb = get_timestep_embedding(
                time_ids.reshape(-1), cfg.addition_time_embed_dim,
                cfg.flip_sin_to_cos, cfg.freq_shift)
            t_ids_emb = t_ids_emb.reshape(text_embeds.shape[0], -1)
            add_emb = jnp.concatenate(
                [text_embeds, t_ids_emb.astype(text_embeds.dtype)], axis=-1)
            temb = temb + TimestepEmbedding(
                cfg.time_embed_dim, dtype=self.dtype, plan=self.plan,
                name="add_embedding")(add_emb.astype(self.dtype))

        ctx = encoder_hidden_states.astype(self.dtype)
        sample = sample.astype(self.dtype)

        h = QConv(cfg.block_out_channels[0], (3, 3), 1, 1, dtype=self.dtype,
                  plan=self.plan, name="conv_in")(sample)

        # --- down
        residuals = [h]
        for i, block_type in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            heads = cfg.attention_head_dim[i]
            is_final = i == len(cfg.down_block_types) - 1
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(out_ch, cfg.norm_num_groups, dtype=self.dtype,
                                  plan=self.plan,
                                  name=f"down_blocks_{i}/resnets_{j}")(h, temb)
                if block_type == "CrossAttnDownBlock2D":
                    h = Transformer2D(
                        out_ch, heads, out_ch // heads,
                        cfg.transformer_layers_per_block[i], cfg.cross_attention_dim,
                        cfg.use_linear_projection, cfg.norm_num_groups,
                        dtype=self.dtype, plan=self.plan,
                        name=f"down_blocks_{i}/attentions_{j}")(h, ctx)
                residuals.append(h)
            if not is_final:
                h = Downsample2D(out_ch, dtype=self.dtype, plan=self.plan,
                                 name=f"down_blocks_{i}/downsamplers_0")(h)
                residuals.append(h)

        # --- mid
        mid_ch = cfg.block_out_channels[-1]
        mid_heads = cfg.attention_head_dim[-1]
        h = ResnetBlock2D(mid_ch, cfg.norm_num_groups, dtype=self.dtype,
                          plan=self.plan, name="mid_block/resnets_0")(h, temb)
        h = Transformer2D(mid_ch, mid_heads, mid_ch // mid_heads,
                          cfg.transformer_layers_per_block[-1],
                          cfg.cross_attention_dim, cfg.use_linear_projection,
                          cfg.norm_num_groups, dtype=self.dtype, plan=self.plan,
                          name="mid_block/attentions_0")(h, ctx)
        h = ResnetBlock2D(mid_ch, cfg.norm_num_groups, dtype=self.dtype,
                          plan=self.plan, name="mid_block/resnets_1")(h, temb)

        # --- up
        rev_channels = list(reversed(cfg.block_out_channels))
        rev_heads = list(reversed(cfg.attention_head_dim))
        rev_tlayers = list(reversed(cfg.transformer_layers_per_block))
        for i, block_type in enumerate(cfg.up_block_types):
            out_ch = rev_channels[i]
            heads = rev_heads[i]
            is_final = i == len(cfg.up_block_types) - 1
            for j in range(cfg.layers_per_block + 1):
                res = residuals.pop()
                h = jnp.concatenate([h, res], axis=-1)
                h = ResnetBlock2D(out_ch, cfg.norm_num_groups, dtype=self.dtype,
                                  plan=self.plan,
                                  name=f"up_blocks_{i}/resnets_{j}")(h, temb)
                if block_type == "CrossAttnUpBlock2D":
                    h = Transformer2D(
                        out_ch, heads, out_ch // heads, rev_tlayers[i],
                        cfg.cross_attention_dim, cfg.use_linear_projection,
                        cfg.norm_num_groups, dtype=self.dtype, plan=self.plan,
                        name=f"up_blocks_{i}/attentions_{j}")(h, ctx)
            if not is_final:
                h = Upsample2D(out_ch, dtype=self.dtype, plan=self.plan,
                               name=f"up_blocks_{i}/upsamplers_0")(h)

        h = GroupNorm(cfg.norm_num_groups, dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = QConv(cfg.out_channels, (3, 3), 1, 1, dtype=self.dtype,
                  plan=self.plan, name="conv_out")(h)
        return h.astype(jnp.float32)
