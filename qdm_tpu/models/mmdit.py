"""Flax MMDiT (SD3 / SD3.5 transformer) — the reference's third model
family (models/StableDiffusion3_5.py: transformer component instead of
unet, StableDiffusion3_5.py:37-45,85-86).

Dual-stream joint-attention DiT (diffusers SD3Transformer2DModel
naming): patch embed + AdaLN-Zero modulated blocks where latent and
text-context tokens attend jointly, with per-stream QKV/out projections;
the final block drops the context stream.  QK RMSNorm per SD3.5.

All linears are QDense, so the full quant stack (RTN/SQ/AWQ, packed
W8A8/W4A16) applies; the SmoothQuant groups are norm->qkv and
norm->ff per stream (shims.sd3_scaling_groups).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from qdm_tpu.models.layers import LayerNorm, NO_PLAN, QDense, RMSNorm
from qdm_tpu.models.unet import get_timestep_embedding
from qdm_tpu.ops.attention import dot_product_attention
from qdm_tpu.quant.plan import QuantPlan

Dtype = Any


@dataclass(frozen=True)
class MMDiTConfig:
    sample_size: int = 128           # latent H=W
    patch_size: int = 2
    in_channels: int = 16
    num_layers: int = 24
    attention_head_dim: int = 64
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096  # T5 / padded-CLIP context width
    # mask the 128-pad ctx tokens out of every real token's softmax
    # (key-side segment mask): restores the reference's UNALIGNED
    # 333+4096 joint-attention numerics exactly while the pad keeps
    # XLA/Pallas on the fused aligned schedule.  DEFAULT ON — measured
    # FREE on chip (bench_sd35 --mask-pad, batch 4 1024px: bf16 0.200
    # masked vs 0.197 unmasked img/s, w8a8 0.229 vs 0.223 — within
    # tunnel noise, the flash segment-ids schedule keeps its fusion).
    mask_ctx_pad: bool = True
    # joint-sequence alignment target (128 = the TPU lane/fusion
    # requirement).  1 disables padding entirely — the reference's
    # unaligned run, usable off-TPU (tests build the ground truth for
    # mask_ctx_pad with it; on TPU an unaligned joint seq materializes
    # the f32 logits and OOMs, BENCH_NOTES).
    pad_align: int = 128
    caption_projection_dim: int = 1536
    pooled_projection_dim: int = 2048
    pos_embed_max_size: int = 192
    qk_norm: bool = True             # SD3.5
    out_channels: int = 16

    @property
    def hidden_size(self) -> int:
        return self.num_attention_heads * self.attention_head_dim


SD35_MEDIUM = MMDiTConfig()
SD35_LARGE = MMDiTConfig(num_layers=38, num_attention_heads=38,
                         caption_projection_dim=2432)


def tiny_mmdit_config() -> MMDiTConfig:
    return MMDiTConfig(sample_size=8, patch_size=2, in_channels=4,
                       num_layers=2, attention_head_dim=8,
                       num_attention_heads=4, joint_attention_dim=80,
                       caption_projection_dim=32, pooled_projection_dim=16,
                       pos_embed_max_size=8, out_channels=4)


class AdaLayerNormZero(nn.Module):
    """LayerNorm modulated by temb -> (shift, scale, gate) x2."""

    dim: int
    n_chunks: int = 6
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x, temb):
        mod = QDense(self.dim * self.n_chunks, dtype=self.dtype, plan=self.plan,
                     name="linear")(nn.silu(temb))
        chunks = jnp.split(mod[:, None, :], self.n_chunks, axis=-1)
        h = LayerNorm(use_scale=False, use_bias=False, dtype=self.dtype,
                      name="norm")(x)
        out = h * (1 + chunks[1]) + chunks[0]
        return out, chunks[2:]


class JointAttention(nn.Module):
    config: MMDiTConfig
    context_pre_only: bool = False
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x, ctx, ctx_pad: int = 0):
        cfg = self.config
        h, d = cfg.num_attention_heads, cfg.attention_head_dim
        inner = h * d
        b, sx = x.shape[0], x.shape[1]
        sc = ctx.shape[1]

        def qkv(inp, prefix):
            names = {"": ("to_q", "to_k", "to_v"),
                     "add": ("add_q_proj", "add_k_proj", "add_v_proj")}[prefix]
            if self.plan.fuse_qkv:
                # one 3x-wide projection per side: unfused narrow int8
                # matmuls each pay their own act-quant/dequant passes
                # (the 2.2x UNet bisect, BENCH_NOTES.md)
                fname = "to_qkv" if prefix == "" else "add_qkv_proj"
                fused = QDense(inner * 3, dtype=self.dtype, plan=self.plan,
                               name=fname)(inp)
                q, k, v = jnp.split(fused, 3, axis=-1)
            else:
                q = QDense(inner, dtype=self.dtype, plan=self.plan, name=names[0])(inp)
                k = QDense(inner, dtype=self.dtype, plan=self.plan, name=names[1])(inp)
                v = QDense(inner, dtype=self.dtype, plan=self.plan, name=names[2])(inp)
            q = q.reshape(b, -1, h, d)
            k = k.reshape(b, -1, h, d)
            v = v.reshape(b, -1, h, d)
            if cfg.qk_norm:
                q = RMSNorm(dtype=self.dtype, name=f"norm_{prefix or 'x'}_q")(q)
                k = RMSNorm(dtype=self.dtype, name=f"norm_{prefix or 'x'}_k")(k)
            return q, k, v

        qx, kx, vx = qkv(x, "")
        qc, kc, vc = qkv(ctx, "add")
        q = jnp.concatenate([qc, qx], axis=1)
        k = jnp.concatenate([kc, kx], axis=1)
        v = jnp.concatenate([vc, vx], axis=1)
        key_keep = None
        if ctx_pad:
            # joint layout is [ctx | image]; the pad rows are the ctx
            # tail — drop them from every softmax (reference-exact;
            # ops/attention.py runs flash via segment ids)
            key_keep = jnp.ones((sc + sx,), bool).at[
                sc - ctx_pad:sc].set(False)
        out = dot_product_attention(q, k, v, key_keep=key_keep).reshape(
            b, sc + sx, inner)
        out_ctx, out_x = out[:, :sc], out[:, sc:]
        out_x = QDense(cfg.hidden_size, dtype=self.dtype, plan=self.plan,
                       name="to_out_0")(out_x)
        if self.context_pre_only:
            return out_x, None
        out_ctx = QDense(cfg.hidden_size, dtype=self.dtype, plan=self.plan,
                         name="to_add_out")(out_ctx)
        return out_x, out_ctx


class MMDiTFeedForward(nn.Module):
    dim: int
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x):
        h = QDense(self.dim * 4, dtype=self.dtype, plan=self.plan,
                   name="net_0/proj")(x)
        h = nn.gelu(h, approximate=True)
        return QDense(self.dim, dtype=self.dtype, plan=self.plan, name="net_2")(h)


class JointTransformerBlock(nn.Module):
    config: MMDiTConfig
    context_pre_only: bool = False
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x, ctx, temb, ctx_pad: int = 0):
        cfg = self.config
        dim = cfg.hidden_size
        hx, (gate_attn_x, shift2_x, scale2_x, gate_mlp_x) = AdaLayerNormZero(
            dim, n_chunks=6, dtype=self.dtype, plan=self.plan, name="norm1")(x, temb)

        if self.context_pre_only:
            # final block: plain AdaLN (2 chunks) on the context
            mod = QDense(dim * 2, dtype=self.dtype, plan=self.plan,
                         name="norm1_context/linear")(nn.silu(temb))
            shift_c, scale_c = jnp.split(mod[:, None, :], 2, axis=-1)
            hc = LayerNorm(use_scale=False, use_bias=False, dtype=self.dtype,
                           name="norm1_context/norm")(ctx)
            hc = hc * (1 + scale_c) + shift_c
            gates_c = None
        else:
            hc, gates_c = AdaLayerNormZero(
                dim, n_chunks=6, dtype=self.dtype, plan=self.plan,
                name="norm1_context")(ctx, temb)

        attn_x, attn_c = JointAttention(cfg, self.context_pre_only,
                                        dtype=self.dtype, plan=self.plan,
                                        name="attn")(hx, hc,
                                                     ctx_pad=ctx_pad)
        x = x + gate_attn_x * attn_x
        h2 = LayerNorm(use_scale=False, use_bias=False, dtype=self.dtype,
                       name="norm2")(x)
        h2 = h2 * (1 + scale2_x) + shift2_x
        x = x + gate_mlp_x * MMDiTFeedForward(dim, dtype=self.dtype,
                                              plan=self.plan, name="ff")(h2)

        if self.context_pre_only:
            return x, None
        gate_attn_c, shift2_c, scale2_c, gate_mlp_c = gates_c
        ctx = ctx + gate_attn_c * attn_c
        hc2 = LayerNorm(use_scale=False, use_bias=False, dtype=self.dtype,
                        name="norm2_context")(ctx)
        hc2 = hc2 * (1 + scale2_c) + shift2_c
        ctx = ctx + gate_mlp_c * MMDiTFeedForward(
            dim, dtype=self.dtype, plan=self.plan, name="ff_context")(hc2)
        return x, ctx


class MMDiT(nn.Module):
    """SD3Transformer2DModel parity."""

    config: MMDiTConfig = SD35_MEDIUM
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, latents, timesteps, encoder_hidden_states,
                 pooled_projections):
        """latents (B, H, W, C) NHWC; encoder_hidden_states
        (B, S, joint_attention_dim); pooled (B, pooled_projection_dim)."""
        cfg = self.config
        b, hh, ww, c = latents.shape
        p = cfg.patch_size
        dim = cfg.hidden_size
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (b,))

        # Pad the text context so the JOINT sequence (ctx + image
        # tokens) is a multiple of 128: XLA's fused (flash-style)
        # attention schedule and the Pallas flash kernel both need
        # 128-aligned sequences — an unaligned joint length (e.g.
        # 333+4096) materializes the (B,H,S,S) f32 logits instead
        # (3.8 GB at 1024px, an instant OOM).  Zero-padding the raw
        # embeds and attending to them matches diffusers SD3 semantics
        # (prompt embeds are zero-padded to max_sequence_length and the
        # transformer runs with no attention mask).
        n_img = (hh // p) * (ww // p)
        pad = (-(n_img + encoder_hidden_states.shape[1])) % cfg.pad_align
        if pad:
            encoder_hidden_states = jnp.pad(
                encoder_hidden_states, ((0, 0), (0, pad), (0, 0)))

        # --- patch embed + cropped learned pos embed
        x = latents.reshape(b, hh // p, p, ww // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (hh // p) * (ww // p), p * p * c)
        x = QDense(dim, dtype=self.dtype, plan=self.plan, name="pos_embed/proj")(x)
        pos = self.param("pos_embed/pos_embed", nn.initializers.normal(0.02),
                         (cfg.pos_embed_max_size * cfg.pos_embed_max_size, dim),
                         jnp.float32)
        gh, gw = hh // p, ww // p
        top = (cfg.pos_embed_max_size - gh) // 2
        left = (cfg.pos_embed_max_size - gw) // 2
        pos2d = pos.reshape(cfg.pos_embed_max_size, cfg.pos_embed_max_size, dim)
        pos_crop = pos2d[top:top + gh, left:left + gw].reshape(1, gh * gw, dim)
        x = x + pos_crop.astype(self.dtype)

        # --- time + pooled-text embedding
        t_emb = get_timestep_embedding(timesteps, 256, flip_sin_to_cos=True,
                                       freq_shift=0).astype(self.dtype)
        t_emb = QDense(dim, dtype=self.dtype, plan=self.plan,
                       name="time_text_embed/timestep_embedder/linear_1")(t_emb)
        t_emb = QDense(dim, dtype=self.dtype, plan=self.plan,
                       name="time_text_embed/timestep_embedder/linear_2")(nn.silu(t_emb))
        p_emb = QDense(dim, dtype=self.dtype, plan=self.plan,
                       name="time_text_embed/text_embedder/linear_1")(
            pooled_projections.astype(self.dtype))
        p_emb = QDense(dim, dtype=self.dtype, plan=self.plan,
                       name="time_text_embed/text_embedder/linear_2")(nn.silu(p_emb))
        temb = t_emb + p_emb

        ctx = QDense(dim, dtype=self.dtype, plan=self.plan,
                     name="context_embedder")(encoder_hidden_states.astype(self.dtype))

        for i in range(cfg.num_layers):
            last = i == cfg.num_layers - 1
            x, ctx = JointTransformerBlock(
                cfg, context_pre_only=last, dtype=self.dtype, plan=self.plan,
                name=f"transformer_blocks_{i}")(
                x, ctx, temb,
                ctx_pad=pad if cfg.mask_ctx_pad else 0)

        # --- AdaLN final + unpatchify
        mod = QDense(dim * 2, dtype=self.dtype, plan=self.plan,
                     name="norm_out/linear")(nn.silu(temb))
        shift, scale = jnp.split(mod[:, None, :], 2, axis=-1)
        x = LayerNorm(use_scale=False, use_bias=False, dtype=self.dtype,
                      name="norm_out/norm")(x)
        x = x * (1 + scale) + shift
        x = QDense(p * p * cfg.out_channels, dtype=self.dtype, plan=self.plan,
                   name="proj_out")(x)
        x = x.reshape(b, gh, gw, p, p, cfg.out_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, cfg.out_channels)
        return x.astype(jnp.float32)
