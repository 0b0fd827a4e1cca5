"""Multi-head Latent Attention (DeepSeek-V2) — TPU-native.

The reference's quantizer explicitly special-cases the deepseek_v2
architecture (input capture for ``mlp.gate`` / ``shared_experts``,
/root/reference/quantize/quantizer.py:1106-1116) but ships no model for
it; this module is the corresponding family here, built for the TPU
serving shape MLA was designed for.

MLA replaces per-head K/V with one shared low-rank latent per token:

  c_kv, k_pe = split(kv_a_proj_with_mqa(x))      # (r,), (dr,)
  c_kv       = RMSNorm(c_kv);  k_pe = rope(k_pe) # ONE roped head
  k_nope_h   = W_UK_h c_kv;  v_h = W_UV_h c_kv   # kv_b_proj, per head
  q_h        = [q_nope_h | rope(q_pe_h)]         # (dn + dr,)
  score_h    = (q_nope_h . k_nope_h + q_pe_h . k_pe) / sqrt(dn + dr)

so the cache holds ``r + dr`` floats per token (e.g. 512 + 64)
regardless of head count — a 10-50x cache-HBM cut vs MHA, which is
exactly the axis large-batch TPU decode is bound on (BENCH_NOTES:
decode rides the HBM roofline).

Module naming mirrors HF deepseek_v2 keys (q_a_proj/q_a_layernorm/
q_b_proj or plain q_proj for -lite, kv_a_proj_with_mqa/kv_a_layernorm/
kv_b_proj, o_proj), every projection a QDense, so the safetensors
loader, RTN fake/packed quantization, and the SmoothQuant/AWQ
migrations (MLA-specific scaling groups, models/shims.py) apply —
tests/test_mla.py covers the quantize lifecycle, the migration
invariance, and CausalLM.serve(smooth=|awq=True).

This module uses the EXPLICIT form (materialize per-head k_nope/v via
kv_b_proj) for both prefill and cached decode — the quantization-
faithful path where kv_b_proj is an ordinary quantized linear.  The
DecodeEngine serves the ABSORBED form (serve.py::_mla_layer: fold
W_UK into the query and W_UV into the output, attend directly against
the latent cache as a single (r+dr)-wide MQA head) in bf16 or
w8a8_static on a single device; greedy engine tokens equal the
module's explicit-form generate on the f32 CPU suite
(tests/test_mla.py::test_engine_bf16_matches_module), and unsupported
engine surfaces raise actionable NotImplementedErrors.

Cache format: one tensor per layer, ``(B, T, r + dr)`` = [c_kv | roped
k_pe] rows, passed as a 1-tuple like the other module cache formats.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from qdm_tpu.models.layers import NO_PLAN, QDense, RMSNorm
from qdm_tpu.quant.plan import QuantPlan

Dtype = Any


def mla_rope(x, positions, theta: float):
    """DeepSeek-V2 rotary on the rope slice; x (B, S, H, dr).

    HF's deepseek_v2 modeling stores the rope dims INTERLEAVED in the
    checkpoint and de-interleaves inside its rotary; the loader here
    folds that permutation into the q/kv projection weights instead
    (loader.deepseek_deinterleave_rope), so the module applies the
    standard half-split rotation."""
    from qdm_tpu.models.llama import rope

    return rope(x, positions, theta)


class MLAAttention(nn.Module):
    config: Any               # LlamaConfig with kv_lora_rank set
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x, positions, kv_cache=None, cache_index=None,
                 attn_start=None, attn_prefix=None,
                 std_positions: bool = False):
        # std_positions is the llama-attention fused-flash-rope routing
        # hint; MLA keeps its own latent attention path (unused here)
        cfg = self.config
        b, s, _ = x.shape
        h = cfg.num_attention_heads
        dn, dr = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
        dv, r = cfg.v_head_dim, cfg.kv_lora_rank
        qd = dn + dr

        # ---- query path (low-rank when q_lora_rank is set)
        if cfg.q_lora_rank:
            q = QDense(cfg.q_lora_rank, use_bias=cfg.attention_bias,
                       dtype=self.dtype, plan=self.plan, name="q_a_proj")(x)
            q = RMSNorm(epsilon=cfg.rms_norm_eps, dtype=self.dtype,
                        name="q_a_layernorm")(q)
            q = QDense(h * qd, use_bias=False, dtype=self.dtype,
                       plan=self.plan, name="q_b_proj")(q)
        else:
            q = QDense(h * qd, use_bias=cfg.attention_bias,
                       dtype=self.dtype, plan=self.plan, name="q_proj")(x)
        q = q.reshape(b, s, h, qd)
        q_nope, q_pe = q[..., :dn], q[..., dn:]
        q_pe = mla_rope(q_pe, positions, cfg.rope_theta)

        # ---- shared latent path: ONE (r + dr)-wide projection
        latent = QDense(r + dr, use_bias=cfg.attention_bias,
                        dtype=self.dtype, plan=self.plan,
                        name="kv_a_proj_with_mqa")(x)
        c_kv, k_pe = latent[..., :r], latent[..., r:]
        c_kv = RMSNorm(epsilon=cfg.rms_norm_eps, dtype=self.dtype,
                       name="kv_a_layernorm")(c_kv)
        k_pe = mla_rope(k_pe[:, :, None, :], positions,
                        cfg.rope_theta)[:, :, 0]          # (b, s, dr)

        new_cache = None
        if kv_cache is not None:
            (C,) = kv_cache                               # (B, T, r + dr)
            rows = jnp.concatenate([c_kv, k_pe], axis=-1).astype(C.dtype)
            C = jax.lax.dynamic_update_slice(C, rows, (0, cache_index, 0))
            new_cache = (C,)
            c_all = C[..., :r].astype(self.dtype)         # (B, T, r)
            kpe_all = C[..., r:].astype(self.dtype)       # (B, T, dr)
            t = C.shape[1]
        else:
            c_all, kpe_all, t = c_kv, k_pe, s

        # ---- explicit expansion (quantization-faithful: kv_b_proj is
        # an ordinary QDense applied to the latent)
        kv = QDense(h * (dn + dv), use_bias=False, dtype=self.dtype,
                    plan=self.plan, name="kv_b_proj")(c_all)
        kv = kv.reshape(b, t, h, dn + dv)
        k_nope, v = kv[..., :dn], kv[..., dn:]

        q_pos = (0 if cache_index is None else cache_index) \
            + jnp.arange(s)[:, None]
        k_pos = jnp.arange(t)[None, :]
        mask = k_pos <= q_pos                             # (s, t)
        mask = mask[None, None]
        if attn_start is not None:
            keep = k_pos >= attn_start[:, None]
            if attn_prefix is not None:
                keep = keep | (k_pos < attn_prefix)
            mask = mask & keep[:, None, None, :]

        scale = cfg.attn_scale
        # scores: nope part (per-head keys) + rope part (ONE shared
        # roped head — broadcast over query heads, MQA-style)
        logits = (jnp.einsum("bqhd,bkhd->bhqk", q_nope, k_nope)
                  + jnp.einsum("bqhd,bkd->bhqk", q_pe, kpe_all)
                  ).astype(jnp.float32) * scale
        logits = jnp.where(mask, logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, h * dv)
        out = QDense(cfg.hidden_size, use_bias=cfg.attention_bias,
                     dtype=self.dtype, plan=self.plan, name="o_proj")(out)
        return out, new_cache
