"""Flax causal LM (LLaMA family) — the TPU-native counterpart of the
reference's HF-LLM path (BaseAWQForCausalLM, models/base.py:853-1922,
and the qwen2/stablelm/llava/cohere shims).

One config covers LLaMA / Qwen2 / StableLM-style architectures:
RMSNorm (or LayerNorm) + RoPE attention (optional QKV biases, GQA) +
SwiGLU (or GELU) MLP.  Module names mirror HF keys
(model.layers.N.self_attn.q_proj -> layers_N/self_attn/q_proj).

Every linear is a QDense consulting the QuantPlan, so AWQ/SmoothQuant/
RTN and the packed W4A16/W8A8 kernels apply exactly as on the diffusion
models.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from qdm_tpu.models.layers import LayerNorm, NO_PLAN, QDense, RMSNorm
from qdm_tpu.quant.plan import QuantPlan

Dtype = Any


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    max_position_embeddings: int = 4096
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6
    attention_bias: bool = False      # Qwen2: True
    norm_type: str = "rmsnorm"        # stablelm: "layernorm"
    mlp_act: str = "silu"             # swiglu default
    tie_word_embeddings: bool = False
    parallel_residual: bool = False   # cohere: x + attn(ln x) + mlp(ln x)
    logit_scale: float = 1.0          # cohere: e.g. 0.0625
    # sparse MoE (Mixtral family; models/moe.py): 0 = dense MLP
    num_experts: int = 0
    num_experts_per_tok: int = 2
    moe_capacity_factor: float = 0.0  # 0 = dense-exact; >0 = dispatch
    # gemma family: (1+w) RMSNorm offset (reference scale.py:96-99),
    # sqrt(hidden)-scaled embeddings, head_dim decoupled from hidden/heads
    norm_plus_one: bool = False
    scale_embeddings: bool = False
    head_dim_override: Optional[int] = None
    # mistral/qwen2 sliding-window attention: position p attends only
    # keys in (p - W, p].  The module keeps full-length caches and
    # bands the mask (correctness/calibration path); the DecodeEngine
    # serves with a ROLLING W-slot cache (api/serve.py) so long-context
    # decode reads W cache columns instead of ctx
    sliding_window: Optional[int] = None
    # gemma2/3 alternating local/global attention: layer i is GLOBAL
    # (no window) iff i % pattern == pattern - 1, windowed otherwise.
    # pattern=1 (default) windows every layer (mistral); gemma2 uses 2
    # (even layers local), gemma3 uses 6 (5 local : 1 global)
    sliding_window_pattern: int = 1
    # gemma2 logit soft-capping: x -> cap * tanh(x / cap) on attention
    # logits (pre-mask) and on the final lm_head logits
    attn_logit_softcapping: Optional[float] = None
    final_logit_softcapping: Optional[float] = None
    # gemma2 sandwich norms: post_attention_layernorm norms the ATTN
    # OUTPUT (before the residual add) and the MLP gets its own
    # pre_feedforward/post_feedforward pair
    sandwich_norms: bool = False
    # gemma2 attention scale: softmax(q k / sqrt(query_pre_attn_scalar))
    # instead of sqrt(head_dim) (27b sets it to hidden/heads != head_dim)
    query_pre_attn_scalar: Optional[float] = None
    # phi family: rotary embedding covers only the first
    # factor*head_dim dims of each head (the rest pass through)
    partial_rotary_factor: float = 1.0
    # phi MLP: plain fc1 -> act -> fc2 (no gate); biases on every
    # linear incl. o_proj / mlp / lm_head
    mlp_gated: bool = True
    all_bias: bool = False
    # qwen3/gemma3/olmo2-class QK-norm: per-head RMSNorm on q and k
    # (shared (head_dim,) learned scales, applied BEFORE rope; HF
    # param names self_attn.{q,k}_norm.weight).  Follows
    # norm_plus_one, so gemma3's (1+w) variant composes.
    qk_norm: bool = False
    # gemma3 dual rope: WINDOWED (local) layers rotate with
    # rope_local_theta (HF rope_local_base_freq, 10k) at raw
    # positions; GLOBAL layers keep rope_theta (1M) with linear
    # position scaling — angles = (pos / rope_scaling_factor) * freqs
    # (HF rope_scaling {rope_type: linear, factor}).
    rope_local_theta: Optional[float] = None
    rope_scaling_factor: float = 1.0
    # DeepSeek-V2 MLA (multi-head latent attention; models/mla.py).
    # kv_lora_rank set => the layer uses MLAAttention: K/V are stored
    # as one shared kv_lora_rank latent + a single roped
    # qk_rope_head_dim head per token (the cache is (r + dr) wide per
    # token regardless of head count).  q_lora_rank set => the query
    # is also low-rank (q_a_proj -> RMSNorm -> q_b_proj; None = plain
    # q_proj, the deepseek-v2-lite layout).  The reference names this
    # family in its quantizer input capture
    # (/root/reference/quantize/quantizer.py:1106-1116).
    q_lora_rank: Optional[int] = None
    kv_lora_rank: Optional[int] = None
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    # DeepSeek MoE layout: HF 'mlp.*' naming (router 'mlp.gate',
    # experts 'mlp.experts.N.{gate,up,down}_proj'), optional always-on
    # shared experts ('mlp.shared_experts.*', n_shared_experts x
    # moe_intermediate_size wide), dense MLPs for the first
    # first_k_dense_replace layers, routed outputs scaled by
    # routed_scaling_factor WITHOUT top-k renormalization
    # (norm_topk_prob=False in every deepseek-v2 config).
    moe_layout: str = "mixtral"           # "mixtral" | "deepseek"
    moe_intermediate_size: Optional[int] = None
    n_shared_experts: int = 0
    first_k_dense_replace: int = 0
    routed_scaling_factor: float = 1.0
    moe_renormalize: bool = True
    # OPT-class position handling: LEARNED absolute position embedding
    # (embed_positions table, added to the token embeds) instead of
    # rope.  learned_pos_offset: OPT checkpoints reserve the first 2
    # table rows (HF OPTLearnedPositionalEmbedding offset).
    # "alibi" (baichuan-13b-class): no rotary, linear per-head
    # attention bias slopes_h * min(k_pos - q_pos, 0) (bloom slopes)
    pos_emb_type: str = "rope"            # "rope" | "learned" | "alibi"
    learned_pos_offset: int = 0
    # gpt-neox-class parallel residual with TWO norms:
    # x + attn(ln1 x) + mlp(ln2 x) (cohere/falcon/phi share ONE norm —
    # parallel_residual with parallel_norms=False)
    parallel_norms: bool = False
    # lm_head bias override (None = follow all_bias): gpt-neox has
    # biases everywhere EXCEPT its untied embed_out head
    lm_head_bias: Optional[bool] = None

    @property
    def rotary_dim(self) -> int:
        r = int(self.head_dim * self.partial_rotary_factor)
        return r - (r % 2)

    @property
    def head_dim(self) -> int:
        if self.kv_lora_rank is not None:        # MLA query head width
            return self.qk_nope_head_dim + self.qk_rope_head_dim
        if self.head_dim_override is not None:
            return self.head_dim_override
        return self.hidden_size // self.num_attention_heads

    def layer_window(self, layer_idx: int) -> Optional[int]:
        """Effective sliding window of one decoder layer (None=global)."""
        if self.sliding_window is None:
            return None
        p = max(int(self.sliding_window_pattern), 1)
        if p > 1 and layer_idx % p == p - 1:
            return None
        return self.sliding_window

    @property
    def attn_scale(self) -> float:
        base = (self.query_pre_attn_scalar
                if self.query_pre_attn_scalar is not None else self.head_dim)
        return float(base) ** -0.5


QWEN2_7B = LlamaConfig(vocab_size=152064, hidden_size=3584,
                       intermediate_size=18944, num_hidden_layers=28,
                       num_attention_heads=28, num_key_value_heads=4,
                       rope_theta=1000000.0, attention_bias=True,
                       max_position_embeddings=32768)


def tiny_llama_config() -> LlamaConfig:
    return LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2, max_position_embeddings=128)


def tiny_mixtral_config(**kw) -> LlamaConfig:
    return LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=96,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2, max_position_embeddings=128,
                       num_experts=4, num_experts_per_tok=2, **kw)


def tiny_deepseek_config(**kw) -> LlamaConfig:
    """Tiny DeepSeek-V2: MLA (q low-rank + latent KV) + deepseek MoE
    (shared experts, first layer dense, no top-k renorm)."""
    defaults = dict(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=4, max_position_embeddings=128,
        q_lora_rank=48, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        num_experts=4, num_experts_per_tok=2, moe_layout="deepseek",
        moe_intermediate_size=48, n_shared_experts=2,
        first_k_dense_replace=1, routed_scaling_factor=1.0,
        moe_renormalize=False)
    defaults.update(kw)
    return LlamaConfig(**defaults)


def rope(x, positions, theta: float, rotary_dim: int = 0,
         pos_scale: float = 1.0):
    """Rotary embedding; x (B, S, H, D).  rotary_dim > 0 rotates only
    the first rotary_dim dims of each head (phi partial rotary); the
    remaining dims pass through untouched.  pos_scale < 1 is linear
    rope scaling (gemma3 global layers) — folded into freqs so the
    engine's identically-folded tables stay bit-equal."""
    d = x.shape[-1]
    if rotary_dim and rotary_dim < d:
        rot = rope(x[..., :rotary_dim], positions, theta,
                   pos_scale=pos_scale)
        return jnp.concatenate([rot, x[..., rotary_dim:]], axis=-1)
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    if pos_scale != 1.0:
        freqs = freqs * jnp.float32(pos_scale)
    angles = positions.astype(jnp.float32)[..., None] * freqs      # (B,S,D/2)
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                           axis=-1).astype(x.dtype)


def _mlp_act(name: str, x):
    if name == "silu":
        return nn.silu(x)
    if name == "relu":                      # OPT
        return nn.relu(x)
    return nn.gelu(x)


class LlamaAttention(nn.Module):
    config: LlamaConfig
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN
    # effective sliding window of THIS layer (config.layer_window(i):
    # gemma2/3 alternate local/global layers)
    window: Optional[int] = None

    @nn.compact
    def __call__(self, x, positions, kv_cache=None, cache_index=None,
                 attn_start=None, attn_prefix=None,
                 std_positions: bool = False):
        cfg = self.config
        b, s, _ = x.shape
        h, hkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
        # Long-prefill flash routing, decided BEFORE the rope site so
        # the q rotation can move into the kernel (see flash branch
        # below for the full rationale and measurements)
        import os as _os
        flash_min = int(_os.environ.get("QDM_FLASH_PREFILL_MIN", "1024"))
        # QDM_FLASH_PREFILL_FORCE=interpret: route through the flash
        # kernel in Pallas interpret mode off-TPU — the CPU exactness
        # test hook (tests/test_flash_prefill.py pins the flash-routed
        # module prefill against the einsum path)
        flash_force = (_os.environ.get("QDM_FLASH_PREFILL_FORCE")
                       == "interpret")
        flash_ok = (s > 1 and s % 128 == 0 and s >= flash_min
                    and cfg.pos_emb_type != "alibi"
                    and attn_prefix is None
                    and (not self.window or s <= self.window)
                    and cfg.attn_logit_softcapping is None
                    and isinstance(cache_index, int) and cache_index == 0
                    and (kv_cache is None or len(kv_cache) < 4)
                    and (jax.default_backend() == "tpu" or flash_force)
                    and not _os.environ.get("QDM_DISABLE_FLASH_PREFILL"))
        if self.plan.fuse_qkv:
            # one (h+2*hkv)*d-wide projection: on the int8 path the
            # narrow unfused k/v matmuls (e.g. 2048->512) each pay
            # their own act-quant/dequant passes (the 2.2x UNet
            # bisect, BENCH_NOTES.md); decode also sheds 2 of 3
            # per-layer matmul dispatches
            qkv = QDense((h + 2 * hkv) * d, use_bias=cfg.attention_bias,
                         dtype=self.dtype, plan=self.plan,
                         name="qkv_proj")(x)
            q = qkv[..., : h * d].reshape(b, s, h, d)
            k = qkv[..., h * d: (h + hkv) * d].reshape(b, s, hkv, d)
            v = qkv[..., (h + hkv) * d:].reshape(b, s, hkv, d)
        else:
            q = QDense(h * d, use_bias=cfg.attention_bias, dtype=self.dtype,
                       plan=self.plan, name="q_proj")(x).reshape(b, s, h, d)
            k = QDense(hkv * d, use_bias=cfg.attention_bias, dtype=self.dtype,
                       plan=self.plan, name="k_proj")(x).reshape(b, s, hkv, d)
            v = QDense(hkv * d, use_bias=cfg.attention_bias, dtype=self.dtype,
                       plan=self.plan, name="v_proj")(x).reshape(b, s, hkv, d)
        if cfg.qk_norm:
            # qwen3-class per-head q/k RMSNorm (pre-rope; the (d,)
            # scales are shared across heads and positions)
            q = RMSNorm(epsilon=cfg.rms_norm_eps, dtype=self.dtype,
                        plus_one=cfg.norm_plus_one, name="q_norm")(q)
            k = RMSNorm(epsilon=cfg.rms_norm_eps, dtype=self.dtype,
                        plus_one=cfg.norm_plus_one, name="k_norm")(k)
        if cfg.pos_emb_type not in ("learned", "alibi"):
            # OPT (learned) and baichuan-13b-class (alibi): no rotary
            rd = cfg.rotary_dim if cfg.partial_rotary_factor < 1.0 else 0
            if cfg.rope_local_theta is not None and self.window is not None:
                # gemma3 LOCAL layer: local base freq, raw positions
                theta, pscale = cfg.rope_local_theta, 1.0
            else:
                theta = cfg.rope_theta
                pscale = 1.0 / cfg.rope_scaling_factor
            # the fused prefill kernel rotates q on VMEM tiles (the
            # (B,S,H,D) f32 rotation pass measured ~0.09 s of the
            # (32,1024) prefill — q is h/hkv times k's bytes); k keeps
            # the XLA rope: the cache below stores ROPED keys
            kernel_rope = (flash_ok and std_positions and rd == 0
                           and attn_start is None)
            if not kernel_rope:
                q = rope(q, positions, theta, rd, pos_scale=pscale)
            k = rope(k, positions, theta, rd, pos_scale=pscale)
        else:
            kernel_rope = False

        # cache-native layout (B, hkv, S, d): K/V live head-major so
        # cached decode contracts them with zero per-step relayout
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)

        def _causal_mask(kv_len):
            """Causal mask over a LINEAR cache (slot == absolute
            position), optionally banded to cfg.sliding_window
            (mistral/qwen2: position p sees keys in (p-W, p]) and
            left-trimmed for ragged batches (attn_start) with a
            shared-prefix carve-out (attn_prefix)."""
            k_pos = jnp.arange(kv_len)[None, :]
            q_pos = (0 if cache_index is None else cache_index) \
                + jnp.arange(s)[:, None]
            m = k_pos <= q_pos
            if self.window:
                m = m & (k_pos > q_pos - self.window)
            m = m[None, None]
            if attn_start is not None:
                # ragged left-padded batch: slots [0, start) hold pad
                # tokens that must be invisible to every real query —
                # except a shared prefix [0, attn_prefix), whose K/V a
                # prefixed mini-prefill pastes below the pad region
                # (prefix-cached serving, api/serve.py)
                keep = k_pos >= attn_start[:, None]
                if attn_prefix is not None:
                    keep = keep | (k_pos < attn_prefix)
                m = m & keep[:, None, None, :]
            return m

        new_cache = None
        depth_major = False
        if kv_cache is not None and len(kv_cache) == 1:
            # combined [K|V] depth-major cache (B, 2*hkv, d, T): the
            # DecodeEngine's native layout (api/serve.py).  Prefilling
            # through this branch writes engine caches in place, so the
            # engine needs no post-prefill transpose+concat conversion
            # (measured ~14% of batch-32 serve e2e).  K occupies head
            # rows [0, hkv), V rows [hkv, 2*hkv).
            (ckv,) = kv_cache
            kd = kt.transpose(0, 1, 3, 2).astype(ckv.dtype)  # (B,hkv,d,s)
            vd = vt.transpose(0, 1, 3, 2).astype(ckv.dtype)
            ckv = jax.lax.dynamic_update_slice(ckv, kd, (0, 0, 0, cache_index))
            ckv = jax.lax.dynamic_update_slice(ckv, vd,
                                               (0, hkv, 0, cache_index))
            new_cache = (ckv,)
            kt, vt = ckv[:, :hkv], ckv[:, hkv:]       # (B, hkv, d, T)
            depth_major = True
            mask = _causal_mask(ckv.shape[3])
        elif kv_cache is not None and len(kv_cache) == 4:
            # int8 KV cache: per-token per-head absmax scales.  Halves
            # the cache HBM traffic that dominates large-batch /
            # long-context decode (TPU-native extension of the
            # reference's rolling fp16 cache, fused_utils.py:14-27).
            ck, cks, cv, cvs = kv_cache       # (B,hkv,T,d) i8 + (B,hkv,T) f32
            kf, vf = kt.astype(jnp.float32), vt.astype(jnp.float32)
            ks = jnp.maximum(jnp.max(jnp.abs(kf), axis=-1), 1e-8) / 127.0
            vs = jnp.maximum(jnp.max(jnp.abs(vf), axis=-1), 1e-8) / 127.0
            kq = jnp.round(kf / ks[..., None]).astype(jnp.int8)
            vq = jnp.round(vf / vs[..., None]).astype(jnp.int8)
            at = (0, 0, cache_index, 0)
            ck = jax.lax.dynamic_update_slice(ck, kq, at)
            cv = jax.lax.dynamic_update_slice(cv, vq, at)
            cks = jax.lax.dynamic_update_slice(cks, ks, at[:3])
            cvs = jax.lax.dynamic_update_slice(cvs, vs, at[:3])
            new_cache = (ck, cks, cv, cvs)
            kt = (ck.astype(jnp.float32) * cks[..., None]).astype(self.dtype)
            vt = (cv.astype(jnp.float32) * cvs[..., None]).astype(self.dtype)
            mask = _causal_mask(ck.shape[2])
        elif kv_cache is not None:
            ck, cv = kv_cache                       # (B, hkv, T, d)
            ck = jax.lax.dynamic_update_slice(ck, kt.astype(ck.dtype), (0, 0, cache_index, 0))
            cv = jax.lax.dynamic_update_slice(cv, vt.astype(cv.dtype), (0, 0, cache_index, 0))
            new_cache = (ck, cv)
            kt, vt = ck, cv
            mask = _causal_mask(ck.shape[2])
        else:
            if self.window:
                mask = _causal_mask(s)
            else:
                mask = jnp.tril(jnp.ones((s, s), bool))[None, None]

        # Long prefill: the fused causal flash kernel
        # (ops/flash_prefill.py) on the LOCAL k/v (with
        # cache_index == 0 the attention window is exactly the prompt,
        # so the cache tail is never needed).  Native GQA (the query
        # head's index map reads kv head ih // g — no jnp.repeat) and
        # direct (B, S, H, D) streaming (no transposes), with q roped
        # in-kernel on the standard-position path: the repeat +
        # transpose + rope passes around jax's flash_attention measured
        # ~0.3 s of the (32, 1024) prefill against ~0.015 s of
        # attention FLOPs (tools/prefill_ablation_tpu.py).  Threshold
        # by measurement (tools/prefill_flash_ab_tpu.py): flash wins at
        # S >= 1024; the grouped einsum keeps S <= 512.  Per-row
        # attn_start masks the pad keys in-kernel (pad queries attend
        # valid keys — finite garbage the decode masks out anyway).
        # The int8 per-token module cache (len-4) keeps the einsum: its
        # semantics attend on the DEQUANTIZED cache, not the local k/v.
        if flash_ok:
            from qdm_tpu.ops.flash_prefill import (flash_prefill_gqa,
                                                   rope_tables)

            rc = rs = None
            if kernel_rope:
                rc, rs = rope_tables(s, d, theta, pos_scale=pscale)
            # kt/vt above ARE the kernel's (B, Hkv, S, D) layout (the
            # cache-native transpose, local slice); q pays the one
            # remaining head-major transpose
            of = flash_prefill_gqa(q.transpose(0, 2, 1, 3),
                                   k.transpose(0, 2, 1, 3),
                                   v.transpose(0, 2, 1, 3),
                                   sm_scale=cfg.attn_scale,
                                   rope_cos=rc, rope_sin=rs,
                                   starts=attn_start,
                                   # int8 QK/PV (quantize_bmm_input
                                   # semantics): both attention dots on
                                   # the int8 MXU — at d=64 bf16 pays
                                   # the 128-lane padding, so int8's 2x
                                   # is real here (unlike the diffusion
                                   # D=40/80 shapes)
                                   qk_int8=self.plan.int8_bmm,
                                   interpret=flash_force)
            out = of.transpose(0, 2, 1, 3).reshape(b, s, h * d) \
                .astype(self.dtype)
            out = QDense(cfg.hidden_size, use_bias=cfg.all_bias,
                         dtype=self.dtype, plan=self.plan,
                         name="o_proj")(out)
            return out, new_cache

        kspec = "bhdk" if depth_major else "bhkd"
        alibi = None
        if cfg.pos_emb_type == "alibi":
            # baichuan-13b-class linear attention bias (the bloom
            # slopes, models/bloom.py): slopes_h * min(k_pos - q_pos, 0)
            from qdm_tpu.models.bloom import alibi_slopes

            T = kt.shape[3] if depth_major else kt.shape[2]
            q_pos = ((0 if cache_index is None else cache_index)
                     + jnp.arange(s))
            rel = (jnp.arange(T)[None, :]
                   - q_pos[:, None]).astype(jnp.float32)
            alibi = (jnp.asarray(alibi_slopes(h))[:, None, None]
                     * jnp.minimum(rel, 0.0))           # (h, s, T)
        if hkv < h:
            # GQA: group the query heads; K/V are contracted in their
            # cache-native layout directly — no materialized repeat
            # (a jnp.repeat costs ~6 GB/step of HBM writes at batch-32
            # ctx-1024 serving) and no per-step cache transpose
            g = h // hkv
            qg = q.reshape(b, s, hkv, g, d)
            logits = jnp.einsum(f"bqhgd,{kspec}->bhgqk", qg, kt).astype(
                jnp.float32) * cfg.attn_scale
            if alibi is not None:
                logits = logits + alibi.reshape(hkv, g, s, -1)[None]
            if cfg.attn_logit_softcapping:
                c = cfg.attn_logit_softcapping
                logits = c * jnp.tanh(logits / c)
            logits = jnp.where(mask[:, :, None], logits, -1e9)
            probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum(f"bhgqk,{kspec}->bqhgd", probs, vt).reshape(
                b, s, h * d)
        else:
            logits = jnp.einsum(f"bqhd,{kspec}->bhqk", q, kt).astype(
                jnp.float32) * cfg.attn_scale
            if alibi is not None:
                logits = logits + alibi[None]
            if cfg.attn_logit_softcapping:
                c = cfg.attn_logit_softcapping
                logits = c * jnp.tanh(logits / c)
            logits = jnp.where(mask, logits, -1e9)
            probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum(f"bhqk,{kspec}->bqhd", probs, vt).reshape(
                b, s, h * d)
        out = QDense(cfg.hidden_size, use_bias=cfg.all_bias,
                     dtype=self.dtype, plan=self.plan, name="o_proj")(out)
        return out, new_cache


class LlamaMLP(nn.Module):
    config: LlamaConfig
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        if not cfg.mlp_gated:
            # phi: plain fc1 -> act -> fc2 (no gating branch)
            h = QDense(cfg.intermediate_size, use_bias=cfg.all_bias,
                       dtype=self.dtype, plan=self.plan, name="fc1")(x)
            h = _mlp_act(cfg.mlp_act, h)
            return QDense(cfg.hidden_size, use_bias=cfg.all_bias,
                          dtype=self.dtype, plan=self.plan, name="fc2")(h)
        if self.plan.fuse_qkv:
            # gate/up share their input: one 2x-wide matmul
            gu = QDense(2 * cfg.intermediate_size, use_bias=False,
                        dtype=self.dtype, plan=self.plan,
                        name="gate_up_proj")(x)
            gate, up = jnp.split(gu, 2, axis=-1)
        else:
            gate = QDense(cfg.intermediate_size, use_bias=False, dtype=self.dtype,
                          plan=self.plan, name="gate_proj")(x)
            up = QDense(cfg.intermediate_size, use_bias=False, dtype=self.dtype,
                        plan=self.plan, name="up_proj")(x)
        act = _mlp_act(cfg.mlp_act, gate)
        return QDense(cfg.hidden_size, use_bias=False, dtype=self.dtype,
                      plan=self.plan, name="down_proj")(act * up)


class LlamaDecoderLayer(nn.Module):
    config: LlamaConfig
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN
    layer_idx: int = 0     # selects the layer's window (gemma2/3 alternation)

    def _norm(self, name):
        if self.config.norm_type == "layernorm":
            return LayerNorm(dtype=self.dtype, name=name)
        return RMSNorm(epsilon=self.config.rms_norm_eps, dtype=self.dtype,
                       plus_one=self.config.norm_plus_one, name=name)

    def _mlp(self):
        cfg = self.config
        if cfg.num_experts > 0:
            from qdm_tpu.models.moe import MoeMLP

            if cfg.moe_layout == "deepseek":
                # deepseek-v2: the first first_k_dense_replace layers
                # keep a plain dense MLP (HF keys mlp.{gate,up,down})
                if self.layer_idx < cfg.first_k_dense_replace:
                    return LlamaMLP(cfg, dtype=self.dtype, plan=self.plan,
                                    name="mlp")
                return MoeMLP(cfg, dtype=self.dtype, plan=self.plan,
                              name="mlp")
            return MoeMLP(cfg, dtype=self.dtype, plan=self.plan,
                          name="block_sparse_moe")
        return LlamaMLP(cfg, dtype=self.dtype, plan=self.plan,
                        name="mlp")

    def _attn(self, win):
        if self.config.kv_lora_rank is not None:
            from qdm_tpu.models.mla import MLAAttention

            return MLAAttention(self.config, dtype=self.dtype,
                                plan=self.plan, name="self_attn")
        return LlamaAttention(self.config, dtype=self.dtype, plan=self.plan,
                              window=win, name="self_attn")

    @nn.compact
    def __call__(self, x, positions, kv_cache=None, cache_index=None,
                 attn_start=None, attn_prefix=None,
                 std_positions: bool = False):
        cfg = self.config
        win = cfg.layer_window(self.layer_idx)
        if cfg.parallel_residual:
            # cohere/falcon-style: one norm feeds attention AND the
            # MLP; gpt-neox (parallel_norms): each branch has its own
            h = self._norm("input_layernorm")(x)
            attn, new_cache = self._attn(win)(
                h, positions, kv_cache, cache_index, attn_start,
                attn_prefix, std_positions=std_positions)
            hm = self._norm("post_attention_layernorm")(x) \
                if cfg.parallel_norms else h
            mlp = self._mlp()(hm)
            return x + attn + mlp, new_cache
        h, new_cache = self._attn(win)(
            self._norm("input_layernorm")(x), positions, kv_cache,
            cache_index, attn_start, attn_prefix,
            std_positions=std_positions)
        if cfg.sandwich_norms:
            # gemma2: post-attn norm on the attention OUTPUT, then an
            # independent pre/post pair around the MLP (all residual
            # adds on the un-normed stream)
            x = x + self._norm("post_attention_layernorm")(h)
            m = self._mlp()(self._norm("pre_feedforward_layernorm")(x))
            return x + self._norm("post_feedforward_layernorm")(m), new_cache
        x = x + h
        x = x + self._mlp()(self._norm("post_attention_layernorm")(x))
        return x, new_cache


class LlamaForCausalLM(nn.Module):
    config: LlamaConfig
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, input_ids=None, positions=None, kv_caches=None,
                 cache_index=None, input_embeds=None,
                 last_logits_only: bool = False, attn_start=None,
                 attn_prefix=None):
        cfg = self.config
        embed = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                         name="embed_tokens")
        if input_embeds is not None:
            # VLM path: image features already projected to LM space are
            # concatenated with token embeddings by the caller
            x = input_embeds.astype(self.dtype)
        else:
            x = embed(input_ids)
            if cfg.scale_embeddings:          # gemma: x * sqrt(hidden)
                x = x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)
        b, s = x.shape[:2]
        # std_positions: canonical per-slot arange (and slot 0 start) —
        # the precondition for the fused prefill kernel's shared
        # in-kernel rope tables (per-row ragged positions keep the XLA
        # rotation)
        std_positions = positions is None and (
            cache_index is None
            or (isinstance(cache_index, int) and cache_index == 0))
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
            if cache_index is not None:
                positions = positions + cache_index
        if cfg.pos_emb_type == "learned":
            # OPT-class learned absolute positions; the checkpoint
            # table reserves learned_pos_offset leading rows (HF
            # OPTLearnedPositionalEmbedding: offset 2)
            pos_tab = nn.Embed(
                cfg.max_position_embeddings + cfg.learned_pos_offset,
                cfg.hidden_size, dtype=self.dtype, name="embed_positions")
            x = x + pos_tab(positions + cfg.learned_pos_offset)
        new_caches = []
        for i in range(cfg.num_hidden_layers):
            cache_i = kv_caches[i] if kv_caches is not None else None
            x, nc = LlamaDecoderLayer(cfg, dtype=self.dtype, plan=self.plan,
                                      layer_idx=i, name=f"layers_{i}")(
                x, positions, cache_i, cache_index, attn_start,
                attn_prefix, std_positions=std_positions)
            new_caches.append(nc)
        if last_logits_only is not False and last_logits_only is not None:
            # prefill wants only one position's logits: at ctx 4096
            # batch 16 the full (B, S, vocab) head output is 4.2 GB
            # bf16 of pure waste (and an OOM risk) — slice BEFORE the
            # lm_head matmul.  True = the last position; an int (or
            # traced scalar) selects that position instead — chunked
            # prefill needs the last REAL token's logits, which sit
            # mid-chunk when the prompt length is not a chunk multiple
            idx = s - 1 if last_logits_only is True else last_logits_only
            x = jax.lax.dynamic_slice_in_dim(x, idx, 1, axis=1)
        if cfg.norm_type == "layernorm":
            x = LayerNorm(dtype=self.dtype, name="norm")(x)
        else:
            x = RMSNorm(epsilon=cfg.rms_norm_eps, dtype=self.dtype,
                        plus_one=cfg.norm_plus_one, name="norm")(x)
        if cfg.tie_word_embeddings:
            embed = self.variables["params"]["embed_tokens"]["embedding"]
            logits = x @ embed.T.astype(self.dtype)
        else:
            head_bias = cfg.all_bias if cfg.lm_head_bias is None \
                else cfg.lm_head_bias
            logits = QDense(cfg.vocab_size, use_bias=head_bias,
                            dtype=self.dtype, plan=self.plan,
                            name="lm_head")(x)
        logits = logits.astype(jnp.float32) * cfg.logit_scale
        if cfg.final_logit_softcapping:
            c = cfg.final_logit_softcapping
            logits = c * jnp.tanh(logits / c)
        return logits, (new_caches if kv_caches is not None else None)

    def init_cache(self, batch: int, max_len: int, cache_dtype=None):
        """cache_dtype=jnp.int8 selects the quantized KV cache
        (per-token per-head scales stored alongside)."""
        cfg = self.config
        if cfg.kv_lora_rank is not None:
            # MLA latent cache: ONE (B, T, r + dr) tensor per layer —
            # [c_kv | roped k_pe] rows, shared by every head (the
            # whole point of MLA: cache width is r+dr, e.g. 576,
            # instead of n_heads * (d_k + d_v))
            if cache_dtype == jnp.int8:
                raise NotImplementedError(
                    "int8 MLA latent cache: the latent is already "
                    "10-50x smaller than an MHA KV cache; quantized "
                    "latents live on the DecodeEngine path")
            width = cfg.kv_lora_rank + cfg.qk_rope_head_dim
            return [(jnp.zeros((batch, max_len, width),
                               cache_dtype or self.dtype),)
                    for _ in range(cfg.num_hidden_layers)]
        # head-major cache layout (B, hkv, T, d): decode contracts the
        # cache without any per-step relayout
        kv_shape = (batch, cfg.num_key_value_heads, max_len, cfg.head_dim)
        if cache_dtype == jnp.int8:
            return [(jnp.zeros(kv_shape, jnp.int8),
                     jnp.zeros(kv_shape[:3], jnp.float32),
                     jnp.zeros(kv_shape, jnp.int8),
                     jnp.zeros(kv_shape[:3], jnp.float32))
                    for _ in range(cfg.num_hidden_layers)]
        return [(jnp.zeros(kv_shape, cache_dtype or self.dtype),
                 jnp.zeros(kv_shape, cache_dtype or self.dtype))
                for _ in range(cfg.num_hidden_layers)]
