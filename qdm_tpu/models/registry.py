"""Model registry — parity with the reference's models/__init__.py
exports (31 shim classes incl. 3 diffusion families).

Diffusion families map to pipeline classes; LLM families map to
LlamaConfig presets (architectures the LLaMA-family module covers) or
are listed as planned where the block structure differs (bloom's ALiBi,
cohere's parallel-residual).
"""

from __future__ import annotations

from typing import Dict

from qdm_tpu.models import llama as llama_lib


def diffusion_families() -> Dict[str, type]:
    from qdm_tpu.api.pipeline import (StableDiffusion1_x, StableDiffusionXL,
                                      StableDiffusion3_5)

    return {
        "StableDiffusionPipeline": StableDiffusion1_x,
        "StableDiffusionXLPipeline": StableDiffusionXL,
        "StableDiffusion3Pipeline": StableDiffusion3_5,
        "sd1.5": StableDiffusion1_x,
        "sdxl": StableDiffusionXL,
        "sd3.5": StableDiffusion3_5,
    }


# LLM architectures handled by LlamaForCausalLM's config space
# (reference shims: qwen2.py, stablelm.py, llava.py backbone, qwen.py)
LLM_CONFIG_PRESETS: Dict[str, llama_lib.LlamaConfig] = {
    "llama": llama_lib.LlamaConfig(),
    "qwen2-7b": llama_lib.QWEN2_7B,
    "qwen2": llama_lib.LlamaConfig(attention_bias=True),
    "mistral": llama_lib.LlamaConfig(num_key_value_heads=8),
    # Qwen-1 (reference models/qwen.py): fused c_attn with bias ->
    # attention_bias=True after the loader splits c_attn into q/k/v
    "qwen": llama_lib.LlamaConfig(attention_bias=True),
    # mistral-7B geometry: GQA + 4096-token sliding-window attention
    # (the DecodeEngine serves it with a rolling window-slot cache —
    # long-context decode reads 4096 cache columns instead of ctx)
    "mistral": llama_lib.LlamaConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=14336,
        num_hidden_layers=32, num_attention_heads=32,
        num_key_value_heads=8, sliding_window=4096,
        max_position_embeddings=32768),
    "stablelm": llama_lib.LlamaConfig(norm_type="layernorm"),
    "tiny": llama_lib.tiny_llama_config(),
    # gemma (reference scale.py:96-99 special-cases its (1+w) norm):
    # gemma-2b geometry — (1+w) RMSNorm, sqrt(hidden)-scaled embeds,
    # head_dim 256 decoupled from hidden/heads, GELU MLP, tied embeds
    "gemma": llama_lib.LlamaConfig(
        vocab_size=256000, hidden_size=2048, intermediate_size=16384,
        num_hidden_layers=18, num_attention_heads=8,
        num_key_value_heads=1, head_dim_override=256, mlp_act="gelu",
        norm_plus_one=True, scale_embeddings=True,
        tie_word_embeddings=True, max_position_embeddings=8192),
    # phi-2 geometry: parallel residual off ONE layernorm, ungated
    # fc1->gelu->fc2 MLP, biases on every linear, partial rotary (0.4
    # of head_dim), layernorm, untied biased lm_head
    "phi": llama_lib.LlamaConfig(
        vocab_size=51200, hidden_size=2560, intermediate_size=10240,
        num_hidden_layers=32, num_attention_heads=32,
        num_key_value_heads=32, max_position_embeddings=2048,
        norm_type="layernorm", parallel_residual=True, mlp_act="gelu",
        attention_bias=True, all_bias=True, mlp_gated=False,
        partial_rotary_factor=0.4),
    # gemma2-2b geometry: alternating local/global attention (pattern
    # 2, window 4096), sandwich norms, logit soft-caps 50/30, (1+w)
    # norms + scaled embeds like gemma-1, query scale = head_dim 256
    "gemma2": llama_lib.LlamaConfig(
        vocab_size=256000, hidden_size=2304, intermediate_size=9216,
        num_hidden_layers=26, num_attention_heads=8,
        num_key_value_heads=4, head_dim_override=256, mlp_act="gelu",
        norm_plus_one=True, scale_embeddings=True,
        tie_word_embeddings=True, max_position_embeddings=8192,
        sliding_window=4096, sliding_window_pattern=2,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        sandwich_norms=True, query_pre_attn_scalar=256.0),
    # Mixtral-family sparse MoE (reference quantizer.py:1106-1111 MoE
    # input capture; models/moe.py): 8 experts, top-2 routing
    "mixtral": llama_lib.LlamaConfig(
        hidden_size=4096, intermediate_size=14336, num_hidden_layers=32,
        num_attention_heads=32, num_key_value_heads=8,
        rope_theta=1000000.0, max_position_embeddings=32768,
        num_experts=8, num_experts_per_tok=2),
    "tiny-mixtral": llama_lib.tiny_mixtral_config(),
    # qwen3-4b geometry: QK-norm (per-head q/k RMSNorm before rope),
    # GQA, no attention bias, decoupled head_dim, tied embeds
    "qwen3": llama_lib.LlamaConfig(
        vocab_size=151936, hidden_size=2560, intermediate_size=9728,
        num_hidden_layers=36, num_attention_heads=32,
        num_key_value_heads=8, head_dim_override=128,
        rope_theta=1000000.0, max_position_embeddings=40960,
        tie_word_embeddings=True, qk_norm=True),
    # gemma3-4b geometry: gemma2's sandwich norms + (1+w) norms +
    # scaled embeds, QK-norm instead of the attention soft-cap,
    # 5-local:1-global window pattern (W=1024), DUAL rope — local
    # layers 10k base at raw positions, global layers 1M with linear
    # position scaling factor 8
    "gemma3": llama_lib.LlamaConfig(
        vocab_size=262208, hidden_size=2560, intermediate_size=10240,
        num_hidden_layers=34, num_attention_heads=8,
        num_key_value_heads=4, head_dim_override=256, mlp_act="gelu",
        norm_plus_one=True, scale_embeddings=True,
        tie_word_embeddings=True, max_position_embeddings=131072,
        sliding_window=1024, sliding_window_pattern=6,
        sandwich_norms=True, query_pre_attn_scalar=256.0,
        qk_norm=True, rope_theta=1000000.0, rope_local_theta=10000.0,
        rope_scaling_factor=8.0),
}

# OPT-1.3b geometry (reference registry's opt shim via upstream
# AutoAWQ): learned offset-2 positions, ReLU ungated MLP, layernorm,
# biases everywhere, tied head
LLM_CONFIG_PRESETS["opt"] = llama_lib.LlamaConfig(
    vocab_size=50272, hidden_size=2048, intermediate_size=8192,
    num_hidden_layers=24, num_attention_heads=32,
    num_key_value_heads=32, max_position_embeddings=2048,
    norm_type="layernorm", mlp_act="relu", mlp_gated=False,
    attention_bias=True, all_bias=True, tie_word_embeddings=True,
    pos_emb_type="learned", learned_pos_offset=2)

# gpt-neox / pythia-1.4b geometry: TWO-norm parallel residual,
# 25% partial rotary, biases everywhere except the untied head
LLM_CONFIG_PRESETS["gpt-neox"] = llama_lib.LlamaConfig(
    vocab_size=50304, hidden_size=2048, intermediate_size=8192,
    num_hidden_layers=24, num_attention_heads=16,
    num_key_value_heads=16, max_position_embeddings=2048,
    norm_type="layernorm", mlp_act="gelu", mlp_gated=False,
    attention_bias=True, all_bias=True, lm_head_bias=False,
    parallel_residual=True, parallel_norms=True,
    partial_rotary_factor=0.25)

# falcon-7b geometry: single-norm parallel residual, MQA (1 kv head),
# ungated GELU, no biases, tied head
LLM_CONFIG_PRESETS["falcon"] = llama_lib.LlamaConfig(
    vocab_size=65024, hidden_size=4544, intermediate_size=18176,
    num_hidden_layers=32, num_attention_heads=71,
    num_key_value_heads=1, max_position_embeddings=2048,
    norm_type="layernorm", mlp_act="gelu", mlp_gated=False,
    parallel_residual=True, tie_word_embeddings=True)

# starcoder2-3b geometry: layernorm + biased GQA + ungated GELU +
# 4096 sliding window, tied head
LLM_CONFIG_PRESETS["starcoder2"] = llama_lib.LlamaConfig(
    vocab_size=49152, hidden_size=3072, intermediate_size=12288,
    num_hidden_layers=30, num_attention_heads=24,
    num_key_value_heads=2, max_position_embeddings=16384,
    rope_theta=999999.4420358813, norm_type="layernorm",
    mlp_act="gelu", mlp_gated=False, attention_bias=True,
    all_bias=True, lm_head_bias=False, sliding_window=4096,
    tie_word_embeddings=True)

# phi-3-mini geometry: llama-shaped (rmsnorm, gated silu, no biases);
# the checkpoint's fused qkv/gate_up projections split in the loader
LLM_CONFIG_PRESETS["phi3"] = llama_lib.LlamaConfig(
    vocab_size=32064, hidden_size=3072, intermediate_size=8192,
    num_hidden_layers=32, num_attention_heads=32,
    num_key_value_heads=32, max_position_embeddings=4096,
    rope_theta=10000.0, sliding_window=2047)

# deepseek-v2-lite geometry: MLA with plain q_proj (no q low-rank),
# 512-latent KV + 64-dim shared rope head, deepseek MoE (64 routed
# top-6 + 2 shared experts, first layer dense, no top-k renorm) —
# the architecture the reference's quantizer names explicitly
# (quantizer.py:1106-1116); models/mla.py
LLM_CONFIG_PRESETS["deepseek-v2-lite"] = llama_lib.LlamaConfig(
    vocab_size=102400, hidden_size=2048, intermediate_size=10944,
    num_hidden_layers=27, num_attention_heads=16,
    num_key_value_heads=16, max_position_embeddings=163840,
    rope_theta=10000.0, q_lora_rank=None, kv_lora_rank=512,
    qk_nope_head_dim=128, qk_rope_head_dim=64, v_head_dim=128,
    num_experts=64, num_experts_per_tok=6, moe_layout="deepseek",
    moe_intermediate_size=1408, n_shared_experts=2,
    first_k_dense_replace=1, routed_scaling_factor=1.0,
    moe_renormalize=False)

# deepseek-v2 (236B) geometry: q ALSO low-rank (1536), 160 routed
# top-6 + 2 shared experts, routed outputs scaled 16x un-renormalized
LLM_CONFIG_PRESETS["deepseek-v2"] = llama_lib.LlamaConfig(
    vocab_size=102400, hidden_size=5120, intermediate_size=12288,
    num_hidden_layers=60, num_attention_heads=128,
    num_key_value_heads=128, max_position_embeddings=163840,
    rope_theta=10000.0, q_lora_rank=1536, kv_lora_rank=512,
    qk_nope_head_dim=128, qk_rope_head_dim=64, v_head_dim=128,
    num_experts=160, num_experts_per_tok=6, moe_layout="deepseek",
    moe_intermediate_size=1536, n_shared_experts=2,
    first_k_dense_replace=1, routed_scaling_factor=16.0,
    moe_renormalize=False)

LLM_CONFIG_PRESETS["tiny-deepseek"] = llama_lib.tiny_deepseek_config()

# cohere: parallel attention+FFN residual, tied embeddings, logit scale
# baichuan-7b geometry (llama-shaped, fused W_pack split by the
# loader); baichuan-13b class uses alibi instead of rope (module-path
# generation; the engine's rope megakernels guard it)
LLM_CONFIG_PRESETS["baichuan-7b"] = llama_lib.LlamaConfig(
    vocab_size=64000, hidden_size=4096, intermediate_size=11008,
    num_hidden_layers=32, num_attention_heads=32,
    num_key_value_heads=32, max_position_embeddings=4096)
LLM_CONFIG_PRESETS["baichuan-13b"] = llama_lib.LlamaConfig(
    vocab_size=64000, hidden_size=5120, intermediate_size=13696,
    num_hidden_layers=40, num_attention_heads=40,
    num_key_value_heads=40, max_position_embeddings=4096,
    pos_emb_type="alibi")
# yi-6b geometry: pure llama arch (01-ai configs ship model_type
# "llama"; the generic mapping covers real checkpoints directly)
LLM_CONFIG_PRESETS["yi-6b"] = llama_lib.LlamaConfig(
    vocab_size=64000, hidden_size=4096, intermediate_size=11008,
    num_hidden_layers=32, num_attention_heads=32,
    num_key_value_heads=4, rope_theta=5000000.0,
    max_position_embeddings=4096)
LLM_CONFIG_PRESETS["cohere"] = llama_lib.LlamaConfig(
    norm_type="layernorm", parallel_residual=True,
    tie_word_embeddings=True, logit_scale=0.0625)

# bloom (ALiBi + fused QKV) has its own module: qdm_tpu.models.bloom
from qdm_tpu.models.bloom import BloomConfig, BloomForCausalLM  # noqa: F401,E402


def from_pretrained(path: str, **kw):
    """Dispatch a checkpoint dir to the right pipeline by its config
    (_class_name for diffusers dirs, model_type for HF LLMs) — the
    analogue of the reference's TRANSFORMERS_AUTO_MAPPING_DICT +
    model_type dispatch (models/base.py:67-102,201-202)."""
    import json
    import os

    mi = os.path.join(path, "model_index.json")
    if os.path.exists(mi):
        with open(mi) as f:
            cls_name = json.load(f).get("_class_name", "")
        fams = diffusion_families()
        for key, cls in fams.items():
            if key in cls_name or cls_name == key:
                return cls.from_pretrained(path, **kw)
        raise ValueError(f"unknown diffusion pipeline {cls_name}")
    cfg = os.path.join(path, "config.json")
    if os.path.exists(cfg):
        from qdm_tpu.api.causal_lm import CausalLM

        return CausalLM.from_pretrained(path, **kw)
    raise FileNotFoundError(f"no model_index.json or config.json in {path}")
