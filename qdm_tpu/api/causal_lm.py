"""Causal-LM quantization pipeline — lifecycle parity with the
reference's ``BaseAWQForCausalLM`` (models/base.py:853-1922):

    lm = CausalLM.from_pretrained(path)        (base.py:1248-1336)
    lm.quantize(tokenizer, quant_config, quantType='awq')  (base.py:890-1150)
    lm.generate(ids, max_new_tokens=...)
    lm.save_quantized(dir) / CausalLM.from_quantized(dir)  (base.py:1177-1526)

TPU-native restructuring: calibration captures per-layer inputs/absmax
by sowing during one forward over the calib batch (vs the reference's
sequential per-layer Catcher + hook machinery, quantizer.py:1002-1141);
AWQ scale/clip grid searches run as jitted scans; decode uses a static
KV cache inside jit.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import re
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from qdm_tpu.calib.stats import RunningMeanMax, flatten_calib
from qdm_tpu.config import QuantConfig
from qdm_tpu.models import llama as llama_lib
from qdm_tpu.models.shims import llama_scaling_groups
from qdm_tpu.quant import apply as qapply
from qdm_tpu.quant import awq as awq_lib
from qdm_tpu.quant import smooth as smooth_lib
from qdm_tpu.quant.plan import LayerQuantSpec, QuantPlan, spec_from_config


def sample_token(logits, key, temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 0.0):
    """Pick next tokens from (B, V) logits — jittable.

    temperature<=0 is greedy argmax; otherwise temperature-scaled
    sampling with optional top-k and/or nucleus (top-p) truncation —
    the decoding knobs the reference drives through HF ``generate``
    (evaluation/humaneval_utils.py:85-95: temperature=0.2, top_p=0.95,
    do_sample=True).

    ``key`` may be one PRNG key (batch-shaped draw) or a (B, 2) batch
    of PER-ROW keys — the per-request form: each row's stream depends
    only on its own key, so a request's sampled completion is
    reproducible regardless of batch composition."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    lg = logits.astype(jnp.float32) / temperature
    if top_k and top_k > 0:
        kth = jax.lax.top_k(lg, top_k)[0][..., -1:]
        lg = jnp.where(lg < kth, -jnp.inf, lg)
    if top_p and 0.0 < top_p < 1.0:
        sort = jnp.sort(lg, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sort, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with cumulative mass >= top_p
        # (the HF convention keeps the boundary token)
        keep = cum - probs < top_p
        cutoff = jnp.min(jnp.where(keep, sort, jnp.inf), axis=-1,
                         keepdims=True)
        lg = jnp.where(lg < cutoff, -jnp.inf, lg)
    if getattr(key, "ndim", 0) == 2:                 # per-row keys (B, 2)
        return jax.vmap(
            lambda k, l: jax.random.categorical(k, l))(key, lg).astype(
                jnp.int32)
    return jax.random.categorical(key, lg, axis=-1).astype(jnp.int32)


def fold_key(key, i):
    """fold_in that transparently handles a (B, 2) per-row key batch."""
    if getattr(key, "ndim", 0) == 2:
        return jax.vmap(lambda k: jax.random.fold_in(k, i))(key)
    return jax.random.fold_in(key, i)


def mask_after_eos(tokens: np.ndarray, eos_token_id: int) -> np.ndarray:
    """Replace everything after the first EOS in each row with EOS
    (HF pad-after-eos convention; the fixed-length jit loop keeps
    generating, this post-pass makes the output well-formed)."""
    toks = np.asarray(tokens).copy()
    hit = np.cumsum(toks == eos_token_id, axis=1) > 0
    done = np.concatenate([np.zeros_like(hit[:, :1]), hit[:, :-1]], axis=1)
    toks[done] = eos_token_id
    return toks


class CausalLM:
    """LLaMA-family causal LM with the reference quantize lifecycle."""

    def __init__(self):
        self.config: Optional[llama_lib.LlamaConfig] = None
        self.params: Optional[dict] = None
        self.plan = QuantPlan()
        self.quant_config: Optional[QuantConfig] = None
        self.dtype = jnp.bfloat16
        self.is_quantized = False
        # memoized jitted generate closures (CLAUDE.md: never build a
        # fresh @jax.jit closure per call); keyed on the module
        # structure (plan/config/dtype) + sampler — new shapes retrace
        # WITHIN a cached closure, which jit handles
        self._gen_cache: Dict = {}

    # ------------------------------------------------------------------ build

    @property
    def model(self) -> llama_lib.LlamaForCausalLM:
        return llama_lib.LlamaForCausalLM(config=self.config, dtype=self.dtype,
                                          plan=self.plan)

    @classmethod
    def from_config(cls, config: Optional[llama_lib.LlamaConfig] = None,
                    dtype=jnp.float32, seed: int = 0):
        self = cls()
        self.dtype = dtype
        self.config = config or llama_lib.tiny_llama_config()
        rng = np.random.default_rng(seed)
        shapes = jax.eval_shape(
            lambda: self.model.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 8), jnp.int32)))["params"]

        def init_leaf(path, leaf):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if name in ("kernel", "embedding"):
                fan_in = int(np.prod(leaf.shape[:-1])) or 1
                return jnp.asarray(
                    rng.standard_normal(leaf.shape, np.float32) / np.sqrt(fan_in),
                    leaf.dtype)
            if name == "scale":
                # gemma (1+w) norms store a zero-centered offset
                if self.config.norm_plus_one:
                    return jnp.zeros(leaf.shape, leaf.dtype)
                return jnp.ones(leaf.shape, leaf.dtype)
            return jnp.zeros(leaf.shape, leaf.dtype)

        self.params = jax.tree_util.tree_map_with_path(init_leaf, shapes)
        return self

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        """Load an HF transformers checkpoint dir (LLaMA/Qwen2-style)."""
        from qdm_tpu.api import loader

        self = cls()
        self.dtype = dtype
        hf = loader.load_json(os.path.join(path, "config.json"))
        if hf.get("model_type") == "qwen":
            # Qwen-1 (fused c_attn arch, reference models/qwen.py):
            # remap to the canonical layout, halve the doubled ffn dim
            self.config = llama_lib.LlamaConfig(
                vocab_size=hf["vocab_size"],
                hidden_size=hf["hidden_size"],
                intermediate_size=hf["intermediate_size"] // 2,
                num_hidden_layers=hf["num_hidden_layers"],
                num_attention_heads=hf["num_attention_heads"],
                num_key_value_heads=hf["num_attention_heads"],
                max_position_embeddings=hf.get("seq_length", 8192),
                rope_theta=hf.get("rotary_emb_base", 10000.0),
                rms_norm_eps=hf.get("layer_norm_epsilon", 1e-6),
                attention_bias=True,
            )
            shapes = jax.eval_shape(
                lambda: self.model.init(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 8), jnp.int32)))["params"]
            sd = loader.qwen1_to_llama_state_dict(
                loader.load_safetensors_dir(path))
            params, missing, _ = loader.convert_torch_state_dict(
                sd, shapes, strip_prefixes=("model.",))
            if missing:
                raise ValueError(f"missing {len(missing)} params e.g. {missing[:5]}")
            self.params = params
            return self
        self.config = self.config_from_hf(hf)
        shapes = jax.eval_shape(
            lambda: self.model.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 8), jnp.int32)))["params"]
        sd = loader.load_safetensors_dir(path)
        mt = str(hf.get("model_type", ""))
        if mt.startswith("phi3"):
            sd = loader.phi3_to_llama_state_dict(
                sd, self.config.num_attention_heads,
                self.config.num_key_value_heads, self.config.head_dim)
        elif mt.startswith("phi"):
            sd = loader.phi_to_llama_state_dict(sd)
        elif mt == "opt":
            sd = loader.opt_to_llama_state_dict(sd)
        elif mt == "gpt_neox":
            sd = loader.neox_to_llama_state_dict(
                sd, self.config.num_attention_heads, self.config.head_dim)
        elif mt == "falcon":
            sd = loader.falcon_to_llama_state_dict(
                sd, self.config.num_attention_heads,
                self.config.num_key_value_heads, self.config.head_dim)
        elif mt == "starcoder2":
            sd = loader.starcoder2_to_llama_state_dict(sd)
        elif mt == "baichuan":
            sd = loader.baichuan_to_llama_state_dict(sd)
        if str(hf.get("model_type", "")).startswith("deepseek") \
                and self.config.kv_lora_rank is not None:
            # fold the interleaved rope storage into the q/kv weights
            sd = loader.deepseek_deinterleave_rope(
                sd, self.config.qk_nope_head_dim,
                self.config.qk_rope_head_dim)
        params, missing, _ = loader.convert_torch_state_dict(
            sd, shapes, strip_prefixes=("model.",))
        if missing:
            raise ValueError(f"missing {len(missing)} params e.g. {missing[:5]}")
        self.params = params
        return self

    @staticmethod
    def config_from_hf(hf: dict) -> "llama_lib.LlamaConfig":
        """HF config.json dict -> LlamaConfig, with the model_type
        family mapping (gemma/gemma2/gemma3/phi/qwen2/qwen3/mixtral
        conventions) — shared by from_pretrained and the quantized
        checkpoint importers so family semantics are never silently
        dropped."""
        # gemma family: (1+w) norms, sqrt(hidden)-scaled embeddings,
        # decoupled head_dim, tied embeddings by default
        is_gemma = str(hf.get("model_type", "")).startswith("gemma")
        mt = str(hf.get("model_type", ""))
        # phi-1/2 family: parallel residual off one layernorm, ungated
        # fc1->act->fc2 MLP, biases on every linear, partial rotary.
        # phi3 is NOT this family — it is llama-shaped (rmsnorm, gated
        # silu, no biases, fused checkpoint projections split by the
        # loader)
        is_phi = mt.startswith("phi") and not mt.startswith("phi3")
        is_opt = mt == "opt"
        is_neox = mt == "gpt_neox"
        is_falcon = mt == "falcon"
        is_starcoder2 = mt == "starcoder2"
        if mt == "baichuan":
            # baichuan: llama-shaped with a fused W_pack projection
            # (split by the loader).  7B uses rope; 13B-class uses
            # ALIBI — the HF config carries no explicit flag, so the
            # established heuristic is the geometry (13B: hidden 5120,
            # 40 heads; Baichuan2 configs ship position_embedding for
            # some revisions — honored when present)
            alibi = (str(hf.get("position_embedding", "")).lower()
                     == "alibi" or hf["hidden_size"] >= 5120)
            return llama_lib.LlamaConfig(
                vocab_size=hf["vocab_size"],
                hidden_size=hf["hidden_size"],
                intermediate_size=hf["intermediate_size"],
                num_hidden_layers=hf["num_hidden_layers"],
                num_attention_heads=hf["num_attention_heads"],
                num_key_value_heads=hf["num_attention_heads"],
                max_position_embeddings=hf.get(
                    "model_max_length",
                    hf.get("max_position_embeddings", 4096)),
                rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
                pos_emb_type="alibi" if alibi else "rope",
                tie_word_embeddings=hf.get("tie_word_embeddings",
                                           False))
        if is_opt:
            # OPT: learned absolute positions (offset-2 table), ReLU
            # ungated MLP, layernorm, biases everywhere, tied head
            return llama_lib.LlamaConfig(
                vocab_size=hf["vocab_size"],
                hidden_size=hf["hidden_size"],
                intermediate_size=hf.get("ffn_dim",
                                         4 * hf["hidden_size"]),
                num_hidden_layers=hf["num_hidden_layers"],
                num_attention_heads=hf["num_attention_heads"],
                num_key_value_heads=hf["num_attention_heads"],
                max_position_embeddings=hf.get(
                    "max_position_embeddings", 2048),
                norm_type="layernorm", mlp_act="relu", mlp_gated=False,
                attention_bias=True, all_bias=True,
                tie_word_embeddings=hf.get("tie_word_embeddings", True),
                pos_emb_type="learned", learned_pos_offset=2)
        if is_neox:
            # gpt-neox/pythia: parallel residual with TWO norms,
            # partial rotary (rotary_pct), layernorm, biases on every
            # linear except the untied embed_out head
            return llama_lib.LlamaConfig(
                vocab_size=hf["vocab_size"],
                hidden_size=hf["hidden_size"],
                intermediate_size=hf["intermediate_size"],
                num_hidden_layers=hf["num_hidden_layers"],
                num_attention_heads=hf["num_attention_heads"],
                num_key_value_heads=hf["num_attention_heads"],
                max_position_embeddings=hf.get(
                    "max_position_embeddings", 2048),
                rope_theta=hf.get("rotary_emb_base", 10000.0),
                rms_norm_eps=hf.get("layer_norm_eps", 1e-5),
                norm_type="layernorm", mlp_act="gelu", mlp_gated=False,
                attention_bias=True, all_bias=True, lm_head_bias=False,
                parallel_residual=hf.get("use_parallel_residual", True),
                parallel_norms=True,
                partial_rotary_factor=hf.get("rotary_pct", 0.25),
                tie_word_embeddings=hf.get("tie_word_embeddings", False))
        if is_falcon:
            # falcon: parallel residual (one norm on 7b, ln_attn/
            # ln_mlp two-norm on new_decoder_architecture), MQA/GQA
            # fused qkv split by the loader, ungated GELU, no biases
            new_arch = hf.get("new_decoder_architecture", False)
            hkv = (hf.get("num_kv_heads", 1) if new_arch
                   else (1 if hf.get("multi_query", True)
                         else hf["num_attention_heads"]))
            return llama_lib.LlamaConfig(
                vocab_size=hf["vocab_size"],
                hidden_size=hf["hidden_size"],
                intermediate_size=hf.get("ffn_hidden_size",
                                         4 * hf["hidden_size"]),
                num_hidden_layers=hf["num_hidden_layers"],
                num_attention_heads=hf["num_attention_heads"],
                num_key_value_heads=hkv,
                max_position_embeddings=hf.get(
                    "max_position_embeddings", 2048),
                rope_theta=hf.get("rope_theta", 10000.0),
                rms_norm_eps=hf.get("layer_norm_epsilon", 1e-5),
                norm_type="layernorm", mlp_act="gelu", mlp_gated=False,
                attention_bias=bool(hf.get("bias", False)),
                all_bias=bool(hf.get("bias", False)),
                parallel_residual=hf.get("parallel_attn", True),
                parallel_norms=new_arch,
                tie_word_embeddings=hf.get("tie_word_embeddings", True))
        if is_starcoder2:
            return llama_lib.LlamaConfig(
                vocab_size=hf["vocab_size"],
                hidden_size=hf["hidden_size"],
                intermediate_size=hf["intermediate_size"],
                num_hidden_layers=hf["num_hidden_layers"],
                num_attention_heads=hf["num_attention_heads"],
                num_key_value_heads=hf.get("num_key_value_heads", 4),
                max_position_embeddings=hf.get(
                    "max_position_embeddings", 16384),
                rope_theta=hf.get("rope_theta", 10000.0),
                rms_norm_eps=hf.get("norm_epsilon", 1e-5),
                norm_type="layernorm", mlp_act="gelu", mlp_gated=False,
                attention_bias=hf.get("use_bias", True),
                all_bias=hf.get("use_bias", True), lm_head_bias=False,
                sliding_window=hf.get("sliding_window"),
                tie_word_embeddings=hf.get("tie_word_embeddings", True))
        # qwen3 family: per-head q/k RMSNorm before rope, no attn bias
        is_qwen3 = str(hf.get("model_type", "")).startswith("qwen3")
        # gemma3: gemma2's sandwich norms + alternating windows (pattern
        # 6), QK-norm instead of the attention soft-cap, and DUAL rope
        # (local layers 10k base, global layers 1M with linear scaling)
        is_gemma3 = str(hf.get("model_type", "")).startswith("gemma3")
        # deepseek_v2/v3: MLA attention + deepseek MoE layout (the one
        # architecture the reference's quantizer names explicitly,
        # quantizer.py:1106-1116)
        is_deepseek = str(hf.get("model_type", "")).startswith("deepseek")
        if str(hf.get("model_type", "")).startswith("deepseek_v3"):
            # V3 routing is NOT V2 semantics: sigmoid scores with
            # e_score_correction_bias, group-limited top-k, and
            # norm_topk_prob=True renormalization COMBINED with
            # routed_scaling_factor (V2 applies the factor only when
            # not renormalizing).  Mapping a V3 checkpoint onto the V2
            # path would load without error and be silently wrong.
            raise NotImplementedError(
                "deepseek_v3 checkpoints are not supported (sigmoid "
                "score routing + group-limited top-k + score "
                "correction bias are unimplemented); deepseek_v2 "
                "family checkpoints are")
        return llama_lib.LlamaConfig(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            intermediate_size=hf["intermediate_size"],
            num_hidden_layers=hf["num_hidden_layers"],
            num_attention_heads=hf["num_attention_heads"],
            num_key_value_heads=hf.get("num_key_value_heads",
                                       hf["num_attention_heads"]),
            max_position_embeddings=hf.get("max_position_embeddings", 4096),
            rope_theta=hf.get("rope_theta", 10000.0),
            rms_norm_eps=hf.get("rms_norm_eps",
                                hf.get("layer_norm_eps", 1e-6)),
            attention_bias=hf.get("attention_bias",
                                  hf.get("model_type") == "qwen2"
                                  or is_phi),
            tie_word_embeddings=hf.get("tie_word_embeddings", is_gemma),
            mlp_act="gelu" if str(hf.get("hidden_act",
                                         hf.get("hidden_activation", "silu"))
                                  ).startswith("gelu") else "silu",
            norm_type="layernorm" if is_phi else "rmsnorm",
            parallel_residual=is_phi,
            partial_rotary_factor=hf.get("partial_rotary_factor", 1.0),
            mlp_gated=not is_phi,
            all_bias=is_phi,
            norm_plus_one=is_gemma,
            scale_embeddings=is_gemma,
            head_dim_override=hf.get("head_dim"),
            # mistral/qwen2 sliding-window attention (qwen2 checkpoints
            # carry the field but gate it off via use_sliding_window)
            sliding_window=(hf.get("sliding_window")
                            if hf.get("use_sliding_window", True)
                            else None),
            # gemma2: alternating local/global layers (pattern 2),
            # sandwich norms, attn/final logit soft-caps, query scale
            sliding_window_pattern=hf.get(
                "sliding_window_pattern",
                2 if hf.get("model_type") == "gemma2" else
                (6 if is_gemma3 else 1)),
            attn_logit_softcapping=hf.get("attn_logit_softcapping"),
            final_logit_softcapping=hf.get("final_logit_softcapping"),
            sandwich_norms=hf.get("model_type") == "gemma2" or is_gemma3,
            query_pre_attn_scalar=hf.get("query_pre_attn_scalar"),
            # Mixtral-family sparse MoE (models/moe.py); deepseek uses
            # n_routed_experts + its own layout (shared experts,
            # first-k dense, no top-k renorm)
            num_experts=hf.get("num_local_experts",
                               hf.get("n_routed_experts", 0) or 0),
            num_experts_per_tok=hf.get("num_experts_per_tok", 2),
            moe_layout="deepseek" if is_deepseek else "mixtral",
            moe_intermediate_size=hf.get("moe_intermediate_size"),
            n_shared_experts=hf.get("n_shared_experts", 0) or 0,
            first_k_dense_replace=hf.get("first_k_dense_replace", 0) or 0,
            routed_scaling_factor=hf.get("routed_scaling_factor", 1.0),
            moe_renormalize=(hf.get("norm_topk_prob", True)
                             if is_deepseek else True),
            # deepseek MLA geometry (None kv_lora_rank = plain MHA)
            q_lora_rank=hf.get("q_lora_rank") if is_deepseek else None,
            kv_lora_rank=hf.get("kv_lora_rank") if is_deepseek else None,
            qk_nope_head_dim=hf.get("qk_nope_head_dim", 128),
            qk_rope_head_dim=hf.get("qk_rope_head_dim", 64),
            v_head_dim=hf.get("v_head_dim", 128),
            qk_norm=is_qwen3 or is_gemma3,
            rope_local_theta=hf.get("rope_local_base_freq"),
            # LINEAR rope scaling only (gemma3 global layers): llama3 /
            # yarn / dynamic rope_scaling types are NOT position
            # division — applying their 'factor' linearly would rotate
            # every token wrongly, so those fall back to plain rope
            rope_scaling_factor=(
                (hf.get("rope_scaling") or {}).get("factor", 1.0)
                if ((hf.get("rope_scaling") or {}).get("rope_type")
                    or (hf.get("rope_scaling") or {}).get("type"))
                == "linear" else 1.0),
        )

    # --------------------------------------------------------------- quantize

    def _make_plan(self, cfg: QuantConfig) -> QuantPlan:
        plan = QuantPlan(default=spec_from_config(cfg, conv=False),
                         fuse_qkv=getattr(cfg, "fuse_projections", False))
        # lm_head / embeddings are never converted (reference
        # modules_to_not_convert + kernel-path exclusions)
        plan = plan.with_rule("lm_head", None)
        for pat in (cfg.modules_to_not_convert or []):
            plan = plan.with_rule(pat, None)
        if self.config is not None and self.config.num_experts > 0:
            # MoE router stays fp (AutoAWQ mixtral modules_to_not_convert
            # = ["gate"]): a handful of FLOPs that steer every token
            plan = plan.with_rule("block_sparse_moe/gate", None)
            if getattr(self.config, "moe_layout", "mixtral") == "deepseek":
                # deepseek router path is 'mlp/gate'; the substring rule
                # also catches 'mlp/gate_proj', so re-apply the default
                # spec to gate_proj AFTER (last matching rule wins)
                plan = plan.with_rule("mlp/gate", None)
                plan = plan.with_rule("mlp/gate_proj",
                                      spec_from_config(cfg, conv=False))
        return plan

    def _calibrate(self, cfg: QuantConfig, calib_ids: np.ndarray,
                   capture_inputs: bool, capture_gram: bool = False,
                   capture_seq: int = 0):
        """capture_inputs: sampled input rows (AWQ).  capture_gram:
        per-layer X^T X Gram matrices summed over ALL calibration
        tokens (GPTQ Hessians — full-data, bounded (C, C) memory);
        returned in the same feats dict, keyed by layer path.
        capture_seq > 0: additionally capture (nb, S, C) SEQUENCE
        blocks at q-projection inputs (keyed '<path>::seq') — the AWQ
        attention-module loss needs sequence structure to attend."""
        plan = self.plan.with_capture(True, inputs=capture_inputs,
                                      gram=capture_gram, seq=capture_seq)
        model = llama_lib.LlamaForCausalLM(config=self.config, dtype=self.dtype,
                                           plan=plan)
        run = RunningMeanMax()
        feats: Dict[str, list] = {}
        grams: Dict[str, jnp.ndarray] = {}
        mutable = (["calib"] + (["calib_x"] if capture_inputs else [])
                   + (["calib_h"] if capture_gram else [])
                   + (["calib_s"] if capture_seq else []))

        @jax.jit
        def fwd(params, ids):
            _, mut = model.apply({"params": params}, ids, mutable=mutable)
            stats = flatten_calib(mut["calib"])
            xs = flatten_calib(mut["calib_x"], leaf="x") if capture_inputs else {}
            hs = (flatten_calib(mut["calib_h"], leaf="h")
                  if capture_gram else {})
            ss = (flatten_calib(mut.get("calib_s", {}), leaf="xs")
                  if capture_seq else {})
            return stats, xs, hs, ss

        bs = cfg.calib.batch_size
        for i in range(0, calib_ids.shape[0], bs):
            stats, xs, hs, ss = fwd(self.params,
                                    jnp.asarray(calib_ids[i:i + bs]))
            run.update(stats)
            for k, v in xs.items():
                feats.setdefault(k, []).append(v)
            for k, v in ss.items():
                feats.setdefault(k + "::seq", []).append(v)
            for k, v in hs.items():
                grams[k] = grams[k] + v if k in grams else v
        input_feats = {k: jnp.concatenate(v, axis=0) for k, v in feats.items()}
        input_feats.update(grams)
        return run.mean(), input_feats

    def _awq_sequential(self, cfg: QuantConfig, calib_ids: np.ndarray):
        """Faithful AWQ layer loop (quantizer.py:216-385): inputs for
        layer i+1 are produced by the already-scaled/clipped/quantized
        layer i.  Per layer: capture linear inputs, grid-search scales,
        clip, fake-quantize, then propagate."""
        from qdm_tpu.models.llama import LlamaDecoderLayer

        model = self.model
        embed_table = self.params["embed_tokens"]["embedding"]
        ids = jnp.asarray(calib_ids)
        x = embed_table[ids].astype(self.dtype)
        b, s = ids.shape
        positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))

        layer_names = sorted((k for k in self.params if k.startswith("layers_")),
                             key=lambda k: int(k.split("_")[1]))
        from qdm_tpu.models.shims import attn_geom_from_config

        plan_cap = self.plan.with_capture(True, inputs=True, seq=4)
        for lname in layer_names:
            layer_params = self.params[lname]
            groups_full = llama_scaling_groups(
                {lname: layer_params},
                norm_plus_one=self.config.norm_plus_one,
                mlp_act=self.config.mlp_act,
                moe_top_k=self.config.num_experts_per_tok,
                moe_renormalize=getattr(self.config, 'moe_renormalize', True),
                attn_geom=attn_geom_from_config(self.config))
            groups = [dataclasses.replace(g, prev_path=g.prev_path[1:],
                                          layer_paths=tuple(p[1:] for p in g.layer_paths),
                                          block=(g.block[0], g.block[1][1:])
                                          if g.block else None)
                      for g in groups_full]
            layer_mod = LlamaDecoderLayer(self.config, dtype=self.dtype,
                                          plan=plan_cap)
            (_, _), mut = layer_mod.apply({"params": layer_params}, x, positions,
                                          mutable=["calib", "calib_x",
                                                   "calib_s"])
            from qdm_tpu.calib.stats import flatten_calib

            feats = flatten_calib(mut["calib_x"], leaf="x")
            feats.update({k + "::seq": v for k, v in flatten_calib(
                mut.get("calib_s", {}), leaf="xs").items()})
            new_layer = awq_lib.awq_search_and_apply(layer_params, groups,
                                                     feats, cfg)
            new_layer = qapply.fake_quantize_params(
                new_layer, self._make_plan(cfg))
            self.params[lname] = new_layer
            # propagate through the quantized layer (quantizer.py:1135)
            layer_q = LlamaDecoderLayer(self.config, dtype=self.dtype,
                                        plan=self.plan)
            x, _ = layer_q.apply({"params": new_layer}, x, positions)

    def quantize(self, tokenizer=None, quant_config: Optional[dict] = None,
                 quantType: str = "awq", calib_data: Optional[np.ndarray] = None,
                 sequential: bool = False,
                 debug_attention_path: Optional[str] = None,
                 smooth: bool = False):
        """calib_data: (n, seq) int32 token blocks; if None, built from
        qdm_tpu.calib.data.get_calib_dataset (pileval semantics).
        sequential=True runs the reference's per-layer AWQ propagation
        (slower, more faithful; default is one-shot capture).
        debug_attention_path: directory for the attention-delta
        diagnostic (reference debugAttentionMap,
        quantizer.py:305-317,358-373): layer-0 attention-prob deltas
        before-scale/after-scale vs after-quant, JSON + optional PNG.
        smooth=True (quantType='gptq' only) runs a SmoothQuant
        pre-migration before the Hessian capture — the composed
        smooth+gptq quantizer."""
        cfg = quant_config if isinstance(quant_config, QuantConfig) \
            else QuantConfig.from_dict(quant_config)
        cfg.quant_method = quantType.lower()
        self.quant_config = cfg
        plan = self._make_plan(cfg)

        def _qk_snapshot(params):
            layer0 = params.get("layers_0", {}).get("self_attn", {})
            if "q_proj" in layer0 and "kernel" in layer0.get("q_proj", {}):
                return (np.asarray(layer0["q_proj"]["kernel"]),
                        np.asarray(layer0["k_proj"]["kernel"]))
            return None

        qk_before = _qk_snapshot(self.params) if debug_attention_path else None
        attn_x = None

        method = cfg.quant_method
        if smooth and method != "gptq":
            raise ValueError("smooth=True composes with quantType='gptq' "
                             "only; plain smoothing is quantType='sq'")
        if method == "awq" and sequential and cfg.version != "real":
            if calib_data is None:
                from qdm_tpu.calib.data import get_calib_dataset

                calib_data = get_calib_dataset(
                    tokenizer=tokenizer, n_samples=min(cfg.calib.n_samples, 32),
                    max_seq_len=cfg.calib.max_seq_len)
            self._awq_sequential(cfg, np.asarray(calib_data))
            # non-layer params (embeddings/norms) stay fp; lm_head excluded
            if plan.fuse_qkv:
                self.params = qapply.fuse_qkv_params(self.params)
            self.plan = plan
            self.is_quantized = True
            return self
        if method == "gptq":
            # beyond-reference extension (quant/gptq.py): Hessian-aware
            # error-compensated placement on the SAME grids as RTN/AWQ.
            # GPTQ's output IS the quantized weight — the shared RTN
            # fake/pack transforms would re-round it, so this branch
            # finishes on its own (incl. version='real': packs carry
            # the search's own codes/scales/zeros, gptq_pack_params).
            from qdm_tpu.quant import gptq as gptq_lib

            if calib_data is None:
                from qdm_tpu.calib.data import get_calib_dataset

                calib_data = get_calib_dataset(
                    tokenizer=tokenizer,
                    n_samples=min(cfg.calib.n_samples, 32),
                    max_seq_len=cfg.calib.max_seq_len)
            if smooth:
                # SmoothQuant pre-migration (composes: smoothing moves
                # the outliers, GPTQ then compensates the rounding on
                # the migrated weights — Hessians MUST be captured
                # after migration, the inputs change by 1/s)
                stats, _ = self._calibrate(cfg, np.asarray(calib_data),
                                           capture_inputs=False)
                groups = llama_scaling_groups(
                    self.params, include_fc_groups=False,
                    norm_plus_one=self.config.norm_plus_one)
                self.params = smooth_lib.smooth_params(
                    self.params, groups, stats,
                    alpha=cfg.alpha if cfg.alpha != 0.80 else 0.5)
            _, feats = self._calibrate(cfg, np.asarray(calib_data),
                                       capture_inputs=False,
                                       capture_gram=True)
            if cfg.version == "real":
                if plan.fuse_qkv:
                    # fused projections share their input, so the fused
                    # kernel's Hessian is the constituents' Gram —
                    # fuse fp weights first, GPTQ the fused kernels
                    self.params = qapply.fuse_qkv_params(self.params)
                    feats = gptq_lib.remap_fused_grams(feats)
                self.params = gptq_lib.gptq_pack_params(self.params, plan,
                                                        feats)
            else:
                self.params = gptq_lib.gptq_quantize_params(
                    self.params, plan, feats)
                if plan.fuse_qkv:
                    # fusing after quantization keeps per-projection
                    # grids (each GPTQ'd against its own Hessian)
                    self.params = qapply.fuse_qkv_params(self.params)
            self.plan = plan
            self.is_quantized = True
            return self
        if method in ("awq", "sq", "smooth", "smoothquant"):
            if calib_data is None:
                from qdm_tpu.calib.data import get_calib_dataset

                calib_data = get_calib_dataset(
                    tokenizer=tokenizer, n_samples=min(cfg.calib.n_samples, 32),
                    max_seq_len=cfg.calib.max_seq_len)
            stats, feats = self._calibrate(cfg, np.asarray(calib_data),
                                           capture_inputs=(method == "awq"),
                                           capture_seq=(4 if method == "awq"
                                                        else 0))
            if qk_before is not None and feats:
                for key, rows in feats.items():
                    if ("layers_0" in key and "q_proj" in key
                            and not key.endswith("::seq")):
                        attn_x = np.asarray(rows)
                        break
            from qdm_tpu.models.shims import attn_geom_from_config

            groups = llama_scaling_groups(
                self.params, include_fc_groups=(method == "awq"),
                norm_plus_one=self.config.norm_plus_one,
                mlp_act=self.config.mlp_act,
                moe_top_k=self.config.num_experts_per_tok,
                moe_renormalize=getattr(self.config, 'moe_renormalize', True),
                attn_geom=(attn_geom_from_config(self.config)
                           if method == "awq" else None))
            if method == "awq":
                self.params = awq_lib.awq_search_and_apply(
                    self.params, groups, feats, cfg)
            else:
                # alpha = 0.5 for LLMs (quantizer_SQ.py:287)
                norm_groups = [g for g in groups]
                self.params = smooth_lib.smooth_params(
                    self.params, norm_groups, stats,
                    alpha=cfg.alpha if cfg.alpha != 0.80 else 0.5)

        if qk_before is not None:
            # attention-delta diagnostic (debugAttentionMap parity):
            # probs from the (possibly scale-migrated) weights vs their
            # fake-quantized counterparts
            from qdm_tpu.utils import diagnostics as diag

            qk_scaled = _qk_snapshot(self.params)
            qk_quant = _qk_snapshot(
                qapply.fake_quantize_params(self.params, plan))
            if attn_x is None:
                rng = np.random.default_rng(0)
                attn_x = rng.standard_normal(
                    (32, qk_before[0].shape[0])).astype(np.float32)
            report = diag.attention_delta_report(
                attn_x, qk_before, qk_scaled, qk_quant,
                num_heads=self.config.num_attention_heads)
            os.makedirs(debug_attention_path, exist_ok=True)
            diag.save_report(report, os.path.join(debug_attention_path,
                                                  "attention_delta.json"))
            diag.plot_attention_delta(
                report, os.path.join(debug_attention_path,
                                     "AttentionDelta_AWQ.png"))

        if plan.fuse_qkv:
            # after scale migration (groups address unfused paths),
            # before packing — fuse_qkv_params contract
            self.params = qapply.fuse_qkv_params(self.params)
        if cfg.version == "real":
            self.params = qapply.pack_params(self.params, plan)
        else:
            self.params = qapply.fake_quantize_params(self.params, plan)
        self.plan = plan
        self.is_quantized = True
        return self

    # ------------------------------------------------------------------ serve

    def serve(self, calib_ids=None, mode: str = "w4a8_static",
              smooth: bool = False, smooth_alpha: float = 0.5,
              awq: bool = False, gptq: bool = False, **engine_kw):
        """Build the megakernel serving engine for this model — the
        production decode path (qdm_tpu/api/serve.py).  One call wraps
        the serving flow: optional SmoothQuant or AWQ weight-space
        migration, optional GPTQ weight-code placement on the engine
        grids (gptq=True — Hessians captured after any migration;
        serving speed is identical, quality-table rows), static
        act-scale calibration, engine construction.

        ``mode``: 'w4a8_static' (default; int4 weights on the int8 MXU
        — the measured serve AND batch-1 winner, BENCH_NOTES round 3),
        'w8a8_static', or 'bf16'.  ``calib_ids`` (B, S) int tokens are
        required for the quantized modes.  Extra kwargs (kv_dtype,
        merge_o, head_quant, mesh, prefill_quant, ...) pass through to
        :class:`DecodeEngine`.  Counterpart of the reference's
        ``fuse_layers=True`` serving entry (models/base.py:1338-1526 →
        fuse_layers base.py:1494-1515)."""
        from qdm_tpu.api.serve import DecodeEngine

        if mode == "bf16":
            if smooth or awq or gptq:
                raise ValueError("smooth/awq/gptq target the quantized "
                                 "serve modes; they would be a silent "
                                 "no-op (smooth/gptq) or an unmeasured "
                                 "clip (awq) on bf16")
            return DecodeEngine(self, mode="bf16", **engine_kw)
        if calib_ids is None:
            raise ValueError(f"mode={mode!r} needs calib_ids for static "
                             "activation-scale calibration")
        if smooth:
            DecodeEngine.smooth_lm(self, calib_ids, alpha=smooth_alpha)
        if awq:
            # clip search must target the SAME group quantizer the
            # engine realizes (i4_group can shrink below 128 on tiny /
            # sharded dims)
            from qdm_tpu.api.serve import _i4_layout

            mesh = engine_kw.get("mesh")
            tp = (int(mesh.shape["model"])
                  if mesh is not None and "model" in mesh.axis_names else 1)
            if mode == "w4a8_static":
                group, _ = _i4_layout(self.config, tp)
                DecodeEngine.awq_lm(self, calib_ids, w_bits=4,
                                    group_size=group)
            else:
                # engine int8 weights are per-out-channel (one group
                # spanning the row): group_size=0 -> per-channel search
                DecodeEngine.awq_lm(self, calib_ids, w_bits=8,
                                    group_size=0)
        if gptq:
            # GPTQ code placement on the engine grids — after the
            # migrations above (they mutate weights, changing every
            # layer's inputs), quality-best composed with smooth=True.
            # ONE capture forward returns both stats and Hessians.
            stats, grams = DecodeEngine.calibrate_with_grams(
                self, np.asarray(calib_ids))
            engine_kw["gptq_grams"] = grams
        else:
            stats = DecodeEngine.calibrate_scales(self,
                                                  np.asarray(calib_ids))
        return DecodeEngine(self, mode=mode, act_stats=stats, **engine_kw)

    # --------------------------------------------------------------- generate

    def logits(self, input_ids) -> jnp.ndarray:
        out, _ = self.model.apply({"params": self.params},
                                  jnp.asarray(input_ids))
        return out

    def generate(self, input_ids, max_new_tokens: int = 32,
                 kv_cache_dtype=None, temperature: float = 0.0,
                 top_k: int = 0, top_p: float = 0.0, seed: int = 0,
                 eos_token_id: Optional[int] = None) -> np.ndarray:
        """Decode with a static KV cache inside jit — greedy by
        default, sampling when temperature > 0 (top_k / top_p as in
        HF ``generate``, which the reference drives; see sample_token).

        kv_cache_dtype=jnp.int8 stores the cache quantized (per-token
        per-head scales) — half the cache HBM traffic at large
        batch/long context.  eos_token_id masks everything after the
        first EOS per row with EOS (pad-after-eos convention)."""
        if temperature <= 0.0 and (top_k or top_p):
            raise ValueError(
                "top_k/top_p need temperature > 0 (HF do_sample uses "
                "temperature=1.0 by default); temperature<=0 is greedy")
        model = self.model
        ids = jnp.asarray(input_ids)
        b, s = ids.shape
        max_len = s + max_new_tokens
        caches = model.init_cache(b, max_len, kv_cache_dtype)
        # memoize the jitted closures (a fresh @jax.jit per call
        # re-traces every call — the measured 4.3x pipeline bug;
        # repeated sampled calls, e.g. humaneval candidates, reuse)
        memo = ("gen", self.plan, id(self.config), str(self.dtype),
                float(temperature), int(top_k), float(top_p))
        fns = self._gen_cache.get(memo)
        if fns is None:
            pick = functools.partial(sample_token, temperature=temperature,
                                     top_k=top_k, top_p=top_p)

            @jax.jit
            def prefill(params, ids, caches, key):
                logits, caches = model.apply({"params": params}, ids,
                                             kv_caches=caches,
                                             cache_index=0,
                                             last_logits_only=True)
                return pick(logits[:, -1], key), caches

            @jax.jit
            def step(params, tok, caches, idx, key):
                logits, caches = model.apply({"params": params},
                                             tok[:, None], kv_caches=caches,
                                             cache_index=idx)
                return pick(logits[:, -1], key), caches

            fns = (prefill, step)
            self._gen_cache[memo] = fns
        prefill, step = fns
        key = jax.random.PRNGKey(seed)
        tok, caches = prefill(self.params, ids, caches, key)
        out = [np.asarray(tok)]
        done = (out[0] == eos_token_id) if eos_token_id is not None else None
        for i in range(max_new_tokens - 1):
            if done is not None and done.all():
                # every row finished: the remaining tokens would be
                # masked to EOS anyway — stop paying for the steps
                out.extend([np.full_like(out[0], eos_token_id)]
                           * (max_new_tokens - 1 - i))
                break
            tok, caches = step(self.params, tok, caches, s + i,
                               jax.random.fold_in(key, i + 1))
            out.append(np.asarray(tok))
            if done is not None:
                done = done | (out[-1] == eos_token_id)
        new = np.stack(out, 1)
        if eos_token_id is not None:
            new = mask_after_eos(new, eos_token_id)
        return np.concatenate([np.asarray(ids), new], axis=1)

    def generate_speculative(self, input_ids, max_new_tokens: int,
                             draft: "CausalLM", gamma: int = 4,
                             kv_cache_dtype=None) -> np.ndarray:
        """Greedy speculative decoding: ``draft`` proposes ``gamma``
        tokens autoregressively, the target verifies them in ONE
        forward, and the longest matching prefix (+1 corrected/bonus
        token) is accepted.  Greedy accept/reject makes the output
        token-identical to plain ``generate`` — only the number of
        target forwards changes.

        Serving extension beyond the reference (its decode path is
        plain autoregressive, models/base.py:828-850).  Static shapes
        throughout: draft steps are (1,1) forwards, verification is one
        (1, gamma+1) forward; rewind after rejection is free because
        the causal mask keys off cache_index, so stale cache entries
        past the accepted position are never read and are overwritten
        on the next round.  Batch 1 (the canonical latency regime)."""
        model, dmodel = self.model, draft.model
        ids = jnp.asarray(input_ids)
        b, s = ids.shape
        if b != 1:
            raise ValueError("speculative decoding is batch-1 only")
        max_len = s + max_new_tokens + gamma + 1
        t_cache = model.init_cache(b, max_len, kv_cache_dtype)
        d_cache = dmodel.init_cache(b, max_len, kv_cache_dtype)

        @jax.jit
        def t_prefill(params, ids, caches):
            lg, caches = model.apply({"params": params}, ids,
                                     kv_caches=caches, cache_index=0)
            return jnp.argmax(lg[:, -1], axis=-1), caches

        @jax.jit
        def d_prefill(params, ids, caches):
            _, caches = dmodel.apply({"params": params}, ids,
                                     kv_caches=caches, cache_index=0)
            return caches

        @jax.jit
        def d_step(params, tok, caches, idx):
            lg, caches = dmodel.apply({"params": params}, tok[:, None],
                                      kv_caches=caches, cache_index=idx)
            return jnp.argmax(lg[:, -1], axis=-1), caches

        @functools.partial(jax.jit, static_argnames=("n",))
        def d_steps(params, tok, caches, idx, n):
            # all gamma draft proposals in ONE dispatch (the per-step
            # host round trip costs ~ms through the tunneled device)
            def body(carry, i):
                tok, caches = carry
                lg, caches = dmodel.apply(
                    {"params": params}, tok[:, None],
                    kv_caches=caches, cache_index=idx + i)
                nxt = jnp.argmax(lg[:, -1], axis=-1)
                return (nxt, caches), nxt

            (_, caches), toks = jax.lax.scan(body, (tok, caches),
                                             jnp.arange(n))
            return toks[:, 0], caches

        @jax.jit
        def t_verify(params, toks, caches, idx):
            # toks (1, gamma+1) = [cur, d_1..d_gamma]; returns the
            # target's greedy predictions t_1..t_{gamma+1}
            lg, caches = model.apply({"params": params}, toks,
                                     kv_caches=caches, cache_index=idx)
            return jnp.argmax(lg, axis=-1), caches

        cur, t_cache = t_prefill(self.params, ids, t_cache)
        d_cache = d_prefill(draft.params, ids, d_cache)
        out: List[int] = [int(cur[0])]
        accepted_per_round: List[int] = []
        n = s  # next cache write index for both models
        while len(out) < max_new_tokens:
            d_vec, d_cache = d_steps(draft.params, cur, d_cache,
                                     jnp.int32(n), gamma)      # (gamma,)
            toks = jnp.concatenate([cur, d_vec])[None]         # (1, gamma+1)
            preds, t_cache = t_verify(self.params, toks, t_cache,
                                      jnp.int32(n))
            t_vec = np.asarray(preds[0])                       # t_1..t_{g+1}
            d_np = np.asarray(d_vec)
            a = 0
            while a < gamma and d_np[a] == t_vec[a]:
                a += 1
            emitted = t_vec[: a + 1]                           # incl. bonus/fix
            out.extend(int(t) for t in emitted)
            accepted_per_round.append(a)
            if a == gamma:
                # full accept: the draft never wrote d_gamma's KV
                # (its last step consumed d_{gamma-1} at n+gamma-1).
                # Without this, position n+gamma stays a zero row the
                # draft attends to forever — output stays correct (the
                # target verifies) but acceptance silently degrades.
                _, d_cache = d_step(draft.params, d_vec[-1:], d_cache,
                                    jnp.int32(n + gamma))
            n += a + 1
            cur = jnp.asarray(emitted[-1:])
        out = out[:max_new_tokens]
        # diagnostics for benchmarking/tests: per-round accepted draft
        # tokens (each round emits accepted+1 incl. the bonus token)
        self.last_spec_stats = {
            "rounds": len(accepted_per_round),
            "accepted_per_round": accepted_per_round,
            "acceptance_rate": (sum(accepted_per_round)
                                / (gamma * len(accepted_per_round))
                                if accepted_per_round else 0.0),
        }
        return np.concatenate([np.asarray(ids),
                               np.asarray(out, np.int64)[None]], axis=1)

    def generate_speculative_scan(self, input_ids, max_new_tokens: int,
                                  draft: "CausalLM", gamma: int = 4,
                                  kv_cache_dtype=None) -> np.ndarray:
        """``generate_speculative`` with the entire propose/verify/
        accept loop inside ONE jitted ``lax.while_loop`` — a single
        device dispatch for the whole generation (the host-driven
        variant pays a per-round host round trip, which through the
        tunneled TPU costs more than the compute).  Token-identical
        output (tested); rejection bookkeeping is traced: the accepted
        count indexes a dynamic slice of the verifier's predictions and
        advances the cache write index, stale cache rows past it are
        masked by cache_index and overwritten next round.  Serving
        extension beyond the reference (its decode is plain
        autoregressive, models/base.py:828-850)."""
        ids = jnp.asarray(input_ids)
        b, s = ids.shape
        if b != 1:
            raise ValueError("speculative decoding is batch-1 only")
        max_len = s + max_new_tokens + gamma + 1
        buf_len = max_new_tokens + gamma + 1
        key = ("spec_scan", s, max_new_tokens, gamma, str(kv_cache_dtype),
               id(draft), self.plan, draft.plan)
        cache = getattr(self, "_jit_cache", None)
        if cache is None:
            cache = self._jit_cache = {}
        run = cache.get(key)
        if run is None:
            model, dmodel = self.model, draft.model

            def _run(tparams, dparams, ids, t_cache, d_cache):
                lg, t_cache = model.apply({"params": tparams}, ids,
                                          kv_caches=t_cache, cache_index=0)
                cur = jnp.argmax(lg[:, -1], axis=-1)
                _, d_cache = dmodel.apply({"params": dparams}, ids,
                                          kv_caches=d_cache, cache_index=0)
                outbuf = jnp.zeros((buf_len,), jnp.int32).at[0].set(
                    cur[0].astype(jnp.int32))

                def cond(st):
                    return st[4] < max_new_tokens

                def body(st):
                    cur, t_cache, d_cache, n, produced, outbuf, rounds, acc = st

                    def dbody(carry, i):
                        tok, cs = carry
                        lg, cs = dmodel.apply({"params": dparams},
                                              tok[:, None], kv_caches=cs,
                                              cache_index=n + i)
                        nxt = jnp.argmax(lg[:, -1], axis=-1)
                        return (nxt, cs), nxt

                    (_, d_cache), d_toks = jax.lax.scan(
                        dbody, (cur, d_cache), jnp.arange(gamma))
                    d_vec = d_toks[:, 0]                       # (gamma,)
                    toks = jnp.concatenate([cur, d_vec])[None]  # (1, g+1)
                    lg, t_cache = model.apply({"params": tparams}, toks,
                                              kv_caches=t_cache,
                                              cache_index=n)
                    t_vec = jnp.argmax(lg[0], axis=-1)          # (g+1,)
                    match = jnp.cumprod(
                        (d_vec == t_vec[:gamma]).astype(jnp.int32))
                    a = jnp.sum(match)
                    outbuf = jax.lax.dynamic_update_slice(
                        outbuf, t_vec.astype(jnp.int32), (produced,))

                    def fill_hole(dc):
                        # full accept: the draft never wrote d_gamma's
                        # KV (same hole as the host variant)
                        _, dc = dmodel.apply({"params": dparams},
                                             d_vec[-1:][:, None],
                                             kv_caches=dc,
                                             cache_index=n + gamma)
                        return dc

                    d_cache = jax.lax.cond(a == gamma, fill_hole,
                                           lambda dc: dc, d_cache)
                    cur = jax.lax.dynamic_slice(t_vec, (a,), (1,))
                    return (cur, t_cache, d_cache, n + a + 1,
                            produced + a + 1, outbuf, rounds + 1, acc + a)

                st = (cur, t_cache, d_cache, jnp.int32(s), jnp.int32(1),
                      outbuf, jnp.int32(0), jnp.int32(0))
                st = jax.lax.while_loop(cond, body, st)
                return st[5], st[6], st[7]

            run = cache[key] = jax.jit(_run)

        t_cache = self.model.init_cache(b, max_len, kv_cache_dtype)
        d_cache = draft.model.init_cache(b, max_len, kv_cache_dtype)
        outbuf, rounds, accepted = run(self.params, draft.params, ids,
                                       t_cache, d_cache)
        rounds, accepted = int(rounds), int(accepted)
        self.last_spec_stats = {
            "rounds": rounds,
            "acceptance_rate": accepted / (gamma * rounds) if rounds else 0.0,
        }
        out = np.asarray(outbuf)[:max_new_tokens].astype(np.int64)
        return np.concatenate([np.asarray(ids), out[None]], axis=1)

    def quantized_draft(self, mode: str = "w8a8_xla") -> "CausalLM":
        """Self-draft from quantizing THIS model's weights: identical
        architecture, int8 execution (~1.7x faster per step at batch 1,
        BENCH_NOTES), and logits that track the target's up to
        quantization noise — measured 0.91 greedy top-1 agreement for
        w8a8 (tools/llm_quality_table.json), i.e. ~0.9 per-token
        speculative acceptance even on random weights, where a
        truncated-layer draft's acceptance collapses to ~0.  The
        standard quality/speed split the reference's README motivates,
        recast as a draft/target serving pair."""
        spec = LayerQuantSpec(mode=mode, w_bits=8, a_bits=8,
                              quantize_act=True, act_quant="per_token")
        plan = QuantPlan(default=spec).with_rule("lm_head", None)
        draft = CausalLM()
        draft.dtype = self.dtype
        draft.config = self.config
        draft.plan = plan
        draft.params = qapply.pack_params(self.params, plan)
        return draft

    def truncated_draft(self, n_layers: int) -> "CausalLM":
        """Self-draft for speculative decoding: the first ``n_layers``
        decoder layers of THIS model plus its embeddings/norm/lm_head,
        sharing parameter buffers (no copy).  The truncated model's
        logits correlate with the full model's (they share the early
        features), giving a usable acceptance rate with zero extra
        training — the standard self-speculative construction (the
        reference has no speculative path; serving extension)."""
        if not (0 < n_layers < self.config.num_hidden_layers):
            raise ValueError(n_layers)
        draft = CausalLM()
        draft.dtype = self.dtype
        draft.plan = self.plan
        draft.quant_config = self.quant_config
        draft.config = dataclasses.replace(self.config,
                                           num_hidden_layers=n_layers)
        draft.params = {k: v for k, v in self.params.items()
                        if not k.startswith("layers_")
                        or int(k.split("_")[1]) < n_layers}
        return draft

    # -------------------------------------------------------------- save/load

    def save_quantized(self, save_dir: str):
        os.makedirs(save_dir, exist_ok=True)
        from qdm_tpu.utils.serialization import save_params

        save_params(self.params, os.path.join(save_dir, "params.safetensors"))
        if self.quant_config:
            self.quant_config.save(os.path.join(save_dir, "quant_config.json"))
        with open(os.path.join(save_dir, "config.json"), "w") as f:
            json.dump({"architectures": ["LlamaForCausalLM"],
                       "quantization_config":
                           self.quant_config.to_transformers_dict()
                           if self.quant_config else None,
                       **dataclasses.asdict(self.config)}, f, indent=2)

    # ------------------------------------------------- ecosystem export

    @staticmethod
    def _torch_name(path) -> str:
        """Inverse of the loader's name mapping: params-tree path tuple
        -> HF torch module name ('layers_0' -> 'layers.0'; 'model.'
        prefix on everything except lm_head)."""
        segs = []
        for comp in path:
            for seg in comp.split("/"):
                m = re.match(r"^(.*)_(\d+)$", seg)
                if m and m.group(1) in ("layers", "net", "to_out",
                                        "experts", "blocks"):
                    segs.extend([m.group(1), m.group(2)])
                else:
                    segs.append(seg)
        name = ".".join(segs)
        return name if segs[0] == "lm_head" else "model." + name

    def _export_state_dict(self):
        """Split this model's params back into (fp torch state dict,
        quantized triples) for ecosystem checkpoint export.

        Returns (sd, triples) where triples maps torch module name ->
        (codes (K, N) uint int32, scales (K/g, N) f32, zeros (K/g, N)
        int32, group_size).  Fused projections (qkv_proj /
        gate_up_proj) are split back to per-projection entries by
        slicing the output axis — exact, since codes/scales/zeros are
        all per-output-column on that axis."""
        from qdm_tpu.ops import quant_matmul as qmm
        from qdm_tpu.quant import rtn
        from qdm_tpu.quant.apply import iter_layers

        # fp template (same fusion topology, no quant modes): the
        # packed model's own template carries PADDED buffer shapes,
        # not the true (K, N) the export needs to crop back to
        fp_model = llama_lib.LlamaForCausalLM(
            config=self.config, dtype=self.dtype,
            plan=QuantPlan(fuse_qkv=getattr(self.plan, "fuse_qkv", False)))
        shapes = jax.eval_shape(
            lambda: fp_model.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 8), jnp.int32)))["params"]
        c = self.config
        hd = c.head_dim or c.hidden_size // c.num_attention_heads
        fused_splits = {
            "qkv_proj": (("q_proj", c.num_attention_heads * hd),
                         ("k_proj", c.num_key_value_heads * hd),
                         ("v_proj", c.num_key_value_heads * hd)),
            "gate_up_proj": (("gate_proj", c.intermediate_size),
                             ("up_proj", c.intermediate_size)),
        }
        sd: Dict[str, np.ndarray] = {}
        triples: Dict[str, tuple] = {}

        def emit_fp(path, leaf, val):
            name = {"kernel": "weight", "scale": "weight",
                    "embedding": "weight", "bias": "bias"}.get(leaf)
            if name is None:
                return
            v = np.asarray(jax.device_get(val))
            if leaf == "kernel" and v.ndim == 2:
                v = v.T
            sd[self._torch_name(path) + "." + name] = \
                np.ascontiguousarray(v)

        # non-dense leaves (embeddings, norms) + fp dense layers
        layer_paths = {p for p, _ in iter_layers(shapes)}

        def walk(tmpl, prms, path=()):
            if path in layer_paths:
                if "qweight" in prms:
                    self._export_quantized_layer(
                        path, prms, tuple(tmpl["kernel"].shape),
                        fused_splits, triples, qmm, rtn)
                    if "bias" in prms:
                        emit_fp(path, "bias", prms["bias"])
                else:
                    for leaf, v in prms.items():
                        emit_fp(path, leaf, v)
                return
            for k, v in tmpl.items():
                if isinstance(v, dict):
                    walk(v, prms[k], path + (k,))
                else:
                    emit_fp(path, k, prms[k])

        walk(shapes, self.params)
        return sd, triples

    def _export_quantized_layer(self, path, layer, shape, fused_splits,
                                triples, qmm, rtn):
        from qdm_tpu.quant.apply import path_str

        spec = self.plan.spec_for(path_str(path))
        if spec is None or spec.mode not in ("w4a16", "w4a8"):
            raise ValueError(
                f"checkpoint export supports 4-bit packed layers "
                f"(w4a16/w4a8); {path_str(path)} is mode "
                f"{getattr(spec, 'mode', None)!r}")
        k, n = shape
        gs = spec.group_size if spec.group_size > 0 else k
        gs = qmm.align_group_size(k, rtn.resolve_group_size(k, gs) or k)
        want = self.quant_config.q_group_size if self.quant_config else gs
        if gs != want:
            raise ValueError(
                f"{path_str(path)}: effective group size {gs} (after "
                f"K={k} alignment) differs from the checkpoint-wide "
                f"group_size {want}; AutoAWQ/AutoGPTQ formats carry one "
                "uniform group size")
        codes = np.asarray(
            qmm.unpack_rows_strided(layer["qweight"], qmm.PACK_BLOCK_K,
                                    4))[:k, :n]
        scales = np.asarray(layer["scales"], np.float32)[:k // gs, :n]
        if "zeros" in layer:
            z = np.asarray(layer["zeros"])[:k // gs, :n]
            if not np.array_equal(z, np.round(z)):
                raise ValueError(
                    f"{path_str(path)}: non-integer zero points cannot "
                    "be packed into AutoAWQ/AutoGPTQ checkpoints")
            zeros = z.astype(np.int32)
        else:
            # symmetric packing biases codes by +8 (pack_linear_int4)
            zeros = np.full((k // gs, n), 8, np.int32)
        mod = path[-1]
        base = self._torch_name(path)
        if mod in fused_splits:
            col = 0
            stem = base.rsplit(".", 1)[0]
            for sub, width in fused_splits[mod]:
                triples[stem + "." + sub] = (
                    codes[:, col:col + width], scales[:, col:col + width],
                    zeros[:, col:col + width], gs)
                col += width
            assert col == n, (base, col, n)
        else:
            triples[base] = (codes, scales, zeros, gs)

    def _export_hf_config(self, quantization_config: dict) -> dict:
        hf = dataclasses.asdict(self.config)
        hf["architectures"] = ["LlamaForCausalLM"]
        hf["quantization_config"] = quantization_config
        return hf

    def save_quantized_autoawq(self, save_dir: str,
                               scale_dtype=np.float16):
        """Write this model's 4-bit packed weights as an **AutoAWQ
        checkpoint** (qweight column-packed in AWQ interleaved order,
        qzeros, fp16 scales, HF config.json with an awq
        quantization_config) — the reference ecosystem's on-disk
        format (models/base.py:1177-1245), so weights quantized on TPU
        round-trip back into the CUDA serving stacks.  Inverse of
        :meth:`from_quantized_autoawq` (bit-exact codes/zeros; scales
        pass through ``scale_dtype`` — the ecosystem convention is
        fp16, pass np.float32 for a lossless round-trip)."""
        from safetensors.numpy import save_file
        from qdm_tpu.quant.packing import canonical_to_awq

        sd, triples = self._export_state_dict()
        zp = True
        for name, (codes, scales, zeros, gs) in triples.items():
            qw, qz, sc = canonical_to_awq(codes, zeros, scales)
            sd[name + ".qweight"] = np.ascontiguousarray(qw)
            sd[name + ".qzeros"] = np.ascontiguousarray(qz)
            sd[name + ".scales"] = np.ascontiguousarray(
                np.asarray(sc, scale_dtype))
        gs = self.quant_config.q_group_size if self.quant_config else 128
        os.makedirs(save_dir, exist_ok=True)
        save_file(sd, os.path.join(save_dir, "model.safetensors"))
        qcfg = {"quant_method": "awq", "bits": 4, "group_size": gs,
                "zero_point": zp, "version": "gemm",
                "modules_to_not_convert":
                    (self.quant_config.modules_to_not_convert
                     if self.quant_config else None)}
        with open(os.path.join(save_dir, "config.json"), "w") as f:
            json.dump(self._export_hf_config(qcfg), f, indent=2)

    def save_quantized_autogptq(self, save_dir: str,
                                checkpoint_format: str = "gptq_v2",
                                scale_dtype=np.float16):
        """Write this model's 4-bit packed weights as an **AutoGPTQ /
        gptqmodel checkpoint** (row-packed qweight, column-packed
        qzeros — minus-one for the legacy 'gptq' format, true zeros
        for 'gptq_v2' — scales, trivial g_idx).  Inverse of
        :meth:`from_quantized_autogptq`."""
        from safetensors.numpy import save_file
        from qdm_tpu.quant.packing import pack_gptq_layout

        if checkpoint_format not in ("gptq", "gptq_v2"):
            raise ValueError(checkpoint_format)
        sd, triples = self._export_state_dict()
        for name, (codes, scales, zeros, gs) in triples.items():
            qw, qz = pack_gptq_layout(codes, zeros,
                                      plus_one=(checkpoint_format == "gptq"))
            sd[name + ".qweight"] = np.ascontiguousarray(np.asarray(qw))
            sd[name + ".qzeros"] = np.ascontiguousarray(np.asarray(qz))
            sd[name + ".scales"] = np.ascontiguousarray(
                np.asarray(scales, scale_dtype))
            sd[name + ".g_idx"] = (np.arange(codes.shape[0], dtype=np.int32)
                                   // gs)
        gs = self.quant_config.q_group_size if self.quant_config else 128
        sym = not (self.quant_config.zero_point if self.quant_config
                   else True)
        os.makedirs(save_dir, exist_ok=True)
        save_file(sd, os.path.join(save_dir, "model.safetensors"))
        qcfg = {"quant_method": "gptq", "bits": 4, "group_size": gs,
                "desc_act": False, "sym": sym,
                "checkpoint_format": checkpoint_format}
        with open(os.path.join(save_dir, "config.json"), "w") as f:
            json.dump(self._export_hf_config(qcfg), f, indent=2)

    @classmethod
    def from_quantized_autoawq(cls, path: str, dtype=jnp.bfloat16):
        """Load an AutoAWQ-quantized checkpoint (the reference
        ecosystem's on-disk format: per-linear qweight/qzeros/scales in
        AWQ column-packed order, models/base.py:1338-1526) and convert
        to this framework's packed W4A16 layout."""
        from qdm_tpu.api import loader
        from qdm_tpu.quant.packing import awq_to_canonical, unpack_awq_layout, \
            reverse_awq_order
        from qdm_tpu.ops.quant_matmul import pack_linear_int4

        self = cls()
        self.dtype = dtype
        hf = loader.load_json(os.path.join(path, "config.json"))
        qc = hf.get("quantization_config") or {}
        self.quant_config = QuantConfig.from_transformers_dict(qc)
        self.quant_config.version = "real"
        gs = self.quant_config.q_group_size
        fields = {f.name for f in dataclasses.fields(llama_lib.LlamaConfig)}
        self.config = llama_lib.LlamaConfig(
            **{k: v for k, v in hf.items() if k in fields})
        self.plan = self._make_plan(self.quant_config)

        sd = loader.load_safetensors_dir(path)
        shapes = jax.eval_shape(
            lambda: self.model.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 8), jnp.int32)))["params"]

        # convert qweight/qzeros/scales triples to canonical packing
        converted: Dict[str, np.ndarray] = {}
        for key in list(sd):
            if key.endswith(".qweight"):
                base = key[: -len(".qweight")]
                qw = jnp.asarray(np.ascontiguousarray(sd[key]))
                qz = jnp.asarray(np.ascontiguousarray(sd[base + ".qzeros"]))
                sc = jnp.asarray(np.ascontiguousarray(sd[base + ".scales"]))
                iw, iz = unpack_awq_layout(qw, qz, 4)
                iw, iz = reverse_awq_order(iw, iz, 4)
                pq, ps, pz = pack_linear_int4(iw, sc.astype(jnp.float32),
                                              iz.astype(jnp.float32), gs)
                converted[base + ".qweight_rows"] = np.asarray(pq)
                converted[base + ".scales_rows"] = np.asarray(ps)
                converted[base + ".zeros_rows"] = np.asarray(pz)
        # regular (fp) leaves load through the normal converter
        fp_sd = {k: v for k, v in sd.items()
                 if not any(k.endswith(s) for s in
                            (".qweight", ".qzeros", ".scales"))}
        params, missing, _ = loader.convert_torch_state_dict(
            fp_sd, shapes, strip_prefixes=("model.",))
        # insert packed leaves at their tree positions
        from qdm_tpu.api.loader import _merge_segments, _locate

        for key, val in converted.items():
            stem, leaf = key.rsplit(".", 1)
            k2 = stem
            if k2.startswith("model."):
                k2 = k2[len("model."):]
            loc = _locate(shapes, _merge_segments(k2))
            if loc is None:
                continue
            path_t, leaf_dict = loc
            name = {"qweight_rows": "qweight", "scales_rows": "scales",
                    "zeros_rows": "zeros"}[leaf]
            sub = params
            for p in path_t:
                sub = sub[p]
            sub[name] = jnp.asarray(val)

        self.params = params
        self.is_quantized = True
        return self

    @classmethod
    def from_quantized_autogptq(cls, path: str, dtype=jnp.bfloat16):
        """Load an AutoGPTQ / gptqmodel checkpoint (the other dominant
        on-disk PTQ format next to AutoAWQ: row-packed qweight,
        column-packed qzeros with the historical minus-one offset,
        per-group scales, optional g_idx).

        desc_act=False (trivial g_idx): converts to this framework's
        canonical packed W4A16 layout bit-exactly.  desc_act=True
        checkpoints reorder GROUP MEMBERSHIP per row (g_idx), which has
        no contiguous-group packing — those import as the exact
        DEQUANTIZED fp kernels instead (the same values any GPTQ kernel
        computes with; serve via bf16 or the DecodeEngine's
        re-quantization)."""
        from qdm_tpu.api import loader
        from qdm_tpu.ops.quant_matmul import pack_linear_int4
        from qdm_tpu.quant.packing import (dequantize_gptq,
                                           unpack_gptq_layout)

        self = cls()
        self.dtype = dtype
        hf = loader.load_json(os.path.join(path, "config.json"))
        qc = hf.get("quantization_config") or {}
        bits = int(qc.get("bits", 4))
        if bits != 4:
            raise NotImplementedError(
                f"autogptq import supports 4-bit checkpoints (got "
                f"bits={bits}); the canonical packed layout is int4")
        plus_one = qc.get("checkpoint_format", "gptq") != "gptq_v2"
        self.quant_config = QuantConfig.from_transformers_dict(qc)
        self.quant_config.quant_method = "gptq"
        self.quant_config.version = "real"
        gs = self.quant_config.q_group_size
        # the shared family mapping (qwen2 bias, qwen3 qk-norm, gemma
        # conventions, ...) — blind field filtering would silently
        # drop exactly the architecture semantics of real checkpoints
        self.config = self.config_from_hf(hf)

        sd = loader.load_safetensors_dir(path)
        # desc_act detection: any non-trivial g_idx anywhere switches
        # the whole import to dequantized-fp (one consistent plan)
        desc_act = False
        for key, v in sd.items():
            if key.endswith(".g_idx"):
                g = np.asarray(v)
                if not np.array_equal(g, np.arange(len(g)) // gs):
                    desc_act = True
                    break
        if desc_act:
            self.quant_config.version = "fake"
        self.plan = self._make_plan(self.quant_config)

        shapes = jax.eval_shape(
            lambda: self.model.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 8), jnp.int32)))["params"]
        converted: Dict[str, np.ndarray] = {}
        for key in list(sd):
            if not key.endswith(".qweight"):
                continue
            base = key[: -len(".qweight")]
            qw = jnp.asarray(np.ascontiguousarray(sd[key]))
            qz = jnp.asarray(np.ascontiguousarray(sd[base + ".qzeros"]))
            sc = jnp.asarray(np.ascontiguousarray(sd[base + ".scales"]))
            gi = (np.asarray(sd[base + ".g_idx"])
                  if base + ".g_idx" in sd else None)
            if desc_act:
                kern = dequantize_gptq(qw, qz, sc, g_idx=gi, bits=bits,
                                       group_size=gs, plus_one=plus_one)
                converted[base + ".kernel_fp"] = np.asarray(kern)
            else:
                iw, iz = unpack_gptq_layout(qw, qz, bits,
                                            plus_one=plus_one)
                pq, ps, pz = pack_linear_int4(iw, sc.astype(jnp.float32),
                                              iz.astype(jnp.float32), gs)
                converted[base + ".qweight_rows"] = np.asarray(pq)
                converted[base + ".scales_rows"] = np.asarray(ps)
                converted[base + ".zeros_rows"] = np.asarray(pz)
        fp_sd = {k: v for k, v in sd.items()
                 if not any(k.endswith(s) for s in
                            (".qweight", ".qzeros", ".scales", ".g_idx"))}
        params, missing, _ = loader.convert_torch_state_dict(
            fp_sd, shapes, strip_prefixes=("model.",))
        from qdm_tpu.api.loader import _locate, _merge_segments

        placed = set()
        for key, val in converted.items():
            stem, leaf = key.rsplit(".", 1)
            k2 = stem[len("model."):] if stem.startswith("model.") else stem
            loc = _locate(shapes, _merge_segments(k2))
            if loc is None:
                raise ValueError(
                    f"autogptq import: no tree location for quantized "
                    f"module {stem!r} — the checkpoint quantizes a "
                    "module this model layout does not have")
            path_t, leaf_dict = loc
            sub = params
            for p in path_t:
                sub = sub[p]
            if leaf == "kernel_fp":
                # dequantized-exact import: AutoGPTQ stores qweight
                # transposed, (in/epw, out) — the dequantized (K, N)
                # is already flax (in, out) orientation
                sub["kernel"] = jnp.asarray(val).astype(self.dtype)
            else:
                name = {"qweight_rows": "qweight", "scales_rows": "scales",
                        "zeros_rows": "zeros"}[leaf]
                sub[name] = jnp.asarray(val)
            placed.add("/".join(path_t))
        # params whose fp leaf the checkpoint did not carry must be the
        # quantized modules we just placed — anything else is a silent
        # zero-init (from_pretrained raises on these; so do we)
        still_missing = [m for m in missing
                         if not any(m.startswith(p) or p.startswith(m)
                                    for p in placed)]
        if still_missing:
            raise ValueError(
                f"autogptq import: missing {len(still_missing)} params "
                f"e.g. {still_missing[:5]}")

        self.params = params
        self.is_quantized = True
        return self

    @classmethod
    def from_quantized(cls, save_dir: str, dtype=jnp.bfloat16):
        from qdm_tpu.utils.serialization import load_params

        self = cls()
        self.dtype = dtype
        with open(os.path.join(save_dir, "config.json")) as f:
            hf = json.load(f)
        fields = {f.name for f in dataclasses.fields(llama_lib.LlamaConfig)}
        self.config = llama_lib.LlamaConfig(
            **{k: v for k, v in hf.items() if k in fields})
        self.quant_config = QuantConfig.from_pretrained(save_dir)
        self.plan = self._make_plan(self.quant_config)
        self.params = load_params(os.path.join(save_dir, "params.safetensors"))
        self.is_quantized = True
        return self
