"""Per-model-family quantization hooks.

The TPU-native analogue of the reference's model shims
(StableDiffusion1_x.get_smoothing_blocks / get_layers_for_scaling_unet,
models/StableDiffusion1_x.py:96-150): functions that, given a param
pytree, produce SmoothQuant scaling groups and AWQ search groups by
walking the tree — no module objects involved.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

from qdm_tpu.quant.smooth import ScalingGroup


def _walk(tree, prefix=()):
    if isinstance(tree, dict):
        yield prefix, tree
        for k, v in tree.items():
            yield from _walk(v, prefix + (str(k),))


def find_transformer_blocks(params: dict) -> List[Tuple[str, ...]]:
    """Paths of every BasicTransformerBlock param subtree
    (the reference smooths all of them: StableDiffusion1_x.py:96-102)."""
    blocks = []
    for path, sub in _walk(params):
        if path and re.fullmatch(r"transformer_blocks_\d+", path[-1]) \
                and "norm1" in sub and "attn1" in sub:
            blocks.append(path)
    return blocks


def sd_unet_scaling_groups(params: dict) -> List[ScalingGroup]:
    """SD UNet SmoothQuant groups (StableDiffusion1_x.py:115-150):

    * norm1 -> attn1.{to_q, to_k, to_v}  (self-attention QKV)
    * norm3 -> ff.net_0.proj             (GEGLU in-projection)

    Cross-attention (attn2) is intentionally NOT smoothed — its q input
    comes from norm2 but k/v take the text context; the reference skips
    it too."""
    groups = []
    for b in find_transformer_blocks(params):
        groups.append(ScalingGroup(
            prev_path=b + ("norm1",),
            layer_paths=(b + ("attn1", "to_q"), b + ("attn1", "to_k"),
                         b + ("attn1", "to_v")),
        ))
        groups.append(ScalingGroup(
            prev_path=b + ("norm3",),
            layer_paths=(b + ("ff", "net_0", "proj"),),
        ))
    return groups


def clip_text_scaling_groups(params: dict) -> List[ScalingGroup]:
    """CLIP text encoder groups (reference models/clip.py:100-147):
    layer_norm1 -> q/k/v_proj, layer_norm2 -> mlp.fc1."""
    groups = []
    for path, sub in _walk(params):
        if path and re.fullmatch(r"layers_\d+", path[-1]) and "self_attn" in sub:
            groups.append(ScalingGroup(
                prev_path=path + ("layer_norm1",),
                layer_paths=(path + ("self_attn", "q_proj"),
                             path + ("self_attn", "k_proj"),
                             path + ("self_attn", "v_proj")),
            ))
            groups.append(ScalingGroup(
                prev_path=path + ("layer_norm2",),
                layer_paths=(path + ("mlp/fc1",),),
            ))
    return groups


def attn_geom_from_config(cfg) -> "str | None":
    """AWQ attention-module loss geometry spec for ScalingGroup.block
    ("attn:<h>:<hkv>:<d>:<rope_theta>:<attn_scale>"), or None for
    architectures whose attention forward the search does not model
    (qk-norm, partial rotary, learned/alibi positions, soft-caps,
    dual rope, MLA) — those keep the group-linear-outputs loss.
    sliding_window is deliberately ignored: calib sequences (<=512)
    sit far inside every real window, where the banded mask equals
    the causal one."""
    if (getattr(cfg, "qk_norm", False)
            or getattr(cfg, "partial_rotary_factor", 1.0) < 1.0
            or getattr(cfg, "pos_emb_type", "rope") != "rope"
            or getattr(cfg, "attn_logit_softcapping", None)
            or getattr(cfg, "rope_local_theta", None) is not None
            or getattr(cfg, "kv_lora_rank", None) is not None):
        return None
    return (f"attn:{cfg.num_attention_heads}:{cfg.num_key_value_heads}:"
            f"{cfg.head_dim}:{cfg.rope_theta}:{cfg.attn_scale}")


def llama_scaling_groups(params: dict, include_fc_groups: bool = True,
                         norm_plus_one: bool = False,
                         mlp_act: str = "silu",
                         moe_top_k: int = 2,
                         moe_renormalize: bool = True,
                         attn_geom: "str | None" = None) -> List[ScalingGroup]:
    """LLaMA-family groups (reference llava.py:42-90 / qwen2.py:37-85):
    input_layernorm -> q/k/v, v_proj -> o_proj, post_attention_layernorm
    -> gate/up, up_proj -> down_proj.

    norm_plus_one: the model's RMSNorms use the Gemma (1+w) convention
    (set from LlamaConfig.norm_plus_one) — norm-prev groups migrate as
    w' = (1+w)/s - 1 (reference scale.py:96-99).

    mlp_act: the MLP activation (LlamaConfig.mlp_act) — recorded on the
    gate/up group's `block` spec so the AWQ search can evaluate trials
    through the enclosing MLP (the reference's module2inspect loss).

    MoE blocks (Mixtral; the reference's quantizer captures the whole
    block_sparse_moe input for this group, quantizer.py:1106-1111):
    post_attention_layernorm -> w1+w3 of EVERY expert (one shared scale
    — all experts see the same normed input), with the router gate in
    extra_scaled so routing stays bit-invariant; per expert, w3 -> w2."""
    groups = []
    for path, sub in _walk(params):
        if path and re.fullmatch(r"layers_\d+", path[-1]) and "self_attn" in sub:
            mlp = sub.get("mlp", {})
            at = sub["self_attn"]
            if "kv_a_proj_with_mqa" in at:
                # MLA (DeepSeek-V2, models/mla.py) — there is no
                # q/k/v_proj.  input_layernorm feeds the q head
                # (q_a_proj or plain q_proj) AND the shared latent
                # projection; the two inner RMSNorms each feed one
                # linear.  No v->o group: v comes out of the shared
                # latent via kv_b_proj, so there is no fc->fc
                # migration site (the latent feeds k AND v jointly).
                q_head = "q_a_proj" if "q_a_proj" in at else "q_proj"
                groups.append(ScalingGroup(
                    prev_path=path + ("input_layernorm",),
                    layer_paths=(path + ("self_attn", q_head),
                                 path + ("self_attn",
                                         "kv_a_proj_with_mqa")),
                    prev_plus_one=norm_plus_one,
                ))
                if "q_a_layernorm" in at:
                    groups.append(ScalingGroup(
                        prev_path=path + ("self_attn", "q_a_layernorm"),
                        layer_paths=(path + ("self_attn", "q_b_proj"),),
                    ))
                groups.append(ScalingGroup(
                    prev_path=path + ("self_attn", "kv_a_layernorm"),
                    layer_paths=(path + ("self_attn", "kv_b_proj"),),
                ))
                if "experts_0" in mlp:
                    # deepseek MoE layout (HF mlp.* naming): router
                    # 'gate' rides extra_scaled (bit-invariant
                    # routing); always-on shared experts see the SAME
                    # normed stream, so their gate/up join the group
                    # (appended after the alternating expert pairs —
                    # the AWQ moe-loss handler stacks only the
                    # experts_N entries)
                    moe = path + ("mlp",)
                    experts = sorted(
                        (k for k in mlp
                         if re.fullmatch(r"experts_\d+", k)),
                        key=lambda k: int(k.split("_")[1]))
                    lps = [moe + (e, w) for e in experts
                           for w in ("gate_proj", "up_proj")]
                    if "shared_experts" in mlp:
                        lps += [moe + ("shared_experts", "gate_proj"),
                                moe + ("shared_experts", "up_proj")]
                    groups.append(ScalingGroup(
                        prev_path=path + ("post_attention_layernorm",),
                        layer_paths=tuple(lps),
                        extra_scaled=(moe + ("gate",),),
                        prev_plus_one=norm_plus_one,
                        block=(f"moe:{mlp_act}:{moe_top_k}:"
                               f"{int(moe_renormalize)}", moe),
                    ))
                    if include_fc_groups:
                        for e in experts:
                            groups.append(ScalingGroup(
                                prev_path=moe + (e, "up_proj"),
                                layer_paths=(moe + (e, "down_proj"),),
                            ))
                        if "shared_experts" in mlp:
                            groups.append(ScalingGroup(
                                prev_path=moe + ("shared_experts",
                                                 "up_proj"),
                                layer_paths=(moe + ("shared_experts",
                                                    "down_proj"),),
                            ))
                elif "gate_proj" in mlp:
                    # dense (first_k_dense_replace) deepseek layers
                    groups.append(ScalingGroup(
                        prev_path=path + ("post_attention_layernorm",),
                        layer_paths=(path + ("mlp", "gate_proj"),
                                     path + ("mlp", "up_proj")),
                        prev_plus_one=norm_plus_one,
                        block=("glu:" + mlp_act,
                               path + ("mlp", "down_proj")),
                    ))
                    if include_fc_groups:
                        groups.append(ScalingGroup(
                            prev_path=path + ("mlp", "up_proj"),
                            layer_paths=(path + ("mlp", "down_proj"),),
                        ))
                continue
            has_post_ln = ("post_attention_layernorm" in sub
                           or "pre_feedforward_layernorm" in sub)
            qkv_paths = [path + ("self_attn", "q_proj"),
                         path + ("self_attn", "k_proj"),
                         path + ("self_attn", "v_proj")]
            if not has_post_ln:
                # parallel-residual blocks (cohere gated / phi ungated)
                # feed the MLP from the SAME norm — one joint group
                if "fc1" in mlp:
                    qkv_paths.append(path + ("mlp", "fc1"))
                elif "gate_proj" in mlp:
                    qkv_paths += [path + ("mlp", "gate_proj"),
                                  path + ("mlp", "up_proj")]
            groups.append(ScalingGroup(
                prev_path=path + ("input_layernorm",),
                layer_paths=tuple(qkv_paths),
                prev_plus_one=norm_plus_one,
                # pure q/k/v groups evaluate the reference's whole
                # -attention-module loss when the caller supplies the
                # geometry (attn_geom_from_config); parallel-residual
                # groups fold mlp fcs in and keep the linear loss
                block=((attn_geom, path + ("self_attn",))
                       if attn_geom and len(qkv_paths) == 3 else None),
            ))
            if "block_sparse_moe" in sub:
                moe = path + ("block_sparse_moe",)
                experts = sorted(
                    (k for k in sub["block_sparse_moe"]
                     if re.fullmatch(r"experts_\d+", k)),
                    key=lambda k: int(k.split("_")[1]))
                groups.append(ScalingGroup(
                    prev_path=path + ("post_attention_layernorm",),
                    layer_paths=tuple(moe + (e, w) for e in experts
                                      for w in ("w1", "w3")),
                    extra_scaled=(moe + ("gate",),),
                    prev_plus_one=norm_plus_one,
                    # AWQ evaluates trials through the whole sparse
                    # block (reference module2inspect): routing is
                    # per-token, so sampled feats suffice
                    block=(f"moe:{mlp_act}:{moe_top_k}:"
                           f"{int(moe_renormalize)}", moe),
                ))
                if include_fc_groups:
                    for e in experts:
                        groups.append(ScalingGroup(
                            prev_path=moe + (e, "w3"),
                            layer_paths=(moe + (e, "w2"),),
                        ))
                    v_out = sub["self_attn"]["v_proj"]["kernel"].shape[1]
                    o_in = sub["self_attn"]["o_proj"]["kernel"].shape[0]
                    if v_out == o_in:
                        groups.append(ScalingGroup(
                            prev_path=path + ("self_attn", "v_proj"),
                            layer_paths=(path + ("self_attn", "o_proj"),),
                        ))
                continue
            if "gate_proj" in mlp and has_post_ln:
                prev_ln = ("pre_feedforward_layernorm"
                           if "pre_feedforward_layernorm" in sub
                           else "post_attention_layernorm")
                groups.append(ScalingGroup(
                    prev_path=path + (prev_ln,),
                    layer_paths=(path + ("mlp", "gate_proj"),
                                 path + ("mlp", "up_proj")),
                    prev_plus_one=norm_plus_one,
                    # AWQ searches this group through the enclosing MLP
                    # (reference module2inspect); SmoothQuant ignores it
                    block=("glu:" + mlp_act,
                           path + ("mlp", "down_proj")),
                ))
            if include_fc_groups:
                v_out = sub["self_attn"]["v_proj"]["kernel"].shape[1]
                o_in = sub["self_attn"]["o_proj"]["kernel"].shape[0]
                if v_out == o_in:
                    # GQA (v_out < o_in) cannot migrate v->o scales;
                    # upstream AutoAWQ skips this group too
                    groups.append(ScalingGroup(
                        prev_path=path + ("self_attn", "v_proj"),
                        layer_paths=(path + ("self_attn", "o_proj"),),
                    ))
                if "up_proj" in mlp:
                    groups.append(ScalingGroup(
                        prev_path=path + ("mlp", "up_proj"),
                        layer_paths=(path + ("mlp", "down_proj"),),
                    ))
    return groups


def sd3_scaling_groups(params: dict) -> List[ScalingGroup]:
    """MMDiT SmoothQuant groups: AdaLN-modulated norm -> attn qkv and
    -> ff in-proj, per stream (DiTAS-style smoothing for SD3.5).

    AdaLN-Zero chunk layout (mmdit.JointTransformerBlock): 0=shift_msa,
    1=scale_msa, 3=shift_mlp, 4=scale_mlp."""
    groups = []
    for path, sub in _walk(params):
        if path and re.fullmatch(r"transformer_blocks_\d+", path[-1]) \
                and "attn" in sub and "norm1" in sub:
            groups.append(ScalingGroup(
                prev_path=path + ("norm1", "linear"),
                layer_paths=(path + ("attn", "to_q"), path + ("attn", "to_k"),
                             path + ("attn", "to_v")),
                adaln=(0, 1, 6),
            ))
            groups.append(ScalingGroup(
                prev_path=path + ("norm1", "linear"),
                layer_paths=(path + ("ff", "net_0/proj"),),
                adaln=(3, 4, 6),
            ))
            if "norm1_context" in sub and "linear" in sub["norm1_context"] \
                    and "add_q_proj" in sub["attn"]:
                n_chunks = sub["norm1_context"]["linear"]["kernel"].shape[1] // \
                    sub["attn"]["add_q_proj"]["kernel"].shape[0]
                groups.append(ScalingGroup(
                    prev_path=path + ("norm1_context", "linear"),
                    layer_paths=(path + ("attn", "add_q_proj"),
                                 path + ("attn", "add_k_proj"),
                                 path + ("attn", "add_v_proj")),
                    adaln=(0, 1, n_chunks),
                ))
                if "ff_context" in sub and n_chunks == 6:
                    groups.append(ScalingGroup(
                        prev_path=path + ("norm1_context", "linear"),
                        layer_paths=(path + ("ff_context", "net_0/proj"),),
                        adaln=(3, 4, 6),
                    ))
    return groups


def bloom_scaling_groups(params: dict) -> List[ScalingGroup]:
    """Bloom groups (reference bloom.py): input_layernorm ->
    query_key_value, post_attention_layernorm -> dense_h_to_4h, and the
    scalable-GELU group gelu_impl -> dense_4h_to_h
    (get_act_for_scaling, bloom.py:13-19)."""
    groups = []
    for path, sub in _walk(params):
        if path and re.fullmatch(r"h_\d+", path[-1]) \
                and "self_attention/query_key_value" in sub:
            groups.append(ScalingGroup(
                prev_path=path + ("input_layernorm",),
                layer_paths=(path + ("self_attention/query_key_value",),),
            ))
            groups.append(ScalingGroup(
                prev_path=path + ("post_attention_layernorm",),
                layer_paths=(path + ("mlp/dense_h_to_4h",),),
            ))
            groups.append(ScalingGroup(
                prev_path=path + ("mlp/gelu_impl",),
                layer_paths=(path + ("mlp/dense_4h_to_h",),),
            ))
    return groups


def awq_search_groups(params: dict, scaling_groups: List[ScalingGroup]):
    """AWQ reuses the same (prev_op, layers) topology for its grid
    search (quantizer.py:288-321); expressed on param paths."""
    return scaling_groups
