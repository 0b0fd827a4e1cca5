"""HF checkpoint loading: diffusers/transformers safetensors -> flax
param pytrees.

Replaces the reference's reliance on ``DiffusionPipeline.from_pretrained``
(models/base.py:199) with a direct, torch-free weight load: safetensors
-> numpy -> named tree insertion.  The converter walks the *target* tree
(shapes from ``jax.eval_shape`` of module init, so no FLOPs), greedily
matching merged torch key segments against tree keys — this tolerates
the composite module names used by the models ('down_blocks_0/resnets_0').
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# native-reader mmaps kept alive for the process (their tensor views are
# zero-copy; pages are file-backed and reclaimable by the OS)
_KEEPALIVE: list = []


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load every *.safetensors in a dir (sharded or single).

    Uses the native mmap reader (native/safetensors_reader.cpp) when
    available — zero-copy views into the mapping — falling back to the
    Python safetensors package."""
    tensors: Dict[str, np.ndarray] = {}
    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no safetensors in {path}")

    from qdm_tpu.utils.native_loader import get_lib

    if get_lib() is not None:
        from qdm_tpu.utils.native_loader import NativeSafetensors

        for fn in files:
            ns = NativeSafetensors(os.path.join(path, fn))
            _KEEPALIVE.append(ns)  # zero-copy views alias the mmap
            tensors.update(ns.tensors(copy=False))
        return tensors

    from safetensors import safe_open

    for fn in files:
        with safe_open(os.path.join(path, fn), framework="np") as f:
            for k in f.keys():
                tensors[k] = f.get_tensor(k)
    return tensors


def _merge_segments(key: str) -> list:
    """'down_blocks.0.resnets.1.conv1.weight' ->
    ['down_blocks_0', 'resnets_1', 'conv1', 'weight'];
    also 'to_out.0' -> 'to_out_0', 'net.0' -> 'net_0'."""
    parts = key.split(".")
    merged = []
    for p in parts:
        if p.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{p}"
        else:
            merged.append(p)
    return merged


def _locate(tree: dict, segments: list) -> Optional[Tuple[tuple, dict]]:
    """Greedy longest-prefix match of segments against nested dict keys
    ('/'-joined composites allowed).  Returns (path, leaf_dict)."""
    path = []
    cur = tree
    i = 0
    while i < len(segments):
        if not isinstance(cur, dict):
            return None
        matched = False
        for j in range(min(4, len(segments) - i), 0, -1):
            cand = "/".join(segments[i:i + j])
            if cand in cur:
                path.append(cand)
                cur = cur[cand]
                i += j
                matched = True
                break
        if not matched:
            return None
    return tuple(path), cur


def _leaf_name_and_transform(leaf_dict: dict, torch_leaf: str, value: np.ndarray):
    """Map torch leaf name/layout to the flax leaf in leaf_dict."""
    if torch_leaf == "weight":
        if "kernel" in leaf_dict:
            if value.ndim == 2:
                return "kernel", value.T                    # (out,in)->(in,out)
            if value.ndim == 4:
                return "kernel", value.transpose(2, 3, 1, 0)  # OIHW->HWIO
            if value.ndim == 3:
                # torch Conv1d (O, I, K) -> NHWC-with-H=1 (1, K, I, O)
                # (whisper's encoder stem runs as a (1,k) 2-D conv)
                return "kernel", value.transpose(2, 1, 0)[None]
            return "kernel", value
        if "scale" in leaf_dict:
            return "scale", value                            # norm affine
        if "embedding" in leaf_dict:
            return "embedding", value
    if torch_leaf == "bias" and "bias" in leaf_dict:
        return "bias", value
    return None, None


def convert_torch_state_dict(state_dict: Dict[str, np.ndarray],
                             target_shapes: dict,
                             strip_prefixes: Tuple[str, ...] = ()) -> Tuple[dict, list, list]:
    """Fill a params tree (template from eval_shape) from a torch state
    dict.  Returns (params, missing_target_leaves, unused_torch_keys)."""
    params = jax.tree.map(lambda s: None, target_shapes)
    used = set()

    def set_in(tree, path, leaf, val):
        sub = tree
        for p in path:
            sub = sub[p]
        sub[leaf] = val

    # make mutable copy
    def to_mut(t):
        if isinstance(t, dict):
            return {k: to_mut(v) for k, v in t.items()}
        return None
    params = to_mut(target_shapes)

    for key, value in state_dict.items():
        k = key
        for sp in strip_prefixes:
            if k.startswith(sp):
                k = k[len(sp):]
        segs = _merge_segments(k)
        if len(segs) < 2:
            continue
        torch_leaf = segs[-1].split("_")[0] if segs[-1] in () else segs[-1]
        loc = _locate(target_shapes, segs[:-1])
        if loc is None:
            continue
        path, leaf_dict = loc
        if not isinstance(leaf_dict, dict):
            continue
        name, val = _leaf_name_and_transform(leaf_dict, torch_leaf, value)
        if name is None:
            continue
        want = leaf_dict[name]
        if tuple(want.shape) != tuple(val.shape):
            continue
        set_in(params, path, name, jnp.asarray(val, dtype=want.dtype))
        used.add(key)

    missing = []

    def find_missing(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                find_missing(v, prefix + (k,))
            elif v is None:
                missing.append("/".join(prefix + (k,)))

    find_missing(params, ())
    unused = [k for k in state_dict if k not in used]
    return params, missing, unused


def load_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def unet_config_from_diffusers(cfg: dict):
    """diffusers unet/config.json -> UNetConfig."""
    from qdm_tpu.models.unet import UNetConfig

    n_blocks = len(cfg["block_out_channels"])
    ahd = cfg.get("attention_head_dim", 8)
    if isinstance(ahd, int):
        ahd = (ahd,) * n_blocks
    tlb = cfg.get("transformer_layers_per_block", 1)
    if isinstance(tlb, int):
        tlb = (tlb,) * n_blocks
    num_heads = cfg.get("num_attention_heads")
    if num_heads is None:
        # SD1.x/SD2/SDXL store head info in attention_head_dim:
        # SD1.x: head *count*; SDXL: per-level head count too (5,10,20
        # with dim_head 64 == channels/heads) — both resolve as count
        heads = tuple(ahd)
    else:
        heads = tuple(num_heads) if not isinstance(num_heads, int) else (num_heads,) * n_blocks
    return UNetConfig(
        sample_size=cfg.get("sample_size", 64),
        in_channels=cfg.get("in_channels", 4),
        out_channels=cfg.get("out_channels", 4),
        block_out_channels=tuple(cfg["block_out_channels"]),
        down_block_types=tuple(cfg["down_block_types"]),
        up_block_types=tuple(cfg["up_block_types"]),
        layers_per_block=cfg.get("layers_per_block", 2),
        cross_attention_dim=cfg.get("cross_attention_dim", 768),
        attention_head_dim=heads,
        transformer_layers_per_block=tuple(tlb),
        use_linear_projection=cfg.get("use_linear_projection", False),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        flip_sin_to_cos=cfg.get("flip_sin_to_cos", True),
        freq_shift=cfg.get("freq_shift", 0),
        addition_embed_type=cfg.get("addition_embed_type"),
        addition_time_embed_dim=cfg.get("addition_time_embed_dim", 256),
        projection_class_embeddings_input_dim=cfg.get(
            "projection_class_embeddings_input_dim", 2816),
    )


def clip_config_from_hf(cfg: dict):
    from qdm_tpu.models.clip_text import CLIPTextConfig

    if "text_config" in cfg:
        cfg = cfg["text_config"]
    return CLIPTextConfig(
        vocab_size=cfg.get("vocab_size", 49408),
        hidden_size=cfg.get("hidden_size", 768),
        intermediate_size=cfg.get("intermediate_size", 3072),
        num_hidden_layers=cfg.get("num_hidden_layers", 12),
        num_attention_heads=cfg.get("num_attention_heads", 12),
        max_position_embeddings=cfg.get("max_position_embeddings", 77),
        hidden_act=cfg.get("hidden_act", "quick_gelu"),
        projection_dim=cfg.get("projection_dim", 768),
    )


def vae_config_from_diffusers(cfg: dict):
    from qdm_tpu.models.vae import VAEConfig

    return VAEConfig(
        in_channels=cfg.get("in_channels", 3),
        out_channels=cfg.get("out_channels", 3),
        latent_channels=cfg.get("latent_channels", 4),
        block_out_channels=tuple(cfg.get("block_out_channels", (128, 256, 512, 512))),
        layers_per_block=cfg.get("layers_per_block", 2),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        scaling_factor=cfg.get("scaling_factor", 0.18215),
    )


def opt_to_llama_state_dict(sd):
    """OPT (reference registry via upstream AutoAWQ opt shim) -> the
    canonical LLaMA-family naming: decoder.* flattened, out_proj ->
    o_proj, per-layer self_attn_layer_norm/final_layer_norm ->
    input/post_attention layernorms, decoder-level final_layer_norm ->
    norm.  fc1/fc2 already match the ungated-MLP naming.  (OPT-350m's
    project_in/out factorized embeddings are not supported.)"""
    out = {}
    for key, v in sd.items():
        if "project_in" in key or "project_out" in key:
            raise ValueError("OPT-350m project_in/out embeddings are "
                             "not supported")
        k = key.replace("model.decoder.", "model.")
        if k.startswith("model.final_layer_norm."):
            k = k.replace("model.final_layer_norm.", "model.norm.")
        k = k.replace("self_attn.out_proj.", "self_attn.o_proj.")
        k = k.replace(".self_attn_layer_norm.", ".input_layernorm.")
        k = k.replace(".final_layer_norm.", ".post_attention_layernorm.")
        k = k.replace("decoder.embed_tokens.", "embed_tokens.")
        # OPT keeps fc1/fc2 directly on the layer; the module nests
        # them under mlp/
        k = k.replace(".fc1.", ".mlp.fc1.")
        k = k.replace(".fc2.", ".mlp.fc2.")
        out[k] = v
    return out


def neox_to_llama_state_dict(sd, heads: int, head_dim: int):
    """GPT-NeoX/pythia -> canonical naming.  The fused query_key_value
    is HEAD-INTERLEAVED ((heads, 3, head_dim, in) rows): de-interleave
    into contiguous q/k/v projections.  dense -> o_proj,
    dense_h_to_4h/dense_4h_to_h -> fc1/fc2, embed_in/embed_out ->
    embed_tokens/lm_head."""
    import numpy as np

    out = {}
    for key, v in sd.items():
        if "rotary_emb" in key or key.endswith("masked_bias") \
                or key.endswith(".attention.bias"):
            continue
        k = key.replace("gpt_neox.", "model.")
        k = k.replace("model.embed_in.", "model.embed_tokens.")
        k = k.replace("model.final_layer_norm.", "model.norm.")
        k = k.replace("embed_out.", "lm_head.")
        k = k.replace(".attention.dense.", ".self_attn.o_proj.")
        k = k.replace(".mlp.dense_h_to_4h.", ".mlp.fc1.")
        k = k.replace(".mlp.dense_4h_to_h.", ".mlp.fc2.")
        if ".attention.query_key_value." in k:
            v = np.asarray(v)
            vh = v.reshape(heads, 3, head_dim, *v.shape[1:])
            for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
                out[k.replace(".attention.query_key_value.",
                              f".self_attn.{name}.")] = \
                    vh[:, i].reshape((heads * head_dim,) + v.shape[1:])
            continue
        out[k] = v
    return out


def falcon_to_llama_state_dict(sd, heads: int, kv_heads: int,
                               head_dim: int):
    """Falcon -> canonical naming.  The fused query_key_value is
    GROUP-interleaved ((kv_heads, g+2, head_dim, in): each KV group's
    g query heads then its k and v); split into q/k/v.  7b multi_query
    is the kv_heads=1 case.  ln_attn/ln_mlp (40b new_decoder_arch) map
    to the two parallel norms; 7b's single input_layernorm stays."""
    import numpy as np

    g = heads // kv_heads
    out = {}
    for key, v in sd.items():
        k = key.replace("transformer.h.", "model.layers.")
        k = k.replace("transformer.word_embeddings.",
                      "model.embed_tokens.")
        k = k.replace("transformer.ln_f.", "model.norm.")
        k = k.replace(".self_attention.dense.", ".self_attn.o_proj.")
        k = k.replace(".ln_attn.", ".input_layernorm.")
        k = k.replace(".ln_mlp.", ".post_attention_layernorm.")
        k = k.replace(".mlp.dense_h_to_4h.", ".mlp.fc1.")
        k = k.replace(".mlp.dense_4h_to_h.", ".mlp.fc2.")
        if ".self_attention.query_key_value." in k:
            v = np.asarray(v)
            vh = v.reshape(kv_heads, g + 2, head_dim, *v.shape[1:])
            q = vh[:, :g].reshape((heads * head_dim,) + v.shape[1:])
            kk = vh[:, g].reshape((kv_heads * head_dim,) + v.shape[1:])
            vv = vh[:, g + 1].reshape((kv_heads * head_dim,) + v.shape[1:])
            for name, part in (("q_proj", q), ("k_proj", kk),
                               ("v_proj", vv)):
                out[k.replace(".self_attention.query_key_value.",
                              f".self_attn.{name}.")] = part
            continue
        out[k] = v
    return out


def starcoder2_to_llama_state_dict(sd):
    """StarCoder2 -> canonical naming: only the ungated MLP's
    c_fc/c_proj differ (fc1/fc2)."""
    out = {}
    for key, v in sd.items():
        k = key.replace(".mlp.c_fc.", ".mlp.fc1.")
        k = k.replace(".mlp.c_proj.", ".mlp.fc2.")
        out[k] = v
    return out


def phi3_to_llama_state_dict(sd, heads: int, kv_heads: int,
                             head_dim: int):
    """Phi-3 -> canonical naming: split the fused qkv_proj ([q;k;v]
    rows) and gate_up_proj ([gate;up] rows)."""
    import numpy as np

    out = {}
    for key, v in sd.items():
        if ".self_attn.qkv_proj." in key:
            v = np.asarray(v)
            hq, hk = heads * head_dim, kv_heads * head_dim
            q, kk, vv = v[:hq], v[hq:hq + hk], v[hq + hk:]
            for name, part in (("q_proj", q), ("k_proj", kk),
                               ("v_proj", vv)):
                out[key.replace(".self_attn.qkv_proj.",
                                f".self_attn.{name}.")] = part
            continue
        if ".mlp.gate_up_proj." in key:
            v = np.asarray(v)
            half = v.shape[0] // 2
            out[key.replace(".mlp.gate_up_proj.", ".mlp.gate_proj.")] = \
                v[:half]
            out[key.replace(".mlp.gate_up_proj.", ".mlp.up_proj.")] = \
                v[half:]
            continue
        out[key] = v
    return out


def deepseek_deinterleave_rope(sd, qk_nope: int, qk_rope: int):
    """Fold deepseek_v2's interleaved rope storage into the weights.

    HF's modeling_deepseek stores the rope dims of q and k_pe
    INTERLEAVED (x0,y0,x1,y1,...) and de-interleaves inside its rotary
    (view(..., d//2, 2).transpose) before the standard half-split
    rotation.  Permuting those output ROWS of q_proj/q_b_proj and
    kv_a_proj_with_mqa here ((x0..x_{d/2-1}, y0..y_{d/2-1}) order)
    makes the module's plain half-split rope (models/llama.py::rope)
    bit-equivalent — zero runtime cost."""
    import numpy as np

    dr = qk_rope
    perm = np.concatenate([np.arange(0, dr, 2), np.arange(1, dr, 2)])
    qd = qk_nope + qk_rope
    out = {}
    for key, v in sd.items():
        if key.endswith(("kv_a_proj_with_mqa.weight",
                         "kv_a_proj_with_mqa.bias")):
            v = np.asarray(v)
            head = v[:-dr]
            rope_rows = v[-dr:][perm]
            v = np.concatenate([head, rope_rows], axis=0)
        elif key.endswith(("q_proj.weight", "q_b_proj.weight",
                           "q_proj.bias", "q_b_proj.bias")) \
                and np.asarray(v).shape[0] % qd == 0:
            v = np.asarray(v)
            h = v.shape[0] // qd
            vh = v.reshape(h, qd, *v.shape[1:])
            vh = np.concatenate([vh[:, :qk_nope], vh[:, qk_nope:][:, perm]],
                                axis=1)
            v = vh.reshape(v.shape)
        out[key] = v
    return out


def phi_to_llama_state_dict(sd):
    """Rename a phi-family checkpoint into the canonical LLaMA-family
    naming: self_attn.dense -> o_proj, final_layernorm -> norm.  The
    mlp fc1/fc2 and per-linear biases already match the module's
    ungated-MLP naming (models/llama.py LlamaMLP, mlp_gated=False)."""
    out = {}
    for key, v in sd.items():
        key = key.replace("self_attn.dense.", "self_attn.o_proj.")
        key = key.replace("model.final_layernorm.", "model.norm.")
        out[key] = v
    return out


def qwen1_to_llama_state_dict(sd):
    """Rename a Qwen-1 checkpoint (fused c_attn architecture, reference
    models/qwen.py:1-55) into the canonical LLaMA-family naming this
    loader understands.

    Qwen-1 blocks: ln_1 -> attn.c_attn (fused qkv, bias) -> attn.c_proj;
    ln_2 -> mlp.{w1 (up), w2 (gate, silu'd)} -> mlp.c_proj.  The fused
    c_attn rows are split q/k/v; scale-migration groups then address the
    three projections jointly, which is mathematically identical to the
    reference's single-fused-layer group (qwen.py:25-33)."""
    import numpy as np

    out = {}
    ren = {
        "transformer.wte.weight": "model.embed_tokens.weight",
        "transformer.ln_f.weight": "model.norm.weight",
        "lm_head.weight": "lm_head.weight",
    }
    for key, v in sd.items():
        if key in ren:
            out[ren[key]] = v
            continue
        if not key.startswith("transformer.h."):
            continue
        rest = key[len("transformer.h."):]
        i, sub = rest.split(".", 1)
        base = f"model.layers.{i}."
        if sub.startswith("attn.c_attn."):
            leaf = sub.rsplit(".", 1)[1]          # weight | bias
            q, k, vv = np.split(np.asarray(v), 3, axis=0)
            for name, part in (("q_proj", q), ("k_proj", k), ("v_proj", vv)):
                out[base + f"self_attn.{name}.{leaf}"] = part
        elif sub == "attn.c_proj.weight":
            out[base + "self_attn.o_proj.weight"] = v
        elif sub == "ln_1.weight":
            out[base + "input_layernorm.weight"] = v
        elif sub == "ln_2.weight":
            out[base + "post_attention_layernorm.weight"] = v
        elif sub == "mlp.w1.weight":
            out[base + "mlp.up_proj.weight"] = v
        elif sub == "mlp.w2.weight":
            out[base + "mlp.gate_proj.weight"] = v
        elif sub == "mlp.c_proj.weight":
            out[base + "mlp.down_proj.weight"] = v
        else:
            out[base + sub] = v
    return out


def baichuan_to_llama_state_dict(sd: dict) -> dict:
    """Baichuan -> canonical naming: the only delta is the fused
    W_pack attention projection ([q; k; v] rows, no bias) — split it;
    every other key is already llama-named."""
    import numpy as np

    out = {}
    for key, v in sd.items():
        if key.endswith("self_attn.W_pack.weight"):
            base = key[: -len("W_pack.weight")]
            q, k, vv = np.split(np.asarray(v), 3, axis=0)
            out[base + "q_proj.weight"] = q
            out[base + "k_proj.weight"] = k
            out[base + "v_proj.weight"] = vv
        else:
            out[key] = v
    return out
