"""Load synthetic AutoGPTQ-format checkpoints (the other dominant
on-disk PTQ format next to AutoAWQ: row-packed qweight, column-packed
qzeros with the historical minus-one offset, per-group scales,
optional g_idx) and verify the conversion semantics."""

import dataclasses
import json
import os

import numpy as np
import jax.numpy as jnp

from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.models.llama import tiny_llama_config
from qdm_tpu.quant import quantize_tensor

RNG = np.random.default_rng(9)


def np_pack_rows(codes, bits=4):
    """Independent numpy reference of the AutoGPTQ qweight packing:
    (K, N) -> (K/epw, N) int32, LSB-first along K."""
    k, n = codes.shape
    epw = 32 // bits
    out = np.zeros((k // epw, n), dtype=np.int64)
    blocks = codes.reshape(k // epw, epw, n)
    for j in range(epw):
        out |= blocks[:, j].astype(np.int64) << (bits * j)
    return out.astype(np.uint32).view(np.int32)


def np_pack_cols(codes, bits=4):
    """AutoGPTQ qzeros packing: (G, N) -> (G, N/epw) int32, LSB-first
    along N."""
    g, n = codes.shape
    epw = 32 // bits
    out = np.zeros((g, n // epw), dtype=np.int64)
    blocks = codes.reshape(g, n // epw, epw)
    for j in range(epw):
        out |= blocks[:, :, j].astype(np.int64) << (bits * j)
    return out.astype(np.uint32).view(np.int32)


def _emit_fp(sd, prefix, tree):
    for k, v in tree.items():
        if isinstance(v, dict):
            _emit_fp(sd, f"{prefix}{k}.", v)
        else:
            name = {"kernel": "weight", "scale": "weight",
                    "embedding": "weight", "bias": "bias"}[k]
            val = np.asarray(v)
            if k == "kernel":
                val = val.T
            sd[f"{prefix}{name}"] = np.ascontiguousarray(val)


def _build_ckpt(tmp_path, cfg, lm, gs, desc_act=False, fmt="gptq"):
    from safetensors.numpy import save_file

    sd = {}
    for lname, layer in lm.params.items():
        if lname.startswith("layers_"):
            idx = lname.split("_")[1]
            for mod in ("self_attn", "mlp"):
                for pname, p in layer[mod].items():
                    kernel = np.asarray(p["kernel"])       # (in, out)
                    k = kernel.shape[0]
                    base = f"model.layers.{idx}.{mod}.{pname}"
                    if desc_act:
                        # synthetic act-order layer: random codes /
                        # grids + a shuffled row->group map; the
                        # importer must reproduce the dequant formula
                        codes = RNG.integers(0, 16, kernel.shape)
                        scales = (RNG.random((k // gs,
                                              kernel.shape[1]))
                                  * 0.02 + 0.001).astype(np.float32)
                        zeros = RNG.integers(1, 16,
                                             (k // gs, kernel.shape[1]))
                        g_idx = RNG.permutation(
                            np.arange(k) // gs).astype(np.int32)
                    else:
                        q = quantize_tensor(jnp.asarray(kernel).T,
                                            n_bits=4, group_size=gs,
                                            zero_point=True)
                        codes = np.ascontiguousarray(np.asarray(q.iweight).T)
                        scales = np.ascontiguousarray(
                            np.asarray(q.scales).T.astype(np.float32))
                        zeros = np.ascontiguousarray(
                            np.asarray(q.zeros).T.astype(np.int64))
                        g_idx = (np.arange(k) // gs).astype(np.int32)
                    sd[base + ".qweight"] = np_pack_rows(codes)
                    off = 1 if fmt == "gptq" else 0
                    sd[base + ".qzeros"] = np_pack_cols(
                        (zeros - off).astype(np.int64))
                    sd[base + ".scales"] = scales
                    sd[base + ".g_idx"] = g_idx
                    if "bias" in p:
                        # AutoGPTQ keeps linear biases fp alongside
                        # the packed weight
                        sd[base + ".bias"] = np.ascontiguousarray(
                            np.asarray(p["bias"]))
            for nname in ("input_layernorm", "post_attention_layernorm"):
                sd[f"model.layers.{idx}.{nname}.weight"] = \
                    np.asarray(layer[nname]["scale"])
        elif lname == "embed_tokens":
            sd["model.embed_tokens.weight"] = np.asarray(layer["embedding"])
        elif lname == "norm":
            sd["model.norm.weight"] = np.asarray(layer["scale"])
        elif lname == "lm_head":
            sd["lm_head.weight"] = np.ascontiguousarray(
                np.asarray(layer["kernel"]).T)
    d = str(tmp_path / f"gptq_ckpt_{desc_act}_{fmt}")
    os.makedirs(d)
    save_file(sd, os.path.join(d, "model.safetensors"))
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({**dataclasses.asdict(cfg),
                   "quantization_config": {
                       "quant_method": "gptq", "bits": 4,
                       "group_size": gs, "sym": False,
                       "desc_act": desc_act,
                       "checkpoint_format": fmt}}, f)
    return d, sd


def test_autogptq_checkpoint_roundtrip(tmp_path):
    """Trivial g_idx ('gptq' legacy format, zeros stored minus one):
    converts to the canonical packed layout; logits match a directly
    pack_params'd model on the identical grid."""
    cfg = tiny_llama_config()
    gs = 32
    lm = CausalLM.from_config(cfg, dtype=jnp.float32)
    d, _ = _build_ckpt(tmp_path, cfg, lm, gs)
    lm2 = CausalLM.from_quantized_autogptq(d, dtype=jnp.float32)
    assert lm2.quant_config.version == "real"

    ids = RNG.integers(0, cfg.vocab_size, (1, 8)).astype(np.int32)
    got = np.asarray(lm2.logits(ids))
    assert np.isfinite(got).all()

    from qdm_tpu.quant.apply import pack_params

    lm.params = pack_params(lm.params, lm2.plan)
    lm.plan = lm2.plan
    want = np.asarray(lm.logits(ids))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_autogptq_v2_format(tmp_path):
    """'gptq_v2' stores TRUE zeros (no minus-one): same converted
    logits as the legacy format of the same model."""
    cfg = tiny_llama_config()
    gs = 32
    lm = CausalLM.from_config(cfg, dtype=jnp.float32)
    d1, _ = _build_ckpt(tmp_path, cfg, lm, gs, fmt="gptq")
    d2, _ = _build_ckpt(tmp_path, cfg, lm, gs, fmt="gptq_v2")
    ids = RNG.integers(0, cfg.vocab_size, (1, 8)).astype(np.int32)
    g1 = np.asarray(CausalLM.from_quantized_autogptq(
        d1, dtype=jnp.float32).logits(ids))
    g2 = np.asarray(CausalLM.from_quantized_autogptq(
        d2, dtype=jnp.float32).logits(ids))
    np.testing.assert_array_equal(g1, g2)


def test_autogptq_desc_act_dequantized(tmp_path):
    """Non-trivial g_idx (act-order): imports as the exact dequantized
    fp kernels — (code - zero[g_idx]) * scale[g_idx] — since reordered
    group membership has no contiguous-group packing."""
    cfg = tiny_llama_config()
    gs = 32
    lm = CausalLM.from_config(cfg, dtype=jnp.float32)
    d, sd = _build_ckpt(tmp_path, cfg, lm, gs, desc_act=True)
    lm2 = CausalLM.from_quantized_autogptq(d, dtype=jnp.float32)
    assert lm2.quant_config.version == "fake"

    base = "model.layers.0.self_attn.q_proj"
    codes = np.zeros((cfg.hidden_size,
                      np.asarray(sd[base + ".scales"]).shape[1]))
    # independent dequant from the raw checkpoint tensors
    epw = 8
    qw = sd[base + ".qweight"].view(np.uint32)
    for j in range(epw):
        codes[j::epw] = (qw >> (4 * j)) & 0xF
    qz = sd[base + ".qzeros"].view(np.uint32)
    zeros = np.zeros_like(sd[base + ".scales"])
    for j in range(epw):
        zeros[:, j::epw] = ((qz >> (4 * j)) & 0xF)
    zeros = zeros + 1                       # legacy minus-one undone
    gi = sd[base + ".g_idx"]
    want = (codes - zeros[gi]) * sd[base + ".scales"][gi]
    got = np.asarray(
        lm2.params["layers_0"]["self_attn"]["q_proj"]["kernel"])
    np.testing.assert_allclose(got, want.astype(np.float32),
                               rtol=1e-5, atol=1e-6)
    ids = RNG.integers(0, cfg.vocab_size, (1, 8)).astype(np.int32)
    assert np.isfinite(np.asarray(lm2.logits(ids))).all()


def test_autogptq_real_hf_config_family_mapping(tmp_path):
    """Real HF configs carry family semantics via model_type, not
    LlamaConfig field names: a qwen2-style checkpoint (no
    attention_bias key in config.json) must still load its qkv biases,
    and a qwen3-style one must get qk_norm."""
    import dataclasses as _dc

    cfg = _dc.replace(tiny_llama_config(), attention_bias=True)
    gs = 32
    lm = CausalLM.from_config(cfg, dtype=jnp.float32)
    d, _ = _build_ckpt(tmp_path, cfg, lm, gs)
    # rewrite config.json the way HF qwen2 ships it: model_type only,
    # NO attention_bias field
    import json
    import os

    hf = json.load(open(os.path.join(d, "config.json")))
    del hf["attention_bias"]
    hf["model_type"] = "qwen2"
    json.dump(hf, open(os.path.join(d, "config.json"), "w"))
    lm2 = CausalLM.from_quantized_autogptq(d, dtype=jnp.float32)
    assert lm2.config.attention_bias
    at = lm2.params["layers_0"]["self_attn"]["q_proj"]
    assert "bias" in at and "qweight" in at
    ids = RNG.integers(0, cfg.vocab_size, (1, 8)).astype(np.int32)
    assert np.isfinite(np.asarray(lm2.logits(ids))).all()


def test_autogptq_unmatched_quantized_module_is_loud(tmp_path):
    cfg = tiny_llama_config()
    lm = CausalLM.from_config(cfg, dtype=jnp.float32)
    d, _ = _build_ckpt(tmp_path, cfg, lm, 32)
    # add a quantized module the model layout does not have
    import os

    from safetensors.numpy import load_file, save_file

    sd = load_file(os.path.join(d, "model.safetensors"))
    sd["model.layers.0.self_attn.zz_proj.qweight"] = \
        sd["model.layers.0.self_attn.q_proj.qweight"]
    sd["model.layers.0.self_attn.zz_proj.qzeros"] = \
        sd["model.layers.0.self_attn.q_proj.qzeros"]
    sd["model.layers.0.self_attn.zz_proj.scales"] = \
        sd["model.layers.0.self_attn.q_proj.scales"]
    save_file(sd, os.path.join(d, "model.safetensors"))
    import pytest

    with pytest.raises(ValueError):
        CausalLM.from_quantized_autogptq(d, dtype=jnp.float32)
