"""Qwen3-family support: per-head q/k RMSNorm BEFORE rope (shared
(head_dim,) learned scales, HF names self_attn.{q,k}_norm.weight), GQA,
no attention bias.  The DecodeEngine serves it by moving rope out of
the qkv kernel epilogue (the phi partial-rotary machinery) and applying
the norms XLA-side between the projection and the rotation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.config import QuantConfig
from qdm_tpu.models import llama as llama_lib

RNG = np.random.default_rng(23)


def tiny_qwen3_config(**kw):
    base = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=128,
                qk_norm=True)
    base.update(kw)
    return llama_lib.LlamaConfig(**base)


def _lm(seed=13, **kw):
    return CausalLM.from_config(tiny_qwen3_config(**kw), dtype=jnp.float32,
                                seed=seed)


def test_structure_and_semantics():
    """q_norm/k_norm params exist per layer; the norm actually
    normalizes: scaling a head's q projection rows leaves its
    (pre-scale) attention pattern invariant."""
    lm = _lm()
    at = lm.params["layers_0"]["self_attn"]
    assert at["q_norm"]["scale"].shape == (16,)   # head_dim
    assert at["k_norm"]["scale"].shape == (16,)
    ids = RNG.integers(0, 256, (1, 8))
    base = np.asarray(lm.logits(ids))

    # scale q_proj's kernel 10x: per-head rmsnorm makes q invariant
    # (up to the rsqrt epsilon), so logits barely move
    import copy

    lm2 = _lm()
    lm2.params = jax.tree.map(lambda x: x, lm.params)
    k = lm2.params["layers_0"]["self_attn"]["q_proj"]["kernel"]
    lm2.params["layers_0"]["self_attn"]["q_proj"]["kernel"] = k * 10.0
    scaled = np.asarray(lm2.logits(ids))
    np.testing.assert_allclose(scaled, base, rtol=1e-3, atol=1e-3)

    # whereas WITHOUT qk_norm the same scaling changes everything
    lm3 = _lm(qk_norm=False)
    lm3.params = {k2: v for k2, v in lm.params.items()}
    base3 = np.asarray(lm3.logits(ids))
    assert np.abs(base3 - base).max() > 1e-3   # the norm is load-bearing


def test_cached_decode_matches_full_forward():
    lm = _lm()
    ids = RNG.integers(0, 256, (2, 6))
    out = lm.generate(ids, max_new_tokens=8)
    # greedy continuation re-checked against a fresh full forward
    full = np.asarray(lm.logits(np.asarray(out)[:, :-1]))
    nxt = full[:, -1].argmax(-1)
    np.testing.assert_array_equal(nxt, np.asarray(out)[:, -1])


def test_smooth_invariance():
    """Smoothing migrates ln1 -> q/k/v scales; the post-projection
    q/k norms must not break fp invariance."""
    from qdm_tpu.models.shims import llama_scaling_groups
    from qdm_tpu.quant.smooth import smooth_params

    lm = _lm()
    ids = RNG.integers(0, 256, (2, 16))
    base = np.asarray(lm.logits(ids))
    cfg = QuantConfig(w_bit=8, a_bit=8)
    stats, _ = lm._calibrate(cfg, ids, capture_inputs=False)
    groups = llama_scaling_groups(lm.params)
    lm.params = smooth_params(lm.params, groups, stats, alpha=0.5)
    after = np.asarray(lm.logits(ids))
    np.testing.assert_allclose(after, base, rtol=2e-4, atol=2e-4)


def test_quantize_and_generate():
    lm = _lm()
    ids = RNG.integers(0, 256, (2, 16))
    lm.quantize(quant_config={"w_bit": 8, "q_group_size": 16,
                              "version": "fake"},
                quantType="rtn", calib_data=np.asarray(ids))
    out = lm.generate(ids[:1, :6], max_new_tokens=4)
    assert out.shape == (1, 10)


def test_engine_bf16_matches_module():
    """Engine decode: rope leaves the kernel epilogue, the q/k norms
    run XLA-side pre-rotation — greedy tokens must match the module
    path exactly (f32 CPU)."""
    from qdm_tpu.api.serve import DecodeEngine

    lm = _lm()
    for s, n in ((5, 4), (10, 12)):
        ids = RNG.integers(0, 256, (2, s))
        ref = lm.generate(ids, max_new_tokens=n)
        out = DecodeEngine(lm, mode="bf16").generate(ids, max_new_tokens=n)
        np.testing.assert_array_equal(out, ref)


def test_engine_ragged_and_kv_formats():
    from qdm_tpu.api.serve import DecodeEngine

    lm = _lm()
    eng = DecodeEngine(lm, mode="bf16")
    prompts = [RNG.integers(0, 256, n).tolist() for n in (5, 9, 7)]
    outs = eng.generate_ragged(prompts, max_new_tokens=8)
    for i, pr in enumerate(prompts):
        ref = lm.generate(np.asarray(pr)[None], max_new_tokens=8)
        np.testing.assert_array_equal(np.asarray(outs[i])[len(pr):],
                                      np.asarray(ref[0, len(pr):]))
    ids = RNG.integers(0, 256, (2, 6))
    for kw in ({"kv_dtype": jnp.int8},
               {"kv_dtype": jnp.int8, "kv_scale_mode": "channel"}):
        out = DecodeEngine(lm, **kw).generate(ids, max_new_tokens=6)
        assert out.shape == (2, 12)


def test_engine_w8a8_and_guards():
    from qdm_tpu.api.serve import DecodeEngine

    lm = _lm()
    ids = RNG.integers(0, 256, (2, 16))
    stats = DecodeEngine.calibrate_scales(lm, ids)
    eng = DecodeEngine(lm, mode="w8a8_static", act_stats=stats)
    out = eng.generate(ids[:, :6], max_new_tokens=6)
    ref = lm.generate(ids[:, :6], max_new_tokens=6)
    assert (np.asarray(out) == np.asarray(ref)).mean() > 0.6
    # w4a8 serves too: the qk norms + rope run XLA-side around the i4
    # kernels (the non-canonical-arch w4a8 path)
    out4 = DecodeEngine(lm, mode="w4a8_static",
                        act_stats=stats).generate(ids[:, :6],
                                                  max_new_tokens=6)
    assert out4.shape == (2, 12)


def test_qwen3_preset_and_hf_detection(tmp_path):
    from qdm_tpu.models.registry import LLM_CONFIG_PRESETS

    cfg = LLM_CONFIG_PRESETS["qwen3"]
    assert cfg.qk_norm and cfg.head_dim == 128
    # HF config auto-detection: model_type qwen3 -> qk_norm
    import json
    import os

    import dataclasses

    tiny = tiny_qwen3_config()
    lm = _lm()
    d = str(tmp_path / "q3")
    os.makedirs(d)
    from safetensors.numpy import save_file

    sd = {}

    def emit(prefix, tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                emit(f"{prefix}{k}.", v)
            else:
                name = {"kernel": "weight", "scale": "weight",
                        "embedding": "weight", "bias": "bias"}[k]
                val = np.asarray(v)
                if k == "kernel":
                    val = np.ascontiguousarray(val.T)
                sd[f"{prefix}{name}"] = np.ascontiguousarray(val)

    for lname, sub in lm.params.items():
        pre = ("model." + lname.replace("layers_", "layers.") + "."
               if lname != "lm_head" else "lm_head.")
        if lname in ("embed_tokens", "norm"):
            pre = "model." + lname + "."
        emit(pre, sub)
    save_file(sd, os.path.join(d, "model.safetensors"))
    hf = {k: v for k, v in dataclasses.asdict(tiny).items()
          if v is not None}
    hf["model_type"] = "qwen3"
    hf["head_dim"] = tiny.head_dim
    del hf["qk_norm"]                       # not an HF field
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(hf, f)
    lm2 = CausalLM.from_pretrained(d, dtype=jnp.float32)
    assert lm2.config.qk_norm
    ids = RNG.integers(0, 256, (1, 8))
    np.testing.assert_allclose(np.asarray(lm2.logits(ids)),
                               np.asarray(_lm().logits(ids)),
                               rtol=1e-5, atol=1e-5)
