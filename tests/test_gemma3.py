"""Gemma3-family support = gemma2's machinery (sandwich norms,
alternating local/global windows, (1+w) norms, scaled embeds) with
QK-norm replacing the attention soft-cap and DUAL rope: windowed
(local) layers rotate with rope_local_theta at raw positions, global
layers keep rope_theta with linear position scaling
(angles = (pos / rope_scaling_factor) * freqs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.models import llama as llama_lib

RNG = np.random.default_rng(31)


def tiny_gemma3_config(**kw):
    base = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                num_hidden_layers=4, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=128,
                mlp_act="gelu", norm_plus_one=True, scale_embeddings=True,
                tie_word_embeddings=True, sliding_window=8,
                sliding_window_pattern=2, sandwich_norms=True,
                query_pre_attn_scalar=16.0, qk_norm=True,
                rope_theta=1000000.0, rope_local_theta=10000.0,
                rope_scaling_factor=8.0)
    base.update(kw)
    return llama_lib.LlamaConfig(**base)


def _lm(seed=17, **kw):
    return CausalLM.from_config(tiny_gemma3_config(**kw),
                                dtype=jnp.float32, seed=seed)


def test_layer_windows_and_structure():
    cfg = tiny_gemma3_config()
    # pattern 2: even layers local (windowed), odd layers global
    assert cfg.layer_window(0) == 8 and cfg.layer_window(1) is None
    lm = _lm()
    at = lm.params["layers_0"]["self_attn"]
    assert "q_norm" in at and "k_norm" in at
    assert "pre_feedforward_layernorm" in lm.params["layers_0"]


def test_dual_rope_is_load_bearing():
    """Same weights, dual rope on vs off: outputs must differ (the
    local tables actually engage on windowed layers), and the scaling
    factor must matter on global layers."""
    lm = _lm()
    ids = RNG.integers(0, 256, (1, 12))
    base = np.asarray(lm.logits(ids))

    single = _lm(rope_local_theta=None, rope_scaling_factor=1.0)
    single.params = lm.params
    assert np.abs(np.asarray(single.logits(ids)) - base).max() > 1e-4

    unscaled = _lm(rope_scaling_factor=1.0)
    unscaled.params = lm.params
    assert np.abs(np.asarray(unscaled.logits(ids)) - base).max() > 1e-5


def test_cached_decode_matches_full_forward():
    lm = _lm()
    ids = RNG.integers(0, 256, (2, 6))
    out = lm.generate(ids, max_new_tokens=10)   # crosses the window
    full = np.asarray(lm.logits(np.asarray(out)[:, :-1]))
    nxt = full[:, -1].argmax(-1)
    np.testing.assert_array_equal(nxt, np.asarray(out)[:, -1])


def test_engine_bf16_matches_module():
    """The full composition through the engine: sandwich norms +
    QK-norm (XLA-side, pre-rotation) + per-layer DUAL rope tables +
    rolling window caches on local layers — greedy tokens must equal
    the module path exactly (f32 CPU), including past the window."""
    from qdm_tpu.api.serve import DecodeEngine

    lm = _lm()
    for s, n in ((5, 4), (6, 14)):           # 6+14 crosses window 8
        ids = RNG.integers(0, 256, (2, s))
        ref = lm.generate(ids, max_new_tokens=n)
        out = DecodeEngine(lm, mode="bf16").generate(ids, max_new_tokens=n)
        np.testing.assert_array_equal(out, ref)


def test_engine_ragged_matches_module():
    from qdm_tpu.api.serve import DecodeEngine

    lm = _lm()
    eng = DecodeEngine(lm, mode="bf16")
    prompts = [RNG.integers(0, 256, n).tolist() for n in (5, 9, 7)]
    outs = eng.generate_ragged(prompts, max_new_tokens=8)
    for i, pr in enumerate(prompts):
        ref = lm.generate(np.asarray(pr)[None], max_new_tokens=8)
        np.testing.assert_array_equal(np.asarray(outs[i])[len(pr):],
                                      np.asarray(ref[0, len(pr):]))


def test_engine_w8a8_and_guards():
    from qdm_tpu.api.serve import DecodeEngine

    lm = _lm()
    ids = RNG.integers(0, 256, (2, 16))
    stats = DecodeEngine.calibrate_scales(lm, ids)
    out = DecodeEngine(lm, mode="w8a8_static",
                       act_stats=stats).generate(ids[:, :6],
                                                 max_new_tokens=6)
    assert out.shape == (2, 12)
    # w4a8 serves the full gemma3 stack (sandwich + qk-norm + dual
    # rope + windows) on the i4 kernels
    out4 = DecodeEngine(lm, mode="w4a8_static",
                        act_stats=stats).generate(ids[:, :6],
                                                  max_new_tokens=6)
    assert out4.shape == (2, 12)


def test_gemma3_preset_and_hf_detection(tmp_path):
    import dataclasses
    import json
    import os

    from qdm_tpu.models.registry import LLM_CONFIG_PRESETS

    p = LLM_CONFIG_PRESETS["gemma3"]
    assert p.qk_norm and p.rope_local_theta == 10000.0
    assert p.sliding_window_pattern == 6 and p.rope_scaling_factor == 8.0

    # HF-style checkpoint round-trip (model_type gemma3_text)
    from safetensors.numpy import save_file

    tiny = tiny_gemma3_config()
    lm = _lm()
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
        pre = "model." + lname.replace("layers_", "layers.") + "."
        emit(pre, sub)
    d = str(tmp_path / "g3")
    os.makedirs(d)
    save_file(sd, os.path.join(d, "model.safetensors"))
    hf = {k: v for k, v in dataclasses.asdict(tiny).items()
          if v is not None and k not in ("qk_norm", "rope_local_theta",
                                         "rope_scaling_factor",
                                         "sandwich_norms", "norm_plus_one",
                                         "scale_embeddings",
                                         "head_dim_override")}
    hf.update(model_type="gemma3_text", rope_local_base_freq=10000.0,
              rope_scaling={"rope_type": "linear", "factor": 8.0},
              hidden_activation="gelu_pytorch_tanh",
              head_dim=tiny.head_dim)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(hf, f)
    lm2 = CausalLM.from_pretrained(d, dtype=jnp.float32)
    assert lm2.config.qk_norm and lm2.config.sandwich_norms
    assert lm2.config.rope_local_theta == 10000.0
    assert lm2.config.rope_scaling_factor == 8.0
    ids = RNG.integers(0, 256, (1, 8))
    np.testing.assert_allclose(np.asarray(lm2.logits(ids)),
                               np.asarray(lm.logits(ids)),
                               rtol=1e-5, atol=1e-5)


def test_rope_scaling_type_gating():
    """Only LINEAR rope_scaling maps to position division — llama3 /
    yarn factors applied linearly would rotate every token wrongly, so
    they must fall back to plain rope."""
    base = {"vocab_size": 64, "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 1, "num_attention_heads": 2,
            "num_key_value_heads": 2}
    cfg = CausalLM.config_from_hf(
        {**base, "model_type": "llama",
         "rope_scaling": {"rope_type": "llama3", "factor": 8.0,
                          "low_freq_factor": 1.0}})
    assert cfg.rope_scaling_factor == 1.0
    cfg = CausalLM.config_from_hf(
        {**base, "model_type": "llama",
         "rope_scaling": {"type": "yarn", "factor": 4.0}})
    assert cfg.rope_scaling_factor == 1.0
    cfg = CausalLM.config_from_hf(
        {**base, "model_type": "gemma3_text",
         "rope_scaling": {"rope_type": "linear", "factor": 8.0}})
    assert cfg.rope_scaling_factor == 8.0 and cfg.qk_norm


def test_gemma3_continuous_batcher_exact():
    """Dual rope + qk-norm + sandwich + per-layer windows through the
    ContinuousBatcher: every request's greedy tokens must equal its
    single-prompt module run (the chunked ragged decode loop carries
    the per-layer trig selection)."""
    from qdm_tpu.api.batcher import ContinuousBatcher
    from qdm_tpu.api.serve import DecodeEngine

    lm = _lm()
    eng = DecodeEngine(lm, mode="bf16")
    prompts = [RNG.integers(0, 256, n).tolist() for n in (5, 9, 7, 4)]
    bat = ContinuousBatcher(eng, max_batch=2, chunk=4, capacity=144)
    bouts = bat.run(prompts, max_new_tokens=8)
    for pr, got in zip(prompts, bouts):
        ref = lm.generate(np.asarray(pr)[None], max_new_tokens=8)
        np.testing.assert_array_equal(np.asarray(got)[len(pr):],
                                      np.asarray(ref[0, len(pr):]))
