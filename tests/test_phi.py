"""Phi-family support: parallel residual off ONE layernorm, ungated
fc1 -> act -> fc2 MLP, biases on every linear (incl. o_proj/lm_head),
and partial rotary embedding (only the first
partial_rotary_factor * head_dim dims rotate).  Smoothing uses a JOINT
input_layernorm -> q/k/v + fc1 group (the parallel block feeds both
from the same norm) — same semantics the reference applies to its
parallel-residual shims (models/cohere.py single-norm group).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.config import QuantConfig
from qdm_tpu.models import llama as llama_lib
from qdm_tpu.models.shims import llama_scaling_groups
from qdm_tpu.quant.smooth import smooth_params

RNG = np.random.default_rng(19)


def tiny_phi_config(**kw):
    base = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=4, max_position_embeddings=128,
                norm_type="layernorm", parallel_residual=True,
                mlp_act="gelu", attention_bias=True, all_bias=True,
                mlp_gated=False, partial_rotary_factor=0.5)
    base.update(kw)
    return llama_lib.LlamaConfig(**base)


def _lm(seed=11, **kw):
    return CausalLM.from_config(tiny_phi_config(**kw), dtype=jnp.float32,
                                seed=seed)


def test_structure_and_rotary_dim():
    cfg = tiny_phi_config()
    assert cfg.rotary_dim == 8          # 0.5 * head_dim 16
    lm = _lm()
    l0 = lm.params["layers_0"]
    assert "fc1" in l0["mlp"] and "fc2" in l0["mlp"]
    assert "bias" in l0["self_attn"]["o_proj"]
    assert "bias" in lm.params["lm_head"]
    assert "post_attention_layernorm" not in l0


def test_partial_rotary_changes_outputs():
    lm = _lm()
    ids = jnp.asarray(RNG.integers(0, 256, (1, 10)).astype(np.int32))
    base, _ = lm.model.apply({"params": lm.params}, ids)
    import dataclasses

    m2 = llama_lib.LlamaForCausalLM(
        dataclasses.replace(lm.config, partial_rotary_factor=1.0),
        dtype=jnp.float32)
    alt, _ = m2.apply({"params": lm.params}, ids)
    assert not np.allclose(np.asarray(base), np.asarray(alt))


def test_cached_decode_matches_full_forward():
    lm = _lm()
    ids = RNG.integers(0, 256, (2, 10)).astype(np.int32)
    full, _ = lm.model.apply({"params": lm.params}, jnp.asarray(ids))
    caches = lm.model.init_cache(2, 16)
    lg, caches = lm.model.apply({"params": lm.params},
                                jnp.asarray(ids[:, :4]),
                                kv_caches=caches, cache_index=0)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(full[:, :4]),
                               rtol=1e-4, atol=1e-4)
    for t in range(4, 10):
        lg, caches = lm.model.apply({"params": lm.params},
                                    jnp.asarray(ids[:, t:t + 1]),
                                    kv_caches=caches, cache_index=t)
        np.testing.assert_allclose(np.asarray(lg[:, 0]),
                                   np.asarray(full[:, t]),
                                   rtol=1e-4, atol=1e-4)


def test_smooth_invariance_joint_group():
    """The parallel block's ONE norm feeds q/k/v AND fc1: migration
    must scale them jointly and leave outputs unchanged."""
    lm = _lm()
    ids = np.asarray(RNG.integers(0, 256, (2, 12)))
    base, _ = lm.model.apply({"params": lm.params}, jnp.asarray(ids))
    stats, _ = lm._calibrate(QuantConfig.from_dict({}), ids,
                             capture_inputs=False)
    groups = llama_scaling_groups(lm.params)
    assert any("fc1" in "/".join(p) for p in groups[0].layer_paths)
    sm = smooth_params(lm.params, groups, stats, alpha=0.5)
    after, _ = lm.model.apply({"params": sm}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(base), np.asarray(after),
                               rtol=2e-4, atol=2e-4)


def test_quantize_and_generate():
    lm = _lm()
    ids = np.asarray(RNG.integers(0, 256, (2, 16)))
    lm.quantize(quant_config={"w_bit": 8, "q_group_size": 16},
                quantType="sq", calib_data=ids)
    out = lm.generate(ids[:1, :8], max_new_tokens=4)
    assert out.shape == (1, 12)


def test_engine_bf16_matches_module():
    """DecodeEngine serves phi: partial rotary runs XLA-side off the
    generalized _rope_consts tables, the ungated biased MLP as XLA
    matmuls off the parallel-residual norm, o_proj/lm_head biases in
    the dense kernels' bias epilogue."""
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
    ids = RNG.integers(0, 256, (2, 10))
    stats = DecodeEngine.calibrate_scales(lm, ids)
    out = DecodeEngine(lm, mode="w8a8_static",
                       act_stats=stats).generate(ids, max_new_tokens=6)
    ref = lm.generate(ids, max_new_tokens=6)
    # int8 is lossy; the first greedy token should still agree on a
    # tiny well-conditioned model
    np.testing.assert_array_equal(np.asarray(out[:, 10]),
                                  np.asarray(ref[:, 10]))
    # w4a8 serves phi too (two i4 dense kernels + XLA bias/act glue)
    out4 = DecodeEngine(lm, mode="w4a8_static",
                        act_stats=stats).generate(ids, max_new_tokens=6)
    assert out4.shape == ref.shape


def test_phi_preset_and_loader_rename():
    from qdm_tpu.models.registry import LLM_CONFIG_PRESETS
    from qdm_tpu.api.loader import phi_to_llama_state_dict

    cfg = LLM_CONFIG_PRESETS["phi"]
    assert not cfg.mlp_gated and cfg.partial_rotary_factor == 0.4
    sd = {"model.layers.0.self_attn.dense.weight": 1,
          "model.final_layernorm.weight": 2,
          "model.layers.0.mlp.fc1.bias": 3}
    out = phi_to_llama_state_dict(sd)
    assert "model.layers.0.self_attn.o_proj.weight" in out
    assert "model.norm.weight" in out
    assert "model.layers.0.mlp.fc1.bias" in out
