"""Gemma-2 family: alternating local/global attention
(sliding_window_pattern), attention + final logit soft-capping,
sandwich norms (post-attn / pre-ff / post-ff), query_pre_attn_scalar —
on top of the gemma-1 conventions ((1+w) norms, scaled embeds, tied
head).  The engine serves it through the same megakernels: per-layer
rolling caches (global layers keep full-length ones), soft-cap as a
tanh epilogue in the bf16-KV attention kernels, sandwich post-norms in
XLA, the scale override folded into q.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.api.serve import DecodeEngine
from qdm_tpu.models import llama as llama_lib

RNG = np.random.default_rng(17)


def tiny_gemma2_config(**kw):
    base = dict(
        vocab_size=256, hidden_size=48, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim_override=16, mlp_act="gelu", norm_plus_one=True,
        scale_embeddings=True, tie_word_embeddings=True,
        max_position_embeddings=128, sliding_window=6,
        sliding_window_pattern=2, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, sandwich_norms=True,
        query_pre_attn_scalar=10.0)
    base.update(kw)
    return llama_lib.LlamaConfig(**base)


def _lm(seed=6, **kw):
    return CausalLM.from_config(tiny_gemma2_config(**kw),
                                dtype=jnp.float32, seed=seed)


def test_layer_window_alternation():
    cfg = tiny_gemma2_config()
    assert [cfg.layer_window(i) for i in range(4)] == [6, None, 6, None]
    g3 = dataclasses.replace(cfg, sliding_window_pattern=6,
                             num_hidden_layers=12)
    wins = [g3.layer_window(i) for i in range(12)]
    assert wins.count(None) == 2 and wins[5] is None and wins[11] is None


def test_module_forward_and_cached_decode():
    lm = _lm()
    assert "pre_feedforward_layernorm" in lm.params["layers_0"]
    ids = np.asarray(RNG.integers(0, 256, (2, 12)).astype(np.int32))
    full, _ = lm.model.apply({"params": lm.params}, jnp.asarray(ids))
    assert np.isfinite(np.asarray(full)).all()
    # final soft-cap bounds the logits
    assert float(jnp.max(jnp.abs(full))) <= 30.0
    caches = lm.model.init_cache(2, 16)
    lg, caches = lm.model.apply({"params": lm.params},
                                jnp.asarray(ids[:, :5]),
                                kv_caches=caches, cache_index=0)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(full[:, :5]),
                               rtol=1e-4, atol=1e-4)
    for t in range(5, 12):
        lg, caches = lm.model.apply({"params": lm.params},
                                    jnp.asarray(ids[:, t:t + 1]),
                                    kv_caches=caches, cache_index=t)
        np.testing.assert_allclose(np.asarray(lg[:, 0]),
                                   np.asarray(full[:, t]),
                                   rtol=1e-4, atol=1e-4)


def test_softcap_and_scale_change_outputs():
    """Each gemma2 knob must actually alter the computation."""
    ids = jnp.asarray(RNG.integers(0, 256, (1, 10)).astype(np.int32))
    lm = _lm(seed=9)
    base, _ = lm.model.apply({"params": lm.params}, ids)
    for knob in (dict(attn_logit_softcapping=None),
                 dict(query_pre_attn_scalar=None),
                 dict(sliding_window_pattern=1)):
        cfg2 = dataclasses.replace(lm.config, **knob)
        m2 = llama_lib.LlamaForCausalLM(cfg2, dtype=jnp.float32)
        alt, _ = m2.apply({"params": lm.params}, ids)
        assert not np.allclose(np.asarray(base), np.asarray(alt)), knob


@pytest.mark.parametrize("s,n", [(5, 12), (12, 12)])
def test_engine_matches_module(s, n):
    lm = _lm()
    ids = RNG.integers(0, 256, (2, s))
    ref = lm.generate(ids, max_new_tokens=n)
    eng = DecodeEngine(lm, mode="bf16")
    np.testing.assert_array_equal(eng.generate(ids, max_new_tokens=n), ref)
    np.testing.assert_array_equal(
        eng.generate(ids, max_new_tokens=n, prefill_chunk=4), ref)


def test_engine_ragged_and_batcher():
    lm = _lm()
    eng = DecodeEngine(lm, mode="bf16")
    prompts = [RNG.integers(0, 256, n).tolist() for n in (5, 12, 9)]
    outs = eng.generate_ragged(prompts, max_new_tokens=10)
    for i, pr in enumerate(prompts):
        ref = lm.generate(np.asarray(pr)[None], max_new_tokens=10)
        np.testing.assert_array_equal(np.asarray(outs[i])[len(pr):],
                                      np.asarray(ref[0, len(pr):]))
    from qdm_tpu.api.batcher import ContinuousBatcher

    bat = ContinuousBatcher(eng, max_batch=2, chunk=4, capacity=144)
    bouts = bat.run(prompts, max_new_tokens=8)
    for pr, got in zip(prompts, bouts):
        ref = lm.generate(np.asarray(pr)[None], max_new_tokens=8)
        np.testing.assert_array_equal(np.asarray(got)[len(pr):],
                                      np.asarray(ref[0, len(pr):]))


def test_engine_w8a8_and_sampling_and_guards():
    lm = _lm()
    ids = RNG.integers(0, 256, (2, 12))
    stats = DecodeEngine.calibrate_scales(lm, ids)
    out = DecodeEngine(lm, mode="w8a8_static",
                       act_stats=stats).generate(ids, max_new_tokens=6)
    assert out.shape == (2, 18)
    eng = DecodeEngine(lm, mode="bf16")
    outs = eng.generate(ids, max_new_tokens=6, temperature=0.9, top_k=4,
                        seed=3)
    assert outs.shape == (2, 18)
    # w4a8 serves too (i4 dense/MLP kernels; post-norms in XLA, the
    # soft-cap tanh in the mode-independent attention kernels)
    out4 = DecodeEngine(lm, mode="w4a8_static",
                        act_stats=stats).generate(ids, max_new_tokens=6)
    assert out4.shape == (2, 18)
    with pytest.raises(NotImplementedError):
        DecodeEngine(lm, kv_dtype=jnp.int8, kv_scale_mode="channel")


def test_quantize_lifecycle():
    """Calibration/smoothing run through the banded sandwich module."""
    lm = _lm()
    ids = np.asarray(RNG.integers(0, 256, (2, 16)))
    lm.quantize(quant_config={"w_bit": 8, "q_group_size": 16},
                quantType="sq", calib_data=ids)
    out = lm.generate(ids[:1, :8], max_new_tokens=4)
    assert out.shape == (1, 12)


def test_gemma2_preset():
    from qdm_tpu.models.registry import LLM_CONFIG_PRESETS

    cfg = LLM_CONFIG_PRESETS["gemma2"]
    assert cfg.sandwich_norms and cfg.sliding_window_pattern == 2
    assert cfg.attn_logit_softcapping == 50.0


def test_smooth_invariance_sandwich():
    """Sandwich models migrate the MLP group through
    pre_feedforward_layernorm (post_attention_layernorm norms the
    ATTENTION OUTPUT there — scaling it would break function
    preservation)."""
    from qdm_tpu.config import QuantConfig
    from qdm_tpu.models.shims import llama_scaling_groups
    from qdm_tpu.quant.smooth import smooth_params

    lm = _lm(seed=12)
    ids = np.asarray(RNG.integers(0, 256, (2, 12)))
    base, _ = lm.model.apply({"params": lm.params}, jnp.asarray(ids))
    stats, _ = lm._calibrate(QuantConfig.from_dict({}), ids,
                             capture_inputs=False)
    groups = llama_scaling_groups(lm.params, norm_plus_one=True)
    assert any("pre_feedforward" in "/".join(g.prev_path) for g in groups)
    sm = smooth_params(lm.params, groups, stats, alpha=0.5)
    after, _ = lm.model.apply({"params": sm}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(base), np.asarray(after),
                               rtol=2e-4, atol=2e-4)
