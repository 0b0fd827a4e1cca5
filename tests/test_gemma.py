"""Gemma-family support: (1+w) RMSNorm convention (the case the
reference special-cases in scale_ln_fcs, quantize/scale.py:96-99),
sqrt(hidden)-scaled embeddings, decoupled head_dim, tied head — plus
smoothing invariance under the +1 migration math and DecodeEngine
token-parity (the engine folds +1 / embed scaling into its snapshot).
"""

import jax
import jax.numpy as jnp
import numpy as np

from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.api.serve import DecodeEngine
from qdm_tpu.config import QuantConfig
from qdm_tpu.models import llama as llama_lib
from qdm_tpu.models.shims import llama_scaling_groups
from qdm_tpu.quant.smooth import smooth_params

RNG = np.random.default_rng(11)


def tiny_gemma_config():
    return llama_lib.LlamaConfig(
        vocab_size=256, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim_override=16,             # h*d = 64 != hidden (gemma-7b trait)
        mlp_act="gelu", norm_plus_one=True, scale_embeddings=True,
        tie_word_embeddings=True, max_position_embeddings=128)


def _lm():
    return CausalLM.from_config(tiny_gemma_config(), dtype=jnp.float32, seed=5)


def test_forward_and_conventions():
    lm = _lm()
    # zero-offset norms (fresh init) must behave like scale=1 norms
    assert float(jnp.max(jnp.abs(
        lm.params["layers_0"]["input_layernorm"]["scale"]))) == 0.0
    ids = np.arange(12, dtype=np.int32).reshape(2, 6)
    logits, _ = lm.model.apply({"params": lm.params}, jnp.asarray(ids))
    assert logits.shape == (2, 6, 256)
    assert np.isfinite(np.asarray(logits)).all()
    # embed scaling present: manual first-layer input check
    x = lm.params["embed_tokens"]["embedding"][jnp.asarray(ids)]
    assert not np.allclose(np.asarray(x), np.asarray(x) * 48 ** 0.5)


def test_head_dim_override():
    cfg = tiny_gemma_config()
    assert cfg.head_dim == 16
    lm = _lm()
    k = lm.params["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert k.shape == (48, 64)            # hidden -> h*head_dim


def test_cached_decode_matches_full_forward():
    lm = _lm()
    ids = np.arange(9, dtype=np.int32).reshape(1, 9)
    full, _ = lm.model.apply({"params": lm.params}, jnp.asarray(ids))
    caches = lm.model.init_cache(1, 16)
    logits, caches = lm.model.apply({"params": lm.params},
                                    jnp.asarray(ids[:, :5]),
                                    kv_caches=caches, cache_index=0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :5]),
                               rtol=1e-4, atol=1e-4)
    for t in range(5, 9):
        logits, caches = lm.model.apply({"params": lm.params},
                                        jnp.asarray(ids[:, t:t + 1]),
                                        kv_caches=caches, cache_index=t)
        np.testing.assert_allclose(np.asarray(logits[:, 0]),
                                   np.asarray(full[:, t]),
                                   rtol=1e-4, atol=1e-4)


def test_smooth_invariance_plus_one_norm():
    """Migration through a (1+w) norm (w' = (1+w)/s - 1) must leave the
    unquantized outputs unchanged — the scale.py:96-99 semantics."""
    lm = _lm()
    ids = jnp.asarray(np.arange(24, dtype=np.int32).reshape(2, 12))
    base, _ = lm.model.apply({"params": lm.params}, ids)
    stats, _ = lm._calibrate(QuantConfig.from_dict({}),
                             np.asarray(ids), capture_inputs=False)
    groups = llama_scaling_groups(lm.params, norm_plus_one=True)
    smoothed = smooth_params(lm.params, groups, stats, alpha=0.5)
    # the migration actually moved something
    assert float(jnp.max(jnp.abs(
        smoothed["layers_0"]["input_layernorm"]["scale"]
        - lm.params["layers_0"]["input_layernorm"]["scale"]))) > 1e-6
    after, _ = lm.model.apply({"params": smoothed}, ids)
    np.testing.assert_allclose(np.asarray(base), np.asarray(after),
                               rtol=2e-4, atol=2e-4)


def test_quantize_sq_and_generate():
    lm = _lm()
    ids = np.arange(32, dtype=np.int32).reshape(2, 16)
    lm.quantize(quant_config={"w_bit": 8, "q_group_size": 16},
                quantType="sq", calib_data=ids)
    out = lm.generate(ids[:1, :8], max_new_tokens=4)
    assert out.shape == (1, 12)


def test_engine_bf16_matches_module_greedy():
    """The engine folds +1 norms and embed scaling into its snapshot;
    greedy tokens must equal the module path exactly (f32 CPU)."""
    lm = _lm()
    ids = RNG.integers(0, 256, (2, 7))
    ref = lm.generate(ids, max_new_tokens=10)
    eng = DecodeEngine(lm, mode="bf16")
    out = eng.generate(ids, max_new_tokens=10)
    np.testing.assert_array_equal(out, ref)
