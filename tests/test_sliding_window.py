"""Sliding-window attention (mistral/qwen2): the module bands its
masks over LINEAR full-length caches (correctness/calibration path),
while the DecodeEngine serves a ROLLING window-slot cache (decode
writes slot pos % W; the kernels' ``t_ids <= pos`` mask is already
exact on it).  Reference parity anchor: the reference serves these
families through HF's full-length caches (models/qwen2.py) — the
rolling engine cache is the TPU-serving extension, token-exact vs the
module path.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.api.serve import DecodeEngine
from qdm_tpu.models import llama as llama_lib

RNG = np.random.default_rng(13)
WIN = 8


def swa_config(window=WIN):
    return dataclasses.replace(llama_lib.tiny_llama_config(),
                               sliding_window=window)


def _lm(window=WIN, seed=2):
    return CausalLM.from_config(swa_config(window), dtype=jnp.float32,
                                seed=seed)


def test_module_banding_consistent_across_branches():
    """No-cache forward == cached decode, and the window actually
    changes late positions while leaving early ones untouched."""
    lm = _lm()
    cfg_full = dataclasses.replace(lm.config, sliding_window=None)
    m_full = llama_lib.LlamaForCausalLM(cfg_full, dtype=jnp.float32)
    ids = jnp.asarray(RNG.integers(0, 256, (2, 12)).astype(np.int32))
    lw, _ = lm.model.apply({"params": lm.params}, ids)
    lf, _ = m_full.apply({"params": lm.params}, ids)
    assert not np.allclose(np.asarray(lw[:, -1]), np.asarray(lf[:, -1]))
    np.testing.assert_allclose(np.asarray(lw[:, :WIN // 2]),
                               np.asarray(lf[:, :WIN // 2]), rtol=1e-6)
    caches = lm.model.init_cache(2, 16)
    lg, caches = lm.model.apply({"params": lm.params}, ids[:, :5],
                                kv_caches=caches, cache_index=0)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(lw[:, :5]),
                               rtol=1e-5, atol=1e-5)
    for t in range(5, 12):
        lg, caches = lm.model.apply({"params": lm.params}, ids[:, t:t + 1],
                                    kv_caches=caches, cache_index=t)
        np.testing.assert_allclose(np.asarray(lg[:, 0]),
                                   np.asarray(lw[:, t]),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("s,n", [(5, 4),     # window never fills
                                 (5, 12),    # decode crosses the wrap
                                 (12, 10),   # prompt > window (roll gather)
                                 (20, 16)])  # deep wrap
def test_engine_rolling_matches_module(s, n):
    lm = _lm()
    ids = RNG.integers(0, 256, (2, s))
    ref = lm.generate(ids, max_new_tokens=n)
    out = DecodeEngine(lm, mode="bf16").generate(ids, max_new_tokens=n)
    np.testing.assert_array_equal(out, ref)


def test_nonbinding_window_bitwise_equals_unwindowed():
    """A window the serving length never exceeds must not change a
    single bit (the rolling mod is the identity there)."""
    ids = RNG.integers(0, 256, (2, 12))
    lw = _lm(window=64)
    ln = CausalLM.from_config(
        dataclasses.replace(lw.config, sliding_window=None),
        dtype=jnp.float32, seed=2)
    for kw in ({}, {"kv_dtype": jnp.int8, "kv_scale_mode": "channel"}):
        ow = DecodeEngine(lw, **kw).generate(ids, max_new_tokens=8)
        on = DecodeEngine(ln, **kw).generate(ids, max_new_tokens=8)
        np.testing.assert_array_equal(ow, on)


def test_rolling_quantized_kv_runs():
    """All three quantized KV formats accept the rolling cache (the
    slot mod applies to codes and scale planes alike)."""
    lm = _lm()
    ids = RNG.integers(0, 256, (2, 12))
    for kw in ({"kv_dtype": jnp.int8},
               {"kv_dtype": jnp.int8, "kv_scale_mode": "channel"},
               {"kv_dtype": "int4"}):
        out = DecodeEngine(lm, **kw).generate(ids, max_new_tokens=10)
        assert out.shape == (2, 22)


def test_stop_early_and_sampling_on_rolling():
    lm = _lm()
    ids = RNG.integers(0, 256, (2, 12))
    eng = DecodeEngine(lm, mode="bf16")
    ref = lm.generate(ids, max_new_tokens=10)
    out = eng.generate(ids, max_new_tokens=10, eos_token_id=3,
                       stop_early=True)
    from qdm_tpu.api.causal_lm import mask_after_eos

    refm = mask_after_eos(np.asarray(ref[:, 12:]), 3)
    np.testing.assert_array_equal(out[:, 12:], refm)
    outs = eng.generate(ids, max_new_tokens=8, temperature=0.8, top_k=5,
                        seed=1)
    assert outs.shape == (2, 20)


def test_prefix_serving_guarded():
    """Prefix reuse conflicts with window semantics (a shared prefix
    must stay visible forever; the window evicts it) — it must reject
    binding-window serving lengths instead of mis-serving."""
    lm = _lm()
    eng = DecodeEngine(lm, mode="bf16")
    ids = RNG.integers(0, 256, (2, 12))
    with pytest.raises(NotImplementedError):
        eng.generate(ids, max_new_tokens=10,
                     prefix=eng.precompute_prefix(np.arange(6)[None]))


def test_windowed_ragged_serving():
    """generate_ragged serves window models on LINEAR caches with a
    per-step floor on the start masks — batch-composition independent
    AND equal to the module path's windowed greedy runs."""
    lm = _lm()
    eng = DecodeEngine(lm, mode="bf16")
    prompts = [RNG.integers(0, 256, n).tolist() for n in (5, 12, 9)]
    outs = eng.generate_ragged(prompts, max_new_tokens=14)
    for i, pr in enumerate(prompts):
        solo = eng.generate_ragged([pr], max_new_tokens=14)
        np.testing.assert_array_equal(np.asarray(outs[i]),
                                      np.asarray(solo[0]))
        ref = lm.generate(np.asarray(pr)[None], max_new_tokens=14)
        np.testing.assert_array_equal(np.asarray(outs[i])[len(pr):],
                                      np.asarray(ref[0, len(pr):]))


def test_windowed_continuous_batching_bounded():
    """The batcher serves window models in a bounded cache: the window
    floor advances the host starts, so rebasing reclaims the dead
    pre-window tail continuously — every request's output equals its
    single-prompt module run."""
    from qdm_tpu.api.batcher import ContinuousBatcher

    lm = _lm()
    eng = DecodeEngine(lm, mode="bf16")
    prompts = [RNG.integers(0, 256, int(n))
               for n in RNG.integers(3, 10, 12)]
    bat = ContinuousBatcher(eng, max_batch=3, chunk=4, capacity=144)
    outs = bat.run(prompts, max_new_tokens=12)
    for pr, got in zip(prompts, outs):
        ref = lm.generate(np.asarray(pr)[None], max_new_tokens=12)
        np.testing.assert_array_equal(np.asarray(got)[len(pr):],
                                      np.asarray(ref[0, len(pr):]))
    assert bat.last_stats["rebases"] > 0, \
        "stream never rebased — the bounded-cache claim is untested"


def test_windowed_budgets_exceed_capacity():
    """Long-generation windowed streams: budgets may exceed what the
    full-attention precondition (s0 + max_budget <= capacity) allows —
    for fully-windowed engines the live span is O(window), so the
    batcher must accept the run and stay token-exact across the many
    rebases it takes."""
    from qdm_tpu.api.batcher import ContinuousBatcher

    lm = _lm()
    eng = DecodeEngine(lm, mode="bf16")
    prompts = [RNG.integers(0, 256, int(n)) for n in (5, 9, 7, 11)]
    bat = ContinuousBatcher(eng, max_batch=2, chunk=4, capacity=144)
    outs = bat.run(prompts, max_new_tokens=40)  # 128 + 40 > 144
    for pr, got in zip(prompts, outs):
        ref = lm.generate(np.asarray(pr)[None], max_new_tokens=40)
        np.testing.assert_array_equal(np.asarray(got)[len(pr):],
                                      np.asarray(ref[0, len(pr):]))
    assert bat.last_stats["rebases"] >= 1


@pytest.mark.parametrize("s,n", [(5, 12), (12, 10), (20, 16)])
def test_chunked_prefill_rolls_the_window(s, n):
    """prefill_chunked is THE long-prompt SWA path (the banded mask
    keeps flash out of the square prefill); its rolled caches must
    produce the same greedy tokens as the plain prefill."""
    lm = _lm()
    ids = RNG.integers(0, 256, (2, s))
    ref = lm.generate(ids, max_new_tokens=n)
    out = DecodeEngine(lm, mode="bf16").generate(ids, max_new_tokens=n,
                                                 prefill_chunk=4)
    np.testing.assert_array_equal(out, ref)


def test_engine_rolling_under_mesh():
    """dp x tp decode writes rolling slots too (_make_run_tp)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-device CPU mesh")
    from qdm_tpu.parallel.mesh import make_mesh

    lm = _lm()
    ids = RNG.integers(0, 256, (4, 12))
    ref = DecodeEngine(lm, mode="bf16").generate(ids, max_new_tokens=10)
    mesh = make_mesh(2, 2)
    out = DecodeEngine(lm, mode="bf16", mesh=mesh).generate(
        ids, max_new_tokens=10)
    np.testing.assert_array_equal(out, ref)


def test_calibrate_and_quantize_with_window():
    """Calibration/smoothing run through the banded module path; the
    quantized model still generates."""
    lm = _lm()
    ids = np.asarray(RNG.integers(0, 256, (2, 16)))
    lm.quantize(quant_config={"w_bit": 8, "q_group_size": 16},
                quantType="sq", calib_data=ids)
    out = lm.generate(ids[:1, :8], max_new_tokens=4)
    assert out.shape == (1, 12)


def test_mistral_preset_and_hf_config():
    from qdm_tpu.models.registry import LLM_CONFIG_PRESETS

    cfg = LLM_CONFIG_PRESETS["mistral"]
    assert cfg.sliding_window == 4096 and cfg.num_key_value_heads == 8
