"""int8 KV cache + speculative decoding tests (serving extensions;
the reference decode path is plain autoregressive fp16,
models/base.py:828-850, fused_utils.py:14-27)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.models import llama as llama_lib


@pytest.fixture(scope="module")
def lm():
    return CausalLM.from_config(llama_lib.tiny_llama_config(),
                                dtype=jnp.float32, seed=0)


def test_int8_kv_cache_matches_fp_logits(lm):
    """One cached decode step with the int8 cache stays close to the
    fp cache path (per-token per-head scales: ~0.4% quant error)."""
    model = lm.model
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 8)),
                      jnp.int32)
    for dtype, cache in ((None, model.init_cache(2, 12)),
                        (jnp.int8, model.init_cache(2, 12, jnp.int8))):
        lg, cache = model.apply({"params": lm.params}, ids,
                                kv_caches=cache, cache_index=0)
        tok = jnp.argmax(lg[:, -1], axis=-1)
        lg2, _ = model.apply({"params": lm.params}, tok[:, None],
                             kv_caches=cache, cache_index=8)
        if dtype is None:
            ref_lg, ref_lg2 = lg, lg2
    # per-element quant error is ~0.4%; it compounds through the 2
    # layers (layer-1 inputs shift), measured ~1.6% of logit range
    for got, ref in ((lg, ref_lg), (lg2, ref_lg2)):
        rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        assert rel < 0.03, rel


def test_int8_kv_cache_generate_runs(lm):
    ids = np.random.default_rng(1).integers(0, 256, (1, 6))
    out = lm.generate(ids, max_new_tokens=5, kv_cache_dtype=jnp.int8)
    assert out.shape == (1, 11)
    ref = lm.generate(ids, max_new_tokens=5)
    # greedy tokens should survive the ~0.4% cache quant error on a
    # tiny random model
    assert (out == ref).mean() > 0.8


def test_fused_projections_equivalence(lm):
    """qkv_proj + gate_up_proj fusion reproduces unfused logits
    exactly (GQA: unequal q/k/v widths concat+slice)."""
    from qdm_tpu.models.llama import LlamaForCausalLM
    from qdm_tpu.quant.plan import QuantPlan
    from qdm_tpu.quant.apply import fuse_qkv_params

    ids = np.random.default_rng(9).integers(0, 256, (2, 8))
    ref = lm.logits(ids)
    fused = fuse_qkv_params(lm.params)
    mf = LlamaForCausalLM(config=lm.config, dtype=jnp.float32,
                          plan=QuantPlan(fuse_qkv=True))
    out, _ = mf.apply({"params": fused}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_projections_quantize_lifecycle():
    """fuse_projections=True flows through quantize + generate."""
    from qdm_tpu.config import QuantConfig
    from qdm_tpu.models.llama import tiny_llama_config

    lm = CausalLM.from_config(tiny_llama_config(), dtype=jnp.float32, seed=3)
    ids = np.random.default_rng(10).integers(0, 256, (1, 6))
    ref = lm.generate(ids, max_new_tokens=6)
    lm.quantize(quant_config=QuantConfig(
        w_bit=8, a_bit=8, version="real", quantize_act=True,
        act_quant_type="per_token", quant_method="rtn",
        fuse_projections=True), quantType="rtn",
        calib_data=np.zeros((1, 8), np.int64))
    out = lm.generate(ids, max_new_tokens=6)
    assert out.shape == ref.shape
    # int8 on a tiny random model: most greedy tokens should survive
    assert (out == ref).mean() > 0.6


def test_fused_projections_save_load_roundtrip(tmp_path):
    """fuse_projections survives save_quantized/from_quantized (the
    flag rides quant_config.json and _make_plan rebuilds the fused
    plan for the fused stored params)."""
    from qdm_tpu.config import QuantConfig
    from qdm_tpu.models.llama import tiny_llama_config

    lm = CausalLM.from_config(tiny_llama_config(), dtype=jnp.float32, seed=4)
    lm.quantize(quant_config=QuantConfig(
        w_bit=8, a_bit=8, version="real", quantize_act=True,
        act_quant_type="per_token", quant_method="rtn",
        fuse_projections=True), quantType="rtn",
        calib_data=np.zeros((1, 8), np.int64))
    ids = np.random.default_rng(11).integers(0, 256, (1, 6))
    ref = lm.generate(ids, max_new_tokens=5)
    d = str(tmp_path / "ckpt")
    lm.save_quantized(d)
    lm2 = CausalLM.from_quantized(d, dtype=jnp.float32)
    assert lm2.plan.fuse_qkv
    out = lm2.generate(ids, max_new_tokens=5)
    np.testing.assert_array_equal(out, ref)


def test_speculative_matches_greedy(lm):
    """Greedy accept/reject makes spec decode token-identical to plain
    greedy decode, for any draft."""
    draft = CausalLM.from_config(
        llama_lib.LlamaConfig(vocab_size=256, hidden_size=32,
                              intermediate_size=64, num_hidden_layers=1,
                              num_attention_heads=2, num_key_value_heads=2,
                              max_position_embeddings=128),
        dtype=jnp.float32, seed=7)
    ids = np.random.default_rng(2).integers(0, 256, (1, 7))
    ref = lm.generate(ids, max_new_tokens=12)
    for gamma in (1, 3, 5):
        out = lm.generate_speculative(ids, 12, draft, gamma=gamma)
        np.testing.assert_array_equal(out, ref)


def test_speculative_with_int8_cache_matches_int8_greedy(lm):
    """Both paths read K/V through the same quantized cache, so spec
    decode stays token-identical to plain greedy even with int8 KV."""
    draft = CausalLM.from_config(
        llama_lib.LlamaConfig(vocab_size=256, hidden_size=32,
                              intermediate_size=64, num_hidden_layers=1,
                              num_attention_heads=2, num_key_value_heads=2),
        dtype=jnp.float32, seed=7)
    ids = np.random.default_rng(5).integers(0, 256, (1, 6))
    ref = lm.generate(ids, max_new_tokens=10, kv_cache_dtype=jnp.int8)
    out = lm.generate_speculative(ids, 10, draft, gamma=3,
                                  kv_cache_dtype=jnp.int8)
    np.testing.assert_array_equal(out, ref)


def test_speculative_self_draft_accepts_everything(lm):
    """draft == target: every proposal verifies, output still exact."""
    ids = np.random.default_rng(3).integers(0, 256, (1, 5))
    ref = lm.generate(ids, max_new_tokens=9)
    out = lm.generate_speculative(ids, 9, lm, gamma=4)
    np.testing.assert_array_equal(out, ref)

def test_speculative_self_draft_full_acceptance_every_round(lm):
    """Regression (round-3 advisor fix): after a fully-accepted round
    the draft cache used to keep a zero row at position n+gamma (the
    gamma-th proposal's KV was never written), so a self-draft —
    which must agree with the target forever — started mis-proposing
    in later rounds.  With the hole patched, every round accepts all
    gamma proposals."""
    ids = np.random.default_rng(4).integers(0, 256, (1, 5))
    lm.generate_speculative(ids, 16, lm, gamma=3)
    stats = lm.last_spec_stats
    assert stats["rounds"] >= 2
    assert all(a == 3 for a in stats["accepted_per_round"]), stats


def test_unfuse_llama_roundtrip(lm):
    """unfuse_qkv_params restores the canonical GQA layout (advisor
    round-2 low: qkv_proj/gate_up_proj split rules were missing)."""
    from qdm_tpu.quant.apply import fuse_qkv_params, unfuse_qkv_params

    fused = fuse_qkv_params(lm.params)
    l0 = fused["layers_0"]
    assert "qkv_proj" in l0["self_attn"] and "gate_up_proj" in l0["mlp"]
    back = unfuse_qkv_params(fused, llama_config=lm.config)
    for path in (("self_attn", "q_proj"), ("self_attn", "k_proj"),
                 ("self_attn", "v_proj"), ("mlp", "gate_proj"),
                 ("mlp", "up_proj")):
        a = back["layers_0"][path[0]][path[1]]["kernel"]
        b = lm.params["layers_0"][path[0]][path[1]]["kernel"]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError):
        unfuse_qkv_params(fused)  # GQA widths need the config


def test_fill_static_act_scales_fused_fallbacks():
    """Fused projections (incl. qkv_proj / gate_up_proj / add_qkv_proj
    — advisor round-2 medium) inherit the unfused modules' stats; a
    layer with no stats warns and keeps the placeholder."""
    import warnings
    from qdm_tpu.quant.apply import fill_static_act_scales

    params = {
        "attn": {"qkv_proj": {"qweight": jnp.zeros((4, 4), jnp.int8),
                              "act_scale": jnp.ones((1,), jnp.float32)},
                 "add_qkv_proj": {"qweight": jnp.zeros((4, 4), jnp.int8),
                                  "act_scale": jnp.ones((1,), jnp.float32)}},
        "mlp": {"gate_up_proj": {"qweight": jnp.zeros((4, 4), jnp.int8),
                                 "act_scale": jnp.ones((1,), jnp.float32)}},
        "orphan": {"qweight": jnp.zeros((4, 4), jnp.int8),
                   "act_scale": jnp.ones((1,), jnp.float32)},
    }
    stats = {"attn/q_proj": jnp.asarray([127.0 * 2]),
             "attn/add_q_proj": jnp.asarray([127.0 * 3]),
             "mlp/gate_proj": jnp.asarray([127.0 * 4])}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = fill_static_act_scales(params, stats)
    assert float(out["attn"]["qkv_proj"]["act_scale"][0]) == pytest.approx(2.0)
    assert float(out["attn"]["add_qkv_proj"]["act_scale"][0]) == pytest.approx(3.0)
    assert float(out["mlp"]["gate_up_proj"]["act_scale"][0]) == pytest.approx(4.0)
    assert float(out["orphan"]["act_scale"][0]) == 1.0
    assert any("orphan" in str(x.message) for x in w)
    with pytest.raises(KeyError):
        fill_static_act_scales(params, stats, strict=True)


def test_w4a16_xla_decode_guard():
    """Decode-shaped w4a16_xla warns (measured 0.15x footgun)."""
    import warnings
    from qdm_tpu.models import layers as layers_lib
    from qdm_tpu.quant.plan import QuantPlan, LayerQuantSpec

    plan = QuantPlan(default=LayerQuantSpec(mode="w4a16_xla", w_bits=4,
                                            group_size=32))
    m = layers_lib.QDense(64, use_bias=False, dtype=jnp.float32, plan=plan)
    layers_lib._W4A16_XLA_WARNED = False
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        m.init(jax.random.PRNGKey(0), jnp.zeros((2, 64), jnp.float32))
    assert any("w4a16_xla" in str(x.message) for x in w)


def test_truncated_self_draft(lm):
    """Truncated-layer self-draft: correlated logits -> nonzero
    acceptance, shared buffers (no copy), exact output."""
    draft = lm.truncated_draft(1)
    assert draft.config.num_hidden_layers == 1
    assert draft.params["layers_0"] is lm.params["layers_0"]
    assert "layers_1" not in draft.params
    ids = np.random.default_rng(8).integers(0, 256, (1, 6))
    ref = lm.generate(ids, max_new_tokens=10)
    out = lm.generate_speculative(ids, 10, draft, gamma=3)
    np.testing.assert_array_equal(out, ref)
    with pytest.raises(ValueError):
        lm.truncated_draft(0)


def test_speculative_scan_matches_host_loop(lm):
    """The device-resident while_loop variant is token-identical to
    plain greedy decode (hence to the host-driven spec loop) for an
    unrelated draft, a self-draft, and a quantized self-draft."""
    ids = np.random.default_rng(6).integers(0, 256, (1, 7))
    ref = lm.generate(ids, max_new_tokens=11)
    other = CausalLM.from_config(
        llama_lib.LlamaConfig(vocab_size=256, hidden_size=32,
                              intermediate_size=64, num_hidden_layers=1,
                              num_attention_heads=2, num_key_value_heads=2,
                              max_position_embeddings=128),
        dtype=jnp.float32, seed=7)
    for gamma, draft in ((2, other), (3, lm), (4, lm.quantized_draft())):
        out = lm.generate_speculative_scan(ids, 11, draft, gamma=gamma)
        np.testing.assert_array_equal(out, ref)
        st = lm.last_spec_stats
        assert st["rounds"] >= 1
        if draft is lm:
            assert st["acceptance_rate"] == 1.0, st


def test_quantized_draft_acceptance_is_high(lm):
    """w8a8 quantization keeps ~0.9 greedy top-1 agreement even on
    random weights, so the quantized self-draft must show materially
    nonzero acceptance (the truncated-layer draft's collapses to ~0
    there — measured round 3)."""
    ids = np.random.default_rng(8).integers(0, 256, (1, 6))
    draft = lm.quantized_draft()
    lm.generate_speculative_scan(ids, 24, draft, gamma=4)
    assert lm.last_spec_stats["acceptance_rate"] > 0.3, lm.last_spec_stats
