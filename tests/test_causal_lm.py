"""Causal-LM pipeline tests (reference BaseAWQForCausalLM lifecycle)."""

import numpy as np
import jax.numpy as jnp
import pytest

from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.config import QuantConfig
from qdm_tpu.models.shims import llama_scaling_groups

RNG = np.random.default_rng(0)


def _calib(n=4, s=16):
    return RNG.integers(0, 256, size=(n, s)).astype(np.int32)


@pytest.fixture(scope="module")
def lm():
    return CausalLM.from_config(dtype=jnp.float32)


def test_logits_and_generate(lm):
    ids = _calib(2, 8)
    logits = lm.logits(ids)
    assert logits.shape == (2, 8, 256)
    out = lm.generate(ids, max_new_tokens=4)
    assert out.shape == (2, 12)
    # cached decode must equal uncached argmax continuation
    full = np.asarray(lm.logits(out[:, :-1]))
    assert np.array_equal(out[:, -1], full[:, -1].argmax(-1))


def test_scaling_groups(lm):
    groups = llama_scaling_groups(lm.params)
    assert len(groups) == 2 * 3  # 2 layers x (ln-qkv, ln-mlp, up-down); v-o skipped for GQA


def test_rtn_quantize(lm):
    m = CausalLM.from_config(dtype=jnp.float32)
    base = np.asarray(m.logits(_calib(1, 8)))
    m.quantize(quant_config={"w_bit": 8, "q_group_size": 32, "version": "fake",
                             "zero_point": True}, quantType="rtn")
    q = np.asarray(m.logits(_calib(1, 8)))
    assert np.isfinite(q).all()


def test_sq_and_awq_quantize():
    cfg = QuantConfig(w_bit=4, q_group_size=32, version="fake", zero_point=True)
    cfg.calib.n_samples = 4
    cfg.calib.batch_size = 2
    cfg.calib.max_seq_len = 16

    ids = _calib(2, 8)
    m1 = CausalLM.from_config(dtype=jnp.float32)
    fp = np.asarray(m1.logits(ids))
    m1.quantize(quant_config=cfg, quantType="sq", calib_data=_calib(4, 16))
    sq = np.asarray(m1.logits(ids))
    assert np.isfinite(sq).all()

    m2 = CausalLM.from_config(dtype=jnp.float32)
    m2.quantize(quant_config=cfg, quantType="awq", calib_data=_calib(4, 16))
    aq = np.asarray(m2.logits(ids))
    assert np.isfinite(aq).all()

    # quantization shouldn't destroy the model: top-1 should still
    # frequently agree with fp on a tiny random model at 4 bits
    assert (aq.argmax(-1) == fp.argmax(-1)).mean() > 0.2


def test_save_load_roundtrip(tmp_path):
    m = CausalLM.from_config(dtype=jnp.float32)
    m.quantize(quant_config={"w_bit": 8, "q_group_size": 32, "version": "fake"},
               quantType="rtn")
    ids = _calib(1, 8)
    a = np.asarray(m.logits(ids))
    d = str(tmp_path / "qlm")
    m.save_quantized(d)
    m2 = CausalLM.from_quantized(d, dtype=jnp.float32)
    b = np.asarray(m2.logits(ids))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_real_w4a16_lm():
    m = CausalLM.from_config(dtype=jnp.float32)
    ids = _calib(1, 8)
    fp = np.asarray(m.logits(ids))
    m.quantize(quant_config={"w_bit": 4, "q_group_size": 32, "version": "real",
                             "zero_point": True}, quantType="rtn")
    q = np.asarray(m.logits(ids))
    assert np.isfinite(q).all()
    # int4 packed execution approximates fp logits direction
    corr = np.corrcoef(fp.reshape(-1), q.reshape(-1))[0, 1]
    assert corr > 0.9, corr


def test_bloom_forward_and_smooth():
    import jax
    from qdm_tpu.models.bloom import BloomForCausalLM, tiny_bloom_config
    from qdm_tpu.models.shims import bloom_scaling_groups
    from qdm_tpu.quant.smooth import smooth_params
    from qdm_tpu.quant.plan import QuantPlan
    from qdm_tpu.calib.stats import flatten_calib
    import dataclasses

    cfg = tiny_bloom_config()
    m = BloomForCausalLM(config=cfg, dtype=jnp.float32)
    ids = jnp.asarray(RNG.integers(0, 256, (2, 8)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), ids)["params"]
    # randomize kernels so smoothing is non-trivial
    base = np.asarray(m.apply({"params": params}, ids))
    assert base.shape == (2, 8, 256)
    assert np.isfinite(base).all()

    mcap = dataclasses.replace(m, plan=QuantPlan(capture_stats=True))
    _, mut = mcap.apply({"params": params}, ids, mutable=["calib"])
    stats = flatten_calib(mut["calib"])
    groups = bloom_scaling_groups(params)
    assert len(groups) == 2 * 3
    # the gelu->fc group has no stats key for the act output; use the
    # fc input stats captured on dense_4h_to_h
    smoothed = smooth_params(params, groups, stats, alpha=0.5)
    out = np.asarray(m.apply({"params": smoothed}, ids))
    np.testing.assert_allclose(out, base, rtol=2e-4, atol=2e-4)


def test_cohere_parallel_residual():
    from qdm_tpu.models.llama import LlamaForCausalLM, tiny_llama_config
    import dataclasses, jax

    cfg = dataclasses.replace(tiny_llama_config(), parallel_residual=True,
                              norm_type="layernorm", tie_word_embeddings=True,
                              logit_scale=0.0625)
    m = LlamaForCausalLM(config=cfg, dtype=jnp.float32)
    ids = jnp.asarray(RNG.integers(0, 256, (1, 8)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), ids)["params"]
    out, _ = m.apply({"params": params}, ids)
    assert out.shape == (1, 8, 256)
    assert np.isfinite(np.asarray(out)).all()
    # no post_attention_layernorm in parallel-residual blocks
    assert "post_attention_layernorm" not in params["layers_0"]


def test_awq_sequential():
    cfg = QuantConfig(w_bit=4, q_group_size=32, version="fake", zero_point=True)
    cfg.calib.n_samples = 2
    m = CausalLM.from_config(dtype=jnp.float32)
    ids = _calib(2, 8)
    fp = np.asarray(m.logits(ids))
    m.quantize(quant_config=cfg, quantType="awq", calib_data=_calib(2, 16),
               sequential=True)
    q = np.asarray(m.logits(ids))
    assert np.isfinite(q).all()
    assert (q.argmax(-1) == fp.argmax(-1)).mean() > 0.2


def test_qwen1_checkpoint_load(tmp_path):
    """Qwen-1 shim: fused-c_attn torch checkpoint loads through the
    rename/split converter and matches a hand-built canonical model
    (reference models/qwen.py architecture)."""
    import json

    from safetensors.numpy import save_file

    h, heads, layers, ffn2, vocab = 32, 4, 2, 128, 64
    r = np.random.default_rng(3)

    def w(*s):
        return r.standard_normal(s).astype(np.float32) * 0.05

    sd = {"transformer.wte.weight": w(vocab, h),
          "transformer.ln_f.weight": np.ones(h, np.float32),
          "lm_head.weight": w(vocab, h)}
    for i in range(layers):
        b = f"transformer.h.{i}."
        sd[b + "ln_1.weight"] = np.ones(h, np.float32)
        sd[b + "ln_2.weight"] = np.ones(h, np.float32)
        sd[b + "attn.c_attn.weight"] = w(3 * h, h)
        sd[b + "attn.c_attn.bias"] = w(3 * h)
        sd[b + "attn.c_proj.weight"] = w(h, h)
        sd[b + "mlp.w1.weight"] = w(ffn2 // 2, h)
        sd[b + "mlp.w2.weight"] = w(ffn2 // 2, h)
        sd[b + "mlp.c_proj.weight"] = w(h, ffn2 // 2)
    save_file(sd, str(tmp_path / "model.safetensors"))
    cfg = {"model_type": "qwen", "vocab_size": vocab, "hidden_size": h,
           "num_hidden_layers": layers, "num_attention_heads": heads,
           "intermediate_size": ffn2, "seq_length": 64,
           "layer_norm_epsilon": 1e-6}
    (tmp_path / "config.json").write_text(json.dumps(cfg))

    lm = CausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    assert lm.config.attention_bias and lm.config.intermediate_size == ffn2 // 2
    ids = (_calib(2, 8) % vocab).astype(np.int32)
    logits = lm.logits(ids)
    assert logits.shape == (2, 8, vocab)
    assert np.isfinite(np.asarray(logits)).all()
    # q/k/v kernels carry the split rows of c_attn (torch (out,in) ->
    # flax (in,out) transpose)
    qk = np.asarray(lm.params["layers_0"]["self_attn"]["q_proj"]["kernel"])
    np.testing.assert_allclose(
        qk, sd["transformer.h.0.attn.c_attn.weight"][:h].T, rtol=1e-6)
    # and the fused-group smoothing path works on the converted tree
    cfg_q = QuantConfig(w_bit=8, a_bit=8, q_group_size=0,
                        weight_quant_type="per_channel", version="fake")
    lm.quantize(quant_config=cfg_q, quantType="sq",
                calib_data=(_calib(2, 8) % vocab).astype(np.int32))
    assert np.isfinite(np.asarray(lm.logits(ids))).all()


def test_attention_delta_diagnostic(tmp_path):
    """debugAttentionMap parity: quantize with debug_attention_path
    writes the attention-prob delta log-histograms."""
    import json as _json

    lm = CausalLM.from_config(dtype=jnp.float32)
    cfg = QuantConfig(w_bit=4, q_group_size=16, version="fake",
                      zero_point=True)
    cfg.calib.n_samples = 2
    lm.quantize(quant_config=cfg, quantType="awq", calib_data=_calib(2, 8),
                debug_attention_path=str(tmp_path))
    rep = _json.loads((tmp_path / "attention_delta.json").read_text())
    assert len(rep["bin_centers"]) == 100
    assert len(rep["log_hist_unscaled"]) == 100
    # w4 quantization must move the attention probs measurably more than
    # zero but the max delta stays within [-1, 1] by construction
    assert 0 <= rep["max_abs_delta_unscaled"] <= 2.0
