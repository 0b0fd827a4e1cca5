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
