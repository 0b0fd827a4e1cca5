"""Model + quant-plan integration tests on tiny random configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qdm_tpu.models import (
    UNet2DCondition, tiny_unet_config,
    CLIPTextModel, tiny_clip_config,
    AutoencoderKL, tiny_vae_config,
)
from qdm_tpu.quant.plan import LayerQuantSpec, QuantPlan
from qdm_tpu.quant.apply import (
    fake_quantize_params, pack_params, iter_layers, quantized_param_count)
from qdm_tpu.calib.stats import flatten_calib

KEY = jax.random.PRNGKey(0)
RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = tiny_unet_config()
    m = UNet2DCondition(config=cfg, dtype=jnp.float32)
    x = jax.random.normal(KEY, (1, 8, 8, 4))
    t = jnp.array([10])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 32))
    params = m.init(jax.random.PRNGKey(2), x, t, ctx)["params"]
    return m, params, (x, t, ctx)


def test_unet_forward_shapes(tiny_unet):
    m, params, (x, t, ctx) = tiny_unet
    out = m.apply({"params": params}, x, t, ctx)
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_fake_quant_w8_small_delta(tiny_unet):
    m, params, (x, t, ctx) = tiny_unet
    plan = QuantPlan(default=LayerQuantSpec(mode="fake", w_bits=8, group_size=0,
                                            weight_quant="per_channel"))
    qparams = fake_quantize_params(params, plan)
    base = np.asarray(m.apply({"params": params}, x, t, ctx))
    qout = np.asarray(m.apply({"params": qparams}, x, t, ctx))
    # W8 per-channel quantization barely changes outputs
    rel = np.abs(qout - base).max() / (np.abs(base).max() + 1e-9)
    assert 0 < rel < 0.05, rel


def test_fake_quant_changed_only_kernels(tiny_unet):
    _, params, _ = tiny_unet
    plan = QuantPlan(default=LayerQuantSpec(mode="fake", w_bits=4, group_size=0,
                                            weight_quant="per_channel"))
    qparams = fake_quantize_params(params, plan)
    n_changed = 0
    for (pa, la), (pb, lb) in zip(iter_layers(params), iter_layers(qparams)):
        assert pa == pb
        if not np.array_equal(np.asarray(la["kernel"]), np.asarray(lb["kernel"])):
            n_changed += 1
        if "bias" in la:
            np.testing.assert_array_equal(np.asarray(la["bias"]), np.asarray(lb["bias"]))
    assert n_changed > 10


def test_plan_exclusion(tiny_unet):
    _, params, _ = tiny_unet
    plan = QuantPlan(
        default=LayerQuantSpec(mode="fake", w_bits=4, group_size=0,
                               weight_quant="per_channel"),
        rules=(("conv_out", LayerQuantSpec(mode="none")),),
    )
    counts = quantized_param_count(params, plan)
    assert counts.get("none", 0) >= 1
    qparams = fake_quantize_params(params, plan)
    np.testing.assert_array_equal(np.asarray(params["conv_out"]["kernel"]),
                                  np.asarray(qparams["conv_out"]["kernel"]))


def test_calib_capture(tiny_unet):
    m_base, params, (x, t, ctx) = tiny_unet
    plan = QuantPlan(capture_stats=True)
    m = UNet2DCondition(config=m_base.config, dtype=jnp.float32, plan=plan)
    out, mut = m.apply({"params": params}, x, t, ctx, mutable=["calib"])
    stats = flatten_calib(mut["calib"])
    assert len(stats) > 20
    # every captured stat is a per-channel nonneg vector
    for k, v in stats.items():
        assert v.ndim == 1 and float(v.min()) >= 0
    # attn1 q/k/v share one input -> identical stats
    qk = [k for k in stats if k.endswith("attn1/to_q")][0]
    kk = qk.replace("to_q", "to_k")
    np.testing.assert_allclose(np.asarray(stats[qk]), np.asarray(stats[kk]))


def test_packed_dense_matches_fake(tiny_unet):
    """w4a16 packed execution == fake-quant execution (same math)."""
    from qdm_tpu.models.layers import QDense
    spec_fake = LayerQuantSpec(mode="fake", w_bits=4, group_size=32,
                               zero_point=True, weight_quant="group")
    spec_real = LayerQuantSpec(mode="w4a16", w_bits=4, group_size=32,
                               zero_point=True)
    x = jax.random.normal(KEY, (5, 64), jnp.float32)
    dense = QDense(48, dtype=jnp.float32, plan=QuantPlan(default=spec_fake))
    params = dense.init(jax.random.PRNGKey(3), x)["params"]
    fq = fake_quantize_params(params, QuantPlan(default=spec_fake))
    out_fake = dense.apply({"params": fq}, x)

    packed = pack_params(params, QuantPlan(default=spec_real))
    dense_real = QDense(48, dtype=jnp.float32, plan=QuantPlan(default=spec_real))
    out_real = dense_real.apply({"params": packed}, x)
    np.testing.assert_allclose(np.asarray(out_real), np.asarray(out_fake),
                               rtol=1e-4, atol=1e-4)


def test_clip_text_forward():
    cfg = tiny_clip_config()
    m = CLIPTextModel(config=cfg, dtype=jnp.float32)
    ids = jnp.array([[5, 9, 2, 0, 0, 0, 0, 0]])
    params = m.init(KEY, ids)["params"]
    last, penult, pooled = m.apply({"params": params}, ids)
    assert last.shape == (1, 8, 32)
    assert penult.shape == (1, 8, 32)
    assert pooled.shape == (1, 32)


def test_vae_decode():
    cfg = tiny_vae_config()
    m = AutoencoderKL(config=cfg, dtype=jnp.float32)
    z = jax.random.normal(KEY, (1, 4, 4, 4))
    params = m.init(jax.random.PRNGKey(5), z, method=m.decode)["params"]
    img = m.apply({"params": params}, z, method=m.decode)
    assert img.shape == (1, 8, 8, 3)


def test_t5_encoder_forward():
    from qdm_tpu.models.t5 import T5Encoder, tiny_t5_config

    cfg = tiny_t5_config()
    m = T5Encoder(config=cfg, dtype=jnp.float32)
    ids = jnp.array([[3, 7, 1, 0, 0, 0, 0, 0]])
    params = m.init(KEY, ids)["params"]
    out = m.apply({"params": params}, ids)
    assert out.shape == (1, 8, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_mmdit_forward_and_quant():
    from qdm_tpu.models.mmdit import MMDiT, tiny_mmdit_config

    cfg = tiny_mmdit_config()
    m = MMDiT(config=cfg, dtype=jnp.float32)
    lat = jax.random.normal(KEY, (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 80))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    t = jnp.array([500.0, 100.0])
    params = m.init(jax.random.PRNGKey(3), lat, t, ctx, pooled)["params"]
    out = m.apply({"params": params}, lat, t, ctx, pooled)
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()

    plan = QuantPlan(default=LayerQuantSpec(mode="fake", w_bits=8, group_size=0,
                                            weight_quant="per_channel"))
    qp = fake_quantize_params(params, plan)
    qout = m.apply({"params": qp}, lat, t, ctx, pooled)
    rel = np.abs(np.asarray(qout) - np.asarray(out)).max() / (np.abs(np.asarray(out)).max() + 1e-9)
    assert 0 < rel < 0.1, rel


def test_mmdit_fused_qkv_equivalence():
    """fuse_qkv_params + plan.fuse_qkv reproduces the unfused MMDiT
    joint attention exactly (incl. the projection biases)."""
    from qdm_tpu.models.mmdit import MMDiT, tiny_mmdit_config
    from qdm_tpu.quant.apply import fuse_qkv_params, unfuse_qkv_params

    cfg = tiny_mmdit_config()
    m = MMDiT(config=cfg, dtype=jnp.float32)
    lat = jax.random.normal(KEY, (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 80))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    t = jnp.array([500.0, 100.0])
    params = m.init(jax.random.PRNGKey(3), lat, t, ctx, pooled)["params"]
    out = m.apply({"params": params}, lat, t, ctx, pooled)

    fused = fuse_qkv_params(params)
    mf = MMDiT(config=cfg, dtype=jnp.float32, plan=QuantPlan(fuse_qkv=True))
    out_f = mf.apply({"params": fused}, lat, t, ctx, pooled)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out),
                               rtol=1e-5, atol=1e-5)

    # round trip back to the canonical save layout
    back = unfuse_qkv_params(fused)
    out_b = m.apply({"params": back}, lat, t, ctx, pooled)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out),
                               rtol=1e-6, atol=1e-6)


def test_mmdit_adaln_smooth_invariance():
    from qdm_tpu.models.mmdit import MMDiT, tiny_mmdit_config
    from qdm_tpu.models.shims import sd3_scaling_groups
    from qdm_tpu.quant.smooth import smooth_params

    cfg = tiny_mmdit_config()
    plan_cap = QuantPlan(capture_stats=True)
    m = MMDiT(config=cfg, dtype=jnp.float32)
    mcap = MMDiT(config=cfg, dtype=jnp.float32, plan=plan_cap)
    lat = jax.random.normal(KEY, (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 80))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    t = jnp.array([500.0, 100.0])
    params = m.init(jax.random.PRNGKey(3), lat, t, ctx, pooled)["params"]
    base = np.asarray(m.apply({"params": params}, lat, t, ctx, pooled))
    _, mut = mcap.apply({"params": params}, lat, t, ctx, pooled, mutable=["calib"])
    stats = flatten_calib(mut["calib"])
    groups = sd3_scaling_groups(params)
    assert len(groups) >= 6
    smoothed = smooth_params(params, groups, stats, alpha=0.8)
    out = np.asarray(m.apply({"params": smoothed}, lat, t, ctx, pooled))
    np.testing.assert_allclose(out, base, rtol=5e-4, atol=5e-4)


def test_fuse_qkv_equivalence(tiny_unet):
    """Fused-QKV execution must match unfused (fused_utils.py parity)."""
    import dataclasses
    from qdm_tpu.quant.apply import fuse_qkv_params, unfuse_qkv_params

    m, params, (x, t, ctx) = tiny_unet
    base = np.asarray(m.apply({"params": params}, x, t, ctx))
    fused = fuse_qkv_params(params)
    mf = dataclasses.replace(m, plan=QuantPlan(fuse_qkv=True))
    out = np.asarray(mf.apply({"params": fused}, x, t, ctx))
    np.testing.assert_allclose(out, base, rtol=2e-5, atol=2e-5)

    # roundtrip back to canonical layout
    unfused = unfuse_qkv_params(fused)
    out2 = np.asarray(m.apply({"params": unfused}, x, t, ctx))
    np.testing.assert_allclose(out2, base, rtol=2e-5, atol=2e-5)


def test_w8a8_conv_matches_fp_approx():
    from qdm_tpu.models.layers import QConv
    spec = LayerQuantSpec(mode="w8a8", w_bits=8, a_bits=8, quantize_act=True)
    x = jax.random.normal(KEY, (2, 8, 8, 16), jnp.float32)
    conv = QConv(24, (3, 3), 1, 1, dtype=jnp.float32, plan=QuantPlan())
    params = conv.init(jax.random.PRNGKey(1), x)["params"]
    fp = np.asarray(conv.apply({"params": params}, x))
    packed = pack_params({"c": params}, QuantPlan(default=spec))["c"]
    qconv = QConv(24, (3, 3), 1, 1, dtype=jnp.float32, plan=QuantPlan(default=spec))
    q = np.asarray(qconv.apply({"params": packed}, x))
    rel = np.abs(q - fp).max() / (np.abs(fp).max() + 1e-9)
    assert rel < 0.1, rel


def test_fuse_ln_equivalence(tiny_unet):
    """plan.fuse_ln must not change outputs (LN folded into kernels on
    TPU, applied explicitly on CPU)."""
    import dataclasses

    m, params, (x, t, ctx) = tiny_unet
    base = np.asarray(m.apply({"params": params}, x, t, ctx))
    mf = dataclasses.replace(m, plan=QuantPlan(fuse_ln=True))
    out = np.asarray(mf.apply({"params": params}, x, t, ctx))
    np.testing.assert_allclose(out, base, rtol=2e-5, atol=2e-5)


def test_w8a8_ln_fused_kernel():
    from qdm_tpu.ops.quant_matmul import (w8a8_matmul_fused_epi,
                                          quantize_act_per_token_int,
                                          w8a8_matmul_ref, pack_linear_int8)

    m, k, n = 24, 128, 128
    w = (RNG.standard_normal((k, n)) * 0.05).astype(np.float32)
    wc = np.clip(np.round(w / (np.abs(w).max(0, keepdims=True) / 127)),
                 -128, 127).astype(np.int8)
    w_i8, ws = pack_linear_int8(jnp.asarray(wc), jnp.asarray(np.abs(w).max(0) / 127))
    bias = jnp.zeros((1, n), jnp.float32)
    ln = (jnp.asarray(RNG.uniform(0.5, 2.0, k), jnp.float32),
          jnp.asarray(RNG.standard_normal(k) * 0.1, jnp.float32))
    x = jnp.asarray(RNG.standard_normal((m, k)), jnp.float32)
    got = np.asarray(w8a8_matmul_fused_epi(x, w_i8, ws, bias, ln=ln,
                                           out_dtype=jnp.float32, interpret=True))
    # reference: explicit LN then int8 matmul
    xf = np.asarray(x)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    xn = (xf - mu) / np.sqrt(var + 1e-5) * np.asarray(ln[0]) + np.asarray(ln[1])
    xi, xs = quantize_act_per_token_int(jnp.asarray(xn, jnp.float32), 8)
    want = np.asarray(w8a8_matmul_ref(xi, w_i8, xs, ws, out_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_groupnorm_near_constant_no_nan():
    """One-pass E[x^2]-mean^2 cancellation clamp (round-3 advisor
    low): near-constant large-magnitude inputs must not NaN."""
    from qdm_tpu.models.layers import GroupNorm

    gn = GroupNorm(num_groups=4, dtype=jnp.float32)
    x = jnp.full((2, 8, 8, 32), 1e4, jnp.float32)
    x = x + jax.random.normal(jax.random.PRNGKey(0), x.shape) * 1e-3
    v = gn.init(jax.random.PRNGKey(1), x)
    out = gn.apply(v, x)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_w8a8_conv_static_channel_beats_per_tensor():
    """Per-input-channel static conv act quant (scales folded into the
    weights at pack time — reference fake_quant.py:123-131 made
    static): on activations with a wide per-channel dynamic range (the
    VAE-decoder regime, BENCH_NOTES round 2) it must stay accurate
    where the per-tensor scheme collapses."""
    from qdm_tpu.models.layers import QConv

    cin, cout = 16, 24
    x = jax.random.normal(KEY, (2, 8, 8, cin), jnp.float32)
    # channel c spans ~4 orders of magnitude, and the weights
    # counteract it (the trained-network regime: every channel
    # contributes comparably to the output, so per-tensor act quant
    # zeroing the small channels destroys real signal)
    chan_scale = jnp.logspace(-2, 2, cin)
    x = x * chan_scale[None, None, None, :]
    conv = QConv(cout, (3, 3), 1, 1, dtype=jnp.float32, plan=QuantPlan())
    params = conv.init(jax.random.PRNGKey(1), x)["params"]
    params = dict(params, kernel=params["kernel"]
                  / chan_scale[None, None, :, None])
    fp = np.asarray(conv.apply({"params": params}, x))
    stats = {"c": jnp.max(jnp.abs(x.reshape(-1, cin)), axis=0)}

    def run(act_quant):
        spec = LayerQuantSpec(mode="w8a8", w_bits=8, a_bits=8,
                              quantize_act=True, act_quant=act_quant)
        plan = QuantPlan(default=spec)
        packed = pack_params({"c": params}, plan, act_stats=stats)["c"]
        if act_quant == "static":
            from qdm_tpu.quant.apply import fill_static_act_scales
            packed = fill_static_act_scales({"c": packed}, stats)["c"]
        qconv = QConv(cout, (3, 3), 1, 1, dtype=jnp.float32, plan=plan)
        q = np.asarray(qconv.apply({"params": packed}, x))
        return np.abs(q - fp).max() / (np.abs(fp).max() + 1e-9)

    rel_pt = run("static")           # per-tensor static
    rel_pc = run("static_channel")   # per-channel static (folded)
    assert rel_pc < 0.05, rel_pc
    assert rel_pc < rel_pt / 5, (rel_pc, rel_pt)


def test_w8a8_conv_static_channel_missing_stats_warns():
    import warnings
    from qdm_tpu.models.layers import QConv

    spec = LayerQuantSpec(mode="w8a8", w_bits=8, a_bits=8,
                          quantize_act=True, act_quant="static_channel")
    x = jax.random.normal(KEY, (1, 4, 4, 8), jnp.float32)
    conv = QConv(8, (3, 3), 1, 1, dtype=jnp.float32, plan=QuantPlan())
    params = conv.init(jax.random.PRNGKey(0), x)["params"]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pack_params({"c": params}, QuantPlan(default=spec))
    assert any("static_channel" in str(x.message) for x in w)


def test_mmdit_pad_mask_restores_unaligned_numerics():
    """mask_ctx_pad=True: the padded-and-masked forward must equal the
    reference's UNALIGNED run (pad_align=1 — no padding at all) on the
    image output, because masked pad keys contribute exactly zero to
    every real softmax and all other ops are row-local (VERDICT r4
    missing #4).  Also: the mask must be load-bearing (attended pad
    deviates)."""
    import dataclasses

    from qdm_tpu.models.mmdit import MMDiT, tiny_mmdit_config

    cfg = tiny_mmdit_config()
    rng = np.random.default_rng(29)
    b, hw, c = 2, cfg.sample_size, cfg.in_channels
    # ctx length chosen so n_img (16) + S (9) = 25 is NOT 128-aligned
    lat = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 9, cfg.joint_attention_dim)),
                      jnp.float32)
    pool = jnp.asarray(rng.standard_normal((b, cfg.pooled_projection_dim)),
                       jnp.float32)
    t = jnp.asarray([3.0, 7.0], jnp.float32)

    m_ref = MMDiT(config=dataclasses.replace(cfg, pad_align=1),
                  dtype=jnp.float32)
    params = m_ref.init(jax.random.PRNGKey(0), lat, t, ctx, pool)["params"]
    ref = m_ref.apply({"params": params}, lat, t, ctx, pool)

    m_mask = MMDiT(config=cfg, dtype=jnp.float32)  # mask is the default
    got = m_mask.apply({"params": params}, lat, t, ctx, pool)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    m_pad = MMDiT(config=dataclasses.replace(cfg, mask_ctx_pad=False),
                  dtype=jnp.float32)                # attended pad
    other = m_pad.apply({"params": params}, lat, t, ctx, pool)
    assert np.abs(np.asarray(other) - np.asarray(ref)).max() > 1e-5
