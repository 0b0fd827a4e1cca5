"""End-to-end pipeline lifecycle tests on tiny random models:
from_config -> generate -> quantize(rtn/sq/awq) -> generate ->
save_quantized -> from_quantized (reference lifecycle base.py:143-850)."""

import numpy as np
import jax.numpy as jnp
import pytest

from qdm_tpu.api import StableDiffusion1_x, StableDiffusionXL
from qdm_tpu.config import QuantConfig


@pytest.fixture(scope="module")
def pipe():
    return StableDiffusion1_x.from_config(tiny=True, dtype=jnp.float32)


def _gen(p, **kw):
    return p.generate("a cat on a table", num_inference_steps=2, seed=0,
                      height=64, width=64, **kw)


def test_generate_fp(pipe):
    img = _gen(pipe)
    assert img.shape == (1, 16, 16, 3)
    assert np.isfinite(img).all() and img.min() >= 0 and img.max() <= 1


def test_rtn_quantize_generate(pipe):
    import copy

    p = StableDiffusion1_x.from_config(tiny=True, dtype=jnp.float32)
    base = _gen(p)
    p.quantize({"w_bit": 8, "q_group_size": 0, "weight_quant_type": "per_channel",
                "version": "fake"}, quantType="rtn")
    assert p.is_quantized and "unet" in p.quantized_components
    img = _gen(p)
    assert np.isfinite(img).all()
    # 8-bit fake quant barely moves the output
    assert np.abs(img - base).mean() < 0.1


def test_sq_quantize(pipe):
    p = StableDiffusion1_x.from_config(tiny=True, dtype=jnp.float32)
    cfg = QuantConfig(w_bit=8, q_group_size=0, weight_quant_type="per_channel",
                      version="fake", alpha=0.8)
    cfg.calib.n_samples = 2
    cfg.calib.batch_size = 2
    cfg.calib.n_steps = 2
    base = _gen(p)
    p.quantize(cfg, quantType="sq")
    img = _gen(p)
    assert np.isfinite(img).all()
    assert np.abs(img - base).mean() < 0.1


def test_awq_quantize(pipe):
    p = StableDiffusion1_x.from_config(tiny=True, dtype=jnp.float32)
    cfg = QuantConfig(w_bit=4, q_group_size=32, version="fake", zero_point=True)
    cfg.calib.n_samples = 2
    cfg.calib.batch_size = 2
    cfg.calib.n_steps = 2
    p.quantize(cfg, quantType="awq")
    img = _gen(p)
    assert np.isfinite(img).all()


def test_gptq_quantize(pipe):
    """GPTQ on the UNet: dense layers get Hessian-compensated values
    from denoise-step Gram capture, convs the RTN fallback — image
    stays finite and close to fp at w8."""
    p = StableDiffusion1_x.from_config(tiny=True, dtype=jnp.float32)
    cfg = QuantConfig(w_bit=8, q_group_size=32, version="fake",
                      zero_point=True)
    cfg.calib.n_samples = 2
    cfg.calib.batch_size = 2
    cfg.calib.n_steps = 2
    base = _gen(p)
    before = np.asarray(_first_dense_kernel(p.params["unet"]))
    p.quantize(cfg, quantType="gptq")
    after = np.asarray(_first_dense_kernel(p.params["unet"]))
    assert not np.allclose(before, after)
    img = _gen(p)
    assert np.isfinite(img).all()
    assert np.abs(img - base).mean() < 0.1


def _first_dense_kernel(tree):
    if isinstance(tree, dict):
        if "kernel" in tree and getattr(tree["kernel"], "ndim", 0) == 2:
            return tree["kernel"]
        for v in tree.values():
            r = _first_dense_kernel(v)
            if r is not None:
                return r
    return None


def test_sd35_gptq_quantize():
    from qdm_tpu.api import StableDiffusion3_5

    p = StableDiffusion3_5.from_config(tiny=True, dtype=jnp.float32)
    cfg = QuantConfig(w_bit=8, q_group_size=16, version="fake",
                      zero_point=True)
    cfg.calib.n_samples = 2
    cfg.calib.n_steps = 2
    img0 = p.generate("a cube", num_inference_steps=2, seed=0)
    p.quantize(cfg, quantType="gptq", quantUnet=False,
               quantTransformer=True)
    img = p.generate("a cube", num_inference_steps=2, seed=0)
    assert np.isfinite(img).all()
    assert np.abs(img - img0).mean() < 0.1


def test_gptq_real_static_pipeline():
    """GPTQ + version='real': dense layers pack the GPTQ search's own
    codes/scales (w8a8_xla route + calibrated static act scales), convs
    fall through to the shared RTN pack — and the packed image matches
    the fake-gptq image closely (same dequantized values)."""
    p = StableDiffusion1_x.from_config(tiny=True, dtype=jnp.float32)
    base = _gen(p)
    cfg = QuantConfig(w_bit=8, a_bit=8, version="real", quantize_act=True,
                      act_quant_type="static", act_quant_conv_type="static")
    cfg.calib.n_samples = 2
    cfg.calib.batch_size = 2
    cfg.calib.n_steps = 2
    p.quantize(cfg, quantType="gptq")
    found = []

    def walk(t, path=()):
        if isinstance(t, dict):
            if "qweight" in t and not isinstance(t["qweight"], dict):
                found.append((path, t))
                return
            for k, v in t.items():
                walk(v, path + (k,))

    walk(p.params["unet"])
    dense = [(p_, t) for p_, t in found if t["qweight"].ndim == 2
             and t["qweight"].dtype == jnp.int8]
    assert dense, "no gptq-packed dense layers"
    assert any("act_scale" in t and abs(
        float(np.asarray(t["act_scale"])[0]) - 1.0) > 1e-6 for _, t in dense)
    img = _gen(p)
    assert np.isfinite(img).all()
    assert np.abs(img - base).mean() < 0.25


def test_save_load_roundtrip(tmp_path, pipe):
    p = StableDiffusion1_x.from_config(tiny=True, dtype=jnp.float32)
    p.quantize({"w_bit": 8, "q_group_size": 0, "weight_quant_type": "per_channel",
                "version": "fake"}, quantType="rtn")
    img1 = _gen(p)
    d = str(tmp_path / "qmodel")
    p.save_quantized(d)
    p2 = StableDiffusion1_x.from_quantized(d, dtype=jnp.float32)
    img2 = _gen(p2)
    np.testing.assert_allclose(img1, img2, atol=1e-5)


def test_real_w8a8_pipeline():
    p = StableDiffusion1_x.from_config(tiny=True, dtype=jnp.float32)
    base = _gen(p)
    p.quantize({"w_bit": 8, "a_bit": 8, "version": "real", "quantize_act": True},
               quantType="rtn")
    img = _gen(p)
    assert np.isfinite(img).all()
    assert np.abs(img - base).mean() < 0.15


def test_sdxl_tiny_generate():
    p = StableDiffusionXL.from_config(tiny=True, dtype=jnp.float32)
    img = p.generate("a dog", num_inference_steps=2, seed=0, height=64, width=64)
    assert img.shape == (1, 16, 16, 3)
    assert np.isfinite(img).all()


def test_sd35_tiny_generate_and_sq():
    from qdm_tpu.api import StableDiffusion3_5

    p = StableDiffusion3_5.from_config(tiny=True, dtype=jnp.float32)
    img = p.generate("a red cube", num_inference_steps=2, seed=0)
    assert img.shape[0] == 1 and img.shape[-1] == 3
    assert np.isfinite(img).all()

    cfg = QuantConfig(w_bit=8, q_group_size=0, weight_quant_type="per_channel",
                      version="fake", alpha=0.8)
    cfg.calib.n_samples = 2
    cfg.calib.batch_size = 2
    cfg.calib.n_steps = 2
    p.quantize(cfg, quantType="sq", quantUnet=False, quantTransformer=True)
    assert "transformer" in p.quantized_components
    img2 = p.generate("a red cube", num_inference_steps=2, seed=0)
    assert np.isfinite(img2).all()
    assert np.abs(img2 - img).mean() < 0.2


def test_sd35_awq_quantize():
    from qdm_tpu.api import StableDiffusion3_5

    p = StableDiffusion3_5.from_config(tiny=True, dtype=jnp.float32)
    cfg = QuantConfig(w_bit=4, q_group_size=16, version="fake", zero_point=True)
    cfg.calib.n_samples = 2
    cfg.calib.n_steps = 2
    img0 = p.generate("a cube", num_inference_steps=2, seed=0)
    p.quantize(cfg, quantType="awq", quantUnet=False, quantTransformer=True)
    img = p.generate("a cube", num_inference_steps=2, seed=0)
    assert np.isfinite(img).all()


def test_real_w8a8_static_conv_pipeline():
    """version=real with static-scale int8 convs: calibrated act scales
    fill the act_scale leaves and generation stays sane."""
    p = StableDiffusion1_x.from_config(tiny=True, dtype=jnp.float32)
    base = _gen(p)
    cfg = QuantConfig(w_bit=8, a_bit=8, version="real", quantize_act=True,
                      act_quant_conv_type="static")
    cfg.calib.n_samples = 2
    cfg.calib.batch_size = 2
    cfg.calib.n_steps = 2
    p.quantize(cfg, quantType="sq")
    # act_scale params were calibrated (not all ones)
    from qdm_tpu.quant.apply import iter_layers
    scales = []
    def walk(t):
        if isinstance(t, dict):
            if "act_scale" in t and not isinstance(t["act_scale"], dict):
                scales.append(float(np.asarray(t["act_scale"])[0]))
            for v in t.values():
                walk(v)
    walk(p.params["unet"])
    assert scales and any(abs(s - 1.0) > 1e-6 for s in scales)
    img = _gen(p)
    assert np.isfinite(img).all()
    assert np.abs(img - base).mean() < 0.25


def test_real_w8a8_xla_static_pipeline():
    """kernel_backend auto + static act scales routes dense layers to the
    pure-XLA int8 path (w8a8_xla) with calibrated per-tensor scales."""
    p = StableDiffusion1_x.from_config(tiny=True, dtype=jnp.float32)
    base = _gen(p)
    cfg = QuantConfig(w_bit=8, a_bit=8, version="real", quantize_act=True,
                      act_quant_type="static", act_quant_conv_type="static")
    cfg.calib.n_samples = 2
    cfg.calib.batch_size = 2
    cfg.calib.n_steps = 2
    p.quantize(cfg, quantType="sq")
    from qdm_tpu.quant.plan import spec_from_config
    assert spec_from_config(cfg).mode == "w8a8_xla"
    # dense layers carry unpadded int8 qweight + calibrated act_scale
    found = []
    def walk(t, path=()):
        if isinstance(t, dict):
            if "qweight" in t and not isinstance(t["qweight"], dict):
                found.append((path, t))
                return
            for k, v in t.items():
                walk(v, path + (k,))
    walk(p.params["unet"])
    dense = [(p_, t) for p_, t in found if t["qweight"].ndim == 2
             and t["qweight"].dtype == jnp.int8]
    assert dense, "no w8a8_xla dense layers packed"
    assert any("act_scale" in t and abs(float(np.asarray(t["act_scale"])[0]) - 1.0)
               > 1e-6 for _, t in dense)
    img = _gen(p)
    assert np.isfinite(img).all()
    assert np.abs(img - base).mean() < 0.25


def test_rtn_static_capture_only_calibration():
    """RTN (no smoothing) + static int8 acts must still calibrate the
    act scales with a capture-only pass — this is the smoothing
    ablation path (quality_table's 'W8A8-static RTN' row); before the
    fix the scales stayed at the 1.0 placeholder."""
    p = StableDiffusion1_x.from_config(tiny=True, dtype=jnp.float32)
    cfg = QuantConfig(w_bit=8, a_bit=8, version="real", quantize_act=True,
                      act_quant_type="static", act_quant_conv_type="static",
                      weight_quant_type="per_channel", q_group_size=0)
    cfg.calib.n_samples = 2
    cfg.calib.batch_size = 2
    cfg.calib.n_steps = 2
    p.quantize(cfg, quantType="rtn")
    scales = []
    def walk(t):
        if isinstance(t, dict):
            if "act_scale" in t and not isinstance(t["act_scale"], dict):
                scales.append(np.asarray(t["act_scale"]).reshape(-1)[0])
            for v in t.values():
                walk(v)
    walk(p.params["unet"])
    assert scales, "no static act scales found"
    n_placeholder = sum(1 for s in scales if abs(float(s) - 1.0) < 1e-12)
    assert n_placeholder < len(scales) / 2, \
        f"{n_placeholder}/{len(scales)} act scales left at placeholder 1.0"
    img = _gen(p)
    assert np.isfinite(img).all()


def test_sdxl_refiner_generate():
    """SDXL base->refiner handoff (reference loads a refiner pipeline,
    StableDiffusionXL.py:13-17; here it also runs)."""
    p = StableDiffusionXL.from_config(tiny=True, dtype=jnp.float32)
    p.refiner = StableDiffusionXL.tiny_refiner()
    img = p.generate("a dog", num_inference_steps=4, seed=0,
                     use_refiner=True, high_noise_frac=0.5)
    assert img.shape == (1, 16, 16, 3)
    assert np.isfinite(img).all()
    # without the refiner flag the plain path still works
    img2 = p.generate("a dog", num_inference_steps=2, seed=0,
                      height=64, width=64)
    assert np.isfinite(np.asarray(img2)).all()


def test_refiner_rejected_on_sd15(tmp_path):
    p = StableDiffusion1_x.from_config(tiny=True, dtype=jnp.float32)
    import pytest
    with pytest.raises(ValueError, match="no refiner"):
        p._load_refiner(str(tmp_path))


def test_sd35_with_t5_generate():
    """SD3.5 with a tiny T5 third encoder appended to the joint context."""
    import dataclasses
    from qdm_tpu.api import StableDiffusion3_5
    from qdm_tpu.models.t5 import tiny_t5_config

    p = StableDiffusion3_5.from_config(tiny=True, dtype=jnp.float32)
    t5cfg = dataclasses.replace(tiny_t5_config(), d_model=80)  # == joint dim
    p.configs["text_encoder_3"] = t5cfg
    p.components["text_encoder_3"] = None
    # init params for the new component
    m = p._module("text_encoder_3")
    import jax
    params = m.init(jax.random.PRNGKey(9), *p._init_args("text_encoder_3"))["params"]
    p.params["text_encoder_3"] = params
    p.components["text_encoder_3"] = m
    img = p.generate("a cube", num_inference_steps=2, seed=0)
    assert np.isfinite(img).all()


def test_per_step_act_scales(tmp_path):
    """DiTAS-style per-denoise-step static act scales
    (QuantConfig.act_per_step_scales): calibration keeps the per-step
    absmax instead of the reference's mean-over-steps collapse
    (StableDiffusion1_x.py:104-112); the sampler gathers one scalar per
    layer per step.  Covers LUT build, sampling, and the save/load
    round-trip."""
    from qdm_tpu.quant import apply as qapply

    p = StableDiffusion1_x.from_config(tiny=True, dtype=jnp.float32)
    base = _gen(p)
    cfg = QuantConfig(w_bit=8, a_bit=8, version="real", quantize_act=True,
                      act_quant_type="static", act_quant_conv_type="static",
                      act_per_step_scales=True)
    cfg.calib.n_samples = 2
    cfg.calib.batch_size = 2
    cfg.calib.n_steps = 3
    p.quantize(cfg, quantType="sq")
    lut = p.act_scale_luts.get("unet")
    assert lut, "no per-step act-scale LUT built"
    n_lut = next(iter(lut.values())).shape[0]
    assert n_lut == 3
    assert all(v.shape == (3,) for v in lut.values())
    # LUT scales are calibrated (not placeholders) and vary per step
    # for at least some layers (latent magnitude shrinks over the
    # trajectory)
    arrs = np.stack([np.asarray(v) for v in lut.values()])
    assert np.all(arrs > 0)
    assert np.any(np.ptp(arrs, axis=1) > 1e-9)
    img = _gen(p)
    assert np.isfinite(img).all()
    assert np.abs(img - base).mean() < 0.25

    # select_step_act_scales picks the right slice
    some_path = next(iter(lut))
    p0 = qapply.select_step_act_scales(p.params["unet"], lut, 1)
    node = p0
    for k in some_path:
        node = node[k]
    np.testing.assert_allclose(np.asarray(node["act_scale"]),
                               np.asarray(lut[some_path][1:2]))

    # save/load round-trip keeps the LUT and reproduces images
    d = str(tmp_path / "q")
    p.save_quantized(d)
    p2 = StableDiffusion1_x.from_quantized(d, dtype=jnp.float32)
    assert p2.act_scale_luts.get("unet")
    assert set(p2.act_scale_luts["unet"]) == set(lut)
    img2 = _gen(p2)
    np.testing.assert_allclose(np.asarray(img2), np.asarray(img),
                               atol=2e-5)


def test_gptq_smooth_compose_pipeline():
    """smooth=True migrates the UNet's outlier scales BEFORE the Gram
    capture — the composed smooth+gptq diffusion quantizer: runs e2e,
    image finite and close to fp; non-gptq methods reject the flag."""
    p = StableDiffusion1_x.from_config(tiny=True, dtype=jnp.float32)
    base = _gen(p)
    cfg = QuantConfig(w_bit=8, q_group_size=32, version="fake",
                      zero_point=True)
    cfg.calib.n_samples = 2
    cfg.calib.batch_size = 2
    cfg.calib.n_steps = 2
    p.quantize(cfg, quantType="gptq", smooth=True)
    img = _gen(p)
    assert np.isfinite(img).all()
    assert np.abs(img - base).mean() < 0.1

    p2 = StableDiffusion1_x.from_config(tiny=True, dtype=jnp.float32)
    import pytest

    with pytest.raises(ValueError):
        p2.quantize(cfg, quantType="rtn", smooth=True)


def test_vae_slicing_matches_whole_batch(pipe):
    """enable_vae_slicing decodes in sub-batches with identical output
    (diffusers parity; bounds the 1024px decoder activation peak), for
    both the sync fetch path and the async/batched path."""
    prompts = ["a cat", "a dog", "a fox"]
    base = pipe.generate(prompts, num_inference_steps=2, seed=0,
                         height=64, width=64, output_type="u8")
    pipe.enable_vae_slicing(1)
    try:
        sliced = pipe.generate(prompts, num_inference_steps=2, seed=0,
                               height=64, width=64, output_type="u8")
        np.testing.assert_array_equal(np.asarray(base), np.asarray(sliced))
        outs = pipe.generate_batches([prompts], num_inference_steps=2,
                                     seed=0, height=64, width=64)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(outs[0]))
    finally:
        pipe.disable_vae_slicing()
