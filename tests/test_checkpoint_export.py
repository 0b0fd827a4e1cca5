"""Ecosystem checkpoint EXPORT: qdm_tpu packed weights -> AutoAWQ /
AutoGPTQ on-disk formats, round-tripped through this framework's own
importers (which are themselves tested against synthetic reference
checkpoints in test_autoawq_interop.py / test_autogptq_interop.py).

The export contract: integer codes and zero points are bit-exact
through the round trip; scales pass through ``scale_dtype`` (fp16 by
ecosystem convention, np.float32 for lossless)."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.models.llama import tiny_llama_config
from qdm_tpu.quant.packing import (apply_awq_order, canonical_to_awq,
                                   dequantize_gemm, dequantize_gptq,
                                   pack_awq_layout, pack_gptq_layout,
                                   reverse_awq_order, unpack_awq_layout,
                                   unpack_gptq_layout)

RNG = np.random.default_rng(11)


# ---------------------------------------------------------------- pack math


def test_awq_pack_unpack_bijection():
    iw = jnp.asarray(RNG.integers(0, 16, (64, 32)), jnp.int32)
    iz = jnp.asarray(RNG.integers(0, 16, (2, 32)), jnp.int32)
    qw, qz, _ = canonical_to_awq(iw, iz, jnp.ones((2, 32)))
    uw, uz = unpack_awq_layout(qw, qz, 4)
    uw, uz = reverse_awq_order(uw, uz, 4)
    assert jnp.array_equal(uw, iw) and jnp.array_equal(uz, iz)


def test_awq_order_roundtrip():
    iw = jnp.asarray(RNG.integers(0, 16, (8, 16)), jnp.int32)
    fw, _ = apply_awq_order(iw, None)
    bw, _ = reverse_awq_order(fw, None)
    assert jnp.array_equal(bw, iw)


@pytest.mark.parametrize("plus_one", [True, False])
def test_gptq_pack_unpack_bijection(plus_one):
    iw = jnp.asarray(RNG.integers(0, 16, (64, 32)), jnp.int32)
    iz = jnp.asarray(RNG.integers(1, 16, (2, 32)), jnp.int32)
    qw, qz = pack_gptq_layout(iw, iz, plus_one=plus_one)
    uw, uz = unpack_gptq_layout(qw, qz, 4, plus_one=plus_one)
    assert jnp.array_equal(uw, iw) and jnp.array_equal(uz, iz)


def test_gptq_legacy_refuses_zero_zero_points():
    iw = jnp.zeros((32, 8), jnp.int32)
    iz = jnp.zeros((1, 8), jnp.int32)  # zero point 0: -1 would wrap
    with pytest.raises(ValueError, match="gptq_v2"):
        pack_gptq_layout(iw, iz, plus_one=True)
    pack_gptq_layout(iw, iz, plus_one=False)  # v2 is fine


# ---------------------------------------------------------------- fixtures


def _quantized_tiny(zero_point=True, fuse=False, seed=0):
    lm = CausalLM.from_config(tiny_llama_config(), dtype=jnp.float32,
                              seed=seed)
    qc = {"w_bit": 4, "q_group_size": 32, "version": "real",
          "zero_point": zero_point}
    if fuse:
        qc["fuse_projections"] = True
    lm.quantize(quant_config=qc, quantType="rtn")
    return lm


def _greedy(lm, ids):
    return np.asarray(lm.generate(ids, max_new_tokens=8))


def _fp_shapes(lm):
    """fp param template (true kernel shapes; the packed model's own
    template carries padded buffers)."""
    import jax
    from qdm_tpu.models import llama as llama_lib

    fp = llama_lib.LlamaForCausalLM(config=lm.config, dtype=lm.dtype)
    return jax.eval_shape(
        lambda: fp.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8), jnp.int32)))["params"]


IDS = np.asarray(RNG.integers(0, 256, (2, 9)))


# ---------------------------------------------------------------- AutoAWQ


def test_autoawq_export_roundtrip(tmp_path):
    """Export -> reimport: codes/zeros bit-exact, logits equal (f32
    scales), and the exported tensors dequantize (via the ecosystem's
    own dequantize_gemm semantics) to the packed module's kernels."""
    from qdm_tpu.quant.apply import unpack_params, iter_layers
    import jax

    lm = _quantized_tiny()
    d = str(tmp_path / "awq")
    lm.save_quantized_autoawq(d, scale_dtype=np.float32)
    assert os.path.exists(os.path.join(d, "model.safetensors"))
    with open(os.path.join(d, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["quantization_config"]["quant_method"] == "awq"
    assert cfg["quantization_config"]["group_size"] == 32

    back = CausalLM.from_quantized_autoawq(d, dtype=jnp.float32)
    # packed buffers bit-equal after the importer's conversion
    q0 = lm.params["layers_0"]["self_attn"]["q_proj"]
    q1 = back.params["layers_0"]["self_attn"]["q_proj"]
    assert jnp.array_equal(q0["qweight"], q1["qweight"])
    assert jnp.array_equal(q0["zeros"], q1["zeros"])
    assert jnp.allclose(q0["scales"], q1["scales"])
    assert np.array_equal(_greedy(lm, IDS), _greedy(back, IDS))

    # ecosystem dequant semantics: dequantize_gemm(exported) == the
    # packed module's own dequantized kernel values
    from safetensors.numpy import load_file
    sd = load_file(os.path.join(d, "model.safetensors"))
    fp = unpack_params(lm.params, lm.plan, _fp_shapes(lm))
    name = "model.layers.0.self_attn.q_proj"
    kern = dequantize_gemm(jnp.asarray(sd[name + ".qweight"]),
                           jnp.asarray(sd[name + ".qzeros"]),
                           jnp.asarray(sd[name + ".scales"]),
                           group_size=32)
    want = fp["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert jnp.allclose(kern, want, atol=1e-6)


def test_autoawq_export_fp16_scales_reexport_fixed_point(tmp_path):
    """Default fp16 scales: one round trip reaches a fixed point —
    export(import(export(x))) is tensor-identical to export(x)."""
    from safetensors.numpy import load_file

    lm = _quantized_tiny(seed=2)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    lm.save_quantized_autoawq(d1)
    back = CausalLM.from_quantized_autoawq(d1, dtype=jnp.float32)
    back.save_quantized_autoawq(d2)
    s1 = load_file(os.path.join(d1, "model.safetensors"))
    s2 = load_file(os.path.join(d2, "model.safetensors"))
    assert set(s1) == set(s2)
    for k in s1:
        assert np.array_equal(s1[k], s2[k]), k


def test_autoawq_export_symmetric_zeros(tmp_path):
    """Symmetric (narrow-range) packing exports explicit zero points of
    8 — the +8 bias pack_linear_int4 applies — so ecosystem dequant is
    still exact."""
    lm = _quantized_tiny(zero_point=False)
    layer = lm.params["layers_0"]["self_attn"]["q_proj"]
    assert "zeros" not in layer
    d = str(tmp_path / "sym")
    lm.save_quantized_autoawq(d, scale_dtype=np.float32)
    from safetensors.numpy import load_file
    sd = load_file(os.path.join(d, "model.safetensors"))
    qz = sd["model.layers.0.self_attn.q_proj.qzeros"]
    iw, iz = unpack_awq_layout(jnp.asarray(qz), jnp.asarray(qz), 4)
    assert jnp.all(iz == 8)
    back = CausalLM.from_quantized_autoawq(d, dtype=jnp.float32)
    assert np.array_equal(_greedy(lm, IDS), _greedy(back, IDS))


def test_autoawq_export_splits_fused_projections(tmp_path):
    """A fuse_projections plan exports per-projection q/k/v and
    gate/up entries (column slices are exact: codes/scales/zeros are
    per-output-column), so the checkpoint loads as a standard unfused
    AutoAWQ model with identical greedy tokens."""
    lm = _quantized_tiny(fuse=True)
    assert "qkv_proj" in lm.params["layers_0"]["self_attn"]
    d = str(tmp_path / "fused")
    lm.save_quantized_autoawq(d, scale_dtype=np.float32)
    from safetensors.numpy import load_file
    sd = load_file(os.path.join(d, "model.safetensors"))
    for sub in ("q_proj", "k_proj", "v_proj"):
        assert f"model.layers.0.self_attn.{sub}.qweight" in sd
    assert "model.layers.0.mlp.gate_proj.qweight" in sd
    assert not any("qkv_proj" in k or "gate_up_proj" in k for k in sd)
    back = CausalLM.from_quantized_autoawq(d, dtype=jnp.float32)
    assert np.array_equal(_greedy(lm, IDS), _greedy(back, IDS))


# ---------------------------------------------------------------- AutoGPTQ


@pytest.mark.parametrize("fmt", ["gptq_v2", "gptq"])
def test_autogptq_export_roundtrip(tmp_path, fmt):
    lm = _quantized_tiny()
    d = str(tmp_path / fmt)
    lm.save_quantized_autogptq(d, checkpoint_format=fmt,
                               scale_dtype=np.float32)
    with open(os.path.join(d, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["quantization_config"]["checkpoint_format"] == fmt
    back = CausalLM.from_quantized_autogptq(d, dtype=jnp.float32)
    q0 = lm.params["layers_0"]["mlp"]["down_proj"]
    q1 = back.params["layers_0"]["mlp"]["down_proj"]
    assert jnp.array_equal(q0["qweight"], q1["qweight"])
    assert jnp.array_equal(q0["zeros"], q1["zeros"])
    assert np.array_equal(_greedy(lm, IDS), _greedy(back, IDS))


def test_autogptq_export_dequant_semantics(tmp_path):
    """dequantize_gptq over the exported tensors reproduces the packed
    module's dequantized kernel values (the values any GPTQ kernel
    computes with)."""
    from qdm_tpu.quant.apply import unpack_params
    import jax
    from safetensors.numpy import load_file

    lm = _quantized_tiny(seed=5)
    d = str(tmp_path / "g")
    lm.save_quantized_autogptq(d, scale_dtype=np.float32)
    sd = load_file(os.path.join(d, "model.safetensors"))
    fp = unpack_params(lm.params, lm.plan, _fp_shapes(lm))
    name = "model.layers.1.mlp.up_proj"
    kern = dequantize_gptq(jnp.asarray(sd[name + ".qweight"]),
                           jnp.asarray(sd[name + ".qzeros"]),
                           jnp.asarray(sd[name + ".scales"]),
                           g_idx=sd[name + ".g_idx"],
                           group_size=32, plus_one=False)
    want = fp["layers_1"]["mlp"]["up_proj"]["kernel"]
    assert jnp.allclose(kern, want, atol=1e-6)


def test_export_rejects_non_int4_modes():
    lm = CausalLM.from_config(tiny_llama_config(), dtype=jnp.float32)
    lm.quantize(quant_config={"w_bit": 8, "a_bit": 8, "version": "real",
                              "quantize_act": True,
                              "act_quant_type": "per_token"},
                quantType="rtn")
    with pytest.raises(ValueError, match="4-bit"):
        lm.save_quantized_autoawq("/tmp/nope_export")
