"""Golden tests for the RTN / pseudo-quant math.

Each test checks the JAX implementation against an independent numpy
transcription of the reference formulas (fake_quant.py:21-167,
quantizer.py:163-198) on random tensors, plus tiny hand-computed cases.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qdm_tpu.quant import (
    quantize_weight_absmax,
    quantize_weight_per_channel_absmax,
    quantize_weight_per_tensor_absmax,
    quantize_activation_per_token_absmax,
    quantize_activation_per_tensor_absmax,
    quantize_activation_per_channel_absmax,
    quantize_activation_per_channel_group_absmax,
    resolve_group_size,
    pseudo_quantize_tensor,
    quantize_tensor,
    dequantize_tensor,
)

RNG = np.random.default_rng(0)


def np_group_absmax(w, n_bits, group_size):
    """numpy transcription of fake_quant.py:21-84 (no codebook)."""
    org = w.shape
    g = group_size
    if g > 0:
        while org[-1] % g != 0:
            g -= 32
        w = w.reshape(-1, g)
    scales = np.clip(np.abs(w).max(-1, keepdims=True), 1e-5, None) / (2 ** (n_bits - 1) - 1)
    return (np.round(w / scales) * scales).reshape(org)


@pytest.mark.parametrize("n_bits,group_size,in_f", [(8, 0, 64), (8, 128, 256), (4, 128, 320), (4, 64, 192)])
def test_group_absmax_matches_reference_formula(n_bits, group_size, in_f):
    w = RNG.standard_normal((48, in_f)).astype(np.float32)
    got = np.asarray(quantize_weight_absmax(jnp.asarray(w), n_bits, group_size))
    want = np_group_absmax(w, n_bits, group_size)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_group_autoshrink_quirk():
    # 320 % 128 != 0 -> shrink to 96 (320%96!=0) -> 64 (320%64==0)
    assert resolve_group_size(320, 128) == 64
    assert resolve_group_size(256, 128) == 128
    assert resolve_group_size(192, 128) == 96


def test_group_absmax_hand_case():
    # one group of 4, n_bits=3 => q_max=3. scale = 8/3.
    w = jnp.array([[8.0, -8.0, 4.0, 1.0]])
    got = np.asarray(quantize_weight_absmax(w, n_bits=3, group_size=0))
    s = 8.0 / 3.0
    np.testing.assert_allclose(got, np.round(np.array([[8, -8, 4, 1]]) / s) * s, rtol=1e-6)


def test_per_channel_per_tensor():
    w = RNG.standard_normal((16, 32)).astype(np.float32)
    got = np.asarray(quantize_weight_per_channel_absmax(jnp.asarray(w), 8))
    scales = np.clip(np.abs(w).max(-1, keepdims=True), 1e-5, None) / 127
    np.testing.assert_allclose(got, np.round(w / scales) * scales, rtol=1e-6)

    got_t = np.asarray(quantize_weight_per_tensor_absmax(jnp.asarray(w), 8))
    s = np.abs(w).max() / 127
    np.testing.assert_allclose(got_t, np.round(w / s) * s, rtol=1e-6)


def test_act_per_token():
    t = RNG.standard_normal((2, 5, 32)).astype(np.float32)
    got = np.asarray(quantize_activation_per_token_absmax(jnp.asarray(t), 8))
    flat = t.reshape(-1, 32)
    scales = np.clip(np.abs(flat).max(-1, keepdims=True), 1e-5, None) / 127
    want = (np.round(flat / scales) * scales).reshape(t.shape)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_act_per_tensor():
    t = RNG.standard_normal((2, 5, 32)).astype(np.float32)
    got = np.asarray(quantize_activation_per_tensor_absmax(jnp.asarray(t), 8))
    s = np.abs(t).max() / 127
    np.testing.assert_allclose(got, np.round(t / s) * s, rtol=1e-6)


def test_act_per_channel_conv_nhwc():
    # NHWC; reference (fake_quant.py:123-131) reduces spatial dims per (N, C)
    t = RNG.standard_normal((2, 8, 8, 16)).astype(np.float32)
    got = np.asarray(quantize_activation_per_channel_absmax(jnp.asarray(t), 8))
    scales = np.clip(np.abs(t).max(axis=(1, 2), keepdims=True), 1e-5, None) / 127
    np.testing.assert_allclose(got, np.round(t / scales) * scales, rtol=1e-6)


def test_act_spatial_group():
    t = RNG.standard_normal((1, 8, 8, 4)).astype(np.float32)
    got = np.asarray(quantize_activation_per_channel_group_absmax(jnp.asarray(t), group_size=4, n_bits=8))
    # group 4x4 patches
    r = t.reshape(1, 2, 4, 2, 4, 4)
    scales = np.clip(np.abs(r).max(axis=(2, 4), keepdims=True), 1e-5, None) / 127
    want = (np.round(r / scales) * scales).reshape(t.shape)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def np_pseudo_quant(w, n_bits, group_size, zero_point):
    """numpy transcription of quantizer.py:163-198."""
    org = w.shape
    g = group_size if group_size > 0 else org[-1]
    w = w.reshape(-1, g)
    if zero_point:
        mx, mn = w.max(1, keepdims=True), w.min(1, keepdims=True)
        max_int = 2**n_bits - 1
        scales = np.clip(mx - mn, 1e-5, None) / max_int
        zeros = np.clip(-np.round(mn / scales), 0, max_int)
        wq = (np.clip(np.round(w / scales) + zeros, 0, max_int) - zeros) * scales
    else:
        mx = np.clip(np.abs(w).max(1, keepdims=True), 1e-5, None)
        max_int = 2 ** (n_bits - 1) - 1
        scales = mx / max_int
        wq = np.clip(np.round(w / scales), -(2 ** (n_bits - 1)), max_int) * scales
    return wq.reshape(org), scales.reshape(org[0], -1)


@pytest.mark.parametrize("zero_point", [True, False])
@pytest.mark.parametrize("n_bits,group_size", [(4, 128), (4, 0), (8, 64), (3, 32)])
def test_pseudo_quantize_tensor(zero_point, n_bits, group_size):
    w = RNG.standard_normal((32, 256)).astype(np.float32)
    w_dq, scales, zeros = pseudo_quantize_tensor(
        jnp.asarray(w), n_bits=n_bits, group_size=group_size, zero_point=zero_point)
    want, want_scales = np_pseudo_quant(w, n_bits, group_size, zero_point)
    np.testing.assert_allclose(np.asarray(w_dq), want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(scales), want_scales, rtol=1e-5, atol=1e-6)
    if zero_point:
        assert zeros is not None and zeros.shape == scales.shape
    else:
        assert zeros is None


@pytest.mark.parametrize("zero_point", [True, False])
def test_quantize_dequantize_roundtrip(zero_point):
    w = RNG.standard_normal((16, 128)).astype(np.float32)
    q = quantize_tensor(jnp.asarray(w), n_bits=4, group_size=64, zero_point=zero_point)
    w_dq = dequantize_tensor(q, (16, 128), n_bits=4, group_size=64, zero_point=zero_point)
    ref, _, _ = pseudo_quantize_tensor(jnp.asarray(w), n_bits=4, group_size=64, zero_point=zero_point)
    np.testing.assert_allclose(np.asarray(w_dq), np.asarray(ref), rtol=1e-5, atol=1e-6)
    # codes are within range
    iw = np.asarray(q.iweight)
    if zero_point:
        assert iw.min() >= 0 and iw.max() <= 15
    else:
        assert iw.min() >= -8 and iw.max() <= 7


def test_edge_cases():
    """Odd shapes / tiny groups / boundary values."""
    from qdm_tpu.quant import (quantize_weight_absmax, pseudo_quantize_tensor,
                               resolve_group_size)

    # 1-row, 1-group
    w = jnp.array([[0.0, 0.0, 0.0, 0.0]])
    out = np.asarray(quantize_weight_absmax(w, 8, 0))
    assert np.isfinite(out).all() and (out == 0).all()

    # constant weights quantize to themselves
    w = jnp.full((4, 32), 2.5)
    out = np.asarray(quantize_weight_absmax(w, 8, 0))
    np.testing.assert_allclose(out, 2.5, rtol=1e-2)

    # group_size larger than row -> shrink path
    assert resolve_group_size(64, 128) == 64

    # 2-bit quantization: 4 levels
    w = jnp.asarray(RNG.standard_normal((8, 64)), jnp.float32)
    wq, s, z = pseudo_quantize_tensor(w, n_bits=2, group_size=32, zero_point=True)
    per_group_vals = np.asarray(wq).reshape(-1, 32)
    for row in per_group_vals[:4]:
        assert len(np.unique(np.round(row, 6))) <= 4
