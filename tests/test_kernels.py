"""Numerics tests for the Pallas quantized-matmul kernels (interpret
mode on CPU) against the pure-jnp references and fp32 ground truth."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qdm_tpu.ops.quant_matmul import (
    pack_rows_strided,
    unpack_rows_strided,
    pack_linear_int4,
    pack_linear_int8,
    w4a16_matmul_pallas,
    w4a16_matmul_ref,
    w8a8_matmul_pallas,
    w8a8_matmul_ref,
    quantize_act_per_token_int,
    PACK_BLOCK_K,
)
from qdm_tpu.quant import quantize_tensor

RNG = np.random.default_rng(7)


def test_strided_pack_roundtrip():
    codes = RNG.integers(0, 16, size=(256, 64)).astype(np.int32)
    packed = pack_rows_strided(jnp.asarray(codes), PACK_BLOCK_K, 4)
    assert packed.shape == (32, 64)
    out = np.asarray(unpack_rows_strided(packed, PACK_BLOCK_K, 4))
    np.testing.assert_array_equal(out, codes)


def _quantize_weight(k, n, group_size, zero_point):
    w = RNG.standard_normal((n, k)).astype(np.float32) * 0.05  # (out, in)
    q = quantize_tensor(jnp.asarray(w), n_bits=4, group_size=group_size,
                        zero_point=zero_point)
    codes_kn = jnp.asarray(np.asarray(q.iweight).T)
    scales_gn = jnp.asarray(np.asarray(q.scales).T)
    zeros_gn = jnp.asarray(np.asarray(q.zeros).T) if q.zeros is not None else None
    return w, pack_linear_int4(codes_kn, scales_gn, zeros_gn, group_size)


@pytest.mark.parametrize("zero_point", [True, False])
@pytest.mark.parametrize("m,k,n,g", [(64, 256, 128, 128), (17, 320, 320, 64),
                                     (130, 256, 384, 256), (8, 128, 128, 128)])
def test_w4a16_kernel_vs_ref(zero_point, m, k, n, g):
    w, (qw, scales, zeros) = _quantize_weight(k, n, g, zero_point)
    x = (RNG.standard_normal((m, k)) * 0.5).astype(np.float32)
    got = np.asarray(w4a16_matmul_pallas(jnp.asarray(x), qw, scales, zeros,
                                         group_size=g, interpret=True))[:, :n]
    ref = np.asarray(w4a16_matmul_ref(jnp.asarray(x), qw, scales, zeros,
                                      group_size=g))[:, :n]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    # and ref must equal x @ dequant(w)
    from qdm_tpu.quant import pseudo_quantize_tensor
    w_dq, _, _ = pseudo_quantize_tensor(jnp.asarray(w), n_bits=4, group_size=g,
                                        zero_point=zero_point)
    want = x @ np.asarray(w_dq).T
    np.testing.assert_allclose(ref, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("m,k,n", [(64, 256, 128), (33, 320, 320), (128, 512, 384)])
def test_w8a8_kernel_vs_ref(m, k, n):
    w = (RNG.standard_normal((k, n)) * 0.05).astype(np.float32)
    w_codes = np.clip(np.round(w / (np.abs(w).max(0, keepdims=True) / 127)), -128, 127)
    w_scale_n = np.abs(w).max(0) / 127
    w_i8, ws = pack_linear_int8(jnp.asarray(w_codes.astype(np.int8)),
                                jnp.asarray(w_scale_n))
    x = (RNG.standard_normal((m, k))).astype(np.float32)
    x_i8, xs = quantize_act_per_token_int(jnp.asarray(x), 8)
    got = np.asarray(w8a8_matmul_pallas(x_i8, w_i8, xs, ws, out_dtype=jnp.float32,
                                        interpret=True))[:, :n]
    ref = np.asarray(w8a8_matmul_ref(x_i8, w_i8, xs, ws, out_dtype=jnp.float32))[:, :n]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    # int8 quantized matmul should approximate the fp32 product
    want = x @ w
    err = np.abs(ref - want).max() / (np.abs(want).max() + 1e-9)
    assert err < 0.05, err


@pytest.mark.parametrize("zero_point", [True, False])
def test_w4a8_kernel_vs_ref(zero_point):
    from qdm_tpu.ops.quant_matmul import w4a8_matmul_pallas, w4a8_matmul_ref

    m, k, n, g = 48, 256, 256, 128
    w, (qw, scales, zeros) = _quantize_weight(k, n, g, zero_point)
    x = jnp.asarray((RNG.standard_normal((m, k)) * 0.5), jnp.float32)
    got = np.asarray(w4a8_matmul_pallas(x, qw, scales, zeros, group_size=g,
                                        interpret=True))[:, :n]
    ref = np.asarray(w4a8_matmul_ref(x, qw, scales, zeros, group_size=g))[:, :n]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    # and it approximates the fp product
    want = np.asarray(x) @ w.T
    rel = np.abs(ref - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.15, rel


def test_w8a8_geglu_fused_vs_ref():
    from qdm_tpu.ops.quant_matmul import (w8a8_geglu_fused, w8a8_geglu_ref,
                                          pack_linear_int8)

    m, k, inner = 40, 128, 128
    w = (RNG.standard_normal((k, 2 * inner)) * 0.05).astype(np.float32)
    wc = np.clip(np.round(w / (np.abs(w).max(0, keepdims=True) / 127)),
                 -128, 127).astype(np.int8)
    w_i8, ws = pack_linear_int8(jnp.asarray(wc), jnp.asarray(np.abs(w).max(0) / 127))
    bias = jnp.asarray(RNG.standard_normal((1, w_i8.shape[1])) * 0.1, jnp.float32)
    x = jnp.asarray(RNG.standard_normal((m, k)), jnp.float32)
    got = np.asarray(w8a8_geglu_fused(x, w_i8, ws, bias, out_dtype=jnp.float32,
                                      interpret=True))
    ref = np.asarray(w8a8_geglu_ref(x, w_i8, ws, bias, out_dtype=jnp.float32))
    np.testing.assert_allclose(got, ref[:, :inner], rtol=2e-5, atol=2e-5)


def test_w8a8_xla_dense_layer_matches_math():
    """QDense mode w8a8_xla (static + dynamic scales) equals the explicit
    int8 dequant formula."""
    import numpy as np
    from qdm_tpu.models.layers import QDense
    from qdm_tpu.quant.plan import LayerQuantSpec, QuantPlan
    from qdm_tpu.quant.apply import pack_dense_layer

    k, n, m = 24, 16, 10
    key = jax.random.PRNGKey(0)
    kern = jax.random.normal(key, (k, n), jnp.float32)
    bias = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (m, k), jnp.float32)

    for act_quant in ("static", "per_token"):
        spec = LayerQuantSpec(mode="w8a8_xla", w_bits=8, a_bits=8,
                              quantize_act=True, act_quant=act_quant)
        plan = QuantPlan(default=spec)
        layer = pack_dense_layer({"kernel": kern, "bias": bias}, spec)
        if act_quant == "static":
            layer["act_scale"] = jnp.asarray([0.05], jnp.float32)
        model = QDense(n, dtype=jnp.float32, plan=plan)
        y = model.apply({"params": layer}, x)

        wi = np.asarray(layer["qweight"], np.float32)
        ws = np.asarray(layer["scales"], np.float32)
        if act_quant == "static":
            xs = 0.05
            xi = np.clip(np.round(np.asarray(x) / xs), -127, 127)
        else:
            xs = np.clip(np.abs(np.asarray(x)).max(-1, keepdims=True), 1e-5,
                         None) / 127.0
            xi = np.clip(np.round(np.asarray(x) / xs), -127, 127)
        want = (xi @ wi) * (xs * ws) + np.asarray(bias)
        np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5, atol=1e-4)


def test_w8a8_fused_epi_residual():
    from qdm_tpu.ops.quant_matmul import (w8a8_matmul_fused_epi, w8a8_matmul_ref,
                                          quantize_act_per_token_int,
                                          pack_linear_int8)

    m, k, n = 24, 128, 128
    w = (RNG.standard_normal((k, n)) * 0.05).astype(np.float32)
    wc = np.clip(np.round(w / (np.abs(w).max(0, keepdims=True) / 127)),
                 -128, 127).astype(np.int8)
    w_i8, ws = pack_linear_int8(jnp.asarray(wc), jnp.asarray(np.abs(w).max(0) / 127))
    bias = jnp.asarray(RNG.standard_normal((1, n)) * 0.1, jnp.float32)
    res = jnp.asarray(RNG.standard_normal((m, n)), jnp.float32)
    x = jnp.asarray(RNG.standard_normal((m, k)), jnp.float32)
    got = np.asarray(w8a8_matmul_fused_epi(x, w_i8, ws, bias, residual=res,
                                           out_dtype=jnp.float32, interpret=True))
    xi, xs = quantize_act_per_token_int(x, 8)
    want = np.asarray(w8a8_matmul_ref(xi, w_i8, xs, ws, out_dtype=jnp.float32)) \
        + np.asarray(bias) + np.asarray(res)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_w4a16_xla_dense_layer_matches_math():
    """w4a16_xla: nibble-packed int4 weight-only layer equals explicit
    unpack-dequant math, incl. odd K (padded row)."""
    from qdm_tpu.models.layers import QDense
    from qdm_tpu.quant.plan import LayerQuantSpec, QuantPlan
    from qdm_tpu.quant.apply import pack_dense_layer

    for k in (32, 33):
        n, m, g = 16, 6, 16
        kern = jax.random.normal(jax.random.PRNGKey(k), (k, n), jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(1), (m, k), jnp.float32)
        spec = LayerQuantSpec(mode="w4a16_xla", w_bits=4, group_size=g)
        layer = pack_dense_layer({"kernel": kern}, spec)
        assert layer["qweight"].dtype == jnp.int8
        assert layer["qweight"].shape[0] == (k + k % 2) // 2
        model = QDense(n, use_bias=False, dtype=jnp.float32,
                       plan=QuantPlan(default=spec))
        y = model.apply({"params": layer}, x)

        qw = np.asarray(layer["qweight"]).astype(np.int32)
        lo = (qw & 0xF) - 8
        hi = ((qw >> 4) & 0xF) - 8
        codes = np.stack([lo, hi], 1).reshape(-1, n)
        kp = codes.shape[0]
        w = codes * np.repeat(np.asarray(layer["scales"]),
                              kp // layer["scales"].shape[0], axis=0)
        want = np.asarray(x) @ w[:k]
        np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5, atol=1e-5)
        # quantization is faithful: dequant error bounded by scale/2
        err = np.abs(w[:k] - np.asarray(kern))
        smax = np.abs(np.asarray(layer["scales"])).max()
        assert err.max() <= smax / 2 + 1e-6
