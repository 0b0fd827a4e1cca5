"""Pack/unpack bijection + AWQ-layout interop tests
(reference semantics: utils/packing_utils.py:4-102)."""

import numpy as np
import jax.numpy as jnp
import pytest

from qdm_tpu.quant import (
    pack_rows,
    unpack_rows,
    unpack_awq_layout,
    reverse_awq_order,
    dequantize_gemm,
    awq_to_canonical,
    quantize_tensor,
)
from qdm_tpu.quant.packing import AWQ_ORDER

RNG = np.random.default_rng(1)


@pytest.mark.parametrize("bits", [4, 8])
def test_pack_unpack_bijection(bits):
    k, n = 64, 32
    codes = RNG.integers(0, 2**bits, size=(k, n)).astype(np.int32)
    packed = pack_rows(jnp.asarray(codes), bits)
    assert packed.shape == (k * bits // 32, n)
    out = np.asarray(unpack_rows(packed, bits))
    np.testing.assert_array_equal(out, codes)


def np_pack_awq(icodes, bits=4):
    """Pack codes (K, N) into AutoAWQ layout: along N, AWQ_ORDER
    interleave (inverse of packing_utils.py:8-43)."""
    k, n = icodes.shape
    epw = 32 // bits
    blocks = icodes.reshape(k, n // epw, epw)[:, :, list(AWQ_ORDER)]
    out = np.zeros((k, n // epw), dtype=np.int64)
    for j in range(epw):
        out |= blocks[:, :, j].astype(np.int64) << (bits * j)
    return out.astype(np.uint32).view(np.int32)


def test_awq_unpack_reverse_roundtrip():
    k, n, g = 32, 64, 16
    codes = RNG.integers(0, 16, size=(k, n)).astype(np.int32)
    zcodes = RNG.integers(0, 16, size=(k // g, n)).astype(np.int32)
    qw = np_pack_awq(codes)
    qz = np_pack_awq(zcodes)
    iw, iz = unpack_awq_layout(jnp.asarray(qw), jnp.asarray(qz), 4)
    iw, iz = reverse_awq_order(iw, iz, 4)
    np.testing.assert_array_equal(np.asarray(iw), codes)
    np.testing.assert_array_equal(np.asarray(iz), zcodes)


def test_dequantize_gemm_matches_affine():
    k, n, g = 64, 32, 16
    w = RNG.standard_normal((n, k)).astype(np.float32)  # (out, in)
    q = quantize_tensor(jnp.asarray(w), n_bits=4, group_size=g, zero_point=True)
    # lay out codes as (K, N) then into AWQ disk format
    codes_kn = np.asarray(q.iweight).T            # (K, N)
    zeros_kn = np.asarray(q.zeros).T              # (K/g, N) int codes
    scales_kn = np.asarray(q.scales).T            # (K/g, N)
    qw = np_pack_awq(codes_kn)
    qz = np_pack_awq(zeros_kn.astype(np.int32))
    wdq = np.asarray(dequantize_gemm(jnp.asarray(qw), jnp.asarray(qz),
                                     jnp.asarray(scales_kn), 4, g))
    want = (codes_kn - np.repeat(zeros_kn, g, 0)) * np.repeat(scales_kn, g, 0)
    np.testing.assert_allclose(wdq, want, rtol=1e-6, atol=1e-6)


def test_awq_to_canonical():
    k, n, g = 64, 32, 16
    codes_kn = RNG.integers(0, 16, size=(k, n)).astype(np.int32)
    zeros_kn = RNG.integers(0, 16, size=(k // g, n)).astype(np.int32)
    scales_kn = RNG.standard_normal((k // g, n)).astype(np.float32)
    qw = np_pack_awq(codes_kn)
    qz = np_pack_awq(zeros_kn)
    qrows, scales, zeros = awq_to_canonical(jnp.asarray(qw), jnp.asarray(qz),
                                            jnp.asarray(scales_kn), 4)
    np.testing.assert_array_equal(np.asarray(unpack_rows(qrows, 4)), codes_kn)
    np.testing.assert_allclose(np.asarray(scales), scales_kn)
    np.testing.assert_array_equal(np.asarray(zeros), zeros_kn.astype(np.float32))
