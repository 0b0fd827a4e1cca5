"""Attention dispatch + int8-BMM numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qdm_tpu.ops import attention as attn


def _rand(shape, key, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) * scale


def test_int8_attention_close_to_fp():
    b, s, h, d = 2, 64, 4, 32
    q, k, v = _rand((b, s, h, d), 0), _rand((b, s, h, d), 1), _rand((b, s, h, d), 2)
    scale = 1.0 / np.sqrt(d)
    ref = attn._xla_attention(q, k, v, scale)
    out = attn._int8_attention(q, k, v, scale)
    # int8 q/k/probs/v: errors stack but stay small relative to |v|~1
    err = float(jnp.abs(out - ref).mean())
    assert err < 0.03, err
    assert np.isfinite(np.asarray(out)).all()


def test_int8_attention_respects_prob_mass():
    # probs quantized at 1/127 must still produce a convex-ish combo:
    # constant v must round-trip almost exactly
    b, s, h, d = 1, 32, 2, 16
    q, k = _rand((b, s, h, d), 0), _rand((b, s, h, d), 1)
    v = jnp.ones((b, s, h, d), jnp.float32) * 3.0
    out = attn._int8_attention(q, k, v, 1.0 / np.sqrt(d))
    np.testing.assert_allclose(np.asarray(out), 3.0, rtol=0.03)


def test_dispatch_paths():
    # quantized path falls back to fp on CPU and for short/cross shapes
    b, h, d = 1, 2, 16
    q = _rand((b, 64, h, d), 0)
    k = _rand((b, 77, h, d), 1)
    v = _rand((b, 77, h, d), 2)
    out = attn.dot_product_attention(q, k, v, quantized=True)
    assert out.shape == (b, 64, h, d)
    ref = attn._xla_attention(q, k, v, 1.0 / np.sqrt(d))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_int8_kernel_interpret_matches_fp():
    """Pallas int8 flash attention (interpret mode) stays close to fp
    attention and runs the multi-block online-softmax path."""
    from qdm_tpu.ops.flash_int8 import (flash_int8_attention,
                                        flash_int8_attention_ref)

    b, s, h, d = 2, 256, 4, 40
    q = _rand((b, s, h, d), 0)
    k = _rand((b, s, h, d), 1)
    v = _rand((b, s, h, d), 2)
    scale = 1.0 / np.sqrt(d)
    out = flash_int8_attention(q, k, v, scale, block_q=128, block_k=128,
                               interpret=True)
    fp = attn._xla_attention(q, k, v, scale)
    assert float(jnp.abs(out - fp).mean()) < 5e-3
    ref = flash_int8_attention_ref(q, k, v, scale)
    assert float(jnp.abs(out - ref).max()) < 5e-2
    # probe: peaked attention (large logit scale) — int8 q/k logit noise
    # is amplified by a sharp softmax; error grows but stays bounded and
    # matches the XLA int8 variant (same quantization semantics)
    out2 = flash_int8_attention(q * 8, k * 8, v, scale, block_q=128,
                                block_k=128, interpret=True)
    fp2 = attn._xla_attention(q * 8, k * 8, v, scale)
    assert float(jnp.abs(out2 - fp2).mean()) < 5e-2
    xla_int8 = attn._int8_attention(q * 8, k * 8, v, scale)
    assert (float(jnp.abs(out2 - fp2).mean())
            < 3 * float(jnp.abs(xla_int8 - fp2).mean()) + 1e-3)
