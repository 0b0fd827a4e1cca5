"""Round-to-nearest (absmax) quantization primitives.

Pure, jittable re-implementations of the reference's fake-quant math
(reference: quantize/fake_quant.py:21-167).  All functions are
quantize->dequantize ("fake quant") and preserve the input dtype unless
stated otherwise; the *integer producing* variants used by the packed
kernels live in :mod:`qdm_tpu.quant.pseudo`.

Conventions
-----------
Weights here use the reference's (out_features, in_features) row-major
orientation; group quantization groups along the *last* (in-features)
axis exactly like fake_quant.py:33-40.  Flax kernels are (in, out) —
the pytree transform in :mod:`qdm_tpu.quant.apply` handles transposition.
Activations for conv layers are NHWC (TPU-native) rather than the
reference's NCHW; channel/group semantics are preserved.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

EPS = 1e-5


def resolve_group_size(in_features: int, group_size: int) -> int:
    """Reference quirk: shrink group_size by 32 until it divides
    in_features (fake_quant.py:33-40).  Returns 0 (per-channel over the
    full row) if no positive multiple of 32 divides."""
    if group_size <= 0:
        return 0
    g = group_size
    while g > 0 and in_features % g != 0:
        g -= 32
    return max(g, 0)


def _absmax_scale(x, axis, n_bits, keepdims=True):
    q_max = 2 ** (n_bits - 1) - 1
    scales = jnp.max(jnp.abs(x), axis=axis, keepdims=keepdims)
    return jnp.clip(scales, EPS, None) / q_max


# ---------------------------------------------------------------------------
# weights
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_bits", "group_size"))
def quantize_weight_absmax(w, n_bits: int = 8, group_size: int = 0):
    """Group-wise symmetric absmax fake quant (fake_quant.py:21-84,
    minus the codebook/debug branches).

    w: (out, in).  group_size groups along in-features with the
    shrink-by-32 divisibility quirk.
    """
    orig_dtype = w.dtype
    org_shape = w.shape
    g = resolve_group_size(org_shape[-1], group_size)
    wf = w.astype(jnp.float32)
    if g > 0:
        wf = wf.reshape(-1, g)
    scales = _absmax_scale(wf, axis=-1, n_bits=n_bits)
    wq = jnp.round(wf / scales) * scales
    return wq.reshape(org_shape).astype(orig_dtype)


@functools.partial(jax.jit, static_argnames=("n_bits",))
def quantize_weight_per_channel_absmax(w, n_bits: int = 8):
    """Per-output-channel absmax fake quant (fake_quant.py:86-93).

    For 2D (out, in) this matches the reference exactly.  For conv
    weights we reduce over *all* non-output axes (the reference's
    ``max(dim=-1)`` on a 4D tensor reduces only kw — a quirk we fix;
    documented deviation)."""
    orig_dtype = w.dtype
    wf = w.astype(jnp.float32)
    axes = tuple(range(1, wf.ndim))
    scales = _absmax_scale(wf, axis=axes, n_bits=n_bits)
    wq = jnp.round(wf / scales) * scales
    return wq.astype(orig_dtype)


@functools.partial(jax.jit, static_argnames=("n_bits",))
def quantize_weight_per_tensor_absmax(w, n_bits: int = 8):
    """Whole-tensor absmax fake quant (fake_quant.py:96-105)."""
    orig_dtype = w.dtype
    wf = w.astype(jnp.float32)
    scales = _absmax_scale(wf, axis=None, n_bits=n_bits, keepdims=False)
    wq = jnp.round(wf / scales) * scales
    return wq.astype(orig_dtype)


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_bits",))
def quantize_activation_per_token_absmax(t, n_bits: int = 8):
    """Per-token (last-axis-row) absmax fake quant
    (fake_quant.py:108-118)."""
    orig_dtype = t.dtype
    tf = t.astype(jnp.float32)
    scales = _absmax_scale(tf, axis=-1, n_bits=n_bits)
    tq = jnp.round(tf / scales) * scales
    return tq.astype(orig_dtype)


@functools.partial(jax.jit, static_argnames=("n_bits",))
def quantize_activation_per_tensor_absmax(t, n_bits: int = 8):
    """Whole-tensor absmax fake quant (fake_quant.py:157-167)."""
    orig_dtype = t.dtype
    tf = t.astype(jnp.float32)
    scales = _absmax_scale(tf, axis=None, n_bits=n_bits, keepdims=False)
    tq = jnp.round(tf / scales) * scales
    return tq.astype(orig_dtype)


@functools.partial(jax.jit, static_argnames=("n_bits",))
def quantize_activation_per_channel_absmax(t, n_bits: int = 8):
    """Per-(sample, channel) absmax over spatial dims for conv inputs
    (fake_quant.py:123-131, NCHW amax over (2,3)).  Here t is NHWC, so
    we reduce over axes (1, 2)."""
    assert t.ndim == 4, "expected NHWC conv activation"
    orig_dtype = t.dtype
    tf = t.astype(jnp.float32)
    scales = _absmax_scale(tf, axis=(1, 2), n_bits=n_bits)
    tq = jnp.round(tf / scales) * scales
    return tq.astype(orig_dtype)


def resolve_spatial_group(h: int, w: int, group_size: int) -> int:
    """Reference quirk: shrink 2D act group by 2 until it tiles both H
    and W (fake_quant.py:138-140)."""
    g = group_size
    while g > 1 and (h % g != 0 or w % g != 0):
        g -= 2
    return max(g, 1)


@functools.partial(jax.jit, static_argnames=("n_bits", "group_size"))
def quantize_activation_per_channel_group_absmax(t, group_size: int = 128, n_bits: int = 8):
    """Patch-wise (group_size x group_size spatial tiles) absmax fake
    quant for conv inputs (fake_quant.py:133-153).  t is NHWC."""
    assert t.ndim == 4
    orig_dtype = t.dtype
    n, h, w, c = t.shape
    g = resolve_spatial_group(h, w, group_size)
    tf = t.astype(jnp.float32).reshape(n, h // g, g, w // g, g, c)
    scales = _absmax_scale(tf, axis=(2, 4), n_bits=n_bits)
    tq = jnp.round(tf / scales) * scales
    return tq.reshape(n, h, w, c).astype(orig_dtype)
