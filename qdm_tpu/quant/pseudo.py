"""AWQ-style pseudo-quantization returning integer grids, scales, zeros.

Re-implements the reference's ``pseudo_quantize_tensor``
(reference: quantize/quantizer.py:163-198): group-wise asymmetric
(zero-point, uint-k) or symmetric (int-k) quantization.  Unlike the
reference this also exposes the integer codes so the packed-kernel path
(:mod:`qdm_tpu.quant.packing`, :mod:`qdm_tpu.ops.quant_matmul`) can
consume them directly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class QTensor(NamedTuple):
    """Integer-quantized tensor with affine metadata.

    iweight: integer codes, same shape as the source (out, in), int32.
    scales:  (out, n_groups) float32.
    zeros:   (out, n_groups) float32 (None when symmetric).
    """

    iweight: jax.Array
    scales: jax.Array
    zeros: Optional[jax.Array]


@functools.partial(jax.jit, static_argnames=("n_bits", "group_size", "zero_point"))
def pseudo_quantize_tensor(w, n_bits: int = 4, group_size: int = 128, zero_point: bool = True):
    """Fake-quantize w (out, in); returns (w_dq, scales, zeros).

    Matches quantizer.py:163-198: requires in % group_size == 0 when
    group_size > 0 (the AWQ path has no shrink quirk — that belongs to
    the RTN path, fake_quant.py:33-40)."""
    q = quantize_tensor(w, n_bits=n_bits, group_size=group_size, zero_point=zero_point)
    w_dq = dequantize_tensor(q, w.shape, n_bits=n_bits, group_size=group_size,
                             zero_point=zero_point).astype(w.dtype)
    return w_dq, q.scales, q.zeros


@functools.partial(jax.jit, static_argnames=("n_bits", "group_size", "zero_point"))
def quantize_tensor(w, n_bits: int = 4, group_size: int = 128, zero_point: bool = True) -> QTensor:
    """Integer-producing version of pseudo_quantize_tensor."""
    org_shape = w.shape
    g = group_size if group_size > 0 else org_shape[-1]
    assert org_shape[-1] % g == 0, f"in_features {org_shape[-1]} not divisible by group {g}"
    wf = w.astype(jnp.float32).reshape(-1, g)

    if zero_point:
        max_val = jnp.max(wf, axis=1, keepdims=True)
        min_val = jnp.min(wf, axis=1, keepdims=True)
        max_int = 2**n_bits - 1
        scales = jnp.clip(max_val - min_val, 1e-5, None) / max_int
        zeros = jnp.clip(-jnp.round(min_val / scales), 0, max_int)
        iw = jnp.clip(jnp.round(wf / scales) + zeros, 0, max_int)
        zeros = zeros.reshape(org_shape[0], -1)
    else:
        max_val = jnp.clip(jnp.max(jnp.abs(wf), axis=1, keepdims=True), 1e-5, None)
        max_int = 2 ** (n_bits - 1) - 1
        min_int = -(2 ** (n_bits - 1))
        scales = max_val / max_int
        iw = jnp.clip(jnp.round(wf / scales), min_int, max_int)
        zeros = None

    scales = scales.reshape(org_shape[0], -1)
    iw = iw.reshape(org_shape).astype(jnp.int32)
    return QTensor(iw, scales, zeros)


@functools.partial(jax.jit, static_argnames=("org_shape", "n_bits", "group_size", "zero_point"))
def dequantize_tensor(q: QTensor, org_shape, n_bits: int = 4, group_size: int = 128,
                      zero_point: bool = True):
    """Inverse of quantize_tensor -> float32 (out, in)."""
    g = group_size if group_size > 0 else org_shape[-1]
    iw = q.iweight.astype(jnp.float32).reshape(-1, g)
    scales = q.scales.reshape(-1, 1)
    if zero_point:
        zeros = q.zeros.reshape(-1, 1)
        w = (iw - zeros) * scales
    else:
        w = iw * scales
    return w.reshape(org_shape)
