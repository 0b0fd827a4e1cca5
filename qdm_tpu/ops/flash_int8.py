"""Fused int8 flash attention (Pallas TPU).

Both attention matmuls run on the int8 MXU with the S x S matrix never
leaving VMEM.  XLA can run int8 BMMs (bench_attn.py: 2.3x over bf16 in
isolation at SD1.5's 4096-token level) but lowers them badly inside the
full UNet graph (0.48x end-to-end, bench_sweep.py) — transposes and the
materialized int32 logits eat the win.  This kernel owns the whole
chain:

  HBM:  qi/ki/vi int8 (pre-quantized; the per-token / per-channel
        quantize fuses into the projection epilogues under XLA)
        + per-token q/k scales, per-(head,channel) v scales
  VMEM: int8 QK^T (MXU) -> dequant (outer scale product) -> online
        softmax (f32, VPU) -> per-row int8 probs -> int8 PV (MXU)
        -> f32 rescale/accumulate with the flash max/sum corrections

Reading int8 instead of bf16 also halves the q/k/v HBM traffic.

Reference analogue: the `quantize_bmm_input` activation quantization of
attention inputs (quantizer_SQ.py:463,487; fake_quant.py:108-118's
per-token absmax is the scale rule used for q, k, and the probs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _cdiv(a, b):
    return -(-a // b)


def _kernel(qi_ref, ki_ref, vi_ref, qs_ref, ksT_ref, vs_ref, o_ref,
            acc_ref, m_ref, l_ref, *, n_k: int, sm_scale: float):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)

    s_int = jax.lax.dot_general(
        qi_ref[0], ki_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),   # (bq, D) x (bk, D)^T
        preferred_element_type=jnp.int32)             # (bq, bk)
    logits = s_int.astype(jnp.float32) * (
        qs_ref[0] * ksT_ref[0] * sm_scale)            # (bq,1)*(1,bk)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)                       # (bq, bk) in (0, 1]
    l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = m_new

    # per-row int8 probs (p >= 0; rowmax <= 1)
    ps = jnp.maximum(jnp.max(p, axis=-1, keepdims=True), 1e-20) / 127.0
    pi = jnp.round(p / ps).astype(jnp.int8)
    pv = jax.lax.dot_general(
        pi, vi_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)             # (bq, D)
    acc_ref[:] = acc_ref[:] * corr + pv.astype(jnp.float32) * ps

    @pl.when(j == n_k - 1)
    def _():
        o_ref[0] = (acc_ref[:] * vs_ref[0] / l_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_q", "block_k",
                                             "interpret"))
def _flash_int8_bhsd(qi, ki, vi, qs, ksT, vs, sm_scale: float,
                     block_q: int = 512, block_k: int = 512,
                     interpret: bool = False):
    """qi/ki/vi (BH, S, Dp) int8; qs (BH, S, 1) f32; ksT (BH, 1, S) f32;
    vs (BH, 1, Dp) f32 -> (BH, S, Dp) bf16."""
    bh, s, dp = qi.shape
    bq = min(block_q, s)
    bk = min(block_k, s)
    while s % bq:
        bq //= 2
    while s % bk:
        bk //= 2
    n_q, n_k = s // bq, s // bk

    return pl.pallas_call(
        functools.partial(_kernel, n_k=n_k, sm_scale=sm_scale),
        grid=(bh, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, bk), lambda b, i, j: (b, 0, j)),
            pl.BlockSpec((1, 1, dp), lambda b, i, j: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, dp), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s, dp), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bq, dp), jnp.float32),
                        pltpu.VMEM((bq, 1), jnp.float32),
                        pltpu.VMEM((bq, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qi, ki, vi, qs, ksT, vs)


def flash_int8_attention(q, k, v, scale: float, block_q: int = 512,
                         block_k: int = 512, interpret: bool = False):
    """(B, S, H, D) bf16/f32 in, (B, S, H, D) out.  Quantization of
    q/k/v happens here in plain XLA (it fuses into the producers)."""
    b, s, h, d = q.shape
    dp = _cdiv(d, LANE) * LANE

    def to_bhsd(x):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, s, x.shape[-1])
        if x.shape[-1] != dp:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, dp - x.shape[-1])))
        return x

    qf = to_bhsd(q.astype(jnp.float32))
    kf = to_bhsd(k.astype(jnp.float32))
    vf = to_bhsd(v.astype(jnp.float32))
    qs = jnp.clip(jnp.max(jnp.abs(qf), axis=-1, keepdims=True), 1e-5, None) / 127
    ks = jnp.clip(jnp.max(jnp.abs(kf), axis=-1, keepdims=True), 1e-5, None) / 127
    vs = jnp.clip(jnp.max(jnp.abs(vf), axis=1, keepdims=True), 1e-5, None) / 127
    qi = jnp.round(qf / qs).astype(jnp.int8)
    ki = jnp.round(kf / ks).astype(jnp.int8)
    vi = jnp.round(vf / vs).astype(jnp.int8)

    out = _flash_int8_bhsd(qi, ki, vi, qs, ks.transpose(0, 2, 1), vs,
                           sm_scale=float(scale), block_q=block_q,
                           block_k=block_k, interpret=interpret)
    out = out[:, :, :d].reshape(b, h, s, d).transpose(0, 2, 1, 3)
    return out.astype(q.dtype)


def flash_int8_attention_ref(q, k, v, scale: float):
    """jnp reference with identical quantization semantics."""
    b, s, h, d = q.shape
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    qs = jnp.clip(jnp.max(jnp.abs(qf), axis=-1, keepdims=True), 1e-5, None) / 127
    ks = jnp.clip(jnp.max(jnp.abs(kf), axis=-1, keepdims=True), 1e-5, None) / 127
    vs = jnp.clip(jnp.max(jnp.abs(vf), axis=1, keepdims=True), 1e-5, None) / 127
    qi = jnp.round(qf / qs)
    ki = jnp.round(kf / ks)
    vi = jnp.round(vf / vs)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qi, ki) * (
        qs[..., 0].transpose(0, 2, 1)[:, :, :, None] *
        ks[..., 0].transpose(0, 2, 1)[:, :, None, :] * scale)
    p = jax.nn.softmax(logits, axis=-1)
    ps = jnp.maximum(jnp.max(p, axis=-1, keepdims=True), 1e-20) / 127.0
    pi = jnp.round(p / ps)
    acc = jnp.einsum("bhqk,bkhd->bqhd", pi * ps, vi)
    return (acc * vs).astype(q.dtype)
