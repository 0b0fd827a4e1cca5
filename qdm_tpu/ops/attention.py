"""Attention for the diffusion/text models.

TPU dispatch, selected by measurement (bench_attn.py, v5e, batch-8 CFG):

* 256 <= S <= 1024 uniform self-attention: the Pallas TPU
  flash-attention kernel with the WHOLE sequence as one block — the
  attention stays VMEM-resident with no online-softmax bookkeeping
  (2x over multi-block flash at S=1024).
* longer sequences (SD 64x64 latents = 4096 tokens, head_dim 40): plain
  XLA softmax attention wins over the flash kernel (7.1ms vs 9.8ms per
  CFG-batch-16 call) — the small head_dim tiles poorly onto the
  128-lane MXU and XLA's fusion of the softmax chain beats the Pallas
  pipeline overhead.
* int8 BMM attention (`quantized=True`): the fused Pallas int8 flash
  kernel (ops/flash_int8.py) — per-token scales for q/k, per-row
  scales for the softmax probs, per-(head,dim) scales for v.  This is
  the real-kernel version of the reference's `quantize_bmm_input`
  activation quantization (quantizer_SQ.py:463,487;
  fake_quant.py:222-225).  Measured (bench_attn_int8.py): it beats the
  unfused XLA int8 BMMs 4.3x (9.9 vs 43 ms at B=16 S=4096) and ties or
  beats bf16 flash at small batch (0.65-1.3 vs 1.39 ms at B=2 S=4096),
  but at batch-8 CFG bf16 XLA/flash still wins (7.0 vs 9.9 ms at
  S=4096; 0.51 vs 0.72 at S=1024): D=40/80 heads pad the 128-lane MXU
  so bf16 already sits at the padding roofline and int8's 2x cannot
  pay for its quantize VPU work.  Hence `int8_bmm` is an accuracy-
  semantics option (attention-input quantization), not the throughput
  default.
* ragged (cross-attention, 77-token context) and CPU: XLA softmax.

Layout: (batch, seq, heads, head_dim) in/out.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, scale, key_keep=None):
    # q: (B, Sq, H, D), k/v: (B, Skv, H, D); key_keep (Skv,) bool masks
    # dropped keys out of every query's softmax
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    if key_keep is not None:
        logits = jnp.where(key_keep[None, None, None], logits, -1e9)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _int8_attention(q, k, v, scale):
    """Both BMMs on the int8 MXU with commuting scale factorizations:
    q/k per-token, probs fixed 1/127 (range [0,1]), v per-(h,d)."""
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    qs = jnp.clip(jnp.max(jnp.abs(qf), axis=-1, keepdims=True), 1e-5, None) / 127
    ks = jnp.clip(jnp.max(jnp.abs(kf), axis=-1, keepdims=True), 1e-5, None) / 127
    vs = jnp.clip(jnp.max(jnp.abs(vf), axis=(0, 1), keepdims=True), 1e-5, None) / 127
    qi = jnp.round(qf / qs).astype(jnp.int8)
    ki = jnp.round(kf / ks).astype(jnp.int8)
    vi = jnp.round(vf / vs).astype(jnp.int8)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qi, ki,
                        preferred_element_type=jnp.int32)
    # (B,Sq,H) x (B,Skv,H) -> (B,H,Sq,Skv) outer scale
    logits = logits.astype(jnp.float32) * (
        qs[..., 0].transpose(0, 2, 1)[:, :, :, None] *
        ks[..., 0].transpose(0, 2, 1)[:, :, None, :] * scale)
    probs = jax.nn.softmax(logits, axis=-1)
    # per-row absmax prob scales (quantize_activation_per_token_absmax
    # semantics, fake_quant.py:108-118): exact for flat rows, full int8
    # resolution for peaked ones
    ps = jnp.max(probs, axis=-1, keepdims=True) / 127  # probs >= 0
    pi = jnp.round(probs / ps).astype(jnp.int8)
    acc = jnp.einsum("bhqk,bkhd->bqhd", pi, vi,
                     preferred_element_type=jnp.int32)
    # ps (B,H,Sq,1) -> (B,Sq,H,1): per-(query,head) scaling of the out
    return (acc.astype(jnp.float32) * ps.transpose(0, 2, 1, 3)
            * vs).astype(q.dtype)


def _flash(q, k, v, scale, block: int, key_keep=None):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    b = block
    block_sizes = BlockSizes(
        block_q=b, block_k_major=b, block_k=b, block_b=1,
        block_q_major_dkv=b, block_k_major_dkv=b, block_k_dkv=b,
        block_q_dkv=b, block_k_major_dq=b, block_k_dq=b, block_q_dq=b,
    )
    segment_ids = None
    if key_keep is not None:
        # kept keys in segment 0, dropped (pad) keys in segment 1:
        # real queries attend exactly the kept keys (reference-exact
        # softmax), pad queries attend only each other (row-local
        # garbage the caller's downstream never reads) — the kernel
        # keeps its fused schedule
        seg = jnp.where(jnp.asarray(key_keep, bool), 0, 1).astype(jnp.int32)
        seg = jnp.broadcast_to(seg[None], (q.shape[0], q.shape[1]))
        segment_ids = SegmentIds(q=seg, kv=seg)
    out = flash_attention(qt, kt, vt, segment_ids=segment_ids,
                          sm_scale=scale, block_sizes=block_sizes)
    return out.transpose(0, 2, 1, 3)


# batch x seq threshold where the long-seq regime flips from flash-512
# to XLA/int8 (measured at B=2 vs B=16, bench_attn.py)
_LONG_SEQ_ROWS_XLA = 32768


@functools.partial(jax.named_call, name="attention")
def dot_product_attention(q, k, v, scale: float | None = None,
                          quantized: bool = False, key_keep=None):
    """Multi-head attention; q (B, Sq, H, D), k/v (B, Skv, H, D).

    quantized=True runs both BMMs on the int8 MXU (self-attention at
    large batch x seq on TPU only; the 77-token cross-attention stays
    bf16 — it is cheap and its v ranges are context-dependent).

    key_keep (Skv,) bool: drop the False keys from every query's
    softmax (the MMDiT 128-pad mask, models/mmdit.py).  Flash paths
    keep their fused schedule via segment ids (pad keys in their own
    segment); the int8 flash kernel carries no segment plumbing, so a
    masked quantized call runs the masked bf16 XLA path instead."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    b_sz, s = q.shape[0], q.shape[1]
    uniform = (jax.default_backend() == "tpu" and s == k.shape[1]
               and s % 128 == 0)
    if uniform and s >= 256 and quantized and key_keep is None:
        # attention-input quantization requested (reference's
        # quantize_bmm_input): the fused int8 flash kernel is the
        # fastest int8 implementation at every shape (bench_attn_int8)
        from qdm_tpu.ops.flash_int8 import flash_int8_attention

        return flash_int8_attention(q, k, v, scale, block_q=512,
                                    block_k=min(s, 1024))
    if uniform and 256 <= s <= 1024:
        # whole sequence in one VMEM-resident block: 2x over multi-block
        # flash and XLA at batch-8 CFG (bench_attn.py)
        return _flash(q, k, v, scale, block=s, key_keep=key_keep)
    if uniform and s >= 2048:
        if b_sz * s >= _LONG_SEQ_ROWS_XLA and s % 512 == 0:
            # big-batch long-seq: bf16 XLA softmax beats multi-block
            # flash (7.0 vs 9.9 ms at B=16 S=4096).  Only when s is
            # 512-aligned — on unaligned seqs XLA's fused attention
            # schedule can bail and materialize the f32 logits.
            return _xla_attention(q, k, v, scale, key_keep=key_keep)
        # multi-block flash (wins at small batch: 1.22 ms vs 2.95 XLA
        # at B=2 S=4096); the kernel needs block | seq.  512 is the
        # measured sweet spot (bench_attn.py); for seqs it doesn't
        # divide (e.g. the padded MMDiT joint seq 4480) fall through
        # to the largest dividing 128-multiple (640 there).
        block = next(bb for bb in (512, 1024, 896, 768, 640, 384, 256, 128)
                     if bb <= s and s % bb == 0)
        return _flash(q, k, v, scale, block=block, key_keep=key_keep)
    return _xla_attention(q, k, v, scale, key_keep=key_keep)
