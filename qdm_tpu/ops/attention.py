"""Attention for the diffusion/text models.

TPU path uses the Pallas TPU flash-attention kernel (blockwise softmax,
no materialized S x S matrix) — the TPU-native equivalent of the
reference's flash-attn pip dependency and fused attention modules
(reference: requirements.txt:4, awq/modules/fused/attn.py upstream).
Falls back to an XLA softmax attention for short or ragged sequence
lengths (e.g. 77-token cross-attention context) and on CPU.

Layout: (batch, seq, heads, head_dim) in/out.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, scale):
    # q: (B, Sq, H, D), k/v: (B, Skv, H, D)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _flash_ok(q_len: int, kv_len: int) -> bool:
    return (
        jax.default_backend() == "tpu"
        and q_len == kv_len
        and q_len >= 256
        and q_len % 128 == 0
    )


@functools.partial(jax.named_call, name="attention")
def dot_product_attention(q, k, v, scale: float | None = None):
    """Multi-head attention; q (B, Sq, H, D), k/v (B, Skv, H, D)."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    if _flash_ok(q.shape[1], k.shape[1]):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention)

        qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
        s = q.shape[1]
        b = min(512, s)
        block_sizes = BlockSizes(
            block_q=b, block_k_major=b, block_k=b, block_b=1,
            block_q_major_dkv=b, block_k_major_dkv=b, block_k_dkv=b,
            block_q_dkv=b, block_k_major_dq=b, block_k_dq=b, block_q_dq=b,
        )
        out = flash_attention(qt, kt, vt, sm_scale=scale, block_sizes=block_sizes)
        return out.transpose(0, 2, 1, 3)
    return _xla_attention(q, k, v, scale)
