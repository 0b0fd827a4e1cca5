#!/usr/bin/env python
"""Attention-core microbench at SD1.5 shapes (batch-8 CFG -> B=16).

Per (S, H, D): current dispatch (pallas flash when eligible), raw XLA
softmax, jax.nn.dot_product_attention, and flash with alternative block
sizes.  Cross-attention (kv=77) separately.
"""

import json

import jax

from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import jax.numpy as jnp

from qdm_tpu.ops import attention as attn_lib
from qdm_tpu.utils.timing import marginal_time


def time_fn(fn, q, k, v, reps=None):
    """Marginal time per call: chain the output back into q inside a
    traced fori_loop (out has q's shape), so tunnel dispatch overhead
    and fixed fetch cost cancel (see utils/timing.py)."""
    return marginal_time(lambda qc: fn(qc, k, v), q, lo=4, hi=16)


def flash_with_block(q, k, v, scale, b):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)

    qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    bs = BlockSizes(block_q=b, block_k_major=b, block_k=b, block_b=1,
                    block_q_major_dkv=b, block_k_major_dkv=b, block_k_dkv=b,
                    block_q_dkv=b, block_k_major_dq=b, block_k_dq=b,
                    block_q_dq=b)
    return flash_attention(qt, kt, vt, sm_scale=scale,
                           block_sizes=bs).transpose(0, 2, 1, 3)


def mmdit_main():
    """--mmdit: the SD3.5-medium joint-attention shape (S=4480 padded,
    H=24, D=64) — flash block sweep + int8 flash, round-3 roadmap #5.
    4480 = 35 x 128, so the 128-multiple blocks dividing it are 128,
    640, 896 (and the whole seq is too big for VMEM logits)."""
    import sys

    from qdm_tpu.ops.flash_int8 import flash_int8_attention

    s, h, d = 4480, 24, 64
    for B in (2, 8):   # CFG batch 1 / 4
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B, s, h, d), jnp.bfloat16)
        k = jax.random.normal(key, (B, s, h, d), jnp.bfloat16)
        v = jax.random.normal(key, (B, s, h, d), jnp.bfloat16)
        scale = 1.0 / (d ** 0.5)
        row = {"B": B, "s": s, "h": h, "d": d}

        cur = jax.jit(lambda q, k, v: attn_lib.dot_product_attention(q, k, v))
        row["current_ms"] = round(1e3 * time_fn(cur, q, k, v), 2)
        print(json.dumps(row), flush=True)
        xla = jax.jit(lambda q, k, v: attn_lib._xla_attention(q, k, v, scale))
        try:
            row["xla_ms"] = round(1e3 * time_fn(xla, q, k, v), 2)
        except Exception as e:
            row["xla_ms"] = f"err:{type(e).__name__}"
        try:
            nn_attn = jax.jit(lambda q, k, v: jax.nn.dot_product_attention(
                q, k, v, scale=scale))
            row["jaxnn_ms"] = round(1e3 * time_fn(nn_attn, q, k, v), 2)
        except Exception as e:
            row["jaxnn_ms"] = f"err:{type(e).__name__}"
        print(json.dumps(row), flush=True)
        for b in (128, 640, 896):
            try:
                f = jax.jit(lambda q, k, v, b=b: flash_with_block(
                    q, k, v, scale, b))
                row[f"flash{b}_ms"] = round(1e3 * time_fn(f, q, k, v), 2)
            except Exception as e:
                row[f"flash{b}_ms"] = f"err:{type(e).__name__}"
            print(json.dumps(row), flush=True)
        for bq, bk in ((640, 640), (896, 896)):
            try:
                f8 = jax.jit(lambda q, k, v, bq=bq, bk=bk:
                             flash_int8_attention(q, k, v, scale,
                                                  block_q=bq, block_k=bk))
                row[f"int8flash{bq}_ms"] = round(
                    1e3 * time_fn(f8, q, k, v), 2)
            except Exception as e:
                row[f"int8flash{bq}_ms"] = f"err:{type(e).__name__}"
            print(json.dumps(row), flush=True)


def main():
    import sys
    if "--mmdit" in sys.argv:
        mmdit_main()
        return
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    shapes = [  # (S_q, S_kv, H, D) — SD1.5 levels at batch 8 CFG
        (4096, 4096, 8, 40),
        (1024, 1024, 8, 80),
        (256, 256, 8, 160),
        (64, 64, 8, 160),
        (4096, 77, 8, 40),
        (1024, 77, 8, 80),
    ]
    for sq, skv, h, d in shapes:
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B, sq, h, d), jnp.bfloat16)
        k = jax.random.normal(key, (B, skv, h, d), jnp.bfloat16)
        v = jax.random.normal(key, (B, skv, h, d), jnp.bfloat16)
        scale = 1.0 / (d ** 0.5)
        row = {"sq": sq, "skv": skv, "h": h, "d": d}

        cur = jax.jit(lambda q, k, v: attn_lib.dot_product_attention(q, k, v))
        row["current_ms"] = round(1e3 * time_fn(cur, q, k, v), 2)

        xla = jax.jit(lambda q, k, v: attn_lib._xla_attention(q, k, v, scale))
        row["xla_ms"] = round(1e3 * time_fn(xla, q, k, v), 2)

        try:
            nn_attn = jax.jit(lambda q, k, v: jax.nn.dot_product_attention(
                q, k, v, scale=scale))
            row["jaxnn_ms"] = round(1e3 * time_fn(nn_attn, q, k, v), 2)
        except Exception as e:
            row["jaxnn_ms"] = f"err:{type(e).__name__}"

        def xla_int8qk(q, k, v):
            # static-scale int8 QK^T (post-LN q/k ranges are calibratable)
            qs, ks = 4.0 / 127, 4.0 / 127
            qi = jnp.clip(jnp.round(q.astype(jnp.float32) / qs), -127, 127).astype(jnp.int8)
            ki = jnp.clip(jnp.round(k.astype(jnp.float32) / ks), -127, 127).astype(jnp.int8)
            logits = jnp.einsum("bqhd,bkhd->bhqk", qi, ki,
                                preferred_element_type=jnp.int32)
            logits = logits.astype(jnp.float32) * (qs * ks * scale)
            probs = jax.nn.softmax(logits, axis=-1)
            return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v)

        def xla_int8full(q, k, v):
            qs, ks, vs = 4.0 / 127, 4.0 / 127, 4.0 / 127
            qi = jnp.clip(jnp.round(q.astype(jnp.float32) / qs), -127, 127).astype(jnp.int8)
            ki = jnp.clip(jnp.round(k.astype(jnp.float32) / ks), -127, 127).astype(jnp.int8)
            vi = jnp.clip(jnp.round(v.astype(jnp.float32) / vs), -127, 127).astype(jnp.int8)
            logits = jnp.einsum("bqhd,bkhd->bhqk", qi, ki,
                                preferred_element_type=jnp.int32)
            logits = logits.astype(jnp.float32) * (qs * ks * scale)
            probs = jax.nn.softmax(logits, axis=-1)
            pi = jnp.round(probs * 127).astype(jnp.int8)   # probs in [0,1]
            acc = jnp.einsum("bhqk,bkhd->bqhd", pi, vi,
                             preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * (vs / 127)).astype(q.dtype)

        row["int8qk_ms"] = round(1e3 * time_fn(jax.jit(xla_int8qk), q, k, v), 2)
        row["int8full_ms"] = round(1e3 * time_fn(jax.jit(xla_int8full), q, k, v), 2)

        if sq == skv and sq >= 256:
            from qdm_tpu.ops.flash_int8 import flash_int8_attention

            for bq in (256, 512):
                if bq <= sq:
                    f8 = jax.jit(lambda q, k, v, bq=bq: flash_int8_attention(
                        q, k, v, scale, block_q=bq, block_k=bq))
                    try:
                        row[f"int8flash{bq}_ms"] = round(
                            1e3 * time_fn(f8, q, k, v), 2)
                    except Exception as e:
                        row[f"int8flash{bq}_ms"] = f"err:{type(e).__name__}"

        if sq == skv and sq >= 256:
            for b in (128, 256, 512, 1024):
                if b <= sq:
                    try:
                        f = jax.jit(lambda q, k, v, b=b: flash_with_block(
                            q, k, v, scale, b))
                        row[f"flash{b}_ms"] = round(1e3 * time_fn(f, q, k, v), 2)
                    except Exception as e:
                        row[f"flash{b}_ms"] = f"err:{type(e).__name__}"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
