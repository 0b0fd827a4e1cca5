#!/usr/bin/env python
"""Focused microbench: fused int8 flash attention vs the incumbents at
the SD1.5 attention shapes that matter for quantized plans.

Known (bench_attn.py round-2): at S=4096 D=40 B=16 — xla bf16 7.1ms,
xla int8 BMM 4.3ms (isolated; 0.48x in-graph), flash-512 bf16 9.8ms.
Question: does the fused Pallas int8 kernel beat all of them, and at
which block sizes?
"""

import json
import sys

import jax

from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import jax.numpy as jnp

from qdm_tpu.ops import attention as attn_lib
from qdm_tpu.ops.flash_int8 import flash_int8_attention
from qdm_tpu.utils.timing import marginal_time


def time_fn(fn, q, k, v):
    return marginal_time(lambda qc: fn(qc, k, v), q, lo=4, hi=16)


def main():
    cases = [  # (B, S, H, D)
        (16, 4096, 8, 40),
        (2, 4096, 8, 40),
        (16, 1024, 8, 80),
    ]
    for B, s, h, d in cases:
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B, s, h, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (B, s, h, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (B, s, h, d), jnp.bfloat16)
        scale = 1.0 / (d ** 0.5)
        row = {"B": B, "s": s, "h": h, "d": d}

        cur = jax.jit(lambda q, k, v: attn_lib.dot_product_attention(q, k, v))
        row["current_ms"] = round(1e3 * time_fn(cur, q, k, v), 2)

        i8 = jax.jit(lambda q, k, v: attn_lib._int8_attention(q, k, v, scale))
        row["int8xla_ms"] = round(1e3 * time_fn(i8, q, k, v), 2)

        for bq in (256, 512, 1024):
            for bk in (256, 512, 1024):
                if bq > s or bk > s:
                    continue
                if (bq, bk) not in ((256, 256), (512, 512), (1024, 1024),
                                    (512, 1024), (256, 512)):
                    continue
                f8 = jax.jit(lambda q, k, v, bq=bq, bk=bk: flash_int8_attention(
                    q, k, v, scale, block_q=bq, block_k=bk))
                try:
                    row[f"i8flash_{bq}x{bk}_ms"] = round(
                        1e3 * time_fn(f8, q, k, v), 2)
                except Exception as e:
                    row[f"i8flash_{bq}x{bk}_ms"] = f"err:{type(e).__name__}"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
