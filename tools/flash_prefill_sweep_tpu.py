#!/usr/bin/env python
"""Block-size sweep of the fused prefill attention kernel with
MARGINAL timing (the single-dispatch probe sat on the ~32 ms tunnel
floor).  Run on the TPU: python -u tools/flash_prefill_sweep_tpu.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import jax.numpy as jnp
import numpy as np

from qdm_tpu.ops.flash_prefill import flash_prefill_gqa, rope_tables
from qdm_tpu.utils.timing import marginal_time


def main():
    if jax.default_backend() in ("cpu",):
        print(json.dumps({"error": "needs the TPU"}))
        return
    rng = np.random.default_rng(0)
    b, s, h, hkv, d = 32, 1024, 32, 4, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
    sm = 1.0 / np.sqrt(d)
    cos, sin = rope_tables(s, d, 10000.0)
    out = {"metric": "flash_prefill_gqa block sweep ms/call "
                     "(marginal, batch 32 ctx 1024 h32/kv4 d64)"}

    for bq, bk in ((256, 256), (512, 512), (1024, 512), (1024, 1024)):
        def step(x, bq=bq, bk=bk):
            return flash_prefill_gqa(x, k, v, sm, rope_cos=cos,
                                     rope_sin=sin, block_q=bq,
                                     block_k=bk)

        out[f"kernel_{bq}x{bk}_ms"] = round(
            1e3 * marginal_time(step, q, lo=4, hi=16), 3)
        print(json.dumps(out), flush=True)

    # jax flash (repeat + transposes + XLA rope), marginal, for scale
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)
    from qdm_tpu.models.llama import rope

    pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s))

    def old_step(x):
        qb = x.transpose(0, 2, 1, 3)
        qr = rope(qb, pos, 10000.0)
        kr = jnp.repeat(k.transpose(0, 2, 1, 3), h // hkv, axis=2)
        vr = jnp.repeat(v.transpose(0, 2, 1, 3), h // hkv, axis=2)
        blk = 512
        sizes = BlockSizes(
            block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
            block_q_major_dkv=blk, block_k_major_dkv=blk,
            block_k_dkv=blk, block_q_dkv=blk, block_k_major_dq=blk,
            block_k_dq=blk, block_q_dq=blk)
        of = flash_attention(qr.transpose(0, 2, 1, 3),
                             kr.transpose(0, 2, 1, 3),
                             vr.transpose(0, 2, 1, 3), causal=True,
                             sm_scale=sm, block_sizes=sizes)
        return of

    out["old_jaxflash_ms"] = round(
        1e3 * marginal_time(old_step, q, lo=4, hi=16), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
