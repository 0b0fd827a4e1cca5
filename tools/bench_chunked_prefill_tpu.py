#!/usr/bin/env python
"""On-chip chunked-prefill validation: speed + token agreement vs the
square prefill at the serve shapes, and the long-context shape where
the square einsum path cannot run at all without flash.

  batch 32 ctx 1024 (the serve shape), chunks 256/512
  batch 16 ctx 4096 (the crossover shape), chunk 512

Run on the TPU:  python -u tools/bench_chunked_prefill_tpu.py
"""

import gc
import json
import sys
import time

import os

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import jax.numpy as jnp
import numpy as np
from bench_llm import BENCH_1B  # noqa: E402
from qdm_tpu.api.causal_lm import CausalLM  # noqa: E402
from qdm_tpu.models import llama as llama_lib  # noqa: E402
from qdm_tpu.api.serve import DecodeEngine  # noqa: E402


def time_prefill(fn, reps=5):
    tok, caches = fn()                          # compile + warm
    jax.block_until_ready(caches[0][0])
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        tok, caches = fn()
        float(jnp.sum(caches[0][0].astype(jnp.float32)))
        best = min(best, time.time() - t0)
    return best, np.asarray(tok)


def main():
    on_tpu = jax.default_backend() not in ("cpu",)
    shapes = ([(16, 4096, (128,))] if on_tpu else [(2, 16, (8,))])
    cfg = BENCH_1B if on_tpu else llama_lib.tiny_llama_config()
    lm = CausalLM.from_config(cfg, dtype=jnp.bfloat16 if on_tpu
                              else jnp.float32)
    cfg = lm.config
    eng = DecodeEngine(lm, mode="bf16")
    rng = np.random.default_rng(0)
    for batch, ctx, chunks in shapes:
        ids = rng.integers(0, cfg.vocab_size, (batch, ctx)).astype(np.int32)
        max_len = -(-(ctx + 33) // 128) * 128
        out = {"metric": f"chunked prefill (batch {batch}, ctx {ctx})"}
        sq, tok_sq = time_prefill(lambda: eng.prefill(ids, max_len))
        out["square_s"] = round(sq, 4)
        print(json.dumps(out), flush=True)
        for c in chunks:
            ch, tok_ch = time_prefill(
                lambda: eng.prefill_chunked(ids, max_len, chunk=c))
            out[f"chunk{c}_s"] = round(ch, 4)
            out[f"chunk{c}_tok_agree"] = round(
                float((tok_ch == tok_sq).mean()), 4)
            print(json.dumps(out), flush=True)
        del out
        gc.collect()


if __name__ == "__main__":
    main()
