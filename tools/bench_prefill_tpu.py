#!/usr/bin/env python
"""On-chip prefill A/B: bf16 vs dynamic-int8 vs STATIC-int8 prefill.

The serve e2e number is ~85% prefill time (legacy 1181 tok/s vs
decode-only 8326 at batch 32 ctx 1024 — BENCH_NOTES r3h), and the
dynamic-per-token int8 prefill measured NEUTRAL (the runtime act-quant
elementwise passes cost what the int8 MXU saves).  This probe measures
whether CALIBRATED STATIC scales (zero runtime quant passes — the
SD1.5 w8a8_xla winner scheme) unlock the int8 MXU on prefill:

  1. prefill wall time per batch, all three modes (min-of-5)
  2. quality: prefill last-position logits KL + first-token agreement
     vs the bf16 prefill
  3. legacy serve accounting (prefill + 32 steps), bf16 vs static

One engine lives at a time (three 1.1B engines together exhausted
HBM).  Run on the TPU (one job at a time):
  python -u tools/bench_prefill_tpu.py
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


def kl(a, b):
    la = a - np.log(np.sum(np.exp(a - a.max(-1, keepdims=True)),
                           -1, keepdims=True)) - a.max(-1, keepdims=True)
    lb = b - np.log(np.sum(np.exp(b - b.max(-1, keepdims=True)),
                           -1, keepdims=True)) - b.max(-1, keepdims=True)
    return float(np.mean(np.sum(np.exp(la) * (la - lb), -1)))


def main():
    on_tpu = jax.default_backend() not in ("cpu",)
    batch, ctx, n_new = (32, 1024, 32) if on_tpu else (2, 16, 4)
    cfg = BENCH_1B if on_tpu else llama_lib.tiny_llama_config()
    lm = CausalLM.from_config(cfg, dtype=jnp.bfloat16 if on_tpu
                              else jnp.float32)
    cfg = lm.config
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (batch, ctx)).astype(np.int32)
    max_len = -(-(ctx + n_new + 1) // 128) * 128
    stats = DecodeEngine.calibrate_scales(lm, ids[:4])

    out = {"metric": f"prefill A/B (batch {batch}, ctx {ctx})"}
    logits = {}
    for name, pq in (("bf16", False), ("dyn", "dynamic"), ("static", True),
                 ("static_i8attn", "static_i8attn"), ("fused", "fused")):
        eng = DecodeEngine(lm, mode="w8a8_static", act_stats=stats,
                           prefill_quant=pq)
        tok0, caches = eng.prefill(ids, max_len)      # compile + warm
        jax.block_until_ready(caches[0][0])
        logits[name] = np.asarray(
            eng._last_prefill_logits.astype(jnp.float32))
        best = 1e9
        for _ in range(5):
            t0 = time.time()
            tok0, caches = eng.prefill(ids, max_len)
            float(jnp.sum(caches[0][0].astype(jnp.float32)))
            best = min(best, time.time() - t0)
        out[f"prefill_s_{name}"] = round(best, 4)
        out[f"prefill_tok_s_{name}"] = round(batch * ctx / best, 1)
        if name != "bf16":
            out[f"kl_{name}"] = round(kl(logits["bf16"], logits[name]), 5)
            out[f"tok1_agree_{name}"] = round(float(
                (logits["bf16"].argmax(-1)
                 == logits[name].argmax(-1)).mean()), 4)
        print(json.dumps(out), flush=True)

        # legacy serve accounting (prefill + n_new steps)
        if name in ("bf16", "static", "static_i8attn", "fused"):
            float(np.sum(eng.generate(ids, n_new)))
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                float(np.sum(eng.generate(ids, n_new)))
            dt = (time.time() - t0) / reps
            out[f"legacy_tok_s_{name}_prefill"] = round(
                batch * n_new / dt, 1)
            print(json.dumps(out), flush=True)
        del eng, caches, tok0
        gc.collect()


if __name__ == "__main__":
    main()
