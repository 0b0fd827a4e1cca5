#!/usr/bin/env python
"""A/B: flash vs grouped-einsum module attention at PREFILL shapes.

The anatomy probe (tools/prefill_anatomy_tpu.py) showed 66% of the
(32, 1024) static-int8 prefill is non-matmul; the module routes
ctx < 2048 through the grouped einsum, which materializes the f32
(B, hkv, g, S, S) logits — 4.8 GB per layer at (32, 1024), ~3 HBM
round trips of it per layer.  This probe times the engine prefill with
QDM_FLASH_PREFILL_MIN at {256, 4096} (flash everywhere vs the old
einsum routing) for bf16 and static-int8 prefill at S in
{256, 512, 1024}, and checks the first-token agreement between paths.

Run on the TPU: python -u tools/prefill_flash_ab_tpu.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import jax.numpy as jnp
import numpy as np

from bench_llm import BENCH_1B
from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.api.serve import DecodeEngine


def timed(fn, reps=5):
    out = fn()
    jax.block_until_ready(out)
    float(jnp.sum(out.astype(jnp.float32)))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.time() - t0)
    return best


def main():
    if jax.default_backend() in ("cpu",):
        print(json.dumps({"error": "needs the TPU"}))
        return
    cfg = BENCH_1B
    batch = 32
    lm = CausalLM.from_config(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    ids_full = rng.integers(0, cfg.vocab_size, (batch, 1024)).astype(np.int32)
    stats = DecodeEngine.calibrate_scales(lm, ids_full[:4])
    out = {"metric": "flash-vs-einsum prefill A/B (batch 32, BENCH_1B)"}
    toks = {}

    for route, fmin in (("einsum", "4096"), ("flash", "128")):
        os.environ["QDM_FLASH_PREFILL_MIN"] = fmin
        for name, pq in (("bf16", False), ("static", True)):
            eng = DecodeEngine(lm, mode="w8a8_static", act_stats=stats,
                               prefill_quant=pq)
            for S in (256, 512, 1024):
                ids = ids_full[:, :S]
                max_len = -(-(S + 33) // 128) * 128

                def pf(ids=ids, max_len=max_len, eng=eng):
                    tok0, caches = eng.prefill(ids, max_len)
                    return caches[0][0]

                out[f"{route}_{name}_S{S}"] = round(timed(pf), 4)
                tok0, _ = eng.prefill(ids, max_len)
                toks[(route, name, S)] = np.asarray(tok0)
                print(json.dumps(out), flush=True)
            del eng

    for name in ("bf16", "static"):
        agree = all(
            (toks[("einsum", name, S)] == toks[("flash", name, S)]).mean()
            >= 31 / 32 for S in (256, 512, 1024))
        out[f"tok0_agree_{name}"] = bool(agree)
        for S in (256, 512, 1024):
            out[f"tok0_frac_{name}_S{S}"] = float(
                (toks[("einsum", name, S)]
                 == toks[("flash", name, S)]).mean())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
