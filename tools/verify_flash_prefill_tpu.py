#!/usr/bin/env python
"""On-chip A/B of the llama flash-prefill branch (models/llama.py):
the Pallas causal flash path at S >= 2048 vs the einsum path
(QDM_DISABLE_FLASH_PREFILL subprocess) on identical inputs — last-token
logits and the written engine cache must agree to bf16 tolerance.

Prints one JSON line."""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def run_case(disable: bool):
    env = dict(os.environ)
    if disable:
        env["QDM_DISABLE_FLASH_PREFILL"] = "1"
    else:
        env.pop("QDM_DISABLE_FLASH_PREFILL", None)
    code = r"""
import json, sys
sys.path.insert(0, %r)
import jax
from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import jax.numpy as jnp
import numpy as np
from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.api.serve import DecodeEngine
from qdm_tpu.models import llama as llama_lib

cfg = llama_lib.LlamaConfig(
    vocab_size=2048, hidden_size=512, intermediate_size=1024,
    num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=2,
    max_position_embeddings=4096)
lm = CausalLM.from_config(cfg, dtype=jnp.bfloat16)
rng = np.random.default_rng(3)
ids = rng.integers(0, 2048, (2, 2048)).astype(np.int32)
eng = DecodeEngine(lm, mode="bf16")
tok, caches = eng.prefill(ids, 2048 + 128)
logits = np.asarray(eng._last_prefill_logits, np.float32)
np.save("/tmp/fp_logits.npy", logits)
jax.block_until_ready(caches[0][0])
out = eng.generate(ids, max_new_tokens=8)
# ragged too (per-row starts through the flash segment ids)
pr = [ids[0, :1500], ids[1]]
outs = eng.generate_ragged(pr, max_new_tokens=8)
np.save("/tmp/fp_cache.npy", np.asarray(caches[0][0], np.float32))
np.save("/tmp/fp_out.npy", np.asarray(out))
np.save("/tmp/fp_r0.npy", np.asarray(outs[0]))
np.save("/tmp/fp_r1.npy", np.asarray(outs[1]))
print("CASE_OK")
""" % (HERE,)
    r = subprocess.run([sys.executable, "-u", "-c", code], env=env,
                       capture_output=True, text=True, timeout=1800)
    if "CASE_OK" not in r.stdout:
        print(r.stdout[-2000:], file=sys.stderr)
        print(r.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"case disable={disable} failed")
    import numpy as np

    return {k: np.load(f"/tmp/fp_{k}.npy")
            for k in ("cache", "out", "r0", "r1", "logits")}


def main():
    import numpy as np

    flash = run_case(False)
    ein = run_case(True)
    cache_diff = float(np.max(np.abs(flash["cache"] - ein["cache"])))
    tok_eq = bool((flash["out"] == ein["out"]).all())
    r_eq = bool((flash["r0"] == ein["r0"]).all()
                and (flash["r1"] == ein["r1"]).all())
    # the decisive check is the prefill last-position LOGITS: the flash
    # and einsum paths round bf16 differently, so greedy tokens on
    # random weights (tightly spaced logits) may flip even when the
    # attention math is right; a masking bug would show as a LARGE
    # logit difference, rounding as a tiny one
    ldiff = float(np.max(np.abs(flash["logits"] - ein["logits"])))
    lscale = float(np.std(ein["logits"]))
    res = {"metric": "flash prefill A/B (S=2048, bf16)",
           "cache_max_abs_diff": cache_diff,
           "prefill_logits_max_abs_diff": ldiff,
           "prefill_logits_std": lscale,
           "greedy_tokens_equal": tok_eq,
           "ragged_tokens_equal": r_eq,
           "ok": bool(cache_diff < 1e-6 and ldiff < 0.05 * lscale
                      and r_eq)}
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
