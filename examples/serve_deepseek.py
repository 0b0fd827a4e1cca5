#!/usr/bin/env python
"""Serving DeepSeek-V2 (MLA) through the DecodeEngine — the r5 family.

MLA stores ONE (kv_lora_rank + qk_rope_head_dim)-wide latent per token
instead of per-head K/V, and the engine decodes in the ABSORBED form
directly against that latent cache (serve.py::_mla_layer): measured
2.9x decode tok/s over an equal-size MHA model at the one shape MHA
fits on a v5e, with every larger MHA leg OOMing on cache alone
(BENCH_NOTES r5).  The full quantize lifecycle (RTN/SmoothQuant/AWQ)
runs through MLA-specific scaling groups (models/shims.py).

    python examples/serve_deepseek.py [--model /path/to/deepseek_v2_dir]
    # no --model: the random tiny deepseek config (MLA + deepseek MoE)
"""

import argparse

import jax.numpy as jnp
import numpy as np

from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.models import llama as llama_lib


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", help="local HF deepseek_v2 dir")
    ap.add_argument("--tokens", type=int, default=12)
    args = ap.parse_args()

    if args.model:
        lm = CausalLM.from_pretrained(args.model)
    else:
        # q-lora + latent KV + deepseek MoE (shared experts, first
        # layer dense, un-renormalized top-k)
        lm = CausalLM.from_config(llama_lib.tiny_deepseek_config(),
                                  dtype=jnp.float32)
    cfg = lm.config
    width = cfg.kv_lora_rank + cfg.qk_rope_head_dim
    mha_width = 2 * cfg.num_attention_heads * (cfg.qk_nope_head_dim
                                               + cfg.v_head_dim) // 2
    print(f"latent cache: {width} floats/token "
          f"(an MHA cache at this head count would be ~{mha_width})")

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (2, 8)).astype(np.int32)

    # module path (explicit form)
    ref = lm.generate(ids, max_new_tokens=args.tokens)
    print("module tokens:", np.asarray(ref)[0, 8:])

    # engine bf16 (absorbed form) — greedy tokens equal the module's
    eng = lm.serve(mode="bf16")
    out = eng.generate(ids, max_new_tokens=args.tokens)
    print("engine tokens:", np.asarray(out)[0, 8:])
    assert (np.asarray(out)[:, 8:] == np.asarray(ref)[:, 8:]).all()

    # w8a8_static with a SmoothQuant pre-migration (MLA scaling groups)
    eng8 = lm.serve(ids, mode="w8a8_static", smooth=True)
    out8 = eng8.generate(ids, max_new_tokens=args.tokens)
    print("w8a8+smooth tokens:", np.asarray(out8)[0, 8:])
    print("ok")


if __name__ == "__main__":
    main()
