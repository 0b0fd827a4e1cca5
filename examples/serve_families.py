#!/usr/bin/env python
"""Serving the round-3 model families through the DecodeEngine:

* mistral-class sliding windows — rolling window-slot caches (decode
  reads `window` cache columns instead of `ctx`; measured 1.94x bf16 /
  2.33x w8a8 over full-cache at ctx 4096, BENCH_NOTES r3s), plus
  bounded-memory continuous batching (window floors + rebasing);
* gemma2 — alternating local/global attention, logit soft-caps,
  sandwich norms, all token-exact vs the module path;
* mixtral-class sparse MoE — stacked-expert einsum decode.

    python examples/serve_families.py [--model /path/to/hf_dir]
    # no --model: random tiny models exercising every path
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from qdm_tpu.api.batcher import ContinuousBatcher
from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.api.serve import DecodeEngine, recommended_kv
from qdm_tpu.models import llama as llama_lib


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", help="local HF dir (mistral/gemma2/mixtral "
                                    "configs auto-detect; omit for tiny "
                                    "random models)")
    ap.add_argument("--tokens", type=int, default=12)
    args = ap.parse_args()
    if not args.model:
        # tiny random models: run on CPU (must be set before backend
        # init — the axon sitecustomize forces the TPU otherwise, and
        # the tiny windows violate the TPU 128-lane constraint)
        import jax

        jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)

    if args.model:
        lm = CausalLM.from_pretrained(args.model)
        ids = rng.integers(0, lm.config.vocab_size, (1, 8))
        eng = DecodeEngine(lm, mode="bf16")
        print(np.asarray(eng.generate(ids, max_new_tokens=args.tokens)))
        return

    # ---- mistral-class sliding window: rolling cache serving
    cfg = dataclasses.replace(llama_lib.tiny_llama_config(),
                              sliding_window=8)
    lm = CausalLM.from_config(cfg, dtype=jnp.float32, seed=1)
    ids = rng.integers(0, cfg.vocab_size, (2, 12))
    eng = DecodeEngine(lm, mode="bf16")
    out = eng.generate(ids, max_new_tokens=args.tokens)
    assert (out == lm.generate(ids, max_new_tokens=args.tokens)).all()
    print("mistral-class rolling-window engine == module greedy: OK")
    print("  recommended_kv(4096, sliding_window=1024) ->",
          recommended_kv(4096, sliding_window=1024))

    # bounded continuous batching: window floors + rebasing serve an
    # unbounded stream in an O(window)-ish cache
    prompts = [rng.integers(0, 256, int(n)) for n in rng.integers(3, 9, 8)]
    bat = ContinuousBatcher(eng, max_batch=3, chunk=4, capacity=144)
    bat.run(prompts, max_new_tokens=10)
    print(f"  windowed stream served; rebases={bat.last_stats['rebases']}")

    # ---- gemma2: alternating windows + soft-caps + sandwich norms
    g2 = llama_lib.LlamaConfig(
        vocab_size=256, hidden_size=48, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim_override=16, mlp_act="gelu", norm_plus_one=True,
        scale_embeddings=True, tie_word_embeddings=True,
        max_position_embeddings=128, sliding_window=6,
        sliding_window_pattern=2, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, sandwich_norms=True,
        query_pre_attn_scalar=16.0)
    lm2 = CausalLM.from_config(g2, dtype=jnp.float32, seed=2)
    e2 = DecodeEngine(lm2, mode="bf16")
    assert (e2.generate(ids, max_new_tokens=args.tokens)
            == lm2.generate(ids, max_new_tokens=args.tokens)).all()
    print("gemma2 engine (alt windows/soft-caps/sandwich) == module: OK")

    # ---- mixtral-class MoE: stacked-expert einsum decode
    lm3 = CausalLM.from_config(llama_lib.tiny_mixtral_config(),
                               dtype=jnp.float32, seed=3)
    e3 = DecodeEngine(lm3, mode="bf16")
    assert (e3.generate(ids, max_new_tokens=args.tokens)
            == lm3.generate(ids, max_new_tokens=args.tokens)).all()
    print("mixtral-class MoE engine == module greedy: OK")

    # ---- qwen3-class QK-norm: per-head q/k RMSNorm before rope
    q3 = llama_lib.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128, qk_norm=True)
    lm4 = CausalLM.from_config(q3, dtype=jnp.float32, seed=4)
    e4 = DecodeEngine(lm4, mode="bf16")
    assert (e4.generate(ids, max_new_tokens=args.tokens)
            == lm4.generate(ids, max_new_tokens=args.tokens)).all()
    print("qwen3-class QK-norm engine == module greedy: OK")

    # ---- gemma3-class: sandwich norms + QK-norm + DUAL rope
    # (windowed layers rotate at the local base freq, global layers at
    # rope_theta with linear position scaling)
    g3 = dataclasses.replace(
        g2, attn_logit_softcapping=None, final_logit_softcapping=None,
        qk_norm=True, rope_theta=1000000.0, rope_local_theta=10000.0,
        rope_scaling_factor=8.0)
    lm5 = CausalLM.from_config(g3, dtype=jnp.float32, seed=5)
    e5 = DecodeEngine(lm5, mode="bf16")
    assert (e5.generate(ids, max_new_tokens=args.tokens)
            == lm5.generate(ids, max_new_tokens=args.tokens)).all()
    print("gemma3-class (dual rope + qk-norm) engine == module: OK")


if __name__ == "__main__":
    main()
