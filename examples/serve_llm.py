#!/usr/bin/env python
"""LLM serving features demo: int8-weight decode, int8 KV cache, and
greedy speculative decoding (token-identical to plain greedy).

    python examples/serve_llm.py [--model /path/to/hf_dir]
    # no --model: random tiny target + an even smaller random draft
"""

import argparse

import jax.numpy as jnp
import numpy as np

from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.config import QuantConfig
from qdm_tpu.models import llama as llama_lib


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", help="local HF dir (omit for random tiny model)")
    ap.add_argument("--tokens", type=int, default=16)
    args = ap.parse_args()

    if args.model:
        lm = CausalLM.from_pretrained(args.model)
    else:
        lm = CausalLM.from_config(llama_lib.tiny_llama_config(),
                                  dtype=jnp.float32)

    ids = np.random.default_rng(0).integers(0, lm.config.vocab_size, (1, 8))

    # megakernel DecodeEngine: three Pallas calls per decoder layer,
    # the fastest batch-decode path on v5e (7.5k tok/s at batch 32,
    # BENCH_NOTES round 3); token-exact vs the module path
    from qdm_tpu.api.serve import DecodeEngine

    module_out = lm.generate(ids, max_new_tokens=args.tokens)
    stats = DecodeEngine.calibrate_scales(lm, ids)
    eng = DecodeEngine(lm, mode="w8a8_static", act_stats=stats)
    eng_out = eng.generate(ids, max_new_tokens=args.tokens)
    print("engine w8a8   :", np.asarray(eng_out)[0, 8:].tolist())
    bf_eng = DecodeEngine(lm, mode="bf16")
    assert (bf_eng.generate(ids, max_new_tokens=args.tokens)
            == module_out).all(), "bf16 engine must match the module path"
    print("engine bf16 == module greedy: OK")

    # everything-on serving config: merged o_proj+MLP megakernel
    # (2 launches/layer) + int8 prefill (the prompt forward is
    # MXU-bound, so the packed w8a8_xla module path runs it ~1.7x)
    full = DecodeEngine(lm, mode="w8a8_static", act_stats=stats,
                        merge_o=True, prefill_quant=True)
    print("engine full   :",
          np.asarray(full.generate(ids, max_new_tokens=args.tokens))
          [0, 8:].tolist())

    # batch-1 latency config (one-call entry): int4 weights + merged
    # o+MLP kernel + int4 lm_head; channel-static int8 KV folds the
    # cache scales out of the attention kernel entirely.  head_quant
    # needs an untied lm_head (tied-embed models have no separate
    # head read to shrink).
    hq = {} if lm.config.tie_word_embeddings else {"head_quant": "int4"}
    lat = lm.serve(ids, mode="w4a8_static", merge_o=True,
                   kv_dtype=jnp.int8, kv_scale_mode="channel", **hq)
    print("engine w4a8 mo+kv8c%s:" % ("+h4" if hq else ""),
          np.asarray(lat.generate(ids, max_new_tokens=args.tokens))
          [0, 8:].tolist())

    # tensor-parallel serving: shard_map megatron sharding over the
    # mesh's 'model' axis — token-exact vs the single-device engine
    import jax
    from qdm_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) >= 2 and lm.config.num_key_value_heads % 2 == 0:
        tp_eng = DecodeEngine(lm, mode="w8a8_static", act_stats=stats,
                              mesh=make_mesh(len(jax.devices()) // 2, 2))
        tp_out = tp_eng.generate(ids, max_new_tokens=args.tokens)
        assert (tp_out == eng_out).all(), "tp engine must match"
        print(f"engine tp={tp_eng.tp} == single-device engine: OK")

    # int8 weights: the decode sweet spot on v5e (BENCH_NOTES: 1.71x)
    lm.quantize(quant_config=QuantConfig(w_bit=8, a_bit=8, version="real",
                                         quant_method="rtn"),
                quantType="rtn",
                calib_data=np.zeros((1, 8), np.int64))

    greedy = lm.generate(ids, max_new_tokens=args.tokens)
    print("greedy        :", greedy[0, 8:].tolist())

    kv8 = lm.generate(ids, max_new_tokens=args.tokens,
                      kv_cache_dtype=jnp.int8)
    print("int8 KV cache :", kv8[0, 8:].tolist())

    # sampling decode (the reference's HF-generate knobs): seed-
    # deterministic temperature/top-p inside the jitted loop
    samp = lm.generate(ids, max_new_tokens=args.tokens,
                       temperature=0.7, top_p=0.9, seed=1)
    print("sampled t=0.7 :", samp[0, 8:].tolist())

    # ragged serving: different-length prompts in ONE engine batch
    # (left-padding + per-row rope + pad-slot masks); each row equals
    # its single-prompt generate exactly
    rng2 = np.random.default_rng(5)
    prompts = [rng2.integers(0, lm.config.vocab_size, (n,))
               for n in (3, 8, 5)]
    rag = bf_eng.generate_ragged(prompts, max_new_tokens=6)
    for r, p in enumerate(prompts):
        single = bf_eng.generate(np.asarray(p)[None], max_new_tokens=6)[0]
        assert (rag[r] == single).all()
    print("ragged rows == single-prompt generates: OK")

    # continuous batching: a request stream through a fixed row pool —
    # finished rows refill from the queue mid-serve; every request's
    # output equals its single-prompt generate
    from qdm_tpu.api.batcher import ContinuousBatcher

    stream = [rng2.integers(0, lm.config.vocab_size, (n,))
              for n in (4, 6, 3, 7, 5)]
    cb = ContinuousBatcher(bf_eng, max_batch=2, chunk=4, capacity=256)
    outs = cb.run(stream, max_new_tokens=[6, 12, 4, 9, 8])
    for i, p in enumerate(stream):
        single = bf_eng.generate(np.asarray(p)[None],
                                 max_new_tokens=len(outs[i]) - len(p))[0]
        assert (outs[i] == single).all()
    print("continuous batching (5 requests / 2 rows) == singles: OK")

    draft = CausalLM.from_config(
        llama_lib.LlamaConfig(vocab_size=lm.config.vocab_size, hidden_size=32,
                              intermediate_size=64, num_hidden_layers=1,
                              num_attention_heads=2, num_key_value_heads=2),
        dtype=jnp.float32, seed=7)
    spec = lm.generate_speculative(ids, args.tokens, draft, gamma=4)
    print("speculative   :", spec[0, 8:].tolist())
    assert (spec == greedy).all(), "spec decode must match greedy exactly"
    print("speculative == greedy: OK")


if __name__ == "__main__":
    main()
