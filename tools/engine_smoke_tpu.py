#!/usr/bin/env python
"""On-chip smoke of the round-3 serving surfaces in composition:
generate / generate_ragged / stop_early / sampling / kv8c on the 1B
bench model, few tokens each.  The kernel exactness verifier proves
per-kernel math; this catches Mosaic lowering or glue failures that
only appear when the paths compose inside the real jitted loops.

Prints one JSON line: {"ok": true, ...} on success.
"""

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

from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.api.serve import DecodeEngine
from qdm_tpu.models import llama as llama_lib
from bench_llm import BENCH_1B


def main():
    on_tpu = jax.default_backend() == "tpu"
    cfg = BENCH_1B if on_tpu else llama_lib.tiny_llama_config()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    lm = CausalLM.from_config(cfg, dtype=dtype)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (2, 24), dtype=np.int64)
    out = {"backend": jax.default_backend()}
    t0 = time.time()

    eng = lm.serve(ids, mode="w4a8_static")
    g = eng.generate(ids, max_new_tokens=8)
    assert np.isfinite(g).all() and g.shape == (2, 32)
    out["w4a8_generate"] = "ok"

    s = eng.generate(ids, max_new_tokens=8, temperature=0.7, top_p=0.9,
                     seed=1)
    s2 = eng.generate(ids, max_new_tokens=8, temperature=0.7, top_p=0.9,
                      seed=1)
    assert (s == s2).all()
    out["sampling"] = "ok"

    eos = int(g[0, 27])
    e1 = eng.generate(ids, max_new_tokens=8, eos_token_id=eos)
    e2 = eng.generate(ids, max_new_tokens=8, eos_token_id=eos,
                      stop_early=True)
    assert (e1 == e2).all()
    out["stop_early"] = "ok"

    prompts = [rng.integers(0, cfg.vocab_size, (n,)) for n in (9, 24, 17)]
    rag = eng.generate_ragged(prompts, max_new_tokens=8)
    agrees = []
    for r, p in enumerate(prompts):
        single = eng.generate(np.asarray(p)[None], max_new_tokens=8)[0]
        # bf16 rope placement differs slightly between the ragged
        # (XLA) and single-prompt (kernel) paths — on random weights
        # a flipped argmax can cascade, so record agreement rather
        # than hard-assert exactness (the CPU f32 suite proves the
        # math is bit-identical)
        agrees.append(round(float((rag[r][-8:] == single[-8:]).mean()), 3))
        assert np.isfinite(rag[r]).all()
    out["ragged"] = "ok"
    out["ragged_row_agreement"] = agrees

    kv8c = lm.serve(ids, mode="w8a8_static", kv_dtype=jnp.int8,
                    kv_scale_mode="channel")
    k = kv8c.generate(ids, max_new_tokens=8)
    assert np.isfinite(k).all()
    out["kv8c"] = "ok"

    out["ok"] = True
    out["seconds"] = round(time.time() - t0, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
