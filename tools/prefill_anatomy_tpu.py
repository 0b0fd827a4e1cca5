#!/usr/bin/env python
"""Prefill anatomy: where does the (32, 1024) serve prefill spend its
time?  (VERDICT r3 item 2 groundwork — the fused-block prefill needs
to know what to fuse.)

Three measurements on the BENCH_1B geometry (h=2048, i=5632, L=22,
32 q / 4 kv heads):

1. engine prefill wall time vs ctx S in {256, 512, 1024, 2048} for
   bf16 AND static-int8 — fitting t(S) = c + a*S + b*S^2 splits the
   linear (matmul/elementwise) from the quadratic (attention) part.
2. a pure dense-matmul chain at the same (M=B*S, K, N) shapes, bf16
   and int8-static (cast + matmul + dequant), timed per layer-stack
   pass — the matmul envelope the prefill could reach if everything
   else were free.
3. the same chain with fused qkv (N=2560) / gate_up (N=11264) vs the
   unfused narrow matmuls — prices the per-matmul act-quant passes.

Run on the TPU (one job at a time):
  python -u tools/prefill_anatomy_tpu.py
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
from qdm_tpu.models import llama as llama_lib


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.time() - t0)
    return best


def matmul_chain(cfg, m, fused, int8, static_scale):
    """One transformer stack's dense matmuls at prefill shape (M, *):
    q/k/v (+o) + gate/up/down per layer, rolled into a lax.fori_loop
    over layers with weight stacks."""
    h, inter = cfg.hidden_size, cfg.intermediate_size
    kvd = cfg.num_key_value_heads * (h // cfg.num_attention_heads)
    L = cfg.num_hidden_layers
    key = jax.random.PRNGKey(0)

    if fused:
        shapes = [(h, h + 2 * kvd), (h, h), (h, 2 * inter), (inter, h)]
    else:
        shapes = [(h, h), (h, kvd), (h, kvd), (h, h),
                  (h, inter), (h, inter), (inter, h)]
    ws = []
    for i, (k, n) in enumerate(shapes):
        w = jax.random.normal(jax.random.fold_in(key, i), (L, k, n),
                              jnp.bfloat16) * 0.02
        if int8:
            w = jnp.round(w.astype(jnp.float32) * 127).astype(jnp.int8)
        ws.append(w)

    x0 = jax.random.normal(key, (m, h), jnp.bfloat16)

    @jax.jit
    def run(x0, *ws):
        def body(l, x):
            outs = []
            for w, (k, n) in zip(ws, shapes):
                inp = x if k == h else outs[-1][:, :k]
                if int8:
                    if static_scale:
                        xi = jnp.clip(jnp.round(inp.astype(jnp.float32)
                                                * 16.0), -127, 127
                                      ).astype(jnp.int8)
                    else:
                        s = jnp.max(jnp.abs(inp), axis=1, keepdims=True)
                        xi = jnp.clip(jnp.round(inp.astype(jnp.float32)
                                                / s * 127), -127, 127
                                      ).astype(jnp.int8)
                    o = jax.lax.dot_general(
                        xi, w[l], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    o = (o.astype(jnp.float32) * 1e-4).astype(jnp.bfloat16)
                else:
                    o = inp @ w[l]
                outs.append(o)
            # fold every output back into an (m, h) carry
            acc = x
            for o in outs:
                acc = acc + o[:, :h] if o.shape[1] >= h else \
                    acc.at[:, :o.shape[1]].add(o)
            return acc.astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, L, body, x0)

    return run, (x0, *ws)


def main():
    on_tpu = jax.default_backend() not in ("cpu",)
    if not on_tpu:
        print(json.dumps({"error": "needs the TPU"}))
        return
    cfg = BENCH_1B
    batch = 32
    lm = CausalLM.from_config(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    out = {"metric": "prefill anatomy (batch 32, BENCH_1B)"}

    ids_full = rng.integers(0, cfg.vocab_size, (batch, 2048)).astype(np.int32)
    stats = DecodeEngine.calibrate_scales(lm, ids_full[:4, :1024])

    for name, pq in (("bf16", False), ("static", True)):
        eng = DecodeEngine(lm, mode="w8a8_static", act_stats=stats,
                           prefill_quant=pq)
        for S in (256, 512, 1024, 2048):
            ids = ids_full[:, :S]
            max_len = -(-(S + 33) // 128) * 128

            def pf(ids=ids, max_len=max_len, eng=eng):
                tok0, caches = eng.prefill(ids, max_len)
                return caches[0][0]

            out[f"prefill_{name}_S{S}"] = round(timed(pf), 4)
            print(json.dumps(out), flush=True)
        del eng

    # pure matmul chains at M = 32 * 1024
    m = batch * 1024
    for label, fused, int8, static in (
            ("bf16_unfused", False, False, False),
            ("bf16_fused", True, False, False),
            ("int8_static_unfused", False, True, True),
            ("int8_static_fused", True, True, True),
            ("int8_dyn_fused", True, True, False)):
        run, args = matmul_chain(cfg, m, fused, int8, static)
        out[f"chain_{label}"] = round(timed(run, *args), 4)
        print(json.dumps(out), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
