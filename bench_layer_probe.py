#!/usr/bin/env python
"""Focused decode-step anatomy (round 3, follow-up to
bench_decode_probe): why does the realized per-layer cost (~250us
bf16) exceed the back-to-back single-layer marginal (~127us)?

Rows:
  chain1      — fori_loop over ONE layer's weights (as before);
  chain2      — fori_loop over TWO DISTINCT layers per iteration / 2:
                if the single-layer number was flattered by
                loop-invariant weights, this jumps;
  step_marg   — full engine step steady-state: (t(n=40) - t(n=8)) / 32
                from the real scan, min over 5 reps;
  module_marg — same for the module path.

nohup python -u bench_layer_probe.py > /tmp/layer_probe.log 2>&1 &
"""

import gc
import json
import time

import jax

from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import jax.numpy as jnp
import numpy as np

from bench_llm import BENCH_1B
from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.api.serve import DecodeEngine
from qdm_tpu.models import llama as llama_lib
from qdm_tpu.utils.timing import marginal_time

BATCH, PREFILL = 32, 1024


def main():
    on_tpu = jax.default_backend() == "tpu"
    cfg = BENCH_1B if on_tpu else llama_lib.tiny_llama_config()
    batch, prefill = (BATCH, PREFILL) if on_tpu else (2, 8)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    lm = CausalLM.from_config(cfg, dtype=dtype)
    ids = np.random.default_rng(0).integers(0, cfg.vocab_size,
                                            (batch, prefill))
    max_len = prefill + 48
    out = {"metric": "layer anatomy (batch 32, ctx 1024)"}
    stats = DecodeEngine.calibrate_scales(
        lm, np.asarray(ids)[:2, :min(prefill, 256)])

    for mode in ("bf16", "w8a8_static"):
        kw = {"act_stats": stats} if mode == "w8a8_static" else {}
        eng = DecodeEngine(lm.truncated_draft(2), mode=mode, **kw)
        caches = eng.init_cache(batch, max_len)
        n_qkv = eng.layers[0]["w_qkv"].shape[1]
        cosv = jnp.ones((n_qkv,), jnp.float32)
        sinv = jnp.zeros((n_qkv,), jnp.float32)
        x0 = jax.random.normal(jax.random.PRNGKey(0),
                               (batch, cfg.hidden_size), dtype) * 0.1

        def chain1(xc):
            y, _ = eng._layer(xc, caches[0], eng.layers[0], 512, cosv, sinv)
            return y.astype(xc.dtype)

        def chain2(xc):
            y, _ = eng._layer(xc, caches[0], eng.layers[0], 512, cosv, sinv)
            y, _ = eng._layer(y, caches[1], eng.layers[1], 512, cosv, sinv)
            return y.astype(xc.dtype)

        tag = "bf16" if mode == "bf16" else "w8a8"
        out[f"chain1_{tag}_us"] = round(1e6 * marginal_time(
            chain1, x0, lo=32, hi=160), 1)
        out[f"chain2_{tag}_us_per_layer"] = round(1e6 * marginal_time(
            chain2, x0, lo=16, hi=80) / 2, 1)
        print(json.dumps(out), flush=True)
        del eng, caches
        gc.collect()

    # steady-state real step: marginal over token count, min of reps
    def step_marginal(eng):
        tok0, caches = eng.prefill(ids, max_len)
        jax.block_until_ready(caches[0][0])

        def t(n):
            run = eng._make_run(n)
            args = (eng.layers, eng.embed, eng.final_norm, eng.w_head)
            best = 1e9
            run(*args, tok0, caches, jnp.int32(prefill))  # compile+warm
            for _ in range(5):
                t0 = time.time()
                toks = run(*args, tok0, caches, jnp.int32(prefill))
                float(jnp.sum(toks))
                best = min(best, time.time() - t0)
            return best

        return (t(40) - t(8)) / 32

    for mode, kv, tag in (("bf16", None, "engine_bf16"),
                          ("w8a8_static", None, "engine_w8a8"),
                          ("w8a8_static", jnp.int8, "engine_w8a8_kv8")):
        kw = {"act_stats": stats} if mode == "w8a8_static" else {}
        eng = DecodeEngine(lm, mode=mode, kv_dtype=kv, **kw)
        dt = step_marginal(eng)
        out[f"{tag}_step_us"] = round(1e6 * dt, 1)
        out[f"{tag}_decode_tok_s"] = round(batch / dt, 1)
        print(json.dumps(out), flush=True)
        del eng
        gc.collect()

    # module path, same marginal-token method
    model = lm.model
    caches = model.init_cache(batch, max_len)

    @jax.jit
    def mprefill(params, ids, caches):
        lg, caches = model.apply({"params": params}, jnp.asarray(ids),
                                 kv_caches=caches, cache_index=0)
        return jnp.argmax(lg[:, -1], axis=-1), caches

    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def mdecode(params, tok0, caches, n):
        def body(carry, i):
            tok, cs = carry
            lg, cs = model.apply({"params": params}, tok[:, None],
                                 kv_caches=cs, cache_index=prefill + i)
            nxt = jnp.argmax(lg[:, -1], axis=-1)
            return (nxt, cs), nxt
        (_, _), toks = jax.lax.scan(body, (tok0, caches), jnp.arange(n))
        return toks

    mtok0, mcaches = mprefill(lm.params, ids, caches)

    def mt(n):
        best = 1e9
        float(jnp.sum(mdecode(lm.params, mtok0, mcaches, n)))
        for _ in range(5):
            t0 = time.time()
            float(jnp.sum(mdecode(lm.params, mtok0, mcaches, n)))
            best = min(best, time.time() - t0)
        return best

    dt = (mt(40) - mt(8)) / 32
    out["module_bf16_step_us"] = round(1e6 * dt, 1)
    out["module_bf16_decode_tok_s"] = round(batch / dt, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
