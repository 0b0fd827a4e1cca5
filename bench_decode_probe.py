#!/usr/bin/env python
"""Decode-only profiling for the megakernel engine (round 3).

The --serve metric amortizes a compute-bound (32,1024) prefill into
every row, hiding decode behavior.  This probe separates:

  1. prefill wall time;
  2. module-path decode-only ms/step (bf16 / w8a8_xla);
  3. engine decode-only ms/step (bf16 / w8a8_static);
  4. per-kernel marginal times at the serve shapes vs their HBM
     rooflines (819 GB/s v5e).

Run on the TPU (one job at a time):
  nohup python -u bench_decode_probe.py > /tmp/probe.log 2>&1 &
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/qdm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from bench_llm import BENCH_1B
from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.api.serve import DecodeEngine
from qdm_tpu.models import llama as llama_lib
from qdm_tpu.quant.apply import pack_params
from qdm_tpu.quant.plan import LayerQuantSpec, QuantPlan
from qdm_tpu.utils.timing import marginal_time

BATCH, PREFILL, NNEW = 32, 1024, 32


def main():
    on_tpu = jax.default_backend() == "tpu"
    cfg = BENCH_1B if on_tpu else llama_lib.tiny_llama_config()
    batch, prefill, n_new = (BATCH, PREFILL, NNEW) if on_tpu else (2, 8, 4)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    lm = CausalLM.from_config(cfg, dtype=dtype)
    ids = np.random.default_rng(0).integers(0, cfg.vocab_size,
                                            (batch, prefill))
    out = {"metric": "decode-only probe (batch 32, ctx 1024)"}

    # ---- per-kernel microbenches at serve shapes
    if on_tpu:
        from qdm_tpu.ops import decode_kernels as dk

        h, hkv, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                     cfg.head_dim)
        H, I = cfg.hidden_size, cfg.intermediate_size
        tp = 1152
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (batch, H), dtype) * 0.1
        ns = jnp.abs(jax.random.normal(key, (H,))) + 0.5

        wqkv = jax.random.normal(key, (H, (h + 2 * hkv) * d), dtype) * 0.02
        dt = marginal_time(
            lambda xc: dk.fused_dense_decode(xc, wqkv, norm_scale=ns)[:, :H],
            x)
        out["k_qkv_us"] = round(1e6 * dt, 1)
        out["k_qkv_roofline_us"] = round(wqkv.size * 2 / 819e3, 1)
        print(json.dumps(out), flush=True)

        wo = jax.random.normal(key, (H, H), dtype) * 0.02
        dt = marginal_time(
            lambda xc: dk.fused_dense_decode(xc, wo, residual=xc), x)
        out["k_oproj_us"] = round(1e6 * dt, 1)
        out["k_oproj_roofline_us"] = round(wo.size * 2 / 819e3, 1)
        print(json.dumps(out), flush=True)

        wg = jax.random.normal(key, (H, I), dtype) * 0.02
        wu = jax.random.normal(key, (H, I), dtype) * 0.02
        wd = jax.random.normal(key, (I, H), dtype) * 0.02
        dt = marginal_time(
            lambda xc: dk.fused_mlp_decode(xc, wg, wu, wd, ns), x)
        out["k_mlp_us"] = round(1e6 * dt, 1)
        out["k_mlp_roofline_us"] = round((wg.size + wu.size + wd.size) * 2 / 819e3, 1)
        print(json.dumps(out), flush=True)

        q = jax.random.normal(key, (batch, hkv, h // hkv, d), dtype)
        kc = jax.random.normal(key, (batch, hkv, d, tp), dtype)
        vc = jax.random.normal(key, (batch, hkv, tp, d), dtype)

        def attn_step(qc):
            o = dk.decode_attention(qc, kc, vc, tp - 2)
            return o + qc * 1e-6
        dt = marginal_time(attn_step, q)
        out["k_attn_us"] = round(1e6 * dt, 1)
        out["k_attn_roofline_us"] = round((kc.size + vc.size) * 2 / 819e3, 1)
        print(json.dumps(out), flush=True)

        # int8 variants
        from qdm_tpu.api.serve import _quant_w
        wq_i8, wq_s = _quant_w(wqkv)
        a = jnp.asarray([0.01], jnp.float32)
        dt = marginal_time(
            lambda xc: dk.fused_dense_decode_i8(
                xc, wq_i8, wq_s, a, norm_scale=ns)[:, :H], x)
        out["k_qkv_i8_us"] = round(1e6 * dt, 1)
        wg8, sg = _quant_w(wg)
        wu8, su = _quant_w(wu)
        wd8, sd = _quant_w(wd)
        scl = jnp.asarray([0.01, 0.01], jnp.float32)
        dt = marginal_time(
            lambda xc: dk.fused_mlp_decode_i8(xc, wg8, wu8, wd8,
                                              (sg, su, sd), scl, ns), x)
        out["k_mlp_i8_us"] = round(1e6 * dt, 1)
        out["k_mlp_i8_roofline_us"] = round((wg.size + wu.size + wd.size) / 819e3, 1)
        print(json.dumps(out), flush=True)

    # ---- prefill alone
    eng = DecodeEngine(lm, mode="bf16")
    max_len = prefill + n_new + 1
    tok0, caches = eng.prefill(ids, max_len)
    jax.block_until_ready(caches[0][0])
    t0 = time.time()
    tok0, caches = eng.prefill(ids, max_len)
    float(jnp.sum(tok0))
    jax.block_until_ready(caches[0][0])
    out["prefill_ms"] = round(1e3 * (time.time() - t0), 1)
    print(json.dumps(out), flush=True)

    # ---- engine decode-only
    run = eng._make_run(n_new)
    args = (eng.layers, eng.embed, eng.final_norm, eng.w_head)

    def engine_decode():
        toks = run(*args, tok0, caches, jnp.int32(prefill))
        float(jnp.sum(toks))

    engine_decode()
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        engine_decode()
    dt = (time.time() - t0) / reps
    out["engine_bf16_ms_per_step"] = round(1e3 * dt / n_new, 2)
    out["engine_bf16_decode_tok_s"] = round(batch * n_new / dt, 1)
    print(json.dumps(out), flush=True)

    stats = DecodeEngine.calibrate_scales(lm, np.asarray(ids)[:2, :256]
                                          if on_tpu else np.asarray(ids))
    eng8 = DecodeEngine(lm, mode="w8a8_static", act_stats=stats)
    run8 = eng8._make_run(n_new)
    args8 = (eng8.layers, eng8.embed, eng8.final_norm, eng8.w_head)

    def engine8_decode():
        toks = run8(*args8, tok0, caches, jnp.int32(prefill))
        float(jnp.sum(toks))

    engine8_decode()
    t0 = time.time()
    for _ in range(reps):
        engine8_decode()
    dt = (time.time() - t0) / reps
    out["engine_w8a8_ms_per_step"] = round(1e3 * dt / n_new, 2)
    out["engine_w8a8_decode_tok_s"] = round(batch * n_new / dt, 1)
    print(json.dumps(out), flush=True)

    # ---- module-path decode-only (prefill outside the timed jit)
    for wname, plan in (("bf16", None),
                        ("w8a8", QuantPlan(
                            default=LayerQuantSpec(
                                mode="w8a8_xla", w_bits=8, a_bits=8,
                                quantize_act=True, act_quant="per_token")
                        ).with_rule("lm_head", None))):
        lm.plan = plan or QuantPlan()
        params = pack_params(lm.params, plan) if plan else lm.params
        model = lm.model
        mcaches = model.init_cache(batch, max_len)

        @jax.jit
        def mprefill(params, ids, caches):
            lg, caches = model.apply({"params": params}, jnp.asarray(ids),
                                     kv_caches=caches, cache_index=0)
            return jnp.argmax(lg[:, -1], axis=-1), caches

        @jax.jit
        def mdecode(params, tok0, caches):
            def body(carry, i):
                tok, cs = carry
                lg, cs = model.apply({"params": params}, tok[:, None],
                                     kv_caches=cs, cache_index=prefill + i)
                nxt = jnp.argmax(lg[:, -1], axis=-1)
                return (nxt, cs), nxt
            (_, _), toks = jax.lax.scan(body, (tok0, caches),
                                        jnp.arange(n_new))
            return toks

        mtok0, mcaches = mprefill(params, ids, mcaches)
        float(jnp.sum(mdecode(params, mtok0, mcaches)))
        t0 = time.time()
        for _ in range(reps):
            float(jnp.sum(mdecode(params, mtok0, mcaches)))
        dt = (time.time() - t0) / reps
        out[f"module_{wname}_ms_per_step"] = round(1e3 * dt / n_new, 2)
        out[f"module_{wname}_decode_tok_s"] = round(batch * n_new / dt, 1)
        print(json.dumps(out), flush=True)
        del params, mcaches
    lm.plan = QuantPlan()


if __name__ == "__main__":
    main()
