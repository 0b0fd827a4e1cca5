#!/usr/bin/env python
"""LLM decode throughput: bf16 vs W4A16 packed (Pallas) on TPU.

Single-stream decode (batch 1) is weight-bandwidth-bound — the regime
the reference's CUDA kernel zoo targets (WQLinear_GEMV etc.).  The whole
decode loop runs inside one jit (lax.scan over the KV cache), so tunnel
dispatch latency is amortized.

Prints one JSON line per variant.
"""

import json
import sys
import time

import jax

from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import jax.numpy as jnp
import numpy as np

from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.models import llama as llama_lib
from qdm_tpu.quant.plan import LayerQuantSpec, QuantPlan
from qdm_tpu.quant.apply import pack_params

BENCH_1B = llama_lib.LlamaConfig(
    vocab_size=32000, hidden_size=2048, intermediate_size=5632,
    num_hidden_layers=22, num_attention_heads=32, num_key_value_heads=4,
    max_position_embeddings=2048)


def decode_loop(model, params, prompt_ids, n_tokens: int, max_len: int,
                cache_dtype=None):
    caches = model.init_cache(prompt_ids.shape[0], max_len, cache_dtype)

    @jax.jit
    def run(params, ids):
        logits, caches2 = model.apply({"params": params}, ids,
                                      kv_caches=caches, cache_index=0)
        tok0 = jnp.argmax(logits[:, -1], axis=-1)

        def body(carry, i):
            tok, cs = carry
            lg, cs = model.apply({"params": params}, tok[:, None],
                                 kv_caches=cs, cache_index=ids.shape[1] + i)
            return (jnp.argmax(lg[:, -1], axis=-1), cs), tok

        (_, _), toks = jax.lax.scan(body, (tok0, caches2),
                                    jnp.arange(n_tokens))
        return toks

    return run


def serve_main():
    """--serve: batched long-context decode (batch 32, ctx 1024) where
    the KV cache read traffic (~1.5 GB/step bf16 at this config)
    rivals the weight traffic (2.2 GB bf16 / 1.1 GB int8) — the regime
    the int8 KV cache targets."""
    on_tpu = jax.default_backend() == "tpu"
    cfg = BENCH_1B if on_tpu else llama_lib.tiny_llama_config()
    batch, prefill, n_new = (32, 1024, 32) if on_tpu else (2, 8, 4)
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    if "--ctx" in sys.argv:
        prefill = int(sys.argv[sys.argv.index("--ctx") + 1])
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    lm = CausalLM.from_config(cfg, dtype=dtype)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (batch, prefill)), jnp.int32)
    # 128-align the module-path cache length: XLA only flash-fuses the
    # prefill attention on aligned seqs — the unaligned 4129 cache at
    # ctx 4096 batch 16 materialized f32 (B,hkv,g,S,T) logits = 34.7 GB
    # (OOM, r3l).  The engine rounds internally already.
    max_len = -(-(prefill + n_new + 1) // 128) * 128

    def timed(model, params, cache_dtype):
        run = decode_loop(model, params, ids, n_new, max_len, cache_dtype)
        float(jnp.sum(run(params, ids)))
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            float(jnp.sum(run(params, ids)))
        return (time.time() - t0) / reps

    if "--ablate" in sys.argv:
        # component ablation of the bf16 serve step: where do the
        # ~25 ms/step go?  (roofline: weights 2.2 GB + cache 0.76 GB
        # ~= 3.7 ms)
        from qdm_tpu.models import llama as _ll

        out = {"metric": f"serve ablation ms/step (batch {batch}, ctx {prefill})"}
        dt_full = timed(lm.model, lm.params, None)
        out["full"] = round(1e3 * dt_full / n_new, 2)
        real_attn = _ll.LlamaAttention.__call__
        real_mlp = _ll.LlamaMLP.__call__

        def no_attn_core(self, x, positions, kv_cache=None, cache_index=None):
            cfg = self.config
            h, d = cfg.num_attention_heads, cfg.head_dim
            q = x @ jnp.zeros((x.shape[-1], h * d), x.dtype)
            return q, kv_cache

        def no_mlp(self, x):
            return x

        def no_kv_read(self, x, positions, kv_cache=None, cache_index=None):
            """Full qkv/rope/update, but attend only over the current
            token — isolates the cache READ (incl. any relayout)."""
            cfg = self.config
            bq, sq, _ = x.shape
            h, hkv, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                         cfg.head_dim)
            q = _ll.QDense(h * d, use_bias=cfg.attention_bias, dtype=self.dtype,
                           plan=self.plan, name="q_proj")(x).reshape(bq, sq, h, d)
            k = _ll.QDense(hkv * d, use_bias=cfg.attention_bias, dtype=self.dtype,
                           plan=self.plan, name="k_proj")(x).reshape(bq, sq, hkv, d)
            v = _ll.QDense(hkv * d, use_bias=cfg.attention_bias, dtype=self.dtype,
                           plan=self.plan, name="v_proj")(x).reshape(bq, sq, hkv, d)
            q = _ll.rope(q, positions, cfg.rope_theta)
            k = _ll.rope(k, positions, cfg.rope_theta)
            kt = k.transpose(0, 2, 1, 3)
            vt = v.transpose(0, 2, 1, 3)
            new_cache = kv_cache
            if kv_cache is not None and len(kv_cache) == 2:
                ck, cv = kv_cache
                ck = jax.lax.dynamic_update_slice(
                    ck, kt.astype(ck.dtype), (0, 0, cache_index, 0))
                cv = jax.lax.dynamic_update_slice(
                    cv, vt.astype(cv.dtype), (0, 0, cache_index, 0))
                new_cache = (ck, cv)
            g = h // hkv
            qg = q.reshape(bq, sq, hkv, g, d)
            logits = jnp.einsum("bqhgd,bhkd->bhgqk", qg, kt).astype(
                jnp.float32) * (d ** -0.5)
            probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhgqk,bhkd->bqhgd", probs, vt).reshape(
                bq, sq, h * d)
            out = _ll.QDense(cfg.hidden_size, use_bias=False, dtype=self.dtype,
                             plan=self.plan, name="o_proj")(out)
            return out, new_cache

        def no_cache_update(self, x, positions, kv_cache=None, cache_index=None):
            """Read the (stale) cache but never write it — isolates the
            dynamic_update_slice cost."""
            out, _ = real_attn(self, x, positions, kv_cache, cache_index)
            return out, kv_cache

        # a raw function assigned to a linen Module __call__ skips the
        # compact/scope wrapping the metaclass applied at class
        # definition — submodules created inside would mis-scope.
        # Re-apply the wrappers by hand for patches that build QDenses.
        from flax.linen.module import wrap_method_once
        from flax.linen import compact as _compact

        no_kv_read = wrap_method_once(_compact(no_kv_read))

        for name, cls, fn, orig in (
                ("attention", _ll.LlamaAttention, no_attn_core, real_attn),
                ("kv_read", _ll.LlamaAttention, no_kv_read, real_attn),
                ("cache_update", _ll.LlamaAttention, no_cache_update, real_attn),
                ("mlp", _ll.LlamaMLP, no_mlp, real_mlp)):
            cls.__call__ = fn
            try:
                dt = timed(lm.model, lm.params, None)
            finally:
                cls.__call__ = orig
            out[f"no_{name}"] = round(1e3 * dt / n_new, 2)
            out[f"{name}_ms"] = round(1e3 * (dt_full - dt) / n_new, 2)
            print(json.dumps(out), flush=True)
        return

    import dataclasses as _dc

    from qdm_tpu.quant.apply import fuse_qkv_params

    out = {"metric": f"LLM 1B serve decode tok/s (batch {batch}, ctx {prefill})"}

    # --kv8 implies engine-only: the KV-dtype crossover is an ENGINE
    # study, and the module rows' ctx-4096 prefill is where the r3l
    # OOM lived
    if "--engine-only" not in sys.argv and "--kv8" not in sys.argv:
        w8 = LayerQuantSpec(mode="w8a8_xla", w_bits=8, a_bits=8,
                            quantize_act=True, act_quant="per_token")
        plan8 = QuantPlan(default=w8).with_rule("lm_head", None)
        plan8f = _dc.replace(plan8, fuse_qkv=True)
        bf16f = QuantPlan(fuse_qkv=True)
        for wname, plan in (("bf16", None), ("bf16_fused", bf16f),
                            ("w8a8", plan8), ("w8a8_fused", plan8f)):
            lm.plan = plan or QuantPlan()
            params = lm.params
            if plan is not None and plan.fuse_qkv:
                params = fuse_qkv_params(params)
            if plan is not None and plan.default.mode != "none":
                params = pack_params(params, plan)
            for cname, cdt in (("kv_bf16", None), ("kv_int8", jnp.int8)):
                dt = timed(lm.model, params, cdt)
                out[f"{wname}_{cname}_tok_s"] = round(batch * n_new / dt, 1)
                print(json.dumps(out), flush=True)
            if params is not lm.params:
                del params
        lm.plan = QuantPlan()

    # --- megakernel engine rows (3 pallas calls per layer; round-3
    # answer to the measured small-op-overhead bound)
    from qdm_tpu.api.serve import DecodeEngine

    stats = DecodeEngine.calibrate_scales(lm, np.asarray(ids)[:4])
    if "--kv8" in sys.argv:
        # int8-KV crossover study: the kv8 attention kernel loses at
        # ctx 1024 (61-67 us vs 51.5 bf16 — VPU dequant overhead) but
        # its HBM saving scales with T while the VPU passes ride the
        # same (g, T) vectors; at long ctx the halved cache read
        # should pay.  Run with --ctx 4096 --batch 16 (module prefill
        # materializes (B, S, vocab) logits).
        rows = (("engine_w8a8", {"mode": "w8a8_static",
                                 "act_stats": stats}),
                ("engine_w8a8_kv8", {"mode": "w8a8_static",
                                     "act_stats": stats,
                                     "kv_dtype": jnp.int8}),
                # channel-static scales: K/V scales fold OUT of the
                # kernel (into q / the output), so the i8c kernel does
                # zero per-token scale arithmetic — the halved cache
                # read should be pure saving at any ctx
                ("engine_w8a8_kv8c", {"mode": "w8a8_static",
                                      "act_stats": stats,
                                      "kv_dtype": jnp.int8,
                                      "kv_scale_mode": "channel"}),
                ("engine_w4a8", {"mode": "w4a8_static",
                                 "act_stats": stats}),
                ("engine_w4a8_kv8", {"mode": "w4a8_static",
                                     "act_stats": stats,
                                     "kv_dtype": jnp.int8}),
                ("engine_w4a8_kv8c", {"mode": "w4a8_static",
                                      "act_stats": stats,
                                      "kv_dtype": jnp.int8,
                                      "kv_scale_mode": "channel"}),
                # int4 KV (channel-static only): packed depth-channel
                # nibble pairs — a QUARTER of the bf16 cache read, and
                # the same zero-scale-arithmetic kernel shape as i8c
                # plus the in-kernel nibble unpack
                ("engine_w8a8_kv4", {"mode": "w8a8_static",
                                     "act_stats": stats,
                                     "kv_dtype": "int4"}),
                ("engine_w4a8_kv4", {"mode": "w4a8_static",
                                     "act_stats": stats,
                                     "kv_dtype": "int4"}))
        for ename, kw in rows:
            eng = DecodeEngine(lm, **kw)
            tok0, caches = eng.prefill(np.asarray(ids), prefill + 41)
            jax.block_until_ready(caches[0][0])
            args = (eng.layers, eng.embed, eng.final_norm, eng.w_head)

            def t(n):
                run = eng._make_run(n)
                best = 1e9
                run(*args, tok0, caches, jnp.int32(prefill))
                for _ in range(5):
                    t0 = time.time()
                    float(jnp.sum(run(*args, tok0, caches,
                                      jnp.int32(prefill))))
                    best = min(best, time.time() - t0)
                return best

            dt = (t(40) - t(8)) / 32
            out[f"{ename}_decode_tok_s"] = round(batch / dt, 1)
            print(json.dumps(out), flush=True)
            del eng, caches
        return

    for ename, kw in (("engine_bf16", {"mode": "bf16"}),
                      ("engine_w8a8", {"mode": "w8a8_static",
                                       "act_stats": stats}),
                      # merged attention+o_proj kernel: one fewer
                      # launch per layer (the unroll probe pinned the
                      # in-scan gap on per-launch fixed cost)
                      ("engine_w8a8_mo", {"mode": "w8a8_static",
                                          "act_stats": stats,
                                          "merge_o": True}),
                      # everything-on serving config: merged dense
                      # megakernel + int8 prefill (prefill is
                      # MXU-bound -> w8a8_xla module path ~1.7x)
                      ("engine_w8a8_full", {"mode": "w8a8_static",
                                            "act_stats": stats,
                                            "merge_o": True,
                                            "prefill_quant": True}),
                      # scan-unroll probe answered (r3c): unroll=4
                      # decode-only 7464.8 vs 7461.7 tok/s — the
                      # in-scan per-layer overhead is inter-kernel
                      # fixed cost, not lax.scan machinery
                      # int4 weights (group-128, planar-packed, int8
                      # MXU): halves decode weight HBM traffic again
                      ("engine_w4a8", {"mode": "w4a8_static",
                                       "act_stats": stats})):
        eng = DecodeEngine(lm, **kw)
        # legacy accounting (prefill + n_new steps, like the module
        # rows) AND decode-only steady state (marginal over token
        # count, min-of-reps) — the legacy number is dominated by the
        # ~0.8 s compute-bound prefill (BENCH_NOTES round 3)
        float(np.sum(eng.generate(np.asarray(ids), n_new)))
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            float(np.sum(eng.generate(np.asarray(ids), n_new)))
        dt = (time.time() - t0) / reps
        out[f"{ename}_tok_s"] = round(batch * n_new / dt, 1)

        tok0, caches = eng.prefill(np.asarray(ids), prefill + 41)
        jax.block_until_ready(caches[0][0])
        args = (eng.layers, eng.embed, eng.final_norm, eng.w_head)

        def t(n):
            run = eng._make_run(n)
            best = 1e9
            run(*args, tok0, caches, jnp.int32(prefill))
            for _ in range(5):
                t0 = time.time()
                float(jnp.sum(run(*args, tok0, caches, jnp.int32(prefill))))
                best = min(best, time.time() - t0)
            return best

        dt = (t(40) - t(8)) / 32
        out[f"{ename}_decode_tok_s"] = round(batch / dt, 1)
        print(json.dumps(out), flush=True)
        del eng, caches


def speculative_main():
    """--speculative: batch-1 tok/s + acceptance-rate table.  The whole
    propose/verify/accept loop runs device-side (one while_loop
    dispatch, generate_speculative_scan) against a device-side plain
    scan baseline.  Drafts: the w8a8 QUANTIZED self-draft (same
    weights int8 — 0.91 top-1 agreement ⇒ ~0.9 acceptance even on
    random weights, ~1.7x cheaper per step) and the truncated-layer
    self-draft (cheap but uncorrelated on random weights — the
    contrast row).  Greedy accept/reject keeps the output
    token-identical to plain generate (tests/test_llm_extras.py)."""
    on_tpu = jax.default_backend() == "tpu"
    cfg = BENCH_1B if on_tpu else llama_lib.tiny_llama_config()
    n_new, prefill = (64, 128) if on_tpu else (12, 8)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    lm = CausalLM.from_config(cfg, dtype=dtype)
    ids = np.random.default_rng(0).integers(0, cfg.vocab_size, (1, prefill))

    def timed(fn):
        fn()
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return best

    # device-side plain baseline: one scan dispatch, like the spec loop
    run_plain = decode_loop(lm.model, lm.params, jnp.asarray(ids), n_new,
                            prefill + n_new + 1)
    dt_plain = timed(lambda: float(jnp.sum(run_plain(lm.params,
                                                     jnp.asarray(ids)))))
    out = {"metric": "LLM 1B speculative decode tok/s (batch 1, "
                     "device-side scan loop)",
           "plain_scanloop_tok_s": round(n_new / dt_plain, 1)}
    print(json.dumps(out), flush=True)

    drafts = [("q8draft", lm.quantized_draft())]
    if on_tpu:
        drafts.append(("draft8L", lm.truncated_draft(8)))
    else:
        drafts.append(("draft1L", lm.truncated_draft(1)))
    for dname, draft in drafts:
        for gamma in (2, 4) if dname.startswith("q8") else (4,):
            dt = timed(lambda: lm.generate_speculative_scan(
                ids, n_new, draft, gamma=gamma))
            st = lm.last_spec_stats
            key = f"{dname}_gamma{gamma}"
            out[key + "_tok_s"] = round(n_new / dt, 1)
            out[key + "_accept"] = round(st["acceptance_rate"], 3)
            out[key + "_rounds"] = st["rounds"]
            print(json.dumps(out), flush=True)

    # acceptance -> speedup performance curve from MEASURED costs:
    # random weights give ~0 acceptance (the draft's argmax over 32k
    # classes almost never matches), so the tok/s rows above exercise
    # the harness but understate real checkpoints (literature: 0.6-0.9
    # self-speculative acceptance).  speedup(a) =
    # (E[accepted]+1) / (gamma*c_draft + c_verify) * c_target
    import time as _t

    def cost(fn, reps=5):
        fn()
        best = 1e9
        for _ in range(reps):
            t0 = _t.time()
            fn()
            best = min(best, _t.time() - t0)
        return best

    draft = lm.quantized_draft()
    gamma = 4
    model, dmodel = lm.model, draft.model
    max_len = ids.shape[1] + 8 + gamma
    t_cache = model.init_cache(1, max_len)
    d_cache = dmodel.init_cache(1, max_len)
    tok = jnp.zeros((1,), jnp.int32)
    toks_g = jnp.zeros((1, gamma + 1), jnp.int32)

    @jax.jit
    def one_target(params, tok, caches):
        lg, caches = model.apply({"params": params}, tok[:, None],
                                 kv_caches=caches, cache_index=8)
        return jnp.argmax(lg[:, -1], -1)

    @jax.jit
    def verify(params, toks, caches):
        lg, caches = model.apply({"params": params}, toks,
                                 kv_caches=caches, cache_index=8)
        return jnp.argmax(lg, -1)

    @jax.jit
    def drafts(params, tok, caches):
        def body(carry, i):
            tok, cs = carry
            lg, cs = dmodel.apply({"params": params}, tok[:, None],
                                  kv_caches=cs, cache_index=8 + i)
            return (jnp.argmax(lg[:, -1], -1), cs), None
        (tok, _), _ = jax.lax.scan(body, (tok, caches), jnp.arange(gamma))
        return tok

    c_t = cost(lambda: float(jnp.sum(one_target(lm.params, tok, t_cache))))
    c_v = cost(lambda: float(jnp.sum(verify(lm.params, toks_g, t_cache))))
    c_d = cost(lambda: float(jnp.sum(drafts(draft.params, tok, d_cache))))
    out["cost_target_step_ms"] = round(1e3 * c_t, 2)
    out["cost_verify_g4_ms"] = round(1e3 * c_v, 2)
    out["cost_q8draft_g4_ms"] = round(1e3 * c_d, 2)
    curve = {}
    for a in (0.0, 0.3, 0.5, 0.7, 0.9):
        exp_acc = sum((a ** i) for i in range(1, gamma + 1))  # E[accepted]
        speedup = (exp_acc + 1) * c_t / (c_d + c_v)
        curve[str(a)] = round(speedup, 2)
    out["projected_speedup_vs_acceptance"] = curve
    print(json.dumps(out), flush=True)


def continuous_main():
    """--continuous: request-stream serving — N ragged requests with
    variable completion budgets through the ContinuousBatcher vs the
    static-batch baseline (sequential generate_ragged batches, every
    row decoded to its batch's longest budget).  Metric: total
    generated tok/s over the stream.  The win scales with the budget
    spread: a static batch wastes (max - each) steps per row; the
    batcher refills those rows from the queue."""
    from qdm_tpu.api.serve import DecodeEngine
    from qdm_tpu.api.batcher import ContinuousBatcher

    on_tpu = jax.default_backend() == "tpu"
    cfg = BENCH_1B if on_tpu else llama_lib.tiny_llama_config()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    n_req, rows, chunk = (64, 16, 16) if on_tpu else (6, 2, 4)
    lo, hi = (16, 256) if on_tpu else (2, 8)
    plen = (64, 256) if on_tpu else (3, 8)
    # capacity sizes the cache the WHOLE stream shares: keep it at the
    # worst-case append position, not bigger (an oversized cache pushes
    # the decode attention into the long-context flash regime for no
    # reason)
    cap = 2048 if on_tpu else 256

    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, cfg.vocab_size, (int(n),)).astype(np.int32)
               for n in rng.integers(plen[0], plen[1], n_req)]
    budgets = [int(b) for b in rng.integers(lo, hi, n_req)]
    lm = CausalLM.from_config(cfg, dtype=dtype)
    eng = lm.serve(mode="w8a8_static" if on_tpu else "bf16",
                   calib_ids=np.asarray(prompts[0])[None]) if on_tpu \
        else DecodeEngine(lm, mode="bf16")
    out = {"metric": "LLM continuous batching (request stream)",
           "n_requests": n_req, "rows": rows,
           "budget_range": [lo, hi], "gen_tokens": int(sum(budgets))}

    cb = ContinuousBatcher(eng, max_batch=rows, chunk=chunk, capacity=cap)
    # warm ALL the jits the timed run hits, including the admission
    # path (2x rows requests force refills) — remote compiles inside
    # the timed region dominated an unwarmed run
    cb.run(prompts[: 2 * rows], max_new_tokens=4)
    t0 = time.time()
    outs = cb.run(prompts, max_new_tokens=budgets)
    dt = time.time() - t0
    n_gen = sum(len(o) - len(p) for o, p in zip(outs, prompts))
    out["continuous_tok_s"] = round(n_gen / dt, 1)
    out["continuous_wall_s"] = round(dt, 2)
    st = cb.last_stats
    out["p50_ttft_s"] = round(st["p50_ttft"], 3)
    out["p95_ttft_s"] = round(st["p95_ttft"], 3)
    out["max_stall_s"] = round(st["max_stall_s"], 3)
    print(json.dumps(out), flush=True)

    # static baseline: fixed batches in arrival order, each decoded to
    # its longest budget (the fixed-batch serving the engine had before)
    t0 = time.time()
    n_gen_s = 0
    for i in range(0, n_req, rows):
        bp = prompts[i:i + rows]
        bb = budgets[i:i + rows]
        outs = eng.generate_ragged(bp, max_new_tokens=max(bb))
        n_gen_s += sum(bb)                      # useful tokens only
    dt_s = time.time() - t0
    out["static_tok_s"] = round(n_gen_s / dt_s, 1)
    out["static_wall_s"] = round(dt_s, 2)
    out["continuous_vs_static"] = round(
        out["continuous_tok_s"] / out["static_tok_s"], 3)
    print(json.dumps(out), flush=True)


def stall_main():
    """--stall: admission-stall anatomy on cold LONG prompts — the
    regime interleaved admissions (``admit_chunk``) exists for.  With
    ~1k-token prompts, a one-shot admission runs a (rows, 1024) ragged
    mini-prefill between two decode chunks: every running request
    stalls for that whole prefill.  admit_chunk=C slices the same work
    into C-token steps, one per decode chunk — bounded per-chunk
    stall.  (The --prefix workload showed the converse: at <=128-token
    suffix admissions interleaving only adds scheduling overhead.)
    Metric per leg: stream tok/s, p95 TTFT, p95/max inter-chunk
    stall."""
    from qdm_tpu.api.serve import DecodeEngine
    from qdm_tpu.api.batcher import ContinuousBatcher

    on_tpu = jax.default_backend() == "tpu"
    cfg = BENCH_1B if on_tpu else llama_lib.tiny_llama_config()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    n_req, rows, chunk = (32, 16, 16) if on_tpu else (6, 2, 4)
    plen = (900, 1024) if on_tpu else (3, 8)
    budget = (32, 128) if on_tpu else (2, 6)
    cap = 2048 if on_tpu else 256

    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, cfg.vocab_size, (int(n),)).astype(np.int32)
               for n in rng.integers(plen[0], plen[1], n_req)]
    budgets = [int(b) for b in rng.integers(budget[0], budget[1], n_req)]
    lm = CausalLM.from_config(cfg, dtype=dtype)
    eng = lm.serve(mode="w8a8_static",
                   calib_ids=np.asarray(prompts[0])[None]) \
        if on_tpu else DecodeEngine(lm, mode="bf16")
    out = {"metric": "LLM admission stalls (cold ~1k-token prompts)",
           "n_requests": n_req, "rows": rows, "prompt_range": list(plen),
           "gen_tokens": int(sum(budgets))}
    for ac in ((0, 128, 256) if on_tpu else (0, 4)):
        cb = ContinuousBatcher(eng, max_batch=rows, chunk=chunk,
                               capacity=cap, admit_chunk=ac)
        # warm every jit the timed run hits, admissions included
        cb.run(prompts[: rows + 2], max_new_tokens=4)
        t0 = time.time()
        outs = cb.run(prompts, max_new_tokens=budgets)
        dt = time.time() - t0
        n_gen = sum(len(o) - len(p) for o, p in zip(outs, prompts))
        st = cb.last_stats
        tag = f"ac{ac}"
        out[f"{tag}_tok_s"] = round(n_gen / dt, 1)
        out[f"{tag}_p95_ttft_s"] = round(st["p95_ttft"], 3)
        out[f"{tag}_p95_stall_s"] = round(st["p95_stall_s"], 3)
        out[f"{tag}_max_stall_s"] = round(st["max_stall_s"], 3)
        print(json.dumps(out), flush=True)


def prefix_main():
    """--prefix: shared-system-prompt serving — N requests that all sit
    on one long common prefix, served through the ContinuousBatcher
    WITH prefix caching (one prefix forward for the stream, admissions
    paste its KV + prefill only the suffix) vs WITHOUT (every request
    prefills prefix+suffix).  The e2e serve cost is prefill-dominated
    (BENCH_NOTES: legacy 1181 vs decode-only 8326 tok/s), so removing
    the per-request prefix forward is the big e2e lever on this
    workload.  Metric: total generated tok/s over the stream."""
    from qdm_tpu.api.serve import DecodeEngine
    from qdm_tpu.api.batcher import ContinuousBatcher

    on_tpu = jax.default_backend() == "tpu"
    cfg = BENCH_1B if on_tpu else llama_lib.tiny_llama_config()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    n_req, rows, chunk = (64, 16, 16) if on_tpu else (6, 2, 4)
    p_len = 896 if on_tpu else 9
    slen = (32, 128) if on_tpu else (3, 8)
    budget = (32, 96) if on_tpu else (2, 6)
    cap = 2048 if on_tpu else 256

    rng = np.random.default_rng(11)
    prefix = rng.integers(0, cfg.vocab_size, (p_len,)).astype(np.int32)
    sufs = [rng.integers(0, cfg.vocab_size, (int(n),)).astype(np.int32)
            for n in rng.integers(slen[0], slen[1], n_req)]
    budgets = [int(b) for b in rng.integers(budget[0], budget[1], n_req)]
    lm = CausalLM.from_config(cfg, dtype=dtype)
    eng = lm.serve(mode="w8a8_static" if on_tpu else "bf16",
                   calib_ids=np.concatenate([prefix, sufs[0]])[None]) \
        if on_tpu else DecodeEngine(lm, mode="bf16")
    out = {"metric": "LLM prefix-cached serving (shared system prompt)",
           "n_requests": n_req, "rows": rows, "prefix_len": p_len,
           "suffix_range": list(slen), "gen_tokens": int(sum(budgets))}

    cb = ContinuousBatcher(eng, max_batch=rows, chunk=chunk, capacity=cap)
    pc = eng.precompute_prefix(prefix)
    # warm both paths' jits (admissions included) outside the timing
    cb.run(sufs[: 2 * rows], max_new_tokens=4, prefix=pc)
    t0 = time.time()
    outs = cb.run(sufs, max_new_tokens=budgets, prefix=pc)
    dt = time.time() - t0
    n_gen = sum(len(o) - len(sfx) for o, sfx in zip(outs, sufs))
    out["prefix_cached_tok_s"] = round(n_gen / dt, 1)
    out["prefix_cached_wall_s"] = round(dt, 2)
    st = cb.last_stats
    out["prefix_p95_ttft_s"] = round(st["p95_ttft"], 3)
    out["prefix_max_stall_s"] = round(st["max_stall_s"], 3)
    print(json.dumps(out), flush=True)

    # interleaved admissions: admission mini-prefill in 128-token
    # slices between decode chunks — same throughput class, bounded
    # per-chunk stall (the latency story)
    cbi = ContinuousBatcher(eng, max_batch=rows, chunk=chunk, capacity=cap,
                            admit_chunk=128)
    cbi.run(sufs[: 2 * rows], max_new_tokens=4, prefix=pc)
    t0 = time.time()
    outs = cbi.run(sufs, max_new_tokens=budgets, prefix=pc)
    dt = time.time() - t0
    n_gen = sum(len(o) - len(sfx) for o, sfx in zip(outs, sufs))
    st = cbi.last_stats
    out["interleaved_tok_s"] = round(n_gen / dt, 1)
    out["interleaved_p95_ttft_s"] = round(st["p95_ttft"], 3)
    out["interleaved_max_stall_s"] = round(st["max_stall_s"], 3)
    print(json.dumps(out), flush=True)

    # baseline: same stream, full [prefix|suffix] prompts, no reuse
    full = [np.concatenate([prefix, sfx]) for sfx in sufs]
    cb.run(full[: 2 * rows], max_new_tokens=4)
    t0 = time.time()
    outs = cb.run(full, max_new_tokens=budgets)
    dt = time.time() - t0
    n_gen = sum(len(o) - len(p) for o, p in zip(outs, full))
    out["full_prefill_tok_s"] = round(n_gen / dt, 1)
    out["full_prefill_wall_s"] = round(dt, 2)
    st = cb.last_stats
    out["full_p95_ttft_s"] = round(st["p95_ttft"], 3)
    out["full_max_stall_s"] = round(st["max_stall_s"], 3)
    out["prefix_vs_full"] = round(
        out["prefix_cached_tok_s"] / out["full_prefill_tok_s"], 3)
    print(json.dumps(out), flush=True)


def swa_main():
    """--swa: sliding-window serving at long context.  A mistral-style
    window turns the decode cache read from O(ctx) into O(window) —
    the engine serves a ROLLING window-slot cache (api/serve.py), so
    at ctx 4096 / window 1024 the attention streams a quarter of the
    cache bytes.  Decode-only marginal, same methodology as --kv8
    (min-of-reps, (t(40)-t(8))/32).  Run with --ctx 4096 --batch 16 to
    match the r3n crossover rows."""
    import dataclasses as _dc

    from qdm_tpu.api.serve import DecodeEngine

    on_tpu = jax.default_backend() == "tpu"
    base = BENCH_1B if on_tpu else llama_lib.tiny_llama_config()
    batch, ctx, window = (16, 4096, 1024) if on_tpu else (2, 32, 8)
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    if "--ctx" in sys.argv:
        ctx = int(sys.argv[sys.argv.index("--ctx") + 1])
    if "--window" in sys.argv:
        window = int(sys.argv[sys.argv.index("--window") + 1])
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    prefill = 128 if on_tpu else 8
    out = {"metric": f"SWA decode tok/s (batch {batch}, ctx {ctx}, "
                     f"window {window})"}

    cfg_full = _dc.replace(base, max_position_embeddings=2 * ctx)
    cfg_win = _dc.replace(cfg_full, sliding_window=window)
    ids = np.random.default_rng(0).integers(
        0, base.vocab_size, (batch, prefill))

    for cname, cfg in (("full", cfg_full), ("win", cfg_win)):
        lm = CausalLM.from_config(cfg, dtype=dtype)
        stats = DecodeEngine.calibrate_scales(lm, np.asarray(ids)[:2])
        rows = [("bf16", {"mode": "bf16"}),
                ("w8a8", {"mode": "w8a8_static", "act_stats": stats}),
                ("w8a8_kv8c", {"mode": "w8a8_static", "act_stats": stats,
                               "kv_dtype": jnp.int8,
                               "kv_scale_mode": "channel"}),
                ("w4a8", {"mode": "w4a8_static", "act_stats": stats}),
                ("w4a8_kv4", {"mode": "w4a8_static", "act_stats": stats,
                              "kv_dtype": "int4"})]
        for ename, kw in rows:
            eng = DecodeEngine(lm, **kw)
            # max_len past the window -> the 'win' engine serves the
            # rolling window-length cache; 'full' a ctx-length one.
            # start_pos = ctx puts both in long-context steady state
            # (slots beyond the prompt hold zeros — same traffic).
            tok0, caches = eng.prefill(np.asarray(ids), ctx + 41)
            jax.block_until_ready(caches[0][0])
            args = (eng.layers, eng.embed, eng.final_norm, eng.w_head)

            def t(n):
                run = eng._make_run(n)
                best = 1e9
                run(*args, tok0, caches, jnp.int32(ctx))
                for _ in range(5):
                    t0 = time.time()
                    float(jnp.sum(run(*args, tok0, caches,
                                      jnp.int32(ctx))))
                    best = min(best, time.time() - t0)
                return best

            dt = (t(40) - t(8)) / 32
            out[f"{cname}_{ename}_decode_tok_s"] = round(batch / dt, 1)
            out[f"{cname}_{ename}_cache_T"] = int(caches[0][0].shape[-1])
            print(json.dumps(out), flush=True)
            del eng, caches
        del lm, stats


def moe_main():
    """--moe: Mixtral-class sparse MoE decode.  Engine stacked-expert
    einsums vs the module path's per-expert QDense calls (dense-exact
    routing both ways — same math, different launch structure).
    Decode-only marginal, --kv8 methodology."""
    import dataclasses as _dc

    from qdm_tpu.api.serve import DecodeEngine

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # 8 layers: params init f32 on the chip before the bf16 cast
        # (1.5x the f32 tree peak) and the module-path jit needs its
        # own workspace on top — 12 layers still RESOURCE_EXHAUSTED at
        # run time; 8 layers = 4.5 GB f32 peak + 2.2 GB bf16.  The
        # engine-vs-module launch-structure comparison is per-layer
        # marginal, so the depth doesn't change the verdict.
        cfg = _dc.replace(BENCH_1B, num_experts=8, num_experts_per_tok=2,
                          num_hidden_layers=8)
        batch, prefill = 32, 128
    else:
        cfg = llama_lib.tiny_mixtral_config()
        batch, prefill = 2, 8
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    out = {"metric": f"MoE 8-expert 8L decode tok/s (batch {batch})"}

    lm = CausalLM.from_config(cfg, dtype=dtype)
    if on_tpu:
        lm.params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), lm.params)
    ids = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (batch, prefill))
    n_new = 32 if on_tpu else 4
    max_len = -(-(prefill + n_new + 1) // 128) * 128

    # module path (per-expert QDense calls inside the jitted scan)
    run = decode_loop(lm.model, lm.params, jnp.asarray(ids), n_new, max_len)
    float(jnp.sum(run(lm.params, jnp.asarray(ids))))
    t0 = time.time()
    for _ in range(3):
        float(jnp.sum(run(lm.params, jnp.asarray(ids))))
    dt = (time.time() - t0) / 3
    out["module_bf16_tok_s"] = round(batch * n_new / dt, 1)
    print(json.dumps(out), flush=True)

    stats = DecodeEngine.calibrate_scales(lm, np.asarray(ids)[:2])
    for ename, kw in (("engine_bf16", {"mode": "bf16"}),
                      ("engine_w8a8", {"mode": "w8a8_static",
                                       "act_stats": stats}),
                      ("engine_w4a8", {"mode": "w4a8_static",
                                       "act_stats": stats})):
        eng = DecodeEngine(lm, **kw)
        tok0, caches = eng.prefill(np.asarray(ids), prefill + 41)
        jax.block_until_ready(caches[0][0])
        args = (eng.layers, eng.embed, eng.final_norm, eng.w_head)

        def t(n):
            r = eng._make_run(n)
            best = 1e9
            r(*args, tok0, caches, jnp.int32(prefill))
            for _ in range(5):
                t0 = time.time()
                float(jnp.sum(r(*args, tok0, caches, jnp.int32(prefill))))
                best = min(best, time.time() - t0)
            return best

        dt = (t(40) - t(8)) / 32
        out[f"{ename}_decode_tok_s"] = round(batch / dt, 1)
        print(json.dumps(out), flush=True)
        del eng, caches


def swa_stream_main():
    """--swa-stream: long-generation request streams through the
    ContinuousBatcher.  A sliding-window model serves in a cache of
    capacity ~ window + admission width (the floored starts let
    rebasing reclaim the dead pre-window tail every few chunks), while
    a full-attention model must size capacity to the longest request's
    whole span — and since the ragged decode kernels stream the whole
    capacity-wide cache every step, capacity IS the per-step cache
    read.  Same stream, both models, each at its minimal capacity."""
    import dataclasses as _dc

    from qdm_tpu.api.batcher import ContinuousBatcher
    from qdm_tpu.api.serve import DecodeEngine

    on_tpu = jax.default_backend() == "tpu"
    base = BENCH_1B if on_tpu else llama_lib.tiny_llama_config()
    window = 1024 if on_tpu else 8
    if on_tpu:
        n_req, rows, chunk = 32, 16, 16
        plen, budget = (128, 256), (1536, 2048)
        cap_win, cap_full = 1536, 2432
    else:
        n_req, rows, chunk = 6, 2, 4
        plen, budget = (3, 8), (12, 20)
        cap_win, cap_full = 160, 160
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, base.vocab_size, (int(n),)).astype(np.int32)
               for n in rng.integers(plen[0], plen[1], n_req)]
    budgets = [int(b) for b in rng.integers(budget[0], budget[1], n_req)]
    out = {"metric": "SWA long-generation stream tok/s",
           "n_requests": n_req, "rows": rows, "window": window,
           "gen_tokens": int(sum(budgets))}

    for name, cfg, cap in (
            ("win", _dc.replace(base, sliding_window=window,
                                max_position_embeddings=8192), cap_win),
            ("full", _dc.replace(base, max_position_embeddings=8192),
             cap_full)):
        lm = CausalLM.from_config(cfg, dtype=dtype)
        if on_tpu:
            eng = lm.serve(mode="w8a8_static",
                           calib_ids=np.asarray(prompts[0])[None])
        else:
            eng = DecodeEngine(lm, mode="bf16")
        cb = ContinuousBatcher(eng, max_batch=rows, chunk=chunk,
                               capacity=cap)
        cb.run(prompts[: 2 * rows], max_new_tokens=chunk)  # warm jits
        t0 = time.time()
        outs = cb.run(prompts, max_new_tokens=budgets)
        dt = time.time() - t0
        n_gen = sum(len(o) - len(p) for o, p in zip(outs, prompts))
        out[f"{name}_capacity"] = cap
        out[f"{name}_tok_s"] = round(n_gen / dt, 1)
        out[f"{name}_rebases"] = cb.last_stats["rebases"]
        print(json.dumps(out), flush=True)
        del eng, cb, lm


def gemma2_main():
    """--gemma2: cost of the gemma2 serving features at the 1B serve
    shape — same geometry with and without (softcaps + sandwich norms
    + alternating windows), engine decode-only marginal.  The windowed
    half of the layers reads a quarter of the cache at ctx 4096, the
    tanh epilogue adds VPU work, the sandwich post-norms add two XLA
    dispatches per layer; this row nets them out."""
    import dataclasses as _dc

    from qdm_tpu.api.serve import DecodeEngine

    on_tpu = jax.default_backend() == "tpu"
    base = BENCH_1B if on_tpu else llama_lib.tiny_llama_config()
    batch, ctx, window = (16, 4096, 1024) if on_tpu else (2, 32, 8)
    prefill = 128 if on_tpu else 8
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    base = _dc.replace(base, max_position_embeddings=2 * ctx)
    g2 = _dc.replace(base, sliding_window=window, sliding_window_pattern=2,
                     attn_logit_softcapping=50.0,
                     final_logit_softcapping=30.0, sandwich_norms=True,
                     norm_plus_one=True)
    ids = np.random.default_rng(0).integers(0, base.vocab_size,
                                            (batch, prefill))
    out = {"metric": f"gemma2-features decode tok/s (batch {batch}, "
                     f"ctx {ctx}, window {window})"}
    for cname, cfg in (("plain", base), ("gemma2", g2)):
        lm = CausalLM.from_config(cfg, dtype=dtype)
        stats = DecodeEngine.calibrate_scales(lm, np.asarray(ids)[:2])
        for ename, kw in (("bf16", {"mode": "bf16"}),
                          ("w8a8", {"mode": "w8a8_static",
                                    "act_stats": stats})):
            eng = DecodeEngine(lm, **kw)
            tok0, caches = eng.prefill(np.asarray(ids), ctx + 41)
            jax.block_until_ready(caches[0][0])
            args = (eng.layers, eng.embed, eng.final_norm, eng.w_head)

            def t(n):
                run = eng._make_run(n)
                best = 1e9
                run(*args, tok0, caches, jnp.int32(ctx))
                for _ in range(5):
                    t0 = time.time()
                    float(jnp.sum(run(*args, tok0, caches,
                                      jnp.int32(ctx))))
                    best = min(best, time.time() - t0)
                return best

            dt = (t(40) - t(8)) / 32
            out[f"{cname}_{ename}_decode_tok_s"] = round(batch / dt, 1)
            print(json.dumps(out), flush=True)
            del eng, caches
        del lm, stats


def qknorm_main():
    """--qknorm: decode cost of the qwen3/gemma3 serving features at
    the 1B serve shape — plain vs qk_norm (per-head q/k RMSNorm; rope
    leaves the kernel epilogue for XLA, the phi machinery) vs the full
    gemma3 stack (qk_norm + sandwich norms + alternating windows +
    dual rope).  Engine decode-only marginal."""
    import dataclasses as _dc

    from qdm_tpu.api.serve import DecodeEngine

    on_tpu = jax.default_backend() == "tpu"
    base = BENCH_1B if on_tpu else llama_lib.tiny_llama_config()
    batch, ctx, window = (16, 4096, 1024) if on_tpu else (2, 32, 8)
    prefill = 128 if on_tpu else 8
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    base = _dc.replace(base, max_position_embeddings=2 * ctx)
    q3 = _dc.replace(base, qk_norm=True)
    g3 = _dc.replace(base, qk_norm=True, sliding_window=window,
                     sliding_window_pattern=2, sandwich_norms=True,
                     norm_plus_one=True, rope_theta=1000000.0,
                     rope_local_theta=10000.0, rope_scaling_factor=8.0)
    ids = np.random.default_rng(0).integers(0, base.vocab_size,
                                            (batch, prefill))
    out = {"metric": f"qk-norm/gemma3-features decode tok/s (batch "
                     f"{batch}, ctx {ctx}, window {window})"}
    for cname, cfg in (("plain", base), ("qknorm", q3), ("gemma3", g3)):
        lm = CausalLM.from_config(cfg, dtype=dtype)
        stats = DecodeEngine.calibrate_scales(lm, np.asarray(ids)[:2])
        for ename, kw in (("bf16", {"mode": "bf16"}),
                          ("w8a8", {"mode": "w8a8_static",
                                    "act_stats": stats}),
                          ("w4a8", {"mode": "w4a8_static",
                                    "act_stats": stats})):
            eng = DecodeEngine(lm, **kw)
            tok0, caches = eng.prefill(np.asarray(ids), ctx + 41)
            jax.block_until_ready(caches[0][0])
            args = (eng.layers, eng.embed, eng.final_norm, eng.w_head)

            def t(n):
                run = eng._make_run(n)
                best = 1e9
                run(*args, tok0, caches, jnp.int32(ctx))
                for _ in range(5):
                    t0 = time.time()
                    float(jnp.sum(run(*args, tok0, caches,
                                      jnp.int32(ctx))))
                    best = min(best, time.time() - t0)
                return best

            dt = (t(40) - t(8)) / 32
            out[f"{cname}_{ename}_decode_tok_s"] = round(batch / dt, 1)
            print(json.dumps(out), flush=True)
            del eng, caches
        del lm, stats


def stream_main():
    """--stream: the r5 verdict's realistic request stream — 64
    requests, ~1k-token cold prompts, ~128 new tokens each — through
    the ContinuousBatcher with INTERLEAVED prefill/decode scheduling
    (admit_chunk: incoming requests' prefills advance in fixed-size
    chunks BETWEEN decode steps of the live batch, hiding prompt cost
    instead of serializing it) vs one-shot admissions vs the
    sequential static-batch baseline (the 'legacy' accounting whose
    batch-32/ctx-1024/32-new row reads 1738 tok/s).  Two budget
    mixes: uniform 128 (the verdict's literal shape — admissions
    arrive in waves) and a [32, 224] spread around the same mean (the
    regime continuous batching exists for).  Exactness: a sample of
    requests re-served single-prompt must match token-for-token."""
    from qdm_tpu.api.serve import DecodeEngine
    from qdm_tpu.api.batcher import ContinuousBatcher

    on_tpu = jax.default_backend() == "tpu"
    cfg = BENCH_1B if on_tpu else llama_lib.tiny_llama_config()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    n_req, rows, chunk = (64, 32, 16) if on_tpu else (6, 2, 4)
    plen = (960, 1025) if on_tpu else (3, 8)
    cap = 2560 if on_tpu else 256

    rng = np.random.default_rng(13)
    prompts = [rng.integers(0, cfg.vocab_size, (int(n),)).astype(np.int32)
               for n in rng.integers(plen[0], plen[1], n_req)]
    lm = CausalLM.from_config(cfg, dtype=dtype)
    # prefill_quant=True: the static-int8 prefill path serves the
    # initial ragged prefill AND every admission mini-prefill (all
    # prefill flavors run the engine's snapshot model) — 0.454 vs
    # 0.58 s at (32, 1024), BENCH_NOTES r4
    eng = lm.serve(mode="w8a8_static", prefill_quant=True,
                   calib_ids=np.asarray(prompts[0])[None]) if on_tpu \
        else DecodeEngine(lm, mode="bf16")
    longtail = ([64] * (n_req - n_req // 5) + [512] * (n_req // 5)) \
        if on_tpu else [2] * (n_req - 1) + [6]
    rng.shuffle(longtail)
    mixes = {
        "uniform128": [128 if on_tpu else 4] * n_req,
        "spread": [int(b) for b in rng.integers(
            *((32, 225) if on_tpu else (2, 7)), n_req)],
        # 20% of requests decode 8x longer: static batches decode every
        # row to the batch max — the regime continuous batching wins
        "longtail": [int(b) for b in longtail],
    }
    out = {"metric": "LLM request-stream serving (interleaved "
                     "prefill/decode)",
           "n_requests": n_req, "rows": rows, "prompt_range": list(plen)}
    if on_tpu:
        # sequential-legacy anchor: one dense batch-32 generate at this
        # stream's shape (ctx 1024, 128 new) — the same accounting
        # whose 32-new row reads 1738 tok/s (BENCH_NOTES r4)
        ids_dense = rng.integers(0, cfg.vocab_size,
                                 (rows, 1024)).astype(np.int32)
        eng.generate(ids_dense, max_new_tokens=128)          # warm
        t0 = time.time()
        eng.generate(ids_dense, max_new_tokens=128)
        out["legacy_dense_b32_tok_s"] = round(
            rows * 128 / (time.time() - t0), 1)
        print(json.dumps(out), flush=True)
    for mix, budgets in mixes.items():
        out[f"{mix}_gen_tokens"] = int(sum(budgets))
        # legs: (admit_chunk, admit_batch, admit_min_free).  The
        # spread mix adds the small-wave admission legs (fixed 8-row
        # mini-prefills + 4-row wave coalescing) — full-width
        # admissions dominated variable-budget streams (first r5 run:
        # spread 790-949 tok/s vs uniform 2185)
        legs = [(0, 0, 1), (128, 0, 1)] if on_tpu else [(0, 0, 1),
                                                        (4, 2, 2)]
        if mix == "spread" and on_tpu:
            legs += [(0, 8, 4), (128, 8, 4)]
        if mix == "longtail" and on_tpu:
            legs = [(0, 0, 1), (0, 8, 4)]
        for ac, ab, mf in legs:
            cb = ContinuousBatcher(eng, max_batch=rows, chunk=chunk,
                                   capacity=cap, admit_chunk=ac,
                                   admit_batch=ab, admit_min_free=mf)
            cb.run(prompts[: rows + 2], max_new_tokens=4)   # warm jits
            t0 = time.time()
            outs = cb.run(prompts, max_new_tokens=budgets)
            dt = time.time() - t0
            n_gen = sum(len(o) - len(p) for o, p in zip(outs, prompts))
            st = cb.last_stats
            tag = f"{mix}_ac{ac}" + (f"_ab{ab}mf{mf}" if ab else "")
            out[f"{tag}_tok_s"] = round(n_gen / dt, 1)
            out[f"{tag}_p95_ttft_s"] = round(st["p95_ttft"], 3)
            out[f"{tag}_p95_stall_s"] = round(st["p95_stall_s"], 3)
            print(json.dumps(out), flush=True)
            if (ac or ab) and mix == "spread":
                # agreement spot-check vs single-prompt serving.  The
                # BIT-exactness contract is pinned on the f32 CPU suite
                # (test_continuous_batching_*); on-chip bf16 shows the
                # documented program-shape argmax sensitivity (prefill
                # widths differ between the stream and a single-prompt
                # run), so report the token-agreement fraction
                agree, tot = 0, 0
                sample = [0, n_req // 3, 2 * n_req // 3, n_req - 1]
                for i in sample:
                    solo = np.asarray(eng.generate_ragged(
                        [prompts[i]], max_new_tokens=budgets[i])[0])
                    got = np.asarray(outs[i])
                    nn = min(len(solo), len(got))
                    agree += int((solo[:nn] == got[:nn]).sum())
                    tot += nn
                out[f"agree_{tag}"] = round(agree / tot, 4)
        # static baseline per mix: fixed batches in arrival order,
        # each decoded to its longest budget.  WARM every jit shape
        # the timed loop hits first (the decode scan is per-length;
        # unwarmed remote compiles inside the timed region made the
        # first static pass read 4x slow) — the continuous legs above
        # get the same treatment via their warm cb.run.
        for mx in sorted({max(budgets[i:i + rows])
                          for i in range(0, n_req, rows)}):
            eng.generate_ragged(prompts[:rows], max_new_tokens=mx)
        t0 = time.time()
        n_gen_s = 0
        for i in range(0, n_req, rows):
            bp = prompts[i:i + rows]
            bb = budgets[i:i + rows]
            eng.generate_ragged(bp, max_new_tokens=max(bb))
            n_gen_s += sum(bb)
        dt_s = time.time() - t0
        out[f"{mix}_static_tok_s"] = round(n_gen_s / dt_s, 1)
        best = max((v for k, v in out.items()
                    if k.startswith(f"{mix}_ac") and k.endswith("_tok_s")),
                   default=0)
        out[f"{mix}_continuous_vs_static"] = round(
            best / out[f"{mix}_static_tok_s"], 3)
        print(json.dumps(out), flush=True)


def mla_main():
    """--mla: the MLA latent-cache decode win on chip (VERDICT r4 #1
    done-criterion).  DeepSeek-v2-lite attention geometry (h16,
    dn128/dr64/dv128, r512 — the latent cache is r+dr = 576
    floats/token) vs an MHA model of equal size (h16 d128: the cache
    is 2*h*d = 4096 floats/token, 7.1x more).  Large-batch long-ctx
    decode is cache-read-bound (BENCH_NOTES: decode rides the HBM
    roofline), so the latent cache is exactly the axis the engine's
    absorbed-form MLA path (serve.py::_mla_layer) exists to exploit —
    in BANDWIDTH (tok/s at a shape both fit) and in CAPACITY (legs
    where the MHA cache alone blows the 16 GB chip are recorded as
    OOM; MLA serves them with room to spare).  Decode-only marginal,
    (t(40)-t(8))/32, min-of-reps."""
    import dataclasses as _dc

    from qdm_tpu.api.serve import DecodeEngine

    on_tpu = jax.default_backend() == "tpu"
    legs = ([(16, 512), (16, 1024), (16, 2048), (32, 1024), (32, 4096)]
            if on_tpu else [(2, 32)])
    prefill = 128 if on_tpu else 8
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    if on_tpu:
        cfg_mla = llama_lib.LlamaConfig(
            vocab_size=32000, hidden_size=2048, intermediate_size=5632,
            num_hidden_layers=22, num_attention_heads=16,
            num_key_value_heads=16, max_position_embeddings=16384,
            q_lora_rank=None, kv_lora_rank=512, qk_nope_head_dim=128,
            qk_rope_head_dim=64, v_head_dim=128)
        cfg_mha = llama_lib.LlamaConfig(
            vocab_size=32000, hidden_size=2048, intermediate_size=5632,
            num_hidden_layers=22, num_attention_heads=16,
            num_key_value_heads=16, head_dim_override=128,
            max_position_embeddings=16384)
    else:
        cfg_mla = llama_lib.tiny_deepseek_config(
            q_lora_rank=None, num_experts=0, n_shared_experts=0,
            first_k_dense_replace=0)
        cfg_mha = llama_lib.tiny_llama_config()
    out = {"metric": "MLA latent-cache decode",
           "cache_floats_per_token": {
               "mla": (cfg_mla.kv_lora_rank + cfg_mla.qk_rope_head_dim),
               "mha": 2 * cfg_mha.num_key_value_heads * cfg_mha.head_dim}}
    # MHA first: its caches are the big ones — run them against a
    # clean HBM (the first ordering left the MLA model's arrays/jit
    # constants resident and every MHA leg read OOM).  --only mla|mha
    # runs one model per process (the robust form: each model's
    # engines + caches get the whole chip).
    models = [("mha", cfg_mha), ("mla", cfg_mla)]
    if "--only" in sys.argv:
        pick = sys.argv[sys.argv.index("--only") + 1]
        models = [(n, c) for n, c in models if n == pick]
    for name, cfg in models:
        lm = CausalLM.from_config(cfg, dtype=dtype)
        out[f"{name}_params_M"] = round(sum(
            np.prod(x.shape) for x in jax.tree.leaves(lm.params)) / 1e6)
        ids0 = np.random.default_rng(0).integers(0, cfg.vocab_size,
                                                 (2, prefill))
        stats = DecodeEngine.calibrate_scales(lm, np.asarray(ids0))
        for ename, kw in (("bf16", {"mode": "bf16"}),
                          ("w8a8", {"mode": "w8a8_static",
                                    "act_stats": stats})):
            try:
                eng = DecodeEngine(lm, **kw)
            except Exception as e:
                out[f"{name}_{ename}"] = ("OOM" if "RESOURCE_EXHAUSTED"
                                          in str(e) else str(e)[:60])
                print(json.dumps(out), flush=True)
                continue
            for batch, ctx in legs:
                tag = f"{name}_{ename}_b{batch}_ctx{ctx}"
                ids = np.random.default_rng(0).integers(
                    0, cfg.vocab_size, (batch, prefill))
                try:
                    tok0, caches = eng.prefill(np.asarray(ids), ctx + 41)
                    jax.block_until_ready(caches[0][0])
                    args = (eng.layers, eng.embed, eng.final_norm,
                            eng._head)

                    def t(n):
                        run = eng._make_run(n)
                        best = 1e9
                        run(*args, tok0, caches, jnp.int32(ctx))
                        for _ in range(5):
                            t0 = time.time()
                            float(jnp.sum(run(*args, tok0, caches,
                                              jnp.int32(ctx))))
                            best = min(best, time.time() - t0)
                        return best

                    dt = (t(40) - t(8)) / 32
                    out[tag + "_decode_tok_s"] = round(batch / dt, 1)
                    del caches
                except Exception as e:
                    # the MHA cache (4096 f/t) at batch-32 long ctx
                    # exceeds the 16 GB chip — itself the capacity half
                    # of the MLA story
                    out[tag] = ("OOM" if "RESOURCE_EXHAUSTED" in str(e)
                                else f"ERR: {str(e)[:60]}")
                print(json.dumps(out), flush=True)
            del eng
            jax.clear_caches()
        del lm, stats
        import gc

        gc.collect()
        jax.clear_caches()


def b1_main():
    """--b1: the batch-1 decode ladder (VERDICT r4 weak #4).  Engine
    bf16 at B=1 measured 0.88x the module path in r3 (3 pallas
    launches/layer with no batch to amortize them); r5 routes batch-1
    bf16 through the pure-XLA layer variant (_layer_xla_b1) on the
    engine's extracted fused weights.  Rows: module bf16, engine bf16
    (XLA variant), engine w8a8/w4a8 for the ladder context.
    Decode-only marginal, (t(40)-t(8))/32."""
    from qdm_tpu.api.serve import DecodeEngine

    on_tpu = jax.default_backend() == "tpu"
    cfg = BENCH_1B if on_tpu else llama_lib.tiny_llama_config()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    ctx = 1024 if on_tpu else 32
    prefill = 128 if on_tpu else 8
    lm = CausalLM.from_config(cfg, dtype=dtype)
    ids = np.random.default_rng(0).integers(0, cfg.vocab_size, (1, prefill))
    out = {"metric": f"batch-1 decode tok/s (ctx {ctx})"}

    # module path baseline: jitted prefill+scan loop
    run_mod = decode_loop(lm.model, lm.params, jnp.asarray(ids), 40,
                          ctx + 41)
    run_mod8 = decode_loop(lm.model, lm.params, jnp.asarray(ids), 8,
                           ctx + 41)
    for _ in range(2):
        float(jnp.sum(run_mod(lm.params, jnp.asarray(ids))))
        float(jnp.sum(run_mod8(lm.params, jnp.asarray(ids))))
    best40 = best8 = 1e9
    for _ in range(5):
        t0 = time.time()
        float(jnp.sum(run_mod(lm.params, jnp.asarray(ids))))
        best40 = min(best40, time.time() - t0)
        t0 = time.time()
        float(jnp.sum(run_mod8(lm.params, jnp.asarray(ids))))
        best8 = min(best8, time.time() - t0)
    out["module_bf16_tok_s"] = round(32 / (best40 - best8), 1)
    print(json.dumps(out), flush=True)

    stats = DecodeEngine.calibrate_scales(lm, np.asarray(ids))
    rows = [("engine_bf16_xla_b1", {"mode": "bf16"}),
            ("engine_w8a8", {"mode": "w8a8_static", "act_stats": stats}),
            ("engine_w4a8", {"mode": "w4a8_static", "act_stats": stats})]
    for name, kw in rows:
        eng = DecodeEngine(lm, **kw)
        tok0, caches = eng.prefill(np.asarray(ids), ctx + 41)
        jax.block_until_ready(caches[0][0])
        args = (eng.layers, eng.embed, eng.final_norm, eng._head)

        def t(n):
            run = eng._make_run(n)
            best = 1e9
            run(*args, tok0, caches, jnp.int32(ctx))
            for _ in range(5):
                t0 = time.time()
                float(jnp.sum(run(*args, tok0, caches, jnp.int32(ctx))))
                best = min(best, time.time() - t0)
            return best

        dt = (t(40) - t(8)) / 32
        out[f"{name}_tok_s"] = round(1 / dt, 1)
        print(json.dumps(out), flush=True)
        del eng, caches
    if "engine_bf16_xla_b1_tok_s" in out:
        out["engine_bf16_vs_module"] = round(
            out["engine_bf16_xla_b1_tok_s"] / out["module_bf16_tok_s"], 3)
        print(json.dumps(out), flush=True)


def main():
    if "--b1" in sys.argv:
        b1_main()
        return
    if "--mla" in sys.argv:
        mla_main()
        return
    if "--stream" in sys.argv:
        stream_main()
        return
    if "--gemma2" in sys.argv:
        gemma2_main()
        return
    if "--qknorm" in sys.argv:
        qknorm_main()
        return
    if "--swa-stream" in sys.argv:
        swa_stream_main()
        return
    if "--moe" in sys.argv:
        moe_main()
        return
    if "--swa" in sys.argv:
        swa_main()
        return
    if "--stall" in sys.argv:
        stall_main()
        return
    if "--prefix" in sys.argv:
        prefix_main()
        return
    if "--continuous" in sys.argv:
        continuous_main()
        return
    if "--serve" in sys.argv:
        serve_main()
        return
    if "--speculative" in sys.argv:
        speculative_main()
        return
    on_tpu = jax.default_backend() == "tpu"
    cfg = BENCH_1B if on_tpu else llama_lib.tiny_llama_config()
    n_new, prefill = (64, 128) if on_tpu else (4, 8)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    lm = CausalLM.from_config(cfg, dtype=dtype)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (1, prefill)), jnp.int32)
    max_len = prefill + n_new + 1

    def timed(model, params):
        run = decode_loop(model, params, ids, n_new, max_len)
        toks = run(params, ids)
        jax.block_until_ready(toks)
        float(jnp.sum(toks))  # force completion
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            toks = run(params, ids)
            float(jnp.sum(toks))
        return (time.time() - t0) / reps

    dt_bf = timed(lm.model, lm.params)
    out = {"metric": "LLM 1B decode tok/s (batch 1)",
           "bf16_tok_s": round(n_new / dt_bf, 1)}

    specs = {
        "w4a16": LayerQuantSpec(mode="w4a16", w_bits=4, group_size=128,
                                zero_point=True),
        "w4a8": LayerQuantSpec(mode="w4a8", w_bits=4, group_size=128,
                               zero_point=True),
        # weight-only int8 with the dequant fused by XLA into the matmul
        # operand stream: halves the weight bytes (decode is
        # weight-bandwidth-bound) with no Pallas per-call overhead
        "w8a16": LayerQuantSpec(mode="w8a16", w_bits=8),
        # int8 x int8 in plain XLA, dynamic per-token act scale
        "w8a8_xla": LayerQuantSpec(mode="w8a8_xla", w_bits=8, a_bits=8,
                                   quantize_act=True, act_quant="per_token"),
        # weight-only int4 nibble-packed in plain XLA (1/4 weight bytes)
        "w4a16_xla": LayerQuantSpec(mode="w4a16_xla", w_bits=4,
                                    group_size=128),
    }
    plans = {mode: QuantPlan(default=spec).with_rule("lm_head", None)
             for mode, spec in specs.items()}
    # fused qkv + gate_up on the best int8 config (see the fused-QKV
    # int8 bisect, BENCH_NOTES.md)
    import dataclasses as _dc
    plans["w8a8_xla_fused"] = _dc.replace(plans["w8a8_xla"], fuse_qkv=True)
    from qdm_tpu.quant.apply import fuse_qkv_params
    for mode, plan in plans.items():
        base = fuse_qkv_params(lm.params) if plan.fuse_qkv else lm.params
        qparams = pack_params(base, plan)
        lm.plan = plan
        dt_q = timed(lm.model, qparams)
        out[f"{mode}_tok_s"] = round(n_new / dt_q, 1)
        out[f"{mode}_speedup"] = round(dt_bf / dt_q, 3)
        print(json.dumps(out), flush=True)
    lm.plan = QuantPlan()

    # --- megakernel engine rows (batch-1 latency regime)
    from qdm_tpu.api.serve import DecodeEngine

    stats = DecodeEngine.calibrate_scales(lm, np.asarray(ids))
    for ename, kw in (("engine_bf16", {"mode": "bf16"}),
                      ("engine_w8a8", {"mode": "w8a8_static",
                                       "act_stats": stats}),
                      # int4 weights: batch-1 decode is the
                      # weight-bandwidth-bound regime where the 4x
                      # byte saving pays most
                      ("engine_w4a8", {"mode": "w4a8_static",
                                       "act_stats": stats}),
                      # batch-1 launch-overhead levers: merged
                      # o_proj+res+MLP megakernel (2 launches/layer —
                      # neutral at batch 32 where launches overlap
                      # compute, but engine bf16 = 0.88x at batch 1
                      # shows fixed cost dominates here) and the int8
                      # lm_head (the single largest weight read)
                      ("engine_w8a8_mo", {"mode": "w8a8_static",
                                          "act_stats": stats,
                                          "merge_o": True}),
                      ("engine_w4a8_mo", {"mode": "w4a8_static",
                                          "act_stats": stats,
                                          "merge_o": True}),
                      ("engine_w4a8_mo_h8", {"mode": "w4a8_static",
                                             "act_stats": stats,
                                             "merge_o": True,
                                             "head_quant": "int8"}),
                      # int4 head: quarters the single largest weight
                      # read (131 MB bf16 -> 33 MB)
                      ("engine_w4a8_mo_h4", {"mode": "w4a8_static",
                                             "act_stats": stats,
                                             "merge_o": True,
                                             "head_quant": "int4"})):
        eng = DecodeEngine(lm, **kw)
        float(np.sum(eng.generate(np.asarray(ids), n_new)))
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            float(np.sum(eng.generate(np.asarray(ids), n_new)))
        dt = (time.time() - t0) / reps
        out[f"{ename}_tok_s"] = round(n_new / dt, 1)
        out[f"{ename}_speedup"] = round(dt_bf / dt, 3)
        print(json.dumps(out), flush=True)
        del eng


if __name__ == "__main__":
    main()
