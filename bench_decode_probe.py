#!/usr/bin/env python
"""Decode-only profiling for the megakernel engine (round 3).

The --serve metric amortizes a compute-bound (32,1024) prefill into
every row, hiding decode behavior.  This probe separates:

  1. per-kernel marginal times at the serve shapes vs HBM rooflines;
  2. cache-update (dynamic_update_slice) cost: lane-column (depth-major
     layout) vs sublane-row (token-major) writes;
  3. engine decode ms/step with a LAYER-COUNT SWEEP — the slope is the
     true per-layer cost, the intercept the per-step fixed cost
     (lm_head + scan/argmax/embed glue);
  4. module-path decode-only ms/step for comparison.

Run on the TPU (one job at a time):
  nohup python -u bench_decode_probe.py > /tmp/probe.log 2>&1 &
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
from qdm_tpu.quant.apply import pack_params
from qdm_tpu.quant.plan import LayerQuantSpec, QuantPlan
from qdm_tpu.utils.timing import marginal_time as _marginal_time


def marginal_time(fn, x0, lo=64, hi=320):
    # decode kernels are 10-150us: long loops so the marginal dwarfs
    # tunnel dispatch noise
    return _marginal_time(fn, x0, lo=lo, hi=hi)


BATCH, PREFILL, NNEW = 32, 1024, 32


def kernel_rows(out, cfg, batch, dtype):
    from qdm_tpu.ops import decode_kernels as dk
    from qdm_tpu.api.serve import _quant_w

    h, hkv, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                 cfg.head_dim)
    H, I = cfg.hidden_size, cfg.intermediate_size
    tp = 1152
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, H), dtype) * 0.1
    ns = jnp.abs(jax.random.normal(key, (H,))) + 0.5
    n_qkv = (h + 2 * hkv) * d
    cosv = jnp.ones((n_qkv,), jnp.float32)
    sinv = jnp.zeros((n_qkv,), jnp.float32)

    wqkv = jax.random.normal(key, (H, n_qkv), dtype) * 0.02
    dt = marginal_time(
        lambda xc: dk.fused_dense_decode(xc, wqkv, norm_scale=ns)[:, :H], x)
    out["k_qkv_us"] = round(1e6 * dt, 1)
    dt = marginal_time(
        lambda xc: dk.fused_dense_decode(xc, wqkv, norm_scale=ns,
                                         rope_cos=cosv, rope_sin=sinv,
                                         head_dim=d)[:, :H], x)
    out["k_qkv_rope_us"] = round(1e6 * dt, 1)
    out["k_qkv_roofline_us"] = round(wqkv.size * 2 / 819e3, 1)
    print(json.dumps(out), flush=True)

    # cache-update cost: lane-column (dm) vs sublane-row (token-major)
    kc_dm = jnp.zeros((batch, hkv, d, tp), dtype)
    new_col = jnp.ones((batch, hkv, d, 1), dtype)
    dt = marginal_time(lambda c: jax.lax.dynamic_update_slice(
        c, new_col, (0, 0, 0, 512)), kc_dm, lo=16, hi=80)
    out["dus_lane_col_us"] = round(1e6 * dt, 1)
    kc_row = jnp.zeros((batch, hkv, tp, d), dtype)
    new_row = jnp.ones((batch, hkv, 1, d), dtype)
    dt = marginal_time(lambda c: jax.lax.dynamic_update_slice(
        c, new_row, (0, 0, 512, 0)), kc_row, lo=16, hi=80)
    out["dus_sublane_row_us"] = round(1e6 * dt, 1)
    print(json.dumps(out), flush=True)

    q = jax.random.normal(key, (batch, hkv, h // hkv, d), dtype)
    kc = jax.random.normal(key, (batch, hkv, d, tp), dtype)
    vdm = jax.random.normal(key, (batch, hkv, d, tp), dtype)
    vrow = jax.random.normal(key, (batch, hkv, tp, d), dtype)

    def t_attn(fn):
        return round(1e6 * marginal_time(
            lambda qc: fn(qc) + qc * 1e-6, q), 1)

    out["k_attn_dm_us"] = t_attn(
        lambda qc: dk.decode_attention_dm_pallas(qc, kc, vdm, tp - 2))
    out["k_attn_rows_us"] = t_attn(
        lambda qc: dk.decode_attention_rows_pallas(qc, kc, vrow, tp - 2))
    out["k_attn_roofline_us"] = round((kc.size + vdm.size) * 2 / 819e3, 1)
    ks_ = jnp.abs(jax.random.normal(key, (batch, hkv, 1, tp),
                                    jnp.float32)) * 0.01 + 0.01
    ki_ = jax.random.randint(key, (batch, hkv, d, tp), -127, 128, jnp.int8)
    out["k_attn_dm_i8_us"] = t_attn(
        lambda qc: dk.decode_attention_dm_i8_pallas(qc, ki_, ks_, ki_, ks_,
                                                    tp - 2))
    out["k_attn_i8_roofline_us"] = round(2 * kc.size / 819e3, 1)
    # combined [K|V] cache + block_b sweep
    kv = jax.random.normal(key, (batch, 2 * hkv, d, tp), dtype)
    for bb in (1, 2, 4):
        out[f"k_attn_kv_bb{bb}_us"] = t_attn(
            lambda qc, bb=bb: dk.decode_attention_kv_pallas(
                qc, kv, tp - 2, block_b=bb))
    kvs_ = jnp.abs(jax.random.normal(key, (batch, 2 * hkv, 1, tp),
                                     jnp.float32)) * 0.01 + 0.01
    kvi_ = jax.random.randint(key, (batch, 2 * hkv, d, tp), -127, 128,
                              jnp.int8)
    for bb in (1, 4):
        out[f"k_attn_kv_i8_bb{bb}_us"] = t_attn(
            lambda qc, bb=bb: dk.decode_attention_kv_i8_pallas(
                qc, kvi_, kvs_, tp - 2, block_b=bb))
    # channel-static scales: the kernel sees no scale planes at all
    # (K scales pre-folded into q, V scales post-folded) — the halved
    # cache read should be pure saving vs the bf16 kv rows above
    for bb in (1, 2, 4):
        out[f"k_attn_kv_i8c_bb{bb}_us"] = t_attn(
            lambda qc, bb=bb: dk.decode_attention_kv_i8c_pallas(
                qc.astype(jnp.float32), kvi_, tp - 2, block_b=bb))
    print(json.dumps(out), flush=True)
    # lm_head block sweep (the fixed-cost suspect: 125 grid steps at
    # bn=256)
    V = 32000
    wh = jax.random.normal(key, (H, V), dtype) * 0.02
    for bn in (256, 640, 1280):
        dt = marginal_time(
            lambda xc, bn=bn: dk.fused_dense_decode(
                xc, wh, norm_scale=ns, out_dtype=jnp.float32,
                block_n=bn)[:, :H].astype(dtype),
            x, lo=16, hi=80)
        out[f"k_head_bn{bn}_us"] = round(1e6 * dt, 1)
    out["k_head_roofline_us"] = round(wh.size * 2 / 819e3, 1)
    print(json.dumps(out), flush=True)

    wo = jax.random.normal(key, (H, H), dtype) * 0.02
    dt = marginal_time(
        lambda xc: dk.fused_dense_decode(xc, wo, residual=xc), x)
    out["k_oproj_us"] = round(1e6 * dt, 1)
    wg = jax.random.normal(key, (H, I), dtype) * 0.02
    wu = jax.random.normal(key, (H, I), dtype) * 0.02
    wd = jax.random.normal(key, (I, H), dtype) * 0.02
    dt = marginal_time(
        lambda xc: dk.fused_mlp_decode(xc, wg, wu, wd, ns), x)
    out["k_mlp_us"] = round(1e6 * dt, 1)
    out["k_mlp_roofline_us"] = round((wg.size + wu.size + wd.size) * 2 / 819e3, 1)

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
    print(json.dumps(out), flush=True)


def engine_rows(out, cfg, batch, prefill, n_new, dtype, lm, ids):
    max_len = prefill + n_new + 1
    stats = DecodeEngine.calibrate_scales(
        lm, np.asarray(ids)[:2, :min(prefill, 256)])

    # decomposition: marginal time of one _layer chain and of the
    # per-step fixed chain (embed -> lm_head -> argmax), isolating the
    # layer-sweep slope/intercept constituents
    if jax.default_backend() == "tpu":
        from qdm_tpu.ops import decode_kernels as dk

        d_ = cfg.head_dim
        for mode, tag in (("bf16", "layer_chain_bf16_us"),
                          ("w8a8_static", "layer_chain_w8a8_us")):
            kw = {"act_stats": stats} if mode == "w8a8_static" else {}
            eng = DecodeEngine(lm.truncated_draft(1), mode=mode, **kw)
            cache0 = eng.init_cache(batch, max_len)[0]
            w0 = eng.layers[0]
            n_qkv = eng.layers[0]["w_qkv"].shape[1]
            cosv = jnp.ones((n_qkv,), jnp.float32)
            sinv = jnp.zeros((n_qkv,), jnp.float32)

            def layer_step(xc, eng=eng, cache0=cache0, w0=w0, cosv=cosv,
                           sinv=sinv):
                y, _ = eng._layer(xc, cache0, w0, 512, cosv, sinv)
                return y.astype(xc.dtype)

            x0 = jax.random.normal(jax.random.PRNGKey(0),
                                   (batch, cfg.hidden_size), dtype) * 0.1
            out[tag] = round(1e6 * marginal_time(layer_step, x0), 1)
            print(json.dumps(out), flush=True)
            del eng, cache0
            gc.collect()

        ebf = DecodeEngine(lm.truncated_draft(1), mode="bf16")

        def fixed_step(tok, ebf=ebf):
            x = ebf.embed[tok]
            logits = dk.fused_dense_decode(
                x, ebf.w_head, norm_scale=ebf.final_norm,
                eps=cfg.rms_norm_eps, out_dtype=jnp.float32, block_n=1280)
            return jnp.argmax(logits, axis=-1).astype(tok.dtype)

        tok0 = jnp.zeros((batch,), jnp.int32)
        out["fixed_chain_us"] = round(1e6 * marginal_time(fixed_step, tok0),
                                      1)
        print(json.dumps(out), flush=True)
        del ebf
        gc.collect()

    def decode_time(eng):
        tok0, caches = eng.prefill(ids, max_len)
        jax.block_until_ready(caches[0][0])
        run = eng._make_run(n_new)
        args = (eng.layers, eng.embed, eng.final_norm, eng.w_head)

        def once():
            toks = run(*args, tok0, caches, jnp.int32(prefill))
            float(jnp.sum(toks))

        once()
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            once()
        return (time.time() - t0) / reps / n_new

    # layer-count sweep: slope = per-layer cost, intercept = fixed
    for mode, kv, tag in (("bf16", None, "engine_bf16"),
                          ("w8a8_static", None, "engine_w8a8"),
                          ("w8a8_static", jnp.int8, "engine_w8a8_kv8")):
        kw = {"act_stats": stats} if mode == "w8a8_static" else {}
        times = {}
        for L in (6, cfg.num_hidden_layers):
            sub = lm.truncated_draft(L) if L < cfg.num_hidden_layers else lm
            eng = DecodeEngine(sub, mode=mode, kv_dtype=kv, **kw)
            times[L] = decode_time(eng)
            del eng
            gc.collect()
        L1, L2 = sorted(times)
        slope = (times[L2] - times[L1]) / (L2 - L1)
        out[f"{tag}_ms_per_step"] = round(1e3 * times[L2], 2)
        out[f"{tag}_decode_tok_s"] = round(batch / times[L2], 1)
        out[f"{tag}_per_layer_us"] = round(1e6 * slope, 1)
        out[f"{tag}_fixed_us"] = round(1e6 * (times[L2] - slope * L2), 1)
        print(json.dumps(out), flush=True)


def module_rows(out, cfg, batch, prefill, n_new, lm, ids):
    max_len = prefill + n_new + 1
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
        reps = 3
        for _ in range(reps):
            float(jnp.sum(mdecode(params, mtok0, mcaches)))
        dt = (time.time() - t0) / reps
        out[f"module_{wname}_ms_per_step"] = round(1e3 * dt / n_new, 2)
        out[f"module_{wname}_decode_tok_s"] = round(batch * n_new / dt, 1)
        print(json.dumps(out), flush=True)
        del params, mcaches
        gc.collect()
    lm.plan = QuantPlan()


def main():
    on_tpu = jax.default_backend() == "tpu"
    cfg = BENCH_1B if on_tpu else llama_lib.tiny_llama_config()
    batch, prefill, n_new = (BATCH, PREFILL, NNEW) if on_tpu else (2, 8, 4)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    lm = CausalLM.from_config(cfg, dtype=dtype)
    ids = np.random.default_rng(0).integers(0, cfg.vocab_size,
                                            (batch, prefill))
    out = {"metric": "decode-only probe (batch 32, ctx 1024)"}
    if on_tpu:
        kernel_rows(out, cfg, batch, dtype)
    engine_rows(out, cfg, batch, prefill, n_new, dtype, lm, ids)
    module_rows(out, cfg, batch, prefill, n_new, lm, ids)


if __name__ == "__main__":
    main()
