#!/usr/bin/env python
"""Surgical ablation of the static-int8 prefill forward.

The flash A/B (tools/prefill_flash_ab_tpu.py) killed the
"einsum-materialization" hypothesis: flash saves only ~0.05 s of the
0.4 s non-matmul overhead at (32, 1024).  This tool mirrors the module
forward by hand on the ENGINE'S OWN packed prefill params (w8a8_xla
static math copied from models/layers.py:159-181) and toggles pieces
off one at a time, attributing the overhead:

  full        — norm + int8 qkv + rope + flash attn + o + norm + MLP
                + combined-cache write  (should track eng.prefill)
  no_cache    — skip the depth-major cache build/write
  no_rope     — skip the rotation
  no_attn     — context = v (projections kept, attention matmuls gone)
  no_norm     — skip both RMSNorms
  matmul_only — all of the above off (≈ the pure chain)

Run on the TPU: python -u tools/prefill_ablation_tpu.py
"""

import functools
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


def dense_i8(x, p):
    """models/layers.py w8a8_xla static branch, verbatim math."""
    xf = x.astype(jnp.float32)
    xs = p["act_scale"][0]
    xi = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xi, p["qweight"], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (xs * p["scales"])


def rmsnorm(x, scale, eps=1e-6):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y * scale).astype(jnp.bfloat16)


def rope_bsd(x, positions, theta):
    d = x.shape[-1]
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    angles = positions.astype(jnp.float32)[..., None] * freqs
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                           axis=-1).astype(x.dtype)


def make_fwd(cfg, toggles):
    h, hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    d = cfg.head_dim
    attn_on = "attn" not in toggles
    rope_on = "rope" not in toggles
    norm_on = "norm" not in toggles
    cache_on = "cache" not in toggles

    @jax.jit
    def fwd(params, emb_x, positions):
        b, s, _ = emb_x.shape
        m = b * s
        x = emb_x
        caches = []
        for l in range(cfg.num_hidden_layers):
            lp = params[f"layers_{l}"]
            xin = rmsnorm(x, lp["input_layernorm"]["scale"]) if norm_on \
                else x
            x2 = xin.reshape(m, -1)
            q = dense_i8(x2, lp["self_attn"]["q_proj"]).astype(jnp.bfloat16)
            k = dense_i8(x2, lp["self_attn"]["k_proj"]).astype(jnp.bfloat16)
            v = dense_i8(x2, lp["self_attn"]["v_proj"]).astype(jnp.bfloat16)
            q = q.reshape(b, s, h, d)
            k = k.reshape(b, s, hkv, d)
            v = v.reshape(b, s, hkv, d)
            if rope_on:
                q = rope_bsd(q, positions, cfg.rope_theta)
                k = rope_bsd(k, positions, cfg.rope_theta)
            if cache_on:
                kv = jnp.concatenate(
                    [k.transpose(0, 2, 3, 1), v.transpose(0, 2, 3, 1)],
                    axis=1)                      # (b, 2hkv, d, s)
                caches.append(kv)
            if attn_on:
                from jax.experimental.pallas.ops.tpu.flash_attention import (
                    BlockSizes, flash_attention)

                g = h // hkv
                kr = jnp.repeat(k, g, axis=2)
                vr = jnp.repeat(v, g, axis=2)
                blk = next(bb for bb in (512, 256, 128) if s % bb == 0)
                sizes = BlockSizes(
                    block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
                    block_q_major_dkv=blk, block_k_major_dkv=blk,
                    block_k_dkv=blk, block_q_dkv=blk, block_k_major_dq=blk,
                    block_k_dq=blk, block_q_dq=blk)
                ctx = flash_attention(
                    q.transpose(0, 2, 1, 3), kr.transpose(0, 2, 1, 3),
                    vr.transpose(0, 2, 1, 3), causal=True,
                    sm_scale=cfg.attn_scale,
                    block_sizes=sizes).transpose(0, 2, 1, 3)
            else:
                ctx = jnp.repeat(v, h // hkv, axis=2)
            o = dense_i8(ctx.reshape(m, h * d).astype(jnp.bfloat16),
                         lp["self_attn"]["o_proj"])
            x = (x.astype(jnp.float32)
                 + o.reshape(b, s, -1)).astype(jnp.bfloat16)
            xin2 = rmsnorm(x, lp["post_attention_layernorm"]["scale"]) \
                if norm_on else x
            x3 = xin2.reshape(m, -1)
            gate = dense_i8(x3, lp["mlp"]["gate_proj"])
            up = dense_i8(x3, lp["mlp"]["up_proj"])
            hmid = (jax.nn.silu(gate) * up).astype(jnp.bfloat16)
            down = dense_i8(hmid, lp["mlp"]["down_proj"])
            x = (x.astype(jnp.float32)
                 + down.reshape(b, s, -1)).astype(jnp.bfloat16)
        return x, caches

    return fwd


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


def main():
    if jax.default_backend() in ("cpu",):
        print(json.dumps({"error": "needs the TPU"}))
        return
    cfg = BENCH_1B
    batch, S = 32, 1024
    lm = CausalLM.from_config(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (batch, S)).astype(np.int32)
    stats = DecodeEngine.calibrate_scales(lm, ids[:4])
    eng = DecodeEngine(lm, mode="w8a8_static", act_stats=stats,
                       prefill_quant=True)
    pp = eng._prefill_params
    out = {"metric": "prefill ablation (batch 32, ctx 1024, BENCH_1B)"}

    max_len = -(-(S + 33) // 128) * 128

    def pf():
        tok0, caches = eng.prefill(ids, max_len)
        return caches[0][0]

    out["engine_prefill"] = round(timed(pf), 4)
    print(json.dumps(out), flush=True)

    emb = pp["embed_tokens"]["embedding"][jnp.asarray(ids)].astype(jnp.bfloat16)
    positions = jnp.broadcast_to(jnp.arange(S)[None], (batch, S))

    for name, toggles in (
            ("full", ()),
            ("no_cache", ("cache",)),
            ("no_rope", ("rope",)),
            ("no_attn", ("attn",)),
            ("no_norm", ("norm",)),
            ("matmul_only", ("cache", "rope", "attn", "norm"))):
        fwd = make_fwd(cfg, toggles)
        out[f"mirror_{name}"] = round(timed(fwd, pp, emb, positions), 4)
        print(json.dumps(out), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
