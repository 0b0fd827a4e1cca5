#!/usr/bin/env python
"""Microbench: pure-XLA int8 dense chains vs bf16 vs the Pallas W8A8 path.

Hypothesis (round-2): the 0.8x end-to-end W8A8 deficit is the Pallas
fusion-boundary tax, so expressing act-quant + int8 dot + dequant in
plain jnp (letting XLA fuse prologue/epilogue the way it does for bf16)
may beat both.  This measures a transformer-ish sub-block chain
  y = x + (gelu(LN(x) @ W1 + b1) @ W2 + b2)
at SD1.5 shapes, four ways:
  bf16      — XLA baseline
  xla_dyn   — int8 weights, per-token dynamic act scales, all jnp
  xla_static— int8 weights, precomputed per-tensor act scales, all jnp
  pallas    — the existing w8a8_matmul_fused_epi / geglu-style kernels
"""

import json
import time

import jax

from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import jax.numpy as jnp
import numpy as np

from qdm_tpu.ops import quant_matmul as qmm
from qdm_tpu.utils.timing import marginal_time


def make_weights(key, c, inner):
    k1, k2 = jax.random.split(key)
    w1 = jax.random.normal(k1, (c, inner), jnp.float32) / np.sqrt(c)
    w2 = jax.random.normal(k2, (inner, c), jnp.float32) / np.sqrt(inner)
    b1 = jnp.zeros((inner,), jnp.float32)
    b2 = jnp.zeros((c,), jnp.float32)
    return w1, w2, b1, b2


def quant_w(w):
    s = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    wi = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return wi, s.astype(jnp.float32)


def ln(x):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + 1e-5)


def int8_dot_dyn(x, wi, ws):
    xi, xs = qmm.quantize_act_per_token_int(x, 8)
    acc = jax.lax.dot_general(xi, wi, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * xs * ws


def int8_dot_static(x, wi, ws, xscale):
    xi = jnp.clip(jnp.round(x.astype(jnp.float32) / xscale), -127, 127
                  ).astype(jnp.int8)
    acc = jax.lax.dot_general(xi, wi, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (xscale * ws)


def main():
    shapes = [
        # (tokens, channels, inner) — SD1.5 transformer blocks at batch 8 CFG
        (16 * 4096, 320, 1280),
        (16 * 1024, 640, 2560),
        (16 * 256, 1280, 5120),
    ]
    results = []
    for m, c, inner in shapes:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (m, c), jnp.bfloat16)
        w1, w2, b1, b2 = make_weights(key, c, inner)
        w1i, w1s = quant_w(w1)
        w2i, w2s = quant_w(w2)
        w1b, w2b = w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)
        # pallas-packed
        p1, p1s = qmm.pack_linear_int8(w1i, w1s.reshape(-1))
        p2, p2s = qmm.pack_linear_int8(w2i, w2s.reshape(-1))
        bias1 = jnp.zeros((1, p1.shape[1]), jnp.float32)
        bias2 = jnp.zeros((1, p2.shape[1]), jnp.float32)

        def chain_bf16(xc):
            h = jnp.dot(ln(xc).astype(jnp.bfloat16), w1b) + b1
            y = jnp.dot(jax.nn.gelu(h).astype(jnp.bfloat16), w2b) + b2
            return xc + y.astype(xc.dtype)

        def chain_xla_dyn(xc):
            h = int8_dot_dyn(ln(xc).astype(jnp.bfloat16), w1i, w1s) + b1
            y = int8_dot_dyn(jax.nn.gelu(h).astype(jnp.bfloat16), w2i, w2s) + b2
            return xc + y.astype(xc.dtype)

        s_in = jnp.float32(4.0 / 127.0)   # representative static scales
        s_mid = jnp.float32(8.0 / 127.0)

        def chain_xla_static(xc):
            h = int8_dot_static(ln(xc).astype(jnp.bfloat16), w1i, w1s, s_in) + b1
            y = int8_dot_static(jax.nn.gelu(h).astype(jnp.bfloat16), w2i, w2s,
                                s_mid) + b2
            return xc + y.astype(xc.dtype)

        def chain_pallas(xc):
            h = qmm.w8a8_matmul_fused_epi(
                xc, p1, p1s, bias1, ln=(jnp.ones((c,), jnp.float32),
                                        jnp.zeros((c,), jnp.float32)),
                out_dtype=jnp.bfloat16)[:, :inner]
            y = qmm.w8a8_matmul_fused_epi(
                jax.nn.gelu(h).astype(jnp.bfloat16), p2, p2s, bias2,
                out_dtype=jnp.bfloat16)[:, :c]
            return xc + y.astype(xc.dtype)

        row = {"m": m, "c": c, "inner": inner}
        flops = 2 * 2 * m * c * inner  # two matmuls
        for name, fn in [("bf16", chain_bf16), ("xla_dyn", chain_xla_dyn),
                         ("xla_static", chain_xla_static),
                         ("pallas", chain_pallas)]:
            dt = marginal_time(fn, x, lo=4, hi=20)
            row[name] = round(dt * 1e6, 1)          # us/chain
            row[name + "_tflops"] = round(flops / dt / 1e12, 1)
        row["dyn_vs_bf16"] = round(row["bf16"] / row["xla_dyn"], 3)
        row["static_vs_bf16"] = round(row["bf16"] / row["xla_static"], 3)
        row["pallas_vs_bf16"] = round(row["bf16"] / row["pallas"], 3)
        print(json.dumps(row), flush=True)
        results.append(row)


if __name__ == "__main__":
    main()
