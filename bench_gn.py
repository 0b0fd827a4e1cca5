#!/usr/bin/env python
"""GroupNorm formulation microbench at SD1.5 shapes.

The profiler (bench_profile.py --quant) shows GroupNorm at 59.8 ms/img
= 17% of the quantized step — 4.3x over its HBM roofline.  Hypothesis:
the (B, S, G, C//G) reshape splits the 320-lane channel dim into
(32, 10), forcing a relayout of the whole tensor.  The lane-friendly
formulation reduces per-channel first (no big-tensor reshape) and
group-sums the tiny (B, C) array.
"""

import json

import jax

from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import jax.numpy as jnp

from qdm_tpu.utils.timing import marginal_time

G = 32
EPS = 1e-5


def gn_reshape(x, scale, bias):
    """Current implementation: reshape to (B, S, G, C//G), stats over (1, 3)."""
    c = x.shape[-1]
    orig = x.shape
    xf = x.astype(jnp.float32).reshape(x.shape[0], -1, G, c // G)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + EPS)
    return (xf.reshape(orig) * scale + bias).astype(x.dtype)


def gn_chansum(x, scale, bias):
    """Lane-friendly: per-channel sum/sumsq (no relayout), group-reduce
    the (B, C) result, broadcast back per channel."""
    b, c = x.shape[0], x.shape[-1]
    cpg = c // G
    xf = x.astype(jnp.float32).reshape(b, -1, c)
    n = xf.shape[1] * cpg
    s = jnp.sum(xf, axis=1)                      # (B, C)
    sq = jnp.sum(xf * xf, axis=1)                # (B, C) — same pass
    gs = jnp.sum(s.reshape(b, G, cpg), axis=-1)  # (B, G) tiny
    gsq = jnp.sum(sq.reshape(b, G, cpg), axis=-1)
    mean = gs / n
    var = gsq / n - mean * mean
    inv = jax.lax.rsqrt(var + EPS)
    mu_c = jnp.repeat(mean, cpg, axis=-1)[:, None, :]   # (B, 1, C)
    inv_c = jnp.repeat(inv, cpg, axis=-1)[:, None, :]
    out = (xf - mu_c) * inv_c * scale + bias
    return out.reshape(x.shape).astype(x.dtype)


def gn_chansum_silu(x, scale, bias):
    y = gn_chansum(x, scale, bias)
    return y * jax.nn.sigmoid(y.astype(jnp.float32)).astype(y.dtype)


def gn_reshape_silu(x, scale, bias):
    y = gn_reshape(x, scale, bias)
    return y * jax.nn.sigmoid(y.astype(jnp.float32)).astype(y.dtype)


def main():
    shapes = [(16, 64, 64, 320), (16, 32, 32, 640), (16, 16, 16, 1280)]
    for shp in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), shp, jnp.bfloat16)
        scale = jnp.ones((shp[-1],), jnp.float32)
        bias = jnp.zeros((shp[-1],), jnp.float32)
        row = {"shape": "x".join(map(str, shp))}
        # correctness first
        a = gn_reshape(x, scale, bias)
        bq = gn_chansum(x, scale, bias)
        row["max_diff"] = float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - bq.astype(jnp.float32))))
        for name, fn in (("reshape", gn_reshape), ("chansum", gn_chansum),
                         ("reshape_silu", gn_reshape_silu),
                         ("chansum_silu", gn_chansum_silu)):
            f = jax.jit(lambda x, fn=fn: fn(x, scale, bias))
            row[name + "_ms"] = round(1e3 * marginal_time(f, x, lo=8, hi=32), 3)
        gb = 3 * x.size * 2 / 1e9
        row["roofline_ms"] = round(1e3 * gb / 819, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
