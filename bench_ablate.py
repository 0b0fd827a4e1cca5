#!/usr/bin/env python
"""Ablation bench: which quantization placement wins on the SD1.5 UNet.

Variants: bf16, w8a8 everywhere, w8a8 deep-blocks-only, w4a16 deep-only,
w4a16 everywhere.  Prints one line per variant.
"""

import json
import time

import jax

from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import jax.numpy as jnp

from bench import build, make_loop, random_params, time_loop
from qdm_tpu.models.unet import SD15_UNET
from qdm_tpu.quant.plan import LayerQuantSpec, QuantPlan
from qdm_tpu.quant.apply import pack_params

NOQ = LayerQuantSpec(mode="none")
W8 = LayerQuantSpec(mode="w8a8", w_bits=8, a_bits=8, quantize_act=True)
W4 = LayerQuantSpec(mode="w4a16", w_bits=4, group_size=128, zero_point=True)
W816 = LayerQuantSpec(mode="w8a16", w_bits=8)

SHALLOW = ("down_blocks_0", "down_blocks_1", "up_blocks_2", "up_blocks_3")
NOCONV = (("conv", NOQ), ("time_emb", NOQ), ("time_embedding", NOQ))


def plan_all(spec):
    return QuantPlan(default=spec, rules=NOCONV)


def plan_deep(spec):
    rules = NOCONV + tuple((p, NOQ) for p in SHALLOW)
    return QuantPlan(default=spec, rules=rules)


def main():
    steps, reps, latent = 20, 3, 64
    batch = 1
    latents = jax.random.normal(jax.random.PRNGKey(0), (batch, latent, latent, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (batch, 77, 768), jnp.bfloat16)
    uctx = jax.random.normal(jax.random.PRNGKey(2), (batch, 77, 768), jnp.bfloat16)
    t = jnp.zeros((2 * batch,), jnp.int32)
    lat2 = jnp.concatenate([latents, latents]).astype(jnp.bfloat16)

    base_model = build(QuantPlan(), SD15_UNET)
    params = random_params(base_model, lat2, t, jnp.concatenate([ctx, uctx]))
    dt_base = time_loop(make_loop(base_model, steps), params, latents, ctx, uctx, reps)
    print(json.dumps({"variant": "bf16", "img_per_sec": round(batch / dt_base, 4)}), flush=True)

    for name, plan in [
        ("w8a8_all", plan_all(W8)),
        ("w8a16_all", plan_all(W816)),
        ("w8a16_deep", plan_deep(W816)),
        ("w4a16_all", plan_all(W4)),
        ("w4a16_deep", plan_deep(W4)),
    ]:
        qparams = pack_params(params, plan)
        q_model = build(plan, SD15_UNET)
        dt = time_loop(make_loop(q_model, steps), qparams, latents, ctx, uctx, reps)
        print(json.dumps({"variant": name, "img_per_sec": round(batch / dt, 4),
                          "vs_bf16": round(dt_base / dt, 4)}), flush=True)


if __name__ == "__main__":
    main()
