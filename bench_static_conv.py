#!/usr/bin/env python
"""Speed probe: W8A8 dense + STATIC-scale int8 convs (no runtime act
reductions) vs bf16."""

import json

import jax

from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import jax.numpy as jnp

from bench import build, make_loop, random_params, time_loop
from qdm_tpu.models.unet import SD15_UNET
from qdm_tpu.quant.plan import LayerQuantSpec, QuantPlan
from qdm_tpu.quant.apply import pack_params, fuse_qkv_params

NOQ = LayerQuantSpec(mode="none")
W8 = LayerQuantSpec(mode="w8a8", w_bits=8, a_bits=8, quantize_act=True)
W8C = LayerQuantSpec(mode="w8a8", w_bits=8, a_bits=8, quantize_act=True,
                     act_quant="static")


def main():
    steps, reps, latent = 20, 3, 64
    batch = 1
    latents = jax.random.normal(jax.random.PRNGKey(0), (batch, latent, latent, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (batch, 77, 768), jnp.bfloat16)
    uctx = jax.random.normal(jax.random.PRNGKey(2), (batch, 77, 768), jnp.bfloat16)
    t = jnp.zeros((2 * batch,), jnp.int32)
    lat2 = jnp.concatenate([latents, latents]).astype(jnp.bfloat16)

    base_model = build(QuantPlan(fuse_qkv=True), SD15_UNET)
    params = fuse_qkv_params(random_params(build(QuantPlan(), SD15_UNET), lat2, t,
                                           jnp.concatenate([ctx, uctx])))
    dt_base = time_loop(make_loop(base_model, steps), params, latents, ctx, uctx, reps)
    print(json.dumps({"variant": "bf16", "img_s": round(batch / dt_base, 4)}), flush=True)

    # static-scale int8 convs (act_scale params default 1.0: wrong values
    # but identical compute cost — this probe measures speed only)
    plan = QuantPlan(default=W8, fuse_qkv=True,
                     rules=(("conv", W8C), ("time_emb", NOQ),
                            ("time_embedding", NOQ)))
    qparams = pack_params(params, plan)
    q_model = build(plan, SD15_UNET)
    dt = time_loop(make_loop(q_model, steps), qparams, latents, ctx, uctx, reps)
    print(json.dumps({"variant": "w8a8_dense+static_conv",
                      "img_s": round(batch / dt, 4),
                      "vs_bf16": round(dt_base / dt, 4)}), flush=True)


if __name__ == "__main__":
    main()
