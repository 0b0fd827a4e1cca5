#!/usr/bin/env python
"""Batch-scaling: bf16 vs W8A8 throughput at batch 1/4/8."""

import json

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
NOCONV = (("conv", NOQ), ("time_emb", NOQ), ("time_embedding", NOQ))


def main():
    import sys
    batches = [int(b) for b in sys.argv[1:]] or [8]
    steps, reps, latent = 20, 2, 64
    plan8 = QuantPlan(default=W8, rules=NOCONV)

    base_model = build(QuantPlan(), SD15_UNET)
    q_model = build(plan8, SD15_UNET)

    params = None
    qparams = None
    for batch in batches:
        latents = jax.random.normal(jax.random.PRNGKey(0), (batch, latent, latent, 4), jnp.float32)
        ctx = jax.random.normal(jax.random.PRNGKey(1), (batch, 77, 768), jnp.bfloat16)
        uctx = jax.random.normal(jax.random.PRNGKey(2), (batch, 77, 768), jnp.bfloat16)
        if params is None:
            t = jnp.zeros((2 * batch,), jnp.int32)
            lat2 = jnp.concatenate([latents, latents]).astype(jnp.bfloat16)
            params = random_params(base_model, lat2, t, jnp.concatenate([ctx, uctx]))
            qparams = pack_params(params, plan8)
        dt_b = time_loop(make_loop(base_model, steps), params, latents, ctx, uctx, reps)
        dt_q = time_loop(make_loop(q_model, steps), qparams, latents, ctx, uctx, reps)
        print(json.dumps({"batch": batch,
                          "bf16_img_s": round(batch / dt_b, 3),
                          "w8a8_img_s": round(batch / dt_q, 3),
                          "speedup": round(dt_b / dt_q, 3)}), flush=True)


if __name__ == "__main__":
    main()
