#!/usr/bin/env python
"""Hybrid-plan sweep: the xla_static headline plan with selected
Pallas fusions re-enabled layer-by-layer.

Round-2 found per-matmul Pallas kernels lose to pure-XLA static int8
(fusion-boundary tax), but that sweep compared whole plans.  The fused
GEGLU kernel kills a (M, 2*inner) bf16 HBM round trip (672 MB/step at
the 64x64 level) that the XLA path materializes — worth re-testing as
a point fusion inside the otherwise-XLA plan.

Usage: bench_hybrid.py [batch]
"""

import json
import sys

import jax

from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import jax.numpy as jnp

from bench import build, make_loop, random_params, time_loop
from qdm_tpu.calib.stats import flatten_calib
from qdm_tpu.models.unet import SD15_UNET
from qdm_tpu.quant.apply import (fill_static_act_scales, fuse_qkv_params,
                                 pack_params)
from qdm_tpu.quant.plan import LayerQuantSpec, QuantPlan

NOQ = LayerQuantSpec(mode="none")
W8X = LayerQuantSpec(mode="w8a8_xla", w_bits=8, a_bits=8, quantize_act=True,
                     act_quant="static")
W8P = LayerQuantSpec(mode="w8a8", w_bits=8, a_bits=8, quantize_act=True)
CONV = LayerQuantSpec(mode="w8a8", w_bits=8, a_bits=8, quantize_act=True,
                      act_quant="static")
BASE_RULES = (("conv", CONV), ("time_emb", NOQ), ("time_embedding", NOQ))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    steps, reps, latent = 20, 3, 64
    cfg = SD15_UNET

    latents = jax.random.normal(jax.random.PRNGKey(0),
                                (batch, latent, latent, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (batch, 77, 768), jnp.bfloat16)
    uctx = jax.random.normal(jax.random.PRNGKey(2), (batch, 77, 768), jnp.bfloat16)
    t = jnp.zeros((2 * batch,), jnp.int32)
    lat2 = jnp.concatenate([latents, latents]).astype(jnp.bfloat16)
    ctx2 = jnp.concatenate([ctx, uctx])

    params = random_params(build(QuantPlan(), cfg), lat2, t, ctx2)
    params = fuse_qkv_params(params)
    cap = build(QuantPlan(fuse_qkv=True).with_capture(True), cfg)

    @jax.jit
    def capture(params, lat2, t, ctx2):
        _, mut = cap.apply({"params": params}, lat2, t, ctx2, mutable=["calib"])
        return mut

    stats = flatten_calib(jax.device_get(capture(params, lat2, t, ctx2))["calib"])

    plans = {
        "xla_static": QuantPlan(default=W8X, fuse_qkv=True, rules=BASE_RULES),
        "xla+geglu_pallas": QuantPlan(
            default=W8X, fuse_qkv=True,
            rules=(("net_0/proj", W8P),) + BASE_RULES),
    }

    for name, plan in plans.items():
        qp = fill_static_act_scales(pack_params(params, plan), stats)
        dt = time_loop(make_loop(build(plan, cfg), steps), qp, latents, ctx,
                       uctx, reps)
        del qp
        print(json.dumps({"plan": name, "img_s": round(batch / dt, 4),
                          "ms_per_img": round(1e3 * dt / batch, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
