#!/usr/bin/env python
"""End-to-end UNet sweep: bf16 vs Pallas-W8A8 vs pure-XLA int8 (dynamic /
static scales, +/- int8 convs) at given batch sizes.

Usage: bench_sweep.py [batch ...]   (default: 1 8)
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
W8P = LayerQuantSpec(mode="w8a8", w_bits=8, a_bits=8, quantize_act=True)
W8X_DYN = LayerQuantSpec(mode="w8a8_xla", w_bits=8, a_bits=8,
                         quantize_act=True, act_quant="per_token")
W8X_ST = LayerQuantSpec(mode="w8a8_xla", w_bits=8, a_bits=8,
                        quantize_act=True, act_quant="static")
CONV_ST = LayerQuantSpec(mode="w8a8", w_bits=8, a_bits=8, quantize_act=True,
                         act_quant="static")
NOEMB = (("time_emb", NOQ), ("time_embedding", NOQ))


def capture_stats(cfg, params, lat2, t, ctx2):
    cap = build(QuantPlan(fuse_qkv=True).with_capture(True), cfg)

    @jax.jit
    def run(params, lat2, t, ctx2):
        _, mut = cap.apply({"params": params}, lat2, t, ctx2,
                           mutable=["calib"])
        return mut

    mut = jax.device_get(run(params, lat2, t, ctx2))
    return flatten_calib(mut["calib"])


def main():
    batches = [int(b) for b in sys.argv[1:]] or [1, 8]
    cfg, steps, reps, latent = SD15_UNET, 20, 2, 64

    plans = {
        "pallas": QuantPlan(default=W8P, fuse_qkv=True, fuse_ln=True,
                            rules=(("conv", NOQ),) + NOEMB),
        "xla_dyn": QuantPlan(default=W8X_DYN, fuse_qkv=True,
                             rules=(("conv", NOQ),) + NOEMB),
        "xla_static": QuantPlan(default=W8X_ST, fuse_qkv=True,
                                rules=(("conv", NOQ),) + NOEMB),
        "xla_static_conv": QuantPlan(default=W8X_ST, fuse_qkv=True,
                                     rules=(("conv", CONV_ST),) + NOEMB),
        "xla_static_conv_bmm": QuantPlan(default=W8X_ST, fuse_qkv=True,
                                         int8_bmm=True,
                                         rules=(("conv", CONV_ST),) + NOEMB),
    }

    base_model = build(QuantPlan(fuse_qkv=True), cfg)
    params = None
    for batch in batches:
        latents = jax.random.normal(jax.random.PRNGKey(0),
                                    (batch, latent, latent, 4), jnp.float32)
        ctx = jax.random.normal(jax.random.PRNGKey(1), (batch, 77, 768), jnp.bfloat16)
        uctx = jax.random.normal(jax.random.PRNGKey(2), (batch, 77, 768), jnp.bfloat16)
        if params is None:
            t = jnp.zeros((2 * batch,), jnp.int32)
            lat2 = jnp.concatenate([latents, latents]).astype(jnp.bfloat16)
            ctx2 = jnp.concatenate([ctx, uctx])
            params = random_params(build(QuantPlan(), cfg), lat2, t, ctx2)
            # bf16 storage: 6 variants' packed copies + executables must
            # coexist with activations in 16GB HBM
            params = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, params)
            params = fuse_qkv_params(params)
            stats = capture_stats(cfg, params, lat2, t, ctx2)

        row = {"batch": batch}
        dt = time_loop(make_loop(base_model, steps), params, latents, ctx, uctx, reps)
        row["bf16"] = round(batch / dt, 3)
        for name, plan in plans.items():
            # pack per-variant and free before the next (HBM headroom)
            qp = fill_static_act_scales(pack_params(params, plan), stats)
            dt_q = time_loop(make_loop(build(plan, cfg), steps), qp,
                             latents, ctx, uctx, reps)
            del qp
            row[name] = round(batch / dt_q, 3)
            row[name + "_x"] = round(row[name] / row["bf16"], 3)
            print(json.dumps({k: row[k] for k in ("batch", "bf16", name, name + "_x")}),
                  flush=True)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
