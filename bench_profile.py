#!/usr/bin/env python
"""Time decomposition of the bf16 SD1.5 UNet step by component ablation.

Monkeypatches one component class at a time to an identity (flax ignores
the then-unvisited params in the tree) and re-times the full 20-step
loop; the delta vs the full model is that component's cost including the
HBM traffic it would have caused.  Usage: bench_profile.py [batch] [--quant]

--quant profiles the headline quantized config (w8a8_xla static + int8
convs, bench.quantized_plan_and_params) instead of bf16 — the deltas
show which components the int8 placement actually accelerated.
"""

import json
import sys

import jax

from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import jax.numpy as jnp

from bench import build, make_loop, random_params, time_loop
from qdm_tpu.models import layers as layers_lib
from qdm_tpu.models import unet as unet_lib
from qdm_tpu.models.unet import SD15_UNET
from qdm_tpu.quant.plan import QuantPlan


def main():
    quant = "--quant" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 8
    steps, reps, latent = 20, 2, 64
    latents = jax.random.normal(jax.random.PRNGKey(0),
                                (batch, latent, latent, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (batch, 77, 768), jnp.bfloat16)
    uctx = jax.random.normal(jax.random.PRNGKey(2), (batch, 77, 768), jnp.bfloat16)
    t = jnp.zeros((2 * batch,), jnp.int32)
    lat2 = jnp.concatenate([latents, latents]).astype(jnp.bfloat16)

    ctx2 = jnp.concatenate([ctx, uctx])
    model = build(QuantPlan(), SD15_UNET)
    params = random_params(model, lat2, t, ctx2)
    if quant:
        from bench import quantized_plan_and_params

        run_plan, _, run_params = quantized_plan_and_params(
            SD15_UNET, params, lat2, t, ctx2)
    else:
        run_plan, run_params = QuantPlan(), params

    def run():
        return time_loop(make_loop(build(run_plan, SD15_UNET), steps),
                         run_params, latents, ctx, uctx, reps)

    dt_full = run()
    print(json.dumps({"variant": "full_quant" if quant else "full_bf16",
                      "ms_per_img": round(1e3 * dt_full / batch, 1),
                      "img_s": round(batch / dt_full, 3)}), flush=True)

    real_attn = unet_lib.CrossAttention.__call__
    real_ff = unet_lib.FeedForward.__call__
    real_t2d = unet_lib.Transformer2D.__call__
    real_rb = unet_lib.ResnetBlock2D.__call__
    real_gn = layers_lib.GroupNorm.__call__

    from qdm_tpu.ops import attention as attn_ops
    real_core = attn_ops.dot_product_attention

    def no_attn(self, x, context=None, residual=None, ln=None):
        return (x if residual is None else residual).astype(self.dtype)

    def no_ff(self, x, residual=None):
        return (x if residual is None else residual).astype(self.dtype)

    def no_t2d(self, x, context):
        return x

    def no_rb(self, x, temb):
        if x.shape[-1] == self.out_channels:
            return x
        return real_rb(self, x, temb)

    def no_gn(self, x):
        return x.astype(self.dtype)

    def no_core(q, k, v, scale=None, **kw):
        return q  # same shape as the attention output

    def self_core_only(q, k, v, scale=None, **kw):
        if q.shape[1] != k.shape[1]:
            return q  # skip cross-attention cores
        return real_core(q, k, v, scale, **kw)

    def cross_core_only(q, k, v, scale=None, **kw):
        if q.shape[1] == k.shape[1]:
            return q  # skip self-attention cores
        return real_core(q, k, v, scale, **kw)

    class _FnPatch:
        """Patch a module-level function (unet imports the symbol)."""

        def __init__(self, fn):
            self.fn = fn

    real_down = unet_lib.Downsample2D.__call__
    real_up = unet_lib.Upsample2D.__call__

    def no_down(self, x):
        b, h, w, c = x.shape
        return x[:, ::2, ::2, :].astype(self.dtype) if self.channels == c \
            else real_down(self, x)

    def no_up(self, x):
        b, h, w, c = x.shape
        if self.channels != c:
            return real_up(self, x)
        return jax.image.resize(x, (b, h * 2, w * 2, c),
                                method="nearest").astype(self.dtype)

    ablations = {
        "attention": (unet_lib.CrossAttention, no_attn),
        "attn_core": (_FnPatch(no_core), None),
        "self_attn_core": (_FnPatch(cross_core_only), None),
        "cross_attn_core": (_FnPatch(self_core_only), None),
        "feedforward": (unet_lib.FeedForward, no_ff),
        "transformer2d": (unet_lib.Transformer2D, no_t2d),
        "resnet_blocks": (unet_lib.ResnetBlock2D, no_rb),
        "groupnorm": (layers_lib.GroupNorm, no_gn),
        "downsamplers": (unet_lib.Downsample2D, no_down),
        "upsamplers": (unet_lib.Upsample2D, no_up),
    }
    originals = {
        "attention": real_attn, "feedforward": real_ff,
        "transformer2d": real_t2d, "resnet_blocks": real_rb,
        "groupnorm": real_gn, "downsamplers": real_down,
        "upsamplers": real_up,
    }

    for name, (cls, fn) in ablations.items():
        if isinstance(cls, _FnPatch):
            # unet.py does `from qdm_tpu.ops.attention import
            # dot_product_attention` — patch the unet module's binding
            unet_lib.dot_product_attention = cls.fn
        else:
            cls.__call__ = fn
        try:
            dt = run()
        finally:
            if isinstance(cls, _FnPatch):
                unet_lib.dot_product_attention = real_core
            else:
                cls.__call__ = originals[name]
        saved = dt_full - dt
        print(json.dumps({"variant": f"no_{name}",
                          "ms_per_img": round(1e3 * dt / batch, 1),
                          "component_ms_per_img": round(1e3 * saved / batch, 1),
                          "pct_of_full": round(100 * saved / dt_full, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
