#!/usr/bin/env python
"""Benchmark: SD1.5 UNet denoising throughput (images/sec/chip),
quantized (W8A8 Pallas kernels) vs bf16 XLA baseline.

Prints ONE JSON line:
  {"metric": ..., "value": imgs_per_sec, "unit": "img/s",
   "vs_baseline": speedup_vs_bf16}

Matches BASELINE.json config "SD1.5 W8A8, 512x512, 20 DDIM steps":
batch 1 prompt with CFG (batch 2 through the UNet), the full 20-step
loop compiled as one lax.fori_loop (so tunnel dispatch latency is
amortized away).
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/qdm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def build(plan, cfg, dtype=jnp.bfloat16):
    from qdm_tpu.models.unet import UNet2DCondition

    return UNet2DCondition(config=cfg, dtype=dtype, plan=plan)


def random_params(model, latents, t, ctx, seed=0):
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), latents, t, ctx))["params"]
    key = [jax.random.PRNGKey(seed)]

    def init_leaf(path, s):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        key[0], sub = jax.random.split(key[0])
        if name in ("kernel",):
            fan_in = int(np.prod(s.shape[:-1])) or 1
            return (jax.random.normal(sub, s.shape, jnp.float32) /
                    np.sqrt(fan_in)).astype(s.dtype)
        if name == "scale":
            return jnp.ones(s.shape, s.dtype)
        return jnp.zeros(s.shape, s.dtype)

    return jax.tree_util.tree_map_with_path(init_leaf, shapes)


def make_loop(model, steps, guidance=7.5):
    from qdm_tpu.models.schedulers import SD15_SCHED, ddim_step, make_ddim

    tables = make_ddim(SD15_SCHED, steps)

    @jax.jit
    def loop(params, latents, ctx, uctx):
        def body(s, lat):
            t = tables.timesteps[s]
            lat_in = jnp.concatenate([lat, lat], axis=0).astype(model.dtype)
            ctx_in = jnp.concatenate([uctx, ctx], axis=0)
            tt = jnp.broadcast_to(t, (lat_in.shape[0],))
            eps = model.apply({"params": params}, lat_in, tt, ctx_in)
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            return ddim_step(tables, eps_u + guidance * (eps_c - eps_u), lat, s, steps)

        return jax.lax.fori_loop(0, steps, body, latents)

    return loop


def time_loop(loop, params, latents, ctx, uctx, reps):
    # force full completion with a scalar fetch: on the tunneled device,
    # block_until_ready can return before compute finishes
    float(jnp.sum(loop(params, latents, ctx, uctx)))
    t0 = time.time()
    for _ in range(reps):
        s = float(jnp.sum(loop(params, latents, ctx, uctx)))
    return (time.time() - t0) / reps


def main():
    on_tpu = jax.default_backend() == "tpu"
    from qdm_tpu.models.unet import SD15_UNET, tiny_unet_config
    from qdm_tpu.quant.plan import LayerQuantSpec, QuantPlan
    from qdm_tpu.quant.apply import pack_params

    if on_tpu:
        cfg, steps, reps, latent = SD15_UNET, 20, 3, 64
        ctx_dim, ctx_len = 768, 77
    else:  # CPU smoke mode
        cfg, steps, reps, latent = tiny_unet_config(), 2, 1, 8
        ctx_dim, ctx_len = cfg.cross_attention_dim, 7

    batch = 1
    latents = jax.random.normal(jax.random.PRNGKey(0),
                                (batch, latent, latent, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (batch, ctx_len, ctx_dim), jnp.bfloat16)
    uctx = jax.random.normal(jax.random.PRNGKey(2),
                             (batch, ctx_len, ctx_dim), jnp.bfloat16)
    t = jnp.zeros((2 * batch,), jnp.int32)
    lat2 = jnp.concatenate([latents, latents]).astype(jnp.bfloat16)

    # --- bf16 baseline (QKV-fused, same fusion as the quantized model)
    from qdm_tpu.quant.apply import fuse_qkv_params

    base_model = build(QuantPlan(fuse_qkv=True), cfg)
    params = random_params(build(QuantPlan(), cfg), lat2, t,
                           jnp.concatenate([ctx, uctx]))
    params = fuse_qkv_params(params)
    base_loop = make_loop(base_model, steps)
    dt_base = time_loop(base_loop, params, latents, ctx, uctx, reps)

    # --- W8A8: packed int8 dense via Pallas (fused QKV), convs kept bf16
    w8_spec = LayerQuantSpec(mode="w8a8", w_bits=8, a_bits=8, quantize_act=True)
    # convs stay bf16: dynamic per-tensor act quant before each conv
    # serializes on a scalar reduction and negates the int8 conv win
    # (see BENCH_NOTES.md); static-scale int8 convs are round-2 work
    noq = LayerQuantSpec(mode="none")
    plan = QuantPlan(default=w8_spec, fuse_qkv=True, fuse_ln=True,
                     rules=(("conv", noq), ("time_emb", noq),
                            ("time_embedding", noq)))
    qparams = pack_params(params, plan)
    q_model = build(plan, cfg)
    q_loop = make_loop(q_model, steps)
    dt_q = time_loop(q_loop, qparams, latents, ctx, uctx, reps)

    imgs_per_sec = batch / dt_q
    base_imgs_per_sec = batch / dt_base
    print(json.dumps({
        "metric": "SD1.5 UNet W8A8 images/sec/chip (512px, 20 DDIM steps, CFG)"
        if on_tpu else "tiny-unet CPU smoke images/sec",
        "value": round(imgs_per_sec, 4),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / base_imgs_per_sec, 4),
        "bf16_img_per_sec": round(base_imgs_per_sec, 4),
    }))


if __name__ == "__main__":
    main()
