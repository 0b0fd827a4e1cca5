#!/usr/bin/env python
"""SDXL UNet throughput: bf16 vs W4A16 (BASELINE target #2) vs
W8A8-static-XLA, images/sec/chip at 1024px.

Usage: bench_sdxl.py [batch ...]   (default: 1 4)
"""

import json
import sys

import jax

from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import jax.numpy as jnp

from bench import build, make_loop, random_params, time_loop
from qdm_tpu.calib.stats import flatten_calib
from qdm_tpu.models.unet import SDXL_UNET
from qdm_tpu.quant.apply import (fill_static_act_scales, fuse_qkv_params,
                                 pack_params)
from qdm_tpu.quant.plan import LayerQuantSpec, QuantPlan

NOQ = LayerQuantSpec(mode="none")
W4 = LayerQuantSpec(mode="w4a16", w_bits=4, group_size=128, zero_point=True)
W8X = LayerQuantSpec(mode="w8a8_xla", w_bits=8, a_bits=8, quantize_act=True,
                     act_quant="static")
CONV_ST = LayerQuantSpec(mode="w8a8", w_bits=8, a_bits=8, quantize_act=True,
                         act_quant="static")
# NOTE: the SD1.5 GEGLU Pallas point fusion was tried here and LOSES
# on SDXL (batch 1: 0.299 vs 0.469 img/s, batch 2: 0.397 vs 0.482 —
# measured 2026-08-17): SDXL's wider FF shapes (2560/5120 inner at
# S<=4096) keep the XLA int8 matmul MXU-bound, so the kernel's
# per-call overhead + dynamic act quant outweigh the saved HBM round
# trip that wins on SD1.5's narrower 1280-inner levels.
NOEMB = (("time_emb", NOQ), ("time_embedding", NOQ), ("add_embedding", NOQ))


def make_sdxl_loop(model, steps, guidance=7.5):
    """SDXL loop: text_time added conds threaded through."""
    import functools

    from qdm_tpu.models.schedulers import SDXL_SCHED, ddim_step, make_ddim

    tables = make_ddim(SDXL_SCHED, steps)

    @jax.jit
    def loop(params, latents, ctx, uctx, added):
        def body(s, lat):
            t = tables.timesteps[s]
            lat_in = jnp.concatenate([lat, lat], axis=0).astype(model.dtype)
            ctx_in = jnp.concatenate([uctx, ctx], axis=0)
            tt = jnp.broadcast_to(t, (lat_in.shape[0],))
            eps = model.apply({"params": params}, lat_in, tt, ctx_in, added)
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            return ddim_step(tables, eps_u + guidance * (eps_c - eps_u),
                             lat, s, steps)

        return jax.lax.fori_loop(0, steps, body, latents)

    return loop


def time_sdxl(loop, params, latents, ctx, uctx, added, reps):
    import time as _t

    float(jnp.sum(loop(params, latents, ctx, uctx, added)))
    t0 = _t.time()
    for _ in range(reps):
        float(jnp.sum(loop(params, latents, ctx, uctx, added)))
    return (_t.time() - t0) / reps


def main():
    batches = [int(b) for b in sys.argv[1:]
               if not b.startswith("--") and b.isdigit()] or [1, 4]
    steps, reps, latent = 20, 2, 128   # 1024px
    cfg = SDXL_UNET
    ctx_dim = cfg.cross_attention_dim  # 2048
    pooled = 1280

    plans = {
        "w4a16": QuantPlan(default=W4, fuse_qkv=True,
                           rules=(("conv", NOQ),) + NOEMB),
        "w8a8_static": QuantPlan(default=W8X, fuse_qkv=True,
                                 rules=(("conv", CONV_ST),) + NOEMB),
        # int4 done right (round-3): int4 STORAGE (4x weight-traffic
        # saving vs bf16) with int8 MXU COMPUTE — no per-weight float
        # dequant on the VPU (the W4A16 0.46x failure mode).  Convs
        # ride the same int8 static path as the w8a8 plan.
        "w4a8": QuantPlan(
            default=LayerQuantSpec(mode="w4a8", w_bits=4, a_bits=8,
                                   group_size=128, zero_point=True,
                                   quantize_act=True),
            fuse_qkv=True, rules=(("conv", CONV_ST),) + NOEMB),
    }
    # w4a16_xla is omitted: XLA does not fuse the nibble unpack into the
    # matmul operand (measured 0.15x on LLM decode, BENCH_NOTES.md), so
    # it would materialize 2.6B unpacked bf16 weights per step here
    if "--all-plans" in sys.argv:
        W4XLA = LayerQuantSpec(mode="w4a16_xla", w_bits=4, group_size=128)
        plans["w4a16_xla"] = QuantPlan(default=W4XLA, fuse_qkv=True,
                                       rules=(("conv", NOQ),) + NOEMB)
    # --plan NAME: run ONLY that quantized plan and release the bf16
    # master params before timing — the hbm-capacity mode (bf16 OOMs at
    # 1024px batch 4; the packed plans only fit once the 5.2 GB bf16
    # copy is gone).  No bf16 row in this mode.
    only_plan = None
    if "--plan" in sys.argv:
        only_plan = sys.argv[sys.argv.index("--plan") + 1]
        plans = {only_plan: plans[only_plan]}

    params = None
    for batch in batches:
        latents = jax.random.normal(jax.random.PRNGKey(0),
                                    (batch, latent, latent, 4), jnp.float32)
        ctx = jax.random.normal(jax.random.PRNGKey(1), (batch, 77, ctx_dim),
                                jnp.bfloat16)
        uctx = jax.random.normal(jax.random.PRNGKey(2), (batch, 77, ctx_dim),
                                 jnp.bfloat16)
        added = {"text_embeds": jax.random.normal(
                     jax.random.PRNGKey(3), (2 * batch, pooled), jnp.bfloat16),
                 "time_ids": jnp.tile(
                     jnp.array([[1024, 1024, 0, 0, 1024, 1024]], jnp.float32),
                     (2 * batch, 1))}
        if params is None:
            # calibration capture always runs at batch-1 shapes: the
            # static per-tensor scales don't need the bench batch, and a
            # bf16 forward at 1024px batch>=4 is exactly the OOM the
            # --plan capacity mode exists to avoid
            t = jnp.zeros((2,), jnp.int32)
            lat2 = jnp.concatenate([latents[:1], latents[:1]]).astype(jnp.bfloat16)
            ctx2 = jnp.concatenate([ctx[:1], uctx[:1]])
            added1 = {"text_embeds": added["text_embeds"][:2],
                      "time_ids": added["time_ids"][:2]}

            base_model = build(QuantPlan(fuse_qkv=True), cfg)
            shapes = jax.eval_shape(lambda: build(QuantPlan(), cfg).init(
                jax.random.PRNGKey(0), lat2, t, ctx2, added1))["params"]
            import numpy as np

            # bf16 param storage (2.6B params won't fit f32 + activations)
            def init_leaf(path, s):
                name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
                if name in ("kernel",):
                    fan_in = int(np.prod(s.shape[:-1])) or 1
                    k = jax.random.fold_in(jax.random.PRNGKey(0), hash(str(path)) % (2**31))
                    return (jax.random.normal(k, s.shape, jnp.bfloat16) /
                            np.sqrt(fan_in))
                if name == "scale":
                    return jnp.ones(s.shape, jnp.bfloat16)
                return jnp.zeros(s.shape, jnp.bfloat16)

            params = jax.tree_util.tree_map_with_path(init_leaf, shapes)
            params = fuse_qkv_params(params)

            cap = build(QuantPlan(fuse_qkv=True).with_capture(True), cfg)

            @jax.jit
            def capture(params, lat2, t, ctx2, added):
                _, mut = cap.apply({"params": params}, lat2, t, ctx2, added,
                                   mutable=["calib"])
                return mut

            stats = flatten_calib(jax.device_get(
                capture(params, lat2, t, ctx2, added1))["calib"])

        row = {"batch": batch, "px": latent * 8}
        if only_plan is None:
            try:
                dt = time_sdxl(make_sdxl_loop(base_model, steps), params,
                               latents, ctx, uctx, added, reps)
                row["bf16"] = round(batch / dt, 3)
            except Exception as e:
                # bf16 params (5.2 GB) + 1024px batch-4 activations
                # exceed 16 GB hbm — quantized weights make the batch fit
                row["bf16"] = f"OOM:{type(e).__name__}"
            print(json.dumps({k: row[k] for k in ("batch", "px", "bf16")}),
                  flush=True)
        for name, plan in plans.items():
            try:
                # pack one variant at a time: 2.6B params x (bf16 base +
                # two packed copies) + activations exceed 16GB HBM
                qp = fill_static_act_scales(pack_params(params, plan), stats)
                if only_plan is not None:
                    # capacity mode: release the bf16 master copy
                    jax.block_until_ready(qp)
                    params = base_model = None
                    import gc
                    gc.collect()
                dt_q = time_sdxl(make_sdxl_loop(build(plan, cfg), steps),
                                 qp, latents, ctx, uctx, added, reps)
                row[name] = round(batch / dt_q, 3)
                if isinstance(row.get("bf16"), float):
                    row[name + "_x"] = round(row[name] / row["bf16"], 3)
            except Exception as e:
                row[name] = f"OOM:{type(e).__name__}"
                if only_plan is not None:
                    raise  # capacity mode released params: cannot continue
            qp = None
            print(json.dumps({k: row[k] for k in row if k in
                              ("batch", "px", "bf16", name, name + "_x")}),
                  flush=True)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
