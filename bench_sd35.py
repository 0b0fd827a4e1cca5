#!/usr/bin/env python
"""SD3.5-medium MMDiT throughput: bf16 vs W8A8-static-XLA at 1024px.

Third model family's perf evidence (SD1.5: bench.py, SDXL:
bench_sdxl.py).  MMDiT is transformer-only (no convs) with head_dim 64
— the joint-attention core pads the 128-lane MXU to 50% (vs 31% for
SD1.5's D=40), so the static-int8 dense recipe carries a larger share
of the step than on the UNets.

Usage: bench_sd35.py [batch ...]   (default: 1 4)
"""

import json
import sys

import jax

from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import jax.numpy as jnp
import numpy as np

from qdm_tpu.calib.stats import flatten_calib
from qdm_tpu.models.mmdit import MMDiT, SD35_MEDIUM, tiny_mmdit_config
from qdm_tpu.models.schedulers import make_flow_match, flow_match_step
from qdm_tpu.quant.apply import fill_static_act_scales, pack_params
from qdm_tpu.quant.plan import LayerQuantSpec, QuantPlan

NOQ = LayerQuantSpec(mode="none")
W8X = LayerQuantSpec(mode="w8a8_xla", w_bits=8, a_bits=8, quantize_act=True,
                     act_quant="static")
# embedders stay fp (tiny, feed every AdaLN modulation)
NOEMB = (("time_text_embed", NOQ), ("pos_embed", NOQ))


def make_sd35_loop(model, steps, guidance=7.0):
    tables = make_flow_match(steps)

    @jax.jit
    def loop(params, latents, ctx, uctx, pooled, upooled):
        def body(s, lat):
            t = tables.timesteps[s]
            lat_in = jnp.concatenate([lat, lat], axis=0).astype(model.dtype)
            ctx_in = jnp.concatenate([uctx, ctx], axis=0)
            pool_in = jnp.concatenate([upooled, pooled], axis=0)
            tt = jnp.broadcast_to(t, (lat_in.shape[0],))
            eps = model.apply({"params": params}, lat_in, tt, ctx_in, pool_in)
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            return flow_match_step(tables, eps_u + guidance * (eps_c - eps_u),
                                   lat, s)

        return jax.lax.fori_loop(0, steps, body, latents)

    return loop


def time_sd35(loop, params, args, reps):
    import time as _t

    float(jnp.sum(loop(params, *args)))
    t0 = _t.time()
    for _ in range(reps):
        float(jnp.sum(loop(params, *args)))
    return (_t.time() - t0) / reps


def main():
    on_tpu = jax.default_backend() == "tpu"
    batches = [int(b) for b in sys.argv[1:]
               if not b.startswith("--") and b.isdigit()] or [1, 4]
    if on_tpu:
        cfg, steps, reps, latent, ctx_len = SD35_MEDIUM, 20, 2, 128, 333
    else:  # CPU smoke
        cfg, steps, reps, latent, ctx_len = tiny_mmdit_config(), 2, 1, 8, 7
        batches = [2]

    plans = {"w8a8_static": QuantPlan(default=W8X, rules=NOEMB)}
    if "--fused" in sys.argv:
        # fused joint-attention projections (one 3x-wide matmul per
        # side; see the fused-QKV int8 bisect in BENCH_NOTES.md)
        plans = {"w8a8_fused": QuantPlan(default=W8X, rules=NOEMB,
                                         fuse_qkv=True)}

    params = None
    for batch in batches:
        latents = jax.random.normal(jax.random.PRNGKey(0),
                                    (batch, latent, latent, cfg.in_channels),
                                    jnp.float32)
        ctx = jax.random.normal(jax.random.PRNGKey(1),
                                (batch, ctx_len, cfg.joint_attention_dim),
                                jnp.bfloat16)
        uctx = jax.random.normal(jax.random.PRNGKey(2), ctx.shape, jnp.bfloat16)
        pooled = jax.random.normal(jax.random.PRNGKey(3),
                                   (batch, cfg.pooled_projection_dim),
                                   jnp.bfloat16)
        upooled = jnp.zeros_like(pooled)
        args = (latents, ctx, uctx, pooled, upooled)

        if params is None:
            # calib capture at batch-1 CFG shapes
            t = jnp.zeros((2,), jnp.int32)
            lat2 = jnp.concatenate([latents[:1]] * 2).astype(jnp.bfloat16)
            ctx2 = jnp.concatenate([ctx[:1], uctx[:1]])
            pool2 = jnp.concatenate([pooled[:1], upooled[:1]])

            base_model = MMDiT(config=cfg, dtype=jnp.bfloat16)
            shapes = jax.eval_shape(lambda: base_model.init(
                jax.random.PRNGKey(0), lat2, t, ctx2, pool2))["params"]

            def init_leaf(path, s):
                name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
                if name in ("kernel",):
                    fan_in = int(np.prod(s.shape[:-1])) or 1
                    k = jax.random.fold_in(jax.random.PRNGKey(0),
                                           hash(str(path)) % (2 ** 31))
                    return (jax.random.normal(k, s.shape, jnp.bfloat16) /
                            np.sqrt(fan_in))
                if name == "scale":
                    return jnp.ones(s.shape, s.dtype)
                return jnp.zeros(s.shape, s.dtype)

            params = jax.tree_util.tree_map_with_path(init_leaf, shapes)

            cap = MMDiT(config=cfg, dtype=jnp.bfloat16,
                        plan=QuantPlan().with_capture(True))

            @jax.jit
            def capture(params, lat2, t, ctx2, pool2):
                _, mut = cap.apply({"params": params}, lat2, t, ctx2, pool2,
                                   mutable=["calib"])
                return mut

            stats = flatten_calib(jax.device_get(
                capture(params, lat2, t, ctx2, pool2))["calib"])

        row = {"batch": batch, "px": latent * 8}
        # --mask-pad: A/B the 128-pad key mask (mask_ctx_pad — restores
        # the reference's unaligned joint-attention numerics via flash
        # segment ids; tests pin the parity, this measures the cost)
        masks = ((False, True) if "--mask-pad" in sys.argv else (False,))
        import dataclasses as _dc
        for m in masks:
            cfg_m = _dc.replace(cfg, mask_ctx_pad=True) if m else cfg
            tag = "_mask" if m else ""
            model_m = (MMDiT(config=cfg_m, dtype=jnp.bfloat16)
                       if m else base_model)
            dt = time_sd35(make_sd35_loop(model_m, steps), params, args,
                           reps)
            row["bf16" + tag] = round(batch / dt, 3)
            print(json.dumps(row), flush=True)
            for name, plan in plans.items():
                p = params
                if plan.fuse_qkv:
                    from qdm_tpu.quant.apply import fuse_qkv_params
                    p = fuse_qkv_params(params)
                qp = fill_static_act_scales(pack_params(p, plan), stats)
                del p
                q_model = MMDiT(config=cfg_m, dtype=jnp.bfloat16, plan=plan)
                dt_q = time_sd35(make_sd35_loop(q_model, steps), qp, args,
                                 reps)
                row[name + tag] = round(batch / dt_q, 3)
                row[name + tag + "_x"] = round(row[name + tag]
                                               / row["bf16" + tag], 3)
                del qp
                print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
