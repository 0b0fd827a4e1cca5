#!/usr/bin/env python
"""Benchmark: SD1.5 UNet denoising throughput (images/sec/chip),
quantized W8A8 vs bf16 XLA baseline.

Prints ONE JSON line:
  {"metric": ..., "value": imgs_per_sec, "unit": "img/s",
   "vs_baseline": speedup_vs_bf16}

BASELINE.json's axis is images/sec/chip, so the headline config is the
throughput mode: batch 8 (CFG batch 16 through the UNet), 512x512,
20 DDIM steps, the full loop compiled as one lax.fori_loop.  The
quantized path is the round-2 winner: W8A8 with calibrated static
per-tensor activation scales expressed in plain XLA (w8a8_xla dense +
XLA int8 convs), fused QKV, plus ONE Pallas island — the fused GEGLU
kernel (it replaces a real HBM round trip; every other Pallas
placement lost to XLA's fusion).  See BENCH_NOTES.md for the sweeps
that selected it.
"""

import json
import time

import jax

from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
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
    # block_until_ready can return before compute finishes.  MIN of
    # reps, not mean (VERDICT r4 weak #8): shared-tunnel congestion
    # hits random passes; the min is the defensible per-pass number
    # (bench_pipeline's batched passes already min-of-2)
    float(jnp.sum(loop(params, latents, ctx, uctx)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        float(jnp.sum(loop(params, latents, ctx, uctx)))
        best = min(best, time.time() - t0)
    return best


def quantized_plan_and_params(cfg, params, lat2, t, ctx2):
    """The headline quantized config: fused-QKV params, capture-derived
    static act scales, w8a8_xla dense + XLA int8 convs."""
    from qdm_tpu.calib.stats import flatten_calib
    from qdm_tpu.quant.apply import (fill_static_act_scales, fuse_qkv_params,
                                     pack_params)
    from qdm_tpu.quant.plan import LayerQuantSpec, QuantPlan

    noq = LayerQuantSpec(mode="none")
    w8x = LayerQuantSpec(mode="w8a8_xla", w_bits=8, a_bits=8,
                         quantize_act=True, act_quant="static")
    conv = LayerQuantSpec(mode="w8a8", w_bits=8, a_bits=8, quantize_act=True,
                          act_quant="static")
    # the fused Pallas GEGLU kernel as a point fusion inside the
    # otherwise-XLA plan: it kills the (M, 2*inner) bf16 HBM round trip
    # the XLA path materializes (bench_hybrid.py: 3.39 -> 3.60 img/s)
    geglu = LayerQuantSpec(mode="w8a8", w_bits=8, a_bits=8, quantize_act=True)
    # int8_bmm stays OFF: even the fused Pallas int8 flash kernel loses
    # to bf16 attention at batch-8 CFG (9.9 vs 7.0 ms at S=4096 —
    # bench_attn_int8.py; D=40/80 pads the 128-lane MXU so bf16 is
    # already at the padding roofline), and bf16 attention is also the
    # more accurate choice
    plan = QuantPlan(default=w8x, fuse_qkv=True,
                     rules=(("net_0/proj", geglu), ("conv", conv),
                            ("time_emb", noq), ("time_embedding", noq)))
    params = fuse_qkv_params(params)
    cap = build(QuantPlan(fuse_qkv=True).with_capture(True), cfg)

    @jax.jit
    def capture(params, lat2, t, ctx2):
        _, mut = cap.apply({"params": params}, lat2, t, ctx2,
                           mutable=["calib"])
        return mut

    stats = flatten_calib(jax.device_get(capture(params, lat2, t, ctx2))["calib"])
    qparams = fill_static_act_scales(pack_params(params, plan), stats)
    return plan, params, qparams


def _backend_or_cpu() -> str:
    """Resolve the backend WITHOUT hanging: when the axon tunnel is
    down, backend init blocks forever (no exception), which would
    leave the driver's bench artifact empty.  Probe init in a bounded
    subprocess; on timeout/failure force the CPU platform so the run
    still emits its one JSON line (marked backend=cpu)."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=240)
        backend = r.stdout.strip().splitlines()[-1] if r.returncode == 0 \
            else ""
    except subprocess.TimeoutExpired:
        backend = ""
    if backend != "tpu":
        jax.config.update("jax_platforms", "cpu")
    return jax.default_backend()


def _e2e_pipeline_metrics(on_tpu: bool) -> dict:
    """User-API end-to-end numbers (VERDICT r3 item 10: the round-end
    artifact must carry BOTH the UNet-loop headline and the pipeline
    e2e ratio).  Runs bench_pipeline.py in a bounded subprocess (own
    HBM lifetime; a failure there cannot eat the headline line) and
    returns its last JSON line's fields, prefixed e2e_."""
    import os
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_pipeline.py")
    cmd = [sys.executable, "-u", script] + ([] if on_tpu else ["--cpu"])
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=2400 if on_tpu else 600)
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        d = json.loads(line)
    except Exception as e:  # noqa: BLE001 - artifact must still emit
        return {"e2e_error": f"{type(e).__name__}: {e}"[:200]}
    return {"e2e_quant_img_s": d.get("quant_batched_img_s"),
            "e2e_bf16_img_s": d.get("bf16_batched_img_s"),
            "e2e_vs_bf16": d.get("vs_bf16_batched")}


def main():
    on_tpu = _backend_or_cpu() == "tpu"
    from qdm_tpu.models.unet import SD15_UNET, tiny_unet_config
    from qdm_tpu.quant.plan import QuantPlan

    if on_tpu:
        cfg, steps, reps, latent, batch = SD15_UNET, 20, 3, 64, 8
        ctx_dim, ctx_len = 768, 77
    else:  # CPU smoke mode
        cfg, steps, reps, latent, batch = tiny_unet_config(), 2, 1, 8, 2
        ctx_dim, ctx_len = cfg.cross_attention_dim, 7

    latents = jax.random.normal(jax.random.PRNGKey(0),
                                (batch, latent, latent, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (batch, ctx_len, ctx_dim), jnp.bfloat16)
    uctx = jax.random.normal(jax.random.PRNGKey(2),
                             (batch, ctx_len, ctx_dim), jnp.bfloat16)
    t = jnp.zeros((2 * batch,), jnp.int32)
    lat2 = jnp.concatenate([latents, latents]).astype(jnp.bfloat16)
    ctx2 = jnp.concatenate([ctx, uctx])

    params = random_params(build(QuantPlan(), cfg), lat2, t, ctx2)
    plan, params, qparams = quantized_plan_and_params(cfg, params, lat2, t, ctx2)

    # bf16 baseline shares the fused-QKV structure (same fusion advantages)
    base_model = build(QuantPlan(fuse_qkv=True), cfg)
    dt_base = time_loop(make_loop(base_model, steps), params, latents, ctx,
                        uctx, reps)

    q_model = build(plan, cfg)
    dt_q = time_loop(make_loop(q_model, steps), qparams, latents, ctx, uctx,
                     reps)

    imgs_per_sec = batch / dt_q
    base_imgs_per_sec = batch / dt_base
    out = {
        "metric": "SD1.5 UNet W8A8-static images/sec/chip (512px, batch 8, 20 DDIM steps, CFG)"
        if on_tpu else "tiny-unet CPU smoke images/sec",
        "value": round(imgs_per_sec, 4),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / base_imgs_per_sec, 4),
        "bf16_img_per_sec": round(base_imgs_per_sec, 4),
    }
    out.update(_e2e_pipeline_metrics(on_tpu))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
