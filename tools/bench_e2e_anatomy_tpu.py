#!/usr/bin/env python
"""Anatomy of the user-facing SD1.5 generate() e2e gap (VERDICT r3 #1).

BENCH_NOTES r2 measured generate() at 1.04x vs the 1.22x UNet-loop
headline and attributed the dilution to "VAE + fixed costs" — this
probe itemizes every stage on the chip so the fix lands on the right
one:

  1. text-encode time
  2. denoise dispatch+sync (scalar fetch — no image bytes)
  3. VAE decode on-device (scalar fetch)
  4. device->host fetch: f32 images (25 MB) vs on-device uint8 (6 MB)
  5. raw tunnel device->host bandwidth probe
  6. full generate() as the user calls it

Both bf16 and the quantize() lifecycle W8A8-static mode.

Run on the TPU (one job at a time):
  nohup python -u tools/bench_e2e_anatomy_tpu.py > /tmp/anatomy.log 2>&1 &
"""

import json
import os
import sys
import time

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import jax.numpy as jnp
import numpy as np

from qdm_tpu.api import StableDiffusion1_x

PROMPTS = ["a cat on a table", "a mountain at sunset", "a red bicycle",
           "an astronaut on a horse", "a bowl of ramen", "a lighthouse",
           "a forest in fog", "a city street at night"]


def t_best(fn, reps=3):
    fn()                                   # warm/compile
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def stage_times(pipe, prompts, steps):
    out = {}
    ctx, uctx, added = pipe._encode_prompts(prompts, None)
    out["text_encode_s"] = t_best(lambda: float(jnp.sum(
        pipe._encode_prompts(prompts, None)[0])))
    size = pipe.default_sample_size()
    lat0 = jax.random.normal(jax.random.PRNGKey(0),
                             (len(prompts), size, size, 4), jnp.float32)

    def denoise():
        lat = pipe.denoise(lat0, ctx, uctx, added, steps, 7.5)
        float(jnp.sum(lat))
        return lat

    out["denoise_s"] = t_best(denoise)
    lat = pipe.denoise(lat0, ctx, uctx, added, steps, 7.5)

    # VAE decode, on-device only (pipe.decode_latents includes np fetch)
    vae = pipe.components["vae"]

    def vae_fn(params, l):
        img = (vae.apply({"params": params}, l.astype(pipe.dtype),
                         method=vae.decode).astype(jnp.float32) + 1) / 2
        return img.clip(0, 1)

    vae_jit = jax.jit(vae_fn)
    out["vae_device_s"] = t_best(lambda: float(jnp.sum(
        vae_jit(pipe.params["vae"], lat))))

    img_f32 = vae_jit(pipe.params["vae"], lat)
    out["fetch_f32_s"] = t_best(lambda: np.asarray(img_f32).sum())

    u8_jit = jax.jit(lambda params, l: (
        vae_fn(params, l) * 255).astype(jnp.uint8))
    img_u8 = u8_jit(pipe.params["vae"], lat)
    float(jnp.sum(img_u8.astype(jnp.int32)))
    out["fetch_u8_s"] = t_best(lambda: np.asarray(img_u8).sum())

    def gen():
        imgs = pipe.generate(prompts, num_inference_steps=steps, seed=0)
        np.asarray(imgs).sum()

    out["generate_s"] = t_best(gen)
    return out


def main():
    on_tpu = jax.default_backend() == "tpu"
    batch, steps = (8, 20) if on_tpu else (2, 2)
    prompts = (PROMPTS * ((batch + 7) // 8))[:batch]

    # raw tunnel bandwidth: fetch a 25 MB f32 array
    mb = 25 if on_tpu else 1
    blob = jnp.zeros((mb * 1024 * 1024 // 4,), jnp.float32) + 1
    float(jnp.sum(blob))
    dt = t_best(lambda: np.asarray(blob).sum())
    print(json.dumps({"probe": "d2h_bandwidth", "mb": mb,
                      "s": round(dt, 4),
                      "mb_s": round(mb / dt, 1)}), flush=True)

    pipe = StableDiffusion1_x.from_config(tiny=not on_tpu)
    res = {"bf16": stage_times(pipe, prompts, steps)}
    print(json.dumps({"bf16": res["bf16"]}), flush=True)

    qc = {"w_bit": 8, "a_bit": 8, "version": "real", "quantize_act": True,
          "act_quant_type": "static", "act_quant_conv_type": "static"}
    pipe.quantize(qc, quantType="sq", quantUnet=True,
                  calib_prompts=prompts[:4 if on_tpu else 2])
    res["quant"] = stage_times(pipe, prompts, steps)
    print(json.dumps({"quant": res["quant"]}), flush=True)

    for mode in res:
        s = res[mode]
        print(json.dumps({
            "mode": mode, "batch": batch,
            "sum_parts_s": round(s["text_encode_s"] + s["denoise_s"]
                                 + s["vae_device_s"] + s["fetch_f32_s"], 3),
            "generate_s": round(s["generate_s"], 3),
            "img_s_now": round(batch / s["generate_s"], 3),
            "img_s_u8_overlap_bound": round(
                batch / (s["denoise_s"] + s["vae_device_s"]), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
