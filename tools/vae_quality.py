#!/usr/bin/env python
"""VAE int8-decoder quality probe: per-tensor vs per-channel static
activation scales.

Round-2 finding (BENCH_NOTES): int8 VAE decode is +12% speed but
per-tensor act scales collapse quality (PSNR 30.6 -> 15.1) because the
decoder's per-channel dynamic range exceeds int8.  Round 3 adds the
'static_channel' scheme (per-input-channel scales folded into the
weights at pack time — reference per-channel conv act quant,
quantize/fake_quant.py:123-131, made static).  This tool measures both
against the bf16 decode on identical latents and times the decode.

Writes tools/vae_quality.json.  Run on TPU: python tools/vae_quality.py
CPU smoke: python tools/vae_quality.py --tiny
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--tiny" in sys.argv:
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

if "--tiny" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import jax.numpy as jnp
import numpy as np


def main():
    from qdm_tpu.api.pipeline import StableDiffusion1_x
    from qdm_tpu.evaluation.lpips import psnr, ssim

    tiny = "--tiny" in sys.argv or jax.default_backend() != "tpu"
    dtype = jnp.float32 if tiny else jnp.bfloat16
    batch = 2 if tiny else 8

    ref_pipe = StableDiffusion1_x.from_config(tiny=tiny, dtype=dtype, seed=0)
    h = w = ref_pipe.default_sample_size()
    if "--trajectory" in sys.argv:
        # end-of-denoise latents, NOT N(0,1): the distribution the VAE
        # actually sees in the pipeline (the round-2 15.1 dB per-tensor
        # collapse happened on these, not on unit-normal draws)
        lat = np.asarray(ref_pipe.generate(
            ["a photo of a cat"] * batch,
            num_inference_steps=4 if tiny else 20, seed=7,
            output_type="latent"))
        lat_kind = "end-of-denoise trajectory (fp UNet, 20 steps, seed 7)"
    else:
        lat = np.asarray(jax.random.normal(
            jax.random.PRNGKey(7), (batch, h, w, ref_pipe.latent_channels()),
            jnp.float32))
        lat_kind = "fixed N(0,1) seed 7"

    def timed_decode(pipe):
        img = pipe.decode_latents(lat)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            img = pipe.decode_latents(lat)
        return img, (time.time() - t0) / reps

    ref, dt_ref = timed_decode(ref_pipe)
    del ref_pipe

    rows = [{"config": "bf16", "psnr": None, "ssim": None,
             "decode_s": round(dt_ref, 4)}]
    # the weight-only row separates weight-quant error from act-quant
    # error: if it tracks bf16 while the a8 rows collapse, the loss is
    # in the activation scales, not the int8 conv weights
    variants = [
        ("int8 weight-only (a16)", {"w_bit": 8, "a_bit": 16,
                                    "version": "real"}),
        ("int8 static per-tensor", {"w_bit": 8, "a_bit": 8,
                                    "version": "real", "quantize_act": True,
                                    "act_quant_type": "static",
                                    "act_quant_conv_type": "static",
                                    "vae_per_channel_acts": False}),
        ("int8 static per-channel-smoothed (a=0.5, folded)",
         {"w_bit": 8, "a_bit": 8, "version": "real", "quantize_act": True,
          "act_quant_type": "static", "act_quant_conv_type": "static",
          "vae_per_channel_acts": True}),
    ]
    for name, qdict in variants:
        pipe = StableDiffusion1_x.from_config(tiny=tiny, dtype=dtype, seed=0)
        pipe.quantize(qdict, quantType="sq", quantUnet=False, quantVAE=True)
        img, dt = timed_decode(pipe)
        rows.append({
            "config": name,
            "psnr": float(np.mean(np.asarray(psnr(ref, img)))),
            "ssim": float(np.mean(np.asarray(ssim(ref, img)))),
            "decode_s": round(dt, 4),
        })
        print(json.dumps(rows[-1]), flush=True)
        del pipe

    artifact = {"setup": {"tiny": tiny, "batch": batch,
                          "latents": lat_kind,
                          "weights": "deterministic random (seed 0)"},
                "rows": rows}
    here = os.path.dirname(os.path.abspath(__file__))
    name = ("vae_quality_trajectory.json" if "--trajectory" in sys.argv
            else "vae_quality.json")
    with open(os.path.join(here, name), "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps({"done": True, "rows": rows}))


if __name__ == "__main__":
    main()
