#!/usr/bin/env python
"""End-to-end PIPELINE throughput: prompts -> images through the real
user API (`StableDiffusion1_x.generate`) — text encoder + 20-step CFG
denoise + VAE decode, bf16 vs the quantized serving config.

The UNet-loop benches (bench.py) isolate the denoiser; this one proves
the *user-facing path* (SURVEY §3.4 `generate`) carries the speedup —
the quantize() lifecycle (SQ calibration -> static scales -> packed
int8) is exactly what a user runs, not a hand-assembled plan.

Usage: bench_pipeline.py [batch] [--family sd15|sdxl|sd35] [--cpu]
(default: sd15 batch 8; sdxl/sd35 default batch 4 at 1024px — the
families' own headline shapes.  VERDICT r3 item 6: the BASELINE
images/sec/chip axis measured at the generate() API boundary for ALL
three pipelines.)
"""

import json
import sys
import time

import jax

from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import jax.numpy as jnp
import numpy as np

from qdm_tpu.api import StableDiffusion1_x

PROMPTS = ["a cat on a table", "a mountain at sunset", "a red bicycle",
           "an astronaut on a horse", "a bowl of ramen", "a lighthouse",
           "a forest in fog", "a city street at night"]


def timed_generate(pipe, prompts, steps, reps):
    """Sequential generate() calls, images delivered as uint8 PNGs
    would be (the 25 MB f32 fetch costs 1.05 s/batch through the
    ~34 MB/s tunnel; u8 is what any real delivery ships)."""
    imgs = pipe.generate(prompts, num_inference_steps=steps, seed=0,
                         output_type="u8")
    np.asarray(imgs).sum()
    t0 = time.time()
    for _ in range(reps):
        imgs = pipe.generate(prompts, num_inference_steps=steps, seed=0,
                             output_type="u8")
        np.asarray(imgs).sum()
    return (time.time() - t0) / reps


def timed_batches(pipe, prompts, steps, n_batches):
    """Throughput mode: generate_batches overlaps each batch's image
    fetch with the next batch's denoise compute.  min-of-2 passes: the
    tunnel's ~34 MB/s d2h link is shared and its congestion punishes
    the FASTER mode more (shorter compute hides less fetch), which
    skewed a quant/bf16 ratio 1.22 -> 1.10 between runs (r4)."""
    pipe.generate_batches([prompts], num_inference_steps=steps, seed=0)
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        outs = pipe.generate_batches([prompts] * n_batches,
                                     num_inference_steps=steps, seed=0)
        best = min(best, (time.time() - t0) / n_batches)
        assert all(o.dtype == np.uint8 for o in outs)
    return best


FAMILIES = {
    # name -> (pipeline import name, default TPU batch, metric label).
    # SDXL e2e runs batch 2: the bf16 A/B side OOMs at batch 4/1024px
    # (19.6 G vs 15.75 G HBM — batch-4 SDXL is the int8 capacity
    # regime, BENCH_NOTES "SDXL batch-4 capacity plans")
    "sd15": ("StableDiffusion1_x", 8, "SD1.5"),
    "sdxl": ("StableDiffusionXL", 2, "SDXL-1024px"),
    "sd35": ("StableDiffusion3_5", 4, "SD3.5-medium-1024px"),
}


def main():
    if "--cpu" in sys.argv:  # bounded offline mode (bench.py CPU smoke)
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.default_backend() == "tpu"
    fam = "sd15"
    if "--family" in sys.argv:
        fam = sys.argv[sys.argv.index("--family") + 1]
    cls_name, tpu_batch, label = FAMILIES[fam]
    argv = sys.argv[1:]
    # drop flag VALUES (--family X / --vae-chunk N) before reading the
    # positional batch — "--vae-chunk 2" must not become batch 2
    skip = {i + 1 for i, a in enumerate(argv)
            if a in ("--family", "--vae-chunk")}
    pos = [a for i, a in enumerate(argv) if i not in skip
           and not a.startswith("--") and a not in FAMILIES]
    batch = int(pos[0]) if pos else (tpu_batch if on_tpu else 2)
    steps, reps = (20, 2) if on_tpu else (2, 1)
    prompts = (PROMPTS * ((batch + 7) // 8))[:batch]

    import qdm_tpu.api as api
    pipe = getattr(api, cls_name).from_config(tiny=not on_tpu)
    if fam in ("sdxl", "sd35") and on_tpu:
        # 1024px: the VAE decoder's conv activations are the HBM peak
        # with the denoiser resident (batch-4 SD3.5 AND batch-2 SDXL
        # measured OOM at f32 params) — decode `--vae-chunk` samples
        # at a time (default 1; chunk 2 is the r5 lever now that
        # pipelines hold bf16-resident params — half the sliced-decode
        # dispatches if it fits)
        vc = 1
        if "--vae-chunk" in sys.argv:
            vc = int(sys.argv[sys.argv.index("--vae-chunk") + 1])
        pipe.enable_vae_slicing(vc)
    dt_bf = timed_generate(pipe, prompts, steps, reps)
    dt_bf_b = timed_batches(pipe, prompts, steps, max(reps, 2))
    out = {"metric": f"{label} pipeline imgs/s end-to-end (batch {batch}, "
                     f"{steps} steps, text-enc + VAE incl.)",
           "bf16_img_s": round(batch / dt_bf, 3),
           "bf16_batched_img_s": round(batch / dt_bf_b, 3)}
    print(json.dumps(out), flush=True)

    qc = {"w_bit": 8, "a_bit": 8, "version": "real", "quantize_act": True,
          "act_quant_type": "static", "act_quant_conv_type": "static"}
    quant_vae = "--quant-vae" in sys.argv
    pipe.quantize(qc, quantType="sq",
                  quantUnet=pipe.has_unet,
                  quantTransformer=pipe.has_transformer,
                  quantVAE=quant_vae,
                  calib_prompts=prompts[:4] if on_tpu else prompts[:2])
    dt_q = timed_generate(pipe, prompts, steps, reps)
    dt_q_b = timed_batches(pipe, prompts, steps, max(reps, 2))
    key = "quant_vae_img_s" if quant_vae else "quant_img_s"
    out[key] = round(batch / dt_q, 3)
    out["quant_batched_img_s"] = round(batch / dt_q_b, 3)
    out["vs_bf16"] = round(dt_bf / dt_q, 3)
    out["vs_bf16_batched"] = round(dt_bf_b / dt_q_b, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
