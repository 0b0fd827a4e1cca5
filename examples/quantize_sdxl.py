#!/usr/bin/env python
"""SDXL quantization end-to-end, incl. the optional refiner handoff
(reference models/StableDiffusionXL.py:13-17).

    python examples/quantize_sdxl.py --model /path/to/sdxl --out ckpt/
    # no --model: random tiny SDXL-architecture pipeline + tiny refiner
"""

import argparse

import jax.numpy as jnp

from qdm_tpu.api import StableDiffusionXL
from qdm_tpu.config import QuantConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", help="local diffusers dir (omit for random init)")
    ap.add_argument("--refiner", help="optional refiner dir")
    ap.add_argument("--out", default="sdxl_w8a8")
    ap.add_argument("--method", default="sq", choices=["rtn", "sq", "awq"])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--prompt", default="a lighthouse at dawn, volumetric light")
    args = ap.parse_args()

    if args.model:
        pipe = StableDiffusionXL.from_pretrained(args.model)
        if args.refiner:
            pipe._load_refiner(args.refiner)
    else:
        import jax

        tiny = jax.default_backend() != "tpu"
        pipe = StableDiffusionXL.from_config(tiny=tiny)
        pipe.refiner = StableDiffusionXL.tiny_refiner() if tiny else None

    # the measured SDXL serving plan: w8a8-static XLA (the GEGLU Pallas
    # point fusion is SD1.x-only — it loses on SDXL's wider FF,
    # BENCH_NOTES.md)
    cfg = QuantConfig(w_bit=8, a_bit=8, version="real", quantize_act=True,
                      act_quant_type="static", act_quant_conv_type="static",
                      alpha=0.80)
    cfg.calib.n_samples = 8
    cfg.calib.batch_size = 2
    cfg.calib.n_steps = 4

    pipe.quantize(cfg, quantType=args.method, quantUnet=True)
    images = pipe.generate(args.prompt, num_inference_steps=args.steps,
                           seed=0, use_refiner=pipe.refiner is not None)
    print("generated", images.shape)
    pipe.save_quantized(args.out)
    print("saved to", args.out)


if __name__ == "__main__":
    main()
