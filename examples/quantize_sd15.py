#!/usr/bin/env python
"""SD1.5 SmoothQuant W8A8 end-to-end (the reference's flagship path,
SURVEY.md §3.2).

    python examples/quantize_sd15.py --model /path/to/sd15 --out ckpt/
"""

import argparse

import jax.numpy as jnp

from qdm_tpu.api import StableDiffusion1_x
from qdm_tpu.config import QuantConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", help="local diffusers dir (omit for random init)")
    ap.add_argument("--out", default="sd15_w8a8")
    ap.add_argument("--method", default="sq", choices=["rtn", "sq", "awq", "codebook"])
    ap.add_argument("--w-bit", type=int, default=8)
    ap.add_argument("--a-bit", type=int, default=8)
    ap.add_argument("--real", action="store_true",
                    help="packed int8/int4 kernels instead of fake quant")
    ap.add_argument("--static", action="store_true",
                    help="calibrated static activation scales (fastest "
                         "serving path on v5e: pure-XLA int8 incl. convs)")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--prompt", default="a photograph of an astronaut riding a horse")
    args = ap.parse_args()

    pipe = (StableDiffusion1_x.from_pretrained(args.model)
            if args.model else StableDiffusion1_x.from_config())

    cfg = QuantConfig(
        w_bit=args.w_bit, a_bit=args.a_bit,
        version="real" if (args.real or args.static) else "fake_act",
        quantize_act=args.a_bit < 16, alpha=0.80,
    )
    if args.static:
        cfg.act_quant_type = "static"
        cfg.act_quant_conv_type = "static"

    cfg.calib.n_samples = 96      # reference: 96 MSCOCO prompts
    cfg.calib.batch_size = 8
    cfg.calib.n_steps = 50

    pipe.quantize(cfg, quantType=args.method, quantUnet=True,
                  calib_cache=f"{args.out}_calib_stats.safetensors")
    images = pipe.generate(args.prompt, num_inference_steps=args.steps, seed=0)
    print("generated", images.shape)
    pipe.save_quantized(args.out)
    print("saved to", args.out)


if __name__ == "__main__":
    main()
