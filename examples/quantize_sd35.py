#!/usr/bin/env python
"""SD3.5 (MMDiT) quantization end-to-end: AdaLN-folded SmoothQuant on
the joint transformer, flow-match sampling (reference
models/StableDiffusion3_5.py).

    python examples/quantize_sd35.py --model /path/to/sd35 --out ckpt/
    # no --model: random tiny MMDiT-architecture pipeline
"""

import argparse

import jax
import jax.numpy as jnp

from qdm_tpu.api import StableDiffusion3_5
from qdm_tpu.config import QuantConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", help="local diffusers dir (omit for random init)")
    ap.add_argument("--out", default="sd35_w8a8")
    ap.add_argument("--method", default="sq", choices=["rtn", "sq", "awq"])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--prompt", default="macro photo of a dew drop on a leaf")
    args = ap.parse_args()

    pipe = (StableDiffusion3_5.from_pretrained(args.model) if args.model
            else StableDiffusion3_5.from_config(
                tiny=jax.default_backend() != "tpu"))

    cfg = QuantConfig(w_bit=8, a_bit=8, version="real", quantize_act=True,
                      act_quant_type="static", alpha=0.80)
    cfg.calib.n_samples = 8
    cfg.calib.batch_size = 2
    cfg.calib.n_steps = 4

    # SD3.5 has a transformer, not a unet (checkQuantStatus parity,
    # reference StableDiffusion3_5.py:33-35)
    pipe.quantize(cfg, quantType=args.method, quantUnet=False,
                  quantTransformer=True)
    images = pipe.generate(args.prompt, num_inference_steps=args.steps, seed=0)
    print("generated", images.shape)
    pipe.save_quantized(args.out)
    print("saved to", args.out)


if __name__ == "__main__":
    main()
