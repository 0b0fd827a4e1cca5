#!/usr/bin/env python
"""AWQ/GPTQ W4A16 quantization of a LLaMA-family LLM (reference
BaseAWQForCausalLM lifecycle; GPTQ and the smooth+gptq composition
are beyond-reference extensions, quant/gptq.py).

    python examples/quantize_llm.py --model /path/to/qwen2 --out ckpt/
"""

import argparse

import numpy as np

from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.config import QuantConfig
from qdm_tpu.utils.tokenizer import SimpleTokenizer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", help="local HF dir (omit for random tiny model)")
    ap.add_argument("--out", default="llm_w4a16")
    ap.add_argument("--method", default="awq",
                choices=["rtn", "sq", "awq", "gptq"])
    ap.add_argument("--smooth", action="store_true",
                    help="SmoothQuant migration before the GPTQ "
                         "Hessian capture (gptq only; the best w4 "
                         "quantizer on the outlier tables)")
    ap.add_argument("--w-bit", type=int, default=4)
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--real", action="store_true")
    args = ap.parse_args()

    lm = (CausalLM.from_pretrained(args.model)
          if args.model else CausalLM.from_config())
    tok = SimpleTokenizer(vocab_size=lm.config.vocab_size, max_len=512)

    cfg = QuantConfig(w_bit=args.w_bit, q_group_size=args.group_size,
                      zero_point=True,
                      version="real" if args.real else "fake")
    cfg.calib.n_samples = 16
    cfg.calib.batch_size = 4
    cfg.calib.max_seq_len = 512

    lm.quantize(tokenizer=tok, quant_config=cfg, quantType=args.method,
                smooth=args.smooth)
    ids = np.zeros((1, 8), np.int32)
    out = lm.generate(ids, max_new_tokens=8)
    print("generated ids:", out[0].tolist())
    lm.save_quantized(args.out)
    print("saved to", args.out)


if __name__ == "__main__":
    main()
