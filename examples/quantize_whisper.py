#!/usr/bin/env python
"""Quantize a Whisper ASR model and transcribe audio end-to-end.

The reference only reaches Whisper through the HF pipeline inside its
WER harness (evaluation/eval_utils.py:61-115); here the model is a
first-class quantizable citizen with the same lifecycle as the LLMs:
from_pretrained/from_config -> quantize -> transcribe -> save/load.

    python examples/quantize_whisper.py --model /path/to/whisper-small
    python examples/quantize_whisper.py              # random tiny model
"""

import argparse

import numpy as np

from qdm_tpu.api.speech import WhisperASR
from qdm_tpu.config import QuantConfig
from qdm_tpu.utils.audio import SAMPLE_RATE


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", help="local HF whisper dir (omit for tiny random)")
    ap.add_argument("--out", default="whisper_w8a8")
    ap.add_argument("--w-bit", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=4.0)
    args = ap.parse_args()

    asr = (WhisperASR.from_pretrained(args.model)
           if args.model else WhisperASR.from_config())
    sr = SAMPLE_RATE

    # synthetic test clip: a chirp (use a real waveform array in practice)
    t = np.arange(int(args.seconds * sr)) / sr
    wav = (0.1 * np.sin(2 * np.pi * (200 + 40 * t) * t)).astype(np.float32)

    ids_fp = asr.transcribe_ids(wav[None], max_new_tokens=16)

    cfg = QuantConfig(w_bit=args.w_bit, a_bit=8, version="real",
                      quantize_act=True, act_quant_type="per_token")
    asr.quantize(cfg, quantType="rtn")
    ids_q = asr.transcribe_ids(wav[None], max_new_tokens=16)
    agree = float((np.asarray(ids_fp) == np.asarray(ids_q)).mean())
    print(f"fp-vs-int8 token agreement: {agree:.3f}")

    asr.save_quantized(args.out)
    asr2 = WhisperASR.from_quantized(args.out)
    ids_r = asr2.transcribe_ids(wav[None], max_new_tokens=16)
    assert (np.asarray(ids_r) == np.asarray(ids_q)).all(), \
        "save/load round-trip changed the transcription"
    print(f"saved + reloaded from {args.out}: round-trip exact")


if __name__ == "__main__":
    main()
