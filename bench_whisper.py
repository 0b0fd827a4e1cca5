#!/usr/bin/env python
"""Whisper ASR throughput: bf16 vs int8 (w8a8_xla dense path), batched
30 s utterances, greedy decode — the serving shape of the reference's
librispeech WER harness (evaluation/eval_utils.py:61-115, which runs
whisper through the HF pipeline at batch_size=4).

Metric: real-time factor (audio-seconds transcribed per wall-second
per chip) + decoded tok/s.  The whole utterance -> mel -> encoder ->
cross-KV -> while_loop decode pipeline is ONE jitted dispatch
(api/speech.py), so tunnel latency does not pollute the numbers.

Prints one JSON line per variant.
"""

import json
import sys
import time

import jax

from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import jax.numpy as jnp
import numpy as np

from qdm_tpu.api.speech import WhisperASR
from qdm_tpu.models import whisper as whisper_lib


def main():
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = whisper_lib.WHISPER_SMALL
        batch, n_new, reps = 8, 32, 3
        dtype = jnp.bfloat16
    else:
        cfg = whisper_lib.tiny_whisper_config()
        batch, n_new, reps = 2, 4, 1
        dtype = jnp.float32

    from qdm_tpu.utils import audio as audio_lib

    n_samples = min(audio_lib.N_SAMPLES,
                    2 * cfg.max_source_positions * audio_lib.HOP_LENGTH)
    audio_s = n_samples / audio_lib.SAMPLE_RATE
    wav = (np.random.default_rng(0)
           .standard_normal((batch, n_samples)).astype(np.float32) * 0.1)

    out = {"metric": f"Whisper-small ASR (batch {batch}, {audio_s:.0f}s "
                     f"utterances, {n_new} new tokens), RTF = "
                     "audio-sec/wall-sec/chip"}

    def timed(asr):
        asr.transcribe_ids(wav, max_new_tokens=n_new)   # compile
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            asr.transcribe_ids(wav, max_new_tokens=n_new)
            best = min(best, time.time() - t0)
        return best

    asr = WhisperASR.from_config(cfg, dtype=dtype)
    dt = timed(asr)
    out["bf16_rtf"] = round(batch * audio_s / dt, 1)
    out["bf16_tok_s"] = round(batch * n_new / dt, 1)
    print(json.dumps(out), flush=True)

    asr.quantize({"w_bit": 8, "a_bit": 8, "version": "real",
                  "quantize_act": True, "act_quant_type": "per_token"},
                 quantType="rtn")
    dt_q = timed(asr)
    out["w8a8_rtf"] = round(batch * audio_s / dt_q, 1)
    out["w8a8_tok_s"] = round(batch * n_new / dt_q, 1)
    out["w8a8_x"] = round(dt / dt_q, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
