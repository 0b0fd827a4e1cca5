#!/usr/bin/env python
"""Instrumented generate(): monkeypatch-timestamp every internal stage
of ONE warm generate() call to locate the ~0.9s of per-call overhead
the anatomy probe showed between the stages (bench_e2e_anatomy_tpu).

Run:  nohup python -u tools/bench_e2e_trace_tpu.py > /tmp/trace.log 2>&1 &
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


def main():
    on_tpu = jax.default_backend() == "tpu"
    batch, steps = (8, 20) if on_tpu else (2, 2)
    prompts = (PROMPTS * ((batch + 7) // 8))[:batch]
    pipe = StableDiffusion1_x.from_config(tiny=not on_tpu)

    qc = {"w_bit": 8, "a_bit": 8, "version": "real", "quantize_act": True,
          "act_quant_type": "static", "act_quant_conv_type": "static"}
    pipe.quantize(qc, quantType="sq", quantUnet=True,
                  calib_prompts=prompts[:4 if on_tpu else 2])

    marks = []

    def wrap(name, fn, sync=None):
        def inner(*a, **k):
            t0 = time.time()
            out = fn(*a, **k)
            if sync is not None:
                sync(out)
            marks.append((name, time.time() - t0))
            return out
        return inner

    pipe._encode_prompts = wrap("encode", pipe._encode_prompts,
                                lambda o: float(jnp.sum(o[0])))
    pipe.denoise = wrap("denoise", pipe.denoise,
                        lambda o: float(jnp.sum(o)))
    pipe.decode_latents = wrap("vae+fetch", pipe.decode_latents)

    # ALSO time the latent sampling by wrapping jax.random.normal once
    orig_normal = jax.random.normal

    def timed_normal(*a, **k):
        t0 = time.time()
        out = orig_normal(*a, **k)
        jax.block_until_ready(out)
        marks.append(("randn", time.time() - t0))
        return out

    jax.random.normal = timed_normal
    try:
        # warm
        imgs = pipe.generate(prompts, num_inference_steps=steps, seed=0)
        np.asarray(imgs).sum()
        for rep in range(3):
            marks.clear()
            t0 = time.time()
            imgs = pipe.generate(prompts, num_inference_steps=steps, seed=0)
            np.asarray(imgs).sum()
            total = time.time() - t0
            acc = sum(t for _, t in marks)
            print(json.dumps({"rep": rep, "total_s": round(total, 4),
                              "stages": {n: round(t, 4) for n, t in marks},
                              "unaccounted_s": round(total - acc, 4)}),
                  flush=True)
    finally:
        jax.random.normal = orig_normal


if __name__ == "__main__":
    main()
