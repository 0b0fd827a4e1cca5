#!/usr/bin/env python
"""Isolate the decode_latents slowdown: np.asarray on an IN-FLIGHT
jitted result vs scalar-sync-then-fetch vs jax.device_get, on the real
pipeline VAE.  (trace probe: vae+fetch=1.2-2.2s inside generate vs
0.16s standalone.)

Run: nohup python -u tools/bench_fetch_probe_tpu.py > /tmp/fetch.log 2>&1 &
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


def main():
    on_tpu = jax.default_backend() == "tpu"
    batch = 8 if on_tpu else 2
    pipe = StableDiffusion1_x.from_config(tiny=not on_tpu)
    size = pipe.default_sample_size()
    lat = jax.random.normal(jax.random.PRNGKey(0),
                            (batch, size, size, 4), jnp.float32)
    vae = pipe.components["vae"]

    fn = jax.jit(lambda params, l: (
        (vae.apply({"params": params}, l.astype(pipe.dtype),
                   method=vae.decode).astype(jnp.float32) + 1) / 2
    ).clip(0, 1))
    p = pipe.params["vae"]
    np.asarray(fn(p, lat))                    # warm

    for rep in range(3):
        t0 = time.time()
        out = fn(p, lat)
        a = np.asarray(out)
        t_direct = time.time() - t0

        t0 = time.time()
        out = fn(p, lat)
        float(jnp.sum(out))                   # force completion first
        t_sync = time.time() - t0
        t0 = time.time()
        a = np.asarray(out)
        t_fetch = time.time() - t0

        t0 = time.time()
        out = fn(p, lat)
        b = jax.device_get(out)
        t_devget = time.time() - t0

        t0 = time.time()
        out = fn(p, lat)
        jax.block_until_ready(out)
        t_block = time.time() - t0
        t0 = time.time()
        c = np.asarray(out)
        t_fetch2 = time.time() - t0

        print(json.dumps({
            "rep": rep,
            "dispatch+np.asarray": round(t_direct, 4),
            "dispatch+scalar_sync": round(t_sync, 4),
            "then_fetch": round(t_fetch, 4),
            "dispatch+device_get": round(t_devget, 4),
            "dispatch+block_until_ready": round(t_block, 4),
            "then_fetch2": round(t_fetch2, 4)}), flush=True)


if __name__ == "__main__":
    main()
