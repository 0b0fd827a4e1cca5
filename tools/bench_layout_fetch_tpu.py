#!/usr/bin/env python
"""Device->host fetch cost by OUTPUT LAYOUT for the pipeline image
shape: the (8,512,512,3) NHWC image pads its 3-wide trailing dim to
the 128 lanes in TPU tiled layout, so the fetch pays a ~42x-padded
relayout (~1.1-2s measured, bench_fetch_probe).  Candidate fixes:
flatten, NCHW transpose, uint8 — all computed ON DEVICE before fetch.

Run: nohup python -u tools/bench_layout_fetch_tpu.py > /tmp/layout.log 2>&1 &
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


def t_fetch(make, reps=3):
    """make() returns a FRESH on-device array each call (defeats jax's
    host-copy cache); time np.asarray on it after forced completion."""
    out = make()
    jax.block_until_ready(out)
    np.asarray(out)
    best = 1e9
    for _ in range(reps):
        out = make()
        jax.block_until_ready(out)
        t0 = time.time()
        np.asarray(out)
        best = min(best, time.time() - t0)
    return best


def main():
    on_tpu = jax.default_backend() == "tpu"
    n, hw = (8, 512) if on_tpu else (2, 32)
    key = [0]

    def base():
        key[0] += 1
        return jax.jit(lambda s: jax.random.uniform(
            jax.random.PRNGKey(s), (n, hw, hw, 3), jnp.float32))(key[0])

    cases = {
        "nhwc_f32": lambda: base(),
        "flat_f32": lambda: jax.jit(lambda x: x.reshape(n, -1))(base()),
        "nchw_f32": lambda: jax.jit(
            lambda x: x.transpose(0, 3, 1, 2))(base()),
        "nhwc_u8": lambda: jax.jit(
            lambda x: (x * 255).astype(jnp.uint8))(base()),
        "flat_u8": lambda: jax.jit(
            lambda x: (x * 255).astype(jnp.uint8).reshape(n, -1))(base()),
    }
    for name, make in cases.items():
        dt = t_fetch(make)
        mb = n * hw * hw * 3 * (1 if "u8" in name else 4) / 1e6
        print(json.dumps({"case": name, "s": round(dt, 4),
                          "mb": round(mb, 1),
                          "mb_s": round(mb / max(dt, 1e-9), 1)}),
              flush=True)


if __name__ == "__main__":
    main()
