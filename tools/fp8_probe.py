#!/usr/bin/env python
"""fp8 feasibility probe on the current TPU (roadmap item: fp8
activations as an int8 alternative for the diffusion path).

v5e's MXU natively supports bf16 and int8; fp8 (e4m3/e5m2) matmuls are
emulated by XLA via upcast on this generation (native fp8 arrives with
Trillium/v6e).  This probe measures it rather than asserting it: times
a large matmul in bf16 vs int8 vs fp8-e4m3 inputs and writes a JSON
artifact next to this script.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import jax.numpy as jnp


def time_mm(x, w):
    """Marginal per-matmul time via a chained in-jit loop (single
    dispatches hit the tunnel's ~30 ms floor and XLA folds repeated
    identical calls — see qdm_tpu/utils/timing.py)."""
    from qdm_tpu.utils.timing import marginal_time

    def step(xc):
        return jnp.dot(xc, w, preferred_element_type=jnp.float32)

    # x stays in the probe dtype; marginal_time's loop casts the f32
    # product back to it each iteration (a realistic output-quant pass)
    return marginal_time(step, x, lo=8, hi=40)


def main():
    m = k = n = 4096
    key = jax.random.PRNGKey(0)
    xf = jax.random.normal(key, (m, k), jnp.float32)
    wf = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)
    out = {"device": str(jax.devices()[0]), "shape": [m, k, n]}
    cases = {
        "bf16": (xf.astype(jnp.bfloat16), wf.astype(jnp.bfloat16)),
        "int8": ((xf * 10).astype(jnp.int8), (wf * 10).astype(jnp.int8)),
        "fp8_e4m3": (xf.astype(jnp.float8_e4m3fn), wf.astype(jnp.float8_e4m3fn)),
    }
    for name, (x, w) in cases.items():
        try:
            dt = time_mm(x, w)
            out[name + "_ms"] = round(1e3 * dt, 3)
            out[name + "_tflops"] = round(2 * m * k * n / dt / 1e12, 1)
        except Exception as e:  # dtype unsupported through this backend
            out[name + "_ms"] = f"ERROR:{type(e).__name__}"
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fp8_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
