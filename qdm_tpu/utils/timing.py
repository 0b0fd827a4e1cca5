"""TPU timing utilities that survive the tunneled device dispatch.

Direct wall-timing of single dispatches on this environment measures
tunnel RTT (~ms), and `block_until_ready` can return before compute
completes for small outputs.  The reliable recipe:

1. wrap the op in a `lax.fori_loop` with a *traced* iteration count
   (one executable for all counts, no unrolling/CSE);
2. chain iterations through the op's full output (nonlinearly) so XLA
   cannot hoist, fold, or dead-code the body;
3. force completion by fetching a scalar reduction;
4. report the marginal time between two iteration counts, which cancels
   the fixed dispatch + fetch overhead.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def marginal_time(step_fn: Callable, x0, lo: int = 8, hi: int = 40,
                  warmup: bool = True) -> float:
    """Seconds per call of step_fn (x -> same-shape x), measured as the
    marginal loop time between hi and lo iterations."""

    @jax.jit
    def loop(x, iters):
        def body(i, xc):
            return step_fn(xc).astype(xc.dtype)
        return jax.lax.fori_loop(0, iters, body, x).sum()

    if warmup:
        float(loop(x0, 2))
    t0 = time.time()
    float(loop(x0, lo))
    t_lo = time.time() - t0
    t0 = time.time()
    float(loop(x0, hi))
    t_hi = time.time() - t0
    return max((t_hi - t_lo) / (hi - lo), 1e-9)


def timed_value(fn: Callable, *args) -> float:
    """Wall time of one full dispatch incl. scalar fetch (for big ops
    where tunnel overhead is negligible)."""
    t0 = time.time()
    out = fn(*args)
    float(jnp.asarray(out).astype(jnp.float32).sum())
    return time.time() - t0
