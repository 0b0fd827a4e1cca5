"""Synthetic per-channel outlier injection for quality studies.

With purely random weights, activations are isotropic and rounding
noise dominates every quantization mode — SmoothQuant/AWQ (whose whole
point is taming per-channel activation outliers) measure barely better
than RTN (QUALITY.md round-2 caveat).  Trained networks are different:
LayerNorm/RMSNorm gain vectors carry persistent per-channel outliers
that make a few activation channels 10-100x hotter than the rest (the
observation SmoothQuant is built on — reference quantizer_SQ.py:272-295
migrates exactly these).

:func:`inject_norm_outliers` reproduces that regime deterministically:
a fraction of every norm gain vector's channels is scaled by
heavy-tailed factors, so downstream matmul/conv inputs develop
persistent per-channel outliers while the depth-wise magnitude stays
bounded (each following norm renormalizes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inject_norm_outliers(params: dict, seed: int = 0, frac: float = 0.04,
                         min_factor: float = 8.0, max_factor: float = 64.0):
    """Scale a deterministic ``frac`` of every norm gain vector's
    channels by factors log-uniform in [min_factor, max_factor].

    Targets 1-d leaves named 'scale' (LayerNorm / RMSNorm / GroupNorm
    gains).  Quantized-param leaves ('scales', 'act_scale', ...) and
    matrices are untouched."""

    def rec(tree, prefix):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = rec(v, prefix + (k,))
            elif k == "scale" and hasattr(v, "ndim") and v.ndim == 1:
                import zlib

                path = "/".join(prefix + (k,))
                # zlib.crc32, NOT hash(): Python string hashing is
                # salted per process, which would make the injection
                # non-reproducible across runs
                key = jax.random.fold_in(jax.random.PRNGKey(seed),
                                         zlib.crc32(path.encode()) % (2 ** 31))
                k1, k2 = jax.random.split(key)
                c = v.shape[0]
                hot = jax.random.uniform(k1, (c,)) < frac
                logf = jax.random.uniform(
                    k2, (c,), minval=jnp.log(min_factor),
                    maxval=jnp.log(max_factor))
                factor = jnp.where(hot, jnp.exp(logf), 1.0)
                out[k] = (v.astype(jnp.float32) * factor).astype(v.dtype)
            else:
                out[k] = v
        return out

    return rec(params, ())
