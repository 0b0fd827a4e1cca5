"""LPIPS perceptual distance in JAX.

The reference reports LPIPS tables in its README (README.md:24-42) using
the external `lpips` package.  That package (and torchvision weights)
are not installable here, so this module provides:

* the full LPIPS-AlexNet architecture in JAX with a weight loader for
  the standard `lpips`/torchvision checkpoints when present locally
  (load_lpips_weights), enabling bit-comparable numbers on a machine
  with the weights;
* deterministic fallback metrics (MSE / PSNR / SSIM) that need no
  pretrained weights, for CI and relative comparisons.

Images: (N, H, W, 3) float in [0, 1].
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature config: (out_ch, kernel, stride, pad), relu after each
_ALEX_LAYERS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}     # maxpool after layers 0 and 1
_TAP_POINTS = [0, 1, 2, 3, 4]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _maxpool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                 (1, 2, 2, 1), "VALID")


def alexnet_features(x, weights: Dict[str, jnp.ndarray]):
    """Returns the 5 tapped relu feature maps."""
    feats = []
    h = x
    for i, (c, k, s, p) in enumerate(_ALEX_LAYERS):
        h = _conv(h, weights[f"conv{i}_w"], weights[f"conv{i}_b"], s, p)
        h = jax.nn.relu(h)
        feats.append(h)
        if i in _POOL_AFTER:
            h = _maxpool(h)
    return feats


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


def lpips_distance(img0, img1, weights: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """LPIPS(img0, img1) per image; weights from load_lpips_weights."""
    assert img0.shape[1] >= 64 and img0.shape[2] >= 64, "LPIPS needs >=64px"
    def prep(x):
        x = x * 2.0 - 1.0                      # [0,1] -> [-1,1]
        return (x - _SHIFT) / _SCALE

    f0 = alexnet_features(prep(img0), weights)
    f1 = alexnet_features(prep(img1), weights)
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        d = (_normalize_tensor(a) - _normalize_tensor(b)) ** 2
        lin = weights[f"lin{i}_w"]             # (C,) nonneg
        d = jnp.sum(d * lin[None, None, None, :], axis=-1)
        total = total + jnp.mean(d, axis=(1, 2))
    return total


def load_lpips_weights(path: Optional[str] = None) -> Optional[Dict[str, jnp.ndarray]]:
    """Load AlexNet backbone + LPIPS linear heads from a local .npz
    (converted once from the `lpips` pip checkpoint); None if absent."""
    candidates = [path] if path else []
    candidates += [os.path.join(os.path.dirname(__file__), "lpips_alex.npz"),
                   os.path.expanduser("~/.cache/qdm_tpu/lpips_alex.npz")]
    for c in candidates:
        if c and os.path.exists(c):
            data = np.load(c)
            return {k: jnp.asarray(v) for k, v in data.items()}
    return None


def random_lpips_weights(seed: int = 0) -> Dict[str, jnp.ndarray]:
    """Random-init weights: NOT perceptually meaningful, but makes the
    LPIPS plumbing testable and still measures feature-space distortion."""
    rng = np.random.default_rng(seed)
    w = {}
    cin = 3
    for i, (c, k, s, p) in enumerate(_ALEX_LAYERS):
        w[f"conv{i}_w"] = jnp.asarray(
            rng.standard_normal((k, k, cin, c)).astype(np.float32) / np.sqrt(k * k * cin))
        w[f"conv{i}_b"] = jnp.zeros((c,), jnp.float32)
        w[f"lin{i}_w"] = jnp.asarray(np.abs(rng.standard_normal(c)).astype(np.float32) / c)
        cin = c
    return w


# ---------------------------------------------------------------- fallbacks


def mse(img0, img1):
    return jnp.mean((img0.astype(jnp.float32) - img1.astype(jnp.float32)) ** 2,
                    axis=(1, 2, 3))


def psnr(img0, img1):
    return -10.0 * jnp.log10(jnp.clip(mse(img0, img1), 1e-12, None))


def ssim(img0, img1, window: int = 7, c1: float = 0.01**2, c2: float = 0.03**2):
    """Mean SSIM over channels with a uniform window."""
    def filt(x):
        k = jnp.ones((window, window, 1, 1), jnp.float32) / (window * window)
        kc = jnp.tile(k, (1, 1, 1, x.shape[-1]))
        return jax.lax.conv_general_dilated(
            x, kc, (1, 1), "VALID", feature_group_count=x.shape[-1],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x, y = img0.astype(jnp.float32), img1.astype(jnp.float32)
    mx, my = filt(x), filt(y)
    vx = filt(x * x) - mx * mx
    vy = filt(y * y) - my * my
    cxy = filt(x * y) - mx * my
    s = ((2 * mx * my + c1) * (2 * cxy + c2)) / \
        ((mx * mx + my * my + c1) * (vx + vy + c2))
    return jnp.mean(s, axis=(1, 2, 3))
