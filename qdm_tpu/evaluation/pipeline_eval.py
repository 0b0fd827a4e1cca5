"""End-to-end diffusion quantization evaluation.

The reference's headline numbers are LPIPS between fp16-generated and
quantized-generated images on identical prompts/seeds (README.md:24-42).
This harness runs both pipelines on the same prompts + fixed latents and
reports LPIPS (when weights are available), SSIM, PSNR and MSE.

For bit-comparable numbers against the PyTorch reference, pass
`latents` exported from the reference run (SURVEY.md §7 'hard parts':
torch RNG parity is achieved by sharing latents, not reimplementing
torch's randn).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from qdm_tpu.evaluation.lpips import (load_lpips_weights, lpips_distance,
                                      mse, psnr, ssim)


def generate_images(pipe, prompts: Sequence[str], num_inference_steps: int = 50,
                    seed: int = 0, latents: Optional[np.ndarray] = None,
                    batch_size: int = 4, **kw) -> np.ndarray:
    imgs = []
    for i in range(0, len(prompts), batch_size):
        batch = list(prompts[i:i + batch_size])
        lat = None
        if latents is not None:
            lat = jnp.asarray(latents[i:i + batch_size])
        imgs.append(pipe.generate(batch, num_inference_steps=num_inference_steps,
                                  seed=seed, latents=lat, **kw))
    return np.concatenate(imgs, axis=0)


def eval_image_pair(ref_images: np.ndarray, test_images: np.ndarray,
                    lpips_weights=None) -> Dict[str, float]:
    a = jnp.asarray(ref_images, jnp.float32)
    b = jnp.asarray(test_images, jnp.float32)
    out = {
        "mse": float(mse(a, b).mean()),
        "psnr": float(psnr(a, b).mean()),
        "ssim": float(ssim(a, b).mean()),
        "n_images": int(a.shape[0]),
    }
    w = lpips_weights if lpips_weights is not None else load_lpips_weights()
    if w is not None and a.shape[1] >= 64:
        out["lpips"] = float(lpips_distance(a, b, w).mean())
    return out


def eval_quantized_pipeline(pipe_ref, pipe_quant, prompts: Sequence[str],
                            num_inference_steps: int = 50, seed: int = 0,
                            latents: Optional[np.ndarray] = None,
                            **kw) -> Dict[str, float]:
    """The README-table workflow: same prompts + same latents through
    the fp and quantized pipelines, perceptual distance between the
    outputs."""
    ref = generate_images(pipe_ref, prompts, num_inference_steps, seed,
                          latents, **kw)
    test = generate_images(pipe_quant, prompts, num_inference_steps, seed,
                           latents, **kw)
    return eval_image_pair(ref, test)
