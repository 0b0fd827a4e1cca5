"""LLaVA-Next (1.6) AnyRes image-grid geometry — pure numpy/JAX.

The reference's headline performance curves are all LLaVA-Next
(/root/reference/performanceCurves.py:4,22-62) but it ships no model
code for the AnyRes tiling that defines the family; these are the
TPU-native preprocessing + feature-packing helpers for
api/multimodal.py::LlavaNextModel.

AnyRes protocol (LLaVA-1.6):
  1. pick the grid resolution from ``image_grid_pinpoints`` that best
     preserves the image's effective resolution (max effective pixels,
     ties broken by least padding waste);
  2. resize the image into that canvas aspect-preserving, center-pad,
     split into vision-tower-sized tiles;
  3. ALSO encode the whole image resized square to one base tile;
  4. after the tower+projector, reassemble tile features on the 2-D
     grid, crop the padding back off (unpad), append a learned
     ``image_newline`` embedding at the end of every feature row, and
     concatenate [base features | grid features].

All sizes are (height, width) tuples throughout.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

# LLaVA-1.6 default pinpoints for a 336px tower
DEFAULT_PINPOINTS: List[Tuple[int, int]] = [
    (336, 672), (672, 336), (672, 672), (1008, 336), (336, 1008)]


def select_best_resolution(original_size: Tuple[int, int],
                           pinpoints: Sequence[Tuple[int, int]]
                           ) -> Tuple[int, int]:
    """Pick the pinpoint (h, w) maximizing the image's effective
    (downscaled, aspect-preserved) pixel count; ties -> least wasted
    canvas area."""
    oh, ow = original_size
    best, best_eff, best_waste = None, -1, None
    for ph, pw in pinpoints:
        scale = min(pw / ow, ph / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = ph * pw - eff
        if eff > best_eff or (eff == best_eff and waste < best_waste):
            best, best_eff, best_waste = (ph, pw), eff, waste
    return best


def resize_bilinear(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """(H, W, C) float -> (h, w, C) bilinear resize (jax.image on CPU)."""
    import jax
    import jax.numpy as jnp

    h, w = size
    out = jax.image.resize(jnp.asarray(img, jnp.float32),
                           (h, w, img.shape[-1]), "bilinear")
    return np.asarray(out)


def resize_and_pad(img: np.ndarray, target: Tuple[int, int]) -> np.ndarray:
    """Aspect-preserving resize into the (th, tw) canvas, center-padded
    with zeros."""
    th, tw = target
    oh, ow = img.shape[:2]
    scale = min(tw / ow, th / oh)
    nh, nw = min(th, int(round(oh * scale))), min(tw, int(round(ow * scale)))
    resized = resize_bilinear(img, (nh, nw))
    out = np.zeros((th, tw, img.shape[-1]), np.float32)
    y0, x0 = (th - nh) // 2, (tw - nw) // 2
    out[y0:y0 + nh, x0:x0 + nw] = resized
    return out


def divide_tiles(img: np.ndarray, tile: int
                 ) -> Tuple[np.ndarray, Tuple[int, int]]:
    """(H, W, C) with H,W multiples of tile -> ((gh*gw, tile, tile, C),
    (gh, gw)), row-major tile order."""
    h, w, c = img.shape
    gh, gw = h // tile, w // tile
    t = img.reshape(gh, tile, gw, tile, c).transpose(0, 2, 1, 3, 4)
    return t.reshape(gh * gw, tile, tile, c), (gh, gw)


def anyres_preprocess(img: np.ndarray, tile: int,
                      pinpoints: Sequence[Tuple[int, int]]
                      ) -> Tuple[np.ndarray, Tuple[int, int],
                                 Tuple[int, int]]:
    """Image -> ([base | tiles] pixel batch, grid (gh, gw), original
    size).  patches[0] is the square-resized base image; patches[1:]
    are the grid tiles of the padded best-resolution canvas."""
    orig = img.shape[:2]
    best = select_best_resolution(orig, pinpoints)
    canvas = resize_and_pad(img, best)
    tiles, grid = divide_tiles(canvas, tile)
    base = resize_bilinear(img, (tile, tile))
    return np.concatenate([base[None], tiles], axis=0), grid, orig


def unpad_slices(grid_hw: Tuple[int, int], original_size: Tuple[int, int]
                 ) -> Tuple[slice, slice]:
    """Row/col slices that crop a (H, W) feature grid back to the
    original aspect ratio (inverse of resize_and_pad's centering)."""
    h, w = grid_hw
    oh, ow = original_size
    if ow / oh > w / h:
        # width-limited: rows were padded
        nh = int(round(oh * (w / ow)))
        pad = (h - nh) // 2
        return slice(pad, h - pad), slice(0, w)
    nw = int(round(ow * (h / oh)))
    pad = (w - nw) // 2
    return slice(0, h), slice(pad, w - pad)


def pack_grid_features(tile_feats: np.ndarray, grid: Tuple[int, int],
                       ppt: int, original_size: Tuple[int, int],
                       newline: np.ndarray):
    """(gh*gw, ppt*ppt, d) projected tile features -> (n_tokens, d):
    reassemble on the 2-D grid, unpad, append ``newline`` (d,) at the
    end of every row, flatten row-major."""
    import jax.numpy as jnp

    gh, gw = grid
    d = tile_feats.shape[-1]
    f = tile_feats.reshape(gh, gw, ppt, ppt, d)
    f = f.transpose(0, 2, 1, 3, 4).reshape(gh * ppt, gw * ppt, d)
    rs, cs = unpad_slices((gh * ppt, gw * ppt), original_size)
    f = f[rs, cs]
    h, w = f.shape[:2]
    nl = jnp.broadcast_to(jnp.asarray(newline, f.dtype)[None, None],
                          (h, 1, d))
    f = jnp.concatenate([f, nl], axis=1)
    return f.reshape(h * (w + 1), d)
