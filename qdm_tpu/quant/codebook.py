"""Experimental k-means codebook quantizer.

Re-implements the reference's non-uniform quantization
(quantize/genCodeBook.py, quantize/customKmeans.py):

1. scale rows to the RTN grid (absmax / q_max), like
   fake_quant.py:53-69's codebook branch;
2. cluster rows by the *shape* of their weight histogram (65 bins) into
   `num_codebooks` groups (clusterMatrix, genCodeBook.py:63-111);
3. per codebook, k-means the (mass-weighted) bin centers into
   `num_centroids` centroid values with the 80%-mass center/tail split
   heuristic (clusterVector, genCodeBook.py:125-187);
4. map every weight to its nearest centroid and report the KL divergence
   between the original and quantized histograms (codeBookQuant,
   genCodeBook.py:195-231).

Pure JAX (Lloyd iterations under lax.scan) — the reference needs
fast_pytorch_kmeans + sklearn on GPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(x, init_centroids, k: int, iters: int = 25, weights=None):
    """Lloyd's k-means on 1D/2D points x (N, D).  Returns (centroids,
    assignments)."""
    if x.ndim == 1:
        x = x[:, None]
    w = weights if weights is not None else jnp.ones(x.shape[0], jnp.float32)

    def step(cents, _):
        d = jnp.sum((x[:, None, :] - cents[None]) ** 2, axis=-1)   # (N, k)
        assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, k) * w[:, None]             # (N, k)
        mass = onehot.sum(0)                                         # (k,)
        new = (onehot.T @ x) / jnp.clip(mass[:, None], 1e-9, None)
        new = jnp.where(mass[:, None] > 0, new, cents)
        return new, None

    cents, _ = jax.lax.scan(step, init_centroids.astype(jnp.float32), None,
                            length=iters)
    d = jnp.sum((x[:, None, :] - cents[None]) ** 2, axis=-1)
    return cents, jnp.argmin(d, axis=1)


def _row_histograms(w, num_bins: int):
    lo, hi = jnp.min(w), jnp.max(w)
    edges = jnp.linspace(lo, hi, num_bins + 1)
    idx = jnp.clip(jnp.searchsorted(edges, w, side="right") - 1, 0, num_bins - 1)
    onehot = jax.nn.one_hot(idx, num_bins)         # (rows, cols, bins)
    hist = onehot.sum(axis=1)                       # (rows, bins)
    hist = hist / jnp.clip(hist.sum(-1, keepdims=True), 1e-9, None)
    centers = (edges[:-1] + edges[1:]) / 2
    return hist, centers


def _centroids_with_tails(hist_mass, bin_centers, num_centroids: int,
                          center_mass: float = 0.8):
    """clusterVector's heuristic (genCodeBook.py:136-177): split bins
    into the central `center_mass` probability region and the two tails;
    k-means the center bins into (num_centroids - 2) centroids and each
    tail into 1."""
    p = hist_mass / jnp.clip(hist_mass.sum(), 1e-9, None)
    cdf = jnp.cumsum(p)
    lo_q, hi_q = (1 - center_mass) / 2, 1 - (1 - center_mass) / 2
    in_center = (cdf >= lo_q) & (cdf <= hi_q)
    k_center = max(num_centroids - 2, 1)

    centers = bin_centers
    wc = jnp.where(in_center, p, 0.0)
    init = jnp.linspace(jnp.min(centers), jnp.max(centers), k_center)[:, None]
    cents_c, _ = kmeans(centers, init, k_center, weights=wc)

    wl = jnp.where(cdf < lo_q, p, 0.0)
    wr = jnp.where(cdf > hi_q, p, 0.0)
    left = jnp.sum(wl * centers) / jnp.clip(jnp.sum(wl), 1e-9, None)
    right = jnp.sum(wr * centers) / jnp.clip(jnp.sum(wr), 1e-9, None)
    left = jnp.where(jnp.sum(wl) > 0, left, jnp.min(centers))
    right = jnp.where(jnp.sum(wr) > 0, right, jnp.max(centers))
    return jnp.concatenate([cents_c.reshape(-1), jnp.array([left, right])])


def codebook_quantize(w, num_codebooks: int = 4, num_centroids: int = 8,
                      num_bins: int = 65, iters: int = 25) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """w (rows, cols), already scale-normalized.  Returns (w_q, kl).

    kl: mean KL divergence between original and quantized row
    histograms (genCodeBook.py:223-224)."""
    wf = w.astype(jnp.float32)
    hist, bin_centers = _row_histograms(wf, num_bins)

    # cluster rows by histogram shape
    init = hist[jnp.linspace(0, hist.shape[0] - 1, num_codebooks).astype(int)]
    _, row_assign = kmeans(hist, init, num_codebooks, iters=iters)

    # per-codebook centroid table
    tables = []
    for c in range(num_codebooks):
        mask = (row_assign == c).astype(jnp.float32)
        mass = (hist * mask[:, None]).sum(0)
        tables.append(_centroids_with_tails(mass, bin_centers, num_centroids))
    tables = jnp.stack(tables)                     # (B, num_centroids)

    row_tables = tables[row_assign]                # (rows, num_centroids)
    d = jnp.abs(wf[:, :, None] - row_tables[:, None, :])
    w_q = jnp.take_along_axis(row_tables[:, None, :],
                              jnp.argmin(d, axis=-1)[..., None], axis=-1)[..., 0]

    hist_q, _ = _row_histograms(w_q, num_bins)
    p = jnp.clip(hist, 1e-9, None)
    q = jnp.clip(hist_q, 1e-9, None)
    kl = jnp.mean(jnp.sum(p * jnp.log(p / q), axis=-1))
    return w_q.astype(w.dtype), kl


def codebook_quantize_weight(w_oi, n_bits: int = 8, group_size: int = 0,
                             **kw) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full path of fake_quant.py:53-69: absmax-scale rows, codebook-
    quantize the normalized values, rescale."""
    from qdm_tpu.quant.rtn import resolve_group_size

    org = w_oi.shape
    g = resolve_group_size(org[-1], group_size)
    wf = w_oi.astype(jnp.float32)
    if g > 0:
        wf = wf.reshape(-1, g)
    q_max = 2 ** (n_bits - 1) - 1
    scales = jnp.clip(jnp.max(jnp.abs(wf), axis=-1, keepdims=True), 1e-5, None) / q_max
    wq, kl = codebook_quantize(wf / scales, **kw)
    return (wq * scales).reshape(org).astype(w_oi.dtype), kl
