"""Quantization diagnostics.

The reference's quality control is debug instrumentation rather than
tests (SURVEY.md §4): weight-histogram plots before/after scale/quant
(`debugPlot`, quantizer.py:277-384), attention-delta maps
(`debugAttentionMap`, quantizer.py:305-373), and Frobenius/KL JSON logs
for codebook-vs-RTN (fake_quant.py:60-69).  This module provides the
same capabilities with arrays + JSON as the primary artifact (PNGs only
when matplotlib is present), plus structured timing logs.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qdm_tpu.quant.apply import iter_layers, path_str


def weight_histograms(params: dict, bins: int = 65,
                      max_layers: Optional[int] = None) -> Dict[str, dict]:
    """Per-layer kernel histograms (the array form of the reference's
    debugPlot histograms)."""
    out = {}
    for i, (path, layer) in enumerate(iter_layers(params)):
        if max_layers is not None and i >= max_layers:
            break
        w = np.asarray(jax.device_get(layer["kernel"])).astype(np.float32)
        hist, edges = np.histogram(w, bins=bins)
        out[path_str(path)] = {
            "hist": hist.tolist(),
            "edges": [float(edges[0]), float(edges[-1])],
            "absmax": float(np.abs(w).max()),
            "std": float(w.std()),
        }
    return out


def quantization_error_report(params: dict, qparams: dict) -> Dict[str, dict]:
    """Per-layer Frobenius norm of (w - w_q) + relative error — the
    JSON metric log of fake_quant.py:60-69 generalized."""
    report = {}
    layers_q = dict(iter_layers(qparams))
    for path, layer in iter_layers(params):
        ql = layers_q.get(path)
        if ql is None or "kernel" not in ql:
            continue
        w = np.asarray(jax.device_get(layer["kernel"])).astype(np.float32)
        wq = np.asarray(jax.device_get(ql["kernel"])).astype(np.float32)
        if w.shape != wq.shape:
            continue
        fro = float(np.linalg.norm(w - wq))
        report[path_str(path)] = {
            "frobenius": fro,
            "rel_error": fro / (float(np.linalg.norm(w)) + 1e-12),
        }
    return report


def save_report(obj: dict, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=2)


def plot_histograms(hists: Dict[str, dict], out_dir: str, limit: int = 16) -> bool:
    """Optional PNG rendering (debugPlot parity); returns False if
    matplotlib is unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return False
    os.makedirs(out_dir, exist_ok=True)
    for i, (name, h) in enumerate(hists.items()):
        if i >= limit:
            break
        fig, ax = plt.subplots(figsize=(4, 3))
        edges = np.linspace(h["edges"][0], h["edges"][1], len(h["hist"]) + 1)
        ax.stairs(h["hist"], edges)
        ax.set_title(name[-40:], fontsize=7)
        fig.savefig(os.path.join(out_dir, f"{i:03d}.png"), dpi=80)
        plt.close(fig)
    return True


def _attention_probs(x, wq, wk, num_heads: int):
    """softmax(q @ k^T / sqrt(d)) per head; x (T, C), wq (C, H*D),
    wk (C, Hkv*D) with Hkv <= H (GQA: k heads are repeated)."""
    t, c = x.shape
    d = wq.shape[1] // num_heads
    num_kv = wk.shape[1] // d
    q = (x @ wq).reshape(t, num_heads, d).transpose(1, 0, 2)
    k = (x @ wk).reshape(t, num_kv, d).transpose(1, 0, 2)
    if num_kv != num_heads:
        k = jnp.repeat(k, num_heads // num_kv, axis=0)
    logits = jnp.einsum("htd,hsd->hts", q, k) / jnp.sqrt(jnp.float32(d))
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def attention_delta_report(x, qk_before, qk_scaled, qk_quant,
                           num_heads: int, bins: int = 100) -> dict:
    """Log-histograms of attention-map deltas across the quantization
    stages (reference debugAttentionMap, quantizer.py:305-317,358-373):
    `unscaled` = probs(before) - probs(quantized), `scaled` =
    probs(after scale migration) - probs(quantized), binned on [-1, 1].

    x: (T, C) sample input rows; qk_*: (wq, wk) kernel pairs (C, H*D).
    """
    x = jnp.asarray(x, jnp.float32)

    def probs(pair):
        return _attention_probs(x, jnp.asarray(pair[0], jnp.float32),
                                jnp.asarray(pair[1], jnp.float32), num_heads)

    p_before, p_scaled, p_quant = probs(qk_before), probs(qk_scaled), probs(qk_quant)
    edges = np.linspace(-1.0, 1.0, bins + 1)
    centers = (edges[:-1] + edges[1:]) / 2

    def log_hist(delta):
        h, _ = np.histogram(np.asarray(delta).ravel(), bins=edges)
        return np.log(h + 1e-9)

    return {
        "bin_centers": centers.tolist(),
        "log_hist_unscaled": log_hist(p_before - p_quant).tolist(),
        "log_hist_scaled": log_hist(p_scaled - p_quant).tolist(),
        "max_abs_delta_unscaled": float(jnp.abs(p_before - p_quant).max()),
        "max_abs_delta_scaled": float(jnp.abs(p_scaled - p_quant).max()),
    }


def plot_attention_delta(report: dict, out_path: str) -> bool:
    """PNG render of the two log-hist curves (solid = unscaled, dotted =
    scaled), matching the reference's AttentionDelta_AWQ figure."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return False
    fig, ax = plt.subplots(1, 1)
    ax.plot(report["bin_centers"], report["log_hist_unscaled"], linestyle="solid")
    ax.plot(report["bin_centers"], report["log_hist_scaled"], linestyle="dotted")
    ax.set_xlabel("attention prob delta")
    ax.set_ylabel("log count")
    fig.savefig(out_path)
    plt.close(fig)
    return True


class StepTimer:
    """Structured per-step timing (replaces tqdm-as-observability;
    SURVEY.md §5 tracing plan)."""

    def __init__(self, name: str):
        self.name = name
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *a):
        self.times.append(time.time() - self._t0)

    def summary(self) -> dict:
        ts = np.asarray(self.times)
        return {"name": self.name, "n": len(ts),
                "mean_s": float(ts.mean()) if len(ts) else None,
                "p50_s": float(np.median(ts)) if len(ts) else None,
                "total_s": float(ts.sum())}


def profile_trace(log_dir: str):
    """jax.profiler trace context for calib/sample loops."""
    return jax.profiler.trace(log_dir)
