#!/usr/bin/env python
"""A/B study of the AWQ search-loss deviation (PARITY.md note).

The reference computes the scale-search loss through the ENCLOSING
module (module2inspect: the whole MLP / attention block,
quantize/quantizer.py:678-751); this repo's `search_best_scale` uses
the scaling group's own linear outputs.  This tool quantifies the
fidelity cost of that deviation on the SwiGLU MLP groups of an
outlier-injected tiny LLaMA:

  A (ours)     — loss = MSE over concat(gate, up) outputs;
  B (reference)— loss = MSE over down(silu(gate)*up) with gate/up
                 scaled+quantized in place (down fp, as the reference
                 leaves non-group layers during search).

Both searches share the grid and quantizer; the final evaluation
quantizes gate/up/down (the real plan) and measures the block-output
MSE of each choice vs fp, per layer.  Writes tools/awq_ab.json.

Run: python tools/awq_ab.py   (CPU, ~1 min)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.models import llama as llama_lib
from qdm_tpu.quant.awq import (_group_quantize_rows, search_best_scale,
                               search_best_scale_glu)
from qdm_tpu.utils.outliers import inject_norm_outliers

CFG = llama_lib.LlamaConfig(
    vocab_size=1024, hidden_size=256, intermediate_size=704,
    num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=4,
    max_position_embeddings=256)
NBITS, GS = 4, 32


def mlp_out(x, wg, wu, wd):
    a = jax.nn.silu(x @ wg) * (x @ wu)
    return a @ wd


def quant_w(w_io):
    """Fake-quantize an (in, out) kernel with the study's plan."""
    return _group_quantize_rows(w_io.T, NBITS, GS, True).T


def search_block_loss(x, wg, wu, wd, n_grid=20):
    """Reference-semantics search: duo-scale grid, loss through the
    enclosing MLP with gate/up scaled+quantized (quantizer.py:678-751)."""
    xf = x.astype(jnp.float32)
    w_cat = jnp.concatenate([wg.T, wu.T], axis=0)        # (2I, C)
    wgrp = jnp.abs(w_cat).reshape(-1, GS)
    wgrp = wgrp / (jnp.max(wgrp, axis=1, keepdims=True) + 1e-6)
    w_mean = wgrp.reshape(w_cat.shape).mean(axis=0)
    x_mean = jnp.abs(xf).mean(axis=0)
    fp = mlp_out(xf, wg, wu, wd)

    best_loss, best_s = jnp.inf, None
    for i in range(n_grid):
        r = i / n_grid
        s = jnp.clip(x_mean ** r / (w_mean ** (1 - r) + 1e-4), 1e-4, None)
        s = s / jnp.sqrt(jnp.max(s) * jnp.min(s))
        s = jnp.where(jnp.isfinite(s), s, 1.0)
        wg_q = quant_w(wg * s[:, None]) / s[:, None]
        wu_q = quant_w(wu * s[:, None]) / s[:, None]
        loss = float(jnp.mean((mlp_out(xf, wg_q, wu_q, wd) - fp) ** 2))
        if loss < best_loss:
            best_loss, best_s = loss, s
    return best_s


def final_block_mse(x, wg, wu, wd, s):
    """Evaluate a scale choice under the REAL final plan: x/s migrated,
    gate/up/down all quantized."""
    xf = x.astype(jnp.float32)
    fp = mlp_out(xf, wg, wu, wd)
    wg_q = quant_w(wg * s[:, None]) / s[:, None]
    wu_q = quant_w(wu * s[:, None]) / s[:, None]
    wd_q = quant_w(wd)
    q = mlp_out(xf, wg_q, wu_q, wd_q)
    return float(jnp.mean((q - fp) ** 2)), float(jnp.mean((fp) ** 2))


def main():
    lm = CausalLM.from_config(CFG, dtype=jnp.float32, seed=0)
    lm.params = inject_norm_outliers(lm.params, seed=11)
    rng = np.random.default_rng(0)
    calib = rng.integers(0, CFG.vocab_size, (8, 128)).astype(np.int32)
    from qdm_tpu.config import QuantConfig

    cfg = QuantConfig(w_bit=NBITS, q_group_size=GS, zero_point=True)
    _, feats = lm._calibrate(cfg, calib, capture_inputs=True)

    rows = []
    for l in range(CFG.num_hidden_layers):
        key = f"layers_{l}/mlp/gate_proj"
        x = feats[key]
        mp = lm.params[f"layers_{l}"]["mlp"]
        wg = mp["gate_proj"]["kernel"].astype(jnp.float32)
        wu = mp["up_proj"]["kernel"].astype(jnp.float32)
        wd = mp["down_proj"]["kernel"].astype(jnp.float32)

        w_cat = jnp.concatenate([wg.T, wu.T], axis=0)
        s_a, _ = search_best_scale(x, w_cat, n_bits=NBITS, group_size=GS,
                                   zero_point=True)
        s_b = search_block_loss(x, wg, wu, wd)
        # the PRODUCTION search (r4): search_best_scale_glu — must land
        # on the reference's block-loss choice
        s_p, _ = search_best_scale_glu(x, wg.T, wu.T, wd.T, act="silu",
                                       n_bits=NBITS, group_size=GS,
                                       zero_point=True)
        mse_rtn, sig = final_block_mse(x, wg, wu, wd, jnp.ones(wg.shape[0]))
        mse_a, _ = final_block_mse(x, wg, wu, wd, s_a)
        mse_b, _ = final_block_mse(x, wg, wu, wd, s_b)
        mse_p, _ = final_block_mse(x, wg, wu, wd, s_p)
        rows.append({"layer": l,
                     "mse_no_scale": mse_rtn, "mse_group_loss_A": mse_a,
                     "mse_block_loss_B": mse_b,
                     "mse_production_glu": mse_p, "signal_power": sig,
                     "B_over_A": round(mse_b / mse_a, 4),
                     "prod_over_B": round(mse_p / mse_b, 4)})
        print(json.dumps(rows[-1]), flush=True)

    ratio = float(np.mean([r["B_over_A"] for r in rows]))
    prod = float(np.mean([r["prod_over_B"] for r in rows]))
    summary = {
        "study": "AWQ loss-target A/B (SwiGLU MLP groups, outlier-injected "
                 "tiny llama, W4 g32)",
        "mean_B_over_A_mse": round(ratio, 4),
        "mean_production_over_B_mse": round(prod, 4),
        "verdict": (
            "r4: the production search (search_best_scale_glu) uses the "
            f"reference's enclosing-MLP loss — {round(prod, 4)}x the "
            "hand-written reference-semantics search B (1.0 = exact "
            "parity); the old group-linear loss A is kept above for "
            "the historical comparison "
            f"(B was {round(100 * (1 - ratio), 1)}% lower MSE than A)"),
        "rows": rows,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "awq_ab.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: summary[k] for k in
                      ("mean_B_over_A_mse", "verdict")}))


if __name__ == "__main__":
    main()
