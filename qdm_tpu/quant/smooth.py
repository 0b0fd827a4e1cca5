"""SmoothQuant scale migration as a pytree transform.

Reference semantics (quantizer_SQ.py:393-431 ``smooth_ln_fcs``):

    weight_scales = max over fcs of per-in-channel absmax of fc.weight
    s = act_absmax**alpha / weight_scales**(1-alpha)   (clamped 1e-5)
    ln.weight /= s ; ln.bias /= s ; fc.weight *= s (per in-channel)

alpha = 0.5 for LLMs (quantizer_SQ.py:287), 0.80 for diffusion
(quantizer_SQ.py:349).  Activation stats are the mean over denoise steps
of the per-step per-channel absmax (Mean_Max_Activation_Hook,
calib_data.py:105-124; mean_of_dict, StableDiffusion1_x.py:104-112) —
here produced by the sown 'calib' collection (qdm_tpu/calib/stats.py).

Scaling groups are declared per model family (the analogue of
get_layers_for_scaling_unet, StableDiffusion1_x.py:115-150).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp

from qdm_tpu.quant.apply import _set_at


@dataclass(frozen=True)
class ScalingGroup:
    """prev_op (a norm layer path) feeding a set of linear layer paths.

    Paths are tuples of param-tree keys addressing the layer dict
    (e.g. ('down_blocks_0/attentions_0', 'transformer_blocks_0', 'attn1',
    'to_q')).

    adaln: for AdaLN-modulated norms (MMDiT) the norm has no static
    affine, so s is folded into the modulation linear at prev_path:
    adaln = (shift_chunk_idx, scale_chunk_idx, n_chunks).  The modulated
    output is h*(1+scale)+shift, so dividing it by s requires
    scale' = (1+scale)/s - 1 (weight cols /= s, bias' = (bias+1)/s - 1)
    and shift' = shift/s.

    extra_scaled: additional linear paths that SHARE the prev op's
    output but take no part in the smoothing math — their kernels are
    multiplied by s purely to keep the migration output-invariant,
    without contributing to weight_scales or being registered as
    smoothed layers.  Used for the MoE router: post_attention_layernorm
    feeds the (unquantized) gate alongside every expert's w1/w3; scaling
    the gate kernel too keeps routing bit-invariant under migration.

    block: enclosing-module loss spec for the AWQ scale search
    (reference module2inspect, quantize/quantizer.py:678-751).
    ("glu:<act>", down_path) on a (gate, up) group makes the search
    loss MSE over down(act(gate(x)) * up(x)) — gate/up scaled+quantized
    in the trial, down fp, exactly the reference's enclosing-MLP loss —
    instead of the group's own linear outputs."""

    prev_path: Tuple[str, ...]
    layer_paths: Tuple[Tuple[str, ...], ...]
    adaln: Optional[Tuple[int, int, int]] = None
    extra_scaled: Tuple[Tuple[str, ...], ...] = ()
    block: Optional[Tuple[str, Tuple[str, ...]]] = None
    # Gemma-convention norm prev: stored weight w is an offset, output
    # multiplies (1+w) — dividing the output by s needs
    # w' = (1+w)/s - 1 (reference scale_ln_fcs special case,
    # scale.py:96-99)
    prev_plus_one: bool = False


def _get_at(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def compute_smooth_scales(params: dict, group: ScalingGroup,
                          act_absmax: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """s (in_features,) per smooth_ln_fcs (quantizer_SQ.py:414-421)."""
    w_scales = []
    for lp in group.layer_paths:
        kernel = _get_at(params, lp)["kernel"]        # (in, out)
        w_scales.append(jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=1))
    weight_scales = jnp.clip(jnp.max(jnp.stack(w_scales), axis=0), 1e-5, None)
    act = jnp.clip(act_absmax.astype(jnp.float32), 1e-5, None)
    s = jnp.clip(act ** alpha / weight_scales ** (1.0 - alpha), 1e-5, None)
    return s


def apply_smooth_scales(params: dict, group: ScalingGroup, s: jnp.ndarray) -> dict:
    """prev divided by s, following fc kernels multiplied by s.

    prev is a norm (scale/bias /= s, scale_ln_fcs scale.py:87-113) or a
    linear (last len(s) output channels of its kernel and bias /= s,
    scale_fc_fc(s) scale.py:116-153)."""
    out = params
    prev = _get_at(params, group.prev_path)
    if group.adaln is not None:
        shift_i, scale_i, n_chunks = group.adaln
        kern = prev["kernel"].astype(jnp.float32)     # (in, n_chunks*dim)
        bias = prev["bias"].astype(jnp.float32)
        dim = kern.shape[1] // n_chunks
        sh = slice(shift_i * dim, (shift_i + 1) * dim)
        sc = slice(scale_i * dim, (scale_i + 1) * dim)
        kern = kern.at[:, sh].divide(s[None, :])
        bias = bias.at[sh].divide(s)
        kern = kern.at[:, sc].divide(s[None, :])
        bias = bias.at[sc].set((bias[sc] + 1.0) / s - 1.0)
        out = _set_at(out, group.prev_path + ("kernel",),
                      kern.astype(prev["kernel"].dtype))
        out = _set_at(out, group.prev_path + ("bias",),
                      bias.astype(prev["bias"].dtype))
    elif "kernel" in prev:
        kern = prev["kernel"]     # (in, out)
        n = s.shape[0]
        newk = kern.astype(jnp.float32).at[:, kern.shape[1] - n:].divide(s[None, :])
        out = _set_at(out, group.prev_path + ("kernel",), newk.astype(kern.dtype))
        if "bias" in prev:
            b = prev["bias"]
            newb = b.astype(jnp.float32).at[b.shape[0] - n:].divide(s)
            out = _set_at(out, group.prev_path + ("bias",), newb.astype(b.dtype))
    elif "scales" in prev and "scale" not in prev:
        # ScaledActivation prev (gelu -> fc migration, scale_gelu_fc
        # scale.py:156-164): the module divides its output by `scales`
        new = (prev["scales"].astype(jnp.float32) * s).astype(prev["scales"].dtype)
        out = _set_at(out, group.prev_path + ("scales",), new)
    else:
        if "scale" in prev:
            w = prev["scale"].astype(jnp.float32)
            w = ((w + 1.0) / s - 1.0) if group.prev_plus_one else (w / s)
            out = _set_at(out, group.prev_path + ("scale",),
                          w.astype(prev["scale"].dtype))
        if "bias" in prev:
            out = _set_at(out, group.prev_path + ("bias",),
                          (prev["bias"].astype(jnp.float32) / s).astype(prev["bias"].dtype))
    for lp in tuple(group.layer_paths) + tuple(group.extra_scaled):
        layer = _get_at(out, lp)
        kernel = layer["kernel"]
        newk = (kernel.astype(jnp.float32) * s[:, None]).astype(kernel.dtype)
        out = _set_at(out, lp + ("kernel",), newk)
    return out


def smooth_params(params: dict, groups: Sequence[ScalingGroup],
                  act_stats: Dict[str, jnp.ndarray], alpha: float = 0.80,
                  return_scales: bool = False):
    """Apply SmoothQuant migration for every group.

    act_stats maps '/'-joined layer paths to per-channel absmax.  For a
    group the stats of its first layer are representative (all layers in
    a group share the same input, e.g. to_q/to_k/to_v; the reference
    passes per-layer hook means but smooth_ln_fcs only consumes one
    act_scales vector per group).

    return_scales=True also returns {layer_path: s} for every migrated
    layer — consumers that calibrate static activation scales must
    divide pre-smooth stats by s (post-smooth activations are act/s;
    using the raw stats overestimates the int8 range by exactly the
    outlier factor the migration removed)."""
    out = params
    scales: Dict[str, jnp.ndarray] = {}
    for g in groups:
        key = "/".join(g.layer_paths[0])
        stats = [act_stats[("/".join(lp))] for lp in g.layer_paths
                 if "/".join(lp) in act_stats]
        if not stats:
            raise KeyError(f"no activation stats for group {key}")
        act = jnp.max(jnp.stack(stats), axis=0)
        s = compute_smooth_scales(out, g, act, alpha)
        out = apply_smooth_scales(out, g, s)
        for lp in g.layer_paths:
            scales["/".join(lp)] = s
    if return_scales:
        return out, scales
    return out
