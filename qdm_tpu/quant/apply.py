"""Quantization as a pytree transform.

The reference mutates nn.Modules in place and swaps them for WxAx*
wrappers (quantizer_SQ.py:456-516, fake_quant.py:234-258,343-382).
Here the same algorithms are pure functions ``params -> params`` driven
by a :class:`QuantPlan`:

* :func:`fake_quantize_params` — RTN fake quant of every planned layer's
  kernel (quantize-dequantize in place; the forward stays unchanged).
* :func:`pack_params` — produce packed integer params (w4a16 / w8a8
  leaves) consumed by the Pallas kernels.

Weight orientation: flax dense kernels are (in, out); the reference
formulas operate on (out, in) with groups along in-features.  We
transpose views accordingly so group/channel semantics match
fake_quant.py exactly.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from qdm_tpu.ops import quant_matmul as qmm
from qdm_tpu.quant import pseudo, rtn
from qdm_tpu.quant.plan import LayerQuantSpec, QuantPlan


def iter_layers(tree, prefix: Tuple[str, ...] = ()):
    """Yield (path_tuple, layer_dict) for every param dict holding a
    'kernel' leaf."""
    if isinstance(tree, dict):
        if "kernel" in tree and not isinstance(tree["kernel"], dict):
            yield prefix, tree
            return
        for k, v in tree.items():
            yield from iter_layers(v, prefix + (str(k),))


def path_str(path: Tuple[str, ...]) -> str:
    return "/".join(path)


def _set_at(tree: dict, path: Tuple[str, ...], value) -> dict:
    """Functional nested-dict update."""
    if len(path) == 0:
        return value
    out = dict(tree)
    out[path[0]] = _set_at(tree[path[0]], path[1:], value)
    return out


def _fake_quant_dense_kernel(kernel, spec: LayerQuantSpec):
    """kernel (in, out) -> fake-quantized kernel, reference row
    semantics ((out, in) groups along in: fake_quant.py:21-105)."""
    w_oi = kernel.T
    if spec.weight_quant == "codebook":
        from qdm_tpu.quant.codebook import codebook_quantize_weight

        w_oi, _ = codebook_quantize_weight(w_oi, n_bits=spec.w_bits,
                                           group_size=spec.group_size)
    elif spec.weight_quant == "group":
        if spec.zero_point:
            gs = spec.group_size if spec.group_size > 0 else w_oi.shape[-1]
            gs = rtn.resolve_group_size(w_oi.shape[-1], gs) or w_oi.shape[-1]
            w_oi, _, _ = pseudo.pseudo_quantize_tensor(
                w_oi, n_bits=spec.w_bits, group_size=gs, zero_point=True)
        else:
            w_oi = rtn.quantize_weight_absmax(w_oi, spec.w_bits, spec.group_size)
    elif spec.weight_quant == "per_channel":
        w_oi = rtn.quantize_weight_per_channel_absmax(w_oi, spec.w_bits)
    else:
        w_oi = rtn.quantize_weight_per_tensor_absmax(w_oi, spec.w_bits)
    return w_oi.T


def _fake_quant_conv_kernel(kernel, spec: LayerQuantSpec):
    """kernel (kh, kw, in, out); per_channel = per output channel."""
    if spec.weight_quant == "per_tensor":
        return rtn.quantize_weight_per_tensor_absmax(kernel, spec.w_bits)
    # per_channel / group both map to per-out-channel for convs
    w_o = jnp.moveaxis(kernel, -1, 0)
    w_o = rtn.quantize_weight_per_channel_absmax(w_o, spec.w_bits)
    return jnp.moveaxis(w_o, 0, -1)


def fake_quantize_params(params: dict, plan: QuantPlan) -> dict:
    """RTN fake-quantize every planned layer (modes fake/fake_act and,
    for convs, the real modes' conv fallback)."""
    out = params
    for path, layer in iter_layers(params):
        spec = plan.spec_for(path_str(path))
        if spec.mode == "none":
            continue
        kernel = layer["kernel"]
        if kernel.ndim == 2:
            newk = _fake_quant_dense_kernel(kernel, spec)
        elif kernel.ndim == 4:
            cspec = spec
            newk = _fake_quant_conv_kernel(kernel, cspec)
        else:
            continue
        out = _set_at(out, path + ("kernel",), newk.astype(kernel.dtype))
    return out


def pack_dense_layer(layer: dict, spec: LayerQuantSpec) -> dict:
    """Replace a {'kernel','bias'?} dense layer with packed params."""
    kernel = layer["kernel"]          # (K, N)
    k, n = kernel.shape
    new = {k2: v for k2, v in layer.items() if k2 != "kernel"}
    if spec.mode in ("w4a16", "w4a8"):
        gs = spec.group_size if spec.group_size > 0 else k
        gs = qmm.align_group_size(k, rtn.resolve_group_size(k, gs) or k)
        q = pseudo.quantize_tensor(kernel.T, n_bits=4, group_size=gs,
                                   zero_point=spec.zero_point)
        codes_kn = q.iweight.T
        scales_gn = q.scales.T
        zeros_gn = q.zeros.T if q.zeros is not None else None
        if not spec.zero_point:
            # symmetric codes in [-8, 7]
            pass
        qweight, scales, zeros = qmm.pack_linear_int4(
            codes_kn, scales_gn, zeros_gn, gs)
        new["qweight"] = qweight
        new["scales"] = scales
        if zeros is not None:
            new["zeros"] = zeros
    elif spec.mode == "w4a16_xla":
        # symmetric int4 codes row-packed two-per-int8 (see QDense)
        kp = k + (k % 2)
        gs = spec.group_size if spec.group_size > 0 else kp
        gs = rtn.resolve_group_size(kp, gs) or kp
        kern = kernel.astype(jnp.float32)
        if kp != k:
            kern = jnp.pad(kern, ((0, kp - k), (0, 0)))
        groups = kern.reshape(kp // gs, gs, n)
        s = jnp.clip(jnp.max(jnp.abs(groups), axis=1), 1e-10, None) / 7.0
        codes = jnp.clip(jnp.round(groups / s[:, None, :]), -8, 7
                         ).reshape(kp, n).astype(jnp.int32) + 8
        packed = (codes[0::2] | (codes[1::2] << 4)).astype(jnp.int8)
        new["qweight"] = packed
        new["scales"] = s.astype(jnp.float32)
    elif spec.mode in ("w8a8", "w8a8_xla", "w8a16"):
        w_abs = jnp.clip(jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=0), 1e-5, None)
        scale_n = w_abs / 127.0
        codes = jnp.clip(jnp.round(kernel.astype(jnp.float32) / scale_n[None, :]),
                         -128, 127)
        if spec.mode == "w8a8_xla":
            # unpadded buffers: XLA needs no tile padding
            new["qweight"] = codes.astype(jnp.int8)
            new["scales"] = scale_n.astype(jnp.float32)
            if spec.act_quant == "static":
                new["act_scale"] = jnp.ones((1,), jnp.float32)
        else:
            new["qweight"], new["scales"] = qmm.pack_linear_int8(codes, scale_n)
    else:
        return layer
    return new


def unpack_dense_layer(layer: dict, spec: LayerQuantSpec,
                       shape: Tuple[int, int]) -> dict:
    """Reconstruct a dense layer's fp kernel from its packed buffers.

    The inverse of :func:`pack_dense_layer` up to the (lossy)
    quantization: the returned kernel holds the DEQUANTIZED values —
    exactly what the packed kernels compute with — sliced back to the
    unpadded ``shape`` (K, N)."""
    k, n = shape
    new = {k2: v for k2, v in layer.items()
           if k2 not in ("qweight", "scales", "zeros", "act_scale")}
    if spec.mode in ("w4a16", "w4a8"):
        gs = spec.group_size if spec.group_size > 0 else k
        gs = qmm.align_group_size(k, rtn.resolve_group_size(k, gs) or k)
        codes = qmm.unpack_rows_strided(layer["qweight"], qmm.PACK_BLOCK_K,
                                        4).astype(jnp.float32)
        s = jnp.repeat(layer["scales"], gs, axis=0)
        z = (jnp.repeat(layer["zeros"], gs, axis=0)
             if "zeros" in layer else 8.0)
        new["kernel"] = ((codes - z) * s)[:k, :n]
    elif spec.mode == "w4a16_xla":
        packed = layer["qweight"].astype(jnp.int32) & 0xFF
        kp = packed.shape[0] * 2
        gs = spec.group_size if spec.group_size > 0 else kp
        gs = rtn.resolve_group_size(kp, gs) or kp
        codes = (jnp.zeros((kp, packed.shape[1]), jnp.int32)
                 .at[0::2].set(packed & 0xF)
                 .at[1::2].set((packed >> 4) & 0xF) - 8)
        w = (codes.reshape(kp // gs, gs, -1).astype(jnp.float32)
             * layer["scales"][:, None, :])
        new["kernel"] = w.reshape(kp, -1)[:k, :n]
    elif spec.mode == "w8a8_xla":
        new["kernel"] = (layer["qweight"].astype(jnp.float32)
                         * layer["scales"][None, :])[:k, :n]
    elif spec.mode in ("w8a8", "w8a16"):
        new["kernel"] = (layer["qweight"].astype(jnp.float32)
                         * layer["scales"])[:k, :n]
    else:
        raise ValueError(f"unpack_dense_layer: mode {spec.mode!r}")
    return new


def unpack_params(params: dict, plan: QuantPlan, shapes: dict) -> dict:
    """Materialize fp kernels from a packed-params pytree.

    ``shapes`` is the fp model's param template (``jax.eval_shape`` of
    ``model.init``) providing the unpadded kernel shapes.  Dense layers
    only (the serving-engine use case: feed a ``from_quantized`` /
    ``from_quantized_autoawq`` checkpoint to :class:`DecodeEngine`,
    which re-quantizes into its own planar layouts).  Counterpart of
    the reference loading packed WQLinear checkpoints into its fused
    serving modules (models/base.py:1338-1526)."""
    out = params
    for path, tmpl in iter_layers(shapes):
        sub = params
        try:
            for p in path:
                sub = sub[p]
        except (KeyError, TypeError):
            continue
        if "qweight" not in sub or tmpl["kernel"].ndim != 2:
            continue
        spec = plan.spec_for(path_str(path))
        new = unpack_dense_layer(sub, spec, tuple(tmpl["kernel"].shape))
        new["kernel"] = new["kernel"].astype(tmpl["kernel"].dtype)
        out = _set_at(out, path, new)
    return out


def pack_params(params: dict, plan: QuantPlan,
                act_stats: Optional[Dict[str, "jnp.ndarray"]] = None,
                act_margin: float = 1.0,
                conv_smooth_alpha: float = 0.5) -> dict:
    """Produce the packed-params pytree matching a plan with real modes.

    Dense layers planned w4a16/w8a8 get packed buffers; convs planned
    real fall back to fake quant (kernel zoo parity: linear-only).

    act_stats (per-layer per-channel input absmax) is required at pack
    time only by the 'static_channel' conv scheme: a SmoothQuant-style
    per-input-channel migration vector
    ``m_c = act_c^alpha / wmax_c^(1-alpha)`` is folded into the weight
    (W'_c = W_c * m_c) while activations divide by m_c at runtime, and
    the post-smoothing per-tensor static act scale is absorbed into the
    per-out-channel weight scales — so the runtime stays one fused
    per-channel multiply + int8 conv + per-out-channel dequant.  Full
    folding (alpha=1) merely moves the range problem into the weights
    (measured: -5 dB on a uniform-range VAE); alpha balances both
    sides.  Reference per-channel conv act quant:
    quantize/fake_quant.py:123-131; smoothing math: smooth.py /
    quantizer_SQ.py:272-295."""
    out = params
    for path, layer in iter_layers(params):
        spec = plan.spec_for(path_str(path))
        if not spec.is_real:
            continue
        kernel = layer["kernel"]
        if kernel.ndim == 2:
            out = _set_at(out, path, pack_dense_layer(layer, spec))
        elif kernel.ndim == 4:
            if spec.mode == "w8a8":
                # real int8 conv: per-out-channel symmetric codes
                kf = kernel.astype(jnp.float32)
                new = {k2: v for k2, v in layer.items() if k2 != "kernel"}
                s_extra = 1.0
                if spec.act_quant == "static_channel":
                    key = path_str(path)
                    cin = kf.shape[2]
                    if act_stats is not None and key in act_stats:
                        a_c = jnp.clip(act_stats[key].astype(jnp.float32),
                                       1e-5, None)
                        w_c = jnp.clip(jnp.max(jnp.abs(kf), axis=(0, 1, 3)),
                                       1e-5, None)
                        al = conv_smooth_alpha
                        m_c = jnp.clip(a_c ** al / w_c ** (1.0 - al),
                                       1e-5, None)
                        kf = kf * m_c[None, None, :, None]
                        # static per-tensor scale of the SMOOTHED acts,
                        # absorbed into the weight scales below
                        s_extra = (jnp.max(a_c / m_c) / 127.0) * act_margin
                        new["act_scale"] = m_c * s_extra
                    else:
                        import warnings

                        warnings.warn(
                            f"pack_params: no act stats for conv '{key}' — "
                            "static_channel scales stay at the 1.0 "
                            "placeholder (int8 act quant broken here)")
                        new["act_scale"] = jnp.ones((cin,), jnp.float32)
                s = jnp.clip(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-5, None) / 127.0
                codes = jnp.clip(jnp.round(kf / s), -127, 127).astype(jnp.int8)
                new["qweight"] = codes
                new["scales"] = s * s_extra
                if spec.act_quant == "static":
                    new["act_scale"] = jnp.ones((1,), jnp.float32)
                out = _set_at(out, path, new)
            else:
                newk = _fake_quant_conv_kernel(kernel, spec)
                out = _set_at(out, path + ("kernel",), newk.astype(kernel.dtype))
    return out


def fuse_qkv_params(params: dict) -> dict:
    """Merge attention projections into fused kernels
    (fused_utils.py:45-142 parity, as a pytree transform).

    Self-attention (k input dim == q input dim): to_q/to_k/to_v ->
    to_qkv.  Cross-attention: to_k/to_v -> to_kv.  Apply AFTER scale
    migration / AWQ (their groups address unfused paths) and before
    packing; use a plan with fuse_qkv=True for the matching modules."""

    def merge(out, names, newname):
        mods = [out[k] for k in names]
        new = {"kernel": jnp.concatenate([m["kernel"] for m in mods], axis=1)}
        if all("bias" in m for m in mods):
            new["bias"] = jnp.concatenate([m["bias"] for m in mods])
        out[newname] = new
        for k in names:
            del out[k]

    def rec(tree, name=""):
        if not isinstance(tree, dict):
            return tree
        out = {k: rec(v, k) for k, v in tree.items()}
        if all(k in out for k in ("to_q", "to_k", "to_v")) and \
                isinstance(out["to_q"], dict) and "kernel" in out["to_q"]:
            # self-attention modules are named attn1 in the UNet; cross
            # attention (attn2) only fuses k/v (they share the context);
            # MMDiT joint attention ('attn', recognized by its
            # add_q_proj side) fuses each side's three projections
            if name == "attn1" or "add_q_proj" in out:
                merge(out, ("to_q", "to_k", "to_v"), "to_qkv")
            elif name == "attn2":
                merge(out, ("to_k", "to_v"), "to_kv")
        if all(k in out for k in ("add_q_proj", "add_k_proj", "add_v_proj")) \
                and isinstance(out["add_q_proj"], dict) \
                and "kernel" in out["add_q_proj"]:
            merge(out, ("add_q_proj", "add_k_proj", "add_v_proj"),
                  "add_qkv_proj")
        # LLaMA-family naming: q/k/v always share the layer input (RoPE
        # applies after the projection), and the SwiGLU gate/up pair
        # shares its input too
        if all(k in out for k in ("q_proj", "k_proj", "v_proj")) and \
                isinstance(out["q_proj"], dict) and "kernel" in out["q_proj"]:
            merge(out, ("q_proj", "k_proj", "v_proj"), "qkv_proj")
        if all(k in out for k in ("gate_proj", "up_proj")) and \
                isinstance(out["gate_proj"], dict) and "kernel" in out["gate_proj"]:
            merge(out, ("gate_proj", "up_proj"), "gate_up_proj")
        return out

    return rec(params)


def unfuse_qkv_params(params: dict, llama_config=None) -> dict:
    """Inverse of fuse_qkv_params (for saving in the canonical layout).

    Diffusion fusions (to_qkv / to_kv / add_qkv_proj) split evenly.
    LLaMA-family qkv_proj needs ``llama_config`` (an object with
    num_attention_heads / num_key_value_heads / head_dim) because the
    q and k/v widths differ under GQA; gate_up_proj splits in half."""

    def split(out, fused_name, names, sizes=None):
        mod = out.pop(fused_name)
        if sizes is None:
            kernels = jnp.split(mod["kernel"], len(names), axis=1)
            biases = jnp.split(mod["bias"], len(names)) if "bias" in mod \
                else [None] * len(names)
        else:
            offs = [0]
            for w in sizes:
                offs.append(offs[-1] + w)
            kernels = [mod["kernel"][:, offs[i]:offs[i + 1]]
                       for i in range(len(names))]
            biases = [mod["bias"][offs[i]:offs[i + 1]]
                      for i in range(len(names))] if "bias" in mod \
                else [None] * len(names)
        for k, kern, b in zip(names, kernels, biases):
            out[k] = {"kernel": kern}
            if b is not None:
                out[k]["bias"] = b

    def rec(tree):
        if not isinstance(tree, dict):
            return tree
        out = {k: rec(v) for k, v in tree.items()}

        def is_mod(name):
            return name in out and isinstance(out[name], dict) \
                and "kernel" in out[name]

        if is_mod("to_qkv"):
            split(out, "to_qkv", ("to_q", "to_k", "to_v"))
        if is_mod("to_kv"):
            split(out, "to_kv", ("to_k", "to_v"))
        if is_mod("add_qkv_proj"):
            split(out, "add_qkv_proj",
                  ("add_q_proj", "add_k_proj", "add_v_proj"))
        if is_mod("qkv_proj"):
            if llama_config is None:
                raise ValueError(
                    "unfuse_qkv_params: splitting qkv_proj requires "
                    "llama_config (q and k/v widths differ under GQA)")
            h = llama_config.num_attention_heads
            hkv = llama_config.num_key_value_heads
            d = llama_config.head_dim
            split(out, "qkv_proj", ("q_proj", "k_proj", "v_proj"),
                  sizes=(h * d, hkv * d, hkv * d))
        if is_mod("gate_up_proj"):
            split(out, "gate_up_proj", ("gate_proj", "up_proj"))
        return out

    return rec(params)


# fused projection -> an unfused module sharing its input (the stats
# were captured on the unfused layout; fuse_qkv_params merges after)
_FUSED_STAT_FALLBACK = (("to_qkv", "to_q"), ("to_kv", "to_k"),
                        ("add_qkv_proj", "add_q_proj"),
                        ("qkv_proj", "q_proj"),
                        ("gate_up_proj", "gate_proj"))


def fill_static_act_scales(params: dict, act_stats: Dict[str, "jnp.ndarray"],
                           margin: float = 1.0,
                           strict: bool = False) -> dict:
    """Set calibrated static activation scales on packed int8 layers.

    act_stats: per-layer per-channel input absmax (calibration mean);
    the static per-tensor scale is max-over-channels / 127 * margin.
    An act_scale whose stats key is missing keeps its 1.0 placeholder —
    a silent int8 quality break — so it warns (raises if strict)."""
    out = params

    def rec(tree, prefix):
        nonlocal out
        if isinstance(tree, dict):
            if "act_scale" in tree and not isinstance(tree["act_scale"], dict):
                if tree["act_scale"].size != 1:
                    # per-channel conv scales ('static_channel') were
                    # already filled and FOLDED into the weights by
                    # pack_params — overwriting them here would break
                    # the fold
                    return
                key = "/".join(prefix)
                if key not in act_stats:
                    for fused, unfused in _FUSED_STAT_FALLBACK:
                        if prefix[-1] == fused:
                            key = "/".join(prefix[:-1] + (unfused,))
                            break
                if key in act_stats:
                    s = jnp.clip(jnp.max(act_stats[key]), 1e-5, None) / 127.0
                    out = _set_at(out, prefix + ("act_scale",),
                                  jnp.asarray([s * margin], jnp.float32))
                else:
                    msg = ("fill_static_act_scales: no calibration stats for "
                           f"'{'/'.join(prefix)}' — act_scale stays at the "
                           "1.0 placeholder (int8 activation quant broken "
                           "for this layer)")
                    if strict:
                        raise KeyError(msg)
                    import warnings

                    warnings.warn(msg)
                return
            for k, v in tree.items():
                rec(v, prefix + (str(k),))

    rec(params, ())
    return out


def build_act_scale_lut(params: dict,
                        per_step_stats: Dict[str, "jnp.ndarray"],
                        margin: float = 1.0) -> Dict[Tuple[str, ...], "jnp.ndarray"]:
    """Per-denoise-step static activation scales (DiTAS-style extension;
    PAPERS.md).

    The reference collapses its per-call-step absmax stats with a mean
    over steps (mean_of_dict, StableDiffusion1_x.py:104-112) — one
    static scale for the whole trajectory, so early high-sigma steps
    clip and late steps waste resolution.  Here ``per_step_stats``
    ({layer: (n_steps, C) absmax}) becomes a tiny per-layer LUT
    ({layer_path_tuple: (n_steps,) scales}); the sampler gathers one
    scalar per layer per step (``select_step_act_scales``) — free under
    XLA next to the matmuls.

    Only layers whose packed ``act_scale`` is the per-tensor (1,) form
    participate (per-channel 'static_channel' conv scales are folded
    into weights at pack time and cannot vary per step)."""
    lut: Dict[Tuple[str, ...], jnp.ndarray] = {}

    def rec(tree, prefix):
        if isinstance(tree, dict):
            if "act_scale" in tree and not isinstance(tree["act_scale"], dict):
                if tree["act_scale"].size != 1:
                    return
                key = "/".join(prefix)
                if key not in per_step_stats:
                    for fused, unfused in _FUSED_STAT_FALLBACK:
                        if prefix[-1] == fused:
                            key = "/".join(prefix[:-1] + (unfused,))
                            break
                if key in per_step_stats:
                    a = jnp.asarray(per_step_stats[key], jnp.float32)
                    s = jnp.clip(jnp.max(a, axis=-1), 1e-5, None) / 127.0
                    lut[prefix] = s * margin
                return
            for k, v in tree.items():
                rec(v, prefix + (str(k),))

    rec(params, ())
    return lut


def select_step_act_scales(params: dict,
                           lut: Dict[Tuple[str, ...], "jnp.ndarray"],
                           step_idx) -> dict:
    """Return params with every LUT layer's ``act_scale`` set to its
    scale for (traced) ``step_idx``.  All gathers are scalar
    dynamic-slices of tiny (n_steps,) arrays — XLA fuses them into the
    consuming quantize ops, so this costs nothing at runtime."""
    out = params
    for path, arr in lut.items():
        i = jnp.clip(step_idx, 0, arr.shape[0] - 1)
        s = jax.lax.dynamic_slice_in_dim(arr, i, 1)
        out = _set_at(out, path + ("act_scale",), s)
    return out


def save_act_scale_lut(lut: Dict[Tuple[str, ...], "jnp.ndarray"],
                       path: str) -> None:
    """Persist a per-step LUT ('||'-joined path keys: layer names may
    themselves contain '/')."""
    from safetensors.numpy import save_file
    import numpy as np

    save_file({"||".join(k): np.ascontiguousarray(np.asarray(v))
               for k, v in lut.items()}, path)


def load_act_scale_lut(path: str) -> Dict[Tuple[str, ...], "jnp.ndarray"]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            out[tuple(k.split("||"))] = jnp.asarray(f.get_tensor(k))
    return out


def quantized_param_count(params: dict, plan: QuantPlan) -> Dict[str, int]:
    """Diagnostic: how many layers each mode got."""
    counts: Dict[str, int] = {}
    for path, layer in iter_layers(params):
        spec = plan.spec_for(path_str(path))
        counts[spec.mode] = counts.get(spec.mode, 0) + 1
    return counts
