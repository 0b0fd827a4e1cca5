"""GPTQ: Hessian-aware one-shot weight quantization (beyond-reference
extension — the reference ships RTN / SmoothQuant / AWQ / codebook;
GPTQ completes the standard PTQ family a user of a quantization
framework expects).

Method (Frantar et al., 2022, OBQ-derived): quantize weight columns
(input channels) one at a time and redistribute each column's rounding
error onto the not-yet-quantized columns through the inverse Hessian
of the layer's input second moments, H = X^T X.  TPU realization: one
`lax.scan` over group-sized column blocks — each block does its inner
column recursion on a (N, g) VMEM-resident slice and then one masked
(N, g) @ (g, K) MXU matmul to push the block's accumulated error onto
the tail, so the O(K^2 N) work rides the MXU instead of K rank-1
updates over HBM.

Quantization grids match the repo's RTN/AWQ grids exactly
(pseudo.quantize_tensor semantics: per-(row, group) asymmetric
zero-point or symmetric absmax), so GPTQ rows drop into the same
QUALITY.md tables.  Group scale/zero are computed from the
error-updated values at each group start, matching the standard GPTQ
implementation's `find_params` placement.

Integration: `CausalLM.quantize(quantType='gptq')` — calibration
captures per-layer inputs (the same sown 'calib_x' rows AWQ uses),
then `gptq_quantize_params` replaces the shared RTN fake-quant
transform (GPTQ's output IS the quantized weight; re-rounding it would
destroy the error compensation).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from qdm_tpu.quant import rtn
from qdm_tpu.quant.apply import _set_at, iter_layers, path_str
from qdm_tpu.quant.plan import QuantPlan


@functools.partial(jax.jit, static_argnames=("n_bits", "group_size",
                                             "zero_point", "act_order",
                                             "return_q", "narrow_range"))
def gptq_quantize_kernel_h(kernel, H, n_bits: int = 4, group_size: int = 128,
                           zero_point: bool = True, percdamp: float = 0.01,
                           act_order: bool = False, return_q: bool = False,
                           narrow_range: bool = False):
    """GPTQ-quantize one dense kernel from a precomputed Hessian.

    kernel: (K, N) flax layout (in, out); H: (K, K) input second
    moments X^T X (the sown 'calib_h' Gram — full-data; a low-rank
    row-sample Hessian makes GPTQ compensate into unsampled directions
    and lose to RTN).  Returns the dequantized (K, N) kernel (same
    grid the fake-quant transform would use, error-compensated
    placement).  group_size must divide K (resolve with
    rtn.resolve_group_size first); act_order=True processes columns by
    descending Hessian diagonal (quantization groups follow the
    permuted order).

    return_q=True instead returns ``(codes, scales, zeros)`` in the
    pack_linear layout — codes (K, N) int32 (unsigned [0, 2^b-1] for
    zero_point grids, signed symmetric otherwise), scales/zeros
    (K/G, N) f32 — so GPTQ's error-compensated placement can feed the
    real packed kernels (the search's grid IS pseudo.quantize_tensor's,
    so packed dequant reproduces these values exactly).  Incompatible
    with act_order (codes would be in permuted column order)."""
    if return_q and act_order:
        raise ValueError("return_q needs unpermuted columns; "
                         "act_order reorders the quantization groups")
    K, N = kernel.shape
    g = group_size if group_size > 0 else K
    n_blocks = K // g
    W = kernel.astype(jnp.float32).T                      # (N, K)
    H = H.astype(jnp.float32)

    # dead inputs (never activated): pin the diagonal, zero the weight
    # column so it quantizes to the grid's zero and contributes nothing
    diag = jnp.diagonal(H)
    dead = diag <= 0.0
    H = H + jnp.diag(jnp.where(dead, 1.0, 0.0))
    W = jnp.where(dead[None, :], 0.0, W)
    damp = percdamp * jnp.mean(jnp.diagonal(H))
    H = H + damp * jnp.eye(K, dtype=jnp.float32)

    if act_order:
        perm = jnp.argsort(-jnp.diagonal(H))
        W = W[:, perm]
        H = H[perm][:, perm]

    # U = upper Cholesky factor of H^-1 (U^T U = H^-1): the standard
    # GPTQ recursion reads d_j = U[j, j] and the error row U[j, j+1:]
    L = jnp.linalg.cholesky(H)
    Hinv = jax.scipy.linalg.cho_solve((L, True), jnp.eye(K,
                                                         dtype=jnp.float32))
    # jnp.linalg.cholesky(A) = lower Lh with Lh Lh^T = A, so Lh^T is
    # upper with (Lh^T)^T (Lh^T) = A — exactly torch's upper factor
    U = jnp.linalg.cholesky(Hinv).T                       # (K, K) upper

    if zero_point:
        max_int = 2 ** n_bits - 1
    else:
        max_int = 2 ** (n_bits - 1) - 1
        # narrow_range: the serving engine's symmetric grids clip to
        # +-max_int (int4 [-7, 7], int8 [-127, 127]) so codes stay
        # sign-symmetric — match exactly when packing for the engine
        min_int = -max_int if narrow_range else -(2 ** (n_bits - 1))
    col_ids = jnp.arange(K)

    def block_step(W, bi):
        j0 = bi * g
        Wb = jax.lax.dynamic_slice(W, (0, j0), (N, g))
        Ub = jax.lax.dynamic_slice(U, (j0, j0), (g, g))
        # group grid from the error-updated values at group start
        # (gptq.py reference: find_params on W1 inside the loop)
        if zero_point:
            mx = jnp.max(Wb, axis=1, keepdims=True)
            mn = jnp.min(Wb, axis=1, keepdims=True)
            scale = jnp.clip(mx - mn, 1e-5, None) / max_int
            zero = jnp.clip(-jnp.round(mn / scale), 0, max_int)
        else:
            scale = jnp.clip(jnp.max(jnp.abs(Wb), axis=1, keepdims=True),
                             1e-5, None) / max_int
            zero = jnp.zeros_like(scale)

        def col_step(jj, carry):
            Wb, Err, Qb = carry
            wcol = jax.lax.dynamic_slice(Wb, (0, jj), (N, 1))  # (N, 1)
            if zero_point:
                q = jnp.clip(jnp.round(wcol / scale) + zero, 0, max_int)
                dq = (q - zero) * scale
            else:
                q = jnp.clip(jnp.round(wcol / scale), min_int, max_int)
                dq = q * scale
            d = jax.lax.dynamic_slice(Ub, (jj, jj), (1, 1))[0, 0]
            err = (wcol - dq) / d                              # (N, 1)
            urow = jax.lax.dynamic_slice(Ub, (jj, 0), (1, g))  # (1, g)
            mask = (jnp.arange(g) > jj).astype(jnp.float32)[None, :]
            Wb = Wb - err * (urow * mask)
            Wb = jax.lax.dynamic_update_slice(Wb, dq, (0, jj))
            Err = jax.lax.dynamic_update_slice(Err, err, (0, jj))
            if return_q:
                Qb = jax.lax.dynamic_update_slice(Qb, q, (0, jj))
            return Wb, Err, Qb

        Wb, Err, Qb = jax.lax.fori_loop(
            0, g, col_step,
            (Wb, jnp.zeros((N, g), jnp.float32),
             jnp.zeros((N, g if return_q else 1), jnp.float32)))
        # push the block's error onto the tail in one MXU matmul
        # (masked full-width rows keep the scan shape-static)
        Urows = jax.lax.dynamic_slice(U, (j0, 0), (g, K))
        tail = (col_ids >= j0 + g).astype(jnp.float32)[None, :]
        W = W - Err @ (Urows * tail)
        W = jax.lax.dynamic_update_slice(W, Wb, (0, j0))
        ys = (Qb, scale[:, 0], zero[:, 0]) if return_q else None
        return W, ys

    W, ys = jax.lax.scan(block_step, W, jnp.arange(n_blocks))
    if return_q:
        Q, S, Z = ys                      # (nb, N, g), (nb, N), (nb, N)
        # blocks tile K in order: (nb, N, g) -> (N, nb*g) -> (K, N)
        codes = jnp.moveaxis(Q, 0, 1).reshape(N, K).T.astype(jnp.int32)
        return codes, S, (Z if zero_point else None)
    if act_order:
        inv = jnp.argsort(perm)
        W = W[:, inv]
    return W.T.astype(kernel.dtype)                       # (K, N)


def gptq_quantize_kernel(kernel, x, n_bits: int = 4, group_size: int = 128,
                         zero_point: bool = True, percdamp: float = 0.01,
                         act_order: bool = False):
    """Row-input convenience wrapper: x (T, K) captured inputs ->
    H = X^T X -> gptq_quantize_kernel_h.  For full-data Hessians in
    bounded memory, calibrate with capture_gram and call the _h
    variant directly (gptq_quantize_params does)."""
    xf = x.astype(jnp.float32)
    return gptq_quantize_kernel_h(kernel, xf.T @ xf, n_bits=n_bits,
                                  group_size=group_size,
                                  zero_point=zero_point, percdamp=percdamp,
                                  act_order=act_order)


def gptq_quantize_params(params: dict, plan: QuantPlan,
                         input_feats: Dict[str, jnp.ndarray],
                         percdamp: float = 0.01,
                         act_order: bool = False,
                         exclude: tuple = ()) -> dict:
    """GPTQ every planned dense layer with captured inputs; planned
    layers without feats (or conv kernels) fall back to the shared RTN
    fake-quant so the whole tree lands on one consistent plan.  Drop-in
    replacement for apply.fake_quantize_params on the 'gptq' path."""
    from qdm_tpu.quant.apply import (_fake_quant_conv_kernel,
                                     _fake_quant_dense_kernel)

    out = params
    for path, layer in iter_layers(params):
        key = path_str(path)
        spec = plan.spec_for(key)
        if spec.mode == "none" or any(e in key for e in exclude):
            continue
        kernel = layer["kernel"]
        if kernel.ndim == 2 and key in input_feats:
            gs = rtn.resolve_group_size(
                kernel.shape[0], spec.group_size) or kernel.shape[0]
            feat = input_feats[key]
            k_in = kernel.shape[0]
            if feat.ndim == 2 and feat.shape == (k_in, k_in):
                newk = gptq_quantize_kernel_h(
                    kernel, feat, n_bits=spec.w_bits, group_size=gs,
                    zero_point=spec.zero_point, percdamp=percdamp,
                    act_order=act_order)
            else:
                newk = gptq_quantize_kernel(
                    kernel, feat, n_bits=spec.w_bits, group_size=gs,
                    zero_point=spec.zero_point, percdamp=percdamp,
                    act_order=act_order)
        elif kernel.ndim == 2:
            newk = _fake_quant_dense_kernel(kernel, spec)
        elif kernel.ndim == 4:
            newk = _fake_quant_conv_kernel(kernel, spec)
        else:
            continue
        out = _set_at(out, path + ("kernel",), newk.astype(kernel.dtype))
    return out


# ---------------------------------------------------------------------------
# Real packing: GPTQ codes -> the canonical packed kernel buffers
# ---------------------------------------------------------------------------


def gptq_pack_dense_layer(layer: dict, spec, H, percdamp: float = 0.01):
    """Pack one dense layer from GPTQ codes on the spec's real grid.

    Mirrors apply.pack_dense_layer's buffer contract exactly (the
    packed Pallas/XLA kernels dequantize ``(q - zero) * scale`` — the
    same arithmetic the GPTQ recursion used to place the error), so
    serving a GPTQ pack computes with GPTQ's error-compensated values
    bit-for-bit.  Returns None for modes without a GPTQ grid
    (w4a16_xla's row-pair packing; callers fall back to the RTN pack).
    Counterpart of the reference packing searched grids into WQLinear
    buffers (quantizer.py:535-577)."""
    from qdm_tpu.ops import quant_matmul as qmm

    kernel = layer["kernel"]          # (K, N)
    k, n = kernel.shape
    new = {k2: v for k2, v in layer.items() if k2 != "kernel"}
    if spec.mode in ("w4a16", "w4a8"):
        gs = spec.group_size if spec.group_size > 0 else k
        gs = qmm.align_group_size(k, rtn.resolve_group_size(k, gs) or k)
        codes, scales, zeros = gptq_quantize_kernel_h(
            kernel, H, n_bits=4, group_size=gs,
            zero_point=spec.zero_point, percdamp=percdamp, return_q=True)
        qweight, scales_p, zeros_p = qmm.pack_linear_int4(
            codes, scales, zeros, gs)
        new["qweight"] = qweight
        new["scales"] = scales_p
        if zeros_p is not None:
            new["zeros"] = zeros_p
    elif spec.mode in ("w8a8", "w8a8_xla", "w8a16"):
        # per-out-channel symmetric: one group spanning the row
        codes, scales, _ = gptq_quantize_kernel_h(
            kernel, H, n_bits=8, group_size=0, zero_point=False,
            percdamp=percdamp, return_q=True)
        scale_n = scales[0]
        if spec.mode == "w8a8_xla":
            new["qweight"] = codes.astype(jnp.int8)
            new["scales"] = scale_n.astype(jnp.float32)
            if spec.act_quant == "static":
                new["act_scale"] = jnp.ones((1,), jnp.float32)
        else:
            new["qweight"], new["scales"] = qmm.pack_linear_int8(
                codes, scale_n)
    else:
        return None
    return new


def remap_fused_grams(grams: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Alias pre-fusion Gram keys onto the fused layer names.

    Fused projections (fuse_qkv_params) share one input, so the fused
    kernel's Hessian IS any constituent's Gram: q_proj -> qkv_proj,
    gate_proj -> gate_up_proj, to_q -> to_qkv, to_k -> to_kv,
    add_q_proj -> add_qkv_proj.  Unmatched aliases are harmless (pack
    looks grams up by layer key)."""
    out = dict(grams)
    for suffix, fused in (("/q_proj", "/qkv_proj"),
                          ("/gate_proj", "/gate_up_proj"),
                          ("/to_q", "/to_qkv"),
                          ("/to_k", "/to_kv"),
                          ("/add_q_proj", "/add_qkv_proj")):
        for key, v in grams.items():
            if key.endswith(suffix):
                out[key[: -len(suffix)] + fused] = v
    return out


def gptq_pack_params(params: dict, plan: QuantPlan,
                     grams: Dict[str, jnp.ndarray],
                     act_stats: Optional[Dict[str, jnp.ndarray]] = None,
                     act_margin: float = 1.0,
                     conv_smooth_alpha: float = 0.5,
                     percdamp: float = 0.01) -> dict:
    """Pack a params tree with GPTQ codes wherever a Gram is available.

    Dense layers planned real whose key has a (K, K) Gram pack from
    the GPTQ search's own codes/scales/zeros; everything else (convs,
    dense layers without Hessians, modes without a GPTQ grid) falls
    through to apply.pack_params so the whole tree lands on one
    consistent plan.  Drop-in replacement for pack_params on the
    'gptq' path (version='real')."""
    from qdm_tpu.quant.apply import pack_params

    out = params
    for path, layer in iter_layers(params):
        key = path_str(path)
        spec = plan.spec_for(key)
        if not spec.is_real:
            continue
        kernel = layer["kernel"]
        if kernel.ndim != 2 or key not in grams:
            continue
        H = grams[key]
        if getattr(H, "ndim", 0) != 2 or H.shape != (kernel.shape[0],) * 2:
            continue
        new = gptq_pack_dense_layer(layer, spec, H, percdamp=percdamp)
        if new is not None:
            out = _set_at(out, path, new)
    # packed layers no longer carry 'kernel' -> pack_params skips them
    return pack_params(out, plan, act_stats=act_stats,
                       act_margin=act_margin,
                       conv_smooth_alpha=conv_smooth_alpha)
