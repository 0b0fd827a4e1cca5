"""Decode-step megakernels (Pallas/TPU) + pure-jnp references.

The serve ablation (BENCH_NOTES.md round 2, bench_llm.py --serve
--ablate) showed batched LLM decode is small-op-overhead-bound: of the
25.5 ms/step at batch 32 / ctx 1024, only ~3.7 ms is the HBM roofline
(weights + KV cache); the other ~20 ms is fixed per-op cost across
~15 tiny XLA ops x 22 layers.  These kernels collapse a decoder layer
to THREE pallas calls with activations VMEM-resident and weights /
cache streamed through the pallas grid pipeline (auto double-buffered):

* :func:`fused_dense_decode`    — RMSNorm (optional) + matmul
  (+ residual), grid over output blocks, x resident in VMEM.  Covers
  the qkv projection (norm folded in) and o_proj (+residual).
* :func:`decode_attention`      — GQA attention over the KV cache for
  ONE new token per sequence, grid over (batch, kv_head); each program
  streams that sequence-head's K (d, T) and V (T, d) planes and runs
  qk^T -> masked softmax -> pv entirely in VMEM.
* :func:`fused_mlp_decode`      — RMSNorm + gate/up + silu*mul + down
  + residual in one call, grid over inner-dim blocks with a resident
  f32 accumulator (the two-matmul MLP never materializes the (B, I)
  hidden in HBM).

Each has an int8 variant (``*_i8``) taking int8 weights, per-channel
weight scales, and CALIBRATED static activation scales (the
measured-fastest activation scheme on v5e — dynamic per-token scales
serialize on the row-max reduction, bench_xla_int8.py).

This is the TPU-native counterpart of the reference's fused-module
stack (reference: awq/modules/fused via models/base.py:1494-1515 and
utils/fused_utils.py:45-142 — fused QKV/MLP CUDA modules with a
rolling fp16 cache); here fusion is per-layer pallas megakernels over
a static head-major cache.

Cache layouts (kernel-native):
  K: (B, hkv, d, T)  — decode logits are q (g, d) @ K (d, T), so K is
     stored depth-major: T rides the 128 lanes, no per-step transpose.
  V: (B, hkv, T, d)  — attn out is probs (g, T) @ V (T, d).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qdm_tpu.ops.quant_matmul import LANE, _cdiv, _pick_block, _round_up, on_tpu


# ---------------------------------------------------------------------------
# fused norm + dense (+ residual)
# ---------------------------------------------------------------------------


def _norm_f32(xf, scale, bias, eps: float, norm_type: str):
    """f32 rmsnorm or layernorm (matching models/layers.py semantics:
    layernorm eps=1e-5, affine scale+bias)."""
    if norm_type == "layernorm":
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        return xc * jax.lax.rsqrt(var + 1e-5) * scale + bias
    return _rmsnorm_f32(xf, scale, eps)


def _rmsnorm_f32(xf, scale, eps):
    return xf * jax.lax.rsqrt(
        jnp.mean(xf * xf, axis=-1, keepdims=True) + eps) * scale


def _rope_epilogue(y, cos_ref, sin_ref, head_dim: int):
    """Split-half rotary rotation on a (bp, bn) block WITHOUT reshapes:
    the partner element (c +/- d/2 within each head) is materialized by
    two lane rolls + a select.  Requires bn % head_dim == 0, so rolls
    never mix heads at the selected positions.  cos/sin carry the sign
    and identity (cos=1, sin=0) for non-rotated (v) columns."""
    half = head_dim // 2
    col = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
    first = (col % head_dim) < half
    fwd = pltpu.roll(y, half, axis=1)    # output[c] = y[c - half]
    # pltpu.roll requires a non-negative shift: -half == bn - half (mod bn)
    bwd = pltpu.roll(y, y.shape[1] - half, axis=1)   # output[c] = y[c + half]
    partner = jnp.where(first, bwd, fwd)
    return y * cos_ref[:] + partner * sin_ref[:]


def _fused_dense_kernel(x_ref, w_ref, ns_ref, nb_ref, b_ref, r_ref,
                        cos_ref, sin_ref, o_ref, xn_ref, *, has_norm: bool,
                        has_bias: bool, has_residual: bool, has_rope: bool,
                        head_dim: int, eps: float, norm_type: str):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        if has_norm:
            xf = _norm_f32(xf, ns_ref[:], nb_ref[:], eps, norm_type)
        xn_ref[:] = xf.astype(xn_ref.dtype)

    y = jnp.dot(xn_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    if has_bias:
        y = y + b_ref[:]
    if has_rope:
        y = _rope_epilogue(y, cos_ref, sin_ref, head_dim)
    if has_residual:
        y = y + r_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def _fused_dense_i8_kernel(x_ref, w_ref, ws_ref, as_ref, ns_ref, nb_ref,
                           b_ref, r_ref, cos_ref, sin_ref, o_ref, xi_ref, *,
                           has_norm: bool, has_bias: bool,
                           has_residual: bool, has_rope: bool,
                           head_dim: int, eps: float, norm_type: str):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        if has_norm:
            xf = _norm_f32(xf, ns_ref[:], nb_ref[:], eps, norm_type)
        inv = 1.0 / as_ref[0]
        xi_ref[:] = jnp.clip(jnp.round(xf * inv), -127, 127).astype(jnp.int8)

    acc = jax.lax.dot_general(
        xi_ref[:], w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (as_ref[0] * ws_ref[:])
    if has_bias:
        y = y + b_ref[:]
    if has_rope:
        y = _rope_epilogue(y, cos_ref, sin_ref, head_dim)
    if has_residual:
        y = y + r_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "block_n", "out_dtype", "head_dim",
                     "norm_type", "interpret"))
def fused_dense_decode_pallas(x, w, norm_scale=None, residual=None,
                              rope_cos=None, rope_sin=None,
                              head_dim: int = 0, eps: float = 1e-6,
                              block_n: int = 512, out_dtype=None,
                              bias=None, norm_bias=None,
                              norm_type: str = "rmsnorm",
                              interpret: bool = False):
    """x (B, K) -> norm?(x) @ w (K, N) (+bias) (+rope epilogue)
    (+ residual) in one call.

    B is padded to the sublane granule; weights stream block_n columns
    per grid step (auto double-buffered), x stays VMEM-resident.
    rope_cos/rope_sin (1, N) apply the in-kernel rotary epilogue (sign
    and v-column identity pre-baked; see _rope_epilogue).  norm_type
    'layernorm' uses norm_bias (stablelm/cohere family); bias (1, N)
    is the projection bias (qwen2 qkv), added before rope like the
    module path."""
    b, k = x.shape
    kw, n = w.shape
    assert kw == k, (kw, k)
    out_dtype = out_dtype or x.dtype
    bn = _pick_block(n, block_n)
    bp = _round_up(b, 8)
    xp = jnp.pad(x, ((0, bp - b), (0, 0))) if bp != b else x
    has_norm = norm_scale is not None
    has_bias = bias is not None
    has_res = residual is not None
    has_rope = rope_cos is not None
    if has_rope:
        assert head_dim > 0 and bn % head_dim == 0, (bn, head_dim)
    ns = (norm_scale.reshape(1, k).astype(jnp.float32) if has_norm
          else jnp.ones((1, k), jnp.float32))
    nb = (norm_bias.reshape(1, k).astype(jnp.float32)
          if norm_bias is not None else jnp.zeros((1, k), jnp.float32))
    bi = (bias.reshape(1, n).astype(jnp.float32) if has_bias
          else jnp.zeros((1, 1), jnp.float32))
    rp = residual if has_res else jnp.zeros((1, n), out_dtype)
    if has_res and bp != b:
        rp = jnp.pad(rp, ((0, bp - b), (0, 0)))
    cosv = (rope_cos.reshape(1, n).astype(jnp.float32) if has_rope
            else jnp.ones((1, 1), jnp.float32))
    sinv = (rope_sin.reshape(1, n).astype(jnp.float32) if has_rope
            else jnp.zeros((1, 1), jnp.float32))
    trig_spec = (pl.BlockSpec((1, bn), lambda j: (0, j)) if has_rope
                 else pl.BlockSpec((1, 1), lambda j: (0, 0)))
    bias_spec = (pl.BlockSpec((1, bn), lambda j: (0, j)) if has_bias
                 else pl.BlockSpec((1, 1), lambda j: (0, 0)))

    out = pl.pallas_call(
        functools.partial(_fused_dense_kernel, has_norm=has_norm,
                          has_bias=has_bias, has_residual=has_res,
                          has_rope=has_rope, head_dim=head_dim, eps=eps,
                          norm_type=norm_type),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bp, k), lambda j: (0, 0)),
            pl.BlockSpec((k, bn), lambda j: (0, j)),
            pl.BlockSpec((1, k), lambda j: (0, 0)),
            pl.BlockSpec((1, k), lambda j: (0, 0)),
            bias_spec,
            (pl.BlockSpec((bp, bn), lambda j: (0, j)) if has_res
             else pl.BlockSpec((1, n), lambda j: (0, 0))),
            trig_spec,
            trig_spec,
        ],
        out_specs=pl.BlockSpec((bp, bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((bp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bp, k), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xp, w, ns, nb, bi, rp, cosv, sinv)
    return out[:b]


@functools.partial(
    jax.jit,
    static_argnames=("eps", "block_n", "out_dtype", "head_dim",
                     "norm_type", "interpret"))
def fused_dense_decode_i8_pallas(x, w_i8, w_scale, act_scale,
                                 norm_scale=None, residual=None,
                                 rope_cos=None, rope_sin=None,
                                 head_dim: int = 0, eps: float = 1e-6,
                                 block_n: int = 512, out_dtype=None,
                                 bias=None, norm_bias=None,
                                 norm_type: str = "rmsnorm",
                                 interpret: bool = False):
    """int8 fused_dense: static act scale (scalar array (1,)), int8
    weights (K, N) with per-out-channel scales (1, N); optional rope
    epilogue / projection bias / layernorm as in
    fused_dense_decode_pallas."""
    b, k = x.shape
    kw, n = w_i8.shape
    assert kw == k
    out_dtype = out_dtype or x.dtype
    bn = _pick_block(n, block_n)
    bp = _round_up(b, 8)
    xp = jnp.pad(x, ((0, bp - b), (0, 0))) if bp != b else x
    has_norm = norm_scale is not None
    has_bias = bias is not None
    has_res = residual is not None
    has_rope = rope_cos is not None
    if has_rope:
        assert head_dim > 0 and bn % head_dim == 0, (bn, head_dim)
    ns = (norm_scale.reshape(1, k).astype(jnp.float32) if has_norm
          else jnp.ones((1, k), jnp.float32))
    nb = (norm_bias.reshape(1, k).astype(jnp.float32)
          if norm_bias is not None else jnp.zeros((1, k), jnp.float32))
    bi = (bias.reshape(1, n).astype(jnp.float32) if has_bias
          else jnp.zeros((1, 1), jnp.float32))
    rp = residual if has_res else jnp.zeros((1, n), out_dtype)
    if has_res and bp != b:
        rp = jnp.pad(rp, ((0, bp - b), (0, 0)))
    cosv = (rope_cos.reshape(1, n).astype(jnp.float32) if has_rope
            else jnp.ones((1, 1), jnp.float32))
    sinv = (rope_sin.reshape(1, n).astype(jnp.float32) if has_rope
            else jnp.zeros((1, 1), jnp.float32))
    trig_spec = (pl.BlockSpec((1, bn), lambda j: (0, j)) if has_rope
                 else pl.BlockSpec((1, 1), lambda j: (0, 0)))
    bias_spec = (pl.BlockSpec((1, bn), lambda j: (0, j)) if has_bias
                 else pl.BlockSpec((1, 1), lambda j: (0, 0)))

    out = pl.pallas_call(
        functools.partial(_fused_dense_i8_kernel, has_norm=has_norm,
                          has_bias=has_bias, has_residual=has_res,
                          has_rope=has_rope, head_dim=head_dim, eps=eps,
                          norm_type=norm_type),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bp, k), lambda j: (0, 0)),
            pl.BlockSpec((k, bn), lambda j: (0, j)),
            pl.BlockSpec((1, bn), lambda j: (0, j)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, k), lambda j: (0, 0)),
            pl.BlockSpec((1, k), lambda j: (0, 0)),
            bias_spec,
            (pl.BlockSpec((bp, bn), lambda j: (0, j)) if has_res
             else pl.BlockSpec((1, n), lambda j: (0, 0))),
            trig_spec,
            trig_spec,
        ],
        out_specs=pl.BlockSpec((bp, bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((bp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bp, k), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xp, w_i8, w_scale, act_scale.astype(jnp.float32), ns, nb, bi, rp,
      cosv, sinv)
    return out[:b]


def _rope_ref(y, rope_cos, rope_sin, head_dim):
    half = head_dim // 2
    n = y.shape[1]
    col = jnp.arange(n) % head_dim
    first = (col < half)[None, :]
    fwd = jnp.roll(y, half, axis=1)
    bwd = jnp.roll(y, -half, axis=1)
    partner = jnp.where(first, bwd, fwd)
    return (y * rope_cos.reshape(1, n).astype(jnp.float32)
            + partner * rope_sin.reshape(1, n).astype(jnp.float32))


def fused_dense_decode_ref(x, w, norm_scale=None, residual=None,
                           rope_cos=None, rope_sin=None, head_dim: int = 0,
                           eps: float = 1e-6, out_dtype=None, bias=None,
                           norm_bias=None, norm_type: str = "rmsnorm"):
    xf = x.astype(jnp.float32)
    if norm_scale is not None:
        nb = (norm_bias.astype(jnp.float32) if norm_bias is not None
              else 0.0)
        xf = _norm_f32(xf, norm_scale.astype(jnp.float32), nb, eps,
                       norm_type)
    y = jnp.dot(xf.astype(x.dtype).astype(jnp.float32),
                w.astype(jnp.float32))
    if bias is not None:
        y = y + bias.reshape(1, -1).astype(jnp.float32)
    if rope_cos is not None:
        y = _rope_ref(y, rope_cos, rope_sin, head_dim)
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y.astype(out_dtype or x.dtype)


def fused_dense_decode_i8_ref(x, w_i8, w_scale, act_scale, norm_scale=None,
                              residual=None, rope_cos=None, rope_sin=None,
                              head_dim: int = 0, eps: float = 1e-6,
                              out_dtype=None, bias=None, norm_bias=None,
                              norm_type: str = "rmsnorm"):
    xf = x.astype(jnp.float32)
    if norm_scale is not None:
        nb = (norm_bias.astype(jnp.float32) if norm_bias is not None
              else 0.0)
        xf = _norm_f32(xf, norm_scale.astype(jnp.float32), nb, eps,
                       norm_type)
    s = act_scale.astype(jnp.float32)[0]
    xi = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xi.astype(jnp.int32), w_i8.astype(jnp.int32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (s * w_scale.astype(jnp.float32))
    if bias is not None:
        y = y + bias.reshape(1, -1).astype(jnp.float32)
    if rope_cos is not None:
        y = _rope_ref(y, rope_cos, rope_sin, head_dim)
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y.astype(out_dtype or x.dtype)


def fused_dense_decode(x, w, norm_scale=None, residual=None,
                       rope_cos=None, rope_sin=None, head_dim: int = 0,
                       eps: float = 1e-6, **kw):
    if on_tpu():
        return fused_dense_decode_pallas(x, w, norm_scale, residual,
                                         rope_cos, rope_sin,
                                         head_dim=head_dim, eps=eps, **kw)
    return fused_dense_decode_ref(x, w, norm_scale, residual, rope_cos,
                                  rope_sin, head_dim=head_dim, eps=eps,
                                  **{k: v for k, v in kw.items()
                                     if k not in ("block_n", "interpret")})


def fused_dense_decode_i8(x, w_i8, w_scale, act_scale, norm_scale=None,
                          residual=None, rope_cos=None, rope_sin=None,
                          head_dim: int = 0, eps: float = 1e-6, **kw):
    if on_tpu():
        return fused_dense_decode_i8_pallas(x, w_i8, w_scale, act_scale,
                                            norm_scale, residual, rope_cos,
                                            rope_sin, head_dim=head_dim,
                                            eps=eps, **kw)
    return fused_dense_decode_i8_ref(x, w_i8, w_scale, act_scale,
                                     norm_scale, residual, rope_cos,
                                     rope_sin, head_dim=head_dim, eps=eps,
                                     **{k: v for k, v in kw.items()
                                        if k not in ("block_n",
                                                     "interpret")})


# ---------------------------------------------------------------------------
# decode attention (one new token over the cache, GQA)
# ---------------------------------------------------------------------------


def _decode_attn_kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float):
    pos = pos_ref[0]
    q = q_ref[0, 0].astype(jnp.float32) * scale                 # (g, d)
    k = k_ref[0, 0].astype(jnp.float32)                         # (d, T)
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                     # (g, T)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(t_ids <= pos, logits, -1e9)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)                  # (g, T)
    v = v_ref[0, 0].astype(jnp.float32)                         # (T, d)
    o = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                     # (g, d)
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_pallas(q, k_cache, v_cache, pos, interpret: bool = False):
    """q (Bp, hkv, g, d) against K (B, hkv, d, T) / V (B, hkv, T, d);
    attends keys 0..pos inclusive.  Grid (B, hkv): each program streams
    one sequence-head's cache planes (pipelined by the grid machinery)
    and computes that head group's attention fully in VMEM.

    Bp may exceed the cache batch B (sublane-padded decode rows); only
    the first B output rows are written, the rest is uninitialized —
    all downstream ops are row-wise, so the padding rows never
    contaminate real rows."""
    bp, hkv, g, d = q.shape
    b, t = k_cache.shape[0], k_cache.shape[-1]
    assert k_cache.shape == (b, hkv, d, t)
    assert v_cache.shape == (b, hkv, t, d)
    assert bp >= b
    assert t % LANE == 0, t
    scale = d ** -0.5
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    return pl.pallas_call(
        functools.partial(_decode_attn_kernel, scale=scale),
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, g, d), lambda i, h: (i, h, 0, 0)),
            pl.BlockSpec((1, 1, d, t), lambda i, h: (i, h, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda i, h: (i, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, g, d), lambda i, h: (i, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, hkv, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(pos_arr, q, k_cache, v_cache)


def decode_attention_ref(q, k_cache, v_cache, pos, starts=None,
                         sm_scale=None, softcap: float = 0.0):
    bp, hkv, g, d = q.shape
    b, t = k_cache.shape[0], k_cache.shape[-1]
    qf = q[:b].astype(jnp.float32) * (d ** -0.5 if sm_scale is None
                                      else sm_scale)
    logits = jnp.einsum("bhgd,bhdt->bhgt", qf, k_cache.astype(jnp.float32))
    if softcap:
        logits = softcap * jnp.tanh(logits / softcap)
    mask = jnp.arange(t)[None, None, None, :] <= pos
    if starts is not None:
        mask = mask & (jnp.arange(t)[None, :]
                       >= starts[:, None])[:, None, None, :]
    logits = jnp.where(mask, logits, -1e9)
    p = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhgt,bhtd->bhgd", p, v_cache.astype(jnp.float32))
    o = o.astype(q.dtype)
    if bp > b:
        o = jnp.pad(o, ((0, bp - b), (0, 0), (0, 0), (0, 0)))
    return o


def decode_attention(q, k_cache, v_cache, pos, **kw):
    if on_tpu():
        return decode_attention_pallas(q, k_cache, v_cache, pos, **kw)
    return decode_attention_ref(q, k_cache, v_cache, pos)


def _decode_attn_rows_kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, *,
                             scale: float, hkv: int):
    """One program per batch row; kv heads looped in-kernel (fewer,
    larger cache DMAs than the (B, hkv) grid)."""
    pos = pos_ref[0]
    for h in range(hkv):
        q = q_ref[0, h].astype(jnp.float32) * scale             # (g, d)
        k = k_ref[0, h].astype(jnp.float32)                     # (d, T)
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        t_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(t_ids <= pos, logits, -1e9)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, h].astype(jnp.float32)                     # (T, d)
        o = jax.lax.dot_general(
            p, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, h] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_rows_pallas(q, k_cache, v_cache, pos,
                                 interpret: bool = False):
    """decode_attention with grid (B,) and the hkv loop in-kernel."""
    bp, hkv, g, d = q.shape
    b, t = k_cache.shape[0], k_cache.shape[-1]
    assert t % LANE == 0, t
    scale = d ** -0.5
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    return pl.pallas_call(
        functools.partial(_decode_attn_rows_kernel, scale=scale, hkv=hkv),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hkv, g, d), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, hkv, d, t), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, hkv, t, d), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hkv, g, d), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, hkv, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(pos_arr, q, k_cache, v_cache)


def _decode_attn_dm_kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, *,
                           scale: float, hkv: int):
    """Both cache planes depth-major (B, hkv, d, T): fully dense
    (d-sublane, T-lane) tiles for K AND V; PV contracts T as an NT dot.
    One program per batch row, kv heads looped in-kernel."""
    pos = pos_ref[0]
    for h in range(hkv):
        q = q_ref[0, h].astype(jnp.float32) * scale             # (g, d)
        k = k_ref[0, h].astype(jnp.float32)                     # (d, T)
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (g, T)
        t_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(t_ids <= pos, logits, -1e9)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)              # (g, T)
        v = v_ref[0, h].astype(jnp.float32)                     # (d, T)
        o = jax.lax.dot_general(
            p, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (g, d)
        o_ref[0, h] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_dm_pallas(q, k_cache, v_cache, pos,
                               interpret: bool = False):
    """decode_attention with BOTH caches in (B, hkv, d, T) layout."""
    bp, hkv, g, d = q.shape
    b, t = k_cache.shape[0], k_cache.shape[-1]
    assert k_cache.shape == (b, hkv, d, t)
    assert v_cache.shape == (b, hkv, d, t)
    assert t % LANE == 0, t
    scale = d ** -0.5
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    return pl.pallas_call(
        functools.partial(_decode_attn_dm_kernel, scale=scale, hkv=hkv),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hkv, g, d), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, hkv, d, t), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, hkv, d, t), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hkv, g, d), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, hkv, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(pos_arr, q, k_cache, v_cache)


def _decode_attn_dm_i8_kernel(pos_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
                              o_ref, *, scale: float, hkv: int):
    """int8 depth-major variant: int8 MXU for both contractions, cache
    scales applied to the tiny logits/outputs."""
    pos = pos_ref[0]
    for h in range(hkv):
        qf = q_ref[0, h].astype(jnp.float32) * scale            # (g, d)
        qs = jnp.clip(jnp.max(jnp.abs(qf), axis=-1, keepdims=True),
                      1e-8, None) / 127.0
        qi = jnp.round(qf / qs).astype(jnp.int8)
        acc = jax.lax.dot_general(
            qi, k_ref[0, h], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)                   # (g, T)
        logits = acc.astype(jnp.float32) * qs * ks_ref[0, h]
        t_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(t_ids <= pos, logits, -1e9)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        p = p * vs_ref[0, h]
        ps = jnp.clip(jnp.max(p, axis=-1, keepdims=True), 1e-8, None) / 127.0
        pi = jnp.round(p / ps).astype(jnp.int8)
        o = jax.lax.dot_general(
            pi, v_ref[0, h], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)                   # (g, d)
        o_ref[0, h] = (o.astype(jnp.float32) * ps).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_dm_i8_pallas(q, k_i8, k_scale, v_i8, v_scale, pos,
                                  interpret: bool = False):
    """int8-KV depth-major attention: k_i8 AND v_i8 (B, hkv, d, T) int8,
    per-token scales (B, hkv, 1, T) f32 each."""
    bp, hkv, g, d = q.shape
    b, t = k_i8.shape[0], k_i8.shape[-1]
    assert k_i8.shape == (b, hkv, d, t) and v_i8.shape == (b, hkv, d, t)
    assert k_scale.shape == (b, hkv, 1, t) and v_scale.shape == (b, hkv, 1, t)
    assert t % LANE == 0, t
    scale = d ** -0.5
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    return pl.pallas_call(
        functools.partial(_decode_attn_dm_i8_kernel, scale=scale, hkv=hkv),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hkv, g, d), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, hkv, d, t), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, hkv, 1, t), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, hkv, d, t), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, hkv, 1, t), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hkv, g, d), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, hkv, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(pos_arr, q, k_i8, k_scale, v_i8, v_scale)


def decode_attention_dm_i8_ref(q, k_i8, k_scale, v_i8, v_scale, pos):
    bp, hkv, g, d = q.shape
    b, t = k_i8.shape[0], k_i8.shape[-1]
    qf = q[:b].astype(jnp.float32) * (d ** -0.5)
    qs = jnp.clip(jnp.max(jnp.abs(qf), axis=-1, keepdims=True),
                  1e-8, None) / 127.0
    qi = jnp.round(qf / qs)
    logits = jnp.einsum("bhgd,bhdt->bhgt", qi, k_i8.astype(jnp.float32))
    logits = logits * qs * k_scale
    mask = jnp.arange(t)[None, None, None, :] <= pos
    logits = jnp.where(mask, logits, -1e9)
    p = jax.nn.softmax(logits, axis=-1) * v_scale
    ps = jnp.clip(jnp.max(p, axis=-1, keepdims=True), 1e-8, None) / 127.0
    pi = jnp.round(p / ps)
    o = jnp.einsum("bhgt,bhdt->bhgd", pi, v_i8.astype(jnp.float32)) * ps
    o = o.astype(q.dtype)
    if bp > b:
        o = jnp.pad(o, ((0, bp - b), (0, 0), (0, 0), (0, 0)))
    return o


def _decode_attn_kv_kernel(pos_ref, q_ref, kv_ref, o_ref, *, scale: float,
                           hkv: int, bb: int, ragged: bool = False,
                           softcap: float = 0.0):
    """Combined-cache variant: kv (bb, 2*hkv, d, T) holds K rows then V
    rows — ONE cache array, so the per-step cache update is a single
    dynamic_update_slice and the kernel streams one block per program.

    ragged=True: pos_ref is [pos, start_0, ..., start_{B-1}] and cache
    slots below each row's start are masked out (left-padded ragged
    batches: pad tokens occupy slots [0, start) and must be invisible
    to every real query)."""
    pos = pos_ref[0]
    for bi in range(bb):
        start = (pos_ref[1 + pl.program_id(0) * bb + bi] if ragged
                 else None)
        for h in range(hkv):
            q = q_ref[bi, h].astype(jnp.float32) * scale        # (g, d)
            k = kv_ref[bi, h].astype(jnp.float32)               # (d, T)
            logits = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if softcap:
                # gemma2 attention soft-capping (post-scale, pre-mask)
                logits = softcap * jnp.tanh(logits / softcap)
            t_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            ok = t_ids <= pos
            if ragged:
                ok = ok & (t_ids >= start)
            logits = jnp.where(ok, logits, -1e9)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            v = kv_ref[bi, hkv + h].astype(jnp.float32)         # (d, T)
            o = jax.lax.dot_general(
                p, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[bi, h] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret",
                                             "sm_scale", "softcap"))
def decode_attention_kv_pallas(q, kv_cache, pos, starts=None,
                               block_b: int = 1, interpret: bool = False,
                               sm_scale=None, softcap: float = 0.0):
    """Combined depth-major cache attention: kv_cache (B, 2*hkv, d, T)
    = [K | V] along axis 1.  starts (B,) optional per-row first valid
    cache slot (ragged left-padded batches)."""
    bp, hkv, g, d = q.shape
    b, t = kv_cache.shape[0], kv_cache.shape[-1]
    assert kv_cache.shape == (b, 2 * hkv, d, t)
    assert t % LANE == 0 and b % block_b == 0, (t, b, block_b)
    scale = d ** -0.5 if sm_scale is None else float(sm_scale)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    if starts is not None:
        assert starts.shape == (b,), starts.shape
        pos_arr = jnp.concatenate([pos_arr, starts.astype(jnp.int32)])
    bb = block_b

    return pl.pallas_call(
        functools.partial(_decode_attn_kv_kernel, scale=scale, hkv=hkv,
                          bb=bb, ragged=starts is not None,
                          softcap=softcap),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, hkv, g, d), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bb, 2 * hkv, d, t), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, hkv, g, d), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, hkv, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(pos_arr, q, kv_cache)


def _decode_attn_kv_i8_kernel(pos_ref, q_ref, kv_ref, kvs_ref, o_ref, *,
                              scale: float, hkv: int, bb: int):
    pos = pos_ref[0]
    for bi in range(bb):
        for h in range(hkv):
            qf = q_ref[bi, h].astype(jnp.float32) * scale
            qs = jnp.clip(jnp.max(jnp.abs(qf), axis=-1, keepdims=True),
                          1e-8, None) / 127.0
            qi = jnp.round(qf / qs).astype(jnp.int8)
            acc = jax.lax.dot_general(
                qi, kv_ref[bi, h],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            logits = acc.astype(jnp.float32) * qs * kvs_ref[bi, h]
            t_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(t_ids <= pos, logits, -1e9)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            p = p * kvs_ref[bi, hkv + h]
            ps = jnp.clip(jnp.max(p, axis=-1, keepdims=True),
                          1e-8, None) / 127.0
            pi = jnp.round(p / ps).astype(jnp.int8)
            o = jax.lax.dot_general(
                pi, kv_ref[bi, hkv + h],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            o_ref[bi, h] = (o.astype(jnp.float32) * ps).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def decode_attention_kv_i8_pallas(q, kv_i8, kv_scale, pos, block_b: int = 1,
                                  interpret: bool = False):
    """Combined int8 cache: kv_i8 (B, 2*hkv, d, T) int8 with per-token
    scales kv_scale (B, 2*hkv, 1, T) f32."""
    bp, hkv, g, d = q.shape
    b, t = kv_i8.shape[0], kv_i8.shape[-1]
    assert kv_i8.shape == (b, 2 * hkv, d, t)
    assert kv_scale.shape == (b, 2 * hkv, 1, t)
    assert t % LANE == 0 and b % block_b == 0
    scale = d ** -0.5
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    bb = block_b

    return pl.pallas_call(
        functools.partial(_decode_attn_kv_i8_kernel, scale=scale, hkv=hkv,
                          bb=bb),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, hkv, g, d), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bb, 2 * hkv, d, t), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bb, 2 * hkv, 1, t), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, hkv, g, d), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, hkv, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(pos_arr, q, kv_i8, kv_scale)


def decode_attention_kv(q, kv_cache, pos, starts=None, sm_scale=None,
                        softcap: float = 0.0, **kw):
    """Combined-cache dispatcher (kv (B, 2hkv, d, T) = [K | V]).
    Long contexts route to the T-blocked flash kernel (the single-pass
    kernel's whole-row cache block busts VMEM past ~3 MB/program).
    sm_scale/softcap: gemma2 attention scale override + logit
    soft-capping (all bf16-KV variants)."""
    if on_tpu():
        if _kv_block_bytes(kv_cache) > _FLASH_BYTES:
            return decode_attention_kv_flash_pallas(
                q, kv_cache, pos, starts, mode="bf16", sm_scale=sm_scale,
                softcap=softcap, **kw)
        return decode_attention_kv_pallas(q, kv_cache, pos, starts,
                                          sm_scale=sm_scale,
                                          softcap=softcap, **kw)
    hkv = q.shape[1]
    return decode_attention_ref(
        q, kv_cache[:, :hkv],
        kv_cache[:, hkv:].transpose(0, 1, 3, 2), pos, starts=starts,
        sm_scale=sm_scale, softcap=softcap)


def decode_attention_kv_i8(q, kv_i8, kv_scale, pos, **kw):
    if on_tpu():
        if _kv_block_bytes(kv_i8) > _FLASH_BYTES:
            return decode_attention_kv_flash_pallas(
                q, kv_i8, pos, kv_scale=kv_scale, mode="i8", **kw)
        return decode_attention_kv_i8_pallas(q, kv_i8, kv_scale, pos, **kw)
    hkv = q.shape[1]
    return decode_attention_dm_i8_ref(
        q, kv_i8[:, :hkv], kv_scale[:, :hkv],
        kv_i8[:, hkv:], kv_scale[:, hkv:], pos)


def _decode_attn_kv_i8c_kernel(pos_ref, q_ref, kv_ref, o_ref, *,
                               scale: float, hkv: int, bb: int,
                               ragged: bool = False):
    """Channel-scaled int8 combined cache.  The per-(head, depth-
    channel) STATIC cache scales are folded OUTSIDE the kernel — K
    scales into q before the call (q'[d] = q[d] * ks[d], exact because
    the QK contraction runs over d), V scales into the output after
    (o[d] *= vs[d], exact because d is a free axis of PV).  The kernel
    therefore does ZERO per-token scale arithmetic: quantize q once
    per step, two int8 MXU dots, one scalar-per-row logits scale —
    unlike the per-token variant whose (g, T) scale multiplies and
    scale-plane reads cost more than the halved cache bytes save
    (61-67 us vs 51.5 bf16 at ctx 1024, BENCH_NOTES round 3).

    ragged=True: pos_ref carries per-row starts like the bf16 kv
    kernel (slots below a row's start are masked out)."""
    pos = pos_ref[0]
    for bi in range(bb):
        start = (pos_ref[1 + pl.program_id(0) * bb + bi] if ragged
                 else None)
        for h in range(hkv):
            qf = q_ref[bi, h].astype(jnp.float32) * scale       # (g, d)
            qs = jnp.clip(jnp.max(jnp.abs(qf), axis=-1, keepdims=True),
                          1e-8, None) / 127.0
            qi = jnp.round(qf / qs).astype(jnp.int8)
            acc = jax.lax.dot_general(
                qi, kv_ref[bi, h],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            logits = acc.astype(jnp.float32) * qs               # (g, T)
            t_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            ok = t_ids <= pos
            if ragged:
                ok = ok & (t_ids >= start)
            logits = jnp.where(ok, logits, -1e9)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            ps = jnp.clip(jnp.max(p, axis=-1, keepdims=True),
                          1e-8, None) / 127.0
            pi = jnp.round(p / ps).astype(jnp.int8)
            o = jax.lax.dot_general(
                pi, kv_ref[bi, hkv + h],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            o_ref[bi, h] = (o.astype(jnp.float32) * ps).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def decode_attention_kv_i8c_pallas(q, kv_i8, pos, starts=None,
                                   block_b: int = 1,
                                   interpret: bool = False):
    """Channel-scaled combined int8 cache: kv_i8 (B, 2*hkv, d, T) int8;
    q must arrive PRE-FOLDED with the K channel scales and the output
    must be POST-FOLDED with the V channel scales by the caller (see
    _decode_attn_kv_i8c_kernel docstring)."""
    bp, hkv, g, d = q.shape
    b, t = kv_i8.shape[0], kv_i8.shape[-1]
    assert kv_i8.shape == (b, 2 * hkv, d, t)
    assert t % LANE == 0 and b % block_b == 0
    scale = d ** -0.5
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    if starts is not None:
        assert starts.shape == (b,), starts.shape
        pos_arr = jnp.concatenate([pos_arr, starts.astype(jnp.int32)])
    bb = block_b

    return pl.pallas_call(
        functools.partial(_decode_attn_kv_i8c_kernel, scale=scale, hkv=hkv,
                          bb=bb, ragged=starts is not None),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, hkv, g, d), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bb, 2 * hkv, d, t), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, hkv, g, d), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, hkv, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(pos_arr, q, kv_i8)


def decode_attention_kv_i8c_ref(q, kv_i8, pos, starts=None):
    """f32 reference of the channel-scaled kernel (no q/p quantization
    — the kernel's int8 rounding is covered by tolerance)."""
    hkv = q.shape[1]
    return decode_attention_ref(
        q, kv_i8[:, :hkv].astype(jnp.float32),
        kv_i8[:, hkv:].astype(jnp.float32).transpose(0, 1, 3, 2), pos,
        starts=starts)


def decode_attention_kv_i8c(q, kv_i8, pos, starts=None, **kw):
    if on_tpu():
        if _kv_block_bytes(kv_i8) > _FLASH_BYTES:
            return decode_attention_kv_flash_pallas(
                q, kv_i8, pos, starts, mode="i8c", **kw)
        return decode_attention_kv_i8c_pallas(q, kv_i8, pos, starts, **kw)
    return decode_attention_kv_i8c_ref(q, kv_i8, pos, starts=starts)


def pack_kv_int4(codes):
    """Pack int4-valued codes (..., d, T) along the DEPTH axis into
    bytes (..., d/2, T): channel c rides the low nibble, channel
    c + d/2 the high nibble (the planar-weight convention,
    pack_int4_planar).  Depth-packing keeps the per-decode-step cache
    write one dynamic_update_slice (a full d column for the new token
    arrives at once), unlike lane/T-packing which would need a nibble
    read-modify-write."""
    d = codes.shape[-2]
    lo = codes[..., : d // 2, :]
    hi = codes[..., d // 2:, :]
    return ((hi << 4) | (lo & 0xF)).astype(jnp.int8)


def unpack_kv_int4(packed):
    """Inverse of pack_kv_int4 (jnp reference): bytes (..., d/2, T) ->
    int32 codes (..., d, T)."""
    p32 = packed.astype(jnp.int32)
    lo = (p32 << 28) >> 28
    hi = p32 >> 4
    return jnp.concatenate([lo, hi], axis=-2)


def _decode_attn_kv_i4c_kernel(pos_ref, q_ref, kv_ref, o_ref, *,
                               scale: float, hkv: int, bb: int,
                               ragged: bool = False):
    """Channel-scaled INT4 combined cache: kv_ref (bb, 2*hkv, d/2, T)
    int8 bytes holding two depth channels per byte (pack_kv_int4), so
    the cache read is HALF the i8c kernel's bytes and a QUARTER of
    bf16.  Scale handling is identical to the i8c kernel (K channel
    scales folded into q outside, V channel scales into the output
    outside; codes span ±7).  The nibble unpack sign-extends through
    int32 shifts (_nibbles — Mosaic has no int8 vector shift) and the
    two (d/2, T) planes stack back along sublanes into the full
    (d, T) operand for the same two int8 MXU dots as i8c."""
    pos = pos_ref[0]
    for bi in range(bb):
        start = (pos_ref[1 + pl.program_id(0) * bb + bi] if ragged
                 else None)
        for h in range(hkv):
            qf = q_ref[bi, h].astype(jnp.float32) * scale       # (g, d)
            qs = jnp.clip(jnp.max(jnp.abs(qf), axis=-1, keepdims=True),
                          1e-8, None) / 127.0
            qi = jnp.round(qf / qs).astype(jnp.int8)
            k_lo, k_hi = _nibbles(kv_ref[bi, h])
            k = jnp.concatenate([k_lo, k_hi], axis=0)           # (d, T)
            acc = jax.lax.dot_general(
                qi, k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            logits = acc.astype(jnp.float32) * qs               # (g, T)
            t_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            ok = t_ids <= pos
            if ragged:
                ok = ok & (t_ids >= start)
            logits = jnp.where(ok, logits, -1e9)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            ps = jnp.clip(jnp.max(p, axis=-1, keepdims=True),
                          1e-8, None) / 127.0
            pi = jnp.round(p / ps).astype(jnp.int8)
            v_lo, v_hi = _nibbles(kv_ref[bi, hkv + h])
            v = jnp.concatenate([v_lo, v_hi], axis=0)           # (d, T)
            o = jax.lax.dot_general(
                pi, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            o_ref[bi, h] = (o.astype(jnp.float32) * ps).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def decode_attention_kv_i4c_pallas(q, kv_p, pos, starts=None,
                                   block_b: int = 1,
                                   interpret: bool = False):
    """Channel-scaled combined INT4 cache: kv_p (B, 2*hkv, d/2, T)
    packed bytes (pack_kv_int4).  Same calling contract as the i8c
    kernel: q arrives PRE-FOLDED with the K channel scales, the output
    must be POST-FOLDED with the V channel scales by the caller."""
    bp, hkv, g, d = q.shape
    b, t = kv_p.shape[0], kv_p.shape[-1]
    assert kv_p.shape == (b, 2 * hkv, d // 2, t), (kv_p.shape, q.shape)
    assert t % LANE == 0 and b % block_b == 0
    scale = d ** -0.5
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    if starts is not None:
        assert starts.shape == (b,), starts.shape
        pos_arr = jnp.concatenate([pos_arr, starts.astype(jnp.int32)])
    bb = block_b

    return pl.pallas_call(
        functools.partial(_decode_attn_kv_i4c_kernel, scale=scale, hkv=hkv,
                          bb=bb, ragged=starts is not None),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, hkv, g, d), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bb, 2 * hkv, d // 2, t), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, hkv, g, d), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, hkv, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(pos_arr, q, kv_p)


def decode_attention_kv_i4c_ref(q, kv_p, pos, starts=None):
    """f32 reference of the int4 channel-scaled kernel: unpack the
    nibble codes and run scale-free attention (kernel q/p quantization
    covered by tolerance, like the i8c ref)."""
    hkv = q.shape[1]
    kv = unpack_kv_int4(kv_p).astype(jnp.float32)
    return decode_attention_ref(
        q, kv[:, :hkv], kv[:, hkv:].transpose(0, 1, 3, 2), pos,
        starts=starts)


def decode_attention_kv_i4c(q, kv_p, pos, starts=None, **kw):
    if on_tpu():
        if _kv_block_bytes(kv_p) > _FLASH_BYTES:
            return decode_attention_kv_flash_pallas(
                q, kv_p, pos, starts, mode="i4c", **kw)
        return decode_attention_kv_i4c_pallas(q, kv_p, pos, starts, **kw)
    return decode_attention_kv_i4c_ref(q, kv_p, pos, starts=starts)


# --------------------------------------------------------------- long-ctx
# T-blocked (flash) decode attention.  The single-pass kv kernels above
# stream the row's ENTIRE (2hkv, d, T) cache block into VMEM; at
# ctx 4096 x batch 16 that block is 4 MB and the whole scoped window
# busts v5e's ~16 MB VMEM (measured OOM, r3l).  This variant grids over
# T with the standard online-softmax recurrence (running max m, sum l,
# unnormalized accumulator acc in VMEM scratch), so VMEM use is bounded
# by block_t regardless of context length.  One kernel body serves all
# four cache formats ('bf16' | 'i8c' | 'i4c' | 'i8'); the dispatchers
# below route to it when the per-program cache block would exceed
# _FLASH_BYTES.

_FLASH_BYTES = 3 * 2 ** 20


def _pick_bt(t: int, target: int = 1024) -> int:
    for bt in range(min(target, t), 0, -LANE):
        if t % bt == 0:
            return bt
    return LANE


def _decode_attn_kv_flash_kernel(pos_ref, q_ref, kv_ref, o_ref,
                                 m_sc, l_sc, acc_sc, *, scale: float,
                                 hkv: int, bb: int, bt: int, nt: int,
                                 mode: str, ragged: bool,
                                 kvs_ref=None, softcap: float = 0.0):
    tj = pl.program_id(1)
    t0 = tj * bt
    pos = pos_ref[0]

    @pl.when(tj == 0)
    def _init():
        m_sc[...] = jnp.full_like(m_sc, -1e30)
        l_sc[...] = jnp.zeros_like(l_sc)
        acc_sc[...] = jnp.zeros_like(acc_sc)

    for bi in range(bb):
        start = (pos_ref[1 + pl.program_id(0) * bb + bi] if ragged
                 else None)
        for h in range(hkv):
            qf = q_ref[bi, h].astype(jnp.float32) * scale       # (g, d)
            if mode == "bf16":
                k = kv_ref[bi, h].astype(jnp.float32)           # (d, bt)
                logits = jax.lax.dot_general(
                    qf, k, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                qs = jnp.clip(jnp.max(jnp.abs(qf), axis=-1,
                                      keepdims=True), 1e-8, None) / 127.0
                qi = jnp.round(qf / qs).astype(jnp.int8)
                if mode == "i4c":
                    k_lo, k_hi = _nibbles(kv_ref[bi, h])
                    k = jnp.concatenate([k_lo, k_hi], axis=0)
                else:
                    k = kv_ref[bi, h]
                acc32 = jax.lax.dot_general(
                    qi, k, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                logits = acc32.astype(jnp.float32) * qs
                if mode == "i8":                  # per-token K scales
                    logits = logits * kvs_ref[bi, h]
            if softcap:
                # gemma2 attention soft-capping (post-scale, pre-mask)
                logits = softcap * jnp.tanh(logits / softcap)
            t_ids = t0 + jax.lax.broadcasted_iota(jnp.int32,
                                                  logits.shape, 1)
            ok = t_ids <= pos
            if ragged:
                ok = ok & (t_ids >= start)
            logits = jnp.where(ok, logits, -1e30)

            g = logits.shape[0]
            m_old = m_sc[bi, h][:, :1]                          # (g, 1)
            m_new = jnp.maximum(m_old, jnp.max(logits, axis=-1,
                                               keepdims=True))
            alpha = jnp.exp(m_old - m_new)
            p = jnp.exp(logits - m_new)                         # (g, bt)
            l_new = l_sc[bi, h][:, :1] * alpha \
                + jnp.sum(p, axis=-1, keepdims=True)
            if mode == "i8":                      # per-token V scales
                p = p * kvs_ref[bi, hkv + h]
            if mode == "bf16":
                v = kv_ref[bi, hkv + h].astype(jnp.float32)
                pv = jax.lax.dot_general(
                    p, v, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                ps = jnp.clip(jnp.max(p, axis=-1, keepdims=True),
                              1e-8, None) / 127.0
                pi = jnp.round(p / ps).astype(jnp.int8)
                if mode == "i4c":
                    v_lo, v_hi = _nibbles(kv_ref[bi, hkv + h])
                    v = jnp.concatenate([v_lo, v_hi], axis=0)
                else:
                    v = kv_ref[bi, hkv + h]
                pv32 = jax.lax.dot_general(
                    pi, v, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                pv = pv32.astype(jnp.float32) * ps
            acc_sc[bi, h] = acc_sc[bi, h] * alpha + pv
            # full-lane broadcast stores (no partial-lane writes)
            m_sc[bi, h] = jnp.broadcast_to(m_new, (g, m_sc.shape[-1]))
            l_sc[bi, h] = jnp.broadcast_to(l_new, (g, l_sc.shape[-1]))

    @pl.when(tj == nt - 1)
    def _finish():
        for bi in range(bb):
            for h in range(hkv):
                o_ref[bi, h] = (acc_sc[bi, h]
                                / l_sc[bi, h][:, :1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mode", "block_b", "block_t",
                                             "interpret", "sm_scale",
                                             "softcap"))
def decode_attention_kv_flash_pallas(q, kv_cache, pos, starts=None,
                                     kv_scale=None, mode: str = "bf16",
                                     block_b: int = 1, block_t: int = 1024,
                                     interpret: bool = False,
                                     sm_scale=None, softcap: float = 0.0):
    """T-blocked combined-cache decode attention (see the kernel
    docstring).  kv_cache (B, 2*hkv, d, T) in the mode's storage format
    ((B, 2*hkv, d//2, T) packed bytes for 'i4c'); kv_scale (B, 2*hkv,
    1, T) per-token scales, 'i8' mode only.  Same calling contracts as
    the single-pass kernels (i8c/i4c: q pre-folded with K channel
    scales, output post-folded with V channel scales)."""
    bp, hkv, g, d = q.shape
    b, t = kv_cache.shape[0], kv_cache.shape[-1]
    dd = d // 2 if mode == "i4c" else d
    assert kv_cache.shape == (b, 2 * hkv, dd, t), (kv_cache.shape, mode)
    assert (kv_scale is not None) == (mode == "i8")
    bt = _pick_bt(t, block_t)
    nt = t // bt
    scale = d ** -0.5 if sm_scale is None else float(sm_scale)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    if starts is not None:
        assert starts.shape == (b,), starts.shape
        pos_arr = jnp.concatenate([pos_arr, starts.astype(jnp.int32)])
    bb = block_b
    assert t % LANE == 0 and b % bb == 0

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((bb, hkv, g, d), lambda i, j: (i, 0, 0, 0)),
        pl.BlockSpec((bb, 2 * hkv, dd, bt), lambda i, j: (i, 0, 0, j)),
    ]
    args = [pos_arr, q, kv_cache]
    if mode == "i8":
        in_specs.append(pl.BlockSpec((bb, 2 * hkv, 1, bt),
                                     lambda i, j: (i, 0, 0, j)))
        args.append(kv_scale)

        def kern(pos_ref, q_ref, kv_ref, kvs_ref, o_ref, m_sc, l_sc,
                 acc_sc):
            _decode_attn_kv_flash_kernel(
                pos_ref, q_ref, kv_ref, o_ref, m_sc, l_sc, acc_sc,
                scale=scale, hkv=hkv, bb=bb, bt=bt, nt=nt, mode=mode,
                ragged=starts is not None, kvs_ref=kvs_ref,
                softcap=softcap)
    else:
        kern = functools.partial(
            _decode_attn_kv_flash_kernel, scale=scale, hkv=hkv, bb=bb,
            bt=bt, nt=nt, mode=mode, ragged=starts is not None,
            softcap=softcap)

    return pl.pallas_call(
        kern,
        grid=(b // bb, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, hkv, g, d), lambda i, j: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, hkv, g, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bb, hkv, g, LANE), jnp.float32),
                        pltpu.VMEM((bb, hkv, g, LANE), jnp.float32),
                        pltpu.VMEM((bb, hkv, g, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*args)


def _kv_block_bytes(kv_cache) -> int:
    return int(np.prod(kv_cache.shape[1:])) * kv_cache.dtype.itemsize


def decode_attention_dm(q, k_cache, v_cache, pos, **kw):
    """Depth-major attention dispatcher (both caches (B, hkv, d, T))."""
    if on_tpu():
        return decode_attention_dm_pallas(q, k_cache, v_cache, pos, **kw)
    return decode_attention_ref(q, k_cache,
                                v_cache.transpose(0, 1, 3, 2), pos)


def decode_attention_dm_i8(q, k_i8, k_scale, v_i8, v_scale, pos, **kw):
    if on_tpu():
        return decode_attention_dm_i8_pallas(q, k_i8, k_scale, v_i8,
                                             v_scale, pos, **kw)
    return decode_attention_dm_i8_ref(q, k_i8, k_scale, v_i8, v_scale, pos)


def _decode_attn_i8_kernel(pos_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
                           o_ref, *, scale: float):
    """Fully-int8 cache attention: QK^T and PV run on the int8 MXU;
    the per-token cache scales factor OUT of the contractions and are
    applied to the tiny (g, T) logits / (g, d) outputs instead of
    dequantizing the (d, T)/(T, d) planes element-wise."""
    pos = pos_ref[0]
    qf = q_ref[0, 0].astype(jnp.float32) * scale                # (g, d)
    qs = jnp.clip(jnp.max(jnp.abs(qf), axis=-1, keepdims=True),
                  1e-8, None) / 127.0
    qi = jnp.round(qf / qs).astype(jnp.int8)
    acc = jax.lax.dot_general(
        qi, k_ref[0, 0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                       # (g, T)
    logits = acc.astype(jnp.float32) * qs * ks_ref[0, 0]        # * (1, T)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(t_ids <= pos, logits, -1e9)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)                  # (g, T)
    p = p * vs_ref[0, 0]                                        # fold v scales
    ps = jnp.clip(jnp.max(p, axis=-1, keepdims=True), 1e-8, None) / 127.0
    pi = jnp.round(p / ps).astype(jnp.int8)
    o = jax.lax.dot_general(
        pi, v_ref[0, 0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                       # (g, d)
    o_ref[0, 0] = (o.astype(jnp.float32) * ps).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_i8_pallas(q, k_i8, k_scale, v_i8, v_scale, pos,
                               interpret: bool = False):
    """int8-KV decode attention.  k_i8 (B, hkv, d, T) int8 with
    per-token scales k_scale (B, hkv, 1, T) f32; v_i8 (B, hkv, T, d)
    int8 with v_scale (B, hkv, 1, T) f32.  Halves the cache HBM
    traffic that dominates decode attention."""
    bp, hkv, g, d = q.shape
    b, t = k_i8.shape[0], k_i8.shape[-1]
    assert k_i8.shape == (b, hkv, d, t)
    assert v_i8.shape == (b, hkv, t, d)
    assert k_scale.shape == (b, hkv, 1, t) and v_scale.shape == (b, hkv, 1, t)
    assert t % LANE == 0, t
    scale = d ** -0.5
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    return pl.pallas_call(
        functools.partial(_decode_attn_i8_kernel, scale=scale),
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, g, d), lambda i, h: (i, h, 0, 0)),
            pl.BlockSpec((1, 1, d, t), lambda i, h: (i, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, t), lambda i, h: (i, h, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda i, h: (i, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, t), lambda i, h: (i, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, g, d), lambda i, h: (i, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, hkv, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(pos_arr, q, k_i8, k_scale, v_i8, v_scale)


def decode_attention_i8_ref(q, k_i8, k_scale, v_i8, v_scale, pos):
    bp, hkv, g, d = q.shape
    b, t = k_i8.shape[0], k_i8.shape[-1]
    qf = q[:b].astype(jnp.float32) * (d ** -0.5)
    qs = jnp.clip(jnp.max(jnp.abs(qf), axis=-1, keepdims=True),
                  1e-8, None) / 127.0
    qi = jnp.round(qf / qs)
    logits = jnp.einsum("bhgd,bhdt->bhgt", qi, k_i8.astype(jnp.float32))
    logits = logits * qs * k_scale
    mask = jnp.arange(t)[None, None, None, :] <= pos
    logits = jnp.where(mask, logits, -1e9)
    p = jax.nn.softmax(logits, axis=-1) * v_scale
    ps = jnp.clip(jnp.max(p, axis=-1, keepdims=True), 1e-8, None) / 127.0
    pi = jnp.round(p / ps)
    o = jnp.einsum("bhgt,bhtd->bhgd", pi, v_i8.astype(jnp.float32)) * ps
    o = o.astype(q.dtype)
    if bp > b:
        o = jnp.pad(o, ((0, bp - b), (0, 0), (0, 0), (0, 0)))
    return o


def decode_attention_i8(q, k_i8, k_scale, v_i8, v_scale, pos, **kw):
    if on_tpu():
        return decode_attention_i8_pallas(q, k_i8, k_scale, v_i8, v_scale,
                                          pos, **kw)
    return decode_attention_i8_ref(q, k_i8, k_scale, v_i8, v_scale, pos)


# ---------------------------------------------------------------------------
# fused MLP (norm + gate/up + act + down + residual)
# ---------------------------------------------------------------------------


def _fused_mlp_kernel(x_ref, wg_ref, wu_ref, wd_ref, ns_ref, nb_ref, o_ref,
                      xn_ref, acc_ref, *, n_j: int, eps: float, act: str,
                      residual: bool = True, has_norm: bool = True,
                      norm_type: str = "rmsnorm"):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        if has_norm:
            xf = _norm_f32(xf, ns_ref[:], nb_ref[:], eps, norm_type)
        xn_ref[:] = xf.astype(xn_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gate = jnp.dot(xn_ref[:], wg_ref[:], preferred_element_type=jnp.float32)
    up = jnp.dot(xn_ref[:], wu_ref[:], preferred_element_type=jnp.float32)
    a = (jax.nn.silu(gate) if act == "silu"
         else jax.nn.gelu(gate, approximate=True)) * up
    acc_ref[:] += jnp.dot(a.astype(x_ref.dtype), wd_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(j == n_j - 1)
    def _():
        y = acc_ref[:]
        if residual:
            y = y + x_ref[:].astype(jnp.float32)
        o_ref[:] = y.astype(o_ref.dtype)


def _fused_mlp_i8_kernel(x_ref, wg_ref, wu_ref, wd_ref, wsg_ref, wsu_ref,
                         wsd_ref, scl_ref, ns_ref, nb_ref, o_ref, xi_ref,
                         acc_ref, *, n_j: int, eps: float, act: str,
                         residual: bool = True, has_norm: bool = True,
                         norm_type: str = "rmsnorm"):
    j = pl.program_id(0)
    s_in, s_mid = scl_ref[0], scl_ref[1]

    @pl.when(j == 0)
    def _():
        xn = x_ref[:].astype(jnp.float32)
        if has_norm:
            xn = _norm_f32(xn, ns_ref[:], nb_ref[:], eps, norm_type)
        xi_ref[:] = jnp.clip(jnp.round(xn * (1.0 / s_in)),
                             -127, 127).astype(jnp.int8)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def i8dot(w_ref, ws_ref):
        acc = jax.lax.dot_general(
            xi_ref[:], w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (s_in * ws_ref[:])

    gate = i8dot(wg_ref, wsg_ref)
    up = i8dot(wu_ref, wsu_ref)
    a = (jax.nn.silu(gate) if act == "silu"
         else jax.nn.gelu(gate, approximate=True)) * up
    ai = jnp.clip(jnp.round(a * (1.0 / s_mid)), -127, 127).astype(jnp.int8)
    pd = jax.lax.dot_general(
        ai, wd_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc_ref[:] += pd.astype(jnp.float32) * (s_mid * wsd_ref[:])

    @pl.when(j == n_j - 1)
    def _():
        y = acc_ref[:]
        if residual:
            y = y + x_ref[:].astype(jnp.float32)
        o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "act", "block_j", "out_dtype", "residual",
                     "norm_type", "interpret"))
def fused_mlp_decode_pallas(x, w_gate, w_up, w_down, norm_scale,
                            eps: float = 1e-6, act: str = "silu",
                            block_j: int = 256, out_dtype=None,
                            residual: bool = True, norm_bias=None,
                            norm_type: str = "rmsnorm",
                            interpret: bool = False):
    """x (B, K) -> x + down(act(gate(n)) * up(n)), n = rmsnorm(x).

    Grid streams inner-dim blocks of all three weights; the (B, I)
    hidden never leaves VMEM.  w_gate/w_up (K, I), w_down (I, K).
    residual=False returns just the MLP output (tensor-parallel
    row-split partials psum outside and add the residual once)."""
    b, k = x.shape
    inner = w_gate.shape[1]
    assert w_up.shape == (k, inner) and w_down.shape == (inner, k)
    out_dtype = out_dtype or x.dtype
    bj = _pick_block(inner, block_j)
    bp = _round_up(b, 8)
    xp = jnp.pad(x, ((0, bp - b), (0, 0))) if bp != b else x
    n_j = inner // bj
    has_norm = norm_scale is not None
    ns = (norm_scale.reshape(1, k).astype(jnp.float32) if has_norm
          else jnp.ones((1, k), jnp.float32))
    nb = (norm_bias.reshape(1, k).astype(jnp.float32)
          if norm_bias is not None else jnp.zeros((1, k), jnp.float32))

    out = pl.pallas_call(
        functools.partial(_fused_mlp_kernel, n_j=n_j, eps=eps, act=act,
                          residual=residual, has_norm=has_norm,
                          norm_type=norm_type),
        grid=(n_j,),
        in_specs=[
            pl.BlockSpec((bp, k), lambda j: (0, 0)),
            pl.BlockSpec((k, bj), lambda j: (0, j)),
            pl.BlockSpec((k, bj), lambda j: (0, j)),
            pl.BlockSpec((bj, k), lambda j: (j, 0)),
            pl.BlockSpec((1, k), lambda j: (0, 0)),
            pl.BlockSpec((1, k), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bp, k), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, k), out_dtype),
        scratch_shapes=[pltpu.VMEM((bp, k), x.dtype),
                        pltpu.VMEM((bp, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xp, w_gate, w_up, w_down, ns, nb)
    return out[:b]


@functools.partial(
    jax.jit,
    static_argnames=("eps", "act", "block_j", "out_dtype", "residual",
                     "norm_type", "interpret"))
def fused_mlp_decode_i8_pallas(x, w_gate, w_up, w_down, w_scales,
                               act_scales, norm_scale, eps: float = 1e-6,
                               act: str = "silu", block_j: int = 512,
                               out_dtype=None, residual: bool = True,
                               norm_bias=None, norm_type: str = "rmsnorm",
                               interpret: bool = False):
    """int8 fused MLP.  w_* int8; w_scales = (sg (1,I), su (1,I),
    sd (1,K)); act_scales (2,) = [input scale, mid (down-input) scale],
    both static (calibrated)."""
    b, k = x.shape
    inner = w_gate.shape[1]
    out_dtype = out_dtype or x.dtype
    bj = _pick_block(inner, block_j)
    bp = _round_up(b, 8)
    xp = jnp.pad(x, ((0, bp - b), (0, 0))) if bp != b else x
    n_j = inner // bj
    has_norm = norm_scale is not None
    ns = (norm_scale.reshape(1, k).astype(jnp.float32) if has_norm
          else jnp.ones((1, k), jnp.float32))
    nb = (norm_bias.reshape(1, k).astype(jnp.float32)
          if norm_bias is not None else jnp.zeros((1, k), jnp.float32))
    sg, su, sd = w_scales

    out = pl.pallas_call(
        functools.partial(_fused_mlp_i8_kernel, n_j=n_j, eps=eps, act=act,
                          residual=residual, has_norm=has_norm,
                          norm_type=norm_type),
        grid=(n_j,),
        in_specs=[
            pl.BlockSpec((bp, k), lambda j: (0, 0)),
            pl.BlockSpec((k, bj), lambda j: (0, j)),
            pl.BlockSpec((k, bj), lambda j: (0, j)),
            pl.BlockSpec((bj, k), lambda j: (j, 0)),
            pl.BlockSpec((1, bj), lambda j: (0, j)),
            pl.BlockSpec((1, bj), lambda j: (0, j)),
            pl.BlockSpec((1, k), lambda j: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, k), lambda j: (0, 0)),
            pl.BlockSpec((1, k), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bp, k), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, k), out_dtype),
        scratch_shapes=[pltpu.VMEM((bp, k), jnp.int8),
                        pltpu.VMEM((bp, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xp, w_gate, w_up, w_down, sg, su, sd,
      act_scales.astype(jnp.float32), ns, nb)
    return out[:b]


def fused_mlp_decode_ref(x, w_gate, w_up, w_down, norm_scale,
                         eps: float = 1e-6, act: str = "silu",
                         out_dtype=None, residual: bool = True,
                         norm_bias=None, norm_type: str = "rmsnorm"):
    xf = x.astype(jnp.float32)
    if norm_scale is not None:
        nb = (norm_bias.astype(jnp.float32) if norm_bias is not None
              else 0.0)
        xn = _norm_f32(xf, norm_scale.astype(jnp.float32), nb, eps,
                       norm_type)
    else:
        xn = xf
    xn = xn.astype(x.dtype).astype(jnp.float32)
    gate = xn @ w_gate.astype(jnp.float32)
    up = xn @ w_up.astype(jnp.float32)
    a = (jax.nn.silu(gate) if act == "silu"
         else jax.nn.gelu(gate, approximate=True)) * up
    y = a.astype(x.dtype).astype(jnp.float32) @ w_down.astype(jnp.float32)
    if residual:
        y = y + xf
    return y.astype(out_dtype or x.dtype)


def fused_mlp_decode_i8_ref(x, w_gate, w_up, w_down, w_scales, act_scales,
                            norm_scale, eps: float = 1e-6, act: str = "silu",
                            out_dtype=None, residual: bool = True,
                            norm_bias=None, norm_type: str = "rmsnorm"):
    xf = x.astype(jnp.float32)
    if norm_scale is not None:
        nb = (norm_bias.astype(jnp.float32) if norm_bias is not None
              else 0.0)
        xn = _norm_f32(xf, norm_scale.astype(jnp.float32), nb, eps,
                       norm_type)
    else:
        xn = xf
    s_in = act_scales.astype(jnp.float32)[0]
    s_mid = act_scales.astype(jnp.float32)[1]
    sg, su, sd = [s.astype(jnp.float32) for s in w_scales]
    xi = jnp.clip(jnp.round(xn / s_in), -127, 127).astype(jnp.int32)
    gate = (xi @ w_gate.astype(jnp.int32)).astype(jnp.float32) * (s_in * sg)
    up = (xi @ w_up.astype(jnp.int32)).astype(jnp.float32) * (s_in * su)
    a = (jax.nn.silu(gate) if act == "silu"
         else jax.nn.gelu(gate, approximate=True)) * up
    ai = jnp.clip(jnp.round(a / s_mid), -127, 127).astype(jnp.int32)
    y = (ai @ w_down.astype(jnp.int32)).astype(jnp.float32) * (s_mid * sd)
    if residual:
        y = y + xf
    return y.astype(out_dtype or x.dtype)


def fused_mlp_decode(x, w_gate, w_up, w_down, norm_scale, eps: float = 1e-6,
                     act: str = "silu", residual: bool = True, **kw):
    if on_tpu():
        return fused_mlp_decode_pallas(x, w_gate, w_up, w_down, norm_scale,
                                       eps=eps, act=act, residual=residual,
                                       **kw)
    return fused_mlp_decode_ref(x, w_gate, w_up, w_down, norm_scale,
                                eps=eps, act=act, residual=residual,
                                **{k: v for k, v in kw.items()
                                   if k not in ("block_j", "interpret")})


def fused_mlp_decode_i8(x, w_gate, w_up, w_down, w_scales, act_scales,
                        norm_scale, eps: float = 1e-6, act: str = "silu",
                        residual: bool = True, **kw):
    if on_tpu():
        return fused_mlp_decode_i8_pallas(x, w_gate, w_up, w_down, w_scales,
                                          act_scales, norm_scale, eps=eps,
                                          act=act, residual=residual, **kw)
    return fused_mlp_decode_i8_ref(x, w_gate, w_up, w_down, w_scales,
                                   act_scales, norm_scale, eps=eps, act=act,
                                   residual=residual,
                                   **{k: v for k, v in kw.items()
                                      if k not in ("block_j", "interpret")})

# ---------------------------------------------------------------------------
# int4 (w4a8): planar nibble packing, group-scaled int8-MXU kernels
# ---------------------------------------------------------------------------
#
# Weight bytes are the decode bottleneck once the step runs on
# megakernels (MLP streams at ~95% of the int8 HBM roofline,
# BENCH_NOTES round 3) — int4 storage halves them again.  Layout is
# chosen so the in-kernel unpack needs NO relayout (reshapes across
# sublanes are Mosaic relayouts; two dots are free):
#
#   planar packing: byte row r of the packed (K/2, N) array carries
#   original row r in its LOW nibble and row r + K/2 in its HIGH
#   nibble.  Unpack = two arithmetic shifts; the contraction becomes
#   x[:, :K/2] @ lo + x[:, K/2:] @ hi.
#
# For a weight whose contraction dim is STREAMED over the grid
# (w_down), packing is per grid block (block=bj), so each program
# unpacks only rows it owns — every byte is read exactly once.
#
# Scales are per (group-of-K, out-channel), group_size=128 by default
# (the reference's W4 group quantization, quantize/fake_quant.py:21-84
# / utils/packing_utils.py:87-102, as a TPU kernel).  Groups never
# straddle the planar boundary (K/2 % group == 0 asserted).


def quantize_int4_group(w, group: int = 128):
    """(K, N) float -> int4-valued int8 in [-7, 7] + scales (K/g, N)."""
    k, n = w.shape
    assert k % group == 0, (k, group)
    wg = w.astype(jnp.float32).reshape(k // group, group, n)
    s = jnp.clip(jnp.max(jnp.abs(wg), axis=1), 1e-8, None) / 7.0
    q = jnp.clip(jnp.round(wg / s[:, None, :]), -7, 7).astype(jnp.int8)
    return q.reshape(k, n), s


def pack_int4_planar(wq, block: int = 0):
    """Pack int4-valued int8 (K, N) -> bytes (K/2, N).

    block=0: global planar split at K/2 (contraction fully resident
    per grid step: qkv / o / gate / up).  block=bj: planar split
    within each bj-row block (contraction streamed over the grid:
    w_down)."""
    k, n = wq.shape
    b = block or k
    assert k % b == 0 and b % 2 == 0, (k, b)
    w3 = wq.reshape(k // b, b, n)
    lo = w3[:, : b // 2]
    hi = w3[:, b // 2:]
    return ((hi << 4) | (lo & 0xF)).astype(jnp.int8).reshape(k // 2, n)


def unpack_int4_planar(packed, block: int = 0):
    """Inverse of pack_int4_planar (jnp reference)."""
    k2, n = packed.shape
    b2 = (block // 2) if block else k2
    p3 = packed.reshape(k2 // b2, b2, n)
    lo = jnp.left_shift(p3, 4) >> 4
    hi = p3 >> 4
    return jnp.concatenate([lo, hi], axis=1).reshape(2 * k2, n)


def _nibbles(wp):
    """In-kernel unpack: packed int8 block -> (lo, hi) int8.

    Shifts run in int32: Mosaic cannot legalize arith.shli on int8
    vectors (proven on-chip, r3g — the int8 (8,128,4)-tiled register
    has no vector shift), while int32 shifts are the same pattern the
    exactness-verified quant_matmul kernels use."""
    w32 = wp.astype(jnp.int32)
    lo = ((w32 << 28) >> 28).astype(jnp.int8)   # sign-extended low nibble
    hi = (w32 >> 4).astype(jnp.int8)            # arithmetic: high nibble
    return lo, hi


def _i4_group_dot(xi, wp, ws_ref, s_in, group: int, row0=0):
    """xi (bp, k) int8 = quantized activation; wp (k/2, bn) packed
    bytes; ws_ref f32 group scales, rows [row0, row0 + k//group) of it
    belong to this block (row0 is dynamic when the scale array is
    loaded whole — Mosaic requires scale blocks be sublane-aligned or
    full, and per-grid-block slices of a (I/g, K) array are neither).
    Returns f32 (bp, bn) = dequantized xi @ w * s_in."""
    half = wp.shape[0]
    k = 2 * half
    assert half % group == 0, (half, group)
    gpp = half // group                      # groups per plane
    lo, hi = _nibbles(wp[:])
    y = None
    for plane, w in ((0, lo), (1, hi)):
        for gi in range(gpp):
            r0 = gi * group
            xs = xi[:, plane * half + r0: plane * half + r0 + group]
            acc = jax.lax.dot_general(
                xs, w[r0: r0 + group],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            c = acc.astype(jnp.float32) * ws_ref[
                pl.ds(row0 + plane * gpp + gi, 1)]
            y = c if y is None else y + c
    return y * s_in


def _fused_dense_i4_kernel(x_ref, wp_ref, ws_ref, as_ref, ns_ref, r_ref,
                           cos_ref, sin_ref, o_ref, xi_ref, *,
                           has_norm: bool, has_residual: bool,
                           has_rope: bool, head_dim: int, eps: float,
                           group: int):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        if has_norm:
            xf = _rmsnorm_f32(xf, ns_ref[:], eps)
        inv = 1.0 / as_ref[0]
        xi_ref[:] = jnp.clip(jnp.round(xf * inv), -127, 127).astype(jnp.int8)

    y = _i4_group_dot(xi_ref[:], wp_ref, ws_ref, as_ref[0], group)
    if has_rope:
        y = _rope_epilogue(y, cos_ref, sin_ref, head_dim)
    if has_residual:
        y = y + r_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "block_n", "out_dtype", "head_dim", "group",
                     "interpret"))
def fused_dense_decode_i4_pallas(x, w_p, w_scale, act_scale,
                                 norm_scale=None, residual=None,
                                 rope_cos=None, rope_sin=None,
                                 head_dim: int = 0, eps: float = 1e-6,
                                 block_n: int = 512, group: int = 128,
                                 out_dtype=None, interpret: bool = False):
    """int4 fused_dense: w_p (K/2, N) planar-packed bytes
    (pack_int4_planar, block=0), w_scale (K/group, N) f32, static act
    scale (1,)."""
    b, k = x.shape
    k2, n = w_p.shape
    ng = k // group
    assert k2 * 2 == k and w_scale.shape == (ng, n), (w_p.shape,
                                                      w_scale.shape)
    assert (k // 2) % group == 0, (k, group)
    out_dtype = out_dtype or x.dtype
    bn = _pick_block(n, block_n)
    bp = _round_up(b, 8)
    xp = jnp.pad(x, ((0, bp - b), (0, 0))) if bp != b else x
    has_norm = norm_scale is not None
    has_res = residual is not None
    has_rope = rope_cos is not None
    if has_rope:
        assert head_dim > 0 and bn % head_dim == 0, (bn, head_dim)
    ns = (norm_scale.reshape(1, k).astype(jnp.float32) if has_norm
          else jnp.ones((1, k), jnp.float32))
    rp = residual if has_res else jnp.zeros((1, n), out_dtype)
    if has_res and bp != b:
        rp = jnp.pad(rp, ((0, bp - b), (0, 0)))
    cosv = (rope_cos.reshape(1, n).astype(jnp.float32) if has_rope
            else jnp.ones((1, 1), jnp.float32))
    sinv = (rope_sin.reshape(1, n).astype(jnp.float32) if has_rope
            else jnp.zeros((1, 1), jnp.float32))
    trig_spec = (pl.BlockSpec((1, bn), lambda j: (0, j)) if has_rope
                 else pl.BlockSpec((1, 1), lambda j: (0, 0)))

    out = pl.pallas_call(
        functools.partial(_fused_dense_i4_kernel, has_norm=has_norm,
                          has_residual=has_res, has_rope=has_rope,
                          head_dim=head_dim, eps=eps, group=group),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bp, k), lambda j: (0, 0)),
            pl.BlockSpec((k2, bn), lambda j: (0, j)),
            pl.BlockSpec((ng, bn), lambda j: (0, j)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, k), lambda j: (0, 0)),
            (pl.BlockSpec((bp, bn), lambda j: (0, j)) if has_res
             else pl.BlockSpec((1, n), lambda j: (0, 0))),
            trig_spec,
            trig_spec,
        ],
        out_specs=pl.BlockSpec((bp, bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((bp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bp, k), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xp, w_p, w_scale.astype(jnp.float32),
      act_scale.astype(jnp.float32), ns, rp, cosv, sinv)
    return out[:b]


def _fused_mlp_i4_kernel(x_ref, wgp_ref, wup_ref, wdp_ref, wsg_ref, wsu_ref,
                         wsd_ref, scl_ref, ns_ref, o_ref, xi_ref, acc_ref, *,
                         n_j: int, eps: float, act: str, group: int,
                         bj: int, residual: bool = True,
                         has_norm: bool = True):
    j = pl.program_id(0)
    s_in, s_mid = scl_ref[0], scl_ref[1]

    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        xn = _rmsnorm_f32(xf, ns_ref[:], eps) if has_norm else xf
        xi_ref[:] = jnp.clip(jnp.round(xn * (1.0 / s_in)),
                             -127, 127).astype(jnp.int8)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gate = _i4_group_dot(xi_ref[:], wgp_ref, wsg_ref, s_in, group)
    up = _i4_group_dot(xi_ref[:], wup_ref, wsu_ref, s_in, group)
    a = (jax.nn.silu(gate) if act == "silu"
         else jax.nn.gelu(gate, approximate=True)) * up
    ai = jnp.clip(jnp.round(a * (1.0 / s_mid)), -127, 127).astype(jnp.int8)
    # w_down block: packed per-block planar (bj/2, k); ai columns are
    # this block's inner rows, so the same two-plane group dot applies.
    # wsd rides along WHOLE ((I/g, K) is tiny) — its per-block row
    # slices are not sublane-aligned, so the block's rows are selected
    # dynamically instead
    acc_ref[:] += _i4_group_dot(ai, wdp_ref, wsd_ref, s_mid, group,
                                row0=j * (bj // group))

    @pl.when(j == n_j - 1)
    def _():
        y = acc_ref[:]
        if residual:
            y = y + x_ref[:].astype(jnp.float32)
        o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "act", "block_j", "group", "out_dtype",
                     "residual", "interpret"))
def fused_mlp_decode_i4_pallas(x, wg_p, wu_p, wd_p, w_scales, act_scales,
                               norm_scale, eps: float = 1e-6,
                               act: str = "silu", block_j: int = 512,
                               group: int = 128, out_dtype=None,
                               residual: bool = True,
                               interpret: bool = False):
    """int4 fused MLP.  wg_p/wu_p (K/2, I) planar-packed (block=0);
    wd_p (I/2, K) packed with block=bj (pack_int4_planar(wd_q, bj) for
    bj = the block_j this call uses — mlp_i4_block(inner, block_j)).
    w_scales = (sg (K/g, I), su (K/g, I), sd (I/g, K)); act_scales (2,)
    static [input, mid]."""
    b, k = x.shape
    inner = wg_p.shape[1]
    out_dtype = out_dtype or x.dtype
    bj = _pick_block(inner, block_j)
    assert (bj // 2) % group == 0, (bj, group)
    assert (k // 2) % group == 0, (k, group)
    bp = _round_up(b, 8)
    xp = jnp.pad(x, ((0, bp - b), (0, 0))) if bp != b else x
    n_j = inner // bj
    has_norm = norm_scale is not None
    ns = (norm_scale.reshape(1, k).astype(jnp.float32) if has_norm
          else jnp.ones((1, k), jnp.float32))
    sg, su, sd = [s.astype(jnp.float32) for s in w_scales]
    ngk = k // group

    out = pl.pallas_call(
        functools.partial(_fused_mlp_i4_kernel, n_j=n_j, eps=eps, act=act,
                          group=group, bj=bj, residual=residual,
                          has_norm=has_norm),
        grid=(n_j,),
        in_specs=[
            pl.BlockSpec((bp, k), lambda j: (0, 0)),
            pl.BlockSpec((k // 2, bj), lambda j: (0, j)),
            pl.BlockSpec((k // 2, bj), lambda j: (0, j)),
            pl.BlockSpec((bj // 2, k), lambda j: (j, 0)),
            pl.BlockSpec((ngk, bj), lambda j: (0, j)),
            pl.BlockSpec((ngk, bj), lambda j: (0, j)),
            pl.BlockSpec((inner // group, k), lambda j: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, k), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bp, k), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, k), out_dtype),
        scratch_shapes=[pltpu.VMEM((bp, k), jnp.int8),
                        pltpu.VMEM((bp, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xp, wg_p, wu_p, wd_p, sg, su, sd,
      act_scales.astype(jnp.float32), ns)
    return out[:b]


def _pick_block_i4(inner: int, pref: int) -> int:
    """Inner-dim block for the i4 MLP path.  Tiny (test-sized) local
    dims — e.g. a tensor-parallel shard of a unit-test model — can sit
    below the 128-lane granule; those only ever run through the jnp
    ref path, where the whole dim as one block is always valid."""
    if inner % LANE:
        return inner
    return _pick_block(inner, pref)


def mlp_i4_block(inner: int, block_j: int = 512) -> int:
    """The inner-dim block the i4 MLP kernel will use — w_down must be
    packed with exactly this block (pack_int4_planar(wd_q, block))."""
    return _pick_block_i4(inner, block_j)


def _dequant_i4(w_p, w_scale, group: int, block: int = 0):
    wq = unpack_int4_planar(w_p, block=block).astype(jnp.float32)
    k, n = wq.shape
    s = jnp.repeat(w_scale.astype(jnp.float32), group, axis=0)
    return wq * s


def fused_dense_decode_i4_ref(x, w_p, w_scale, act_scale, norm_scale=None,
                              residual=None, rope_cos=None, rope_sin=None,
                              head_dim: int = 0, eps: float = 1e-6,
                              group: int = 128, out_dtype=None):
    xf = x.astype(jnp.float32)
    if norm_scale is not None:
        xf = _rmsnorm_f32(xf, norm_scale.astype(jnp.float32), eps)
    s = act_scale.astype(jnp.float32)[0]
    xi = jnp.clip(jnp.round(xf / s), -127, 127)
    wq = unpack_int4_planar(w_p).astype(jnp.float32)
    k = wq.shape[0]
    acc = (xi.reshape(x.shape[0], k // group, group).transpose(1, 0, 2)
           @ wq.reshape(k // group, group, -1))      # (ng, B, N)
    y = jnp.sum(acc * w_scale.astype(jnp.float32)[:, None, :], axis=0) * s
    if rope_cos is not None:
        y = _rope_ref(y, rope_cos, rope_sin, head_dim)
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y.astype(out_dtype or x.dtype)


def fused_mlp_decode_i4_ref(x, wg_p, wu_p, wd_p, w_scales, act_scales,
                            norm_scale, eps: float = 1e-6, act: str = "silu",
                            block_j: int = 512, group: int = 128,
                            out_dtype=None, residual: bool = True):
    xf = x.astype(jnp.float32)
    xn = (_rmsnorm_f32(xf, norm_scale.astype(jnp.float32), eps)
          if norm_scale is not None else xf)
    s_in = act_scales.astype(jnp.float32)[0]
    s_mid = act_scales.astype(jnp.float32)[1]
    sg, su, sd = w_scales
    inner = wg_p.shape[1]
    bj = _pick_block_i4(inner, block_j)
    xi = jnp.clip(jnp.round(xn / s_in), -127, 127)
    gate = (xi @ _dequant_i4(wg_p, sg, group)) * s_in
    up = (xi @ _dequant_i4(wu_p, su, group)) * s_in
    a = (jax.nn.silu(gate) if act == "silu"
         else jax.nn.gelu(gate, approximate=True)) * up
    ai = jnp.clip(jnp.round(a / s_mid), -127, 127)
    y = (ai @ _dequant_i4(wd_p, sd, group, block=bj)) * s_mid
    if residual:
        y = y + xf
    return y.astype(out_dtype or x.dtype)


def fused_dense_decode_i4(x, w_p, w_scale, act_scale, norm_scale=None,
                          residual=None, rope_cos=None, rope_sin=None,
                          head_dim: int = 0, eps: float = 1e-6,
                          group: int = 128, **kw):
    if on_tpu():
        return fused_dense_decode_i4_pallas(x, w_p, w_scale, act_scale,
                                            norm_scale, residual, rope_cos,
                                            rope_sin, head_dim=head_dim,
                                            eps=eps, group=group, **kw)
    return fused_dense_decode_i4_ref(x, w_p, w_scale, act_scale, norm_scale,
                                     residual, rope_cos, rope_sin,
                                     head_dim=head_dim, eps=eps, group=group,
                                     **{k: v for k, v in kw.items()
                                        if k not in ("block_n",
                                                     "interpret")})


def fused_mlp_decode_i4(x, wg_p, wu_p, wd_p, w_scales, act_scales,
                        norm_scale, eps: float = 1e-6, act: str = "silu",
                        group: int = 128, residual: bool = True, **kw):
    if on_tpu():
        return fused_mlp_decode_i4_pallas(x, wg_p, wu_p, wd_p, w_scales,
                                          act_scales, norm_scale, eps=eps,
                                          act=act, group=group,
                                          residual=residual, **kw)
    return fused_mlp_decode_i4_ref(x, wg_p, wu_p, wd_p, w_scales,
                                   act_scales, norm_scale, eps=eps, act=act,
                                   group=group, residual=residual,
                                   **{k: v for k, v in kw.items()
                                      if k != "interpret"})


# ---------------------------------------------------------------------------
# merged o_proj + residual + MLP: one fewer launch per layer
# ---------------------------------------------------------------------------
#
# The unroll probe (r3c) pinned the in-scan per-layer gap on
# inter-kernel fixed cost (~14us/launch + XLA glue), so the lever is
# fewer launches.  Merging o_proj INTO the attention kernel is
# relayout-blocked on Mosaic (the (bb*heads, d) -> (bb, heads*d)
# flatten is an unsupported sublane->lane shape cast — proven by the
# on-chip verifier, r3f).  This kernel merges on the OTHER side of the
# boundary instead: o_proj + residual + the whole MLP are all
# LANE-MAJOR (bp, features) ops, so they fuse with no relayout at all:
#
#   x2 = attn @ w_o * scales + x          (j == 0, w_o rides VMEM)
#   out = x2 + down(act(gate(n)) * up(n)), n = rmsnorm(x2)
#
# int8 variant only (the serve mode); the intermediate x2 never
# touches HBM and the per-layer launch count drops 3 -> 2.


def _fused_o_mlp_i8_kernel(attn_ref, wo_ref, wos_ref, x_ref, wg_ref,
                           wu_ref, wd_ref, wsg_ref, wsu_ref, wsd_ref,
                           scl_ref, ns_ref, o_ref, x2_ref, xi_ref, acc_ref,
                           *, n_j: int, eps: float, act: str):
    j = pl.program_id(0)
    s_ao, s_in, s_mid = scl_ref[0], scl_ref[1], scl_ref[2]

    @pl.when(j == 0)
    def _():
        ai = jnp.clip(jnp.round(attn_ref[:].astype(jnp.float32)
                                * (1.0 / s_ao)), -127, 127).astype(jnp.int8)
        acc0 = jax.lax.dot_general(
            ai, wo_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        x2 = (acc0.astype(jnp.float32) * (s_ao * wos_ref[:])
              + x_ref[:].astype(jnp.float32))
        x2_ref[:] = x2
        xn = _rmsnorm_f32(x2, ns_ref[:], eps)
        xi_ref[:] = jnp.clip(jnp.round(xn * (1.0 / s_in)),
                             -127, 127).astype(jnp.int8)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def i8dot(w_ref, ws_ref):
        acc = jax.lax.dot_general(
            xi_ref[:], w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (s_in * ws_ref[:])

    gate = i8dot(wg_ref, wsg_ref)
    up = i8dot(wu_ref, wsu_ref)
    a = (jax.nn.silu(gate) if act == "silu"
         else jax.nn.gelu(gate, approximate=True)) * up
    ai2 = jnp.clip(jnp.round(a * (1.0 / s_mid)), -127, 127).astype(jnp.int8)
    pd = jax.lax.dot_general(
        ai2, wd_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc_ref[:] += pd.astype(jnp.float32) * (s_mid * wsd_ref[:])

    @pl.when(j == n_j - 1)
    def _():
        o_ref[:] = (acc_ref[:] + x2_ref[:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "act", "block_j", "out_dtype", "interpret"))
def fused_o_mlp_decode_i8_pallas(attn, w_o_i8, wo_scale, attn_scale,
                                 residual, w_gate, w_up, w_down, w_scales,
                                 act_scales, norm_scale, eps: float = 1e-6,
                                 act: str = "silu", block_j: int = 512,
                                 out_dtype=None, interpret: bool = False):
    """o_proj + residual + fused MLP in ONE call (module docstring).

    attn (B, hd) attention output; w_o_i8 (hd, K) int8 + per-channel
    scales wo_scale (1, K); attn_scale (1,) static input scale;
    residual (B, K); MLP weights/scales as fused_mlp_decode_i8; ln2
    norm_scale (K,)."""
    b, hd = attn.shape
    kk = w_o_i8.shape[1]
    inner = w_gate.shape[1]
    assert residual.shape == (b, kk)
    assert w_up.shape == (kk, inner) and w_down.shape == (inner, kk)
    out_dtype = out_dtype or residual.dtype
    bj = _pick_block(inner, block_j)
    bp = _round_up(b, 8)
    if bp != b:
        attn = jnp.pad(attn, ((0, bp - b), (0, 0)))
        residual = jnp.pad(residual, ((0, bp - b), (0, 0)))
    n_j = inner // bj
    ns = norm_scale.reshape(1, kk).astype(jnp.float32)
    sg, su, sd = w_scales
    scl = jnp.concatenate([attn_scale.reshape(1).astype(jnp.float32),
                           act_scales.astype(jnp.float32).reshape(2)])

    out = pl.pallas_call(
        functools.partial(_fused_o_mlp_i8_kernel, n_j=n_j, eps=eps, act=act),
        grid=(n_j,),
        in_specs=[
            pl.BlockSpec((bp, hd), lambda j: (0, 0)),
            pl.BlockSpec((hd, kk), lambda j: (0, 0)),
            pl.BlockSpec((1, kk), lambda j: (0, 0)),
            pl.BlockSpec((bp, kk), lambda j: (0, 0)),
            pl.BlockSpec((kk, bj), lambda j: (0, j)),
            pl.BlockSpec((kk, bj), lambda j: (0, j)),
            pl.BlockSpec((bj, kk), lambda j: (j, 0)),
            pl.BlockSpec((1, bj), lambda j: (0, j)),
            pl.BlockSpec((1, bj), lambda j: (0, j)),
            pl.BlockSpec((1, kk), lambda j: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, kk), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bp, kk), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, kk), out_dtype),
        scratch_shapes=[pltpu.VMEM((bp, kk), jnp.float32),
                        pltpu.VMEM((bp, kk), jnp.int8),
                        pltpu.VMEM((bp, kk), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(attn, w_o_i8, wo_scale.astype(jnp.float32), residual, w_gate, w_up,
      w_down, sg, su, sd, scl, ns)
    return out[:b]


def fused_o_mlp_decode_i8_ref(attn, w_o_i8, wo_scale, attn_scale, residual,
                              w_gate, w_up, w_down, w_scales, act_scales,
                              norm_scale, eps: float = 1e-6,
                              act: str = "silu", out_dtype=None):
    x2 = fused_dense_decode_i8_ref(attn, w_o_i8, wo_scale,
                                   attn_scale.reshape(1), residual=residual,
                                   out_dtype=jnp.float32)
    return fused_mlp_decode_i8_ref(x2, w_gate, w_up, w_down, w_scales,
                                   act_scales, norm_scale, eps=eps, act=act,
                                   out_dtype=out_dtype or residual.dtype)


def fused_o_mlp_decode_i8(attn, w_o_i8, wo_scale, attn_scale, residual,
                          w_gate, w_up, w_down, w_scales, act_scales,
                          norm_scale, eps: float = 1e-6, act: str = "silu",
                          **kw):
    if on_tpu():
        return fused_o_mlp_decode_i8_pallas(
            attn, w_o_i8, wo_scale, attn_scale, residual, w_gate, w_up,
            w_down, w_scales, act_scales, norm_scale, eps=eps, act=act, **kw)
    return fused_o_mlp_decode_i8_ref(
        attn, w_o_i8, wo_scale, attn_scale, residual, w_gate, w_up, w_down,
        w_scales, act_scales, norm_scale, eps=eps, act=act)


def _fused_o_mlp_i4_kernel(attn_ref, wop_ref, wos_ref, x_ref, wgp_ref,
                           wup_ref, wdp_ref, wsg_ref, wsu_ref, wsd_ref,
                           scl_ref, ns_ref, o_ref, x2_ref, xi_ref, acc_ref,
                           *, n_j: int, eps: float, act: str, group: int,
                           bj: int):
    j = pl.program_id(0)
    s_ao, s_in, s_mid = scl_ref[0], scl_ref[1], scl_ref[2]

    @pl.when(j == 0)
    def _():
        ai = jnp.clip(jnp.round(attn_ref[:].astype(jnp.float32)
                                * (1.0 / s_ao)), -127, 127).astype(jnp.int8)
        x2 = (_i4_group_dot(ai, wop_ref, wos_ref, s_ao, group)
              + x_ref[:].astype(jnp.float32))
        x2_ref[:] = x2
        xn = _rmsnorm_f32(x2, ns_ref[:], eps)
        xi_ref[:] = jnp.clip(jnp.round(xn * (1.0 / s_in)),
                             -127, 127).astype(jnp.int8)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gate = _i4_group_dot(xi_ref[:], wgp_ref, wsg_ref, s_in, group)
    up = _i4_group_dot(xi_ref[:], wup_ref, wsu_ref, s_in, group)
    a = (jax.nn.silu(gate) if act == "silu"
         else jax.nn.gelu(gate, approximate=True)) * up
    ai2 = jnp.clip(jnp.round(a * (1.0 / s_mid)), -127, 127).astype(jnp.int8)
    acc_ref[:] += _i4_group_dot(ai2, wdp_ref, wsd_ref, s_mid, group,
                                row0=j * (bj // group))

    @pl.when(j == n_j - 1)
    def _():
        o_ref[:] = (acc_ref[:] + x2_ref[:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "act", "block_j", "group", "out_dtype",
                     "interpret"))
def fused_o_mlp_decode_i4_pallas(attn, w_o_p, wo_scale, attn_scale,
                                 residual, wg_p, wu_p, wd_p, w_scales,
                                 act_scales, norm_scale, eps: float = 1e-6,
                                 act: str = "silu", block_j: int = 512,
                                 group: int = 128, out_dtype=None,
                                 interpret: bool = False):
    """int4 variant of fused_o_mlp_decode_i8: o_proj + residual + the
    whole MLP in ONE launch, all weights planar-packed int4 with
    group scales, contractions on the int8 MXU.  The batch-1 decode
    configuration: per-launch fixed cost is the dominant engine
    overhead there (BENCH_NOTES round 3, engine bf16 = 0.88x) and the
    int4 weight stream is the bandwidth floor.

    w_o_p (hd/2, K) planar (block=0) + wo_scale (hd/g, K); MLP packs
    as fused_mlp_decode_i4_pallas (wd_p packed with block=bj);
    act_scales (2,) = [mlp input, mid]; attn_scale (1,)."""
    b, hd = attn.shape
    kk = w_o_p.shape[1]
    inner = wg_p.shape[1]
    assert residual.shape == (b, kk)
    assert (hd // 2) % group == 0, (hd, group)
    assert (kk // 2) % group == 0, (kk, group)
    out_dtype = out_dtype or residual.dtype
    bj = _pick_block_i4(inner, block_j)
    assert (bj // 2) % group == 0, (bj, group)
    bp = _round_up(b, 8)
    if bp != b:
        attn = jnp.pad(attn, ((0, bp - b), (0, 0)))
        residual = jnp.pad(residual, ((0, bp - b), (0, 0)))
    n_j = inner // bj
    ns = norm_scale.reshape(1, kk).astype(jnp.float32)
    sg, su, sd = [s.astype(jnp.float32) for s in w_scales]
    ngk = kk // group
    scl = jnp.concatenate([attn_scale.reshape(1).astype(jnp.float32),
                           act_scales.astype(jnp.float32).reshape(2)])

    out = pl.pallas_call(
        functools.partial(_fused_o_mlp_i4_kernel, n_j=n_j, eps=eps, act=act,
                          group=group, bj=bj),
        grid=(n_j,),
        in_specs=[
            pl.BlockSpec((bp, hd), lambda j: (0, 0)),
            pl.BlockSpec((hd // 2, kk), lambda j: (0, 0)),
            pl.BlockSpec((hd // group, kk), lambda j: (0, 0)),
            pl.BlockSpec((bp, kk), lambda j: (0, 0)),
            pl.BlockSpec((kk // 2, bj), lambda j: (0, j)),
            pl.BlockSpec((kk // 2, bj), lambda j: (0, j)),
            pl.BlockSpec((bj // 2, kk), lambda j: (j, 0)),
            pl.BlockSpec((ngk, bj), lambda j: (0, j)),
            pl.BlockSpec((ngk, bj), lambda j: (0, j)),
            pl.BlockSpec((inner // group, kk), lambda j: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, kk), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bp, kk), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, kk), out_dtype),
        scratch_shapes=[pltpu.VMEM((bp, kk), jnp.float32),
                        pltpu.VMEM((bp, kk), jnp.int8),
                        pltpu.VMEM((bp, kk), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(attn, w_o_p, wo_scale.astype(jnp.float32), residual, wg_p,
      wu_p, wd_p, sg, su, sd, scl, ns)
    return out[:b]


def fused_o_mlp_decode_i4_ref(attn, w_o_p, wo_scale, attn_scale, residual,
                              wg_p, wu_p, wd_p, w_scales, act_scales,
                              norm_scale, eps: float = 1e-6,
                              act: str = "silu", group: int = 128,
                              block_j: int = 512, out_dtype=None):
    x2 = fused_dense_decode_i4_ref(attn, w_o_p, wo_scale,
                                   attn_scale.reshape(1), residual=residual,
                                   group=group, out_dtype=jnp.float32)
    return fused_mlp_decode_i4_ref(x2, wg_p, wu_p, wd_p, w_scales,
                                   act_scales, norm_scale, eps=eps, act=act,
                                   group=group, block_j=block_j,
                                   out_dtype=out_dtype or residual.dtype)


def fused_o_mlp_decode_i4(attn, w_o_p, wo_scale, attn_scale, residual,
                          wg_p, wu_p, wd_p, w_scales, act_scales,
                          norm_scale, eps: float = 1e-6, act: str = "silu",
                          group: int = 128, **kw):
    if on_tpu():
        return fused_o_mlp_decode_i4_pallas(
            attn, w_o_p, wo_scale, attn_scale, residual, wg_p, wu_p, wd_p,
            w_scales, act_scales, norm_scale, eps=eps, act=act, group=group,
            **kw)
    return fused_o_mlp_decode_i4_ref(
        attn, w_o_p, wo_scale, attn_scale, residual, wg_p, wu_p, wd_p,
        w_scales, act_scales, norm_scale, eps=eps, act=act, group=group,
        **{k: v for k, v in kw.items() if k != "interpret"})


# ---------------------------------------------------------------------------
# stacked-expert MoE MLP, int4: one launch for ALL experts + routing
# ---------------------------------------------------------------------------


def _fused_moe_mlp_i4_kernel(xn_ref, rw_ref, w1_ref, w3_ref, w2_ref,
                             s1_ref, s3_ref, s2_ref, scl_ref, o_ref,
                             xi_ref, acc_ref, *, n_e: int, n_j: int,
                             act: str, group: int, bj: int,
                             k_groups: int, i_groups: int):
    e = pl.program_id(0)
    j = pl.program_id(1)
    s_in = scl_ref[0]

    @pl.when((e == 0) & (j == 0))
    def _():
        xf = xn_ref[:].astype(jnp.float32)
        xi_ref[:] = jnp.clip(jnp.round(xf * (1.0 / s_in)),
                             -127, 127).astype(jnp.int8)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # scale stacks ride WHOLE (per-expert row blocks are not always
    # 8-row-aligned — Mosaic block rule); this expert's rows start at
    # e * groups-per-expert
    gate = _i4_group_dot(xi_ref[:], w1_ref, s1_ref, s_in, group,
                         row0=e * k_groups)
    up = _i4_group_dot(xi_ref[:], w3_ref, s3_ref, s_in, group,
                       row0=e * k_groups)
    a = (jax.nn.silu(gate) if act == "silu"
         else jax.nn.gelu(gate, approximate=True)) * up
    s_mid = scl_ref[1 + e]                       # per-expert mid scale
    ai = jnp.clip(jnp.round(a * (1.0 / s_mid)), -127, 127).astype(jnp.int8)
    y = _i4_group_dot(ai, w2_ref, s2_ref, s_mid, group,
                      row0=e * i_groups + j * (bj // group))
    # routing combine in-kernel: this expert's contribution is gated
    # by its per-token route weight (dense-exact top-k, 0 for
    # unpicked).  rw rides whole (a width-1 lane block is not
    # Mosaic-legal); one-hot select column e
    rw = rw_ref[:]
    route = jnp.sum(jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, rw.shape, 1) == e, rw, 0.0),
        axis=1, keepdims=True)
    acc_ref[:] += y * route

    @pl.when((e == n_e - 1) & (j == n_j - 1))
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def fused_moe_mlp_decode_i4_pallas(xn, route_w, w1_p, w3_p, w2_p,
                                   s1, s3, s2, act_scales,
                                   act: str = "silu", block_j: int = 512,
                                   group: int = 128, out_dtype=None,
                                   interpret: bool = False):
    """Stacked-expert int4 MoE MLP + routing combine, ONE pallas call.

    xn (B, K): the pre-normed block input (ln2 runs XLA-side with the
    router, which needs the same normed activations).  route_w (B, E)
    f32: dense-exact top-k weights (0 on unpicked experts).  Weight
    stacks reshaped 2D so every block spec stays rank-2:
    w1_p/w3_p (E*K/2, I) planar bytes (per-expert pack, block=0),
    w2_p (E*I/2, K) (per-expert pack, block=bj);
    s1/s3 (E*K/g, I), s2 (E*I/g, K) f32 group scales;
    act_scales (1+E,) = [shared expert-input scale, per-expert mid].
    Returns (B, K) f32 MoE output (no residual — XLA adds it).

    Grid (E, n_j): each step streams one expert's inner block through
    VMEM; the int4 weight stream is HALF the int8 stacked-einsum
    path's — and at serve batch sizes MoE decode reads every expert,
    so weights dominate the step.  Counterpart of the reference's
    fused moe modules (awq/modules/fused/moe.py)."""
    b, k = xn.shape
    n_e = act_scales.shape[0] - 1
    inner = w1_p.shape[1]
    assert w1_p.shape[0] == n_e * (k // 2), (w1_p.shape, n_e, k)
    out_dtype = out_dtype or jnp.float32
    bj = _pick_block_i4(inner, block_j)
    assert (bj // 2) % group == 0 or inner % LANE, (bj, group)
    assert (k // 2) % group == 0, (k, group)
    bp = _round_up(b, 8)
    if bp != b:
        xn = jnp.pad(xn, ((0, bp - b), (0, 0)))
        route_w = jnp.pad(route_w, ((0, bp - b), (0, 0)))
    n_j = inner // bj
    ngk = k // group

    out = pl.pallas_call(
        functools.partial(_fused_moe_mlp_i4_kernel, n_e=n_e, n_j=n_j,
                          act=act, group=group, bj=bj, k_groups=ngk,
                          i_groups=inner // group),
        grid=(n_e, n_j),
        in_specs=[
            pl.BlockSpec((bp, k), lambda e, j: (0, 0)),
            pl.BlockSpec((bp, n_e), lambda e, j: (0, 0)),
            pl.BlockSpec((k // 2, bj), lambda e, j: (e, j)),
            pl.BlockSpec((k // 2, bj), lambda e, j: (e, j)),
            pl.BlockSpec((bj // 2, k), lambda e, j: (e * n_j + j, 0)),
            pl.BlockSpec((n_e * ngk, bj), lambda e, j: (0, j)),
            pl.BlockSpec((n_e * ngk, bj), lambda e, j: (0, j)),
            pl.BlockSpec((n_e * (inner // group), k), lambda e, j: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bp, k), lambda e, j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, k), out_dtype),
        scratch_shapes=[pltpu.VMEM((bp, k), jnp.int8),
                        pltpu.VMEM((bp, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(xn, route_w.astype(jnp.float32), w1_p, w3_p, w2_p,
      s1.astype(jnp.float32), s3.astype(jnp.float32),
      s2.astype(jnp.float32), act_scales.astype(jnp.float32))
    return out[:b]


def fused_moe_mlp_decode_i4_ref(xn, route_w, w1_p, w3_p, w2_p, s1, s3, s2,
                                act_scales, act: str = "silu",
                                block_j: int = 512, group: int = 128,
                                out_dtype=None):
    """jnp reference (CPU path): per-expert int4 dequant + the same
    static-scale int8-valued arithmetic, routing-combined."""
    b, k = xn.shape
    n_e = act_scales.shape[0] - 1
    inner = w1_p.shape[1]
    bj = _pick_block_i4(inner, block_j)
    s_in = act_scales.astype(jnp.float32)[0]
    xf = xn.astype(jnp.float32)
    xi = jnp.clip(jnp.round(xf / s_in), -127, 127)
    out = jnp.zeros((b, k), jnp.float32)
    kh, ih = k // 2, inner // 2
    ngk, ngi = k // group, inner // group
    actf = (jax.nn.silu if act == "silu"
            else functools.partial(jax.nn.gelu, approximate=True))
    for e in range(n_e):
        W1 = _dequant_i4(w1_p[e * kh:(e + 1) * kh],
                         s1[e * ngk:(e + 1) * ngk], group)
        W3 = _dequant_i4(w3_p[e * kh:(e + 1) * kh],
                         s3[e * ngk:(e + 1) * ngk], group)
        W2 = _dequant_i4(w2_p[e * ih:(e + 1) * ih],
                         s2[e * ngi:(e + 1) * ngi], group, block=bj)
        gate = (xi @ W1) * s_in
        up = (xi @ W3) * s_in
        a = actf(gate) * up
        s_mid = act_scales.astype(jnp.float32)[1 + e]
        ai = jnp.clip(jnp.round(a / s_mid), -127, 127)
        y = (ai @ W2) * s_mid
        out = out + y * route_w.astype(jnp.float32)[:, e:e + 1]
    return out.astype(out_dtype or jnp.float32)


def fused_moe_mlp_decode_i4(xn, route_w, w1_p, w3_p, w2_p, s1, s3, s2,
                            act_scales, act: str = "silu",
                            group: int = 128, **kw):
    if on_tpu():
        return fused_moe_mlp_decode_i4_pallas(xn, route_w, w1_p, w3_p,
                                              w2_p, s1, s3, s2, act_scales,
                                              act=act, group=group, **kw)
    return fused_moe_mlp_decode_i4_ref(xn, route_w, w1_p, w3_p, w2_p,
                                       s1, s3, s2, act_scales, act=act,
                                       group=group,
                                       **{k2: v for k2, v in kw.items()
                                          if k2 != "interpret"})


def pack_moe_expert_i4(W, group: int, block: int = 0):
    """Stacked expert weights (E, K, N) -> (packed (E*K/2, N) bytes,
    scales (E*K/g, N)) — per-expert planar packs reshaped 2D so the
    MoE kernel's block specs stay rank-2."""
    e, k, n = W.shape
    packs, scs = [], []
    for i in range(e):
        q, s = quantize_int4_group(W[i], group)
        packs.append(pack_int4_planar(q, block=block))
        scs.append(s)
    return jnp.concatenate(packs, axis=0), jnp.concatenate(scs, axis=0)
