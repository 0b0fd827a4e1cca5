"""Quantized matmul kernels (Pallas/TPU) + pure-JAX references.

TPU-native replacement for the reference's CUDA kernel zoo
(awq_ext W4A16 GEMM/GEMV, WQLinear_{GEMM,GEMV,Marlin,Exllama}; see
SURVEY.md §2b / reference models/base.py:1494-1515).  One canonical
packing and two kernels:

* ``w8a8_matmul``  — int8 x int8 MXU matmul with per-token activation
  scales and per-channel weight scales (SmoothQuant serving path).
* ``w4a16_matmul`` — bf16 activations x int4-packed weights, unpacked
  and dequantized in-kernel from HBM-resident packed buffers (AWQ
  serving path).

Both have jnp reference implementations (``*_ref``) used for numerics
tests and as the CPU fallback.

Kernel weight layout
--------------------
Weights are (K, N) = (in_features, out_features).  Int4 codes are packed
8-per-int32 **block-strided**: within each K-block of ``PACK_BLOCK_K``
rows, nibble ``j`` of word ``w`` holds code row ``j * (block/8) + w``.
This makes the in-kernel unpack a fixed sequence of 8 shift+mask ops and
one sublane concatenation — no cross-lane shuffles.  ``scales``/``zeros``
are (K/G, N) float32.  K and N are zero-padded to tile multiples at
quantize time (padded rows dequantize to exactly 0); M is padded per
call.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
PACK_BLOCK_K = 128  # K-rows per packing block == kernel block_k


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def align_group_size(k: int, gs: int, block_k: int = PACK_BLOCK_K) -> int:
    """Shrink gs (by the reference's 32-step) until group boundaries
    align with the kernel's K-blocks (block % gs == 0 or gs % block == 0)
    while still dividing k — e.g. gs=96 with 128-row blocks would put a
    group boundary mid-block and pick up the wrong scale row."""
    g = gs
    while g > 0 and not ((block_k % g == 0 or g % block_k == 0)
                         and k % g == 0):
        g -= 32
    return g if g > 0 else k


def _pick_block(n: int, pref: int, mult: int = LANE) -> int:
    """Largest multiple of `mult` that divides n and is <= pref."""
    b = min(pref, n)
    b -= b % mult
    b = max(b, mult)
    while n % b:
        b -= mult
        if b <= 0:
            raise ValueError(
                f"no multiple of {mult} divides {n} — pad the dimension "
                f"to a lane multiple (TPU kernels block in {mult}-lane "
                f"granules)")
    return b


# ---------------------------------------------------------------------------
# kernel-layout packing (quantize-time)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("block_k", "bits"))
def pack_rows_strided(codes, block_k: int = PACK_BLOCK_K, bits: int = 4):
    """Pack unsigned codes (K, N) -> (K*bits/32, N) int32, block-strided.

    Within each K-block: word w holds codes[j * W + w] at bit-slot j,
    W = block_k * bits / 32."""
    epw = 32 // bits
    k, n = codes.shape
    assert k % block_k == 0, (k, block_k)
    w_rows = block_k // epw
    c = codes.astype(jnp.uint32).reshape(k // block_k, epw, w_rows, n)
    shifts = (jnp.arange(epw, dtype=jnp.uint32) * bits)[None, :, None, None]
    packed = jnp.sum(c << shifts, axis=1, dtype=jnp.uint32)
    return packed.reshape(k // epw, n).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("block_k", "bits"))
def unpack_rows_strided(qweight, block_k: int = PACK_BLOCK_K, bits: int = 4):
    """Inverse of pack_rows_strided: (K*bits/32, N) -> (K, N) int32."""
    epw = 32 // bits
    kw, n = qweight.shape
    w_rows = block_k // epw
    p = qweight.astype(jnp.uint32).reshape(-1, 1, w_rows, n)
    shifts = (jnp.arange(epw, dtype=jnp.uint32) * bits)[None, :, None, None]
    codes = (p >> shifts) & jnp.uint32(2**bits - 1)
    return codes.reshape(kw * epw, n).astype(jnp.int32)


def pack_linear_int4(icodes_kn, scales_gn, zeros_gn, group_size: int,
                     k_mult: int = PACK_BLOCK_K, n_mult: int = LANE):
    """Pack integer codes (K, N) + per-group scales/zeros (K/G, N) into
    padded kernel-ready buffers.

    Symmetric codes (zeros_gn is None) must be signed in [-8, 7]; they
    are biased to unsigned here and the kernel subtracts 8.  Padded
    K-rows/N-cols get scale 0 so they dequantize to exactly 0.

    Returns (qweight (K'/8, N') int32, scales (K'/G, N') f32,
    zeros (K'/G, N') f32 | None)."""
    k, n = icodes_kn.shape
    # K padding must be a multiple of BOTH the kernel block and the
    # group size (e.g. k=320, g=320 -> kp=640, not 320)
    kp = _round_up(k, math.lcm(k_mult, group_size))
    np_ = _round_up(n, n_mult)
    gp = kp // group_size
    g_rows = scales_gn.shape[0]
    if zeros_gn is None:
        icodes_kn = icodes_kn + 8
        zeros_p = None
    else:
        zeros_p = jnp.zeros((gp, np_), jnp.float32).at[:g_rows, :n].set(
            zeros_gn.astype(jnp.float32))
    codes_p = jnp.zeros((kp, np_), jnp.int32).at[:k, :n].set(icodes_kn)
    scales_p = jnp.zeros((gp, np_), jnp.float32).at[:g_rows, :n].set(
        scales_gn.astype(jnp.float32))
    return pack_rows_strided(codes_p, PACK_BLOCK_K, 4), scales_p, zeros_p


def pack_linear_int8(icodes_kn, scale_n, n_mult: int = LANE, k_mult: int = 32):
    """Pad int8 codes (K, N) + per-out-channel scales (N,) for the W8A8
    kernel.  Returns (w_i8 (K', N'), w_scale (1, N') f32)."""
    k, n = icodes_kn.shape
    kp, np_ = _round_up(k, k_mult), _round_up(n, n_mult)
    w = jnp.zeros((kp, np_), jnp.int8).at[:k, :n].set(icodes_kn.astype(jnp.int8))
    s = jnp.zeros((1, np_), jnp.float32).at[0, :n].set(scale_n.reshape(-1).astype(jnp.float32))
    return w, s


# ---------------------------------------------------------------------------
# W4A16: in-kernel unpack + dequant + matmul
# ---------------------------------------------------------------------------


def _unpack_block(packed, bits: int = 4):
    """(W, bn) int32 words -> (W*8, bn) int32 codes (orig row order,
    thanks to the strided packing)."""
    epw = 32 // bits
    mask = (1 << bits) - 1
    parts = [(packed >> (bits * j)) & mask for j in range(epw)]
    return jnp.concatenate(parts, axis=0)


def _w4a16_kernel(x_ref, qw_ref, s_ref, z_ref, o_ref, acc_ref, *,
                  block_k: int, group_size: int, n_k: int):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    codes = _unpack_block(qw_ref[:]).astype(jnp.float32)   # (bk, bn)
    # scales/zeros refs hold ALL groups (tiny); slice this block's rows
    sg = max(block_k // group_size, 1)
    g = block_k // sg
    row0 = (k_idx * block_k) // group_size
    parts = []
    for gi in range(sg):
        c = codes[gi * g:(gi + 1) * g]
        z = z_ref[pl.ds(row0 + gi, 1)]
        s = s_ref[pl.ds(row0 + gi, 1)]
        parts.append((c - z) * s)
    # cast dequantized weights to the activation dtype: with bf16
    # activations the MXU runs at full rate instead of f32 emulation
    w = parts[0] if sg == 1 else jnp.concatenate(parts, axis=0)
    acc_ref[:] += jnp.dot(x_ref[:], w.astype(x_ref.dtype),
                          preferred_element_type=jnp.float32)

    @pl.when(k_idx == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "block_m", "block_n", "interpret"))
def w4a16_matmul_pallas(x, qweight, scales, zeros, group_size: int = 128,
                        block_m: int = 256, block_n: int = 256,
                        interpret: bool = False):
    """x (M, K) @ int4-packed (K', N') weight -> (M, N') in x.dtype.

    K' (= qweight rows * 8) may exceed the logical K of x; x is
    zero-padded.  Caller slices the N' axis if padded."""
    m, k = x.shape
    kp = qweight.shape[0] * 8
    n = qweight.shape[1]
    assert k <= kp, (k, kp)
    block_k = PACK_BLOCK_K
    block_n = _pick_block(n, block_n)
    assert kp % block_k == 0 and n % block_n == 0, (kp, n, block_n)
    if zeros is None:
        zeros = jnp.full_like(scales, 8.0)

    bm = min(block_m, _round_up(m, 16))
    mp = _round_up(m, bm)
    xp = x
    if kp != k or mp != m:
        xp = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    n_k = kp // block_k
    n_groups = scales.shape[0]

    out = pl.pallas_call(
        functools.partial(_w4a16_kernel, block_k=block_k,
                          group_size=group_size, n_k=n_k),
        grid=(mp // bm, n // block_n, n_k),
        in_specs=[
            pl.BlockSpec((bm, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_k // 8, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((n_groups, block_n), lambda i, j, kk: (0, j)),
            pl.BlockSpec((n_groups, block_n), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, qweight, scales, zeros)
    return out[:m]


def w4a16_matmul_ref(x, qweight, scales, zeros, group_size: int = 128):
    """Pure-jnp reference: unpack, dequant, matmul."""
    codes = unpack_rows_strided(qweight, PACK_BLOCK_K, 4).astype(jnp.float32)
    s = jnp.repeat(scales, group_size, axis=0)
    z = jnp.repeat(zeros, group_size, axis=0) if zeros is not None else 8.0
    w = (codes - z) * s
    k = x.shape[-1]
    return jnp.dot(x.astype(jnp.float32), w[:k] if k < w.shape[0] else w).astype(x.dtype)


def w4a16_matmul(x, qweight, scales, zeros, group_size: int = 128, **kw):
    if on_tpu():
        return w4a16_matmul_pallas(x, qweight, scales, zeros, group_size, **kw)
    return w4a16_matmul_ref(x, qweight, scales, zeros, group_size)


def _w8a8_geglu_kernel(x_ref, wh_ref, wg_ref, wsh_ref, wsg_ref, bh_ref,
                       bg_ref, o_ref, xi_ref, xs_ref, *, act: str = "gelu"):
    """Fused gated projection: out = (x@Wh + bh) * act(x@Wg + bg), both
    matmuls int8, activations quantized once into VMEM scratch.  Avoids
    materializing the (M, 2*inner) projection in HBM.  act 'gelu' is
    the SD GEGLU; 'silu' is the llama SwiGLU (hidden = up_proj)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                          1e-5, None)
        xi_ref[:] = jnp.round(xf * (127.0 / absmax)).astype(jnp.int8)
        xs_ref[:] = absmax / 127.0

    def dot(w_ref, ws_ref, b_ref):
        acc = jax.lax.dot_general(
            xi_ref[:], w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (xs_ref[:] * ws_ref[:]) + b_ref[:]

    h = dot(wh_ref, wsh_ref, bh_ref)
    g = dot(wg_ref, wsg_ref, bg_ref)
    if act == "silu":
        a = g * jax.lax.logistic(g)
    else:
        # tanh-approximate gelu: Mosaic has no erf lowering; the
        # deviation (<3e-3 relative) is far below the int8 error
        a = jax.nn.gelu(g, approximate=True)
    o_ref[:] = (h * a).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "out_dtype", "act",
                              "interpret"))
def w8a8_geglu_fused(x, w_i8, w_scale, bias, block_m: int = 256,
                     block_n: int = 256, out_dtype=None, act: str = "gelu",
                     interpret: bool = False):
    """x (M, K) through an int8 gated projection (K, 2*inner') ->
    (M, inner').  Column layout: [hidden | gate] halves — for the
    llama SwiGLU pack [up | gate] with act='silu'."""
    m, k = x.shape
    kp, n2 = w_i8.shape
    half = n2 // 2
    assert k <= kp
    out_dtype = out_dtype or x.dtype
    if kp > 2560:
        block_m = min(block_m, 256)
        block_n = min(block_n, 256)
    block_n = _pick_block(half, block_n)
    bm = min(block_m, _round_up(m, 16))
    mp = _round_up(m, bm)
    xp = x
    if mp != m or kp != k:
        xp = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    nb = half // block_n

    out = pl.pallas_call(
        functools.partial(_w8a8_geglu_kernel, act=act),
        grid=(mp // bm, nb),
        in_specs=[
            pl.BlockSpec((bm, kp), lambda i, j: (i, 0)),
            pl.BlockSpec((kp, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((kp, block_n), lambda i, j, _nb=nb: (0, j + _nb)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j, _nb=nb: (0, j + _nb)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j, _nb=nb: (0, j + _nb)),
        ],
        out_specs=pl.BlockSpec((bm, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, half), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, kp), jnp.int8),
                        pltpu.VMEM((bm, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, w_i8, w_i8, w_scale, w_scale, bias, bias)
    return out[:m]


def w8a8_geglu_ref(x, w_i8, w_scale, bias, out_dtype=None, act="gelu"):
    xi, xs = quantize_act_per_token_int(x, 8)
    k = x.shape[-1]
    acc = jax.lax.dot_general(xi.astype(jnp.int32), w_i8[:k].astype(jnp.int32),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs * w_scale + bias
    h, g = jnp.split(y, 2, axis=-1)
    a = g * jax.nn.sigmoid(g) if act == "silu" \
        else jax.nn.gelu(g, approximate=True)
    return (h * a).astype(out_dtype or x.dtype)


# ---------------------------------------------------------------------------
# W4A8: int4 storage, int8 MXU compute (QQQ-style)
# ---------------------------------------------------------------------------
# On TPU the W4A16 float dequant costs ~1 VPU op per weight element,
# which at small M rivals just streaming bf16 weights from HBM.  W4A8
# keeps weights int4 in HBM (4x traffic saving), unpacks to int8 with
# two integer ops, and runs the dot on the int8 MXU; per-group scales
# multiply the int32 accumulator.  Requires block_k == group_size.


def _w4a8_kernel(x_ref, qw_ref, s_ref, z_ref, o_ref, xi_ref, xs_ref, acc_ref,
                 *, block_k: int, n_k: int):
    j = pl.program_id(1)
    k_idx = pl.program_id(2)

    @pl.when(jnp.logical_and(j == 0, k_idx == 0))
    def _():
        xf = x_ref[:].astype(jnp.float32)
        absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                          1e-5, None)
        xi_ref[:] = jnp.round(xf * (127.0 / absmax)).astype(jnp.int8)
        xs_ref[:] = absmax / 127.0

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    codes = _unpack_block(qw_ref[:])                       # (bk, bn) int32
    z = z_ref[pl.ds(k_idx, 1)].astype(jnp.int32)           # (1, bn) integer zp
    wi = (codes - z).astype(jnp.int8)
    pi = jax.lax.dot_general(
        xi_ref[:, pl.ds(k_idx * block_k, block_k)], wi,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc_ref[:] += pi.astype(jnp.float32) * s_ref[pl.ds(k_idx, 1)]

    @pl.when(k_idx == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * xs_ref[:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("group_size", "block_m", "block_n", "interpret"))
def w4a8_matmul_pallas(x, qweight, scales, zeros, group_size: int = 128,
                       block_m: int = 256, block_n: int = 256,
                       interpret: bool = False):
    """x (M, K) @ int4-packed weight with int8 activations/compute.

    Same packed layout as w4a16 (pack_linear_int4); requires
    group_size == PACK_BLOCK_K (the per-k-block scale application).
    zeros None => symmetric (codes biased by +8 at pack time)."""
    m, k = x.shape
    kp = qweight.shape[0] * 8
    n = qweight.shape[1]
    assert k <= kp
    block_k = PACK_BLOCK_K
    assert group_size == block_k, \
        f"w4a8 requires group_size == {block_k}, got {group_size}"
    if kp > 2560:
        block_m = min(block_m, 256)
        block_n = min(block_n, 256)
    block_n = _pick_block(n, block_n)
    if zeros is None:
        zeros = jnp.full_like(scales, 8.0)
    bm = min(block_m, _round_up(m, 16))
    mp = _round_up(m, bm)
    xp = x
    if kp != k or mp != m:
        xp = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    n_k = kp // block_k
    n_groups = scales.shape[0]

    out = pl.pallas_call(
        functools.partial(_w4a8_kernel, block_k=block_k, n_k=n_k),
        grid=(mp // bm, n // block_n, n_k),
        in_specs=[
            pl.BlockSpec((bm, kp), lambda i, j, kk: (i, 0)),
            pl.BlockSpec((block_k // 8, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((n_groups, block_n), lambda i, j, kk: (0, j)),
            pl.BlockSpec((n_groups, block_n), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, kp), jnp.int8),
                        pltpu.VMEM((bm, 1), jnp.float32),
                        pltpu.VMEM((bm, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, qweight, scales, zeros)
    return out[:m]


def w4a8_matmul_ref(x, qweight, scales, zeros, group_size: int = 128):
    """jnp reference: per-token int8 act quant + int4 dequant matmul."""
    xi, xs = quantize_act_per_token_int(x, 8)
    codes = unpack_rows_strided(qweight, PACK_BLOCK_K, 4)
    z = jnp.repeat(zeros if zeros is not None else jnp.full_like(scales, 8.0),
                   group_size, axis=0)
    s = jnp.repeat(scales, group_size, axis=0)
    w = (codes.astype(jnp.float32) - z) * s
    k = x.shape[-1]
    acc = xi.astype(jnp.float32) @ (w[:k] if k < w.shape[0] else w)
    return (acc * xs).astype(x.dtype)


# ---------------------------------------------------------------------------
# W8A8: int8 x int8 MXU matmul
# ---------------------------------------------------------------------------


def _w8a8_kernel(x_ref, w_ref, xs_ref, ws_ref, o_ref, acc_ref, *, n_k: int):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k_idx == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:].astype(jnp.float32) * xs_ref[:] * ws_ref[:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "out_dtype", "interpret"))
def w8a8_matmul_pallas(x_i8, w_i8, x_scale, w_scale, block_m: int = 256,
                       block_n: int = 256, block_k: int = 256,
                       out_dtype=jnp.bfloat16, interpret: bool = False):
    """int8 (M, K) @ int8 (K', N) with per-row x_scale (M, 1) f32 and
    per-col w_scale (1, N) f32 -> (M, N) out_dtype."""
    m, k = x_i8.shape
    kp, n = w_i8.shape
    assert k <= kp
    block_k = _pick_block(kp, block_k, mult=32)   # int8 sublane granule
    block_n = _pick_block(n, block_n)
    assert kp % block_k == 0 and n % block_n == 0, (kp, n, block_k, block_n)
    bm = min(block_m, _round_up(m, 32))
    mp = _round_up(m, bm)
    xp, xs = x_i8, x_scale
    if mp != m or kp != k:
        xp = jnp.pad(x_i8, ((0, mp - m), (0, kp - k)))
        xs = jnp.pad(x_scale, ((0, mp - m), (0, 0)))
    n_k = kp // block_k

    out = pl.pallas_call(
        functools.partial(_w8a8_kernel, n_k=n_k),
        grid=(mp // bm, n // block_n, n_k),
        in_specs=[
            pl.BlockSpec((bm, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0)),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, w_i8, xs, w_scale)
    return out[:m]


def _w8a8_fused_kernel(x_ref, w_ref, ws_ref, o_ref, xi_ref, xs_ref):
    """Single-pass W8A8: x block (bm, K) is per-token quantized once per
    m-block into VMEM scratch (the j grid axis is innermost, so the
    quantized block is reused for every n-block), int8 MXU dot, rescale.
    Reciprocal-multiply (VPU divides are slow)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                          1e-5, None)
        xi_ref[:] = jnp.round(xf * (127.0 / absmax)).astype(jnp.int8)
        xs_ref[:] = absmax / 127.0

    acc = jax.lax.dot_general(
        xi_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = (acc.astype(jnp.float32) * (xs_ref[:] * ws_ref[:])
                ).astype(o_ref.dtype)


def _w8a8_fused_epi_kernel(x_ref, w_ref, ws_ref, b_ref, r_ref, ln_s_ref,
                           ln_b_ref, o_ref, xi_ref, xs_ref, *,
                           has_residual: bool, has_ln: bool, ln_eps: float):
    """W8A8 with fused prologue/epilogue: optional LayerNorm folded into
    the quantization pass (saves the separate LN HBM round trip), then
    out = acc*scales + bias (+ residual)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        if has_ln:
            mu = jnp.mean(xf, axis=1, keepdims=True)
            xc = xf - mu
            var = jnp.mean(xc * xc, axis=1, keepdims=True)
            xf = xc * jax.lax.rsqrt(var + ln_eps) * ln_s_ref[:] + ln_b_ref[:]
        absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                          1e-5, None)
        xi_ref[:] = jnp.round(xf * (127.0 / absmax)).astype(jnp.int8)
        xs_ref[:] = absmax / 127.0

    acc = jax.lax.dot_general(
        xi_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (xs_ref[:] * ws_ref[:]) + b_ref[:]
    if has_residual:
        y = y + r_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "out_dtype", "ln_eps", "interpret"))
def w8a8_matmul_fused_epi(x, w_i8, w_scale, bias, residual=None, ln=None,
                          block_m: int = 512, block_n: int = 512,
                          out_dtype=None, ln_eps: float = 1e-5,
                          interpret: bool = False):
    """w8a8_matmul_fused + bias (+ residual) epilogue, optional fused
    LayerNorm prologue.  bias (1, N') f32; residual (M, N_logical<=N')
    or None; ln = (scale (K,), bias (K,)) applied to x before
    quantization (requires un-padded K)."""
    m, k = x.shape
    kp, n = w_i8.shape
    assert k <= kp
    out_dtype = out_dtype or x.dtype
    has_ln = ln is not None
    if has_ln and kp != k:
        # padded K would corrupt the in-kernel mean/var; normalize outside
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        x = ((xf - mu) * jax.lax.rsqrt(var + ln_eps) * ln[0] + ln[1]).astype(x.dtype)
        has_ln = False
    if kp > 2560:
        block_m = min(block_m, 256)
        block_n = min(block_n, 256)
    block_n = _pick_block(n, block_n)
    bm = min(block_m, _round_up(m, 16))
    mp = _round_up(m, bm)
    xp = x
    if mp != m or kp != k:
        xp = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    has_residual = residual is not None
    if has_residual:
        rp = residual
        if rp.shape != (mp, n):
            rp = jnp.pad(residual, ((0, mp - residual.shape[0]),
                                    (0, n - residual.shape[1])))
    else:
        rp = jnp.zeros((1, n), out_dtype)
    if has_ln:
        ln_s = ln[0].reshape(1, kp).astype(jnp.float32)
        ln_b = ln[1].reshape(1, kp).astype(jnp.float32)
    else:
        ln_s = jnp.ones((1, kp), jnp.float32)
        ln_b = jnp.zeros((1, kp), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_w8a8_fused_epi_kernel, has_residual=has_residual,
                          has_ln=has_ln, ln_eps=ln_eps),
        grid=(mp // bm, n // block_n),
        in_specs=[
            pl.BlockSpec((bm, kp), lambda i, j: (i, 0)),
            pl.BlockSpec((kp, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
            (pl.BlockSpec((bm, block_n), lambda i, j: (i, j)) if has_residual
             else pl.BlockSpec((1, block_n), lambda i, j: (0, j))),
            pl.BlockSpec((1, kp), lambda i, j: (0, 0)),
            pl.BlockSpec((1, kp), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, kp), jnp.int8),
                        pltpu.VMEM((bm, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, w_i8, w_scale, bias, rp, ln_s, ln_b)
    return out[:m]


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "out_dtype", "interpret"))
def w8a8_matmul_fused(x, w_i8, w_scale, block_m: int = 512,
                      block_n: int = 512, out_dtype=None,
                      interpret: bool = False):
    """bf16/f32 x (M, K) @ int8 (K', N): per-token activation
    quantization fused into the kernel.  Requires K' small enough that a
    (bm, K') x block fits VMEM (true for all SD/CLIP layers)."""
    m, k = x.shape
    kp, n = w_i8.shape
    assert k <= kp
    out_dtype = out_dtype or x.dtype
    # VMEM budget: x bf16 (2B) + int8 scratch (1B) scale with bm*K;
    # weights double-buffer with K*bn.  Shrink blocks for large K.
    if kp > 2560:
        block_m = min(block_m, 256)
        block_n = min(block_n, 256)
    if kp > 4608:
        # (256, 5632) x-block + scratch + double-buffered weights blew
        # the 16 MB scoped-vmem stack by 880 KB (llama down_proj,
        # K=5632, measured) — halve the m block
        block_m = min(block_m, 128)
    block_n = _pick_block(n, block_n)
    bm = min(block_m, _round_up(m, 16))
    mp = _round_up(m, bm)
    xp = x
    if mp != m or kp != k:
        xp = jnp.pad(x, ((0, mp - m), (0, kp - k)))

    out = pl.pallas_call(
        _w8a8_fused_kernel,
        grid=(mp // bm, n // block_n),
        in_specs=[
            pl.BlockSpec((bm, kp), lambda i, j: (i, 0)),
            pl.BlockSpec((kp, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, kp), jnp.int8),
                        pltpu.VMEM((bm, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, w_i8, w_scale)
    return out[:m]


def w8a8_matmul_ref(x_i8, w_i8, x_scale, w_scale, out_dtype=jnp.bfloat16):
    k = x_i8.shape[-1]
    acc = jax.lax.dot_general(
        x_i8.astype(jnp.int32), w_i8[:k].astype(jnp.int32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * x_scale * w_scale).astype(out_dtype)


def w8a8_matmul(x_i8, w_i8, x_scale, w_scale, out_dtype=jnp.bfloat16, **kw):
    if on_tpu():
        return w8a8_matmul_pallas(x_i8, w_i8, x_scale, w_scale,
                                  out_dtype=out_dtype, **kw)
    return w8a8_matmul_ref(x_i8, w_i8, x_scale, w_scale, out_dtype)


@functools.partial(jax.jit, static_argnames=("n_bits",))
def quantize_act_per_token_int(t, n_bits: int = 8):
    """Per-token int activation quantization returning codes + scales
    (integer counterpart of fake_quant.py:108-118)."""
    q_max = 2 ** (n_bits - 1) - 1
    tf = t.astype(jnp.float32)
    scales = jnp.clip(jnp.max(jnp.abs(tf), axis=-1, keepdims=True), 1e-5, None) / q_max
    codes = jnp.clip(jnp.round(tf / scales), -q_max - 1, q_max).astype(jnp.int8)
    return codes, scales
