"""Fused causal flash prefill attention (Pallas TPU) — native GQA +
in-kernel q-rope on (B, S, H, D) layouts.

Why this kernel exists (tools/prefill_ablation_tpu.py, batch 32,
ctx 1024, BENCH_1B): the module's jax-flash routing cost 0.295 s of the
0.559 s static-int8 prefill against ~0.015 s of actual attention FLOPs
— the GQA `jnp.repeat` materializes 8x-expanded K/V (134 MB each) and
the four (B,S,H,D)<->(B,H,S,D) transposes move another ~0.5 GB per
layer; the f32 split/concat rope pass on q cost a further ~0.09 s.
This kernel removes all of it:

* q/k/v stream DIRECTLY from their (B, S, H|Hkv, D) projection layouts
  via BlockSpec index maps — zero materialized transposes;
* GQA happens in the index map (query head ih reads kv head ih // g) —
  zero repeated K/V;
* q-rope runs on tiles in VMEM (the `_rope_epilogue` lane-roll trick
  on full-width cos / sign-folded sin tables) — the (B,S,H,D) f32
  rotation pass disappears.  K arrives PRE-roped: the module ropes k
  before the cache write anyway (the cache stores roped keys), and k
  is only hkv/h of q's bytes.
* causal: fully-masked k-blocks skip compute (pl.when); the diagonal
  block masks by position.

Output is (B, S, H, D) bf16, ready for the o_proj reshape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def rope_tables(s: int, d: int, theta: float, pos_scale: float = 1.0):
    """Full-width rope tables for the kernel: cos_full (S, D) and
    SIGN-FOLDED sin (S, D) — y*cos + partner(y)*sin_signed with
    partner = lane-roll by d/2 reproduces models/llama.py::rope
    exactly (same f32 trig, same pairing)."""
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    if pos_scale != 1.0:
        freqs = freqs * jnp.float32(pos_scale)
    angles = jnp.arange(s, dtype=jnp.float32)[:, None] * freqs   # (S, D/2)
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    cos_full = jnp.concatenate([cos, cos], axis=1)
    sin_signed = jnp.concatenate([-sin, sin], axis=1)
    return cos_full, sin_signed


def _rope_tile(y, cos, sin, d: int):
    """Rotate a (rows, D) tile: partner = roll by d/2 (both directions
    coincide at half = d/2 when the tile IS one head)."""
    partner = pltpu.roll(y, d // 2, axis=1)
    return y * cos + partner * sin


def _kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref, st_ref, o_ref,
            qs_ref, acc_ref, m_ref, l_ref, *,
            n_k: int, bq: int, bk: int, d: int, sm_scale: float,
            do_rope: bool, has_starts: bool):
    ib = pl.program_id(0)
    i = pl.program_id(2)
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        qt = q_ref[0, 0].astype(jnp.float32)
        if do_rope:
            qt = _rope_tile(qt, cos_ref[:], sin_ref[:], d)
        # cast back to bf16 so the QK dot matches the roped-bf16
        # numerics of the module path
        qs_ref[:] = qt.astype(jnp.bfloat16)

    # causal: this k block participates iff its first key position is
    # <= the q block's last query position
    @pl.when(j * bk <= i * bq + bq - 1)
    def _():
        kt = k_ref[0, 0]
        s_qk = jax.lax.dot_general(
            qs_ref[:], kt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (bq, bk)
        logits = s_qk * sm_scale
        pos_q = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        pos_k = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        mask = pos_k <= pos_q
        if has_starts:
            mask &= pos_k >= st_ref[ib]
        logits = jnp.where(mask, logits, -1e30)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev,
                            jnp.max(logits, axis=-1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:] = m_new
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_ref[0, 0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (bq, D)
        acc_ref[:] = acc_ref[:] * corr + pv

    @pl.when(j == n_k - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:]
                       / jnp.maximum(l_ref[:], 1e-30)
                       ).astype(o_ref.dtype)


def _kernel_i8(q_ref, ki_ref, ksT_ref, vi_ref, vs_ref, cos_ref, sin_ref,
               st_ref, o_ref, qi_ref, qsc_ref, acc_ref, m_ref, l_ref, *,
               n_k: int, bq: int, bk: int, d: int, sm_scale: float,
               do_rope: bool, has_starts: bool):
    """int8-QK/PV variant (the reference's quantize_bmm_input
    attention-input quantization, quantizer_SQ.py:463,487, on the
    prefill path): q roped then per-row int8 in VMEM; k/v arrive
    pre-quantized (per-token k scales, per-(head, channel) v scales —
    the flash_int8.py factorization); probs per-row int8.  Both dots
    ride the int8 MXU at d=64, where bf16 pays the 128-lane padding."""
    ib = pl.program_id(0)
    i = pl.program_id(2)
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        qt = q_ref[0, 0].astype(jnp.float32)
        if do_rope:
            qt = _rope_tile(qt, cos_ref[:], sin_ref[:], d)
        qs = jnp.clip(jnp.max(jnp.abs(qt), axis=1, keepdims=True),
                      1e-5, None) / 127.0
        qi_ref[:] = jnp.round(qt / qs).astype(jnp.int8)
        qsc_ref[:] = qs

    @pl.when(j * bk <= i * bq + bq - 1)
    def _():
        s_int = jax.lax.dot_general(
            qi_ref[:], ki_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)                # (bq, bk)
        logits = s_int.astype(jnp.float32) * (
            qsc_ref[:] * ksT_ref[0, 0] * sm_scale)
        pos_q = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        pos_k = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        mask = pos_k <= pos_q
        if has_starts:
            mask &= pos_k >= st_ref[ib]
        logits = jnp.where(mask, logits, -1e30)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev,
                            jnp.max(logits, axis=-1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:] = m_new
        ps = jnp.maximum(jnp.max(p, axis=-1, keepdims=True), 1e-20) / 127.0
        pi = jnp.round(p / ps).astype(jnp.int8)
        pv = jax.lax.dot_general(
            pi, vi_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)                # (bq, D)
        acc_ref[:] = acc_ref[:] * corr + pv.astype(jnp.float32) * ps

    @pl.when(j == n_k - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:] * vs_ref[0, 0]
                       / jnp.maximum(l_ref[:], 1e-30)
                       ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_q",
                                             "block_k", "qk_int8",
                                             "interpret"))
def flash_prefill_gqa(q, k, v, sm_scale: float, rope_cos=None,
                      rope_sin=None, starts=None, block_q: int = 1024,
                      block_k: int = 1024, qk_int8: bool = False,
                      interpret: bool = False):
    """q (B, H, S, D) UN-roped (rotated in-kernel when rope tables are
    given); k/v (B, Hkv, S, D) — the module's cache-native kt/vt
    layout, k already roped.  starts (B,) int32 optional left-pad key
    mask.  Returns (B, H, S, D) bf16.  (Mosaic requires the block's
    last two dims 8/128-aligned or dim-equal, so the head axis leads —
    kt/vt already live head-major in the module and only q pays one
    XLA transpose.)

    Default blocks 1024x1024 by sweep (tools/flash_prefill_sweep_tpu,
    marginal ms/call at (32, 1024) h32/kv4 d64): 1024x1024 = 6.39,
    512x512 = 6.78, 1024x512 = 7.18, 256x256 = 14.3; the old jax-flash
    + repeat/transpose/rope path = 9.90."""
    b, h, s, d = q.shape
    hkv = k.shape[1]
    g = h // hkv
    bq = min(block_q, s)
    bk = min(block_k, s)
    while s % bq:
        bq //= 2
    while s % bk:
        bk //= 2
    # bq == bk guarantees no VALID query row ever sees an all-masked
    # participating k block (its self-key block always participates),
    # so the online-softmax accumulators never ingest exp(0) garbage
    # for real rows
    bq = bk = min(bq, bk)
    if bq % 8 and bq != s:
        # Mosaic block shapes must be 8-aligned (or dim-equal); the
        # halving fallback can otherwise land on e.g. bq=2 for s=1030
        # and fail with an opaque Mosaic compile error
        raise ValueError(
            f"flash_prefill_gqa: s={s} admits no valid block size "
            f"(derived {bq}, need a multiple of 8 or bq == s) — pad "
            "the sequence to a multiple of 128")
    n_q, n_k = s // bq, s // bk
    do_rope = rope_cos is not None
    if not do_rope:
        rope_cos = jnp.ones((s, d), jnp.float32)
        rope_sin = jnp.zeros((s, d), jnp.float32)
    has_starts = starts is not None
    st = (jnp.asarray(starts, jnp.int32) if has_starts
          else jnp.zeros((b,), jnp.int32))

    if qk_int8:
        # per-token k / per-(head, channel) v quantization in XLA — k/v
        # are only hkv/h of q's bytes, the casts fuse into the rope /
        # cache producers
        kf = k.astype(jnp.float32)
        ks = jnp.clip(jnp.max(jnp.abs(kf), axis=-1, keepdims=True),
                      1e-5, None) / 127.0                  # (B,Hkv,S,1)
        ki = jnp.round(kf / ks).astype(jnp.int8)
        vf = v.astype(jnp.float32)
        vs = jnp.clip(jnp.max(jnp.abs(vf), axis=2, keepdims=True),
                      1e-5, None) / 127.0                  # (B,Hkv,1,D)
        vi = jnp.round(vf / vs).astype(jnp.int8)
        ksT = ks.transpose(0, 1, 3, 2)                     # (B,Hkv,1,S)
        return pl.pallas_call(
            functools.partial(_kernel_i8, n_k=n_k, bq=bq, bk=bk, d=d,
                              sm_scale=float(sm_scale), do_rope=do_rope,
                              has_starts=has_starts),
            grid=(b, h, n_q, n_k),
            in_specs=[
                pl.BlockSpec((1, 1, bq, d),
                             lambda ib, ih, i, j: (ib, ih, i, 0)),
                pl.BlockSpec((1, 1, bk, d),
                             lambda ib, ih, i, j, g=g: (ib, ih // g, j, 0)),
                pl.BlockSpec((1, 1, 1, bk),
                             lambda ib, ih, i, j, g=g: (ib, ih // g, 0, j)),
                pl.BlockSpec((1, 1, bk, d),
                             lambda ib, ih, i, j, g=g: (ib, ih // g, j, 0)),
                pl.BlockSpec((1, 1, 1, d),
                             lambda ib, ih, i, j, g=g: (ib, ih // g, 0, 0)),
                pl.BlockSpec((bq, d), lambda ib, ih, i, j: (i, 0)),
                pl.BlockSpec((bq, d), lambda ib, ih, i, j: (i, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, bq, d),
                                   lambda ib, ih, i, j: (ib, ih, i, 0)),
            out_shape=jax.ShapeDtypeStruct((b, h, s, d), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bq, d), jnp.int8),
                            pltpu.VMEM((bq, 1), jnp.float32),
                            pltpu.VMEM((bq, d), jnp.float32),
                            pltpu.VMEM((bq, 1), jnp.float32),
                            pltpu.VMEM((bq, 1), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary"),
            ),
            interpret=interpret,
        )(q, ki, ksT, vi, vs, rope_cos, rope_sin, st)

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k, bq=bq, bk=bk, d=d,
                          sm_scale=float(sm_scale), do_rope=do_rope,
                          has_starts=has_starts),
        grid=(b, h, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda ib, ih, i, j: (ib, ih, i, 0)),
            pl.BlockSpec((1, 1, bk, d),
                         lambda ib, ih, i, j, g=g: (ib, ih // g, j, 0)),
            pl.BlockSpec((1, 1, bk, d),
                         lambda ib, ih, i, j, g=g: (ib, ih // g, j, 0)),
            pl.BlockSpec((bq, d), lambda ib, ih, i, j: (i, 0)),
            pl.BlockSpec((bq, d), lambda ib, ih, i, j: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d),
                               lambda ib, ih, i, j: (ib, ih, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.bfloat16),
                        pltpu.VMEM((bq, d), jnp.float32),
                        pltpu.VMEM((bq, 1), jnp.float32),
                        pltpu.VMEM((bq, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, rope_cos, rope_sin, st)
    return out


def flash_prefill_gqa_ref(q, k, v, sm_scale: float, rope_cos=None,
                          rope_sin=None, starts=None,
                          qk_int8: bool = False):
    """jnp reference with identical semantics and layouts
    (q (B, H, S, D) roped via the same sign-folded tables; k/v
    (B, Hkv, S, D); causal + optional start mask; f32 softmax; bf16
    PV operand).  qk_int8 mirrors the int8 kernel's quantization
    (per-row q, per-token k, per-(head, channel) v, whole-row int8
    probs — block-exact at the default whole-sequence k block)."""
    b, h, s, d = q.shape
    hkv = k.shape[1]
    g = h // hkv
    qf = q.astype(jnp.float32)
    if rope_cos is not None:
        partner = jnp.roll(qf, d // 2, axis=-1)
        qf = (qf * rope_cos[None, None, :, :]
              + partner * rope_sin[None, None, :, :])
    if qk_int8:
        qs = jnp.clip(jnp.max(jnp.abs(qf), axis=-1, keepdims=True),
                      1e-5, None) / 127.0
        qi = jnp.round(qf / qs)
        kf = k.astype(jnp.float32)
        ks = jnp.clip(jnp.max(jnp.abs(kf), axis=-1, keepdims=True),
                      1e-5, None) / 127.0
        ki = jnp.round(kf / ks)
        vf = v.astype(jnp.float32)
        vs = jnp.clip(jnp.max(jnp.abs(vf), axis=2, keepdims=True),
                      1e-5, None) / 127.0
        vi = jnp.round(vf / vs)
        qg = qi.reshape(b, hkv, g, s, d)
        logits = (jnp.einsum("bhgqd,bhkd->bhgqk", qg, ki)
                  * qs.reshape(b, hkv, g, s, 1)
                  * ks[:, :, None, :, 0][:, :, :, None, :]
                  * sm_scale)
        mask = jnp.tril(jnp.ones((s, s), bool))
        if starts is not None:
            mask = mask[None] & (jnp.arange(s)[None, None, :]
                                 >= jnp.asarray(starts)[:, None, None])
            mask = mask[:, None, None]
        else:
            mask = mask[None, None, None]
        logits = jnp.where(mask, logits, -1e30)
        p = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
        p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
        ps = jnp.maximum(jnp.max(p, axis=-1, keepdims=True),
                         1e-20) / 127.0
        pi = jnp.round(p / ps)
        out = (jnp.einsum("bhgqk,bhkd->bhgqd", pi, vi)
               * ps * vs[:, :, None])
        return out.reshape(b, h, s, d).astype(q.dtype)
    qb = qf.astype(q.dtype)
    qg = qb.reshape(b, hkv, g, s, d)
    logits = jnp.einsum("bhgqd,bhkd->bhgqk", qg, k).astype(
        jnp.float32) * sm_scale
    mask = jnp.tril(jnp.ones((s, s), bool))
    if starts is not None:
        mask = mask[None] & (jnp.arange(s)[None, None, :]
                             >= jnp.asarray(starts)[:, None, None])
        mask = mask[:, None, None]
    else:
        mask = mask[None, None, None]
    logits = jnp.where(mask, logits, -1e30)
    probs = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    probs = probs / jnp.maximum(jnp.sum(probs, axis=-1, keepdims=True),
                                1e-30)
    # probs/output follow q's dtype: bf16 inputs reproduce the TPU
    # kernel's bf16-probs PV semantics; f32 inputs (CPU module-parity
    # tests) keep full precision like the module einsum path
    out = jnp.einsum("bhgqk,bhkd->bhgqd", probs.astype(q.dtype),
                     v, preferred_element_type=jnp.float32)
    return out.reshape(b, h, s, d).astype(q.dtype)
