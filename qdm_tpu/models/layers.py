"""Quantization-aware Flax layers.

``QDense`` / ``QConv`` are the TPU-native analogues of the reference's
``WxAxLinear`` / ``WxAxConv2d`` drop-in modules
(reference: quantize/fake_quant.py:170-398).  Instead of swapping module
objects, every matmul-bearing layer consults a static
:class:`~qdm_tpu.quant.plan.QuantPlan` for its own path:

* mode "none"/"fake": plain ``x @ kernel`` (fake-quantized weights are
  produced by the pytree transform in qdm_tpu/quant/apply.py — the
  forward is unchanged, matching WxAxLinear's fp16-buffer execution,
  fake_quant.py:215-225).
* mode "fake_act": additionally fake-quantizes the input activation
  (per-token/per-tensor for dense; per-channel/per-group for conv) —
  the reference's `quant_act=True` path.
* mode "w4a16"/"w8a8": parameters are packed integer buffers and the
  forward dispatches to the Pallas kernels in qdm_tpu/ops/quant_matmul.

When ``plan.capture_stats`` is set, layers sow the running per-channel
absmax of their inputs into the 'calib' collection — the replacement for
the reference's forward hooks (calib_data.py:105-124, apply_hook
calib_data.py:216-224).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from qdm_tpu.ops import quant_matmul as qmm
from qdm_tpu.quant import rtn
from qdm_tpu.quant.plan import NO_QUANT, LayerQuantSpec, QuantPlan

Dtype = Any

NO_PLAN = QuantPlan()

_W4A16_XLA_WARNED = False


def _mark_w4a16_xla_warned():
    global _W4A16_XLA_WARNED
    _W4A16_XLA_WARNED = True


def _path_str(module: nn.Module) -> str:
    return "/".join(str(p) for p in module.path)


def _ln_apply(x, ln, eps: float = 1e-5):
    """Explicit LayerNorm with given (scale, bias) — the reference math
    for the fused-LN fallback paths."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * ln[0] + ln[1]).astype(x.dtype)


def _act_fake_quant_dense(x, spec: LayerQuantSpec):
    if spec.act_quant == "per_tensor":
        return rtn.quantize_activation_per_tensor_absmax(x, spec.a_bits)
    return rtn.quantize_activation_per_token_absmax(x, spec.a_bits)


def _act_fake_quant_conv(x, spec: LayerQuantSpec):
    if spec.act_quant == "per_group" and spec.act_group_size > 1:
        return rtn.quantize_activation_per_channel_group_absmax(
            x, spec.act_group_size, spec.a_bits)
    if spec.act_quant == "per_tensor":
        return rtn.quantize_activation_per_tensor_absmax(x, spec.a_bits)
    if spec.act_quant == "per_token":
        return rtn.quantize_activation_per_token_absmax(x, spec.a_bits)
    return rtn.quantize_activation_per_channel_absmax(x, spec.a_bits)


class QDense(nn.Module):
    """Quantization-aware dense layer.  Kernel layout (in, out)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    plan: QuantPlan = NO_PLAN
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x, residual=None, ln=None):
        """residual, if given, is added to the output; ln=(scale, bias),
        if given, LayerNorms the input — both fold into the packed
        kernels on TPU (BENCH_NOTES.md fusion playbook)."""
        spec = self.plan.spec_for(_path_str(self))
        in_features = x.shape[-1]
        if ln is not None and not (spec.mode == "w8a8" and qmm.on_tpu()):
            x = _ln_apply(x, ln)
            ln = None

        if self.plan.capture_stats:
            # per-channel absmax of the input, max-reduced across calls
            # within one apply (reference hook: calib_data.py:112-121)
            amax = jnp.max(jnp.abs(x.astype(jnp.float32).reshape(-1, in_features)), axis=0)
            self.sow("calib", "act_absmax", amax,
                     init_fn=lambda: jnp.zeros(in_features, jnp.float32),
                     reduce_fn=jnp.maximum)

        batch_shape = x.shape[:-1]
        x2 = x.reshape(-1, in_features)
        res2 = residual.reshape(-1, self.features) if residual is not None else None

        if self.plan.capture_inputs:
            rows = min(self.plan.capture_rows, x2.shape[0])
            self.sow("calib_x", "x", x2[:rows].astype(jnp.float32),
                     init_fn=lambda: jnp.zeros((rows, in_features), jnp.float32),
                     reduce_fn=lambda a, b: b)

        if self.plan.capture_seq and x.ndim == 3 and any(
                pat in _path_str(self) for pat in self.plan.capture_seq_on):
            # sequence-shaped block for the AWQ attention-module loss
            # (quant/plan.py capture_seq): first nb batch rows, FULL
            # sequence — sampled token rows cannot attend
            nb = min(self.plan.capture_seq, x.shape[0])
            self.sow("calib_s", "xs", x[:nb].astype(jnp.float32),
                     init_fn=lambda: jnp.zeros((nb,) + x.shape[1:],
                                               jnp.float32),
                     reduce_fn=lambda a, b: b)

        if self.plan.capture_gram:
            # exact input second moments over ALL calibration tokens in
            # bounded (C, C) memory — the GPTQ Hessian (quant/gptq.py)
            xf = x2.astype(jnp.float32)
            self.sow("calib_h", "h", xf.T @ xf,
                     init_fn=lambda: jnp.zeros((in_features, in_features),
                                               jnp.float32),
                     reduce_fn=lambda a, b: a + b)

        if spec.mode in ("w4a16", "w4a8"):
            # effective group size: same resolution as pack_params
            # (reference shrink-by-32 quirk, fake_quant.py:33-40)
            gs = spec.group_size if spec.group_size > 0 else in_features
            gs = qmm.align_group_size(
                in_features, rtn.resolve_group_size(in_features, gs)
                or in_features)
            import math as _math
            kp = qmm._round_up(in_features, _math.lcm(qmm.PACK_BLOCK_K, gs))
            qweight = self.param(
                "qweight", nn.initializers.zeros_init(),
                (kp // 8, qmm._round_up(self.features, qmm.LANE)), jnp.int32)
            n_groups = kp // gs
            scales = self.param("scales", nn.initializers.ones_init(),
                                (n_groups, qweight.shape[1]), jnp.float32)
            zeros = self.param("zeros", nn.initializers.zeros_init(),
                               (n_groups, qweight.shape[1]), jnp.float32) \
                if spec.zero_point else None
            if spec.mode == "w4a8" and gs == qmm.PACK_BLOCK_K:
                # int4 storage, int8 MXU compute (QQQ-style)
                if qmm.on_tpu():
                    y = qmm.w4a8_matmul_pallas(x2.astype(self.dtype), qweight,
                                               scales, zeros, group_size=gs)
                else:
                    y = qmm.w4a8_matmul_ref(x2.astype(self.dtype), qweight,
                                            scales, zeros, group_size=gs)
            else:
                if spec.quantize_act and spec.a_bits < 16:
                    x2 = _act_fake_quant_dense(x2, spec)
                y = qmm.w4a16_matmul(x2.astype(self.dtype), qweight, scales,
                                     zeros, group_size=gs)
            y = y[:, : self.features]
        elif spec.mode == "w8a8_xla":
            # pure-XLA int8 path: no pallas call, so XLA fuses the
            # quantize into the producer (LN/GELU) and the dequant +
            # bias + residual epilogue into the matmul, the same way it
            # fuses bf16 — measured 1.3-1.8x vs bf16 with static scales
            # on v5e (bench_xla_int8.py).  act_quant "static" uses a
            # calibrated per-tensor scale (fill_static_act_scales);
            # anything else falls back to dynamic per-token scales.
            w_i8 = self.param("qweight", nn.initializers.zeros_init(),
                              (in_features, self.features), jnp.int8)
            w_scale = self.param("scales", nn.initializers.ones_init(),
                                 (self.features,), jnp.float32)
            xf = x2.astype(jnp.float32)
            if spec.act_quant == "static":
                xs = self.param("act_scale", nn.initializers.ones_init(),
                                (1,), jnp.float32)[0]
            else:
                xs = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                              1e-5, None) / 127.0
            xi = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(xi, w_i8, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * (xs * w_scale)
        elif spec.mode == "w4a16_xla":
            # weight-only int4, plain XLA: codes row-packed two-per-int8
            # (row i of qweight holds nibbles for rows 2i, 2i+1), unpack
            # via shift/mask, per-group dequant, bf16 matmul.  XLA
            # streams the int8 buffer from HBM (1/4 the bf16 bytes) and
            # fuses the dequant into the matmul operand like w8a16.
            # FOOTGUN (measured, BENCH_NOTES round 2): on decode-shaped
            # workloads (few tokens per call) this mode runs at 0.15x
            # bf16 — the per-weight unpack work dominates; use w8a8 or
            # w4a8 for decode.  Warn once at trace time.
            if x2.shape[0] <= 16 and not _W4A16_XLA_WARNED:
                import warnings

                warnings.warn(
                    "w4a16_xla on a decode-shaped workload "
                    f"({x2.shape[0]} tokens): measured 0.15x bf16 decode "
                    "throughput — use mode 'w8a8_xla' or 'w4a8' instead "
                    "(BENCH_NOTES.md, LLM round 2)")
                _mark_w4a16_xla_warned()
            kp = in_features + (in_features % 2)
            gs = spec.group_size if spec.group_size > 0 else kp
            gs = rtn.resolve_group_size(kp, gs) or kp
            qw = self.param("qweight", nn.initializers.zeros_init(),
                            (kp // 2, self.features), jnp.int8)
            scales = self.param("scales", nn.initializers.ones_init(),
                                (kp // gs, self.features), jnp.float32)
            u = qw.astype(jnp.int32)
            lo = (u & 0xF) - 8
            hi = ((u >> 4) & 0xF) - 8
            codes = jnp.stack([lo, hi], axis=1).reshape(kp, self.features)
            w = (codes.astype(jnp.float32)
                 * jnp.repeat(scales, gs, axis=0)).astype(self.dtype)
            y = jnp.dot(x2.astype(self.dtype), w[:in_features])
        elif spec.mode == "w8a16":
            # weight-only int8: XLA fuses the dequant into the matmul
            # operand stream (no pallas call, no act quant)
            w_i8 = self.param("qweight", nn.initializers.zeros_init(),
                              (qmm._round_up(in_features, 32),
                               qmm._round_up(self.features, qmm.LANE)), jnp.int8)
            w_scale = self.param("scales", nn.initializers.ones_init(),
                                 (1, w_i8.shape[1]), jnp.float32)
            w = w_i8[:in_features].astype(self.dtype) * w_scale.astype(self.dtype)
            y = jnp.dot(x2.astype(self.dtype), w)
            y = y[:, : self.features]
        elif spec.mode == "w8a8":
            w_i8 = self.param("qweight", nn.initializers.zeros_init(),
                              (qmm._round_up(in_features, 32),
                               qmm._round_up(self.features, qmm.LANE)), jnp.int8)
            w_scale = self.param("scales", nn.initializers.ones_init(),
                                 (1, w_i8.shape[1]), jnp.float32)
            if qmm.on_tpu():
                # act quantization + bias + residual fused into the kernel
                bias_p = jnp.zeros((1, w_i8.shape[1]), jnp.float32)
                if self.use_bias:
                    bias = self.param("bias", nn.initializers.zeros_init(),
                                      (self.features,), self.param_dtype)
                    bias_p = bias_p.at[0, : self.features].set(
                        bias.astype(jnp.float32))
                y = qmm.w8a8_matmul_fused_epi(
                    x2.astype(self.dtype), w_i8, w_scale, bias_p, ln=ln,
                    out_dtype=self.dtype)
                y = y[:, : self.features]
                if spec.quantize_output and spec.a_bits < 16:
                    # keep the fused path's epilogue semantics identical
                    # to the fallback path below (bias is already in y)
                    y = _act_fake_quant_dense(y, spec)
                if res2 is not None:
                    # the add fuses into the kernel's output consumer in
                    # XLA; feeding the residual through the kernel added
                    # an input stream and measured slower
                    y = y + res2.astype(y.dtype)
                return y.reshape(*batch_shape, self.features).astype(self.dtype)
            x_i8, x_scale = qmm.quantize_act_per_token_int(x2, min(spec.a_bits, 8))
            y = qmm.w8a8_matmul(x_i8, w_i8, x_scale, w_scale, out_dtype=self.dtype)
            y = y[:, : self.features]
        else:
            kernel = self.param("kernel", self.kernel_init,
                                (in_features, self.features), self.param_dtype)
            if spec.mode == "fake_act" and spec.quantize_act and spec.a_bits < 16:
                x2 = _act_fake_quant_dense(x2, spec)
            y = jnp.dot(x2.astype(self.dtype), kernel.astype(self.dtype))

        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.features,), self.param_dtype)
            y = y + bias.astype(y.dtype)
        if spec.quantize_output and spec.a_bits < 16:
            # WxAxLinear output_quant (fake_quant.py:222-225)
            y = _act_fake_quant_dense(y, spec)
        if res2 is not None:
            y = y + res2.astype(y.dtype)
        return y.reshape(*batch_shape, self.features).astype(self.dtype)


class QConv(nn.Module):
    """Quantization-aware 2D convolution, NHWC.  Kernel (kh, kw, in, out).

    Real packed kernels are linear-only (like the reference's kernel
    zoo); quantized convs run fake-quant (WxAxConv2d semantics,
    fake_quant.py:333-341)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[str, int, Tuple[int, int]] = 1
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x):
        spec = self.plan.spec_for(_path_str(self))
        in_features = x.shape[-1]

        if self.plan.capture_stats:
            amax = jnp.max(jnp.abs(x.astype(jnp.float32).reshape(-1, in_features)), axis=0)
            self.sow("calib", "act_absmax", amax,
                     init_fn=lambda: jnp.zeros(in_features, jnp.float32),
                     reduce_fn=jnp.maximum)

        strides = (self.strides, self.strides) if isinstance(self.strides, int) else self.strides
        if isinstance(self.padding, int):
            padding = ((self.padding, self.padding), (self.padding, self.padding))
        elif isinstance(self.padding, tuple):
            padding = (self.padding, self.padding) if isinstance(self.padding[0], int) else self.padding
        else:
            padding = self.padding

        if spec.mode == "w8a8":
            # real int8 conv: XLA lowers int8 x int8 conv onto the int8
            # MXU (measured 1.7-5.9x faster than bf16 conv on v5e).
            # act scale: 'static' uses a calibrated per-tensor scale (no
            # runtime reduction — the dynamic scalar max serializes the
            # pipeline, BENCH_NOTES.md); 'static_channel' uses
            # calibrated PER-INPUT-CHANNEL scales folded into the
            # weights at pack time (the reference's per-channel conv act
            # quant, fake_quant.py:123-131, made static) — the runtime
            # cost is one per-channel multiply that XLA fuses into the
            # preceding GN/silu elementwise chain, and it spans the
            # channel dynamic range that breaks per-tensor int8 on the
            # VAE decoder (PSNR 15.1, BENCH_NOTES round 2); otherwise
            # dynamic per-tensor.
            ki = self.param("qweight", nn.initializers.zeros_init(),
                            (*self.kernel_size, in_features, self.features),
                            jnp.int8)
            w_scale = self.param("scales", nn.initializers.ones_init(),
                                 (self.features,), jnp.float32)
            xf = x.astype(jnp.float32)
            if spec.act_quant == "static_channel":
                xs_c = self.param("act_scale", nn.initializers.ones_init(),
                                  (in_features,), jnp.float32)
                xi = jnp.clip(jnp.round(xf * (1.0 / xs_c)),
                              -127, 127).astype(jnp.int8)
                xs = 1.0   # per-channel scales live in the folded weights
            elif spec.act_quant == "static":
                xs = self.param("act_scale", nn.initializers.ones_init(),
                                (1,), jnp.float32)[0]
                xi = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
            else:
                xs = jnp.clip(jnp.max(jnp.abs(xf)), 1e-5, None) / 127.0
                xi = jnp.round(xf / xs).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xi, ki, window_strides=strides, padding=padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = (y.astype(jnp.float32) * (xs * w_scale)).astype(self.dtype)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros_init(),
                                  (self.features,), self.param_dtype)
                y = y + bias.astype(y.dtype)
            return y

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, in_features, self.features), self.param_dtype)

        if spec.mode == "fake_act" and spec.quantize_act and spec.a_bits < 16:
            x = _act_fake_quant_conv(x, spec)

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=strides, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.features,), self.param_dtype)
            y = y + bias.astype(y.dtype)
        return y


class GroupNorm(nn.Module):
    """GroupNorm over the channel (last) axis, f32 statistics."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), self.param_dtype)
        # Lane-friendly formulation: reduce per-channel first (keeps the
        # channel dim on the 128 lanes, no whole-tensor relayout), then
        # group-sum the tiny (B, C) stats.  The textbook
        # reshape-to-(B,S,G,C/G) splits the lane dim (e.g. 320 -> 32x10)
        # and forces a relayout of the full activation (bench_gn.py).
        b = x.shape[0]
        cpg = c // self.num_groups
        xf = x.astype(jnp.float32).reshape(b, -1, c)
        n = xf.shape[1] * cpg
        s = jnp.sum(xf, axis=1)                   # (B, C)
        sq = jnp.sum(xf * xf, axis=1)             # (B, C) — same read pass
        gs = jnp.sum(s.reshape(b, self.num_groups, cpg), axis=-1)
        gsq = jnp.sum(sq.reshape(b, self.num_groups, cpg), axis=-1)
        mean = gs / n
        # one-pass E[x^2]-mean^2 can go slightly negative on
        # near-constant large-magnitude inputs (catastrophic
        # cancellation); clamp before rsqrt
        var = jnp.maximum(gsq / n - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)
        mu_c = jnp.repeat(mean, cpg, axis=-1)[:, None, :]
        inv_c = jnp.repeat(inv, cpg, axis=-1)[:, None, :]
        out = (xf - mu_c) * inv_c * scale + bias
        return out.reshape(x.shape).astype(self.dtype)


class LayerNorm(nn.Module):
    """LayerNorm with optional affine params, f32 statistics.

    return_params_only=True declares and returns (scale, bias) without
    computing — used to fold the norm into a following packed kernel."""

    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_params_only: bool = False):
        c = x.shape[-1]
        if return_params_only:
            assert self.use_scale and self.use_bias
            return (self.param("scale", nn.initializers.ones_init(), (c,),
                               self.param_dtype),
                    self.param("bias", nn.initializers.zeros_init(), (c,),
                               self.param_dtype))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            y = y * self.param("scale", nn.initializers.ones_init(), (c,), self.param_dtype)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros_init(), (c,), self.param_dtype)
        return y.astype(self.dtype)


class RMSNorm(nn.Module):
    """plus_one selects the Gemma convention: the stored weight is a
    zero-centered offset and the output multiplies (1 + w) — the case
    the reference's scale_ln_fcs special-cases (scale.py:96-99)."""

    epsilon: float = 1e-6
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    plus_one: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        init = (nn.initializers.zeros_init() if self.plus_one
                else nn.initializers.ones_init())
        scale = self.param("scale", init, (c,), self.param_dtype)
        xf = x.astype(jnp.float32)
        y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.epsilon)
        return (y * (scale + 1.0 if self.plus_one else scale)).astype(self.dtype)


class ScaledActivation(nn.Module):
    """Divides an activation's output per-channel by a learned scale —
    AWQ's gelu->fc migration target (reference: awq/modules/act.py via
    scale.py:65-68)."""

    act_fn: Callable = nn.gelu

    @nn.compact
    def __call__(self, x):
        scales = self.param("scales", nn.initializers.ones_init(),
                            (x.shape[-1],), jnp.float32)
        return (self.act_fn(x) / scales.astype(x.dtype)).astype(x.dtype)
