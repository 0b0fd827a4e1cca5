"""Quantization plan: static mapping from parameter paths to layer specs.

This replaces the reference's in-place nn.Module surgery
(quantizer_SQ.py:456-516 swapping WxAxLinear/WxAxConv2d via setattr) with
a *static, hashable* plan consulted by every QDense/QConv at trace time.
The plan is part of the model definition, so changing it (e.g. fake ->
real kernels) just rebuilds the cheap module tree while the params
pytree is transformed separately (qdm_tpu/quant/apply.py).

Pattern matching is substring-based, mirroring the reference's
``exclude_layers_to_not_quantize`` (utils/module.py:59-67).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass(frozen=True)
class LayerQuantSpec:
    """Per-layer quantization behavior.

    mode:
      "none"     - plain bf16/f32 layer
      "fake"     - weights were fake-quantized (pytree transform);
                   runtime behaves like "none"
      "fake_act" - like "fake" plus runtime activation fake-quant
                   (WxAxLinear.forward semantics, fake_quant.py:214-225)
      "w4a16"    - packed int4 weights, Pallas dequant-matmul
      "w8a8"     - int8 weights + per-token int8 activations, Pallas
                   int8 matmul
      "w8a8_xla" - int8 weights + int8 activations expressed in plain
                   jnp (XLA int8 MXU dot): with act_quant="static"
                   (calibrated per-tensor scales) XLA fuses the
                   quantize into the producer and the dequant epilogue
                   into the matmul, beating bf16 1.3-1.8x on v5e
                   (bench_xla_int8.py) with zero Pallas boundaries
    """

    mode: str = "none"
    w_bits: int = 8
    a_bits: int = 16
    group_size: int = 128
    zero_point: bool = False
    weight_quant: str = "group"      # group | per_channel | per_tensor
    act_quant: str = "per_token"     # per_token | per_tensor | per_channel | per_group | static
    act_group_size: int = 1
    quantize_act: bool = False
    # fake-quantize the layer OUTPUT too — the reference enables this
    # for q/k/v projections feeding the attention bmm
    # (quantize_bmm_input, quantizer_SQ.py:463/487)
    quantize_output: bool = False

    @property
    def is_real(self) -> bool:
        return self.mode in ("w4a16", "w4a16_xla", "w4a8", "w8a8",
                             "w8a8_xla", "w8a16")


NO_QUANT = LayerQuantSpec()


@dataclass(frozen=True)
class QuantPlan:
    """Ordered substring rules; the LAST matching rule wins.  Paths are
    '/'-joined linen module paths, e.g.
    'down_blocks_0/attentions_0/transformer_blocks_0/attn1/to_q'."""

    rules: Tuple[Tuple[str, LayerQuantSpec], ...] = ()
    default: LayerQuantSpec = NO_QUANT
    capture_stats: bool = False    # sow per-layer input absmax ('calib' col)
    capture_inputs: bool = False   # sow sampled input rows ('calib_x' col, AWQ)
    capture_rows: int = 64
    # sow per-layer input Gram matrices X^T X ('calib_h' col, GPTQ):
    # fixed (C, C) size summed across calls/batches — the EXACT
    # full-calibration Hessian in bounded memory (row capture at 64
    # rows starves H: rank << C makes error compensation point into
    # unsampled directions and LOSE to RTN — measured)
    capture_gram: bool = False
    # sow SEQUENCE-shaped input blocks ('calib_s' col): the first
    # capture_seq batch rows of the full (B, S, C) input, at layers
    # whose path contains a capture_seq_on pattern.  The AWQ attention
    # -group search needs sequence structure to evaluate the
    # reference's whole-attention-module loss (quantizer.py:605-676) —
    # token-sampled rows cannot attend.
    capture_seq: int = 0
    capture_seq_on: Tuple[str, ...] = ("q_proj", "q_a_proj")
    fuse_qkv: bool = False         # fused q/k/v projections (fused_utils.py:45-142)
    fuse_ln: bool = False          # fold LayerNorms into the following packed matmul
    # run self-attention BMMs on the int8 MXU (real-kernel version of
    # the reference's quantize_bmm_input, quantizer_SQ.py:463,487)
    int8_bmm: bool = False

    def spec_for(self, path: str) -> LayerQuantSpec:
        spec = self.default
        for pattern, s in self.rules:
            if pattern in path:
                spec = s
        return spec

    def with_rule(self, pattern: str, spec: Optional[LayerQuantSpec]) -> "QuantPlan":
        return dataclasses.replace(
            self, rules=self.rules + ((pattern, spec if spec is not None else NO_QUANT),))

    def with_capture(self, capture: bool = True, inputs: bool = False,
                     gram: bool = False, seq: int = 0) -> "QuantPlan":
        return dataclasses.replace(self, capture_stats=capture,
                                   capture_inputs=inputs,
                                   capture_gram=gram,
                                   capture_seq=seq)

    def with_default(self, spec: LayerQuantSpec) -> "QuantPlan":
        return dataclasses.replace(self, default=spec)


def spec_from_config(cfg, conv: bool = False, mode: Optional[str] = None) -> LayerQuantSpec:
    """Build a LayerQuantSpec from a QuantConfig (models/_config.py
    field semantics)."""
    if mode is None:
        if cfg.version == "real":
            # w_bit governs the int8 path for BOTH dense and conv
            # (wv_bit is the reference's *vision-section* width,
            # quantizer.py:343-349 — not a conv override)
            w_bits = cfg.w_bit
            if cfg.quantize_act and cfg.a_bit <= 8 and w_bits == 8:
                backend = getattr(cfg, "kernel_backend", "auto")
                act_type = cfg.act_quant_conv_type if conv else cfg.act_quant_type
                use_xla = (backend == "xla" or
                           (backend == "auto" and act_type == "static"))
                mode = "w8a8_xla" if (use_xla and not conv) else "w8a8"
            elif w_bits == 8:
                mode = "w8a16"   # weight-only int8, XLA-fused dequant
            elif cfg.quantize_act and cfg.a_bit <= 8:
                mode = "w4a8"
            else:
                mode = "w4a16"
        elif cfg.version == "fake_act":
            mode = "fake_act"
        else:
            mode = "fake"
    if conv and mode in ("w4a16", "w4a8", "w8a16"):
        # int4/weight-only real kernels are linear-only; convs in those
        # configs fall back to fake quant.  w8a8 convs ARE real (XLA
        # int8 conv on the MXU).
        mode = "fake_act" if cfg.quantize_act else "fake"
    weight_quant = cfg.weight_quant_conv_type if conv else cfg.weight_quant_type
    if cfg.quant_method == "codebook" and not conv:
        # experimental k-means codebook weights (genCodeBook.py via
        # fake_quant.py:53-69 codeBookQuantInd)
        weight_quant = "codebook"
        mode = "fake_act" if cfg.quantize_act else "fake"
    return LayerQuantSpec(
        mode=mode,
        w_bits=cfg.wv_bit if conv else cfg.w_bit,
        a_bits=cfg.a_bit,
        group_size=cfg.q_group_size,
        zero_point=cfg.zero_point,
        weight_quant=weight_quant,
        act_quant=cfg.act_quant_conv_type if conv else cfg.act_quant_type,
        act_group_size=cfg.act_quant_conv_group_size,
        quantize_act=cfg.quantize_act and cfg.a_bit < 16,
    )
