"""Typed quantization config.

Feature-parity with the reference's ``AwqConfig`` dataclass
(reference: models/_config.py:8-119), including the HF
``quantization_config`` dict round-trip (keys ``bits/vbits/act_bits/
group_size``, models/_config.py:97-119).  Extended with the calibration
and method fields that the reference passes as loose kwargs on
``quantize()`` (models/base.py:216-404).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class CalibConfig:
    """Calibration settings (reference: quantizer_SQ.py:329-339,
    utils/calib_data.py:174-213)."""

    dataset: str = "mscoco"          # prompt source for diffusion calib
    n_samples: int = 96              # reference uses 96 MSCOCO prompts
    batch_size: int = 8
    n_steps: int = 50                # denoising steps during calibration
    guidance_scale: float = 7.5
    seed: int = 42                   # fixed-seed latents (calib_data.py:205-211)
    max_seq_len: int = 512           # LLM text-calib block length

    def to_dict(self) -> Dict:
        return dataclasses.asdict(self)


@dataclass
class QuantConfig:
    """All quantization hyperparameters.

    Field names follow the reference ``AwqConfig`` (models/_config.py:10-23)
    so configs written by the reference load unchanged.
    """

    quant_method: str = "awq"            # "rtn" | "smooth" | "awq" | "codebook"
    zero_point: bool = True              # asymmetric weight quant (quantizer.py:172-181)
    q_group_size: int = 128              # group size along in-features
    w_bit: int = 4                       # weight bits (linear)
    wv_bit: int = 4                      # weight bits (conv, reference 'wv_bit')
    a_bit: int = 16                      # activation bits (16 = no act quant)
    version: str = "fake_act"            # "fake" | "fake_act" | "real" (packed kernels)
    weight_quant_type: str = "group"     # "group" | "per_channel" | "per_tensor"
    weight_quant_conv_type: str = "per_channel"
    act_quant_type: str = "per_token"    # "per_token" | "per_tensor"
    act_quant_conv_type: str = "per_channel"
    act_quant_conv_group_size: int = 1
    quantize_act: bool = False
    # real-kernel backend for w8a8: "auto" picks the pure-XLA int8 path
    # when activations use calibrated static scales (fastest on v5e,
    # bench_xla_int8.py) and the Pallas fused kernel otherwise;
    # "pallas"/"xla" force one.  The reference's analogue is the
    # GEMM/GEMV/marlin/exllama `version` switch (models/base.py:1623-1638).
    kernel_backend: str = "auto"
    # fuse q/k/v (and gate/up) into single wide projections before
    # packing (serving-plan extension; see the fused-QKV int8 bisect in
    # BENCH_NOTES.md — narrow unfused int8 matmuls pay per-matmul
    # act-quant passes).  Params are stored fused when True.
    fuse_projections: bool = False
    # headroom multiplier on calibrated static activation scales:
    # calibration absmax is exact for the calib set, so unseen
    # activations clip hard at margin 1.0; >1 trades a little rounding
    # noise for clipping robustness
    static_act_margin: float = 1.0
    # VAE-decoder convs upgrade 'static' conv act quant to the
    # per-input-channel folded scheme (the per-tensor scheme loses
    # ~15 dB PSNR on the decoder's channel dynamic range — BENCH_NOTES
    # round 2; reference per-channel conv acts: fake_quant.py:123-131).
    # False keeps the per-tensor scheme (ablation/bench baseline).
    vae_per_channel_acts: bool = True
    # per-denoise-step static act scales (DiTAS-style extension,
    # PAPERS.md): calibration keeps the per-step absmax instead of the
    # reference's mean-over-steps collapse (mean_of_dict,
    # StableDiffusion1_x.py:104-112); the sampler gathers one scalar
    # per layer per step from a tiny LUT.  False = exact reference
    # semantics (the default).
    act_per_step_scales: bool = False
    modules_to_not_convert: Optional[List[str]] = None
    # SmoothQuant migration strength: reference uses 0.5 for LLMs
    # (quantizer_SQ.py:287) and 0.80 for diffusion (quantizer_SQ.py:349).
    alpha: float = 0.80
    # which pipeline components to quantize (models/base.py:216-404 kwargs
    # quantUnet/quantTextEncoder/quantVAE/quantTransformer)
    components: List[str] = field(default_factory=lambda: ["unet", "transformer"])
    calib: CalibConfig = field(default_factory=CalibConfig)

    def __post_init__(self):
        self.version = self.version.lower()
        self.quant_method = self.quant_method.lower()
        if isinstance(self.calib, dict):
            self.calib = CalibConfig(**self.calib)

    # ---- dict round-trips -------------------------------------------------

    @classmethod
    def from_dict(cls, quant_config: Optional[Dict] = None) -> "QuantConfig":
        """Mirrors AwqConfig.from_dict (models/_config.py:26-33)."""
        if not quant_config:
            return cls()
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in quant_config.items() if k in known})

    def to_dict(self) -> Dict:
        d = dataclasses.asdict(self)
        return d

    def to_transformers_dict(self) -> Dict:
        """HF `quantization_config` serialization
        (models/_config.py:97-107)."""
        return {
            "quant_method": self.quant_method,
            "zero_point": self.zero_point,
            "group_size": self.q_group_size,
            "bits": self.w_bit,
            "vbits": self.wv_bit,
            "act_bits": self.a_bit,
            "version": self.version,
            "modules_to_not_convert": self.modules_to_not_convert,
        }

    @classmethod
    def from_transformers_dict(cls, d: Dict) -> "QuantConfig":
        """Inverse of `to_transformers_dict` (models/_config.py:109-119)."""
        return cls.from_dict(
            {
                "quant_method": d.get("quant_method") or "awq",
                "zero_point": d.get("zero_point", True),
                "q_group_size": d.get("group_size", 128),
                "w_bit": d.get("bits", 4),
                "wv_bit": d.get("vbits", 4),
                "a_bit": d.get("act_bits", 16),
                "version": d.get("version", "fake_act"),
                "modules_to_not_convert": d.get("modules_to_not_convert"),
            }
        )

    # ---- file round-trips ---------------------------------------------------

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def load(cls, path: str) -> "QuantConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    @classmethod
    def from_pretrained(cls, save_dir: str) -> "QuantConfig":
        """Read a quant config from a saved checkpoint dir
        (models/_config.py:36-84 semantics, local-only)."""
        p = os.path.join(save_dir, "quant_config.json")
        if os.path.exists(p):
            return cls.load(p)
        cfg = os.path.join(save_dir, "config.json")
        if os.path.exists(cfg):
            with open(cfg) as f:
                loaded = json.load(f)
            qc = loaded.get("quantization_config")
            if qc is not None:
                return cls.from_transformers_dict(qc)
        return cls()
