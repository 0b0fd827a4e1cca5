"""qdm_tpu — TPU-native quantization framework for diffusion models.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
maani3/Quantization---Diffusion-Models (an AutoAWQ-based PTQ toolkit for
Stable Diffusion pipelines and HF causal LMs/VLMs):

* RTN (absmax, per-tensor / per-channel / group), SmoothQuant and AWQ
  post-training quantization, plus an experimental k-means codebook
  quantizer (reference: quantize/fake_quant.py, quantize/quantizer.py,
  quantize/quantizer_SQ.py, quantize/genCodeBook.py).
* Quantization is a *pytree transform* (params -> qparams + static plan),
  not nn.Module surgery.
* Real quantized execution on TPU via Pallas W8A8 / W4A16 matmul kernels
  (replacing the reference's CUDA kernel zoo: GEMM/GEMV/Marlin/Exllama),
  with a fake-quant mode kept for parity and ablation.
* Flax ports of SD1.5 / SDXL / SD3.5 (UNet, MMDiT, CLIP text encoders,
  VAE) with the reference's public lifecycle:
  ``from_pretrained -> quantize(method, config) -> generate(prompts)``.
* Multi-chip scaling through `jax.sharding.Mesh` + XLA collectives.
"""

__version__ = "0.1.0"

from qdm_tpu.config import QuantConfig  # noqa: F401
