from qdm_tpu.models.layers import QDense, QConv, GroupNorm, LayerNorm, RMSNorm  # noqa: F401
from qdm_tpu.models.unet import UNet2DCondition, UNetConfig, SD15_UNET, SDXL_UNET, tiny_unet_config  # noqa: F401
from qdm_tpu.models.clip_text import CLIPTextModel, CLIPTextConfig, SD15_TEXT, SDXL_TEXT2, tiny_clip_config  # noqa: F401
from qdm_tpu.models.vae import AutoencoderKL, VAEConfig, SD_VAE, tiny_vae_config  # noqa: F401
