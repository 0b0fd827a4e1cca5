from qdm_tpu.api.pipeline import (  # noqa: F401
    BaseDiffusionPipeline, StableDiffusion1_x, StableDiffusionXL)
