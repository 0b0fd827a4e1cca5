from qdm_tpu.api.pipeline import (  # noqa: F401
    BaseDiffusionPipeline, StableDiffusion1_x, StableDiffusionXL,
    StableDiffusion3_5)
from qdm_tpu.api.causal_lm import CausalLM  # noqa: F401
from qdm_tpu.api.serve import DecodeEngine  # noqa: F401
from qdm_tpu.api.batcher import ContinuousBatcher  # noqa: F401
from qdm_tpu.api.speech import WhisperASR, make_transcribe_fn  # noqa: F401
