"""Whisper ASR pipeline — closes the reference's speech-eval loop
(evaluation/eval_utils.py:61-115 builds an HF
`pipeline("automatic-speech-recognition")` and never exposes the model;
here the model is a first-class quantizable citizen with the same
lifecycle as CausalLM/BaseDiffusionPipeline):

    asr = WhisperASR.from_pretrained(path)      # HF whisper checkpoint
    asr.quantize(quant_config)                  # RTN/w8a8 plans
    text_ids = asr.transcribe(audio)            # greedy, device-side
    eval_librispeech(make_transcribe_fn(asr, detok), dataset)

TPU-native decode: log-mel frontend is jitted (utils/audio.py), the
encoder runs once, cross-attention K/V are projected once, and the
greedy loop is ONE lax.while_loop dispatch with a static self-KV cache
— no per-token host round trips (decisive through the tunneled chip).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from qdm_tpu.config import QuantConfig
from qdm_tpu.models import whisper as whisper_lib
from qdm_tpu.quant import apply as qapply
from qdm_tpu.quant.plan import QuantPlan, spec_from_config


class WhisperASR:
    """Whisper encoder-decoder with the quantize lifecycle."""

    def __init__(self):
        self.config: Optional[whisper_lib.WhisperConfig] = None
        self.params: Optional[dict] = None
        self.plan = QuantPlan()
        self.quant_config: Optional[QuantConfig] = None
        self.dtype = jnp.bfloat16
        self.is_quantized = False
        self._jit_cache = {}

    # ------------------------------------------------------------------ build

    @property
    def model(self) -> whisper_lib.WhisperModel:
        return whisper_lib.WhisperModel(config=self.config, dtype=self.dtype,
                                        plan=self.plan)

    @classmethod
    def from_config(cls, config: Optional[whisper_lib.WhisperConfig] = None,
                    dtype=jnp.float32, seed: int = 0) -> "WhisperASR":
        self = cls()
        self.dtype = dtype
        self.config = config or whisper_lib.tiny_whisper_config()
        cfg = self.config
        rng = np.random.default_rng(seed)
        mel = jnp.zeros((1, 2 * cfg.max_source_positions, cfg.num_mel_bins),
                        jnp.float32)
        toks = jnp.zeros((1, 4), jnp.int32)
        shapes = jax.eval_shape(
            lambda: self.model.init(jax.random.PRNGKey(0), mel, toks))["params"]

        def init_leaf(path, leaf):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if name in ("kernel", "embedding"):
                fan_in = int(np.prod(leaf.shape[:-1])) or 1
                return jnp.asarray(
                    rng.standard_normal(leaf.shape, np.float32)
                    / np.sqrt(fan_in), leaf.dtype)
            if name == "scale":
                return jnp.ones(leaf.shape, leaf.dtype)
            return jnp.zeros(leaf.shape, leaf.dtype)

        self.params = jax.tree_util.tree_map_with_path(init_leaf, shapes)
        # the fixed sinusoidal encoder positions (not random)
        self.params["encoder"]["embed_positions"]["embedding"] = jnp.asarray(
            whisper_lib.sinusoids(cfg.max_source_positions, cfg.d_model))
        return self

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16) -> "WhisperASR":
        """Load an HF whisper checkpoint dir (WhisperForConditionalGeneration
        layout; proj_out is tied to embed_tokens and skipped)."""
        from qdm_tpu.api import loader

        self = cls()
        self.dtype = dtype
        hf = loader.load_json(os.path.join(path, "config.json"))
        self.config = whisper_lib.WhisperConfig(
            vocab_size=hf["vocab_size"],
            num_mel_bins=hf["num_mel_bins"],
            d_model=hf["d_model"],
            encoder_layers=hf["encoder_layers"],
            decoder_layers=hf["decoder_layers"],
            encoder_attention_heads=hf["encoder_attention_heads"],
            decoder_attention_heads=hf["decoder_attention_heads"],
            encoder_ffn_dim=hf["encoder_ffn_dim"],
            decoder_ffn_dim=hf["decoder_ffn_dim"],
            max_source_positions=hf.get("max_source_positions", 1500),
            max_target_positions=hf.get("max_target_positions", 448),
            decoder_start_token_id=hf.get("decoder_start_token_id", 50258),
            eos_token_id=hf.get("eos_token_id", 50257))
        cfg = self.config
        mel = jnp.zeros((1, 2 * cfg.max_source_positions, cfg.num_mel_bins),
                        jnp.float32)
        shapes = jax.eval_shape(
            lambda: self.model.init(jax.random.PRNGKey(0), mel,
                                    jnp.zeros((1, 4), jnp.int32)))["params"]
        sd = loader.load_safetensors_dir(path)
        params, missing, _ = loader.convert_torch_state_dict(
            sd, shapes, strip_prefixes=("model.",))
        if missing:
            raise ValueError(
                f"missing {len(missing)} params e.g. {missing[:5]}")
        self.params = params
        return self

    # --------------------------------------------------------------- quantize

    def quantize(self, quant_config=None, quantType: str = "rtn"):
        """Weight quantization via the shared plan machinery.  RTN
        (weight-only or w8a8 dynamic) covers the ASR serving case; the
        encoder conv stem stays fp (its cost is negligible next to the
        attention stack).  Smoothing/AWQ for whisper would need its
        scaling-group topology — documented extension."""
        cfg = quant_config if isinstance(quant_config, QuantConfig) \
            else QuantConfig.from_dict(quant_config or {})
        cfg.quant_method = quantType.lower()
        self.quant_config = cfg
        spec = spec_from_config(cfg)
        plan = QuantPlan(default=spec).with_rule("conv", None)
        if cfg.version == "real" or spec.mode.startswith(("w8a8", "w4")):
            self.params = qapply.pack_params(self.params, plan)
        self.plan = plan
        self.is_quantized = True
        self._jit_cache.clear()
        return self

    # -------------------------------------------------------------- transcribe

    def transcribe_ids(self, audio, max_new_tokens: int = 128,
                       forced_tokens: Optional[Sequence[int]] = None
                       ) -> np.ndarray:
        """audio: (n,) or (B, n) float waveform at 16 kHz -> (B, T)
        int32 token ids (eos-padded).  Greedy; the full mel->encoder->
        cross-KV->while_loop pipeline is one jitted call."""
        from qdm_tpu.utils import audio as audio_lib

        cfg = self.config
        a = np.asarray(audio, np.float32)
        if a.ndim == 1:
            a = a[None]
        # static chunk length: whisper's 30 s window scaled down for
        # tiny test configs (2 mel frames per encoder position)
        n_samples = min(audio_lib.N_SAMPLES,
                        2 * cfg.max_source_positions * audio_lib.HOP_LENGTH)
        a = np.stack([audio_lib.pad_or_trim(row, n_samples) for row in a])
        start = list(forced_tokens) if forced_tokens is not None \
            else [cfg.decoder_start_token_id]
        batch = a.shape[0]
        key = (batch, max_new_tokens, len(start))
        run = self._jit_cache.get(key)
        if run is None:
            model = self.model
            mel_bins = cfg.num_mel_bins
            s0 = len(start)
            max_len = s0 + max_new_tokens + 1
            eos = cfg.eos_token_id

            def _run(params, wav, start_toks):
                mel = audio_lib.log_mel_spectrogram(wav, mel_bins)
                v = {"params": params}
                enc = model.apply(v, mel, method="encode")
                ckv = model.apply(v, enc, method="cross_kvs")
                caches = model.init_cache(batch, max_len)
                lg, caches = model.apply(v, start_toks, self_caches=caches,
                                         cache_index=0, cross_kvs=ckv,
                                         method="decode")
                cur = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
                buf = jnp.full((batch, max_new_tokens), eos, jnp.int32)
                done = jnp.zeros((batch,), bool)

                def cond(st):
                    i, _, _, done, _ = st
                    return (i < max_new_tokens) & ~jnp.all(done)

                def body(st):
                    i, cur, caches, done, buf = st
                    cur = jnp.where(done, eos, cur)
                    buf = jax.lax.dynamic_update_slice(buf, cur[:, None],
                                                       (0, i))
                    done = done | (cur == eos)
                    lg, caches = model.apply(v, cur[:, None],
                                             self_caches=caches,
                                             cache_index=s0 + i,
                                             cross_kvs=ckv, method="decode")
                    nxt = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
                    return (i + 1, nxt, caches, done, buf)

                st = (jnp.int32(0), cur, caches, done, buf)
                st = jax.lax.while_loop(cond, body, st)
                return st[4]

            run = self._jit_cache[key] = jax.jit(_run)
        toks = np.asarray(start, np.int32)[None].repeat(batch, 0)
        return np.asarray(run(self.params, jnp.asarray(a), jnp.asarray(toks)))

    def transcribe(self, audio, detokenize: Optional[Callable] = None,
                   max_new_tokens: int = 128,
                   forced_tokens: Optional[Sequence[int]] = None):
        """-> list of strings (via ``detokenize(ids)->str``) or the raw
        id array when no detokenizer is given."""
        ids = self.transcribe_ids(audio, max_new_tokens, forced_tokens)
        if detokenize is None:
            return ids
        eos = self.config.eos_token_id
        out = []
        for row in ids:
            stop = np.nonzero(row == eos)[0]
            out.append(detokenize(row[: stop[0]] if len(stop) else row))
        return out

    # -------------------------------------------------------------- save/load

    def save_quantized(self, save_dir: str):
        from qdm_tpu.utils.serialization import save_params

        os.makedirs(save_dir, exist_ok=True)
        save_params(self.params, os.path.join(save_dir, "params.safetensors"))
        if self.quant_config:
            self.quant_config.save(os.path.join(save_dir, "quant_config.json"))
        with open(os.path.join(save_dir, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(self.config), f)

    @classmethod
    def from_quantized(cls, save_dir: str, dtype=jnp.bfloat16) -> "WhisperASR":
        from qdm_tpu.utils.serialization import load_params

        self = cls()
        self.dtype = dtype
        with open(os.path.join(save_dir, "config.json")) as f:
            self.config = whisper_lib.WhisperConfig(**json.load(f))
        qc_path = os.path.join(save_dir, "quant_config.json")
        if os.path.exists(qc_path):
            self.quant_config = QuantConfig.load(qc_path)
            spec = spec_from_config(self.quant_config)
            self.plan = QuantPlan(default=spec).with_rule("conv", None)
            self.is_quantized = True
        self.params = load_params(os.path.join(save_dir, "params.safetensors"))
        return self


def make_transcribe_fn(asr: WhisperASR, detokenize: Callable,
                       **kw) -> Callable[[np.ndarray], str]:
    """Adapter for evaluation.eval_utils.eval_librispeech — the
    end-to-end WER loop the reference runs through the HF pipeline."""

    def fn(waveform: np.ndarray) -> str:
        return asr.transcribe(waveform, detokenize=detokenize, **kw)[0]

    return fn
