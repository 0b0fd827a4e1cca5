"""Flax Whisper encoder-decoder — the speech-recognition model behind
the reference's librispeech WER harness (evaluation/eval_utils.py:61-115
runs it through the opaque HF `pipeline(...)`; here it is a first-class
quantizable model like the LLM/diffusion families).

Module names mirror HF keys (model.encoder.layers.N.self_attn.q_proj ->
encoder/layers_N/self_attn/q_proj) so the greedy longest-prefix loader
maps real checkpoints.  Every linear is a QDense consulting the
QuantPlan, so RTN/SmoothQuant/AWQ and the packed int8/int4 kernels
apply to ASR exactly as to the other families.

TPU-native decode: cross-attention K/V are projected ONCE per utterance
(the encoder output is fixed), self-attention uses the head-major
(B, h, T, d) static cache, and the greedy loop runs inside one
lax.while_loop dispatch (api/speech.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from qdm_tpu.models.layers import LayerNorm, NO_PLAN, QConv, QDense
from qdm_tpu.quant.plan import QuantPlan

Dtype = Any


@dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int = 51865
    num_mel_bins: int = 80
    d_model: int = 512                 # whisper-base
    encoder_layers: int = 6
    decoder_layers: int = 6
    encoder_attention_heads: int = 8
    decoder_attention_heads: int = 8
    encoder_ffn_dim: int = 2048
    decoder_ffn_dim: int = 2048
    max_source_positions: int = 1500
    max_target_positions: int = 448
    # special tokens (HF whisper defaults)
    decoder_start_token_id: int = 50258     # <|startoftranscript|>
    eos_token_id: int = 50257               # <|endoftext|>

    @property
    def head_dim(self) -> int:
        return self.d_model // self.encoder_attention_heads


WHISPER_BASE = WhisperConfig()
WHISPER_SMALL = WhisperConfig(d_model=768, encoder_layers=12,
                              decoder_layers=12, encoder_attention_heads=12,
                              decoder_attention_heads=12,
                              encoder_ffn_dim=3072, decoder_ffn_dim=3072)


def tiny_whisper_config() -> WhisperConfig:
    return WhisperConfig(vocab_size=64, num_mel_bins=8, d_model=32,
                         encoder_layers=2, decoder_layers=2,
                         encoder_attention_heads=2, decoder_attention_heads=2,
                         encoder_ffn_dim=64, decoder_ffn_dim=64,
                         max_source_positions=16, max_target_positions=32,
                         decoder_start_token_id=1, eos_token_id=2)


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed encoder positional table."""
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)],
                          axis=1).astype(np.float32)


class WhisperAttention(nn.Module):
    """MHA with whisper conventions: k_proj has no bias, q pre-scaled.

    setup-style so one param tree serves full attention, cached decode
    self-attention, and cross-attention from precomputed K/V."""

    heads: int
    d_model: int
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN
    causal: bool = False

    def setup(self):
        dm = self.d_model
        self.q_proj = QDense(dm, dtype=self.dtype, plan=self.plan)
        self.k_proj = QDense(dm, use_bias=False, dtype=self.dtype,
                             plan=self.plan)
        self.v_proj = QDense(dm, dtype=self.dtype, plan=self.plan)
        self.out_proj = QDense(dm, dtype=self.dtype, plan=self.plan)

    def project_kv(self, src):
        """Cross-attention K/V (B, h, S, d) — computed once per
        utterance, outside the decode loop."""
        h = self.heads
        d = self.d_model // h
        b, sk, _ = src.shape
        k = self.k_proj(src)
        v = self.v_proj(src)
        return (k.reshape(b, sk, h, d).transpose(0, 2, 1, 3),
                v.reshape(b, sk, h, d).transpose(0, 2, 1, 3))

    def __call__(self, x, kv_states=None, kv_cache=None, cache_index=None,
                 cross_kv=None):
        h, dm = self.heads, self.d_model
        d = dm // h
        b, s, _ = x.shape
        q = self.q_proj(x).reshape(b, s, h, d) * (d ** -0.5)

        if cross_kv is not None:
            kt, vt = cross_kv                     # (B, h, S_enc, d)
            mask = None
        else:
            kt, vt = self.project_kv(x if kv_states is None else kv_states)
            mask = None
            if kv_cache is not None:
                ck, cv = kv_cache                 # (B, h, T, d)
                ck = jax.lax.dynamic_update_slice(
                    ck, kt.astype(ck.dtype), (0, 0, cache_index, 0))
                cv = jax.lax.dynamic_update_slice(
                    cv, vt.astype(cv.dtype), (0, 0, cache_index, 0))
                kv_cache = (ck, cv)
                kt, vt = ck, cv
                k_pos = jnp.arange(ck.shape[2])[None, :]
                mask = (k_pos <= (cache_index
                                  + jnp.arange(s)[:, None]))[None, None]
            elif self.causal:
                mask = jnp.tril(jnp.ones((s, s), bool))[None, None]

        logits = jnp.einsum("bqhd,bhkd->bhqk", q, kt).astype(jnp.float32)
        if mask is not None:
            logits = jnp.where(mask, logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bqhd", probs, vt).reshape(b, s, dm)
        return self.out_proj(out), kv_cache


class WhisperEncoderLayer(nn.Module):
    config: WhisperConfig
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    def setup(self):
        cfg = self.config
        self.self_attn_layer_norm = LayerNorm(dtype=self.dtype)
        self.self_attn = WhisperAttention(cfg.encoder_attention_heads,
                                          cfg.d_model, dtype=self.dtype,
                                          plan=self.plan)
        self.final_layer_norm = LayerNorm(dtype=self.dtype)
        self.fc1 = QDense(cfg.encoder_ffn_dim, dtype=self.dtype,
                          plan=self.plan)
        self.fc2 = QDense(cfg.d_model, dtype=self.dtype, plan=self.plan)

    def __call__(self, x):
        h, _ = self.self_attn(self.self_attn_layer_norm(x))
        x = x + h
        h = self.fc2(nn.gelu(self.fc1(self.final_layer_norm(x))))
        return x + h


class WhisperDecoderLayer(nn.Module):
    config: WhisperConfig
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    def setup(self):
        cfg = self.config
        heads = cfg.decoder_attention_heads
        self.self_attn_layer_norm = LayerNorm(dtype=self.dtype)
        self.self_attn = WhisperAttention(heads, cfg.d_model,
                                          dtype=self.dtype, plan=self.plan,
                                          causal=True)
        self.encoder_attn_layer_norm = LayerNorm(dtype=self.dtype)
        self.encoder_attn = WhisperAttention(heads, cfg.d_model,
                                             dtype=self.dtype, plan=self.plan)
        self.final_layer_norm = LayerNorm(dtype=self.dtype)
        self.fc1 = QDense(cfg.decoder_ffn_dim, dtype=self.dtype,
                          plan=self.plan)
        self.fc2 = QDense(cfg.d_model, dtype=self.dtype, plan=self.plan)

    def __call__(self, x, enc=None, self_cache=None, cache_index=None,
                 cross_kv=None):
        h, self_cache = self.self_attn(self.self_attn_layer_norm(x),
                                       kv_cache=self_cache,
                                       cache_index=cache_index)
        x = x + h
        h, _ = self.encoder_attn(self.encoder_attn_layer_norm(x),
                                 kv_states=enc, cross_kv=cross_kv)
        x = x + h
        h = self.fc2(nn.gelu(self.fc1(self.final_layer_norm(x))))
        return x + h, self_cache

    def cross_kv(self, enc):
        return self.encoder_attn.project_kv(enc)


class WhisperEncoder(nn.Module):
    config: WhisperConfig
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    def setup(self):
        cfg = self.config
        # conv1d as NHWC conv with H=1 (kernel (1, k, in, out)): rides
        # the same QConv/XLA conv path as the diffusion models
        self.conv1 = QConv(cfg.d_model, kernel_size=(1, 3), strides=(1, 1),
                           padding=((0, 0), (1, 1)), dtype=self.dtype,
                           plan=self.plan)
        self.conv2 = QConv(cfg.d_model, kernel_size=(1, 3), strides=(1, 2),
                           padding=((0, 0), (1, 1)), dtype=self.dtype,
                           plan=self.plan)
        self.embed_positions = nn.Embed(
            cfg.max_source_positions, cfg.d_model,
            embedding_init=lambda key, shape, dtype: jnp.asarray(
                sinusoids(*shape)))
        self.layers = [WhisperEncoderLayer(cfg, dtype=self.dtype,
                                           plan=self.plan)
                       for _ in range(cfg.encoder_layers)]
        self.layer_norm = LayerNorm(dtype=self.dtype)

    def __call__(self, mel):
        """mel (B, n_frames, n_mels) -> (B, n_frames//2, d_model)."""
        x = mel.astype(self.dtype)[:, None]          # (B, 1, T, mel)
        x = nn.gelu(self.conv1(x))
        x = nn.gelu(self.conv2(x))                   # (B, 1, T//2, d)
        x = x[:, 0]
        pos = self.embed_positions.embedding[: x.shape[1]]
        x = x + pos[None].astype(self.dtype)
        for layer in self.layers:
            x = layer(x)
        return self.layer_norm(x)


class WhisperDecoder(nn.Module):
    config: WhisperConfig
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.d_model,
                                     embedding_init=nn.initializers.normal(0.02))
        self.embed_positions = nn.Embed(cfg.max_target_positions, cfg.d_model,
                                        embedding_init=nn.initializers.normal(0.02))
        self.layers = [WhisperDecoderLayer(cfg, dtype=self.dtype,
                                           plan=self.plan)
                       for _ in range(cfg.decoder_layers)]
        self.layer_norm = LayerNorm(dtype=self.dtype)

    def __call__(self, tokens, enc=None, self_caches=None, cache_index=0,
                 cross_kvs=None):
        positions = cache_index + jnp.arange(tokens.shape[1])
        x = (self.embed_tokens.embedding[tokens]
             + self.embed_positions.embedding[positions][None]
             ).astype(self.dtype)
        new_caches = [] if self_caches is not None else None
        for i, layer in enumerate(self.layers):
            x, c = layer(x, enc=enc,
                         self_cache=None if self_caches is None
                         else self_caches[i],
                         cache_index=cache_index,
                         cross_kv=None if cross_kvs is None
                         else cross_kvs[i])
            if new_caches is not None:
                new_caches.append(c)
        x = self.layer_norm(x)
        # tied lm_head (whisper's proj_out shares embed_tokens)
        logits = (x.astype(jnp.float32)
                  @ self.embed_tokens.embedding.T.astype(jnp.float32))
        return logits, new_caches

    def cross_kvs(self, enc):
        return [layer.cross_kv(enc) for layer in self.layers]


class WhisperModel(nn.Module):
    """Encoder-decoder; apply with method='encode' / 'decode' /
    'cross_kvs' for the staged TPU decode path, or plain __call__ for
    the full (teacher-forced) forward used by calibration and tests."""

    config: WhisperConfig
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    def setup(self):
        self.encoder = WhisperEncoder(self.config, dtype=self.dtype,
                                      plan=self.plan)
        self.decoder = WhisperDecoder(self.config, dtype=self.dtype,
                                      plan=self.plan)

    def encode(self, mel):
        return self.encoder(mel)

    def decode(self, tokens, enc=None, self_caches=None, cache_index=0,
               cross_kvs=None):
        return self.decoder(tokens, enc=enc, self_caches=self_caches,
                            cache_index=cache_index, cross_kvs=cross_kvs)

    def cross_kvs(self, enc):
        return self.decoder.cross_kvs(enc)

    def __call__(self, mel, tokens):
        enc = self.encoder(mel)
        logits, _ = self.decoder(tokens, enc=enc)
        return logits

    def init_cache(self, batch: int, max_len: int):
        cfg = self.config
        h = cfg.decoder_attention_heads
        shape = (batch, h, max_len, cfg.d_model // h)
        return [(jnp.zeros(shape, self.dtype), jnp.zeros(shape, self.dtype))
                for _ in range(cfg.decoder_layers)]
