"""Log-mel spectrogram frontend for the speech (Whisper) path.

The reference's librispeech WER harness shells the whole feature
pipeline out to the HF `pipeline(task="automatic-speech-recognition")`
(evaluation/eval_utils.py:61-115); here the frontend is explicit and
jittable: framing + Hann window + rFFT + Slaney-style mel filterbank +
Whisper's log10/clamp/shift normalization, so feature extraction runs
on-device next to the encoder instead of on the host.

Whisper constants: 16 kHz audio, 400-sample window, 160 hop, 80 mel
bins, 30 s chunks (3000 frames).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
N_MELS = 80
CHUNK_SECONDS = 30
N_SAMPLES = SAMPLE_RATE * CHUNK_SECONDS          # 480000
N_FRAMES = N_SAMPLES // HOP_LENGTH               # 3000


def hz_to_mel(f):
    """Slaney mel scale (librosa default, what Whisper's filterbank
    uses): linear below 1 kHz, logarithmic above."""
    f = np.asarray(f, np.float64)
    mel = f / (200.0 / 3.0)
    log_region = f >= 1000.0
    mel = np.where(log_region,
                   15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / (np.log(6.4) / 27.0),
                   mel)
    return mel


def mel_to_hz(m):
    m = np.asarray(m, np.float64)
    f = m * (200.0 / 3.0)
    log_region = m >= 15.0
    return np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)


@functools.lru_cache(maxsize=4)
def mel_filterbank(n_mels: int = N_MELS, n_fft: int = N_FFT,
                   sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """(n_mels, n_fft//2+1) Slaney-normalized triangular filterbank."""
    fmax = sample_rate / 2
    mels = np.linspace(hz_to_mel(0.0), hz_to_mel(fmax), n_mels + 2)
    freqs = mel_to_hz(mels)                          # (n_mels+2,)
    fft_freqs = np.linspace(0, fmax, n_fft // 2 + 1)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        lo, ctr, hi = freqs[i], freqs[i + 1], freqs[i + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
        # Slaney area normalization
        fb[i] *= 2.0 / (hi - lo)
    return fb.astype(np.float32)


def log_mel_spectrogram(audio, n_mels: int = N_MELS) -> jnp.ndarray:
    """audio (B, n_samples) or (n_samples,) float32 in [-1, 1] ->
    (B, n_frames, n_mels) Whisper-normalized log-mel features.

    Matches whisper's audio.py semantics: reflect-pad n_fft//2, Hann
    window, power spectrum, mel projection, log10 clamped at 1e-10,
    dynamic-range clamp to max-8, then (x+4)/4."""
    x = jnp.asarray(audio, jnp.float32)
    if x.ndim == 1:
        x = x[None]
    b, n = x.shape
    pad = N_FFT // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = n // HOP_LENGTH
    # frame: (B, n_frames, N_FFT) gather — static shapes, XLA turns
    # this into a strided load
    idx = (jnp.arange(n_frames)[:, None] * HOP_LENGTH
           + jnp.arange(N_FFT)[None, :])                     # (F, 400)
    frames = x[:, idx]                                        # (B, F, 400)
    window = jnp.asarray(np.hanning(N_FFT + 1)[:-1], jnp.float32)
    spec = jnp.fft.rfft(frames * window, axis=-1)
    power = jnp.abs(spec) ** 2                                # (B, F, 201)
    fb = jnp.asarray(mel_filterbank(n_mels))
    mel = jnp.einsum("bfk,mk->bfm", power, fb)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec,
                           jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0)
    return (log_spec + 4.0) / 4.0


def pad_or_trim(audio: np.ndarray, length: int = N_SAMPLES) -> np.ndarray:
    """Host-side: cut/zero-pad a 1-D waveform to the 30 s chunk the
    encoder's static shapes expect."""
    audio = np.asarray(audio, np.float32).reshape(-1)
    if audio.shape[0] >= length:
        return audio[:length]
    return np.pad(audio, (0, length - audio.shape[0]))
