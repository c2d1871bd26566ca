"""Fused waveform -> log-mel front-end and waveform utilities.

Re-implements the reference Loader pipeline (cxai/utils/dataloading.py:138-176)
and waveform helpers (cxai/utils/sound.py:8-121) as pure, jittable JAX
functions. The whole clip -> slice -> peak-norm -> STFT -> mel -> log10 ->
clamp -> crop path compiles into ONE program that can be vmapped over clips
and pjit-sharded over the batch axis.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from drsa_audio_tpu.ops.stft import stft, stft_mag_matmul, stft_magnitude
from drsa_audio_tpu.ops.mel import mel_scale
from drsa_audio_tpu.utils.constants import AUDIO_PARAMS


def round_down(value: float, decimals: int = 1) -> float:
    """Floor to N decimals (reference cxai/utils/utilities.py:6-16)."""
    factor = 10 ** decimals
    return math.floor(value * factor) / factor


def slice_hop_samples(slice_length: int, num_chunks: int, sample_rate: int) -> int:
    """Hop between evenly spaced slices; min audio length pinned at 29 s
    (reference cxai/utils/sound.py:34)."""
    return int(round_down((29 - slice_length) / (num_chunks - 1), 1) * sample_rate)


def chunk_startpoints(slice_length: int, num_chunks: int,
                      sample_rate: int) -> np.ndarray:
    """Startpoint (seconds) of each evenly spaced chunk that ``get_slices``
    extracts — the per-chunk metadata the reference keeps for prototype
    sonification (preprocessing.py:345-370, prototypes.py:14-130)."""
    if num_chunks == 1:
        return np.zeros(1)
    hop = slice_hop_samples(slice_length, num_chunks, sample_rate)
    return np.arange(num_chunks) * hop / sample_rate


def get_slices(
    wav: jnp.ndarray,
    slice_length: int,
    num_chunks: int,
    sample_rate: int,
) -> jnp.ndarray:
    """Extract ``num_chunks`` evenly spaced windows from the first 29 s.

    Args:
        wav: [channels, time] waveform.
    Returns:
        [num_chunks, 1, window] slices (reference sound.py:31-37).
    """
    window = int(slice_length * sample_rate)
    if num_chunks == 1:
        return wav[None, :, :window]
    hop = slice_hop_samples(slice_length, num_chunks, sample_rate)
    starts = np.arange(num_chunks) * hop
    idx = starts[:, None] + np.arange(window)[None, :]
    return wav[:, : 29 * sample_rate][0][idx][:, None, :]


def get_slice_at(wav: jnp.ndarray, slice_length: int, start_point: float, sample_rate: int) -> jnp.ndarray:
    """Single window at ``start_point`` seconds (reference sound.py:38-42)."""
    window = int(slice_length * sample_rate)
    start = int(start_point * sample_rate)
    return jax.lax.dynamic_slice_in_dim(wav, start, window, axis=-1)


def peak_normalize(wav: jnp.ndarray) -> jnp.ndarray:
    """Scale to [-1, 1] by max |amplitude| over the last dim (sound.py:67-70).

    Intended-behavior divergence: silent input passes through unchanged
    instead of producing NaN (0/0) as the reference would."""
    peak = jnp.max(jnp.abs(wav), axis=-1, keepdims=True)
    return wav / jnp.where(peak > 0, peak, 1.0)


def rms_normalize(wav: jnp.ndarray, rms_db: float = 0.0) -> jnp.ndarray:
    """Scale to target RMS dB per slice (sound.py:47-64)."""
    rms = 10.0 ** (rms_db / 20.0)
    n = wav.shape[-1]
    sc = jnp.sqrt((n * rms**2) / jnp.sum(wav**2, axis=-1, keepdims=True))
    return wav * sc


def adjust_vol(reference_audio: jnp.ndarray, audio: jnp.ndarray) -> jnp.ndarray:
    """Match the RMS loudness of ``audio`` to ``reference_audio``
    (sound.py:73-102; torchaudio Vol(gain_type='amplitude') is a plain scale)."""
    def rms(sig):
        return jnp.sqrt(jnp.mean(sig**2))
    ratio = jnp.abs(rms(reference_audio) / rms(audio))
    return audio * ratio


def minmax_normalize(mel: jnp.ndarray, epsilon: float = 1e-7) -> jnp.ndarray:
    """Per-spectrogram min/max scaling to [-1, 1] (sound.py:105-121)."""
    mel_min = jnp.min(mel, axis=(-2, -1), keepdims=True)
    mel_max = jnp.max(mel, axis=(-2, -1), keepdims=True)
    return 2.0 * ((mel - mel_min) / (mel_max - mel_min + epsilon)) - 1.0


class FrontendConfig(NamedTuple):
    """Static DSP parameters for one case (reference AUDIO_PARAMS)."""
    sample_rate: int
    n_fft: int
    hop_length: int
    n_mels: int
    width: int
    slice_length: int
    num_chunks: int

    @classmethod
    def for_case(cls, case: str) -> "FrontendConfig":
        p = AUDIO_PARAMS[case]
        return cls(
            sample_rate=p["sample_rate"],
            n_fft=p["n_fft"],
            hop_length=p["hop_length"],
            n_mels=p["n_mels"],
            width=p["mel_width"],
            slice_length=p["slice_length"],
            num_chunks=p["num_chunks"],
        )


@functools.partial(jax.jit, static_argnums=(1, 2))
def logmel(wav: jnp.ndarray, config: FrontendConfig, use_matmul_dft: bool = True) -> jnp.ndarray:
    """Canonical waveform -> log-mel transform (Loader.transform_wav,
    reference dataloading.py:138-176).

    Pipeline: |STFT| -> mel projection -> log10(. + 1e-7) -> clamp(min=-4)
    -> crop time bins [1 : width + 1].

    Args:
        wav: [..., time] waveform.
    Returns:
        [..., n_mels, width] log-mel spectrogram.
    """
    if use_matmul_dft:
        mag = stft_mag_matmul(wav, config.n_fft, config.hop_length)
    else:
        mag = stft_magnitude(wav, config.n_fft, config.hop_length)
    mel = mel_scale(mag, config.n_mels, config.sample_rate)
    out = jnp.log10(mel + 1e-7)
    out = jnp.clip(out, min=-4.0)
    return out[..., 1 : config.width + 1]


@functools.partial(jax.jit, static_argnums=(1,))
def logmel_full(wav: jnp.ndarray, config: FrontendConfig):
    """transform_wav(return_all=True) equivalent: returns (magnitude, phase,
    mel) with time cropped to [:width], for sonification round-trips
    (reference dataloading.py:163-171)."""
    spec = stft(wav, config.n_fft, config.hop_length)
    mag = jnp.abs(spec)
    phase = spec / jnp.maximum(mag, 1e-16)
    mel = mel_scale(mag, config.n_mels, config.sample_rate)
    return (
        mag[..., : config.width],
        phase[..., : config.width],
        mel[..., : config.width],
    )


def load_clip_to_mels(wav: jnp.ndarray, config: FrontendConfig, startpoint: float = 0.0,
                      num_chunks: int | None = None) -> jnp.ndarray:
    """Loader.load equivalent: slice -> peak-normalize -> log-mel
    (reference dataloading.py:75-113). Decoding happens on the host
    (drsa_audio_tpu.runtime); this is the on-device part.

    Returns [num_chunks, 1, n_mels, width].
    """
    num_chunks = config.num_chunks if num_chunks is None else num_chunks
    if config.slice_length != 0:
        if num_chunks > 1:
            sl = get_slices(wav, config.slice_length, num_chunks, config.sample_rate)
        else:
            sl = get_slice_at(wav, config.slice_length, startpoint, config.sample_rate)[None]
    else:
        sl = wav[None]
    sl = peak_normalize(sl)
    mels = logmel(sl, config)
    return mels.reshape(-1, 1, config.n_mels, config.width)
