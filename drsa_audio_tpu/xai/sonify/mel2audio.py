"""Heatmap sonification: mask the mel, invert to magnitude STFT, apply the
original phase, inverse STFT.

TPU-native redesign of the reference Mel2Audio (cxai/xai/explain/
audiogen.py:15-206): the Gaussian blur is a small depthwise conv, the
mel -> |STFT| inversion is a jittable projected-gradient NNLS (librosa's
mel_to_stft solves the same nonneg least squares on the host), and the iSTFT
is the XLA overlap-add from drsa_audio_tpu.ops.stft. The whole
heatmap -> audio path is one compiled program, vmappable over the K+1
heatmaps (the reference loops per heatmap, audiogen.py:99-110).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from drsa_audio_tpu.ops.stft import istft, stft
from drsa_audio_tpu.ops.mel import mel_filterbank
from drsa_audio_tpu.ops.frontend import (
    FrontendConfig, peak_normalize, adjust_vol, logmel_full,
)


def gaussian_kernel1d(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2
    k = np.exp(-(x**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, size: int = 5, sigma: float = 1.0):
    """2D Gaussian blur with reflect padding
    (torchvision.transforms.GaussianBlur semantics, audiogen.py:49)."""
    k1 = gaussian_kernel1d(size, sigma)
    k2 = jnp.asarray(np.outer(k1, k1))
    pad = size // 2
    orig_shape = img.shape
    x = img.reshape((-1, 1) + img.shape[-2:])  # [b, 1, h, w]
    x = jnp.pad(x, [(0, 0), (0, 0), (pad, pad), (pad, pad)], mode="reflect")
    out = jax.lax.conv_general_dilated(
        x, k2[None, None], window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out.reshape(orig_shape)


def generate_mask(heatmap: jnp.ndarray, percentile: float | None = 50,
                  blur_size: int = 5, sigma: float = 1.0) -> jnp.ndarray:
    """ReLU -> percentile threshold -> Gaussian blur (audiogen.py:172-192)."""
    pos = jnp.maximum(heatmap, 0.0)
    if percentile:
        thresh = jnp.percentile(pos, percentile)
        pos = pos * (pos > thresh)
    return gaussian_blur(pos, blur_size, sigma)


@functools.partial(jax.jit, static_argnums=(2, 3))
def mel_to_stft_nnls(mel: jnp.ndarray, fb: jnp.ndarray, iters: int = 80,
                     power: float = 1.0) -> jnp.ndarray:
    """Invert the mel projection: find S >= 0 with fb^T S ~= mel.

    mel: [n_mels, t]; fb: [n_freq, n_mels]. Projected-gradient NNLS with
    Lipschitz step (replaces librosa.feature.inverse.mel_to_stft's host NNLS,
    audiogen.py:136-143). Returns magnitude [n_freq, t] (power=1).
    """
    A = fb.T                                   # [n_mels, n_freq]
    # init: scaled transpose solution
    S = jnp.maximum(A.T @ mel, 0.0)
    AtA = A.T @ A
    L = jnp.linalg.norm(AtA, ord=2) if False else jnp.sum(jnp.abs(AtA), axis=1).max()
    step = 1.0 / L

    def body(_, S):
        grad = A.T @ (A @ S - mel)
        return jnp.maximum(S - step * grad, 0.0)

    S = jax.lax.fori_loop(0, iters, body, S)
    if power != 1.0:
        S = S ** (1.0 / power)
    return S


class Mel2Audio:
    """Waveform generation from (masked) mel spectrograms
    (reference Mel2Audio, audiogen.py:15-206; Mel2AudioToy is the same class
    with case='toy')."""

    def __init__(self, case: str = "gtzan", blur_kernel: int = 5,
                 sigma: float = 1.0, nnls_iters: int = 80):
        self.config = FrontendConfig.for_case(case)
        self.blur_kernel = blur_kernel
        self.sigma = sigma
        self.nnls_iters = nnls_iters
        self.fb = jnp.asarray(mel_filterbank(
            self.config.n_fft // 2 + 1, self.config.n_mels,
            self.config.sample_rate))

    def transform_audio(self, wav):
        """wav -> (mel, phase) of the original clip (audiogen.py:148-158)."""
        wav = jnp.asarray(wav)
        mag, phase, mel = logmel_full(wav, self.config)
        return mel.squeeze(), phase.squeeze()

    def transform(self, heatmap, orig_mel, phase, percentile=50):
        """Mask mel with blurred thresholded heatmap -> NNLS invert ->
        apply phase -> iSTFT (audiogen.py:114-146)."""
        mask = generate_mask(jnp.asarray(heatmap).squeeze(), percentile,
                             self.blur_kernel, self.sigma)
        mel = jnp.asarray(orig_mel) * mask
        mag = mel_to_stft_nnls(mel, self.fb, self.nnls_iters)
        spec = mag * jnp.asarray(phase)
        return istft(spec[None], self.config.n_fft, self.config.hop_length)[0]

    def transform_audio_from_file(self, path_to_sample: str,
                                  startpoint: float | None = None):
        """Load a clip from disk, slice at ``startpoint`` seconds, and return
        (mel, phase) (reference audiogen.py:160-170)."""
        from drsa_audio_tpu.runtime.loader import load_audio
        from drsa_audio_tpu.ops.frontend import get_slice_at
        wav, sr = load_audio(path_to_sample)
        assert sr == self.config.sample_rate
        wav = jnp.asarray(wav[0])
        if startpoint is not None and self.config.slice_length:
            wav = get_slice_at(wav, self.config.slice_length, startpoint,
                               self.config.sample_rate)
        return self.transform_audio(wav)

    def transform_mel(self, mel, phase):
        """Round-trip quality check: invert an unmasked mel
        (audiogen.py:194-206)."""
        mag = mel_to_stft_nnls(jnp.asarray(mel), self.fb, self.nnls_iters)
        spec = mag * jnp.asarray(phase)
        return istft(spec[None], self.config.n_fft, self.config.hop_length)[0]

    def make_audios(self, sample_info, original_audio, num_concepts: int = 4,
                    percentile: float = 50, sample_idx: int = 0):
        """Standard + K subspace explanation audios, peak-normalized and
        loudness-matched to the original (audiogen.py:53-112)."""
        original_audio = jnp.asarray(original_audio).reshape(-1)
        original_audio = peak_normalize(original_audio)
        mel, phase = self.transform_audio(original_audio)

        audios = []
        std_map = sample_info["standard_heatmaps"][sample_idx]
        wav_std = peak_normalize(self.transform(std_map, mel, phase, percentile=50))
        audios.append(adjust_vol(original_audio, wav_std))
        for k in range(num_concepts):
            hm = sample_info["subspace_heatmaps"][sample_idx][k]
            wav_k = peak_normalize(self.transform(hm, mel, phase, percentile=percentile))
            audios.append(adjust_vol(original_audio, wav_k))
        return [np.asarray(a) for a in audios]


Mel2AudioToy = functools.partial(Mel2Audio, case="toy")
