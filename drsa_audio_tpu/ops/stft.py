"""STFT / iSTFT primitives for TPU.

Semantics match the reference front-end (torchaudio.transforms.Spectrogram with
power=None — reference cxai/utils/dataloading.py:63-67): periodic Hann window of
length ``n_fft``, ``center=True`` with reflect padding, one-sided FFT, no
normalization.

Design notes (TPU-first):
  * Framing is a strided gather; XLA lowers it to an efficient dynamic-slice
    loop fused with the window multiply.
  * The FFT itself goes through XLA's native TPU FFT. For the fused
    frame->FFT->|.|->mel->log pipeline there is also a GEMM formulation
    (`stft_mag_matmul`) that rides the MXU: |STFT| computed via two real
    matmuls with the DFT basis — preferable when fusing with the mel matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n_fft: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (matches torch.hann_window(periodic=True))."""
    n = np.arange(n_fft)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))
    return jnp.asarray(w, dtype=dtype)


def _frame_signal(x: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Center-pad (reflect) and slice into overlapping frames.

    Args:
        x: waveform with shape [..., time].
    Returns:
        frames with shape [..., n_frames, n_fft].
    """
    pad = n_fft // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    length = x.shape[-1]
    n_frames = 1 + (length - n_fft) // hop_length
    starts = np.arange(n_frames) * hop_length
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    return x[..., idx]


@functools.partial(jax.jit, static_argnums=(1, 2))
def stft(x: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Complex one-sided STFT.

    Args:
        x: waveform [..., time].
    Returns:
        complex spectrogram [..., n_fft // 2 + 1, n_frames].
    """
    frames = _frame_signal(x, n_fft, hop_length)
    frames = frames * hann_window(n_fft, dtype=frames.dtype)
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)


@functools.partial(jax.jit, static_argnums=(1, 2))
def stft_magnitude(x: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """|STFT| via FFT path: [..., n_freq, n_frames]."""
    return jnp.abs(stft(x, n_fft, hop_length))


def dft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag one-sided DFT basis matrices, each [n_fft, n_fft//2+1].

    Built in float64 and cast to float32 so the GEMM path agrees with the FFT
    path to float32 round-off.
    """
    n_freq = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_freq)[None, :]
    ang = -2.0 * np.pi * t * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.partial(jax.jit, static_argnums=(1, 2))
def stft_mag_matmul(x: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """|STFT| as two MXU matmuls (GEMM-native DFT).

    Equivalent to :func:`stft_magnitude`; preferred inside fused pipelines
    where the subsequent mel projection is also a matmul.
    """
    frames = _frame_signal(x, n_fft, hop_length)
    frames = frames * hann_window(n_fft, dtype=frames.dtype)
    cos_b, sin_b = dft_basis(n_fft)
    re = jnp.matmul(frames, jnp.asarray(cos_b), preferred_element_type=jnp.float32)
    im = jnp.matmul(frames, jnp.asarray(sin_b), preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)
    return jnp.swapaxes(mag, -1, -2)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def istft(spec: jnp.ndarray, n_fft: int, hop_length: int, length: int | None = None) -> jnp.ndarray:
    """Inverse STFT with Hann-squared overlap-add normalization.

    Matches librosa.istft / torch.istft semantics for center=True inputs
    (reference cxai/xai/explain/audiogen.py:145).

    Args:
        spec: complex spectrogram [..., n_freq, n_frames].
    Returns:
        waveform [..., time].
    """
    n_frames = spec.shape[-1]
    window = hann_window(n_fft, dtype=jnp.float32)
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * window

    out_len = n_fft + hop_length * (n_frames - 1)
    starts = np.arange(n_frames) * hop_length
    idx = starts[:, None] + np.arange(n_fft)[None, :]  # [n_frames, n_fft]

    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, n_frames, n_fft))

    def overlap_add(fr):
        sig = jnp.zeros((out_len,), dtype=fr.dtype)
        return sig.at[idx.reshape(-1)].add(fr.reshape(-1))

    sig = jax.vmap(overlap_add)(flat)
    win_sq = jnp.zeros((out_len,), dtype=jnp.float32)
    win_sq = win_sq.at[idx.reshape(-1)].add(jnp.tile(window * window, (n_frames,)))
    sig = sig / jnp.where(win_sq > 1e-11, win_sq, 1.0)

    pad = n_fft // 2
    sig = sig[:, pad:]
    if length is not None:
        sig = sig[:, :length]
    else:
        sig = sig[:, : out_len - 2 * pad]
    return sig.reshape(batch_shape + sig.shape[-1:])
