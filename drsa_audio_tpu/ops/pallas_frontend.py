"""Fused Pallas log-mel kernel.

The hot front-end op: framed+windowed waveform blocks -> GEMM-native DFT
(two MXU matmuls with the real/imag one-sided basis) -> |.| -> mel projection
(third matmul) -> log10 -> clamp, all in one VMEM-resident kernel so the
401-bin magnitude spectrogram never round-trips to HBM.

Equivalent to ops.frontend.logmel (torchaudio Spectrogram+MelScale semantics,
reference dataloading.py:63-73,138-176); exactness is tested against the XLA
path in tests/test_pallas_frontend.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drsa_audio_tpu.ops.stft import dft_basis, hann_window, _frame_signal
from drsa_audio_tpu.ops.mel import mel_filterbank
from drsa_audio_tpu.ops.frontend import FrontendConfig

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _logmel_kernel(frames_ref, cos_ref, sin_ref, fb_ref, out_ref):
    """One grid step: [T_BLK, n_fft_pad] frames -> [T_BLK, n_mels] log-mels."""
    frames = frames_ref[:]
    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)
    mel = jnp.dot(mag, fb_ref[:], preferred_element_type=jnp.float32)
    # log10(x + 1e-7) clamped at -4 (reference dataloading.py:159-161)
    out_ref[:] = jnp.maximum(
        jnp.log(mel + 1e-7) * np.float32(1.0 / np.log(10.0)), -4.0)


@functools.partial(jax.jit, static_argnums=(1, 2))
def pallas_logmel(wav: jnp.ndarray, config: FrontendConfig,
                  interpret: bool = False) -> jnp.ndarray:
    """Fused log-mel: [..., time] waveform -> [..., n_mels, width].

    Drop-in for ops.frontend.logmel (including the [1 : width+1] time crop).
    """
    n_fft, hop = config.n_fft, config.hop_length
    n_freq = n_fft // 2 + 1
    n_mels = config.n_mels

    frames = _frame_signal(wav, n_fft, hop)          # [..., T, n_fft]
    frames = frames * hann_window(n_fft, frames.dtype)
    batch_shape = frames.shape[:-2]
    T = frames.shape[-2]
    frames = frames.reshape(-1, n_fft)               # [N, n_fft]
    N = frames.shape[0]

    # pad the contraction and output dims to lane multiples (zero rows/cols
    # leave the math exact)
    n_fft_p = _round_up(n_fft, _LANE)
    n_freq_p = _round_up(n_freq, _LANE)
    n_mels_p = _round_up(n_mels, _LANE)
    T_BLK = 128
    N_p = _round_up(N, T_BLK)

    frames_p = jnp.zeros((N_p, n_fft_p), jnp.float32).at[:N, :n_fft].set(frames)

    cos_b, sin_b = dft_basis(n_fft)                  # [n_fft, n_freq]
    fb = mel_filterbank(n_freq, n_mels, config.sample_rate)  # [n_freq, n_mels]
    cos_p = np.zeros((n_fft_p, n_freq_p), np.float32)
    sin_p = np.zeros((n_fft_p, n_freq_p), np.float32)
    fb_p = np.zeros((n_freq_p, n_mels_p), np.float32)
    cos_p[:n_fft, :n_freq] = cos_b
    sin_p[:n_fft, :n_freq] = sin_b
    fb_p[:n_freq, :n_mels] = fb

    out = pl.pallas_call(
        _logmel_kernel,
        grid=(N_p // T_BLK,),
        in_specs=[
            pl.BlockSpec((T_BLK, n_fft_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft_p, n_freq_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft_p, n_freq_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_freq_p, n_mels_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T_BLK, n_mels_p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_p, n_mels_p), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * N_p * n_fft_p * n_freq_p * 2 + 2 * N_p * n_freq_p * n_mels_p,
            bytes_accessed=4 * (N_p * n_fft_p + 2 * n_fft_p * n_freq_p
                                + n_freq_p * n_mels_p + N_p * n_mels_p),
            transcendentals=N_p * n_mels_p,
        ),
        interpret=interpret,
    )(frames_p, jnp.asarray(cos_p), jnp.asarray(sin_p), jnp.asarray(fb_p))

    mel = out[:N, :n_mels].reshape(batch_shape + (T, n_mels))
    mel = jnp.swapaxes(mel, -1, -2)                  # [..., n_mels, T]
    return mel[..., 1:config.width + 1]
