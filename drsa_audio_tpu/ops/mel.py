"""HTK mel filterbank and mel-spectrogram projection.

Matches torchaudio.transforms.MelScale defaults (reference
cxai/utils/dataloading.py:69-73): f_min=0, f_max=sample_rate/2, norm=None,
mel_scale='htk'. The projection is a single matmul over the frequency axis —
exactly the shape the MXU wants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel(f):
    """HTK mel scale."""
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """Triangular HTK mel filterbank, shape [n_freqs, n_mels].

    Built in float64 then cast, mirroring torchaudio.functional.melscale_fbanks
    (norm=None, mel_scale='htk').
    """
    f_max = float(sample_rate) / 2 if f_max is None else f_max
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)

    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)

    f_diff = f_pts[1:] - f_pts[:-1]                      # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]         # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


@functools.partial(jax.jit, static_argnums=(1, 2))
def mel_scale(spec_mag: jnp.ndarray, n_mels: int, sample_rate: int) -> jnp.ndarray:
    """Project magnitude spectrogram [..., n_freq, time] onto mel bins.

    Returns [..., n_mels, time].
    """
    n_freqs = spec_mag.shape[-2]
    fb = jnp.asarray(mel_filterbank(n_freqs, n_mels, sample_rate))
    # [..., time, n_freq] @ [n_freq, n_mels] -> [..., time, n_mels]
    out = jnp.matmul(
        jnp.swapaxes(spec_mag, -1, -2), fb, preferred_element_type=jnp.float32
    )
    return jnp.swapaxes(out, -1, -2)
