"""Golden tests for the DSP front-end against torch.stft / torchaudio formulas.

torchaudio is not installed, but torchaudio.transforms.Spectrogram is a thin
wrapper around torch.stft (center=True, reflect pad, periodic Hann, one-sided,
no normalization), and MelScale's HTK filterbank formula is reproduced here in
float64 numpy as an independent oracle.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from drsa_audio_tpu.ops.stft import stft, stft_magnitude, stft_mag_matmul, istft, hann_window
from drsa_audio_tpu.ops.mel import mel_filterbank, mel_scale, hz_to_mel, mel_to_hz
from drsa_audio_tpu.ops.frontend import (
    FrontendConfig,
    logmel,
    get_slices,
    peak_normalize,
    rms_normalize,
    adjust_vol,
    slice_hop_samples,
)


def torch_spectrogram(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """torchaudio.transforms.Spectrogram(power=None) oracle via torch.stft."""
    xt = torch.tensor(x, dtype=torch.float32)
    spec = torch.stft(
        xt,
        n_fft=n_fft,
        hop_length=hop,
        win_length=n_fft,
        window=torch.hann_window(n_fft, periodic=True),
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    return spec.numpy()


def oracle_mel_fbank(n_freqs, n_mels, sr):
    """torchaudio.functional.melscale_fbanks(norm=None, mel_scale='htk')."""
    all_freqs = np.linspace(0, sr // 2, n_freqs)
    m_min = 2595.0 * np.log10(1.0 + 0.0 / 700.0)
    m_max = 2595.0 * np.log10(1.0 + (sr / 2) / 700.0)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return np.maximum(0.0, np.minimum(down, up))


@pytest.mark.parametrize("n_fft,hop,length", [(800, 360, 48000), (480, 240, 16000)])
def test_stft_matches_torch(rng, n_fft, hop, length):
    x = rng.standard_normal((2, length)).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(x), n_fft, hop))
    ref = torch_spectrogram(x, n_fft, hop)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-3)


def test_stft_matmul_path_agrees(rng):
    x = rng.standard_normal((48000,)).astype(np.float32)
    a = np.asarray(stft_magnitude(jnp.asarray(x), 800, 360))
    b = np.asarray(stft_mag_matmul(jnp.asarray(x), 800, 360))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("n_freqs,n_mels,sr", [(401, 128, 16000), (241, 64, 16000)])
def test_mel_filterbank_matches_torchaudio_formula(n_freqs, n_mels, sr):
    ours = mel_filterbank(n_freqs, n_mels, sr)
    ref = oracle_mel_fbank(n_freqs, n_mels, sr)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_hz_mel_roundtrip():
    f = np.array([0.0, 100.0, 440.0, 8000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-9)


def test_logmel_end_to_end_shapes_and_values(rng):
    cfg = FrontendConfig.for_case("toy")
    x = rng.standard_normal((3, 16000)).astype(np.float32)
    out = np.asarray(logmel(jnp.asarray(x), cfg))
    assert out.shape == (3, 64, 64)

    # oracle: torch stft -> |.| -> fbank -> log10 -> clamp -> crop
    ref_spec = np.abs(torch_spectrogram(x, cfg.n_fft, cfg.hop_length))
    fb = oracle_mel_fbank(cfg.n_fft // 2 + 1, cfg.n_mels, cfg.sample_rate)
    ref_mel = np.einsum("bft,fm->bmt", ref_spec, fb)
    ref = np.log10(ref_mel + 1e-7)
    ref = np.maximum(ref, -4.0)[..., 1 : cfg.width + 1]
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-3)


def test_gtzan_logmel_shape(rng):
    cfg = FrontendConfig.for_case("gtzan")
    x = rng.standard_normal((1, 48000)).astype(np.float32)  # 3 s at 16 kHz
    out = logmel(jnp.asarray(x), cfg)
    assert out.shape == (1, 128, 128)


def test_istft_roundtrip(rng):
    x = rng.standard_normal((16000,)).astype(np.float32)
    spec = stft(jnp.asarray(x), 480, 240)
    rec = np.asarray(istft(spec, 480, 240, length=16000))
    np.testing.assert_allclose(rec, x, rtol=1e-3, atol=1e-3)


def test_get_slices_matches_unfold_semantics(rng):
    sr = 16000
    wav = rng.standard_normal((1, 30 * sr)).astype(np.float32)
    out = np.asarray(get_slices(jnp.asarray(wav), 3, 8, sr))
    assert out.shape == (8, 1, 3 * sr)
    hop = slice_hop_samples(3, 8, sr)
    assert hop == int(3.7 * sr)
    for k in range(8):
        np.testing.assert_array_equal(out[k, 0], wav[0, k * hop : k * hop + 3 * sr])


def test_peak_and_rms_normalizers(rng):
    wav = (rng.standard_normal((4, 1000)) * 3).astype(np.float32)
    pn = np.asarray(peak_normalize(jnp.asarray(wav)))
    assert np.allclose(np.abs(pn).max(axis=-1), 1.0, atol=1e-6)
    rn = np.asarray(rms_normalize(jnp.asarray(wav), rms_db=0.0))
    np.testing.assert_allclose(np.sqrt((rn**2).mean(axis=-1)), 1.0, rtol=1e-5)


def test_adjust_vol_matches_rms(rng):
    a = rng.standard_normal(1000).astype(np.float32)
    b = (rng.standard_normal(1000) * 0.1).astype(np.float32)
    out = np.asarray(adjust_vol(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(
        np.sqrt((out**2).mean()), np.sqrt((a**2).mean()), rtol=1e-5
    )
