"""Sonification tests: blur, mask, NNLS inversion quality, full round trip."""

import numpy as np
import jax.numpy as jnp
import pytest

from drsa_audio_tpu.xai.sonify.mel2audio import (
    Mel2Audio, gaussian_blur, gaussian_kernel1d, generate_mask, mel_to_stft_nnls,
)
from drsa_audio_tpu.ops.mel import mel_filterbank
from drsa_audio_tpu.ops.frontend import FrontendConfig
from drsa_audio_tpu.data.toydata import generate_sample


def test_gaussian_kernel_normalized():
    k = gaussian_kernel1d(5, 1.0)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    assert k[2] == k.max()


def test_blur_preserves_mean(rng):
    img = jnp.asarray(np.abs(rng.standard_normal((16, 16))).astype(np.float32))
    out = np.asarray(gaussian_blur(img, 5, 1.0))
    assert out.shape == (16, 16)
    np.testing.assert_allclose(out.mean(), np.asarray(img).mean(), rtol=0.05)


def test_generate_mask_thresholds(rng):
    hm = rng.standard_normal((64, 64)).astype(np.float32) * 0.01
    hm[16:32, 16:32] = 5.0  # strong region survives the percentile cut
    mask = np.asarray(generate_mask(jnp.asarray(hm), percentile=50))
    assert mask.min() >= 0
    # the far-away quiet region is strongly suppressed; the strong region kept
    assert np.all(mask[48:, 48:] < 0.05)
    assert mask[20:28, 20:28].min() > 1.0


def test_nnls_inversion_accuracy(rng):
    """fb^T S_true -> mel; NNLS recovers a magnitude whose mel re-projection
    matches closely."""
    cfg = FrontendConfig.for_case("toy")
    n_freq = cfg.n_fft // 2 + 1
    fb = jnp.asarray(mel_filterbank(n_freq, cfg.n_mels, cfg.sample_rate))
    S_true = np.abs(rng.standard_normal((n_freq, 30))).astype(np.float32)
    mel = np.asarray(fb).T @ S_true
    S = np.asarray(mel_to_stft_nnls(jnp.asarray(mel), fb, 200))
    mel_rec = np.asarray(fb).T @ S
    rel = np.abs(mel_rec - mel).mean() / (np.abs(mel).mean() + 1e-9)
    assert rel < 0.02, rel


def test_full_sonification_roundtrip(rng):
    """Unmasked round trip on a real toy waveform retains the dominant
    spectral content (the reference's transform_mel self-check)."""
    wav, _ = generate_sample(np.random.default_rng(0), "class1",
                             concept_idcs=(3,))
    m2a = Mel2Audio(case="toy", nnls_iters=150)
    mel, phase = m2a.transform_audio(wav)
    rec = np.asarray(m2a.transform_mel(mel, phase))
    n = min(len(rec), len(wav))
    # compare magnitude spectra of original vs reconstruction
    W = np.abs(np.fft.rfft(wav[:n]))
    R = np.abs(np.fft.rfft(rec[:n]))
    corr = np.corrcoef(W, R)[0, 1]
    assert corr > 0.9, corr


def test_make_audios_shapes(rng):
    wav, _ = generate_sample(np.random.default_rng(1), "class2")
    K = 2
    info = {
        "standard_heatmaps": np.abs(rng.standard_normal((1, 1, 64, 64))).astype(np.float32),
        "subspace_heatmaps": np.abs(rng.standard_normal((1, K, 64, 64))).astype(np.float32),
    }
    m2a = Mel2Audio(case="toy", nnls_iters=30)
    audios = m2a.make_audios(info, wav, num_concepts=K)
    assert len(audios) == K + 1
    for a in audios:
        assert np.all(np.isfinite(a))
        assert a.ndim == 1
