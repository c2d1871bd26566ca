"""Augmentation op tests: phase vocoder invariants, resample, filters, masks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drsa_audio_tpu.ops.stft import stft, istft
from drsa_audio_tpu.ops.augment import (
    phase_vocoder, linear_resample, pitch_shift, gain_db, add_noise,
    delay, reverb, lowpass, highpass, time_freq_mask, single_mask, adjust_size,
)


def test_phase_vocoder_rate_one_is_identity(rng):
    x = rng.standard_normal(16000).astype(np.float32)
    spec = stft(jnp.asarray(x), 480, 240)
    n_time = spec.shape[-1]
    out, valid = phase_vocoder(spec, 1.0, 240, n_time)
    assert int(valid) == n_time
    np.testing.assert_allclose(np.abs(np.asarray(out)), np.abs(np.asarray(spec)),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("rate", [0.8, 1.25])
def test_phase_vocoder_preserves_tone_frequency(rate):
    sr, n_fft, hop = 16000, 480, 240
    t = np.arange(sr) / sr
    freq = 1000.0
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)
    spec = stft(jnp.asarray(x), n_fft, hop)
    out_frames = int(spec.shape[-1] / 0.8) + 2
    out, valid = phase_vocoder(spec, rate, hop, out_frames)
    out = np.asarray(out)
    valid = int(valid)
    assert abs(valid - int(np.ceil(spec.shape[-1] / rate))) <= 1
    mag = np.abs(out[:, 2:valid - 2])
    peak_bins = mag.argmax(axis=0)
    expect_bin = freq / (sr / n_fft)
    assert np.all(np.abs(peak_bins - expect_bin) <= 1)


def test_linear_resample_identity_and_halfrate():
    x = jnp.asarray(np.arange(100, dtype=np.float32))
    out, valid = linear_resample(x, 1.0, 100)
    np.testing.assert_allclose(np.asarray(out)[:99], np.arange(99), atol=1e-5)
    out2, valid2 = linear_resample(x, 2.0, 50)
    np.testing.assert_allclose(np.asarray(out2)[:49], np.arange(0, 98, 2), atol=1e-4)


def test_pitch_shift_moves_tone():
    sr = 16000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    out = np.asarray(pitch_shift(jnp.asarray(x), 12.0, 480, 240))
    assert out.shape == x.shape
    # dominant frequency should roughly double (one octave up)
    spec = np.abs(np.fft.rfft(out[2000:14000] * np.hanning(12000)))
    f = np.fft.rfftfreq(12000, 1 / sr)
    peak = f[spec.argmax()]
    assert 800 < peak < 960, peak


def test_gain_and_noise(rng):
    x = jnp.asarray(rng.standard_normal(1000).astype(np.float32))
    y = np.asarray(gain_db(x, -6.0))
    np.testing.assert_allclose(y, np.asarray(x) * 10 ** (-0.3), rtol=1e-5)
    z = np.asarray(add_noise(x, jax.random.PRNGKey(0), 0.1))
    assert z.shape == x.shape
    assert not np.allclose(z, np.asarray(x))


def test_delay_adds_shifted_copy():
    x = np.zeros(1000, np.float32)
    x[100] = 1.0
    out = np.asarray(delay(jnp.asarray(x), 10, 16000, volume_factor=0.5))
    assert out[100] == 1.0
    assert abs(out[260] - 0.5) < 1e-6  # 10ms @ 16k = 160 samples


def test_filters_attenuate_bands():
    sr = 16000
    t = np.arange(sr) / sr
    low_tone = np.sin(2 * np.pi * 100 * t).astype(np.float32)
    high_tone = np.sin(2 * np.pi * 6000 * t).astype(np.float32)
    x = low_tone + high_tone

    lp = np.asarray(lowpass(jnp.asarray(x), 1000.0, sr))
    spec = np.abs(np.fft.rfft(lp))
    f = np.fft.rfftfreq(sr, 1 / sr)
    assert spec[np.argmin(np.abs(f - 100))] > 10 * spec[np.argmin(np.abs(f - 6000))]

    hp = np.asarray(highpass(jnp.asarray(x), 1000.0, sr))
    spec = np.abs(np.fft.rfft(hp))
    assert spec[np.argmin(np.abs(f - 6000))] > 10 * spec[np.argmin(np.abs(f - 100))]


def test_reverb_shape(rng):
    x = jnp.asarray(rng.standard_normal(16000).astype(np.float32))
    out = np.asarray(reverb(x, jax.random.PRNGKey(1), 16000))
    assert out.shape == (16000,)


def test_masks(rng):
    mel = jnp.ones((1, 128, 128))
    out = np.asarray(time_freq_mask(mel, jax.random.PRNGKey(0), 40, 40))
    assert out.shape == (1, 128, 128)
    assert (out == 0).any() and (out == 1).any()
    mel2 = jnp.ones((1, 64, 64))
    out2 = np.asarray(single_mask(mel2, jax.random.PRNGKey(1), 10))
    assert (out2 == 0).any()


def test_adjust_size_pad_and_crop(rng):
    mel = jnp.asarray(rng.standard_normal((1, 4, 10)).astype(np.float32))
    # pad: valid 6 -> width 10, inserted block appears contiguously
    padded = jnp.where(jnp.arange(10) < 6, mel, 0.0)
    out = np.asarray(adjust_size(padded, 10, 6, jax.random.PRNGKey(0)))
    assert out.shape == (1, 4, 10)
    np.testing.assert_allclose(np.sort(out.ravel()),
                               np.sort(np.asarray(padded).ravel()), atol=1e-6)
    # crop: valid 10 -> width 8 keeps first 8 columns
    out2 = np.asarray(adjust_size(mel, 8, 10, jax.random.PRNGKey(1)))
    np.testing.assert_allclose(out2, np.asarray(mel)[..., :8], atol=1e-6)
