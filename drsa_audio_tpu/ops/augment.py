"""Waveform and spectrogram augmentations, jit-compatible with static shapes.

Replaces the reference's torchaudio / torchaudio_augmentations stack
(gtzan_dataset.py:87-167, toy_dataset.py:95-109) with JAX implementations so
augmentation runs fused with the log-mel front-end ON DEVICE inside the train
step, instead of in host DataLoader workers.

Static-shape discipline: the phase vocoder produces a fixed MAX_FRAMES output
plus a valid-length scalar; random-rate stretching therefore stays inside one
compiled program (no dynamic shapes). Known divergences from the reference
(documented, intended-behavior parity):
  * HighLowPass: biquad transfer function applied in the FFT domain
    (circular) instead of a sequential IIR scan — TPU-friendly, edge effects
    only.
  * Reverb: synthetic exponential-decay impulse response via FFT convolution
    instead of sox's reverb algorithm.
  * PitchShift: phase-vocoder stretch + linear-interp resample instead of
    sox.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- waveform

def gain_db(wav, db):
    """Gain in dB (torchaudio_augmentations.Gain)."""
    return wav * 10.0 ** (db / 20.0)


def add_noise(wav, key, noise_std_ratio):
    """Additive Gaussian noise with std = ratio * std(wav)
    (torchaudio_augmentations.Noise semantics: 'snr' is a std ratio)."""
    std = jnp.std(wav)
    noise = jax.random.normal(key, wav.shape) * (noise_std_ratio * std)
    return wav + noise


def delay(wav, delay_ms, sample_rate, volume_factor=0.5):
    """Add an attenuated delayed copy (torchaudio_augmentations.Delay)."""
    shift = (delay_ms * sample_rate) // 1000
    delayed = jnp.roll(wav, shift, axis=-1)
    mask = (jnp.arange(wav.shape[-1]) >= shift).astype(wav.dtype)
    return wav + volume_factor * delayed * mask


def reverb(wav, key, sample_rate, decay_s=0.3, wet=0.3):
    """Simple synthetic reverb: exponential-decay noise IR, FFT convolution."""
    ir_len = int(decay_s * sample_rate)
    t = jnp.arange(ir_len) / sample_rate
    ir = jax.random.normal(key, (ir_len,)) * jnp.exp(-6.0 * t / decay_s)
    ir = ir / jnp.sqrt(jnp.sum(ir**2) + 1e-9)
    n = wav.shape[-1]
    fft_len = int(2 ** np.ceil(np.log2(n + ir_len)))
    W = jnp.fft.rfft(wav, fft_len)
    H = jnp.fft.rfft(ir, fft_len)
    wet_sig = jnp.fft.irfft(W * H, fft_len)[..., :n]
    return (1 - wet) * wav + wet * wet_sig


def _biquad_coeffs_lowpass(cutoff, sample_rate, Q=0.707):
    w0 = 2 * jnp.pi * cutoff / sample_rate
    alpha = jnp.sin(w0) / (2 * Q)
    cos_w0 = jnp.cos(w0)
    b0 = (1 - cos_w0) / 2
    b1 = 1 - cos_w0
    b2 = (1 - cos_w0) / 2
    a0 = 1 + alpha
    a1 = -2 * cos_w0
    a2 = 1 - alpha
    return (b0, b1, b2), (a0, a1, a2)


def _biquad_coeffs_highpass(cutoff, sample_rate, Q=0.707):
    w0 = 2 * jnp.pi * cutoff / sample_rate
    alpha = jnp.sin(w0) / (2 * Q)
    cos_w0 = jnp.cos(w0)
    b0 = (1 + cos_w0) / 2
    b1 = -(1 + cos_w0)
    b2 = (1 + cos_w0) / 2
    a0 = 1 + alpha
    a1 = -2 * cos_w0
    a2 = 1 - alpha
    return (b0, b1, b2), (a0, a1, a2)


def _apply_biquad_fft(wav, coeffs):
    """Apply a biquad's transfer function in the frequency domain."""
    (b0, b1, b2), (a0, a1, a2) = coeffs
    n = wav.shape[-1]
    W = jnp.fft.rfft(wav, n)
    w = 2 * jnp.pi * jnp.fft.rfftfreq(n)  # normalized angular frequency
    z1 = jnp.exp(-1j * w)
    z2 = z1 * z1
    H = (b0 + b1 * z1 + b2 * z2) / (a0 + a1 * z1 + a2 * z2)
    return jnp.fft.irfft(W * H, n)


def lowpass(wav, cutoff, sample_rate):
    return _apply_biquad_fft(wav, _biquad_coeffs_lowpass(cutoff, sample_rate))


def highpass(wav, cutoff, sample_rate):
    return _apply_biquad_fft(wav, _biquad_coeffs_highpass(cutoff, sample_rate))


# ---------------------------------------------------------- phase vocoder

def phase_vocoder(spec: jnp.ndarray, rate, hop_length: int, out_frames: int):
    """Complex-spectrogram time stretch (torchaudio.functional.phase_vocoder
    semantics) with a STATIC output frame count.

    Args:
        spec: complex [..., freq, time].
        rate: stretch factor (traced scalar OK). >1 speeds up.
        out_frames: static output length; frames beyond ceil(time/rate) carry
            zero magnitude. Returns (stretched [..., freq, out_frames],
            valid_frames int32).
    """
    n_freq, n_time = spec.shape[-2], spec.shape[-1]
    phase_advance = jnp.linspace(0, np.pi * hop_length, n_freq)[..., None]

    steps = jnp.arange(out_frames) * rate                      # [T_out]
    valid = steps < n_time
    alphas = jnp.mod(steps, 1.0)
    idx0 = jnp.clip(steps.astype(jnp.int32), 0, n_time - 1)
    idx1 = jnp.clip(idx0 + 1, 0, n_time)  # may index the zero pad

    specp = jnp.concatenate(
        [spec, jnp.zeros(spec.shape[:-1] + (2,), spec.dtype)], axis=-1)
    s0 = jnp.take(specp, idx0, axis=-1)
    s1 = jnp.take(specp, idx1, axis=-1)

    angle_0 = jnp.angle(s0)
    angle_1 = jnp.angle(s1)
    norm_0 = jnp.abs(s0)
    norm_1 = jnp.abs(s1)

    phase = angle_1 - angle_0 - phase_advance
    phase = phase - 2 * np.pi * jnp.round(phase / (2 * np.pi))
    phase = phase + phase_advance
    phase_0 = jnp.angle(spec[..., :1])
    phase = jnp.concatenate([phase_0, phase[..., :-1]], axis=-1)
    phase_acc = jnp.cumsum(phase, axis=-1)

    mag = alphas * norm_1 + (1 - alphas) * norm_0
    mag = mag * valid.astype(mag.dtype)
    return mag * jnp.exp(1j * phase_acc), jnp.sum(valid.astype(jnp.int32))


def linear_resample(wav: jnp.ndarray, factor, out_len: int):
    """Resample by linear interpolation to a STATIC out_len with zero-fill
    past the valid region. factor > 1 compresses (reads faster)."""
    n = wav.shape[-1]
    pos = jnp.arange(out_len) * factor
    valid = pos < (n - 1)
    i0 = jnp.clip(pos.astype(jnp.int32), 0, n - 2)
    frac = pos - i0
    lo = jnp.take(wav, i0, axis=-1)
    hi = jnp.take(wav, i0 + 1, axis=-1)
    out = lo * (1 - frac) + hi * frac
    return out * valid.astype(out.dtype), jnp.sum(valid.astype(jnp.int32))


def pitch_shift(wav: jnp.ndarray, semitones, n_fft: int, hop_length: int):
    """Pitch shift by phase-vocoder stretch + resample back to length.

    Output has the same (static) length as the input. semitones may be a
    traced scalar in [-12, 12].
    """
    from drsa_audio_tpu.ops.stft import stft, istft

    n = wav.shape[-1]
    rate = 2.0 ** (-semitones / 12.0)  # stretch rate
    spec = stft(wav, n_fft, hop_length)
    n_time = spec.shape[-1]
    # static bound: max stretch at semitones=+12 -> rate=0.5 -> 2x frames
    out_frames = int(2 * n_time) + 2
    stretched, _ = phase_vocoder(spec, rate, hop_length, out_frames)
    stretched_wav = istft(stretched, n_fft, hop_length)
    # resample by 1/rate to undo the length change: read factor = 1/rate
    out, _ = linear_resample(stretched_wav, 1.0 / rate, n)
    return out


# --------------------------------------------------------------- mel masks

def time_freq_mask(mel, key, max_rows: int, max_cols: int):
    """SpecAugment-style masking: one row band + one column band zeroed at
    random positions (reference gtzan_dataset.py:279-297)."""
    h, w = mel.shape[-2], mel.shape[-1]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n_rows = jax.random.randint(k1, (), 1, max_rows // 2 + 1)
    row0 = jax.random.randint(k2, (), 0, h - max_rows // 2)
    n_cols = jax.random.randint(k3, (), 1, max_cols + 1)
    col0 = jax.random.randint(k4, (), 0, w - max_cols)

    rows = jnp.arange(h)
    cols = jnp.arange(w)
    row_mask = ~((rows >= row0) & (rows < row0 + n_rows))
    col_mask = ~((cols >= col0) & (cols < col0 + n_cols))
    return mel * row_mask[..., :, None] * col_mask[..., None, :]


def single_mask(mel, key, max_param: int):
    """Toy augmentation: ONE mask, either rows or columns
    (reference toy_dataset.py:163-177)."""
    h, w = mel.shape[-2], mel.shape[-1]
    kc, k1, k2 = jax.random.split(key, 3)
    choose_rows = jax.random.bernoulli(kc, 0.5)
    n_r = jax.random.randint(k1, (), 1, max_param // 2 + 2)
    r0 = jax.random.randint(k2, (), 0, h - max_param // 2)
    k3, k4 = jax.random.split(kc)
    n_c = jax.random.randint(k3, (), 1, max_param + 2)
    c0 = jax.random.randint(k4, (), 0, w - max_param)
    rows = jnp.arange(h)
    cols = jnp.arange(w)
    row_mask = ~((rows >= r0) & (rows < r0 + n_r))
    col_mask = ~((cols >= c0) & (cols < c0 + n_c))
    masked_rows = mel * row_mask[..., :, None]
    masked_cols = mel * col_mask[..., None, :]
    return jnp.where(choose_rows, masked_rows, masked_cols)


def adjust_size(mel, target_width: int, valid_width, key):
    """Pad-or-crop the time axis to target_width with a RANDOM zero-pad
    position (reference gtzan_dataset.py:254-277). valid_width may be traced.

    mel: [..., h, w_max] where columns >= valid_width are zero.
    """
    w_max = mel.shape[-1]
    pad_room = jnp.maximum(target_width - valid_width, 0)
    insert = jax.random.randint(key, (), 0, 1 << 20) % (pad_room + 1)
    cols = jnp.arange(target_width)
    # output col j takes input col j - insert when within [insert, insert+valid)
    src = cols - insert
    take = (src >= 0) & (src < jnp.minimum(valid_width, w_max))
    src = jnp.clip(src, 0, w_max - 1)
    out = jnp.take(mel, src, axis=-1) * take.astype(mel.dtype)
    return out
