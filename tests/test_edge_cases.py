"""Robustness and edge cases: corrupt inputs, degenerate sizes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drsa_audio_tpu.runtime.wavio import read_wav, write_wav
from drsa_audio_tpu.runtime import native
from drsa_audio_tpu.xai.eval.flipping import Flipper, quadratic_schedule
from drsa_audio_tpu.xai.drsa.optimizer import fit as drsa_fit, random_orthogonal
from drsa_audio_tpu.ops.frontend import peak_normalize, FrontendConfig, logmel


def test_corrupt_wav_raises_cleanly(tmp_path):
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a wave file at all" * 3)
    with pytest.raises((ValueError, IOError)):
        read_wav(str(bad))
    if native.available():
        with pytest.raises((ValueError, IOError)):
            native.decode_wav(str(bad))


def test_truncated_wav(tmp_path, rng):
    good = tmp_path / "g.wav"
    write_wav(str(good), np.zeros((1, 100), np.float32), 16000)
    data = good.read_bytes()
    (tmp_path / "t.wav").write_bytes(data[:30])
    with pytest.raises((ValueError, IOError, Exception)):
        read_wav(str(tmp_path / "t.wav"))


def test_flipper_single_patch(rng):
    """Image exactly one patch: schedule [1], everything flips in one step."""
    assert quadratic_schedule(1) == [1]
    x = np.abs(rng.standard_normal((2, 1, 4, 4))).astype(np.float32)
    R = np.abs(rng.standard_normal((2, 1, 1, 4, 4))).astype(np.float32)

    def fwd(t):
        t = np.asarray(t)
        return jnp.asarray(np.stack([t.sum((1, 2, 3)), -t.sum((1, 2, 3))], 1))

    flipper = Flipper(perturbation_size=4)
    aupc, logits, flips = flipper(fwd, x, R)
    assert flips.tolist() == [0, 1]
    np.testing.assert_allclose(logits[-1], 0.0, atol=1e-6)


def test_drsa_fewer_samples_than_dim(rng):
    """N < d still optimizes without NaNs."""
    d, K, N = 16, 4, 8
    A = rng.standard_normal((N, d)).astype(np.float32)
    C = rng.standard_normal((N, d)).astype(np.float32)
    res = drsa_fit(A, C, num_concepts=K, steps=30, runs=2, seed=0)
    assert np.all(np.isfinite(np.asarray(res.objectives)))
    U = np.asarray(res.U[int(res.best_run)])
    np.testing.assert_allclose(U.T @ U, np.eye(d), atol=5e-3)


def test_peak_normalize_constant_signal():
    """Non-zero constant scales to 1; silent input passes through unchanged
    (guarded divide — the reference would produce NaN)."""
    const = jnp.ones((2, 100)) * 0.25
    out = np.asarray(peak_normalize(const))
    np.testing.assert_allclose(out, 1.0)
    silent = jnp.zeros((2, 100))
    out = np.asarray(peak_normalize(silent))
    np.testing.assert_allclose(out, 0.0)
    # mixed batch: silent row stays zero, loud row normalizes
    mixed = jnp.stack([jnp.zeros(100), jnp.ones(100) * 0.5])
    out = np.asarray(peak_normalize(mixed))
    np.testing.assert_allclose(out[0], 0.0)
    np.testing.assert_allclose(out[1], 1.0)


def test_logmel_short_clip(rng):
    """Clip shorter than one slice still produces frames (center padding)."""
    cfg = FrontendConfig.for_case("toy")
    x = rng.standard_normal((1, 2000)).astype(np.float32)
    out = np.asarray(logmel(jnp.asarray(x), cfg))
    assert out.shape[1] == 64
    assert np.all(np.isfinite(out))


def test_random_orthogonal_determinism():
    a = np.asarray(random_orthogonal(jax.random.PRNGKey(5), 8))
    b = np.asarray(random_orthogonal(jax.random.PRNGKey(5), 8))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(random_orthogonal(jax.random.PRNGKey(6), 8))
    assert not np.allclose(a, c)
