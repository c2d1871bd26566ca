"""Pallas fused log-mel kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from drsa_audio_tpu.ops.frontend import FrontendConfig, logmel
from drsa_audio_tpu.ops.pallas_frontend import pallas_logmel


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def test_pallas_logmel_matches_xla_toy(rng):
    cfg = FrontendConfig.for_case("toy")
    x = rng.standard_normal((2, 16000)).astype(np.float32)
    ours = np.asarray(pallas_logmel(jnp.asarray(x), cfg, _interpret()))
    ref = np.asarray(logmel(jnp.asarray(x), cfg))
    assert ours.shape == ref.shape == (2, 64, 64)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_pallas_logmel_matches_xla_gtzan(rng):
    cfg = FrontendConfig.for_case("gtzan")
    x = rng.standard_normal((1, 48000)).astype(np.float32)
    ours = np.asarray(pallas_logmel(jnp.asarray(x), cfg, _interpret()))
    ref = np.asarray(logmel(jnp.asarray(x), cfg))
    assert ours.shape == ref.shape == (1, 128, 128)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
