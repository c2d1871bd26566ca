"""Pallas fused gamma-backward kernel: interpret-mode equality with the
rule algebra (the kernel is bit-exact vs interpret mode on the chip;
see BASELINE.md round-2 'measured dead ends' for why it is NOT wired into
the production path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drsa_audio_tpu.models.vgg import LayerSpec
from drsa_audio_tpu.xai.lrp.engine import _apply_factory
from drsa_audio_tpu.xai.lrp.rules import lrp_gamma_nonneg, _expand_batch
from drsa_audio_tpu.xai.lrp.pallas_gamma import pallas_gamma_nonneg


@pytest.mark.parametrize("shape", [
    # (b, K, Ci, Co, H, W) — square and non-square channel counts
    (2, 3, 8, 16, 8, 8),
    (2, 2, 16, 16, 8, 16),
])
def test_pallas_gamma_nonneg_matches_rule(rng, shape):
    b, K, Ci, Co, H, W = shape
    x = np.maximum(rng.standard_normal((b, Ci, H, W)), 0).astype(np.float32)
    R = rng.standard_normal((K * b, Co, H, W)).astype(np.float32)
    w = (rng.standard_normal((Co, Ci, 3, 3)) * 0.1).astype(np.float32)
    bias = (rng.standard_normal((Co,)) * 0.1).astype(np.float32)

    spec = LayerSpec("conv", "features.0", {"out_ch": Co, "kernel": (3, 3)})
    params = {"features.0": {"w": jnp.asarray(w), "b": jnp.asarray(bias)}}
    aw = _apply_factory(spec, params)

    ref = lrp_gamma_nonneg(aw, _expand_batch(jnp.asarray(x), K),
                           jnp.asarray(R), gamma=0.3)
    out = pallas_gamma_nonneg(jnp.asarray(x), jnp.asarray(R), jnp.asarray(w),
                              jnp.asarray(bias), K, gamma=0.3, interpret=True)
    ref, out = np.asarray(ref), np.asarray(out)
    # 9-shifted-dot reassociation vs the conv op, amplified through the
    # stabilized divisions — tolerate relative to the output scale
    atol = 1e-4 * np.abs(ref).max()
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=atol)
