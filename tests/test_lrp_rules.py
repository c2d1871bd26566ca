"""LRP rule tests: explicit numpy formulas, torch cross-framework oracle,
and conservation properties."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from drsa_audio_tpu.xai.lrp import rules as jrules
import lrp_torch_oracle as oracle


def linear_apply_with_factory(w, b):
    wj, bj = jnp.asarray(w), jnp.asarray(b)

    def apply_with(w_mod, b_mod):
        wm = w_mod(wj)
        bm = b_mod(bj) if b_mod is not None else jnp.zeros_like(bj)
        return lambda x: x @ wm.T + bm

    return apply_with


def conv_apply_with_factory(w, b):
    import jax
    from drsa_audio_tpu.models.vgg import conv2d_same
    wj, bj = jnp.asarray(w), jnp.asarray(b)

    def apply_with(w_mod, b_mod):
        wm = w_mod(wj)
        bm = b_mod(bj) if b_mod is not None else None
        return lambda x: conv2d_same(x, wm, bm)

    return apply_with


@pytest.fixture
def linear_case(rng):
    w = rng.standard_normal((5, 8)).astype(np.float32)
    b = rng.standard_normal(5).astype(np.float32) * 0.1
    x = rng.standard_normal((3, 8)).astype(np.float32)
    R = rng.standard_normal((3, 5)).astype(np.float32)
    return w, b, x, R


@pytest.fixture
def conv_case(rng):
    w = rng.standard_normal((4, 2, 3, 3)).astype(np.float32) * 0.5
    b = rng.standard_normal(4).astype(np.float32) * 0.1
    x = rng.standard_normal((2, 2, 8, 8)).astype(np.float32)
    R = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    return w, b, x, R


def test_epsilon_linear_explicit(linear_case):
    """epsilon rule vs hand-written numpy formula."""
    w, b, x, R = linear_case
    eps = 1e-6
    z = x @ w.T + b
    s = R / (z + np.where(z >= 0, 1.0, -1.0) * eps)
    expected = x * (s @ w)
    got = np.asarray(jrules.lrp_epsilon(
        linear_apply_with_factory(w, b), jnp.asarray(x), jnp.asarray(R), epsilon=eps))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_wsquare_linear_explicit(linear_case):
    w, b, x, R = linear_case
    z = np.ones_like(x) @ (w**2).T + b**2
    s = R / (z + np.where(z >= 0, 1.0, -1.0) * 1e-6)
    expected = s @ (w**2)
    got = np.asarray(jrules.lrp_wsquare(
        linear_apply_with_factory(w, b), jnp.asarray(x), jnp.asarray(R), stabilizer=1e-6))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_flat_linear_uniform(linear_case):
    """flat rule redistributes uniformly over fan-in."""
    w, b, x, R = linear_case
    got = np.asarray(jrules.lrp_flat(
        linear_apply_with_factory(w, b), jnp.asarray(x), jnp.asarray(R)))
    fan_in = x.shape[1]
    expected = np.repeat((R / (fan_in + 1e-6)).sum(axis=1, keepdims=True), fan_in, axis=1)
    np.testing.assert_allclose(got, expected, rtol=1e-4)


@pytest.mark.parametrize("rule,orule,kwargs", [
    ("lrp_epsilon", "epsilon_rule", {"epsilon": 1e-6}),
    ("lrp_gamma", "gamma_rule", {"gamma": 0.4, "stabilizer": 1e-7}),
    ("lrp_zplus", "zplus_rule", {"stabilizer": 1e-6}),
    ("lrp_alphabeta", "alphabeta_rule", {"alpha": 2.0, "beta": 1.0, "stabilizer": 1e-6}),
    ("lrp_wsquare", "wsquare_rule", {"stabilizer": 1e-7}),
    ("lrp_flat", "flat_rule", {"stabilizer": 1e-7}),
])
def test_rules_match_torch_oracle_conv(conv_case, rule, orule, kwargs):
    """Full cross-framework check on a conv layer with mixed-sign inputs."""
    w, b, x, R = conv_case
    jfn = getattr(jrules, rule)
    got = np.asarray(jfn(conv_apply_with_factory(w, b), jnp.asarray(x), jnp.asarray(R), **kwargs))
    ofn = getattr(oracle, orule)
    okwargs = {k.replace("epsilon", "epsilon") if k != "stabilizer" else k: v for k, v in kwargs.items()}
    ref = ofn(
        oracle.make_apply_with("conv", torch.tensor(w), torch.tensor(b)),
        torch.tensor(x), torch.tensor(R), **okwargs,
    ).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("rule,orule,kwargs", [
    ("lrp_gamma", "gamma_rule", {"gamma": 0.8, "stabilizer": 1e-7}),
    ("lrp_zplus", "zplus_rule", {"stabilizer": 1e-6}),
    ("lrp_alphabeta", "alphabeta_rule", {"alpha": 1.5, "beta": 0.5, "stabilizer": 1e-6}),
])
def test_rules_match_torch_oracle_linear(linear_case, rule, orule, kwargs):
    w, b, x, R = linear_case
    jfn = getattr(jrules, rule)
    got = np.asarray(jfn(linear_apply_with_factory(w, b), jnp.asarray(x), jnp.asarray(R), **kwargs))
    ofn = getattr(oracle, orule)
    ref = ofn(
        oracle.make_apply_with("linear", torch.tensor(w), torch.tensor(b)),
        torch.tensor(x), torch.tensor(R), **kwargs,
    ).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_epsilon_conservation_zero_bias(rng):
    """With zero bias and tiny epsilon, the epsilon rule conserves relevance."""
    w = rng.standard_normal((6, 10)).astype(np.float32)
    b = np.zeros(6, dtype=np.float32)
    x = rng.standard_normal((4, 10)).astype(np.float32)
    z = x @ w.T
    R = np.abs(rng.standard_normal((4, 6))).astype(np.float32)
    got = np.asarray(jrules.lrp_epsilon(
        linear_apply_with_factory(w, b), jnp.asarray(x), jnp.asarray(R), epsilon=1e-9))
    np.testing.assert_allclose(got.sum(axis=1), R.sum(axis=1), rtol=1e-3)


def test_subspace_mask_semantics(rng):
    """Clone 0 untouched; clone k keeps only concept k (attribute.py:42-60)."""
    K, batch, n, d_k = 3, 2, 4, 5
    R = rng.standard_normal((batch * (K + 1), n, K, d_k)).astype(np.float32)
    got = np.asarray(jrules.lrp_subspace_mask(None, None, jnp.asarray(R), num_concepts=K))
    Rr = R.reshape(batch, K + 1, n, K, d_k)
    out = got.reshape(batch, K + 1, n, K, d_k)
    np.testing.assert_array_equal(out[:, 0], Rr[:, 0])
    for k in range(K):
        np.testing.assert_array_equal(out[:, k + 1, :, k], Rr[:, k + 1, :, k])
        for kp in range(K):
            if kp != k:
                assert np.all(out[:, k + 1, :, kp] == 0)


def test_gamma_nonneg_equals_general_on_nonneg_input(rng):
    """The specialized rule must be bit-comparable to the generalized rule
    whenever x >= 0, including nonzero biases and mixed-sign outputs."""
    w = rng.standard_normal((4, 2, 3, 3)).astype(np.float32) * 0.5
    b = rng.standard_normal(4).astype(np.float32) * 0.5
    x = np.abs(rng.standard_normal((2, 2, 8, 8))).astype(np.float32)
    R = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    aw = conv_apply_with_factory(w, b)
    a = np.asarray(jrules.lrp_gamma(aw, jnp.asarray(x), jnp.asarray(R),
                                    gamma=0.4, stabilizer=1e-7))
    c = np.asarray(jrules.lrp_gamma_nonneg(aw, jnp.asarray(x), jnp.asarray(R),
                                           gamma=0.4, stabilizer=1e-7))
    np.testing.assert_allclose(c, a, rtol=1e-5, atol=1e-6)


def test_zbox_matches_torch_oracle(conv_case):
    w, b, x, R = conv_case
    got = np.asarray(jrules.lrp_zbox(
        conv_apply_with_factory(w, b), jnp.asarray(x), jnp.asarray(R),
        low=-2.0, high=2.0, stabilizer=1e-6))
    ref = oracle.zbox_rule(
        oracle.make_apply_with("conv", torch.tensor(w), torch.tensor(b)),
        torch.tensor(x), torch.tensor(R), low=-2.0, high=2.0).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_zbox_conservation_zero_bias(rng):
    """ZBox conserves relevance with zero bias (sum over inputs == sum R)."""
    w = rng.standard_normal((6, 10)).astype(np.float32)
    b = np.zeros(6, np.float32)
    x = rng.uniform(-1, 1, (4, 10)).astype(np.float32)
    R = np.abs(rng.standard_normal((4, 6))).astype(np.float32)
    got = np.asarray(jrules.lrp_zbox(
        linear_apply_with_factory(w, b), jnp.asarray(x), jnp.asarray(R),
        low=-1.0, high=1.0, stabilizer=1e-9))
    np.testing.assert_allclose(got.sum(axis=1), R.sum(axis=1), rtol=1e-3)


def test_gamma_nonneg_fused_grouped_path(rng):
    """The grouped-kernel fast path (engine factory exposes .grouped) must
    match the generalized gamma rule on non-negative inputs."""
    from drsa_audio_tpu.models.vgg import LayerSpec
    from drsa_audio_tpu.xai.lrp.engine import _apply_factory

    w = rng.standard_normal((4, 2, 3, 3)).astype(np.float32) * 0.5
    b = rng.standard_normal(4).astype(np.float32) * 0.5
    x = np.abs(rng.standard_normal((2, 2, 8, 8))).astype(np.float32)
    R = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)

    spec = LayerSpec("conv", "features.0", {"in_ch": 2, "out_ch": 4,
                                            "kernel": (3, 3)})
    params = {"features.0": {"w": jnp.asarray(w), "b": jnp.asarray(b)}}
    aw = _apply_factory(spec, params)
    assert hasattr(aw, "grouped")
    fused = np.asarray(jrules.lrp_gamma_nonneg(
        aw, jnp.asarray(x), jnp.asarray(R), gamma=0.4, stabilizer=1e-7))
    general = np.asarray(jrules.lrp_gamma(
        aw, jnp.asarray(x), jnp.asarray(R), gamma=0.4, stabilizer=1e-7))
    np.testing.assert_allclose(fused, general, rtol=1e-4, atol=1e-5)

    # linear grouped path
    wl = rng.standard_normal((5, 8)).astype(np.float32)
    bl = rng.standard_normal(5).astype(np.float32)
    xl = np.abs(rng.standard_normal((3, 8))).astype(np.float32)
    Rl = rng.standard_normal((3, 5)).astype(np.float32)
    spec_l = LayerSpec("linear", "classifier.0", {"in_f": 8, "out_f": 5})
    params_l = {"classifier.0": {"w": jnp.asarray(wl), "b": jnp.asarray(bl)}}
    awl = _apply_factory(spec_l, params_l)
    fused_l = np.asarray(jrules.lrp_gamma_nonneg(
        awl, jnp.asarray(xl), jnp.asarray(Rl), gamma=0.8, stabilizer=1e-7))
    general_l = np.asarray(jrules.lrp_gamma(
        awl, jnp.asarray(xl), jnp.asarray(Rl), gamma=0.8, stabilizer=1e-7))
    np.testing.assert_allclose(fused_l, general_l, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("rule,kwargs", [
    ("lrp_gamma", {"gamma": 0.4, "stabilizer": 1e-7}),
    ("lrp_zplus", {"stabilizer": 1e-6}),
    ("lrp_alphabeta", {"alpha": 2.0, "beta": 1.0, "stabilizer": 1e-6}),
])
def test_fused_multi_group_paths_match_unfused(rng, rule, kwargs):
    """The grouped_multi fast paths must equal the per-combination paths on
    mixed-sign inputs (conv + linear)."""
    from drsa_audio_tpu.models.vgg import LayerSpec
    from drsa_audio_tpu.xai.lrp.engine import _apply_factory

    w = rng.standard_normal((4, 2, 3, 3)).astype(np.float32) * 0.5
    b = rng.standard_normal(4).astype(np.float32) * 0.3
    x = rng.standard_normal((2, 2, 8, 8)).astype(np.float32)
    R = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    spec = LayerSpec("conv", "features.0", {"in_ch": 2, "out_ch": 4,
                                            "kernel": (3, 3)})
    aw_fused = _apply_factory(spec, {"features.0": {"w": jnp.asarray(w),
                                                    "b": jnp.asarray(b)}})
    aw_plain = conv_apply_with_factory(w, b)  # lacks grouped attrs
    fn = getattr(jrules, rule)
    a = np.asarray(fn(aw_fused, jnp.asarray(x), jnp.asarray(R), **kwargs))
    c = np.asarray(fn(aw_plain, jnp.asarray(x), jnp.asarray(R), **kwargs))
    np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-5)

    wl = rng.standard_normal((5, 8)).astype(np.float32)
    bl = rng.standard_normal(5).astype(np.float32)
    xl = rng.standard_normal((3, 8)).astype(np.float32)
    Rl = rng.standard_normal((3, 5)).astype(np.float32)
    spec_l = LayerSpec("linear", "classifier.0", {"in_f": 8, "out_f": 5})
    awl = _apply_factory(spec_l, {"classifier.0": {"w": jnp.asarray(wl),
                                                   "b": jnp.asarray(bl)}})
    a = np.asarray(fn(awl, jnp.asarray(xl), jnp.asarray(Rl), **kwargs))
    c = np.asarray(fn(linear_apply_with_factory(wl, bl), jnp.asarray(xl),
                      jnp.asarray(Rl), **kwargs))
    np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-5)
