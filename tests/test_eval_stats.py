"""Bootstrap-CI statistics for the evaluation claims (round-2 VERDICT #4/#5)."""

import numpy as np

from drsa_audio_tpu.xai.eval.stats import (
    bootstrap_ci, paired_diff_ci, interclass_gap_ci, sep_peak_stderr,
)


def test_bootstrap_ci_covers_mean():
    rng = np.random.default_rng(0)
    x = rng.normal(5.0, 1.0, size=400)
    point, lo, hi = bootstrap_ci(x, n_boot=2000)
    assert lo < 5.0 < hi
    assert abs(point - x.mean()) < 1e-12
    assert hi - lo < 0.5          # ~4 * 1/sqrt(400)


def test_paired_diff_detects_small_shift():
    """A shift far below the pooled spread is significant when paired."""
    rng = np.random.default_rng(1)
    base = rng.normal(0.0, 1.0, size=300)
    a = base + 0.05 + rng.normal(0, 0.01, size=300)
    d, lo, hi = paired_diff_ci(a, base, n_boot=2000)
    assert lo > 0.0                          # significant positive diff
    # unpaired CI over a alone would be ~0.11 wide; the paired one is tight
    assert hi - lo < 0.01


def test_interclass_gap_ci():
    rng = np.random.default_rng(2)
    n, s = 4, 50
    t = rng.normal(1.5, 0.05, size=(n, n, s))
    for i in range(n):
        t[i, i] -= 0.1                       # diagonal clearly lower
    gap, lo, hi = interclass_gap_ci(t, n_boot=2000)
    assert 0.05 < gap < 0.15
    assert lo > 0.0
    # no effect -> CI straddles zero
    t0 = rng.normal(1.5, 0.05, size=(n, n, s))
    g0, lo0, hi0 = interclass_gap_ci(t0, n_boot=2000)
    assert lo0 < 0.0 < hi0


def test_sep_peak_stderr_matches_reference_quirk():
    """Reference cpf.py:350-354 reports mean/sqrt(n), NOT std/sqrt(n)."""
    v = np.array([2.0, 2.0, 2.0, 2.0])
    m, se = sep_peak_stderr(v)
    assert m == 2.0 and se == 1.0


def test_interclass_return_samples_shape(rng):
    """Harness returns per-instance AUPC tensors when asked."""
    import jax
    from drsa_audio_tpu.models.vgg import build_layer_specs, init_params, toy_config
    from drsa_audio_tpu.xai.eval.harness import interclass_concept_flipping
    from drsa_audio_tpu.xai.drsa.optimizer import random_orthogonal
    from drsa_audio_tpu.utils.constants import LRP_NAME_MAP_TOY

    specs = build_layer_specs(toy_config())
    params = init_params(specs, jax.random.PRNGKey(0))
    U = np.asarray(random_orthogonal(jax.random.PRNGKey(5), 16))
    batch = rng.standard_normal((4, 1, 64, 64)).astype(np.float32)
    Us = {10: {"class1": U, "class2": U}}
    mats = interclass_concept_flipping(
        specs, params, batch, LRP_NAME_MAP_TOY, Us, layer_idcs=(10,),
        num_concepts=2, case="toy", return_samples=True)
    assert mats[0].shape == (2, 2, 2)
    means = interclass_concept_flipping(
        specs, params, batch, LRP_NAME_MAP_TOY, Us, layer_idcs=(10,),
        num_concepts=2, case="toy")
    np.testing.assert_allclose(mats[0].mean(axis=-1), means[0], rtol=1e-6)


def test_rescale_gamma_preserves_decay_pattern():
    """rescale_gamma retargets the base gamma, keeps the per-depth decay
    ratios, and leaves non-gamma rules untouched (composite-sensitivity
    legs of the flipping eval, runs/gtzan_synth_v2/RESULTS.md)."""
    from drsa_audio_tpu.utils.constants import (
        LRP_NAME_MAP_GTZAN_6S, rescale_gamma)

    out = rescale_gamma(LRP_NAME_MAP_GTZAN_6S, 0.4)
    gammas_in = {n: kw["gamma"] for n, (r, kw) in LRP_NAME_MAP_GTZAN_6S
                 if r == "gamma"}
    gammas_out = {n: kw["gamma"] for n, (r, kw) in out if r == "gamma"}
    assert max(gammas_out.values()) == 0.4
    for n in gammas_in:
        np.testing.assert_allclose(gammas_out[n] / gammas_in[n], 0.4 / 0.3,
                                   rtol=1e-12)
    # non-gamma entries byte-identical
    assert [(n, r) for n, (r, _) in out if r != "gamma"] == \
           [(n, r) for n, (r, _) in LRP_NAME_MAP_GTZAN_6S if r != "gamma"]
    # stabilizers untouched
    for (n1, (r1, k1)), (n2, (r2, k2)) in zip(LRP_NAME_MAP_GTZAN_6S, out):
        assert k1.get("stabilizer") == k2.get("stabilizer")


def test_signed_peakness_rewards_canceling_mixtures():
    """Mechanism behind the sep/peak anomaly (VERDICT round-3 #3): the
    reference's peakness/separability operate on SIGNED concept maps
    (cpf.py:348-354), so they scale with per-map AMPLITUDE. A decomposition
    that mixes large +/- values canceling in the sum (exactly what an
    unoptimized random U produces) inflates pixelwise maxima and beats a
    perfectly disentangled decomposition of the SAME standard map. The
    cancellation-factor probe quantifies it; the analysis leg of
    run_concept_eval.py records it next to the CIs."""
    import numpy as np
    from drsa_audio_tpu.xai.eval.metrics import (
        peakness_scores, separability_scores, negative_mass_fraction,
        cancellation_factor)

    rng = np.random.default_rng(7)
    b, K, h, w = 8, 4, 16, 16
    R_std = np.abs(rng.standard_normal((b, h, w))).astype(np.float32)

    # disentangled: concept k owns a disjoint quadrant of the standard map
    disent = np.zeros((b, K, h, w), np.float32)
    quads = [(slice(0, 8), slice(0, 8)), (slice(0, 8), slice(8, 16)),
             (slice(8, 16), slice(0, 8)), (slice(8, 16), slice(8, 16))]
    for k, (qi, qj) in enumerate(quads):
        disent[:, k, qi, qj] = R_std[:, qi, qj]

    # mixed: add large canceling +/- noise that sums to ZERO over concepts —
    # the standard map is bit-identical, the decomposition is garbage
    noise = 5.0 * rng.standard_normal((b, K, h, w)).astype(np.float32)
    noise -= noise.mean(axis=1, keepdims=True)
    mixed = disent + noise
    np.testing.assert_allclose(mixed.sum(1), disent.sum(1), atol=1e-4)

    # the signed metrics PREFER the garbage decomposition...
    assert peakness_scores(mixed).mean() > 2 * peakness_scores(disent).mean()
    assert (separability_scores(mixed).mean()
            > separability_scores(disent).mean())
    # ...and the probes expose why: amplitude that cancels in the sum
    assert cancellation_factor(mixed) > 3 * cancellation_factor(disent)
    assert abs(cancellation_factor(disent) - 1.0) < 1e-3
    assert negative_mass_fraction(mixed) > 5 * negative_mass_fraction(disent)
