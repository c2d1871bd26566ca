"""End-to-end integration on the toy fixture: generate data -> train ->
LRP -> DRSA -> subspace heatmaps -> concept flipping -> sonification.

This is the framework's de-facto system test, mirroring how the reference
validates itself on the synthetic 2-class set with known concepts
(SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drsa_audio_tpu.data.toydata import generate_batch, generate_sample
from drsa_audio_tpu.models.vgg import build_layer_specs, init_params, toy_config, forward
from drsa_audio_tpu.models.train import (
    make_optimizer, make_train_step, make_eval_step, split_trainable,
    merge_params, toy_augment_and_mel,
)
from drsa_audio_tpu.ops.frontend import FrontendConfig, peak_normalize, logmel
from drsa_audio_tpu.xai.lrp.engine import Composite
from drsa_audio_tpu.xai.explain import HeatmapGenerator
from drsa_audio_tpu.xai.drsa.preprocessing import preprocess_data, normalize_vectors
from drsa_audio_tpu.xai.drsa.optimizer import fit as drsa_fit_runs, obj_val, random_orthogonal
from drsa_audio_tpu.xai.eval.harness import concept_flipping
from drsa_audio_tpu.utils.constants import LRP_NAME_MAP_TOY


@pytest.fixture(scope="module")
def trained_toy():
    """Train the toy CNN on in-memory data until it clearly separates the
    classes."""
    fe = FrontendConfig.for_case("toy")
    rng = np.random.default_rng(0)
    n_per_class = 160
    wav1 = generate_batch(rng, "class1", n_per_class)
    wav2 = generate_batch(rng, "class2", n_per_class)
    wavs = np.concatenate([wav1, wav2])
    labels = np.concatenate([np.zeros(n_per_class), np.ones(n_per_class)]).astype(np.int32)

    cfg = toy_config()
    specs = build_layer_specs(cfg)
    params = init_params(specs, jax.random.PRNGKey(0))
    opt = make_optimizer(lr=5e-3, momentum=0.9, weight_decay=1e-4)
    trainable, state = split_trainable(params)
    opt_state = opt.init(trainable)
    # SpecAugment-style mel masking on; waveform augmentation off (speed)
    step = make_train_step(
        specs, opt,
        per_example_mel=lambda w, k: toy_augment_and_mel(w, k, fe, False, True))

    key = jax.random.PRNGKey(1)
    order = np.arange(len(wavs))
    bs = 32
    for epoch in range(40):
        np.random.default_rng(epoch).shuffle(order)
        for i in range(0, len(order), bs):
            sel = order[i:i + bs]
            key, sub = jax.random.split(key)
            trainable, state, opt_state, loss, acc = step(
                trainable, state, opt_state, jnp.asarray(wavs[sel]),
                jnp.asarray(labels[sel]), sub)
    params = merge_params(trainable, state)

    # held-out accuracy on all-4-concept samples (the reference's `all4`
    # evaluation list exists for exactly this purpose)
    mel_fn = lambda w, k: toy_augment_and_mel(w, k, fe, False, False)
    test1 = generate_batch(np.random.default_rng(123), "class1", 32,
                           concept_idcs=(1, 2, 3, 4))
    test2 = generate_batch(np.random.default_rng(321), "class2", 32,
                           concept_idcs=(1, 2, 3, 4))
    test_wavs = np.concatenate([test1, test2])
    test_labels = np.concatenate([np.zeros(32), np.ones(32)]).astype(np.int32)
    mels = jax.vmap(lambda w: mel_fn(w, jax.random.PRNGKey(0)))(jnp.asarray(test_wavs))
    logits = forward(specs, params, mels)
    acc = float((np.asarray(logits).argmax(-1) == test_labels).mean())
    return specs, params, fe, acc, mel_fn


def test_training_reaches_high_accuracy(trained_toy):
    _, _, _, acc, _ = trained_toy
    assert acc > 0.9, f"toy all-4-concepts accuracy only {acc}"


def test_drsa_pipeline_end_to_end(trained_toy):
    specs, params, fe, _, mel_fn = trained_toy
    K, layer_idx, d = 2, 10, 16
    composite = Composite.from_list(LRP_NAME_MAP_TOY)

    # class-1 batch with all 4 concepts present
    wavs = generate_batch(np.random.default_rng(7), "class1", 48,
                          concept_idcs=(1, 2, 3, 4))
    mels = jax.vmap(lambda w: mel_fn(w, jax.random.PRNGKey(0)))(jnp.asarray(wavs))

    # 1) extract act/ctx vectors at the target layer
    act, ctx = preprocess_data(specs, params, mels, composite, layer_idx,
                               class_idx=0, num_locations=12,
                               key=jax.random.PRNGKey(3))
    assert act.shape == (48 * 12, d)
    act_n = normalize_vectors(act)
    ctx_n = normalize_vectors(ctx)

    # 2) optimize subspaces (short run, 2 restarts)
    res = drsa_fit_runs(np.asarray(act_n), np.asarray(ctx_n), num_concepts=K,
                        steps=150, runs=2, seed=0)
    best = int(res.best_run)
    U = np.asarray(res.U[best])
    # optimized beats random
    U_rand = np.asarray(random_orthogonal(jax.random.PRNGKey(99), d))
    obj_opt = float(obj_val(act_n, ctx_n, jnp.asarray(U), K))
    obj_rand = float(obj_val(act_n, ctx_n, jnp.asarray(U_rand), K))
    assert obj_opt > obj_rand

    # 3) subspace heatmaps via the generator
    gen = HeatmapGenerator(specs=specs, params=params, U=U,
                           name_map=LRP_NAME_MAP_TOY, sample_class="class1",
                           num_concepts=K, layer_idx=layer_idx)
    sub = gen.generate_subspace_heatmaps(np.asarray(mels[:8]))
    assert sub.shape == (8, K, 64, 64)
    info = gen.info
    np.testing.assert_allclose(
        info["subspace_heatmaps"].sum(axis=1),
        info["standard_heatmaps"][:, 0], rtol=2e-2, atol=2e-4)

    # 4) concept flipping over both classes
    wavs2 = generate_batch(np.random.default_rng(8), "class2", 8,
                           concept_idcs=(1, 2, 3, 4))
    mels2 = jax.vmap(lambda w: mel_fn(w, jax.random.PRNGKey(0)))(jnp.asarray(wavs2))
    batch = np.concatenate([np.asarray(mels[:8]), np.asarray(mels2)])
    aupc, mean_logits, flips, RU = concept_flipping(
        specs, params, batch, LRP_NAME_MAP_TOY, layer_idx,
        Us={"class1": U, "class2": U}, num_concepts=K, case="toy",
        perturbation_size=16)
    assert aupc.shape == (2, 8)
    assert np.all(np.isfinite(aupc))

    # 5) sonify one explanation
    from drsa_audio_tpu.xai.sonify.mel2audio import Mel2Audio
    m2a = Mel2Audio(case="toy", nnls_iters=30)
    audios = m2a.make_audios(info, wavs[0], num_concepts=K)
    assert len(audios) == K + 1
    assert all(np.all(np.isfinite(a)) for a in audios)


def test_drsa_subspaces_beat_random_on_separability(trained_toy):
    """The reference's quantitative self-check (cpf.py:192-233, 297-371):
    DRSA-optimized subspaces should separate relevance into concepts better
    than a random orthogonal U, measured by the separability metric on
    subspace heatmaps."""
    from drsa_audio_tpu.xai.eval.metrics import separability
    specs, params, fe, _, mel_fn = trained_toy
    K, layer_idx, d = 2, 10, 16

    wavs = generate_batch(np.random.default_rng(11), "class1", 32,
                          concept_idcs=(1, 2, 3, 4))
    mels = jax.vmap(lambda w: mel_fn(w, jax.random.PRNGKey(0)))(jnp.asarray(wavs))
    composite = Composite.from_list(LRP_NAME_MAP_TOY)

    act, ctx = preprocess_data(specs, params, mels, composite, layer_idx,
                               class_idx=0, num_locations=16,
                               key=jax.random.PRNGKey(5))
    act_n, ctx_n = normalize_vectors(act), normalize_vectors(ctx)
    res = drsa_fit_runs(np.asarray(act_n), np.asarray(ctx_n), num_concepts=K,
                        steps=400, runs=3, seed=1)
    U_opt = np.asarray(res.U[int(res.best_run)])

    def heatmaps_for(U):
        gen = HeatmapGenerator(specs=specs, params=params, U=U,
                               name_map=LRP_NAME_MAP_TOY, sample_class="class1",
                               num_concepts=K, layer_idx=layer_idx)
        return gen.generate_subspace_heatmaps(np.asarray(mels),
                                              concept_flipping=True)

    sep_opt, _ = separability(np.maximum(heatmaps_for(U_opt), 0))
    seps_rand = []
    for seed in (101, 202, 303):
        U_r = np.asarray(random_orthogonal(jax.random.PRNGKey(seed), d))
        s, _ = separability(np.maximum(heatmaps_for(U_r), 0))
        seps_rand.append(s)
    assert sep_opt > np.mean(seps_rand), (sep_opt, seps_rand)


def test_concept_recovery_analysis(trained_toy):
    """Band-assignment tooling on DRSA subspaces: profiles are valid
    distributions over mel bins and the diversity metric is higher for
    optimized subspaces than for a duplicate-heatmap degenerate case."""
    from drsa_audio_tpu.xai.eval.concept_recovery import (
        band_energy_profiles, toy_concept_mel_bands, band_assignment,
        profile_diversity,
    )
    specs, params, fe, _, mel_fn = trained_toy
    K, layer_idx, d = 2, 10, 16

    wavs = generate_batch(np.random.default_rng(21), "class1", 24,
                          concept_idcs=(1, 2, 3, 4))
    mels = jax.vmap(lambda w: mel_fn(w, jax.random.PRNGKey(0)))(jnp.asarray(wavs))
    composite = Composite.from_list(LRP_NAME_MAP_TOY)
    act, ctx = preprocess_data(specs, params, mels, composite, layer_idx,
                               class_idx=0, num_locations=16,
                               key=jax.random.PRNGKey(5))
    res = drsa_fit_runs(np.asarray(normalize_vectors(act)),
                        np.asarray(normalize_vectors(ctx)),
                        num_concepts=K, steps=300, runs=2, seed=3)
    U = np.asarray(res.U[int(res.best_run)])
    gen = HeatmapGenerator(specs=specs, params=params, U=U,
                           name_map=LRP_NAME_MAP_TOY, sample_class="class1",
                           num_concepts=K, layer_idx=layer_idx)
    RU = gen.generate_subspace_heatmaps(np.asarray(mels), concept_flipping=True)

    prof = band_energy_profiles(RU)
    assert prof.shape == (K, 64)
    np.testing.assert_allclose(prof.sum(axis=-1), 1.0, rtol=1e-4)

    bands = toy_concept_mel_bands("class1")
    assert set(bands) == {1, 2, 3, 4}
    for lo, hi in bands.values():
        assert 0 <= lo < hi <= 64

    shares, assignment, coverage = band_assignment(RU, "class1")
    assert shares.shape == (K, 4)
    assert 1 <= coverage <= K

    div_opt = profile_diversity(RU)
    div_degenerate = profile_diversity(np.repeat(RU[:, :1], K, axis=1))
    assert div_opt > div_degenerate
    assert div_degenerate < 1e-6
