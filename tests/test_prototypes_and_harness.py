"""Prototype discovery, PixelFlipping harness sweep, and interclass flipping
on a small toy model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drsa_audio_tpu.models.vgg import build_layer_specs, init_params, toy_config
from drsa_audio_tpu.xai.lrp.engine import Composite
from drsa_audio_tpu.xai.drsa.optimizer import random_orthogonal
from drsa_audio_tpu.xai.drsa.prototypes import get_prototypes, subset_objectives
from drsa_audio_tpu.xai.eval.harness import (
    PixelFlipping, interclass_concept_flipping, configuration_name, make_rule,
    scaled_gamma_name_map,
)
from drsa_audio_tpu.utils.constants import LRP_NAME_MAP_TOY


@pytest.fixture(scope="module")
def toy_model():
    cfg = toy_config()
    specs = build_layer_specs(cfg)
    params = init_params(specs, jax.random.PRNGKey(0))
    return specs, params


def test_subset_objectives_shape(rng):
    d, K, n, L = 8, 2, 5, 3
    U = random_orthogonal(jax.random.PRNGKey(0), d)
    act = jnp.asarray(rng.standard_normal((20, L, d)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((20, L, d)).astype(np.float32))
    objs = subset_objectives(act, ctx, U, K, n)
    assert objs.shape == (4,)
    assert np.all(np.isfinite(np.asarray(objs)))


def test_get_prototypes(toy_model, rng):
    specs, params = toy_model
    d, K = 16, 2
    U = random_orthogonal(jax.random.PRNGKey(1), d)
    composite = Composite.from_list(LRP_NAME_MAP_TOY)
    batch = rng.standard_normal((12, 1, 64, 64)).astype(np.float32)
    songs = [f"song_{i}.wav" for i in range(12)]
    starts = np.linspace(0.0, 26.0, 12)
    res = get_prototypes(
        specs, params, 10, U, composite, batch, num_concepts=K, n=4,
        class_idx=0, songs=songs, startpoints=starts)
    pa, pc, best, objs = (res.act_vecs, res.ctx_vecs, res.subset_index,
                          res.objectives)
    assert objs.shape == (3,)
    assert 0 <= best < 3
    assert best == int(np.argmax(objs))
    assert pa.shape[-1] == d
    assert pa.shape[0] == 4 * 64  # n instances x (8x8 spatial positions)
    # metadata of the argmax subset is threaded through (reference
    # prototypes.py:14-130 returns names + startpoints for sonification)
    assert res.songs == songs[best * 4:(best + 1) * 4]
    np.testing.assert_allclose(res.startpoints, starts[best * 4:(best + 1) * 4])


def test_pixelflipping_harness_sweep(toy_model, rng):
    specs, params = toy_model
    batch = rng.standard_normal((4, 1, 64, 64)).astype(np.float32)
    pf = PixelFlipping(specs, params, batch, perturbation_size=16,
                       num_classes=2)
    grid = [
        {"convolutional": ("gamma", 0.4), "dense": ("epsilon", 1e-7),
         "first_layer": ("wsquare",)},
        {"convolutional": ("zplus",), "dense": ("epsilon", 1e-7),
         "first_layer": ("flat",)},
    ]
    aupcs, logits, flips, heatmaps = pf(grid)
    assert len(aupcs) == 2
    for key, val in aupcs.items():
        assert val.shape == (2, 2)
        assert np.all(np.isfinite(val))
    assert len(heatmaps) == 2
    # scaled-gamma variant
    aupcs2, _, _, _ = pf([grid[0]], scaled_gamma=True)
    assert len(aupcs2) >= 1


def test_configuration_name():
    conf = {"convolutional": ("gamma", 0.4), "dense": ("epsilon", 1e-7),
            "first_layer": ("wsquare",)}
    assert configuration_name(conf) == "gamma_0.4_epsilon_1e-07_wsquare"


def test_scaled_gamma_name_map(toy_model):
    specs, _ = toy_model
    nm = scaled_gamma_name_map(specs, 0.4, 1e-7)
    d = dict(nm)
    assert d["features.0"][0] == "wsquare"
    assert d["features.3"][1]["gamma"] == 0.4
    assert d["features.9"][1]["gamma"] == 0.2
    assert d["features.12"][1]["gamma"] == 0.1
    assert d["classifier.0"][0] == "epsilon"


def test_interclass_concept_flipping_small(toy_model, rng):
    specs, params = toy_model
    d, K = 16, 2
    U1 = np.asarray(random_orthogonal(jax.random.PRNGKey(2), d))
    U2 = np.asarray(random_orthogonal(jax.random.PRNGKey(3), d))
    batch = rng.standard_normal((4, 1, 64, 64)).astype(np.float32)
    out = interclass_concept_flipping(
        specs, params, batch, LRP_NAME_MAP_TOY,
        Us_by_layer={10: {"class1": U1, "class2": U2}},
        layer_idcs=(10,), num_concepts=K, case="toy", perturbation_size=16)
    assert len(out) == 1
    assert out[0].shape == (2, 2)
    assert np.all(np.isfinite(out[0]))


def test_preprocess_minibatched_matches_single_pass(toy_model, rng):
    """attr_batch_size chunking (reference preprocessing.py:126-152) is a
    pure memory optimization — bit-equal vectors to the one-pass path."""
    from drsa_audio_tpu.xai.drsa.preprocessing import preprocess_data
    specs, params = toy_model
    composite = Composite.from_list(LRP_NAME_MAP_TOY)
    batch = jnp.asarray(rng.standard_normal((10, 1, 64, 64)).astype(np.float32))
    key = jax.random.PRNGKey(5)
    act1, ctx1 = preprocess_data(specs, params, batch, composite, 10, 0,
                                 num_locations=4, key=key,
                                 attr_batch_size=None)
    act2, ctx2 = preprocess_data(specs, params, batch, composite, 10, 0,
                                 num_locations=4, key=key, attr_batch_size=4)
    np.testing.assert_allclose(np.asarray(act1), np.asarray(act2),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ctx1), np.asarray(ctx2),
                               rtol=1e-6, atol=1e-6)


def test_pixelflipping_chunked_attribution_matches(toy_model, rng):
    """Per-class class_idx minibatched attribution equals the one-pass
    block-diagonal-mask attribution (each sample's mask is its own class's
    logit either way)."""
    specs, params = toy_model
    batch = rng.standard_normal((4, 1, 64, 64)).astype(np.float32)
    grid = [{"convolutional": ("gamma", 0.4), "dense": ("epsilon", 1e-7),
             "first_layer": ("wsquare",)}]
    pf1 = PixelFlipping(specs, params, batch, perturbation_size=16,
                        num_classes=2)
    pf2 = PixelFlipping(specs, params, batch, perturbation_size=16,
                        num_classes=2, attr_batch_size=1, forward_batch=3)
    a1, _, _, h1 = pf1(grid)
    a2, _, _, h2 = pf2(grid)
    (k,) = a1.keys()
    np.testing.assert_allclose(a2[k], a1[k], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(h2[k], h1[k], rtol=1e-4,
                               atol=1e-5 * np.abs(h1[k]).max())


def test_pixelflipping_chunked_rejects_unbalanced_batch(toy_model, rng):
    """attr_batch_size's per-class slicing needs a class-divisible batch;
    anything else must raise instead of silently dropping samples (ADVICE
    r2)."""
    specs, params = toy_model
    batch = rng.standard_normal((5, 1, 64, 64)).astype(np.float32)
    grid = [{"convolutional": ("gamma", 0.4), "dense": ("epsilon", 1e-7),
             "first_layer": ("wsquare",)}]
    pf = PixelFlipping(specs, params, batch, perturbation_size=16,
                       num_classes=2, attr_batch_size=1)
    with pytest.raises(ValueError, match="balanced"):
        pf(grid)


def test_heatmap_generator_attr_batch_size_matches(toy_model, rng):
    """Chunked subspace-heatmap generation equals the one-pass path."""
    from drsa_audio_tpu.xai.explain import HeatmapGenerator
    specs, params = toy_model
    U = np.asarray(random_orthogonal(jax.random.PRNGKey(2), 16))
    batch = rng.standard_normal((5, 1, 64, 64)).astype(np.float32)
    gens = [HeatmapGenerator(specs=specs, params=params, U=U,
                             name_map=LRP_NAME_MAP_TOY, sample_class="class1",
                             num_concepts=2, layer_idx=10, case="toy")
            for _ in range(2)]
    h1 = gens[0].generate_subspace_heatmaps(batch, concept_flipping=True)
    h2 = gens[1].generate_subspace_heatmaps(batch, concept_flipping=True,
                                            attr_batch_size=2)
    np.testing.assert_allclose(h2, h1, rtol=1e-5,
                               atol=1e-6 * np.abs(h1).max())
    with pytest.raises(ValueError):
        gens[1].generate_subspace_heatmaps(
            batch, flip_all_classes=True, attr_batch_size=2)


def test_pf_sweep_scaled_gamma_cache_not_stale(toy_model, rng):
    """A scaled-gamma sweep reusing a PixelFlipping instance after a plain
    sweep must NOT reuse the plain composite's compiled attribution
    (review finding: the program cache was keyed by conf name only)."""
    specs, params = toy_model
    x = rng.standard_normal((4, 1, 64, 64)).astype(np.float32)
    grid = [{"convolutional": ("gamma", 0.4), "dense": ("epsilon", 1e-7),
             "first_layer": ("wsquare",)}]

    pf_reused = PixelFlipping(specs, params, x, perturbation_size=16,
                              num_classes=2)
    pf_reused(grid)                                 # plain sweep first
    aupc_reused, *_ = pf_reused(grid, scaled_gamma=True)

    pf_fresh = PixelFlipping(specs, params, x, perturbation_size=16,
                             num_classes=2)
    aupc_fresh, *_ = pf_fresh(grid, scaled_gamma=True)

    for k in aupc_fresh:
        np.testing.assert_array_equal(np.asarray(aupc_reused[k]),
                                      np.asarray(aupc_fresh[k]))
