"""Full-model LRP engine tests: parity vs torch interpreter oracle,
BN folding correctness, and heatmap correlation (the >= 0.99 gate)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drsa_audio_tpu.models.vgg import (
    VGGConfig, build_layer_specs, init_params, forward, fold_batchnorm, toy_config,
)
from drsa_audio_tpu.xai.lrp.engine import (
    Composite, lrp, compute_relevances, output_mask_class, layer_map_composite,
)
from drsa_audio_tpu.utils.constants import LRP_NAME_MAP_TOY

import lrp_torch_oracle as oracle


@pytest.fixture(scope="module")
def toy_model():
    cfg = toy_config()
    specs = build_layer_specs(cfg)
    params = init_params(specs, jax.random.PRNGKey(0))
    return cfg, specs, params


def test_toy_layer_names_match_reference(toy_model):
    """block_depth=1, no BN => convs at features.{0,3,6,9,12}, linears at
    classifier.{0,2,4} (wait: with dropout -> 0,3,6?). Verify the toy name map
    targets exist."""
    _, specs, _ = toy_model
    names = {s.name: s.kind for s in specs}
    for layer_name, _ in LRP_NAME_MAP_TOY:
        assert layer_name in names, f"{layer_name} missing; have {sorted(names)}"
        assert names[layer_name] in ("conv", "linear")


def test_forward_shapes(toy_model):
    _, specs, params = toy_model
    x = jnp.zeros((2, 1, 64, 64))
    logits = forward(specs, params, x)
    assert logits.shape == (2, 2)


def test_full_model_lrp_matches_torch_oracle(toy_model, rng):
    cfg, specs, params = toy_model
    x = rng.standard_normal((4, 1, 64, 64)).astype(np.float32)

    composite = Composite.from_list(LRP_NAME_MAP_TOY)
    R, logits, _ = lrp(specs, params, jnp.asarray(x), composite,
                       output_mask_class(1))
    R = np.asarray(R)

    R_ref, logits_ref = oracle.torch_lrp(specs, params, x, LRP_NAME_MAP_TOY, class_idx=1)

    np.testing.assert_allclose(np.asarray(logits), logits_ref, rtol=1e-4, atol=1e-5)
    # correlation gate (BASELINE.md: >= 0.99 heatmap correlation)
    corr = np.corrcoef(R.ravel(), R_ref.ravel())[0, 1]
    assert corr > 0.999, f"heatmap correlation {corr}"
    np.testing.assert_allclose(R, R_ref, rtol=1e-3, atol=1e-6)


def test_capture_intermediate_relevance(toy_model, rng):
    """Captured (activation, relevance) at a ReLU layer — the preprocess_data
    hook equivalent."""
    _, specs, params = toy_model
    x = rng.standard_normal((2, 1, 64, 64)).astype(np.float32)
    composite = Composite.from_list(LRP_NAME_MAP_TOY)
    _, _, captured = lrp(specs, params, jnp.asarray(x), composite,
                         output_mask_class(0), capture=("features.10",))
    act, rel = captured["features.10"]
    assert act.shape == rel.shape
    assert act.shape[1] == 16  # channels at 4th block (toy dims [8,8,16,16,16])
    assert np.all(np.asarray(act) >= 0)  # ReLU output


def test_bn_folding_preserves_forward(rng):
    cfg = VGGConfig(n_filters=(4, 8), pool_kernels=((2, 2), (2, 2)), n_dense=16,
                    n_classes=3, input_size=(16, 16), conv_bn=True, dense_bn=True,
                    block_depth=1, dense_depth=1, dropout=0.0)
    specs = build_layer_specs(cfg)
    params = init_params(specs, jax.random.PRNGKey(1))
    # perturb BN stats so folding is non-trivial
    for s in specs:
        if s.kind.startswith("batchnorm"):
            ch = s.config["ch"]
            params[s.name] = {
                "scale": jnp.asarray(1 + 0.3 * rng.standard_normal(ch), jnp.float32),
                "bias": jnp.asarray(0.2 * rng.standard_normal(ch), jnp.float32),
                "mean": jnp.asarray(0.5 * rng.standard_normal(ch), jnp.float32),
                "var": jnp.asarray(1 + 0.5 * np.abs(rng.standard_normal(ch)), jnp.float32),
            }
    x = jnp.asarray(rng.standard_normal((2, 1, 16, 16)).astype(np.float32))
    y0 = forward(specs, params, x)
    fspecs, fparams = fold_batchnorm(specs, params)
    assert not any(s.kind.startswith("batchnorm") for s in fspecs)
    y1 = forward(fspecs, fparams, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-4, atol=1e-5)


def test_layer_map_composite(toy_model):
    _, specs, _ = toy_model
    comp = layer_map_composite(
        specs,
        conv_rule=("gamma", {"gamma": 0.4, "stabilizer": 1e-7}),
        dense_rule=("epsilon", {"epsilon": 1e-7}),
        first_layer_rule=("wsquare", {"stabilizer": 1e-7}),
    )
    assert comp.rule_for("features.0")[0] == "wsquare"
    assert comp.rule_for("features.3")[0] == "gamma"
    assert comp.rule_for("classifier.0")[0] == "epsilon"


def test_compute_relevances_balanced_batch(toy_model, rng):
    """num_classes path: consecutive-class batches attribute their own class."""
    _, specs, params = toy_model
    x = rng.standard_normal((4, 1, 64, 64)).astype(np.float32)
    composite = Composite.from_list(LRP_NAME_MAP_TOY)
    R_all = compute_relevances(specs, params, jnp.asarray(x), composite, num_classes=2)
    R0 = compute_relevances(specs, params, jnp.asarray(x[:2]), composite, class_idx=0)
    R1 = compute_relevances(specs, params, jnp.asarray(x[2:]), composite, class_idx=1)
    np.testing.assert_allclose(np.asarray(R_all[:2]), np.asarray(R0), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(R_all[2:]), np.asarray(R1), rtol=1e-4, atol=1e-6)


def test_lrp_jits_and_vmaps(toy_model, rng):
    _, specs, params = toy_model
    composite = Composite.from_list(LRP_NAME_MAP_TOY)

    @jax.jit
    def heatmap(xb):
        R, _, _ = lrp(specs, params, xb, composite, output_mask_class(0))
        return R

    x = jnp.asarray(rng.standard_normal((2, 1, 64, 64)).astype(np.float32))
    out = heatmap(x)
    assert out.shape == x.shape


def test_gtzan_6s_layer_names_match_reference():
    """The 6 s model's layer indices must line up with the reference's
    13-entry name map (getdrsadata.py:87-108) and its DRSA extraction layers
    {19, 26, 33} must be ReLU outputs."""
    from drsa_audio_tpu.models.vgg import gtzan_6s_config
    from drsa_audio_tpu.utils.constants import (
        LRP_NAME_MAP_GTZAN_6S, DRSA_LAYERS_GTZAN_6S,
    )
    specs = build_layer_specs(gtzan_6s_config())
    kinds = {s.name: s.kind for s in specs}
    for name, (rule, _) in LRP_NAME_MAP_GTZAN_6S:
        assert name in kinds, name
        expect = "linear" if name.startswith("classifier") else "conv"
        assert kinds[name] == expect, (name, kinds[name])
    for li in DRSA_LAYERS_GTZAN_6S:
        assert kinds[f"features.{li}"] == "relu"


def test_gtzan_3s_layer_names_match_reference():
    from drsa_audio_tpu.models.vgg import gtzan_3s_config
    from drsa_audio_tpu.utils.constants import LRP_NAME_MAP_GTZAN
    specs = build_layer_specs(gtzan_3s_config())
    kinds = {s.name: s.kind for s in specs}
    for name, _ in LRP_NAME_MAP_GTZAN:
        expect = "linear" if name.startswith("classifier") else "conv"
        assert kinds.get(name) == expect, (name, kinds.get(name))
    # insertion layers [1,4,7,10,13] are ReLU outputs (cpf.py:141)
    for li in (1, 4, 7, 10, 13):
        assert kinds[f"features.{li}"] == "relu"


def test_bf16_params_heatmap_correlation(toy_model, rng):
    """Mixed-precision mode: bf16 weights with f32 accumulation must keep
    heatmap correlation above the 0.99 parity gate."""
    from drsa_audio_tpu.models.vgg import cast_params
    _, specs, params = toy_model
    x = rng.standard_normal((4, 1, 64, 64)).astype(np.float32)
    composite = Composite.from_list(LRP_NAME_MAP_TOY)
    R32, _, _ = lrp(specs, params, jnp.asarray(x), composite, output_mask_class(0))
    params16 = cast_params(params, jnp.bfloat16)
    R16, _, _ = lrp(specs, params16, jnp.asarray(x), composite, output_mask_class(0))
    assert R16.dtype == jnp.float32
    corr = np.corrcoef(np.asarray(R32).ravel(), np.asarray(R16).ravel())[0, 1]
    assert corr > 0.99, corr


def test_gtzan_6s_structure_lrp_with_bn_folding(rng):
    """6s-model structure (block_depth=2, conv+dense BN): fold BN, attribute
    with the 13-entry scaled-gamma map, capture at the DRSA layers
    {19, 26, 33}. Uses a thin/small variant — the layer NAMES only depend on
    the block structure, not on widths."""
    from drsa_audio_tpu.utils.constants import (
        LRP_NAME_MAP_GTZAN_6S, DRSA_LAYERS_GTZAN_6S,
    )
    cfg = VGGConfig(
        n_filters=(4, 4, 6, 8, 8), n_dense=10,
        pool_kernels=((2, 4), (2, 2), (2, 2), (2, 2), (2, 2)),
        dropout=0.3, input_size=(64, 128), n_classes=10,
        conv_bn=True, dense_bn=True, block_depth=2,
    )
    specs = build_layer_specs(cfg)
    params = init_params(specs, jax.random.PRNGKey(0))
    # non-trivial BN stats
    for s in specs:
        if s.kind.startswith("batchnorm"):
            ch = s.config["ch"]
            params[s.name]["mean"] = jnp.asarray(
                0.3 * rng.standard_normal(ch), jnp.float32)
            params[s.name]["var"] = jnp.asarray(
                1 + 0.4 * np.abs(rng.standard_normal(ch)), jnp.float32)
    fspecs, fparams = fold_batchnorm(specs, params)

    x = jnp.asarray(rng.standard_normal((2, 1, 64, 128)).astype(np.float32))
    composite = Composite.from_list(LRP_NAME_MAP_GTZAN_6S)
    capture = tuple(f"features.{i}" for i in DRSA_LAYERS_GTZAN_6S)
    R, logits, captured = lrp(fspecs, fparams, x, composite,
                              output_mask_class(3), capture=capture)
    assert R.shape == x.shape
    assert np.all(np.isfinite(np.asarray(R)))
    assert logits.shape == (2, 10)
    for name in capture:
        act, rel = captured[name]
        assert act.shape == rel.shape
        assert np.all(np.asarray(act) >= 0)  # ReLU outputs


def test_full_model_relevance_conservation_zero_bias(rng):
    """Classic LRP property: with zero biases and epsilon rules everywhere,
    the input relevance sums to the attributed logit (ReLU/MaxPool routing
    conserves; epsilon with tiny stabilizer conserves per layer)."""
    cfg = VGGConfig(n_filters=(4, 8), pool_kernels=((4, 4), (4, 4)),
                    n_dense=16, n_classes=3, dropout=0.0, block_depth=1,
                    dense_depth=1, input_size=(32, 32), conv_bn=False,
                    dense_bn=False)
    specs = build_layer_specs(cfg)
    params = init_params(specs, jax.random.PRNGKey(2))
    for name in list(params):
        if "b" in params[name]:
            params[name]["b"] = jnp.zeros_like(params[name]["b"])

    comp = layer_map_composite(
        specs,
        conv_rule=("epsilon", {"epsilon": 1e-9}),
        dense_rule=("epsilon", {"epsilon": 1e-9}),
    )
    x = jnp.asarray(rng.standard_normal((3, 1, 32, 32)).astype(np.float32))
    R, logits, _ = lrp(specs, params, x, comp, output_mask_class(1))
    r_sums = np.asarray(R).sum(axis=(1, 2, 3))
    np.testing.assert_allclose(r_sums, np.asarray(logits)[:, 1], rtol=1e-3)
