"""Packed-layout Pallas chain primitives vs their XLA references.

All primitives run in interpret mode on the CPU mesh; on-chip equality of the
assembled kernels is covered by the integration test + the real-hardware
bench. Layout under test: [H, G=W/P, P*C] with P = 128 / C (see
drsa_audio_tpu/xai/lrp/pallas_chain.py).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

from drsa_audio_tpu.xai.lrp import pallas_chain as pc
from drsa_audio_tpu.models.vgg import conv2d_same, maxpool2d


def run_prim(fn, *arrays):
    """Run fn (a traced packed primitive) inside an interpret-mode kernel."""
    arrays = [jnp.asarray(a) for a in arrays]
    out_aval = jax.eval_shape(fn, *arrays)

    def kernel(*refs):
        *ins, out = refs
        out[:] = fn(*[r[:] for r in ins])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_aval.shape, out_aval.dtype),
        interpret=True,
    )(*arrays)


def to_packed(x_nchw, P):
    """NCHW -> packed [.., H, G, P*C] (host-side)."""
    return pc.pack(jnp.transpose(jnp.asarray(x_nchw), (0, 2, 3, 1)), P)


def from_packed(x_packed, C):
    nhwc = pc.unpack(x_packed, C)
    return jnp.transpose(nhwc, (0, 3, 1, 2))


@pytest.mark.parametrize("C", [16, 32, 64])
def test_col_shift(C, rng):
    P = 128 // C
    H, W = 8, 4 * P
    x = rng.standard_normal((1, C, H, W)).astype(np.float32)
    xp = to_packed(x, P)[0]
    for delta in (-1, 1):
        got = np.asarray(run_prim(
            functools.partial(pc.col_shift, delta=delta, C=C), xp))
        want = np.zeros_like(x[0].transpose(1, 2, 0))       # [H, W, C]
        src = np.transpose(x[0], (1, 2, 0))
        if delta == 1:
            want[:, :-1] = src[:, 1:]
        else:
            want[:, 1:] = src[:, :-1]
        want = np.asarray(pc.pack(jnp.asarray(want), P))
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("Ci,Co", [(32, 32), (32, 64), (64, 64), (16, 8),
                                   (8, 8), (64, 32)])
def test_conv3x3_packed_matches_xla(Ci, Co, rng):
    P = 128 // Ci
    H, W = 8, 2 * P
    x = rng.standard_normal((1, Ci, H, W)).astype(np.float32)
    w = (rng.standard_normal((Co, Ci, 3, 3)) * 0.2).astype(np.float32)
    want_nchw = np.asarray(conv2d_same(jnp.asarray(x), jnp.asarray(w), None))

    wtaps = pc.pack_conv_weights(jnp.asarray(w), P)
    xp = to_packed(x, P)[0]
    got = run_prim(functools.partial(pc.conv3x3_packed, C=Ci), xp, wtaps)
    # output is P-packed over Co
    got_nchw = np.asarray(from_packed(got[None], Co))
    np.testing.assert_allclose(got_nchw, want_nchw, rtol=1e-5, atol=1e-5)


def test_convT_packed_matches_vjp(rng):
    Ci, Co, P = 32, 64, 4
    H, W = 8, 2 * P
    x = rng.standard_normal((1, Ci, H, W)).astype(np.float32)
    g = rng.standard_normal((1, Co, H, W)).astype(np.float32)
    w = (rng.standard_normal((Co, Ci, 3, 3)) * 0.2).astype(np.float32)
    _, vjp = jax.vjp(lambda t: conv2d_same(t, jnp.asarray(w), None),
                     jnp.asarray(x))
    want = np.asarray(vjp(jnp.asarray(g))[0])

    wT = pc.pack_convT_weights(jnp.asarray(w), P)
    # cotangent packed with the INPUT's P (4 cols x 64 ch = 256 lanes)
    gp = pc.pack(jnp.transpose(jnp.asarray(g), (0, 2, 3, 1)), P)[0]
    got = run_prim(functools.partial(pc.conv3x3_packed, C=Co), gp, wT)
    got_nchw = np.asarray(from_packed(got[None], Ci))
    np.testing.assert_allclose(got_nchw, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("C", [16, 32, 64])
def test_maxpool_forward_packed(C, rng):
    P = 128 // C
    H, W = 8, 4 * P
    x = rng.standard_normal((1, C, H, W)).astype(np.float32)
    want = np.asarray(maxpool2d(jnp.asarray(x), (2, 2)))
    xp = to_packed(x, P)[0]
    got = run_prim(functools.partial(pc.maxpool2x2_forward, C=C), xp)
    got_nchw = np.asarray(from_packed(got[None], C))
    np.testing.assert_array_equal(got_nchw, want)


@pytest.mark.parametrize("C", [16, 32, 64])
def test_pool_backward_packed_matches_vjp(C, rng):
    P = 128 // C
    H, W = 8, 4 * P
    K = 3
    a = rng.standard_normal((1, C, H, W)).astype(np.float32)
    a[0, 0, :2, :2] = 0.0                      # tied window (post-relu zeros)
    a[0, min(1, C - 1), :2, :] = 5.0           # row of equal values
    a = np.maximum(a, 0.0)
    g = rng.standard_normal((K, 1, C, H // 2, W // 2)).astype(np.float32)

    _, vjp = jax.vjp(lambda t: maxpool2d(t, (2, 2)), jnp.asarray(a))
    want = np.stack([np.asarray(vjp(jnp.asarray(g[k]))[0])[0] for k in range(K)])

    ap = to_packed(a, P)[0]
    Rp = jnp.stack([pc.pack(jnp.transpose(jnp.asarray(g[k]), (0, 2, 3, 1)), P)[0]
                    for k in range(K)])

    def fused(a_fine, Rc):
        mask = pc.maxpool2x2_fine_mask(a_fine, C)
        return pc.pool2x2_backward(Rc, mask, C)

    got = run_prim(fused, ap, Rp)              # [K, H, G, P*C]
    got_nchw = np.asarray(from_packed(got, C))
    np.testing.assert_array_equal(got_nchw, want)


def test_relu_gate_matches_vjp(rng):
    a = rng.standard_normal((4, 8)).astype(np.float32)
    a[0, :3] = 0.0
    a = jnp.asarray(a)
    _, vjp = jax.vjp(lambda t: jnp.maximum(t, 0.0), a)
    want = np.asarray(vjp(jnp.ones_like(a))[0])
    got = np.asarray(pc.relu_gate(a))
    np.testing.assert_array_equal(got, want)


# ----------------------------------------------------- integration (fused)

def _fused_vs_tiled(cfg_fn, name_map, d, layer_idx, rng, hw):
    from drsa_audio_tpu.models.vgg import build_layer_specs, init_params
    from drsa_audio_tpu.models.projection import insert_projection
    from drsa_audio_tpu.xai.explain import class_composite, subspace_heatmaps
    from drsa_audio_tpu.xai.drsa.optimizer import random_orthogonal

    specs = build_layer_specs(cfg_fn())
    params = init_params(specs, jax.random.PRNGKey(0))
    U = random_orthogonal(jax.random.PRNGKey(7), d)
    specs_proj = insert_projection(specs, layer_idx, U, 4)
    composite = class_composite(name_map, 4)
    x = jnp.asarray(rng.standard_normal((2, 1) + hw).astype(np.float32))
    h_ref, _ = subspace_heatmaps(specs_proj, params, x, composite, 4,
                                 class_idx=0, nhwc=True, fused=False)
    h_fused, _ = subspace_heatmaps(specs_proj, params, x, composite, 4,
                                   class_idx=0, nhwc=True, fused=True)
    h_ref, h_fused = np.asarray(h_ref), np.asarray(h_fused)
    atol = 1e-5 * np.abs(h_ref).max()
    np.testing.assert_allclose(h_fused, h_ref, rtol=1e-4, atol=atol)


def test_fused_chain_toy_matches_tiled(rng):
    from drsa_audio_tpu.models.vgg import toy_config
    from drsa_audio_tpu.utils.constants import LRP_NAME_MAP_TOY
    _fused_vs_tiled(toy_config, LRP_NAME_MAP_TOY, 16, 10, rng, (64, 64))


def test_fused_chain_gtzan3s_matches_tiled(rng):
    from drsa_audio_tpu.models.vgg import gtzan_3s_config
    from drsa_audio_tpu.utils.constants import LRP_NAME_MAP_GTZAN
    _fused_vs_tiled(gtzan_3s_config, LRP_NAME_MAP_GTZAN, 64, 10, rng,
                    (128, 128))


def test_plan_chain_rejects_unsupported():
    """Unsupported topologies return None so explain_lower falls back to the
    XLA path (e.g. the 6s model: C=100 channels, (2,4) block-1 pool)."""
    import jax as _jax
    from drsa_audio_tpu.models.vgg import (
        build_layer_specs, init_params, gtzan_6s_config, fold_batchnorm,
        toy_config)
    from drsa_audio_tpu.xai.explain import class_composite, _split_at_filter, _conv_section
    from drsa_audio_tpu.models.projection import insert_projection
    from drsa_audio_tpu.xai.drsa.optimizer import random_orthogonal
    from drsa_audio_tpu.xai.lrp.pallas_chain import plan_chain
    from drsa_audio_tpu.utils.constants import LRP_NAME_MAP_TOY

    # toy model with an epsilon-on-first-conv composite: rule mismatch
    specs = build_layer_specs(toy_config())
    params = init_params(specs, _jax.random.PRNGKey(0))
    U = random_orthogonal(_jax.random.PRNGKey(7), 16)
    specs_proj = insert_projection(specs, 10, U, 4)
    bad_map = [("features.0", ("epsilon", {"epsilon": 1e-6}))] + [
        (n, r) for n, r in LRP_NAME_MAP_TOY if n != "features.0"]
    composite = class_composite(bad_map, 4)
    lower, _ = _split_at_filter(specs_proj)
    conv_sec, _ = _conv_section(lower)
    assert plan_chain(conv_sec, params, composite) is None
    # supported composite -> plan exists
    good = class_composite(LRP_NAME_MAP_TOY, 4)
    assert plan_chain(conv_sec, params, good) is not None
    # multi-channel first conv: the packed first-layer kernel assumes mel
    # input (Cin == 1) — plan must fall back, not assert
    import jax.numpy as jnp
    w0 = params[conv_sec[0].name]["w"]
    params_mc = dict(params)
    params_mc[conv_sec[0].name] = {
        **params[conv_sec[0].name],
        "w": jnp.concatenate([w0, w0, w0], axis=1)}
    assert plan_chain(conv_sec, params_mc, good) is None
    # spatial plan: input sizes whose widths don't divide the packing
    # factors / pool kernels must fall back cleanly (not assert in pack())
    assert plan_chain(conv_sec, params, good, fine_hw=(64, 64)) is not None
    assert plan_chain(conv_sec, params, good, fine_hw=(64, 60)) is None
    assert plan_chain(conv_sec, params, good, fine_hw=(63, 64)) is None
    # non-3x3 conv taps: the in-kernel convs hard-code 3x3 stencils
    params_5x5 = dict(params)
    w1_name = next(s for s in conv_sec[1:] if s.kind == "conv").name
    w1 = params[w1_name]["w"]
    params_5x5[w1_name] = {**params[w1_name],
                           "w": jnp.zeros(w1.shape[:2] + (5, 5), w1.dtype)}
    assert plan_chain(conv_sec, params_5x5, good) is None


@pytest.mark.parametrize("C,kw", [(100, 2), (128, 2), (64, 4), (64, 2),
                                  (32, 2)])
def test_general_pool_backward_matches_vjp(C, kw, rng):
    """General (2,kw) pool route at any packing (P=1 for C=100/128, the
    (2,4) block-1 pool of the 6s net at P=2) vs the reduce_window vjp."""
    P = max(1, 128 // C)
    H, W = 8, max(4 * P, 2 * kw)
    K = 3
    a = rng.standard_normal((1, C, H, W)).astype(np.float32)
    a[0, 0, :2, :kw] = 0.0                     # tied window
    a[0, min(1, C - 1), :2, :] = 5.0           # row of equal values
    a = np.maximum(a, 0.0)
    g = rng.standard_normal((K, 1, C, H // 2, W // kw)).astype(np.float32)

    _, vjp = jax.vjp(lambda t: maxpool2d(t, (2, kw)), jnp.asarray(a))
    want = np.stack([np.asarray(vjp(jnp.asarray(g[k]))[0])[0]
                     for k in range(K)])

    ap = to_packed(a, P)[0]
    Rp = jnp.stack([pc.pack(jnp.transpose(jnp.asarray(g[k]), (0, 2, 3, 1)),
                            P)[0] for k in range(K)])

    def fused(a_fine, Rc):
        mask = pc.maxpool_fine_mask(a_fine, C, kw)
        return pc.pool_backward(Rc, mask, C, kw)

    got = run_prim(fused, ap, Rp)
    got_nchw = np.asarray(from_packed(got, C))
    np.testing.assert_array_equal(got_nchw, want)


@pytest.mark.parametrize("layer_idx,d,batch",
                         [(33, 128, 1), (26, 128, 1), (19, 100, 2)])
def test_fused_chain_gtzan6s_matches_tiled(layer_idx, d, batch, rng):
    """The generalized chain on the 6s family: block_depth=2, (2,4) block-1
    pool, C in {64, 100, 128} (P=1 levels), deep first block — vs the XLA
    tiled path (reference workload: getdrsadata.py:72-108 model; layer 33 =
    the deepest DRSA layer, 26 = the mid-depth C=128 layer (one fewer
    block below the projection), 19 = the P=1 C=100 head without pool —
    all three extraction layers of DRSA_LAYERS_GTZAN_6S)."""
    from drsa_audio_tpu.models.vgg import (
        build_layer_specs, init_params, gtzan_6s_config, fold_batchnorm)
    from drsa_audio_tpu.models.projection import insert_projection
    from drsa_audio_tpu.xai.explain import class_composite, subspace_heatmaps
    from drsa_audio_tpu.xai.drsa.optimizer import random_orthogonal
    from drsa_audio_tpu.utils.constants import LRP_NAME_MAP_GTZAN_6S

    specs = build_layer_specs(gtzan_6s_config())
    params = init_params(specs, jax.random.PRNGKey(0))
    specs, params = fold_batchnorm(specs, params)
    U = random_orthogonal(jax.random.PRNGKey(7), d)
    specs_proj = insert_projection(specs, layer_idx, U, 4,
                                   input_size=(128, 256))
    composite = class_composite(LRP_NAME_MAP_GTZAN_6S, 4)
    x = jnp.asarray(rng.standard_normal(
        (batch, 1, 128, 256)).astype(np.float32))
    h_ref, _ = subspace_heatmaps(specs_proj, params, x, composite, 4,
                                 class_idx=0, nhwc=True, fused=False)
    h_fused, _ = subspace_heatmaps(specs_proj, params, x, composite, 4,
                                   class_idx=0, nhwc=True, fused=True)
    h_ref, h_fused = np.asarray(h_ref), np.asarray(h_fused)
    assert np.all(np.isfinite(h_fused))
    atol = 1e-5 * np.abs(h_ref).max()
    np.testing.assert_allclose(h_fused, h_ref, rtol=1e-4, atol=atol)


@pytest.mark.parametrize("Ci,Co", [(32, 32), (32, 64), (64, 64), (100, 100)])
def test_conv3x3_window_packed_matches_xla(Ci, Co, rng):
    """Banded window contraction (3 matmuls) vs the reference conv."""
    P = max(1, 128 // Ci)
    H, W = 8, max(2 * P, 4)
    x = rng.standard_normal((1, Ci, H, W)).astype(np.float32)
    w = (rng.standard_normal((Co, Ci, 3, 3)) * 0.2).astype(np.float32)
    want = np.asarray(conv2d_same(jnp.asarray(x), jnp.asarray(w), None))

    wband = pc.pack_conv_weights_banded(jnp.asarray(w), P)
    xp = to_packed(x, P)[0]
    got = run_prim(functools.partial(pc.conv3x3_window_packed, C=Ci),
                   xp, wband)
    got_nchw = np.asarray(from_packed(got[None], Co))
    np.testing.assert_allclose(got_nchw, want, rtol=1e-5, atol=1e-5)


def test_convT_window_packed_matches_vjp(rng):
    Ci, Co, P = 32, 64, 4
    H, W = 8, 2 * P
    x = rng.standard_normal((1, Ci, H, W)).astype(np.float32)
    g = rng.standard_normal((1, Co, H, W)).astype(np.float32)
    w = (rng.standard_normal((Co, Ci, 3, 3)) * 0.2).astype(np.float32)
    _, vjp = jax.vjp(lambda t: conv2d_same(t, jnp.asarray(w), None),
                     jnp.asarray(x))
    want = np.asarray(vjp(jnp.asarray(g))[0])

    wbT = pc.pack_convT_weights_banded(jnp.asarray(w), P)
    gp = pc.pack(jnp.transpose(jnp.asarray(g), (0, 2, 3, 1)), P)[0]
    got = run_prim(functools.partial(pc.conv3x3_window_packed, C=Co),
                   gp, wbT)
    got_nchw = np.asarray(from_packed(got[None], Ci))
    np.testing.assert_allclose(got_nchw, want, rtol=1e-5, atol=1e-5)


def test_plan_chain_parser_edges():
    """The general parser: deep-first-block limit (at most one gamma conv
    above the first conv), (2,4) pools only above block 0 at P=2, and the
    m0=1 fast path requiring a (2,2) block-1 pool."""
    import dataclasses
    from drsa_audio_tpu.models.vgg import (
        build_layer_specs, init_params, gtzan_6s_config, fold_batchnorm)
    from drsa_audio_tpu.models.projection import insert_projection
    from drsa_audio_tpu.xai.explain import (
        class_composite, _split_at_filter, _conv_section)
    from drsa_audio_tpu.xai.drsa.optimizer import random_orthogonal
    from drsa_audio_tpu.xai.lrp.pallas_chain import plan_chain
    from drsa_audio_tpu.utils.constants import LRP_NAME_MAP_GTZAN_6S

    specs = build_layer_specs(gtzan_6s_config())
    params = init_params(specs, jax.random.PRNGKey(0))
    specs, params = fold_batchnorm(specs, params)
    U = random_orthogonal(jax.random.PRNGKey(7), 128)
    sp = insert_projection(specs, 33, U, 4, input_size=(128, 256))
    lower, _ = _split_at_filter(sp)
    conv_sec, _ = _conv_section(lower)
    comp = class_composite(LRP_NAME_MAP_GTZAN_6S, 4)
    base = plan_chain(conv_sec, params, comp)
    assert base is not None and len(base["blocks"]) == 5

    # three convs in block 0 (insert an extra conv+relu before the pool):
    # deep first kernel supports at most one gamma conv above conv0
    extra_conv = dataclasses.replace(conv_sec[2], name="features.extra")
    extra_relu = dataclasses.replace(conv_sec[3], name="features.extra_relu")
    params2 = dict(params)
    params2["features.extra"] = params[conv_sec[2].name]
    sec3 = conv_sec[:4] + [extra_conv, extra_relu] + conv_sec[4:]
    comp3 = class_composite(
        list(LRP_NAME_MAP_GTZAN_6S)
        + [("features.extra", ("gamma", {"gamma": 0.3}))], 4)
    assert plan_chain(sec3, params2, comp3) is None

    # a (2,4) pool higher up (swap block-2's (2,2) for (2,4)): unsupported
    sec24 = list(conv_sec)
    i_pool2 = next(i for i, s in enumerate(sec24[5:], start=5)
                   if s.kind == "maxpool")
    sec24[i_pool2] = dataclasses.replace(
        sec24[i_pool2], config={**sec24[i_pool2].config, "kernel": (2, 4)})
    assert plan_chain(sec24, params, comp) is None


@pytest.mark.parametrize("cfg_name", ["gtzan3s", "gtzan6s"])
def test_first_layer_mmtaps_flag_parity(cfg_name, rng, monkeypatch):
    """FIRST_LAYER_MMTAPS changes only the first-layer tail contraction
    order — heatmaps must agree to reassociation tolerance on both the
    F-trick (3s) and deep (6s) first kernels."""
    from drsa_audio_tpu.models.vgg import (
        build_layer_specs, init_params, gtzan_3s_config, gtzan_6s_config,
        fold_batchnorm)
    from drsa_audio_tpu.models.projection import insert_projection
    from drsa_audio_tpu.xai.explain import class_composite, subspace_heatmaps
    from drsa_audio_tpu.xai.drsa.optimizer import random_orthogonal
    from drsa_audio_tpu.utils.constants import (
        LRP_NAME_MAP_GTZAN, LRP_NAME_MAP_GTZAN_6S)

    if cfg_name == "gtzan3s":
        specs = build_layer_specs(gtzan_3s_config())
        params = init_params(specs, jax.random.PRNGKey(0))
        U = random_orthogonal(jax.random.PRNGKey(7), 64)
        specs_proj = insert_projection(specs, 10, U, 4)
        composite = class_composite(LRP_NAME_MAP_GTZAN, 4)
        hw = (128, 128)
    else:
        specs = build_layer_specs(gtzan_6s_config())
        params = init_params(specs, jax.random.PRNGKey(0))
        specs, params = fold_batchnorm(specs, params)
        U = random_orthogonal(jax.random.PRNGKey(7), 128)
        specs_proj = insert_projection(specs, 33, U, 4, input_size=(128, 256))
        composite = class_composite(LRP_NAME_MAP_GTZAN_6S, 4)
        hw = (128, 256)
    x = jnp.asarray(rng.standard_normal((1, 1) + hw).astype(np.float32))

    monkeypatch.setattr(pc, "FIRST_LAYER_MMTAPS", False)
    h_vpu, _ = subspace_heatmaps(specs_proj, params, x, composite, 4,
                                 class_idx=0, nhwc=True, fused=True)
    monkeypatch.setattr(pc, "FIRST_LAYER_MMTAPS", True)
    h_mm, _ = subspace_heatmaps(specs_proj, params, x, composite, 4,
                                class_idx=0, nhwc=True, fused=True)
    h_vpu, h_mm = np.asarray(h_vpu), np.asarray(h_mm)
    atol = 1e-6 * np.abs(h_vpu).max()
    np.testing.assert_allclose(h_mm, h_vpu, rtol=1e-5, atol=atol)


@pytest.mark.parametrize("cfg_name", ["gtzan3s", "toy"])
def test_chain_merged_flag_parity(cfg_name, rng, monkeypatch):
    """CHAIN_MERGED fuses blocks nb-2..0 into one kernel (mid-chain
    relevances never leave VMEM) — heatmaps must match the multi-kernel
    default to reassociation tolerance on both supported families."""
    from drsa_audio_tpu.models.vgg import (
        build_layer_specs, init_params, gtzan_3s_config, toy_config)
    from drsa_audio_tpu.models.projection import insert_projection
    from drsa_audio_tpu.xai.explain import class_composite, subspace_heatmaps
    from drsa_audio_tpu.xai.drsa.optimizer import random_orthogonal
    from drsa_audio_tpu.utils.constants import (
        LRP_NAME_MAP_GTZAN, LRP_NAME_MAP_TOY)

    if cfg_name == "gtzan3s":
        specs = build_layer_specs(gtzan_3s_config())
        d, name_map, hw = 64, LRP_NAME_MAP_GTZAN, (128, 128)
    else:
        specs = build_layer_specs(toy_config())
        d, name_map, hw = 16, LRP_NAME_MAP_TOY, (64, 64)
    params = init_params(specs, jax.random.PRNGKey(0))
    U = random_orthogonal(jax.random.PRNGKey(7), d)
    specs_proj = insert_projection(specs, 10, U, 4)
    composite = class_composite(name_map, 4)
    x = jnp.asarray(rng.standard_normal((2, 1) + hw).astype(np.float32))

    monkeypatch.setattr(pc, "CHAIN_MERGED", False)
    h_multi, _ = subspace_heatmaps(specs_proj, params, x, composite, 4,
                                   class_idx=0, nhwc=True, fused=True)
    monkeypatch.setattr(pc, "CHAIN_MERGED", True)
    h_merged, _ = subspace_heatmaps(specs_proj, params, x, composite, 4,
                                    class_idx=0, nhwc=True, fused=True)
    h_multi, h_merged = np.asarray(h_multi), np.asarray(h_merged)
    assert np.isfinite(h_merged).all()
    atol = 1e-6 * np.abs(h_multi).max()
    np.testing.assert_allclose(h_merged, h_multi, rtol=1e-5, atol=atol)


@pytest.mark.parametrize("cfg_name", ["gtzan3s", "gtzan6s"])
def test_inner_window_conv_flag_parity(cfg_name, rng, monkeypatch):
    """INNER_WINDOW_CONV swaps the inner-conv contraction for banded window
    matmuls — heatmaps must agree to reassociation tolerance."""
    from drsa_audio_tpu.models.vgg import (
        build_layer_specs, init_params, gtzan_3s_config, gtzan_6s_config,
        fold_batchnorm)
    from drsa_audio_tpu.models.projection import insert_projection
    from drsa_audio_tpu.xai.explain import class_composite, subspace_heatmaps
    from drsa_audio_tpu.xai.drsa.optimizer import random_orthogonal
    from drsa_audio_tpu.utils.constants import (
        LRP_NAME_MAP_GTZAN, LRP_NAME_MAP_GTZAN_6S)

    if cfg_name == "gtzan3s":
        specs = build_layer_specs(gtzan_3s_config())
        params = init_params(specs, jax.random.PRNGKey(0))
        U = random_orthogonal(jax.random.PRNGKey(7), 64)
        specs_proj = insert_projection(specs, 10, U, 4)
        composite = class_composite(LRP_NAME_MAP_GTZAN, 4)
        hw = (128, 128)
    else:
        specs = build_layer_specs(gtzan_6s_config())
        params = init_params(specs, jax.random.PRNGKey(0))
        specs, params = fold_batchnorm(specs, params)
        U = random_orthogonal(jax.random.PRNGKey(7), 128)
        specs_proj = insert_projection(specs, 33, U, 4, input_size=(128, 256))
        composite = class_composite(LRP_NAME_MAP_GTZAN_6S, 4)
        hw = (128, 256)
    x = jnp.asarray(rng.standard_normal((1, 1) + hw).astype(np.float32))

    monkeypatch.setattr(pc, "INNER_WINDOW_CONV", False)
    h_tap, _ = subspace_heatmaps(specs_proj, params, x, composite, 4,
                                 class_idx=0, nhwc=True, fused=True)
    monkeypatch.setattr(pc, "INNER_WINDOW_CONV", True)
    h_win, _ = subspace_heatmaps(specs_proj, params, x, composite, 4,
                                 class_idx=0, nhwc=True, fused=True)
    h_tap, h_win = np.asarray(h_tap), np.asarray(h_win)
    atol = 1e-5 * np.abs(h_tap).max()
    np.testing.assert_allclose(h_win, h_tap, rtol=1e-4, atol=atol)


def test_fused_chain_p1_first_block_matches_tiled(rng):
    """A first conv with Co > 64 packs at P0=1 — the first-layer kernel must
    route its pool backward through the general dispatch (group-repeat)
    instead of asserting P >= 2 (review finding, round-3 continued)."""
    from drsa_audio_tpu.models.vgg import build_layer_specs, init_params, VGGConfig
    from drsa_audio_tpu.models.projection import insert_projection
    from drsa_audio_tpu.xai.explain import (
        class_composite, subspace_heatmaps, _split_at_filter, _conv_section)
    from drsa_audio_tpu.xai.drsa.optimizer import random_orthogonal
    from drsa_audio_tpu.xai.lrp.pallas_chain import plan_chain

    cfg = VGGConfig(n_filters=(100, 100, 100), n_dense=32,
                    pool_kernels=((2, 2),) * 3, dropout=0.0,
                    input_size=(32, 32), n_classes=4, conv_bn=False,
                    dense_bn=False, block_depth=1)
    specs = build_layer_specs(cfg)
    params = init_params(specs, jax.random.PRNGKey(0))
    name_map = [("features.0", ("wsquare", {"stabilizer": 1e-7})),
                ("features.3", ("gamma", {"gamma": 0.3, "stabilizer": 1e-7})),
                ("features.6", ("gamma", {"gamma": 0.3, "stabilizer": 1e-7}))]
    for s in specs:
        if s.kind == "linear":
            name_map.append((s.name, ("epsilon", {"epsilon": 1e-7})))
    composite = class_composite(name_map, 2)
    U = random_orthogonal(jax.random.PRNGKey(7), 100)
    specs_proj = insert_projection(specs, 7, U, 2, input_size=(32, 32))
    lower, _ = _split_at_filter(specs_proj)
    conv_sec, _ = _conv_section(lower)
    plan = plan_chain(conv_sec, params, composite)
    assert plan is not None and plan["blocks"][0]["P"] == 1
    x = jnp.asarray(rng.standard_normal((2, 1, 32, 32)).astype(np.float32))
    h_ref, _ = subspace_heatmaps(specs_proj, params, x, composite, 2,
                                 class_idx=0, nhwc=True, fused=False)
    h_fused, _ = subspace_heatmaps(specs_proj, params, x, composite, 2,
                                   class_idx=0, nhwc=True, fused=True)
    h_ref, h_fused = np.asarray(h_ref), np.asarray(h_fused)
    atol = 1e-5 * np.abs(h_ref).max()
    np.testing.assert_allclose(h_fused, h_ref, rtol=1e-4, atol=atol)


def test_row_bands_layout(rng):
    """_row_bands: interior rows replicate the source, halo rows at the true
    array edges are zeros, and band t covers rows [t*Bf - halo, (t+1)*Bf +
    halo) — the contract the banded deep first-block kernel slices by."""
    x = jnp.asarray(rng.standard_normal((2, 16, 4, 8)).astype(np.float32))
    Bf, halo = 4, 2
    b = np.asarray(pc._row_bands(x, Bf, halo, axis=1))
    assert b.shape == (2, 4, Bf + 2 * halo, 4, 8)
    xs = np.asarray(x)
    for t in range(4):
        lo = t * Bf - halo
        for i in range(Bf + 2 * halo):
            g = lo + i
            if 0 <= g < 16:
                np.testing.assert_array_equal(b[:, t, i], xs[:, g])
            else:
                np.testing.assert_array_equal(b[:, t, i], 0.0)
