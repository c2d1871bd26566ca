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
