"""LRP rules as functional modified-backward primitives.

Each rule takes the layer's *linear apply factory* — a function
``apply_with(w_mod, b_mod) -> (x -> z)`` that rebuilds the layer forward with
modified parameters — plus the recorded input activation and incoming
relevance, and returns the relevance redistributed to the layer input.

The algebra matches zennit 0.5.1 rule semantics (the library the reference
drives its attribution with — reference cxai/utils/constants.py:27-51,
cxai/xai/pixelflipping/pf.py:18-27):

  epsilon    R_in = x * vjp(R / stab(f(x)))
  zplus      two-term positive/negative input split with clamped params
  gamma      generalized gamma: 4 clamp combinations gated by output sign
  wsquare    z = f(1; w^2, b^2); R_in = vjp(R / stab(z))
  flat       z = f(1; 1, 0);     R_in = vjp(R / stab(z))
  alphabeta  alpha * positive part - beta * negative part
  norm       R_in = x * vjp(R / stab(f(x; w, 0)))
  pass       identity

Every rule is pure and jit/vmap-compatible; the backward of the modified
forward is obtained with jax.vjp (for convs XLA emits conv_transpose).
LRP backward is linear in R given fixed activations — a property the
subspace-heatmap fast path exploits (see engine.generate_subspace_heatmaps).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

# apply_with(w_mod, b_mod) -> forward function of the layer with params
# transformed by w_mod and b_mod (b_mod may return None to drop the bias).
ApplyFactory = Callable[[Callable, Callable | None], Callable]


def stabilize(z: jnp.ndarray, epsilon: float) -> jnp.ndarray:
    """z + eps * sign(z), with sign(0) := +1 (zennit Stabilizer)."""
    sign = jnp.where(z >= 0, 1.0, -1.0)
    return z + sign * epsilon


def _identity(p):
    return p


def _zero(p):
    return jnp.zeros_like(p)


def _pos(p):
    return jnp.maximum(p, 0.0)


def _neg(p):
    return jnp.minimum(p, 0.0)


def lrp_epsilon(apply_with: ApplyFactory, x, R, *, epsilon: float = 1e-6, **_):
    f = apply_with(_identity, _identity)
    z, vjp = jax.vjp(f, x)
    (c,) = vjp(R / stabilize(z, epsilon))
    return x * c


def lrp_norm(apply_with: ApplyFactory, x, R, *, stabilizer: float = 1e-6, **_):
    f = apply_with(_identity, _zero)
    z, vjp = jax.vjp(f, x)
    (c,) = vjp(R / stabilize(z, stabilizer))
    return x * c


def lrp_zplus(apply_with: ApplyFactory, x, R, *, stabilizer: float = 1e-6, **_):
    xp, xn = jnp.maximum(x, 0.0), jnp.minimum(x, 0.0)
    if hasattr(apply_with, "grouped_multi"):
        f = apply_with.grouped_multi([_pos, _neg], [_pos, None])
        (z1, z2), vjp = jax.vjp(f, xp, xn)
        s = R / stabilize(z1 + z2, stabilizer)
        c1, c2 = vjp((s, s))
        return xp * c1 + xn * c2
    f1 = apply_with(_pos, _pos)           # (x+, w+, b+)
    f2 = apply_with(_neg, _zero)          # (x-, w-, 0)
    z1, vjp1 = jax.vjp(f1, xp)
    z2, vjp2 = jax.vjp(f2, xn)
    s = R / stabilize(z1 + z2, stabilizer)
    (c1,) = vjp1(s)
    (c2,) = vjp2(s)
    return xp * c1 + xn * c2


def lrp_gamma(apply_with: ApplyFactory, x, R, *, gamma: float = 0.25,
              stabilizer: float = 1e-6, **_):
    """Generalized gamma rule (zennit 0.5.1): handles negative inputs and
    negative outputs via four clamp combinations gated by the true output
    sign."""
    xp, xn = jnp.maximum(x, 0.0), jnp.minimum(x, 0.0)

    def gmod_pos(p):
        return p + gamma * jnp.maximum(p, 0.0)

    def gmod_neg(p):
        return p + gamma * jnp.minimum(p, 0.0)

    if hasattr(apply_with, "grouped_multi"):
        # all 5 modified forwards in ONE grouped kernel; vjp likewise
        f = apply_with.grouped_multi(
            [gmod_pos, gmod_neg, gmod_neg, gmod_pos, _identity],
            [gmod_pos, gmod_neg, None, None, _identity])
        (z1, z2, z3, z4, z_true), vjp = jax.vjp(f, xp, xn, xp, xn, x)
        pos_mask = (z_true > 0.0).astype(R.dtype)
        neg_mask = (z_true < 0.0).astype(R.dtype)
        s_pos = R * pos_mask / stabilize(z1 + z2, stabilizer)
        s_neg = R * neg_mask / stabilize(z3 + z4, stabilizer)
        c1, c2, c3, c4, _ = vjp((s_pos, s_pos, s_neg, s_neg,
                                 jnp.zeros_like(z_true)))
        return xp * c1 + xn * c2 + xp * c3 + xn * c4

    f1 = apply_with(gmod_pos, gmod_pos)   # (x+, w + g*w+, b + g*b+)
    f2 = apply_with(gmod_neg, gmod_neg)   # (x-, w + g*w-, b + g*b-)
    f3 = apply_with(gmod_neg, _zero)      # (x+, w + g*w-, 0)
    f4 = apply_with(gmod_pos, _zero)      # (x-, w + g*w+, 0)
    f_true = apply_with(_identity, _identity)

    z1, vjp1 = jax.vjp(f1, xp)
    z2, vjp2 = jax.vjp(f2, xn)
    z3, vjp3 = jax.vjp(f3, xp)
    z4, vjp4 = jax.vjp(f4, xn)
    z_true = f_true(x)

    pos_mask = (z_true > 0.0).astype(R.dtype)
    neg_mask = (z_true < 0.0).astype(R.dtype)
    s_pos = R * pos_mask / stabilize(z1 + z2, stabilizer)
    s_neg = R * neg_mask / stabilize(z3 + z4, stabilizer)

    (c1,) = vjp1(s_pos)
    (c2,) = vjp2(s_pos)
    (c3,) = vjp3(s_neg)
    (c4,) = vjp4(s_neg)
    return xp * c1 + xn * c2 + xp * c3 + xn * c4


def lrp_gamma_nonneg(apply_with: ApplyFactory, x, R, *, gamma: float = 0.25,
                     stabilizer: float = 1e-6, **_):
    """Gamma rule specialized for provably non-negative inputs (post-ReLU /
    MaxPool): with x- = 0 the x- vjp branches vanish identically
    (x- * c = 0), leaving 2 vjps instead of 4. The x- combos still
    contribute their BIAS terms to the denominators: z2 = f(0; ., b + g*b-)
    (constant-folded conv of zeros) and z4 = f(0; ., 0) = 0. Exactly equal to
    lrp_gamma on non-negative x (tested)."""
    def gmod_pos(p):
        return p + gamma * jnp.maximum(p, 0.0)

    def gmod_neg(p):
        return p + gamma * jnp.minimum(p, 0.0)

    if hasattr(apply_with, "grouped"):
        # Fused path: both modified forwards in ONE grouped kernel; z_true is
        # derived algebraically — w+ + w- = w, so
        # z1 + z3 = conv(x, 2w + g*w) + bias1 = (2+g)*f_true_nobias(x) + bias1.
        f = apply_with.grouped([gmod_pos, gmod_neg], [gmod_pos, None])
        (z1, z3), vjp = jax.vjp(f, x)
        bias1 = apply_with.bias_of(gmod_pos)
        bias0 = apply_with.bias_of(_identity)
        z2 = apply_with.bias_of(gmod_neg)
        z_true = (z1 + z3 - bias1) / (2.0 + gamma) + bias0

        pos_mask = (z_true > 0.0).astype(R.dtype)
        neg_mask = (z_true < 0.0).astype(R.dtype)
        s1 = R * pos_mask / stabilize(z1 + z2, stabilizer)
        s3 = R * neg_mask / stabilize(z3, stabilizer)
        (c,) = vjp((s1, s3))
        return x * c

    f1 = apply_with(gmod_pos, gmod_pos)   # (x, w + g*w+, b + g*b+)
    f2 = apply_with(gmod_neg, gmod_neg)   # bias term only (input is zero)
    f3 = apply_with(gmod_neg, _zero)      # (x, w + g*w-, 0)
    f_true = apply_with(_identity, _identity)

    z1, vjp1 = jax.vjp(f1, x)
    z2 = f2(jnp.zeros_like(x))
    z3, vjp3 = jax.vjp(f3, x)
    z_true = f_true(x)

    pos_mask = (z_true > 0.0).astype(R.dtype)
    neg_mask = (z_true < 0.0).astype(R.dtype)
    (c1,) = vjp1(R * pos_mask / stabilize(z1 + z2, stabilizer))
    (c3,) = vjp3(R * neg_mask / stabilize(z3, stabilizer))
    return x * (c1 + c3)


def lrp_wsquare(apply_with: ApplyFactory, x, R, *, stabilizer: float = 1e-6, **_):
    def sq(p):
        return p * p
    f = apply_with(sq, sq)
    ones = jnp.ones_like(x)
    z, vjp = jax.vjp(f, ones)
    (c,) = vjp(R / stabilize(z, stabilizer))
    return c


def lrp_flat(apply_with: ApplyFactory, x, R, *, stabilizer: float = 1e-6, **_):
    def ones_mod(p):
        return jnp.ones_like(p)
    f = apply_with(ones_mod, _zero)
    ones = jnp.ones_like(x)
    z, vjp = jax.vjp(f, ones)
    (c,) = vjp(R / stabilize(z, stabilizer))
    return c


def lrp_alphabeta(apply_with: ApplyFactory, x, R, *, alpha: float = 2.0,
                  beta: float = 1.0, stabilizer: float = 1e-6, **_):
    xp, xn = jnp.maximum(x, 0.0), jnp.minimum(x, 0.0)
    if hasattr(apply_with, "grouped_multi"):
        f = apply_with.grouped_multi([_pos, _neg, _neg, _pos],
                                     [_pos, None, _neg, None])
        (z1, z2, z3, z4), vjp = jax.vjp(f, xp, xn, xp, xn)
        s_a = R / stabilize(z1 + z2, stabilizer)
        s_b = R / stabilize(z3 + z4, stabilizer)
        c1, c2, c3, c4 = vjp((s_a, s_a, s_b, s_b))
        return alpha * (xp * c1 + xn * c2) - beta * (xp * c3 + xn * c4)

    f1 = apply_with(_pos, _pos)           # (x+, w+, b+)
    f2 = apply_with(_neg, _zero)          # (x-, w-, 0)
    f3 = apply_with(_neg, _neg)           # (x+, w-, b-)
    f4 = apply_with(_pos, _zero)          # (x-, w+, 0)

    z1, vjp1 = jax.vjp(f1, xp)
    z2, vjp2 = jax.vjp(f2, xn)
    z3, vjp3 = jax.vjp(f3, xp)
    z4, vjp4 = jax.vjp(f4, xn)

    s_a = R / stabilize(z1 + z2, stabilizer)
    s_b = R / stabilize(z3 + z4, stabilizer)
    (c1,) = vjp1(s_a)
    (c2,) = vjp2(s_a)
    (c3,) = vjp3(s_b)
    (c4,) = vjp4(s_b)
    return alpha * (xp * c1 + xn * c2) - beta * (xp * c3 + xn * c4)


def lrp_zbox(apply_with: ApplyFactory, x, R, *, low: float = -1.0,
             high: float = 1.0, stabilizer: float = 1e-6, **_):
    """ZBox rule for box-constrained first layers (zennit ZBox; imported by
    the reference's cluster script, getdrsadata.py:10):
    z = f(x) - f(l; w+, b+) - f(h; w-, b-) with constant bounds l <= x <= h;
    R_in = x*c - l*c_l - h*c_h."""
    l = jnp.full_like(x, low)
    h = jnp.full_like(x, high)
    f = apply_with(_identity, _identity)
    f_pos = apply_with(_pos, _pos)
    f_neg = apply_with(_neg, _neg)
    z, vjp = jax.vjp(f, x)
    zl, vjp_l = jax.vjp(f_pos, l)
    zh, vjp_h = jax.vjp(f_neg, h)
    s = R / stabilize(z - zl - zh, stabilizer)
    (c,) = vjp(s)
    (cl,) = vjp_l(s)
    (ch,) = vjp_h(s)
    return x * c - l * cl - h * ch


def lrp_pass(apply_with: ApplyFactory, x, R, **_):
    return R


def lrp_subspace_mask(apply_with: ApplyFactory, x, R, *, num_concepts: int = 4, **_):
    """SubspaceHook equivalent (reference cxai/xai/explain/attribute.py:42-60).

    Input batch is repeated (K+1) per instance; R has shape
    [batch*(K+1), n, K, d_k]. Clone 0 keeps everything (standard heatmap);
    clone k keeps only subspace k.
    """
    k = num_concepts
    b_total, n, kk, d_k = R.shape
    R = R.reshape(-1, k + 1, n, kk, d_k)
    eye = jnp.eye(k, dtype=R.dtype)[None, :, None, :, None]
    masked = R[:, 1:] * eye
    R = jnp.concatenate([R[:, :1], masked], axis=1)
    return R.reshape(b_total, n, kk, d_k)


RULES = {
    "epsilon": lrp_epsilon,
    "gamma": lrp_gamma,
    "gamma_nonneg": lrp_gamma_nonneg,
    "zplus": lrp_zplus,
    "alphabeta": lrp_alphabeta,
    "flat": lrp_flat,
    "wsquare": lrp_wsquare,
    "norm": lrp_norm,
    "zbox": lrp_zbox,
    "pass": lrp_pass,
    "subspace_mask": lrp_subspace_mask,
}


# --------------------------------------------------------------------------
# Shared-activation variants: K relevance clones over ONE activation batch.
#
# In the subspace fast path the K concept clones share every activation
# (explain.explain_lower), so each rule's forward pass — the z denominators,
# output-sign masks and stabilized reciprocals — is identical across clones.
# These variants take x at batch b and R at batch K*b: the modified forwards
# run ONCE at b, the masks/denominators broadcast onto the K*b relevance, and
# only the vjp (the conv transpose, the irreducible per-clone work) runs at
# K*b. The vjp is built on a broadcast-tiled primal whose forward outputs are
# unused — a linear layer's vjp never reads its primal values, so XLA
# dead-code-eliminates that forward under jit.


def _expand_batch(t: jnp.ndarray, K: int) -> jnp.ndarray:
    """[b, ...] -> [K*b, ...] clone-tiling (fused into consumers by XLA)."""
    return jnp.broadcast_to(t[None], (K,) + t.shape).reshape(
        (K * t.shape[0],) + t.shape[1:])


def _mul_small(big: jnp.ndarray, small: jnp.ndarray, K: int) -> jnp.ndarray:
    """big [K*b, ...] * small [b, ...] without materializing the tile."""
    b = small.shape[0]
    return (big.reshape((K, b) + big.shape[1:]) * small[None]).reshape(big.shape)


def shared_epsilon(apply_with, x, R, K: int, *, epsilon: float = 1e-6, **_):
    f = apply_with(_identity, _identity)
    z = f(x)
    s = _mul_small(R, 1.0 / stabilize(z, epsilon), K)
    _, vjp = jax.vjp(f, _expand_batch(x, K))
    (c,) = vjp(s)
    return _mul_small(c, x, K)


def shared_norm(apply_with, x, R, K: int, *, stabilizer: float = 1e-6, **_):
    f = apply_with(_identity, _zero)
    z = f(x)
    s = _mul_small(R, 1.0 / stabilize(z, stabilizer), K)
    _, vjp = jax.vjp(f, _expand_batch(x, K))
    (c,) = vjp(s)
    return _mul_small(c, x, K)


def shared_gamma_nonneg(apply_with, x, R, K: int, *, gamma: float = 0.25,
                        stabilizer: float = 1e-6, **_):
    if not hasattr(apply_with, "grouped"):
        return lrp_gamma_nonneg(apply_with, _expand_batch(x, K), R,
                                gamma=gamma, stabilizer=stabilizer)

    def gmod_pos(p):
        return p + gamma * jnp.maximum(p, 0.0)

    def gmod_neg(p):
        return p + gamma * jnp.minimum(p, 0.0)

    f = apply_with.grouped([gmod_pos, gmod_neg], [gmod_pos, None])
    z1, z3 = f(x)
    bias1 = apply_with.bias_of(gmod_pos)
    bias0 = apply_with.bias_of(_identity)
    z2 = apply_with.bias_of(gmod_neg)
    z_true = (z1 + z3 - bias1) / (2.0 + gamma) + bias0

    m1 = (z_true > 0.0).astype(R.dtype) / stabilize(z1 + z2, stabilizer)
    m3 = (z_true < 0.0).astype(R.dtype) / stabilize(z3, stabilizer)
    s1 = _mul_small(R, m1, K)
    s3 = _mul_small(R, m3, K)
    _, vjp = jax.vjp(f, _expand_batch(x, K))
    (c,) = vjp((s1, s3))
    return _mul_small(c, x, K)


def shared_gamma(apply_with, x, R, K: int, *, gamma: float = 0.25,
                 stabilizer: float = 1e-6, **_):
    if not hasattr(apply_with, "grouped_multi"):
        return lrp_gamma(apply_with, _expand_batch(x, K), R,
                         gamma=gamma, stabilizer=stabilizer)
    xp, xn = jnp.maximum(x, 0.0), jnp.minimum(x, 0.0)

    def gmod_pos(p):
        return p + gamma * jnp.maximum(p, 0.0)

    def gmod_neg(p):
        return p + gamma * jnp.minimum(p, 0.0)

    f = apply_with.grouped_multi(
        [gmod_pos, gmod_neg, gmod_neg, gmod_pos, _identity],
        [gmod_pos, gmod_neg, None, None, _identity])
    z1, z2, z3, z4, z_true = f(xp, xn, xp, xn, x)
    m_pos = (z_true > 0.0).astype(R.dtype) / stabilize(z1 + z2, stabilizer)
    m_neg = (z_true < 0.0).astype(R.dtype) / stabilize(z3 + z4, stabilizer)
    s_pos = _mul_small(R, m_pos, K)
    s_neg = _mul_small(R, m_neg, K)
    xpe, xne = _expand_batch(xp, K), _expand_batch(xn, K)
    _, vjp = jax.vjp(f, xpe, xne, xpe, xne, _expand_batch(x, K))
    zero = jnp.zeros((R.shape[0],) + z_true.shape[1:], R.dtype)
    c1, c2, c3, c4, _ = vjp((s_pos, s_pos, s_neg, s_neg, zero))
    return (_mul_small(c1, xp, K) + _mul_small(c2, xn, K)
            + _mul_small(c3, xp, K) + _mul_small(c4, xn, K))


def shared_zplus(apply_with, x, R, K: int, *, stabilizer: float = 1e-6, **_):
    if not hasattr(apply_with, "grouped_multi"):
        return lrp_zplus(apply_with, _expand_batch(x, K), R,
                         stabilizer=stabilizer)
    xp, xn = jnp.maximum(x, 0.0), jnp.minimum(x, 0.0)
    f = apply_with.grouped_multi([_pos, _neg], [_pos, None])
    z1, z2 = f(xp, xn)
    m = 1.0 / stabilize(z1 + z2, stabilizer)
    s = _mul_small(R, m, K)
    xpe, xne = _expand_batch(xp, K), _expand_batch(xn, K)
    _, vjp = jax.vjp(f, xpe, xne)
    c1, c2 = vjp((s, s))
    return _mul_small(c1, xp, K) + _mul_small(c2, xn, K)


def shared_alphabeta(apply_with, x, R, K: int, *, alpha: float = 2.0,
                     beta: float = 1.0, stabilizer: float = 1e-6, **_):
    if not hasattr(apply_with, "grouped_multi"):
        return lrp_alphabeta(apply_with, _expand_batch(x, K), R, alpha=alpha,
                             beta=beta, stabilizer=stabilizer)
    xp, xn = jnp.maximum(x, 0.0), jnp.minimum(x, 0.0)
    f = apply_with.grouped_multi([_pos, _neg, _neg, _pos],
                                 [_pos, None, _neg, None])
    z1, z2, z3, z4 = f(xp, xn, xp, xn)
    m_a = 1.0 / stabilize(z1 + z2, stabilizer)
    m_b = 1.0 / stabilize(z3 + z4, stabilizer)
    s_a = _mul_small(R, m_a, K)
    s_b = _mul_small(R, m_b, K)
    xpe, xne = _expand_batch(xp, K), _expand_batch(xn, K)
    _, vjp = jax.vjp(f, xpe, xne, xpe, xne)
    c1, c2, c3, c4 = vjp((s_a, s_a, s_b, s_b))
    return (alpha * (_mul_small(c1, xp, K) + _mul_small(c2, xn, K))
            - beta * (_mul_small(c3, xp, K) + _mul_small(c4, xn, K)))


def shared_wsquare(apply_with, x, R, K: int, *, stabilizer: float = 1e-6, **_):
    def sq(p):
        return p * p
    f = apply_with(sq, sq)
    ones = jnp.ones_like(x)
    z = f(ones)
    s = _mul_small(R, 1.0 / stabilize(z, stabilizer), K)
    _, vjp = jax.vjp(f, _expand_batch(ones, K))
    (c,) = vjp(s)
    return c


def shared_flat(apply_with, x, R, K: int, *, stabilizer: float = 1e-6, **_):
    def ones_mod(p):
        return jnp.ones_like(p)
    f = apply_with(ones_mod, _zero)
    ones = jnp.ones_like(x)
    z = f(ones)
    s = _mul_small(R, 1.0 / stabilize(z, stabilizer), K)
    _, vjp = jax.vjp(f, _expand_batch(ones, K))
    (c,) = vjp(s)
    return c


SHARED_RULES = {
    "epsilon": shared_epsilon,
    "norm": shared_norm,
    "gamma": shared_gamma,
    "gamma_nonneg": shared_gamma_nonneg,
    "zplus": shared_zplus,
    "alphabeta": shared_alphabeta,
    "wsquare": shared_wsquare,
    "flat": shared_flat,
}
