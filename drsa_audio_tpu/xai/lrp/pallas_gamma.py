"""Fused Pallas gamma-rule backward for 3x3 SAME convs (the LRP hot kernel).

One grid step = one instance: the rule's modified forward (the z1/z3
denominators, computed as 9 shifted MXU dots over a VMEM-padded image) runs
ONCE, and the K folded relevance clones are pushed through the transposed
conv inside the same kernel — z, the sign masks, and the stabilized
reciprocals never round-trip to HBM, and the clone-shared work is not
re-done per clone (the XLA paths pay either K-times-tiled activations
[explain_lower default] or broadcast-materialization glue
[shared_denominators=True]).

Covers `gamma_nonneg` — the rule on every ReLU-gated conv of the lower LRP
segment (rules.py:145-176; reference zennit Gamma on post-ReLU layers).
Math is bit-aligned with rules.lrp_gamma_nonneg: z_true derived
algebraically from z1+z3, z2 = bias-only term, s = R*mask/stabilize(z),
R_out = x * (convT(s1, W+) + convT(s3, W-)).

Layout: NHWC inside the kernel (channels on lanes); the wrapper transposes
from the engine's NCHW at batch b (x) and K*b (R) — amortized, the
intermediates stay in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv9(xpad, w9, H, W):
    """3x3 SAME conv as 9 shifted dots: xpad [H+2, W+2, Ci] (zeros border),
    w9 [9, Ci, Co] -> [H, W, Co]. Contraction over the minor (lane) dim."""
    acc = None
    for dy in range(3):
        for dx in range(3):
            xs = xpad[dy:dy + H, dx:dx + W, :]
            d = jax.lax.dot_general(
                xs, w9[dy * 3 + dx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
    return acc


def _gamma_nonneg_kernel(x_ref, r_ref, wf_ref, wb_ref, bias_ref, out_ref,
                         xpad_ref, spad_ref, *, H, W, Ci, Co, K,
                         gamma, stabilizer):
    """One instance: x [H, W, Ci], R [K, H, W, Co] -> R_out [K, H, W, Ci].

    wf [9, Ci, 2Co]: gmod_pos(w) | gmod_neg(w) stacked on the out axis.
    wb [9, 2Co, Ci]: the transposed conv weights — wb[dy*3+dx] =
      concat(gmod_pos(w), gmod_neg(w))[2-dy, 2-dx].swap(ci, co).
    bias [3, Co]: rows = (bias1 = gmod_pos(b), z2 = gmod_neg(b), bias0 = b).
    """
    # ---- pad x into VMEM scratch (zeros border = SAME padding)
    xpad_ref[:] = jnp.zeros((H + 2, W + 2, Ci), jnp.float32)
    x = x_ref[0]
    xpad_ref[1:H + 1, 1:W + 1, :] = x

    # ---- rule forward ONCE: z1|z3 [H, W, 2Co]
    z13 = _conv9(xpad_ref[:], wf_ref[:], H, W)
    bias1 = bias_ref[0, :]
    z2 = bias_ref[1, :]
    bias0 = bias_ref[2, :]
    z1 = z13[..., :Co] + bias1
    z3 = z13[..., Co:]
    z_true = (z1 + z3 - bias1) * np.float32(1.0 / (2.0 + gamma)) + bias0

    def stab(z):
        return z + jnp.where(z >= 0.0, stabilizer, -stabilizer)

    m1 = jnp.where(z_true > 0.0, 1.0, 0.0) / stab(z1 + z2)
    m3 = jnp.where(z_true < 0.0, 1.0, 0.0) / stab(z3)

    # ---- K clones: s = R*mask/z stacked [H, W, 2Co] -> transposed conv
    for k in range(K):
        r = r_ref[0, k]
        spad_ref[:] = jnp.zeros((H + 2, W + 2, 2 * Co), jnp.float32)
        spad_ref[1:H + 1, 1:W + 1, :] = jnp.concatenate(
            [r * m1, r * m3], axis=-1)
        c = _conv9(spad_ref[:], wb_ref[:], H, W)
        out_ref[0, k] = c * x


def _prepare_weights(w_oihw: np.ndarray, b: np.ndarray, gamma: float):
    """Pack [Co, Ci, 3, 3] + [Co] into (wf [9, Ci, 2Co], wb [9, 2Co, Ci],
    bias [3, Co])."""
    w = jnp.asarray(w_oihw, jnp.float32)
    wp = w + gamma * jnp.maximum(w, 0.0)
    wn = w + gamma * jnp.minimum(w, 0.0)
    # forward: [dy, dx, Ci, Co] stacked out -> [9, Ci, 2Co]
    wf = jnp.concatenate([wp, wn], axis=0)           # [2Co, Ci, 3, 3]
    wf = jnp.transpose(wf, (2, 3, 1, 0)).reshape(9, w.shape[1],
                                                 2 * w.shape[0])
    # transposed conv: flip spatially, swap ci/co -> [9, 2Co, Ci]
    wcat = jnp.concatenate([wp, wn], axis=0)          # [2Co, Ci, 3, 3]
    wb = jnp.transpose(wcat[:, :, ::-1, ::-1], (2, 3, 0, 1)).reshape(
        9, 2 * w.shape[0], w.shape[1])
    bias = jnp.asarray(b, jnp.float32)
    bias3 = jnp.stack([bias + gamma * jnp.maximum(bias, 0.0),
                       bias + gamma * jnp.minimum(bias, 0.0),
                       bias], axis=0)                 # [3, Co]
    return wf, wb, bias3


@functools.partial(jax.jit,
                   static_argnames=("num_concepts", "gamma", "stabilizer",
                                    "interpret"))
def pallas_gamma_nonneg(x_nchw, R_nchw, w_oihw, b, num_concepts: int,
                        gamma: float = 0.25, stabilizer: float = 1e-6,
                        interpret: bool = False):
    """Drop-in for rules.lrp_gamma_nonneg on a 3x3 SAME conv with the K
    clones FOLDED into R's batch (clone-major, explain_lower layout).

    x_nchw: [b, Ci, H, W] shared activations; R_nchw: [K*b, Co, H, W].
    Returns R_out [K*b, Ci, H, W].
    """
    K = num_concepts
    b_sz, Ci, H, W = x_nchw.shape
    Co = w_oihw.shape[0]
    wf, wb, bias3 = _prepare_weights(w_oihw, b, gamma)

    x = jnp.transpose(x_nchw, (0, 2, 3, 1))                       # [b,H,W,Ci]
    R = R_nchw.reshape(K, b_sz, Co, H, W)
    R = jnp.transpose(R, (1, 0, 3, 4, 2))                         # [b,K,H,W,Co]

    kernel = functools.partial(
        _gamma_nonneg_kernel, H=H, W=W, Ci=Ci, Co=Co, K=K,
        gamma=float(gamma), stabilizer=float(stabilizer))

    out = pl.pallas_call(
        kernel,
        grid=(b_sz,),
        in_specs=[
            pl.BlockSpec((1, H, W, Ci), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, K, H, W, Co), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((9, Ci, 2 * Co), lambda i: (0, 0, 0)),
            pl.BlockSpec((9, 2 * Co, Ci), lambda i: (0, 0, 0)),
            pl.BlockSpec((3, Co), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, K, H, W, Ci), lambda i: (i, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b_sz, K, H, W, Ci), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((H + 2, W + 2, Ci), jnp.float32),
            pltpu.VMEM((H + 2, W + 2, 2 * Co), jnp.float32),
        ],
        interpret=interpret,
    )(x, R, wf, wb, bias3)

    out = jnp.transpose(out, (1, 0, 4, 2, 3))                     # [K,b,Ci,H,W]
    return out.reshape(K * b_sz, Ci, H, W)
