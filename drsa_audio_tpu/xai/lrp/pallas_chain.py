"""Fused Pallas lower-backward chain: the whole per-instance LRP walk in VMEM.

The round-3 profiler trace (docs/lower_backward_trace.md) showed the
batch-folded lower backward is ~95% memory/layout glue — reshape/copy 35%,
elementwise fusions 20%, clone-tile broadcasts 17%, maxpool select_and_scatter
13%, rule mask fusions 10% — and only ~5% convolution compute. Every XLA-level
restructure (NHWC end-to-end, mask-routed shared pools) measured flat or worse
because XLA materializes each K*b-sized intermediate in HBM (~5 ms per 2 GB
round-trip at the 128x128x32 level).

This module runs the chain per instance inside Pallas kernels instead: all K
relevance clones stay resident in VMEM from the projection layer down to the
input heatmap, rule denominators are computed once per instance (not per
clone), maxpool backward is a first-argmax route mask (bit-matched to jax's
reduce_window vjp tie semantics, including all-tied post-ReLU-zero windows),
and the only HBM traffic is the per-instance conv activations in and the
heatmap out.

Layout: "column-packed" NHWC — an [H, W, C] map is held as [H, W/P, P*C]
with P = 128/C columns folded into the 128-lane minor dim (f32 VMEM tiles pad
the minor dim to 128 lanes, so an unpacked C=32 map would waste 4x VMEM
capacity and VPU bandwidth — the round-2 unpacked kernel lost 1.6x at C=32
for exactly this reason, BASELINE.md). Key property: the packing factor can
be changed by powers of two with a FREE contiguous reshape
([H, G, P*C] <-> [H, G/2, 2*P*C]), so convs that change the channel count
just hand their P_in-packed-over-Co output to a reshape.

Convs are 9 shifted lane-blocked matmuls: column shifts are lane rolls with
group-boundary fixup, weights are P-block-diagonal [P*Ci, P*Co] matrices
(prepared on the host). Supported chain topology: repeated
[conv -> relu -> maxpool(2,2)] blocks as in the GTZAN-3s / toy lower segments
(reference cxai model families, cpf.py:410-412 + cpf.py:260); anything else
falls back to the XLA path in xai.explain.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------- host side

def pack(x_nhwc: jnp.ndarray, P: int) -> jnp.ndarray:
    """[..., H, W, C] -> [..., H, W/P, P*C] (free contiguous reshape)."""
    *lead, H, W, C = x_nhwc.shape
    assert W % P == 0, (W, P)
    return x_nhwc.reshape(*lead, H, W // P, P * C)


def unpack(x_packed: jnp.ndarray, C: int) -> jnp.ndarray:
    """[..., H, G, P*C] -> [..., H, G*P, C]."""
    *lead, H, G, L = x_packed.shape
    assert L % C == 0
    return x_packed.reshape(*lead, H, G * (L // C), C)


def blockdiag(m: jnp.ndarray, P: int) -> jnp.ndarray:
    """[Ci, Co] -> [P*Ci, P*Co] with P copies of m on the diagonal."""
    Ci, Co = m.shape
    eye = jnp.eye(P, dtype=m.dtype)
    return jnp.einsum("pq,io->pioq", eye, m).transpose(0, 1, 3, 2).reshape(
        P * Ci, P * Co)


def pack_conv_weights(w_oihw: jnp.ndarray, P: int, w_mod=None) -> jnp.ndarray:
    """OIHW conv weights -> [3, 3, P*Ci, P*Co] block-diagonal packed taps."""
    w = w_mod(w_oihw) if w_mod is not None else w_oihw
    m = jnp.transpose(w, (2, 3, 1, 0))                 # [3, 3, Ci, Co]
    taps = [[blockdiag(m[dy, dx], P) for dx in range(3)] for dy in range(3)]
    return jnp.stack([jnp.stack(r) for r in taps])


def pack_convT_weights(w_oihw: jnp.ndarray, P: int, w_mod=None) -> jnp.ndarray:
    """Transposed-conv taps of the SAME conv: wT[dy,dx] = w[2-dy,2-dx]^T."""
    w = w_mod(w_oihw) if w_mod is not None else w_oihw
    m = jnp.transpose(w, (2, 3, 1, 0))                 # [3,3,Ci,Co]
    mT = jnp.transpose(m[::-1, ::-1], (0, 1, 3, 2))    # [3,3,Co,Ci]
    taps = [[blockdiag(mT[dy, dx], P) for dx in range(3)] for dy in range(3)]
    return jnp.stack([jnp.stack(r) for r in taps])


def pack_bias(b: jnp.ndarray, P: int, b_mod=None) -> jnp.ndarray:
    """[Co] -> [P*Co] lane pattern (bias tiled per packed column)."""
    bb = b_mod(b) if b_mod is not None else b
    return jnp.tile(bb, P)


# ------------------------------------------------------- in-kernel helpers
# These trace inside pallas kernels (jnp ops + pltpu.roll on VMEM values).

def _roll(x, s: int):
    """Lane roll with shift normalized to [0, L) (pltpu.roll rejects
    negative shifts)."""
    L = x.shape[-1]
    s = s % L
    if s == 0:
        return x
    return pltpu.roll(x, s, axis=x.ndim - 1)


def _lane_iota(x):
    return jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)


def _group_next(x):
    """x with the G axis (-2) shifted by one group toward lower g, zero-filled
    (i.e. out[..., g, :] = x[..., g+1, :])."""
    z = jnp.zeros_like(x[..., :1, :])
    return jnp.concatenate([x[..., 1:, :], z], axis=-2)


def _group_prev(x):
    z = jnp.zeros_like(x[..., :1, :])
    return jnp.concatenate([z, x[..., :-1, :]], axis=-2)


def col_shift(x, delta: int, C: int):
    """Packed column shift: out[.., g, (p, c)] = x[.., col g*P+p+delta, c]
    with zeros outside [0, W). delta in {-1, +1}."""
    L = x.shape[-1]
    P = L // C
    lane = _lane_iota(x)
    if delta == 1:
        r = _roll(x, -C)
        rn = _roll(_group_next(x), -C)
        return jnp.where(lane < (P - 1) * C, r, rn)
    if delta == -1:
        r = _roll(x, C)
        rp = _roll(_group_prev(x), C)
        return jnp.where(lane >= C, r, rp)
    raise ValueError(delta)


def _mm(a, w):
    """[..., L] @ [L, Lout] with f32 accumulation."""
    s = a.shape
    out = jax.lax.dot_general(a.reshape(-1, s[-1]), w,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out.reshape(s[:-1] + (w.shape[1],))


def conv3x3_packed(x, wtaps, C: int):
    """3x3 SAME conv on a packed map.

    x: [..., H, G, P*Ci]; wtaps: [3, 3, P*Ci, P*Co] (pack_conv_weights).
    Returns [..., H, G, P*Co]. out[w] = sum_dx wtaps[dy, dx] . x[w + dx - 1]
    rows shifted by dy-1 with zero padding (torch Conv2d padding='same').
    """
    H = x.shape[-3]
    S = (col_shift(x, -1, C), x, col_shift(x, 1, C))
    acc = None
    pad_cfg = [(0, 0, 0)] * (x.ndim - 3) + [(1, 1, 0), (0, 0, 0), (0, 0, 0)]
    for dx in range(3):
        sp = jax.lax.pad(S[dx], jnp.float32(0.0), pad_cfg)
        for dy in range(3):
            sl = jax.lax.slice_in_dim(sp, dy, dy + H, axis=x.ndim - 3)
            d = _mm(sl, wtaps[dy, dx])
            acc = d if acc is None else acc + d
    return acc


def relu_gate(a):
    """jnp.maximum vjp gate: 1 where a>0, 0.5 at exact zeros, else 0."""
    return jnp.where(a > 0, 1.0, jnp.where(a == 0, 0.5, 0.0)).astype(a.dtype)


def _row_partner(x):
    """out[..., h, :, :] = x[..., h^1, :, :] (2-row window partner)."""
    *lead, H, G, L = x.shape
    y = x.reshape(*lead, H // 2, 2, G, L)[..., ::-1, :, :]
    return y.reshape(*lead, H, G, L)


def _col_partner(x, C: int):
    """out at packed col w = x at col w^1 (within-group for P >= 2)."""
    L = x.shape[-1]
    lane = _lane_iota(x)
    p = lane // C
    up = _roll(x, C)       # even p reads... p-1 content
    dn = _roll(x, -C)      # p+1 content at p
    return jnp.where(p % 2 == 0, dn, up)


def window_max2x2(a_fine, C: int):
    """Every fine position's (2,2)-window max. a_fine: [..., H, G, P*C]."""
    m_col = jnp.maximum(a_fine, _col_partner(a_fine, C))
    return jnp.maximum(m_col, _row_partner(m_col))


def maxpool2x2_fine_mask(a_fine, C: int):
    """First-argmax routing mask of a (2,2)/(2,2) MaxPool, at fine resolution.

    Matches jax's reduce_window(max) vjp exactly (full cotangent to the FIRST
    maximal element in row-major window order; verified incl. ties).
    a_fine: [H, G, P*C] packed primal (the pool input)."""
    m_fine = window_max2x2(a_fine, C)
    lane = _lane_iota(a_fine)
    p_par = (lane // C) % 2                       # column parity
    row = jax.lax.broadcasted_iota(jnp.int32, a_fine.shape, a_fine.ndim - 3)
    pos = ((row % 2) * 2 + p_par).astype(jnp.float32)
    eq = a_fine == m_fine
    cand = jnp.where(eq, pos, 4.0)
    c_col = jnp.minimum(cand, _col_partner(cand, C))
    c_all = jnp.minimum(c_col, _row_partner(c_col))
    return (eq & (cand == c_all)).astype(a_fine.dtype)


def maxpool2x2_forward(a_fine, C: int):
    """Pooled output, packed at the coarse width: [..., H/2, G/2, P*C].

    Coarse (gc, pc < P/2) <- fine group 2gc block 2pc;
    coarse (gc, pc >= P/2) <- fine group 2gc+1 block 2(pc - P/2)."""
    m = window_max2x2(a_fine, C)[..., ::2, :, :]  # rows 0::2
    L = m.shape[-1]
    P = L // C
    assert P >= 2, "pool needs P >= 2 (C <= 64)"
    lane = _lane_iota(m)
    p = lane // C
    # even-column compress: block p' <- source block 2p' (valid for p' < P/2)
    ec = m
    for pp in range(P // 2):
        if pp != 2 * pp:
            src = _roll(m, (pp - 2 * pp) * C)
            ec = jnp.where(p == pp, src, ec)
    ev = ec[..., 0::2, :]
    od = ec[..., 1::2, :]
    od_hi = _roll(od, (P // 2) * C)
    return jnp.where(_lane_iota(ev) < (P // 2) * C, ev, od_hi)


def lane_stretch2(x, C: int):
    """Column-duplicate within a group: out block pf = x block pf // 2 for
    pf in [0, P) — only x blocks [0, P/2) are read."""
    L = x.shape[-1]
    P = L // C
    lane = _lane_iota(x)
    p = lane // C
    out = x
    shifts: dict = {}
    for pf in range(P):
        d = pf - pf // 2
        shifts.setdefault(d, []).append(pf)
    for d, pfs in shifts.items():
        src = _roll(x, d * C) if d else x
        sel = functools.reduce(jnp.logical_or, [p == pf for pf in pfs])
        out = jnp.where(sel, src, out)
    return out


def pool2x2_backward(R_coarse, mask_fine, C: int):
    """Route coarse relevance through a (2,2) MaxPool to fine resolution.

    Coarse (gc, pc) feeds fine cols wf = 2(gc*P + pc) + dx:
    fine group 2gc   <- blocks pc in [0, P/2) stretched x2,
    fine group 2gc+1 <- blocks pc in [P/2, P) shifted down then stretched.

    R_coarse: [..., Hc, Gc, P*C]; mask_fine: [Hf, Gf, P*C]
    (maxpool2x2_fine_mask output; broadcasts over leading clone axes).
    Returns [..., Hf=2Hc, Gf=2Gc, P*C]."""
    *lead, Hc, Gc, L = R_coarse.shape
    P = L // C
    assert P >= 2, "pool needs P >= 2 (C <= 64)"
    Ru = jnp.broadcast_to(R_coarse[..., :, None, :, :],
                          (*lead, Hc, 2, Gc, L)).reshape(*lead, 2 * Hc, Gc, L)
    lo_st = lane_stretch2(Ru, C)
    hi = _roll(Ru, -(P // 2) * C)
    hi_st = lane_stretch2(hi, C)
    st = jnp.stack([lo_st, hi_st], axis=-2)       # [..., Gc, 2, L]
    Rf = st.reshape(*lead, 2 * Hc, 2 * Gc, L)
    return Rf * mask_fine


def stabilize(z, eps: float):
    return z + jnp.where(z >= 0, eps, -eps).astype(z.dtype)
