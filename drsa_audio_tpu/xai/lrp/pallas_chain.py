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
(prepared on the host). Supported chain topology (see plan_chain): blocks of
[conv(gamma) -> relu]+ separated by maxpool(2,2) / maxpool(2,4), over a
wsquare/flat first conv — covering the GTZAN-3s and toy families
(single-conv blocks, (2,2) pools; reference cpf.py:410-412 + cpf.py:260)
AND the flagship GTZAN-6s family (block_depth=2, (2,4) block-1 pool,
C=100/128 levels at P=1 packing; reference getdrsadata.py:72-108). Anything
else falls back to the XLA path in xai.explain.
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


def _banded(m: jnp.ndarray, P: int) -> jnp.ndarray:
    """[3, Ci, Co] per-dx tap matrices -> [(P+2)*Ci, P*Co] banded window
    contraction: output block p reads window slots p, p+1, p+2 (= columns
    g*P + p - 1 .. g*P + p + 1) through taps dx = 0..2."""
    Ci, Co = m.shape[1], m.shape[2]
    # static-index .at updates (NOT numpy): the prep runs inside jit traces
    # (plan_chain under a jitted explain_lower), where m is a tracer
    out = jnp.zeros(((P + 2) * Ci, P * Co), jnp.float32)
    for p in range(P):
        for d in range(3):
            out = out.at[(p + d) * Ci:(p + d + 1) * Ci,
                         p * Co:(p + 1) * Co].set(m[d])
    return out


def pack_conv_weights_banded(w_oihw: jnp.ndarray, P: int,
                             w_mod=None) -> jnp.ndarray:
    """OIHW conv weights -> [3, (P+2)*Ci, P*Co] banded window matrices
    (one matmul per row tap — see conv3x3_window_packed)."""
    w = w_mod(w_oihw) if w_mod is not None else w_oihw
    m = jnp.transpose(w, (2, 3, 1, 0))                 # [3, 3, Ci, Co]
    return jnp.stack([_banded(m[dy], P) for dy in range(3)])


def pack_convT_weights_banded(w_oihw: jnp.ndarray, P: int,
                              w_mod=None) -> jnp.ndarray:
    """Banded window matrices of the transposed conv (cf pack_convT_weights)."""
    w = w_mod(w_oihw) if w_mod is not None else w_oihw
    m = jnp.transpose(w, (2, 3, 1, 0))
    mT = jnp.transpose(m[::-1, ::-1], (0, 1, 3, 2))    # [3, 3, Co, Ci]
    return jnp.stack([_banded(mT[dy], P) for dy in range(3)])


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


def conv3x3_window_packed(x, wband, C: int):
    """3x3 SAME conv as 3 banded window matmuls (one per row tap).

    x: [..., H, G, P*C]; wband: [3, (P+2)*C, P*Co] (pack_conv_weights_banded).
    The (P+2)-column window operand folds all 3 column taps into ONE matmul
    contraction — (P+2)/(3P) of conv3x3_packed's padded MXU work (0.5x at
    P=4) and a single operand read per row tap instead of three. Same
    result as conv3x3_packed up to summation-order reassociation."""
    L = x.shape[-1]
    P = L // C
    H = x.shape[-3]
    sm = col_shift(x, -1, C)
    sp = col_shift(x, 1, C)
    win = jnp.concatenate([sm[..., :C], x, sp[..., (P - 1) * C:]], axis=-1)
    pad_cfg = [(0, 0, 0)] * (x.ndim - 3) + [(1, 1, 0), (0, 0, 0), (0, 0, 0)]
    wp = jax.lax.pad(win, jnp.float32(0.0), pad_cfg)
    acc = None
    for dy in range(3):
        sl = jax.lax.slice_in_dim(wp, dy, dy + H, axis=x.ndim - 3)
        d = _mm(sl, wband[dy])
        acc = d if acc is None else acc + d
    return acc


def relu_gate(a):
    """jnp.maximum vjp gate: 1 where a>0, 0.5 at exact zeros, else 0.

    TIE SEMANTICS — one of three coupled sites (the equality tests across
    the fused / tiled / shared paths depend on all of them agreeing): this
    gate, the inline gate in explain._lrp_segment_backward_shared, and the
    first-argmax pool rule (maxpool_fine_mask here /
    explain.maxpool_route_mask). Change one ⇒ change all."""
    return jnp.where(a > 0, 1.0, jnp.where(a == 0, 0.5, 0.0)).astype(a.dtype)


def _row_partner(x):
    """out[..., h, :, :] = x[..., h^1, :, :] (2-row window partner).

    Written as an explicit pair swap — Mosaic has no `rev` lowering."""
    *lead, H, G, L = x.shape
    y = x.reshape(*lead, H // 2, 2, G, L)
    ev = jax.lax.index_in_dim(y, 0, axis=y.ndim - 3, keepdims=False)
    od = jax.lax.index_in_dim(y, 1, axis=y.ndim - 3, keepdims=False)
    sw = jnp.stack([od, ev], axis=-3)
    return sw.reshape(*lead, H, G, L)


def _group_xor(x, kg: int):
    """out[..., h, g, :] = x[..., h, g ^ kg, :] (kg a power of two): swap
    adjacent kg-sized group blocks, pairwise."""
    *lead, H, G, L = x.shape
    y = x.reshape(*lead, H, G // (2 * kg), 2, kg, L)
    ev = jax.lax.index_in_dim(y, 0, axis=y.ndim - 3, keepdims=False)
    od = jax.lax.index_in_dim(y, 1, axis=y.ndim - 3, keepdims=False)
    sw = jnp.stack([od, ev], axis=-3)
    return sw.reshape(*lead, H, G, L)


def _col_xor(x, k: int, C: int):
    """out at packed col w = x at col w ^ k (k a power of two).

    k < P: lane-level block swap; k >= P: group-level swap — so the same
    butterfly works at any packing, incl. P == 1 (C == 100/128 levels) and
    windows wider than a group (kw == 4 at P == 2)."""
    L = x.shape[-1]
    P = L // C
    if k >= P:
        return _group_xor(x, k // P)
    lane = _lane_iota(x)
    p = lane // C
    up = _roll(x, k * C)       # content of block p-k at p
    dn = _roll(x, -k * C)      # content of block p+k at p
    return jnp.where((p // k) % 2 == 0, dn, up)


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


def _window_reduce(x, C: int, kw: int, op):
    """Butterfly-reduce ``op`` over each (2, kw) window (kh == 2 rows via the
    row partner; kw a power of two via col-xor steps). Every fine position
    ends up holding the window reduction."""
    m = x
    k = 1
    while k < kw:
        m = op(m, _col_xor(m, k, C))
        k *= 2
    return op(m, _row_partner(m))


def _col_in_window(x, C: int, kw: int):
    """Per-position column offset within its kw-wide window, as f32."""
    L = x.shape[-1]
    P = L // C
    lane = _lane_iota(x)
    p = lane // C
    if kw <= P:
        return (p % kw).astype(jnp.float32)
    g = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2)
    return ((g % (kw // P)) * P + p).astype(jnp.float32)


def maxpool_fine_mask(a_fine, C: int, kw: int = 2):
    """First-argmax routing mask of a (2,kw)/(2,kw) MaxPool, fine resolution.

    Matches jax's reduce_window(max) vjp exactly (full cotangent to the FIRST
    maximal element in row-major window order; verified incl. ties).
    a_fine: [H, G, P*C] packed primal (the pool input). Works at any packing
    P >= 1 and kw in {2, 4} (butterfly col-xor reductions)."""
    m_fine = _window_reduce(a_fine, C, kw, jnp.maximum)
    row = jax.lax.broadcasted_iota(jnp.int32, a_fine.shape, a_fine.ndim - 3)
    pos = (row % 2).astype(jnp.float32) * np.float32(kw) + _col_in_window(
        a_fine, C, kw)
    eq = a_fine == m_fine
    cand = jnp.where(eq, pos, np.float32(2 * kw))
    c_all = _window_reduce(cand, C, kw, jnp.minimum)
    return (eq & (cand == c_all)).astype(a_fine.dtype)


def maxpool2x2_fine_mask(a_fine, C: int):
    """(2,2) specialization of maxpool_fine_mask (kept as the named entry
    point the 3s/toy kernels were measured with)."""
    return maxpool_fine_mask(a_fine, C, kw=2)


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


def _row_upsample2(x):
    """[..., Hc, G, L] -> [..., 2Hc, G, L] duplicating rows."""
    *lead, Hc, G, L = x.shape
    return jnp.broadcast_to(x[..., :, None, :, :],
                            (*lead, Hc, 2, G, L)).reshape(*lead, 2 * Hc, G, L)


def _group_repeat(x, r: int):
    """[..., H, G, L] -> [..., H, r*G, L]: out group g = x group g // r."""
    *lead, H, G, L = x.shape
    return jnp.broadcast_to(x[..., :, :, None, :],
                            (*lead, H, G, r, L)).reshape(*lead, H, r * G, L)


def pool_backward(R_coarse, mask_fine, C: int, kw: int = 2):
    """Route coarse relevance through a (2,kw) MaxPool to fine resolution.

    Dispatches on the packing: (kw=2, P>=2) is the measured 3s/toy path
    (pool2x2_backward); (kw=2, P=1) serves the C=100/128 levels of the 6s
    net; (kw=4, P=2) serves its (2,4) block-1 pool. mask_fine from
    maxpool_fine_mask (broadcasts over leading clone axes)."""
    L = R_coarse.shape[-1]
    P = L // C
    if kw == 2 and P >= 2:
        return pool2x2_backward(R_coarse, mask_fine, C)
    Ru = _row_upsample2(R_coarse)
    if kw == 2 and P == 1:
        # fine group gf reads coarse group gf // 2 (single column per group)
        return _group_repeat(Ru, 2) * mask_fine
    if kw == 4 and P == 2:
        # fine group 4gc+j reads coarse group gc, block j//2, both lanes
        r4 = _group_repeat(Ru, 4)
        lane = _lane_iota(r4)
        p = lane // C
        lo = jnp.where(p == 0, r4, _roll(r4, C))     # block-0 content at all p
        hi = jnp.where(p == 1, r4, _roll(r4, -C))    # block-1 content at all p
        g = jax.lax.broadcasted_iota(jnp.int32, r4.shape, r4.ndim - 2)
        Rf = jnp.where((g // 2) % 2 == 0, lo, hi)
        return Rf * mask_fine
    raise ValueError(f"unsupported pool routing: kw={kw}, P={P}")


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


# First-layer tail strategy: fold the transposed-conv tap weights into the
# channel-reduction matmul ([128, P0] block-diagonal per tap) instead of 9
# full-128-lane VPU multiply-accumulate passes. The kernel is
# VPU-bandwidth-bound (byte count: ~2/3 of its passes are those multiplies),
# so this projects ~2x on the 21 ms first-layer kernel — flag stays False
# until the on-chip A/B (scripts/bench_first_layer.py) confirms it.
# Env override (experiments only): DRSA_FIRST_LAYER_MMTAPS=1.
import os as _os
FIRST_LAYER_MMTAPS = _os.environ.get("DRSA_FIRST_LAYER_MMTAPS", "0") == "1"


def _first_layer_mmtaps() -> bool:
    """Flag read at PLAN time: the env var wins when set (so exporting it
    after import still takes effect — module constants freeze the import-
    time environment); tests monkeypatch the module constant."""
    v = _os.environ.get("DRSA_FIRST_LAYER_MMTAPS")
    return v == "1" if v is not None else FIRST_LAYER_MMTAPS


def pack_first_mtaps(wm: jnp.ndarray, P: int) -> jnp.ndarray:
    """[Co, 1, 3, 3] rule weights -> [3, 3, P*Co, P] per-tap reduce matrices:
    mtaps[dy, dx] = blockdiag over P of the column wm[:, 0, 2-dy, 2-dx]
    (transposed-conv tap), so s0 @ mtaps[dy, dx] applies the tap weight AND
    the channel reduction in one contraction."""
    taps = [[blockdiag(wm[:, 0, 2 - dy, 2 - dx][:, None], P)
             for dx in range(3)] for dy in range(3)]
    return jnp.stack([jnp.stack(r) for r in taps])


def _first_tail_mm(s0, mtaps, C: int):
    """First-layer transposed conv + channel reduction as 9 tap matmuls
    (see pack_first_mtaps). Returns [..., H, G, P]."""
    H = s0.shape[-3]
    ndim = s0.ndim
    S = (col_shift(s0, -1, C), s0, col_shift(s0, 1, C))
    pad_cfg = [(0, 0, 0)] * (ndim - 3) + [(1, 1, 0), (0, 0, 0), (0, 0, 0)]
    acc = None
    for dx in range(3):
        sp = jax.lax.pad(S[dx], jnp.float32(0.0), pad_cfg)
        for dy in range(3):
            sl = jax.lax.slice_in_dim(sp, dy, dy + H, axis=ndim - 3)
            d = _mm(sl, mtaps[dy, dx])
            acc = d if acc is None else acc + d
    return acc


def conv3x3_packed_vpu(x, wlanes, C: int):
    """Depthwise accumulate: out = sum_taps shift_tap(x) * wlanes[dy, dx, :]
    (lane-broadcast weight patterns, no channel mixing — used for the
    first-layer transposed conv whose output has a single channel, where a
    block-diagonal matmul would waste 32x on the padded output dim)."""
    H = x.shape[-3]
    S = (col_shift(x, -1, C), x, col_shift(x, 1, C))
    acc = None
    pad_cfg = [(0, 0, 0)] * (x.ndim - 3) + [(1, 1, 0), (0, 0, 0), (0, 0, 0)]
    for dx in range(3):
        sp = jax.lax.pad(S[dx], jnp.float32(0.0), pad_cfg)
        for dy in range(3):
            sl = jax.lax.slice_in_dim(sp, dy, dy + H, axis=x.ndim - 3)
            d = sl * wlanes[dy, dx]
            acc = d if acc is None else acc + d
    return acc


# ------------------------------------------------------------ chain blocks

# Inner-conv contraction strategy: banded (P+2)-column window matmuls
# (conv3x3_window_packed) instead of 9 block-diagonal tap matmuls — half the
# padded MXU work at P=4 and one operand read per row tap. Flag stays False
# until the on-chip A/B confirms it; prep and kernels read it at the same
# trace, so a flip is always self-consistent.
# Env override (experiments only): DRSA_INNER_WINDOW_CONV=1.
INNER_WINDOW_CONV = _os.environ.get("DRSA_INNER_WINDOW_CONV", "0") == "1"


def _inner_window_conv() -> bool:
    """Flag read at trace time (see _first_layer_mmtaps: env wins when set).
    Prep and kernel body read it within the same jit trace, so a flip stays
    self-consistent."""
    v = _os.environ.get("DRSA_INNER_WINDOW_CONV")
    return v == "1" if v is not None else INNER_WINDOW_CONV


# First-layer a1 strategy: recompute the first conv's output from the packed
# mel IN-KERNEL (9 tiny [.,P]@[P,P*Co] tap matmuls, ~38 MFLOP/instance)
# instead of reading the recorded 537 MB/iter a1 tensor as a kernel operand
# (round-3 upper-stage trace: that operand is written by the forward, layout-
# copied for the custom call, and re-read — the biggest single HBM item of
# the whole pipeline).
# MEASURED (round 4, on-chip A/B at batch 256): 5410 clips/s, fused 47.3 ms
# vs production 5567 / ~46 ms — a ~3% REGRESSION, so the flag stays OFF.
# The upper stage only dropped 11.5->11.2 ms (XLA still materializes the
# pre-act for the pool route) while the first-layer kernel paid more than
# the saved read; consistent with the chain being VMEM-bandwidth-bound.
# Bit-exactness vs the recorded-a1 path is held by tests either way.
# Env override (experiments only): DRSA_FIRST_LAYER_RECOMPUTE=1.
FIRST_LAYER_RECOMPUTE = _os.environ.get(
    "DRSA_FIRST_LAYER_RECOMPUTE", "0") == "1"


def _first_layer_recompute() -> bool:
    """Flag read at trace time (env wins when set — see _first_layer_mmtaps)."""
    v = _os.environ.get("DRSA_FIRST_LAYER_RECOMPUTE")
    return v == "1" if v is not None else FIRST_LAYER_RECOMPUTE


# Merged-tail strategy (round 5, the roofline-directed restructure): run
# blocks nb-2 .. 0 — everything below the head block — in ONE kernel per
# instance, so the mid-chain relevance tensors never round-trip HBM. At the
# 3s shapes the two boundaries this removes (block2->block1 and
# block1->first, each [b, K, 64, 64, 32]) are 537 MB written + read EACH per
# iteration — ~2.1 GB of the measured traffic, ~2.6 ms at the v5e's peak
# HBM bandwidth, plus two grid dispatches. Applicable when every merged
# level packs at the SAME P (single-conv blocks, (2,2) pools, m0 == 1 —
# the 3s and toy families); the 6s deep-block topology keeps the
# multi-kernel path (its first block is row-banded, incompatible with a
# whole-chain walk).
# Env override (experiments only): DRSA_CHAIN_MERGED=0/1.
CHAIN_MERGED = _os.environ.get("DRSA_CHAIN_MERGED", "0") == "1"


def _chain_merged() -> bool:
    """Flag read at trace time (env wins when set — see _first_layer_mmtaps)."""
    v = _os.environ.get("DRSA_CHAIN_MERGED")
    return v == "1" if v is not None else CHAIN_MERGED


def _conv_rule(x, w, C):
    if _inner_window_conv():
        return conv3x3_window_packed(x, w, C)
    return conv3x3_packed(x, w, C)


def _gamma_prep(x, wz1, wz3, biases, Ci, gamma, stab):
    """Per-instance (clone-shared) pieces of the gamma backward: the true
    pre-activation and the two stabilized rule masks, from the packed conv
    input x [H, G, P*Ci]."""
    bias1, bias0, bias2 = biases[0], biases[1], biases[2]
    z1 = _conv_rule(x, wz1, Ci) + bias1
    z3 = _conv_rule(x, wz3, Ci)
    z_true = (z1 + z3 - bias1) * np.float32(1.0 / (2.0 + gamma)) + bias0
    m1 = jnp.where(z_true > 0, 1.0, 0.0) / stabilize(z1 + bias2, stab)
    m3 = jnp.where(z_true < 0, 1.0, 0.0) / stabilize(z3, stab)
    return z_true, m1, m3


def _gamma_apply(R, x, z_true, m1, m3, wT1, wT3, Co, leading_gate=True):
    """Per-clone half of the gamma backward (see _gamma_prep)."""
    if leading_gate:
        R = R * relu_gate(z_true)
    c = (_conv_rule(R * m1.astype(R.dtype), wT1, Co)
         + _conv_rule(R * m3.astype(R.dtype), wT3, Co))
    return x * c


def _gamma_core(R, x, wz1, wz3, wT1, wT3, biases, Ci, Co, gamma, stab,
                leading_gate=True):
    """Backward through [relu-above?] + gamma_nonneg conv, all packed.

    R: [K, H, G, Pi*Co] (relevance at the conv OUTPUT level);
    x: [H, G, 128] (Pi-packed conv input); biases: [3, Pi*Co] rows =
    (bias1 = b+g*b^+, bias0 = b, bias2 = b+g*b^-). Matches
    rules.lrp_gamma_nonneg (z2 is the bias-only term; z_true derived
    algebraically from z1+z3). Returns R at the conv INPUT level
    [K, H, G, 128]."""
    z_true, m1, m3 = _gamma_prep(x, wz1, wz3, biases, Ci, gamma, stab)
    return _gamma_apply(R, x, z_true, m1, m3, wT1, wT3, Co, leading_gate)


def _chain_block_kernel(*refs, metas, pool_cfg):
    """One grid step = one instance: for each conv of the block, TOP-DOWN,
    [relu gate] -> gamma conv rule; then optionally the (2,kw) maxpool
    backward of the pool BELOW this block (fine mask from the recorded
    pre-relu activation of the block below: pool input = relu(apre)).

    refs: R, x_top..x_bottom (conv inputs, top-down), [apre if pool],
    then per conv (top-down) wz1, wz3, wT1, wT3, biases, then out.
    metas: per-conv dicts (Ci, Co, gamma, stab), top-down. pool_cfg:
    None or (kw, C_pool). All K clones walk together — the one big-map
    case (block 1 of the 6s net) runs _first_block_deep_kernel instead."""
    m = len(metas)
    R_ref = refs[0]
    x_refs = refs[1:1 + m]
    idx = 1 + m
    apre_ref = refs[idx] if pool_cfg is not None else None
    if pool_cfg is not None:
        idx += 1
    w_refs = refs[idx:idx + 5 * m]
    out_ref = refs[-1]

    if pool_cfg is not None:
        kw, Cp = pool_cfg
        mask = maxpool_fine_mask(jnp.maximum(apre_ref[0], 0.0), Cp, kw)

    # clone-shared prep (denominators/masks once per instance)
    preps = []
    for j, meta in enumerate(metas):
        preps.append(_gamma_prep(x_refs[j][0], w_refs[5 * j][:],
                                 w_refs[5 * j + 1][:], w_refs[5 * j + 4][:],
                                 meta["Ci"], meta["gamma"], meta["stab"]))

    def walk(R):
        for j, meta in enumerate(metas):
            R = _gamma_apply(R, x_refs[j][0], *preps[j],
                             w_refs[5 * j + 2][:], w_refs[5 * j + 3][:],
                             meta["Co"], leading_gate=True)
        if pool_cfg is not None:
            R = pool_backward(R, mask, Cp, kw)
        return R

    out_ref[0] = walk(R_ref[0])


def _first_block_deep_kernel(R_ref, apre_ref, a1_ref, z0_ref, wz1_ref,
                             wz3_ref, wT1_ref, wT3_ref, b_ref, wl0_ref,
                             mred_ref, out_ref, *, kw, gmeta, stab0,
                             halo=0, mm_taps=False):
    """Deep first block (one gamma conv between the pool and the first conv,
    e.g. the 6s net's block 1): pool backward -> relu gate + gamma rule ->
    first-layer rule. One grid step = one (instance, clone, row band) — at
    the 6s 128x256x64 fine level a single clone's FULL walk plus the shared
    denominators peaks ~150 MB of scoped VMEM (110 MB of it register spill
    slots — measured: the unbanded kernel fails to compile on the v5e), so
    the fine rows split into bands of ``out_ref`` height with ``halo``
    overlap rows on each side (halo=4 covers the 3-conv-stage reach; see
    _row_bands). Interior rows are bit-identical to the unbanded walk —
    every op is row-local within the halo (pool pairs stay aligned because
    band starts are even), and at TRUE array edges the zero-padded a1/apre/R
    halo rows reproduce the SAME-conv zero padding exactly (s0's halo rows
    vanish through the x1 multiply). Clones split across grid steps and the
    per-instance pieces are recomputed per clone (the instance-indexed input
    blocks are NOT re-fetched: their block index is unchanged across the K
    inner steps)."""
    apre = apre_ref[0, 0]
    a1 = a1_ref[0, 0]
    C_pool = gmeta["Co"]                     # pool level = gamma conv output
    C0 = gmeta["Ci"]                         # first-layer level = conv0 out
    mask = maxpool_fine_mask(jnp.maximum(apre, 0.0), C_pool, kw)
    s = pool_backward(R_ref[0, 0, 0], mask, C_pool, kw)
    x1 = jnp.maximum(a1, 0.0)                # the gamma conv's recorded input
    z_true, m1, m3 = _gamma_prep(x1, wz1_ref[:], wz3_ref[:], b_ref[:],
                                 gmeta["Ci"], gmeta["gamma"], gmeta["stab"])
    Rn = _gamma_apply(s, x1, z_true, m1, m3, wT1_ref[:], wT3_ref[:],
                      gmeta["Co"])
    s0 = Rn * (relu_gate(a1) / stabilize(z0_ref[0], stab0))
    if mm_taps:
        r = _first_tail_mm(s0, wl0_ref[:], C0)
    else:
        acc = conv3x3_packed_vpu(s0, wl0_ref[:], C0)
        r = _mm(acc, mred_ref[:])
    Bf = out_ref.shape[3]
    out_ref[0, 0, 0] = jax.lax.slice_in_dim(r, halo, halo + Bf, axis=0)


def _first_layer_kernel(R_ref, a1_ref, z0_ref, wl0_ref, mred_ref, *rest,
                        Ci, K, stab0, mm_taps=False, recompute=False):
    """Pool backward + relu gate + first-layer rule (wsquare/flat).

    The fine-level multiplier F — pool route mask * relu gate /
    stabilized input-independent first-layer denominator — is computed
    IN-KERNEL from the packed first-conv output a1 (round-3 profile: the
    old XLA-at-batch-b F block cost ~15 ms/iter in reduce_window_max +
    select fusions + the 537 MB F round-trip; per-instance VMEM recompute
    replaces all of it). s0 = route(R) * F; the transposed conv to the
    single input channel runs as lane-pattern VPU accumulation + one
    block-diagonal reduction matmul. Clones loop so only one fine map is
    live at a time.

    ``recompute=True``: a1_ref holds the P-packed MEL instead (65 KB vs
    2.1 MB per instance — and no 537 MB/iter batch tensor crossing HBM);
    a1 is recomputed in VMEM from the true first-conv weights
    (rest = wf, b0, out)."""
    if recompute:
        wf_ref, b0_ref, out_ref = rest
        a1 = conv3x3_packed(a1_ref[0], wf_ref[:], 1) + b0_ref[:]
    else:
        (out_ref,) = rest
        a1 = a1_ref[0]
    mask = maxpool2x2_fine_mask(jnp.maximum(a1, 0.0), Ci)
    F = mask * relu_gate(a1) / stabilize(z0_ref[:], stab0)
    for k in range(K):
        # general dispatch: P >= 2 takes the measured pool2x2_backward path
        # unchanged; P == 1 (first conv with Co in 65..128) group-repeats
        s0 = pool_backward(R_ref[0, k], F, Ci, 2)
        if mm_taps:
            out_ref[0, k] = _first_tail_mm(s0, wl0_ref[:], Ci)
        else:
            acc = conv3x3_packed_vpu(s0, wl0_ref[:], Ci)
            out_ref[0, k] = _mm(acc, mred_ref[:])


def _merged_tail_kernel(*refs, metas, C1, K, stab0, mm_taps):
    """Blocks nb-2 .. 0 of the chain in ONE grid step per instance:
    [gamma conv -> (2,2) pool backward]* -> first-layer tail (F-trick), with
    every mid-chain relevance tensor staying in VMEM (see CHAIN_MERGED).

    refs: R (at the top merged conv's OUTPUT level, [1, K, H, G, P*Co]),
    x_0..x_{m-1} (merged conv inputs, top-down), apre_0..apre_{m-2}
    (pre-relu pool inputs between merged convs, top-down), a1, z0,
    then per conv (top-down) wz1, wz3, wT1, wT3, biases, then wl0, mred,
    out. metas: per merged conv (Ci, Co, gamma, stab), top-down; every
    level packs at the same P. The coarse walk runs all K clones stacked
    (arrays are small); the fine-level first-layer tail loops clones so a
    single fine map is live at a time (same shape as _first_layer_kernel)."""
    m = len(metas)
    R_ref = refs[0]
    x_refs = refs[1:1 + m]
    apre_refs = refs[1 + m:m + m]
    a1_ref = refs[m + m]
    z0_ref = refs[m + m + 1]
    w_refs = refs[m + m + 2:m + m + 2 + 5 * m]
    wl0_ref = refs[-3]
    mred_ref = refs[-2]
    out_ref = refs[-1]

    # clone-shared prep: rule denominators/masks once per instance
    preps = [_gamma_prep(x_refs[j][0], w_refs[5 * j][:], w_refs[5 * j + 1][:],
                         w_refs[5 * j + 4][:], metas[j]["Ci"],
                         metas[j]["gamma"], metas[j]["stab"])
             for j in range(m)]
    masks = [maxpool_fine_mask(jnp.maximum(apre_refs[j][0], 0.0),
                               metas[j + 1]["Co"], 2)
             for j in range(m - 1)]

    R = R_ref[0]
    for j in range(m):
        R = _gamma_apply(R, x_refs[j][0], *preps[j], w_refs[5 * j + 2][:],
                         w_refs[5 * j + 3][:], metas[j]["Co"])
        if j < m - 1:
            R = pool_backward(R, masks[j], metas[j]["Ci"], 2)

    a1 = a1_ref[0]
    F = (maxpool2x2_fine_mask(jnp.maximum(a1, 0.0), C1) * relu_gate(a1)
         / stabilize(z0_ref[:], stab0))
    for k in range(K):
        s0 = pool_backward(R[k], F, C1, 2)
        if mm_taps:
            out_ref[0, k] = _first_tail_mm(s0, wl0_ref[:], C1)
        else:
            acc = conv3x3_packed_vpu(s0, wl0_ref[:], C1)
            out_ref[0, k] = _mm(acc, mred_ref[:])


# ------------------------------------------------------------- host plan

def _params():
    """Raise the scoped-VMEM ceiling: the 16 MB default is the compiler's
    conservative scoped limit, not the physical VMEM size; the big-map
    kernels peak just above it."""
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _interpret() -> bool:
    """Interpret mode off only on real TPU backends (the axon tunnel
    registers as 'axon'); CPU tests run the kernels interpreted."""
    return jax.default_backend() not in ("tpu", "axon")


def _gmod_pos(g):
    return lambda p: p + g * jnp.maximum(p, 0.0)


def _gmod_neg(g):
    return lambda p: p + g * jnp.minimum(p, 0.0)


def _pow2_floor(v: int) -> int:
    p = 1
    while p * 2 <= v:
        p *= 2
    return p


def plan_chain(conv_section: Sequence, params: dict, composite,
               fine_hw: tuple | None = None):
    """Validate the conv-section against the supported topology and collect
    per-block metadata. Returns None when unsupported (caller falls back to
    the XLA path). ``fine_hw`` (the model-input H, W) additionally validates
    the SPATIAL plan — every packed width must divide the kernel's packing
    factor and every pool level its kernel — so off-topology input sizes
    fall back cleanly instead of assert-failing mid-trace in pack().

    Supported topology (read bottom-up): conv(wsquare/flat, Cin=1) relu
    [conv(gamma) relu]* maxpool(2,2|2,4), then any number of
    [conv(gamma) relu]+ maxpool(2,2) blocks, then a [conv(gamma) relu]+
    head. Covers the 3s/toy families (single-conv blocks, (2,2) pools) and
    the 6s family (block_depth=2, (2,4) block-1 pool, C in {64, 100, 128}).
    Each block's kernel packs at P = pow2_floor(128 / maxC) — P=1 (plain
    lanes) at the C=100/128 levels. Block 0 may hold at most one gamma conv
    above the first conv (its input is recomputed as relu(conv0-out) in the
    deep first kernel); a (2,4) pool needs P == 2 at its level."""
    specs = list(conv_section)
    if len(specs) < 2 or specs[0].kind != "conv" or specs[-1].kind != "relu":
        return None
    # ---- parse blocks: [conv relu]+ pool, ..., trailing block without pool
    blocks = []
    cur: list = []
    i = 0
    n = len(specs)
    while i < n:
        if specs[i].kind != "conv":
            return None
        cur.append(i)
        if i + 1 >= n or specs[i + 1].kind != "relu":
            return None
        i += 2
        if i == n:
            blocks.append({"convs": cur, "pool_above": None})
            break
        if specs[i].kind == "maxpool":
            kh, kw = specs[i].config["kernel"]
            if kh != 2 or kw not in (2, 4):
                return None
            blocks.append({"convs": cur, "pool_above": (i, kh, kw)})
            cur = []
            i += 1
    if len(blocks) < 2 or blocks[-1]["pool_above"] is not None:
        return None
    # ---- first conv: wsquare/flat on the single mel channel
    first_rule = composite.rule_for(specs[0].name)
    if first_rule is None or first_rule[0] not in ("wsquare", "flat"):
        return None
    if params[specs[0].name]["w"].shape[1] != 1:
        return None
    # the in-kernel convs hard-code 3x3 stride-1 SAME taps
    for blk in blocks:
        for ci in blk["convs"]:
            if params[specs[ci].name]["w"].shape[2:] != (3, 3):
                return None
    # block 0: at most one gamma conv above the first conv (deep kernel)
    if len(blocks[0]["convs"]) > 2:
        return None
    # ---- gamma rules + channel limits on every non-first conv
    for blk in blocks:
        blk["rules"] = {}
        for ci in blk["convs"]:
            if ci == 0:
                continue
            rule = composite.rule_for(specs[ci].name)
            if rule is None or rule[0] not in ("gamma", "gamma_nonneg"):
                return None
            p = params[specs[ci].name]
            if "b" not in p or p["w"].shape[0] > 128 or p["w"].shape[1] > 128:
                return None
            blk["rules"][ci] = rule[1]
    # ---- per-kernel packing factor: constrained by the channel counts of
    # the maps the kernel OPERATES on at full width — conv inputs (Ci) and
    # the pool level (= the bottom conv's Ci) — NOT by conv output widths:
    # a P-packed conv just emits P*Co lanes (up to 256 on the 3s 32->64
    # kernel, exactly as the measured round-3 kernels did). Folding Co into
    # the choice would halve the 3s conv6 kernel's packing and leave its
    # pool-level maps in half-empty VMEM tiles.
    for bi, blk in enumerate(blocks):
        chans = []
        for ci in blk["convs"]:
            w = params[specs[ci].name]["w"]
            if ci == 0:
                chans.append(w.shape[0])   # first-layer tail level = Co0
            else:
                chans.append(w.shape[1])
        blk["P"] = _pow2_floor(128 // max(chans))
    # pool dispatch support: (2,4) only above block 0 and only at P == 2
    for bi in range(len(blocks) - 1):
        pi, kh, kw = blocks[bi]["pool_above"]
        # the pool above block bi runs in block bi+1's kernel for bi >= 1,
        # in the first-block kernel for bi == 0 — both pack at that kernel's P
        P_k = blocks[bi + 1]["P"] if bi >= 1 else blocks[0]["P"]
        c_pool = params[specs[blocks[bi]["convs"][-1]].name]["w"].shape[0]
        if kw == 4 and (bi != 0 or P_k != 2):
            return None
        if c_pool * P_k > 128:
            return None
    # the m0 == 1 fast path (F-trick kernel) supports kw == 2 only
    if len(blocks[0]["convs"]) == 1 and blocks[0]["pool_above"][2] != 2:
        return None
    # ---- spatial plan (when the input size is known): convs are SAME
    # stride-1 so each block holds one (H, W) level; pools divide it.
    # Kernel i (>= 1) packs level i at P_i and, for i >= 2, also the fine
    # pool maps of level i-1; the first kernel packs level 0 and the
    # incoming coarse R of level 1 at P_0.
    if fine_hw is not None:
        H, W = int(fine_hw[0]), int(fine_hw[1])
        dims = []
        for blk in blocks:
            dims.append((H, W))
            if blk["pool_above"] is not None:
                _, kh, kw = blk["pool_above"]
                if H % kh or W % kw:
                    return None
                H //= kh
                W //= kw
        for i, blk in enumerate(blocks):
            if dims[i][1] % blk["P"]:
                return None
            if i >= 2 and dims[i - 1][1] % blk["P"]:
                return None
        if dims[1][1] % blocks[0]["P"]:
            return None
    return {"specs": specs, "blocks": blocks, "first_rule": first_rule}


def _prep_inner_weights(params, spec, kwargs, P: int):
    """Packed weight set for one inner gamma conv, at the block kernel's
    packing factor P."""
    p = params[spec.name]
    w, b = p["w"], p["b"]
    Ci = w.shape[1]
    g = float(kwargs.get("gamma", 0.25))
    stab = float(kwargs.get("stabilizer", 1e-6))
    gp, gn = _gmod_pos(g), _gmod_neg(g)
    if _inner_window_conv():
        pk, pkT = pack_conv_weights_banded, pack_convT_weights_banded
    else:
        pk, pkT = pack_conv_weights, pack_convT_weights
    return {
        "wz1": pk(w, P, gp),
        "wz3": pk(w, P, gn),
        "wT1": pkT(w, P, gp),
        "wT3": pkT(w, P, gn),
        "biases": jnp.stack([pack_bias(b, P, gp), pack_bias(b, P),
                             pack_bias(b, P, gn)]),
        "gamma": g, "stab": stab, "Ci": Ci, "Co": w.shape[0], "Pi": P,
    }


def _prep_first_weights(params, spec, rule, fine_hw, P: int):
    """First-layer (wsquare/flat) packed pieces: the input-independent
    denominator map z0, the lane-pattern transposed-conv taps and the
    block-diagonal channel-reduction matrix, at the first-block kernel's
    packing factor P."""
    from drsa_audio_tpu.models.vgg import conv2d_same
    p = params[spec.name]
    w, b = p["w"], p.get("b")
    name, kwargs = rule
    stab0 = float(kwargs.get("stabilizer", 1e-6))
    Co, Cin = w.shape[0], w.shape[1]
    H, W = fine_hw
    if name == "wsquare":
        wm, bm = w * w, (b * b if b is not None else None)
    else:                                   # flat
        wm, bm = jnp.ones_like(w), None
    ones = jnp.ones((1, Cin, H, W), jnp.float32)
    z0_nchw = conv2d_same(ones, wm, bm)                     # [1, Co, H, W]
    z0 = jnp.transpose(z0_nchw, (0, 2, 3, 1))               # [1, H, W, Co]
    z0p = pack(z0[0], P)                                # [H, G, P*Co]
    # transposed taps: wT[dy, dx, co] = wm[co, 0, 2-dy, 2-dx]; Cin == 1 for
    # both supported model families (mel input)
    assert Cin == 1, "first conv with Cin > 1 unsupported in fused chain"
    wl = jnp.stack([jnp.stack([jnp.tile(wm[:, 0, 2 - dy, 2 - dx], P)
                               for dx in range(3)]) for dy in range(3)])
    mred = blockdiag(jnp.ones((Co, 1), jnp.float32), P)     # [P*Co, P]
    # true-weight forward taps + bias for the in-kernel a1 recompute
    # (DRSA_FIRST_LAYER_RECOMPUTE): conv3x3_packed over the P-packed mel
    # (Ci = 1) reproduces conv2d_same exactly, like every chain conv
    wf = pack_conv_weights(w, P)                            # [3,3,P,P*Co]
    b0 = (pack_bias(b, P) if b is not None
          else jnp.zeros((P * Co,), jnp.float32))
    return {"z0p": z0p, "wl0": wl, "mred": mred,
            "mtaps": pack_first_mtaps(wm, P), "stab0": stab0,
            "wf": wf, "b0": b0,
            "P0": P, "Co0": Co}


def _const_spec(arr):
    """BlockSpec for a whole replicated (weight) array."""
    nd = arr.ndim
    return pl.BlockSpec(arr.shape, lambda n, *rest, _nd=nd: (0,) * _nd)


def _row_bands(x, Bf: int, halo: int, axis: int):
    """Split the row dim ``axis`` into overlapping bands for spatially tiled
    kernels: [..., H, ...] -> [..., nb, Bf + 2*halo, ...] where band t holds
    rows [t*Bf - halo, (t+1)*Bf + halo), zero-filled outside [0, H). The
    zero halo at true edges reproduces SAME-conv row padding."""
    H = x.shape[axis]
    assert H % Bf == 0, (H, Bf)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (halo, halo)
    xp = jnp.pad(x, pad)
    bands = [jax.lax.slice_in_dim(xp, t * Bf, (t + 1) * Bf + 2 * halo,
                                  axis=axis)
             for t in range(H // Bf)]
    return jnp.stack(bands, axis=axis)


def fused_lower_conv_backward(plan, params, acts_nhwc, R_nhwc, K: int):
    """Run the fused chain. acts_nhwc: recorded NHWC inputs per conv-section
    layer (batch-leading, from explain_forward_upper(nhwc=True));
    R_nhwc: [b, K, H, W, C] relevance at the TOP conv's output level.
    Returns heatmaps [b, K, Hf, Wf] at the model input level."""
    specs = plan["specs"]
    blocks = plan["blocks"]
    b = R_nhwc.shape[0]
    nb = len(blocks)

    first_spec = specs[0]
    a1 = acts_nhwc[1]                                  # first conv's output
    Hf, Wf = a1.shape[1], a1.shape[2]
    P0 = blocks[0]["P"]
    fw = _prep_first_weights(params, first_spec, plan["first_rule"],
                             (Hf, Wf), P0)

    def act_packed(idx, P):
        return pack(acts_nhwc[idx], P)

    # R enters at the head block's top conv output level
    R = pack(R_nhwc, blocks[-1]["P"])

    # ---- merged-tail path (CHAIN_MERGED): blocks nb-2 .. 0 fuse into one
    # kernel so the mid-chain relevances never round-trip HBM; the head
    # block(s) above keep their own kernels (different packing factor)
    M = nb - 2
    merged = (_chain_merged() and nb >= 3
              and len(blocks[0]["convs"]) == 1
              and all(len(blocks[i]["convs"]) == 1 for i in range(1, M + 1))
              and all(blocks[i]["P"] == P0 for i in range(1, M + 1))
              and all(blocks[i]["pool_above"][2] == 2 for i in range(M))
              and not _first_layer_recompute())

    # ---- walk blocks top-down; each kernel = the block's convs + the pool
    # below it (except block 1, whose below-pool fuses into the first kernel)
    for i in range(nb - 1, M if merged else 0, -1):
        blk = blocks[i]
        P = blk["P"]
        convs_td = list(reversed(blk["convs"]))
        metas, wargs = [], []
        for ci in convs_td:
            ws = _prep_inner_weights(params, specs[ci], blk["rules"][ci], P)
            metas.append({"Ci": ws["Ci"], "Co": ws["Co"],
                          "gamma": ws["gamma"], "stab": ws["stab"]})
            wargs += [ws["wz1"], ws["wz3"], ws["wT1"], ws["wT3"],
                      ws["biases"]]
        R = pack(unpack(R, metas[0]["Co"]), P)     # free repack to this P
        xs = [act_packed(ci, P) for ci in convs_td]
        in_arrays = [R] + xs
        in_specs = [pl.BlockSpec((1, K) + R.shape[2:],
                                 lambda n: (n, 0, 0, 0, 0))]
        in_specs += [pl.BlockSpec((1,) + x.shape[1:], lambda n: (n, 0, 0, 0))
                     for x in xs]
        if i >= 2:
            pi, kh, kw = blocks[i - 1]["pool_above"]
            apre = act_packed(pi - 1, P)           # pre-relu pool input
            in_arrays.append(apre)
            in_specs.append(pl.BlockSpec((1,) + apre.shape[1:],
                                         lambda n: (n, 0, 0, 0)))
            pool_cfg = (kw, metas[-1]["Ci"])
            out_hgl = apre.shape[1:]
        else:
            pool_cfg = None
            out_hgl = (xs[-1].shape[1], xs[-1].shape[2],
                       P * metas[-1]["Ci"])
        kern = functools.partial(_chain_block_kernel, metas=metas,
                                 pool_cfg=pool_cfg)
        R = pl.pallas_call(
            kern,
            grid=(b,),
            in_specs=in_specs + [_const_spec(w) for w in wargs],
            out_specs=pl.BlockSpec((1, K) + out_hgl,
                                   lambda n: (n, 0, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, K) + out_hgl, jnp.float32),
            compiler_params=_params(),
            interpret=_interpret(),
        )(*in_arrays, *wargs)

    if merged:
        convs_td = [blocks[bi]["convs"][0] for bi in range(M, 0, -1)]
        metas, wargs = [], []
        for ci in convs_td:
            bi = next(b_ for b_, blk in enumerate(blocks)
                      if ci in blk["convs"])
            ws = _prep_inner_weights(params, specs[ci],
                                     blocks[bi]["rules"][ci], P0)
            metas.append({"Ci": ws["Ci"], "Co": ws["Co"],
                          "gamma": ws["gamma"], "stab": ws["stab"]})
            wargs += [ws["wz1"], ws["wz3"], ws["wT1"], ws["wT3"],
                      ws["biases"]]
        # pools BETWEEN merged convs: below conv j sits the pool above
        # block M-1-j; its mask derives from that block's pre-relu conv out
        apres = [act_packed(blocks[bi]["pool_above"][0] - 1, P0)
                 for bi in range(M - 1, 0, -1)]
        R = pack(unpack(R, metas[0]["Co"]), P0)
        xs = [act_packed(ci, P0) for ci in convs_td]
        a1p = pack(a1, P0)
        HF, GF = a1p.shape[1], a1p.shape[2]
        C1 = fw["Co0"]
        mm = _first_layer_mmtaps()
        wl_arg = fw["mtaps"] if mm else fw["wl0"]
        kern = functools.partial(_merged_tail_kernel, metas=metas, C1=C1,
                                 K=K, stab0=fw["stab0"], mm_taps=mm)
        in_specs = [pl.BlockSpec((1, K) + R.shape[2:],
                                 lambda n: (n, 0, 0, 0, 0))]
        in_specs += [pl.BlockSpec((1,) + x.shape[1:], lambda n: (n, 0, 0, 0))
                     for x in xs]
        in_specs += [pl.BlockSpec((1,) + ap.shape[1:],
                                  lambda n: (n, 0, 0, 0)) for ap in apres]
        in_specs += [pl.BlockSpec((1,) + a1p.shape[1:],
                                  lambda n: (n, 0, 0, 0)),
                     _const_spec(fw["z0p"])]
        in_specs += [_const_spec(w) for w in wargs]
        in_specs += [_const_spec(wl_arg), _const_spec(fw["mred"])]
        out = pl.pallas_call(
            kern,
            grid=(b,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, K, HF, GF, P0),
                                   lambda n: (n, 0, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, K, HF, GF, P0), jnp.float32),
            compiler_params=_params(),
            interpret=_interpret(),
        )(R, *xs, *apres, a1p, fw["z0p"], *wargs, wl_arg, fw["mred"])
        return out.reshape(b, K, HF, GF * P0)

    # ---- first block
    pi, kh, kw = blocks[0]["pool_above"]
    a1p = pack(a1, P0)                           # [b, HF, GF, P0*Co0]
    HF, GF = a1p.shape[1], a1p.shape[2]
    m0 = len(blocks[0]["convs"])
    mm = _first_layer_mmtaps()
    wl_arg = fw["mtaps"] if mm else fw["wl0"]    # tail weights (see flag)
    if m0 == 1:
        # measured 3s/toy fast path: pool route, relu gate and first-layer
        # denominator fused into one F multiplier (see _first_layer_kernel)
        C1 = fw["Co0"]
        R = pack(unpack(R, C1), P0)
        rc = _first_layer_recompute()
        kern = functools.partial(_first_layer_kernel, Ci=C1, K=K,
                                 stab0=fw["stab0"], mm_taps=mm, recompute=rc)
        if rc:
            # feed the tiny packed mel; a1 is recomputed in VMEM from the
            # true first-conv weights — the recorded a1 batch tensor never
            # becomes a kernel operand (and is then DCE-able upstream)
            a_in = pack(acts_nhwc[0], P0)            # [b, HF, GF, P0]
            extra_arrays = [fw["wf"], fw["b0"]]
            extra_specs = [_const_spec(fw["wf"]), _const_spec(fw["b0"])]
        else:
            a_in = a1p
            extra_arrays, extra_specs = [], []
        out = pl.pallas_call(
            kern,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, K) + R.shape[2:], lambda n: (n, 0, 0, 0, 0)),
                pl.BlockSpec((1,) + a_in.shape[1:], lambda n: (n, 0, 0, 0)),
                _const_spec(fw["z0p"]), _const_spec(wl_arg),
                _const_spec(fw["mred"]), *extra_specs,
            ],
            out_specs=pl.BlockSpec((1, K, HF, GF, P0),
                                   lambda n: (n, 0, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, K, HF, GF, P0), jnp.float32),
            compiler_params=_params(),
            interpret=_interpret(),
        )(R, a_in, fw["z0p"], wl_arg, fw["mred"], *extra_arrays)
    else:
        # deep first block (6s family): one (instance, clone) per grid step
        ci_g = blocks[0]["convs"][1]
        gws = _prep_inner_weights(params, specs[ci_g],
                                  blocks[0]["rules"][ci_g], P0)
        gmeta = {"Ci": gws["Ci"], "Co": gws["Co"], "gamma": gws["gamma"],
                 "stab": gws["stab"]}
        apre0 = act_packed(pi - 1, P0)           # gamma conv's pre-relu out
        R = pack(unpack(R, gws["Co"]), P0)
        # Row-band the fine level: the unbanded per-clone walk needs ~150 MB
        # of scoped VMEM at the 6s shapes (110 MB register spills) and fails
        # to compile on the v5e. Bands of 32 fine rows with halo 4 (the
        # 3-conv-stage reach) keep the live set ~2.6 MB/array; interior rows
        # are bit-identical (see _first_block_deep_kernel docstring).
        if HF > 64 and HF % 32 == 0:
            Bf, halo = 32, 4
        else:
            Bf, halo = HF, 0
        nb = HF // Bf
        Bc, halo_c = Bf // 2, halo // 2
        R_b = _row_bands(R, Bc, halo_c, axis=2)
        apre_b = _row_bands(apre0, Bf, halo, axis=1)
        a1_b = _row_bands(a1p, Bf, halo, axis=1)
        z0_b = _row_bands(fw["z0p"], Bf, halo, axis=0)
        kern = functools.partial(_first_block_deep_kernel, kw=kw,
                                 gmeta=gmeta, stab0=fw["stab0"], halo=halo,
                                 mm_taps=mm)
        # grid order (b, nb, K): clones iterate INNERMOST so the big fine
        # activation bands (apre/a1/z0, block index (n, t)) stay resident in
        # VMEM across the K clone steps; only the small R/out blocks cycle
        out = pl.pallas_call(
            kern,
            grid=(b, nb, K),
            in_specs=[
                pl.BlockSpec((1, 1, 1) + R_b.shape[3:],
                             lambda n, t, k: (n, k, t, 0, 0, 0)),
                pl.BlockSpec((1, 1) + apre_b.shape[2:],
                             lambda n, t, k: (n, t, 0, 0, 0)),
                pl.BlockSpec((1, 1) + a1_b.shape[2:],
                             lambda n, t, k: (n, t, 0, 0, 0)),
                pl.BlockSpec((1,) + z0_b.shape[1:],
                             lambda n, t, k: (t, 0, 0, 0)),
                _const_spec(gws["wz1"]), _const_spec(gws["wz3"]),
                _const_spec(gws["wT1"]), _const_spec(gws["wT3"]),
                _const_spec(gws["biases"]),
                _const_spec(wl_arg), _const_spec(fw["mred"]),
            ],
            out_specs=pl.BlockSpec((1, 1, 1, Bf, GF, P0),
                                   lambda n, t, k: (n, k, t, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, K, nb, Bf, GF, P0),
                                           jnp.float32),
            compiler_params=_params(),
            interpret=_interpret(),
        )(R_b, apre_b, a1_b, z0_b, gws["wz1"], gws["wz3"], gws["wT1"],
          gws["wT3"], gws["biases"], wl_arg, fw["mred"])
        out = out.reshape(b, K, HF, GF, P0)
    return out.reshape(b, K, HF, GF * P0)
