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
    """out[..., h, :, :] = x[..., h^1, :, :] (2-row window partner).

    Written as an explicit pair swap — Mosaic has no `rev` lowering."""
    *lead, H, G, L = x.shape
    y = x.reshape(*lead, H // 2, 2, G, L)
    ev = jax.lax.index_in_dim(y, 0, axis=y.ndim - 3, keepdims=False)
    od = jax.lax.index_in_dim(y, 1, axis=y.ndim - 3, keepdims=False)
    sw = jnp.stack([od, ev], axis=-3)
    return sw.reshape(*lead, H, G, L)


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

def _gamma_core(R, x, wz1, wz3, wT1, wT3, biases, Ci, Co, gamma, stab,
                leading_gate=True):
    """Backward through [relu-above?] + gamma_nonneg conv, all packed.

    R: [K, H, G, Pi*Co] (relevance at the conv OUTPUT level);
    x: [H, G, 128] (Pi-packed conv input); biases: [3, Pi*Co] rows =
    (bias1 = b+g*b^+, bias0 = b, bias2 = b+g*b^-). Matches
    rules.lrp_gamma_nonneg (z2 is the bias-only term; z_true derived
    algebraically from z1+z3). Returns R at the conv INPUT level
    [K, H, G, 128]."""
    bias1, bias0, bias2 = biases[0], biases[1], biases[2]
    z1 = conv3x3_packed(x, wz1, Ci) + bias1
    z3 = conv3x3_packed(x, wz3, Ci)
    z_true = (z1 + z3 - bias1) * np.float32(1.0 / (2.0 + gamma)) + bias0
    if leading_gate:
        R = R * relu_gate(z_true)
    m1 = jnp.where(z_true > 0, 1.0, 0.0) / stabilize(z1 + bias2, stab)
    m3 = jnp.where(z_true < 0, 1.0, 0.0) / stabilize(z3, stab)
    c = (conv3x3_packed(R * m1.astype(R.dtype), wT1, Co)
         + conv3x3_packed(R * m3.astype(R.dtype), wT3, Co))
    return x * c


def _inner_block_kernel(R_ref, x_ref, apre_ref, wz1_ref, wz3_ref, wT1_ref,
                        wT3_ref, b_ref, out_ref, *, Ci, Co, gamma, stab,
                        leading_gate):
    """One grid step = one instance: [relu gate] -> gamma conv rule ->
    maxpool(2,2) backward, fine mask from the recorded pre-relu activation
    of the block below (pool input = relu(apre))."""
    R = R_ref[0]
    x = x_ref[0]
    Rn = _gamma_core(R, x, wz1_ref[:], wz3_ref[:], wT1_ref[:], wT3_ref[:],
                     b_ref[:], Ci, Co, gamma, stab, leading_gate)
    apre = apre_ref[0]
    mask = maxpool2x2_fine_mask(jnp.maximum(apre, 0.0), Ci)
    out_ref[0] = pool2x2_backward(Rn, mask, Ci)


def _gamma_only_kernel(R_ref, x_ref, wz1_ref, wz3_ref, wT1_ref,
                       wT3_ref, b_ref, out_ref, *, Ci, Co, gamma, stab,
                       leading_gate):
    """Gamma block without the trailing pool (the bottom inner conv; pool +
    first layer run in _first_layer_kernel — split keeps each kernel under
    the 16 MB VMEM budget at the 128x128 fine level)."""
    R = R_ref[0]
    x = x_ref[0]
    out_ref[0] = _gamma_core(R, x, wz1_ref[:], wz3_ref[:], wT1_ref[:],
                             wT3_ref[:], b_ref[:], Ci, Co, gamma, stab,
                             leading_gate)


def _first_layer_kernel(R_ref, a1_ref, z0_ref, wl0_ref, mred_ref, out_ref,
                        *, Ci, K, stab0):
    """Pool backward + relu gate + first-layer rule (wsquare/flat).

    The fine-level multiplier F — pool route mask * relu gate /
    stabilized input-independent first-layer denominator — is computed
    IN-KERNEL from the packed first-conv output a1 (round-3 profile: the
    old XLA-at-batch-b F block cost ~15 ms/iter in reduce_window_max +
    select fusions + the 537 MB F round-trip; per-instance VMEM recompute
    replaces all of it). s0 = route(R) * F; the transposed conv to the
    single input channel runs as lane-pattern VPU accumulation + one
    block-diagonal reduction matmul. Clones loop so only one fine map is
    live at a time."""
    a1 = a1_ref[0]
    mask = maxpool2x2_fine_mask(jnp.maximum(a1, 0.0), Ci)
    F = mask * relu_gate(a1) / stabilize(z0_ref[:], stab0)
    for k in range(K):
        s0 = pool2x2_backward(R_ref[0, k], F, Ci)
        acc = conv3x3_packed_vpu(s0, wl0_ref[:], Ci)
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


def plan_chain(conv_section: Sequence, params: dict, composite):
    """Validate the conv-section against the supported topology and collect
    per-block metadata. Returns None when unsupported (caller falls back to
    the XLA path).

    Supported: [conv, relu, maxpool(2,2)] * n + [conv, relu] head read
    backward, n >= 1; first conv rule wsquare/flat with any Ci; inner conv
    rules gamma (non-negative-input specialization applies by construction);
    every inner channel count divides 128 and is <= 64 at pool levels."""
    specs = list(conv_section)
    if len(specs) < 5 or (len(specs) - 2) % 3 != 0:
        return None
    kinds = [s.kind for s in specs]
    if kinds[-1] != "relu" or kinds[0] != "conv":
        return None
    n_blocks = (len(specs) - 2) // 3
    convs = []
    for bi in range(n_blocks + 1):
        i = bi * 3
        if specs[i].kind != "conv" or specs[i + 1].kind != "relu":
            return None
        if bi < n_blocks and (specs[i + 2].kind != "maxpool"
                              or tuple(specs[i + 2].config["kernel"]) != (2, 2)):
            return None
        convs.append(i)
    # rules
    first_rule = composite.rule_for(specs[0].name)
    if first_rule is None or first_rule[0] not in ("wsquare", "flat"):
        return None
    w0 = params[specs[0].name]["w"]
    if w0.shape[1] != 1:          # mel input is single-channel; fall back
        return None
    inner = []
    for i in convs[1:]:
        rule = composite.rule_for(specs[i].name)
        if rule is None or rule[0] not in ("gamma", "gamma_nonneg"):
            return None
        p = params[specs[i].name]
        Ci = p["w"].shape[1]
        Co = p["w"].shape[0]
        if 128 % Ci or 128 % Co or Ci > 64 or Co > 128 or "b" not in p:
            return None
        inner.append((i, rule[1]))
    if not inner:
        return None
    return {"specs": specs, "convs": convs, "inner": inner,
            "first_rule": first_rule}


def _prep_inner_weights(params, spec, kwargs):
    """Packed weight set for one inner gamma conv."""
    p = params[spec.name]
    w, b = p["w"], p["b"]
    Ci = w.shape[1]
    Pi = 128 // Ci
    g = float(kwargs.get("gamma", 0.25))
    stab = float(kwargs.get("stabilizer", 1e-6))
    gp, gn = _gmod_pos(g), _gmod_neg(g)
    return {
        "wz1": pack_conv_weights(w, Pi, gp),
        "wz3": pack_conv_weights(w, Pi, gn),
        "wT1": pack_convT_weights(w, Pi, gp),
        "wT3": pack_convT_weights(w, Pi, gn),
        "biases": jnp.stack([pack_bias(b, Pi, gp), pack_bias(b, Pi),
                             pack_bias(b, Pi, gn)]),
        "gamma": g, "stab": stab, "Ci": Ci, "Co": w.shape[0], "Pi": Pi,
    }


def _prep_first_weights(params, spec, rule, fine_hw):
    """First-layer (wsquare/flat) packed pieces: the input-independent
    denominator map z0, the lane-pattern transposed-conv taps and the
    block-diagonal channel-reduction matrix."""
    from drsa_audio_tpu.models.vgg import conv2d_same
    p = params[spec.name]
    w, b = p["w"], p.get("b")
    name, kwargs = rule
    stab0 = float(kwargs.get("stabilizer", 1e-6))
    Co, Cin = w.shape[0], w.shape[1]
    P = 128 // Co
    H, W = fine_hw
    if name == "wsquare":
        wm, bm = w * w, (b * b if b is not None else None)
    else:                                   # flat
        wm, bm = jnp.ones_like(w), None
    ones = jnp.ones((1, Cin, H, W), jnp.float32)
    z0_nchw = conv2d_same(ones, wm, bm)                     # [1, Co, H, W]
    z0 = jnp.transpose(z0_nchw, (0, 2, 3, 1))               # [1, H, W, Co]
    z0p = pack(z0[0], 128 // Co)                            # [H, G, 128]
    # transposed taps: wT[dy, dx, co] = wm[co, 0, 2-dy, 2-dx]; Cin == 1 for
    # both supported model families (mel input)
    assert Cin == 1, "first conv with Cin > 1 unsupported in fused chain"
    wl = jnp.stack([jnp.stack([jnp.tile(wm[:, 0, 2 - dy, 2 - dx], P)
                               for dx in range(3)]) for dy in range(3)])
    mred = blockdiag(jnp.ones((Co, 1), jnp.float32), P)     # [128, P]
    return {"z0p": z0p, "wl0": wl, "mred": mred, "stab0": stab0,
            "P0": P, "Co0": Co}


def fused_lower_conv_backward(plan, params, acts_nhwc, R_nhwc, K: int):
    """Run the fused chain. acts_nhwc: recorded NHWC inputs per conv-section
    layer (batch-leading, from explain_forward_upper(nhwc=True));
    R_nhwc: [b, K, H, W, C] relevance at the TOP conv's output level.
    Returns heatmaps [b, K, Hf, Wf] at the model input level."""
    specs = plan["specs"]
    inner = plan["inner"]
    b = R_nhwc.shape[0]

    # packed activations per inner conv: x = acts[i], a_pre = acts[i - 2]
    weights = [
        _prep_inner_weights(params, specs[i], kwargs) for i, kwargs in inner
    ]
    first_spec = specs[0]
    a1 = acts_nhwc[1]                                  # first conv's output
    Hf, Wf = a1.shape[1], a1.shape[2]
    fw = _prep_first_weights(params, first_spec, plan["first_rule"],
                             (Hf, Wf))

    R = pack(R_nhwc, weights[-1]["Pi"])

    def act_packed(idx, C):
        return pack(acts_nhwc[idx], 128 // C)

    # walk inner convs top-down; all but the bottom fuse the trailing pool
    for bi in range(len(inner) - 1, -1, -1):
        i, _ = inner[bi]
        wset = weights[bi]
        Ci, Co = wset["Ci"], wset["Co"]
        R = pack(unpack(R, Co), wset["Pi"])   # free repack to this grouping
        x = act_packed(i, Ci)
        H, G = x.shape[1], x.shape[2]
        weight_args = (wset["wz1"], wset["wz3"], wset["wT1"], wset["wT3"],
                       wset["biases"])
        weight_specs = [
            pl.BlockSpec(wset["wz1"].shape, lambda n: (0, 0, 0, 0)),
            pl.BlockSpec(wset["wz3"].shape, lambda n: (0, 0, 0, 0)),
            pl.BlockSpec(wset["wT1"].shape, lambda n: (0, 0, 0, 0)),
            pl.BlockSpec(wset["wT3"].shape, lambda n: (0, 0, 0, 0)),
            pl.BlockSpec(wset["biases"].shape, lambda n: (0, 0)),
        ]
        if bi > 0:
            apre = act_packed(i - 2, Ci)
            HF, GF = apre.shape[1], apre.shape[2]
            kern = functools.partial(
                _inner_block_kernel, Ci=Ci, Co=Co, gamma=wset["gamma"],
                stab=wset["stab"], leading_gate=True)
            R = pl.pallas_call(
                kern,
                grid=(b,),
                in_specs=[
                    pl.BlockSpec((1, K) + R.shape[2:],
                                 lambda n: (n, 0, 0, 0, 0)),
                    pl.BlockSpec((1, H, G, 128), lambda n: (n, 0, 0, 0)),
                    pl.BlockSpec((1, HF, GF, 128), lambda n: (n, 0, 0, 0)),
                ] + weight_specs,
                out_specs=pl.BlockSpec((1, K, HF, GF, 128),
                                       lambda n: (n, 0, 0, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((b, K, HF, GF, 128),
                                               jnp.float32),
                compiler_params=_params(),
                interpret=_interpret(),
            )(R, x, apre, *weight_args)
        else:
            # bottom inner conv: gamma only (pool + first layer below)
            kern = functools.partial(
                _gamma_only_kernel, Ci=Ci, Co=Co, gamma=wset["gamma"],
                stab=wset["stab"], leading_gate=True)
            R = pl.pallas_call(
                kern,
                grid=(b,),
                in_specs=[
                    pl.BlockSpec((1, K) + R.shape[2:],
                                 lambda n: (n, 0, 0, 0, 0)),
                    pl.BlockSpec((1, H, G, 128), lambda n: (n, 0, 0, 0)),
                ] + weight_specs,
                out_specs=pl.BlockSpec((1, K, H, G, 128),
                                       lambda n: (n, 0, 0, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((b, K, H, G, 128),
                                               jnp.float32),
                compiler_params=_params(),
                interpret=_interpret(),
            )(R, x, *weight_args)

    # first layer: F (route mask * relu gate / stabilized z0) computed
    # IN-KERNEL from the packed first-conv output (see _first_layer_kernel)
    C1 = weights[0]["Ci"]
    a1p = pack(a1, 128 // C1)                    # [b, HF, GF, 128]
    HF, GF = a1p.shape[1], a1p.shape[2]
    P0 = fw["P0"]
    kern = functools.partial(_first_layer_kernel, Ci=C1, K=K,
                             stab0=fw["stab0"])
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, K) + R.shape[2:], lambda n: (n, 0, 0, 0, 0)),
            pl.BlockSpec((1, HF, GF, 128), lambda n: (n, 0, 0, 0)),
            pl.BlockSpec(fw["z0p"].shape, lambda n: (0, 0, 0)),
            pl.BlockSpec(fw["wl0"].shape, lambda n: (0, 0, 0)),
            pl.BlockSpec(fw["mred"].shape, lambda n: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, K, HF, GF, P0), lambda n: (n, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, K, HF, GF, P0), jnp.float32),
        compiler_params=_params(),
        interpret=_interpret(),
    )(R, a1p, fw["z0p"], fw["wl0"], fw["mred"])
    return out.reshape(b, K, HF, GF * P0)
