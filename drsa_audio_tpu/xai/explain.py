"""Heatmap generation: standard + per-subspace explanations.

Re-implements the reference HeatmapGenerator (cxai/xai/explain/explainer.py)
TPU-first. Two equivalent paths are provided:

1. ``subspace_heatmaps_repeated`` — the reference's scheme: each instance is
   repeated (K+1) times, one LRP pass with the subspace mask at the filter
   layer produces all heatmaps (explainer.py:92, attribute.py:42-60).

2. ``subspace_heatmaps`` (default, faster) — exploits that LRP backward is
   LINEAR in the relevance given fixed activations: forward + upper backward
   run ONCE on the unrepeated batch down to the filter layer; the (K+1)
   concept maskings of the filter relevance are then pushed through the lower
   backward under vmap. Mathematically identical to (1) — the repeated clones
   share activations, so every stabilized denominator is the same — at
   ~1/(K+1) of the upper-network cost.
"""

from __future__ import annotations

import collections
import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from drsa_audio_tpu.models.vgg import (
    LayerSpec, apply_layer, apply_layer_nhwc, maxpool2d,
)
from drsa_audio_tpu.models.projection import insert_projection
from drsa_audio_tpu.xai.lrp.engine import (
    Composite,
    lrp,
    output_mask_class,
    output_mask_all_classes,
    _apply_factory,
    _apply_factory_nhwc,
    _specialize_rule,
    _RULE_LAYERS,
)
from drsa_audio_tpu.xai.lrp.rules import RULES
from drsa_audio_tpu.utils.constants import (
    AUDIO_PARAMS, CLASS_IDX_MAPPER, CLASS_IDX_MAPPER_TOY)


def class_composite(name_map, num_concepts: int) -> Composite:
    """Composite with Epsilon on the virtual projection layers and the
    subspace mask on the filter layer (reference explainer.py:179-203)."""
    entries = list(name_map)
    entries.append(("features.invprojection", ("epsilon", {"epsilon": 1e-6})))
    entries.append(("features.subspacefilter",
                    ("subspace_mask", {"num_concepts": num_concepts})))
    entries.append(("features.projection", ("epsilon", {"epsilon": 1e-6})))
    return Composite.from_list(entries)


def _split_at_filter(specs: Sequence[LayerSpec]):
    idx = next(i for i, s in enumerate(specs) if s.kind == "subspacefilter")
    return list(specs[:idx]), list(specs[idx + 1:])  # filter itself is identity


def _lrp_segment_backward(specs, params, acts, R, composite):
    """Backward over a recorded segment (acts[i] is input to specs[i])."""
    for i in range(len(specs) - 1, -1, -1):
        spec = specs[i]
        a_in = acts[i]
        rule = composite.rule_for(spec.name)
        if rule is not None and spec.kind in _RULE_LAYERS and spec.kind != "subspacefilter":
            rule_name, kwargs = rule
            apply_with = _apply_factory(spec, params)
            R = RULES[_specialize_rule(rule_name, specs, i)](
                apply_with, a_in, R, **kwargs)
        else:
            fwd = lambda t, s=spec: apply_layer(s, params, t, train=False)
            _, vjp = jax.vjp(fwd, a_in)
            (R,) = vjp(R)
    return R


def _lrp_segment_backward_nhwc(specs, params, acts, R, composite):
    """NHWC backward over a conv-section segment (conv/relu/maxpool/dropout
    only; acts recorded in NHWC, R enters and leaves in NHWC).

    TPU-preferred layout: channels ride the 128-lane minor dim through every
    conv, pool route, gate and rule division, so XLA emits no per-op NCHW
    relayouts — the round-3 trace showed those at 35% of the lower backward
    (docs/lower_backward_trace.md)."""
    for i in range(len(specs) - 1, -1, -1):
        spec = specs[i]
        a_in = acts[i]
        rule = composite.rule_for(spec.name)
        if rule is not None and spec.kind == "conv":
            rule_name, kwargs = rule
            apply_with = _apply_factory_nhwc(spec, params)
            R = RULES[_specialize_rule(rule_name, specs, i)](
                apply_with, a_in, R, **kwargs)
        else:
            fwd = lambda t, s=spec: apply_layer_nhwc(s, params, t)
            _, vjp = jax.vjp(fwd, a_in)
            (R,) = vjp(R)
    return R


def _conv_section(lower):
    """Split the lower segment into (conv-section, projection spec)."""
    assert lower[-1].kind == "projection", lower[-1].kind
    return lower[:-1], lower[-1]


def _lower_backward_tiled(lower, params, acts, R, composite, nhwc: bool):
    """One tiled backward over the lower segment (acts already tiled to R's
    batch). With nhwc, the conv-section acts are NHWC (see
    explain_forward_upper) and the projection rule runs NCHW first."""
    if not nhwc:
        return _lrp_segment_backward(lower, params, acts, R, composite)
    conv_sec, proj_spec = _conv_section(lower)
    a_proj = acts[-1]
    rule = composite.rule_for(proj_spec.name)
    if rule is not None:
        rule_name, kwargs = rule
        apply_with = _apply_factory(proj_spec, params)
        R = RULES[rule_name](apply_with, a_proj, R, **kwargs)
    else:
        fwd = lambda t: apply_layer(proj_spec, params, t, train=False)
        _, vjp = jax.vjp(fwd, a_proj)
        (R,) = vjp(R)
    R = jnp.transpose(R, (0, 2, 3, 1))
    R = _lrp_segment_backward_nhwc(conv_sec, params, list(acts[:-1]), R,
                                   composite)
    return jnp.transpose(R, (0, 3, 1, 2))


def explain_forward_upper(
    specs_proj: Sequence[LayerSpec],
    params: dict,
    x: jnp.ndarray,
    composite: Composite,
    class_idx: int | None = None,
    num_classes: int | None = None,
    one_hot_encoded: bool = False,
    output_mask=None,
    nhwc: bool = False,
):
    """Stage 1+2 of the fast path: full forward (recording lower-segment
    activations) + ONE upper backward down to the subspace filter.

    ``output_mask``, if given, overrides class_idx/num_classes with a custom
    logits -> R_out function (lets a traced one-hot select the class so one
    compiled program serves every class — serving.ExplainerService).

    ``nhwc=True`` runs and records the conv section of the lower segment in
    NHWC (channels on the TPU lane dim); the matching explain_lower call must
    then also pass nhwc=True. The projection input stays NCHW.

    Returns (R_filter [b,n,K,d_k], acts_lower tuple, logits). Exposed
    separately so bench.py can time the stages individually."""
    lower, upper = _split_at_filter(specs_proj)

    acts_lower = []
    h = x
    if nhwc:
        conv_sec, proj_spec = _conv_section(lower)
        h = jnp.transpose(h, (0, 2, 3, 1))
        i = 0
        while i < len(conv_sec):
            spec = conv_sec[i]
            nxt = conv_sec[i + 1] if i + 1 < len(conv_sec) else None
            if spec.kind == "relu" and nxt is not None and nxt.kind == "maxpool":
                # relu commutes with max-pooling (max over a window of a
                # monotone function = the function of the window max), so
                # pool the PRE-ACTIVATION and relu the coarse result: the
                # full-size relu tensor then only materializes if a consumer
                # actually reads acts[i+1] (the fused Pallas chain derives
                # relu gates from the pre-acts in-kernel, so on its path XLA
                # DCEs the big relu outputs — the round-3 upper-stage trace
                # sized the block-1 one at 537 MB/iter written+copied twice,
                # docs/lower_backward_trace.md)
                acts_lower.append(h)                    # relu in (pre-act)
                acts_lower.append(jnp.maximum(h, 0.0))  # pool in (DCE-able)
                h = jnp.maximum(apply_layer_nhwc(nxt, params, h), 0.0)
                i += 2
            else:
                acts_lower.append(h)
                h = apply_layer_nhwc(spec, params, h)
                i += 1
        h = jnp.transpose(h, (0, 3, 1, 2))
        acts_lower.append(h)                    # projection input, NCHW
        h = apply_layer(proj_spec, params, h, train=False)
    else:
        for spec in lower:
            acts_lower.append(h)
            h = apply_layer(spec, params, h, train=False)
    acts_upper = []
    for spec in upper:
        acts_upper.append(h)
        h = apply_layer(spec, params, h, train=False)
    logits = h

    if output_mask is not None:
        out_fn = output_mask
    elif class_idx is not None:
        out_fn = output_mask_class(class_idx, one_hot_encoded)
    else:
        out_fn = output_mask_all_classes(num_classes, one_hot_encoded)
    R = out_fn(logits)

    R_filter = _lrp_segment_backward(upper, params, acts_upper, R, composite)
    return R_filter, tuple(acts_lower), logits


def explain_lower(
    specs_proj: Sequence[LayerSpec],
    params: dict,
    acts_lower,
    R_filter: jnp.ndarray,
    composite: Composite,
    num_concepts: int,
    shared_denominators: bool = False,
    clone_chunk: int | None = None,
    nhwc: bool = False,
    fused: bool | None = None,
):
    """Stage 3 of the fast path: K concept maskings of the filter relevance
    pushed through the lower segment under vmap; the standard heatmap is
    derived as the sum (LRP backward is linear in R).

    ``nhwc`` must match the explain_forward_upper call that recorded
    ``acts_lower`` (conv-section acts in NHWC; incompatible with
    shared_denominators). ``fused`` (default: auto when nhwc and the segment
    matches the supported topology) runs the conv section through the
    per-instance Pallas chain (xai.lrp.pallas_chain) — the round-3 answer to
    the 95%-glue profile of the XLA lower backward.

    Returns heatmaps [b, K+1, h, w] (index 0 = standard)."""
    if nhwc and shared_denominators:
        raise ValueError("shared_denominators expects NCHW activations")
    if fused and not nhwc:
        # the fused chain consumes NHWC-recorded activations; NCHW acts would
        # pack transposed data and return finite-but-wrong heatmaps
        raise ValueError("fused=True requires nhwc=True (activations must be "
                         "recorded NHWC by explain_forward_upper)")
    lower, _ = _split_at_filter(specs_proj)
    K = num_concepts
    b = R_filter.shape[0]

    # K maskings only: clone k keeps concept k. The standard heatmap is the
    # SUM of the K subspace heatmaps — the identity masking equals the sum of
    # the per-concept maskings and LRP backward is linear in R (property
    # verified in tests/test_explain.py) — so clone 0 is derived, not
    # recomputed: 1/(K+1) less lower-backward work than the reference scheme.
    eye = jnp.eye(K, dtype=R_filter.dtype)
    R_masked = (R_filter[None] * eye[:, None, None, :, None]
                ).reshape((K * b,) + R_filter.shape[1:])

    # The K clones are FOLDED into the batch axis rather than vmapped with a
    # leading K axis: measured on the v5e, the plain big-batch backward beats
    # the vmap layouts by ~16% (82 vs 96 ms at 256 clips) — conv FLOPs are
    # cheap here, transposes are not. Bit-identical output either way.
    # shared_denominators=True computes the rule forwards once at batch b and
    # broadcasts onto the clones — fewer FLOPs but 31% SLOWER on the v5e
    # (106.6 vs 81.2 ms at 256 clips, identical output): the broadcast
    # reshapes and per-clone pool routing dominate; the pipeline is
    # layout-bound, not FLOP-bound (BASELINE.md round-2 table). It is however
    # ~Kx LIGHTER on HBM — the tiled path materializes K copies of every
    # lower-segment activation, which OOMs the 16 GB chip for the 6 s model
    # (block-1 maps are 128x256x64) — so the eval harness uses it there.
    # clone_chunk=c bounds HBM a different way: the K clones run through the
    # FAST tiled path in sequential chunks of c, so peak memory scales with
    # c*b rather than K*b — the 6 s model's 128x256x64 block-1 maps OOM the
    # 16 GB chip near 240 folded clones (round-2 VERDICT weak #3). Each
    # clone's math is independent in the tiled path, so chunking matches the
    # one-shot tiled backward up to conv-accumulation reassociation at the
    # smaller batch (tested at rtol 2e-5).
    # the fused chain SUPERSEDES clone_chunk on supported topologies: it
    # bounds memory tighter (per-(instance,clone,row-band) VMEM walks, HBM
    # holds only the batch-b activations) and the on-chip 6 s A/B
    # (scripts/bench_6s_lower.py, after row-banding the deep first-block
    # kernel) measured it 1.81x FASTER than clone_chunk=2 (51.1 vs 92.5 ms
    # at batch 32, corr 0.9999995, max diff 2.9e-6 — BASELINE.md round-3
    # continued). So the AUTO default routes every nhwc non-shared call
    # through plan_chain; clone_chunk remains the fallback when the plan
    # is None (unsupported topology).
    fused_explicit = fused is True
    if fused is None:
        fused = nhwc and not shared_denominators
    if fused:
        from drsa_audio_tpu.xai.lrp.pallas_chain import (
            plan_chain, fused_lower_conv_backward)
        conv_sec, proj_spec = _conv_section(lower)
        # acts_lower[0] is the NHWC model input: [b, H, W, 1]
        plan = plan_chain(conv_sec, params, composite,
                          fine_hw=acts_lower[0].shape[1:3])
        if plan is None and fused_explicit:
            # an explicit fused=True must not silently measure/ship the XLA
            # path (an A/B or a caller that *requires* the kernel would lie)
            raise ValueError("fused=True requested but the conv section / "
                             "input size is outside the fused chain's "
                             "supported topology (see plan_chain)")
    else:
        plan = None
    if plan is not None:
        # projection (epsilon) backward at K*b — the maps here are small
        a_proj = acts_lower[-1]
        a_projk = jnp.broadcast_to(a_proj[None], (K,) + a_proj.shape).reshape(
            (K * b,) + a_proj.shape[1:])
        rule = composite.rule_for(proj_spec.name)
        if rule is not None:
            rname, rkw = rule
            apply_with = _apply_factory(proj_spec, params)
            R = RULES[rname](apply_with, a_projk, R_masked, **rkw)
        else:
            fwd = lambda t: apply_layer(proj_spec, params, t, train=False)
            _, vjp = jax.vjp(fwd, a_projk)
            (R,) = vjp(R_masked)
        R5 = R.reshape((K, b) + R.shape[1:])            # [K,b,d,h,w]
        R_nhwc = jnp.transpose(R5, (1, 0, 3, 4, 2))     # [b,K,h,w,d]
        heat = fused_lower_conv_backward(plan, params, list(acts_lower[:-1]),
                                         R_nhwc, K)      # [b,K,Hf,Wf]
        R_sub = jnp.moveaxis(heat, 1, 0).reshape(
            (K * b, 1) + heat.shape[2:])
    elif clone_chunk is not None and clone_chunk < K:
        R_m = R_masked.reshape((K, b) + R_filter.shape[1:])
        parts = []
        for k0 in range(0, K, clone_chunk):
            kc = min(clone_chunk, K - k0)
            acts_k = [jnp.broadcast_to(a[None], (kc,) + a.shape)
                      .reshape((kc * a.shape[0],) + a.shape[1:])
                      for a in acts_lower]
            Rc = R_m[k0:k0 + kc].reshape((kc * b,) + R_filter.shape[1:])
            parts.append(_lower_backward_tiled(lower, params, acts_k, Rc,
                                               composite, nhwc))
        R_sub = jnp.concatenate(parts, axis=0)
    elif shared_denominators:
        R_sub = _lrp_segment_backward_shared(lower, params, acts_lower,
                                             R_masked, K, composite)
    else:
        acts_k = [jnp.broadcast_to(a[None], (K,) + a.shape)
                  .reshape((K * a.shape[0],) + a.shape[1:])
                  for a in acts_lower]
        R_sub = _lower_backward_tiled(lower, params, acts_k, R_masked,
                                      composite, nhwc)
    R_sub = R_sub.reshape((K, b) + R_sub.shape[1:])
    R_sub = jnp.moveaxis(R_sub, 0, 1)      # [b, K, c, h, w]
    R_std = jnp.sum(R_sub, axis=1, keepdims=True)
    R_in = jnp.concatenate([R_std, R_sub], axis=1)  # [b, K+1, c, h, w]
    return R_in[:, :, 0]                   # channel dim is 1


def maxpool_route_mask(a: jnp.ndarray, kernel: tuple) -> jnp.ndarray:
    """First-argmax routing mask of a stride==kernel MaxPool, shape of ``a``.

    Replicates jax's reduce_window(max) vjp exactly — the full cotangent goes
    to the FIRST maximal element in row-major window order (verified on CPU
    and TPU backends, incl. all-tied windows; tested against the vjp) — but
    is computed from the primal ONCE at batch b, so K relevance clones can
    share it: pool backward becomes repeat(R) * mask with no
    select_and_scatter at K*b and no primal tiling."""
    kh, kw = kernel
    m = maxpool2d(a, kernel)
    m_up = jnp.repeat(jnp.repeat(m, kh, axis=-2), kw, axis=-1)
    eq = a == m_up
    h_idx = jnp.arange(a.shape[-2]) % kh
    w_idx = jnp.arange(a.shape[-1]) % kw
    pos = (h_idx[:, None] * kw + w_idx[None, :]).astype(jnp.float32)
    big = jnp.float32(kh * kw)
    cand = jnp.where(eq, pos, big)
    winner = -maxpool2d(-cand, kernel)          # min-pool of candidate indices
    winner_up = jnp.repeat(jnp.repeat(winner, kh, axis=-2), kw, axis=-1)
    return (eq & (cand == winner_up)).astype(a.dtype)


def _lrp_segment_backward_shared(specs, params, acts, R, K, composite):
    """Backward over a recorded segment whose activations (batch b) are
    SHARED by K relevance clones folded into R's batch axis [K*b, ...].

    Rule denominators/masks are computed once at batch b and broadcast onto
    the clones (rules.SHARED_RULES); only the vjp — the irreducible per-clone
    work — runs at K*b. ReLU gates and MaxPool routing are likewise derived
    from the small batch. Bit-equal to tiling the activations and running
    `_lrp_segment_backward` (tested)."""
    from drsa_audio_tpu.xai.lrp.rules import (
        SHARED_RULES, _expand_batch, _mul_small,
    )
    for i in range(len(specs) - 1, -1, -1):
        spec = specs[i]
        a_in = acts[i]
        b = a_in.shape[0]
        rule = composite.rule_for(spec.name)
        if (rule is not None and spec.kind in _RULE_LAYERS
                and spec.kind != "subspacefilter"):
            rule_name, kwargs = rule
            rule_name = _specialize_rule(rule_name, specs, i)
            apply_with = _apply_factory(spec, params)
            if rule_name in SHARED_RULES:
                R = SHARED_RULES[rule_name](apply_with, a_in, R, K, **kwargs)
            else:
                R = RULES[rule_name](apply_with, _expand_batch(a_in, K), R,
                                     **kwargs)
        elif spec.kind == "relu":
            # match jnp.maximum's vjp exactly (ties at 0 get gradient 0.5)
            # so this path stays bit-equal to the tiled `_lrp_segment_backward`
            # (tie semantics coupled with pallas_chain.relu_gate — see its
            # docstring; change one ⇒ change all)
            gate = jnp.where(a_in > 0, 1.0, jnp.where(a_in == 0, 0.5, 0.0))
            R = _mul_small(R, gate.astype(R.dtype), K)
        elif spec.kind == "flatten":
            R = R.reshape((R.shape[0],) + a_in.shape[1:])
        elif spec.kind == "dropout":
            pass  # identity in eval mode
        elif spec.kind == "maxpool":
            # routing depends only on the shared primal: compute the
            # first-argmax mask ONCE at batch b and apply it to the upsampled
            # clones — no select_and_scatter at K*b, no primal tiling, no
            # per-clone vmap (the round-2 shared path's vmapped vjp was a
            # measured 31% regression; the trace showed select_and_scatter at
            # 13% of the stage — docs/lower_backward_trace.md)
            kh, kw = spec.config["kernel"]
            mask = maxpool_route_mask(a_in, (kh, kw))
            R_up = jnp.repeat(jnp.repeat(R, kh, axis=-2), kw, axis=-1)
            R = _mul_small(R_up, mask, K)
        else:
            # any other unmapped layer: ONE vjp at batch b, applied per clone
            fwd = lambda t, s=spec: apply_layer(s, params, t, train=False)
            _, vjp = jax.vjp(fwd, a_in)
            Rk = R.reshape((K, b) + R.shape[1:])
            R = jax.vmap(lambda r: vjp(r)[0])(Rk)
            R = R.reshape((K * b,) + R.shape[2:])
    return R


def subspace_heatmaps(
    specs_proj: Sequence[LayerSpec],
    params: dict,
    x: jnp.ndarray,
    composite: Composite,
    num_concepts: int,
    class_idx: int | None = None,
    num_classes: int | None = None,
    one_hot_encoded: bool = False,
    output_mask=None,
    shared_denominators: bool = False,
    clone_chunk: int | None = None,
    nhwc: bool | None = None,
    fused: bool | None = None,
):
    """Fast path: returns heatmaps [batch, K+1, h, w] (index 0 = standard).

    ``specs_proj`` must already contain the projection triple
    (see models.projection.insert_projection). For big models that OOM the
    chip, ``clone_chunk`` keeps the fast tiled backward and bounds HBM by
    running the K clones in sequential chunks (bit-identical, preferred);
    ``shared_denominators`` trades ~30% speed for ~Kx less HBM instead
    (see explain_lower). ``nhwc`` (default: on unless shared_denominators)
    runs the conv section of the lower segment in the TPU-preferred NHWC
    layout — see _lrp_segment_backward_nhwc.
    """
    if nhwc is None:
        nhwc = not shared_denominators
    R_filter, acts_lower, logits = explain_forward_upper(
        specs_proj, params, x, composite, class_idx=class_idx,
        num_classes=num_classes, one_hot_encoded=one_hot_encoded,
        output_mask=output_mask, nhwc=nhwc)
    heat = explain_lower(specs_proj, params, acts_lower, R_filter, composite,
                         num_concepts, shared_denominators=shared_denominators,
                         clone_chunk=clone_chunk, nhwc=nhwc, fused=fused)
    return heat, logits


def subspace_heatmaps_repeated(
    specs_proj, params, x, composite, num_concepts,
    class_idx=None, num_classes=None, one_hot_encoded=False,
):
    """Reference-scheme path (repeat_interleave(K+1), one big LRP pass) for
    cross-validation of the fast path."""
    k1 = num_concepts + 1
    xr = jnp.repeat(x, k1, axis=0)
    if class_idx is not None:
        out_fn = output_mask_class(class_idx, one_hot_encoded)
    else:
        out_fn = output_mask_all_classes(num_classes, one_hot_encoded)
    R, logits, _ = lrp(specs_proj, params, xr, composite, out_fn)
    R = R.reshape(-1, k1, *x.shape[1:])
    return R[:, :, 0], logits


def sort_subspaces(subspace_heatmaps: np.ndarray):
    """Sort each instance's subspace heatmaps by descending total relevance
    (reference explainer.py:151-176). Returns (heatmaps, relevances, mask)."""
    rel = subspace_heatmaps.sum(axis=(-2, -1))
    order = np.argsort(rel, axis=-1)[..., ::-1]
    b = subspace_heatmaps.shape[0]
    sorted_maps = subspace_heatmaps[np.arange(b)[:, None], order]
    sorted_rel = rel[np.arange(b)[:, None], order]
    return sorted_maps, sorted_rel, order


# Compiled heatmap programs shared ACROSS HeatmapGenerator instances: the
# projection U and the class one-hot are traced arguments (the serving-layer
# trick, serving.ExplainerService), so the eval harness's per-class / per-U
# generator loop compiles ONE program per (model, layer, flags, batch shape)
# instead of one per generator — and the explain walk runs jitted instead of
# dispatching op-by-op (the same eager-walk cost that dominated the v2
# extraction stage). Values hold strong refs to specs/params so the id-based
# keys can't be recycled by the GC — which also pins each entry's parameter
# buffers, so the cache is LRU-bounded: a loop sweeping many checkpoints
# (new params identity per iteration) must not accumulate device memory for
# the process lifetime. 16 entries cover the eval harness's worst case (one
# program per model/layer/flag combination in flight).
_PROGRAM_CACHE: "collections.OrderedDict" = collections.OrderedDict()
_PROGRAM_CACHE_MAX = 16


def _heatmap_program(specs, params, name_map_repr, composite, num_concepts,
                     layer_idx, input_size, class_mode, one_hot_encoded,
                     shared_denominators, clone_chunk, num_classes):
    key = (id(specs), id(params), name_map_repr, num_concepts, layer_idx,
           input_size, class_mode, one_hot_encoded, shared_denominators,
           clone_chunk, num_classes)
    ent = _PROGRAM_CACHE.get(key)
    if ent is not None:
        _PROGRAM_CACHE.move_to_end(key)
        return ent[0]

    if class_mode == "single":
        @jax.jit
        def f(xc, U, onehot):
            sp = insert_projection(specs, layer_idx, U, num_concepts,
                                   input_size=input_size)
            mask_fn = (lambda lg: jnp.broadcast_to(onehot, lg.shape)
                       ) if one_hot_encoded else (lambda lg: lg * onehot[None, :])
            heat, _ = subspace_heatmaps(
                sp, params, xc, composite, num_concepts, output_mask=mask_fn,
                shared_denominators=shared_denominators,
                clone_chunk=clone_chunk)
            return heat
    else:
        @jax.jit
        def f(xc, U):
            sp = insert_projection(specs, layer_idx, U, num_concepts,
                                   input_size=input_size)
            heat, _ = subspace_heatmaps(
                sp, params, xc, composite, num_concepts,
                num_classes=num_classes, one_hot_encoded=one_hot_encoded,
                shared_denominators=shared_denominators,
                clone_chunk=clone_chunk)
            return heat

    _PROGRAM_CACHE[key] = (f, specs, params)
    while len(_PROGRAM_CACHE) > _PROGRAM_CACHE_MAX:
        _PROGRAM_CACHE.popitem(last=False)
    return f


@dataclasses.dataclass
class HeatmapGenerator:
    """Drop-in equivalent of the reference HeatmapGenerator
    (explainer.py:15-176).

    Attributes mirror the reference: after ``generate_subspace_heatmaps`` the
    ``info`` dict holds input / standard_heatmaps / standard_relevance /
    subspace_heatmaps / subspace_relevances / mask.
    """
    specs: Sequence[LayerSpec]
    params: dict
    U: jnp.ndarray
    name_map: list
    sample_class: str
    num_concepts: int = 4
    layer_idx: int = 10
    case: str | None = None

    def __post_init__(self):
        case = self.case
        if case is None:
            case = "toy" if self.sample_class.endswith(("1", "2")) else "gtzan"
        mapper = CLASS_IDX_MAPPER_TOY if case == "toy" else CLASS_IDX_MAPPER
        self.class_idx = mapper[self.sample_class]
        self.num_classes = len(mapper)
        # input mel shape per case so the InvProjection restores non-square
        # maps (the 6 s net is 128x256)
        ap = AUDIO_PARAMS[case]
        self._input_size = (ap["n_mels"], ap["mel_width"])
        self.specs_proj = insert_projection(
            self.specs, self.layer_idx, jnp.asarray(self.U, jnp.float32),
            self.num_concepts, input_size=self._input_size)
        self.composite = class_composite(self.name_map, self.num_concepts)
        self.info: dict = {}

    def generate_subspace_heatmaps(
        self, input_batch, one_hot_encoded=False, concept_flipping=False,
        flip_all_classes=False, attr_batch_size: int | None = None,
        shared_denominators: bool = False, clone_chunk: int | None = None,
    ):
        x = jnp.asarray(input_batch)
        self.info["input"] = np.asarray(x)

        mode = "all" if flip_all_classes else "single"
        prog = _heatmap_program(
            self.specs, self.params, repr(self.name_map), self.composite,
            self.num_concepts, self.layer_idx, self._input_size, mode,
            one_hot_encoded, shared_denominators, clone_chunk,
            self.num_classes)
        U = jnp.asarray(self.U, jnp.float32)
        onehot = jnp.zeros(self.num_classes, jnp.float32).at[
            self.class_idx].set(1.0)

        def run(xc):
            if flip_all_classes:
                return np.asarray(prog(xc, U))
            return np.asarray(prog(xc, U, onehot))

        # attr_batch_size bounds device memory: the lower backward holds the
        # K-folded block-1 activations (the 6 s net's 128x256x64 maps OOM a
        # 16 GB chip near 240 clones), so chunk the attribution like the
        # DRSA extraction does (preprocessing.preprocess_data). Not valid
        # with flip_all_classes — its block-diagonal output mask is built
        # from the position of each sample in the full balanced batch.
        if attr_batch_size and x.shape[0] > attr_batch_size:
            if flip_all_classes:
                raise ValueError(
                    "attr_batch_size cannot be combined with "
                    "flip_all_classes (batch-position-dependent mask)")
            heat = np.concatenate(
                [run(x[i:i + attr_batch_size])
                 for i in range(0, x.shape[0], attr_batch_size)], axis=0)
        else:
            heat = run(x)  # [b, K+1, h, w]
        if concept_flipping:
            # evaluation path: return raw subspace heatmaps (reference
            # explainer.py:103-109 commented-out early return, used by cpf)
            return heat[:, 1:]
        standard = heat[:, 0:1]
        sub, sub_rel, mask = sort_subspaces(heat[:, 1:])
        self.info["standard_heatmaps"] = standard
        self.info["standard_relevance"] = standard.sum(axis=(-2, -1)).flatten()
        self.info["subspace_heatmaps"] = sub
        self.info["subspace_relevances"] = sub_rel
        self.info["mask"] = mask
        return sub


def compute_subspace_relevances(act_vecs, ctx_vecs, U, n_concepts: int = 4):
    """Direct per-subspace relevance sum((aU) * (cU)) per concept block
    without heatmaps (reference explainer.py:206-242).

    act_vecs/ctx_vecs: [batch, N, d]. Returns [batch, n_concepts].
    """
    act_vecs = jnp.asarray(act_vecs)
    ctx_vecs = jnp.asarray(ctx_vecs)
    if act_vecs.ndim == 2:
        act_vecs = act_vecs[None]
    if ctx_vecs.ndim == 2:
        ctx_vecs = ctx_vecs[None]
    d = U.shape[0]
    d_k = d // n_concepts
    xa = jnp.matmul(act_vecs, U, preferred_element_type=jnp.float32)
    xc = jnp.matmul(ctx_vecs, U, preferred_element_type=jnp.float32)
    x = (xa * xc).reshape(act_vecs.shape[0], act_vecs.shape[1], n_concepts, d_k)
    return x.sum(axis=(-1, 1))
