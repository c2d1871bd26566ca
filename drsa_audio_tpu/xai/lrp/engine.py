"""Functional LRP attribution engine.

Replaces the reference's zennit hook machinery (cxai/xai/explain/attribute.py,
explainer.py) with a *function interpreter*: the model is an explicit layer
list (drsa_audio_tpu.models.vgg); the forward pass records each layer's input;
the backward pass walks the list in reverse applying per-layer rules. Layers
without a mapped rule propagate relevance through the plain vjp of their
forward at the recorded input — exactly what an unmapped module does under
zennit (ReLU gating, MaxPool winner-take-all routing, reshape for flatten).

Everything is pure and jit/vmap/pjit-compatible; one compiled program yields
the input heatmap AND any requested intermediate (activation, relevance)
pairs — the `retain_grad` dance of the reference (preprocessing.py:92-176)
becomes a return value.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from drsa_audio_tpu.models.vgg import (
    LayerSpec,
    apply_layer,
    conv2d_same,
)
from drsa_audio_tpu.xai.lrp.rules import RULES


@dataclasses.dataclass(frozen=True)
class Composite:
    """Maps layer names to rule specs: {name: (rule_name, kwargs)}.

    Equivalent of a zennit NameMapComposite. Use
    drsa_audio_tpu.models.vgg.fold_batchnorm for the SequentialMergeBatchNorm
    canonizer before attribution.
    """
    name_map: tuple  # tuple of (layer_name, (rule_name, kwargs-dict))

    def rule_for(self, name: str):
        for pattern, rule in self.name_map:
            if pattern == name:
                return rule
        return None

    @classmethod
    def from_list(cls, name_map) -> "Composite":
        return cls(tuple((n, (r, dict(kw))) for n, (r, kw) in name_map))


def layer_map_composite(
    specs: Sequence[LayerSpec],
    conv_rule,
    dense_rule,
    first_layer_rule=None,
) -> Composite:
    """SpecialFirstLayerMapComposite equivalent (reference pf.py:230-238):
    assign ``conv_rule`` to every conv, ``dense_rule`` to every linear, and
    optionally ``first_layer_rule`` to the first conv."""
    name_map = []
    first_conv = True
    for spec in specs:
        if spec.kind == "conv":
            if first_conv and first_layer_rule is not None:
                name_map.append((spec.name, first_layer_rule))
            else:
                name_map.append((spec.name, conv_rule))
            first_conv = False
        elif spec.kind == "linear":
            name_map.append((spec.name, dense_rule))
    return Composite.from_list(name_map)


def _apply_factory(spec: LayerSpec, params: dict):
    """Build apply_with(w_mod, b_mod) for a parameterized linear layer.

    The returned callable additionally exposes:
      .grouped([w_mods], [b_mods]) -> (x -> tuple of z_i): all modified
          forwards evaluated in ONE kernel (grouped conv / stacked matmul),
          doubling channel occupancy on the MXU;
      .bias_of(b_mod) -> broadcastable bias contribution f(0) of a modified
          layer (free, no conv).
    Rules use these for fused fast paths when available.
    """
    if spec.kind == "conv":
        p = params[spec.name]

        def apply_with(w_mod, b_mod):
            w = w_mod(p["w"])
            b = b_mod(p["b"]) if (b_mod is not None and "b" in p) else None
            return lambda x: conv2d_same(x, w, b)

        def grouped(w_mods, b_mods):
            """All modified forwards share ONE input, so they fuse into a
            single DENSE conv with the weight variants stacked along the
            output-channel dim — contraction depth stays C_in on the MXU and
            the input is read once (a feature-grouped conv would duplicate
            the input and halve the per-group contraction)."""
            g = len(w_mods)
            w_stack = jnp.concatenate([m(p["w"]) for m in w_mods], axis=0)
            b_stack = jnp.concatenate([
                (m(p["b"]) if m is not None else jnp.zeros_like(p["b"]))
                for m in b_mods], axis=0)
            c_out = p["w"].shape[0]

            def fn(x):
                out = jax.lax.conv_general_dilated(
                    x.astype(w_stack.dtype), w_stack, window_strides=(1, 1),
                    padding="SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"),
                ).astype(jnp.float32)
                out = out + b_stack.astype(jnp.float32)[None, :, None, None]
                return tuple(out[:, i * c_out:(i + 1) * c_out] for i in range(g))

            return fn

        def bias_of(b_mod):
            b = b_mod(p["b"]).astype(jnp.float32)
            return b[None, :, None, None]

        def grouped_multi(w_mods, b_mods):
            """Like grouped, but each group gets its OWN input array."""
            g = len(w_mods)
            w_stack = jnp.concatenate([m(p["w"]) for m in w_mods], axis=0)
            b_stack = jnp.concatenate([
                (m(p["b"]) if m is not None else jnp.zeros_like(p["b"]))
                for m in b_mods], axis=0)
            c_out = p["w"].shape[0]

            def fn(*xs):
                xg = jnp.concatenate(xs, axis=1)
                out = jax.lax.conv_general_dilated(
                    xg.astype(w_stack.dtype), w_stack, window_strides=(1, 1),
                    padding="SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"),
                    feature_group_count=g,
                ).astype(jnp.float32)
                out = out + b_stack.astype(jnp.float32)[None, :, None, None]
                return tuple(out[:, i * c_out:(i + 1) * c_out] for i in range(g))

            return fn

        apply_with.grouped = grouped
        apply_with.grouped_multi = grouped_multi
        apply_with.bias_of = bias_of
        return apply_with
    if spec.kind == "linear":
        from drsa_audio_tpu.models.vgg import linear_apply
        p = params[spec.name]

        def apply_with(w_mod, b_mod):
            w = w_mod(p["w"])
            b = b_mod(p["b"]) if b_mod is not None else jnp.zeros_like(p["b"])
            return lambda x: linear_apply(x, w, b)

        def grouped(w_mods, b_mods):
            w_stack = jnp.concatenate([m(p["w"]) for m in w_mods], axis=0)
            b_stack = jnp.concatenate([
                (m(p["b"]) if m is not None else jnp.zeros_like(p["b"]))
                for m in b_mods], axis=0)
            n_out = p["w"].shape[0]
            g = len(w_mods)

            def fn(x):
                out = linear_apply(x, w_stack, b_stack)
                return tuple(out[..., i * n_out:(i + 1) * n_out] for i in range(g))

            return fn

        def bias_of(b_mod):
            return b_mod(p["b"]).astype(jnp.float32)

        def grouped_multi(w_mods, b_mods):
            # one batched matmul: [g, b, in] x [g, out, in] -> [g, b, out]
            w_stack = jnp.stack([m(p["w"]) for m in w_mods])
            b_stack = jnp.stack([
                (m(p["b"]) if m is not None else jnp.zeros_like(p["b"]))
                for m in b_mods])
            g = len(w_mods)

            def fn(*xs):
                xg = jnp.stack(xs).astype(w_stack.dtype)
                out = jnp.einsum("gbi,goi->gbo", xg, w_stack,
                                 preferred_element_type=jnp.float32)
                out = out.astype(jnp.float32) + b_stack.astype(jnp.float32)[:, None, :]
                return tuple(out[i] for i in range(g))

            return fn

        apply_with.grouped = grouped
        apply_with.grouped_multi = grouped_multi
        apply_with.bias_of = bias_of
        return apply_with
    if spec.kind in ("projection", "invprojection"):
        # Parameterless bilinear layers: the 'weight' is U (static in config).
        U = spec.config["U"]
        k = spec.config["num_concepts"]
        from drsa_audio_tpu.models.projection import (
            apply_projection_with,
            apply_inv_projection_with,
        )
        if spec.kind == "projection":
            def apply_with(w_mod, b_mod):
                return apply_projection_with(w_mod(U), k)
        else:
            map_hw = spec.config.get("map_hw")

            def apply_with(w_mod, b_mod):
                return apply_inv_projection_with(w_mod(U), k, map_hw)

        return apply_with
    raise ValueError(f"no apply factory for layer kind {spec.kind}")


def _apply_factory_nhwc(spec: LayerSpec, params: dict):
    """NHWC twin of _apply_factory for conv layers (lower-segment hot path;
    see models.vgg.conv2d_same_nhwc). Same contract: apply_with / .grouped /
    .grouped_multi / .bias_of — biases broadcast on the minor (channel) dim."""
    from drsa_audio_tpu.models.vgg import conv2d_same_nhwc
    if spec.kind != "conv":
        raise ValueError(f"_apply_factory_nhwc: only conv, got {spec.kind}")
    p = params[spec.name]

    def apply_with(w_mod, b_mod):
        w = w_mod(p["w"])
        b = b_mod(p["b"]) if (b_mod is not None and "b" in p) else None
        return lambda x: conv2d_same_nhwc(x, w, b)

    def grouped(w_mods, b_mods):
        g = len(w_mods)
        w_stack = jnp.concatenate([m(p["w"]) for m in w_mods], axis=0)
        b_stack = jnp.concatenate([
            (m(p["b"]) if m is not None else jnp.zeros_like(p["b"]))
            for m in b_mods], axis=0)
        c_out = p["w"].shape[0]

        def fn(x):
            out = conv2d_same_nhwc(x, w_stack, b_stack)
            return tuple(out[..., i * c_out:(i + 1) * c_out] for i in range(g))

        return fn

    def bias_of(b_mod):
        b = b_mod(p["b"]).astype(jnp.float32)
        return b[None, None, None, :]

    def grouped_multi(w_mods, b_mods):
        g = len(w_mods)
        w_stack = jnp.concatenate([m(p["w"]) for m in w_mods], axis=0)
        b_stack = jnp.concatenate([
            (m(p["b"]) if m is not None else jnp.zeros_like(p["b"]))
            for m in b_mods], axis=0)
        c_out = p["w"].shape[0]
        w_hwio = jnp.transpose(w_stack, (2, 3, 1, 0))

        def fn(*xs):
            xg = jnp.concatenate(xs, axis=-1)
            out = jax.lax.conv_general_dilated(
                xg.astype(w_hwio.dtype), w_hwio, window_strides=(1, 1),
                padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=g,
            ).astype(jnp.float32)
            out = out + b_stack.astype(jnp.float32)[None, None, None, :]
            return tuple(out[..., i * c_out:(i + 1) * c_out] for i in range(g))

        return fn

    apply_with.grouped = grouped
    apply_with.grouped_multi = grouped_multi
    apply_with.bias_of = bias_of
    return apply_with


_RULE_LAYERS = ("conv", "linear", "projection", "invprojection", "subspacefilter")


def _specialize_rule(rule_name: str, specs, i: int) -> str:
    """Use the cheaper non-negative-input gamma when the layer input is
    provably >= 0: preceded by ReLU, possibly through MaxPools (pooling
    preserves sign only over non-negative inputs, so the chain must end at a
    ReLU)."""
    if rule_name != "gamma":
        return rule_name
    j = i - 1
    while j >= 0 and specs[j].kind == "maxpool":
        j -= 1
    if j >= 0 and specs[j].kind == "relu":
        return "gamma_nonneg"
    return rule_name


def lrp(
    specs: Sequence[LayerSpec],
    params: dict,
    x: jnp.ndarray,
    composite: Composite,
    output_relevance: Callable[[jnp.ndarray], jnp.ndarray],
    capture: Sequence[str] = (),
    stop_after_capture: bool = False,
):
    """Run LRP: forward recording activations, modified backward.

    Args:
        specs/params: the model.
        x: input batch [b, c, h, w].
        composite: name -> rule mapping.
        output_relevance: maps logits -> initial output relevance
            (lrp_output_modifier semantics, reference attribute.py:111-161).
        capture: layer names whose (output activation, output relevance) to
            return — the preprocess_data hook equivalent.
        stop_after_capture: end the backward walk once every captured layer
            has been recorded — the DRSA extraction only needs relevance AT
            the capture layer, and the layers below it (the fine-resolution
            conv blocks) are the expensive majority of the walk. The
            returned input_relevance is then the relevance at the lowest
            captured layer's output, not the input.

    Returns:
        (input_relevance, logits, captured) where captured maps name ->
        (activation_out, relevance_out).
    """
    # ---- forward: record the input to every layer
    acts = []
    h = x
    for spec in specs:
        acts.append(h)
        h = apply_layer(spec, params, h, train=False)
    logits = h

    R = output_relevance(logits)

    captured: dict[str, tuple] = {}
    capture = set(capture)

    # ---- backward: apply rules / fallback vjp in reverse
    for i in range(len(specs) - 1, -1, -1):
        spec = specs[i]
        a_in = acts[i]
        a_out = acts[i + 1] if i + 1 < len(acts) else logits
        if spec.name in capture:
            # relevance at the OUTPUT of this layer is the R arriving now
            captured[spec.name] = (a_out, R)
            if stop_after_capture and len(captured) == len(capture):
                return R, logits, captured

        rule = composite.rule_for(spec.name)
        if rule is not None and spec.kind in _RULE_LAYERS:
            rule_name, kwargs = rule
            if spec.kind == "subspacefilter":
                R = RULES["subspace_mask"](None, a_in, R, **kwargs)
            else:
                apply_with = _apply_factory(spec, params)
                R = RULES[_specialize_rule(rule_name, specs, i)](
                    apply_with, a_in, R, **kwargs)
        else:
            # unmapped layer: plain vjp at the recorded input
            fwd = lambda t, s=spec: apply_layer(s, params, t, train=False)
            _, vjp = jax.vjp(fwd, a_in)
            (R,) = vjp(R)
    return R, logits, captured


def output_mask_class(class_idx: int, one_hot: bool = False):
    """Attribute a single class: mask = one-hot(class_idx); relevance is the
    logit (or 1.0 if one_hot) at that position (reference
    attribute.py:132-144)."""
    def fn(logits):
        mask = jnp.zeros_like(logits).at[..., class_idx].set(1.0)
        return mask if one_hot else logits * mask
    return fn


def output_mask_all_classes(num_classes: int, one_hot: bool = False):
    """Balanced consecutive-class batch: sample i attributes class
    i // (batch/num_classes) (reference attribute.py:146-158)."""
    def fn(logits):
        b = logits.shape[0]
        per = b // num_classes
        eye = jnp.eye(num_classes, dtype=logits.dtype)
        mask = jnp.repeat(eye, per, axis=0)
        return mask if one_hot else logits * mask
    return fn


def compute_relevances(
    specs,
    params,
    x,
    composite,
    class_idx: int | None = None,
    num_classes: int | None = None,
    one_hot_encoded: bool = False,
):
    """Drop-in equivalent of reference attribute.compute_relevances
    (attribute.py:70-108): returns input relevance maps, same shape as x."""
    if class_idx is not None:
        out_fn = output_mask_class(class_idx, one_hot_encoded)
    elif num_classes is not None:
        out_fn = output_mask_all_classes(num_classes, one_hot_encoded)
    else:
        raise ValueError("provide class_idx or num_classes")
    R, _, _ = lrp(specs, params, x, composite, out_fn)
    return R
