"""Virtual projection layers for subspace attribution.

Re-implements the reference's module surgery (cxai/model/modify_model.py:4-123)
functionally: ``insert_projection`` splices Projection -> SubspaceFilter ->
InvProjection layer specs into the layer list after ``layer_idx``; the layers
are parameterless (U rides in the spec config as a static array closed over by
the compiled program).

Shapes (d = channels, n = h*w spatial positions, K = num_concepts):
  Projection:    [b, d, h, w] -> [b, n, K, d_k]   via  (a^T U).reshape
  InvProjection: [b, n, K, d_k] -> [b, d, h, w]   via  (h U^T).reshape
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from drsa_audio_tpu.models.vgg import LayerSpec


def apply_projection_with(U, num_concepts: int):
    d = U.shape[0]
    d_k = d // num_concepts

    def fn(act_map):
        b, ch, h, w = act_map.shape
        vecs = act_map.reshape(b, ch, h * w).swapaxes(-2, -1)  # [b, n, d]
        proj = jnp.matmul(vecs, U, preferred_element_type=jnp.float32)
        return proj.reshape(b, h * w, num_concepts, d_k)

    return fn


def apply_inv_projection_with(U, num_concepts: int, map_hw=None):
    """``map_hw`` is the (h, w) of the restored activation map. The reference
    InvProjection assumes a square map (h = w = sqrt(n),
    modify_model.py:110-118) — correct for its 3 s/toy models but wrong for
    the 6 s net whose 128x256 input yields non-square maps; pass map_hw for
    those (intended-behavior divergence, PARITY.md)."""
    d = U.shape[0]

    def fn(hvec):
        b, n, _, _ = hvec.shape
        flat = hvec.reshape(b, n, d)
        rec = jnp.matmul(flat, U.T, preferred_element_type=jnp.float32)
        if map_hw is not None:
            h, w = map_hw
            if h * w != n:
                raise ValueError(f"map_hw {map_hw} inconsistent with n={n}")
        else:
            h = w = int(round(n ** 0.5))
            if h * w != n:
                raise ValueError(
                    f"non-square activation map (n={n}); pass map_hw to "
                    "insert_projection (6 s-model maps are h != w)")
        return rec.swapaxes(-2, -1).reshape(b, d, h, w)

    return fn


def apply_projection(x, U, num_concepts):
    return apply_projection_with(U, num_concepts)(x)


def apply_inv_projection(x, U, num_concepts, map_hw=None):
    return apply_inv_projection_with(U, num_concepts, map_hw)(x)


def feature_map_hw(specs: Sequence[LayerSpec], layer_idx: int,
                   input_size) -> tuple[int, int]:
    """(h, w) of the activation map right after ``features.{layer_idx}``:
    shape-propagates ``input_size`` through the feature stack ('same'-padded
    convs preserve shape; maxpools floor-divide by their kernel)."""
    h, w = input_size
    target = f"features.{layer_idx}"
    for spec in specs:
        if spec.kind == "maxpool":
            kh, kw = spec.config["kernel"]
            h, w = h // kh, w // kw
        if spec.name == target:
            return int(h), int(w)
    raise ValueError(f"layer {target} not found in model specs")


def insert_projection(
    specs: Sequence[LayerSpec],
    layer_idx: int,
    U: jnp.ndarray,
    num_concepts: int,
    input_size=None,
) -> list[LayerSpec]:
    """Build the ProjectionModel layer list (reference modify_model.py:44-50):
    inserts the virtual triple right after ``features.{layer_idx}``.

    Non-feature layers (flatten/classifier) are untouched. ``input_size``
    (the model's (n_mels, mel_width)) lets the InvProjection restore
    non-square maps — required for the 6 s net; square maps work without it.
    """
    target = f"features.{layer_idx}"
    map_hw = (feature_map_hw(specs, layer_idx, input_size)
              if input_size is not None else None)
    out: list[LayerSpec] = []
    found = False
    for spec in specs:
        out.append(spec)
        if spec.name == target:
            found = True
            out.append(LayerSpec("projection", "features.projection",
                                 {"U": U, "num_concepts": num_concepts}))
            out.append(LayerSpec("subspacefilter", "features.subspacefilter", {}))
            out.append(LayerSpec("invprojection", "features.invprojection",
                                 {"U": U, "num_concepts": num_concepts,
                                  "map_hw": map_hw}))
    if not found:
        raise ValueError(f"layer {target} not found in model specs")
    return out
