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


def apply_inv_projection_with(U, num_concepts: int):
    d = U.shape[0]

    def fn(hvec):
        b, n, _, _ = hvec.shape
        flat = hvec.reshape(b, n, d)
        rec = jnp.matmul(flat, U.T, preferred_element_type=jnp.float32)
        side = int(round(n ** 0.5))
        return rec.swapaxes(-2, -1).reshape(b, d, side, side)

    return fn


def apply_projection(x, U, num_concepts):
    return apply_projection_with(U, num_concepts)(x)


def apply_inv_projection(x, U, num_concepts):
    return apply_inv_projection_with(U, num_concepts)(x)


def insert_projection(
    specs: Sequence[LayerSpec],
    layer_idx: int,
    U: jnp.ndarray,
    num_concepts: int,
) -> list[LayerSpec]:
    """Build the ProjectionModel layer list (reference modify_model.py:44-50):
    inserts the virtual triple right after ``features.{layer_idx}``.

    Non-feature layers (flatten/classifier) are untouched.
    """
    target = f"features.{layer_idx}"
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
                                 {"U": U, "num_concepts": num_concepts}))
    if not found:
        raise ValueError(f"layer {target} not found in model specs")
    return out
