"""DRSA training-data extraction.

Re-implements reference cxai/xai/drsa/preprocessing.py TPU-first: the
activation and relevance maps at the target layer fall out of the LRP
engine's ``capture`` mechanism (one compiled forward+backward; no hooks, no
retain_grad, no host mini-batching loop — memory is bounded by XLA
rematerialization instead, and the batch axis can be pjit-sharded).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from drsa_audio_tpu.models.vgg import LayerSpec
from drsa_audio_tpu.xai.lrp.engine import Composite, lrp, output_mask_class


def extract_act_rel_maps(
    specs: Sequence[LayerSpec],
    params: dict,
    input_batch: jnp.ndarray,
    composite: Composite,
    layer_idx: int,
    class_idx: int,
    one_hot_encoded: bool = False,
):
    """Activation + relevance maps at ``features.{layer_idx}``'s output.

    Equivalent of reference get_intermediate (preprocessing.py:106-176).
    Returns (activation_maps, relevance_maps), each [b, d, h, w].
    """
    layer_name = f"features.{layer_idx}"
    _, _, captured = lrp(
        specs, params, input_batch, composite,
        output_mask_class(class_idx, one_hot_encoded),
        capture=(layer_name,), stop_after_capture=True,
    )
    return captured[layer_name]


def make_extract_fn(specs, params, composite, layer_idx: int,
                    one_hot_encoded: bool = False):
    """ONE compiled LRP-capture program per layer serving EVERY class.

    The class index is a traced scalar (the output mask is built from it
    inside the program), so a 10-class x 3-layer extraction sweep compiles 3
    programs instead of 30 — and runs jitted instead of dispatching the LRP
    walk op-by-op (``extract_act_rel_maps`` is pure tracing code; called
    eagerly it issues hundreds of individual device programs per minibatch,
    which dominated the flagship extraction stage's wall clock).

    Returns ``fn(x, class_idx) -> (act_maps, rel_maps)``; pass it to
    ``preprocess_data(extract_fn=...)``.
    """
    layer_name = f"features.{layer_idx}"

    @jax.jit
    def fn(x, class_idx):
        def out_fn(logits):
            mask = (jnp.arange(logits.shape[-1]) == class_idx).astype(
                logits.dtype)
            mask = jnp.broadcast_to(mask, logits.shape)
            return mask if one_hot_encoded else logits * mask
        _, _, captured = lrp(specs, params, x, composite, out_fn,
                             capture=(layer_name,), stop_after_capture=True)
        return captured[layer_name]

    # so preprocess_data can reject a program built for a different layer,
    # class encoding, composite, or model (a mismatch would silently yield
    # wrong-layer maps — or maps attributed under the wrong rule set, e.g. an
    # extract_fn built before a rescale_gamma composite swap)
    fn.layer_idx = layer_idx
    fn.one_hot_encoded = one_hot_encoded
    fn.composite_id = id(composite)
    fn.specs_id = id(specs)
    fn.params_id = id(params)
    return fn


def compute_context_vectors(activation_vectors, relevance_vectors, eps: float = 1e-7):
    """c = R / (a + eps) (reference preprocessing.py:179-193)."""
    return relevance_vectors / (activation_vectors + eps)


def sample_spatial_locations(key, batch_size: int, map_hw, num_locations: int,
                             clip_keys=None):
    """Per-instance random spatial positions without replacement
    (reference preprocessing.py:196-216), as a jittable permutation trick.

    ``clip_keys`` ([batch, 2] key array) overrides the internal per-clip key
    split — the sharded extraction path precomputes the GLOBAL split and
    shards it with the data so every mesh size draws identical locations.

    Returns int32 [batch, num_locations] indices into the flattened map.
    """
    total = map_hw[0] * map_hw[1]
    keys = jax.random.split(key, batch_size) if clip_keys is None else clip_keys

    def pick(k):
        return jax.random.permutation(k, total)[:num_locations]

    return jax.vmap(pick)(keys)


def gather_vectors(maps: jnp.ndarray, idcs: jnp.ndarray) -> jnp.ndarray:
    """Extract per-location channel vectors.

    maps: [b, d, h, w]; idcs: [b, L] -> [b*L, d]
    (reference get_vectors_from_maps, preprocessing.py:234-256).
    """
    b, d = maps.shape[0], maps.shape[1]
    flat = maps.reshape(b, d, -1)                       # [b, d, hw]
    vecs = jnp.take_along_axis(flat, idcs[:, None, :], axis=2)  # [b, d, L]
    return vecs.swapaxes(-2, -1).reshape(-1, d)


def all_vectors(maps: jnp.ndarray) -> jnp.ndarray:
    """[b, d, h, w] -> [b, h*w, d] (inference mode, preprocessing.py:80-84)."""
    b, d = maps.shape[0], maps.shape[1]
    return maps.reshape(b, d, -1).swapaxes(-2, -1)


def normalize_vectors(vectors: jnp.ndarray) -> jnp.ndarray:
    """v / rms(all entries) / d^0.25 — the DRSA paper stabilization
    (reference preprocessing.py:219-231)."""
    d = vectors.shape[-1]
    E = jnp.sqrt(jnp.mean(jnp.square(vectors)))
    return vectors / E / d**0.25


def preprocess_data(
    specs,
    params,
    input_batch,
    composite: Composite,
    layer_idx: int,
    class_idx: int,
    num_locations: int | None = None,
    one_hot_encoded: bool = False,
    key: jax.Array | None = None,
    attr_batch_size: int | None = 64,
    clip_keys: jax.Array | None = None,
    extract_fn=None,
):
    """Build (activation_vectors, context_vectors) for DRSA optimization
    (reference preprocess_data, preprocessing.py:18-89).

    With ``num_locations``: training mode, samples that many random positions
    per map -> [b*L, d]. Without: inference mode, all positions -> [b, hw, d].

    ``attr_batch_size`` bounds device memory by running the LRP pass in
    minibatches (reference preprocessing.py:126-152 does the same at 64) —
    the captured maps at the DRSA layers are small, so only the attribution
    pass is chunked.

    ``extract_fn`` (from ``make_extract_fn``) supplies a pre-compiled
    class-traced extraction program; without it the LRP walk dispatches
    eagerly (fine under an outer jit such as the sharded extraction path,
    slow as a host-level loop).
    """
    input_batch = jnp.asarray(input_batch)
    b = input_batch.shape[0]

    if extract_fn is not None:
        want = (layer_idx, one_hot_encoded,
                id(composite), id(specs), id(params))
        got = (getattr(extract_fn, "layer_idx", layer_idx),
               getattr(extract_fn, "one_hot_encoded", one_hot_encoded),
               getattr(extract_fn, "composite_id", id(composite)),
               getattr(extract_fn, "specs_id", id(specs)),
               getattr(extract_fn, "params_id", id(params)))
        if got != want:
            raise ValueError(
                "extract_fn was built for a different "
                "(layer, one_hot, composite, specs, params) than "
                f"preprocess_data was called with: {got} != {want}")

    def _extract(xc):
        if extract_fn is not None:
            return extract_fn(xc, jnp.int32(class_idx))
        return extract_act_rel_maps(specs, params, xc, composite,
                                    layer_idx, class_idx, one_hot_encoded)

    if attr_batch_size and b > attr_batch_size:
        parts = [_extract(input_batch[i:i + attr_batch_size])
                 for i in range(0, b, attr_batch_size)]
        act_maps = jnp.concatenate([p[0] for p in parts])
        rel_maps = jnp.concatenate([p[1] for p in parts])
    else:
        act_maps, rel_maps = _extract(input_batch)
    if num_locations:
        if key is None:
            key = jax.random.PRNGKey(0)
        idcs = sample_spatial_locations(
            key, input_batch.shape[0], act_maps.shape[-2:], num_locations,
            clip_keys=clip_keys)
        act_vecs = gather_vectors(act_maps, idcs)
        rel_vecs = gather_vectors(rel_maps, idcs)
    else:
        act_vecs = all_vectors(act_maps)
        rel_vecs = all_vectors(rel_maps)
    ctx_vecs = compute_context_vectors(act_vecs, rel_vecs)
    return act_vecs, ctx_vecs
