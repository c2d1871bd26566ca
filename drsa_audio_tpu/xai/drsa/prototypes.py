"""Prototype discovery: find the data subset maximizing the DRSA objective.

Reference cxai/xai/drsa/prototypes.py:14-130 scans disjoint subsets of n
clips sequentially; here the per-subset objective evaluation is one vmapped
program over all subsets.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from drsa_audio_tpu.xai.drsa.optimizer import obj_val
from drsa_audio_tpu.xai.drsa.preprocessing import preprocess_data


class PrototypeResult(NamedTuple):
    act_vecs: jnp.ndarray        # [n * L, d] vectors of the argmax subset
    ctx_vecs: jnp.ndarray        # [n * L, d]
    subset_index: int
    objectives: np.ndarray       # [num_subsets]
    songs: list | None           # song paths of the argmax subset (n entries)
    startpoints: np.ndarray | None  # slice startpoints (seconds, n entries)


def subset_objectives(act_vecs, ctx_vecs, U, num_concepts: int, n: int):
    """Objective of each disjoint subset of n instances.

    act_vecs/ctx_vecs: [num_subsets * n, L, d] per-instance vectors
    (L = locations per instance). Returns [num_subsets] objectives.
    """
    d = act_vecs.shape[-1]
    a = act_vecs.reshape(-1, n * act_vecs.shape[1], d)
    c = ctx_vecs.reshape(-1, n * ctx_vecs.shape[1], d)

    def one(av, cv):
        return obj_val(av, cv, U, num_concepts)

    return jax.vmap(one)(a, c)


def get_prototypes(
    specs,
    params,
    layer_idx: int,
    U,
    composite,
    data_batch,
    num_concepts: int = 4,
    n: int = 10,
    class_idx: int = 0,
    seed: int = 42,
    songs=None,
    startpoints=None,
    extract_fn=None,
) -> PrototypeResult:
    """Evaluate disjoint subsets of ``n`` instances and return the act/ctx
    vectors — plus the song names and slice startpoints, when provided — of
    the argmax subset (reference prototypes.py:14-130; the names/startpoints
    are what audiogen.py:160-170 sonifies).
    """
    data_batch = jnp.asarray(data_batch)
    N = (data_batch.shape[0] // n) * n
    data_batch = data_batch[:N]

    # inference-mode extraction: all spatial positions per instance
    # (extract_fn: pre-compiled class-traced program, preprocessing.
    # make_extract_fn — share one across the per-class prototype sweep)
    act_vecs, ctx_vecs = preprocess_data(
        specs, params, data_batch, composite, layer_idx, class_idx,
        num_locations=None, extract_fn=extract_fn)
    # [N, L, d]
    objs = subset_objectives(act_vecs, ctx_vecs, jnp.asarray(U), num_concepts, n)
    best = int(np.argmax(np.asarray(objs)))
    sl = slice(best * n, (best + 1) * n)
    proto_a = act_vecs[sl].reshape(-1, act_vecs.shape[-1])
    proto_c = ctx_vecs[sl].reshape(-1, ctx_vecs.shape[-1])
    proto_songs = list(songs[sl]) if songs is not None else None
    proto_starts = (np.asarray(startpoints)[sl]
                    if startpoints is not None else None)
    return PrototypeResult(proto_a, proto_c, best, np.asarray(objs),
                           proto_songs, proto_starts)
