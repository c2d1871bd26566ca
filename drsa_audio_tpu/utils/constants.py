"""Case constants and LRP rule name-maps.

TPU-native re-implementation of the reference constants module
(see reference cxai/utils/constants.py:3-51). Rule maps here are plain data —
(layer-name pattern, rule spec) pairs — consumed by the functional LRP engine
in :mod:`drsa_audio_tpu.xai.lrp` instead of zennit hook objects.
"""

from __future__ import annotations

CLASS_IDX_MAPPER = {
    "pop": 0,
    "metal": 1,
    "disco": 2,
    "blues": 3,
    "reggae": 4,
    "classical": 5,
    "rock": 6,
    "hiphop": 7,
    "country": 8,
    "jazz": 9,
}

CLASS_IDX_MAPPER_TOY = {"class1": 0, "class2": 1}

# Per-case DSP parameters (reference constants.py:7-24).
AUDIO_PARAMS = {
    "gtzan": {
        "sample_rate": 16000,
        "slice_length": 3,
        "num_chunks": 8,
        "n_fft": 800,
        "hop_length": 360,
        "n_mels": 128,
        "mel_width": 128,
    },
    "toy": {
        "sample_rate": 16000,
        "slice_length": 1,   # toy clips are exactly one second; no slicing
        "num_chunks": 1,
        "n_fft": 480,
        "hop_length": 240,
        "n_mels": 64,
        "mel_width": 64,
    },
    # 6 s GTZAN case for the block_depth-2 BN model on 128x256 mels
    # (reference getdrsadata.py:72-73, train.py:271). The reference has no
    # AUDIO_PARAMS entry for it — its Loader() default (slice 3, width 128)
    # would shape-mismatch the (128,256) model; this entry is the intended
    # behavior (see PARITY.md).
    "gtzan_6s": {
        "sample_rate": 16000,
        "slice_length": 6,
        "num_chunks": 4,
        "n_fft": 800,
        "hop_length": 360,
        "n_mels": 128,
        "mel_width": 256,
    },
}

# LRP rule name-maps. Each entry: (layer_name, (rule_name, kwargs)).
# Mirrors reference constants.py:27-51 (zennit rule objects -> plain specs).
LRP_NAME_MAP_GTZAN = [
    ("features.0", ("wsquare", {"stabilizer": 1e-7})),
    ("features.3", ("gamma", {"gamma": 0.4, "stabilizer": 1e-7})),
    ("features.6", ("gamma", {"gamma": 0.4, "stabilizer": 1e-7})),
    ("features.9", ("gamma", {"gamma": 0.4 / 2, "stabilizer": 1e-7})),
    ("features.12", ("gamma", {"gamma": 0.4 / 4, "stabilizer": 1e-7})),
    ("classifier.0", ("epsilon", {"epsilon": 1e-7})),
    ("classifier.3", ("epsilon", {"epsilon": 1e-7})),
    ("classifier.6", ("epsilon", {"epsilon": 1e-7})),
]

LRP_NAME_MAP_TOY = [
    ("features.0", ("flat", {"stabilizer": 1e-7})),
    ("features.3", ("gamma", {"gamma": 0.8, "stabilizer": 1e-7})),
    ("features.6", ("gamma", {"gamma": 0.8, "stabilizer": 1e-7})),
    ("features.9", ("gamma", {"gamma": 0.8, "stabilizer": 1e-7})),
    ("features.12", ("gamma", {"gamma": 0.8, "stabilizer": 1e-7})),
    ("classifier.0", ("epsilon", {"epsilon": 1e-7})),
    ("classifier.2", ("epsilon", {"epsilon": 1e-7})),
    ("classifier.4", ("epsilon", {"epsilon": 1e-7})),
]

# 6 s GTZAN model (block_depth=2, BN): 13-entry map with decaying gammas
# (reference getdrsadata.py:87-108). Apply after fold_batchnorm.
LRP_NAME_MAP_GTZAN_6S = [
    ("features.0", ("wsquare", {"stabilizer": 1e-7})),
    ("features.3", ("gamma", {"gamma": 0.3, "stabilizer": 1e-7})),
    ("features.7", ("gamma", {"gamma": 0.3, "stabilizer": 1e-7})),
    ("features.10", ("gamma", {"gamma": 0.3, "stabilizer": 1e-7})),
    ("features.14", ("gamma", {"gamma": 0.3 / 2, "stabilizer": 1e-7})),
    ("features.17", ("gamma", {"gamma": 0.3 / 2, "stabilizer": 1e-7})),
    ("features.21", ("gamma", {"gamma": 0.3 / 2, "stabilizer": 1e-7})),
    ("features.24", ("gamma", {"gamma": 0.3 / 2, "stabilizer": 1e-7})),
    ("features.28", ("gamma", {"gamma": 0.3 / 4, "stabilizer": 1e-7})),
    ("features.31", ("gamma", {"gamma": 0.3 / 4, "stabilizer": 1e-7})),
    ("classifier.0", ("epsilon", {"epsilon": 1e-7})),
    ("classifier.4", ("epsilon", {"epsilon": 1e-7})),
    ("classifier.8", ("epsilon", {"epsilon": 1e-7})),
]

def rescale_gamma(name_map, gamma: float):
    """Rescale every gamma rule in a name map to a new base value,
    preserving the per-depth decay pattern (base = the map's maximum
    gamma). Used for composite-sensitivity legs of the flipping eval —
    e.g. LRP_NAME_MAP_GTZAN_6S (base 0.3, reference getdrsadata.py:82)
    rescaled to the 0.4 the reference's 3 s pipeline uses (cpf.py:420)."""
    base = max(kw["gamma"] for _, (rule, kw) in name_map if rule == "gamma")
    return [
        (n, (rule, {**kw, "gamma": kw["gamma"] * gamma / base}
             if rule == "gamma" else kw))
        for n, (rule, kw) in name_map
    ]


# DRSA extraction layers for the 6 s model: the deep ReLU outputs
# (reference getdrsadata.py:119).
DRSA_LAYERS_GTZAN_6S = [19, 26, 33]

# Subspace dimensionality of the standard 5-block nets at insertion layers
# [1, 4, 7, 10, 13] (reference cpf.py:260,312).
SUBSPACE_DIMS_GTZAN = [32, 32, 64, 64, 128]
SUBSPACE_DIMS_TOY = [8, 8, 16, 16, 16]
