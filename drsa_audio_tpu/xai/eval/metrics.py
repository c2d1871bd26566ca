"""Separability / peakness / Frobenius concept metrics.

Reference cxai/xai/pixelflipping/cpf.py:297-395.
"""

from __future__ import annotations

import numpy as np


def separability(RU: np.ndarray):
    """max_k-then-sum minus sum-then-max gap (cpf.py:348-350).

    RU: [b, K, h, w] subspace heatmaps. Returns (mean, standard error).
    """
    scores = (np.max(RU, axis=1).sum(axis=(-2, -1))
              - np.max(RU.sum(axis=(-2, -1)), axis=1)).squeeze()
    mean = scores.mean()
    return mean, mean / np.sqrt(scores.shape[0])


def peakness(RU: np.ndarray):
    """Sum over concepts of each concept's max (cpf.py:352-354)."""
    scores = np.max(RU, axis=(-2, -1)).sum(axis=1).squeeze()
    mean = scores.mean()
    return mean, mean / np.sqrt(scores.shape[0])


def frobenius_distance(RU: np.ndarray, num_concepts: int) -> float:
    """Mean pairwise Frobenius distance between concept heatmaps, averaged
    over instances and normalized by pair count (cpf.py:374-395)."""
    diff = RU[:, None, :, :, :] - RU[:, :, None, :, :]
    fro = np.sqrt((diff**2).sum(axis=(-2, -1)))
    mask = np.triu(np.ones((num_concepts, num_concepts), bool), k=1)
    total = fro[:, mask].sum(axis=-1)
    pairs = num_concepts * (num_concepts - 1) / 2
    return float(total.mean() / pairs)


def sep_and_peak_table(heatmaps_by_config):
    """Stack [4, n_layers] (sep, sep_err, peak, peak_err) per K
    (cpf.py:297-371). heatmaps_by_config: {k: [RU per layer]}."""
    out = []
    for k, layer_heatmaps in heatmaps_by_config.items():
        sep, seperr, peak, peakerr = [], [], [], []
        for RU in layer_heatmaps:
            s, se = separability(RU)
            p, pe = peakness(RU)
            sep.append(s)
            seperr.append(se)
            peak.append(p)
            peakerr.append(pe)
        out.append(np.stack((sep, seperr, peak, peakerr), axis=0))
    return np.stack(out, axis=0)
