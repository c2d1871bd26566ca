"""Model evaluation utilities: test accuracy, confusion matrix, run stats.

Reference cxai/utils/evaluation.py.
"""

from __future__ import annotations

import csv
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from drsa_audio_tpu.models.vgg import forward
from drsa_audio_tpu.utils.constants import CLASS_IDX_MAPPER


def get_acc(specs, params, test_batches, is_toy: bool = False):
    """Accuracy over a test iterator yielding (mels_or_chunked, labels)
    (reference evaluation.py:144-180). GTZAN items arrive chunked
    [b, chunks, c, f, t] with labels repeated per chunk."""
    fwd = jax.jit(lambda x: forward(specs, params, x))
    ytrue, ypred = [], []
    for xb, yb in test_batches:
        xb = np.asarray(xb)
        yb = np.asarray(yb)
        if not is_toy and xb.ndim == 5:
            b, chunks = xb.shape[:2]
            xb = xb.reshape(-1, *xb.shape[2:])
            yb = np.repeat(yb, chunks)
        logits = np.asarray(fwd(jnp.asarray(xb)))
        pred = logits.argmax(-1)
        ytrue.extend(yb.tolist())
        ypred.extend(pred.tolist())
    ytrue, ypred = np.asarray(ytrue), np.asarray(ypred)
    acc = float((ytrue == ypred).mean() * 100)
    return acc, ytrue, ypred


def get_cm(ytrue, ypred, num_classes: int | None = None) -> np.ndarray:
    """Row-normalized (percent) confusion matrix (evaluation.py:14-36)."""
    n = num_classes or (int(max(ytrue.max(), ypred.max())) + 1)
    cm = np.zeros((n, n), np.float64)
    for t, p in zip(ytrue, ypred):
        cm[t, p] += 1
    return cm / np.maximum(cm.sum(axis=1, keepdims=True), 1) * 100


def class_accs(cm: np.ndarray,
               class_mapper: Dict[str, int] = CLASS_IDX_MAPPER) -> Dict[str, float]:
    """Per-class accuracies from the confusion matrix (evaluation.py:67-85)."""
    accs = np.diag(cm) / np.maximum(cm.sum(axis=1), 1e-12) * 100
    return {name: round(float(accs[i]), 2)
            for i, name in enumerate(class_mapper) if i < len(accs)}


def get_train_stats(path: str):
    """Concatenate train-stat CSVs, handling interrupted-run resumes
    (evaluation.py:88-105). Returns dict of lists."""
    if path.endswith(".csv"):
        files = [path]
    else:
        files = sorted(os.path.join(path, f) for f in os.listdir(path)
                       if f.endswith(".csv"))
    cols = {"train_loss": [], "train_acc": [], "valid_losses": [], "valid_acc": []}
    for fname in files:
        with open(fname) as f:
            for row in csv.DictReader(f):
                for k in cols:
                    cols[k].append(float(row[k]))
    return cols


def get_run_stats(path: str):
    """Final objective + trajectory from a DRSA train_stats.csv
    (evaluation.py:129-141)."""
    losses = []
    with open(path) as f:
        for row in csv.DictReader(f):
            losses.append(float(row["loss"]))
    return losses[-1], losses


def get_best_run(path: str):
    """Best of N DRSA runs by final objective (evaluation.py:108-127).

    Expects run{i}/train_stats.csv under ``path``. Returns
    (best_run, best_loss, path_to_best_run, losses_of_best)."""
    best_loss, best_run, best_path, best_losses = 0.0, None, None, None
    for d in sorted(os.listdir(path)):
        if d.startswith("."):
            continue
        stats = os.path.join(path, d, "train_stats.csv")
        if not os.path.exists(stats):
            continue
        loss, losses = get_run_stats(stats)
        if loss > best_loss:
            best_loss, best_run = loss, int(d[-1])
            best_path, best_losses = os.path.join(path, d), losses
    return best_run, best_loss, best_path, best_losses


def save_drsa_run(path: str, U: np.ndarray, objectives: np.ndarray):
    """Persist one DRSA run: U (npy) + objective trajectory (csv)
    (reference drsa.py:157-168 pickles; npy+csv here)."""
    os.makedirs(path, exist_ok=True)
    np.save(os.path.join(path, "projection_matrix.npy"), np.asarray(U))
    with open(os.path.join(path, "train_stats.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["", "loss"])
        for i, v in enumerate(np.asarray(objectives)):
            w.writerow([i, float(v)])


def load_projection_matrix(path: str):
    """Load the best run's U under ``path`` (cpf.py:184-189)."""
    _, _, best_path, _ = get_best_run(path)
    return np.load(os.path.join(best_path, "projection_matrix.npy"))
