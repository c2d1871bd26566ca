"""Coverage for small utility modules: profiling, evaluation stats IO,
experimental layers, utilities."""

import os

import numpy as np
import jax.numpy as jnp
import torch

from drsa_audio_tpu.utils.profiling import PhaseTimer
from drsa_audio_tpu.utils.utilities import round_down, HiddenPrints
from drsa_audio_tpu.utils.evaluation import (
    get_cm, class_accs, get_train_stats, get_best_run, get_run_stats,
    save_drsa_run, load_projection_matrix, get_acc,
)
from drsa_audio_tpu.models.experimental import differential_logits, reverse_logsumexp


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    s = t.summary()
    assert "a" in s and "b" in s
    assert t.counts["a"] == 2


def test_round_down():
    assert round_down(3.79, 1) == 3.7
    assert round_down((29 - 3) / 7, 1) == 3.7


def test_hidden_prints(capsys):
    with HiddenPrints():
        print("should not appear")
    print("visible")
    out = capsys.readouterr().out
    assert "should not appear" not in out
    assert "visible" in out


def test_confusion_matrix_and_class_accs():
    ytrue = np.array([0, 0, 1, 1])
    ypred = np.array([0, 1, 1, 1])
    cm = get_cm(ytrue, ypred, num_classes=2)
    np.testing.assert_allclose(cm[0], [50, 50])
    np.testing.assert_allclose(cm[1], [0, 100])
    accs = class_accs(cm, {"a": 0, "b": 1})
    assert accs["a"] == 50.0 and accs["b"] == 100.0


def test_drsa_run_io(tmp_path):
    U = np.linalg.qr(np.random.default_rng(0).standard_normal((8, 8)))[0]
    for run, final in ((1, 0.5), (2, 0.9), (3, 0.7)):
        objs = np.linspace(0.1, final, 10)
        save_drsa_run(str(tmp_path / f"run{run}"), U * final, objs)
    best_run, best_loss, best_path, losses = get_best_run(str(tmp_path))
    assert best_run == 2
    np.testing.assert_allclose(best_loss, 0.9)
    U_best = load_projection_matrix(str(tmp_path))
    np.testing.assert_allclose(U_best, U * 0.9, rtol=1e-6)
    final, traj = get_run_stats(str(tmp_path / "run2" / "train_stats.csv"))
    assert len(traj) == 10


def test_train_stats_concat(tmp_path):
    for i, fname in enumerate(["train_stats_0.csv", "train_stats_5.csv"]):
        with open(tmp_path / fname, "w") as f:
            f.write(",train_loss,train_acc,valid_losses,valid_acc\n")
            for j in range(3):
                f.write(f"{j},{1.0 - i - j * 0.1},{0.5},{1.2},{0.4}\n")
    stats = get_train_stats(str(tmp_path))
    assert len(stats["train_loss"]) == 6


def test_get_acc_chunked():
    from drsa_audio_tpu.models.vgg import build_layer_specs, init_params, toy_config
    import jax
    specs = build_layer_specs(toy_config())
    params = init_params(specs, jax.random.PRNGKey(0))
    mels = np.random.default_rng(0).standard_normal((2, 3, 1, 64, 64)).astype(np.float32)
    labels = np.array([0, 1], np.int32)
    acc, ytrue, ypred = get_acc(specs, params, [(mels, labels)], is_toy=False)
    assert len(ytrue) == 6  # chunks flattened, labels repeated
    assert 0.0 <= acc <= 100.0


def test_experimental_layers(rng):
    x = rng.standard_normal((3, 5)).astype(np.float32)
    w = rng.standard_normal((4, 5)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    out = np.asarray(differential_logits(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    logits = x @ w.T + b
    ref = logits[:, :, None] - logits[:, None, :]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    r = np.asarray(reverse_logsumexp(jnp.asarray(ref)))
    manual = -np.log(np.sum(np.exp(-ref) * (1 - np.eye(4))[None], axis=-1))
    np.testing.assert_allclose(r, manual, rtol=1e-5)
