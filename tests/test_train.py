"""Training-harness tests: GTZAN fused augmentation pipeline, fit() loop,
BN training, Orbax checkpointing, optimizer parity with torch SGD."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from drsa_audio_tpu.models.vgg import (
    VGGConfig, build_layer_specs, init_params, forward,
)
from drsa_audio_tpu.models.train import (
    make_optimizer, make_train_step, make_eval_step, split_trainable,
    merge_params, gtzan_augment_and_mel, toy_augment_and_mel,
    valid_chunks_to_mels, save_checkpoint, load_checkpoint, fit, TrainStats,
)
from drsa_audio_tpu.ops.frontend import FrontendConfig


def small_cfg():
    return VGGConfig(n_filters=(4, 8), pool_kernels=((4, 4), (2, 2)),
                     n_dense=16, n_classes=2, dropout=0.1, block_depth=1,
                     dense_depth=1, input_size=(64, 64), conv_bn=True,
                     dense_bn=True)


def test_gtzan_augment_pipeline_shapes(rng):
    """The full train-time augmentation chain (random slice, gain, pitch
    shift, filters, noise, phase-vocoder stretch, pad/crop, masks) produces
    the square log-mel."""
    fe = FrontendConfig.for_case("gtzan")
    wav = jnp.asarray(rng.standard_normal(29 * 16000).astype(np.float32))
    out = gtzan_augment_and_mel(wav, jax.random.PRNGKey(0), fe, True, True)
    assert out.shape == (1, 128, 128)
    assert bool(jnp.all(jnp.isfinite(out)))
    # several keys -> different augmentations
    out2 = gtzan_augment_and_mel(wav, jax.random.PRNGKey(1), fe, True, True)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    # with augmentation off, the same key (same random 3 s window — the
    # random slice is train-split semantics, gtzan_dataset.py:182-185) is
    # deterministic
    a = gtzan_augment_and_mel(wav, jax.random.PRNGKey(2), fe, False, False)
    b = gtzan_augment_and_mel(wav, jax.random.PRNGKey(2), fe, False, False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_valid_chunks_pipeline(rng):
    fe = FrontendConfig.for_case("gtzan")
    wavs = jnp.asarray(rng.standard_normal((2, 29 * 16000)).astype(np.float32))
    mels = valid_chunks_to_mels(wavs, fe)
    assert mels.shape == (16, 1, 128, 128)


def test_bn_train_step_updates_running_stats(rng):
    cfg = small_cfg()
    specs = build_layer_specs(cfg)
    params = init_params(specs, jax.random.PRNGKey(0))
    opt = make_optimizer(1e-3)
    trainable, state = split_trainable(params)
    opt_state = opt.init(trainable)
    step = make_train_step(specs, opt, has_bn=True)
    mels = jnp.asarray(rng.standard_normal((8, 1, 64, 64)).astype(np.float32))
    labels = jnp.asarray((np.arange(8) % 2).astype(np.int32))
    bn_name = next(s.name for s in specs if s.kind == "batchnorm")
    before = np.asarray(state[bn_name]["mean"])
    trainable, state, opt_state, loss, acc = step(
        trainable, state, opt_state, mels, labels, jax.random.PRNGKey(1))
    after = np.asarray(state[bn_name]["mean"])
    assert not np.allclose(before, after)
    assert np.isfinite(float(loss))


def test_sgd_matches_torch(rng):
    """One optimizer step == torch.optim.SGD(momentum, weight_decay)."""
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    g = rng.standard_normal((4, 3)).astype(np.float32)
    lr, mom, wd = 0.1, 0.99, 1e-2

    opt = make_optimizer(lr, mom, wd)
    params = {"w": jnp.asarray(w0)}
    st = opt.init(params)
    for _ in range(3):
        updates, st = opt.update({"w": jnp.asarray(g)}, st, params)
        import optax
        params = optax.apply_updates(params, updates)

    wt = torch.tensor(w0.copy(), requires_grad=True)
    topt = torch.optim.SGD([wt], lr=lr, momentum=mom, weight_decay=wd)
    for _ in range(3):
        topt.zero_grad()
        wt.grad = torch.tensor(g)
        topt.step()
    np.testing.assert_allclose(np.asarray(params["w"]), wt.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_fit_and_checkpoint_roundtrip(tmp_path, rng):
    cfg = small_cfg()
    specs = build_layer_specs(cfg)
    params = init_params(specs, jax.random.PRNGKey(0))
    mels = rng.standard_normal((16, 1, 64, 64)).astype(np.float32)
    labels = (np.arange(16) % 2).astype(np.int32)

    def batches():
        yield mels[:8], labels[:8]
        yield mels[8:], labels[8:]

    out, stats = fit(specs, params,
                     train_batches=batches, valid_batches=batches,
                     num_epochs=2, lr=1e-3, has_bn=True,
                     model_path=str(tmp_path), save_step=2)
    assert len(stats.train_loss) == 2
    stats.save_csv(str(tmp_path))
    assert os.path.exists(tmp_path / "train_stats_0.csv")

    ckpt = load_checkpoint(str(tmp_path), 2)
    assert int(ckpt["epoch"]) == 2
    restored = merge_params(ckpt["trainable"], ckpt["state"])
    x = jnp.asarray(mels[:2])
    np.testing.assert_allclose(np.asarray(forward(specs, out, x)),
                               np.asarray(forward(specs, restored, x)),
                               rtol=1e-5)


def test_load_checkpoint_ignores_orbax_tmp_dirs(tmp_path, rng):
    """A leftover temp dir from an interrupted orbax save must not break the
    latest-checkpoint scan (ADVICE r2), and saved leaves are plain numpy so
    a checkpoint written under one platform restores under another."""
    cfg = small_cfg()
    specs = build_layer_specs(cfg)
    params = init_params(specs, jax.random.PRNGKey(0))
    mels = rng.standard_normal((8, 1, 64, 64)).astype(np.float32)
    labels = (np.arange(8) % 2).astype(np.int32)

    def batches():
        yield mels, labels

    fit(specs, params, batches, batches, num_epochs=2, lr=1e-3,
        has_bn=True, model_path=str(tmp_path), save_step=2)
    # simulate an interrupted save
    os.makedirs(tmp_path / "ckpt_30.orbax-checkpoint-tmp-123")
    ckpt = load_checkpoint(str(tmp_path))   # epoch=None -> latest valid
    assert int(ckpt["epoch"]) == 2
    # portability: every leaf on disk was written as host numpy (no device
    # sharding metadata), so the restored tree is numpy too
    for leaf in jax.tree.leaves(ckpt):
        assert isinstance(leaf, np.ndarray), type(leaf)


def test_fit_resume(tmp_path, rng):
    """Resume restores params + optimizer state and continues training."""
    cfg = small_cfg()
    specs = build_layer_specs(cfg)
    params = init_params(specs, jax.random.PRNGKey(0))
    mels = rng.standard_normal((8, 1, 64, 64)).astype(np.float32)
    labels = (np.arange(8) % 2).astype(np.int32)

    def batches():
        yield mels, labels

    out1, _ = fit(specs, params, batches, batches, num_epochs=2, lr=1e-3,
                  has_bn=True, model_path=str(tmp_path), save_step=2)
    out2, _ = fit(specs, params, batches, batches, num_epochs=1, lr=1e-3,
                  has_bn=True, resume_from=str(tmp_path), from_epoch=2)
    # resumed run trained one more epoch on top of the checkpoint
    x = jnp.asarray(mels[:2])
    a = np.asarray(forward(specs, out1, x))
    b = np.asarray(forward(specs, out2, x))
    assert not np.allclose(a, b)


def test_gtzan_train_smoke(tmp_path, rng):
    """One real training epoch over the synthetic GTZAN-like corpus using
    the wave dataset + fused gtzan augmentation pipeline."""
    import os
    from drsa_audio_tpu.data.datasets import GtzanWaveDataset
    from drsa_audio_tpu.runtime.wavio import write_wav

    root = tmp_path / "corpus"
    genres = ["pop", "metal"]
    folds = {k: [] for k in range(1, 6)}
    for g in genres:
        os.makedirs(root / "genres_original" / g)
        for i in range(3):
            rel = f"{g}/{g}.{i:05d}.wav"
            wav = np.clip(rng.standard_normal((1, 30 * 16000)) * 0.2, -1, 1).astype(np.float32)
            write_wav(str(root / "genres_original" / rel), wav, 16000)
            folds[i % 5 + 1].append(rel)
    os.makedirs(root / "5folds")
    for k, items in folds.items():
        with open(root / "5folds" / f"fold_{k}.txt", "w") as f:
            f.write("\n".join(items) + "\n")

    fe = FrontendConfig.for_case("gtzan")
    ds = GtzanWaveDataset(str(root), "train", validation_fold=1, batch_size=2)
    cfg = VGGConfig(n_filters=(4, 8), pool_kernels=((4, 4), (4, 4)),
                    n_dense=16, n_classes=2, dropout=0.1, block_depth=1,
                    dense_depth=1, input_size=(128, 128), conv_bn=True,
                    dense_bn=False)
    specs = build_layer_specs(cfg)
    params = init_params(specs, jax.random.PRNGKey(0))
    opt = make_optimizer(1e-3)
    trainable, state = split_trainable(params)
    opt_state = opt.init(trainable)
    step = make_train_step(
        specs, opt,
        per_example_mel=lambda w, k: gtzan_augment_and_mel(w, k, fe, True, True),
        has_bn=True)
    key = jax.random.PRNGKey(0)
    n_batches = 0
    for wavs, labels in ds:
        key, sub = jax.random.split(key)
        trainable, state, opt_state, loss, acc = step(
            trainable, state, opt_state, jnp.asarray(wavs),
            jnp.asarray(labels), sub)
        assert np.isfinite(float(loss))
        n_batches += 1
    assert n_batches >= 2
