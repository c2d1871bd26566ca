#!/usr/bin/env python
"""Train a classifier (reference cxai/model/train.py:211-374 without the
hard-coded --conf grids: everything comes from an ExperimentConfig JSON)."""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", help="ExperimentConfig JSON; defaults by --case")
    ap.add_argument("--case", choices=["gtzan", "gtzan_6s", "toy"], default="toy")
    ap.add_argument("--data", help="data root (overrides config)")
    ap.add_argument("--out", help="model output dir (overrides config)")
    ap.add_argument("--epochs", type=int)
    ap.add_argument("--lr", type=float)
    ap.add_argument("--batch-size", type=int)
    ap.add_argument("--resume-epoch", type=int,
                    help="resume from checkpoint at this epoch in --out")
    args = ap.parse_args()

    import jax
    from drsa_audio_tpu.utils.config import ExperimentConfig
    from drsa_audio_tpu.models.vgg import build_layer_specs, init_params
    from drsa_audio_tpu.models.train import (
        fit, toy_augment_and_mel, gtzan_augment_and_mel, valid_chunks_to_mels,
    )
    from drsa_audio_tpu.ops.frontend import FrontendConfig
    from drsa_audio_tpu.data.datasets import ToyWaveDataset, GtzanWaveDataset

    if args.config:
        cfg = ExperimentConfig.load(args.config)
    elif args.case == "toy":
        cfg = ExperimentConfig.toy_default()
    elif args.case == "gtzan_6s":
        cfg = ExperimentConfig.gtzan_6s_default()
    else:
        cfg = ExperimentConfig()
    if args.data:
        cfg.data_path = args.data
    if args.out:
        cfg.model_path = args.out
    if args.epochs:
        cfg.train.num_epochs = args.epochs
    if args.lr:
        cfg.train.learning_rate = args.lr
    if args.batch_size:
        cfg.train.batch_size = args.batch_size

    fe = FrontendConfig.for_case(cfg.case)
    specs = build_layer_specs(cfg.vgg_config())
    params = init_params(specs, jax.random.PRNGKey(cfg.train.seed))

    if cfg.case == "toy":
        train_ds = ToyWaveDataset(cfg.data_path, "train", cfg.train.batch_size)
        valid_ds = ToyWaveDataset(cfg.data_path, "valid", cfg.train.batch_size)
        mel_fn = lambda w, k: toy_augment_and_mel(w, k, fe, True, True)

        def valid_batches():
            import jax.numpy as jnp
            for wavs, labels in valid_ds:
                mels = jax.vmap(lambda w: toy_augment_and_mel(
                    w, jax.random.PRNGKey(0), fe, False, False))(jnp.asarray(wavs))
                yield np.asarray(mels), labels
    else:
        # device_cache: the decoded corpus lives in device HBM; each batch
        # is an on-device gather (no per-step waveform transfer)
        train_ds = GtzanWaveDataset(cfg.data_path, "train",
                                    cfg.train.validation_fold,
                                    cfg.train.batch_size, device_cache=True)
        vbs = max(cfg.train.batch_size // fe.num_chunks, 1)
        valid_ds = GtzanWaveDataset(cfg.data_path, "valid",
                                    cfg.train.validation_fold, vbs,
                                    device_cache=True)
        mel_fn = lambda w, k: gtzan_augment_and_mel(w, k, fe, True, True)

        def valid_batches():
            import jax.numpy as jnp
            for wavs, labels in valid_ds:
                # keep mels on device: a host round-trip per valid batch
                # costs a tunnel RPC each way
                mels = valid_chunks_to_mels(jnp.asarray(wavs), fe)
                yield mels, np.repeat(labels, fe.num_chunks)

    params, stats = fit(
        specs, params,
        train_batches=lambda: iter(train_ds),
        valid_batches=valid_batches,
        num_epochs=cfg.train.num_epochs,
        lr=cfg.train.learning_rate,
        momentum=cfg.train.momentum,
        weight_decay=cfg.train.weight_decay,
        per_example_mel=mel_fn,
        has_bn=cfg.model.conv_bn or cfg.model.dense_bn,
        seed=cfg.train.seed,
        model_path=cfg.model_path,
        save_step=cfg.train.save_step,
        resume_from=cfg.model_path if args.resume_epoch else None,
        from_epoch=args.resume_epoch or 0,
        verbose=True,
    )
    print("final valid acc:", stats.valid_acc[-1])


if __name__ == "__main__":
    main()
