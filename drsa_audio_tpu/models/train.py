"""Training: optax SGD loop with fused on-device augmentation + log-mel.

TPU-native redesign of the reference trainer (cxai/model/train.py:16-207).
Key differences:
  * the host feeds RAW WAVEFORM batches; slicing, waveform augmentation,
    STFT, phase-vocoder time stretch, mel projection, log/clamp, pad/crop and
    SpecAugment masking all run INSIDE the jitted train step, fused with the
    forward/backward pass (the reference does this DSP in DataLoader workers
    on the CPU — gtzan_dataset.py:198-252);
  * optimizer: optax SGD(momentum=0.99, weight_decay=1e-4), matching torch
    SGD conventions (train.py:330);
  * checkpointing via Orbax: params + optimizer state + epoch + PRNG key
    (replaces torch.save of model/opt/RNG states, train.py:175-188);
  * the step can be pjit-sharded over the batch axis (see
    drsa_audio_tpu.parallel).
"""

from __future__ import annotations

import csv
import dataclasses
import functools
import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from drsa_audio_tpu.models.vgg import (
    LayerSpec, forward, train_forward_with_bn,
)
from drsa_audio_tpu.ops.frontend import FrontendConfig, logmel, peak_normalize
from drsa_audio_tpu.ops.stft import stft
from drsa_audio_tpu.ops.mel import mel_scale
from drsa_audio_tpu.ops import augment as aug


def make_optimizer(lr: float, momentum: float = 0.99, weight_decay: float = 1e-4):
    """SGD with momentum + decoupled-into-gradient weight decay, torch
    convention (buf = m*buf + (g + wd*w); p -= lr*buf)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=lr, momentum=momentum),
    )


def _is_bn_param(path_str: str) -> bool:
    return "mean" in path_str or "var" in path_str


def split_trainable(params: dict):
    """BN running stats are state, not trainable parameters."""
    trainable, state = {}, {}
    for name, p in params.items():
        if isinstance(p, dict) and "mean" in p:
            trainable[name] = {k: v for k, v in p.items() if k in ("scale", "bias")}
            state[name] = {k: v for k, v in p.items() if k in ("mean", "var")}
        else:
            trainable[name] = p
    return trainable, state


def merge_params(trainable: dict, state: dict) -> dict:
    merged = {}
    for name, p in trainable.items():
        if name in state:
            merged[name] = {**p, **state[name]}
        else:
            merged[name] = p
    return merged


# --------------------------------------------------------- input pipelines

def toy_augment_and_mel(wav, key, config: FrontendConfig,
                        wav_augment: bool, mel_augment: bool,
                        mask_param: int = 10):
    """One toy waveform [16000] -> [1, 64, 64] log-mel, with the reference's
    augmentation menu (toy_dataset.py:95-177): Gain p=.5, Delay p=.4,
    Reverb p=.3, Noise p=.3; then one time-or-freq mask. No clamp (the toy
    __getitem__ skips it)."""
    wav = peak_normalize(wav)
    if wav_augment:
        ks = jax.random.split(key, 9)
        wav = jnp.where(jax.random.bernoulli(ks[0], 0.5),
                        aug.gain_db(wav, jax.random.uniform(ks[1], (), minval=-12.0, maxval=3.0)),
                        wav)
        wav = jnp.where(jax.random.bernoulli(ks[2], 0.4),
                        aug.delay(wav, jax.random.randint(ks[3], (), 50, 300), config.sample_rate),
                        wav)
        wav = jnp.where(jax.random.bernoulli(ks[4], 0.3),
                        aug.reverb(wav, ks[5], config.sample_rate),
                        wav)
        wav = jnp.where(jax.random.bernoulli(ks[6], 0.3),
                        aug.add_noise(wav, ks[7], jax.random.uniform(ks[8], (), minval=1e-3, maxval=1e-1)),
                        wav)
    mag = jnp.abs(stft(wav, config.n_fft, config.hop_length))
    mel = mel_scale(mag, config.n_mels, config.sample_rate)
    mel = jnp.log10(mel + 1e-7)
    mel = mel[..., : config.width]
    if mel_augment:
        key2 = jax.random.fold_in(key, 1)
        mel = aug.single_mask(mel, key2, mask_param)
    return mel[None]


def gtzan_augment_and_mel(wav, key, config: FrontendConfig,
                          wav_augment: bool, mel_augment: bool,
                          mask_param: int = 40):
    """One GTZAN clip [29 s samples] -> [1, n_mels, n_mels] log-mel with the
    full reference train pipeline (gtzan_dataset.py:198-297): random 3 s
    window, peak norm, {Gain p=.5, PitchShift p=.3, HighLowPass p=.4,
    Noise p=.3}, STFT, TimeStretch U(0.8, 1.2), mel, log10, clamp(-4),
    random-position pad / crop to square, time+freq masks."""
    window = config.sample_rate * config.slice_length
    ks = jax.random.split(key, 16)
    start = jax.random.randint(ks[0], (), 0, wav.shape[-1] - window)
    wav = jax.lax.dynamic_slice_in_dim(wav, start, window, axis=-1)
    wav = peak_normalize(wav)

    if wav_augment:
        wav = jnp.where(jax.random.bernoulli(ks[1], 0.5),
                        aug.gain_db(wav, jax.random.uniform(ks[2], (), minval=-12.0, maxval=3.0)),
                        wav)
        semis = jax.random.uniform(ks[3], (), minval=-12.0, maxval=12.0)
        wav = jnp.where(jax.random.bernoulli(ks[4], 0.3),
                        aug.pitch_shift(wav, semis, config.n_fft, config.hop_length),
                        wav)
        use_low = jax.random.bernoulli(ks[5], 0.5)
        low_f = jax.random.uniform(ks[6], (), minval=1400.0, maxval=4000.0)
        high_f = jax.random.uniform(ks[7], (), minval=200.0, maxval=1400.0)
        filtered = jnp.where(use_low,
                             aug.lowpass(wav, low_f, config.sample_rate),
                             aug.highpass(wav, high_f, config.sample_rate))
        wav = jnp.where(jax.random.bernoulli(ks[8], 0.4), filtered, wav)
        wav = jnp.where(jax.random.bernoulli(ks[9], 0.3),
                        aug.add_noise(wav, ks[10], jax.random.uniform(ks[11], (), minval=1e-3, maxval=1e-1)),
                        wav)

    spec = stft(wav, config.n_fft, config.hop_length)
    if mel_augment:
        rate = jax.random.uniform(ks[12], (), minval=0.8, maxval=1.2)
        out_frames = int(spec.shape[-1] / 0.8) + 2
        spec_c, valid = aug.phase_vocoder(spec, rate, config.hop_length, out_frames)
        mag = jnp.abs(spec_c)
    else:
        mag = jnp.abs(spec)
        valid = mag.shape[-1]
    mel = mel_scale(mag, config.n_mels, config.sample_rate)
    mel = jnp.log10(mel + 1e-7)
    mel = jnp.clip(mel, min=-4.0)
    # zero out invalid (stretched-away) columns before pad/crop: log10(0+1e-7)
    # clamped is -4, so refill masked cols with 0 AFTER adjust (reference pads
    # with zeros)
    cols = jnp.arange(mel.shape[-1])
    mel = mel * (cols < valid).astype(mel.dtype)
    # target width == n_mels for the 3 s square model, 256 for the 6 s model
    mel = aug.adjust_size(mel, config.width, valid, ks[13])
    if mel_augment:
        mel = aug.time_freq_mask(mel, ks[14], mask_param, mask_param)
    return mel[None]


def valid_chunks_to_mels(wavs, config: FrontendConfig):
    """Validation pipeline: all num_chunks windows, no augmentation
    (gtzan_dataset.py:186-196). wavs [b, T>=29 s] -> [b*chunks, 1, n, n]."""
    from drsa_audio_tpu.ops.frontend import get_slices
    def per_clip(w):
        sl = get_slices(w[None], config.slice_length, config.num_chunks,
                        config.sample_rate)
        sl = peak_normalize(sl)
        m = logmel(sl, config)
        return m
    mels = jax.vmap(per_clip)(wavs)  # [b, chunks, 1, n_mels, width]
    return mels.reshape(-1, 1, config.n_mels, config.width)


# ------------------------------------------------------------- train steps

def make_train_step(
    specs: Sequence[LayerSpec],
    optimizer,
    per_example_mel: Callable | None = None,
    has_bn: bool = False,
):
    """Build the jitted train step.

    If per_example_mel is given, inputs are raw waveforms and the mel pipeline
    runs fused (vmapped per example) inside the step; otherwise inputs are
    precomputed mels.
    """

    def loss_fn(trainable, state, mels, labels, dropout_key):
        params = merge_params(trainable, state)
        if has_bn:
            logits, new_params = train_forward_with_bn(specs, params, mels, dropout_key)
            _, new_state = split_trainable(new_params)
        else:
            logits = forward(specs, params, mels, train=True, dropout_key=dropout_key)
            new_state = state
        labels_oh = jax.nn.one_hot(labels, logits.shape[-1])
        loss = optax.softmax_cross_entropy(logits, labels_oh).mean()
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return loss, (acc, new_state)

    @jax.jit
    def step(trainable, state, opt_state, batch, labels, key):
        if per_example_mel is not None:
            kmel, kdrop = jax.random.split(key)
            keys = jax.random.split(kmel, batch.shape[0])
            mels = jax.vmap(per_example_mel)(batch, keys)
        else:
            kdrop = key
            mels = batch
        (loss, (acc, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable, state, mels, labels, kdrop)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, new_state, opt_state, loss, acc

    return step


def make_eval_step(specs: Sequence[LayerSpec]):
    @jax.jit
    def step(params, mels, labels):
        logits = forward(specs, params, mels, train=False)
        labels_oh = jax.nn.one_hot(labels, logits.shape[-1])
        loss = optax.softmax_cross_entropy(logits, labels_oh).mean()
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return loss, acc, jnp.argmax(logits, -1)
    return step


# ------------------------------------------------------------ fit harness

@dataclasses.dataclass
class TrainStats:
    train_loss: list = dataclasses.field(default_factory=list)
    train_acc: list = dataclasses.field(default_factory=list)
    valid_losses: list = dataclasses.field(default_factory=list)
    valid_acc: list = dataclasses.field(default_factory=list)

    def save_csv(self, path: str, from_epoch: int = 0):
        fname = os.path.join(path, f"train_stats_{from_epoch}.csv")
        with open(fname, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["", "train_loss", "train_acc", "valid_losses", "valid_acc"])
            for i in range(len(self.train_loss)):
                w.writerow([i, self.train_loss[i], self.train_acc[i],
                            self.valid_losses[i], self.valid_acc[i]])


def save_checkpoint(path: str, trainable, state, opt_state, epoch: int, key):
    """Orbax checkpoint of params + optimizer + PRNG key (reference
    train.py:175-188 saved torch/numpy/python RNG states; a JAX PRNG key is
    the complete equivalent)."""
    import orbax.checkpoint as ocp
    ckpt = {
        "trainable": trainable, "state": state, "opt_state": opt_state,
        "epoch": np.asarray(epoch), "key": np.asarray(key),
    }
    # pull every leaf to host numpy BEFORE saving: orbax records the saving
    # array's sharding/platform, and a checkpoint written under the axon TPU
    # platform then refuses to restore in a forced-CPU process ("sharding ...
    # should be specified, concrete"). Plain numpy leaves are portable.
    ckpt = jax.tree.map(np.asarray, ckpt)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(os.path.abspath(path), f"ckpt_{epoch}"), ckpt)


def load_checkpoint(path: str, epoch: int | None = None):
    """Restore a training checkpoint; ``epoch=None`` picks the latest
    ``ckpt_N`` in ``path`` (the reference requires the caller to name the
    epoch, train.py:310-315)."""
    import orbax.checkpoint as ocp
    if epoch is None:
        # only exact ckpt_N names: interrupted saves leave orbax temp dirs
        # like 'ckpt_30.orbax-checkpoint-tmp-123' that must not be parsed
        import re
        epochs = [int(m.group(1)) for d in os.listdir(path)
                  if (m := re.fullmatch(r"ckpt_(\d+)", d))]
        if not epochs:
            raise FileNotFoundError(f"no ckpt_* under {path}")
        epoch = max(epochs)
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.join(os.path.abspath(path), f"ckpt_{epoch}"))


def fit(
    specs,
    params,
    train_batches: Callable,   # () -> iterator of (wavs_or_mels, labels)
    valid_batches: Callable,
    num_epochs: int = 100,
    lr: float = 1e-4,
    momentum: float = 0.99,
    weight_decay: float = 1e-4,
    per_example_mel=None,
    has_bn: bool = False,
    seed: int = 42,
    model_path: str | None = None,
    save_step: int = 100,
    from_epoch: int = 0,
    resume_from: str | None = None,
    verbose: bool = False,
):
    """Epoch loop over train/valid phases (reference fit, train.py:16-131).

    resume_from: checkpoint directory to restore params + optimizer state +
    PRNG key from (elastic recovery; the reference's manual-resume flow,
    train.py:310-315). from_epoch is then taken from the checkpoint.
    """
    optimizer = make_optimizer(lr, momentum, weight_decay)
    if resume_from is not None:
        ckpt = load_checkpoint(resume_from, from_epoch)
        trainable, state = ckpt["trainable"], ckpt.get("state") or {}
        # orbax restores nested dicts/lists; refit the leaves onto the
        # optimizer's own state structure
        template = optimizer.init(trainable)
        leaves = [jnp.asarray(x) for x in jax.tree.leaves(ckpt["opt_state"])]
        opt_state = jax.tree.unflatten(jax.tree.structure(template), leaves)
        from_epoch = int(ckpt["epoch"])
    else:
        trainable, state = split_trainable(params)
        opt_state = optimizer.init(trainable)
    train_step = make_train_step(specs, optimizer, per_example_mel, has_bn)
    eval_step = make_eval_step(specs)
    key = jax.random.PRNGKey(seed)
    stats = TrainStats()

    for epoch in range(1, num_epochs + 1):
        # keep loss/acc as DEVICE scalars inside the loop: float() would
        # block on every step (a ~29 ms RPC round-trip on the tunneled TPU),
        # serializing host batch assembly against device compute. JAX async
        # dispatch double-buffers the steps; one sync per epoch.
        losses, accs = [], []
        for batch, labels in train_batches():
            key, sub = jax.random.split(key)
            trainable, state, opt_state, loss, acc = train_step(
                trainable, state, opt_state, jnp.asarray(batch),
                jnp.asarray(labels), sub)
            losses.append(loss)
            accs.append(acc)
        stats.train_loss.append(float(jnp.mean(jnp.stack(losses))))
        stats.train_acc.append(float(jnp.mean(jnp.stack(accs))))

        params_now = merge_params(trainable, state)
        vlosses, vaccs = [], []
        for mels, labels in valid_batches():
            loss, acc, _ = eval_step(params_now, jnp.asarray(mels), jnp.asarray(labels))
            vlosses.append(loss)
            vaccs.append(acc)
        stats.valid_losses.append(float(jnp.mean(jnp.stack(vlosses))))
        stats.valid_acc.append(float(jnp.mean(jnp.stack(vaccs))))

        if verbose:
            print(f"epoch {epoch}: train {stats.train_loss[-1]:.4f}/"
                  f"{stats.train_acc[-1]*100:.1f}% valid {stats.valid_losses[-1]:.4f}/"
                  f"{stats.valid_acc[-1]*100:.1f}%")

        if model_path and (epoch % save_step == 0 or epoch == num_epochs):
            os.makedirs(model_path, exist_ok=True)
            save_checkpoint(model_path, trainable, state, opt_state,
                            epoch + from_epoch, key)
            stats.save_csv(model_path, from_epoch)

    return merge_params(trainable, state), stats
