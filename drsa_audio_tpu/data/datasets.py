"""Dataset list utilities and host-side batch assembly.

Re-implements the reference's data layer (cxai/utils/dataloading.py:208-311,
cxai/model/dataloader/*, cxai/xai/pixelflipping/prep.py:14-72,
cxai/xai/drsa/preprocessing.py:319-370): fold/split file parsing, per-genre
song lists, and batch loaders. Decoding runs on the host (C++ fast path via
drsa_audio_tpu.runtime.native when built, numpy fallback otherwise); the
DSP happens on device (drsa_audio_tpu.ops.frontend).
"""

from __future__ import annotations

import os
import random as pyrandom
from typing import Dict, List

import numpy as np
import jax.numpy as jnp

from drsa_audio_tpu.utils.constants import CLASS_IDX_MAPPER, CLASS_IDX_MAPPER_TOY
from drsa_audio_tpu.ops.frontend import (
    FrontendConfig, chunk_startpoints, load_clip_to_mels,
)
from drsa_audio_tpu.runtime.loader import load_audio


# ------------------------------------------------------- list utilities

def get_songs_of_genre(path: str, genre: str, excluded_folds=None,
                       num_folds: int = 5) -> List[str]:
    """All paths of a genre across folds (reference dataloading.py:241-274).
    Fold files live at {path}/{num_folds}folds/fold_k.txt; audio under
    {path}/genres_original/."""
    songpaths = []
    for fold in range(1, num_folds + 1):
        if excluded_folds is not None and fold in excluded_folds:
            continue
        fname = os.path.join(path, f"{num_folds}folds", f"fold_{fold}.txt")
        with open(fname) as f:
            for line in f:
                line = line.strip()
                if line and line.split("/")[0] == genre:
                    songpaths.append(os.path.join(path, "genres_original", line))
    return songpaths


def get_songlist(path: str, genre: str | None = None, excluded_folds=None,
                 num_folds: int = 5, return_list: bool = True,
                 genres: Dict[str, int] = CLASS_IDX_MAPPER):
    """Songs of one genre or all (reference dataloading.py:208-238)."""
    keys = [genre] if genre else list(genres)
    if return_list:
        out: list = []
        for key in keys:
            out.extend(get_songs_of_genre(path, key, excluded_folds, num_folds))
        return out
    return {key: get_songs_of_genre(path, key, excluded_folds, num_folds)
            for key in keys}


def get_toy_samplelist(path: str, toyclass: str | None = None,
                       splits=None) -> List[str]:
    """Toy split lists (reference dataloading.py:277-299)."""
    splits = ["train", "valid", "test"] if splits is None else [splits]
    samplelist = []
    for split in splits:
        with open(os.path.join(path, f"{split}_split.txt")) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                if toyclass and line.split("/")[0] != toyclass:
                    continue
                samplelist.append(os.path.join(path, line))
    return samplelist


def shuffle_and_truncate(data_batch: np.ndarray, songlist: List[str],
                         N: int, seed: int = 42, startpoints=None):
    """Seeded permutation shuffle + truncate (dataloading.py:179-205).

    If per-chunk ``startpoints`` are given they are permuted alongside and a
    3-tuple is returned."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(data_batch))
    data_batch = data_batch[perm][:N]
    songs = [songlist[i] for i in perm[:N]]
    if startpoints is not None:
        return data_batch, songs, np.asarray(startpoints)[perm[:N]]
    return data_batch, songs


def get_songlist_random(path: str, num_folds: int = 5) -> List[str]:
    """Concatenate all fold lists (reference dataloading.py:302-311)."""
    songs = []
    for fold in range(1, num_folds + 1):
        with open(os.path.join(path, f"fold_{fold}.txt")) as f:
            songs.extend(line.strip() for line in f if line.strip())
    return songs


# --------------------------------------------------------- batch loaders

class Loader:
    """Offline clip -> log-mel loader (reference Loader,
    dataloading.py:13-176). Decode on host, DSP on device."""

    def __init__(self, case: str = "gtzan"):
        self.config = FrontendConfig.for_case(case)

    def load(self, path_to_audio: str, num_chunks: int = 1,
             startpoint: float = 0, return_wav: bool = False):
        wav, sr = load_audio(path_to_audio)
        assert sr == self.config.sample_rate, f"{path_to_audio}: sr {sr}"
        mels = load_clip_to_mels(jnp.asarray(wav), self.config,
                                 startpoint=startpoint, num_chunks=num_chunks)
        if return_wav:
            return wav, mels
        return mels

    def load_batch(self, songlist: List[str], startpoints=None):
        if startpoints is None:
            startpoints = np.zeros(len(songlist))
        out = [np.asarray(self.load(p, startpoint=s))
               for p, s in zip(songlist, startpoints)]
        return np.concatenate(out, axis=0)


def get_songs_drsa(datapath: str, sample_class: str, excluded_folds=None,
                   N=None, num_folds: int = 5, num_chunks: int = 10,
                   case: str = "gtzan", num_songs: int | None = None,
                   seed: int = 42):
    """DRSA extraction batch: 10 chunks per song of one genre, with the song
    path and slice startpoint of every chunk (reference
    preprocessing.py:345-370 keeps these for prototype sonification).

    ``num_songs`` caps the (seeded-shuffled) song list BEFORE loading —
    the reference's budget is 30 songs x 10 chunks per class; ``N`` truncates
    at the chunk level AFTER loading (reference shuffle_and_truncate,
    dataloading.py:179-205).

    ``case`` selects the frontend ('gtzan' 3 s / 'gtzan_6s') — the reference
    uses the bare Loader() default here (preprocessing.py:351), which would
    shape-mismatch its own 6 s model; intended behavior is the model's case.

    Returns (data [M,1,h,w], songs [M], startpoints [M] seconds)."""
    paths = get_songlist(datapath, sample_class, excluded_folds, num_folds)
    if num_songs is not None and num_songs < len(paths):
        local = pyrandom.Random(seed)
        paths = list(paths)
        local.shuffle(paths)
        paths = paths[:num_songs]
    loader = Loader(case)
    cfg = loader.config
    chunk_starts = chunk_startpoints(cfg.slice_length, num_chunks,
                                     cfg.sample_rate)
    batch, songs, starts = [], [], []
    for p in paths:
        mels = np.asarray(loader.load(p, num_chunks=num_chunks))
        batch.append(mels)
        songs.extend([p] * num_chunks)
        starts.extend(chunk_starts.tolist())
    data = np.concatenate(batch, axis=0)
    starts = np.asarray(starts)
    if N:
        data, songs, starts = shuffle_and_truncate(data, songs, N,
                                                   startpoints=starts)
    return data, songs, starts


def get_songs_toy(datapath: str, sample_class: str, split=None, N=None,
                  seed: int = 42):
    """Toy extraction batch (reference preprocessing.py:319-340)."""
    paths = get_toy_samplelist(datapath, sample_class, split)
    if N is not None:
        rng = pyrandom.Random(seed)
        rng.shuffle(paths)
        paths = paths[:N]
    loader = Loader("toy")
    batch = [np.asarray(loader.load(p)) for p in paths]
    return np.concatenate(batch, axis=0), paths


def get_data_main(datapath: str, samples_per_class: int, fold=None,
                  genre=None, num_chunks: int = 1, num_folds: int = 5,
                  seed: int = 42, genres: Dict[str, int] = CLASS_IDX_MAPPER,
                  case: str = "gtzan"):
    """Balanced evaluation batch: samples_per_class clips per genre x
    num_chunks slices, consecutive class order, local seeded RNG
    (reference prep.py:14-72)."""
    exclude = (list(np.delete(np.arange(1, num_folds + 1), fold - 1))
               if fold else None)
    sample_dict = get_songlist(datapath, genre, exclude, num_folds,
                               return_list=False, genres=genres)
    local = pyrandom.Random(seed)
    loader = Loader(case)
    batch, loaded = [], []
    for genre_class, samplelist in sample_dict.items():
        samplelist = list(samplelist)
        local.shuffle(samplelist)
        assert samples_per_class <= len(samplelist)
        for i in range(samples_per_class):
            mels = np.asarray(loader.load(samplelist[i], num_chunks=num_chunks))
            batch.append(mels)
            loaded.append(samplelist[i])
    return np.concatenate(batch, axis=0), loaded


# --------------------------------------------------- training batch feeds

class ToyWaveDataset:
    """Host-side toy training feed: raw waveforms + labels; augmentation and
    mel happen on device (see models.train.toy_augment_and_mel)."""

    def __init__(self, data_path: str, split: str, batch_size: int = 16,
                 seed: int = 42, drop_last: bool = False):
        self.paths = get_toy_samplelist(data_path, splits=split)
        self.labels = np.array(
            [CLASS_IDX_MAPPER_TOY[os.path.basename(os.path.dirname(p))]
             for p in self.paths], np.int32)
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.shuffle = split == "train"
        self.drop_last = drop_last
        self._cache: dict = {}

    def _wave(self, path):
        if path not in self._cache:
            wav, _ = load_audio(path)
            self._cache[path] = wav[0].astype(np.float32)
        return self._cache[path]

    def __iter__(self):
        idx = np.arange(len(self.paths))
        if self.shuffle:
            self.rng.shuffle(idx)
        for i in range(0, len(idx), self.batch_size):
            sel = idx[i:i + self.batch_size]
            if self.drop_last and len(sel) < self.batch_size:
                break
            wavs = np.stack([self._wave(self.paths[j]) for j in sel])
            yield wavs, self.labels[sel]


def get_toydata_loaders(data_path: str, batch_size: int = 16, seed: int = 42):
    """(train, valid, test) toy feeds (reference toy_dataset.py:230-238)."""
    return (ToyWaveDataset(data_path, "train", batch_size, seed),
            ToyWaveDataset(data_path, "valid", batch_size, seed),
            ToyWaveDataset(data_path, "test", batch_size, seed))


def get_data_loaders(data_path: str, batch_size: int = 16,
                     validation_fold: int = 1, seed: int = 42):
    """(train, valid) GTZAN feeds (reference gtzan_dataset.py:351-388); the
    valid feed batches whole clips — slice with
    models.train.valid_chunks_to_mels on device."""
    from drsa_audio_tpu.utils.constants import AUDIO_PARAMS
    vbs = max(batch_size // AUDIO_PARAMS["gtzan"]["num_chunks"], 1)
    return (GtzanWaveDataset(data_path, "train", validation_fold, batch_size,
                             seed=seed),
            GtzanWaveDataset(data_path, "valid", validation_fold, vbs,
                             seed=seed))


class GtzanWaveDataset:
    """Host-side GTZAN training feed: 29 s waveforms + labels
    (slicing/augment on device).

    Decoded waveforms are cached in RAM: the full 1000-clip GTZAN corpus is
    ~1.9 GB as float32, so each WAV is decoded exactly ONCE — the reference's
    only concurrency is DataLoader(num_workers=4) re-decoding per epoch
    (cxai/model/train.py:319-324); here the first epoch populates the cache
    through the native threaded decoder (csrc/audio_runtime.cpp via
    runtime.loader.prefetch_batches) and later epochs are pure memcpy.
    Pass ``cache=False`` to stream from disk instead (corpora that do not
    fit in host RAM)."""

    def __init__(self, data_path: str, split: str, validation_fold: int = 1,
                 batch_size: int = 16, num_folds: int = 5, seed: int = 42,
                 cache: bool = True, num_threads: int = 4,
                 device_cache: bool = False):
        mapper = CLASS_IDX_MAPPER
        self.paths, self.labels = [], []
        for genre in mapper:
            if split == "train":
                excluded = [validation_fold]
            else:
                excluded = [f for f in range(1, num_folds + 1)
                            if f != validation_fold]
            for p in get_songs_of_genre(data_path, genre, excluded, num_folds):
                self.paths.append(p)
                self.labels.append(mapper[genre])
        self.labels = np.array(self.labels, np.int32)
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.shuffle = split == "train"
        self.min_len = 29 * 16000
        self.num_threads = num_threads
        self._cache: np.ndarray | None = None
        self._use_cache = cache or device_cache
        # device_cache puts the decoded corpus in device HBM ONCE (~1.9 GB
        # f32 for the 1000-clip GTZAN corpus vs 16 GB HBM) and gathers each
        # batch on device: the per-step host->device waveform transfer
        # (59 MB/batch over the tunneled link — the measured round-3 epoch
        # bottleneck after decode caching) disappears entirely.
        self._use_device = device_cache
        self._dcache = None

    def _fix_len(self, w: np.ndarray) -> np.ndarray:
        w = w.astype(np.float32, copy=False)
        if len(w) < self.min_len:
            w = np.pad(w, (0, self.min_len - len(w)))
        return w[: self.min_len]

    def preload(self):
        """Decode the whole corpus once (threaded) into one [N, 29 s] array."""
        if not self._use_cache or self._cache is not None:
            return self
        from drsa_audio_tpu.runtime.loader import prefetch_batches
        self._cache = np.empty((len(self.paths), self.min_len), np.float32)
        i = 0
        for batch in prefetch_batches(self.paths, 64, self.num_threads):
            for wav in batch:
                self._cache[i] = self._fix_len(np.asarray(wav)[0])
                i += 1
        assert i == len(self.paths)
        return self

    def _wave(self, path):
        wav, _ = load_audio(path)
        return self._fix_len(wav[0])

    def __iter__(self):
        if self._use_cache:
            self.preload()
        if self._use_device and self._dcache is None:
            self._dcache = jnp.asarray(self._cache)
        idx = np.arange(len(self.paths))
        if self.shuffle:
            self.rng.shuffle(idx)
        for i in range(0, len(idx), self.batch_size):
            sel = idx[i:i + self.batch_size]
            if self._dcache is not None:
                # on-device gather: only the index vector crosses the link
                wavs = jnp.take(self._dcache, jnp.asarray(sel), axis=0)
            elif self._cache is not None:
                wavs = self._cache[sel]
            else:
                wavs = np.stack([self._wave(self.paths[j]) for j in sel])
            yield wavs, self.labels[sel]
