"""Dataset list utilities and batch loaders over a synthetic on-disk corpus."""

import os

import numpy as np
import pytest

from drsa_audio_tpu.data.datasets import (
    get_songs_of_genre, get_songlist, get_toy_samplelist,
    shuffle_and_truncate, Loader, get_data_main, ToyWaveDataset,
    GtzanWaveDataset,
)
from drsa_audio_tpu.data.toydata import generate_dataset
from drsa_audio_tpu.runtime.wavio import write_wav
from drsa_audio_tpu.utils.config import ExperimentConfig


@pytest.fixture(scope="module")
def gtzan_corpus(tmp_path_factory):
    """Tiny synthetic GTZAN-like corpus: 2 genres x 4 clips x 30 s, 5 folds."""
    root = tmp_path_factory.mktemp("gtzan")
    rng = np.random.default_rng(0)
    genres = ["pop", "metal"]
    folds = {k: [] for k in range(1, 6)}
    for g in genres:
        os.makedirs(root / "genres_original" / g)
        for i in range(4):
            rel = f"{g}/{g}.{i:05d}.wav"
            wav = np.clip(rng.standard_normal((1, 30 * 16000)) * 0.2, -1, 1).astype(np.float32)
            write_wav(str(root / "genres_original" / rel), wav, 16000)
            folds[i % 5 + 1].append(rel)
    os.makedirs(root / "5folds")
    for k, items in folds.items():
        with open(root / "5folds" / f"fold_{k}.txt", "w") as f:
            f.write("\n".join(items) + "\n")
    return str(root)


@pytest.fixture(scope="module")
def toy_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("toy")
    generate_dataset(str(root), datapoints_per_class=6, seed=0)
    return str(root)


def test_get_songs_of_genre_excludes_folds(gtzan_corpus):
    all_pop = get_songs_of_genre(gtzan_corpus, "pop", None, 5)
    assert len(all_pop) == 4
    sub = get_songs_of_genre(gtzan_corpus, "pop", [1], 5)
    assert len(sub) < 4
    assert all("pop" in p for p in sub)


def test_get_songlist_dict(gtzan_corpus):
    d = get_songlist(gtzan_corpus, return_list=False,
                     genres={"pop": 0, "metal": 1})
    assert set(d) == {"pop", "metal"}
    assert all(os.path.exists(p) for p in d["pop"])


def test_gtzan_wave_dataset_cache_matches_streaming(gtzan_corpus):
    """The in-RAM decode-once cache yields the exact batches the streaming
    (cache=False) path yields, and decodes each WAV only once."""
    ds = GtzanWaveDataset(gtzan_corpus, "train", validation_fold=1,
                          batch_size=3)
    batches_cached = list(ds)
    assert ds._cache is not None
    assert ds._cache.shape == (len(ds.paths), 29 * 16000)
    ds_stream = GtzanWaveDataset(gtzan_corpus, "train", validation_fold=1,
                                 batch_size=3, cache=False)
    batches_stream = list(ds_stream)
    assert len(batches_cached) == len(batches_stream)
    for (w1, l1), (w2, l2) in zip(batches_cached, batches_stream):
        np.testing.assert_array_equal(w1, w2)
        np.testing.assert_array_equal(l1, l2)
    # second epoch reuses the cache (same object) and reshuffles
    again = list(ds)
    assert len(again) == len(batches_cached)


def test_toy_samplelist_and_dataset(toy_corpus):
    lst = get_toy_samplelist(toy_corpus)
    assert len(lst) == 12
    c1 = get_toy_samplelist(toy_corpus, toyclass="class1")
    assert all("class1" in p for p in c1)
    ds = ToyWaveDataset(toy_corpus, "train", batch_size=4)
    wavs, labels = next(iter(ds))
    assert wavs.shape[1] == 16000
    assert set(labels.tolist()) <= {0, 1}


def test_loader_gtzan_shapes(gtzan_corpus):
    loader = Loader("gtzan")
    songs = get_songs_of_genre(gtzan_corpus, "pop", None, 5)
    mels = loader.load(songs[0], num_chunks=8)
    assert np.asarray(mels).shape == (8, 1, 128, 128)


def test_get_data_main_balanced(gtzan_corpus):
    batch, loaded = get_data_main(gtzan_corpus, samples_per_class=2,
                                  num_chunks=2, genres={"pop": 0, "metal": 1})
    assert batch.shape == (2 * 2 * 2, 1, 128, 128)  # genres x samples x chunks
    assert len(loaded) == 4


def test_shuffle_and_truncate_deterministic(rng):
    data = np.arange(10)[:, None].astype(np.float32)
    songs = [f"s{i}" for i in range(10)]
    d1, s1 = shuffle_and_truncate(data, songs, 5, seed=7)
    d2, s2 = shuffle_and_truncate(data, songs, 5, seed=7)
    np.testing.assert_array_equal(d1, d2)
    assert s1 == s2
    assert len(s1) == 5


def test_experiment_config_roundtrip(tmp_path):
    cfg = ExperimentConfig.toy_default()
    path = str(tmp_path / "cfg.json")
    cfg.save(path)
    loaded = ExperimentConfig.load(path)
    assert loaded.case == "toy"
    assert loaded.model.n_classes == 2
    assert loaded.drsa.num_concepts == 2
    vgg = loaded.vgg_config()
    assert vgg.n_filters == (8, 8, 16, 16, 16)


def test_chunk_startpoints_match_get_slices():
    """chunk_startpoints must agree with the windows get_slices extracts."""
    from drsa_audio_tpu.ops.frontend import (
        chunk_startpoints, get_slices, slice_hop_samples,
    )
    import jax.numpy as jnp

    sr, slice_len, chunks = 16000, 3, 10
    wav = np.arange(30 * sr, dtype=np.float32)[None]
    slices = np.asarray(get_slices(jnp.asarray(wav), slice_len, chunks, sr))
    starts = chunk_startpoints(slice_len, chunks, sr)
    assert starts.shape == (chunks,)
    # first sample of each slice is its startpoint in samples
    np.testing.assert_allclose(slices[:, 0, 0], starts * sr)
    assert starts[0] == 0.0
    assert slice_hop_samples(slice_len, chunks, sr) == int(starts[1] * sr)
    np.testing.assert_allclose(chunk_startpoints(slice_len, 1, sr), [0.0])


def test_shuffle_and_truncate_with_startpoints(rng):
    data = rng.standard_normal((10, 2)).astype(np.float32)
    songs = [f"s{i}" for i in range(10)]
    starts = np.arange(10, dtype=np.float64)
    d1, s1, p1 = shuffle_and_truncate(data, songs, 5, seed=3, startpoints=starts)
    d2, s2, p2 = shuffle_and_truncate(data, songs, 5, seed=3, startpoints=starts)
    assert s1 == s2
    np.testing.assert_array_equal(p1, p2)
    # startpoints stay aligned with songs after the permutation
    for song, sp in zip(s1, p1):
        assert song == f"s{int(sp)}"


def test_gtzan_6s_case():
    """gtzan_6s is a first-class case: 6 s slices, 128x256 mels, 13-entry
    name map aligned with the block_depth-2 BN model's layer names."""
    import jax
    from drsa_audio_tpu.ops.frontend import FrontendConfig
    from drsa_audio_tpu.utils.config import ExperimentConfig
    from drsa_audio_tpu.models.vgg import build_layer_specs, init_params, forward
    from drsa_audio_tpu.models.train import gtzan_augment_and_mel
    from drsa_audio_tpu.utils.constants import DRSA_LAYERS_GTZAN_6S
    import jax.numpy as jnp

    cfg = ExperimentConfig.gtzan_6s_default()
    fe = FrontendConfig.for_case("gtzan_6s")
    assert (fe.slice_length, fe.n_mels, fe.width) == (6, 128, 256)

    rng_l = np.random.default_rng(0)
    w = jnp.asarray(rng_l.standard_normal(29 * 16000).astype(np.float32))
    mel = gtzan_augment_and_mel(w, jax.random.PRNGKey(0), fe, True, True)
    assert mel.shape == (1, 128, 256)

    specs = build_layer_specs(cfg.vgg_config())
    names = {s.name for s in specs}
    # every name-map entry and DRSA layer must exist in the model
    for name, _ in cfg.lrp_name_map:
        assert name in names, name
    for li in DRSA_LAYERS_GTZAN_6S:
        assert f"features.{li}" in names
    params = init_params(specs, jax.random.PRNGKey(0))
    logits = forward(specs, params, mel[None], train=False)
    assert logits.shape == (1, 10)


def test_get_songs_drsa_num_songs_cap(gtzan_corpus):
    from drsa_audio_tpu.data.datasets import get_songs_drsa
    # 3 train-fold songs exist for 'pop'; cap at 2 songs x 4 chunks
    data, songs, starts = get_songs_drsa(
        gtzan_corpus, "pop", excluded_folds=[1], num_chunks=4, num_songs=2)
    assert data.shape[0] == 8 and len(set(songs)) == 2
    assert starts.shape == (8,)
    # deterministic under the same seed
    _, songs2, _ = get_songs_drsa(
        gtzan_corpus, "pop", excluded_folds=[1], num_chunks=4, num_songs=2)
    assert songs == songs2
    # N truncation composes with the song cap
    data3, songs3, starts3 = get_songs_drsa(
        gtzan_corpus, "pop", excluded_folds=[1], num_chunks=4, num_songs=2,
        N=5)
    assert data3.shape[0] == 5 and len(songs3) == 5 and starts3.shape == (5,)


def test_gtzan_6s_default_matches_reference_architecture():
    """The config tree's 6s model must equal the reference's trained conf
    ((64,64,100,128,128), 100, ((2,4),(2,2)x4)) on (128,256) input
    (getdrsadata.py:72-73) — a missing pool_kernels override here once
    trained a ((2,2)x5) model whose non-square maps broke InvProjection."""
    from drsa_audio_tpu.utils.config import ExperimentConfig
    from drsa_audio_tpu.models.vgg import gtzan_6s_config

    got = ExperimentConfig.gtzan_6s_default().vgg_config()
    want = gtzan_6s_config()
    assert got == want
