"""Native runtime tests: WAV roundtrip (numpy + C++ paths), threaded decode,
Telea inpainting vs cv2."""

import os

import numpy as np
import pytest

from drsa_audio_tpu.runtime import native
from drsa_audio_tpu.runtime.wavio import read_wav, write_wav
from drsa_audio_tpu.runtime.loader import load_audio


def _require_native():
    """conftest.pytest_configure auto-builds csrc when a toolchain exists;
    if it still isn't available, skip with the actionable fix."""
    if not native.available():
        pytest.skip("C++ runtime not built — run `make -C csrc`")


@pytest.fixture
def wav_file(tmp_path, rng):
    x = np.clip(rng.standard_normal((1, 16000)) * 0.3, -1, 1).astype(np.float32)
    path = str(tmp_path / "t.wav")
    write_wav(path, x, 16000)
    return path, x


def test_numpy_wav_roundtrip(wav_file):
    path, x = wav_file
    data, sr = read_wav(path)
    assert sr == 16000
    assert data.shape == x.shape
    np.testing.assert_allclose(data, x, atol=1e-4)


def test_native_available():
    import shutil
    if not native.available() and shutil.which("g++") is None:
        pytest.skip("no C++ toolchain on this host — run `make -C csrc` elsewhere")
    assert native.available(), (
        "C++ runtime not built (conftest auto-build failed; run make -C csrc)")


def test_native_decode_matches_numpy(wav_file):
    _require_native()
    path, x = wav_file
    data, sr = native.decode_wav(path)
    ref, _ = read_wav(path)
    assert sr == 16000
    np.testing.assert_allclose(data, ref, atol=1e-6)


def test_native_decode_many(tmp_path, rng):
    _require_native()
    paths = []
    refs = []
    for i in range(10):
        x = np.clip(rng.standard_normal((1, 8000)) * 0.3, -1, 1).astype(np.float32)
        p = str(tmp_path / f"m{i}.wav")
        write_wav(p, x, 16000)
        paths.append(p)
        refs.append(x)
    out = native.decode_many(paths, num_threads=4)
    for got, ref in zip(out, refs):
        np.testing.assert_allclose(got, ref, atol=1e-4)


def test_loader_facade(wav_file):
    path, x = wav_file
    data, sr = load_audio(path)
    assert data.shape == x.shape


def test_telea_inpaint_fills_hole(rng):
    _require_native()
    """Inpainting a constant image must reproduce the constant; a gradient
    image should be filled smoothly (no NaNs, bounded by neighbors)."""
    img = np.full((32, 32), 3.5, np.float32)
    mask = np.zeros((32, 32), np.uint8)
    mask[10:20, 12:22] = 1
    img_holed = img.copy()
    img_holed[mask > 0] = 0
    out = native.telea_inpaint(img_holed, mask, radius=8)
    np.testing.assert_allclose(out[mask > 0], 3.5, atol=1e-3)

    # gradient image
    gy, gx = np.mgrid[0:32, 0:32]
    img2 = (gx / 31.0).astype(np.float32)
    holed = img2.copy()
    holed[mask > 0] = 0
    out2 = native.telea_inpaint(holed, mask, radius=8)
    assert np.all(np.isfinite(out2))
    err = np.abs(out2[mask > 0] - img2[mask > 0])
    assert err.mean() < 0.1, err.mean()


def test_telea_reconstruction_no_worse_than_cv2(rng):
    _require_native()
    """Reconstruction-quality gate vs cv2.INPAINT_TELEA (the reference's
    implementation, pixelflipping/core.py:167): on a smooth float field our
    FMM inpainting must recover the hidden truth at least as well as cv2
    (measured: ours ~0.29 rel err, cv2 ~1.38 on this fixture — cv2's float
    path extrapolates poorly)."""
    cv2 = pytest.importorskip("cv2")
    img = rng.standard_normal((64, 64)).astype(np.float32)
    img = np.cumsum(np.cumsum(img, 0), 1) / 64  # smooth field
    mask = np.zeros((64, 64), np.uint8)
    mask[20:36, 24:40] = 1
    holed = img.copy()
    holed[mask > 0] = 0
    ours = native.telea_inpaint(holed, mask, radius=8)
    ref = cv2.inpaint(holed, mask, inpaintRadius=8, flags=cv2.INPAINT_TELEA)
    scale = np.abs(img[mask > 0]).mean() + 1e-6
    err_ours = np.abs(ours[mask > 0] - img[mask > 0]).mean() / scale
    err_cv2 = np.abs(ref[mask > 0] - img[mask > 0]).mean() / scale
    assert err_ours < 0.35, err_ours
    assert err_ours <= err_cv2 * 1.2, (err_ours, err_cv2)


def test_telea_batch(rng):
    _require_native()
    imgs = np.tile(np.linspace(0, 1, 16, dtype=np.float32)[None, None, :], (3, 16, 1))
    masks = np.zeros((3, 16, 16), np.uint8)
    masks[:, 5:9, 5:9] = 1
    holed = imgs.copy()
    holed[masks > 0] = 0
    out = native.telea_inpaint_batch(holed, masks, radius=6, num_threads=2)
    assert out.shape == (3, 16, 16)
    assert np.all(np.isfinite(out))


def test_concurrent_decode_inpaint_hammer(tmp_path, rng):
    """Stress the native thread pools (VERDICT.md round-1 #9): many Python
    threads hammering wav_decode_many and telea_inpaint_batch concurrently,
    with oversubscribed worker counts, must return correct results and not
    crash/corrupt."""
    import threading
    from drsa_audio_tpu.runtime import native

    if not native.available():
        import pytest
        pytest.skip("native runtime not built")

    # build a pool of wav files with known content
    sr, n_files = 16000, 12
    paths, refs = [], []
    for i in range(n_files):
        wav = np.clip(rng.standard_normal((1, sr // 4)) * 0.3, -1, 1
                      ).astype(np.float32)
        p = str(tmp_path / f"h{i}.wav")
        write_wav(p, wav, sr)
        paths.append(p)
        refs.append(wav)

    imgs = rng.standard_normal((6, 32, 32)).astype(np.float32)
    masks = np.zeros((6, 32, 32), np.uint8)
    masks[:, 10:20, 10:20] = 1
    expected_inpaint = native.telea_inpaint_batch(imgs.copy(), masks,
                                                  num_threads=1)

    errors = []

    def decode_worker(seed):
        try:
            order = np.random.default_rng(seed).permutation(n_files)
            for _ in range(5):
                got = native.decode_many([paths[i] for i in order],
                                         num_threads=8)
                for slot, idx in enumerate(order):
                    np.testing.assert_allclose(got[slot], refs[idx],
                                               atol=2e-4)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def inpaint_worker(seed):
        try:
            for _ in range(5):
                out = native.telea_inpaint_batch(imgs.copy(), masks,
                                                 num_threads=8)
                np.testing.assert_allclose(out, expected_inpaint, atol=1e-5)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=decode_worker, args=(s,))
               for s in range(3)]
    threads += [threading.Thread(target=inpaint_worker, args=(s,))
                for s in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors


def test_tsan_stress_binary():
    """Race detection (SURVEY.md §5.2): the TSAN-instrumented stress driver
    (outer threads x inner pools over decode + inpaint) must run clean."""
    import shutil
    import subprocess

    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(["make", "-C", os.path.join(root, "csrc"), "stress"],
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "stress OK" in proc.stdout
    assert "WARNING: ThreadSanitizer" not in proc.stdout + proc.stderr
