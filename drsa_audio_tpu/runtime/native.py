"""ctypes bindings for the C++ runtime (csrc/audio_runtime.cpp).

Gracefully degrades: ``available()`` is False when the shared library hasn't
been built, and callers fall back to the numpy paths.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libaudio_runtime.so")
_lib = None


class _WavInfo(ctypes.Structure):
    _fields_ = [
        ("channels", ctypes.c_int32),
        ("sample_rate", ctypes.c_int32),
        ("frames", ctypes.c_int64),
    ]


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(_WavInfo)]
    lib.wav_info.restype = ctypes.c_int
    lib.wav_decode.argtypes = [ctypes.c_char_p,
                               ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.wav_decode.restype = ctypes.c_int
    lib.wav_decode_many.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int]
    lib.wav_decode_many.restype = ctypes.c_int
    lib.telea_inpaint.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.telea_inpaint.restype = ctypes.c_int
    lib.telea_inpaint_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.telea_inpaint_batch.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_wav(path: str):
    lib = _load()
    info = _WavInfo()
    rc = lib.wav_info(path.encode(), ctypes.byref(info))
    if rc != 0:
        raise IOError(f"wav_info({path}) failed: {rc}")
    buf = np.empty((info.channels, info.frames), dtype=np.float32)
    rc = lib.wav_decode(path.encode(),
                        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        info.frames)
    if rc != 0:
        raise IOError(f"wav_decode({path}) failed: {rc}")
    return buf, int(info.sample_rate)


def decode_many(paths, num_threads: int = 4):
    """Decode a list of WAV files concurrently; returns list of arrays."""
    lib = _load()
    infos = []
    for p in paths:
        info = _WavInfo()
        if lib.wav_info(p.encode(), ctypes.byref(info)) != 0:
            raise IOError(f"wav_info({p}) failed")
        infos.append(info)
    bufs = [np.empty((inf.channels, inf.frames), np.float32) for inf in infos]
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_bufs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for b in bufs])
    c_frames = (ctypes.c_int64 * n)(*[inf.frames for inf in infos])
    fails = lib.wav_decode_many(c_paths, c_bufs, c_frames, n, num_threads)
    if fails:
        raise IOError(f"{fails} decode failures")
    return bufs


def prefetch_batches(paths, batch_size: int, num_threads: int = 4):
    paths = list(paths)
    for i in range(0, len(paths), batch_size):
        yield decode_many(paths[i:i + batch_size], num_threads)


def telea_inpaint(img: np.ndarray, mask: np.ndarray, radius: int = 8):
    """Inpaint masked pixels of a single-channel float image in place-safe
    copy. mask nonzero = pixels to fill."""
    lib = _load()
    out = np.ascontiguousarray(img, dtype=np.float32).copy()
    m = np.ascontiguousarray(mask, dtype=np.uint8)
    h, w = out.shape
    lib.telea_inpaint(out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                      m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      h, w, radius)
    return out


def telea_inpaint_batch(imgs: np.ndarray, masks: np.ndarray, radius: int = 8,
                        num_threads: int = 4):
    out = np.ascontiguousarray(imgs, dtype=np.float32).copy()
    m = np.ascontiguousarray(masks, dtype=np.uint8)
    n, h, w = out.shape
    lib = _load()
    lib.telea_inpaint_batch(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, radius, num_threads)
    return out
