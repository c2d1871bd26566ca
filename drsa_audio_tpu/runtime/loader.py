"""Audio loading facade: native C++ decoder when built, numpy fallback.

The production path is the C++ runtime (csrc/audio_runtime.cpp): WAV decode +
multithreaded prefetch, exposed via ctypes. Replaces the reference's
torchaudio.load / sox stack.
"""

from __future__ import annotations

import numpy as np

from drsa_audio_tpu.runtime import native
from drsa_audio_tpu.runtime.wavio import read_wav


def load_audio(path: str) -> tuple[np.ndarray, int]:
    """Returns (waveform [channels, frames] float32, sample_rate)."""
    if native.available():
        return native.decode_wav(path)
    return read_wav(path)


def prefetch_batches(paths, batch_size: int, num_threads: int = 4):
    """Iterate decoded waveforms in batches with background prefetch.

    Uses the native thread-pool loader when built; otherwise a Python
    ThreadPoolExecutor pipeline.
    """
    if native.available():
        yield from native.prefetch_batches(paths, batch_size, num_threads)
        return
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(num_threads) as ex:
        futures = [ex.submit(load_audio, p) for p in paths]
        batch = []
        for fut in futures:
            batch.append(fut.result()[0])
            if len(batch) == batch_size:
                yield batch
                batch = []
        if batch:
            yield batch
