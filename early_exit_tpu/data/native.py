"""ctypes binding for the C++ FLAC decoder (csrc/audio)."""

from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

from early_exit_tpu import _native


def decode_flac(path: str) -> Tuple[np.ndarray, int]:
    """Returns (waveform float32 in [-1, 1], sample_rate). Multi-channel
    audio is downmixed to mono by averaging."""
    lib = _native.get_lib()
    h = lib.eet_flac_decode(path.encode())
    if not h:
        raise ValueError(f"failed to decode FLAC: {path}")
    try:
        n = lib.eet_flac_num_samples(h)
        sr = lib.eet_flac_sample_rate(h)
        ch = lib.eet_flac_channels(h)
        buf = np.empty(n, np.int32)
        lib.eet_flac_copy(h, buf.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)))
    finally:
        lib.eet_flac_free(h)
    x = buf.astype(np.float32) / 32768.0
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr
