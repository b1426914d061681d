"""FLAC decoding via the native C++ decoder (csrc/audio).

LibriSpeech ships FLAC; no Python FLAC decoder exists in this image, so
decoding is delegated to our C++ library (the TPU-native analogue of the
reference's torchaudio/libsndfile dependency). Falls back with a clear
error when the native library is not built.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def read_flac(path: str) -> Tuple[np.ndarray, int]:
    try:
        from early_exit_tpu.data.native import decode_flac
    except Exception as e:  # pragma: no cover
        raise RuntimeError(
            "FLAC decoding requires the native audio library; build it "
            "with `make -C csrc` or let early_exit_tpu._native.build() "
            "compile it (needs g++)") from e
    return decode_flac(path)
