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


def _utf8_frame_number(idx: int) -> bytes:
    """FLAC frame numbers use UTF-8-style coding of the index."""
    if idx < 0x80:
        return bytes([idx])
    out = []
    n = 1
    while idx >= (1 << (6 - n + 5 * n)) and n < 6:
        n += 1
    lead_mask = (0xFF00 >> (n + 1)) & 0xFF
    shift = 6 * n
    out.append(lead_mask | (idx >> shift))
    for k in range(n - 1, -1, -1):
        out.append(0x80 | ((idx >> (6 * k)) & 0x3F))
    return bytes(out)


def write_flac_verbatim(path: str, samples: np.ndarray,
                        sample_rate: int = 16000,
                        block_size: int = 4096) -> None:
    """Minimal spec-shaped FLAC writer (mono, 16-bit, VERBATIM subframes,
    zero CRCs) — enough to lay out test/benchmark corpora in the
    LibriSpeech on-disk format for the end-to-end dress rehearsal; real
    corpora come from real encoders. Accepts float waveforms in [-1, 1]
    or int16."""
    if samples.dtype != np.int16:
        samples = np.clip(np.asarray(samples, np.float32), -1.0, 1.0)
        samples = (samples * 32767.0).astype(np.int16)
    total = len(samples)

    def bits(value: int, n: int, acc: list) -> None:
        for i in range(n - 1, -1, -1):
            acc.append((value >> i) & 1)

    # STREAMINFO
    acc: list = []
    bits(block_size, 16, acc)
    bits(block_size, 16, acc)
    bits(0, 24, acc)
    bits(0, 24, acc)
    bits(sample_rate, 20, acc)
    bits(0, 3, acc)            # channels - 1
    bits(15, 5, acc)           # bits/sample - 1
    bits(total, 36, acc)
    bits(0, 128, acc)          # md5 (unset)
    body = bytearray()
    for i in range(0, len(acc), 8):
        b = 0
        for bit in acc[i:i + 8]:
            b = (b << 1) | bit
        body.append(b)
    chunks = [b"fLaC", bytes([0x80, 0, 0, len(body)]), bytes(body)]

    for f, start in enumerate(range(0, total, block_size)):
        blk = samples[start:start + block_size]
        bs = len(blk)
        # frame header: sync+flags (2B), bscode=7/srcode=0 (1B),
        # chan=0/bps=4 (1B), utf8 frame no, bs-1 (2B BE), crc8 (1B) —
        # all byte-aligned, so the frame packs without a bit writer
        hdr = (b"\xff\xf8" + bytes([0x70, 0x08])
               + _utf8_frame_number(f)
               + int(bs - 1).to_bytes(2, "big") + b"\x00")
        # subframe: VERBATIM (1B) + 16-bit BE samples + crc16 (2B)
        chunks.append(hdr + b"\x02" + blk.astype(">i2").tobytes()
                      + b"\x00\x00")
    with open(path, "wb") as fh:
        fh.write(b"".join(chunks))
