"""FLAC decoder tests against a hand-written reference *encoder*.

No FLAC tooling exists in this image, so the test writes spec-conformant
FLAC streams bit-by-bit (VERBATIM, CONSTANT and FIXED+Rice subframes) and
checks the native decoder round-trips them exactly."""

import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int):
        self.bits.extend([0] * q + [1])

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _streaminfo(bs, sr, channels, bps, total):
    w = BitWriter()
    w.write(bs, 16)
    w.write(bs, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(sr, 20)
    w.write(channels - 1, 3)
    w.write(bps - 1, 5)
    w.write(total, 36)
    w.write(0, 128)   # md5
    body = w.bytes()
    hdr = bytes([0x80, 0, 0, len(body)])   # last-metadata, STREAMINFO
    return hdr + body


def _frame_header(w, frame_idx, bs, ch_asgn=0):
    w.write(0x3FFE, 14)
    w.write(0, 1)          # reserved
    w.write(0, 1)          # fixed blocking
    w.write(7, 4)          # block size: 16-bit follows
    w.write(0, 4)          # sample rate: from streaminfo
    w.write(ch_asgn, 4)
    w.write(4, 3)          # 16 bits/sample
    w.write(0, 1)
    assert frame_idx < 128
    w.write(frame_idx, 8)  # utf8 frame number (1 byte)
    w.write(bs - 1, 16)
    w.write(0, 8)          # CRC-8 (unchecked)


def _write_flac_verbatim(samples, sr=16000, bs=256):
    data = b"fLaC" + _streaminfo(bs, sr, 1, 16, len(samples))
    out = [data]
    for f, start in enumerate(range(0, len(samples), bs)):
        chunk = samples[start:start + bs]
        w = BitWriter()
        _frame_header(w, f, len(chunk))
        w.write(0, 1)          # subframe pad bit
        w.write(1, 6)          # VERBATIM
        w.write(0, 1)          # no wasted bits
        for s in chunk:
            w.write_signed(int(s), 16)
        w.align()
        w.write(0, 16)         # CRC-16 (unchecked)
        out.append(w.bytes())
    return b"".join(out)


def _write_flac_fixed1_rice(samples, sr=16000, bs=256, rice=6):
    """FIXED order-1 predictor with a single Rice partition."""
    data = b"fLaC" + _streaminfo(bs, sr, 1, 16, len(samples))
    out = [data]
    for f, start in enumerate(range(0, len(samples), bs)):
        chunk = [int(s) for s in samples[start:start + bs]]
        w = BitWriter()
        _frame_header(w, f, len(chunk))
        w.write(0, 1)
        w.write(0b001001, 6)   # FIXED, order 1
        w.write(0, 1)
        w.write_signed(chunk[0], 16)       # warmup
        w.write(0, 2)          # residual method: rice 4-bit
        w.write(0, 4)          # partition order 0
        w.write(rice, 4)
        for i in range(1, len(chunk)):
            res = chunk[i] - chunk[i - 1]
            u = (res << 1) ^ (res >> 63) if res >= 0 else ((-res) << 1) - 1
            u = (2 * res) if res >= 0 else (-2 * res - 1)
            w.write_unary(u >> rice)
            w.write(u & ((1 << rice) - 1), rice)
        w.align()
        w.write(0, 16)
        out.append(w.bytes())
    return b"".join(out)


def _decode(tmp_path, payload):
    from early_exit_tpu.data.native import decode_flac
    p = tmp_path / "t.flac"
    p.write_bytes(payload)
    return decode_flac(str(p))


def test_verbatim_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    samples = rng.randint(-30000, 30000, size=1000).astype(np.int64)
    wav, sr = _decode(tmp_path, _write_flac_verbatim(samples))
    assert sr == 16000
    np.testing.assert_array_equal(
        np.round(wav * 32768.0).astype(np.int64), samples)


def test_constant_frames(tmp_path):
    bs = 128
    data = b"fLaC" + _streaminfo(bs, 16000, 1, 16, bs)
    w = BitWriter()
    _frame_header(w, 0, bs)
    w.write(0, 1)
    w.write(0, 6)            # CONSTANT
    w.write(0, 1)
    w.write_signed(-1234, 16)
    w.align()
    w.write(0, 16)
    wav, sr = _decode(tmp_path, data + w.bytes())
    assert len(wav) == bs
    np.testing.assert_allclose(wav, -1234 / 32768.0, atol=1e-7)


def test_fixed_rice_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    # smooth-ish signal so order-1 residuals are small
    t = np.arange(1024)
    samples = (3000 * np.sin(t / 20.0)).astype(np.int64)
    samples += rng.randint(-10, 10, size=len(samples))
    wav, sr = _decode(tmp_path, _write_flac_fixed1_rice(samples))
    np.testing.assert_array_equal(
        np.round(wav * 32768.0).astype(np.int64), samples)


def test_librispeech_reader_with_flac(tmp_path):
    """End-to-end: LibriSpeech directory layout with .flac files."""
    from early_exit_tpu.data.librispeech import LibriSpeechDataset
    rng = np.random.RandomState(2)
    root = tmp_path / "LibriSpeech" / "test-clean" / "19" / "198"
    root.mkdir(parents=True)
    samples = rng.randint(-20000, 20000, size=2048).astype(np.int64)
    (root / "19-198-0000.flac").write_bytes(_write_flac_verbatim(samples))
    (root / "19-198.trans.txt").write_text(
        "19-198-0000 HELLO WORLD THIS IS A TEST\n")
    ds = LibriSpeechDataset(str(tmp_path), "test-clean")
    assert len(ds) == 1
    utt = ds[0]
    assert utt.transcript == "HELLO WORLD THIS IS A TEST"
    assert utt.sample_rate == 16000
    assert len(utt.waveform) == 2048
