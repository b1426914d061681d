"""LibriSpeech dataset reader (host side).

Replaces `torchaudio.datasets.LIBRISPEECH` (data.py:18-19, 40-41) with a
dependency-free reader of the standard on-disk layout:

    <root>/LibriSpeech/<split>/<speaker>/<chapter>/
        <speaker>-<chapter>-<utt>.flac        (audio)
        <speaker>-<chapter>.trans.txt         (transcripts)

Audio decoding: .wav via the stdlib, .flac via the native C++ decoder
(csrc/audio) when built. A synthetic dataset with deterministic audio and
transcripts is provided for tests/benchmarks where no corpus is mounted.

Each item mirrors the torchaudio tuple fields the collate fns consume
(waveform, sample_rate, transcript, speaker_id, chapter_id, utterance_id).
"""

from __future__ import annotations

import dataclasses
import os
import wave
from typing import List, Tuple

import numpy as np


@dataclasses.dataclass
class Utterance:
    waveform: np.ndarray          # float32 (n_samples,), range [-1, 1]
    sample_rate: int
    transcript: str
    speaker_id: str
    chapter_id: str
    utterance_id: str
    # generation-time difficulty (SyntheticDataset only): the additive
    # white-noise sigma this utterance was drawn with. Lets evaluation
    # tools correlate per-utterance gate decisions with ground-truth
    # difficulty (tools/escalation_report.py). 0.0 for disk corpora.
    noise_sigma: float = 0.0


def _read_wav(path: str) -> Tuple[np.ndarray, int]:
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported wav sample width {width}")
    if wave.open(path, "rb").getnchannels() > 1:
        x = x.reshape(-1, 2).mean(axis=1)
    return x, sr


def read_audio(path: str) -> Tuple[np.ndarray, int]:
    if path.endswith(".wav"):
        return _read_wav(path)
    if path.endswith(".flac"):
        from early_exit_tpu.data.flac import read_flac
        return read_flac(path)
    raise ValueError(f"unsupported audio format: {path}")


class LibriSpeechDataset:
    """Index of one or more LibriSpeech splits; audio is decoded lazily.

    `url` may be a comma-separated list of splits (e.g.
    "train-clean-100,train-clean-360,train-other-500") — the concatenated
    full-960h recipe the reference sketches with ConcatDataset
    (data.py:9-16); items are indexed split by split, in order.
    """

    def __init__(self, root: str, url: str = "train-clean-100"):
        names = [u.strip() for u in url.split(",") if u.strip()]
        if not names:
            raise ValueError("empty LibriSpeech split list")
        self.items: List[Tuple[str, str, str, str, str]] = []
        self._bases: List[str] = []
        for name in names:
            self._index_split(root, name)
        # `base` stays a str even with a multi-split list (external
        # os.path.join(ds.base, ...) callers); the full list is `bases`
        self.base = self._bases[0]

    @property
    def bases(self) -> List[str]:
        """Base directory of every indexed split, in `url` order."""
        return list(self._bases)

    def _index_split(self, root: str, url: str) -> None:
        base = os.path.join(root, "LibriSpeech", url)
        if not os.path.isdir(base):
            base = os.path.join(root, url)
        if not os.path.isdir(base):
            raise FileNotFoundError(f"no LibriSpeech split at {base}")
        self._bases.append(base)
        for speaker in sorted(os.listdir(base)):
            sdir = os.path.join(base, speaker)
            if not os.path.isdir(sdir):
                continue
            for chapter in sorted(os.listdir(sdir)):
                cdir = os.path.join(sdir, chapter)
                if not os.path.isdir(cdir):
                    continue
                trans = os.path.join(cdir,
                                     f"{speaker}-{chapter}.trans.txt")
                texts = {}
                if os.path.exists(trans):
                    with open(trans, encoding="utf-8") as f:
                        for line in f:
                            utt_id, _, text = line.partition(" ")
                            texts[utt_id] = text.strip()
                for name in sorted(os.listdir(cdir)):
                    stem, ext = os.path.splitext(name)
                    if ext in (".flac", ".wav") and stem in texts:
                        self.items.append((os.path.join(cdir, name),
                                           texts[stem], speaker, chapter,
                                           stem))

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, i: int) -> Utterance:
        path, text, speaker, chapter, utt = self.items[i]
        wav, sr = read_audio(path)
        return Utterance(wav, sr, text, speaker, chapter, utt)


_WORDS = ("THE OF AND TO A IN THAT IS WAS HE FOR IT WITH AS HIS ON BE AT "
          "BY I THIS HAD NOT ARE BUT FROM OR HAVE AN THEY WHICH ONE YOU "
          "WERE HER ALL SHE THERE WOULD THEIR WE HIM BEEN HAS WHEN WHO "
          "WILL MORE NO IF OUT SO SAID WHAT UP ITS ABOUT INTO THAN THEM "
          "CAN ONLY OTHER NEW SOME COULD TIME THESE TWO MAY THEN DO FIRST "
          "ANY MY NOW SUCH LIKE OUR OVER MAN ME EVEN MOST MADE AFTER ALSO "
          "DID MANY BEFORE MUST THROUGH BACK YEARS WHERE MUCH YOUR WAY "
          "WELL DOWN SHOULD BECAUSE EACH JUST THOSE PEOPLE").split()


class SyntheticDataset:
    """Deterministic synthetic corpus shaped like LibriSpeech (tests,
    smoke training, benchmarks).

    The audio genuinely ENCODES the transcript: each character is an 80 ms
    tone at a character-specific frequency (plus noise), so a CTC model can
    actually learn to transcribe it — end-to-end convergence on this
    corpus is a real learning test, not a fit to priors.

    Difficulty knobs (defaults = the easy corpus used by tests/smoke):
    - speaker_warp w: per-utterance frequency scale α ~ U[1-w, 1+w]
      applied to every char tone — the absolute char↔frequency map
      becomes ambiguous and the model must infer α from utterance
      context (relative pitch), the synthetic analogue of vocal-tract
      length variation
    - dur_jitter j: per-char segment length scaled by U[1-j, 1+j]
      (alignment uncertainty)
    - amp_jitter a: per-char tone amplitude scaled by U[1-a, 1+a]
    - noise: additive white noise σ (tone amplitude is 0.2, so 0.02 ≈
      +20 dB SNR, 0.2 ≈ 0 dB)
    - noise_hi: when set (> noise), each utterance draws its own σ ~
      U[noise, noise_hi] — a per-utterance SNR SPREAD. The spread is the
      de-saturation knob for per-exit WER ladders: the hardest
      utterances stay hard IN-distribution, so the clean eval split
      separates exit depths instead of saturating at 0.00% everywhere
      (VERDICT r3 "clean-split eval saturation").
    With warp/jitter/low SNR the easy corpus' saturated 0.00% WER
    ladder spreads into a depth-differentiating one (BENCH_NOTES.md
    hard-corpus run)."""

    CHAR_MS = 80.0

    def __init__(self, n_items: int = 64, sample_rate: int = 16000,
                 seed: int = 0, min_words: int = 2, max_words: int = 12,
                 noise: float = 0.02, speaker_warp: float = 0.0,
                 dur_jitter: float = 0.0, amp_jitter: float = 0.0,
                 noise_hi: float | None = None):
        self.n_items = n_items
        self.sample_rate = sample_rate
        self.seed = seed
        self.min_words = min_words
        self.max_words = max_words
        self.noise = noise
        self.speaker_warp = speaker_warp
        self.dur_jitter = dur_jitter
        self.amp_jitter = amp_jitter
        self.noise_hi = noise_hi

    def __len__(self) -> int:
        return self.n_items

    @staticmethod
    def _char_freq(c: str) -> float:
        if c == " ":
            return 120.0
        if c == "'":
            return 150.0
        return 400.0 + 110.0 * (ord(c.lower()) - ord("a"))  # 400..3150 Hz

    def __getitem__(self, i: int) -> Utterance:
        rng = np.random.RandomState(self.seed * 100003 + i)
        n_words = rng.randint(self.min_words, self.max_words + 1)
        words = [_WORDS[rng.randint(len(_WORDS))] for _ in range(n_words)]
        text = " ".join(words)
        base_seg = self.CHAR_MS / 1000.0 * self.sample_rate
        alpha = 1.0 + (rng.uniform(-self.speaker_warp, self.speaker_warp)
                       if self.speaker_warp else 0.0)
        segs = []
        for c in text:
            dur = base_seg * (1.0 + (rng.uniform(-self.dur_jitter,
                                                 self.dur_jitter)
                                     if self.dur_jitter else 0.0))
            seg = max(int(dur), 1)
            amp = 0.2 * (1.0 + (rng.uniform(-self.amp_jitter,
                                            self.amp_jitter)
                                if self.amp_jitter else 0.0))
            f = self._char_freq(c) * alpha
            t = np.arange(seg) / self.sample_rate
            segs.append(amp * np.sin(2 * np.pi * f * t))
        wav = np.concatenate(segs).astype(np.float32)
        sigma = (rng.uniform(self.noise, self.noise_hi)
                 if self.noise_hi and self.noise_hi > self.noise
                 else self.noise)
        wav += sigma * rng.randn(len(wav)).astype(np.float32)
        return Utterance(wav.astype(np.float32), self.sample_rate, text,
                         "0", "0", f"synth-{i}", noise_sigma=float(sigma))
