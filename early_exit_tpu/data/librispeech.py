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
    """Index of a LibriSpeech split; audio is decoded lazily."""

    def __init__(self, root: str, url: str = "train-clean-100"):
        base = os.path.join(root, "LibriSpeech", url)
        if not os.path.isdir(base):
            base = os.path.join(root, url)
        if not os.path.isdir(base):
            raise FileNotFoundError(f"no LibriSpeech split at {base}")
        self.base = base
        self.items: List[Tuple[str, str, str, str, str]] = []
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
    corpus is a real learning test, not a fit to priors."""

    CHAR_MS = 80.0

    def __init__(self, n_items: int = 64, sample_rate: int = 16000,
                 seed: int = 0, min_words: int = 2, max_words: int = 12,
                 noise: float = 0.02):
        self.n_items = n_items
        self.sample_rate = sample_rate
        self.seed = seed
        self.min_words = min_words
        self.max_words = max_words
        self.noise = noise

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
        seg = int(self.CHAR_MS / 1000.0 * self.sample_rate)
        n = seg * len(text)
        t = np.arange(seg) / self.sample_rate
        wav = np.empty(n, np.float32)
        for k, c in enumerate(text):
            f = self._char_freq(c)
            wav[k * seg:(k + 1) * seg] = 0.2 * np.sin(2 * np.pi * f * t)
        wav += self.noise * rng.randn(n).astype(np.float32)
        return Utterance(wav.astype(np.float32), self.sample_rate, text,
                         "0", "0", f"synth-{i}")
