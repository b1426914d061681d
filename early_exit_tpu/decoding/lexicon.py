"""Lexicon utilities: dictionary loading + OOV word snapping.

Capability parity with util/tokenizer.py:28-50 (`load_dict`, `apply_lex`):
every decoded word not in the lexicon is replaced by the minimum
edit-distance lexicon entry. The reference does a Python O(|lexicon|)
scan per OOV word over 89,114 entries — a major CPU hot spot (SURVEY.md
§3.4). Here:

- in-vocabulary words hit an O(1) set lookup
- OOV snapping uses the C++ edit-distance engine (csrc/lexicon) when
  built, with a banded numpy fallback that prunes by length difference
"""

from __future__ import annotations

import io
from typing import List, Sequence


def load_dict(file_path: str) -> List[str]:
    """One lexicon entry per line (inference.py:222 loads librispeech.lex)."""
    out = []
    with io.open(file_path, encoding="utf-8") as f:
        for line in f:
            out.append(line.rstrip("\n"))
    return out


def edit_distance(a: str, b: str) -> int:
    """Levenshtein distance (iterative two-row DP)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class LexiconCorrector:
    """apply_lex with an O(1) member check and length-bucketed OOV search."""

    def __init__(self, entries: Sequence[str]):
        self.entries = list(entries)
        self.members = set(self.entries)
        self.by_len = {}
        for w in self.entries:
            self.by_len.setdefault(len(w), []).append(w)
        self._native = None
        try:
            from early_exit_tpu.decoding.native import NativeLexicon
            self._native = NativeLexicon(self.entries)
        except Exception:
            self._native = None
        self._cache = {}

    def snap_word(self, w: str) -> str:
        if w in self.members:
            return w
        if w in self._cache:
            return self._cache[w]
        if self._native is not None:
            best = self._native.closest(w)
        else:
            best = self._snap_py(w)
        self._cache[w] = best
        return best

    def _snap_py(self, w: str) -> str:
        best, best_d = "", 10 ** 9
        n = len(w)
        # search outward by length difference: any candidate at length
        # distance dl has edit distance >= dl, so stop once dl >= best_d
        for dl in range(0, max(n, max(self.by_len) if self.by_len else 0) + 1):
            if dl >= best_d:
                break
            for ln in ({n - dl, n + dl} if dl else {n}):
                for cand in self.by_len.get(ln, ()):
                    d = edit_distance(w, cand)
                    if d < best_d:
                        best_d, best = d, cand
        return best

    def apply(self, text: str) -> str:
        """util/tokenizer.py:35-50 semantics over a space-joined string."""
        return " ".join(self.snap_word(w) for w in text.split(" ") if True)


def apply_lex(predicted: str, lexicon) -> str:
    """Functional parity shim: accepts a list (reference signature) or a
    LexiconCorrector."""
    if isinstance(lexicon, LexiconCorrector):
        return lexicon.apply(predicted)
    return LexiconCorrector(lexicon).apply(predicted)
