"""Lexicon-constrained CTC beam search (native) — python surface.

Capability parity with the reference's flashlight `ctc_decoder` bank
(util/beam_infer.py:51-75: lexicon + tokens files, nbest=1, beam_size,
word_score, lm_weight, blank '@'): hypotheses are constrained to lexicon
word sequences via a token trie; the decode returns the best word string,
like `" ".join(result[0][0].words)` (beam_infer.py:97-99). Pass an
`ArpaLM` (decoding/ngram_lm.py) as `lm=` for shallow fusion — the slot
the reference reserves for KenLM (beam_infer.py:62,71,77-78).
"""

from __future__ import annotations

import ctypes
from typing import List, Optional, Sequence, Tuple

import numpy as np

from early_exit_tpu import _native


class LexiconBeamDecoder:
    def __init__(self, entries: Sequence[Tuple[str, Sequence[int]]],
                 vocab_size: int, *, blank: int = 0,
                 beam_size: int = 10, word_score: float = 0.0,
                 beam_threshold: float = 50.0,
                 lm: Optional["ArpaLM"] = None, lm_weight: float = 1.0):
        """entries: (word, token-id sequence) pairs. lm: optional ArpaLM
        scored at word boundaries (+ sentence end) with weight
        `lm_weight`, flashlight-style shallow fusion."""
        self._lib = _native.get_lib()
        self._configure()
        self._h = self._lib.eet_trie_create(vocab_size)
        self.words: List[str] = []
        for word, toks in entries:
            arr = (ctypes.c_int * len(toks))(*[int(t) for t in toks])
            self._lib.eet_trie_add_word(self._h, arr, len(toks),
                                        len(self.words))
            self.words.append(word)
        self.vocab_size = vocab_size
        self.blank = blank
        self.beam_size = beam_size
        self.word_score = word_score
        self.beam_threshold = beam_threshold
        self.lm = None
        self.lm_weight = 0.0
        if lm is not None:
            self.set_lm(lm, lm_weight)

    def set_lm(self, lm: "ArpaLM", lm_weight: float = 1.0) -> None:
        """Attach (or retune) the shallow-fusion LM. Lexicon words absent
        from the LM vocabulary score as its <unk>."""
        from early_exit_tpu.decoding.ngram_lm import ArpaLM  # noqa: F401
        lex2lm = (ctypes.c_int * len(self.words))(
            *[lm.word_id(w) for w in self.words])
        self._lib.eet_trie_set_lm(self._h, lm._h,
                                  ctypes.c_float(lm_weight), lex2lm,
                                  len(self.words))
        self.lm = lm          # keep the LM alive for the trie's lifetime
        self.lm_weight = lm_weight

    def _configure(self):
        c = ctypes
        lib = self._lib
        if getattr(lib, "_trie_configured", False):
            return
        lib.eet_trie_create.restype = c.c_void_p
        lib.eet_trie_create.argtypes = [c.c_int]
        lib.eet_trie_free.argtypes = [c.c_void_p]
        lib.eet_trie_add_word.argtypes = [c.c_void_p, c.POINTER(c.c_int),
                                          c.c_int, c.c_int]
        lib.eet_trie_num_nodes.restype = c.c_long
        lib.eet_trie_num_nodes.argtypes = [c.c_void_p]
        lib.eet_trie_decode.restype = c.c_int
        lib.eet_trie_decode.argtypes = [
            c.c_void_p, c.POINTER(c.c_float), c.c_int, c.c_int, c.c_int,
            c.c_float, c.c_int, c.c_float, c.POINTER(c.c_int), c.c_int,
            c.POINTER(c.c_float)]
        lib.eet_trie_decode_nbest.restype = c.c_int
        lib.eet_trie_decode_nbest.argtypes = [
            c.c_void_p, c.POINTER(c.c_float), c.c_int, c.c_int, c.c_int,
            c.c_float, c.c_int, c.c_float, c.c_int, c.POINTER(c.c_int),
            c.c_int, c.POINTER(c.c_int), c.POINTER(c.c_float)]
        lib.eet_trie_set_lm.argtypes = [c.c_void_p, c.c_void_p, c.c_float,
                                        c.POINTER(c.c_int), c.c_int]
        lib._trie_configured = True

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.eet_trie_free(self._h)
        except Exception:
            pass

    @classmethod
    def from_files(cls, lexicon_path: str, tokens_path: str, *,
                   blank_token: str = "@", **kw) -> "LexiconBeamDecoder":
        """Build from the reference's artifact formats: a `.tok` file
        (one piece per line, line index = token id) and a `.lex` file
        (`word<TAB>piece piece ...`), e.g.
        sentencepiece/build/librispeech-bpe-256.{tok,lex}."""
        with open(tokens_path, encoding="utf-8") as f:
            tokens = [l.rstrip("\n") for l in f]
        piece_to_id = {p: i for i, p in enumerate(tokens)}
        entries = []
        dropped = 0
        with open(lexicon_path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                word, _, pieces = line.partition("\t")
                ids = [piece_to_id[p] for p in pieces.split(" ")
                       if p in piece_to_id]
                if ids:
                    entries.append((word, ids))
                else:
                    dropped += 1
        if dropped:
            print(f"warning: {dropped} lexicon entries dropped — their "
                  f"pieces are absent from {tokens_path} (mismatched "
                  f"lexicon/tokens pair?)")
        blank = piece_to_id.get(blank_token, 0)
        return cls(entries, len(tokens), blank=blank, **kw)

    def decode(self, log_probs: np.ndarray) -> Tuple[str, float]:
        """log_probs: (T, V) -> (transcript, score)."""
        lp = np.ascontiguousarray(log_probs, np.float32)
        T, V = lp.shape
        assert V == self.vocab_size, (V, self.vocab_size)
        out = (ctypes.c_int * 512)()
        score = ctypes.c_float()
        n = self._lib.eet_trie_decode(
            self._h, lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            T, V, self.blank, self.word_score, self.beam_size,
            self.beam_threshold, out, len(out), ctypes.byref(score))
        if n < 0:
            return "", float("-inf")
        return " ".join(self.words[out[i]] for i in range(n)), score.value

    def decode_nbest(self, log_probs: np.ndarray, nbest: int
                     ) -> List[Tuple[str, float]]:
        """`ctc_predict` parity (util/beam_infer.py:115-126): returns up
        to `nbest` complete hypotheses as (transcript, score), best
        first. The reference softmaxes the nbest scores to a posterior;
        do that on the returned scores if needed."""
        lp = np.ascontiguousarray(log_probs, np.float32)
        T, V = lp.shape
        out = (ctypes.c_int * 4096)()
        counts = (ctypes.c_int * nbest)()
        scores = (ctypes.c_float * nbest)()
        n = self._lib.eet_trie_decode_nbest(
            self._h, lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            T, V, self.blank, self.word_score, self.beam_size,
            self.beam_threshold, nbest, out, len(out), counts, scores)
        results = []
        pos = 0
        for i in range(max(n, 0)):
            words = [self.words[out[pos + j]] for j in range(counts[i])]
            pos += counts[i]
            results.append((" ".join(words), float(scores[i])))
        return results

    def decode_batch(self, log_probs: np.ndarray,
                     lengths=None) -> List[str]:
        """(B, T, V) -> transcripts; parity with ctc_predict_'s list
        output (beam_infer.py:93-99)."""
        outs = []
        for b in range(log_probs.shape[0]):
            lp = log_probs[b]
            if lengths is not None:
                lp = lp[:int(lengths[b])]
            outs.append(self.decode(lp)[0])
        return outs
