"""ARPA n-gram LM (native) — python surface for shallow fusion.

The reference's flashlight decoders take an optional KenLM with
`lm_weight` (util/beam_infer.py:56-75; LM_WEIGHT=1.0 and the commented
`lm="lm.bin"` / `4gram_small.arpa.lm` at beam_infer.py:77-78 show the
intended use, but no LM ships). This wraps the self-contained C++ ARPA
reader (csrc/beam/arpa_lm.cc); attach to a LexiconBeamDecoder via its
`lm=`/`lm_weight=` arguments. Scores are natural log.
"""

from __future__ import annotations

import ctypes
from typing import Sequence

from early_exit_tpu import _native


class ArpaLM:
    def __init__(self, path: str):
        self._lib = _native.get_lib()
        self._configure()
        self._h = self._lib.eet_lm_load(path.encode("utf-8"))
        if not self._h:
            raise ValueError(f"failed to parse ARPA LM: {path}")
        self.path = path

    def _configure(self):
        c = ctypes
        lib = self._lib
        if getattr(lib, "_lm_configured", False):
            return
        lib.eet_lm_load.restype = c.c_void_p
        lib.eet_lm_load.argtypes = [c.c_char_p]
        lib.eet_lm_free.argtypes = [c.c_void_p]
        lib.eet_lm_order.restype = c.c_int
        lib.eet_lm_order.argtypes = [c.c_void_p]
        lib.eet_lm_vocab_size.restype = c.c_int
        lib.eet_lm_vocab_size.argtypes = [c.c_void_p]
        lib.eet_lm_word_id.restype = c.c_int
        lib.eet_lm_word_id.argtypes = [c.c_void_p, c.c_char_p]
        lib.eet_lm_score_sequence.restype = c.c_float
        lib.eet_lm_score_sequence.argtypes = [c.c_void_p,
                                              c.POINTER(c.c_int), c.c_int,
                                              c.c_int]
        lib.eet_trie_set_lm.argtypes = [c.c_void_p, c.c_void_p, c.c_float,
                                        c.POINTER(c.c_int), c.c_int]
        lib._lm_configured = True

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.eet_lm_free(self._h)
        except Exception:
            pass

    @property
    def order(self) -> int:
        return self._lib.eet_lm_order(self._h)

    @property
    def vocab_size(self) -> int:
        return self._lib.eet_lm_vocab_size(self._h)

    def word_id(self, word: str) -> int:
        """LM word id, -1 when OOV."""
        return self._lib.eet_lm_word_id(self._h, word.encode("utf-8"))

    def score(self, words: Sequence[str], *, add_eos: bool = True) -> float:
        """Natural-log score of the word sequence from <s> (OOV words
        score as <unk>/floor), optionally closed with </s>."""
        ids = [self.word_id(w) for w in words]
        arr = (ctypes.c_int * max(len(ids), 1))(*ids)
        return float(self._lib.eet_lm_score_sequence(
            self._h, arr, len(ids), 1 if add_eos else 0))
