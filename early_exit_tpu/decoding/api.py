"""Unified decoding facade — the `BeamInference` surface, TPU-native.

The reference bundles every decoding strategy in one object constructed
from args (util/beam_infer.py:34-82: a greedy decoder, a bank of
flashlight lexicon decoders, a CUDA prefix-beam decoder, forced-alignment
helpers, and the AED beam search). `DecoderSuite` is the equivalent
front door over this framework's implementations:

    suite = DecoderSuite(model_cfg, beam_size=10,
                         lexicon_path=..., tokens_path=...)
    suite.greedy(log_probs, lengths)          # GreedyCTCDecoder
    suite.ctc_prefix(log_probs, lengths)      # ~ cuda_ctc_decoder
    suite.ctc_lexicon(log_probs, lengths)     # ~ flashlight ctc_decoder
    suite.aed_beam(params, memory, n_exit, ...)  # beam_search
    suite.align(emission, tokens)             # get_trellis + backtrack
"""

from __future__ import annotations

from typing import List, Optional

import jax
import numpy as np

from early_exit_tpu.configs import ModelConfig
from early_exit_tpu.decoding import aed_beam, forced_align, prefix_beam
from early_exit_tpu.ops import ctc as ctc_ops


class DecoderSuite:
    def __init__(self, model_cfg: ModelConfig, *, beam_size: int = 10,
                 pen_alpha: float = 1.0,
                 blank_skip_threshold: float = 0.95,
                 word_score: float = 0.0, nbest: int = 1,
                 lexicon_path: Optional[str] = None,
                 tokens_path: Optional[str] = None,
                 lm_path: Optional[str] = None, lm_weight: float = 1.0):
        self.cfg = model_cfg
        self.beam_size = beam_size
        self.pen_alpha = pen_alpha
        self.blank_skip_threshold = blank_skip_threshold
        self.nbest = nbest
        self._greedy = jax.jit(
            lambda lp, l: ctc_ops.greedy_decode(lp, l,
                                                blank=model_cfg.blank_id))
        self._prefix = jax.jit(
            lambda lp, l: prefix_beam.prefix_beam_search(
                lp, l, beam_size=beam_size, blank=model_cfg.blank_id,
                blank_skip_threshold=blank_skip_threshold, nbest=nbest))
        self._trie = None
        if lexicon_path and tokens_path:
            from early_exit_tpu.decoding.lexicon_beam import (
                LexiconBeamDecoder)
            lm = None
            if lm_path:
                from early_exit_tpu.decoding.ngram_lm import ArpaLM
                lm = ArpaLM(lm_path)
            self._trie = LexiconBeamDecoder.from_files(
                lexicon_path, tokens_path, beam_size=beam_size,
                word_score=word_score, lm=lm, lm_weight=lm_weight)

    # -- CTC ---------------------------------------------------------------
    def greedy(self, log_probs, lengths):
        """(B, T, V), (B,) -> (tokens (B, T), n_tokens (B,))."""
        return self._greedy(log_probs, lengths)

    def ctc_prefix(self, log_probs, lengths):
        """Batched prefix beam (blank-skip): -> (tokens, n_tokens, scores);
        with nbest>1 each has a leading (B, nbest, ...) rank axis."""
        return self._prefix(log_probs, lengths)

    def ctc_lexicon(self, log_probs, lengths=None) -> List[str]:
        """Lexicon-trie beam (native): -> word transcripts."""
        if self._trie is None:
            raise RuntimeError("DecoderSuite built without lexicon/tokens")
        return self._trie.decode_batch(np.asarray(log_probs),
                                       None if lengths is None
                                       else np.asarray(lengths))

    # -- AED ---------------------------------------------------------------
    def aed_beam(self, params, memory, n_exit: int, *, max_length: int,
                 min_length: int):
        return aed_beam.beam_search_exit(
            params, memory, self.cfg, n_exit=n_exit,
            beam_size=self.beam_size, max_length=max_length,
            min_length=min_length, pen_alpha=self.pen_alpha)

    # -- alignment ---------------------------------------------------------
    def align(self, emission, tokens):
        """Forced alignment -> (per-token start frames, per-token end
        frames, path score)."""
        return forced_align.forced_align(emission, tokens,
                                         blank=self.cfg.blank_id)
