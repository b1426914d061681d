"""Unigram / char / word SentencePiece model types (pure Python engines).

Completes the SentencePieceProcessor surface for all four model types the
vendored library supports (reference: sentencepiece/src/unigram_model.cc,
word_model.cc, char_model.cc; TrainerSpec.ModelType UNIGRAM=1 BPE=2
WORD=3 CHAR=4).  The BPE engine lives in `bpe.py`; these share its
normalization (charsmap + whitespace escape) and decode paths.

Unigram encoding is Viterbi segmentation: the token sequence maximizing
the sum of piece log-probabilities (the `score` field of each piece).
Characters not covered by any piece become `<unk>` with a score of
(min piece score - 10); adjacent unknowns merge into a single unk piece,
matching the vendored encoder's behavior.
"""

from __future__ import annotations

from typing import List

from early_exit_tpu.tokenizer import proto
from early_exit_tpu.tokenizer.bpe import WS, SentencePieceBPE

_UNK_PENALTY = 10.0

UNIGRAM, BPE, WORD, CHAR = 1, 2, 3, 4


class SentencePieceUnigram(SentencePieceBPE):
    """Viterbi max-likelihood segmentation over the unigram vocabulary."""

    def __init__(self, model: proto.ModelData):
        super().__init__(model)
        scores = [p.score for p in model.pieces
                  if p.type == proto.NORMAL]
        min_score = min(scores) if scores else 0.0
        self.unk_score = min_score - _UNK_PENALTY
        self.max_piece_chars = max(
            (len(p) for p in self.vocab_score), default=1)

    def _segment(self, chars: List[str]) -> List[str]:
        n = len(chars)
        neg_inf = float("-inf")
        best = [neg_inf] * (n + 1)
        best[0] = 0.0
        # back[j] = (i, piece, is_unk) — best path arrives at j from i
        back: List[tuple] = [None] * (n + 1)
        for i in range(n):
            if best[i] == neg_inf:
                continue
            limit = min(n, i + self.max_piece_chars)
            for j in range(i + 1, limit + 1):
                piece = "".join(chars[i:j])
                s = self.vocab_score.get(piece)
                if s is not None and best[i] + s > best[j]:
                    best[j] = best[i] + s
                    back[j] = (i, piece, False)
            # single-character unk fallback keeps the lattice connected
            if best[i] + self.unk_score > best[i + 1]:
                best[i + 1] = best[i] + self.unk_score
                back[i + 1] = (i, chars[i], True)
        pieces: List[tuple] = []
        j = n
        while j > 0:
            i, piece, is_unk = back[j]
            pieces.append((piece, is_unk))
            j = i
        pieces.reverse()
        # merge adjacent unknowns into one unk piece (vendored behavior)
        out: List[str] = []
        prev_unk = False
        for piece, is_unk in pieces:
            if is_unk and prev_unk:
                out[-1] += piece
            else:
                out.append(piece)
            prev_unk = is_unk
        return out

    def encode_as_pieces(self, text: str) -> List[str]:
        norm = self._normalize(text)
        pieces: List[str] = []
        for chunk, is_ud in self._split_user_defined(norm):
            if is_ud:
                pieces.append(chunk)
            else:
                pieces.extend(self._segment(list(chunk)))
        return pieces


class SentencePieceChar(SentencePieceBPE):
    """One piece per normalized character (model_type=CHAR)."""

    def encode_as_pieces(self, text: str) -> List[str]:
        return list(self._normalize(text))


class SentencePieceWord(SentencePieceBPE):
    """One piece per whitespace-delimited word (model_type=WORD); each
    word carries its leading ▁ marker, as the trainer emits them."""

    def encode_as_pieces(self, text: str) -> List[str]:
        norm = self._normalize(text)
        words = [w for w in norm.split(WS) if w]
        return [WS + w for w in words]


_ENGINES = {UNIGRAM: SentencePieceUnigram, BPE: SentencePieceBPE,
            WORD: SentencePieceWord, CHAR: SentencePieceChar}


def load_tokenizer(model_path: str, *, prefer_native: bool = True):
    """Load any SentencePiece `.model` (unigram/bpe/word/char), preferring
    the C++ engine when it is built and supports the model type."""
    data = proto.parse_model(model_path)
    model_type = int(data.trainer.get("model_type", UNIGRAM))
    if model_type not in _ENGINES:
        raise ValueError(
            f"{model_path}: unsupported model_type={model_type} "
            f"(unigram=1, bpe=2, word=3, char=4)")
    if prefer_native:
        try:
            from early_exit_tpu.tokenizer.native import NativeBPE
            return NativeBPE(model_path)
        except Exception:
            pass
    return _ENGINES[model_type](data)
