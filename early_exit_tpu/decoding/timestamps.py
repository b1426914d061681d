"""Word-level timestamps from CTC forced alignment.

Built on the trellis/backtrack pair (decoding/forced_align.py — parity
with util/beam_infer.py:129-191): the reference computes the alignment
trellis but never surfaces timestamps. This completes it into the
standard product feature (the torchaudio forced-alignment recipe): align
a decoded hypothesis back to its emission, group subword pieces into
words at the SentencePiece word-boundary marker, and report per-word
start/end seconds plus a confidence.

The alignment path is softmax-invariant (both trellis transitions add an
emission term from the SAME frame, so a per-frame additive constant
cancels in the max), so raw-logit emissions — the cheap greedy head mode
— align identically to log-probs; per-word confidences are normalized
on the host over just the L emission frames.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from early_exit_tpu.decoding.forced_align import forced_align


@dataclasses.dataclass
class WordSpan:
    word: str
    start: float          # seconds
    end: float            # seconds
    score: float          # exp(mean per-piece log-prob), in (0, 1]


def pieces_of(tokenizer, ids: Sequence[int]) -> List[str]:
    """Surface pieces for a decoded id sequence, for any tokenizer kind
    (SentencePiece engines expose id_to_piece; the legacy char tokenizer
    maps each id to one character)."""
    if hasattr(tokenizer, "id_to_piece"):
        return [tokenizer.id_to_piece(int(i)) for i in ids]
    return [tokenizer.int_to_text([int(i)]) for i in ids]


def _is_control(piece: str) -> bool:
    return len(piece) > 2 and piece[0] == "<" and piece[-1] == ">"


def word_timestamps(emission, n_frames: int, token_ids: Sequence[int],
                    pieces: Sequence[str], *, blank: int = 0,
                    seconds_per_frame: float) -> List[WordSpan]:
    """Align one utterance's decoded hypothesis to its emission.

    emission: (T, V) log-probs or raw logits of the decoding exit.
    n_frames: valid frames. token_ids/pieces: the collapsed hypothesis
    (greedy/prefix-beam output), ids and their surfaces, same length.
    seconds_per_frame: duration of one subsampled frame.

    Control pieces (``<s>``, ``</s>``, ``<pad>``, …) are aligned — the
    CTC heads are trained with bos/eos in the targets — but emit no word
    (the same silence-like rule the lexicon beam uses).
    """
    ids = [int(i) for i in token_ids]
    if len(ids) != len(pieces):
        raise ValueError("token_ids and pieces length mismatch")
    if not ids:
        return []
    em = np.asarray(emission)[: int(n_frames)]
    starts, ends, _ = forced_align(jnp.asarray(em),
                                   jnp.asarray(ids, jnp.int32), blank)
    if np.any(starts < 0):   # infeasible (|y| > frames): no alignment
        return []
    # normalized per-piece log-prob at each emission frame (L rows only)
    rows = em[starts].astype(np.float64)                      # (L, V)
    logz = np.log(np.sum(np.exp(rows - rows.max(axis=1, keepdims=True)),
                         axis=1)) + rows.max(axis=1)
    piece_logp = rows[np.arange(len(ids)), ids] - logz

    words: List[WordSpan] = []
    cur: List[int] = []      # piece indices of the open word
    text = ""

    def flush():
        nonlocal cur, text
        if cur and text:
            t0 = float(starts[cur[0]]) * seconds_per_frame
            # end-exclusive: last aligned frame of the final piece + 1
            # (a piece held over several frames keeps its full span)
            t1 = (float(ends[cur[-1]]) + 1.0) * seconds_per_frame
            words.append(WordSpan(text, round(t0, 3), round(t1, 3),
                                  float(np.exp(piece_logp[cur].mean()))))
        cur, text = [], ""

    for i, piece in enumerate(pieces):
        if _is_control(piece) or piece.strip() in ("", "▁"):
            flush()                      # separator / control: word break
            continue
        if piece.startswith("▁"):   # SentencePiece word boundary
            flush()
            piece = piece[1:]
        cur.append(i)
        text += piece
    flush()
    return words


def format_spans(spans: List[WordSpan]) -> str:
    return " ".join(f"{w.word}[{w.start:.2f}-{w.end:.2f}|{w.score:.2f}]"
                    for w in spans)
