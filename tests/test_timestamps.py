"""Word-level timestamps from forced alignment (decoding/timestamps.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from early_exit_tpu.decoding import timestamps as ts


def _emission(T, V, placements, blank=0, hi=6.0):
    """Log-prob emission whose best path emits token v at frame t for each
    (t, v) in placements and blank elsewhere."""
    em = np.full((T, V), -hi, np.float32)
    em[:, blank] = hi
    for t, v in placements:
        em[t, blank] = -hi
        em[t, v] = hi
    return np.asarray(jax.nn.log_softmax(jnp.asarray(em), axis=-1))


def test_single_word_span_and_score():
    # pieces "▁ab" + "c" at frames 2 and 5; 0.1 s per frame
    em = _emission(10, 8, [(2, 3), (5, 4)])
    spans = ts.word_timestamps(em, 10, [3, 4], ["▁ab", "c"],
                               seconds_per_frame=0.1)
    assert len(spans) == 1
    w = spans[0]
    assert w.word == "abc"
    np.testing.assert_allclose(w.start, 0.2)
    # the final piece's span runs through the trailing blank frames
    # (torchaudio merge_repeats: a blank "stay" belongs to the most
    # recently emitted token), so the word ends at the last valid frame
    np.testing.assert_allclose(w.end, 1.0)   # (9 + 1) * 0.1
    assert 0.9 < w.score <= 1.0              # peaked emission


def test_multi_word_grouping_and_controls():
    # <s> ▁he llo ▁wo rld </s> at frames 0,2,4,6,8,10
    ids = [1, 3, 4, 5, 6, 2]
    pieces = ["<s>", "▁he", "llo", "▁wo", "rld", "</s>"]
    em = _emission(12, 8, list(zip([0, 2, 4, 6, 8, 10], ids)))
    spans = ts.word_timestamps(em, 12, ids, pieces, seconds_per_frame=0.5)
    assert [w.word for w in spans] == ["hello", "world"]
    np.testing.assert_allclose(spans[0].start, 1.0)   # frame 2
    # "llo" holds frames 4-5 (frame 6 advances to "▁wo"): end = 5 + 1
    np.testing.assert_allclose(spans[0].end, 3.0)
    np.testing.assert_allclose(spans[1].start, 3.0)
    # "rld" holds frames 8-9 (frame 10 advances to "</s>"): end = 9 + 1
    np.testing.assert_allclose(spans[1].end, 5.0)


def test_char_tokenizer_space_separation():
    # "ab c" as single-char pieces with a space separator
    ids = [3, 4, 5]
    em = _emission(8, 8, [(1, 3), (3, 4), (6, 5)])
    spans = ts.word_timestamps(em, 8, ids, ["a", "b", " "],
                               seconds_per_frame=0.1)
    # trailing space flushes "ab"; the space itself emits nothing
    assert [w.word for w in spans] == ["ab"]
    spans = ts.word_timestamps(em, 8, ids, ["a", " ", "c"],
                               seconds_per_frame=0.1)
    assert [w.word for w in spans] == ["a", "c"]


def test_alignment_is_softmax_invariant():
    rng = np.random.RandomState(0)
    raw = rng.randn(20, 10).astype(np.float32) * 3
    norm = np.asarray(jax.nn.log_softmax(jnp.asarray(raw), axis=-1))
    ids = [2, 7, 4]
    pieces = ["▁x", "y", "▁z"]
    a = ts.word_timestamps(raw, 20, ids, pieces, seconds_per_frame=0.04)
    b = ts.word_timestamps(norm, 20, ids, pieces, seconds_per_frame=0.04)
    assert [(w.word, w.start, w.end) for w in a] == \
           [(w.word, w.start, w.end) for w in b]
    np.testing.assert_allclose([w.score for w in a],
                               [w.score for w in b], rtol=1e-6)


def test_infeasible_and_empty():
    em = _emission(2, 6, [(0, 3)])
    assert ts.word_timestamps(em, 2, [3, 4, 5], ["▁a", "b", "c"],
                              seconds_per_frame=0.1) == []
    assert ts.word_timestamps(em, 2, [], [], seconds_per_frame=0.1) == []


def test_pieces_of_dispatch():
    class Spm:
        def id_to_piece(self, i):
            return f"<p{i}>"

    class Chars:
        def int_to_text(self, ids):
            return "abc"[ids[0]]

    assert ts.pieces_of(Spm(), [1, 2]) == ["<p1>", "<p2>"]
    assert ts.pieces_of(Chars(), [0, 2]) == ["a", "c"]


def test_format_spans():
    s = ts.format_spans([ts.WordSpan("hi", 0.5, 1.0, 0.93)])
    assert s == "hi[0.50-1.00|0.93]"


def test_cli_flag_parses():
    from early_exit_tpu.cli import get_parser
    base = ["--decoder_mode", "ctc"]
    assert get_parser().parse_args(
        base + ["--timestamps", "true"]).timestamps is True
    assert get_parser().parse_args(base).timestamps is False
