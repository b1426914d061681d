import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")

from early_exit_tpu.decoding.lexicon_beam import LexiconBeamDecoder

# toy vocab: 0=blank, 1=a, 2=b, 3=c
ENTRIES = [("ab", [1, 2]), ("ba", [2, 1]), ("abc", [1, 2, 3]),
           ("c", [3])]


def _emit(path, V=4, hi=0.0, lo=-8.0):
    lp = np.full((len(path), V), lo, np.float32)
    for t, tok in enumerate(path):
        lp[t, tok] = hi
    # renormalise-ish (not strictly needed by the decoder)
    return lp


def test_decodes_clear_word():
    dec = LexiconBeamDecoder(ENTRIES, 4, beam_size=8)
    # a b with blanks around -> "ab"
    lp = _emit([0, 1, 0, 2, 0])
    text, score = dec.decode(lp)
    assert text == "ab"


def test_lexicon_constraint_forbids_oov():
    """Emissions spell 'b c' (tokens 2,3) but 'bc' is not a word; the
    decoder must produce lexicon words only."""
    dec = LexiconBeamDecoder(ENTRIES, 4, beam_size=8)
    lp = _emit([0, 2, 0, 3, 0], hi=0.0, lo=-3.0)
    text, _ = dec.decode(lp)
    for w in text.split():
        assert w in dict(ENTRIES)


def test_two_words():
    # Token stream a b c is genuinely ambiguous between "ab c" and "abc"
    # (identical token sequences, identical acoustic mass), so a positive
    # word_score makes the two-word reading strictly better.
    dec = LexiconBeamDecoder(ENTRIES, 4, beam_size=8, word_score=0.5)
    lp = _emit([1, 2, 0, 3, 0])
    text, _ = dec.decode(lp)
    assert text == "ab c"


def test_word_score_bias():
    """Negative word_score discourages splitting into more words."""
    # tokens a b c could be "abc" (1 word) or "ab"+"c" (2 words)
    lp = _emit([1, 2, 3, 0])
    one = LexiconBeamDecoder(ENTRIES, 4, beam_size=8, word_score=-5.0)
    text, _ = one.decode(lp)
    assert text == "abc"


def test_repeat_tokens_need_blank():
    entries = [("aa", [1, 1]), ("a", [1])]
    # word_score < 0 prefers fewer words, breaking the "aa" vs "a a" tie
    dec = LexiconBeamDecoder(entries, 4, beam_size=8, word_score=-1.0)
    # a a without blank collapses to one 'a'
    text, _ = dec.decode(_emit([1, 1, 0]))
    assert text == "a"
    # a blank a -> "aa"
    text2, _ = dec.decode(_emit([1, 0, 1]))
    assert text2 == "aa"


def test_from_reference_artifacts():
    import os
    build = "/root/reference/sentencepiece/build"
    tok = os.path.join(build, "librispeech-bpe-256.tok")
    lex = os.path.join(build, "librispeech-bpe-256.lex")
    if not os.path.exists(tok):
        pytest.skip("reference artifacts not mounted")
    dec = LexiconBeamDecoder.from_files(lex, tok, beam_size=4)
    assert len(dec.words) > 80000
    assert dec.blank == 0          # '@' is id 0
    # decode a synthetic emission of the pieces for "the" (▁the)
    with open(tok, encoding="utf-8") as f:
        toks = [l.rstrip("\n") for l in f]
    the_id = toks.index("▁the")
    lp = np.full((5, 256), -10.0, np.float32)
    lp[:, 0] = -0.5
    lp[2, the_id] = 0.0
    text, _ = dec.decode(lp)
    assert text == "the"


def test_nbest_hypotheses():
    dec = LexiconBeamDecoder(ENTRIES, 4, beam_size=8)
    # ambiguous: could be "abc" or "ab"+"c"
    lp = _emit([1, 2, 3, 0], hi=0.0, lo=-2.0)
    results = dec.decode_nbest(lp, nbest=4)
    assert len(results) >= 2
    texts = [t for t, _ in results]
    scores = [s for _, s in results]
    assert scores == sorted(scores, reverse=True)
    assert "abc" in texts or "ab c" in texts
    # best hypothesis equals the single-best decode
    assert texts[0] == dec.decode(lp)[0]
