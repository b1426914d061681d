import os

import pytest

from early_exit_tpu.decoding import lexicon


def test_edit_distance():
    assert lexicon.edit_distance("", "") == 0
    assert lexicon.edit_distance("abc", "abc") == 0
    assert lexicon.edit_distance("abc", "abd") == 1
    assert lexicon.edit_distance("kitten", "sitting") == 3
    assert lexicon.edit_distance("", "abc") == 3


def test_apply_lex_in_vocab_passthrough():
    lc = lexicon.LexiconCorrector(["the", "cat", "sat"])
    assert lc.apply("the cat sat") == "the cat sat"


def test_apply_lex_snaps_oov():
    lc = lexicon.LexiconCorrector(["the", "cat", "hat", "hello"])
    assert lc.snap_word("kat") in ("cat", "hat")
    assert lc.apply("teh") == "the"
    assert lc.apply("helo") == "hello"


def test_apply_lex_reference_signature():
    out = lexicon.apply_lex("teh cat", ["the", "cat"])
    assert out == "the cat"


@pytest.mark.skipif(not os.path.exists("/root/reference/librispeech.lex"),
                    reason="reference lexicon not mounted")
def test_loads_reference_lexicon():
    entries = lexicon.load_dict("/root/reference/librispeech.lex")
    assert len(entries) == 89114
    lc = lexicon.LexiconCorrector(entries)
    assert lc.apply("the") == "the"
    # an OOV word snaps to something close
    snapped = lc.snap_word("thhe")
    assert lexicon.edit_distance("thhe", snapped) <= 2
