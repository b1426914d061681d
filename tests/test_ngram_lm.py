"""ARPA n-gram LM + shallow fusion in the lexicon beam.

The reference's flashlight decoders expose lm_weight and would score a
KenLM if supplied (util/beam_infer.py:62,71; commented lm= at 77-78);
these tests pin our native ARPA reader against hand-computed Katz-backoff
math and show lm_weight != 0 changing the 1-best as expected.
"""

import math
import os

import numpy as np
import pytest

from early_exit_tpu.decoding.lexicon_beam import LexiconBeamDecoder
from early_exit_tpu.decoding.ngram_lm import ArpaLM

LN10 = math.log(10.0)

# A tiny 2-gram model over {the, cat, sat} (log10 values).
TOY_ARPA = """\
\\data\\
ngram 1=6
ngram 2=4

\\1-grams:
-0.30103\t<s>\t-0.30103
-0.69897\t</s>
-0.52288\tthe\t-0.39794
-0.69897\tcat\t-0.30103
-0.90309\tsat\t-0.22185
-1.30103\t<unk>

\\2-grams:
-0.22185\t<s> the
-0.39794\tthe cat
-0.52288\tcat sat
-0.69897\tsat </s>

\\end\\
"""


@pytest.fixture(scope="module")
def toy_lm(tmp_path_factory):
    p = tmp_path_factory.mktemp("lm") / "toy.arpa"
    p.write_text(TOY_ARPA)
    return ArpaLM(str(p))


def test_metadata(toy_lm):
    assert toy_lm.order == 2
    assert toy_lm.vocab_size == 6
    assert toy_lm.word_id("cat") >= 0
    assert toy_lm.word_id("dog") == -1


def test_bigram_path_score(toy_lm):
    # "the cat sat" uses only existing bigrams:
    # P(the|<s>) P(cat|the) P(sat|cat) P(</s>|sat)
    want = (-0.22185 - 0.39794 - 0.52288 - 0.69897) * LN10
    got = toy_lm.score(["the", "cat", "sat"], add_eos=True)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_backoff_score(toy_lm):
    # "cat the": P(cat|<s>) backs off: bo(<s>) + P(cat);
    # P(the|cat) backs off: bo(cat) + P(the); no EOS.
    want = ((-0.30103 - 0.69897) + (-0.30103 - 0.52288)) * LN10
    got = toy_lm.score(["cat", "the"], add_eos=False)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_oov_scores_as_unk(toy_lm):
    # P(dog|<s>) -> <s> has no "dog" bigram: bo(<s>) + P(<unk>)
    want = (-0.30103 - 1.30103) * LN10
    got = toy_lm.score(["dog"], add_eos=False)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_invalid_file_raises(tmp_path):
    p = tmp_path / "bad.arpa"
    p.write_text("not an arpa file\n")
    with pytest.raises(ValueError):
        ArpaLM(str(p))


# ---- fusion in the lexicon beam -----------------------------------------

def _emissions(seq_probs, T, V):
    """Near-uniform emissions with mild frame preferences from seq_probs:
    list of (frame, token, logit_boost)."""
    logits = np.zeros((T, V), np.float32)
    for t, tok, boost in seq_probs:
        logits[t, tok] += boost
    x = logits - logits.max(-1, keepdims=True)
    p = np.exp(x)
    p /= p.sum(-1, keepdims=True)
    return np.log(p).astype(np.float32)


@pytest.fixture(scope="module")
def fusion_setup(tmp_path_factory):
    # two acoustically confusable words: "cat" = tokens [1,2],
    # "cap" = tokens [1,3]; the LM strongly prefers "cat"
    entries = [("cat", [1, 2]), ("cap", [1, 3])]
    arpa = """\\data\\
ngram 1=5

\\1-grams:
-0.5\t<s>
-0.5\t</s>
-0.3\tcat
-3.0\tcap
-2.0\t<unk>

\\end\\
"""
    p = tmp_path_factory.mktemp("lm2") / "uni.arpa"
    p.write_text(arpa)
    return entries, str(p)


def test_lm_weight_changes_one_best(fusion_setup):
    """Acoustics slightly prefer 'cap'; the LM prefers 'cat'. With
    lm_weight=0 the decode is 'cap'; raising lm_weight flips it
    (VERDICT r1 item 6 done-criterion)."""
    entries, arpa_path = fusion_setup
    V, T = 5, 6
    # token 1 then (token 3 slightly above token 2)
    lp = _emissions([(0, 1, 4.0), (1, 1, 4.0),
                     (2, 3, 2.2), (2, 2, 2.0),
                     (3, 3, 2.2), (3, 2, 2.0)], T, V)

    plain = LexiconBeamDecoder(entries, V, beam_size=8)
    hyp0, _ = plain.decode(lp)
    assert hyp0 == "cap"

    lm = ArpaLM(arpa_path)
    fused = LexiconBeamDecoder(entries, V, beam_size=8, lm=lm,
                               lm_weight=1.0)
    hyp1, _ = fused.decode(lp)
    assert hyp1 == "cat"

    # weight 0 with an LM attached must behave like no LM
    neutral = LexiconBeamDecoder(entries, V, beam_size=8, lm=lm,
                                 lm_weight=0.0)
    assert neutral.decode(lp)[0] == "cap"


def test_lm_shifts_scores_by_weighted_lm_score(fusion_setup):
    """With a unigram LM the fused score must equal the plain score plus
    lm_weight * (sum of word scores + </s>)."""
    entries, arpa_path = fusion_setup
    V, T = 5, 6
    lp = _emissions([(0, 1, 6.0), (1, 2, 6.0),          # clearly "cat"
                     (2, 0, 6.0), (3, 0, 6.0),          # then blanks
                     (4, 0, 6.0), (5, 0, 6.0)], T, V)
    plain = LexiconBeamDecoder(entries, V, beam_size=8)
    hyp, s0 = plain.decode(lp)
    assert hyp == "cat"
    lm = ArpaLM(arpa_path)
    for w in (0.5, 2.0):
        fused = LexiconBeamDecoder(entries, V, beam_size=8, lm=lm,
                                   lm_weight=w)
        hyp_w, s_w = fused.decode(lp)
        assert hyp_w == "cat"
        want = s0 + w * lm.score(["cat"], add_eos=True)
        np.testing.assert_allclose(s_w, want, rtol=1e-4)


def test_nbest_reranked_by_lm(fusion_setup):
    entries, arpa_path = fusion_setup
    V, T = 5, 6
    lp = _emissions([(0, 1, 4.0), (1, 1, 4.0),
                     (2, 3, 2.2), (2, 2, 2.0),
                     (3, 0, 6.0), (4, 0, 6.0), (5, 0, 6.0)], T, V)
    lm = ArpaLM(arpa_path)
    fused = LexiconBeamDecoder(entries, V, beam_size=8, lm=lm,
                               lm_weight=1.0)
    results = fused.decode_nbest(lp, nbest=2)
    assert [r[0] for r in results] == ["cat", "cap"]
    assert results[0][1] >= results[1][1]
