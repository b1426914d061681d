"""Encode-time subword regularization: BPE-dropout sampling, unigram
lattice n-best and FFBS sampling (sentencepiece SampleEncode/NBestEncode
parity — reference vendored sentencepiece/src/bpe_model.cc:38-118 and
unigram_model.cc n-best / sampling; VERDICT r2 item 5)."""

import math
import random

import pytest

from early_exit_tpu.tokenizer import proto
from early_exit_tpu.tokenizer.bpe import SentencePieceBPE
from early_exit_tpu.tokenizer.spm import SentencePieceUnigram, load_tokenizer

BPE_MODEL = ("/root/reference/sentencepiece/build/libri.bpe-256.model")
UNI_MODEL = "/root/reference/sentencepiece/python/test/test_model.model"


def _bpe():
    return load_tokenizer(BPE_MODEL, prefer_native=False)


def _uni():
    return load_tokenizer(UNI_MODEL, prefer_native=False)


# -- BPE dropout -----------------------------------------------------------

def test_bpe_alpha0_equals_deterministic():
    sp = _bpe()
    rng = random.Random(0)
    for text in ["HELLO WORLD", "THE QUICK BROWN FOX", "A", ""]:
        assert (sp.sample_encode_as_pieces(text, alpha=0.0, rng=rng)
                == sp.encode_as_pieces(text))
        assert sp.encode(text, nbest_size=-1, alpha=0.0) == sp.encode(text)


def test_bpe_alpha1_drops_every_merge():
    sp = _bpe()
    rng = random.Random(0)
    pieces = sp.sample_encode_as_pieces("HELLO WORLD", alpha=1.0, rng=rng)
    # every merge skipped -> single normalized characters
    assert all(len(p) == 1 for p in pieces)
    assert "".join(pieces) == "".join(sp.encode_as_pieces("HELLO WORLD"))


def test_bpe_dropout_roundtrip_and_varies():
    sp = _bpe()
    rng = random.Random(1)
    text = "THE QUICK BROWN FOX JUMPED OVER THE LAZY DOG"
    base = sp.encode_as_pieces(text)
    seen = set()
    for _ in range(20):
        pieces = sp.sample_encode_as_pieces(text, alpha=0.4, rng=rng)
        # surface string is invariant under any segmentation
        assert "".join(pieces) == "".join(base)
        assert sp.decode_pieces(pieces) == sp.decode_pieces(base)
        seen.add(tuple(pieces))
    assert len(seen) > 1, "dropout sampling produced no variety"


def test_bpe_nbest_unavailable():
    sp = _bpe()
    with pytest.raises(NotImplementedError):
        sp.nbest_encode_as_pieces("HELLO", 5)


def test_bpe_agenda_merge_matches_rescan_merge():
    """alpha=0 dropout path (agenda heap) must equal the O(n^2) rescan
    merge used by encode_as_pieces, including tie-breaks."""
    sp = _bpe()
    rng = random.Random(2)
    for text in ["MISSISSIPPI", "AARDVARK ANTHEM", "ZZZ", "DON'T STOP"]:
        norm = sp._normalize(text)
        for chunk, is_ud in sp._split_user_defined(norm):
            if not is_ud:
                assert (sp._bpe_merge_dropout(list(chunk), 0.0, rng)
                        == sp._bpe_merge(list(chunk)))


# -- unigram n-best --------------------------------------------------------

def test_unigram_nbest_head_is_viterbi():
    sp = _uni()
    assert isinstance(sp, SentencePieceUnigram)
    for text in ["I saw a girl", "hello world.", "this is a test"]:
        options = sp.nbest_encode_as_pieces(text, 5)
        assert options[0][0] == sp.encode_as_pieces(text)
        scores = [s for _, s in options]
        assert scores == sorted(scores, reverse=True)
        # all segmentations render the same surface text
        for pieces, _ in options:
            assert sp.decode_pieces(pieces) == sp.decode_pieces(options[0][0])
        # distinct segmentations
        assert len({tuple(p) for p, _ in options}) == len(options)


def test_unigram_sampling_roundtrip():
    sp = _uni()
    rng = random.Random(3)
    text = "I have a pen."
    base = sp.encode_as_pieces(text)
    seen = set()
    for _ in range(20):
        pieces = sp.sample_encode_as_pieces(text, alpha=0.5, rng=rng)
        assert sp.decode_pieces(pieces) == sp.decode_pieces(base)
        seen.add(tuple(pieces))
    assert len(seen) > 1
    # nbest-restricted sampling draws only from the n-best set
    options = {tuple(p) for p, _ in sp.nbest_encode_as_pieces(text, 3)}
    for _ in range(10):
        pieces = sp.sample_encode_as_pieces(text, alpha=0.5, rng=rng,
                                            nbest_size=3)
        assert tuple(pieces) in options


def test_unigram_encode_ids_surface():
    sp = _uni()
    ids = sp.encode("I saw a girl", nbest_size=-1, alpha=0.3,
                    rng=random.Random(4))
    assert isinstance(ids, list) and all(isinstance(i, int) for i in ids)
    assert sp.decode(ids) == sp.decode(sp.encode("I saw a girl"))


# -- FFBS exactness on a hand-built lattice --------------------------------

def _tiny_unigram():
    pieces = [
        proto.SentencePieceEntry("<unk>", 0.0, proto.UNKNOWN),
        proto.SentencePieceEntry("▁", -1.0, proto.NORMAL),
        proto.SentencePieceEntry("a", -1.0, proto.NORMAL),
        proto.SentencePieceEntry("b", -1.0, proto.NORMAL),
        proto.SentencePieceEntry("ab", -1.5, proto.NORMAL),
        proto.SentencePieceEntry("▁a", -1.2, proto.NORMAL),
    ]
    data = proto.ModelData(
        pieces=pieces,
        trainer={"model_type": 1, "unk_id": 0, "bos_id": -1,
                 "eos_id": -1, "pad_id": -1},
        normalizer={"add_dummy_prefix": 1, "remove_extra_whitespaces": 1})
    return SentencePieceUnigram(data)


def test_unigram_ffbs_matches_lattice_posterior():
    """Empirical sampling frequencies track P(seg) ∝ exp(alpha·score)
    for an enumerable lattice: '▁ab' has exactly three segmentations."""
    sp = _tiny_unigram()
    segs = {("▁", "a", "b"): -3.0, ("▁", "ab"): -2.5,
            ("▁a", "b"): -2.2}
    options = sp.nbest_encode_as_pieces("ab", 10)
    assert {tuple(p): s for p, s in options} == segs

    alpha = 1.0
    z = sum(math.exp(alpha * s) for s in segs.values())
    want = {k: math.exp(alpha * s) / z for k, s in segs.items()}
    rng = random.Random(5)
    n = 4000
    counts = {k: 0 for k in segs}
    for _ in range(n):
        counts[tuple(sp.sample_encode_as_pieces("ab", alpha=alpha,
                                                rng=rng))] += 1
    for k in segs:
        assert abs(counts[k] / n - want[k]) < 0.03, (k, counts[k] / n,
                                                     want[k])
