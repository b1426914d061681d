"""Tokenizer golden tests against the reference's shipped SentencePiece
artifacts (sentencepiece/build/): the binary .model, the .vocab dump, the
.tok token list, and the 89k-entry .lex (word -> spm_encode pieces),
which together pin byte-level encode/decode parity without needing the
sentencepiece library."""

import os

import pytest

from early_exit_tpu.tokenizer import SentencePieceBPE, CharTokenizer
from early_exit_tpu.tokenizer import proto

BUILD = "/root/reference/sentencepiece/build"
MODEL = os.path.join(BUILD, "libri.bpe-256.model")

pytestmark = pytest.mark.skipif(not os.path.exists(MODEL),
                                reason="reference artifacts not mounted")


@pytest.fixture(scope="module")
def tok():
    return SentencePieceBPE(proto.parse_model(MODEL))


def test_vocab_matches_dump(tok):
    with open(os.path.join(BUILD, "libri.bpe-256.vocab"),
              encoding="utf-8") as f:
        lines = [l.rstrip("\n").split("\t") for l in f]
    assert tok.get_piece_size() == len(lines) == 256
    for i, (piece, score) in enumerate(lines):
        assert tok.id_to_piece(i) == piece
        assert abs(tok.scores[i] - float(score)) < 1e-6


def test_special_ids(tok):
    # spm_train flags: --pad_id=126 --unk_id=127 --bos_id=1 --eos_id=2
    # --user_defined_symbols="@" (sentencepiece/build/commands:1)
    assert tok.bos_id() == 1
    assert tok.eos_id() == 2
    assert tok.pad_id() == 126
    assert tok.unk_id() == 127
    assert tok.id_to_piece(0) == "@"          # CTC blank
    assert tok.types[0] == proto.USER_DEFINED


def test_tok_file_is_lowercased_pieces(tok):
    with open(os.path.join(BUILD, "librispeech-bpe-256.tok"),
              encoding="utf-8") as f:
        toks = [l.rstrip("\n") for l in f]
    assert len(toks) == 256
    for i, t in enumerate(toks):
        assert tok.id_to_piece(i).lower() == t


def test_encode_matches_lexicon_golden(tok):
    """Every .lex row is word -> pieces as produced by the real spm_encode
    on the uppercased word (then lowercased; build/commands:2). Encoding
    the uppercase word must reproduce the pieces exactly."""
    lex = os.path.join(BUILD, "librispeech-bpe-256.lex")
    n_checked = 0
    with open(lex, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            word, pieces_str = line.split("\t")
            expect = pieces_str.split(" ")
            got = [p.lower() for p in tok.encode_as_pieces(word.upper())]
            assert got == expect, (word, got, expect)
            n_checked += 1
    assert n_checked == 89114


def test_encode_decode_roundtrip(tok):
    for text in ["THE QUICK BROWN FOX", "HELLO WORLD", "A", "IT'S",
                 "SOMETHING LONGER WITH MANY WORDS IN IT"]:
        ids = tok.encode_as_ids(text)
        assert all(0 <= i < 256 for i in ids)
        assert tok.decode(ids) == text


def test_decode_skips_control_tokens(tok):
    ids = [tok.bos_id()] + tok.encode_as_ids("THE CAT") + [tok.eos_id()]
    assert tok.decode(ids) == "THE CAT"


def test_multiword_spacing(tok):
    ids = tok.encode_as_ids("OF THE")
    text = tok.decode(ids)
    assert text == "OF THE"


def test_char_tokenizer_roundtrip():
    ct = CharTokenizer()
    ids = ct.text_to_int("^" + "hello world" + "$")
    assert ids[0] == 1 and ids[-1] == 31
    assert ct.int_to_text(ids) == "^hello world$"
    assert ct.decode(ids) == "hello world"
    assert ct.char_to_id[" "] == 28 and ct.char_to_id["@"] == 0


def test_bpe128_variant_model():
    """The 128-piece variant artifact loads and round-trips too."""
    path = os.path.join(BUILD, "libri.bpe-128.model")
    if not os.path.exists(path):
        pytest.skip("128 variant not mounted")
    t = SentencePieceBPE(proto.parse_model(path))
    assert t.get_piece_size() == 128
    assert t.pad_id() == 126 or t.pad_id() == -1 or t.pad_id() >= 0
    ids = t.encode_as_ids("THE QUICK BROWN FOX")
    assert t.decode(ids) == "THE QUICK BROWN FOX"
