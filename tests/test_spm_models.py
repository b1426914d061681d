"""Unigram/char/word model types + precompiled-charsmap normalizer.

Validation data: the reference's own artifacts — the BPE models carry a
real nmt_nfkc precompiled charsmap (sentencepiece/build/libri.bpe-256
.model, NormalizerSpec field 2), and sentencepiece/python/test/
test_model.model is a genuine unigram model — so the trie reader and the
Viterbi encoder are checked against blobs produced by the vendored
library itself.
"""

import os
import unicodedata

import pytest

from early_exit_tpu.tokenizer import proto
from early_exit_tpu.tokenizer.charsmap import Charsmap
from early_exit_tpu.tokenizer.spm import (
    SentencePieceChar, SentencePieceUnigram, SentencePieceWord,
    load_tokenizer)

REF_BPE = "/root/reference/sentencepiece/build/libri.bpe-256.model"
REF_UNIGRAM = "/root/reference/sentencepiece/python/test/test_model.model"

needs_ref = pytest.mark.skipif(not os.path.exists(REF_BPE),
                               reason="reference artifacts not present")


# ---------------------------------------------------------------- charsmap

@needs_ref
def test_charsmap_reader_against_real_nmt_nfkc_blob():
    d = proto.parse_model(REF_BPE)
    cm = Charsmap(d.normalizer["precompiled_charsmap"])
    # NFKC compatibility mappings the blob must contain
    for src in ["Ａ", "①", "ﬁ", " ", "①②", "ｶﾞ", "№", "Ⅸ"]:
        assert cm.normalize(src) == unicodedata.normalize("NFKC", src), src
    # printable ASCII is identity under nmt_nfkc
    s = "THE QUICK BROWN FOX 0123 ,.!?"
    assert cm.normalize(s) == s
    # nmt rules: C0 control characters are removed
    assert cm.normalize("A\x01B\x02C") == "ABC"


@needs_ref
def test_charsmap_full_rule_extraction():
    d = proto.parse_model(REF_BPE)
    cm = Charsmap(d.normalizer["precompiled_charsmap"])
    rules = cm.extract_rules()
    assert len(rules) > 100_000          # real NFKC table scale
    assert rules["Ａ".encode()] == b"A"
    assert rules[b"\x01"] == b""
    # longest-match: multi-codepoint keys exist (combining sequences)
    assert any(len(k.decode("utf-8", "ignore")) > 1 for k in rules)


@needs_ref
def test_bpe_engine_applies_model_charsmap():
    t = load_tokenizer(REF_BPE, prefer_native=False)
    # fullwidth letters normalize to ASCII before BPE segmentation:
    # both spellings must produce identical ids
    assert t.encode_as_ids("ＨＥＬＬＯ") == t.encode_as_ids("HELLO")


# ----------------------------------------------------------------- unigram

@needs_ref
def test_unigram_roundtrip_on_reference_model():
    t = load_tokenizer(REF_UNIGRAM, prefer_native=False)
    assert isinstance(t, SentencePieceUnigram)
    assert t.get_piece_size() == 1000
    for s in ["Hello world.", "I saw a girl with a telescope.",
              "this is a test"]:
        ids = t.encode_as_ids(s)
        assert t.decode(ids) == s
        assert all(0 <= i < 1000 for i in ids)


@needs_ref
def test_unigram_viterbi_is_optimal():
    """The returned segmentation's total score must equal the true
    maximum over all segmentations (brute force on short strings)."""
    t = load_tokenizer(REF_UNIGRAM, prefer_native=False)

    def brute_best(chars):
        n = len(chars)
        best = [float("-inf")] * (n + 1)
        best[0] = 0.0
        for i in range(n):
            for j in range(i + 1, n + 1):
                p = "".join(chars[i:j])
                s = t.vocab_score.get(p)
                if j == i + 1 and s is None:
                    s = t.unk_score
                if s is not None and best[i] + s > best[j]:
                    best[j] = best[i] + s
        return best[n]

    for text in ["Hello", "a test", "word."]:
        norm = t._normalize(text)
        pieces = t.encode_as_pieces(text)
        total = 0.0
        for p in pieces:
            s = t.vocab_score.get(p)
            if s is None:       # unk piece (possibly merged chars)
                total += t.unk_score * len(p)
            else:
                total += s
        assert total == pytest.approx(brute_best(list(norm)), abs=1e-4)


def _mk_model(pieces, model_type, path):
    entries = [proto.SentencePieceEntry("<unk>", 0.0, proto.UNKNOWN),
               proto.SentencePieceEntry("<s>", 0.0, proto.CONTROL),
               proto.SentencePieceEntry("</s>", 0.0, proto.CONTROL)]
    entries += [proto.SentencePieceEntry(p, s, proto.NORMAL)
                for p, s in pieces]
    blob = proto.serialize_model(
        entries,
        {"model_type": model_type, "vocab_size": len(entries),
         "unk_id": 0, "bos_id": 1, "eos_id": 2},
        {"name": "identity", "add_dummy_prefix": 1,
         "remove_extra_whitespaces": 1, "escape_whitespaces": 1})
    path.write_bytes(blob)
    return str(path)


def test_unigram_prefers_high_probability_pieces(tmp_path):
    # "ab" as one piece beats "a"+"b" iff its score is higher than the sum
    path = _mk_model([("▁", -1.0), ("a", -2.0), ("b", -2.0), ("ab", -3.0)],
                     1, tmp_path / "uni.model")
    t = load_tokenizer(path, prefer_native=False)
    assert t.encode_as_pieces("ab") == ["▁", "ab"]
    # now make the merged piece worse than the parts
    path2 = _mk_model([("▁", -1.0), ("a", -2.0), ("b", -2.0), ("ab", -5.0)],
                      1, tmp_path / "uni2.model")
    t2 = load_tokenizer(path2, prefer_native=False)
    assert t2.encode_as_pieces("ab") == ["▁", "a", "b"]


def test_unigram_unknowns_merge(tmp_path):
    path = _mk_model([("▁", -1.0), ("a", -2.0)], 1, tmp_path / "u.model")
    t = load_tokenizer(path, prefer_native=False)
    pieces = t.encode_as_pieces("axx")
    assert pieces == ["▁", "a", "xx"]          # both unks in ONE piece
    assert t.encode_as_ids("axx") == [3, 4, 0]  # unk_id = 0


# -------------------------------------------------------------- char/word

def test_char_model(tmp_path):
    path = _mk_model([("▁", -1.0), ("h", -2.0), ("i", -2.5)],
                     4, tmp_path / "c.model")
    t = load_tokenizer(path, prefer_native=False)
    assert isinstance(t, SentencePieceChar)
    assert t.encode_as_pieces("hi hi") == ["▁", "h", "i", "▁", "h", "i"]
    ids = t.encode_as_ids("hi hix")
    assert ids == [3, 4, 5, 3, 4, 5, 0]
    assert t.decode(ids) == "hi hi ⁇ "


def test_word_model(tmp_path):
    path = _mk_model([("▁hello", -1.0), ("▁world", -1.5)],
                     3, tmp_path / "w.model")
    t = load_tokenizer(path, prefer_native=False)
    assert isinstance(t, SentencePieceWord)
    assert t.encode_as_pieces("hello world") == ["▁hello", "▁world"]
    assert t.encode_as_ids("hello unknown world") == [3, 0, 4]
    assert t.decode([3, 4]) == "hello world"


def test_unknown_model_type_rejected(tmp_path):
    path = _mk_model([("a", -1.0)], 7, tmp_path / "bad.model")
    with pytest.raises(ValueError, match="model_type=7"):
        load_tokenizer(path, prefer_native=False)


# ------------------------------------------------- native engine parity

import shutil  # noqa: E402

needs_gxx = pytest.mark.skipif(shutil.which("g++") is None,
                               reason="no C++ toolchain")

PARITY_TEXTS = ["Hello world.", "I saw a girl with a telescope.",
                "this is a test", "xyzzy ☃☃ plugh", "",
                "   spaces   everywhere  ", "MiXeD CaSe 123!",
                "ＨＥＬＬＯ fullwidth"]


def _native(path):
    from early_exit_tpu.tokenizer.native import NativeBPE
    return NativeBPE(path)


@needs_gxx
@needs_ref
def test_native_unigram_matches_python():
    nat, py = _native(REF_UNIGRAM), load_tokenizer(REF_UNIGRAM,
                                                   prefer_native=False)
    for t in PARITY_TEXTS:
        assert nat.encode_as_ids(t) == py.encode_as_ids(t), t
        assert nat.decode(py.encode_as_ids(t)) == py.decode(
            py.encode_as_ids(t)), t


@needs_gxx
@needs_ref
def test_native_bpe_applies_charsmap():
    nat = _native(REF_BPE)
    py = load_tokenizer(REF_BPE, prefer_native=False)
    assert nat.encode_as_ids("ＨＥＬＬＯ") == \
        nat.encode_as_ids("HELLO")
    for t in ["HELLO WORLD ＴＥＳＴ", "A\x01B", "①②"]:
        assert nat.encode_as_ids(t) == py.encode_as_ids(t), t


@needs_gxx
def test_native_char_and_word_match_python(tmp_path):
    cpath = _mk_model([("▁", -1.0), ("h", -2.0), ("i", -2.5)],
                      4, tmp_path / "c.model")
    wpath = _mk_model([("▁hello", -1.0), ("▁world", -1.5)],
                      3, tmp_path / "w.model")
    for path, text in [(cpath, "hi hix"), (wpath, "hello unknown world")]:
        nat, py = _native(path), load_tokenizer(path, prefer_native=False)
        assert nat.encode_as_ids(text) == py.encode_as_ids(text)
        assert nat.decode(py.encode_as_ids(text)) == py.decode(
            py.encode_as_ids(text))
