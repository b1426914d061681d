"""Byte-fallback vocabularies (`--byte_fallback`): unknown characters
encode as their UTF-8 bytes through the 256 `<0xXX>` BYTE pieces instead
of collapsing to `<unk>`.

Reference semantics being matched:
- trainer inserts 256 BYTE meta pieces when byte_fallback is set
  (sentencepiece/src/trainer_interface.cc:800-804, proto field 35 at
  sentencepiece_model.proto:187);
- encode decomposes any would-be-unk surface into byte pieces
  (sentencepiece_processor.cc:576-598);
- decode merges consecutive byte pieces into a UTF-8 string where every
  structurally invalid byte becomes one U+FFFD (ProcessBytePieces,
  sentencepiece_processor.cc:819-869; DecodeUTF8, util.cc:44);
- a model containing BYTE pieces with byte_fallback unset (or with an
  incomplete byte table) is rejected (model_interface.cc:101-128).
"""

import os
import random
import shutil

import pytest

from early_exit_tpu.tokenizer import proto, spm
from early_exit_tpu.tokenizer.bpe import (SentencePieceBPE, byte_piece,
                                          piece_to_byte,
                                          utf8_decode_strict)

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODEL_TYPES = {"unigram": 1, "bpe": 2, "word": 3, "char": 4}

# OOV-rich text: accents, CJK, emoji — none present in the ASCII corpus
OOV_TEXT = "héllo wörld 世界 \U0001f642 cat"


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    words = ["hello", "world", "the", "cat", "sat", "mat", "there"]
    rng = random.Random(7)
    path = tmp_path_factory.mktemp("bf") / "corpus.txt"
    with open(path, "w") as f:
        for _ in range(120):
            f.write(" ".join(rng.choices(words, k=6)) + "\n")
    return str(path)


def _train(corpus_path, prefix, model_type, vocab=320, byte_fallback=1):
    from early_exit_tpu import _native
    lib = _native.get_lib()
    rc = lib.eet_spm_train_norm_ex(
        corpus_path.encode(), prefix.encode(), vocab, 0, 1, 2, -1, b"",
        MODEL_TYPES[model_type], b"identity", b"", byte_fallback)
    assert rc == 0
    return prefix + ".model"


# ---------------------------------------------------------------- helpers --

def test_byte_piece_names():
    assert byte_piece(0) == "<0x00>"
    assert byte_piece(0xAB) == "<0xAB>"
    assert piece_to_byte("<0xAB>") == 0xAB
    assert piece_to_byte("<0xab>") == 0xAB
    assert piece_to_byte("<0xGG>") == -1
    assert piece_to_byte("byte") == -1


def test_utf8_decode_strict_valid_and_invalid():
    assert utf8_decode_strict("héllo 🙂".encode()) == "héllo 🙂"
    # lone continuation byte -> one U+FFFD
    assert utf8_decode_strict(b"\x80") == "�"
    # truncated 3-byte sequence: lead byte invalid (1 char), trail (1)
    assert utf8_decode_strict(b"\xe2\x96") == "��"
    # overlong encoding of '/' (0xC0 0xAF) rejected per byte
    assert utf8_decode_strict(b"\xc0\xaf") == "��"
    # CESU-8 surrogate (0xED 0xA0 0x80) rejected per byte
    assert utf8_decode_strict(b"\xed\xa0\x80") == "�" * 3
    # valid U+FFFD passes through
    assert utf8_decode_strict("�".encode()) == "�"
    # mix: valid ASCII around an invalid byte
    assert utf8_decode_strict(b"a\xffb") == "a�b"


# ----------------------------------------------------------- the trainers --

@pytest.mark.parametrize("mtype", list(MODEL_TYPES))
def test_trainer_emits_byte_table(corpus, tmp_path, mtype):
    model = _train(corpus, str(tmp_path / mtype), mtype)
    data = proto.parse_model(model)
    assert int(data.trainer["byte_fallback"]) == 1
    bytes_found = sorted(piece_to_byte(p.piece) for p in data.pieces
                        if p.type == proto.BYTE)
    assert bytes_found == list(range(256))
    # byte pieces sit right after the specials (insertion order parity:
    # specials, user-defined, bytes — trainer_interface.cc:800)
    first_byte_id = next(i for i, p in enumerate(data.pieces)
                         if p.type == proto.BYTE)
    assert first_byte_id <= 4


def test_without_flag_no_byte_pieces(corpus, tmp_path):
    model = _train(corpus, str(tmp_path / "plain"), "bpe", byte_fallback=0)
    data = proto.parse_model(model)
    assert "byte_fallback" not in data.trainer
    assert all(p.type != proto.BYTE for p in data.pieces)


# ------------------------------------------------------------ the engines --

@pytest.mark.parametrize("mtype", list(MODEL_TYPES))
@pytest.mark.parametrize("native", [False, True])
def test_oov_roundtrip(corpus, tmp_path, mtype, native):
    model = _train(corpus, str(tmp_path / f"{mtype}{int(native)}"), mtype)
    sp = spm.load_tokenizer(model, prefer_native=native)
    ids = sp.encode_as_ids(OOV_TEXT)
    assert sp.unk_id() not in ids          # nothing collapsed to unk
    if mtype == "word":
        # word pieces carry their ▁ marker INSIDE the OOV surface, so
        # the marker itself byte-encodes and decodes verbatim (byte
        # surfaces bypass ▁->space) — the vendored decoder does the
        # same (SetSurface appends byte runs as-is, processor.cc:852)
        assert sp.decode(ids) == "▁" + OOV_TEXT.replace(" ", "▁").replace(
            "▁cat", " cat")
    else:
        assert sp.decode(ids) == OOV_TEXT  # byte-exact round trip


def test_engines_agree(corpus, tmp_path):
    model = _train(corpus, str(tmp_path / "agree"), "bpe")
    py = spm.load_tokenizer(model, prefer_native=False)
    nat = spm.load_tokenizer(model, prefer_native=True)
    assert type(py) is not type(nat)
    for text in [OOV_TEXT, "hello world", "ß", "\x00\x7f", "á"]:
        assert py.encode_as_ids(text) == nat.encode_as_ids(text), text
        assert py.encode_as_pieces(text) == nat.encode_as_pieces(text)
        ids = py.encode_as_ids(text)
        assert py.decode(ids) == nat.decode(ids)


@pytest.mark.parametrize("native", [False, True])
def test_invalid_byte_runs_decode_to_replacement(corpus, tmp_path, native):
    model = _train(corpus, str(tmp_path / f"inv{int(native)}"), "bpe")
    sp = spm.load_tokenizer(model, prefer_native=native)
    data = proto.parse_model(model)
    bid = {piece_to_byte(p.piece): i for i, p in enumerate(data.pieces)
           if p.type == proto.BYTE}
    # truncated 3-byte sequence then a known piece: run flushes at the
    # piece boundary, each invalid byte -> U+FFFD
    cat = sp.encode_as_ids("cat")   # -> ['▁cat']; its ▁ becomes a space
    out = sp.decode([bid[0xE2], bid[0x96]] + cat)
    assert out == "�� cat"
    # a byte-encoded ▁ stays literal (bytes bypass ▁->space mapping)
    ws = "▁".encode()
    out = sp.decode([bid[b] for b in ws])
    assert out == "▁"


def test_decode_pieces_handles_byte_pieces(corpus, tmp_path):
    model = _train(corpus, str(tmp_path / "dp"), "bpe")
    sp = spm.load_tokenizer(model, prefer_native=False)
    pieces = sp.encode_as_pieces(OOV_TEXT)
    assert any(piece_to_byte(p) >= 0 for p in pieces)
    assert sp.decode_pieces(pieces) == OOV_TEXT


def test_sampling_paths_apply_fallback(corpus, tmp_path):
    rng = random.Random(3)
    for mtype in ("bpe", "unigram"):
        model = _train(corpus, str(tmp_path / f"s{mtype}"), mtype)
        sp = spm.load_tokenizer(model, prefer_native=False)
        for _ in range(5):
            pieces = sp.sample_encode_as_pieces(OOV_TEXT, alpha=0.3,
                                                rng=rng)
            ids = sp._pieces_to_ids(pieces)
            assert sp.unk_id() not in ids
            assert sp.decode(ids) == OOV_TEXT
        if mtype == "unigram":
            for pieces, _score in sp.nbest_encode_as_pieces(OOV_TEXT, 3):
                assert sp.decode(sp._pieces_to_ids(pieces)) == OOV_TEXT


# ------------------------------------------------------------- validation --

def _mutate_model(model, out, drop_byte_fallback=False, drop_piece=None):
    data = proto.parse_model(model)
    trainer = dict(data.trainer)
    pieces = list(data.pieces)
    if drop_byte_fallback:
        trainer.pop("byte_fallback", None)
    if drop_piece is not None:
        pieces = [p for p in pieces if p.piece != drop_piece]
    blob = proto.serialize_model(pieces, trainer, {"name": "identity"})
    with open(out, "wb") as f:
        f.write(blob)
    return out


def test_rejects_byte_pieces_without_flag(corpus, tmp_path):
    model = _train(corpus, str(tmp_path / "rej"), "bpe")
    bad = _mutate_model(model, str(tmp_path / "bad1.model"),
                        drop_byte_fallback=True)
    with pytest.raises(ValueError, match="byte_fallback"):
        spm.load_tokenizer(bad, prefer_native=False)
    from early_exit_tpu import _native
    lib = _native.get_lib()
    assert not lib.eet_bpe_load(bad.encode())


def test_rejects_incomplete_byte_table(corpus, tmp_path):
    model = _train(corpus, str(tmp_path / "rej2"), "bpe")
    bad = _mutate_model(model, str(tmp_path / "bad2.model"),
                        drop_piece="<0x41>")
    with pytest.raises(ValueError, match="256 byte pieces"):
        spm.load_tokenizer(bad, prefer_native=False)
    from early_exit_tpu import _native
    lib = _native.get_lib()
    assert not lib.eet_bpe_load(bad.encode())


def test_literal_unk_surface_falls_back(corpus, tmp_path):
    """A segmented surface that happens to BE the `<unk>` piece string
    maps to unk_id and therefore byte-decomposes — PieceToId's behavior
    (is_unk == id==unk_id, sentencepiece_processor.cc:576)."""
    model = _train(corpus, str(tmp_path / "lit"), "bpe")
    sp = spm.load_tokenizer(model, prefer_native=False)
    assert sp._with_byte_fallback(["<unk>"]) == [
        byte_piece(b) for b in b"<unk>"]


def test_cli_byte_fallback_flag(corpus, tmp_path):
    import subprocess
    exe = os.path.join(REPO, "build", "eet_spm")
    if not os.path.exists(exe):
        pytest.skip("eet_spm not built")
    prefix = str(tmp_path / "cli")
    subprocess.run([exe, "train", f"--input={corpus}",
                    f"--model_prefix={prefix}", "--vocab_size=320",
                    "--model_type=unigram", "--byte_fallback=true"],
                   check=True)
    sp = spm.load_tokenizer(prefix + ".model", prefer_native=False)
    assert sp.byte_fallback
    assert sp.decode(sp.encode_as_ids(OOV_TEXT)) == OOV_TEXT
