"""eet_spm CLI: the `normalize` tool (the 5th reference tool,
sentencepiece/src/CMakeLists.txt:267-271) and loud rejection of
out-of-scope model types."""

import shutil
import struct
import subprocess

import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")

from early_exit_tpu import _native


@pytest.fixture(scope="module")
def eet_spm():
    return _native.build_cli()


def _norm(binary, text, *flags):
    out = subprocess.run([binary, "normalize", *flags], input=text,
                         capture_output=True, text=True, check=True)
    return out.stdout


def test_identity_collapses_whitespace(eet_spm):
    assert _norm(eet_spm, "  hello   world  \n") == "hello world\n"


def test_identity_keeps_characters(eet_spm):
    # identity rule maps no characters — fullwidth stays fullwidth
    assert _norm(eet_spm, "ＡＢＣ\n") == "ＡＢＣ\n"


def test_nfkc_lite(eet_spm):
    got = _norm(eet_spm, "Ｈｅｌｌｏ　ｗｏｒｌｄ！\n",
                "--normalization_rule_name=nfkc")
    assert got == "Hello world!\n"


def test_keep_extra_whitespace(eet_spm):
    got = _norm(eet_spm, " a  b \n", "--remove_extra_whitespaces=false")
    assert got == " a  b \n"


def test_unknown_rule_fails(eet_spm):
    r = subprocess.run([eet_spm, "normalize",
                        "--normalization_rule_name=bogus"],
                       input="", capture_output=True, text=True)
    assert r.returncode == 1
    assert "bogus" in r.stderr


def test_unigram_model_loads_with_unigram_engine(tmp_path):
    """A .model whose TrainerSpec says unigram must load with the unigram
    (Viterbi) engine, never silently BPE-merged (round-2: all four
    SentencePiece model types are supported)."""
    from early_exit_tpu.tokenizer import load_tokenizer

    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            if v:
                out += struct.pack("B", b7 | 0x80)
            else:
                out += struct.pack("B", b7)
                return out

    def field(num, wire, payload):
        return varint((num << 3) | wire) + payload

    # one piece "<unk>" + TrainerSpec{model_type=UNIGRAM(1)}
    piece = field(1, 2, varint(5) + b"<unk>") + field(3, 0, varint(2))
    trainer = field(3, 0, varint(1))  # model_type = 1 (unigram)
    model = field(1, 2, varint(len(piece)) + piece) \
        + field(2, 2, varint(len(trainer)) + trainer)
    p = tmp_path / "uni.model"
    p.write_bytes(model)
    from early_exit_tpu.tokenizer.spm import SentencePieceUnigram
    t = load_tokenizer(str(p), prefer_native=False)
    assert isinstance(t, SentencePieceUnigram)
