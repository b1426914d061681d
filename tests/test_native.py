"""Native (C++) engines vs the Python oracles."""

import os
import shutil

import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")

BUILD = "/root/reference/sentencepiece/build"
MODEL = os.path.join(BUILD, "libri.bpe-256.model")


@pytest.fixture(scope="module")
def native_tok():
    from early_exit_tpu.tokenizer.native import NativeBPE
    if not os.path.exists(MODEL):
        pytest.skip("reference artifacts not mounted")
    return NativeBPE(MODEL)


@pytest.fixture(scope="module")
def py_tok():
    from early_exit_tpu.tokenizer import SentencePieceBPE
    from early_exit_tpu.tokenizer import proto
    return SentencePieceBPE(proto.parse_model(MODEL))


def test_native_tokenizer_basics(native_tok):
    assert native_tok.get_piece_size() == 256
    assert native_tok.bos_id() == 1
    assert native_tok.eos_id() == 2
    assert native_tok.pad_id() == 126
    assert native_tok.unk_id() == 127
    assert native_tok.id_to_piece(0) == "@"


def test_native_matches_python_engine(native_tok, py_tok):
    texts = ["THE QUICK BROWN FOX", "HELLO WORLD", "IT'S", "A",
             "SOMETHING LONGER WITH MANY WORDS IN IT",
             "SUPERCALIFRAGILISTIC"]
    for t in texts:
        assert native_tok.encode_as_ids(t) == py_tok.encode_as_ids(t), t
        ids = py_tok.encode_as_ids(t)
        assert native_tok.decode(ids) == py_tok.decode(ids) == t


def test_native_golden_lexicon(native_tok):
    """Full 89k-word spm_encode golden corpus through the C++ engine."""
    lex = os.path.join(BUILD, "librispeech-bpe-256.lex")
    n = 0
    with open(lex, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            word, pieces_str = line.split("\t")
            expect = pieces_str.split(" ")
            got = [p.lower()
                   for p in native_tok.encode_as_pieces(word.upper())]
            assert got == expect, (word, got, expect)
            n += 1
    assert n == 89114


def test_native_lexicon_matches_python():
    from early_exit_tpu.decoding.native import NativeLexicon
    from early_exit_tpu.decoding import lexicon as pylex
    entries = ["the", "cat", "hat", "hello", "world", "threshold"]
    nl = NativeLexicon(entries)
    assert nl.contains("cat")
    assert not nl.contains("kat")
    for w in ["teh", "helo", "wrld", "thresold", "xyz"]:
        got = nl.closest(w)
        d_got = pylex.edit_distance(w, got)
        best = min(pylex.edit_distance(w, e) for e in entries)
        assert d_got == best, (w, got, d_got, best)


@pytest.mark.skipif(not os.path.exists("/root/reference/librispeech.lex"),
                    reason="reference lexicon not mounted")
def test_native_lexicon_full_scale():
    from early_exit_tpu.decoding.native import NativeLexicon
    from early_exit_tpu.decoding.lexicon import load_dict, edit_distance
    import time
    entries = load_dict("/root/reference/librispeech.lex")
    t0 = time.time()
    nl = NativeLexicon(entries)
    for w in ["thhe", "aardvrk", "zzyzx", "exampel", "questoin"]:
        c = nl.closest(w)
        assert edit_distance(w, c) <= 3
    dt = time.time() - t0
    # build + 5 queries over 89k entries well under a second each
    assert dt < 20, dt


def test_native_encode_thread_safety(native_tok, py_tok):
    """Concurrent encodes must not garble each other's output.

    Regression: the wrapper used ONE shared ctypes output buffer; the C
    call releases the GIL, so two pipeline worker threads encoding at
    once interleaved writes and produced mixed-utterance label ids
    (observed as a nondeterministic one-utterance WER hit per eval run
    at reference scale). Per-thread scratch buffers fix it.
    """
    import random
    import sys
    from concurrent.futures import ThreadPoolExecutor

    # mixed short/long texts maximise the overlap window (a long
    # encode's slow buffer read vs a short encode's quick overwrite);
    # a tiny switch interval makes the race fire reliably even on a
    # single-CPU host (the old code: 100+ mismatches per run here)
    words = ["PEOPLE", "WHERE", "HE", "MUST", "OVER", "IF", "WHAT",
             "ME", "ONLY", "MY", "TIME", "BE", "THE", "QUICK"]
    rng = random.Random(0)
    texts = [" ".join(rng.choice(words)
                      for _ in range(rng.randint(5, 400)))
             for _ in range(200)]
    want = [py_tok.encode_as_ids(t) for t in texts]
    old_interval = sys.getswitchinterval()
    sys.setswitchinterval(1e-5)
    try:
        with ThreadPoolExecutor(8) as pool:
            for _ in range(10):
                got = list(pool.map(native_tok.encode_as_ids, texts))
                assert got == want
    finally:
        sys.setswitchinterval(old_interval)


def test_native_decode_thread_safety(native_tok, py_tok):
    from concurrent.futures import ThreadPoolExecutor

    texts = ["THE QUICK BROWN FOX", "HELLO WORLD", "IT'S A TIME",
             "PEOPLE ONLY MY TIME BE"] * 50
    ids = [py_tok.encode_as_ids(t) for t in texts]
    with ThreadPoolExecutor(8) as pool:
        for _ in range(10):
            got = list(pool.map(native_tok.decode, ids))
            assert got == texts
